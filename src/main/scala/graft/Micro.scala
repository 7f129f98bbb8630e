package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench: time the named gate queries only (after one warm-up pass),
  * for iterating on individual operators without the full bench run.
  * `runMain graft.Micro <sfDir> <n_iters> <name> [name ...]`
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false")) // match Bench
      .config("spark.sql.session.timeZone", "UTC")
      // corpus timestamp contract at construction (Tables.readerConfs
      // re-applies defensively; see its ordering note)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // streaming experiments: override the per-query state partition sizing
    sys.env.get("SPARK_GRAFT_STATE_PARTS")
      .foreach(p => spark.conf.set("graft.stream.statePartitions", p))
    // SPARK_GRAFT_COLD=1: clear all plan-keyed caches/memos before every
    // timed iteration, so min/med measure the Bench artifact's
    // cache-cold path (JIT-warm) instead of the repeat-consumer path
    val cold = sys.env.get("SPARK_GRAFT_COLD").contains("1")
    def clearAll(): Unit = {
      graft.operators.CacheRegistry.clearSession(spark)
      graft.operators.DedupOps.clearCcSlots(spark)
      spark.sqlContext.clearCache()
    }
    names.foreach { n => SparkEntry.queries(n)(spark, sfDir).count() } // warm
    names.foreach { n =>
      val ts = (1 to iters).map { _ =>
        if (cold) clearAll()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val tag = if (cold) "[micro-cold]" else "[micro]"
      println(f"$tag $n%-28s min=${ts.min}%.3f med=${ts.sorted.apply(iters / 2)}%.3f max=${ts.max}%.3f")
    }
    graft.operators.ConnectorOps.shutdownStubs()
    spark.stop()
  }
}
