package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time a named subset of gate queries under the Bench
  * session config (warm-up pass + two timed passes), for per-query perf
  * iteration without paying the full 98-query bench. Usage:
  * `java -cp ... graft.TimeQ q1 q2 ...` with `SPARK_GRAFT_SF_DIR` set.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")) // the Bench default
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // corpus timestamp contract at construction (Tables.readerConfs
      // re-applies defensively; see its ordering note)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // experiment knobs: GRAFT_CONF="k=v,k2=v2" lands in the runtime conf
    sys.env.get("GRAFT_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    val qs = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq
      else qs.keys.toSeq.sorted
    names.foreach { n =>
      try { qs(n)(spark, sfDir).count(); () }
      catch { case e: Throwable => println(s"$n WARMUP-FAILED: ${e.getMessage}") }
    }
    // SPARK_GRAFT_COLD=1: clear every graft cache/memo before each timed
    // query, reproducing the bench's cache-cold pass per query
    val cold = sys.env.get("SPARK_GRAFT_COLD").contains("1")
    (1 to 2).foreach { pass =>
      names.foreach { n =>
        if (cold) {
          graft.operators.CacheRegistry.clearSession(spark)
          graft.operators.DedupOps.clearCcSlots(spark)
          spark.sqlContext.clearCache()
        }
        System.gc()
        val t0 = System.nanoTime()
        try { qs(n)(spark, sfDir).count(); () }
        catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
        println(f"pass$pass $n ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    graft.operators.ConnectorOps.shutdownStubs()
    spark.stop()
  }
}
