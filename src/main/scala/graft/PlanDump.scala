package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the NAMED gate queries, one file per
  * query — the per-round optimization evidence (`plans/r<N>/...`).
  * Usage: `runMain graft.PlanDump <outDir> <suffix> <sfDir> <name...>`
  * writes `<outDir>/<name>_<suffix>.txt` for each name (all names when
  * none given). Runs under the Bench session config so the dumped plans
  * are the benched plans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("graft.cache.maxLiveCorpora", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    val picked = if (names.nonEmpty) names else qs.keys.toSeq.sorted
    // SPARK_GRAFT_PLANS_WARM=1: execute every query once first, so the
    // dumped plans are the WARM plans the bench's headline passes run —
    // cached relations appear as InMemoryRelation and the exchange-free
    // joins against the cache layout are visible (a cold static plan
    // shows the full build lineage instead)
    if (sys.env.get("SPARK_GRAFT_PLANS_WARM").contains("1")) {
      picked.foreach { n =>
        try qs(n)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }
    }
    picked.foreach { n =>
      qs.get(n) match {
        case None => println(s"[plandump] UNKNOWN query $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
            println(s"[plandump] wrote ${n}_$suffix.txt")
          } catch {
            case e: Throwable =>
              println(s"[plandump] $n FAILED: ${e.getMessage}")
          }
      }
    }
    graft.operators.ConnectorOps.shutdownStubs()
    spark.stop()
  }
}
