package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds and the
  * total. A full untimed warm-up pass runs first so the timed pass
  * measures steady-state execution (codegen compiled, classes loaded,
  * parquet footers cached) rather than first-query JVM warm-up — the
  * throughput number the 2× gate is about, not JIT noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle-partition count is sized to the DATA, not the core count:
    // at bench scale (≤100 MB inputs) more partitions only buy scheduling
    // overhead; AQE coalescing trims reads but map-side task launch is
    // still per-partition. Overridable for experiments.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)

    // warm-up (untimed): run everything once
    qs.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    var failures = List.empty[String]
    val results = qs.map { case (name, fn) =>
      System.gc() // isolate queries from each other's garbage (untimed)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          failures ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // per-query scheduling floor: the median wall time of a trivial
    // one-stage job — the irreducible cost local Spark pays per query that
    // a single-process engine does not; floor × |queries| contextualizes
    // the total against DuckDB (see BASELINE.md)
    val floorTs = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val floor = floorTs(floorTs.length / 2)
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val fjson = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","floor_sec":$floor,"queries":$qjson,"failures":$fjson,"sf":"$sfDir"}""")
    graft.operators.ConnectorOps.shutdownStubs()
    spark.stop()
  }
}
