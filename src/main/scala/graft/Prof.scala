package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev harness: per-stage profile of named gate queries under the Bench
  * session config. For each query, after a warm-up pass, prints every
  * submitted stage's wall time, summed task time, task count, and shuffle
  * read/write bytes — the evidence the optimization guide (§1, §7) asks
  * for before touching anything. Usage:
  * `sbt "runMain graft.Prof <name> [name ...]"` with `SPARK_GRAFT_SF_DIR`
  * (default sf0.1). `SPARK_GRAFT_COLD=1` clears graft caches before the
  * profiled pass (the bench's cold path).
  */
object Prof {
  private case class StageRec(
      id: Int, name: String, tasks: Int,
      wallMs: Long, taskMs: Long, shufReadB: Long, shufWriteB: Long,
      inputB: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
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
    sys.env.get("GRAFT_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })

    val recs = mutable.Map.empty[Int, StageRec]
    val submitted = mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        submitted(s.stageInfo.stageId) = System.nanoTime()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val m = si.taskMetrics
        val wall = (for {
          sub <- si.submissionTime; done <- si.completionTime
        } yield done - sub).getOrElse(0L)
        recs(si.stageId) = StageRec(si.stageId, si.name, si.numTasks, wall,
          m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
      }
    })

    val cold = sys.env.get("SPARK_GRAFT_COLD").contains("1")
    val qs = SparkEntry.queries
    args.toSeq.foreach { n =>
      try qs(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"$n WARMUP-FAILED: ${e.getMessage}") }
    }
    args.toSeq.foreach { n =>
      if (cold) {
        graft.operators.CacheRegistry.clearSession(spark)
        graft.operators.DedupOps.clearCcSlots(spark)
        spark.sqlContext.clearCache()
      }
      System.gc()
      recs.clear()
      graft.sources.loki.testkit.LokiStubServer.resetStats()
      org.apache.spark.graft.ListenerShim
        .waitUntilListenerBusEmpty(spark.sparkContext, 10000)
      val t0 = System.nanoTime()
      try { qs(n)(spark, sfDir).count(); () }
      catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerShim
        .waitUntilListenerBusEmpty(spark.sparkContext, 10000)
      val rows = recs.values.toSeq.sortBy(_.id)
      val stubStats =
        if (sys.env.get("GRAFT_STUB_STATS").contains("1"))
          "  " + graft.sources.loki.testkit.LokiStubServer.statsLine
        else ""
      println(f"== $n%-32s total=$secs%.3f s  stages=${rows.size}  " +
        f"stageWallSum=${rows.map(_.wallMs).sum / 1e3}%.3f" + stubStats)
      rows.foreach { r =>
        println(f"   s${r.id}%-4d ${r.wallMs}%5d ms wall ${r.taskMs}%6d ms task " +
          f"${r.tasks}%3d t  in=${r.inputB / 1024}%6d K  sr=${r.shufReadB / 1024}%6d K " +
          f"sw=${r.shufWriteB / 1024}%6d K  ${r.name.take(90)}")
      }
    }
    graft.operators.ConnectorOps.shutdownStubs()
    spark.stop()
  }
}
