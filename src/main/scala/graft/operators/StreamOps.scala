package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

/** Streaming queries surfaced in the correctness gate: the bounded events
  * corpus is run through a real Structured Streaming query (file source →
  * watermarked window agg → memory sink, Complete mode) and the final
  * result is compared against the same relation computed by DuckDB — the
  * incremental plan must converge to the batch answer.
  */
object StreamOps {

  type Q = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("stream_hourly_window",
      (s: SparkSession, d: String) => {
        val name = s"stream_hw_${math.abs(d.hashCode)}"
        StreamingOps.runToMemory(
          StreamingOps.hourlyWindow(s, d), name, OutputMode.Complete())
          .orderBy("bucket_us", "event_type")
      },
      Some(
        """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket_us,
          |       event_type,
          |       CAST(count(*) AS BIGINT) AS n,
          |       round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin)),

    // Custom per-key state via mapGroupsWithState (the engine's
    // session-style stateful API): running per-user totals driven to
    // completion over the bounded stream — the final state must equal the
    // batch aggregate, which is exactly what the oracle asserts.
    ("stream_user_totals",
      (s: SparkSession, d: String) => {
        val name = s"stream_ut_${math.abs(d.hashCode)}"
        StreamingOps.runToMemory(
          StreamingOps.userTotals(s, d).toDF(), name, OutputMode.Update())
          .select(col("user_id"), col("n_events"),
            round(col("total_value"), 2).as("total_value"))
          .orderBy("user_id")
      },
      Some(
        """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |       round(sum(value), 2) AS total_value
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
