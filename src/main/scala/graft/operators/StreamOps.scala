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

  /** Per-dataset memory-sink name. Non-negative via mask, NOT math.abs:
    * abs(Int.MinValue) is negative, and a '-' in the name fails the
    * temp-view identifier parse; the mask also halves (not eliminates)
    * abs-style collisions between distinct dirs. Hex keeps it short.
    */
  private def sinkName(prefix: String, d: String): String =
    f"${prefix}_${d.hashCode & 0x7fffffff}%x"

  /** Gate entries, each routed through [[StreamingOps.memoDrain]]: a
    * bounded drain on unchanged source files is deterministic, so repeat
    * invocations return the already-drained relation instead of re-paying
    * checkpoint setup + micro-batches + state commits — the streaming
    * twin of the batch result memos (the bench's warm pass measures this
    * repeat-consumer path; its cold pass clears the memo first).
    */
  val entries: Seq[(String, Q, Option[String])] = raw.map { case (n, f, o) =>
    (n,
      (s: SparkSession, d: String) => StreamingOps.memoDrain(s, d, n)(f(s, d)),
      o)
  }

  private lazy val raw: Seq[(String, Q, Option[String])] = Seq(
    ("stream_hourly_window",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_hw", d)
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

    // Event-time session windows over the stream: Spark's native
    // session_window (merged-gap windows with watermark-bounded state) —
    // the streaming twin of the batch events_sessionize. Complete mode
    // emits the fully-merged final sessions when the bounded source
    // drains; the oracle recomputes the identical sessions with the
    // lag/running-sum technique (new session at gap >= 30 min, matching
    // session_window's strictly-within-gap merge rule).
    ("stream_session_window",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_sw", d)
        StreamingOps.runToMemory(
          StreamingOps.sessionWindows(s, d), name, OutputMode.Complete())
          .orderBy("user_id", "start_us")
      },
      Some(
        """WITH flagged AS (
          |  SELECT user_id, event_id, ts,
          |         CASE WHEN lag(ts) OVER w IS NULL
          |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
          |              THEN 1 ELSE 0 END AS new_session
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |), sess AS (
          |  SELECT user_id, ts,
          |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          |  FROM flagged
          |)
          |SELECT user_id,
          |       min(epoch_us(ts)) AS start_us,
          |       CAST(count(*) AS BIGINT) AS n_events,
          |       max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
          |FROM sess GROUP BY user_id, session_id
          |ORDER BY user_id, start_us""".stripMargin)),

    // Closed-session emission through flatMapGroupsWithState + event-time
    // timeouts — the custom-state sessionization API (per-session payload
    // beyond what session_window expresses; state is one triple per user,
    // evicted by timeout). Non-final sessions close via the gap rule
    // (> 30 min, the batch events_sessionize rule); each user's final
    // session emits iff its timeout (last event + 30 min, at the
    // watermark's ms precision) lies strictly below the final watermark —
    // the emission rule the oracle replays, pinned empirically at all
    // three SFs in StreamingSpec.
    ("stream_sessions_fmgws",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_fm", d)
        StreamingOps.runToMemory(
          StreamingOps.closedSessions(s, d).toDF(), name, OutputMode.Append(),
          watermarkFlush = true)
          .orderBy("user_id", "start_us")
      },
      Some(
        """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
          |flagged AS (
          |  SELECT user_id, ts_us,
          |         CASE WHEN lag(ts_us) OVER w IS NULL
          |              OR ts_us - lag(ts_us) OVER w > 1800000000
          |              THEN 1 ELSE 0 END AS new_s
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
          |), sess AS (
          |  SELECT user_id, ts_us,
          |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          |  FROM flagged
          |), agg AS (
          |  SELECT user_id, sid,
          |         min(ts_us) AS start_us,
          |         CAST(count(*) AS BIGINT) AS n_events,
          |         max(ts_us) - min(ts_us) AS dur_us,
          |         max(ts_us) AS last_us,
          |         max(sid) OVER (PARTITION BY user_id) AS last_sid
          |  FROM sess GROUP BY user_id, sid
          |), wm AS (SELECT max(ts_us) // 1000 - 7200000 AS wm_ms FROM e)
          |SELECT user_id, start_us, n_events, dur_us
          |FROM agg, wm
          |WHERE sid < last_sid OR last_us // 1000 + 1800000 < wm_ms
          |ORDER BY user_id, start_us""".stripMargin)),

    // Streaming exact dedup: every stream row duplicated, deduped on the
    // content fingerprint with watermark-bounded state
    // (dropDuplicatesWithinWatermark) — the stateful twin of dedup_exact.
    // The final relation must equal the batch distinct the oracle
    // computes; a broken dedup either leaks a duplicate (rows 2×) or
    // drops a survivor.
    ("stream_dedup_exact",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_de", d)
        StreamingOps.runToMemory(
          StreamingOps.dedupExactStream(s, d), name, OutputMode.Append())
          .orderBy("lang", "fingerprint")
      },
      Some(
        """SELECT DISTINCT lang, md5(lower(text)) AS fingerprint
          |FROM documents ORDER BY lang, fingerprint""".stripMargin)),

    // The SAME dedup pipeline drained into the durable parquet FILE sink
    // (exactly-once via the _spark_metadata manifest — the sink a
    // production pipeline lands on, vs the harness memory sink) and read
    // back through the manifest: the committed files must reproduce the
    // batch relation exactly. StreamingSpec additionally pins that the
    // manifest exists and that a manifest-less stray file would not be
    // readable state (the read path goes through the manifest).
    ("stream_parquet_sink",
      (s: SparkSession, d: String) =>
        StreamingOps.runToParquetSink(
          StreamingOps.dedupExactStream(s, d),
          sinkName("stream_ps", d))
          .orderBy("lang", "fingerprint"),
      Some(
        """SELECT DISTINCT lang, md5(lower(text)) AS fingerprint
          |FROM documents ORDER BY lang, fingerprint""".stripMargin)),

    // Stream-stream interval join (see StreamingOps
    // .streamStreamClickPurchase): clicks joined to the same user's
    // purchases within 30 minutes, both sides watermarked streams; the
    // per-user pair counts over the drained sink must equal the batch
    // interval join.
    ("stream_stream_join",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_cp", d)
        StreamingOps.runToMemory(
          StreamingOps.streamStreamClickPurchase(s, d), name, OutputMode.Append(),
          // interval-join state buffers both watermark windows — the
          // heaviest state in the gate — but even here the round-8
          // StreamTuneSmoke sweep measured 1 state partition fastest on
          // the bounded drain (1.63 s vs 1.72 s at 4): per-store commit
          // tax beats parallelism until state outgrows one task
          statePartitions = 1)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"),
            round(sum("p_value"), 2).as("sum_value"))
          .orderBy("user_id")
      },
      Some(
        """SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_pairs,
          |       round(sum(p.value), 2) AS sum_value
          |FROM events c JOIN events p
          |  ON c.user_id = p.user_id AND c.event_type = 'click'
          | AND p.event_type = 'purchase'
          | AND epoch_us(p.ts) >= epoch_us(c.ts)
          | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
          |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin)),

    // CHAINED stateful operators (see StreamingOps
    // .streamStreamJoinAggChained): the interval join's pairs aggregate
    // per hourly click window INSIDE the same streaming plan — two
    // stateful operators, Append mode. Emitted windows are exactly those
    // the final watermark closed; the oracle replays Spark's watermark
    // rule (window end <= min over both sides of max event time − 2 h)
    // over the batch join, so the differential checks both the pair
    // semantics and the emission contract.
    ("stream_stream_agg_chained",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_ca", d)
        StreamingOps.runToMemory(
          StreamingOps.streamStreamJoinAggChained(s, d), name,
          OutputMode.Append(), watermarkFlush = true)
          .orderBy("bucket_us")
      },
      Some(
        """WITH wm AS (
          |  -- Spark tracks event-time watermarks in MILLISECONDS: each
          |  -- side's max event time floors to ms before the 2 h delay
          |  -- subtracts (the fmgws oracle's // 1000 rule) — an un-floored
          |  -- µs watermark would claim a window Spark keeps open whenever
          |  -- the max timestamp carries sub-ms digits
          |  SELECT least(
          |    max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) // 1000,
          |    max(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) // 1000)
          |    * 1000 - 7200000000 AS wm_us
          |  FROM events
          |), pairs AS (
          |  SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, c.ts)) AS bucket_us,
          |         p.value AS p_value
          |  FROM events c JOIN events p
          |    ON c.user_id = p.user_id AND c.event_type = 'click'
          |   AND p.event_type = 'purchase'
          |   AND epoch_us(p.ts) >= epoch_us(c.ts)
          |   AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
          |)
          |SELECT bucket_us, CAST(count(*) AS BIGINT) AS n_pairs,
          |       round(sum(p_value), 2) AS sum_value
          |FROM pairs, wm
          |WHERE bucket_us + 3600000000 <= wm_us
          |GROUP BY bucket_us ORDER BY bucket_us""".stripMargin)),

    // CHAINED dedup → windowed count (see StreamingOps
    // .dedupAggChainedStream): the second two-stateful-operator shape —
    // watermark-bounded exact dedup feeding an event-time windowed
    // aggregate in the same Append-mode plan. The oracle replays both the
    // dedup semantics (distinct (lang, fingerprint) per 10 ms bucket)
    // and the emission rule (every bucket closed by the final watermark,
    // i.e. all but the max bucket).
    ("stream_dedup_agg_chained",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_da", d)
        StreamingOps.runToMemory(
          StreamingOps.dedupAggChainedStream(s, d), name,
          OutputMode.Append(), watermarkFlush = true)
          .orderBy("bucket_us", "lang")
      },
      Some(
        """WITH k AS (
          |  SELECT DISTINCT lang, md5(lower(text)) AS fp,
          |         1704067200000000 + (doc_id - doc_id % 10) * 1000 AS b_us
          |  FROM documents
          |), wm AS (SELECT max(b_us) AS w FROM k)
          |SELECT b_us AS bucket_us, lang, CAST(count(*) AS BIGINT) AS n_keys
          |FROM k, wm WHERE b_us + 10000 <= w
          |GROUP BY b_us, lang ORDER BY bucket_us, lang""".stripMargin)),

    // Stream-static join (see StreamingOps.streamStaticSegments): the
    // event stream enriched against the broadcast customer dimension,
    // aggregated per segment under Complete mode — final state ≡ the
    // batch join + aggregate.
    ("stream_static_join",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_ss", d)
        StreamingOps.runToMemory(
          StreamingOps.streamStaticSegments(s, d), name, OutputMode.Complete())
          .orderBy("c_mktsegment")
      },
      Some(
        """SELECT c_mktsegment,
          |       CAST(count(*) AS BIGINT) AS n_events,
          |       round(sum(value), 2) AS sum_value
          |FROM events e JOIN customer c ON e.user_id = c.c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Streaming NEAR-dup collapse on the 5-token opening shingle (see
    // StreamingOps.dedupPrefixStream) — the stateful twin of the batch
    // pipeline's near-dup stage; the final key set must equal the batch
    // DISTINCT over the same key.
    ("stream_dedup_prefix",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_dp", d)
        StreamingOps.runToMemory(
          StreamingOps.dedupPrefixStream(s, d), name, OutputMode.Append())
          .orderBy("k")
      },
      Some(
        """SELECT DISTINCT array_to_string(string_split(text, ' ')[1:5], ' ') AS k
          |FROM documents ORDER BY k""".stripMargin)),

    // Custom per-key state via mapGroupsWithState (the engine's
    // session-style stateful API): running per-user totals driven to
    // completion over the bounded stream — the final state must equal the
    // batch aggregate, which is exactly what the oracle asserts.
    ("stream_user_totals",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_ut", d)
        StreamingOps.runToMemory(
          StreamingOps.userTotals(s, d).toDF(), name, OutputMode.Update())
          // Update mode re-emits a user's row once per micro-batch that
          // touches the user, and the memory sink APPENDS updates — the
          // FINAL state is the emission with the highest n_events
          // (totals are strictly monotone per emission). Today the
          // bounded corpus drains in one batch, but without this
          // collapse any multi-batch source (chunked files,
          // maxFilesPerTrigger) would duplicate users and fail the gate
          // — StreamingSpec's own twin already collapsed; the gate row
          // must too.
          .groupBy("user_id")
          .agg(max(struct(col("n_events"), col("total_value"))).as("st"))
          .select(col("user_id"), col("st.n_events").as("n_events"),
            round(col("st.total_value"), 2).as("total_value"))
          .orderBy("user_id")
      },
      Some(
        """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |       round(sum(value), 2) AS total_value
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Streaming latest-wins upsert (see StreamingOps.upsertLatestStream):
    // the CDC merge as a LIVE VIEW — per-key mapGroupsWithState keeps the
    // highest-version row, tombstones filter out downstream, later
    // upserts resurrect. The oracle is the BATCH merge's arg_max replay
    // verbatim, so stream-state semantics must converge to exactly the
    // batch relation. Update-mode re-emissions collapse by the
    // version-monotone max struct (the stream_user_totals convention).
    ("stream_upsert_latest",
      (s: SparkSession, d: String) => {
        val name = sinkName("stream_ul", d)
        StreamingOps.runToMemory(
          StreamingOps.upsertLatestStream(s, d).toDF(), name,
          OutputMode.Update())
          .groupBy("doc_id")
          .agg(max(struct(col("final_version"), col("op"), col("final_len")))
            .as("w"))
          .filter(col("w.op") =!= "D")
          .select(col("doc_id"), col("w.final_version").as("final_version"),
            col("w.final_len").as("final_len"))
          .orderBy("doc_id")
      },
      Some(
        """WITH feed AS (
          |  SELECT doc_id, 1 AS version, 'U' AS op, text FROM documents
          |  UNION ALL
          |  SELECT doc_id, 2, 'U', 'rev2 ' || text
          |  FROM documents WHERE doc_id % 7 = 0
          |  UNION ALL
          |  SELECT doc_id, 3, 'D', '' FROM documents WHERE doc_id % 13 = 0
          |  UNION ALL
          |  SELECT doc_id + 1000000, 1, 'U', text
          |  FROM documents WHERE doc_id % 11 = 0
          |), latest AS (
          |  SELECT doc_id,
          |         CAST(max(version) AS BIGINT) AS final_version,
          |         arg_max(op, version) AS fop,
          |         CAST(arg_max(length(text), version) AS BIGINT) AS final_len
          |  FROM feed GROUP BY doc_id
          |)
          |SELECT doc_id, final_version, final_len
          |FROM latest WHERE fop = 'U' ORDER BY doc_id""".stripMargin))
  )
}
