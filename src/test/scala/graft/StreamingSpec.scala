package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

/** Streaming twins must agree with their batch counterparts on the bounded
  * corpus — the incremental plan computes the same relation.
  */
class StreamingSpec extends SparkTestBase {

  test("stream source schema memo misses after an in-place corpus rewrite (round 10)") {
    // the schema memo keys on (session, path, mtime, length): regenerating
    // the file at the SAME path (the DedupSpec rewrite-hygiene scenario —
    // e.g. the ns-Long vs µs-timestamp corpus generations) must re-read
    // the footer, not serve the first generation's schema
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_schema_memo").toFile
    try {
      val p = new java.io.File(dir, "events.parquet").getAbsolutePath
      import spark.implicits._
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
        .toDF("ts", "user_id").coalesce(1)
        .write.mode("overwrite").format("parquet").save(p)
      val s1 = StreamingOps.eventsStream(spark, dir.getAbsolutePath).schema
      assert(!s1.fieldNames.contains("extra"))
      // rewrite IN PLACE with an extra column (different length + mtime)
      Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "x"))
        .toDF("ts", "user_id", "extra").coalesce(1)
        .write.mode("overwrite").format("parquet").save(p)
      val s2 = StreamingOps.eventsStream(spark, dir.getAbsolutePath).schema
      assert(s2.fieldNames.contains("extra"),
        s"stale schema served after in-place rewrite: $s2")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("drain memo: hit on unchanged files, miss on rewrite, cleared with the session (round 11)") {
    // the bounded-drain result memo follows the schema memo's hygiene
    // rules: same (dir, key) on unchanged source files serves the drained
    // relation without recomputing; an in-place rewrite of a source file
    // (mtime/length change) misses; CacheRegistry.clearSession (the bench
    // cold reset) drops it
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_drain_memo").toFile
    try {
      val p = new java.io.File(dir, "documents.parquet").getAbsolutePath
      import spark.implicits._
      Seq((1L, "one")).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").format("parquet").save(p)
      var computes = 0
      def drain() = StreamingOps.memoDrain(
        spark, dir.getAbsolutePath, "drain_memo_spec") {
        computes += 1
        spark.range(1).toDF("v")
      }
      drain(); drain()
      assert(computes == 1, s"repeat invocation must memo-hit ($computes)")
      // in-place rewrite with different content length → fingerprint miss
      Seq((1L, "one rewritten longer")).toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").format("parquet").save(p)
      drain()
      assert(computes == 2, s"rewrite must invalidate the memo ($computes)")
      // ...and EVICT the stale generation's entry (round 12): without
      // eviction every corpus rewrite leaked the prior drained DataFrame
      // for the session's lifetime
      assert(StreamingOps.drainMemoEntries(spark, "drain_memo_spec") == 1,
        "stale generation must be evicted on rewrite, not accumulated")
      graft.operators.CacheRegistry.clearSession(spark)
      drain()
      assert(computes == 3, s"clearSession must drop the memo ($computes)")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("streaming hourly window equals the batch events_hourly_window") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.hourlyWindow(spark, sf), "hourly_mem", OutputMode.Update())
      // Update mode can emit a bucket more than once; last update wins
      .groupBy("bucket_us", "event_type")
      .agg(max("n").as("n"), max("sum_value").as("sum_value"))
    val batch = q("events_hourly_window")
    val s = streamed.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val b = batch.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(s == b, s"missing=${b -- s} extra=${s -- b}")
  }

  test("streaming dedup halves the duplicated stream and equals batch distinct") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.dedupExactStream(spark, sf), "dedup_mem", OutputMode.Append())
    val docs = Tables.documents(spark, sf)
    val batch = docs
      .select(col("lang"), md5(lower(col("text"))).as("fingerprint")).distinct()
    val s = streamed.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = batch.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
    // the stream carried every doc twice; dedup must emit each surviving
    // key exactly once (set equality alone would mask duplicate rows)
    assert(streamed.count() == batch.count())
  }

  test("stream-static join equals the batch join + aggregate") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.streamStaticSegments(spark, sf), "ssj_mem",
      OutputMode.Complete())
    val batch = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment")), "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
    val s = streamed.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val b = batch.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(s == b, s"missing=${b -- s} extra=${s -- b}")
  }

  test("stream-stream interval join pairs equal the batch interval join") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.streamStreamClickPurchase(spark, sf), "sscp_mem",
      OutputMode.Append())
    val e = Tables.events(spark, sf)
    val batch = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("value")),
        Seq("user_id"))
      .filter(col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("interval 30 minutes"))
      .select(col("user_id"), unix_micros(col("click_ts")),
        unix_micros(col("p_ts")), col("value"))
    val s = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
  }

  test("chained join→agg emits exactly the watermark-closed windows of the batch aggregate") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.streamStreamJoinAggChained(spark, sf), "chain_mem",
      OutputMode.Append(), watermarkFlush = true)
    val e = Tables.events(spark, sf)
    // the emission contract: a window is in the result iff its end is at
    // or before the final global watermark, min over both sides of
    // (max event time − 2 h) — the same rule the gate oracle replays
    // Spark tracks watermarks in MILLISECONDS — each side's max floors
    // to ms before the delay subtracts (the gate oracle replays the same)
    val usDivMs = expr("unix_micros(ts) div 1000")
    val wm = e.agg(least(
      max(when(col("event_type") === "click", usDivMs)),
      max(when(col("event_type") === "purchase", usDivMs)))
      .as("m")).collect()(0).getLong(0) * 1000L - 7200000000L
    val batch = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("value")),
        Seq("user_id"))
      .filter(col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("interval 30 minutes"))
      .groupBy(window(col("click_ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"), round(sum("value"), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("bucket_us"),
        col("n_pairs"), col("sum_value"))
      .filter(col("bucket_us") + 3600000000L <= lit(wm))
    val s = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
    // and the plan really chains two stateful operators in one query:
    // the interval join AND the windowed aggregate's state store
    val plan = StreamingOps.streamStreamJoinAggChained(spark, sf)
      .queryExecution.analyzed.toString
    assert(plan.contains("Join"), plan)
    assert(plan.contains("Aggregate"), plan)
  }

  test("chained dedup -> windowed count equals the batch replay") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.dedupAggChainedStream(spark, sf), "dac_mem",
      OutputMode.Append(), watermarkFlush = true)
    val keys = Tables.documents(spark, sf)
      .select(col("lang"), md5(lower(col("text"))).as("fp"),
        (lit(1704067200000000L) +
          (col("doc_id") - pmod(col("doc_id"), lit(10))) * 1000L).as("b_us"))
      .distinct()
    val wm = keys.agg(max("b_us")).collect()(0).getLong(0)
    val batch = keys.filter(col("b_us") + 10000L <= wm)
      .groupBy("b_us", "lang").agg(count(lit(1)).as("n_keys"))
    val s = streamed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = batch.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
    // and the plan really chains the two stateful operators: the
    // within-watermark dedup AND the windowed aggregate
    val plan = StreamingOps.dedupAggChainedStream(spark, sf)
      .queryExecution.analyzed.toString
    assert(plan.contains("DeduplicateWithinWatermark"), plan)
    assert(plan.contains("Aggregate"), plan)
  }

  /** Stage `df` as `n` sequential single-file parquet writes under a fresh
    * temp dir (path-ordered f0 < f1 < …), so a file stream with
    * maxFilesPerTrigger=1 replays it as `n` real micro-batches.
    */
  private def stageChunks(df: org.apache.spark.sql.DataFrame, n: Int,
      chunk: Int => org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft-replay-").toFile
    (0 until n).foreach { i =>
      val stage = new java.io.File(dir, s"stage_$i")
      chunk(i)(df).coalesce(1).write.parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dir, f"f$i%02d.parquet").toPath)
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
    dir
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(): Unit
  }

  test("multi-batch replay: duplicates arriving in a LATER micro-batch still dedup") {
    // the single-batch gate drain plants both copies of a doc in one
    // batch; production arrival is the opposite — the duplicate shows up
    // later. Stage the corpus twice (two files), replay one file per
    // micro-batch through the SAME dedup pipeline: every key in batch 1
    // is a cross-batch duplicate and must be suppressed by state carried
    // over the batch boundary (the whole corpus sits inside the
    // 10-minute watermark window, per the pipeline's contract note).
    val docs = Tables.documents(spark, sf)
    val dir = stageChunks(docs, 2, _ => identity)
    try {
      val src = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
      val (streamed, nBatches) = StreamingOps.drainToMemory(
        StreamingOps.dedupExactOn(src), "replay_dedup_mem", OutputMode.Append())
      assert(nBatches == 2, s"expected 2 data micro-batches, got $nBatches")
      val batch = docs
        .select(col("lang"), md5(lower(col("text"))).as("fingerprint")).distinct()
      val s = streamed.collect().map(r => (r.getString(0), r.getString(1))).toSet
      val b = batch.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
      // each surviving key exactly once — a re-emission in batch 1 would
      // pass set equality but double the row count
      assert(streamed.count() == batch.count())
    } finally rmTree(dir)
  }

  test("multi-batch replay: upsert state converges under chunked, redelivered arrivals") {
    // batch 0 delivers the even-id docs' feed rows; batch 1 redelivers
    // them AND first-delivers the odd ids — an at-least-once CDC shape:
    // redelivered versions must be idempotent against the carried state
    // (rv > v rejects them) and late first arrivals must still converge
    // to exactly the batch merge.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = stageChunks(docs, 2,
      i => df => if (i == 0) df.filter(col("doc_id") % 2 === 0) else df)
    try {
      val src = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
      val (streamed, nBatches) = StreamingOps.drainToMemory(
        StreamingOps.upsertLatestOn(spark, src).toDF(), "replay_upsert_mem",
        OutputMode.Update())
      assert(nBatches == 2, s"expected 2 data micro-batches, got $nBatches")
      val s = streamed.groupBy("doc_id")
        .agg(max(struct(col("final_version"), col("op"), col("final_len"))).as("w"))
        .filter(col("w.op") =!= "D")
        .collect().map(r => (r.getLong(0),
          r.getStruct(1).getLong(0), r.getStruct(1).getLong(2))).toSet
      val b = q("corpus_upsert_latest").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
    } finally rmTree(dir)
  }

  test("multi-batch replay: hourly window with the watermark advancing across micro-batches") {
    // time-ordered quarters, one per micro-batch: the watermark advances
    // between batches (after batch i it sits at maxTs(quarter i) − 2 h),
    // open windows carry state across batch boundaries, and nothing is
    // late — so the drained result must still equal the batch aggregate.
    // ts is already converted to a µs timestamp by Tables.events, so the
    // staged files read back with a plain schema (no nanosAsLong step)
    val events = Tables.events(spark, sf)
    val Array(q1, q2, q3) = events
      .select(unix_micros(col("ts")).as("us")).stat
      .approxQuantile("us", Array(0.25, 0.5, 0.75), 0.001)
      .map(_.toLong)
    val us = unix_micros(col("ts"))
    val bounds: Seq[org.apache.spark.sql.Column] =
      Seq(us < q1, us >= q1 && us < q2, us >= q2 && us < q3, us >= q3)
    val dir = stageChunks(events, 4, i => df => df.filter(bounds(i)))
    try {
      val src = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.getAbsolutePath)
      val (streamed, nBatches) = StreamingOps.drainToMemory(
        StreamingOps.hourlyWindowOn(src), "replay_hourly_mem",
        OutputMode.Update())
      assert(nBatches == 4, s"expected 4 data micro-batches, got $nBatches")
      val dedupedUpdates = streamed
        // Update mode re-emits a bucket as later batches extend it; the
        // LAST update per key is the final state. n strictly increases
        // per update (an update means new rows arrived), so the max
        // struct keyed on n picks the last update — max over each column
        // separately would break if a negative value lowered the sum
        .groupBy("bucket_us", "event_type")
        .agg(max(struct(col("n"), col("sum_value"))).as("last"))
        .select(col("bucket_us"), col("event_type"),
          col("last.n").as("n"), col("last.sum_value").as("sum_value"))
      val batch = q("events_hourly_window")
      val s = dedupedUpdates.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val b = batch.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
    } finally rmTree(dir)
  }

  test("flatMapGroupsWithState closed sessions = batch sessions minus still-open tails") {
    import org.apache.spark.sql.expressions.Window
    val streamed = StreamingOps.runToMemory(
      StreamingOps.closedSessions(spark, sf).toDF(), "fmgws_mem",
      OutputMode.Append(), watermarkFlush = true)
    val e = Tables.events(spark, sf)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val byUser = Window.partitionBy("user_id").orderBy("ts_us")
    val sess = e
      .withColumn("prev", lag("ts_us", 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("ts_us") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("start_us"), count(lit(1)).as("n_events"),
        (max("ts_us") - min("ts_us")).as("dur_us"), max("ts_us").as("last_us"))
    // final watermark in ms: floor(max event time µs / 1000) − 2 h; a
    // user's LAST session emits iff its timeout (last + 30 min, ms) is
    // strictly below it — the rule the gate oracle replays
    val wmMs = e.agg(expr("max(ts_us) div 1000").as("m"))
      .collect()(0).getLong(0) - 7200000L
    val expected = sess
      .withColumn("last_sid",
        max("sid").over(Window.partitionBy("user_id")))
      .filter(col("sid") < col("last_sid") ||
        expr("last_us div 1000") + 1800000L < wmMs)
      .select("user_id", "start_us", "n_events", "dur_us")
    val s = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = expected.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(s == b, s"missing=${(b -- s).take(3)} extra=${(s -- b).take(3)}")
    assert(streamed.count() == expected.count())
  }

  test("stateful user totals equal the batch per-user aggregation") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.userTotals(spark, sf).toDF(), "users_mem", OutputMode.Update())
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"))
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val s = streamed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s == b, s"missing=${b -- s} extra=${s -- b}")
  }

  test("parquet file sink: manifest-committed files reproduce the batch relation exactly-once") {
    val (read, dir) = StreamingOps.runToParquetSinkWithDir(
      StreamingOps.dedupExactStream(spark, sf), "ps_spec")
    val got = read.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batch = Tables.documents(spark, sf)
      .select(col("lang"), md5(lower(col("text"))).as("fp"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == batch, s"missing=${batch -- got} extra=${got -- batch}")
    // the exactly-once contract is the _spark_metadata manifest: it must
    // exist, and the read path must trust it over the directory listing —
    // an orphan file (a simulated failed-task leftover) must NOT appear
    val manifest = new java.io.File(dir, "_spark_metadata")
    assert(manifest.isDirectory && manifest.listFiles().nonEmpty,
      "file sink must commit through a _spark_metadata manifest")
    val before = read.count()
    val orphanSrc = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val orphan = new java.io.File(dir, "part-99999-orphan.snappy.parquet")
    java.nio.file.Files.copy(orphanSrc.toPath, orphan.toPath)
    val reread = spark.read.schema(read.schema).parquet(dir.getAbsolutePath)
    assert(reread.count() == before,
      "a non-manifest file must be invisible to the manifest-aware read")
    orphan.delete()
  }
}
