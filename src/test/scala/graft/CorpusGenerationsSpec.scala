package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Both corpus generations the driver has shipped for `events.ts` must read
  * to the SAME µs-TimestampType surface (Tables.events branches on the type
  * actually read — Tables.scala): an older corpus wrote parquet
  * TIMESTAMP(NANOS) (unrepresentable in Spark, read as ns Long under
  * nanosAsLong and truncated), the current one TIMESTAMP(MICROS)
  * isAdjustedToUTC=false (read as TimestampType under
  * inferTimestampNTZ=false). The µs file Spark can write itself; the ns
  * file is written with the parquet-java example API because Spark has no
  * ns writer — exactly the shape the old driver corpus shipped.
  */
class CorpusGenerationsSpec extends SparkTestBase {

  // three instants (µs), one with a sub-µs remainder in the ns corpus to
  // pin the boundary truncation (DIV 1000, round toward zero)
  private val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
  private val rowsUs = Seq(
    (baseUs, "click", 11L, 1.5),
    (baseUs + 1800L * 1000000L, "purchase", 11L, 2.5),
    (baseUs + 3600L * 1000000L, "click", 12L, 3.5))

  // Both files are written with the parquet-java example API, NOT Spark:
  // Spark embeds its own schema in the footer metadata and the reader
  // honors it over logical-type inference, while the driver's corpus
  // (pyarrow) carries no Spark metadata — the generation-dependent
  // inference path under test only runs on such foreign files. (Spark
  // also has no ns writer at all.)
  private def writeCorpus(unit: LogicalTypeAnnotation.TimeUnit,
      adjustedToUtc: Boolean, nsRemainder: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpusgen-").toFile
    // deleteOnExit never removes a non-empty dir — recursive hook instead
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir)
    }
    val schema = Types.buildMessage()
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(adjustedToUtc, unit)).named("ts"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(DOUBLE).named("value"))
      .named("events")
    val f = new SimpleGroupFactory(schema)
    val w = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withConf(new Configuration())
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rowsUs.zipWithIndex.foreach { case ((us, et, uid, v), i) =>
      // under ns, the first row carries a 999 ns remainder: truncation,
      // not rounding
      val ts =
        if (unit == LogicalTypeAnnotation.TimeUnit.NANOS)
          us * 1000L + (if (nsRemainder && i == 0) 999L else 0L)
        else us
      w.write(f.newGroup()
        .append("ts", ts).append("event_type", et)
        .append("user_id", uid).append("value", v))
    } finally w.close()
    dir.getAbsolutePath
  }

  private def writeNsCorpus(): String =
    writeCorpus(LogicalTypeAnnotation.TimeUnit.NANOS,
      adjustedToUtc = true, nsRemainder = true)

  // TIMESTAMP(MICROS) isAdjustedToUTC=false — the current generation
  private def writeUsCorpus(): String =
    writeCorpus(LogicalTypeAnnotation.TimeUnit.MICROS,
      adjustedToUtc = false, nsRemainder = false)

  test("ns- and µs-generation events read to the same TimestampType surface") {
    val (nsDir, usDir) = (writeNsCorpus(), writeUsCorpus())
    for (dir <- Seq(nsDir, usDir)) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir: ts must surface as TimestampType")
    }
    def instants(dir: String): Seq[(Long, String)] =
      Tables.events(spark, dir)
        .select(unix_micros(col("ts")), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(instants(nsDir) == instants(usDir),
      "both generations must yield identical µs instants (ns remainder truncates)")
    assert(instants(usDir).map(_._1) == rowsUs.map(_._1).sorted)
  }

  test("lokiView + ts-range pushdown query agree across corpus generations") {
    val (nsDir, usDir) = (writeNsCorpus(), writeUsCorpus())
    def q(dir: String): Seq[(Long, String, String)] =
      Tables.lokiView(spark, dir)
        .filter(col("timestamp") >= lit("2024-01-01 00:30:00").cast("timestamp"))
        .filter(element_at(col("labels"), "event_type") === "purchase")
        .select(unix_micros(col("timestamp")),
          element_at(col("labels"), "user"), col("line"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
        .sorted
    val (nsRes, usRes) = (q(nsDir), q(usDir))
    assert(nsRes == usRes, "view query must not depend on the corpus generation")
    assert(nsRes == Seq((baseUs + 1800L * 1000000L, "11", "purchase value=2.5")))
    // on the µs generation ts is a plain parquet column, so the range
    // filter must reach the scan; the ns generation computes ts (DIV
    // arithmetic) and legitimately filters post-scan
    val usPlan = Tables.lokiView(spark, usDir)
      .filter(col("timestamp") >= lit("2024-01-01 00:30:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(usPlan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"µs corpus must push the ts bound to the scan:\n$usPlan")
  }

  test("streaming file source agrees across corpus generations") {
    // StreamingOps.eventsStream carries the same LongType branch as
    // Tables.events (ns Long -> DIV 1000 -> timestamp_micros); drive the
    // hourly-window pipeline over BOTH generations through the real
    // file-stream source and require identical final state.
    import graft.streaming.StreamingOps
    import org.apache.spark.sql.streaming.OutputMode
    val (nsDir, usDir) = (writeNsCorpus(), writeUsCorpus())
    def drained(dir: String): Seq[(Long, String, Long, Double)] =
      StreamingOps.runToMemory(
        StreamingOps.hourlyWindow(spark, dir),
        s"corpusgen_${math.abs(dir.hashCode)}", OutputMode.Complete())
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
    val (nsRes, usRes) = (drained(nsDir), drained(usDir))
    assert(nsRes == usRes,
      s"streamed state must not depend on the corpus generation:\n$nsRes\n$usRes")
    assert(nsRes == Seq(
      (baseUs, "click", 1L, 1.5),
      (baseUs, "purchase", 1L, 2.5),
      (baseUs + 3600L * 1000000L, "click", 1L, 3.5)))
  }
}
