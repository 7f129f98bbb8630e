package graft.loki

import org.scalatest.BeforeAndAfterAll

import graft.SparkTestBase
import graft.sources.loki.LokiWrite
import graft.sources.loki.testkit.LokiStubServer

/** Pure-SQL access through the catalog plugin: SELECT with pushdown and
  * INSERT INTO VALUES with no temp view — the reference's
  * `ctx.sql(...)` entry points (README.md:24-38).
  */
class LokiCatalogSpec extends SparkTestBase with BeforeAndAfterAll {

  private val stub = new LokiStubServer

  override def beforeAll(): Unit = {
    stub.start()
    spark.conf.set("spark.sql.catalog.lokicat", "graft.sources.loki.LokiCatalog")
    spark.conf.set("spark.sql.catalog.lokicat.endpoint", stub.endpoint)
    spark.conf.set("spark.sql.catalog.lokicat.default_label", "app")
  }

  override def afterAll(): Unit = stub.stop()

  test("INSERT INTO catalog table via SQL (README.md:24)") {
    spark.sql(
      "INSERT INTO lokicat.default.loki VALUES " +
        "(current_timestamp(), map('app','cat-app'), 'catalog line')")
    assert(LokiWrite.lastCommittedRows(stub.endpoint) == 1L)
    assert(stub.ingested.exists(_.line == "catalog line"))
  }

  test("SELECT with label pushdown via SQL (README.md:30-38)") {
    val rows = spark.sql(
      "SELECT line FROM lokicat.default.loki " +
        "WHERE labels['app'] = 'cat-app' AND timestamp > timestamp'2020-01-01'")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("catalog line"))
    assert(stub.queries.last.startsWith("{app=\"cat-app\"}"))
  }

  test("readStream.table through the catalog tails the endpoint (round 12)") {
    // the MICRO_BATCH_READ capability makes catalog tables streamable
    // with zero extra wiring — the tail composes with the SQL-catalog
    // entry point exactly like a batch SELECT
    val base = 1704067200000000000L
    stub.seed((0 until 30).map(i =>
      stub.LogRow(base + i * 1000000000L, Map("app" -> "ct"), s"cat-$i")))
    // the stream window rides PER-READ options — newScanBuilder overlays
    // them on the catalog table's base config (round 12)
    val q = spark.readStream
      .option("stream_start_ns", base.toString)
      .option("stream_end_ns", (base + 3600L * 1000000000L).toString)
      .table("lokicat.default.loki")
      .filter(org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.col("labels"), "app") === "ct")
      .select("line")
      .writeStream.format("memory").queryName("cat_tail")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cat_tail_ck").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("cat_tail").collect().map(_.getString(0)).toSet
    assert(got == (0 until 30).map(i => s"cat-$i").toSet, s"got ${got.size}")
    // per-read overrides reach BATCH catalog reads too: an explicit
    // window + partitions override against the same table
    val batch = spark.read
      .option("partitions", "4")
      .table("lokicat.default.loki")
      .filter(
        org.apache.spark.sql.functions.col("timestamp") >=
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.lit(base / 1000)) &&
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.col("labels"), "app") === "ct")
    assert(batch.rdd.getNumPartitions == 4,
      "per-read partitions override must reach the scan")
    assert(batch.count() == 30)
  }

  test("meta.labels / meta.label_values: SHOW-style discovery with label pushdown (round 13)") {
    val base = 1704067200000000000L
    stub.seed(Seq(
      stub.LogRow(base + 1, Map("app" -> "a1", "env" -> "prod"), "m1"),
      stub.LogRow(base + 2, Map("app" -> "a2", "env" -> "dev"), "m2"),
      stub.LogRow(base + 3, Map("app" -> "a1", "zone" -> "us"), "m3")))
    def windowed(table: String) = spark.read
      .option("start_ns", (base + 1).toString)
      .option("end_ns", (base + 4).toString)
      .table(table)
    val labels = windowed("lokicat.meta.labels")
      .collect().map(_.getString(0)).toSet
    assert(labels == Set("app", "env", "zone"))
    val values = windowed("lokicat.meta.label_values")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(values == Set(
      "app" -> "a1", "app" -> "a2",
      "env" -> "prod", "env" -> "dev", "zone" -> "us"))
    // `label = 'x'` is pushed: one /values request, no /labels round trip
    val one = windowed("lokicat.meta.label_values")
      .where(org.apache.spark.sql.functions.col("label") === "env")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(one == Set("env" -> "prod", "env" -> "dev"))
    // a selector narrows the census to matching streams (values API's
    // `query` param); per-read option overlay carries it
    val sel = spark.read
      .option("start_ns", (base + 1).toString)
      .option("end_ns", (base + 4).toString)
      .option("selector", """{env="prod"}""")
      .table("lokicat.meta.label_values")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(sel == Set("app" -> "a1", "env" -> "prod"))
    // window honored: an empty window sees nothing
    val none = spark.read
      .option("start_ns", "1").option("end_ns", "2")
      .table("lokicat.meta.labels").count()
    assert(none == 0L)
    // SHOW TABLES surfaces the namespace's relations
    val shown = spark.sql("SHOW TABLES IN lokicat.meta")
      .collect().map(_.getString(1)).toSet
    assert(shown == Set("labels", "label_values", "series"))
    // series: each stream's canonical selector, match[]-narrowed by the
    // selector option; pasteable straight back into a LogQL query
    val streams = spark.read
      .option("start_ns", (base + 1).toString)
      .option("end_ns", (base + 4).toString)
      .table("lokicat.meta.series")
      .collect().map(_.getString(0)).toSet
    assert(streams == Set(
      """{app="a1", env="prod"}""",
      """{app="a2", env="dev"}""",
      """{app="a1", zone="us"}"""), streams)
    val matched = spark.read
      .option("start_ns", (base + 1).toString)
      .option("end_ns", (base + 4).toString)
      .option("selector", """{app="a1"}""")
      .table("lokicat.meta.series")
      .collect().map(_.getString(0)).toSet
    assert(matched == Set(
      """{app="a1", env="prod"}""", """{app="a1", zone="us"}"""), matched)
  }

  test("DDL is rejected; unknown table errors") {
    intercept[Exception] {
      spark.sql("CREATE TABLE lokicat.default.other (x INT)")
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM lokicat.default.nope").collect()
    }
  }
}
