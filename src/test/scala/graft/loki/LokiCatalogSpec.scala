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

  test("DDL is rejected; unknown table errors") {
    intercept[Exception] {
      spark.sql("CREATE TABLE lokicat.default.other (x INT)")
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM lokicat.default.nope").collect()
    }
  }
}
