package graft.loki

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties}

import graft.sources.loki.{LokiColumnarPagedReader, LokiInputPartition, LokiPartitionReader}
import graft.sources.loki.testkit.LokiStubServer

/** Randomized completeness property for the forward-cursor pager
  * (LokiPartitionReader.pagedRows): for ANY multiplicity profile —
  * including same-ns bursts wider than the page size, the silent-loss
  * hazard the held-run/doubling design exists for — a paged read
  * returns every seeded row exactly once. Drives the PartitionReader
  * directly (no Spark jobs), so 100 adversarial profiles run in
  * seconds; the projection omits `timestamp`, exercising the
  * cursor-column re-add in decode on every case.
  */
object LokiPagerProps extends Properties("LokiPager") {

  private val stub = new LokiStubServer
  stub.start()
  sys.addShutdownHook(stub.stop())

  private val base = 1704067200000000000L // 2024-01-01 ns

  // up to 12 consecutive seconds, each holding 1..30 rows at ONE shared
  // ns — with page sizes of 1..25, cuts land inside bursts constantly
  private val profile: Gen[List[Int]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(1, 30)))
  private val pageSize: Gen[Int] = Gen.chooseNum(1, 25)

  property("paged read is complete and duplicate-free for any burst profile") =
    Prop.forAll(profile, pageSize) { (mult, ps) =>
      // one shared stub, serialized cases (forAll may run concurrently)
      stub.synchronized {
        stub.clear()
        val rows = mult.zipWithIndex.flatMap { case (m, sec) =>
          (0 until m).map(i => stub.LogRow(base + sec * 1000000000L,
            Map("app" -> "p"), s"r-$sec-$i"))
        }
        stub.seed(rows)
        val part = LokiInputPartition(stub.endpoint, """{app="p"}""",
          Some(base), Some(base + 86400L * 1000000000L), None, Some(ps),
          StructType(Seq(StructField("line", StringType))))
        val reader = new LokiPartitionReader(part)
        val got = scala.collection.mutable.ArrayBuffer.empty[String]
        try {
          while (reader.next()) got += reader.get().getUTF8String(0).toString
        } finally reader.close()
        // the COLUMNAR pager (round 12) must return the identical
        // relation through its vector-offset cursor on every profile
        val creader = new LokiColumnarPagedReader(part)
        val cgot = scala.collection.mutable.ArrayBuffer.empty[String]
        try {
          while (creader.next()) {
            val it = creader.get().rowIterator()
            while (it.hasNext) cgot += it.next().getUTF8String(0).toString
          }
        } finally creader.close()
        val want = rows.map(_.line).sorted
        (Prop.?=(got.sorted.toSeq, want) :| s"row ps=$ps profile=$mult") &&
          (Prop.?=(cgot.sorted.toSeq, want) :| s"columnar ps=$ps profile=$mult")
      }
    }
}
