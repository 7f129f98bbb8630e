package graft

import graft.operators.MultimodalOps

/** Multimodal plumbing: binary payload round-trip, metadata struct, and the
  * partition-wise featurization path (schema + determinism).
  */
class MultimodalSpec extends SparkTestBase {

  test("media table: binary payload + typed metadata struct") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val schema = m.schema
    assert(schema("media").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = m.orderBy("doc_id").head()
    val payload = r.getAs[Array[Byte]]("media")
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") == payload.length)
    assert(meta.getAs[String]("mime") == "text/plain")
  }

  test("fakeDecode is a normalized 16-bin histogram") {
    val f = MultimodalOps.fakeDecode("hello world".getBytes("UTF-8"))
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0) < 1e-9)
    assert(f.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("multimodal_features is deterministic across runs and partitionings") {
    val a = q("multimodal_features").collect().toSeq
    val b = q("multimodal_features").repartition(7).collect()
      .sortBy(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("feature l2 is bounded by 1 (normalized histogram)") {
    assert(q("multimodal_features").collect()
      .forall { r => val l2 = r.getDouble(2); l2 > 0.0 && l2 <= 1.0 })
  }

  test("multimodal_audio_energy matches a naive windowed-energy replay") {
    import org.apache.spark.sql.functions._
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val expect = texts.filter(_._2.nonEmpty).map { case (id, t) =>
      val frames = t.grouped(32).toSeq
      val energies = frames.map(_.map(c => { val x = c.toLong - 96; x * x }).sum)
      val maxE = energies.max
      (id, frames.size.toLong, energies.sum, maxE,
        energies.indexOf(maxE).toLong)
    }.toSet
    val got = q("multimodal_audio_energy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
  }

  test("fakeResize strides bytes and pins length") {
    val r = MultimodalOps.fakeResize("abcdefghij".getBytes("UTF-8"), 4)
    assert(new String(r, "UTF-8") == "aei")
    assert(q("multimodal_resize").collect().forall { row =>
      row.getLong(2) == (row.getLong(1) + 3) / 4 // ceil(n/4)
    })
  }
}
