package graft

import org.apache.spark.sql.Row

/** Dedup family: LSH candidate generation must not lose pairs the exact
  * computation finds (at the planted-near-dup thresholds), and approximate
  * variants must be sound (subset of exact).
  */
class DedupSpec extends SparkTestBase {

  private def pairs(name: String): Set[(Long, Long)] =
    q(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_exact keeps every distinct text once") {
    val docs = Tables.documents(spark, sf).count()
    assert(q("dedup_exact").count() == docs) // corpus has no exact dups
  }

  test("minhash LSH recovers exactly the exact-jaccard pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact,
      s"missed=${exact -- lsh} spurious=${lsh -- exact}")
  }

  test("simhash pairs respect the hamming bound and overlap the near-dup set") {
    val rows = q("dedup_simhash").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(2) <= 3))
    val sim = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.forall { case (a, b) => a < b })
    assert(sim.size == rows.length, "pairs must be distinct")
    // token-level simhash and 3-shingle jaccard measure different
    // granularities; expect overlap, not containment
    val exact = pairs("dedup_ngram_jaccard")
    assert((sim intersect exact).nonEmpty,
      "simhash near-dups should overlap exact near-dups")
  }

  test("SRP-LSH embedding pairs are a sound subset of the exact pairs") {
    val exact = pairs("dedup_embedding")
    val srp = pairs("dedup_embedding_srp")
    assert(srp.subsetOf(exact), s"spurious=${srp -- exact}")
  }

  test("embedding pair similarity values are within cosine bounds") {
    assert(q("dedup_embedding").collect()
      .forall { r => val c = r.getDouble(2); c >= 0.4 && c <= 1.0 })
  }
}
