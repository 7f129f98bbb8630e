package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Unit + property tests for the native expressions (MinHash, SimHash,
  * rolling fingerprint, cosine, SRP signature, shingles). Property cases are
  * seeded-random sweeps (no scalatestplus bridge in the offline cache).
  */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("shingles produces n-2 trigram shingles in order") {
    val out = Seq("a b c d e").toDF("text")
      .select(shingles(split($"text", " "), 3).as("sh"))
      .as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d", "c d e"))
  }

  test("shingles falls back to whole text under n tokens") {
    val out = Seq("a b").toDF("text")
      .select(shingles(split($"text", " "), 3).as("sh"))
      .as[Seq[String]].head()
    assert(out == Seq("a b"))
  }

  test("winnow_fp honors the winnowing guarantee on a planted shared substring") {
    // any shared substring of length >= w+k-1 = 11 chars must share at
    // least one selected hash between the two documents
    val common = "qwertyuiopasdfghjkl" // 19 chars
    val df = Seq(
      "AAAAAAAAAAAAAAA" + common + "BBBBBBBBBBBBBBB",
      "x y z " + common + " m n o").toDF("text")
      .select(winnow_fp($"text", 4, 8).as("sel"))
    val Array(s1, s2) = df.as[Seq[Long]].collect()
    assert(s1.nonEmpty && s2.nonEmpty)
    assert(s1.intersect(s2).nonEmpty, "winnowing guarantee violated")
    assert(s1 == s1.sorted && s1.distinct == s1, "output must be sorted distinct")
  }

  test("winnow_fp edge cases: under k chars, one gram, under w grams") {
    val rows = Seq("", "abc", "abcd", "abcdefgh").toDF("text")
      .select(length($"text"), winnow_fp($"text", 4, 8).as("sel"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(rows(0).isEmpty && rows(3).isEmpty, "texts under k chars select nothing")
    assert(rows(4).length == 1, "one gram selects exactly it")
    // len 8 -> m = 5 grams < w = 8: one whole-document window, one minimum
    assert(rows(8).length == 1)
  }

  test("winnow_fp selection density tracks the 2/(w+1) expectation") {
    val rnd = new scala.util.Random(7)
    val text = (0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val sel = Seq(text).toDF("text")
      .select(winnow_fp($"text", 4, 8).as("sel")).as[Seq[Long]].head()
    val density = sel.length.toDouble / (text.length - 3)
    // expectation 2/9 ~ 0.22 for random hashes; distinct-set collapse only
    // lowers it, boundary effects raise it slightly
    assert(density > 0.1 && density < 0.4, s"density=$density")
  }

  test("minhash_sig is deterministic, k-length, and permutation-invariant") {
    val df = Seq(
      ("x", Seq("a", "b", "c", "d")),
      ("y", Seq("d", "c", "b", "a"))).toDF("id", "toks")
      .select($"id", minhash_sig($"toks", 32).as("sig"))
    val rows = df.as[(String, Seq[Long])].collect().toMap
    assert(rows("x").length == 32)
    assert(rows("x") == rows("y"), "minhash must not depend on token order")
  }

  test("minhash jaccard estimate tracks true jaccard") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 10).map(_ => (1 + rnd.nextInt(30), 1 + rnd.nextInt(30)))
    for ((shared, distinct) <- cases) {
      val common = (0 until shared).map(i => s"c$i")
      val a = common ++ (0 until distinct).map(i => s"a$i")
      val b = common ++ (0 until distinct).map(i => s"b$i")
      val df = Seq(("a", a), ("b", b)).toDF("id", "toks")
        .select($"id", minhash_sig($"toks", 128).as("sig"))
      val sigs = df.as[(String, Seq[Long])].collect().toMap
      val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 128.0
      val truth = shared.toDouble / (shared + 2.0 * distinct)
      assert(math.abs(est - truth) < 0.3, s"est=$est truth=$truth")
    }
  }

  test("simhash64: equal token sets equal sigs; similar sets near in hamming") {
    val base = (0 until 50).map(i => s"tok$i")
    val near = base.updated(0, "changed")
    val far = (0 until 50).map(i => s"other$i")
    val df = Seq(("b", base), ("n", near), ("f", far)).toDF("id", "toks")
      .select($"id", simhash64($"toks").as("sig"))
    val sigs = df.as[(String, Long)].collect().toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sigs("b"), sigs("b")) == 0)
    assert(ham(sigs("b"), sigs("n")) < ham(sigs("b"), sigs("f")),
      "one-token change must be closer than a disjoint doc")
  }

  test("rolling_fp deterministic and collision-free on the corpus") {
    val docs = Tables.documents(spark, sf)
    val n = docs.select(rolling_fp(lower($"text")).as("fp")).distinct().count()
    assert(n == docs.count(), "no collisions expected on 500 distinct docs")
  }

  test("cosine_sim matches hand-computed value and bounds") {
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0))).toDF("a", "b")
      .select(cosine_sim($"a", $"b").as("c"))
    assert(math.abs(df.as[Double].head() - 0.5) < 1e-12)
    val rnd = new scala.util.Random(7)
    val cases = (0 until 10).map { _ =>
      (Seq.fill(8)(rnd.nextDouble() * 10 - 5), Seq.fill(8)(rnd.nextDouble() * 10 - 5))
    }
    val cs = cases.toDF("a", "b").select(cosine_sim($"a", $"b")).as[Double].collect()
    assert(cs.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }

  test("dot_long / l2sq_long are bit-identical to the HOF folds they replace") {
    // the round-16 native rewrites must reproduce the
    // aggregate(zip_with(...)) results EXACTLY (same fold order, same
    // int64 arithmetic) on the quantized-vector domain. Inputs stay in
    // the ×1e6 quantization envelope (|x| ≤ 2e6, so 64-dim folds peak
    // ~2.6e14 ≪ int64): the HOF form runs under ANSI and THROWS on
    // overflow where the native loop would wrap — a divergence only
    // reachable where the replaced code crashed, never on the bounded
    // vectors every caller quantizes (documented in VectorOps).
    val rnd = new scala.util.Random(13)
    val cases = (0 until 50).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(rnd.nextLong() % 2000000L),
        Seq.fill(n)(rnd.nextLong() % 2000000L))
    }
    val df = cases.toDF("a", "b").select(
      dot_long($"a", $"b").as("dn"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L),
        (acc, z) => acc + z).as("dh"),
      l2sq_long($"a", $"b").as("ln"),
      aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)), lit(0L),
        (acc, z) => acc + z).as("lh"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"dot_long mismatch: $r")
      assert(r.getLong(2) == r.getLong(3), s"l2sq_long mismatch: $r")
    }
    // SQL registration surface
    val sqlRow = spark.sql(
      "SELECT dot_long(array(2L, 3L), array(4L, 5L)) d, " +
        "l2sq_long(array(2L, 3L), array(4L, 1L)) l").head()
    assert(sqlRow.getLong(0) == 23L && sqlRow.getLong(1) == 8L)
    // mismatched lengths are an error, matching cosine_sim's contract
    intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
        .select(dot_long($"a", $"b")).collect()
    }
  }

  test("precomputed-norm cosine is bit-identical to cosine_sim") {
    import graft.functions.GraftFunctions.dot_double
    // the round-16 pair-loop rewrite: cos = dot/(sqrt(Σa²)·sqrt(Σb²))
    // with per-row norm factors must reproduce cosine_sim EXACTLY —
    // same fold order, IEEE sqrt/÷ — including the zero-norm → 0.0 guard
    val rnd = new scala.util.Random(17)
    val cases = (0 until 100).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(rnd.nextDouble() * 10 - 5), Seq.fill(n)(rnd.nextDouble() * 10 - 5))
    } ++ Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),   // zero norm → 0.0
      (Seq(1.0, 2.0), Seq(0.0, 0.0)))
    val sna = sqrt(dot_double($"a", $"a"))
    val snb = sqrt(dot_double($"b", $"b"))
    val rows = cases.toDF("a", "b").select(
      cosine_sim($"a", $"b").as("ref"),
      when(sna === 0.0 || snb === 0.0, lit(0.0))
        .otherwise(dot_double($"a", $"b") / (sna * snb)).as("pre"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"cosine mismatch: $r")
    }
  }

  test("token_count is bit-identical to the size(filter(split)) HOF form") {
    // the round-17 langid rewrite: one native byte scan must reproduce
    // size(filter(split(text, " "), t => t === w)) on every input shape —
    // leading/trailing/consecutive spaces (empty segments), word at the
    // string boundaries, word as a substring of a longer token (no match),
    // empty text
    val rnd = new scala.util.Random(23)
    val words = Seq("the", "a", "data", "fast", "slow")
    val vocab = words ++ Seq("theo", "th", "b", "", "dataset")
    val cases = (0 until 80).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    } ++ Seq("", " ", "  ", "the", " the", "the ", "a  a", "the the the")
    val df = cases.toDF("text")
    words.foreach { w =>
      val rows = df.select(
        token_count($"text", lit(w)).as("native"),
        size(filter(split($"text", " "), t => t === w)).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getInt(0) == r.getInt(1), s"token_count('$w') mismatch: $r")
      }
    }
    // SQL registration surface
    assert(spark.sql("SELECT token_count('a b a', 'a') c").head().getInt(0) == 2)
  }

  test("char_trigrams equals the transform(sequence)+array_distinct HOF form") {
    // the round-17 trigram-index rewrite: distinct char trigrams in
    // first-occurrence order, empty under 3 chars
    val rnd = new scala.util.Random(29)
    val alpha = "abcde "
    val cases = (0 until 80).map { _ =>
      val n = rnd.nextInt(24)
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    } ++ Seq("", "ab", "abc", "aaaa", "abcabc")
    val rows = cases.toDF("s").select(
      char_trigrams($"s").as("native"),
      array_distinct(
        when(length($"s") >= 3,
          expr("transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))"))
          .otherwise(array())).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, h) => assert(n == h, s"char_trigrams mismatch: $n vs $h") }
    // SQL registration surface
    assert(spark.sql("SELECT char_trigrams('abcd') t").head()
      .getSeq[String](0) == Seq("abc", "bcd"))
  }

  test("sorted_intersect_count equals set intersection on random sorted arrays") {
    import graft.functions.GraftFunctions.sorted_intersect_count
    val rnd = new scala.util.Random(11)
    val cases = (0 until 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(sorted_intersect_count($"a", $"b")).as[Int].collect()
    assert(got.toSeq == cases.map(_._3))
    // empties on either side
    val e = Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L), Seq.empty[Long]))
      .toDF("a", "b").select(sorted_intersect_count($"a", $"b"))
      .as[Int].collect()
    assert(e.toSeq == Seq(0, 0))
  }

  test("srp_sig: identical vectors identical sigs; opposite vectors flip all bits") {
    val v = (0 until 16).map(_.toDouble + 1.0)
    val df = Seq(("p", v), ("n", v.map(-_))).toDF("id", "v")
      .select($"id", srp_sig($"v", 64, 42L).as("sig"))
    val sigs = df.as[(String, Long)].collect().toMap
    assert(java.lang.Long.bitCount(sigs("p") ^ sigs("n")) == 64)
  }

  test("SQL registration exposes the functions") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) c, " +
      "simhash64(array('a','b')) s, rolling_fp('abc') f, " +
      "term_counts(array('a','b','a')) tc").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getMap[String, Long](3) == Map("a" -> 2L, "b" -> 1L))
  }
}
