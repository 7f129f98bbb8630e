package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.Row

/** Specs for the corpus-statistics text operators added in round 5:
  * unigram-LM scoring, vocab id encoding, PMI bigrams, repeated spans.
  * Each test recomputes the expected value in plain Scala from the same
  * corpus (the quantization mirrors Spark's HALF_UP `round`), so the
  * checks are independent of the SQL oracle path.
  */
class TextStatsSpec extends SparkTestBase {

  private lazy val corpus: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))

  /** Spark's round(x, 0): BigDecimal HALF_UP (away from zero at .5). */
  private def q6(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, RoundingMode.HALF_UP).toLong

  test("text_unigram_logprob: sum_lp6 matches an exact Scala recomputation") {
    val toks = corpus.map { case (id, t) => (id, t.split(" ").toSeq) }
    val counts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val lp6 = counts.map { case (w, c) =>
      w -> q6(math.log(c.toDouble) - math.log(total.toDouble))
    }
    val expected = toks.map { case (id, ts) =>
      id -> (ts.size.toLong, ts.map(lp6).sum)
    }.toMap
    val got = q("text_unigram_logprob").collect()
    assert(got.length == corpus.size)
    got.foreach { r =>
      val (n, sum) = expected(r.getLong(0))
      assert(r.getLong(1) == n, s"n_tokens for doc ${r.getLong(0)}")
      assert(r.getLong(2) == sum, s"sum_lp6 for doc ${r.getLong(0)}")
      assert(r.getDouble(3) > 0, "nll must be positive")
    }
  }

  test("text_encode_ids: decoding through the frequency-ranked vocab roundtrips") {
    val toks = corpus.map { case (id, t) => (id, t.split(" ").toSeq) }
    val counts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // rank: count desc, token asc — the query's sorted zipWithIndex order
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._1).toIndexedSeq
    val open = graft.operators.TextOps.encodeIds(Tables.documents(spark, sf))
      .collect()
    assert(open.length == corpus.size)
    val byId = toks.toMap
    val digests = open.map { r =>
      val ids = r.getSeq[Long](1)
      val decoded = ids.map(i => vocab(i.toInt))
      assert(decoded == byId(r.getLong(0)), s"roundtrip for doc ${r.getLong(0)}")
      r.getLong(0) -> ids.mkString(",")
    }.toMap
    // the gate query ships the sequence as an md5 digest — same relation
    val md = java.security.MessageDigest.getInstance("MD5")
    q("text_encode_ids").collect().foreach { r =>
      val hex = md.digest(digests(r.getLong(0)).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(2) == hex, s"digest for doc ${r.getLong(0)}")
    }
  }

  test("text_pmi_bigrams: top row matches an exact Scala recomputation") {
    val toks = corpus.map(_._2.split(" ").toSeq).filter(_.size >= 2)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n1 = uni.values.sum
    val bi = toks.flatMap(ts => ts.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n2 = bi.values.sum
    def pmi6(bg: String): Long = {
      val Array(w1, w2) = bg.split(" ")
      q6(math.log(bi(bg).toDouble) - math.log(uni(w1).toDouble) -
        math.log(uni(w2).toDouble) + 2.0 * math.log(n1.toDouble) -
        math.log(n2.toDouble))
    }
    val expectedTop = bi.keys.toSeq.map(bg => (bg, bi(bg), pmi6(bg)))
      .sortBy { case (bg, _, p) => (-p, bg) }.take(20)
    val got = q("text_pmi_bigrams").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got == expectedTop)
  }

  test("text_bpe_merges: all eight rounds match a greedy Scala replay") {
    def mergeTokens(ts: Seq[String], w1: String, w2: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < ts.length) {
        if (i + 1 < ts.length && ts(i) == w1 && ts(i + 1) == w2) {
          out += s"$w1~$w2"; i += 2 // left-greedy non-overlapping
        } else { out += ts(i); i += 1 }
      }
      out.result()
    }
    var docs = corpus.map(_._2.split(" ").toSeq)
    val expected = (1 to 8).map { r =>
      val counts = docs.filter(_.size >= 2)
        .flatMap(_.sliding(2).map(_.mkString(" ")))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (pair, c) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      val Array(w1, w2) = pair.split(" ")
      docs = docs.map(mergeTokens(_, w1, w2))
      (r, pair, c)
    }
    val got = q("text_bpe_merges").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)

    // and the APPLY surface: the merged corpus must byte-match the
    // replay's final token sequences (md5 over the double-space text)
    val byId = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      .map { case (id, ts) =>
        var cur = ts
        expected.foreach { case (_, pair, _) =>
          val Array(w1, w2) = pair.split(" ")
          cur = mergeTokens(cur, w1, w2)
        }
        id -> cur
      }
    val md = java.security.MessageDigest.getInstance("MD5")
    val applied = q("text_bpe_apply").collect()
    assert(applied.length == corpus.size)
    applied.foreach { r =>
      val ts = byId(r.getLong(0))
      assert(r.getLong(1) == ts.size.toLong, s"n_tokens for doc ${r.getLong(0)}")
      val text = " " + ts.mkString("  ") + " "
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(2) == hex, s"text_md5 for doc ${r.getLong(0)}")
    }
  }

  test("documents_importance_weights: sum_lr6 matches an exact Scala recomputation") {
    val rows = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
      .filter(_._3.size >= 2)
    def bigrams(ts: Seq[String]) = ts.sliding(2).map(_.mkString(" ")).toSeq
    val src = rows.flatMap(r => bigrams(r._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgt = rows.filter(_._2 == "en").flatMap(r => bigrams(r._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ns = src.values.sum; val nt = tgt.values.sum
    val lr6 = src.keys.map { g =>
      g -> q6(math.log(tgt.getOrElse(g, 0L).toDouble + 0.5) -
        math.log(nt.toDouble + 0.5) - math.log(src(g).toDouble + 0.5) +
        math.log(ns.toDouble + 0.5))
    }.toMap
    val expected = rows.map { case (id, _, ts) =>
      id -> (bigrams(ts).size.toLong, bigrams(ts).map(lr6).sum)
    }.toMap
    val got = q("documents_importance_weights").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, sum) = expected(r.getLong(0))
      assert(r.getLong(1) == n, s"n_feats for doc ${r.getLong(0)}")
      assert(r.getLong(2) == sum, s"sum_lr6 for doc ${r.getLong(0)}")
    }
  }

  test("text_ngram_topk matches an exact Scala recomputation") {
    val rows = Tables.documents(spark, sf).select("lang", "text").collect()
      .toSeq.map(r => (r.getString(0), r.getString(1)))
    def grams(t: String): Seq[String] = {
      val ws = t.split(" ").toSeq
      if (ws.size >= 3) ws.sliding(3).map(_.mkString(" ")).toSeq
      else Seq(ws.mkString(" "))
    }
    val expected = rows.groupBy(_._1).flatMap { case (lang, rs) =>
      rs.flatMap(r => grams(r._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (g, c) => (-c, g) }.take(10)
        .map { case (g, c) => (lang, g, c) }
    }.toSet
    val got = q("text_ngram_topk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("documents_quality_zscore matches an exact Scala recomputation") {
    val rows = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def sq(t: String): Long = {
      val ws = t.split(" ")
      val n = ws.length.toDouble
      val dr = ws.distinct.length.toDouble / n
      val awl = (t.length - n + 1.0) / n
      q6(math.log(n) * 0.3 + dr * 0.5 + awl * 0.02)
    }
    val scored = rows.map { case (id, lang, t) => (id, lang, sq(t)) }
    val stats = scored.groupBy(_._2).map { case (lang, rs) =>
      val xs = rs.map(_._3)
      lang -> (xs.size.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val expected = scored.map { case (id, lang, x) =>
      val (n, s, ss) = stats(lang)
      val det = BigInt(n) * BigInt(ss) - BigInt(s) * BigInt(s)
      val z = if (det == 0) 0.0
        else (n * x - s).toDouble / math.sqrt(det.toDouble)
      val z4 = BigDecimal(z * 1e4).setScale(0, RoundingMode.HALF_UP).toLong
      id -> (z4, z >= 0)
    }.toMap
    val got = q("documents_quality_zscore").collect()
    assert(got.length == rows.size)
    got.foreach { r =>
      val (z4, above) = expected(r.getLong(0))
      assert(r.getLong(2) == z4, s"z_q4 for doc ${r.getLong(0)}")
      assert(r.getBoolean(3) == above, s"above flag for doc ${r.getLong(0)}")
    }
    // the whole point of normalization: both flags occur in every language
    val byLang = got.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      assert(rs.exists(_.getBoolean(3)) && rs.exists(!_.getBoolean(3)),
        s"$lang must have docs on both sides of its mean")
    }
  }

  test("dupSpans: short-doc fallback treats the whole text as the single span") {
    import spark.implicits._
    // docs 1/2 are identical 3-token texts (< 8 tokens → whole-text span,
    // shared); doc 3 is a distinct short text (unshared); docs 4/5 are
    // 9-token texts overlapping in all but the last token
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"),
      (4L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (5L, "t1 t2 t3 t4 t5 t6 t7 t8 zz")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.dupSpans(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // docs 4/5 have 2 distinct 8-grams each; "t1..t8" is shared
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L),
      (4L, 2L, 1L), (5L, 2L, 1L)))
  }

  test("text_dup_spans: ratios consistent and the planted near-dups share spans") {
    val got = q("text_dup_spans").collect()
    assert(got.length == corpus.size)
    var anyShared = false
    got.foreach { case Row(id: Long, n: Long, shared: Long, ratio: Double, heavy: Boolean) =>
      assert(shared <= n, s"doc $id: shared > spans")
      assert(math.abs(ratio - BigDecimal(shared.toDouble / n)
        .setScale(4, RoundingMode.HALF_UP).toDouble) < 1e-12)
      assert(heavy == (ratio > 0.5))
      if (shared > 0) anyShared = true
    }
    assert(anyShared, "the corpus' planted near-dups must share 8-token spans")
  }

  test("documents_shuffle_order is a dense permutation of the corpus") {
    val rows = q("documents_shuffle_order").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == corpus.size)
    assert(rows.map(_._1).distinct.length == rows.length, "doc_ids unique")
    assert(rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq,
      "positions must be exactly 0..n-1")
    // content-addressed: the order is the md5 order, not the id order
    val byPos = rows.sortBy(_._2).map(_._1).toSeq
    assert(byPos != byPos.sorted, "order must not degenerate to id order")
  }

  test("documents_mixture_weights matches an exact Scala recomputation") {
    val bySource = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .view.mapValues(rs =>
        (rs.length.toLong, rs.map(_.getString(1).split(" ").length.toLong).sum))
      .toMap
    val total = bySource.values.map(_._2).sum
    val n = bySource.size.toLong
    val got = q("documents_mixture_weights").collect()
    assert(got.length == bySource.size)
    got.foreach { r =>
      val (nd, st) = bySource(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == st)
      val rate6 = math.min(1000000L,
        math.floor(1000000.0 * total / (n * st)).toLong)
      val epochs = math.ceil(total.toDouble / (n * st)).toLong
      assert(r.getLong(3) == rate6, s"rate6 for ${r.getString(0)}")
      assert(r.getLong(4) == epochs, s"epochs for ${r.getString(0)}")
      assert(r.getLong(3) <= 1000000L && r.getLong(4) >= 1L)
    }
    // a source above its target share must be downsampled (rate < 1)
    val overShare = bySource.filter { case (_, (_, st)) => st * n > total }
    if (overShare.nonEmpty)
      assert(got.exists(_.getLong(3) < 1000000L), "dominant source not downsampled")
  }

  test("documents_ppl_buckets: terciles partition each language near-equally, ordered by nll") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val got = q("documents_ppl_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"$lang: buckets must be 1..k")
      assert(sorted.map(_._3).sum == docs(lang), s"$lang: buckets must partition")
      assert(sorted.map(_._3).max - sorted.map(_._3).min <= 1,
        s"$lang: ntile sizes differ by more than 1")
      // nll ranges are ordered and non-overlapping across buckets
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$lang: bucket ranges overlap")
        case _ =>
      }
    }
  }

  test("CMS never underestimates ANY token, and gate rows match an exact grid replay") {
    val counts = corpus.flatMap(_._2.split(" ", -1))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def bucket(t: String, i: Int): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$t#$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 3)
    val grid = scala.collection.mutable.HashMap[(Int, String), Long]()
    counts.foreach { case (t, c) =>
      (0 until 4).foreach { i =>
        grid((i, bucket(t, i))) = grid.getOrElse((i, bucket(t, i)), 0L) + c
      }
    }
    def est(t: String): Long = (0 until 4).map(i => grid((i, bucket(t, i)))).min
    // the defining CMS property, checked over the WHOLE vocabulary
    counts.foreach { case (t, c) => assert(est(t) >= c, s"underestimate for '$t'") }
    val got = q("text_heavy_hitters_cms").collect()
    assert(got.length == 20)
    got.foreach { r =>
      assert(r.getLong(1) == counts(r.getString(0)))
      assert(r.getLong(2) == est(r.getString(0)), s"estimate for ${r.getString(0)}")
      assert(r.getBoolean(3))
    }
  }

  test("text_keyword_tfidf matches an exact integer recomputation") {
    val docs = corpus
    val n = docs.size.toLong
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, ws) => (id, w, ws.length.toLong) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def idf6(term: String): Long =
      BigDecimal(math.log((n + 1.0) / (df(term) + 1.0)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = tf.map { case (id, w, f) => (id, w, f * idf6(w)) }
      .groupBy(_._1).view.mapValues(
        _.toSeq.sortBy { case (_, w, sc) => (-sc, w) }.take(3)).toMap
    val got = q("text_keyword_tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == expect.values.map(_.size).sum)
    got.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.toSeq == expect(id).map { case (_, w, sc) => (id, w, sc) },
        s"top-3 keywords for doc $id")
    }
  }

  test("text_scrub_pii finds exactly the planted PII") {
    val got = q("text_scrub_pii").collect()
    assert(got.length == corpus.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val expectedEmails = if (id % 2 == 0) 2L else 1L
      assert(r.getLong(1) == expectedEmails, s"doc $id n_emails")
      assert(r.getLong(2) == 1L, s"doc $id n_phones")
    }
    // the scrub is effective end to end: replaying plant+scrub in plain
    // Scala on one doc reproduces the emitted md5 (regex semantics match)
    val (id0, text0) = corpus.head
    val planted = text0 + s" contact user$id0@example.com" +
      (if (id0 % 2 == 0) s" or admin$id0@mail.example.org" else "") +
      f" call 555-${id0 % 10000}%04d"
    val scrubbed = planted
      .replaceAll("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>")
      .replaceAll("555-[0-9]{4}", "<PHONE>")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(scrubbed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val row0 = got.find(_.getLong(0) == id0).get
    assert(row0.getString(3) == md, "scrubbed md5 must match a local replay")
  }

  test("documents_ngram_novelty equals a naive first-seen trigram replay") {
    // naive replica of the shingle idiom: sliding word trigrams when the
    // doc has ≥ 3 tokens, else the whole text as one gram; distinct per
    // doc; a gram is novel for the LOWEST doc_id that contains it
    val sh: Map[Long, Set[String]] = corpus.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val grams =
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
        else Set(ws.mkString(" "))
      id -> grams
    }.toMap
    val firstSeen: Map[String, Long] = sh.toSeq
      .flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val got = q("documents_ngram_novelty").collect()
    assert(got.length == corpus.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val grams = sh(id)
      val novel = grams.count(g => firstSeen(g) == id)
      assert(r.getLong(1) == grams.size.toLong, s"doc $id n_grams")
      assert(r.getLong(2) == novel.toLong, s"doc $id n_novel")
      assert(math.abs(r.getDouble(3) -
        BigDecimal(novel.toDouble / grams.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0,
        s"doc $id novelty")
    }
    // the census is meaningful on this corpus: some docs are fully novel,
    // and the planted near-dup docs shed novelty to their earlier twins
    assert(got.exists(_.getDouble(3) == 1.0))
    assert(got.exists(_.getDouble(3) < 1.0))
  }

  test("text_quality_classifier matches a first-principles weighted replay") {
    val w10 = Map("data" -> 12L, "fast" -> 8L, "spark" -> 6L, "join" -> 5L,
      "big" -> 4L, "slow" -> -10L, "a" -> -3L, "the" -> -3L)
    val expect = corpus.map { case (id, text) =>
      val tk = text.split(" ", -1)
      val sw = tk.iterator.map(t => w10.getOrElse(t, 0L)).sum
      val z = sw.toDouble / (10.0 * tk.length) - 0.05
      val prob = z / (1.0 + math.abs(z))
      (id, tk.length.toLong, sw,
        math.floor(z * 1000000.0 + 0.5).toLong,
        math.floor(prob * 1000000.0 + 0.5).toLong,
        z > 0)
    }.sortBy(_._1)
    val got = q("text_quality_classifier").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expect)
    assert(got.exists(_._6) && got.exists(!_._6),
      "both classes must be present on the corpus")
  }

  test("text_intradoc_dedup equals a naive keep-first chunk replay") {
    val got = q("text_intradoc_dedup").collect()
    assert(got.length == corpus.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val ws0 = corpus.toMap.apply(id).split(" ", -1)
      val ws = if (id % 5 == 0) ws0.take(10) ++ ws0 else ws0
      val chunks = ws.grouped(10).map(_.mkString(" ")).toVector
      val kept = chunks.zipWithIndex
        .filter { case (c, i) => chunks.indexOf(c) == i }.map(_._1)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getLong(1) == chunks.size.toLong, s"doc $id n_chunks")
      assert(r.getLong(2) == kept.size.toLong, s"doc $id n_kept")
      assert(r.getString(3) == md, s"doc $id dedup_md5")
      // planted docs long enough for two full chunks MUST dedup; organic
      // docs must be untouched (the corpus has no intra-doc repeats)
      if (id % 5 == 0 && ws0.length >= 10)
        assert(r.getLong(2) < r.getLong(1), s"doc $id planted dup must drop")
      if (id % 5 != 0)
        assert(r.getLong(2) == r.getLong(1), s"doc $id organic must keep all")
    }
  }

  test("dupSpanMerge: islands merge overlap+adjacency, exclude short docs and intra-doc repeats") {
    import spark.implicits._
    import graft.operators.TextOps
    def words(ids: Range, p: String): String = ids.map(i => s"$p$i").mkString(" ")
    // docs 1 and 2 share tokens w0..w11 (a 12-token run = five 8-gram
    // positions 0..4 in doc 1 — one maximal span [0, 11], 12 tokens) and,
    // separately, w20..w27 (one 8-gram). In doc 1 the two shared runs are
    // separated by 10 unique tokens, so they must stay TWO islands; in
    // doc 3 an intra-doc repeated phrase (x0..x7 twice) must not count
    // (cross-document only). Doc 4 has 7 tokens — below the span width.
    val d1 = words(0 to 11, "w") + " " + words(0 to 9, "u") + " " + words(20 to 27, "w")
    val d2 = words(100 to 105, "z") + " " + words(0 to 11, "w") + " " +
      words(200 to 205, "y") + " " + words(20 to 27, "w")
    val d3 = words(0 to 7, "x") + " " + words(300 to 309, "v") + " " + words(0 to 7, "x")
    val d4 = words(0 to 6, "s")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4)).toDF("doc_id", "text")
    val got = TextOps.dupSpanMerge(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: spans [0,11] (12 tokens) and [22,29] (8) — 2 islands, 20 covered
    assert(got(1L) == ((2L, 20L, 12L)), s"doc1 got ${got.get(1L)}")
    // doc 2: same two runs at positions [6,17] and [24,31]
    assert(got(2L) == ((2L, 20L, 12L)), s"doc2 got ${got.get(2L)}")
    // doc 3: intra-doc repeat only → no cross-doc span; doc 4: too short
    assert(!got.contains(3L) && !got.contains(4L), s"got $got")
  }

  test("dupSpanMerge merges ADJACENT spans (gap exactly 8) into one island") {
    import spark.implicits._
    import graft.operators.TextOps
    // doc 5 shares a0..a7 with doc 6 and b0..b7 with doc 7; in doc 5 they
    // are back-to-back (positions 0 and 8: touching intervals [0,7]+[8,15])
    // → ONE island of 16 tokens even though no single 8-gram spans the seam
    val d5 = (0 to 7).map(i => s"a$i").mkString(" ") + " " +
      (0 to 7).map(i => s"b$i").mkString(" ")
    val d6 = (0 to 7).map(i => s"a$i").mkString(" ") + " " +
      (0 to 9).map(i => s"q$i").mkString(" ")
    val d7 = (0 to 9).map(i => s"r$i").mkString(" ") + " " +
      (0 to 7).map(i => s"b$i").mkString(" ")
    val docs = Seq((5L, d5), (6L, d6), (7L, d7)).toDF("doc_id", "text")
    val got = TextOps.dupSpanMerge(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(5L) == ((1L, 16L, 16L)), s"doc5 got ${got.get(5L)}")
    assert(got(6L) == ((1L, 8L, 8L)) && got(7L) == ((1L, 8L, 8L)), s"got $got")
  }

  test("documents_token_budget equals a naive greedy per-source replay") {
    val rows = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // replay the x1e6-quantized quality score exactly (Spark round = HALF_UP)
    def sq(text: String): Long = {
      val ts = text.split(" ", -1)
      val nt = ts.length.toDouble
      val score = math.log(nt) * 0.3 + (ts.distinct.length / nt) * 0.5 +
        ((text.length - nt + 1.0) / nt) * 0.02
      BigDecimal(score * 1e6).setScale(0, RoundingMode.HALF_UP).toLong
    }
    val expected = rows.groupBy(_._2).map { case (src, ds) =>
      val ordered = ds.map { case (id, _, t) =>
        (id, t.split(" ", -1).length.toLong, sq(t))
      }.sortBy { case (id, _, s) => (-s, id) }
      var ct = 0L
      val kept = ordered.takeWhile { case (_, nt, _) => ct += nt; ct <= 600L }
      src -> ((kept.size.toLong, kept.map(_._2).sum, ds.size.toLong,
        ordered.map(_._2).sum))
    }
    val got = q("documents_token_budget").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected,
      s"diff=${expected.toSet.diff(got.toSet)} | ${got.toSet.diff(expected.toSet)}")
    // the budget must actually bind somewhere (else the row tests nothing)
    assert(expected.exists { case (_, (k, _, n, _)) => k < n },
      "at least one source must be cut by the budget")
  }

  test("upsertLatest equals a naive fold on random feeds (seeded)") {
    import spark.implicits._
    import graft.operators.TextOps
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { round =>
      val nKeys = 1 + rnd.nextInt(20)
      val raw = (1 to 200).map { _ =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(1000000).toLong,
          if (rnd.nextInt(4) == 0) "D" else "U",
          rnd.alphanumeric.take(5).mkString)
      }
      // versions unique per key (the operator's CDC-feed precondition)
      val uniq = raw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val expected = uniq.groupBy(_._1).flatMap { case (k, rs) =>
        val w = rs.maxBy(_._2)
        if (w._3 == "D") None else Some((k, w._2, w._4))
      }.toSet
      val got = TextOps.upsertLatest(
          uniq.toDF("doc_id", "version", "op", "text"),
          "doc_id", "version", "op")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
      assert(got == expected, s"seeded round $round diverged")
    }
  }

  test("upsertLatest keeps the highest version and drops tombstoned keys in one exchange") {
    import spark.implicits._
    import graft.operators.TextOps
    val feed = Seq(
      (1L, 1L, "U", "one-v1"), (1L, 3L, "U", "one-v3"), (1L, 2L, "U", "one-v2"),
      (2L, 1L, "U", "two-v1"), (2L, 2L, "D", ""),
      (3L, 1L, "U", "three-v1"),
      (4L, 2L, "D", ""), (4L, 5L, "U", "four-v5")
    ).toDF("doc_id", "version", "op", "text")
    val out = TextOps.upsertLatest(feed, "doc_id", "version", "op")
    val got = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq
    // key 2's latest is the tombstone → gone; key 4's delete is SUPERSEDED
    // by a later upsert → resurrected (CDC latest-wins, not sticky delete)
    assert(got == Seq((1L, 3L, "one-v3"), (3L, 1L, "three-v1"),
      (4L, 5L, "four-v5")), s"got $got")
    // plan shape: the merge is ONE shuffle (partial max_by + exchange +
    // final), not a window sort of every version
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "latest-wins must not window-sort")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange:\n$plan")
  }
}
