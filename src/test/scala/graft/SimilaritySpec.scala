package graft

/** ANN family: brute-force is the ground truth; IVF must hit decent recall
  * on it while scanning only probed clusters.
  */
class SimilaritySpec extends SparkTestBase {

  private def topk(name: String): Map[Long, Seq[Long]] =
    q(name).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }

  test("brute-force topk: 5 neighbors per query, self excluded, sims descending") {
    val rows = q("sim_brute_topk").collect()
    assert(rows.length == 20 * 5)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sim_mmr_rerank matches a naive greedy replay; diversity penalty is active") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val v6 = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          x => round(x * 1e6, 0).cast("long")))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, v) => id -> v.toArray }.toMap
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val expect = (for (q0 <- v6.keys.toSeq.sorted if q0 < 20) yield {
      val pool = v6.keys.filter(_ != q0).toSeq
        .map(id => (id, dot(v6(q0), v6(id))))
        .sortBy { case (id, rel) => (-rel, id) }.take(20)
      var selected = List.empty[Long]
      (1 to 5).map { r =>
        val (sc, id) = pool.filterNot(c => selected.contains(c._1)).map {
          case (id, rel) =>
            val mx = if (selected.isEmpty) 0L
                     else selected.map(s => dot(v6(id), v6(s))).max
            (7L * rel - 3L * mx, id)
        }.minBy { case (s, id) => (-s, id) }
        selected ::= id
        (q0, r, id, sc)
      }
    }).flatten
    val got = q("sim_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.sorted == expect.sorted)
    // the penalty must actually bite: some query's MMR list diverges from
    // its pure-relevance top-5 (otherwise λ might as well be 1)
    val mmrSets = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet)
    val diverged = mmrSets.count { case (q0, ids) =>
      val top5 = v6.keys.filter(_ != q0).toSeq
        .map(id => (id, dot(v6(q0), v6(id))))
        .sortBy { case (id, rel) => (-rel, id) }.take(5).map(_._1).toSet
      ids != top5
    }
    assert(diverged > 0, "diversity term never changed a ranking")
  }

  test("radius search equals a first-principles cosine sweep; agrees with topk") {
    import org.apache.spark.sql.functions._
    val vs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val expect = (for {
      (q0, qv) <- vs if q0 < 20
      (n, nv) <- vs if n != q0
      c = math.rint(cos(qv, nv) * 1e4) / 1e4 if c >= 0.35
    } yield (q0, n, c)).toSet
    val got = q("sim_radius_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, "radius set must equal the naive sweep at 4dp")
    assert(got.nonEmpty)
    // consistency with top-k: any radius hit strong enough to beat a
    // query's 5th-ranked neighbor must itself be in the query's top-5
    val top = q("sim_brute_topk").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> (rs.map(_.getLong(2)).toSet, rs.map(_.getDouble(3)).min)
      }
    got.foreach { case (q0, n, c) =>
      val (ids, fifth) = top(q0)
      assert(c <= fifth || ids.contains(n),
        s"radius hit ($q0,$n,$c) beats the 5th-ranked sim $fifth but is not in top-5")
    }
  }

  test("custom TopKPerKeyExec equals the window-based top-k exactly") {
    val window = q("sim_brute_topk").collect().map(_.toSeq).toSeq
    val custom = q("sim_topk_exec").collect().map(_.toSeq).toSeq
    assert(custom == window)
    val p = q("sim_topk_exec").queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"custom exec not planned:\n$p")
    // the partial/final split: a map-side partial pass below the key
    // exchange pre-reduces every partition to ≤ keys×k rows, so the
    // shuffle never carries the full child relation
    val finalIdx = p.indexOf("TopKPerKey ")
    val partialIdx = p.indexOf("TopKPerKeyPartial")
    assert(finalIdx >= 0 && partialIdx > finalIdx, s"expected partial+final:\n$p")
    val between = p.substring(finalIdx, partialIdx)
    assert(between.contains("Exchange hashpartitioning"),
      s"key exchange must sit between final and partial:\n$p")
  }

  test("TopKPerKeyExec spills past the retained-row budget and stays exact") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.plans.TopKPerKeyExec
    // 60k rows over 10k distinct keys at k=3 → 30k retained rows, driven
    // through a 1,000-row budget: every partition must spill repeatedly
    // (heap state capped at ~budget, not O(keys·k)) and the merged output
    // must equal the window formulation row-for-row. This is the
    // high-cardinality contract the heap map alone would OOM on at scale.
    val key = TopKPerKeyExec.MAX_RETAINED_ROWS_KEY
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "1000")
    try {
      val df = spark.range(60000).toDF("id")
        .select(
          (col("id") % 10000).as("k"),
          (xxhash64(col("id")) % 1000000).as("score"),
          col("id"))
      val custom = graft.plans.GraftPlans
        .topKPerKey(df, Seq("k"), Seq(("score", true), ("id", true)), 3)
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy("k").orderBy(col("score"), col("id"))
      val viaWindow = df
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(custom == viaWindow,
        s"missed=${(viaWindow -- custom).take(5)} spurious=${(custom -- viaWindow).take(5)}")
      assert(custom.size == 30000)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("IVF topk recall@5 vs brute force is usable") {
    val brute = topk("sim_brute_topk")
    val ivf = graft.operators.SimilarityOps.ivfTop5(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    val recalls = brute.keys.toSeq.map { k =>
      val b = brute(k).toSet
      val i = ivf.getOrElse(k, Nil).toSet
      (b intersect i).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.length
    info(f"IVF recall@5 = $mean%.3f min=${recalls.min}%.2f over ${recalls.length} queries")
    assert(mean >= 0.5, f"recall collapsed: $mean%.3f")
  }

  test("IVF gate query reports mean recall_ok over the query set") {
    val rows = q("sim_ivf_topk").collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 20L)
    assert(rows.head.getBoolean(1), "mean recall@5 must reach 0.6")
  }

  test("PCA gate query: every eigen invariant holds on the real corpus") {
    val rows = q("embedding_pca_power").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == Tables.embeddings(spark, sf).count())
    assert(r.getInt(1) == 64)
    Seq("unit_norm_ok" -> 2, "rayleigh_ok" -> 3, "residual_ok" -> 4,
      "explained_ok" -> 5).foreach { case (nm, i) =>
      assert(r.getBoolean(i), s"$nm violated")
    }
  }

  test("PQ-ADC topk recall@5 vs brute force is usable") {
    val brute = topk("sim_brute_topk")
    val pq = graft.operators.SimilarityOps.pqTop5(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    val recalls = brute.keys.toSeq.map { k =>
      val b = brute(k).toSet
      val p = pq.getOrElse(k, Nil).toSet
      (b intersect p).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.length
    info(f"PQ recall@5 = $mean%.3f min=${recalls.min}%.2f over ${recalls.length} queries")
    assert(mean >= 0.5, f"recall collapsed: $mean%.3f")
  }

  test("PQ-ADC gate query reports mean recall_ok over the query set") {
    val rows = q("sim_pq_adc").collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 20L)
    assert(rows.head.getBoolean(1), "PQ mean recall@5 must reach 0.6")
  }

  /** Naive in-memory replica of kmeans8's contract: ×1e6 HALF_UP
    * quantization, 8 lowest-id seeds, two Lloyd rounds with int64 L2²
    * argmin (ties to lowest centroid id) and floor-divided means.
    */
  private def naiveKmeans(): (Map[Long, Long], Map[Long, Array[Long]]) = {
    val vs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(x => java.math.BigDecimal.valueOf(x * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue).toArray)
      .sortBy(_._1)
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, Long] =
      vs.map { case (id, v) =>
        id -> cents.map { case (cid, c) =>
          (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
        }.min._2
      }.toMap
    def means(a: Map[Long, Long]): Seq[(Long, Array[Long])] =
      vs.groupBy { case (id, _) => a(id) }.toSeq.map { case (cid, members) =>
        val dims = members.head._2.indices.map { i =>
          val s = members.map(_._2(i)).sum
          math.floor(s.toDouble / members.length).toLong
        }
        cid -> dims.toArray
      }.sortBy(_._1)
    val seeds = vs.filter(_._1 < 8).map { case (id, v) => (id, v) }.toSeq
    val c2 = means(assign(means(assign(seeds))))
    (assign(c2), c2.toMap)
  }

  test("embedding_kmeans census equals a naive in-memory Lloyd run bit-for-bit") {
    val (naive, cents) = naiveKmeans()
    val expected = naive.groupBy(_._2).map { case (cid, m) =>
      val ids = m.keys.toSeq
      (cid, ids.size.toLong, ids.min, ids.sum, cents(cid).sum)
    }.toSeq.sortBy(_._1)
    val got = q("embedding_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("sim_knn_graph census equals a naive 4-probe replay") {
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val (naive, cents) = naiveKmeans()
    val q6 = raw.view.mapValues(_.map(x => java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue)).toMap
    // 4 nearest clusters per node by the same int64 (distance, c_id) order
    val probe4: Map[Long, Seq[Long]] = raw.keys.map { id =>
      id -> cents.toSeq.map { case (cid, cv) =>
        (q6(id).zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
      }.sorted.take(4).map(_._2)
    }.toMap
    val byCluster = naive.keys.toSeq.groupBy(naive)
    def top3(src: Long, cands: Seq[Long]): Seq[Long] =
      cands.filter(_ != src)
        .sortBy(d => (-cos(raw(src), raw(d)), d)).take(3)
    val knn = raw.keys.toSeq.flatMap { src =>
      top3(src, probe4(src).flatMap(c => byCluster.getOrElse(c, Nil)))
        .map(src -> _)
    }.toSet
    val all = raw.keys.toSeq
    val hits = all.filter(_ < 200).map { src =>
      (top3(src, all).map(src -> _).toSet intersect knn).size
    }.sum
    val nProbes = all.count(_ < 200)
    val expected = (raw.size.toLong, knn.size.toLong, nProbes.toLong,
      hits.toLong, hits * 1000000L / (3L * nProbes))
    val r = q("sim_knn_graph").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == expected)
    // pruning is real AND the recall is production-usable: the 4-probe
    // graph recovers >= 0.7 of the true top-3 edges while scoring only
    // ~half the corpus (round-7 verdict item 5: was 0.53 at nprobe=2)
    assert(r.getLong(4) >= 700000L, s"recall6 ${r.getLong(4)} below 0.7")
  }

  test("dedup_semdedup removals equal the naive within-cluster pair scan") {
    val (naive, _) = naiveKmeans()
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val byCluster = naive.keys.toSeq.groupBy(naive)
    val expected = byCluster.toSeq.flatMap { case (cid, ids) =>
      val sorted = ids.sorted
      sorted.flatMap { b =>
        val keepers = sorted.filter(a => a < b && cos(raw(a), raw(b)) >= 0.4)
        if (keepers.isEmpty) None else Some((b, cid, keepers.min))
      }
    }.sortBy(_._1)
    val got = q("dedup_semdedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // the pruning is real: semdedup must never pair ACROSS clusters, so on
    // a corpus with cross-cluster near-dups it is a strict subset of the
    // corpus-wide pair relation restricted to co-clustered rows
    assert(got.forall { case (v, c, k) => naive(v) == c && naive(k) == c })
  }

  test("mmr rerank with a < 5-candidate pool returns the short list, no throw") {
    // pins the greedy-loop bound (round-8 verdict item 3): 4 vectors mean
    // every query's pool has 3 candidates, so the loop must stop at 3
    // instead of minBy-ing an empty iterator on round 4
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.9, 0.1))
    ).toDF("vec_id", "v")
    val got = operators.SimilarityOps.mmrRerank(e).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length == 12) // 4 queries x 3-deep lists
    assert(got.map(t => (t._1, t._2)).toSet ==
      (for (q0 <- 0L to 3L; r <- 1 to 3) yield (q0, r)).toSet)
    // each list is a permutation of the other three ids — nothing dropped
    got.groupBy(_._1).foreach { case (q0, rows) =>
      assert(rows.map(_._3).toSet == Set(0L, 1L, 2L, 3L) - q0)
    }
  }
}
