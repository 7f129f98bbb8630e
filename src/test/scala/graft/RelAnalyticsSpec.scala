package graft

import org.apache.spark.sql.functions._

/** Product-analytics relational additions (funnel, retention cohorts,
  * TPC-H Q18) and the sub-document chunk dedup: each gate query's result
  * is re-derived here by an independent Scala computation over the
  * collected sf0.001 tables, so the differential gate (vs DuckDB) and
  * this spec (vs first-principles Scala) can't share a common bug.
  */
class RelAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val events: Seq[(Long, Long, String)] =
    Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_type"))
      .as[(Long, Long, String)].collect().toSeq

  test("events_funnel matches a first-principles sequential replay") {
    val byUser = events.groupBy(_._1)
    var viewed = 0; var clicked = 0; var converted = 0
    byUser.foreach { case (_, evs) =>
      val sorted = evs.map { case (_, t, e) => (t, e) }.sorted
      var t1 = -1L; var t2 = -1L; var t3 = -1L
      sorted.foreach { case (t, e) =>
        if (t1 < 0 && e == "view") t1 = t
        else if (t2 < 0 && e == "click" && t1 >= 0 && t > t1) t2 = t
        else if (t3 < 0 && e == "purchase" && t2 >= 0 && t > t2) t3 = t
      }
      if (t1 >= 0) viewed += 1
      if (t2 >= 0) clicked += 1
      if (t3 >= 0) converted += 1
    }
    val r = q("events_funnel").collect().head
    assert(r.getLong(0) == byUser.size)
    assert(r.getLong(1) == viewed && r.getLong(2) == clicked &&
      r.getLong(3) == converted)
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2) &&
      r.getLong(2) >= r.getLong(3), "funnel stages must be monotone")
    assert(r.getLong(3) > 0, "the corpus must exercise the full funnel")
  }

  test("events_retention_cohorts cells bound by cohort size; offset-0 complete") {
    val dayUs = 86400000000L
    val userDays = events.map { case (u, t, _) => (u, t / dayUs * dayUs) }.distinct
    val cohortOf = userDays.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cohortSize = cohortOf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expect = userDays
      .map { case (u, d) => (cohortOf(u), (d - cohortOf(u)) / dayUs) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("events_retention_cohorts").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == expect, "cells must equal the exact per-user replay")
    cohortSize.foreach { case (c, n) =>
      assert(got((c, 0L)) == n, s"offset-0 cell of cohort $c must hold every member")
    }
    got.foreach { case ((c, _), n) => assert(n <= cohortSize(c)) }
  }

  test("q18_large_customers: thresholds, ordering, and exact membership") {
    val qty = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("s"))
      .as[(Long, Double)].collect().toMap
    val rows = q("q18_large_customers").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val expectKeys = qty.filter { case (_, s) =>
      BigDecimal(s).setScale(2, BigDecimal.RoundingMode.HALF_UP) > 300.0
    }.keySet
    assert(rows.map(_.getLong(2)).toSet == expectKeys ||
      rows.length == 100, "below the cap the result is exactly the >300 set")
    rows.foreach(r => assert(qty(r.getLong(2)) > 300.0))
    val prices = rows.map(r => r.getDouble(4))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b },
      "descending totalprice")
  }

  test("dedup_chunk_exact matches a first-principles keep-first replay") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val seen = scala.collection.mutable.HashSet[String]()
    val expect = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val chunks = toks.grouped(20).map(_.mkString(" ")).toSeq
      val kept = chunks.filter(c => seen.add(c))
      (id, (chunks.length.toLong, kept.length.toLong,
        java.security.MessageDigest.getInstance("MD5")
          .digest(kept.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString))
    }.toMap
    val got = q("dedup_chunk_exact").collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (nc, nk, md) = expect(r.getLong(0))
      assert(r.getLong(1) == nc, s"n_chunks for doc ${r.getLong(0)}")
      assert(r.getLong(2) == nk, s"n_kept for doc ${r.getLong(0)}")
      assert(r.getString(3) == md, s"kept_md5 for doc ${r.getLong(0)}")
    }
    // the corpus' planted duplicates must actually remove something
    assert(got.map(_.getLong(2)).sum < got.map(_.getLong(1)).sum,
      "some chunk must be a cross- or within-doc duplicate")
  }

  test("graph_pagerank matches an exact integer replay; mass and floor invariants") {
    val e0 = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().as[(Long, Long)].collect()
    val edges = e0.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = deg.size.toLong
    val Q = 1000000000000L
    val teleport = 15L * Q / (100L * n)
    var r = deg.keys.map(k => k -> Q / n).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s0, _) => r(s0) / deg(s0) }.sum).toMap
      r = in.map { case (k, sum) => k -> (teleport + 85L * sum / 100L) }
    }
    val expect = r.toSeq
      .map { case (node, rk) =>
        (if (node % 2 == 0) "customer" else "supplier", node / 2, rk)
      }
      .sortBy { case (kind, key, rk) => (-rk, kind, key) }.take(20)
    val got = q("graph_pagerank").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2))).toSeq
    assert(got == expect, "top-20 must equal the exact integer replay")
    // floors only ever LOSE mass: total ≤ Q, and no node falls below teleport
    assert(r.values.sum <= Q)
    assert(r.values.forall(_ >= teleport))
  }

  test("events_daily_moving: trailing window self-consistent across its own rows") {
    val rows = q("events_daily_moving").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val daily = rows.map(r => ((r._1, r._2), r._3)).toMap
    rows.foreach { case (tpe, day, _, trailCents, trailDays, avgCents) =>
      val window = (day - 6 to day).flatMap(dd => daily.get((tpe, dd)))
      assert(window.sum == trailCents, s"trail_cents at ($tpe, $day)")
      assert(window.size == trailDays, s"trail_days at ($tpe, $day)")
      assert(trailCents / trailDays == avgCents, s"avg_cents at ($tpe, $day)")
    }
    // the range frame must actually span multiple days somewhere
    assert(rows.exists(_._5 > 1), "no multi-day window exercised")
  }

  test("text_hybrid_rrf: fusion arithmetic self-consistent; semantic anchor ranks first") {
    val rows = q("text_hybrid_rrf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (_, rrf6, lrank, srank) =>
      val expect = (if (lrank > 0) 1000000L / (60 + lrank) else 0L) +
        (if (srank > 0) 1000000L / (60 + srank) else 0L)
      assert(rrf6 == expect, "rrf6 must equal the integer RRF of its own ranks")
      assert(lrank >= 0 && lrank <= 20 && srank >= 0 && srank <= 20)
      assert(lrank > 0 || srank > 0)
    }
    assert(rows.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "rrf6 non-increasing")
    // doc 0 is the semantic query vector: cosine 1 with itself ⇒ srank 1
    val doc0 = rows.find(_._1 == 0L)
    assert(doc0.exists(_._4 == 1L), "doc 0 must lead the semantic list")
  }

  test("zorder: physical range layout on zval is disjoint; buckets bound BOTH dims") {
    // the physical contract lineitem_range_layout pins for one column,
    // here on the interleaved key: repartitionByRange(zval) must produce
    // ≤8 pairwise-disjoint z-ranges with no row loss
    val z = Tables.lineitem(spark, sf).select(
      (unix_micros(date_trunc("day", col("l_shipdate").cast("timestamp")))
        / 86400000000L).cast("long").as("day_num"),
      col("l_partkey"))
    val total = z.count()
    val mins = z.agg(min("day_num"), min("l_partkey")).head()
    val zval = (0 until 16).map { i =>
      shiftleft(shiftright((col("day_num") - mins.getLong(0)).bitwiseAND(65535), i)
        .bitwiseAND(1), 2 * i) +
        shiftleft(shiftright((col("l_partkey") - mins.getLong(1)).bitwiseAND(65535), i)
          .bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
    val parts = z.select(zval.as("zval"))
      .repartitionByRange(8, col("zval"))
      .select(spark_partition_id().as("pid"), col("zval"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n"), min("zval").as("mn"), max("zval").as("mx"))
      .collect().sortBy(_.getLong(2))
    assert(parts.map(_.getLong(1)).sum == total, "no row loss")
    assert(parts.length <= 8)
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2), "z-ranges must be disjoint")
      case _ =>
    }
    // corpus locality: strictly below the full extent in BOTH dims at once
    // (the sf0.001 corpus has only ~200 parts against ~1000 days, so the
    // interleave is day-dominated at toy scale — the quantitative claim is
    // pinned on the balanced grid below; sf0.01 bucket boxes halve both dims)
    val rows = q("lineitem_zorder_layout").collect()
      .map(r => (r.getLong(1), r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4)))
    val fullDay = rows.map(_._2).max
    val fullPk = rows.map(_._3).max
    val wMeanDay = rows.map(r => r._1.toDouble * r._2).sum / rows.map(_._1.toDouble).sum
    val wMeanPk = rows.map(r => r._1.toDouble * r._3).sum / rows.map(_._1.toDouble).sum
    assert(wMeanDay < fullDay, s"day extent not bounded: $wMeanDay vs $fullDay")
    assert(wMeanPk < fullPk, s"pk extent not bounded: $wMeanPk vs $fullPk")
  }

  test("zorder locality on a balanced grid: mean bucket AREA is a small fraction") {
    // 64×64 balanced grid — the regime z-order is built for: each of 8
    // contiguous z-ranges must cover a bounding box far below the full
    // square (a 1-D sort on x gives area ratio ≈ 1/8 only in x, ~1 in y;
    // the z-curve bounds both, pushing the area product well under it)
    val grid = spark.range(64L * 64L).select(
      (col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val zval = (0 until 16).map { i =>
      shiftleft(shiftright(col("x"), i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(col("y"), i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
    val boxes = grid.select(col("x"), col("y"), zval.as("z"))
      .select(col("x"), col("y"), (col("z") / 512).cast("long").as("b"))
      .groupBy("b").agg(
        (max("x") - min("x") + 1).as("dx"), (max("y") - min("y") + 1).as("dy"))
      .collect()
    assert(boxes.length == 8)
    val meanArea = boxes.map(r => r.getLong(1) * r.getLong(2)).sum / 8.0
    assert(meanArea <= 0.26 * 64 * 64,
      s"mean z-bucket area $meanArea must be ≤ ~1/4 of the full square")
  }

  test("lineitem_copurchase_pairs matches an exact pair recomputation") {
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val expect = op.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20)
    val got = q("lineitem_copurchase_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("lineitem_salted_join: equi-join keys on (flag, salt); result equals the plain aggregate") {
    val df = q("lineitem_salted_join")
    val p = df.queryExecution.executedPlan.toString
    // the whole point: the join key is the SALTED pair, not the 3-value
    // flag alone — each hot key spreads over 16 salt tasks
    assert(p.contains("BroadcastHashJoin [flag"), s"expected broadcast join:\n$p")
    assert(p.contains("salt"), s"join must key on the salt too:\n$p")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = Tables.lineitem(spark, sf)
      .groupBy(concat(lit("flag_"), col("l_returnflag")).as("flag_label"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("flag_label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == plain.toSeq, "salting must not change the result")
  }

  test("orders_cohort_ltv: cohort curves are cumulative and reconcile with totals") {
    val rows = q("orders_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        ((year(col("o_orderdate")) * 12) + month(col("o_orderdate"))).cast("long"),
        col("o_totalprice"))
      .as[(Long, Long, Double)].collect().toSeq
    val firstM = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val naiveRev = orders.groupBy { case (c, m, _) => (firstM(c), m - firstM(c)) }
      .view.mapValues(_.map(_._3).sum).toMap
    assert(rows.map(r => (r._1, r._2)).toSet == naiveRev.keySet)
    rows.foreach { case (cm, age, rev, _) =>
      assert(math.abs(rev - naiveRev((cm, age))) < 0.02, s"cohort $cm age $age")
    }
    // curves are strictly cumulative and end at the cohort's total revenue
    rows.groupBy(_._1).foreach { case (cm, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b._4 > a._4, s"cohort $cm cum_rev must increase")
      }
      val total = naiveRev.collect { case ((c, _), v) if c == cm => v }.sum
      assert(math.abs(sorted.last._4 - total) < 0.05, s"cohort $cm total")
    }
  }

  test("events_sliding_wau matches a naive 7-day visibility replay") {
    val daily = events.map { case (u, ts, _) => (ts / 86400000000L, u) }.distinct
    val hi = daily.map(_._1).max
    val expected = daily
      .flatMap { case (day, u) => (day to (day + 6).min(hi)).map(d => (d, u)) }
      .distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong)
      .toSeq.sortBy(_._1)
    val got = q("events_sliding_wau").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // sliding beats daily: some day's WAU strictly exceeds its daily count
    val dailyCount = daily.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got.exists { case (d, w) => w > dailyCount.getOrElse(d, 0L) })
  }

  test("events_transition_matrix matches a naive lag replay; probabilities sum to ~1") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val pairs = ev.groupBy(_._1).values.toSeq.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._4) }
    }
    val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = cnt.toSeq.map { case ((f, t), n) =>
      (f, t, n, n * 1000000L / fromTotals(f))
    }.sortBy { case (f, t, _, _) => (f, t) }
    val got = q("events_transition_matrix").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // each from-state's prob6 column sums to 1e6 within integer-floor slack
    got.groupBy(_._1).foreach { case (f, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$f: prob6 sum $s out of floor bounds")
    }
  }

  test("orders_association_rules matches a naive confidence/lift replay") {
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val nOrders = op.map(_._1).distinct.length.toLong
    val supp = op.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = op.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = pairCnt.toSeq.flatMap { case ((a, b), n) =>
      Seq((a, b, n), (b, a, n))
    }.map { case (ante, cons, n) =>
      val conf6 = n * 1000000L / supp(ante)
      // lift composes from the floored confidence — the overflow-bounded
      // form both engines compute
      (ante, cons, n, conf6, conf6 * nOrders / supp(cons))
    }.sortBy { case (a, c, _, conf, _) => (-conf, a, c) }.take(20)
    val got = q("orders_association_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // lift is informative: confident rules on this corpus beat independence
    assert(got.head._5 > 1000000L, "top rule should have lift > 1")
  }

  test("graph_triangles census matches a naive in-memory count") {
    val op = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val edges: Set[(Long, Long)] = op.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val nbrs: Map[Long, Set[Long]] = edges.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val degs = nbrs.view.mapValues(_.size.toLong).toMap
    // naive undirected count: every unordered node triple with all three
    // edges, counted via each edge's common-neighbor sets / 3
    val triples = edges.toSeq.map { case (a, b) =>
      (nbrs(a) intersect nbrs(b)).size.toLong
    }.sum
    assert(triples % 3 == 0)
    val expTri = triples / 3
    val expWedges = degs.values.map(d => d * (d - 1) / 2).sum
    val r = q("graph_triangles").collect().head
    assert(r.getLong(0) == degs.size.toLong, "n_nodes")
    assert(r.getLong(1) == edges.size.toLong, "n_edges")
    assert(r.getLong(2) == expWedges, "n_wedges")
    assert(r.getLong(3) == expTri, "n_triangles")
    assert(r.getLong(4) ==
      math.floor(3.0 * expTri * 1000000L / expWedges).toLong, "coeff6")
  }

  test("scaled-integer derivations survive int64-edge magnitudes") {
    import graft.operators.RelOps
    // varq: the intermediate n*ss = 1.6e19 overflows int64 (9.2e18) even
    // though the final value 7e18 fits -- the int64 form raised
    // ARITHMETIC_OVERFLOW here (the x64 smoke's failure class)
    val n = 4000000000L; val s0 = 3000000000L; val ss = 4000000000L
    val vq = Seq((n, s0, ss)).toDF("n", "s", "ss")
      .select(RelOps.varqDecimal(col("n"), col("s"), col("ss"))).head.getDecimal(0)
    assert(BigDecimal(vq) == BigDecimal(n) * BigDecimal(ss) - BigDecimal(s0) * BigDecimal(s0))
    // scaled ratio: num*1e6 = 2e19 overflows int64; the floored quotient
    // is exact against a BigInt replay
    val num = 20000000000000L; val den = 7L
    val r = Seq((num, den)).toDF("num", "den")
      .select(RelOps.scaledDiv("num", "1000000", "den")).head.getLong(0)
    assert(r == (BigInt(num) * 1000000 / den).toLong)
    // column factor form (the lift6 shape)
    val r2 = Seq((num, 3000000L, 11L)).toDF("num", "f", "den")
      .select(RelOps.scaledDiv("num", "f", "den")).head.getLong(0)
    assert(r2 == (BigInt(num) * 3000000L / 11L).toLong)
  }

  test("triangle census is exact with node ids beyond the old 1e9 packing cap") {
    // ids near 2^41: the retired deg*1e9+id orientation rank would have
    // overflowed (ANSI error) or collided; the two-column compare must
    // count exactly. Graph: co-purchase of orders {1:(a,b,c), 2:(b,c,d)}
    // -> edges ab,ac,bc,bd,cd; triangles {a,b,c},{b,c,d}; wedges
    // 1+3+3+1 = 8; coeff6 = floor(3*2*1e6/8) = 750000.
    val base = 1L << 41
    val li = Seq(1L -> (base + 1), 1L -> (base + 2), 1L -> (base + 3),
      2L -> (base + 2), 2L -> (base + 3), 2L -> (base + 4))
      .toDF("l_orderkey", "l_partkey")
    val r = graft.operators.RelOps.triangleCensus(li).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((4L, 5L, 8L, 2L, 750000L)))
  }

  test("scaledDiv/varqDecimal equal BigInt replays across 200 random magnitudes") {
    import graft.operators.RelOps
    // one DataFrame, one job: seeded magnitudes spanning 1..int64-edge,
    // every row checked against an exact BigInt replay — the bulk twin of
    // the two fixed edge tests
    val rnd = new scala.util.Random(11)
    def mag(): Long = {
      val bits = 1 + rnd.nextInt(62)
      math.max(1L, rnd.nextLong() & ((1L << bits) - 1))
    }
    val rows = Seq.fill(200)((mag(), mag(), mag(), 1L + rnd.nextInt(1000000)))
    val df = spark.createDataFrame(rows).toDF("n", "s", "ss", "den")
    val got = df.select(col("n"), col("s"), col("ss"), col("den"),
        RelOps.scaledDiv("s", "1000000", "den").as("r1"),
        RelOps.scaledDiv("s", "n", "den").as("r2"),
        RelOps.varqDecimal(col("n"), col("s"), col("ss")).as("vq"))
      .collect()
    got.foreach { r =>
      val (n, s, ss, den) = (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
        BigInt(r.getLong(2)), BigInt(r.getLong(3)))
      assert(r.getLong(4) == (s * 1000000 / den).toLong, s"r1 at $r")
      assert(r.getLong(5) == (s * n / den).toLong, s"r2 at $r")
      assert(BigDecimal(r.getDecimal(6)) == BigDecimal(n * ss - s * s),
        s"vq at $r")
    }
  }

  test("skewCensus reports exact key stats and the ceil-div salt factor") {
    import spark.implicits._
    import graft.operators.RelOps
    // key k: a is hot (7 of 10 rows), 3 singletons; key g: uniform
    val df = (Seq.fill(7)("a") ++ Seq("b", "c", "d")).zipWithIndex
      .map { case (k, i) => (k, s"g${i % 5}") }.toDF("k", "g")
    val got = RelOps.skewCensus(df, Seq("g", "k")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // k: 4 keys, 10 rows, max 7 → share6 = 700000, salt = ceil(224/10) = 23
    assert(got("k") == ((4L, 10L, 7L, 700000L, 23L)), s"got ${got.get("k")}")
    // g: 5 keys, max 2 → share6 = 200000, salt = ceil(64/10) = 7
    assert(got("g") == ((5L, 10L, 2L, 200000L, 7L)), s"got ${got.get("g")}")
    // a perfectly-uniform wide key needs no salt: 32 keys × 1 row
    val uni = (0 until 32).map(i => Tuple1(s"u$i")).toDF("u")
    val r = RelOps.skewCensus(uni, Seq("u")).collect().head
    assert(r.getLong(5) == 1L, s"uniform salt must be 1, got ${r.getLong(5)}")
  }

  test("graph_triangles plan: scan-local intersection over broadcast adjacency") {
    val p = q("graph_triangles").queryExecution.executedPlan.toString
    // the closure check is columnar array_intersect on attached adjacency
    // arrays — the wedge relation (Σ outdeg² rows) never materializes
    // through an exchange
    assert(p.contains("array_intersect"), s"expected scan-local intersection:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"rank/adjacency attachments should broadcast at gate scale:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("loki_label_top_lines: per-label caps, ordering, exact counts vs events") {
    val evRows = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), unix_micros(col("ts")))
      .as[(String, Double, Long)].collect()
    val lo = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val hi = java.time.Instant.parse("2024-03-01T00:00:00Z").toEpochMilli * 1000L
    val cnts = evRows.filter(e => e._3 >= lo && e._3 < hi)
      .groupBy(e => (e._1, s"${e._1} value=${e._2}"))
      .view.mapValues(_.length.toLong).toMap
    val got = q("loki_label_top_lines").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    got.groupBy(_._1).foreach { case (label, rows) =>
      assert(rows.length <= 5, s"$label must cap at 5")
      // each returned line's count is exact, and no unreturned line of this
      // label beats the weakest returned one under (cnt desc, line asc)
      rows.foreach { case (_, line, cnt) => assert(cnts((label, line)) == cnt) }
      val ord = Ordering.Tuple2[Long, String]
      val weakest = rows.map { case (_, l, c) => (-c, l) }.max(ord)
      cnts.filter(_._1._1 == label)
        .filterNot { case ((_, l), _) => rows.exists(_._2 == l) }
        .foreach { case ((_, l), c) =>
          assert(ord.compare((-c, l), weakest) > 0,
            s"$label: unreturned '$l' ($c) beats the returned top-5")
        }
    }
  }

  test("graph_kcore matches a first-principles peel replay (k=2 gate + k=15 multi-round)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val pairs = operators.RelOps.copurchaseCounts(li)
      .filter(col("n_orders") >= 2).select("p1", "p2")
      .as[(Long, Long)].collect()
    def replay(k: Int): Map[Long, Int] = {
      val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
      pairs.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
      var live = adj.keySet.toSet
      var changed = true
      while (changed) {
        val drop = live.filter(n => adj(n).count(live) < k)
        changed = drop.nonEmpty
        live = live -- drop
      }
      live.map(n => n -> adj(n).count(live)).toMap
    }
    val gate = q("graph_kcore").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(gate == replay(2), "k=2 gate result must equal the peel replay")
    // k=15 peels this graph over 5 rounds to a 149-node core (k=2 at
    // sf0.001 is the degenerate 0-round case — the whole graph IS the
    // 2-core; k≥16 collapses to empty)
    val k15 = operators.RelOps.kcore(li, 15).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val exp15 = replay(15)
    assert(k15 == exp15, "k=15 fixpoint must equal the peel replay")
    assert(exp15.nonEmpty && exp15.size < gate.size,
      "k=15 must peel a strict, non-empty subset so the loop is exercised")
    k15.values.foreach(d => assert(d >= 15, "every member keeps >= k in-core neighbors"))
  }

  test("orders_monthly_growth equals a naive lag replay; nulls only on first months") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        unix_micros(date_trunc("MONTH", col("o_orderdate"))), col("o_totalprice"))
      .as[(String, Long, Double)].collect()
    val monthly = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(v => math.floor(v._3 * 100 + 0.5).toLong).sum).toMap
    val expect = monthly.keys.toSeq.groupBy(_._1).toSeq.flatMap { case (prio, ks) =>
      val months = ks.map(_._2).sorted
      months.zipWithIndex.map { case (mo, i) =>
        val rev = monthly((prio, mo))
        val g = if (i == 0) None
                else Some(rev * 1000000L / monthly((prio, months(i - 1))) - 1000000L)
        (prio, mo) -> (rev, g)
      }
    }.toMap
    val got = q("orders_monthly_growth").collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (rev, g) = expect((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == rev)
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) == g,
        s"growth mismatch at (${r.getString(0)}, ${r.getLong(1)})")
    }
    assert(got.count(_.isNullAt(3)) == expect.keys.map(_._1).toSet.size,
      "exactly one NULL (the first month) per priority")
  }

  test("lineitem_abc_classes equals a naive global cumulative-share replay") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice"))
      .as[(Long, Double)].collect()
    val rev = rows.groupBy(_._1).view
      .mapValues(_.map(v => math.floor(v._2 * 100 + 0.5).toLong).sum).toMap
    val total = rev.values.sum
    var cum = 0L
    val expect = rev.toSeq.sortBy { case (p, r) => (-r, p) }.map { case (p, r) =>
      cum += r
      val cls = if (cum * 100 <= total * 70) "A"
                else if (cum * 100 <= total * 90) "B" else "C"
      p -> (r, cum, cls)
    }.toMap
    val got = q("lineitem_abc_classes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == expect)
    val classes = got.values.map(_._3).toSet
    assert(classes == Set("A", "B", "C"), s"all three classes must appear: $classes")
  }

  test("supplier_covers_all equals the naive universal-quantifier replay") {
    val target = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"))
      .as[(Long, Double)].collect()
      .sortBy { case (k, pr) => (-pr, k) }.take(2).map(_._1).toSet
    val shipped = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = shipped.collect {
      case (supp, parts) if target.subsetOf(parts) => supp
    }.toSet
    val got = q("supplier_covers_all").collect().map(_.getLong(0)).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.size < shipped.size,
      "division must select a strict, non-empty subset")
  }

  test("trigram search equals the naive contains scan; index actually prunes") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name")).as[(Long, String)].collect()
    val expect = parts.filter(_._2.contains("gear")).toMap
    val got = q("part_trigram_search").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expect, "index-accelerated LIKE must equal the full scan")
    assert(got.nonEmpty && got.size < parts.length,
      "pattern must match a strict, non-empty subset")
  }

  test("events_cusum_changepoint equals the recursive max(0, s+x) replay") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(date_trunc("DAY", col("ts"))),
        col("value"))
      .as[(String, Long, Double)].collect()
    val daily = rows.groupBy(r => (r._1, r._2 / 86400000000L)).view
      .mapValues(vs => vs.map(v => math.floor(v._3 * 1000 + 0.5).toLong).sum).toMap
    val got = q("events_cusum_changepoint").collect()
    assert(got.length == daily.size)
    got.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val series = daily.collect { case ((`t`, day), v) => (day, v) }.toSeq.sortBy(_._1)
      val mu = series.map(_._2).sum / series.length
      // the textbook recursion — the prefix-sum closed form must match it
      var s0 = 0L
      val expect = series.map { case (day, v) =>
        s0 = math.max(0L, s0 + v - mu - mu / 20)
        (day, v, s0, s0 > mu / 4)
      }
      val gotT = rs.sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
      assert(gotT == expect, s"$t: cusum trajectory mismatch")
    }
    assert(got.count(_.getBoolean(4)) > 0, "corpus must trip at least one alarm")
  }

  test("graph_bfs_levels equals a first-principles BFS; levels exercise depth") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val pairs = operators.RelOps.copurchaseCounts(li)
      .filter(col("n_orders") >= 2).select("p1", "p2")
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val src = adj.keys.min
    val dist = scala.collection.mutable.Map(src -> 0L)
    var f = Set(src); var lvl = 0L
    while (f.nonEmpty) {
      lvl += 1
      f = f.flatMap(adj(_)).filterNot(dist.contains)
      f.foreach(n => dist(n) = lvl)
    }
    val got = q("graph_bfs_levels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist.toMap, "BFS levels must equal the naive frontier replay")
    assert(got.values.max >= 2, "graph must exercise multi-hop expansion")
  }

  test("partial-agg merge equals a direct integer replay; HLL invariants hold") {
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
    val byType = vals.groupBy(_._1).view
      .mapValues(_.map(v => math.floor(v._2 * 1000.0 + 0.5).toLong)).toMap
    val got = q("events_partial_agg_merge").collect()
    assert(got.map(_.getString(0)).toSeq == byType.keys.toSeq.sorted)
    got.foreach { r =>
      val vs = byType(r.getString(0))
      val (n, s, ss) = (vs.length.toLong, vs.sum, vs.map(v => v * v).sum)
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == ss)
      assert(r.getLong(4) == vs.min && r.getLong(5) == vs.max)
      assert(r.getLong(6) == (s * 1000) / n)
      // varq is computed in decimal(38,0) (the numerator grows xN^2 with
      // row count and int64 overflows at scale — the x64 smoke measured
      // it) but EMITTED as a digit string: the driver's value hash can't
      // digest decimal128 terminals (round-10 red)
      val vq = BigDecimal(r.getString(7))
      assert(vq == BigDecimal(n) * BigDecimal(ss) - BigDecimal(s) * BigDecimal(s))
      assert(vq >= 0, "variance numerator must be non-negative")
    }
    // the sketch-merge invariants are in-query booleans; they must hold
    q("events_hll_distinct_merge").collect().foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: union estimate drifted > 2%")
      assert(r.getBoolean(3), s"${r.getString(0)}: sketch estimate off > 5%")
    }
  }

  test("events_pattern_sequence matches a naive sliding-window scan") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val expect = rows.groupBy(_._1).flatMap { case (u, evs) =>
      val seq = evs.sortBy(e => (e._2, e._3)).map(_._4.head).mkString
      // non-overlapping left-to-right count, the replace() semantics
      var i = 0; var n = 0; var first = 0L
      while (i <= seq.length - 3) {
        if (seq.substring(i, i + 3) == "cec") {
          if (n == 0) first = i + 1
          n += 1; i += 3
        } else i += 1
      }
      if (n > 0) Some(u -> (seq.length.toLong, n.toLong, first)) else None
    }
    val got = q("events_pattern_sequence").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    assert(got.nonEmpty, "corpus must contain the pattern")
  }

  test("window_distribution_orders matches a first-principles rank replay") {
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)].collect()
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (prio, grp) =>
      val sorted = grp.sortBy(r => (r._3, r._2))
      val n = sorted.length
      sorted.zipWithIndex.map { case ((_, key, price), i) =>
        // standard ANSI closed forms: pr=(rank−1)/(n−1), cd=rows≤/n,
        // ntile = first (n mod k) buckets take the extra row
        val k = 7
        val base = n / k; val extra = n % k
        val tile = if (i < (base + 1) * extra) i / (base + 1) + 1
                   else (i - (base + 1) * extra) / base + extra + 1
        (prio, key) -> (math.rint(price * 100) / 100,
          if (n == 1) 0.0 else i.toDouble / (n - 1),
          (i + 1).toDouble / n, tile)
      }
    }
    val expectMap = expect.toMap
    val got = q("window_distribution_orders").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (price, pr, cd, tile) = expectMap((r.getString(0), r.getLong(1)))
      assert(r.getDouble(2) == price && r.getDouble(3) == pr &&
        r.getDouble(4) == cd && r.getInt(5) == tile,
        s"mismatch at (${r.getString(0)}, ${r.getLong(1)})")
      assert(r.getLong(1) % 101 == 0)
    }
  }

  test("part_skyline matches a naive O(n²) dominance filter") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("long"))
      .as[(Long, Double, Long)].collect()
    val expect = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz)
      }
    }.map { case (k, pr, sz) => (k, pr, sz) }.toSet
    val got = q("part_skyline").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expect, s"skyline mismatch: got=$got expect=$expect")
    assert(got.nonEmpty)
  }

  test("events_anomaly_mad matches a first-principles median/MAD replay") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).as[(String, Double)]
      .collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = q("events_anomaly_mad").collect()
    assert(got.map(_.getString(0)).toSeq == byType.keys.toSeq.sorted)
    got.foreach { r =>
      val vs = byType(r.getString(0))
      val med = medianOf(vs)
      val mad = medianOf(vs.map(v => math.abs(v - med)))
      val rz = vs.map(v => math.abs(0.6745 * (v - med) / mad))
      assert(r.getLong(1) == vs.length)
      assert(r.getDouble(2) == math.rint(med * 1e4) / 1e4)
      assert(r.getDouble(3) == math.rint(mad * 1e4) / 1e4)
      assert(r.getLong(4) == rz.count(_ > 3.5))
      assert(r.getDouble(5) == math.rint(rz.max * 1e4) / 1e4)
      assert(r.getLong(4) > 0, "corpus must exercise the anomaly branch")
    }
  }

  test("events_anomaly_mad: a >= 50%-ties group (MAD = 0) yields NULL scores, not Inf") {
    // pins the nullif divisor guard (round-8 verdict item 2): when at
    // least half a group's values equal its median, MAD = 0 and the
    // robust z-score must go NULL — dropping out of the conditional count
    // and the max — instead of dividing to ±Inf/NaN, whose round/compare
    // semantics diverge across engines. Cross-checked once against the
    // DuckDB oracle SQL on this exact corpus (scripts note in the spec):
    // both engines produce the literals asserted here.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mad").toString
    try {
      val rows =
        Seq(5.0, 5.0, 5.0, 5.0, 9.0, 1.0).map(("tied", _)) ++
        (1 to 9).map(i => ("normal", i.toDouble)) :+ (("normal", 1000.0))
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
        .withColumn("ts", timestamp_micros(col("event_id")))
        .withColumn("user_id", col("event_id") % 3)
        .withColumn("props", lit("{}"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$tmp/events.parquet")
      val got = SparkEntry.queries("events_anomaly_mad")(spark, tmp)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4), if (r.isNullAt(5)) None
          else Some(r.getDouble(5)))).toSeq
      // normal: median 5.5, MAD 2.5, the 1000.0 outlier scores
      // 0.6745*994.5/2.5 = 268.3161; tied: MAD 0 -> 0 anomalies, NULL max
      assert(got == Seq(
        ("normal", 10L, 5.5, 2.5, 1L, Some(268.3161)),
        ("tied", 6L, 5.0, 0.0, 0L, None)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("orders_grouping_sets equals the union of the two single-dim aggregates") {
    val byStatus = q("orders_grouping_sets").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3)))
    val o = Tables.orders(spark, sf)
    def dim(c: String) = o.groupBy(col(c))
      .agg(count(lit(1)), round(sum("o_totalprice"), 2))
      .as[(String, Long, Double)].collect()
    val expect =
      dim("o_orderstatus").map { case (k, n, t) => (Option(k), None, n, t) } ++
      dim("o_orderpriority").map { case (k, n, t) => (None, Option(k), n, t) }
    assert(byStatus.toSet == expect.toSet)
    // exactly the two sets — no grand total, no pair cells
    assert(!byStatus.exists { case (a, b, _, _) => a.isEmpty && b.isEmpty })
    assert(!byStatus.exists { case (a, b, _, _) => a.nonEmpty && b.nonEmpty })
  }
}
