package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: bounded error against exact values, and the bucketed
  * co-located join — two scale techniques proven at the plan/result level.
  */
class ApproxSpec extends SparkTestBase {

  test("approx stats gate: every error-bound boolean holds") {
    // the gate query compares sketches against exact aggregates in-query
    // (HLL 2σ=10%, percentiles 5%) — all three booleans must be true
    val rows = q("events_approx_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)}: $r")
    }
  }

  test("approx_count_distinct within 10% of exact per event_type") {
    val rows = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"),
        approx_count_distinct("user_id").as("a"))
      .collect()
    rows.foreach { r =>
      val (n, a) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - n) <= math.max(1L, (n * 0.10).toLong),
        s"${r.getString(0)}: approx=$a exact=$n")
    }
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // leftover managed-table dirs from a previous crashed run
    import scala.reflect.io.Directory
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("orders_b", "lineitem_b").foreach { t =>
      new Directory(new java.io.File(wh, t)).deleteRecursively()
    }
    val o = Tables.orders(spark, sf)
    val l = Tables.lineitem(spark, sf)
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      // co-located: the join itself needs no Exchange on either side
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffled:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
