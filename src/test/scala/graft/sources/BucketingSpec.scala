package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.SimpleMode

/** Bucketed co-located joins: both fact tables written bucketed by the
  * join key must join with NO shuffle exchange on either side — the
  * persistent-layout guarantee a 100 TB lake relies on for its
  * canonical keys.
  */
class BucketingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-to-fact join plans without an Exchange") {
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    Bucketing.writeBucketed(orders, "b_orders", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", 8, Seq("l_orderkey"))

    // Disable auto-broadcast so the test exercises the big-big join
    // path (at sf0.001 orders would otherwise broadcast and hide the
    // co-location property this pins).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          spark.table("b_orders")("o_orderkey") ===
            spark.table("b_lineitem")("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      // and the result matches the unbucketed join exactly
      val expected = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() === expected)
      assert(expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val orders = Tables.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(orders, "b_orders_agg", 8, Seq("o_orderkey"))
    try {
      val agg = spark.table("b_orders_agg")
        .groupBy("o_orderkey")
        .agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must not shuffle:\n$plan")
      assert(agg.count() === spark.table("b_orders_agg").count())
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
