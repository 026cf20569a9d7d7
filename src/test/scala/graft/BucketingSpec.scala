package graft

import org.apache.spark.sql.functions._
import graft.sources.{Formats, Tables}

/** The point of bucketing is the PLAN, not the values (the values are
  * oracle-checked by join_bucketed_colocated): two tables bucketed on
  * the join key must equi-join with zero Exchange nodes. */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join: correct result, no shuffle in the plan") {
    val base = "/tmp/graft_bkt_spec"
    val orders = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_extendedprice"))
    Formats.writeBucketed(orders, "t_ord_bkt", s"$base/orders", 8, "o_orderkey")
    Formats.writeBucketed(li, "t_li_bkt", s"$base/lineitem", 8, "l_orderkey")

    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("t_ord_bkt")
        .join(spark.table("t_li_bkt"), col("o_orderkey") === col("l_orderkey"))
      val expected = orders
        .join(li, col("o_orderkey") === col("l_orderkey")).count()
      assert(j.count() === expected)

      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
