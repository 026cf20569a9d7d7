package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** r17 session-2 rewrite pins: each optimized query form must be
  * ROW-IDENTICAL to the canonical form it replaced, with the canonical
  * form spelled out here (not derived from the shipped code), so the
  * equivalence does not flow through the implementation under test.
  * The DuckDB oracle pins the same facts cross-engine; these pins keep
  * them enforced inside `sbt test` at sf0.001.
  */
class RewriteEquivalenceSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).toSet

  test("q4 aggregate form equals the canonical correlated EXISTS") {
    val got = graft.queries.SqlInterface.queries("sql_tpch_q4")(
      spark, sf0001)
    // canonical EXISTS, no implied-filter, no pre-aggregate
    val want = spark.sql("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
    assert(rows(got) == rows(want))
    assert(got.count() > 0)
  }

  test("q22 fused threshold equals the canonical two scalar subqueries") {
    val got = graft.queries.SqlInterface.queries("sql_tpch_q22")(
      spark, sf0001)
    val want = spark.sql("""
      SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               AS totacctbal
      FROM (SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_acctbal
            FROM customer
            WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
              AND CAST(c_acctbal AS DECIMAL(18,6)) *
                    (SELECT COUNT(*) FROM customer
                     WHERE c_acctbal > 0.0
                       AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
                  > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                     FROM customer
                     WHERE c_acctbal > 0.0
                       AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >=
                                      TIMESTAMP '2000-01-01 00:00:00')
           ) custsale
      GROUP BY cntrycode
      ORDER BY cntrycode""")
    assert(rows(got) == rows(want))
    assert(got.count() > 0)
  }

  test("scd2 max-struct change batch equals the row_number window pick") {
    val got = graft.queries.Warehouse.queries("warehouse_scd2_upsert")(
      spark, sf0001)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("custkey"),
        to_date(col("o_orderdate")).as("change_date"),
        col("o_totalprice").as("new_bal"))
    val want = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("custkey"), col("c_acctbal"))
      .join(changes, Seq("custkey"), "left")
      .withColumn("v", explode(
        when(col("change_date").isNotNull, array(
          struct(col("c_acctbal").as("bal"),
            lit("2023-01-01").cast("date").as("valid_from"),
            col("change_date").as("valid_to"),
            lit(false).as("is_current")),
          struct(col("new_bal").as("bal"),
            col("change_date").as("valid_from"),
            lit(null).cast("date").as("valid_to"),
            lit(true).as("is_current"))))
        .otherwise(array(
          struct(col("c_acctbal").as("bal"),
            lit("2023-01-01").cast("date").as("valid_from"),
            lit(null).cast("date").as("valid_to"),
            lit(true).as("is_current"))))))
      .select(col("custkey"), col("v.bal").as("bal"),
        col("v.valid_from").as("valid_from"),
        col("v.valid_to").as("valid_to"),
        col("v.is_current").as("is_current"))
    assert(rows(got) == rows(want))
    assert(got.count() > 0)
  }

  test("one-pass window-distinct-approx equals the joined two-pass form") {
    val got = SparkEntry.queries("stream_window_distinct_approx")(
      spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val approx = graft.streaming.EventWindows.windowDistinctApprox(ev)
    val exact = ev
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_users_exact"))
    val want = approx.join(exact, Seq("w_start", "event_type"))
      .select(col("w_start"), col("event_type"), col("n_events"),
        col("n_users_exact"),
        (abs(graft.functions.HllSketchStr.estimate(col("sk")) -
            col("n_users_exact")) <=
          greatest(lit(2.0), col("n_users_exact") * 0.15))
          .as("est_in_bound"))
    assert(rows(got) == rows(want))
    assert(got.count() > 0)
  }

  test("fused resample day rollup equals the three-scan window form") {
    val got = graft.operators.Temporal.queries("ts_resample_ffill")(
      spark, sf0001)
    val e = Tables.events(spark, sf0001).select(col("user_id"),
      date_trunc("DAY", col("ts")).as("day"), col("ts"),
      col("event_id"), col("value"))
    val daily = e.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("day_value"))
    val rn = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val closing = e.withColumn("rn", row_number().over(rn))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("value").as("close_value"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
    val ffill = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = grid.join(daily, Seq("user_id", "day"), "left")
      .join(closing, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("day_value"), lit(0.0)).as("day_value"),
        last(col("close_value"), ignoreNulls = true).over(ffill)
          .as("ffill_value"))
    assert(rows(got) == rows(want))
    assert(got.count() > 0)
  }

  test("q4 plan: no broadcast build contains the lineitem scan") {
    val df = graft.queries.SqlInterface.queries("sql_tpch_q4")(
      spark, sf001)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the old EXISTS decorrelation broadcast the entire 2-column
    // lineitem projection (a fact build — OOM at scale); the aggregate
    // form's only lineitem consumer must be the per-orderkey aggregate
    assert(!formatted.contains("BroadcastHashJoin"),
      formatted.take(600))
    // the implied late-window filter must reach the parquet scan
    assert(formatted.contains("GreaterThan(l_shipdate,1996-03-01"),
      "implied l_shipdate pushdown missing")
  }

  private def queriesFor(name: String) = {
    Tables.customer(spark, sf0001).createOrReplaceTempView("customer")
    Tables.orders(spark, sf0001).createOrReplaceTempView("orders")
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("lineitem")
  }

  // make the temp views the SQL pins above need
  queriesFor("init")
}
