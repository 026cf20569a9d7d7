package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Warehouse-maintenance operators [EXT]: the MERGE/profiling patterns a
  * production lakehouse runs around the analytics proper. */
object Warehouse {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Slowly-changing-dimension type 2 upsert: apply a change batch
    // (each customer's latest order re-prices their balance) to the
    // customer dimension, closing the old version and appending the new
    // one with validity dating. ONE equi-join on the dimension key and
    // ONE scan: each joined row emits its 1–2 output versions through an
    // in-row array-explode (no self-union, which would re-scan the join
    // twice). At 100 TB both sides shuffle-partition on custkey and the
    // change batch is usually small enough to broadcast — either plan
    // keeps a single pass over the dimension.
    "warehouse_scd2_upsert" -> ((s, d) => {
      // Change-batch derivation (r17 session 2): "each customer's
      // latest order" was a row_number window over ALL orders — a
      // sort-based pass that shuffles every order row. The latest
      // order is an aggregate fact: max(struct(o_orderdate,
      // o_orderkey, o_totalprice)) picks the same row (struct
      // ordering is lexicographic and (o_orderdate, o_orderkey) is
      // the window's total order — o_orderkey is unique, so the
      // o_totalprice tail never breaks a tie), but as a hash
      // aggregate it partial-combines map-side: the exchange carries
      // at most one row per (custkey, map partition) instead of every
      // order (guide §2.3 "aggregate before you shuffle"). The
      // aggregate's custkey partitioning then feeds the dimension
      // join unchanged.
      val changes = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice"))).as("m"))
        .select(col("custkey"),
          to_date(col("m.o_orderdate")).as("change_date"),
          col("m.o_totalprice").as("new_bal"))
      Tables.customer(s, d)
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
    }),

    // Column profiling (the describe() every pandas user reaches for):
    // row/null/exact-distinct counts and numeric min/max per column, in
    // ONE scan. The multi-distinct aggregate expands the scan ~5x
    // (Spark's Expand) — at 100 TB profile per partition and merge, or
    // swap countDistinct for approx_count_distinct; exact is kept here
    // because the oracle can then assert it. The 1-row aggregate fans
    // out to per-column rows through an in-row explode, not a re-scan
    // per column. Dates profile as epoch days; strings carry null
    // min/max (cross-engine string collation is not contract-stable).
    "agg_profile_describe" -> ((s, d) => {
      val epochDay = datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date"))
      val a = Tables.orders(s, d).agg(
        count(lit(1)).as("n"),
        count(col("o_orderkey")).as("c1"),
        countDistinct(col("o_orderkey")).as("d1"),
        min(col("o_orderkey")).cast("double").as("mn1"),
        max(col("o_orderkey")).cast("double").as("mx1"),
        count(col("o_custkey")).as("c2"),
        countDistinct(col("o_custkey")).as("d2"),
        min(col("o_custkey")).cast("double").as("mn2"),
        max(col("o_custkey")).cast("double").as("mx2"),
        count(col("o_totalprice")).as("c3"),
        countDistinct(col("o_totalprice")).as("d3"),
        min(col("o_totalprice")).as("mn3"),
        max(col("o_totalprice")).as("mx3"),
        count(col("o_orderdate")).as("c4"),
        countDistinct(col("o_orderdate")).as("d4"),
        min(epochDay).cast("double").as("mn4"),
        max(epochDay).cast("double").as("mx4"),
        count(col("o_orderpriority")).as("c5"),
        countDistinct(col("o_orderpriority")).as("d5"))
      a.select(explode(array(
          struct(lit("o_orderkey").as("col_name"), col("n").as("n_rows"),
            (col("n") - col("c1")).as("n_nulls"), col("d1").as("n_distinct"),
            col("mn1").as("min_v"), col("mx1").as("max_v")),
          struct(lit("o_custkey").as("col_name"), col("n").as("n_rows"),
            (col("n") - col("c2")).as("n_nulls"), col("d2").as("n_distinct"),
            col("mn2").as("min_v"), col("mx2").as("max_v")),
          struct(lit("o_totalprice").as("col_name"), col("n").as("n_rows"),
            (col("n") - col("c3")).as("n_nulls"), col("d3").as("n_distinct"),
            col("mn3").as("min_v"), col("mx3").as("max_v")),
          struct(lit("o_orderdate").as("col_name"), col("n").as("n_rows"),
            (col("n") - col("c4")).as("n_nulls"), col("d4").as("n_distinct"),
            col("mn4").as("min_v"), col("mx4").as("max_v")),
          struct(lit("o_orderpriority").as("col_name"), col("n").as("n_rows"),
            (col("n") - col("c5")).as("n_nulls"), col("d5").as("n_distinct"),
            lit(null).cast("double").as("min_v"),
            lit(null).cast("double").as("max_v")))).as("r"))
        .select(col("r.col_name").as("col_name"), col("r.n_rows").as("n_rows"),
          col("r.n_nulls").as("n_nulls"),
          col("r.n_distinct").as("n_distinct"),
          col("r.min_v").as("min_v"), col("r.max_v").as("max_v"))
    }))

  val oracles: Map[String, String] = Map(
    "warehouse_scd2_upsert" ->
      """WITH ch AS (
           SELECT o_custkey AS custkey,
             CAST(o_orderdate AS DATE) AS change_date,
             o_totalprice AS new_bal
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                 FROM orders)
           WHERE rn = 1),
         dim AS (SELECT c_custkey AS custkey, c_acctbal FROM customer)
         SELECT d.custkey, d.c_acctbal AS bal,
           DATE '2023-01-01' AS valid_from, ch.change_date AS valid_to,
           FALSE AS is_current
         FROM dim d JOIN ch USING (custkey)
         UNION ALL
         SELECT d.custkey, ch.new_bal AS bal,
           ch.change_date AS valid_from, CAST(NULL AS DATE) AS valid_to,
           TRUE AS is_current
         FROM dim d JOIN ch USING (custkey)
         UNION ALL
         SELECT d.custkey, d.c_acctbal AS bal,
           DATE '2023-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
           TRUE AS is_current
         FROM dim d ANTI JOIN ch USING (custkey)""",
    "agg_profile_describe" ->
      """WITH a AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(o_orderkey) AS BIGINT) AS c1,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d1,
             CAST(MIN(o_orderkey) AS DOUBLE) AS mn1,
             CAST(MAX(o_orderkey) AS DOUBLE) AS mx1,
             CAST(COUNT(o_custkey) AS BIGINT) AS c2,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d2,
             CAST(MIN(o_custkey) AS DOUBLE) AS mn2,
             CAST(MAX(o_custkey) AS DOUBLE) AS mx2,
             CAST(COUNT(o_totalprice) AS BIGINT) AS c3,
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS d3,
             MIN(o_totalprice) AS mn3,
             MAX(o_totalprice) AS mx3,
             CAST(COUNT(o_orderdate) AS BIGINT) AS c4,
             CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS d4,
             CAST(MIN(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE))) AS DOUBLE) AS mn4,
             CAST(MAX(date_diff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE))) AS DOUBLE) AS mx4,
             CAST(COUNT(o_orderpriority) AS BIGINT) AS c5,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d5
           FROM orders)
         SELECT 'o_orderkey' AS col_name, n AS n_rows, n - c1 AS n_nulls,
           d1 AS n_distinct, mn1 AS min_v, mx1 AS max_v FROM a
         UNION ALL
         SELECT 'o_custkey', n, n - c2, d2, mn2, mx2 FROM a
         UNION ALL
         SELECT 'o_totalprice', n, n - c3, d3, mn3, mx3 FROM a
         UNION ALL
         SELECT 'o_orderdate', n, n - c4, d4, mn4, mx4 FROM a
         UNION ALL
         SELECT 'o_orderpriority', n, n - c5, d5,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a"""
  )
}
