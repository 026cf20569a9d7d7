package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Aggregation surface — absent from the reference (SURVEY.md §2.6), built
  * as first-class extensions. All plans are hash aggregates with map-side
  * partial aggregation (Spark plans partial_sum/partial_count before the
  * exchange), so the shuffle carries one row per (group × partition), not
  * per input row — the shape that survives a 100 TB scan.
  *
  * Float determinism: double addition is not associative, so a
  * shuffle-order-dependent SUM(double) can't hash-match any oracle. Every
  * monetary sum here casts to an exact DECIMAL first (sums become
  * order-independent), then casts the final scalar back to DOUBLE — one
  * deterministic rounding at the end instead of millions along the way. */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a 2-decimal monetary double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 pricing summary — the canonical partial-agg benchmark.
    "q1_agg_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <=
          lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10)
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 10).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // Global aggregates: count / distinct / min / max / integer sum
    "agg_global_stats" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        sum(col("l_orderkey")).as("key_sum"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))),

    // Statistical moments per group: variance/stddev/covariance/
    // correlation — single-pass, partial-aggregated (Spark merges
    // per-partition (n, Σx, Σx²[, Σxy]) moment states, never re-scans).
    // Computed over the SMALL-magnitude columns (quantity ≤ 50,
    // discount ≤ 0.1): moment accumulation order differs between
    // engines, and on small magnitudes the fp drift stays orders of
    // magnitude inside the gate's 1e-6 tolerance — price-scaled
    // moments would not (Σx² ~ 1e12 amplifies the last-ulp noise).
    "agg_stats_moments" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          var_samp(col("l_quantity")).as("qty_var"),
          stddev_samp(col("l_quantity")).as("qty_sd"),
          covar_samp(col("l_quantity"), col("l_discount")).as("qd_cov"),
          corr(col("l_quantity"), col("l_extendedprice")).as("qp_corr"))),

    // GROUP BY + HAVING
    "agg_groupby_having" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          dsum(col("c_acctbal")).as("total_bal"),
          min(col("c_custkey")).as("first_key"))
        .filter(col("n") > lit(10))),

    // DISTINCT projection
    "agg_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority")).distinct()),

    // ROLLUP / CUBE grouping sets
    "agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))),
    "agg_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))),

    // Explicit GROUPING SETS with grouping_id — the general form rollup/
    // cube compile to; one shuffle computes all three groupings.
    "agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))""")
    }),

    // Exact distributed median (interpolated percentile): value depends
    // only on each group's sorted multiset, so it is deterministic under
    // any partitioning, and both engines interpolate identically.
    "agg_median" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("median_price"),
          count(lit(1)).as("n"))),

    // Sketch aggregates: HLL++ distinct count + KLL-style quantiles —
    // the constant-memory, mergeable shapes a 100 TB profile pass uses
    // (exact distinct/percentile would shuffle every value). The sketch
    // estimates themselves are engine-specific, so the CHECKED output is
    // (exact count, in-bound booleans): exact twins computed in the same
    // pass are test-scale scaffolding that lets the DuckDB oracle assert
    // `TRUE` rows — a production run keeps only the sketch columns.
    "agg_approx_sketches" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("a_cnt"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("a_p50"),
        expr("percentile(l_extendedprice, 0.5D)").as("e_p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
          .as("a_p95"),
        expr("percentile(l_extendedprice, 0.95D)").as("e_p95"))
      .select(col("exact_orders"),
        // rsd 0.01 → 2σ relative bound 2%; accuracy 10000 → rank error
        // ≤ n/10000, generously 1% in value on this distribution
        (abs(col("a_cnt") - col("exact_orders")) /
          col("exact_orders") <= 0.02).as("orders_in_bound"),
        (abs(col("a_p50") - col("e_p50")) / col("e_p50") <= 0.01)
          .as("p50_in_bound"),
        (abs(col("a_p95") - col("e_p95")) / col("e_p95") <= 0.01)
          .as("p95_in_bound"))),

    // Pivot: order counts per (priority × status). Explicit pivot values
    // — at scale, letting Spark discover them costs an extra distinct
    // pass over the fact table.
    "agg_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))),

    // Unpivot (melt): the inverse — wide per-part metrics to long
    // (metric, value) rows, the normalization step feature pipelines run.
    "agg_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "metric", "value")),

    // Typed UDAF via Aggregator: exact weighted mean (discount-weighted
    // price) — the custom-aggregate surface for logic sum/avg can't
    // express. Decimal accumulators keep it order-independent so the
    // DuckDB oracle hash-matches.
    "agg_udaf_weighted_mean" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.WeightedMean.toColumn(
          col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))),

    // Heavy-hitters probe via the custom count-min sketch Aggregator
    // (functions/CountMin.scala): ONE constant-memory sketch of the
    // whole key column (partial-merged per executor, 8 KB on the
    // wire), probed for 10 keys against exact counts computed in the
    // same job. Bounds-boolean oracle: estimates must never
    // undercount and must stay within 3N/Width of exact — the
    // deterministic fixture makes the check stable.
    "agg_heavy_hitters" -> ((s, d) => {
      import graft.functions.CountMin
      val li = Tables.lineitem(s, d)
      val sketch = li.agg(CountMin.toColumn(col("l_partkey")).as("sk"),
        count(lit(1)).as("n_total"))
      val probeDf = s.createDataFrame(
        (0L until 10L).map { k =>
          val b = (0 until CountMin.Depth).map(r =>
            r * CountMin.Width + CountMin.bucket(r, k) + 1)
          (k, b(0), b(1), b(2), b(3))
        }).toDF("l_partkey", "b0", "b1", "b2", "b3")
      val est = probeDf.crossJoin(broadcast(sketch))
        .select(col("l_partkey"), col("n_total"),
          least(element_at(col("sk"), col("b0")),
            element_at(col("sk"), col("b1")),
            element_at(col("sk"), col("b2")),
            element_at(col("sk"), col("b3"))).as("est"))
      li.filter(col("l_partkey") < 10)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_cnt"))
        .join(est, "l_partkey")
        .select(col("l_partkey"), col("exact_cnt"),
          (col("est") >= col("exact_cnt")).as("no_undercount"),
          (col("est") <= col("exact_cnt")
            + col("n_total") * 3 / CountMin.Width)
            .as("bounded_overcount"))
    }),

    // Join + aggregate: revenue per nation (multi-join star query).
    // nation is broadcast (tiny dim). Staged pre-aggregation (r16,
    // guide §2.3): the flat join-then-group form shuffles RAW lineitem
    // rows into the orderkey join and the full joined stream onward —
    // fine at this SF where orders/customer broadcast, but at 100 TB
    // every fact shuffles whole. Decimal sums are exactly associative,
    // so revenue rolls up in stages instead: per-order partials (~4×
    // fewer rows than lineitem), per-customer partials (~10× fewer
    // again), then the 25-row nation rollup. Each stage's exchange
    // carries combined partials, never raw fact rows; inner-join drop
    // semantics are unchanged (an order with no lines produces no
    // group at any stage). The oracle keeps the flat form.
    // Precision note (ADVICE r16): the staged sums grow 18,10 → 28,10
    // → 38,10 and Spark caps intermediate precision at DECIMAL(38,10);
    // with ANSI off an overflow past 38,10 would return NULL silently.
    // "Exactly associative" therefore holds up to ~1e28 of headroom
    // (values here are ≤1e10) — a deployment summing past that must
    // widen the terminal stage or enable ANSI to fail loudly.
    // r17 A/B under the bench action (post-coalesce-conf-fix): staged
    // 0.69–0.75 s vs flat 0.68–0.82 — the driver's r16 "regression" on
    // this query was the coalesce conf, not this rollup; staged kept.
    "agg_join_revenue_per_nation" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(18, 10))
      val perOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(rev).as("rev_dec"), count(lit(1)).as("n_items"))
      val perCust = perOrder
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev_dec")).as("rev_dec"),
          sum(col("n_items")).as("n_items"))
      perCust
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_dec")).cast("double").as("revenue"),
          sum(col("n_items")).as("n_items"))
    }),

    // Incremental aggregation merge — the lambda-architecture update:
    // a pre-aggregated base state (events before the cutoff) merged
    // with a delta aggregate (events after) via a full-outer join on
    // the key, combining counts/sums additively and maxima by
    // greatest. The oracle is the FULL recompute over all events —
    // passing proves the merge is lossless, i.e. these aggregates are
    // genuinely mergeable (the property that lets 100 TB state update
    // from a day's delta instead of re-scanning history). Sums merge
    // as exact decimals so base+delta is order-independent.
    "agg_incremental_merge" -> ((s, d) => {
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val e = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("value").cast("decimal(18,6)").as("v"))
      val base = e.filter(col("ts") < cutoff).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_b"), sum(col("v")).as("s_b"),
          max(col("ts")).as("t_b"))
      val delta = e.filter(col("ts") >= cutoff).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_d"), sum(col("v")).as("s_d"),
          max(col("ts")).as("t_d"))
      base.join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n_events"),
          (coalesce(col("s_b"), lit(0).cast("decimal(18,6)")) +
            coalesce(col("s_d"), lit(0).cast("decimal(18,6)")))
            .cast("double").as("total_value"),
          greatest(col("t_b"), col("t_d")).as("last_ts"))
    }),

    // Per-group approximate quantiles with error bounds: the per-lang
    // median of doc length from a KLL-style mergeable sketch
    // (percentile_approx), asserted against the exact in-group p40/p60
    // order statistics. Same bounds-boolean gate trick as
    // agg_approx_sketches, but GROUPED — each group carries its own
    // constant-memory sketch, merged map-side; the exact twin is
    // test-scale scaffolding a production run drops.
    "agg_group_quantile_bounds" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_chars, 0.5D)").as("e_p50"),
          percentile_approx(col("n_chars"), lit(0.5), lit(1000))
            .as("a_p50"),
          expr("percentile(n_chars, 0.4D)").as("e_p40"),
          expr("percentile(n_chars, 0.6D)").as("e_p60"))
        .select(col("lang"), col("n_docs"), col("e_p50"),
          (col("a_p50").cast("double") >= col("e_p40") &&
            col("a_p50").cast("double") <= col("e_p60"))
            .as("p50_in_bound"))),

    // Sketch-partials reuse: per-(event_type, day) HLL sketches built
    // ONCE (what a 100 TB pipeline stores next to its daily
    // partitions), then any rollup answers distinct-users by MERGING
    // the stored 512-byte sketches — no rescan of the raw events. The
    // merge is lossless by construction (register max), so the gated
    // invariant is strong: partial-then-merge equals
    // direct-over-everything BIT FOR BIT, and the estimate lands
    // within the p=9 error bound of the exact count. Both aggregations
    // are ObjectHashAggregate with map-side partial merge — the
    // shuffle carries sketch buffers, not user ids.
    "agg_hll_partial_reuse" -> ((s, d) => {
      import graft.functions.{HllEstimate, HllSketch, HllUnion}
      val ev = Tables.events(s, d).select(col("event_type"),
        to_date(col("ts")).as("day"),
        col("user_id").cast("string").as("uid"))
      val daily = ev.groupBy(col("event_type"), col("day"))
        .agg(HllSketch.toColumn(col("uid")).as("sk"))
      val merged = daily.groupBy(col("event_type"))
        .agg(HllUnion.toColumn(col("sk")).as("sk_merged"),
          count(lit(1)).as("n_days"))
      val direct = ev.groupBy(col("event_type"))
        .agg(HllSketch.toColumn(col("uid")).as("sk_direct"),
          countDistinct(col("uid")).as("exact_users"))
      merged.join(direct, "event_type")
        .select(col("event_type"), col("n_days"), col("exact_users"),
          (col("sk_merged") === col("sk_direct"))
            .as("merge_lossless"),
          (abs(HllEstimate.toColumn(col("sk_merged")) -
              col("exact_users")) /
            col("exact_users") <= 0.15).as("est_in_bound"))
    })
  )

  val oracles: Map[String, String] = Map(
    // The oracle asserts the sketch estimates landed inside their
    // published error bounds (booleans TRUE) and the exact count matches.
    "agg_incremental_merge" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
         MAX(CAST(ts AS TIMESTAMP)) AS last_ts
         FROM events GROUP BY user_id""",
    "agg_group_quantile_bounds" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         quantile_cont(n_chars, 0.5) AS e_p50,
         TRUE AS p50_in_bound
         FROM documents GROUP BY lang""",
    "agg_hll_partial_reuse" ->
      """SELECT event_type,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
         TRUE AS merge_lossless,
         TRUE AS est_in_bound
         FROM events GROUP BY event_type""",
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                 (l_returnflag, l_linestatus))""",
    "agg_heavy_hitters" ->
      """SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
         TRUE AS no_undercount, TRUE AS bounded_overcount
         FROM lineitem WHERE l_partkey < 10 GROUP BY l_partkey""",
    "agg_median" ->
      """SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.5) AS median_price,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY o_orderpriority""",
    "agg_approx_sketches" ->
      """SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
         TRUE AS orders_in_bound,
         TRUE AS p50_in_bound,
         TRUE AS p95_in_bound
         FROM lineitem""",
    "q1_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,10))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,10))) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
         CAST(COUNT(*) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "agg_global_stats" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
         MIN(l_shipdate) AS first_ship,
         MAX(l_shipdate) AS last_ship
         FROM lineitem""",
    "agg_stats_moments" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         var_samp(l_quantity) AS qty_var,
         stddev_samp(l_quantity) AS qty_sd,
         covar_samp(l_quantity, l_discount) AS qd_cov,
         corr(l_quantity, l_extendedprice) AS qp_corr
         FROM lineitem GROUP BY l_returnflag""",
    "agg_groupby_having" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
         MIN(c_custkey) AS first_key
         FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > 10""",
    "agg_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "agg_pivot" ->
      """SELECT o_orderpriority,
         CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
         CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
         CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority""",
    "agg_unpivot" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
         FROM part
         UNION ALL
         SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
         FROM part""",
    "agg_udaf_weighted_mean" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS w_avg_price
         FROM lineitem GROUP BY l_returnflag""",
    "agg_join_revenue_per_nation" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,10))) AS DOUBLE) AS revenue,
         CAST(COUNT(*) AS BIGINT) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name"""
  )
}
