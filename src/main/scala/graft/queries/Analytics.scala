package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Sorts, top-k, window functions, set operations — absent from the
  * reference (SURVEY.md §2.6), built Spark-first.
  *
  * Scale notes: global ORDER BY + LIMIT k plans as TakeOrderedAndProject
  * (per-partition top-k heaps, only k rows per partition reach the
  * driver-side merge — no global sort materialization). Window functions
  * shuffle once on the partition key and sort within partitions;
  * partition keys (custkey, mktsegment) are high-cardinality or tiny-
  * domain-but-balanced, so no single-partition windows anywhere. Every
  * ordering carries a unique tiebreak column so results are deterministic
  * under any partitioning. */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Global top-k: TakeOrderedAndProject, deterministic via key tiebreak
    "sort_topk_global" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // Multi-column sort with mixed direction (bounded output via filter)
    "sort_multi_key" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_size") >= lit(48))
        .orderBy(col("p_size").desc, col("p_retailprice").asc,
          col("p_partkey").asc)
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))),

    // Ranking window: top-3 customers per market segment
    "window_rank_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= lit(3))
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          col("rn"))
    }),

    // Running (cumulative) sum per customer — DECIMAL inside the frame so
    // the prefix sums are exact and order-independent of the plan.
    "window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_spend"))
    }),

    // lag/lead analytics per customer
    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (row_number().over(w)).as("order_seq"))
    }),

    // RANGE frame over a value axis (not row counts): trailing-30-day
    // spend per customer. The frame is defined by the ORDER BY *value*
    // (days since epoch), so same-day orders are peers and the result is
    // independent of their physical order — exact under any partitioning,
    // with DECIMAL sums inside the frame.
    "window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_days"))
        .rangeBetween(-30, 0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
            .cast("long").as("o_days"),
          col("o_totalprice"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_days"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("trailing_30d_spend"))
    }),

    // Distribution window functions: percent_rank / cume_dist / 2nd
    // balance per segment. Rational values of small integer counts —
    // both engines compute the identical divisions, so doubles match.
    // Z-order clustering key: Morton-interleave two bucketed columns
    // and take the curve-order head — the sort key a lake layout
    // clusters files by so min/max skipping works on BOTH columns
    // (ZOrderSpec measures the per-file range narrowing). The top-k
    // goes through TakeOrderedAndProject; computing zval is pure
    // codegen'd shift/mask arithmetic on the scan.
    "sort_zorder" -> ((s, d) => {
      val px = pmod(col("l_partkey"), lit(256L))
      val py = pmod(col("l_suppkey"), lit(256L))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          px.as("px"), py.as("py"),
          graft.functions.ZOrder.zValue(px, py).as("zval"))
        .orderBy(col("zval"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // Gap-based sessionization in batch — the lag/flag/cumsum
    // composition (identical semantics to session_window's 30-minute
    // gap; StreamingSpec ties the two). Everything partitions on
    // user_id: one shuffle, then two windows and the session rollup all
    // ride the same partitioning. Event-time gaps compare in integer
    // microseconds — no fp boundary ambiguity.
    "window_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val newSess = when(lag(col("ts"), 1).over(byUser).isNull ||
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
          > 30L * 60 * 1000000, 1L).otherwise(0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("sess_id",
          sum(newSess).over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("ts")).as("session_start"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("session_value"))
    }),

    // Deterministic per-group mode: count per (group, value), then the
    // top row per group with an explicit (cnt DESC, value ASC)
    // tie-break — built-in `mode()` leaves ties implementation-defined,
    // which can never hash-match across engines. Two partial-combined
    // aggregates + a values-cardinality window, never a row-level sort.
    "agg_mode" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_orderstatus"))
            .orderBy(col("cnt").desc, col("o_orderpriority"))))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("cnt"))),

    // Fixed-bound histogram: bucket index is floor(x / width) — one
    // integer per row, one partial-combined count per bucket. Explicit
    // arithmetic instead of width_bucket keeps the binning expression
    // identical in both engines (and the division is the same IEEE op,
    // so boundary values land identically).
    "agg_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select((floor(col("l_extendedprice") / 11000.0)).cast("int")
          .as("bucket"), col("l_extendedprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))),

    "window_dist_functions" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          nth_value(col("c_acctbal"), 2).over(wFull).as("second_bal"))
    }),

    // ntile + rank over a GLOBAL ordering, without the single-partition
    // global window (`Window.orderBy` with no partitionBy funnels every
    // row through one task — a scale-killer at fact-table cardinality).
    // Distributed formulation: range-repartition on the sort key, number
    // rows within each range partition in parallel, then add each
    // partition's offset (a P-row side table — P = shuffle parallelism,
    // not data size) broadcast back. Global position is exact for ANY
    // range boundaries, so sampling nondeterminism in the partitioner
    // can't change results. ntile/rank then become pure arithmetic:
    // the ordering key (c_acctbal, c_custkey) is unique, so
    // rank = row_number, and NTILE(k) of position rn over n rows is
    // closed-form (first n%k tiles get ceil(n/k) rows).
    "window_ntile_dist" -> ((s, d) => {
      val k = 4
      val local = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
        .repartitionByRange(32, col("c_acctbal"), col("c_custkey"))
        .withColumn("pid", spark_partition_id())
        .withColumn("lrn", row_number().over(
          Window.partitionBy(col("pid"))
            .orderBy(col("c_acctbal"), col("c_custkey"))))
      // One row per partition — O(parallelism), not O(data) — prefix
      // offsets and the grand total come from a P²-pair broadcast
      // self-join + a global aggregate (SmallFrames: the windowed
      // form logs the single-partition warning on every run)
      val counts = local.groupBy(col("pid"))
        .agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("n"))
      val offsets = graft.core.SmallFrames.selfJoinPrefixSum(counts,
          Seq("pid" -> true), "cnt", "off")
        .crossJoin(broadcast(total))
        .select(col("pid"), col("off"), col("n"))
      val q = floor(col("n") / k)          // small-tile size
      val r = col("n") % k                 // number of large tiles
      val b = r * (q + 1)                  // rows covered by large tiles
      val rn = col("off") + col("lrn")
      local.join(broadcast(offsets), "pid")
        .select(col("c_custkey"), col("c_acctbal"),
          when(rn <= b, floor((rn - 1) / (q + 1)) + 1)
            .otherwise(r + floor((rn - b - 1) / q) + 1)
            .cast("int").as("quartile"),
          rn.cast("int").as("bal_rank"))
    }),

    // Set operations (all distinct-semantics, matching SQL UNION/
    // INTERSECT/EXCEPT). Shuffle on the full row — unavoidable for
    // distinct set semantics.
    "set_union" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") === lit("BUILDING"))
        .select(col("c_custkey").as("custkey"))
        .union(Tables.orders(s, d)
          .filter(col("o_totalprice") > lit(400000.0))
          .select(col("o_custkey").as("custkey")))
        .distinct()),
    "set_intersect" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") === lit("BUILDING"))
        .select(col("c_custkey").as("custkey"))
        .intersect(Tables.orders(s, d)
          .select(col("o_custkey").as("custkey")))),
    "set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))),

    // Semi/anti joins — the scalable EXISTS / NOT EXISTS
    "join_semi" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_totalprice") > lit(450000.0)),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),
    "join_anti" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // Banded range self-join: count event pairs of the same type whose
    // values lie within ±0.5 of each other. A pure range predicate
    // between two big relations is the one join shape Spark cannot
    // hash — written naively it plans a nested loop, quadratic per
    // type. Quantize the range key into width-0.5 bands; then two
    // disjoint pair populations:
    //  - SAME-band pairs: in-band spread < 0.5, so every pair
    //    qualifies unconditionally → counted combinatorially as
    //    C(n,2) from per-band counts. A pure aggregate — the dominant
    //    pair population is never enumerated.
    //  - ADJACENT-band pairs: enumerated by equi-joining band k with
    //    band k+1 (each unordered cross-band pair meets exactly once)
    //    and post-filtering the exact bounds. The bounds must be
    //    computed on the LOWER-ID row's value exactly as the oracle
    //    spells them — evaluating the algebraically-equivalent bound
    //    from the other row's value rounds differently and flips a
    //    handful of diff≈0.5 boundary pairs (measured: 1-4 per type).
    // Versus the explode-to-3-bands formulation this cuts the joined
    // volume by ~2x and the materialized pair count to the cross-band
    // minority; both halves shuffle-hash-join/aggregate on
    // (type, band), so load spreads by band at any scale.
    "join_range_banded" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        // null/NaN can never satisfy a range predicate — drop them
        // BEFORE banding: the combinatorial count would otherwise
        // treat two nulls (grouped under bk=null) or two NaNs (floor
        // casts NaN to band 0) as a qualifying pair
        .filter(col("value").isNotNull && !isnan(col("value")))
        .withColumn("bk", floor(col("value") / 0.5).cast("long"))
      val within = e.groupBy(col("event_type"), col("bk"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("event_type"))
        .agg(sum(col("n") * (col("n") - 1) / 2).cast("long")
          .as("within_pairs"))
      val hi = e.select(col("event_type"), (col("bk") - 1).as("bk"),
        col("event_id").as("r_id"), col("value").as("r_value"))
      val adjacent = e.join(hi.hint("shuffle_hash"), Seq("event_type", "bk"))
        .filter(when(col("r_id") > col("event_id"),
          col("r_value") >= col("value") - 0.5 &&
            col("r_value") <= col("value") + 0.5)
          .otherwise(
            col("value") >= col("r_value") - 0.5 &&
              col("value") <= col("r_value") + 0.5))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("adj_pairs"))
      within.join(adjacent, Seq("event_type"), "left")
        .select(col("event_type"),
          (col("within_pairs") + coalesce(col("adj_pairs"), lit(0L)))
            .as("n_pairs"))
        // the oracle GROUPs BY over qualifying pairs only — a type
        // with zero pairs emits no row there, so none here either
        .filter(col("n_pairs") > 0)
    }),

    // Ordered funnel (view → click → purchase): each stage's timestamp
    // is the first qualifying event STRICTLY AFTER the previous stage
    // — the windowFunnel semantics, not three independent minima. One
    // scan, one shuffle: three stacked unbounded windows over the SAME
    // user_id partition. Each stage's expression depends on the
    // previous stage's output, so CollapseWindow keeps three Window
    // operators — but all three declare the same partitioning and no
    // ordering, so they share ONE exchange and need no sort. Each
    // stage's MIN is conditioned on the previous stage's windowed
    // value; one per-user aggregate dedups at the end. The chained-aggregate formulation costs 3
    // event-log scans and 3 shuffles; this costs 1 and 1 — the DuckDB
    // oracle keeps the chained form, proving equivalence. Timestamps
    // are distinct microseconds, so MIN is deterministic.
    "window_funnel" -> ((s, d) => {
      val u = Window.partitionBy(col("user_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t_view", min(when(col("event_type") === "view",
          col("ts"))).over(u))
        .withColumn("t_click", min(when(col("event_type") === "click" &&
          col("ts") > col("t_view"), col("ts"))).over(u))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("t_click"), col("ts"))).over(u))
      e.filter(col("t_view").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(col("t_view")).as("t_view"),
          min(col("t_click")).as("t_click"),
          min(col("t_purchase")).as("t_purchase"))
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          (when(col("t_purchase").isNotNull, 3)
            .when(col("t_click").isNotNull, 2)
            .otherwise(1)).cast("int").as("funnel_stage"))
    }),

    // Retention cohorts: users grouped by first-active week, counted
    // in each later week they return — the triangle every growth
    // dashboard draws. Two aggregates: per-user cohort week (one
    // shuffle on user_id), then distinct users per (cohort, offset) —
    // the (user, week) frame is already deduped by the first
    // aggregate, so the second counts rows, no DISTINCT expansion.
    "agg_retention_cohorts" -> ((s, d) => {
      val wk = floor(datediff(to_date(col("ts")),
        to_date(lit("2024-01-01"))) / 7).cast("long")
      val uw = Tables.events(s, d)
        .select(col("user_id"), wk.as("week")).distinct()
      val cohort = uw.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Running distinct count per user over time — "how many distinct
    // event types has this user touched so far" — the classic
    // cumulative-cardinality metric. Exact distributed form: a
    // first-seen flag (row_number over (user, type) == 1) and a running
    // sum, both windows partitioned by user_id — no global state, no
    // distinct-aggregate over a growing frame.
    "window_running_distinct" -> ((s, d) => {
      val seen = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val run = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("first_seen",
          when(row_number().over(seen) === 1, 1L).otherwise(0L))
        .withColumn("n_distinct_types", sum(col("first_seen")).over(run))
        .select(col("user_id"), col("event_id"),
          col("n_distinct_types"))
    }),

    // First-order Markov transition matrix over per-user event streams:
    // P(next_type | type) with counts — the "what do users do next"
    // primitive behind journey analysis. One user_id-partitioned window
    // (lead) over one scan, then a type-pair aggregate; the per-source
    // normalizer rides a tiny broadcast join (|types|² rows), never a
    // second corpus pass. Probability is one BIGINT/BIGINT IEEE
    // division per output row — deterministic.
    "events_transition_matrix" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_from"))
      pairs.join(broadcast(totals), "event_type")
        .select(col("event_type"), col("next_type"), col("n"),
          (col("n").cast("double") / col("n_from")).as("p"))
    }),

    // Per-type z-score outliers: population mean/stddev per event_type
    // from DECIMAL-exact Σx / Σx² (order-independent, bit-matching the
    // oracle), then the top 10 events per type by |z|. Selection is by
    // ORDER, not by a z threshold — a 1-ulp sqrt difference between
    // engines rescales a whole group's z-scores together, so ranks (and
    // the event_id tiebreak) are stable where a boundary cut would not
    // be. One scan + one broadcast of the |types|-sized stats frame.
    "events_zscore_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val stats = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sx"),
        sum((col("value") * col("value")).cast("decimal(28,10)"))
          .cast("double").as("sxx"))
        .select(col("event_type"),
          (col("sx") / col("cnt")).as("mean"),
          sqrt(col("sxx") / col("cnt") -
            (col("sx") / col("cnt")) * (col("sx") / col("cnt"))).as("std"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(abs((col("value") - col("mean")) / col("std")).desc,
          col("event_id"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mean")) / col("std"))
        .withColumn("rnk", row_number().over(w).cast("int"))
        .filter(col("rnk") <= 10)
        .select(col("event_type"), col("rnk"), col("event_id"),
          col("value"), col("z"))
    })
  )

  val oracles: Map[String, String] = Map(
    "sort_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "sort_multi_key" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part
         WHERE p_size >= 48
         ORDER BY p_size DESC, p_retailprice ASC, p_partkey ASC""",
    "window_rank_topk_per_group" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
           FROM customer) t
         WHERE rn <= 3""",
    "window_running_sum" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
         FROM orders""",
    "sort_zorder" -> {
      val z = graft.functions.ZOrder.zValueSql("px", "py")
      s"""WITH b AS (
           SELECT l_orderkey, l_linenumber,
             l_partkey % 256 AS px, l_suppkey % 256 AS py
           FROM lineitem)
         SELECT l_orderkey, l_linenumber, CAST(px AS BIGINT) AS px,
           CAST(py AS BIGINT) AS py, CAST($z AS BIGINT) AS zval
         FROM b
         ORDER BY zval, l_orderkey, l_linenumber
         LIMIT 100"""
    },
    "window_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events),
         flagged AS (
           SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_id
           FROM flagged)
         SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             AS session_value
         FROM numbered GROUP BY user_id, sess_id""",
    "agg_mode" ->
      """WITH c AS (
           SELECT o_orderstatus, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM orders GROUP BY o_orderstatus, o_orderpriority),
         r AS (
           SELECT o_orderstatus, o_orderpriority, cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
               ORDER BY cnt DESC, o_orderpriority) AS rn
           FROM c)
         SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
         FROM r WHERE rn = 1""",
    "agg_histogram" ->
      """SELECT CAST(FLOOR(l_extendedprice / 11000.0) AS INTEGER)
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         MIN(l_extendedprice) AS lo,
         MAX(l_extendedprice) AS hi
         FROM lineitem
         GROUP BY CAST(FLOOR(l_extendedprice / 11000.0) AS INTEGER)""",
    "window_lag_lead" ->
      """SELECT o_orderkey, o_custkey,
         LAG(o_totalprice, 1) OVER w AS prev_price,
         LEAD(o_totalprice, 1) OVER w AS next_price,
         CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_seq
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS o_days,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS trailing_30d_spend
         FROM orders""",
    "window_dist_functions" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
         PERCENT_RANK() OVER w AS pct_rank,
         CUME_DIST() OVER w AS cume,
         NTH_VALUE(c_acctbal, 2) OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_bal
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
           ORDER BY c_acctbal, c_custkey)""",
    "window_ntile_dist" ->
      """SELECT c_custkey, c_acctbal,
         CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
         CAST(RANK() OVER w AS INTEGER) AS bal_rank
         FROM customer
         WINDOW w AS (ORDER BY c_acctbal, c_custkey)""",
    "set_union" ->
      """SELECT c_custkey AS custkey FROM customer
         WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0""",
    "set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
         WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS custkey FROM orders""",
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer
         EXCEPT
         SELECT o_custkey AS custkey FROM orders""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "join_range_banded" ->
      """SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
         FROM events a JOIN events b
           ON a.event_type = b.event_type
          AND b.value >= a.value - 0.5 AND b.value <= a.value + 0.5
          AND b.event_id > a.event_id
         GROUP BY a.event_type""",
    "window_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
           FROM events),
         s1 AS (SELECT user_id, MIN(ts) AS t_view
                FROM e WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, s1.t_view, MIN(e.ts) AS t_click
                FROM e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > s1.t_view
                GROUP BY e.user_id, s1.t_view),
         s3 AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
                FROM e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
                GROUP BY e.user_id)
         SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
                     WHEN s2.t_click IS NOT NULL THEN 2
                     ELSE 1 END AS INTEGER) AS funnel_stage
         FROM s1
         LEFT JOIN s2 USING (user_id)
         LEFT JOIN s3 USING (user_id)""",
    "agg_retention_cohorts" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
             CAST(FLOOR(date_diff('day', DATE '2024-01-01',
               CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
           FROM events),
         c AS (SELECT user_id, MIN(week) AS cohort_week
               FROM uw GROUP BY user_id)
         SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
         FROM uw JOIN c USING (user_id)
         GROUP BY cohort_week, week - cohort_week""",
    "window_running_distinct" ->
      """WITH f AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN ROW_NUMBER() OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
               THEN 1 ELSE 0 END AS first_seen
           FROM events)
         SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_distinct_types
         FROM f""",
    "events_transition_matrix" ->
      """WITH seq AS (
           SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
           FROM events),
         pairs AS (
           SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM seq WHERE next_type IS NOT NULL
           GROUP BY event_type, next_type),
         tot AS (
           SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_from
           FROM pairs GROUP BY event_type)
         SELECT p.event_type, p.next_type, p.n,
           CAST(p.n AS DOUBLE) / t.n_from AS p
         FROM pairs p JOIN tot t USING (event_type)""",
    "events_zscore_outliers" ->
      """WITH st AS (
           SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE)
               AS sxx
           FROM events GROUP BY event_type),
         ms AS (
           SELECT event_type, sx / cnt AS mean,
             SQRT(sxx / cnt - (sx / cnt) * (sx / cnt)) AS std
           FROM st),
         z AS (
           SELECT e.event_type, e.event_id, e.value,
             (e.value - ms.mean) / ms.std AS z
           FROM events e JOIN ms USING (event_type)),
         r AS (
           SELECT event_type, event_id, value, z,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY ABS(z) DESC, event_id) AS INT) AS rnk
           FROM z)
         SELECT event_type, rnk, event_id, value, z
         FROM r WHERE rnk <= 10"""
  )
}
