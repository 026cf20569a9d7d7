package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal join operators [EXT]: as-of join and first-event dedup.
  *
  * Spark has no native ASOF JOIN. The classic scalable formulation is
  * union-tag + prefix window: tag both streams, union them, and carry the
  * most recent right-side row forward with a running window over
  * (key, time). One shuffle on the key, one within-partition sort —
  * linear in input size, versus the range-join formulation whose
  * intermediate explodes with events-per-key². This is exactly how
  * merge-join ASOF engines (kdb, QuestDB, DuckDB) sequence it. */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  /** For each left event, the latest right event with the same key and
    * `rts <= lts` (ties: right row wins, i.e. "at or before"). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, rightVals: Seq[String]): DataFrame = {
    val lTag = left.withColumn("__is_r", lit(0))
      .withColumns(rightVals.map(v => s"__r_$v" -> lit(null)).toMap)
    val rTag = right.select(
      (col(key) +: col(rts).as(lts) +: lit(1).as("__is_r") +:
        rightVals.map(v => col(v).as(s"__r_$v"))): _*)
    val unioned = lTag.unionByName(rTag, allowMissingColumns = true)
    // right rows sort before left rows at equal ts → "at or before";
    // the trailing value columns make the pick among equal-(key, ts)
    // right rows deterministic under any partitioning
    val w = Window.partitionBy(col(key))
      .orderBy((col(lts) +: col("__is_r").desc +:
        rightVals.map(v => col(s"__r_$v").asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry ONE struct of (ts, vals) so every asof_* field comes from the
    // same matched right row — carrying each value column independently
    // with ignoreNulls would fall back to an OLDER row for a value that
    // is null on the matched row, emitting an inconsistent (ts, value)
    // pair that DuckDB ASOF (which returns the matched row's null) never
    // produces.
    val rStruct = when(col("__is_r") === 1,
      struct((col(lts).as("ts") +:
        rightVals.map(v => col(s"__r_$v").as(v))): _*))
    val carried = unioned.withColumn("__c",
      last(rStruct, ignoreNulls = true).over(w))
    carried.filter(col("__is_r") === 0)
      .select((left.columns.map(col) :+ col("__c.ts").as("asof_ts")) ++
        rightVals.map(v => col(s"__c.$v").as(s"asof_$v")): _*)
  }

  /** Mirror of `asofJoin` for the forward direction: for each left
    * event, the EARLIEST right event with the same key and `rts > lts`
    * (strictly after — pandas merge_asof(direction='forward',
    * allow_exact_matches=False)). Same union-tag shape, with the
    * window flipped to (current row → unbounded following) and right
    * rows sorted BEFORE left at equal ts so an equal-ts right row
    * falls outside the left row's forward frame. Identical scale
    * profile: one key shuffle, one in-partition sort. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, rightVals: Seq[String]): DataFrame = {
    val lTag = left.withColumn("__is_r", lit(0))
      .withColumns(rightVals.map(v => s"__r_$v" -> lit(null)).toMap)
    val rTag = right.select(
      (col(key) +: col(rts).as(lts) +: lit(1).as("__is_r") +:
        rightVals.map(v => col(v).as(s"__r_$v"))): _*)
    val unioned = lTag.unionByName(rTag, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy((col(lts) +: col("__is_r").desc +:
        rightVals.map(v => col(s"__r_$v").asc_nulls_first)): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rStruct = when(col("__is_r") === 1,
      struct((col(lts).as("ts") +:
        rightVals.map(v => col(s"__r_$v").as(v))): _*))
    val carried = unioned.withColumn("__c",
      first(rStruct, ignoreNulls = true).over(w))
    carried.filter(col("__is_r") === 0)
      .select((left.columns.map(col) :+ col("__c.ts").as("asof_ts")) ++
        rightVals.map(v => col(s"__c.$v").as(s"asof_$v")): _*)
  }

  val queries: Map[String, Q] = Map(
    // As-of join: each click paired with the user's most recent purchase
    // at or before it (nulls when no prior purchase).
    "join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("purchase_ts"),
          col("asof_value").as("purchase_value"))
    }),

    // Forward as-of: each click paired with the user's NEXT purchase
    // strictly after it (nulls when none follows).
    "join_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      asofJoinForward(clicks, purchases, "user_id", "ts", "ts",
          Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("purchase_ts"),
          col("asof_value").as("purchase_value"))
    }),

    // Same as-of semantics through the NATIVE custom-operator stack
    // (graft.plans: AsofJoinPlan → AsofJoinStrategy → AsofJoinExec, a
    // co-partitioned two-pointer merge). Checked against the identical
    // DuckDB ASOF oracle as the window formulation above.
    "join_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("value"))
      graft.plans.AsofJoin.native(s, clicks, purchases,
          "user_id", "p_user", "ts", "p_ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("purchase_ts"),
          col("asof_v0").as("purchase_value"))
    }),

    // Interval (range) join: every purchase by the same user within the
    // 30 minutes BEFORE each click — all matches, not just the latest
    // (that's the as-of above). Equi key + time-range predicate: Spark
    // plans the equi part as the join and the range as a post-join
    // filter; the streaming twin (TemporalSpec) runs the same shape as a
    // watermarked stream-stream join, where the range bound is what lets
    // Spark expire buffered state.
    "join_interval" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("value").as("purchase_value"))
      // shuffle_merge (r17 session 2): unhinted, Catalyst's size
      // estimate put the purchase-side events PROJECTION under the
      // broadcast threshold and built it as a driver-side hashed
      // relation — both sides of this join are event-stream facts, so
      // at scale the only safe plan is the user_id shuffle the
      // streaming twin also implies (PlanAudit FACT_BROADCAST).
      clicks.join(purchases.hint("shuffle_merge"),
          col("user_id") === col("p_user") &&
            col("p_ts") <= col("ts") &&
            col("p_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_ts").as("purchase_ts"), col("purchase_value"))
    }),

    // First event per (user, type) + how many duplicates a stateful
    // dedup would drop. Batch twin of Stateful.dedupStream — hash
    // aggregate, one shuffle, no window sort needed.
    "dedup_first_event" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("ts")).as("first_ts"),
          // (ts, event_id) key, not ts alone: on a ts tie min_by picks
          // whichever row a partition sees first, so the "equals the
          // dedup stream" pin (which breaks ties on event_id) would
          // flake with the data — the composite key pins the same
          // deterministic winner in batch, stream, and oracle
          min_by(col("event_id"),
            struct(col("ts"), col("event_id"))).as("first_event_id"),
          (count(lit(1)) - 1).as("n_dropped"))),

    // As-of join with a staleness tolerance (pandas
    // merge_asof(tolerance=...)): the matched right row only counts if
    // it is at most 30 minutes old; staler matches null out. Reuses
    // the union-tag as-of machinery — the tolerance is a pure
    // post-projection on the already-matched pair, so the scale shape
    // (one key shuffle, one in-partition sort) is unchanged.
    "join_asof_tolerance" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val j = asofJoin(clicks, purchases, "user_id", "ts", "ts",
        Seq("value"))
      val inTol = col("asof_ts").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("asof_ts")) <=
          30L * 60 * 1000000
      j.select(col("event_id"), col("user_id"), col("ts"),
        when(inTol, col("asof_ts")).as("purchase_ts"),
        when(inTol, col("asof_value")).as("purchase_value"))
    }),

    // Nearest as-of (pandas merge_asof(direction='nearest')): each
    // click paired with the purchase closest in time in EITHER
    // direction, ties to the earlier (backward) match. Composed from
    // the two directional as-ofs — each a one-shuffle window pass —
    // joined on the click id to pick the smaller |Δt|; the compose
    // keeps the per-direction scale shape (no events-per-key² range
    // intermediate) and the final join is click-keyed, co-partitioned
    // with both inputs. (user_id, ts) purchase pairs are unique in the
    // fixture (verified at sf0.01/sf0.1), so no cross-engine tiebreak
    // beyond ts is exercised.
    "join_asof_nearest" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val b = asofJoin(clicks, purchases, "user_id", "ts", "ts",
          Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("b_ts"), col("asof_value").as("b_value"))
      val f = asofJoinForward(clicks, purchases, "user_id", "ts", "ts",
          Seq("value"))
        .select(col("event_id"), col("asof_ts").as("f_ts"),
          col("asof_value").as("f_value"))
      val db = unix_micros(col("ts")) - unix_micros(col("b_ts"))
      val df = unix_micros(col("f_ts")) - unix_micros(col("ts"))
      val pickB = col("b_ts").isNotNull &&
        (col("f_ts").isNull || db <= df)
      // shuffle_merge (r17 session 2): both directional as-of outputs
      // are click-cardinality fact frames; unhinted, the size estimate
      // broadcast one of them (PlanAudit FACT_BROADCAST). The compose
      // join shuffles on event_id instead — scale-safe either way.
      b.join(f.hint("shuffle_merge"), Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(pickB, col("b_ts")).otherwise(col("f_ts"))
            .as("purchase_ts"),
          when(pickB, col("b_value")).otherwise(col("f_value"))
            .as("purchase_value"))
    }),

    // Time-series resample to a daily grid with forward fill: per user,
    // one row per calendar day from their first to last event; gap days
    // get n_events=0, day_value=0 and carry the last observed closing
    // value forward. Scale shape: the grid is generated per user with
    // an in-row `sequence` (days-per-user rows, no cross join against a
    // global calendar), every join and window partitions on user_id —
    // one key's timeline never leaves one task, and the ffill is a
    // single running window, not a per-gap lookup. Determinism: the
    // day's closing value is picked by (ts, event_id) row_number (no
    // engine-specific arg_max tie rule), and day sums aggregate as
    // exact decimals.
    "ts_resample_ffill" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"),
        date_trunc("DAY", col("ts")).as("day"), col("ts"),
        col("event_id"), col("value"))
      // One aggregate for the whole day rollup (r17 session 2): the
      // old form computed `daily` (groupBy agg), `closing` (a SECOND
      // events scan through a row_number window) and `grid` (a THIRD
      // scan for per-user min/max day), then joined all three — and
      // Catalyst broadcast the window-built `closing` side, a
      // fact-cardinality build the (fixed) PlanAudit FACT_BROADCAST
      // detector flags. The day's closing value is an aggregate fact:
      // max(struct(ts, event_id, value)) picks the same row as the
      // (ts DESC, event_id DESC) row_number — (ts, event_id) is a
      // total order, event_id unique — so ONE map-side-combined
      // aggregate yields n_events, day_value AND close_value. The
      // per-user grid bounds derive from the aggregated frame (min/
      // max day per user are the same over day groups as over raw
      // events), so the fact is scanned ONCE. `daily` is consumed
      // twice (grid bounds + the join) with NO materialization:
      // both consumers sit above the identical aggregate exchange, so
      // exchange reuse runs the scan+shuffle once — a localCheckpoint
      // variant was measured 2x SLOWER (0.57–0.85 s vs 0.25–0.36
      // same-JVM interleaved; the serialization job costs more than
      // the duplicated final-aggregate pass it saves, the same
      // trade spans' checkpoint won and this one loses).
      val daily = e.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("day_value"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("day"), col("n_events"),
          col("day_value"), col("m.value").as("close_value"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"),
            expr("INTERVAL 1 DAY"))).as("day"))
      val ffill = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("day_value"), lit(0.0)).as("day_value"),
          last(col("close_value"), ignoreNulls = true).over(ffill)
            .as("ffill_value"))
    }),

    // Time-weighted average per user — the TSDB aggregate that values a
    // reading by how long it was current, not how often it was sampled.
    // Each value is weighted by the integer-microsecond interval until
    // the user's next event (the last event carries no interval); the
    // weighted sum folds through DECIMAL so the result is
    // order-independent, and the total duration is an exact BIGINT.
    // One user-partitioned lead window over one scan, one aggregate.
    // OHLC downsampling — the canonical TSDB bar aggregation: per
    // (user, hour) the first/highest/lowest/last reading plus an exact
    // DECIMAL volume sum. Open/close are picked by row_number over
    // (ts, event_id) — a total order, so both engines pick the same row
    // even with duplicate timestamps — and the bars build in ONE
    // hash-aggregate pass over one scan (the two windows share the same
    // (user, hour) partitioning, so there is one shuffle, then the
    // aggregate is partial-merged map-side).
    "ts_downsample_ohlc" -> ((s, d) => {
      // The hour bucket is materialized ONCE as a column: if the windows
      // and the aggregate each recompute date_trunc as their own
      // expression, none of them recognize a shared distribution and the
      // plan pays three exchanges instead of one (pinned by
      // PlanShapeSpec).
      val wAsc = Window.partitionBy(col("user_id"), col("bar_start"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val wDesc = Window.partitionBy(col("user_id"), col("bar_start"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          date_trunc("hour", col("ts")).as("bar_start"))
        .withColumn("rn_a", row_number().over(wAsc))
        .withColumn("rn_d", row_number().over(wDesc))
        .groupBy(col("user_id"), col("bar_start"))
        .agg(
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("volume"),
          count(lit(1)).as("n_ticks"))
    }),

    "ts_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("dur",
          unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
        .filter(col("dur").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          (sum((col("value") * col("dur")).cast("decimal(28,6)"))
            .cast("double") / sum(col("dur"))).as("twa"),
          sum(col("dur")).as("total_dur_us"),
          count(lit(1)).as("n_intervals"))
    })
  )

  val oracles: Map[String, String] = Map(
    "join_asof" ->
      """WITH clicks AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts, p.value AS purchase_value
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.ts <= c.ts""",
    "join_asof_forward" ->
      """WITH clicks AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts, p.value AS purchase_value
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.ts > c.ts""",
    "join_asof_native" ->
      """WITH clicks AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           p.ts AS purchase_ts, p.value AS purchase_value
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.ts <= c.ts""",
    "join_interval" ->
      """WITH clicks AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS p_ts, value
           FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           p.p_ts AS purchase_ts, p.value AS purchase_value
         FROM clicks c JOIN purchases p
           ON c.user_id = p.user_id
          AND p.p_ts <= c.ts
          AND p.p_ts >= c.ts - INTERVAL 30 MINUTES""",
    "dedup_first_event" ->
      """WITH ranked AS (
           SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, event_type) AS cnt
           FROM events)
         SELECT user_id, event_type, ts AS first_ts,
           event_id AS first_event_id,
           CAST(cnt - 1 AS BIGINT) AS n_dropped
         FROM ranked WHERE rn = 1""",
    "join_asof_tolerance" ->
      """WITH clicks AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN p.ts IS NOT NULL
                 AND epoch_us(c.ts) - epoch_us(p.ts)
                     <= 30 * 60 * 1000000
                THEN p.ts END AS purchase_ts,
           CASE WHEN p.ts IS NOT NULL
                 AND epoch_us(c.ts) - epoch_us(p.ts)
                     <= 30 * 60 * 1000000
                THEN p.value END AS purchase_value
         FROM clicks c ASOF LEFT JOIN purchases p
           ON c.user_id = p.user_id AND p.ts <= c.ts""",
    "join_asof_nearest" ->
      """WITH clicks AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'click'),
         purchases AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase'),
         ranked AS (
           SELECT c.event_id, p.ts AS purchase_ts,
             p.value AS purchase_value,
             ROW_NUMBER() OVER (PARTITION BY c.event_id
               ORDER BY ABS(epoch_us(c.ts) - epoch_us(p.ts)), p.ts)
               AS rk
           FROM clicks c JOIN purchases p ON c.user_id = p.user_id)
         SELECT c.event_id, c.user_id, c.ts,
           r.purchase_ts, r.purchase_value
         FROM clicks c LEFT JOIN (SELECT * FROM ranked WHERE rk = 1) r
           USING (event_id)""",
    "ts_resample_ffill" ->
      """WITH e AS (
           SELECT user_id,
             date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(ts AS TIMESTAMP) AS ts, event_id, value
           FROM events),
         daily AS (
           SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS day_value
           FROM e GROUP BY user_id, day),
         closing AS (
           SELECT user_id, day, value AS close_value
           FROM (SELECT user_id, day, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, day
                     ORDER BY ts DESC, event_id DESC) AS rn
                 FROM e)
           WHERE rn = 1),
         grid AS (
           SELECT user_id,
             unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
           FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                 FROM e GROUP BY user_id))
         SELECT g.user_id, g.day,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(day_value, 0.0) AS day_value,
           last_value(close_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS ffill_value
         FROM grid g
         LEFT JOIN daily USING (user_id, day)
         LEFT JOIN closing USING (user_id, day)""",
    "ts_downsample_ohlc" ->
      """WITH t AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start
           FROM events),
         r AS (
           SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id, bar_start
               ORDER BY ts ASC, event_id ASC) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, bar_start
               ORDER BY ts DESC, event_id DESC) AS rn_d
           FROM t)
         SELECT user_id, bar_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
         FROM r GROUP BY user_id, bar_start""",
    "ts_time_weighted_avg" ->
      """WITH iv AS (
           SELECT user_id, value,
             date_diff('microsecond', CAST(ts AS TIMESTAMP),
               LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS dur
           FROM events)
         SELECT user_id,
           CAST(SUM(CAST(value * dur AS DECIMAL(28,6))) AS DOUBLE) /
             CAST(SUM(dur) AS BIGINT) AS twa,
           CAST(SUM(dur) AS BIGINT) AS total_dur_us,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
         FROM iv WHERE dur IS NOT NULL
         GROUP BY user_id"""
  )
}
