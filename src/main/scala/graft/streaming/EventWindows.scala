package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Event-stream windowing [EXT] (SURVEY.md §2.6) over the `events` table.
  *
  * The same `window()` / `session_window()` aggregations run identically
  * over a batch DataFrame and a Structured Streaming `readStream` source —
  * Spark plans both from one logical declaration. The driver's oracle
  * checks the batch plan; `StreamingSpec` runs the genuinely incremental
  * path (readStream over the same parquet + watermark + memory sink) and
  * asserts it converges to the batch answer, which is exactly the
  * correctness contract Structured Streaming guarantees.
  *
  * Scale: tumbling/sliding windows group by (window, key) — partial
  * aggregation applies, state is bounded by watermark retention, and
  * nothing here ever sorts the stream globally. */
object EventWindows {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum for the 2-decimal `value` column. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Tumbling 10-minute windows per event type (batch form). */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding 30-minute windows every 10 minutes, global rates. */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("w_start"), col("n_events"),
        col("n_users"))

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessions(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** The unbounded twin of `Tables.events`: readStream over the same
    * parquet, ts normalized to session-local micros inside the streaming
    * plan (same schema dispatch as the batch loader), late data bounded
    * by a 1-hour watermark. Every batch window query above applies to
    * this frame unchanged — Spark plans the batch and incremental
    * executions from one logical declaration. */
  private def eventStream(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsStream(spark, sfDir, watermark = Some("1 hour"))

  /** Windowed APPROXIMATE distinct users via the mergeable HLL
    * sketch — the constant-state form the sliding window's scaladoc
    * promises for 100 TB: per-(window, type) streaming state is 512
    * bytes however many users arrive (a collect_set grows with
    * cardinality and an exact countDistinct is forbidden in streaming
    * aggregation), and the sketch Aggregator runs IDENTICALLY in
    * batch and streaming (same partial-merge fold), so the streaming
    * sketches are bit-identical to the batch ones — pinned in
    * StreamingSpec. */
  def windowDistinctApprox(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.HllSketchStr
          .toColumn(col("user_id").cast("string")).as("sk"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sk"))

  def windowDistinctApproxStream(spark: SparkSession,
      sfDir: String): DataFrame =
    windowDistinctApprox(eventStream(spark, sfDir))

  /** The streaming form of `tumbling` — the identical aggregation applied
    * to the unbounded source. */
  def tumblingStream(spark: SparkSession, sfDir: String): DataFrame =
    tumbling(eventStream(spark, sfDir))

  /** The streaming form of `sliding`. One deviation from the batch shape:
    * streaming aggregation forbids exact `countDistinct`, so distinct
    * users are counted as `size(collect_set(...))` — exact (state =
    * the per-window user set, watermark-bounded), and equal to the batch
    * `countDistinct` result. At 100 TB swap in approx_count_distinct and
    * trade the set state for a constant-size HLL sketch. */
  def slidingStream(spark: SparkSession, sfDir: String): DataFrame =
    eventStream(spark, sfDir)
      .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
      .agg(count(lit(1)).as("n_events"),
        size(collect_set(col("user_id"))).cast("long").as("n_users"))
      .select(col("window.start").as("w_start"), col("n_events"),
        col("n_users"))

  /** The streaming form of `sessions` — `session_window` is natively
    * incremental: state merges adjacent sessions as events arrive and the
    * watermark closes sessions whose gap can no longer be bridged. */
  def sessionsStream(spark: SparkSession, sfDir: String): DataFrame =
    sessions(eventStream(spark, sfDir))

  /** Stream-static enrichment: the event stream joined to a static
    * customer dim, rolled up per (window, segment). The dim side is
    * STATELESS — Spark broadcasts a fresh snapshot of the static
    * relation into each micro-batch, no join state accumulates — which
    * is exactly how a 100 TB stream enriches against reference data
    * (the only state is the windowed aggregate, watermark-bounded). */
  def enriched(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "10 minutes"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("c_mktsegment"),
        col("n_events"), col("total_value"))

  /** The streaming form of `enriched`: unbounded events, static dim. */
  def enrichedStream(spark: SparkSession, sfDir: String): DataFrame =
    enriched(eventStream(spark, sfDir), Tables.customer(spark, sfDir))

  /** Stream-STREAM interval join (purchase attribution): each purchase
    * pairs with the same user's views in the preceding 30 minutes.
    * The time-range condition is what makes this tractable unbounded:
    * with both sides watermarked, Spark retains only a 30-minute
    * (+watermark) band of view state per user and ages the rest out —
    * the state never grows with stream length, which is the entire
    * contract of a 100 TB/day attribution join. The same declaration
    * runs as an ordinary interval self-join in batch (the oracle). */
  def attribution(views: DataFrame, purchases: DataFrame): DataFrame =
    views.alias("v").join(purchases.alias("p"),
        col("v.user_id") === col("p.user_id") &&
          col("p.ts") >= col("v.ts") &&
          col("p.ts") <= col("v.ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v.event_id").as("view_event"),
        col("p.event_id").as("purchase_event"),
        col("p.ts").as("p_ts"), col("p.value").as("p_value"))

  private def viewSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
  private def purchaseSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  /** Batch form of the attribution rollup (the driver-gated twin):
    * attributed pairs per purchase hour. The purchase side carries a
    * shuffle_merge hint (r17 session 2): unhinted, Catalyst's size
    * estimate broadcast the purchase-side fact projection (PlanAudit
    * FACT_BROADCAST) — both sides are event streams, so the scale
    * plan is the user_id shuffle the watermarked streaming twin
    * already implies. Batch-only: the hint rides this composition,
    * not the shared [[attribution]] join the stream plans through. */
  def attributionAgg(events: DataFrame): DataFrame =
    attribution(viewSide(events), purchaseSide(events).hint("shuffle_merge"))
      .groupBy(window(col("p_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("view_event")).as("n_views"),
        dsum(col("p_value")).as("purchase_value"))
      .select(col("window.start").as("w_start"), col("n_pairs"),
        col("n_views"), col("purchase_value"))

  /** The streaming form of the attribution JOIN itself (two readStream
    * sides, both watermarked, inner join with the time-range bound) —
    * StreamingSpec drains it and asserts row-identity with the batch
    * join. */
  def attributionStream(spark: SparkSession, sfDir: String): DataFrame =
    attribution(viewSide(eventStream(spark, sfDir)),
      purchaseSide(eventStream(spark, sfDir)))

  /** At-least-once ingest dedup: the delivery layer redelivers ~10% of
    * the feed (every 10th event_id here — deterministic, so the oracle
    * is closed-form), and dedup on the message key restores
    * exactly-once semantics BEFORE the windowed rollup. The oracle is
    * the clean aggregate with no replay: a duplicate that survives
    * dedup (inflated counts) or an over-dropped genuine event is a
    * hash miss. The streaming twin is [[dedupReplayStream]]:
    * `dropDuplicatesWithinWatermark` holds per-key state only until
    * the watermark passes the key's event time — bounded state, the
    * reason the operator (not a global `distinct`) is what a 100 TB/day
    * ingest runs. */
  def dedupReplay(events: DataFrame): DataFrame =
    tumbling(
      events.unionAll(events.filter(col("event_id") % 10 === 0))
        .dropDuplicates("event_id"))

  /** The streaming form of `dedupReplay`'s dedup stage: the replayed
    * feed is the union of two readStream sources (the redelivery),
    * deduped with `dropDuplicatesWithinWatermark` — each first
    * arrival emits immediately (append mode), the per-key state that
    * suppresses re-emission is dropped once the watermark passes the
    * key's event time, so state is bounded by the redelivery horizon,
    * not the stream length. StreamingSpec drains this feed and
    * asserts row-set identity with the batch dedup; the windowed
    * rollup downstream of it is deterministic batch algebra the
    * driver's oracle already pins. */
  def dedupReplayStream(spark: SparkSession, sfDir: String): DataFrame =
    eventStream(spark, sfDir)
      .unionAll(eventStream(spark, sfDir)
        .filter(col("event_id") % 10 === 0))
      .dropDuplicatesWithinWatermark("event_id")

  val queries: Map[String, Q] = Map(
    "stream_tumbling_window" -> ((s, d) => tumbling(Tables.events(s, d))),
    "stream_sliding_window" -> ((s, d) => sliding(Tables.events(s, d))),
    "stream_session_window" -> ((s, d) => sessions(Tables.events(s, d))),
    "stream_static_enrich" -> ((s, d) =>
      enriched(Tables.events(s, d), Tables.customer(s, d))),
    // Batch twin of Stateful.runningTotalStream (transformWithState):
    // per-user running purchase total in (ts, event_id) order — a
    // window cumsum here, a ValueState fold there; StreamingSpec
    // asserts the streaming execution produces the identical frame.
    "stream_stateful_running_total" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .withColumn("running_total",
          sum(col("value")).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("running_total"))),
    "stream_stream_join" -> ((s, d) =>
      attributionAgg(Tables.events(s, d))),
    // Batch face of windowDistinctApprox, gated on exact per-window
    // distinct counts: the sketch estimate must land within the p=9
    // bound in EVERY window (the exact twin is test-scale
    // scaffolding a production stream drops for the 512-byte state).
    // One-pass form (r17 session 2): the approx and exact sides used
    // to be two separate aggregations over the same groups, joined
    // back — two event scans, two exchanges, one join. All three
    // measures (count, HLL sketch, exact distinct) are aggregates of
    // the SAME (window, event_type) groups, so one groupBy computes
    // them together: one scan, one aggregation tree (Spark plans the
    // mixed distinct/non-distinct set via Expand), no join. The
    // sketch's register state is a set-max — order-independent — so
    // its estimate is bit-identical to the joined form's.
    "stream_window_distinct_approx" -> ((s, d) => {
      // bound: 15% relative OR ±2 absolute — at tiny per-window
      // counts (2-6 users) a single register collision is a 1-unit
      // absolute error but a huge relative one
      Tables.events(s, d)
        .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.functions.HllSketchStr
            .toColumn(col("user_id").cast("string")).as("sk"),
          countDistinct(col("user_id")).as("n_users_exact"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n_events"), col("n_users_exact"),
          (abs(graft.functions.HllSketchStr.estimate(col("sk")) -
              col("n_users_exact")) <=
            greatest(lit(2.0), col("n_users_exact") * 0.15))
            .as("est_in_bound"))
    }),
    "stream_dedup_replay" -> ((s, d) =>
      dedupReplay(Tables.events(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "stream_window_distinct_approx" ->
      """SELECT time_bucket(INTERVAL '30 minutes',
             CAST(ts AS TIMESTAMP)) AS w_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS est_in_bound
         FROM events GROUP BY 1, 2""",
    "stream_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
           AS w_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    // Sliding windows assign each event to 3 overlapping 30-min windows:
    // replicate via a 3-offset unnest in SQL.
    "stream_sliding_window" ->
      """WITH assigned AS (
           SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
                    - k * INTERVAL '10 minutes' AS w_start,
                  user_id
           FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS k) offs)
         SELECT w_start, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM assigned GROUP BY w_start""",
    "stream_static_enrich" ->
      """SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
           AS w_start, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2""",
    // Gaps-and-islands reconstruction of 30-minute-gap sessions.
    "stream_session_window" ->
      """WITH marked AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
           FROM events),
         numbered AS (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
           FROM marked)
         SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         FROM numbered GROUP BY user_id, session_id""",
    "stream_stateful_running_total" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           SUM(value) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
             AS running_total
         FROM events WHERE event_type = 'purchase'""",
    "stream_stream_join" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(p.ts AS TIMESTAMP))
             AS w_start,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT v.event_id) AS BIGINT) AS n_views,
           CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE)
             AS purchase_value
         FROM events v JOIN events p
           ON v.user_id = p.user_id
          AND v.event_type = 'view' AND p.event_type = 'purchase'
          AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
          AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP)
                + INTERVAL '30 minutes'
         GROUP BY 1""",
    // The clean aggregate: dedup must exactly cancel the injected
    // replay, so the oracle sees no duplication at all.
    "stream_dedup_replay" ->
      """SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP))
           AS w_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2"""
  )
}
