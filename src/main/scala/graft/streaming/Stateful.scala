package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Custom streaming state [EXT]: first-event dedup per (user, type) via
  * `flatMapGroupsWithState` — the arbitrary-state API a pipeline uses
  * when built-in `dropDuplicates`/`session_window` state shapes don't
  * fit.
  *
  * State is one boolean per key (seen/not-seen): O(distinct keys), not
  * O(events) — bounded state is what keeps this viable on an unbounded
  * 100 TB stream; pair with a timeout to expire idle keys in production.
  * Batch twin (same answer on a static frame): Temporal.dedup_first_event.
  */
object Stateful {
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class FirstEv(user_id: Long, event_type: String,
      first_event_id: Long, first_ts: java.sql.Timestamp)
  case class Trans(user_id: Long, from_type: String, to_type: String,
      to_event_id: Long)

  /** Raw events as an unbounded stream — the shared scaffold in
    * [[graft.sources.Tables.eventsStream]]; no watermark here (the
    * stateful processors below manage their own O(users) state). */
  private def eventStream(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.eventsStream(spark, sfDir)

  /** Stream-stream interval join: clicks joined to same-user purchases
    * in the preceding 30 minutes. The watermarks + the time-range bound
    * are what let Spark expire buffered rows from both join states —
    * without the range predicate, stream-stream inner join state grows
    * forever. Batch twin: Temporal `join_interval` (same answer on a
    * static frame, asserted in TemporalSpec). */
  def intervalJoinStream(spark: SparkSession, sfDir: String): DataFrame = {
    val clicks = eventStream(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", "1 hour")
    val purchases = eventStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") <= col("ts") &&
          col("p_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("p_ts").as("purchase_ts"), col("purchase_value"))
  }

  /** Emit only the first event (by ts) of each (user, type) key; state
    * remembers keys already emitted. */
  def dedupStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = eventStream(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev]
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Boolean, FirstEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((user, etype), it, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // getTime is millisecond-precision; getNanos restores the
            // sub-millisecond part so the tie-break matches the batch
            // twin's microsecond min_by(event_id, ts) exactly.
            // "First" is the min within the first micro-batch the key
            // appears in (Append mode can't retract an emitted row) —
            // exact only when each key's earliest event is in its first
            // batch; the fixture arrives as a single batch, which
            // StatefulSpec's stream==batch assertion relies on.
            val first = it.minBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            Iterator(FirstEv(user, etype, first.event_id, first.ts))
          }
      }
      .toDF()
  }

  /** Streaming twin of `events_transition_matrix`'s pair stream: emit a
    * (from_type → to_type) row for every consecutive event pair per
    * user. State is ONE event per user (the last seen) — O(distinct
    * users), not O(events) — so the stream stays bounded at any scale;
    * pair with a timeout to expire idle users in production. Within a
    * micro-batch events sort by (ts, event_id), the same total order
    * the batch twin's lead() window uses, and the stored last event
    * stitches transitions across batch boundaries. CROSS-BATCH LATE
    * DATA IS DISCARDED: an event ordering BELOW the stored last would
    * retroactively split an already-emitted pair, and an append
    * stream cannot retract — so, like any watermark-bounded operator,
    * the stream is exact (batch-equal) for per-user event-time-
    * monotone micro-batches and drops what arrives later than that.
    * The stored last never regresses, so one late straggler cannot
    * corrupt the stitching of subsequent in-order batches. The matrix
    * itself is a downstream aggregate of this append stream
    * (TemporalSpec folds it and asserts equality with the batch
    * query's counts). */
  def transitionStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = eventStream(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev]
    def ord(e: Ev): (Long, Int, Long) =
      (e.ts.getTime, e.ts.getNanos, e.event_id)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Ev, Trans](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[Ev]) =>
          val last = state.getOption
          val fresh = it.toSeq
            .sortBy(ord)
            .filter(e => last.forall(l =>
              implicitly[Ordering[(Long, Int, Long)]]
                .gt(ord(e), ord(l))))
          val chain = last.toSeq ++ fresh
          if (fresh.nonEmpty) state.update(fresh.last)
          chain.sliding(2).collect { case Seq(a, b) =>
            Trans(user, a.event_type, b.event_type, b.event_id)
          }.toSeq.iterator
      }
      .toDF()
  }

  case class Running(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, running_total: Double)

  /** Per-user running purchase total through `transformWithState` —
    * Spark 4's arbitrary-state API (SPARK-42931), the successor to
    * flatMapGroupsWithState used above: typed state variables from a
    * handle, explicit TimeMode/TTL, and a RocksDB-backed store
    * (required by the operator; the spec sets the provider conf).
    * State is ONE double per user — O(distinct users) — and each
    * micro-batch's rows fold in (ts, event_id) order, the same total
    * order as the batch twin's window cumsum, with the stored total
    * stitching across batch boundaries. Contract for CROSS-BATCH late
    * data: a row arriving after a later-ts row was already folded
    * still adds its value (sum commutes, so every user's FINAL total
    * is exact under any arrival order), but its emitted per-row
    * prefix reflects arrival order, not event order — batch-equal
    * per-row prefixes hold exactly for per-user event-time-monotone
    * micro-batch splits (what a watermark bounds). Batch twin
    * registered as `stream_stateful_running_total`
    * (EventWindows.queries); equality asserted in StreamingSpec. */
  class RunningTotalProcessor
      extends StatefulProcessor[Long, Ev, Running] {
    @transient private var total: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Double]("total",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Running] = {
      var acc = if (total.exists()) total.get() else 0.0
      val out = rows.toSeq
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .map { e =>
          acc += e.value
          Running(user, e.event_id, e.ts, acc)
        }
      total.update(acc)
      out.iterator
    }
  }

  def runningTotalStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val purchases = eventStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev]
    purchases.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
