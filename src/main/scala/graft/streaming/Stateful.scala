package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Emit only the first event (by ts) of each (user, type) key; state
    * remembers keys already emitted. */
  def dedupStream(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
            val first = it.minBy(e => (e.ts.getTime, e.event_id))
            Iterator(FirstEv(user, etype, first.event_id, first.ts))
          }
      }
      .toDF()
  }
}
