package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventWindows
import graft.sources.Tables

/** The genuinely incremental path: readStream over the same parquet with
  * a watermark converges to the batch answer — Structured Streaming's
  * core correctness contract (SURVEY.md §2.6 [EXT] streaming). */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window converges to the batch plan's answer") {
    val stream = EventWindows.tumblingStream(spark, sf0001)
    val q = stream.writeStream
      .format("memory")
      .queryName("tumbling_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("tumbling_test")
      .select("w_start", "event_type", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows.tumbling(Tables.events(spark, sf0001))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming sliding window converges to the batch plan's answer") {
    val q = EventWindows.slidingStream(spark, sf0001).writeStream
      .format("memory")
      .queryName("sliding_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("sliding_test")
      .select("w_start", "n_events", "n_users")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows.sliding(Tables.events(spark, sf0001))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming windowed approximate-distinct sketches are " +
      "bit-identical to the batch ones") {
    val q = EventWindows.windowDistinctApproxStream(spark, sf0001)
      .writeStream
      .format("memory")
      .queryName("wda_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("wda_test")
      .select("w_start", "event_type", "n_events", "sk")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows
      .windowDistinctApprox(Tables.events(spark, sf0001))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      "the sketch fold must be order-insensitive: stream == batch " +
        "down to the sketch bytes")
    assert(batch.nonEmpty)
  }

  test("watermarked streaming dedup cancels an at-least-once replay " +
      "exactly") {
    val q = EventWindows.dedupReplayStream(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value")
      .writeStream
      .format("memory")
      .queryName("dedup_replay_test")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("dedup_replay_test")
      .collect().map(_.toSeq)
    // exactly-once restored: every event once, none dropped, none
    // duplicated — despite ~10% of the feed arriving twice
    val clean = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value")
      .collect().map(_.toSeq)
    assert(streamed.length == clean.length,
      s"dedup emitted ${streamed.length} rows, expected ${clean.length}")
    assert(streamed.toSet == clean.toSet)
    assert(clean.nonEmpty)
  }

  test("stream-stream interval join emits exactly the batch join's pairs") {
    val q = EventWindows.attributionStream(spark, sf0001).writeStream
      .format("memory")
      .queryName("attrib_test")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("attrib_test")
      .select("view_event", "purchase_event", "p_ts", "p_value")
      .collect().map(_.toSeq).toSet
    val events = Tables.events(spark, sf0001)
    val batch = EventWindows.attribution(
        events.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts")),
        events.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value")))
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream-stream join diverged: ${streamed.size} vs ${batch.size} pairs")
  }

  test("stream-static enrichment converges to the batch join's answer") {
    val q = EventWindows.enrichedStream(spark, sf0001).writeStream
      .format("memory")
      .queryName("enrich_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("enrich_test")
      .select("w_start", "c_mktsegment", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows.enriched(Tables.events(spark, sf0001),
        Tables.customer(spark, sf0001))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming session window converges to the batch plan's answer") {
    // session_window streaming forbids update mode (sessions merge, so
    // an emitted row could be retracted); complete mode re-emits the
    // merged state each trigger and equals the batch answer.
    val q = EventWindows.sessionsStream(spark, sf0001).writeStream
      .format("memory")
      .queryName("session_test")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("session_test")
      .select("user_id", "session_start", "n_events", "session_value")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows.sessions(Tables.events(spark, sf0001))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("lag/cumsum sessionization equals session_window exactly") {
    // Two independent formulations of 30-minute-gap sessions — the
    // built-in session_window aggregate and the window_sessionize
    // lag/flag/cumsum composition — must produce the identical session
    // set with identical rollups.
    val composed = graft.queries.Analytics
      .queries("window_sessionize")(spark, sf001)
      .select("user_id", "session_start", "n_events", "session_value")
    val builtin = EventWindows.sessions(Tables.events(spark, sf001))
      .select("user_id", "session_start", "n_events", "session_value")
    assert(composed.count() == builtin.count())
    assert(composed.exceptAll(builtin).isEmpty &&
      builtin.exceptAll(composed).isEmpty,
      "session sets must match row for row")
  }

  test("transformWithState running total equals the batch window cumsum") {
    // Spark 4's arbitrary-state API requires the RocksDB state store;
    // scope the provider conf to this query so the rest of the suite
    // keeps the default HDFS-backed store.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val q = graft.streaming.Stateful.runningTotalStream(spark, sf0001)
        .writeStream
        .format("memory")
        .queryName("running_total_test")
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()

      val streamed = spark.table("running_total_test")
        .select("user_id", "event_id", "ts", "running_total")
        .collect().map(_.toSeq).toSet
      val batch = EventWindows
        .queries("stream_stateful_running_total")(spark, sf0001)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("session windows: no session shorter than one event, gaps respected") {
    val sessions = EventWindows.sessions(Tables.events(spark, sf0001))
    assert(sessions.filter(col("n_events") < 1).count() == 0)
    // session count per user <= event count per user
    val perUser = sessions.groupBy("user_id")
      .agg(sum("n_events").as("total"), count(lit(1)).as("n_sessions"))
    assert(perUser.filter(col("n_sessions") > col("total")).count() == 0)
  }
}
