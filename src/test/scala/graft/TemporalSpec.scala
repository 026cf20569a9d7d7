package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.sources.Tables
import graft.streaming.Stateful

/** As-of join laws + stateful streaming dedup vs its batch twin. */
class TemporalSpec extends SparkSpec {

  test("asof join: paired purchase is at-or-before and the latest such") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = Temporal.asofJoin(clicks, purchases, "user_id", "ts", "ts",
      Seq("value"))
    // no asof_ts may exceed the click ts
    assert(joined.filter(col("asof_ts") > col("ts")).count() == 0)
    // spot-check maximality: recompute via a per-click scan for 20 clicks
    val sample = joined.limit(20).collect()
    val p = purchases.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    sample.foreach { r =>
      val user = r.getAs[Long]("user_id")
      val ts = r.getAs[java.sql.Timestamp]("ts")
      val best = p.filter(x => x._1 == user && !x._2.after(ts))
        .sortBy(_._2.getTime).lastOption
      assert(r.getAs[java.sql.Timestamp]("asof_ts") == best.map(_._2).orNull)
      assert(Option(r.getAs[java.lang.Double]("asof_value"))
        .map(_.doubleValue()) == best.map(_._3))
    }
    // every click appears exactly once (left semantics, no multiplication)
    assert(joined.count() == clicks.count())
  }

  test("forward asof: paired purchase is strictly after and the earliest") {
    val ev = Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = Temporal.asofJoinForward(clicks, purchases,
      "user_id", "ts", "ts", Seq("value"))
    assert(joined.filter(col("asof_ts") <= col("ts")).count() == 0)
    val sample = joined.limit(20).collect()
    val p = purchases.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    sample.foreach { r =>
      val user = r.getAs[Long]("user_id")
      val ts = r.getAs[java.sql.Timestamp]("ts")
      val best = p.filter(x => x._1 == user && x._2.after(ts))
        .sortBy(_._2.getTime).headOption
      assert(r.getAs[java.sql.Timestamp]("asof_ts") == best.map(_._2).orNull)
      assert(Option(r.getAs[java.lang.Double]("asof_value"))
        .map(_.doubleValue()) == best.map(_._3))
    }
    assert(joined.count() == clicks.count())
  }

  test("native AsofJoinExec equals the union+window formulation") {
    val window = Temporal.queries("join_asof")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val native = Temporal.queries("join_asof_native")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("stream-stream interval join converges to the batch interval join") {
    val q = Stateful.intervalJoinStream(spark, sf0001).writeStream
      .format("memory").queryName("interval_test").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("interval_test").collect().map(_.toSeq).toSet
    val batch = Temporal.queries("join_interval")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stateful transition stream folds to the batch transition matrix") {
    val q = Stateful.transitionStream(spark, sf0001).writeStream
      .format("memory").queryName("trans_test").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("trans_test")
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("events_transition_matrix")(spark, sf0001)
      .select(col("event_type"), col("next_type"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("flatMapGroupsWithState dedup stream equals the batch first-event") {
    val q = Stateful.dedupStream(spark, sf0001).writeStream
      .format("memory").queryName("dedup_test").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("dedup_test")
      .select("user_id", "event_type", "first_event_id", "first_ts")
      .collect().map(_.toSeq).toSet
    val batch = Temporal.queries("dedup_first_event")(spark, sf0001)
      .select(col("user_id"), col("event_type"),
        col("first_event_id"), col("first_ts"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("resample emits a dense daily grid with forward-filled gaps") {
    val r = Temporal.queries("ts_resample_ffill")(spark, sf0001)
    // dense: per user, row count == days between min and max day
    val span = r.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("n_days"))
      .filter(col("n_rows") =!= col("n_days"))
    assert(span.isEmpty, "grid must have exactly one row per day")
    // gap days exist at this sf and always carry a forward-filled value
    val gaps = r.filter(col("n_events") === 0)
    assert(gaps.count() > 0, "fixture should contain gap days")
    assert(gaps.filter(col("ffill_value").isNull).isEmpty,
      "every gap day after a user's first event must be filled")
    // ffill on an active day equals that day's closing value
    val active = r.filter(col("n_events") > 0)
    assert(active.filter(col("ffill_value").isNull).isEmpty)
  }

  test("ohlc bars match an in-memory recompute") {
    val got = Temporal.queries("ts_downsample_ohlc")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(7))).toMap
    val rows = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    val hourMs = 3600L * 1000
    val expected = rows.groupBy { case (u, ts, _, _) =>
      (u, new java.sql.Timestamp(ts.getTime / hourMs * hourMs))
    }.map { case (k, vs) =>
      // micro-precision sort key: getTime is only ms-precision and the
      // fixture timestamps carry microseconds
      def micros(t: java.sql.Timestamp): Long =
        t.getTime / 1000 * 1000000L + t.getNanos / 1000
      val sorted = vs.sortBy(v => (micros(v._2), v._3))
      k -> (sorted.head._4, vs.map(_._4).max, vs.map(_._4).min,
        sorted.last._4, vs.size.toLong)
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, (o, h, l, c, n)) =>
      val (go, gh, gl, gc, gn) = got(k)
      assert((go, gh, gl, gc, gn) == (o, h, l, c, n), s"bar $k")
      assert(gl <= go && go <= gh && gl <= gc && gc <= gh)
    }
  }
}
