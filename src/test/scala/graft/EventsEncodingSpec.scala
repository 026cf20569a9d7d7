package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression guard for driver-side fixture regeneration (VERDICT r6):
  * `events.ts` has shipped as TIMESTAMP(NANOS) — int64 under the legacy
  * nanosAsLong conf — in one generation and as timestamp[us] (NTZ) in the
  * next, and the r6 loader only handled the first, silently zeroing the
  * 22-query events family. `Tables.events` must land EVERY encoding on
  * session-local TimestampType with identical microsecond values. */
class EventsEncodingSpec extends SparkSpec {
  private val micros = Seq(1700000000123456L, 1700000003000000L)

  /** Write a one-table fixture dir and read it back through the loader. */
  private def roundTrip(write: String => Unit): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-enc")
      .toString
    write(s"$dir/events.parquet")
    graft.sources.Tables.events(spark, dir)
  }

  private def tsMicros(df: DataFrame): Seq[Long] = {
    assert(df.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
  }

  test("int64-nanos ts reads as TimestampType with integral micros truncation") {
    import spark.implicits._
    val df = roundTrip { path =>
      // +789 sub-micro nanos must truncate away, not round.
      micros.map(m => (1L, m * 1000L + 789L)).toDF("event_id", "ts")
        .coalesce(1).write.parquet(path)
    }
    assert(tsMicros(df) == micros)
  }

  test("timestamp[us] NTZ ts reads as TimestampType with micros preserved") {
    import spark.implicits._
    val df = roundTrip { path =>
      micros.toDF("m")
        .select(lit(1L).as("event_id"),
          timestamp_micros(col("m")).cast("timestamp_ntz").as("ts"))
        .coalesce(1).write.parquet(path)
    }
    assert(tsMicros(df) == micros)
  }

  test("the STREAMING twin lands the int64 encoding on TimestampType " +
      "across micro-batches — the reads happen after eventsStream " +
      "returns, so the dispatch must survive plan building") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-events-enc").toString
    // a single FILE named events.parquet, like the driver fixtures —
    // the streaming source globs file names, and a Spark-written
    // DIRECTORY of part files would not match it
    micros.map(m => (1L, m * 1000L + 789L)).toDF("event_id", "ts")
      .coalesce(1).write.parquet(s"$dir/tmp_out")
    val part = new java.io.File(s"$dir/tmp_out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, "events.parquet"))
    val stream = graft.sources.Tables.eventsStream(spark, dir)
    assert(stream.schema("ts").dataType == TimestampType)
    val q = stream.select(unix_micros(col("ts")).as("m"))
      .writeStream.format("memory").queryName("enc_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table("enc_stream").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == micros)
  }

  test("native session-local timestamp ts passes through unchanged") {
    import spark.implicits._
    val df = roundTrip { path =>
      micros.toDF("m")
        .select(lit(1L).as("event_id"), timestamp_micros(col("m")).as("ts"))
        .coalesce(1).write.parquet(path)
    }
    assert(tsMicros(df) == micros)
  }
}
