package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the driver fixtures (TESTDATA.md). The reference
  * has no file I/O at all (SURVEY.md §2.1) — the Parquet scan with
  * Spark's vectorized reader is this engine's native ingest path, and the
  * one that matters at 100 TB: filters and projections declared on these
  * frames reach the scan as PushedFilters/ReadSchema, pruning row groups
  * and columns before any byte is decoded. */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.parquet's `ts` encoding has changed across driver fixture
    * generations — TIMESTAMP(NANOS) (reads as int64 under the legacy
    * conf), then timestamp[us] with no timezone (reads as
    * TIMESTAMP_NTZ). Dispatch on the READ schema so every generation
    * lands on the same session-local TimestampType the rest of the
    * engine (and the DuckDB oracles' CAST(ts AS TIMESTAMP)) expect:
    *  - LongType → raw nanos: integral `div 1000` to micros (`div`, not
    *    `/`: a double intermediate rounds off-by-one-microsecond);
    *  - TIMESTAMP_NTZ → cast to TimestampType (identity on the stored
    *    micros under the session's UTC timezone, GraftExtensions.builder);
    *  - TimestampType → already native, pass through. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(withNanosAsLong(s)(table(s, d, "events")))

  /** The streaming twin of [[events]] — ONE copy of the readStream
    * scaffold (raw on-disk schema read under nanos-as-long, directory
    * source narrowed by pathGlobFilter, in-plan ts normalization), so
    * the next fixture-generation ts-encoding change is absorbed here
    * once, not per consumer. `watermark` bounds state for consumers
    * that aggregate/join; stateful processors that manage their own
    * state pass None.
    *
    * SIDE EFFECT callers embedding the library must know: when the
    * fixture's `ts` is INT64(NANOS), this PERMANENTLY sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the shared
    * session (see the in-body comment for why a scoped restore can't
    * work for a stream). From then on any unrelated parquet read of a
    * TIMESTAMP(NANOS) column in the same session silently yields
    * LongType instead of the loud PARQUET_TYPE_ILLEGAL error. Spark
    * offers no per-stream read option for this conf today; if one
    * lands, scope it to the stream's options instead. */
  def eventsStream(s: SparkSession, d: String,
      watermark: Option[String] = None): DataFrame = {
    val schema = withNanosAsLong(s)(
      s.read.parquet(s"$d/events.parquet").schema)
    // A NANOS-annotated generation needs the legacy conf at
    // MICRO-BATCH time, not just while this plan is built: the
    // streaming engine clones the session (capturing confs) at
    // .start(), which callers invoke only after this function
    // returned — a scoped set-and-restore here would leave every
    // micro-batch read throwing PARQUET_TYPE_ILLEGAL while the batch
    // twin kept working. Leave the conf set for the session exactly
    // when the generation IS nanos (it only affects TIMESTAMP(NANOS)
    // columns, which only this fixture carries); the other
    // generations never set it.
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rdr = s.readStream.schema(schema)
    // Replay rate limit: bound each micro-batch to N source files so a
    // historical fixture drains as a sequence of watermark-advancing
    // batches instead of one giant one — the shape a live stream has,
    // and what tools.StreamScaleProbe measures state/latency under.
    // Unset (every production read) the source keeps its default.
    s.conf.getOption("spark.graft.stream.maxFilesPerTrigger")
      .foreach(rdr.option("maxFilesPerTrigger", _))
    // The driver fixtures store events as a single FILE
    // `events.parquet`; Spark-written fixtures (the amplified replay
    // corpora) are a DIRECTORY of part files under the same name. The
    // glob-filter form only matches the file layout — a directory is
    // streamed directly (it holds nothing but event parts), which also
    // gives the file-source one part per listing entry to rate-limit.
    val evDir = new java.io.File(d, "events.parquet")
    val raw = normalizeEventTs(
      if (evDir.isDirectory) rdr.parquet(evDir.getPath)
      else rdr.option("pathGlobFilter", "events.parquet").parquet(d))
    watermark.fold(raw)(w => raw.withWatermark("ts", w))
  }

  /** The ts-normalization dispatch, shared with the readStream twins in
    * `streaming.EventWindows`/`streaming.Stateful` (the conversion is a
    * plain projection, so it plans identically in batch and streaming). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Scope the legacy nanos-as-long conf to one read: the Parquet
    * relation captures the conf when `spark.read.parquet` resolves the
    * schema, so restoring it immediately after keeps the rest of the
    * session on strict semantics (a permanent set() here was flipping
    * every later parquet read in the session — ADVICE r2). There is no
    * per-read option for this conf (verified: the option-shaped read
    * still throws PARQUET_TYPE_ILLEGAL). */
  def withNanosAsLong[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = s.conf.getOption(key)
    s.conf.set(key, "true")
    try body
    finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
