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
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's Parquet reader
    * rejects outright. Read the raw int64 nanos (legacy conf) and truncate
    * to Spark's native microsecond timestamps; oracles truncate the same
    * way via CAST(ts AS TIMESTAMP) in DuckDB. `div` keeps the arithmetic
    * integral — a double intermediate would round off-by-one-microsecond. */
  def events(s: SparkSession, d: String): DataFrame =
    withNanosAsLong(s) {
      table(s, d, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
