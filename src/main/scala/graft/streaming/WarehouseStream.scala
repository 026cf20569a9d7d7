package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming warehouse ingestion [EXT]: SCD2 dimension maintenance via
  * `foreachBatch` — the idiom for sinks that need a MERGE rather than
  * an append. Each micro-batch folds its per-user latest purchase into
  * a graft-log dimension table: the user's open version closes at the
  * change timestamp, a new current version opens, untouched users pass
  * through, and the rewritten dimension publishes as ONE atomic
  * graft-log commit (this format's whole-table MERGE; Delta/Iceberg
  * would row-merge in place — same transaction shape).
  *
  * Timestamps are carried as epoch micros (BIGINT); an open version's
  * valid_to is Long.MaxValue (the TSV demo format carries no nulls —
  * the sentinel plays the role of Delta's null valid_to).
  *
  * Batch-boundary contract: intermediate version history depends on
  * how arrivals split into micro-batches (as in any streaming SCD2),
  * but the CURRENT rows always converge to the batch answer — exactly
  * one open version per user holding the overall-latest purchase —
  * which WarehouseStreamSpec asserts after a 3-batch replay.
  */
object WarehouseStream {
  val OpenValidTo: Long = Long.MaxValue
  private val Fmt = "graft.sources.GraftLogSource"

  private def dimSchemaDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Double, Long, Long, Int)]
      .toDF("user_id", "bal", "valid_from", "valid_to", "is_current")
  }

  private def readDim(spark: SparkSession, dimDir: String): DataFrame =
    if (graft.sources.GraftLog.committedFiles(dimDir).isEmpty)
      dimSchemaDf(spark)
    else spark.read.format(Fmt).option("path", dimDir).load()

  /** Fold one micro-batch of purchase events into the dimension. */
  def applyScd2Batch(spark: SparkSession, batch: DataFrame,
      dimDir: String): Unit = {
    val changes = batch
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("ts"), col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), unix_micros(col("m.ts")).as("c_ts"),
        col("m.value").as("c_val"))
    if (changes.isEmpty) return
    val dim = readDim(spark, dimDir)
    val hist = dim.filter(col("is_current") === 0)
    val cur = dim.filter(col("is_current") === 1)
    val merged = cur.join(changes, Seq("user_id"), "full_outer")
      .select(col("user_id"), explode(
        when(col("c_ts").isNull, // untouched user: current row survives
          array(struct(col("bal"), col("valid_from"), col("valid_to"),
            lit(1).as("is_current"))))
        .when(col("valid_from").isNull, // brand-new user
          array(struct(col("c_val").as("bal"),
            col("c_ts").as("valid_from"),
            lit(OpenValidTo).as("valid_to"), lit(1).as("is_current"))))
        // Late arrival (change NOT newer than the open version): reject —
        // micro-batch boundaries don't respect event time, and
        // without this guard an out-of-order replay would regress the
        // dimension. `<=` (not `<`) makes the fold replay-idempotent
        // under at-least-once foreachBatch recovery: re-applying the
        // change that opened the current version is a no-op instead of
        // appending a zero-length history row per replay. This is the
        // standard last-writer-wins-by-event-time SCD2 policy;
        // convergence to the batch answer depends on it (asserted in
        // WarehouseStreamSpec).
        .when(col("c_ts") <= col("valid_from"),
          array(struct(col("bal"), col("valid_from"), col("valid_to"),
            lit(1).as("is_current"))))
        .otherwise(array( // close the open version, open the new one
          struct(col("bal"), col("valid_from"),
            col("c_ts").as("valid_to"), lit(0).as("is_current")),
          struct(col("c_val").as("bal"), col("c_ts").as("valid_from"),
            lit(OpenValidTo).as("valid_to"), lit(1).as("is_current")))))
        .as("v"))
      .select(col("user_id"), col("v.bal").as("bal"),
        col("v.valid_from").as("valid_from"),
        col("v.valid_to").as("valid_to"),
        col("v.is_current").as("is_current"))
    hist.unionByName(merged)
      .write.format(Fmt).option("path", dimDir)
      .mode("overwrite").save()
  }

  /** The stream: purchase events → per-batch SCD2 merge. */
  def scd2Stream(spark: SparkSession, streamInDir: String,
      dimDir: String, checkpoint: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val schema = spark.read.parquet(streamInDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(streamInDir)
      .filter(col("event_type") === "purchase")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row],
          _: Long) =>
        applyScd2Batch(spark, batch.toDF(), dimDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
