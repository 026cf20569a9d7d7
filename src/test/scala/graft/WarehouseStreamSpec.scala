package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.WarehouseStream

/** foreachBatch SCD2 maintenance: the dimension's CURRENT rows must
  * converge to the batch answer whatever the micro-batch split, late
  * arrivals must not regress versions, and a checkpointed restart must
  * not re-apply batches. */
class WarehouseStreamSpec extends SparkSpec {
  private val Fmt = "graft.sources.GraftLogSource"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-whs").toString

  test("streaming SCD2 current rows converge to the batch latest") {
    val inDir = tmp(); val dimDir = tmp(); val ckpt = tmp()
    val ev = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "event_type", "value")
    // three files split by a key UNRELATED to time: micro-batches
    // arrive out of event-time order, exercising the late-data guard
    for (k <- 0 until 3)
      ev.filter(col("event_id") % 3 === k).coalesce(1)
        .write.mode("append").parquet(inDir)
    def run(): Unit =
      WarehouseStream.scd2Stream(spark, inDir, dimDir, ckpt)
        .awaitTermination()
    run()

    val dim = spark.read.format(Fmt).option("path", dimDir).load()
    val cur = dim.filter(col("is_current") === 1)
      .select(col("user_id"), col("bal"), col("valid_from"))
    val expected = ev.groupBy(col("user_id"))
      .agg(max_by(struct(col("ts"), col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.value").as("bal"),
        unix_micros(col("m.ts")).as("valid_from"))
    assert(cur.count() == expected.count())
    assert(cur.exceptAll(expected).isEmpty &&
      expected.exceptAll(cur).isEmpty,
      "current rows must equal the batch latest-per-user")
    // history sanity: closed versions have a bounded validity interval
    val bad = dim.filter(col("is_current") === 0 &&
      (col("valid_to") === WarehouseStream.OpenValidTo ||
        col("valid_from") > col("valid_to"))).count()
    assert(bad == 0, "closed versions must have valid_from <= valid_to")

    // restart from the same checkpoint: no batches to re-apply, the
    // dimension content must be bit-identical
    val before = dim.collect().map(_.toSeq).toSet
    run()
    val after = spark.read.format(Fmt).option("path", dimDir).load()
      .collect().map(_.toSeq).toSet
    assert(after == before, "restart must not rewrite the dimension")
  }

  test("streaming materialized view: idempotent ingest + per-batch " +
      "refresh equals the batch recompute, even replayed") {
    import graft.sources.{GraftLog, MaterializedAgg}
    val base = tmp()
    val inDir = s"$base/in"; val src = s"$base/src"
    val mv = s"$base/mv"
    // exact integer cents: the incremental path sums per-batch partials
    // in a different order than the global aggregate, so a double
    // column could differ in the last ulp — longs cannot
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
    for (k <- 0 until 3)
      ev.filter(col("user_id") % 3 === k).coalesce(1)
        .write.mode("append").parquet(inDir)
    // the composed pipeline: each micro-batch lands in the source
    // table with a txn identity (exactly-once even without the
    // checkpoint), then the view refreshes — delta-bounded, its own
    // marker in its own log
    def run(ckpt: String): Unit = {
      val q = spark.readStream
        .schema(spark.read.parquet(inDir).schema).parquet(inDir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          b.write.format(Fmt).option("path", src)
            .option("txnAppId", "mv-ingest")
            .option("txnVersion", id.toString)
            .mode("append").save()
          MaterializedAgg.refresh(spark, src, mv, "user_id",
            Seq("cents"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run(s"$base/ckpt1")
    def mvRows() = spark.read.format(Fmt).option("path", mv).load()
      .select("user_id", "n_rows", "sum_cents")
      .collect().map(_.toSeq).toSet
    val expected = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .collect().map(_.toSeq).toSet
    assert(mvRows() == expected,
      "streaming-maintained view diverged from the batch recompute")
    // checkpoint lost, full replay: ingest markers skip every batch,
    // the refresh no-ops, the view is bit-identical
    run(s"$base/ckpt2")
    assert(mvRows() == expected,
      "a checkpoint-less replay corrupted the maintained view")
    assert(GraftLog.lastTxnVersion(src, "mv-ingest") >= 0L)
  }
}
