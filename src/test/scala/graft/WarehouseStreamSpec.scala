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
}
