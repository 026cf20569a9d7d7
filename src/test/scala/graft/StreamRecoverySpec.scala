package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Checkpoint recovery — the durability contract a production stream
  * runs on: stop a stateful query, restart it against the SAME
  * checkpoint, and (a) already-processed input is not re-emitted,
  * (b) deduplication state survives the restart, so a duplicate key
  * arriving after recovery is still dropped. Together that is the
  * end-to-end exactly-once guarantee of the file-source → state →
  * file-sink pipeline. */
class StreamRecoverySpec extends SparkSpec {

  test("dedup state and sink offsets survive a checkpointed restart") {
    val in = Files.createTempDirectory("graft_rec_in").toString
    val out = Files.createTempDirectory("graft_rec_out").toString
    val ckpt = Files.createTempDirectory("graft_rec_ckpt").toString

    val ids = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"))
      .orderBy(col("event_id")).limit(200).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    import spark.implicits._

    def writeBatch(rows: Array[(Long, Long)], file: String): Unit = {
      // stage then move: the file stream source lists flat files, not
      // the directory a DataFrame writer produces
      val stage = Files.createTempDirectory("graft_rec_stage").toString
      rows.toSeq.toDF("event_id", "user_id").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        java.nio.file.Paths.get(in, s"$file.parquet"))
    }

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, user_id LONG")
        .parquet(in)
        .dropDuplicates("event_id")
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable()
      finally q.stop()
    }

    // run 1: first 150 events
    writeBatch(ids.take(150), "batch1")
    runOnce()
    assert(spark.read.parquet(out).count() == 150)

    // run 2 (same checkpoint): 50 replayed duplicates + 50 new events
    writeBatch(ids.slice(100, 200), "batch2")
    runOnce()
    val fin = spark.read.parquet(out)
    assert(fin.count() == 200, "restart must drop replayed duplicates")
    assert(fin.select("event_id").distinct().count() == 200)
    assert(fin.select(sum(col("event_id"))).head.getLong(0) ==
      ids.map(_._1).sum)
  }
}
