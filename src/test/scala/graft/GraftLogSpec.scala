package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The custom transactional sink's contract: manifest-gated visibility
  * (round trip, append accumulation, overwrite truncation) and — the
  * point of the commit protocol — a failed job leaves the table
  * bit-for-bit unchanged, its orphan part files invisible. */
class GraftLogSpec extends SparkSpec {
  private val Fmt = "graft.sources.GraftLogSource"
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-log").toString
  private def series(n: Int): DataFrame =
    spark.range(n).selectExpr("id",
      "CAST(id % 97 AS INT) AS bucket",
      "CAST(id AS DOUBLE) / 2 AS value",
      "concat('t', id % 7) AS tag")
  private def readBack(dir: String): DataFrame =
    spark.read.format(Fmt).option("path", dir).load()

  test("append round trip preserves every row and type") {
    val dir = tmp()
    val df = series(1000)
    df.write.format(Fmt).option("path", dir).mode("append").save()
    val back = readBack(dir)
    assert(back.schema == df.schema)
    assert(back.count() == 1000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("second append accumulates; overwrite truncates") {
    val dir = tmp()
    series(100).write.format(Fmt).option("path", dir).mode("append").save()
    series(100).write.format(Fmt).option("path", dir).mode("append").save()
    assert(readBack(dir).count() == 200)
    series(30).write.format(Fmt).option("path", dir)
      .mode("overwrite").save()
    assert(readBack(dir).count() == 30)
  }

  test("time travel: asOfVersion reads a historical snapshot") {
    val dir = tmp()
    series(100).write.format(Fmt).option("path", dir).mode("append").save()
    series(250).write.format(Fmt).option("path", dir).mode("append").save()
    assert(graft.sources.GraftLog.currentVersion(dir) == 1L)
    assert(readBack(dir).count() == 350)
    val v0 = spark.read.format(Fmt).option("path", dir)
      .option("asOfVersion", "0").load()
    assert(v0.count() == 100, "version 0 must be the first commit alone")
    // overwrite starts a new lineage at version 0
    series(30).write.format(Fmt).option("path", dir)
      .mode("overwrite").save()
    assert(graft.sources.GraftLog.currentVersion(dir) == 0L)
    assert(readBack(dir).count() == 30)
  }

  test("streaming write commits epochs exactly once across restarts") {
    val dir = tmp(); val ckpt = tmp()
    val batch = spark.read.parquet(s"$sf0001/events.parquet")
    def run(): Unit = {
      val q = spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf0001)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format(Fmt).option("path", dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val n = batch.count()
    assert(readBack(dir).count() == n)
    // Restart from the same checkpoint: nothing new to process, and a
    // replayed epoch publishes nothing twice.
    run()
    assert(readBack(dir).count() == n,
      "restart must not duplicate committed epochs")
  }

  test("a failed job is invisible: manifest-gated atomicity") {
    val dir = tmp()
    series(100).write.format(Fmt).option("path", dir).mode("append").save()
    val boom = udf((l: Long) => {
      if (l == 50L) throw new RuntimeException("boom")
      l
    })
    intercept[Exception] {
      spark.range(100)
        .select(boom(col("id")).as("id"),
          lit(0).as("bucket"), lit(0.0).as("value"), lit("t").as("tag"))
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    val back = readBack(dir)
    assert(back.count() == 100,
      "failed job's partial part files must never become visible")
    // Orphan part files may exist on disk — visibility is the manifest's
    // job, not the directory listing's. Vacuum removes exactly the
    // unreferenced ones and the committed data is untouched.
    val removed = graft.sources.GraftLog.vacuum(dir)
    val onDisk = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(onDisk == graft.sources.GraftLog.committedFiles(dir).size,
      s"vacuum left orphans (removed=$removed)")
    assert(readBack(dir).count() == 100)
  }
}
