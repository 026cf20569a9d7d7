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
    // unreferenced ones and the committed data is untouched. The
    // default retention horizon protects in-flight writers' fresh
    // uncommitted parts, so these just-written orphans survive it:
    assert(graft.sources.GraftLog.vacuum(dir).isEmpty,
      "default-retention vacuum must keep fresh part files")
    // minAgeMs=0 (safe here: no write in progress) reclaims them.
    val removed = graft.sources.GraftLog.vacuum(dir, 0L)
    val onDisk = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(onDisk == graft.sources.GraftLog.committedFiles(dir).size,
      s"vacuum left orphans (removed=$removed)")
    assert(readBack(dir).count() == 100)
  }

  test("manifest min/max stats skip files a pushed predicate refutes") {
    val dir = tmp()
    // Three appends with disjoint id ranges → three part files whose
    // manifest stats partition the key space (the range-layout a real
    // ingest produces when data arrives roughly time-ordered).
    for (lo <- Seq(0L, 1000L, 2000L))
      spark.range(lo, lo + 1000)
        .selectExpr("id", "CAST(id AS DOUBLE) / 2 AS value")
        .coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    val sel = readBack(dir).filter(col("id") >= 2500L)
    assert(sel.count() == 500)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("files=1/3"),
      s"selective range predicate must plan 1 of 3 files:\n$plan")
    val eq = readBack(dir).filter(col("id") === 1500L)
    assert(eq.count() == 1)
    assert(eq.queryExecution.executedPlan.toString.contains("files=1/3"),
      "point lookup must plan exactly the one covering file")
    // A predicate matching nothing plans ZERO files — no I/O at all.
    val none = readBack(dir).filter(col("id") > 5000L)
    assert(none.count() == 0)
    assert(none.queryExecution.executedPlan.toString.contains("files=0/3"))
    // Skipping is conservative: rows inside the kept file still filter
    // (the 500 above), and an unsupported predicate keeps all files.
    val str = readBack(dir).filter(col("value") * 2 >= col("id"))
    assert(str.count() == 3000)
  }

  test("column pruning reaches the reader") {
    val dir = tmp()
    series(500).coalesce(1)
      .write.format(Fmt).option("path", dir).mode("append").save()
    val df = readBack(dir).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=[bucket]"),
      s"projection must prune to the one referenced column:\n$plan")
    assert(df.count() == 97)
  }

  test("compaction: current snapshot reads one file, history and CDF intact") {
    val dir = tmp()
    for (lo <- Seq(0L, 100L, 300L))
      spark.range(lo, lo + 100 + lo)
        .selectExpr("id", "CAST(id AS DOUBLE) AS value")
        .coalesce(1)
        .write.format(Fmt).option("path", dir).mode("append").save()
    // versions 0/1/2 hold 100/200/400-row... (ranges [0,100),[100,300),[300,700))
    val before = readBack(dir)
    val beforeRows = before.collect().toSet
    assert(graft.sources.GraftLog.compact(dir) == 3)
    // Reads are row-identical, and the new snapshot plans ONE file.
    val after = readBack(dir)
    assert(after.collect().toSet == beforeRows)
    assert(after.queryExecution.executedPlan.toString.contains("files=1/1"))
    // Compacted-file stats survive the merge: pruning still works.
    val pruned = readBack(dir).filter(col("id") >= 10000L)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("files=0/1"))
    // Old versions still time-travel to the pre-compaction snapshots.
    val v1 = spark.read.format(Fmt).option("path", dir)
      .option("asOfVersion", "1").load()
    assert(v1.count() == 300)
    // The change feed across the compaction version sees NO new rows
    // (dataChange=false): same data, new layout.
    val cdf = spark.read.format(Fmt).option("path", dir)
      .option("changesFromVersion", "2").load()
    assert(cdf.count() == 0,
      "compaction must be invisible to the change data feed")
    // History-preserving vacuum keeps the pre-compaction parts...
    assert(graft.sources.GraftLog.vacuum(dir, 0L).isEmpty)
    // ...expireHistory reclaims them; the current snapshot still reads.
    val reclaimed = graft.sources.GraftLog.vacuum(dir, 0L,
      expireHistory = true)
    assert(reclaimed.size == 3, s"expected 3 pre-compaction parts, " +
      s"got $reclaimed")
    assert(readBack(dir).collect().toSet == beforeRows)
  }

  test("change data feed returns exactly the appended delta") {
    val dir = tmp()
    spark.range(0, 100).selectExpr("id", "id * 2 AS y")
      .write.format(Fmt).option("path", dir).mode("append").save()
    spark.range(100, 250).selectExpr("id", "id * 2 AS y")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val cdf = spark.read.format(Fmt).option("path", dir)
      .option("changesFromVersion", "0").load()
    assert(cdf.count() == 150)
    assert(cdf.agg(min(col("id")), max(col("id"))).head ==
      org.apache.spark.sql.Row(100L, 249L))
  }

  test("concurrent same-JVM appends both commit (locked manifest RMW)") {
    val dir = tmp()
    val threads = (0 until 2).map { k =>
      new Thread(() =>
        spark.range(k * 1000, k * 1000 + 500)
          .selectExpr("id", "CAST(id AS DOUBLE) AS value")
          .write.format(Fmt).option("path", dir).mode("append").save())
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(readBack(dir).count() == 1000,
      "neither concurrent commit may drop the other's files")
    assert(graft.sources.GraftLog.currentVersion(dir) == 1L)
  }

  test("reading a nonexistent table path fails instead of creating it") {
    val ghost = tmp() + "/no_such_table"
    intercept[Exception] { readBack(ghost).count() }
    assert(!new java.io.File(ghost).exists(),
      "a read must not mkdirs the table directory")
  }

  test("schema evolution: wider append reads old rows as null") {
    val dir = tmp()
    spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    spark.range(100, 150)
      .selectExpr("id", "CAST(id AS DOUBLE) AS v", "concat('x', id) AS tag")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val back = readBack(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v", "tag"))
    assert(back.schema("tag").nullable)
    assert(back.count() == 150)
    // pre-evolution rows read NULL for the added column; post rows don't
    assert(back.filter(col("tag").isNull).agg(count(lit(1)), max(col("id")))
      .collect()(0).toSeq == Seq(100L, 99L))
    assert(back.filter(col("tag") === "x120").select(col("id"))
      .collect().map(_.getLong(0)).toSeq == Seq(120L))
    // time travel still reads version 0 in its own (narrow-compatible) shape
    val v0 = spark.read.format(Fmt).option("path", dir)
      .option("asOfVersion", "0").load()
    assert(v0.count() == 100 &&
      v0.filter(col("tag").isNotNull).count() == 0)
  }

  test("schema evolution: type change rejects loudly") {
    val dir = tmp()
    spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .write.format(Fmt).option("path", dir).mode("append").save()
    val e = intercept[Exception] {
      spark.range(10).selectExpr("id", "concat('s', id) AS v")
        .write.format(Fmt).option("path", dir).mode("append").save()
    }
    assert(e.getMessage != null)
    // table unchanged after the rejected write
    assert(readBack(dir).count() == 10)
  }

  test("schema evolution: filter on the added column skips old files") {
    val dir = tmp()
    spark.range(100).selectExpr("id")
      .coalesce(1).write.format(Fmt).option("path", dir)
      .mode("append").save()
    spark.range(100, 200).selectExpr("id", "id * 10 AS score")
      .coalesce(1).write.format(Fmt).option("path", dir)
      .mode("append").save()
    val q = readBack(dir).filter(col("score") >= 1500)
    // the pre-evolution file can never match a comparison on `score`
    val desc = q.queryExecution.executedPlan.toString
    assert(desc.contains("files=1/2"),
      s"expected evolution-aware file skip (files=1/2) in:\n$desc")
    assert(q.count() == 50)
  }

  test("schema evolution: compaction rewrites every vintage into one layout") {
    val dir = tmp()
    spark.range(10).selectExpr("id")
      .coalesce(1).write.format(Fmt).option("path", dir)
      .mode("append").save()
    spark.range(10, 20).selectExpr("id", "CAST(id AS DOUBLE) / 2 AS v")
      .coalesce(1).write.format(Fmt).option("path", dir)
      .mode("append").save()
    val before = readBack(dir).orderBy("id").collect().map(_.toSeq).toSeq
    assert(graft.sources.GraftLog.compact(dir) == 2)
    val after = readBack(dir).orderBy("id").collect().map(_.toSeq).toSeq
    assert(after == before, "compaction must not change row content")
    assert(graft.sources.GraftLog
      .entriesAsOf(dir, Long.MaxValue).size == 1)
    // nulls survive the rewrite: old-vintage rows still read NULL v
    assert(readBack(dir).filter(col("v").isNull).count() == 10)
  }
}
