package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming state/latency evidence at N× (VERDICT r14 #4): the
  * streaming family is correctness-pinned (stream == batch, five
  * queries in StreamingSpec) but "watermark keeps state bounded" was an
  * argument, not a measurement. This probe replays an amplified events
  * fixture as a sequence of rate-limited micro-batches and records,
  * per batch, the trigger wall, input rows, and the state store's
  * rows/bytes (`StreamingQueryProgress.stateOperators`) — the claim
  * becomes a table: state must plateau (watermark eviction keeping
  * pace) rather than grow with stream length.
  *
  * Fixture: events ×N with fresh (event_id, user_id) per copy — N×
  * users each keeping the original per-user timeline, the way a
  * production event stream grows — written range-partitioned and
  * sorted by `ts` so the file-stream source (which orders ties by
  * path) replays roughly in event-time order and the watermark
  * advances the way a live stream's would. Rate limiting uses
  * `spark.graft.stream.maxFilesPerTrigger` (see Tables.eventsStream).
  *
  * Perf evidence only — correctness stays gated on the driver fixtures
  * and StreamingSpec's stream==batch pins.
  *
  * Usage: runMain graft.tools.StreamScaleProbe [baseSfDir] [copies]
  */
object StreamScaleProbe {
  private[tools] val Files = 64 // replay granularity: 64 files, 4 per trigger

  /** Build (or reuse) the ${copies}x events amp (fresh event/user ids
    * per copy, ts-range-partitioned files) — factored out of main so
    * the spike probe replays the identical fixture. */
  def ensureAmp(spark: SparkSession, base: String, copies: Int): String = {
    val amp = new java.io.File(
      graft.core.ArtifactCache.userScopedRoot("amp_stream"),
      s"${copies}x_" + new java.io.File(base).getName).getPath
    val evSrc = new java.io.File(s"$base/events.parquet")
    val fingerprint = s"v1;base=${evSrc.getAbsolutePath};copies=$copies;" +
      s"files=$Files;${evSrc.length}:${evSrc.lastModified}"
    val marker = java.nio.file.Paths.get(amp, "AMP_MARKER")
    val fresh = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker) == fingerprint
    if (!fresh) {
      println(s"[sscale] building $amp (${copies}x events, " +
        s"$Files ts-ordered files)")
      graft.sources.Tables.withNanosAsLong(spark) {
        val ev = spark.read.parquet(evSrc.getPath)
        val shift = 1000000000L
        val shifted = (0 until copies).map { k =>
          ev.withColumn("event_id", col("event_id") + lit(k * shift))
            .withColumn("user_id", col("user_id") + lit(k * shift))
        }.reduce(_ unionByName _)
        shifted
          .repartitionByRange(Files, col("ts"))
          .sortWithinPartitions(col("ts"))
          .write.mode(SaveMode.Overwrite).parquet(s"$amp/events.parquet")
        val (nb, na) = (ev.count(),
          spark.read.parquet(s"$amp/events.parquet").count())
        require(na == nb * copies, s"amplified events $na != $copies x $nb")
      }
      java.nio.file.Files.writeString(marker, fingerprint)
    }
    amp
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") +
        "]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val amp = ensureAmp(spark, base, copies)

    import graft.streaming.EventWindows
    val streams = Seq[(String, (SparkSession, String) => DataFrame)](
      ("tumbling", EventWindows.tumblingStream),
      ("sessions", EventWindows.sessionsStream),
      ("attribution", EventWindows.attributionStream),
      ("dedup_replay", EventWindows.dedupReplayStream))

    spark.conf.set("spark.graft.stream.maxFilesPerTrigger", "4")
    val ckRoot = graft.core.ArtifactCache.userScopedRoot("stream_ck")
    for (dir <- Seq(base, amp); (name, mk) <- streams) {
      val tag = if (dir == base) "base" else s"${copies}x"
      val ck = new java.io.File(ckRoot,
        s"$tag-$name-${java.util.UUID.randomUUID().toString.take(8)}")
      val q = mk(spark, dir).writeStream.format("noop")
        .option("checkpointLocation", ck.getPath).start()
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      q.stop()
      def stateRows(p: org.apache.spark.sql.streaming.StreamingQueryProgress) =
        p.stateOperators.map(_.numRowsTotal).sum
      def stateBytes(p: org.apache.spark.sql.streaming.StreamingQueryProgress) =
        p.stateOperators.map(_.memoryUsedBytes).sum
      val durs = prog.map(_.durationMs.get("triggerExecution").toLong)
      val rows = prog.map(_.numInputRows)
      val sRows = prog.map(stateRows)
      val sBytes = prog.map(stateBytes)
      println(f"[sscale] $tag $name: batches=${prog.length} " +
        f"wall=$wall%.1f rows_total=${rows.sum} " +
        s"rows_per_batch~${if (prog.nonEmpty) rows.sum / prog.length else 0} " +
        s"batch_ms(min/med/max)=${if (durs.nonEmpty) durs.min else 0}/${
          if (durs.nonEmpty) durs.sorted.apply(durs.length / 2) else 0}/${
          if (durs.nonEmpty) durs.max else 0} " +
        s"state_rows(first/max/last)=${sRows.headOption.getOrElse(0L)}/${
          if (sRows.nonEmpty) sRows.max else 0}/${
          sRows.lastOption.getOrElse(0L)} " +
        s"state_mb_max=${if (sBytes.nonEmpty) sBytes.max >> 20 else 0}")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(ck)
    }
    spark.conf.unset("spark.graft.stream.maxFilesPerTrigger")
    spark.stop()
  }
}
