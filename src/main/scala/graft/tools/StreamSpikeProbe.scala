package graft.tools

import org.apache.spark.sql.functions._

/** Per-batch latency breakdown for the attribution stream's max-batch
  * spikes (VERDICT r15 #6): PERF_r21 §4 measured the attribution
  * stream's MEDIAN per-batch latency flat across 10×→30× but the MAX
  * spiking to 7–9 s (2–4× its median), the only stream with that
  * shape. This probe replays the same amplified fixture and prints,
  * per batch, the full `StreamingQueryProgress.durationMs` breakdown
  * (addBatch / getBatch / latestOffset / queryPlanning / walCommit /
  * commitOffsets) plus per-state-operator update/removal/commit times
  * and row counts — enough to name the spike's phase: state-store
  * commit, watermark-advance eviction, a skewed user's view band, or
  * the first-batch-per-file-group input surge.
  *
  * Usage: runMain graft.tools.StreamSpikeProbe [baseSfDir] [copies]
  */
object StreamSpikeProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") +
        "]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val amp = StreamScaleProbe.ensureAmp(spark, base, copies)

    spark.conf.set("spark.graft.stream.maxFilesPerTrigger", "4")
    val ck = new java.io.File(
      graft.core.ArtifactCache.userScopedRoot("stream_spike_ck"),
      java.util.UUID.randomUUID().toString.take(8))
    val q = graft.streaming.EventWindows.attributionStream(spark, amp)
      .writeStream.format("noop")
      .option("checkpointLocation", ck.getPath).start()
    q.processAllAvailable()
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    def d(p: org.apache.spark.sql.streaming.StreamingQueryProgress,
        k: String): Long =
      Option(p.durationMs.get(k)).map(_.longValue).getOrElse(-1L)
    prog.foreach { p =>
      val so = p.stateOperators.toSeq
      println(s"[spike] batch=${p.batchId} rows=${p.numInputRows} " +
        s"trigger=${d(p, "triggerExecution")} " +
        s"addBatch=${d(p, "addBatch")} getBatch=${d(p, "getBatch")} " +
        s"latestOffset=${d(p, "latestOffset")} " +
        s"plan=${d(p, "queryPlanning")} wal=${d(p, "walCommit")} " +
        s"commitOffsets=${d(p, "commitOffsets")} " +
        s"wm=${Option(p.eventTime.get("watermark")).getOrElse("-")} " +
        s"stateRows=${so.map(_.numRowsTotal).sum} " +
        s"updated=${so.map(_.numRowsUpdated).sum} " +
        s"removed=${so.map(_.numRowsRemoved).sum} " +
        s"updMs=${so.map(_.allUpdatesTimeMs).sum} " +
        s"rmMs=${so.map(_.allRemovalsTimeMs).sum} " +
        s"commitMs=${so.map(_.commitTimeMs).sum}")
    }
    val durs = prog.map(p => d(p, "triggerExecution"))
    if (durs.nonEmpty)
      println(s"[spike] batches=${prog.length} " +
        s"trigger(min/med/max)=${durs.min}/${
          durs.sorted.apply(durs.length / 2)}/${durs.max}")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(ck)
    spark.stop()
  }
}
