package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.GraftLog

/** Delta-cost probe for the STREAMING typed change feed: is the cost
  * of draining a FIXED-size change set (one 2k-key merge + one
  * 2k-row range delete) flat in the size of the source table? That
  * is the claim that makes a continuous typed consumer affordable at
  * 100 TB — each micro-batch plans only its version span's CDC
  * sidecar files, never the snapshot.
  *
  * For each source size N (4x steps): seed N rows, drain the seed
  * through a checkpoint (the bootstrap cost a consumer pays once),
  * apply the fixed change set, and time the incremental drain and a
  * no-op drain (stream at head). Flat incremental/no-op time across
  * N is the pass; the bootstrap column shows the O(N) cost the
  * checkpoint prevents recurring.
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures (sink_log_stream_cdf_typed and CdfTypedSpec).
  * Usage: runMain graft.tools.CdfStreamScaleProbe [sizes,csv]
  */
object CdfStreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(100000L, 400000L, 1600000L, 6400000L))
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory)
        Option(p.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      p.delete()
    }
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val Fmt = "graft.sources.GraftLogSource"

    println("size | seed_s | bootstrap_s | change_s | drain_s | " +
      "noop_s | drained_rows | typed_ok")
    sizes.foreach { n =>
      val base = new java.io.File(
        graft.core.ArtifactCache.userScopedRoot("cdfstream_probe"), s"$n")
      rmrf(base); base.mkdirs()
      val src = s"$base/src"; val sink = s"$base/sink"
      val ckpt = s"$base/ckpt"
      def drain(): Unit = {
        val q = GraftLog.typedChangesStream(spark, src)
          .writeStream.format(Fmt).option("path", sink)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally q.stop()
      }
      val (_, seedS) = time {
        spark.range(0, n).selectExpr("id", "id AS v")
          .repartitionByRange(16, col("id"))
          .write.format(Fmt).option("path", src).mode("append").save()
        GraftLog.setProperties(src, Map("graft.cdf.enabled" -> "true"))
      }
      val (_, bootS) = time(drain())
      // fixed-size change set in a fixed key band, whatever N is
      val (_, changeS) = time {
        GraftLog.mergeUpsert(spark, src,
          spark.range(0, 2000).selectExpr("id", "id + 7777 AS v"),
          "id")
        GraftLog.deleteRange(spark, src, "id", 10000L, 12000L)
      }
      val before = spark.read.format(Fmt).option("path", sink)
        .load().count()
      val (_, drainS) = time(drain())
      val (_, noopS) = time(drain())
      val post = spark.read.format(Fmt).option("path", sink).load()
        .filter(col("_change_type") =!= "insert" ||
          col("id") >= n)
      // 2000 pre + 2000 post images, 2000 deletes; inserts only from
      // the seed (the merge band sits inside existing keys)
      val typedOk = post.groupBy(col("_change_type")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("update_preimage" -> 2000L, "update_postimage" -> 2000L,
          "delete" -> 2000L)
      val total = spark.read.format(Fmt).option("path", sink)
        .load().count()
      println(f"$n%8d | $seedS%6.2f | $bootS%6.2f | $changeS%6.2f | " +
        f"$drainS%6.2f | $noopS%6.3f | ${total - before}%d | $typedOk")
    }
    spark.stop()
  }
}
