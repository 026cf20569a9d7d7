package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.GraftLog

/** Delta-cost probe for the round-8 streaming CDC apply surface: is a
  * fixed-size change batch's apply cost FLAT in the size of the table
  * it lands on? That is the claim that makes the CDC-maintained
  * derived table affordable at 100 TB — per-run work bounded by the
  * append rate (stream planning O(versions in span), merge rewrite
  * bounded by the batch's key range through manifest stats), never by
  * accumulated table size.
  *
  * For each table size N (4x steps): seed a src table of N rows
  * (range layout), stream-apply it into dst (the O(N) backfill,
  * timed separately), then apply two FIXED 2k-row batches (1k updates
  * to a mid-range key window + 1k fresh inserts) through the same
  * foreachBatch merge the `sink_log_stream_cdc_apply` query uses,
  * timing each and recording how many files the merge rewrote.
  * Also reports log-planning provenance (checkpoint seeding + log
  * segments read) at the end of each run, since per-batch planning
  * cost is part of the delta-cost claim.
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures. Usage: runMain graft.tools.CdcScaleProbe [sizes,csv]
  */
object CdcScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(100000L, 400000L, 1600000L))
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory)
        Option(p.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      p.delete()
    }
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println("size | seed_s | batch1_s | batch1_rewrites | batch2_s | " +
      "batch2_rewrites | plan_segments")
    sizes.foreach { n =>
      val base = new java.io.File(
        graft.core.ArtifactCache.userScopedRoot("cdc_probe"), s"$n")
      rmrf(base); base.mkdirs()
      val src = s"$base/src"; val dst = s"$base/dst"
      val ckpt = s"$base/ckpt"
      // the same apply the sink_log_stream_cdc_apply fixture runs: the
      // stream feeds versions since the checkpoint; first batch seeds,
      // later batches merge by key
      var lastRewrites = (0, 0)
      def runApply(): Unit = {
        val q = spark.readStream.format("graft.sources.GraftLogSource")
          .option("path", src).load()
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            if (GraftLog.storedSchema(dst).isEmpty)
              batch.write.format("graft.sources.GraftLogSource")
                .option("path", dst).mode("append").save()
            else lastRewrites = GraftLog.mergeUpsert(spark, dst, batch, "id")
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }

      spark.range(0, n).selectExpr("id", "id AS v")
        .repartitionByRange(16, col("id"))
        .write.format("graft.sources.GraftLogSource")
        .option("path", src).mode("append").save()
      val (_, seedS) = time(runApply())

      def fixedBatch(tag: Long): Unit =
        spark.range(n / 2, n / 2 + 1000)
          .selectExpr("id", s"-id - $tag AS v")
          .union(spark.range(n + tag * 1000, n + tag * 1000 + 1000)
            .selectExpr("id", "-id AS v"))
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()

      fixedBatch(1)
      val (_, d1) = time(runApply())
      val r1 = lastRewrites
      fixedBatch(2)
      val (_, d2) = time(runApply())
      val r2 = lastRewrites
      val plan = GraftLog.snapshotAsOf(dst, Long.MaxValue)
      println(f"$n%8d | $seedS%6.2f | $d1%8.2f | ${r1._1}%d/${r1._2}%d | " +
        f"$d2%8.2f | ${r2._1}%d/${r2._2}%d | ${plan.segmentsRead}%d" +
        plan.checkpointVersion.fold("")(v => s" (ckpt@$v)"))
    }
    spark.stop()
  }
}
