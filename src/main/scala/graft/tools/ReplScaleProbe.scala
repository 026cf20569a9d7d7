package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.{GraftLog, Replication}

/** Delta-cost probe for typed-feed replication: is the cost of
  * syncing a FIXED-size change set (one merge touching a fixed key
  * band + one fixed-width range delete) flat in the size of the
  * mirrored table? That is the claim that makes a downstream mirror
  * affordable at 100 TB — the sync reads only the span's CDC sidecar
  * files and the merge/delete on the mirror rewrite only the files
  * whose stats admit the touched keys.
  *
  * For each source size N (4x steps): seed N rows, bootstrap the
  * mirror, apply a fixed 2k-key merge + a fixed 2k-row range delete
  * on the source, and time the incremental sync and a no-op re-sync.
  * Flat sync time across N is the pass; the bootstrap column shows
  * the O(N) cost the incremental path avoids paying per cycle.
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures. Usage: runMain graft.tools.ReplScaleProbe [sizes,csv]
  */
object ReplScaleProbe {
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

    println("size | seed_s | bootstrap_s | change_s | sync_s | " +
      "versions | noop_s | identical")
    sizes.foreach { n =>
      val base = new java.io.File(
        graft.core.ArtifactCache.userScopedRoot("repl_probe"), s"$n")
      rmrf(base); base.mkdirs()
      val src = s"$base/src"; val dst = s"$base/dst"
      val (_, seedS) = time {
        spark.range(0, n).selectExpr("id", "id AS v")
          .repartitionByRange(16, col("id"))
          .write.format(Fmt).option("path", src).mode("append").save()
        GraftLog.setProperties(src, Map("graft.cdf.enabled" -> "true"))
      }
      val (_, bootS) = time(Replication.sync(spark, src, dst, "id"))
      // fixed-size change set in a fixed key band, whatever N is
      val (_, changeS) = time {
        GraftLog.mergeUpsert(spark, src,
          spark.range(0, 2000).selectExpr("id", "id + 7777 AS v"),
          "id")
        GraftLog.deleteRange(spark, src, "id", 10000L, 12000L)
      }
      val (r1, syncS) = time(Replication.sync(spark, src, dst, "id"))
      val (_, noopS) = time(Replication.sync(spark, src, dst, "id"))
      val same = Replication.identical(spark, src, dst)
      println(f"$n%8d | $seedS%6.2f | $bootS%6.2f | $changeS%6.2f | " +
        f"$syncS%6.2f | ${r1.versionsApplied}%d | $noopS%6.3f | $same")
    }
    spark.stop()
  }
}
