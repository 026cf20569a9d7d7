package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.{GraftLog, MaterializedAgg}

/** Delta-cost probe for incremental materialized-view maintenance: is
  * the refresh cost of a FIXED-size appended batch flat in the size of
  * the source table (and of the view) it lands on? That is the claim
  * that makes a maintained aggregate affordable at 100 TB — the
  * refresh scans the change feed's delta files (O(batch)), combines
  * with only the view rows holding touched groups, and the merge
  * rewrites only the view files whose stats admit those groups.
  *
  * For each source size N (4x steps): seed N rows over 10k groups and
  * bootstrap the view, then append a fixed 50k-row batch touching a
  * fixed 200-group band and time (a) the incremental refresh, and
  * (b) a no-op re-refresh (the exactly-once marker check). Flat (a)
  * across N — with deltaFiles fixed and rewritten view files bounded
  * — and metadata-only (b) is the pass. A final full recompute per N
  * shows the cost the incremental path avoids.
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures. Usage: runMain graft.tools.MvScaleProbe [sizes,csv]
  */
object MvScaleProbe {
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
    val Batch = 50000L
    val Groups = 10000L

    println("size | seed_s | bootstrap_s | refresh_s | delta_files | " +
      "mv_rw/mv_total | noop_s | full_recompute_s")
    sizes.foreach { n =>
      val base = new java.io.File(
        graft.core.ArtifactCache.userScopedRoot("mv_probe"), s"$n")
      rmrf(base); base.mkdirs()
      val src = s"$base/src"; val mv = s"$base/mv"
      val (_, seedS) = time {
        spark.range(0, n).selectExpr("id", s"id % $Groups AS bucket",
            "id AS v")
          .repartitionByRange(16, col("id"))
          .write.format(Fmt).option("path", src).mode("append").save()
      }
      val (_, bootS) = time {
        MaterializedAgg.refresh(spark, src, mv, "bucket", Seq("v"),
          mvBuckets = 16)
      }
      // fixed batch into a fixed 200-group band, one delta file
      val (_, _) = time {
        spark.range(n, n + Batch).selectExpr("id",
            "id % 200 AS bucket", "id AS v")
          .coalesce(1)
          .write.format(Fmt).option("path", src).mode("append").save()
      }
      val (r1, refreshS) = time {
        MaterializedAgg.refresh(spark, src, mv, "bucket", Seq("v"))
      }
      val (r2, noopS) = time {
        MaterializedAgg.refresh(spark, src, mv, "bucket", Seq("v"))
      }
      require(r1.mode == "incremental" && r2.mode == "noop",
        s"probe broke the lifecycle: $r1 / $r2")
      val (_, fullS) = time {
        spark.read.format(Fmt).option("path", src).load()
          .filter(col("bucket").isNotNull)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"$n%8d | $seedS%6.2f | $bootS%6.2f | $refreshS%6.2f | " +
        f"${r1.deltaFiles}%d/${r1.srcFilesTotal}%d | " +
        f"${r1.rewrittenMvFiles}%d/${r1.mvFilesTotal}%d | " +
        f"$noopS%6.3f | $fullS%6.2f")
      rmrf(base)
    }
    spark.stop()
  }
}
