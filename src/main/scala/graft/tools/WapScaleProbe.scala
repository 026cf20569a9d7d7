package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.GraftLog

/** Delta-cost probe for the write-audit-publish surface: is the
  * stage → audit-read → publish lifecycle of a FIXED-size batch flat
  * in the size of the table it lands on? That is the claim that makes
  * per-batch auditing affordable at 100 TB — staging writes only the
  * batch, the audit read plans O(live + staged) like any snapshot
  * (and the batch-sized overlay must not blow up planning), and
  * publish commits pre-existing entries with zero data I/O.
  *
  * For each table size N (4x steps): seed N rows committed, then
  * stage a fixed 50k-row batch under a wap id, time (a) the staged
  * write, (b) a full audit read (count + a filtered aggregate over
  * snapshot + overlay), (c) the publish, and (d) an ordinary read
  * after publish. Flat (a)/(c) and near-baseline (b)/(d) growth
  * across N is the pass.
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures. Usage: runMain graft.tools.WapScaleProbe [sizes,csv]
  */
object WapScaleProbe {
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

    println("size | seed_s | stage_s | audit_read_s | audit_rows | " +
      "publish_s | read_s")
    sizes.foreach { n =>
      val base = new java.io.File(
        graft.core.ArtifactCache.userScopedRoot("wap_probe"), s"$n")
      rmrf(base); base.mkdirs()
      val dir = s"$base/t"
      val (_, seedS) = time {
        spark.range(0, n).selectExpr("id", "id % 1000 AS v")
          .repartitionByRange(16, col("id"))
          .write.format(Fmt).option("path", dir).mode("append").save()
      }
      spark.conf.set(GraftLog.WapConf, "probe")
      val (_, stageS) =
        try time {
          spark.range(n, n + Batch)
            .selectExpr("id", "CAST(1 AS BIGINT) AS v")
            .coalesce(4)
            .write.format(Fmt).option("path", dir).mode("append").save()
        } finally spark.conf.unset(GraftLog.WapConf)
      val ((auditRows, _), auditS) = time {
        val df = spark.read.format(Fmt).option("path", dir)
          .option("wapId", "probe").load()
        (df.count(), df.filter(col("v") === 1).agg(sum("id")).head)
      }
      val (_, publishS) = time(GraftLog.publishStaged(dir, "probe"))
      val (readRows, readS) = time(
        spark.read.format(Fmt).option("path", dir).load().count())
      require(auditRows == n + Batch && readRows == n + Batch,
        s"row accounting broke: audit=$auditRows read=$readRows")
      println(f"$n%8d | $seedS%6.2f | $stageS%6.2f | $auditS%6.2f | " +
        f"$auditRows%9d | $publishS%6.3f | $readS%6.2f")
      rmrf(base)
    }
    spark.stop()
  }
}
