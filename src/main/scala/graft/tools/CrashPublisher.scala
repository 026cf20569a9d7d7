package graft.tools

import java.io.File
import org.apache.spark.sql.functions._

/** Crash-torture for the graft-log commit protocol with a REAL killed
  * JVM (VERDICT r14 #5) — the cross-process sibling of GraftLogSpec's
  * in-process aborts, the way RacePublisher is the artifact race's:
  * a writer process appends three acknowledged batches, then starts a
  * fourth with a crash window armed (`-Dgraft.log.crashWindow=...`,
  * see LogSource.crashWindow) and parks at a deterministic point in
  * the commit; the orchestrator `destroyForcibly()`s it there and
  * asserts the recovery contract:
  *
  *  - killed BEFORE the hard-link CAS (`preLink`): readers see exactly
  *    the three acknowledged batches — the fourth's part files and tmp
  *    commit are invisible orphans, never a torn version;
  *  - killed AFTER the link (`postLink`): the fourth commit is fully
  *    visible (the link is atomic and the tmp was complete before it),
  *    the orphaned tmp and the skipped checkpoint are cosmetic;
  *  - in BOTH states the next writer self-heals: a fresh append
  *    commits the next version and the table reads consistently.
  *
  * GraftLogSpec ("kill window" tests) pins the same two torn states
  * deterministically in-process; this tool proves them against real
  * process death. Prints `CRASH_OK phase=<p>` per phase; any broken
  * invariant throws.
  *
  * Usage: runMain graft.tools.CrashPublisher [preLink|postLink|all]
  *        CrashPublisher writer <dir> <phase>   (internal, spawned)
  */
object CrashPublisher {
  private val Fmt = "graft.sources.GraftLogSource"
  private val BatchRows = 1000L

  private def batch(spark: org.apache.spark.sql.SparkSession, k: Int) =
    spark.range(k * BatchRows, (k + 1) * BatchRows)
      .selectExpr("id", "CAST(id % 7 AS INT) AS bucket")

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("writer")) {
      writer(args(1), args(2)); return
    }
    val phases = args.headOption match {
      case Some("preLink") => Seq("preLink")
      case Some("postLink") => Seq("postLink")
      case _ => Seq("preLink", "postLink")
    }
    val spark = graft.functions.GraftExtensions
      .builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (phase <- phases) {
      val dir = new File(
        graft.core.ArtifactCache.userScopedRoot("crash"),
        s"$phase-${java.util.UUID.randomUUID().toString.take(8)}").getPath

      // spawn the writer JVM with the window armed
      val addOpens = Seq("java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio", "java.base/java.util",
        "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
        "java.base/sun.nio.cs", "java.base/sun.security.action",
        "java.base/sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cp = "target/scala-2.13/classes:/opt/spark/jars/*"
      val cmd = (Seq("java") ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC", "-Xmx4g", "-cp", cp,
        "graft.tools.CrashPublisher", "writer", dir, phase)).toArray
      val proc = new ProcessBuilder(cmd: _*).inheritIO().start()

      // wait for the writer to park inside the armed window, then kill
      val markerF = new File(dir, s"_crash_window_$phase")
      val deadline = System.currentTimeMillis() + 180000
      while (!markerF.isFile && proc.isAlive &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      require(markerF.isFile,
        s"writer never reached the $phase window (alive=${proc.isAlive})")
      proc.destroyForcibly()
      proc.waitFor()
      println(s"[crash] $phase: killed writer pid in the window")

      // ---- invariant 1: never a torn version ------------------------
      val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      val commits = files.filter(f => f.getName.startsWith("_commit.") &&
        !f.getName.contains(".tmp.")).map(_.getName).sorted
      val tmps = files.count(_.getName.contains(".tmp."))
      val expectBatches = if (phase == "preLink") 3 else 4
      val got = spark.read.format(Fmt).option("path", dir).load()
      val n = got.count()
      require(n == expectBatches * BatchRows,
        s"$phase: read $n rows, want ${expectBatches * BatchRows} " +
          s"(commits=${commits.mkString(",")})")
      // the acknowledged batches are bit-intact, not just counted
      val ids = got.agg(min(col("id")), max(col("id")),
        countDistinct(col("id"))).head()
      require(ids.getLong(0) == 0 &&
        ids.getLong(1) == expectBatches * BatchRows - 1 &&
        ids.getLong(2) == expectBatches * BatchRows,
        s"$phase: torn id range $ids")
      require(tmps >= 1, s"$phase: expected the killed writer's tmp orphan")
      println(s"[crash] $phase: visible=$n rows, commits=${commits.length}, " +
        s"tmp_orphans=$tmps — no torn version")

      // ---- invariant 2: the next writer self-heals ------------------
      batch(spark, 9).write.format(Fmt).option("path", dir)
        .mode("append").save()
      val healed = spark.read.format(Fmt).option("path", dir).load().count()
      require(healed == (expectBatches + 1) * BatchRows,
        s"$phase: post-heal count $healed")
      // and versions replay cleanly from 0 (no gap the reader trips on)
      val snap = graft.sources.GraftLog.snapshotAsOf(dir, Long.MaxValue)
      require(snap.entries.nonEmpty, s"$phase: empty snapshot after heal")
      println(s"CRASH_OK phase=$phase healed_rows=$healed")
    }
    spark.stop()
  }

  /** The spawned writer: three acknowledged appends, then a fourth that
    * parks inside the armed crash window until killed. The window is
    * armed only AFTER the acknowledged appends — arming it via the
    * spawn command line would park the very first commit. */
  private def writer(dir: String, phase: String): Unit = {
    val spark = graft.functions.GraftExtensions
      .builder("local[2]", "2").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- 0 until 3) {
      batch(spark, k).write.format(Fmt).option("path", dir)
        .mode("append").save()
      println(s"ACK batch=$k")
    }
    System.setProperty("graft.log.crashWindow", phase)
    // the armed window makes this commit park; we die here
    batch(spark, 3).write.format(Fmt).option("path", dir)
      .mode("append").save()
    println("UNREACHABLE: the orchestrator should have killed us")
  }
}
