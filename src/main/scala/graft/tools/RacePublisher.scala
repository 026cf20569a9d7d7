package graft.tools

import org.apache.spark.sql.functions._

/** TRUE cross-process racing-publisher check for the persisted-artifact
  * envelope: launch TWO of these simultaneously (raw `java -cp ...`,
  * not sbt — sbt serializes on the project lock) against the same
  * fixture dir and a key neither process has built. Both take the cold
  * path, both build (the deliberate sleep keeps their build windows
  * overlapped), one rename wins, the loser wipes its scratch and serves
  * the winner's bytes. Each process prints `RACE_ROWS=<n>` and
  * `RACE_SCRATCH=<count>`; the harness asserts both print the same row
  * count and zero leftover scratch dirs. Complements ArtifactCacheSpec's
  * same-process two-session pin with real process isolation.
  *
  * Usage: RacePublisher <fixtureDir> <key> [sleepMs]
  */
object RacePublisher {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val key = args(1)
    val sleepMs = args.lift(2).map(_.toLong).getOrElse(3000L)
    val spark = graft.functions.GraftExtensions
      .builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.core.ArtifactCache.persisted(spark, d, key, "v1") {
      Thread.sleep(sleepMs) // hold the build window open for the race
      spark.range(1234).select(col("id"), (col("id") * 3).as("v"))
    }
    println(s"RACE_ROWS=${df.count()}")
    val tagDir = new java.io.File(
      graft.core.ArtifactCache.userScopedRoot("artifacts_e1"),
      graft.core.ArtifactCache.fixtureTag(d))
    val scratch = Option(tagDir.listFiles()).getOrElse(Array.empty)
      .count(_.getName.contains(".build-"))
    println(s"RACE_SCRATCH=$scratch")
    spark.stop()
  }
}
