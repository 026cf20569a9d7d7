package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The cross-process persisted-artifact envelope
  * (core.ArtifactCache.persisted): parquet round-trip under a
  * fingerprinted /tmp key, schema-sidecar nullability restore, version
  * and fixture-fingerprint invalidation, stale-generation expiry.
  * "Another process" is simulated with `spark.newSession()` — the
  * in-memory layer is keyed by session instance, so a new session
  * misses it and must take the /tmp read-back path. */
class ArtifactCacheSpec extends SparkSpec {
  import graft.core.ArtifactCache

  /** A throwaway fixture dir with one parquet file — the fingerprint
    * axis (name, mtime, size). */
  private def mkFixture(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-ac-fx")
    spark.range(5).coalesce(1).write.mode("overwrite")
      .parquet(s"$d/t.parquet")
    d.toString
  }

  test("read-back serves the persisted bytes (build NOT re-run) and " +
      "restores the recorded schema's nullability") {
    val d = mkFixture()
    val build = spark.range(4).select(col("id"),
      array(col("id"), col("id") + 1).as("arr"))
    val schema0 = build.schema
    assert(!schema0("id").nullable &&
      !schema0("arr").dataType.asInstanceOf[ArrayType].containsNull,
      "precondition: the build is non-nullable end to end")
    val first = ArtifactCache.persisted(spark, d, "spec_art", "v1")(build)
    assert(first.count() == 4)
    // a second SESSION misses the in-memory layer; the build thunk
    // throwing proves the parquet read-back served it
    val s2 = spark.newSession()
    val back = ArtifactCache.persisted(s2, d, "spec_art", "v1")(
      sys.error("build must not re-run on a warm /tmp"))
    assert(back.schema("id").nullable == false &&
      back.schema("arr").dataType.asInstanceOf[ArrayType]
        .containsNull == false,
      s"nullability must restore from the sidecar: ${back.schema}")
    assert(back.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
  }

  test("a version bump and a fixture regeneration each invalidate; " +
      "stale generations are expired from /tmp") {
    val d = mkFixture()
    var builds = 0
    def build = { builds += 1; spark.range(3).select(col("id")) }
    ArtifactCache.persisted(spark, d, "spec_inv", "v1")(build).count()
    assert(builds == 1)
    // same session: the in-memory layer serves it — no rebuild
    ArtifactCache.persisted(spark, d, "spec_inv", "v1")(build).count()
    assert(builds == 1)
    // version bump: rebuild even in the same session
    ArtifactCache.persisted(spark, d, "spec_inv", "v2")(build).count()
    assert(builds == 2)
    val oldTag = ArtifactCache.fixtureTag(d)
    // regenerate the fixture (new mtime/size) -> new fingerprint ->
    // a fresh session rebuilds rather than serving the old bytes
    Thread.sleep(1100) // mtime granularity
    spark.range(9).coalesce(1).write.mode("overwrite")
      .parquet(s"$d/t.parquet")
    val newTag = ArtifactCache.fixtureTag(d)
    assert(newTag != oldTag, "fingerprint must change with the fixture")
    val s2 = spark.newSession()
    ArtifactCache.persisted(s2, d, "spec_inv", "v2")(build).count()
    assert(builds == 3, "a regenerated fixture must rebuild")
    // the prior generation's directory is expired (same name,
    // different fingerprint) from whichever envelope root is current
    val roots = new java.io.File("/tmp").listFiles()
      .filter(_.getName.startsWith("graft_artifacts_")).toSeq
    assert(roots.exists(r => new java.io.File(r, newTag).exists()),
      "the new generation must be persisted")
    assert(roots.forall(r => !new java.io.File(r, oldTag).exists()),
      s"stale generation $oldTag must be expired")
  }
}
