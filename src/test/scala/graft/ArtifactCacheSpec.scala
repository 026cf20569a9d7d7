package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The cross-process persisted-artifact envelope
  * (core.ArtifactCache.persisted): parquet round-trip under a
  * fingerprinted per-user key, schema-sidecar nullability restore,
  * version and fixture-fingerprint invalidation, stale-generation
  * expiry with path markers and a grace window, racing-publisher
  * resolution, crashed-scratch reaping, and scalar stat sidecars.
  * "Another process" is simulated with `spark.newSession()` — the
  * in-memory layer is keyed by session instance, so a new session
  * misses it and must take the read-back path. */
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

  private def artifactsRoot: java.io.File =
    ArtifactCache.userScopedRoot("artifacts_e1")

  /** Run `body` with the expiry grace window forced to `ms`. */
  private def withGrace[A](ms: Long)(body: => A): A = {
    val k = "graft.artifacts.expireGraceMs"
    val old = System.getProperty(k)
    System.setProperty(k, ms.toString)
    try body
    finally if (old == null) System.clearProperty(k)
    else System.setProperty(k, old)
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
      "stale generations are expired past the grace window") {
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
    withGrace(0) {
      val newTag = ArtifactCache.fixtureTag(d)
      assert(newTag != oldTag, "fingerprint must change with the fixture")
      val s2 = spark.newSession()
      ArtifactCache.persisted(s2, d, "spec_inv", "v2")(build).count()
      assert(builds == 3, "a regenerated fixture must rebuild")
      // the prior generation's directory is expired (same name, same
      // recorded path, different fingerprint) once past the grace window
      assert(new java.io.File(artifactsRoot, newTag).exists(),
        "the new generation must be persisted")
      assert(!new java.io.File(artifactsRoot, oldTag).exists(),
        s"stale generation $oldTag must be expired")
    }
  }

  test("rewriting a part file IN PLACE inside a parquet directory " +
      "(same names, same dir mtime) changes the fingerprint") {
    // ADVICE r13: the old fingerprint read only the top-level
    // (name, mtime, length) of each *.parquet entry — for a DIRECTORY
    // those are constant under in-place part rewrites, silently
    // serving stale artifacts for a regenerated fixture.
    val d = mkFixture()
    val before = ArtifactCache.fixtureTag(d)
    val parts = new java.io.File(s"$d/t.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty, "precondition: directory-shaped fixture")
    // same name, same length, new mtime — only a recursive walk sees it
    parts.foreach(p => assert(p.setLastModified(p.lastModified() + 5000)))
    assert(ArtifactCache.fixtureTag(d) != before,
      "part-file mtime must reach the fingerprint")
  }

  test("expiry keeps a same-basename tag whose recorded fixture PATH " +
      "differs, and keeps same-path stale tags inside the grace window") {
    // two fixtures named alike under different parents — only
    // generations of the SAME path may be reaped (ADVICE r13: the old
    // basename-only rule deleted the other live fixture's artifacts)
    val p1 = java.nio.file.Files.createTempDirectory("graft-ac-a")
    val p2 = java.nio.file.Files.createTempDirectory("graft-ac-b")
    val (d1, d2) = (s"$p1/twin", s"$p2/twin")
    spark.range(3).coalesce(1).write.parquet(s"$d1/t.parquet")
    spark.range(4).coalesce(1).write.parquet(s"$d2/t.parquet")
    withGrace(0) {
      ArtifactCache.persisted(spark, d1, "spec_twin", "v1")(
        spark.range(1).toDF()).count()
      val tag1 = ArtifactCache.fixtureTag(d1)
      // using the OTHER fixture must not reap tag1 even with zero grace
      ArtifactCache.persisted(spark, d2, "spec_twin", "v1")(
        spark.range(1).toDF()).count()
      assert(new java.io.File(artifactsRoot, tag1).exists(),
        "a different fixture sharing the basename must survive expiry")
    }
    // grace window: a stale generation of the SAME path survives while
    // recent (a concurrent process may still be scanning it)
    val d = mkFixture()
    ArtifactCache.persisted(spark, d, "spec_grace", "v1")(
      spark.range(2).toDF()).count()
    val oldTag = ArtifactCache.fixtureTag(d)
    Thread.sleep(1100)
    spark.range(7).coalesce(1).write.mode("overwrite")
      .parquet(s"$d/t.parquet")
    withGrace(3600L * 1000) {
      val s2 = spark.newSession()
      ArtifactCache.persisted(s2, d, "spec_grace", "v1")(
        spark.range(2).toDF()).count()
      assert(new java.io.File(artifactsRoot, oldTag).exists(),
        "a young stale generation must survive the grace window")
    }
    withGrace(0) {
      // force a fresh expiry pass via a new (name, tag) memo key:
      // regenerate once more so fixtureTag sees an unseen tag
      Thread.sleep(1100)
      spark.range(8).coalesce(1).write.mode("overwrite")
        .parquet(s"$d/t.parquet")
      ArtifactCache.fixtureTag(d)
      assert(!new java.io.File(artifactsRoot, oldTag).exists(),
        "past the grace window the stale generation is reaped")
    }
  }

  test("two publishers racing the same cold key: the loser's rename " +
      "is discarded cleanly and both serve the winner's bytes") {
    val d = mkFixture()
    var builds = 0
    val s2 = spark.newSession()
    // the outer (s) build publishes the artifact through ANOTHER
    // session mid-build — exactly the cross-process shape of bench and
    // verify warming the same cold key concurrently: the outer writer
    // then loses the rename, wipes its scratch, and reads the winner
    val out = ArtifactCache.persisted(spark, d, "spec_race", "v1") {
      ArtifactCache.persisted(s2, d, "spec_race", "v1") {
        builds += 1; spark.range(6).select(col("id"))
      }.count()
      builds += 1
      spark.range(6).select(col("id")) // deterministic: same bytes
    }
    assert(builds == 2, "both publishers must have run")
    assert(out.count() == 6, "the loser must serve the winner's copy")
    val tagDir = new java.io.File(artifactsRoot, ArtifactCache.fixtureTag(d))
    val scratches = Option(tagDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.contains(".build-"))
    assert(scratches.isEmpty,
      s"the losing scratch must be wiped: ${scratches.mkString(",")}")
    // a third session sees one complete artifact
    val s3 = spark.newSession()
    assert(ArtifactCache.persisted(s3, d, "spec_race", "v1")(
      sys.error("must read back")).count() == 6)
  }

  test("a crashed publisher's abandoned scratch (old mtime) is reaped " +
      "by the next cold build; a young scratch is left alone") {
    val d = mkFixture()
    val tagDir = new java.io.File(artifactsRoot, ArtifactCache.fixtureTag(d))
    tagDir.mkdirs()
    val dead = new java.io.File(tagDir, "spec_scr_v1.build-deadbeef")
    val young = new java.io.File(tagDir, "spec_other_v1.build-cafebabe")
    dead.mkdirs(); young.mkdirs()
    assert(dead.setLastModified(
      System.currentTimeMillis() - 2 * 3600L * 1000))
    ArtifactCache.persisted(spark, d, "spec_scr", "v1")(
      spark.range(1).toDF()).count()
    assert(!dead.exists(), "a 2h-old scratch is a crashed writer: reaped")
    assert(young.exists(), "a young scratch may be a live publisher: kept")
    young.delete()
  }

  test("persistedScalar publishes a stat sidecar inside the artifact " +
      "envelope; a fresh session answers it with zero computes") {
    val d = mkFixture()
    ArtifactCache.persisted(spark, d, "spec_stat", "v1")(
      spark.range(10).toDF()).count()
    var computes = 0
    val v = ArtifactCache.persistedScalar(spark, d, "spec_stat", "v1",
      "est") { computes += 1; 420L }
    assert(v == 420L && computes == 1)
    // same session: in-memory memo
    assert(ArtifactCache.persistedScalar(spark, d, "spec_stat", "v1",
      "est")(sys.error("memoized")) == 420L)
    // fresh session: the sidecar serves it — compute must not run
    val s2 = spark.newSession()
    assert(ArtifactCache.persistedScalar(s2, d, "spec_stat", "v1",
      "est")(sys.error("sidecar must serve")) == 420L)
    // the sidecar shares the artifact's invalidation axes: a version
    // bump is a different envelope dir, so the stat recomputes
    ArtifactCache.persisted(spark, d, "spec_stat", "v2")(
      spark.range(10).toDF()).count()
    assert(ArtifactCache.persistedScalar(spark, d, "spec_stat", "v2",
      "est")(7L) == 7L)
  }

  test("a corrupt stat sidecar is reaped and re-published, not " +
      "re-computed forever") {
    // ADVICE r14: the old parse-failure path returned compute() but
    // left the bad file in place — every future session paid the
    // sizing job again, silently losing the zero-job warm read.
    val d = mkFixture()
    ArtifactCache.persisted(spark, d, "spec_corrupt", "v1")(
      spark.range(10).toDF()).count()
    ArtifactCache.persistedScalar(spark, d, "spec_corrupt", "v1",
      "est")(99L)
    val tagDir = new java.io.File(artifactsRoot, ArtifactCache.fixtureTag(d))
    val f = new java.io.File(new java.io.File(tagDir, "spec_corrupt_v1"),
      "_graft_stat_est.json")
    assert(f.isFile, "precondition: sidecar published")
    java.nio.file.Files.writeString(f.toPath, "not a number")
    // a fresh session hits the corrupt file: recompute once AND repair
    val s2 = spark.newSession()
    var computes = 0
    assert(ArtifactCache.persistedScalar(s2, d, "spec_corrupt", "v1",
      "est") { computes += 1; 77L } == 77L)
    assert(computes == 1)
    assert(java.nio.file.Files.readString(f.toPath).trim == "77",
      "the sidecar must be repaired in place")
    // the session after the repair reads warm again — zero computes
    val s3 = spark.newSession()
    assert(ArtifactCache.persistedScalar(s3, d, "spec_corrupt", "v1",
      "est")(sys.error("repaired sidecar must serve")) == 77L)
  }

  test("ensureSafeRoot refuses a symlink or plain file planted at the " +
      "per-user root path, and a root owned by someone else") {
    val t = java.nio.file.Files.createTempDirectory("graft-safe")
    val victim = java.nio.file.Files.createTempDirectory("graft-victim")
    // symlink → victim dir: getOwner FOLLOWING links would see the
    // victim (current user) and pass; NOFOLLOW must refuse instead
    val link = t.resolve("root-link")
    java.nio.file.Files.createSymbolicLink(link, victim)
    val user = System.getProperty("user.name", "nouser")
    val e1 = intercept[IllegalArgumentException] {
      ArtifactCache.ensureSafeRoot(link.toFile, user)
    }
    assert(e1.getMessage.contains("not a plain directory"))
    // a regular file at the path is refused the same way
    val file = t.resolve("root-file")
    java.nio.file.Files.writeString(file, "x")
    intercept[IllegalArgumentException] {
      ArtifactCache.ensureSafeRoot(file.toFile, user)
    }
    // a directory owned by "someone else" (simulated via a wrong
    // expected user — the owner comparison is symmetric) is refused
    val dir = t.resolve("root-dir")
    java.nio.file.Files.createDirectory(dir)
    val e2 = intercept[IllegalArgumentException] {
      ArtifactCache.ensureSafeRoot(dir.toFile, user + "-not-me")
    }
    assert(e2.getMessage.contains("owned by"))
    // the happy path still works
    ArtifactCache.ensureSafeRoot(dir.toFile, user)
  }

  test("disk-budget sweep reaps least-recently-used foreign tags but " +
      "never an in-use tag, never inside the grace window") {
    // an ISOLATED scratch root, NOT the real artifactsRoot: a 1-byte
    // budget against the shared root would reap every warm artifact
    // of every other process on the machine (this spec's first cut
    // did exactly that — the next bench paid a 21 s rebuild)
    val root = java.nio.file.Files
      .createTempDirectory("graft-lru-root").toFile
    def plant(name: String, ageMs: Long): java.io.File = {
      val dir = new java.io.File(root, name)
      dir.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(dir, "_graft_fixture_path").toPath,
        s"/nonexistent/$name")
      java.nio.file.Files.write(
        new java.io.File(dir, "payload.bin").toPath,
        Array.fill[Byte](1 << 20)(7))
      val m = new java.io.File(dir, "_graft_fixture_path")
      assert(m.setLastModified(System.currentTimeMillis() - ageMs))
      dir
    }
    val live = plant("zzfake_cccccccccccc", 2 * 3600L * 1000)
    val old = plant("zzfake_aaaaaaaaaaaa", 2 * 3600L * 1000)
    val young = plant("zzfake_bbbbbbbbbbbb", 0L)
    val inUse = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    inUse.add(live.getName)
    val budgetKey = "graft.artifacts.maxBytes"
    val prior = System.getProperty(budgetKey)
    System.setProperty(budgetKey, "1") // force over-budget
    try withGrace(900000) {
      ArtifactCache.sweepDiskBudget(root, inUse)
      assert(!old.exists(), "the old untouched tag must be reaped")
      assert(young.exists(),
        "a tag touched inside the grace window must survive")
      assert(live.exists(),
        "an in-use tag must NEVER be reaped, even over budget and old")
    } finally {
      if (prior == null) System.clearProperty(budgetKey)
      else System.setProperty(budgetKey, prior)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(root)
    }
  }
}
