package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale spot-check: amplify the sf0.1 fixtures 8× (key-shifted copies
  * — preserves join fan-in, dedup pair structure, and LSH bucket load
  * per copy) into /tmp, then run the heavy query set against the
  * amplified directory with interleaved control scans. A query whose
  * amplified/baseline ratio is ≲ the 8× data ratio scales at-worst
  * linearly; the LSH-bounded dedup family should come in well under.
  *
  * Perf evidence only — correctness stays gated on the driver fixtures.
  * Usage: runMain graft.tools.ScaleProbe [baseSfDir] [copies]
  */
object ScaleProbe {
  /** Build (or reuse) the key-shifted N× amplified fixture dir for
    * `base` and return its path — shared with [[TpchScaleProbe]], which
    * runs the full TPC-H board over the same corpus. */
  def ensureAmp(spark: SparkSession, base: String, copies: Int): String = {
    // ADVICE r14: the amp cache trusts pre-existing contents via its
    // freshness marker, whose fingerprint is computable from
    // world-readable metadata — under a fixed world-writable /tmp name
    // another local user could pre-plant a poisoned corpus+marker. Same
    // fix as every other scratch root: per-user 0700 ownership-checked
    // root (DedupScaleProbe's amp_dedup already lives there).
    val amp = new java.io.File(
      graft.core.ArtifactCache.userScopedRoot("amp"),
      s"${copies}x_${new java.io.File(base).getName}").getPath

    def amplify(table: String, keyCols: Seq[String],
        saltText: Boolean = false): Unit = {
      val out = s"$amp/$table.parquet"
      if (new java.io.File(out, "_SUCCESS").exists()) return
      val src = spark.read.parquet(s"$base/$table.parquet")
      val shift = 1000000000L
      val parts = (0 until copies).map { k =>
        val shifted = keyCols.foldLeft(src) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * shift)) }
        // Token-salt document text per copy: verbatim copies would all
        // collide in the SAME LSH buckets (identical shingles →
        // identical signatures), making every doc an exact near-dup of
        // its 7 clones — a 64x-denser dedup graph, not an 8x corpus.
        // Suffixing every token with the copy id keeps the within-copy
        // token/shingle structure isomorphic (planted near-dups stay
        // near-dups) and zeroes cross-copy overlap, so the probe
        // measures the algorithm at 8x structure, not a pathological
        // density it would never see.
        if (saltText && k > 0)
          shifted.withColumn("text",
            concat_ws(" ", transform(split(col("text"), "\\s+"),
              t => concat(t, lit("_" + k)))))
        else shifted
      }
      parts.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(out)
    }
    def passthrough(table: String): Unit = {
      val out = s"$amp/$table.parquet"
      if (new java.io.File(out).exists()) return
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$base/$table.parquet"),
        java.nio.file.Paths.get(out))
    }

    // The amp dir is a /tmp cache; amplify()/passthrough() skip tables
    // that already exist. A cache built from DIFFERENT base files (a
    // regenerated fixture, another dir with the same leaf name) must
    // not be reused — the marker fingerprints the absolute base path,
    // copy count, and every base file's (size, mtime); any mismatch
    // wipes the cache and rebuilds.
    val allTables = Seq("documents", "lineitem", "orders", "embeddings",
      "customer", "supplier", "nation", "region", "part", "events")
    val fingerprint = {
      val sigs = allTables.map { t =>
        val f = new java.io.File(s"$base/$t.parquet")
        s"$t:${f.length}:${f.lastModified}"
      }
      // v2: documents token-salted per copy (amplifier change must
      // invalidate caches built by the old code)
      s"v2;base=${new java.io.File(base).getAbsolutePath};copies=$copies;" +
        sigs.mkString(",")
    }
    val marker = java.nio.file.Paths.get(amp, "AMP_MARKER")
    val fresh = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker) == fingerprint
    if (!fresh && new java.io.File(amp).exists()) {
      println(s"[scale] stale amp cache, wiping $amp")
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(amp))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }

    println(s"[scale] building $amp (${copies}x)")
    amplify("documents", Seq("doc_id"), saltText = true)
    amplify("lineitem", Seq("l_orderkey"))
    amplify("orders", Seq("o_orderkey"))
    amplify("embeddings", Seq("vec_id"))
    // events ts encoding varies by fixture generation (int64 nanos /
    // timestamp[us]); reading under nanosAsLong carries either form
    // unchanged through the copy, and Tables.events dispatches on the
    // amplified dir the same way. Shifting user_id gives 8x users with
    // the original per-user timeline each — grid and window load
    // scale, per-task state does not.
    graft.sources.Tables.withNanosAsLong(spark) {
      amplify("events", Seq("event_id", "user_id"))
    }
    Seq("customer", "supplier", "nation", "region", "part")
      .foreach(passthrough)

    // Belt-and-suspenders on top of the marker (an earlier probe
    // recorded ~1x numbers as 8x off a stale partial build): the five
    // amplified tables must count exactly copies x base. The marker is
    // stamped only AFTER validation passes — stamping first would mark
    // a failing cache fresh and disable the auto-wipe forever.
    for (t <- Seq("documents", "lineitem", "orders", "embeddings",
        "events")) {
      val read = (p: String) => graft.sources.Tables.withNanosAsLong(
        spark)(spark.read.parquet(p).count())
      val (nb, na) = (read(s"$base/$t.parquet"), read(s"$amp/$t.parquet"))
      require(na == nb * copies,
        s"$t: amplified $na rows != $copies x $nb — stale $amp, rm -rf it")
    }
    java.nio.file.Files.writeString(marker, fingerprint)
    amp
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val amp = ensureAmp(spark, base, copies)

    val li = spark.read.parquet(s"$amp/lineitem.parquet")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def control(): Double = time(
      li.filter(col("l_quantity") <= 25.0).select(col("l_orderkey")).count())
    control()

    val heavy = Seq("sql_tpch_q3", "sql_tpch_q5", "sql_tpch_q18",
      "sql_tpch_q2", "sql_tpch_q17", "sql_tpch_q21",
      "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
      "dedup_resolve_clusters", "dedup_exact", "corpus_decontaminate",
      "corpus_pipeline_e2e", "corpus_lm_score", "corpus_gopher_quality",
      "sim_lsh_ann", "sim_ivf_ann", "agg_heavy_hitters",
      "ts_resample_ffill", "join_range_banded", "join_skew_salted",
      "agg_incremental_merge",
      "ts_downsample_ohlc", "ts_time_weighted_avg",
      "dedup_incremental_update", "graph_kcore_peel",
      "dedup_substring_spans", "corpus_ccnet_buckets",
      "corpus_dsir_weights", "corpus_hard_negatives",
      "join_asof_nearest", "sim_pq_adc", "corpus_unimax_alloc",
      "dedup_semdedup", "sim_ivfpq_ann", "corpus_quality_classifier",
      "corpus_bpe_pair_counts", "corpus_train_order",
      // r17 session-2 rewrites (fact-broadcast removals + fusions)
      "sql_tpch_q4", "sql_tpch_q22", "warehouse_scd2_upsert",
      "stream_window_distinct_approx", "join_interval",
      "stream_stream_join")
    // Optional focus list (comma-separated query names) for probing a
    // specific family without paying the full heavy sweep.
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val probeSet = only.map(o => heavy.filter(o)).getOrElse(heavy)
    for (r <- 1 to 2; n <- probeSet) {
      val c = control()
      val t = time {
        val df = graft.SparkEntry.queries(n)(spark, amp)
        df.write.mode(SaveMode.Overwrite).format("noop").save()
      }
      println(f"[scale] rep=$r ctrl=$c%.2f $n=$t%.2f")
    }
    spark.stop()
  }
}
