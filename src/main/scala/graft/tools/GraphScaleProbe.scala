package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Graph-family scale spot-check at N× (default 10×): amplifies
  * LINEITEM ALONE with BOTH keys shifted per copy (l_orderkey AND
  * l_partkey — the shared ScaleProbe shifts only orderkey to keep the
  * part-dimension joins valid, which for the graph family would
  * multiply co-purchase SUPPORT on a fixed node set instead of growing
  * the graph; shifting partkey gives N× nodes and N× edges, the shape
  * a 100 TB catalog actually has). The graph queries read only
  * lineitem, so the amplified dir carries just that table.
  *
  * For each query, prints per-rep wall time with interleaved control
  * scans AND the broadcast-gate decision (whether the optimized plan
  * carries a forced `strategy=broadcast` hint, and which join
  * operators the executed plan ran) at base vs amplified scale — the
  * stats-driven gates (`queries.Graph.bcast`) should KEEP broadcasting
  * node-sized frames that stay under budget (pagerank ranks, kcore
  * survivors) and FLIP to sort-merge once the adjacency estimate
  * crosses it (triangles / jaccard at 10× sf0.1: ~2M nodes × 56 B +
  * ~12M entries × 8 B ≈ 210 MB > the 64 MB default).
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures. Usage: runMain graft.tools.GraphScaleProbe [baseSfDir]
  * [copies]
  */
object GraphScaleProbe {
  /** Build (or reuse) the ${copies}x both-keys-shifted lineitem amp —
    * factored out of main so other rungs (the 100x extrapolation
    * probe) reuse the identical key-correct amplification. */
  def ensureAmp(spark: org.apache.spark.sql.SparkSession, base: String,
      copies: Int): String = {
    // per-user 0700 root, not fixed /tmp: this cache TRUSTS its
    // freshness marker across runs (same ADVICE-r14 poisoning vector
    // the shared ScaleProbe amp had)
    val amp = new java.io.File(
      graft.core.ArtifactCache.userScopedRoot("amp_graph"),
      s"${copies}x_" + new java.io.File(base).getName).getPath
    val srcFile = new java.io.File(s"$base/lineitem.parquet")
    val fingerprint = s"v1;base=${srcFile.getAbsolutePath};" +
      s"copies=$copies;${srcFile.length}:${srcFile.lastModified}"
    val marker = java.nio.file.Paths.get(amp, "AMP_MARKER")
    val fresh = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker) == fingerprint
    if (!fresh) {
      println(s"[gscale] building $amp (${copies}x, both keys shifted)")
      val src = spark.read.parquet(srcFile.getPath)
      val shift = 1000000000L
      (0 until copies).map { k =>
        src.withColumn("l_orderkey", col("l_orderkey") + lit(k * shift))
          .withColumn("l_partkey", col("l_partkey") + lit(k * shift))
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$amp/lineitem.parquet")
      val (nb, na) = (src.count(),
        spark.read.parquet(s"$amp/lineitem.parquet").count())
      require(na == nb * copies,
        s"amplified $na rows != $copies x $nb — rm -rf $amp")
      java.nio.file.Files.writeString(marker, fingerprint)
    }
    amp
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") +
        "]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val amp = ensureAmp(spark, base, copies)

    val li = spark.read.parquet(s"$amp/lineitem.parquet")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def control(): Double = time(
      li.filter(col("l_quantity") <= 25.0).select(col("l_orderkey"))
        .count())
    control()

    val graphQs = Seq("graph_triangles", "graph_pagerank",
      "graph_neighbor_jaccard", "graph_kcore_peel")
    // Optional focus list (comma-separated substrings) — same contract
    // as the other probes' SPARK_GRAFT_PROBE_ONLY: re-bracket one query
    // after a steal-poisoned run without paying the whole family.
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val probeQs = only.map(o => graphQs.filter(q => o.exists(q.contains)))
      .getOrElse(graphQs)
    for (dir <- Seq(base, amp); r <- 1 to 2; n <- probeQs) {
      val c = control()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val t = time(df.write.mode("overwrite").format("noop").save())
      val hinted = df.queryExecution.optimizedPlan.toString
        .contains("strategy=broadcast")
      val p = df.queryExecution.executedPlan.toString
      val bhj = p.sliding("BroadcastHashJoin".length)
        .count(_ == "BroadcastHashJoin")
      val smj = p.sliding("SortMergeJoin".length)
        .count(_ == "SortMergeJoin")
      val tag = if (dir == base) "base" else s"${copies}x"
      println(f"[gscale] $tag rep=$r ctrl=$c%.2f $n=$t%.2f " +
        s"hint=$hinted bhj=$bhj smj=$smj")
    }
    spark.stop()
  }
}
