package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embeddings-family scale evidence (VERDICT r14 #1/#2): drives the
  * SemDeDup / embedding-cosine / brute-force-topk trio and the four ANN
  * indexes up the key-correct 1×/N× orthogonal-copy ladder
  * ([[DedupScaleProbe.ensureAmp]]), and measures what wall-clock alone
  * cannot show:
  *
  *  - **candidate-pair populations** per blocking structure: SemDeDup's
  *    IVF cells (k = ⌊√n⌋ ⇒ Σ(n_c choose 2) ≈ n^1.5/2 — superlinear BY
  *    DESIGN; this probe records the measured pair count so the n^1.5
  *    envelope is arithmetic, not argument) and the SRP buckets behind
  *    embedding-cosine dedup (256 fixed buckets ⇒ n²/512 — the knob
  *    that must grow with the corpus);
  *  - **recall@k and candidates-scanned** for lsh / multiprobe / ivf /
  *    ivfpq at each ladder step: fixed 8-bit signatures mean N× bucket
  *    occupancy at N×, so wall time can stay flat while search quality
  *    or rerank cost drifts — recall is evaluated against the exact
  *    brute-force top-k on the SAME amplified corpus (cheap at probe
  *    SFs; at 100 TB you sample the query set, not the corpus), plus
  *    the best-candidate approximation ratio, the meaningful quality
  *    floor on near-uniform synthetic vectors where set-recall of ANY
  *    sublinear index is small by construction (see the sim_ann_recall
  *    scaladoc in operators.Similarity).
  *
  * Also times dedup_semdedup under `spark.graft.semdedup.cellPairCap`
  * (the linear-envelope escape hatch) against the exact unbounded form.
  * Perf evidence only — correctness stays gated on the driver fixtures.
  *
  * Usage: runMain graft.tools.AnnScaleProbe [baseSfDir] [copies]
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") +
        "]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val amp = DedupScaleProbe.ensureAmp(spark, base, copies)

    val ctrlScan = spark.read.parquet(s"$base/embeddings.parquet")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def control(): Double = time(
      ctrlScan.filter(col("vec_id") % 3 === 0).select(col("vec_id")).count())
    control()

    for (dir <- Seq(base, amp)) {
      val tag = if (dir == base) "base" else s"${copies}x"

      // --- blocking-structure pair populations -------------------------
      def pairStats(blocked: DataFrame, key: String): (Long, Long, Long, Long) = {
        val cells = blocked.groupBy(col(key)).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
            sum(col("n") * (col("n") - 1) / 2).as("pairs"),
            max(col("n")).as("maxc")).head()
        def l(i: Int) = cells.getAs[Number](i).longValue()
        (l(1), l(0), l(2), l(3))
      }
      val (nI, kI, pI, mI) = pairStats(
        graft.operators.Similarity.ivfIndex(spark, dir), "cent_id")
      println(s"[ann] $tag semdedup_cells: n=$nI k=$kI pairs=$pI " +
        s"max_cell=$mI expected_n15=${(math.pow(nI.toDouble, 1.5) / 2).toLong}")
      val (nS, kS, pS, mS) = pairStats(
        graft.operators.Similarity.srpIndex(spark, dir), "sig")
      println(s"[ann] $tag srp_buckets: n=$nS k=$kS pairs=$pS " +
        s"max_bucket=$mS expected_n2_512=${(nS.toDouble * nS / 512).toLong}")

      // --- wall times: the three ladder queries + the capped variant ---
      for (r <- 1 to 2; q <- Seq("dedup_semdedup", "dedup_embedding_cosine",
          "sim_cosine_topk")) {
        val c = control()
        val t = time(graft.SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save())
        println(f"[ann] $tag rep=$r ctrl=$c%.2f $q=$t%.2f")
      }
      // the SRP blocking-width knob: 12-bit blocks (4096 buckets) cut
      // the quadratic pair population 16× at the same corpus
      spark.conf.set("spark.graft.dedup.srpBlockBits", "12")
      val srp12 = graft.operators.Similarity.srpIndex(spark, dir)
        .select(col("vec_id"), col("embedding"))
        .withColumn("blk", graft.operators.Similarity
          .srpSignature(col("embedding"), 12))
      val (n12, k12, p12, m12) = pairStats(srp12, "blk")
      println(s"[ann] $tag srp12_buckets: n=$n12 k=$k12 pairs=$p12 " +
        s"max_bucket=$m12")
      for (r <- 1 to 2) {
        val c = control()
        val t = time(
          graft.SparkEntry.queries("dedup_embedding_cosine")(spark, dir)
            .write.mode("overwrite").format("noop").save())
        println(f"[ann] $tag rep=$r ctrl=$c%.2f " +
          f"dedup_embedding_cosine[bits=12]=$t%.2f")
      }
      spark.conf.unset("spark.graft.dedup.srpBlockBits")

      spark.conf.set("spark.graft.semdedup.cellPairCap", "64")
      for (r <- 1 to 2) {
        val c = control()
        val t = time(graft.SparkEntry.queries("dedup_semdedup")(spark, dir)
          .write.mode("overwrite").format("noop").save())
        println(f"[ann] $tag rep=$r ctrl=$c%.2f dedup_semdedup[cap=64]=$t%.2f")
      }
      spark.conf.unset("spark.graft.semdedup.cellPairCap")

      // Capped-form QUALITY (VERDICT r15 #5): what fraction of the
      // would-be-dropped duplicates does a C-capped run still drop?
      // dup_recall = |dropped_capped| / |dropped_exact| — valid as a
      // recall because the capped pair set is a provable SUBSET of the
      // exact one (spec-pinned), so every capped drop is an exact drop
      // (the subset flag double-checks that here anyway).
      val simBase = graft.operators.Similarity.ivfIndex(spark, dir)
        .select(col("vec_id"), col("embedding"), col("cent_id"))
      def droppedSet(cap: Option[Int]): Set[Long] =
        graft.operators.Similarity.semdedupPairs(simBase, cap)
          .filter(col("cos_sim") >= 0.3)
          .select(col("dup_id")).distinct()
          .collect().map(_.getAs[Number](0).longValue).toSet
      val exactDrop = droppedSet(None)
      for (c <- Seq(16, 64, 256)) {
        val capDrop = droppedSet(Some(c))
        val rec = if (exactDrop.isEmpty) 1.0
          else capDrop.intersect(exactDrop).size.toDouble / exactDrop.size
        println(f"[ann] $tag semdedup_cap_recall: C=$c " +
          s"dropped=${capDrop.size} exact=${exactDrop.size} " +
          f"recall=$rec%.4f subset=${capDrop.subsetOf(exactDrop)}")
      }

      // --- recall + candidates-scanned per ANN method ------------------
      val emb = graft.core.Par.fanout(graft.sources.Tables.embeddings(spark, dir))
      val qIds = emb.filter(col("vec_id") < 8)
      val exact = graft.operators.Similarity.bruteForceTopK(emb, qIds, 10)
      val exactTop3 = exact.filter(col("rank") <= 3)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exactBest = exact.filter(col("rank") === 1)
        .select(col("query_id"), col("sim")).collect()
        .map(r => r.getAs[Number](0).longValue -> r.getDouble(1)).toMap

      // bucket/cell occupancy for candidates-scanned
      val srp = graft.operators.Similarity.srpIndex(spark, dir)
      val sigHist = srp.groupBy(col("sig")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getAs[Number](0).intValue ->
          r.getAs[Number](1).longValue).toMap
      val qSigs = srp.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("sig")).collect()
        .map(r => r.getAs[Number](0).longValue ->
          r.getAs[Number](1).intValue).toMap
      val ivf = graft.operators.Similarity.ivfIndex(spark, dir)
      val cellHist = ivf.groupBy(col("cent_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getAs[Number](0).longValue ->
          r.getAs[Number](1).longValue).toMap
      val qCells = ivf.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("cent_id")).collect()
        .map(r => r.getAs[Number](0).longValue ->
          r.getAs[Number](1).longValue).toMap

      def scanned(q: Long, method: String): Long = method match {
        case "sim_lsh_ann" => sigHist.getOrElse(qSigs(q), 0L) - 1
        case "sim_lsh_ann_multiprobe" =>
          val s0 = qSigs(q)
          (s0 +: (0 until 8).map(b => s0 ^ (1 << b)))
            .map(sigHist.getOrElse(_, 0L)).sum - 1
        case _ => cellHist.getOrElse(qCells(q), 0L) - 1 // ivf-routed
      }

      for (m <- Seq("sim_lsh_ann", "sim_lsh_ann_multiprobe", "sim_ivf_ann",
          "sim_ivfpq_ann", "sim_ivfpq_rerank")) {
        val res = graft.SparkEntry.queries(m)(spark, dir)
          .select(col("query_id"), col("vec_id"), col("rank"))
        // exact cosine of every returned candidate (ivfpq ranks by ADC
        // distance; quality is judged in the exact metric for all four)
        val sims = res.join(emb, "vec_id")
          .join(broadcast(qIds.select(col("vec_id").as("query_id"),
            col("embedding").as("q_emb"))), "query_id")
          .select(col("query_id"), col("vec_id"),
            graft.operators.Similarity.dot(col("q_emb"), col("embedding"))
              .as("sim"))
          .collect().map(r => (r.getAs[Number](0).longValue,
            r.getAs[Number](1).longValue, r.getDouble(2)))
        val byQ = sims.groupBy(_._1)
        val queries = exactTop3.keySet.toSeq.sorted
        val recalls = queries.map { q =>
          val got = byQ.getOrElse(q, Array.empty[(Long, Long, Double)]).map(_._2).toSet
          exactTop3(q).intersect(got).size.toDouble / 3.0
        }
        val ratios = queries.map { q =>
          val best = byQ.getOrElse(q, Array.empty[(Long, Long, Double)])
            .map(_._3).maxOption.getOrElse(Double.NegativeInfinity)
          best / exactBest(q)
        }
        val scans = queries.map(scanned(_, m))
        println(f"[ann] $tag $m: recall@3=${recalls.sum / recalls.size}%.3f " +
          f"ratio_best=${ratios.sum / ratios.size}%.3f " +
          s"cand_scanned_avg=${scans.sum / scans.size} " +
          s"cand_scanned_max=${scans.max} corpus_n=$nS")
      }

      // the IVF recall lever: same evaluation under nprobe=4 (own cell
      // + 3 nearest others — candidates ~4·√n, the linear trade §2's
      // policy names); scanned is the probe arithmetic, 4× the mean
      // cell, since the probe set lives inside the query plan
      spark.conf.set("spark.graft.ivf.nprobe", "4")
      for (m <- Seq("sim_ivf_ann", "sim_ivfpq_ann", "sim_ivfpq_rerank")) {
        val res = graft.SparkEntry.queries(m)(spark, dir)
          .select(col("query_id"), col("vec_id"), col("rank"))
        val sims = res.join(emb, "vec_id")
          .join(broadcast(qIds.select(col("vec_id").as("query_id"),
            col("embedding").as("q_emb"))), "query_id")
          .select(col("query_id"), col("vec_id"),
            graft.operators.Similarity.dot(col("q_emb"), col("embedding"))
              .as("sim"))
          .collect().map(r => (r.getAs[Number](0).longValue,
            r.getAs[Number](1).longValue, r.getDouble(2)))
        val byQ = sims.groupBy(_._1)
        val queries = exactTop3.keySet.toSeq.sorted
        val recalls = queries.map { q =>
          val got = byQ.getOrElse(q, Array.empty[(Long, Long, Double)])
            .map(_._2).toSet
          exactTop3(q).intersect(got).size.toDouble / 3.0
        }
        val ratios = queries.map { q =>
          byQ.getOrElse(q, Array.empty[(Long, Long, Double)])
            .map(_._3).maxOption.getOrElse(Double.NegativeInfinity) /
            exactBest(q)
        }
        println(f"[ann] $tag $m[nprobe=4]: " +
          f"recall@3=${recalls.sum / recalls.size}%.3f " +
          f"ratio_best=${ratios.sum / ratios.size}%.3f " +
          s"cand_scanned_est=${4 * nI / kI}")
      }
      spark.conf.unset("spark.graft.ivf.nprobe")
    }
    spark.stop()
  }
}
