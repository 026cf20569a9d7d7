package graft.tools

import org.apache.spark.sql.functions._

/** The 100× extrapolation rung (VERDICT r15 #7) for the TWO members
  * whose beyond-30× behavior was a formula, not a measurement:
  *
  *  - `dedup_semdedup` — intentionally superlinear (Σ(n_c choose 2) ≈
  *    n^1.5/2 with k = ⌊√n⌋ cells). The 1×/10×/30× ladder confirmed
  *    the envelope to ≤2%; this rung checks the same arithmetic AND
  *    wall at 100× (n = 200k at sf0.1 base: predicted ≈ 4.47e7 pairs).
  *  - `graph_triangles` — n·log n past the broadcast-gate flip (SMJ
  *    adjacency build dominates). This rung records wall + the gate
  *    decision at 100× nodes/edges.
  *
  * Uses the SAME key-correct amplifications as the 10×/30× ladders
  * ([[DedupScaleProbe.ensureAmp]], [[GraphScaleProbe.ensureAmp]]), so
  * the rung extends those tables rather than starting new ones. Wall
  * numbers come with interleaved control scans; candidate-pair counts
  * are arithmetic off the built index. Perf evidence only.
  *
  * Usage: runMain graft.tools.Ladder100Probe [baseSfDir] [copies]
  */
object Ladder100Probe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") +
        "]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // --- semdedup at 100x -------------------------------------------
    val ampD = DedupScaleProbe.ensureAmp(spark, base, copies)
    val ctrlD = spark.read.parquet(s"$ampD/embeddings.parquet")
    def controlD(): Double = time(
      ctrlD.filter(col("vec_id") % 3 === 0).select(col("vec_id")).count())
    controlD()
    val cells = graft.operators.Similarity.ivfIndex(spark, ampD)
      .groupBy(col("cent_id")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs"),
        max(col("n")).as("maxc")).head()
    val (kC, nC, pC, mC) = (cells.getAs[Number](0).longValue,
      cells.getAs[Number](1).longValue, cells.getAs[Number](2).longValue,
      cells.getAs[Number](3).longValue)
    val predicted = (math.pow(nC.toDouble, 1.5) / 2).toLong
    println(s"[l100] ${copies}x semdedup_cells: n=$nC k=$kC pairs=$pC " +
      s"max_cell=$mC predicted_n15=$predicted " +
      f"ratio=${pC.toDouble / predicted}%.3f")
    for (r <- 1 to 2) {
      val c = controlD()
      val t = time(graft.SparkEntry.queries("dedup_semdedup")(spark, ampD)
        .write.mode("overwrite").format("noop").save())
      println(f"[l100] ${copies}x rep=$r ctrl=$c%.2f dedup_semdedup=$t%.2f")
    }
    spark.conf.set("spark.graft.semdedup.cellPairCap", "64")
    for (r <- 1 to 2) {
      val c = controlD()
      val t = time(graft.SparkEntry.queries("dedup_semdedup")(spark, ampD)
        .write.mode("overwrite").format("noop").save())
      println(f"[l100] ${copies}x rep=$r ctrl=$c%.2f " +
        f"dedup_semdedup[cap=64]=$t%.2f")
    }
    spark.conf.unset("spark.graft.semdedup.cellPairCap")

    // --- triangles at 100x ------------------------------------------
    val ampG = GraphScaleProbe.ensureAmp(spark, base, copies)
    val ctrlG = spark.read.parquet(s"$ampG/lineitem.parquet")
    def controlG(): Double = time(
      ctrlG.filter(col("l_quantity") <= 25.0)
        .select(col("l_orderkey")).count())
    controlG()
    val triangles = graft.SparkEntry.queries("graph_triangles")
    for (r <- 1 to 2) {
      val c = controlG()
      val df = triangles(spark, ampG)
      val t = time(df.write.mode("overwrite").format("noop").save())
      val plan = df.queryExecution.executedPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      println(f"[l100] ${copies}x rep=$r ctrl=$c%.2f graph_triangles=$t%.2f " +
        s"bhj=$bhj smj=$smj")
    }
    spark.stop()
  }
}
