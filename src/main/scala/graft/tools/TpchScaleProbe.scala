package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** The full TPC-H board (q1 pricing summary + q2–q22) at N× sf0.1
  * (default 10× ≈ sf1 fact volume) over [[ScaleProbe.ensureAmp]]'s
  * key-shifted amplified corpus — the r13 heavy sweep covered only
  * q2/q3/q5/q17/q18/q21, and a join hint that is right at sf0.1 can
  * become wrong at 10× exactly the way q3/q5's UNHINTED plans would
  * broadcast a fact table. For every query it prints per-rep wall with
  * interleaved controls (a fixed BASE-corpus scan, so control cost is
  * constant across scales) and the executed plan's join mix
  * (broadcast-hash / sort-merge / shuffled-hash / nested-loop counts)
  * at base vs N× — any fact-sized frame still on a broadcast build
  * side at 10× is the bug this probe exists to catch.
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures. Usage: runMain graft.tools.TpchScaleProbe [baseSfDir]
  * [copies]
  */
object TpchScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") +
        "]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val amp = ScaleProbe.ensureAmp(spark, base, copies)

    val ctrlScan = spark.read.parquet(s"$base/lineitem.parquet")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def control(): Double = time(
      ctrlScan.filter(col("l_quantity") <= 25.0)
        .select(col("l_orderkey")).count())
    control()

    val board = "q1_agg_pricing_summary" +:
      ((2 to 22).map(i => s"sql_tpch_q$i"))
    def joins(p: String): String = {
      def n(w: String) = p.sliding(w.length).count(_ == w)
      s"bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} " +
        s"shj=${n("ShuffledHashJoin")} bnl=${n("BroadcastNestedLoopJoin")}"
    }
    for (dir <- Seq(base, amp); r <- 1 to 2; q <- board) {
      val c = control()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val t = time(df.write.mode(SaveMode.Overwrite).format("noop").save())
      val tag = if (dir == base) "base" else s"${copies}x"
      println(f"[tpch] $tag rep=$r ctrl=$c%.2f $q=$t%.2f " +
        joins(df.queryExecution.executedPlan.toString))
    }
    spark.stop()
  }
}
