package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B experiment: the SHIPPING compact-forward triangle plan (per-edge
  * intersection of sorted higher-rank adjacency arrays — what
  * `graph_triangles` registers) vs the retired wedge-expansion
  * formulation (generate C(outdeg,2) wedge rows, close each by a
  * packed-key probe). Both credit all three corners and must produce
  * identical rows; the question is wall time at sf0.1.
  *
  * ORDER-DEBIASED: within each rep the two forms run in ALTERNATING
  * order (odd rep: wedge first; even rep: compact first), because a
  * fixed ordering lets cache warm-up and JIT credit whatever runs
  * second — the r17 notes measured the fixed-order win at 2-4× the
  * reversed-position win. The summary reports each form's mean split
  * BY POSITION so the position effect is visible, not averaged away.
  *
  * Throwaway measurement harness — the winner ships in Graph.scala.
  *
  * Usage: runMain graft.tools.TriExperiment <sfDir> <reps>
  */
object TriExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def control(): Double = time(
      li.filter(col("l_quantity") <= 25.0).count())

    // the shipping compact-forward plan, through the registry
    def compact(): DataFrame =
      graft.SparkEntry.queries("graph_triangles")(spark, sfDir)

    // retired wedge-expansion form: C(outdeg,2) wedge rows closed by
    // one packed-key broadcast probe (the pre-r11 shipping plan)
    def wedge(): DataFrame = {
      val o = graft.queries.Graph.oriented(spark, sfDir)
      val wedges = o.as("x").join(broadcast(o).as("y"),
          col("x.src") === col("y.src") && col("x.rk") < col("y.rk"))
        .select(col("x.src").as("a"), col("x.dst").as("lo"),
          col("y.dst").as("hi"),
          (shiftleft(col("x.dst"), 31) + col("y.dst")).as("ekey"))
      wedges
        .join(broadcast(o.select(
          (shiftleft(col("src"), 31) + col("dst")).as("ekey"))),
          Seq("ekey"))
        .select(explode(array(col("a"), col("lo"), col("hi"))).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("tri_count"))
    }

    // equality check once
    val a = compact().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = wedge().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    println(s"identical=${a == b} (${a.size} vs ${b.size} rows)")

    def run(df: () => DataFrame): Double =
      time(df().write.mode("overwrite").format("noop").save())

    // (form, position) -> samples
    val samples = scala.collection.mutable.Map.empty[(String, Int), List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to reps) {
      val order: Seq[(String, () => DataFrame)] =
        if (r % 2 == 1) Seq("wedge" -> (wedge _), "compact" -> (compact _))
        else Seq("compact" -> (compact _), "wedge" -> (wedge _))
      val c1 = control()
      val t1 = run(order(0)._2)
      val c2 = control()
      val t2 = run(order(1)._2)
      val c3 = control()
      samples((order(0)._1, 1)) ::= t1
      samples((order(1)._1, 2)) ::= t2
      println(f"rep=$r ctrl=$c1%.2f ${order(0)._1}=$t1%.2f " +
        f"ctrl=$c2%.2f ${order(1)._1}=$t2%.2f ctrl=$c3%.2f")
    }
    def mean(xs: List[Double]): Double =
      if (xs.isEmpty) Double.NaN else xs.sum / xs.size
    for (form <- Seq("wedge", "compact"); pos <- Seq(1, 2))
      println(f"$form%8s pos=$pos n=${samples((form, pos)).size} " +
        f"mean=${mean(samples((form, pos)))}%.2f")
    println(f"overall wedge=${mean(samples(("wedge", 1)) ++ samples(("wedge", 2)))}%.2f " +
      f"compact=${mean(samples(("compact", 1)) ++ samples(("compact", 2)))}%.2f")
    spark.stop()
  }
}
