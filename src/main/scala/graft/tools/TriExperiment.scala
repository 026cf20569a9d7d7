package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B experiment: current wedge-expansion triangle plan vs the
  * compact-forward formulation (per-edge intersection of sorted
  * higher-rank adjacency arrays). Both credit all three corners and
  * must produce identical rows; the question is wall time at sf0.1.
  * Throwaway measurement harness — the winner ships in Graph.scala.
  *
  * Usage: runMain graft.tools.TriExperiment <sfDir> <reps>
  */
object TriExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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

    // the shipping plan, through the registry
    def current(): DataFrame =
      graft.SparkEntry.queries("graph_triangles")(spark, sfDir)

    // compact-forward: adjacency arrays of HIGHER-rank neighbors
    // (bounded O(sqrt m) by the degree orientation), one
    // array_intersect per oriented edge
    def compactForward(): DataFrame = {
      val o = graft.queries.Graph.oriented(spark, sfDir)
      val adj = o.groupBy(col("src"))
        .agg(sort_array(collect_list(col("rk"))).as("nbrs"))
      val closed = o.as("e")
        .join(broadcast(adj).as("x"), col("e.src") === col("x.src"))
        .join(broadcast(adj).as("y"),
          col("e.dst") === col("y.src"), "left")
        .select(col("e.src").as("u"), col("e.dst").as("w"),
          array_intersect(col("x.nbrs"),
            coalesce(col("y.nbrs"), array())).as("common"))
      closed
        .select(explode(col("common")).as("crk"),
          col("u"), col("w"))
        .select(explode(array(col("u"), col("w"),
          col("crk").bitwiseAND(lit((1L << 31) - 1)))).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("tri_count"))
    }

    // variant 2: per-edge credits — the endpoints each get
    // size(common) in ONE row instead of exploding per triangle, so
    // the final shuffle carries 2·E(closing) + T rows, not 3·T
    def compactForward2(): DataFrame = {
      val o = graft.queries.Graph.oriented(spark, sfDir)
      val adj = o.groupBy(col("src"))
        .agg(sort_array(collect_list(col("rk"))).as("nbrs"))
      val closed = o.as("e")
        .join(broadcast(adj).as("x"), col("e.src") === col("x.src"))
        .join(broadcast(adj).as("y"),
          col("e.dst") === col("y.src"), "left")
        .select(col("e.src").as("u"), col("e.dst").as("w"),
          array_intersect(col("x.nbrs"),
            coalesce(col("y.nbrs"), array())).as("common"))
        .filter(size(col("common")) > 0)
      val ends = closed.select(explode(array(
          struct(col("u").as("part"),
            size(col("common")).cast("long").as("cr")),
          struct(col("w").as("part"),
            size(col("common")).cast("long").as("cr")))).as("s"))
        .select(col("s.part"), col("s.cr"))
      val mids = closed
        .select(explode(col("common")).as("crk"))
        .select(col("crk").bitwiseAND(lit((1L << 31) - 1)).as("part"),
          lit(1L).as("cr"))
      ends.union(mids)
        .groupBy(col("part")).agg(sum(col("cr")).as("tri_count"))
    }

    val b2 = compactForward2().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    // equality check once
    val a = current().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = compactForward().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    println(s"identical=${a == b} (${a.size} vs ${b.size} rows)")
    println(s"identical2=${a == b2}")

    for (r <- 1 to reps) {
      val c1 = control()
      val tCur = time(current().write.mode("overwrite")
        .format("noop").save())
      val c2 = control()
      val tCf = time(compactForward().write.mode("overwrite")
        .format("noop").save())
      val c3 = control()
      val tCf2 = time(compactForward2().write.mode("overwrite")
        .format("noop").save())
      println(f"rep=$r ctrl=$c1%.2f current=$tCur%.2f " +
        f"ctrl=$c2%.2f compact=$tCf%.2f ctrl=$c3%.2f compact2=$tCf2%.2f")
    }
    spark.stop()
  }
}
