package graft.tools

import org.apache.spark.sql.functions._

/** A/B the two per-edge intersection forms of `graph_triangles` over
  * the SAME checkpointed adjacency, inside one JVM: the
  * `graft_sorted_isect_vals` two-pointer kernel vs
  * `array_intersect` (hash-set build per row). Only the
  * intersect→explode→aggregate tail differs; edge artifact and
  * adjacency build are shared and materialized before timing.
  * ORDER-DEBIASED like TriExperiment: odd reps run array_intersect
  * first, even reps run the kernel first. Row-identical totals are
  * asserted every rep.
  *
  * Usage: runMain graft.tools.IsectExperiment <sfDir> <reps>
  */
object IsectExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def control(): Double = time(
      li.filter(col("l_quantity") <= 25.0).count())
    control()

    val o = graft.queries.Graph.oriented(spark, sfDir)
    val adj = o.groupBy(col("src"))
      .agg(sort_array(collect_list(col("rk"))).as("nbrs"))
      .localCheckpoint()
    val joined = o.as("e")
      .join(broadcast(adj).as("x"), col("e.src") === col("x.src"))
      .join(broadcast(adj).as("y"), col("e.dst") === col("y.src"), "left")

    def tail(common: org.apache.spark.sql.Column): Long = {
      val out = joined
        .select(col("e.src").as("u"), col("e.dst").as("w"),
          common.as("common"))
        .select(explode(col("common")).as("crk"), col("u"), col("w"))
        .select(explode(array(col("u"), col("w"),
          col("crk").bitwiseAND(lit((1L << 31) - 1)))).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("tri_count"))
      out.agg(sum(col("tri_count"))).head().getLong(0)
    }
    def kernel(): Long = tail(call_function("graft_sorted_isect_vals",
      col("x.nbrs"), col("y.nbrs")))
    def hashed(): Long = tail(
      array_intersect(col("x.nbrs"), coalesce(col("y.nbrs"), array())))

    for (r <- 1 to reps) {
      var kT = 0.0; var hT = 0.0
      var kSum = 0L; var hSum = 0L
      val c0 = control()
      if (r % 2 == 1) {
        hT = time { hSum = hashed() }
        val cm = control()
        kT = time { kSum = kernel() }
        println(f"rep=$r order=h,k ctrl=$c0%.2f/$cm%.2f " +
          f"array_intersect=$hT%.2f kernel=$kT%.2f")
      } else {
        kT = time { kSum = kernel() }
        val cm = control()
        hT = time { hSum = hashed() }
        println(f"rep=$r order=k,h ctrl=$c0%.2f/$cm%.2f " +
          f"array_intersect=$hT%.2f kernel=$kT%.2f")
      }
      require(kSum == hSum, s"corner-credit totals differ: $kSum != $hSum")
    }
    spark.stop()
  }
}
