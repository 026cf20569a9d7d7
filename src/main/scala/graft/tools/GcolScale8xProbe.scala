package graft.tools

import org.apache.spark.sql.functions._

/** 8× delta-cost probe for the gcol scan surfaces: does the cost of
  * (a) a split fan-out scan of ONE part file and (b) a block-stats-
  * skipped narrow range filter grow at most linearly when the file
  * is 8× bigger? (a) must scale ≤8× — it reads everything, but the
  * byte ranges fan out over tasks, so an 8× file must not serialize;
  * (b) must scale FAR below 8× — the footer prunes blocks before any
  * chunk I/O, so a fixed-width predicate touches a near-constant
  * block count whatever the file size.
  *
  * Perf evidence only — correctness stays gated on the driver
  * fixtures (sink_log_split_parallel / sink_log_block_skip / GcolSpec).
  * Usage: runMain graft.tools.GcolScale8xProbe [baseRows]
  */
object GcolScale8xProbe {
  def main(args: Array[String]): Unit = {
    val n0 = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Fmt = "graft.sources.GraftLogSource"
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best3(body: => Unit): Double = (1 to 3).map(_ => time(body)).min

    println("rows | files | split_tasks | full_scan_s | " +
      "block_skip_s | skip_rows")
    val out = Seq(1L, 8L).map { mult =>
      val n = n0 * mult
      val dir = java.nio.file.Files
        .createTempDirectory(s"gcol8x-$n").toString + "/t"
      // ONE part file, many 64 KB blocks — the shape where splitting
      // and block skipping are attributable to the format
      spark.conf.set("spark.graft.log.blockBytes", (64L << 10).toString)
      spark.range(0, n).toDF("id")
        .withColumn("v", col("id").cast("double") / 3)
        .withColumn("tag", concat(lit("t"), col("id") % 7))
        .coalesce(1)
        .write.format(Fmt).option("path", dir).mode("overwrite").save()
      spark.conf.unset("spark.graft.log.blockBytes")
      spark.conf.set("spark.graft.log.splitBytes", (1L << 20).toString)
      val df = () => spark.read.format(Fmt).option("path", dir).load()
      val tasks = df().rdd.getNumPartitions
      val fullS = best3(assert(df().agg(sum(col("v"))).head.getDouble(0) > 0))
      // fixed-width predicate whatever n is: block skipping should
      // keep this near-constant across the 8× step
      val lo = n / 2
      val skipS = best3(assert(df()
        .filter(col("id") >= lo && col("id") < lo + 10000L)
        .count() == 10000L))
      spark.conf.unset("spark.graft.log.splitBytes")
      println(f"$n | 1 | $tasks | $fullS%.3f | $skipS%.3f | 10000")
      (n, tasks, fullS, skipS)
    }
    val r = out(1)
    val b = out(0)
    println(f"ratios: full_scan ${r._3 / b._3}%.2f× (bound 8×), " +
      f"block_skip ${r._4 / b._4}%.2f× (expect ≪8×), " +
      f"tasks ${b._2} → ${r._2}")
    spark.stop()
  }
}
