package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for storage-partitioned joins (perf only; the
  * correctness gate is GraftLogSpec + sink_log_spj_join): the same
  * fact(4M) ⋈ dim(400k) join-and-aggregate runs against k-partitioned
  * graft-log tables (KeyGroupedPartitioning → zero exchange) and
  * against identical unpartitioned ones (plain shuffle join), with the
  * Exchange count read from each executed plan. The point is the PLAN
  * delta — at 100 TB the two exchanges the unpartitioned join pays ARE
  * the job cost, and the partitioned layout deletes both for every
  * downstream join that keys on the partition column.
  *
  * Usage: runMain graft.tools.SpjProbe
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val base = new java.io.File(
      graft.core.ArtifactCache.userScopedRoot("spj_probe"),
      System.nanoTime().toString).getPath

    def write(df: DataFrame, dir: String, part: Boolean): Unit = {
      val w = df.write.format("graft.sources.GraftLogSource")
        .option("path", dir).mode("overwrite")
      (if (part) w.option("partitionCol", "k") else w).save()
    }
    def read(dir: String): DataFrame =
      spark.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()

    val fact = spark.range(0, 4000000L)
      .selectExpr("id", "id % 32 AS k")
    val dim = spark.range(0, 400000L)
      .selectExpr("id * 2 AS w", "id % 32 AS k")
    write(fact, s"$base/fact_p", part = true)
    write(dim, s"$base/dim_p", part = true)
    write(fact, s"$base/fact_u", part = false)
    write(dim, s"$base/dim_u", part = false)

    def run(tag: String, fa: String, di: String): Unit = {
      val j = read(fa).join(read(di).hint("merge"), "k")
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      // warm once, then time
      j.write.mode("overwrite").format("noop").save()
      val t0 = System.nanoTime()
      j.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val plan = j.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(f"[spj] $tag wall=$wall%.2f exchanges=$exchanges")
    }
    run("partitioned  ", s"$base/fact_p", s"$base/dim_p")
    run("unpartitioned", s"$base/fact_u", s"$base/dim_u")
    spark.stop()
  }
}
