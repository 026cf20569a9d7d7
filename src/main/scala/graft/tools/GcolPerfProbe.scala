package graft.tools

import org.apache.spark.sql.functions._

/** Scan-throughput of the gcol payload against the reference columnar
  * format (Spark's own parquet reader) over identical data: 2M rows ×
  * (long, double, 7-distinct string, mostly-null long). Reports
  * best-of-3 wall seconds for (a) a 1-column projected sum — chunk
  * pruning + plain decode, (b) a categorical group-by — the dict
  * decode path, (c) a narrow range filter — block-stats skipping vs
  * parquet row-group pruning. The point is the ORDER OF MAGNITUDE:
  * the text-cell payload won't beat parquet's binary encoding, but it
  * must be in the same game, not 10× off.
  *
  * Usage: runMain graft.tools.GcolPerfProbe
  */
object GcolPerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.functions.GraftExtensions
      .builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files
      .createTempDirectory("gcolperf").toString
    val df = spark.range(0, 2000000).toDF("id")
      .withColumn("v", col("id").cast("double") / 3)
      .withColumn("tag", concat(lit("t"), col("id") % 7))
      .withColumn("nl",
        when(col("id") % 5 === 0, col("id")).otherwise(lit(null)))
      // low-NDV NUMERIC columns — the typed-dictionary path (enc 4/5)
      .withColumn("bucket", col("id") % 97)
      .withColumn("price", (col("id") % 9).cast("double") * 0.5)
    df.repartition(8).write.format("graft.sources.GraftLogSource")
      .option("path", s"$base/g").mode("overwrite").save()
    df.repartition(8).write.parquet(s"$base/p")
    val g = () => spark.read.format("graft.sources.GraftLogSource")
      .option("path", s"$base/g").load()
    val p = () => spark.read.parquet(s"$base/p")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best3(body: => Unit): Double =
      (1 to 3).map(_ => time(body)).min
    def run(name: String,
        q: (() => org.apache.spark.sql.DataFrame) => Unit): String = {
      val tg = best3(q(g)); val tp = best3(q(p))
      f""""$name":{"gcol":$tg%.3f,"parquet":$tp%.3f}"""
    }

    val rows = Seq(
      run("proj_sum", r => r().agg(sum(col("v"))).collect()),
      run("dict_groupby", r => r().groupBy(col("tag"))
        .agg(count(lit(1)), sum(col("v"))).collect()),
      run("range_filter", r => r()
        .filter(col("id") >= 1000000L && col("id") < 1010000L)
        .agg(count(lit(1)), sum(col("nl"))).collect()),
      run("numdict_agg", r => r().groupBy(col("bucket"))
        .agg(sum(col("price")), avg(col("price"))).collect()),
      run("full_count", r => assert(r().count() == 2000000L)))
    println("{" + rows.mkString(",") + "}")
    spark.stop()
  }
}
