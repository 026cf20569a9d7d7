package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bisect harness for the extensions-conf slowdown: repeat one trivial
  * query in a single session and print per-iteration latency. */
object ExtBisect {
  def main(args: Array[String]): Unit = {
    val withExt = args.headOption.contains("ext")
    var b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    if (withExt)
      b = b.config("spark.sql.extensions", "graft.functions.GraftExtensions")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    def trivial(tag: String): Unit = for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      li.filter(col("l_quantity") <= 25.0).select(col("l_orderkey")).count()
      println(f"$tag$i ext=$withExt ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    trivial("warm")
    if (args.headOption.contains("asofprobe")) {
      val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
      try graft.plans.AsofJoin.native(spark, clicks, purch,
        "no_such_col", "p_user", "ts", "p_ts", Seq("value"))
      catch { case e: Exception => println("BADCOL: " + e.getMessage) }
      // string key: documented Long-only contract — observe the failure mode
      try graft.plans.AsofJoin.native(spark,
          ev.select(col("event_type"), col("ts")),
          purch.select(col("p_user").cast("string").as("p_user"), col("p_ts"), col("value")),
          "event_type", "p_user", "ts", "p_ts", Seq("value")).count()
      catch { case e: Throwable => println("STRKEY: " + e.getClass.getSimpleName) }
      spark.stop(); sys.exit(0)
    }
    if (withExt) {
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .createOrReplaceTempView("emb")
      // SQL surface: graft_dot resolvable from plain SQL
      spark.sql(
        "SELECT vec_id, graft_dot(embedding, embedding) AS selfdot FROM emb LIMIT 3")
        .show()
      // type-error path
      try spark.sql("SELECT graft_dot(vec_id, embedding) FROM emb").collect()
      catch { case e: Exception =>
        println("TYPE_ERROR: " + e.getMessage.linesIterator.next()) }
    }
    spark.stop()
  }
}
