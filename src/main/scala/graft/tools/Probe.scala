package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc driver-contract probe.
  *
  *   runMain graft.tools.Probe                 → entry() smoke (rows>0)
  *   runMain graft.tools.Probe <query> <sfDir> → time + count one query
  *   runMain graft.tools.Probe explain <query> <sfDir> → formatted plan
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.functions.GraftExtensions
      .builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case Nil =>
        val df = graft.SparkEntry.entry(spark)
        println(s"ENTRY_ROWS=${df.count()}")
        df.show(5, truncate = false)
      case "explain" :: q :: dir :: Nil =>
        graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
      case "dump" :: q :: dir :: out :: Nil =>
        graft.SparkEntry.queries(q)(spark, dir)
          .coalesce(1).write.mode("overwrite").parquet(out)
      case "stream" :: dir :: Nil =>
        val q = graft.streaming.Stateful.intervalJoinStream(spark, dir)
          .writeStream.format("memory").queryName("probe_stream")
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        println("STREAM_ROWS=" + spark.table("probe_stream").count())
      case "formats" :: dir :: out :: Nil =>
        val src = graft.sources.Tables.customer(spark, dir)
        graft.sources.Formats.writeCsv(src, s"$out/csv")
        graft.sources.Formats.writeJson(src, s"$out/json")
        graft.sources.Formats.writeOrc(src, s"$out/orc")
        println("CSV_BACK=" + graft.sources.Formats
          .readCsv(spark, s"$out/csv", src.schema).count())
        println("JSON_BACK=" + graft.sources.Formats
          .readJson(spark, s"$out/json", src.schema).count())
        println("ORC_BACK=" + graft.sources.Formats
          .readOrc(spark, s"$out/orc").count())
        println("SRC=" + src.count())
        val orders = graft.sources.Tables.orders(spark, dir)
          .withColumn("o_year", org.apache.spark.sql.functions
            .year(org.apache.spark.sql.functions.col("o_orderdate")))
        graft.sources.Formats.writePartitioned(orders, s"$out/part", "o_year")
        println("PART_1996=" + spark.read.parquet(s"$out/part")
          .filter("o_year = 1996").count())
      case "oracles" :: out :: Nil =>
        def esc(s: String): String = "\"" + s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\r' => "\\r"
          case '\t' => "\\t"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
          graft.SparkEntry.oracleSql
            .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }
            .mkString("{", ",", "}"))
      case q :: dir :: Nil =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"QUERY=$q ROWS=$n SECONDS=$dt%.2f")
      case other =>
        sys.error(s"usage: Probe [explain] [query sfDir]; got $other")
    }
    spark.stop()
  }
}
