package graft.tools

/** Metadata-plane cost of the per-file column stats: writes a wide
  * real table (lineitem, 16 columns) to the graft-log and reports
  * manifest bytes per entry against part-file bytes — the number that
  * decides whether per-file NDV sketches are affordable at 100 TB
  * (Iceberg keeps NDV per SNAPSHOT in puffin files precisely because
  * per-file stats multiply; the graft-log keeps them per file to let
  * columnStats() shrink under file skipping, so the overhead ratio
  * has to stay ~1% of data or the design is wrong).
  *
  * Usage: runMain graft.tools.StatsSizeProbe [sfDir]
  */
object StatsSizeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.functions.GraftExtensions
      .builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("ndvsize").toString
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // the log encodes long/int/double/string; date columns ride as
    // strings (width is what we're measuring, not types)
    val cols = raw.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.StringType =>
          org.apache.spark.sql.functions.col(f.name)
        case _ => org.apache.spark.sql.functions.col(f.name)
          .cast("string").as(f.name)
      }
    }
    raw.select(cols.toSeq: _*).repartition(8)
      .write.format("graft.sources.GraftLogSource")
      .option("path", dir).mode("append").save()
    // metadata = every commit/checkpoint segment (the CAS log layout)
    val all = new java.io.File(dir).listFiles
    val meta = all.filter(f => f.getName.startsWith("_commit.") ||
      f.getName.startsWith("_checkpoint") ||
      f.getName == "_manifest")
    val parts = all.filter(_.getName.startsWith("part-"))
    val metaBytes = meta.map(_.length).sum
    val partBytes = parts.map(_.length).sum
    println(f"RESULT metadata=${metaBytes}%d B entries=${parts.length}%d " +
      f"perEntry=${metaBytes / parts.length}%d B " +
      f"avgPart=${partBytes / parts.length}%d B " +
      f"overheadPct=${metaBytes * 100.0 / partBytes}%.2f")
    spark.stop()
  }
}
