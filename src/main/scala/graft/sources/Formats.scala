package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface beyond the Parquet fixtures: CSV, JSON (lines),
  * and ORC, with schema-preserving round-trips. The reference has no
  * I/O at all (SURVEY.md §2.1); this is the ingest/egress surface a
  * standalone engine needs.
  *
  * Scale notes: every writer here partitions by the frame's existing
  * partitioning (no coalesce — a 100 TB egress wants one file per
  * task); readers take an explicit schema, because schema inference
  * over CSV/JSON is a full extra pass at scale (and type-lossy for
  * CSV). Parquet/ORC embed their schema — columnar + predicate
  * pushdown make them the only sane at-rest formats for the pipeline;
  * CSV/JSON exist for interchange. */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("timestampFormat",
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Partitioned-by-column Parquet layout (hive-style directories) —
    * the layout that makes partition pruning work on a date/key column
    * at scale. */
  def writePartitioned(df: DataFrame, path: String, byCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(byCol).parquet(path)
}
