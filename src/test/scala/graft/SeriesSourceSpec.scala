package graft

import org.apache.spark.sql.functions._

/** The custom DSv2 connector's contract: deterministic content, filter
  * pushdown that prunes input partitions at planning time, column
  * pruning that reaches the reader, and non-pushable predicates left
  * as Spark-side residuals. */
class SeriesSourceSpec extends SparkSpec {
  private def load(n: Long, slices: Int = 8) =
    spark.read.format("graft.sources.SeriesSource")
      .option("n", n.toString).option("slices", slices.toString).load()

  test("full scan generates exactly n rows matching the range twin") {
    val df = load(1000)
    val twin = spark.range(1000).select(col("id"),
      (col("id") % 97).cast("int").as("bucket"),
      ((col("id") * 2654435761L) % 100000L / 100.0).as("value"),
      concat(lit("t"), col("id") % 7).as("tag"))
    assert(df.count() == 1000)
    assert(df.exceptAll(twin).isEmpty && twin.exceptAll(df).isEmpty,
      "generated content must equal the deterministic range twin")
  }

  test("range filters prune partitions at planning time") {
    val df = load(100000, 16)
      .filter(col("id") >= 25000L && col("id") < 75000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("slices=8/16"),
      s"expected 8 of 16 slices kept:\n${plan.take(2000)}")
    assert(df.count() == 50000)
  }

  test("pushed bounds at Long.MaxValue saturate instead of wrapping") {
    // `id <= MaxValue` is all-true: a wrapping +1 on the exclusive
    // bound used to prune the whole span to empty
    assert(load(100).filter(col("id") <= Long.MaxValue).count() == 100)
    // `id > MaxValue` is all-false AND the filter is CONSUMED by the
    // source (never re-checked by Spark): the span must empty
    assert(load(100).filter(col("id") > Long.MaxValue).count() == 0)
    assert(load(100).filter(col("id") === Long.MaxValue).count() == 0)
  }

  test("projection prunes generated columns out of the reader") {
    val df = load(100).select("id", "value")
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.nonEmpty && !scanLine.contains("tag"), scanLine)
    assert(df.agg(sum("value")).head.getDouble(0) > 0)
  }

  test("limit pushes fully and shrinks the planned slices") {
    val df = load(100000, 16).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("slices=1/16"),
      s"limit should narrow the span to one slice:\n${plan.take(2000)}")
    assert(df.count() == 5)
  }

  test("statistics reflect pushdown so a filtered read looks small") {
    val full = load(100000, 16)
    val narrow = load(100000, 16)
      .filter(col("id") >= 10L && col("id") < 20L)
    def bytes(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes(narrow) < bytes(full) / 100,
      s"narrow=${bytes(narrow)} full=${bytes(full)}")
  }

  test("reads are vectorized: the scan feeds ColumnarToRow") {
    val df = load(10000).groupBy("bucket").count()
    // AQE inserts row/columnar transitions when it materializes query
    // stages — execute THIS df's plan first (count() would build a
    // separate execution), then inspect the final plan.
    assert(df.collect().length == 97)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"columnar batches expected:\n${plan.take(1500)}")
  }

  test("non-pushable predicates remain as Spark-side residual filters") {
    val df = load(1000).filter(col("bucket") === 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), plan.take(1500))
    assert(df.count() ==
      spark.range(1000).filter(col("id") % 97 === 5).count())
  }

  test("SQL TVF graft_series resolves to the source with pruning intact") {
    val df = spark.sql(
      "SELECT id FROM graft_series(1000, 8) WHERE id >= 900")
    assert(df.count() == 100)
    // the same slice pruning the reader-API path gets: the pushed
    // range keeps 1 of 8 slices
    assert(df.queryExecution.executedPlan.toString.contains("slices=1/8"))
    // literal-only arguments are the contract
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_series(rand())").collect()
    }
    assert(e.getMessage.contains("literal") ||
      e.getMessage.contains("graft_series"))
  }
}
