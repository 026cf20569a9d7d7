package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.sources.Tables

/** Z-order's data-skipping claim, measured: cluster a table into files
  * by the Morton value of two columns and the per-file min/max range
  * narrows on BOTH columns — versus a single-column sort, where the
  * second column's per-file range stays the full domain and min/max
  * skipping can never prune for it. */
class ZOrderSpec extends SparkSpec {

  private def perFileRangeSum(dir: String, colName: String): Long = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(colName)), max(col(colName))).head
      r.getLong(1) - r.getLong(0)
    }.sum
  }

  test("z-ordered files narrow min/max ranges on both columns") {
    val src = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_partkey"), lit(256L)).as("px"),
        pmod(col("l_suppkey"), lit(256L)).as("py"))
    val nFiles = 16

    val zDir = Files.createTempDirectory("graft_zorder").toString
    src.withColumn("zval", ZOrder.zValue(col("px"), col("py")))
      .repartitionByRange(nFiles, col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(zDir)

    val xDir = Files.createTempDirectory("graft_xsort").toString
    src.repartitionByRange(nFiles, col("px"), col("py"))
      .write.mode("overwrite").parquet(xDir)

    // single-column range sort: px ranges are tight but py per-file
    // ranges stay ~the full domain; z-order must narrow py sharply
    // while keeping px far below the full-domain-per-file worst case
    val dom = src.agg(max(col("px")) - min(col("px")),
      max(col("py")) - min(col("py"))).head
    val (fullX, fullY) =
      (dom.getLong(0) * nFiles, dom.getLong(1) * nFiles)
    val zPx = perFileRangeSum(zDir, "px")
    val zPy = perFileRangeSum(zDir, "py")
    val xPy = perFileRangeSum(xDir, "py")
    assert(xPy > fullY * 3 / 4,
      s"sanity: px-sorted layout should leave py unclustered ($xPy of $fullY)")
    assert(zPy < xPy / 2,
      s"z-order must at least halve the py range sum ($zPy vs $xPy)")
    assert(zPx < fullX * 3 / 4,
      s"z-order must keep px partially clustered too ($zPx of $fullX)")
    // and the layout is lossless
    assert(spark.read.parquet(zDir).count() == src.count())
  }
}
