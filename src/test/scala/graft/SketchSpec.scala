package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate-aggregate error bounds vs exact recomputation (the check
  * the DuckDB oracle can't express because sketch internals differ). */
class SketchSpec extends SparkSpec {

  test("approx sketches land within their error bounds") {
    val row = SparkEntry.queries("agg_approx_sketches")(spark, sf0001)
      .collect().head
    val li = Tables.lineitem(spark, sf0001)
    val exactDistinct = li.select(countDistinct(col("l_orderkey")))
      .collect().head.getLong(0)
    val approx = row.getAs[Long]("approx_orders")
    // rsd 0.01 → generous 5% acceptance band
    assert(math.abs(approx - exactDistinct).toDouble / exactDistinct < 0.05,
      s"approx=$approx exact=$exactDistinct")
    val Array(p50e, p95e) = li.stat
      .approxQuantile("l_extendedprice", Array(0.5, 0.95), 0.0)
    assert(math.abs(row.getAs[Double]("p50_price") - p50e) / p50e < 0.01)
    assert(math.abs(row.getAs[Double]("p95_price") - p95e) / p95e < 0.01)
  }
}
