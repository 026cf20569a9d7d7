package graft

import graft.sources.Tables

/** Approximate-aggregate error bounds vs exact recomputation. The query
  * itself now emits in-bound booleans (so the DuckDB oracle can assert
  * them); this spec asserts the booleans and independently recomputes
  * the p50/p95 bound through approxQuantile(…, 0.0) (exact quantiles). */
class SketchSpec extends SparkSpec {

  test("approx sketches land within their error bounds") {
    val row = SparkEntry.queries("agg_approx_sketches")(spark, sf0001)
      .collect().head
    assert(row.getAs[Boolean]("orders_in_bound"), row.toString)
    assert(row.getAs[Boolean]("p50_in_bound"), row.toString)
    assert(row.getAs[Boolean]("p95_in_bound"), row.toString)
    val li = Tables.lineitem(spark, sf0001)
    val exactDistinct = li.select(
      org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("l_orderkey")))
      .collect().head.getLong(0)
    assert(row.getAs[Long]("exact_orders") == exactDistinct)
  }
}
