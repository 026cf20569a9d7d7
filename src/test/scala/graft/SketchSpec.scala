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

  test("count-min sketch: merge law and never-undercount, exhaustively") {
    import graft.functions.CountMin
    // pure-function law check: sketch(A ++ B) == merge(sketch(A), sketch(B))
    val a = (0L until 500L).map(_ % 37)
    val b = (0L until 300L).map(_ % 11)
    def sk(xs: Seq[Long]) = xs.foldLeft(CountMin.zero)(CountMin.reduce)
    val merged = CountMin.merge(sk(a), sk(b))
    val whole = sk(a ++ b)
    assert(merged.sameElements(whole), "sketch must be mergeable")
    // point estimates never undercount, for EVERY key present
    def est(m: Array[Long], k: Long) = (0 until CountMin.Depth)
      .map(r => m(r * CountMin.Width + CountMin.bucket(r, k))).min
    val exact = (a ++ b).groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (k, n) =>
      assert(est(whole, k) >= n, s"undercount for key $k")
    }
  }
}
