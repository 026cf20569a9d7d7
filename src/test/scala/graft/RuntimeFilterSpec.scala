package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Runtime bloom-filter join pruning — the Spark 3.5+/4.x optimizer
  * injects a bloom filter built from a selectively-filtered join side
  * into the opposite (fact) scan, so a shuffle join reads and shuffles
  * only rows that can possibly match. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~1% that
  * survives the dim filter. The production thresholds key off multi-GB
  * scan sizes, so the spec lowers them to fixture scale to assert the
  * mechanism itself is live in this engine's sessions. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter into the fact side") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: a broadcast join already prunes via its
      // build side, so Spark (correctly) skips the bloom filter there.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, sf001)
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain")
          && optimized.contains("bloom_filter_agg"),
        s"expected an injected bloom runtime filter in:\n$optimized")
      // and the filtered plan still computes the right answer
      val n = joined.collect().map(_.getLong(1)).sum
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
