package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Formats, Tables}

/** Dynamic partition pruning — the third leg of the scan-reduction
  * tripod (static PartitionFilters: FormatsSpec; runtime bloom filter:
  * RuntimeFilterSpec). When a hive-partitioned fact joins a dim on the
  * partition column and the dim carries a selective filter, the
  * optimizer injects the dim's key set as a runtime partition filter
  * into the fact scan — at 100 TB the fact side reads only the
  * directories that can match, before any I/O happens. */
class DynamicPruningSpec extends SparkSpec {

  test("selective dim join prunes fact partitions at runtime") {
    // fact: orders hive-partitioned by priority (5 directories)
    val p = Files.createTempDirectory("graft_dpp").toString
    Formats.writePartitioned(
      Tables.orders(spark, sf001), p, "o_orderpriority")
    val fact = spark.read.parquet(p)
    // dim: priority attributes, filtered to ONE key at query time
    val dim = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority").as("pri")).distinct()
      .withColumn("tier", substring(col("pri"), 1, 1).cast("int"))
      .filter(col("tier") === 1)
    val joined = fact.join(dim, col("o_orderpriority") === col("pri"))
      .groupBy(col("pri")).agg(count(lit(1)).as("n"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n${phys.take(1200)}")
    // and the pruned plan still computes the right answer
    val rows = joined.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) ==
      Tables.orders(spark, sf001)
        .filter(col("o_orderpriority").startsWith("1")).count())
  }
}
