package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{RefSemantics => S}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: reference-parity operators
  * (SURVEY.md §2, ids S-, P-, F-, E-, J-) from [[graft.queries.Parity]], plus
  * the [EXT] surface (aggregates, analytics, scalar functions, dedup,
  * similarity, text analysis, event windows, multimodal). Every oracle-
  * expressible query has matching DuckDB SQL in `oracleSql` with
  * identical column names; xxhash64-based signature operators are
  * rows-only by design (asserted against exact recomputation in the
  * ScalaTest suites instead). */
object SparkEntry {

  /** Flagship query (reference integration_test shape, tests.py:141-144)
    * on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tables.part(spark, "/root/testdata/sf0.001")
      .filter(
        S.and(
          S.and(
            S.gt(S.add(col("p_retailprice"), lit(5.0)), lit(910.0)),
            S.gt(col("p_size"), lit(3))),
          S.not(S.eq(col("p_brand"), lit("Brand#13")))))
      .select(col("p_partkey"), col("p_name"))

  /** One entry per implemented operator from SURVEY.md §2 (+ [EXT]). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Parity.queries ++
      graft.queries.SqlInterface.queries ++
      graft.queries.Aggregates.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.ScalarFunctions.queries ++
      graft.functions.TextAnalysis.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Corpus.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.Temporal.queries ++
      graft.streaming.EventWindows.queries ++
      graft.operators.Multimodal.queries ++
      graft.sources.Formats.queries ++
      graft.queries.Graph.queries ++
      graft.queries.Warehouse.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Parity.oracles ++
      graft.queries.SqlInterface.oracles ++
      graft.queries.Aggregates.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.ScalarFunctions.oracles ++
      graft.functions.TextAnalysis.oracles ++
      graft.operators.Dedup.oracles ++
      graft.operators.Corpus.oracles ++
      graft.operators.Similarity.oracles ++
      graft.operators.Temporal.oracles ++
      graft.streaming.EventWindows.oracles ++
      graft.operators.Multimodal.oracles ++
      graft.sources.Formats.oracles ++
      graft.queries.Graph.oracles ++
      graft.queries.Warehouse.oracles
}
