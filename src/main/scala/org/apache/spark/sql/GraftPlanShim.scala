package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** The one package-private bridge this library needs: wrap a custom
  * [[LogicalPlan]] (graft.plans.AsofJoinPlan) into a public DataFrame.
  * `Dataset.ofRows` is `private[sql]` by design; extension libraries
  * (Delta, Iceberg, spark-nlp, …) use exactly this package-object shim
  * until SPARK-45314-style public plan injection lands. Nothing else in
  * graft touches Spark internals beyond documented extension points. */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
      .asInstanceOf[CDataFrame]

  /** V2→V1 predicate conversion for runtime-filter handling
    * (`SupportsRuntimeV2Filtering.filter` hands V2 Predicates; the
    * graft-log stats skipper speaks V1 `Filter`). `PredicateUtils` is
    * `private[sql]`, same story as `Dataset.ofRows` above. */
  def predicatesToV1(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.internal.connector.PredicateUtils
      .toV1(predicates)

  /** Whether a SQL conf key was EXPLICITLY set (runtime `conf.set`, or
    * inherited from the cluster/session SparkConf), as opposed to
    * reading its code default — `conf.get(key, default)` cannot tell
    * the two apart when the explicit value EQUALS the default (e.g. a
    * deliberately pinned 10 MB autoBroadcastJoinThreshold).
    * `SQLConf.contains` consults only the explicit settings map, but
    * `sessionState` is `private[sql]` — same story as the shims above. */
  def isConfSet(spark: SparkSession, key: String): Boolean =
    spark.asInstanceOf[CSparkSession].sessionState.conf.contains(key)

  /** Column-level not-null assertion with `nullable = false` output —
    * the nullability-restore primitive for parquet round-tripped
    * artifacts (file sources force every read column nullable, but
    * the codegen kernels type-check `containsNull = false`, and the
    * artifact builds guarantee it). `AssertNotNull` rather than the
    * zero-cost `KnownNotNull` tag on purpose: a stale or corrupt
    * persisted artifact that DOES carry a null fails loudly at
    * materialization instead of flowing garbage into a kernel that
    * was promised no nulls. Catalyst-internal expression — same
    * justification as the shims above. */
  def assertNotNull(c: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
        org.apache.spark.sql.classic.ExpressionUtils.expression(c)))
}
