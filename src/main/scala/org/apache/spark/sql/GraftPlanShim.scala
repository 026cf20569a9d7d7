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
}
