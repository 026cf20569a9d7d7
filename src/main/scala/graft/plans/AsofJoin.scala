package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanShim, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.TimestampType

/** Native ASOF JOIN as a full custom-operator stack — logical node,
  * planner strategy, physical merge exec — registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions).
  *
  * Semantics (same contract as [[graft.operators.Temporal.asofJoin]] and
  * DuckDB's `ASOF LEFT JOIN`): for every left row, attach the latest
  * right row with equal key and `right.ts <= left.ts`; nulls when none.
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted
  * by (key, ts) — EnsureRequirements inserts the exchanges and sorts —
  * then a single streaming two-pointer merge per co-partition. O(n+m)
  * per partition, constant memory (one carried right row), no
  * per-key buffering, no window state: the shape that holds at 100 TB
  * where the union+window formulation pays an extra global sort over
  * the combined stream. */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Expression],
    // constructor parameter, NOT derived: optimizer transforms copy()
    // this node, and output attribute exprIds must survive every copy
    asofAttrs: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Expression],
    override val output: Seq[Attribute]) extends BinaryExecNode {
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      output.drop(left.output.length))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // The right side additionally sorts by the carried value columns so
  // the row picked among equal-(key, ts) right rows (the last consumed,
  // i.e. max by values) is deterministic under any partitioning.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
      (rightKey +: rightTs +: rightVals).map(e =>
        SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rValsB = (rightTs +: rightVals)
      .map(BindReferences.bindReference(_, right.output))
    val nAsof = rValsB.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rightSideProj = UnsafeProjection.create(rValsB)
      val outProj = UnsafeProjection.create(
        outAttrs.map(a => a.asInstanceOf[Expression]), outAttrs)
      val nullRight = new GenericInternalRow(nAsof)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rNext: InternalRow = _
        private var rNextKey = 0L
        private var rNextTs = 0L
        private var carried: InternalRow = _ // projected (ts, vals) row
        private var carriedKey = 0L
        private var hasCarried = false
        advanceRight()

        // Null-key / null-ts right rows can never be an ASOF match (SQL
        // comparison semantics: NULL never satisfies <=), so skip them
        // here instead of unboxing null to 0L and matching key 0 /
        // epoch 0. They sort first under Ascending NULLS FIRST, so
        // skipping preserves the merge order.
        private def advanceRight(): Unit = {
          rNext = null
          while (rNext == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyB.eval(r)
            val t = rTsB.eval(r)
            if (k != null && t != null) {
              rNext = r
              rNextKey = k.asInstanceOf[Long]
              rNextTs = t.asInstanceOf[Long]
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lk = lKeyB.eval(lRow)
          val lt = lTsB.eval(lRow)
          // null left key/ts: emit the null-extended row without
          // consuming right rows (null left rows also sort first)
          if (lk == null || lt == null) {
            return outProj(joined(lRow, nullRight))
          }
          val lkv = lk.asInstanceOf[Long]
          val ltv = lt.asInstanceOf[Long]
          // consume right rows at-or-before (lk, lt); "at" included —
          // ties resolve to the right row, matching ASOF <=
          while (rNext != null &&
              (rNextKey < lkv || (rNextKey == lkv && rNextTs <= ltv))) {
            carried = rightSideProj(rNext).copy()
            carriedKey = rNextKey
            hasCarried = true
            advanceRight()
          }
          val rightPart =
            if (hasCarried && carriedKey == lkv) carried else nullRight
          outProj(joined(lRow, rightPart))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofJoinPlan =>
      AsofJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTs, p.rightTs, p.rightVals,
        p.output) :: Nil
    case _ => Nil
  }
}

/** Public entry: build the custom plan from two resolved DataFrames. */
object AsofJoin {
  /** `leftKey`/`rightKey` must be Long columns, `lts`/`rts` timestamps;
    * `rightVals` are carried into the output as `asof_v<i>` (rename with
    * `.withColumnRenamed`). `asof_ts` is the matched right timestamp. */
  def native(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, lts: String, rts: String,
      rightVals: Seq[String]): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"Column not found: $name"))
    def typed(plan: LogicalPlan, name: String,
        dt: org.apache.spark.sql.types.DataType, role: String): Attribute = {
      val a = attr(plan, name)
      if (a.dataType != dt) throw new IllegalArgumentException(
        s"asof $role column '$name' must be $dt, got ${a.dataType}")
      a
    }
    val rv = rightVals.map(attr(rPlan, _))
    val asofAttrs: Seq[Attribute] =
      AttributeReference("asof_ts", TimestampType, nullable = true)() +:
        rv.zipWithIndex.map { case (v, i) =>
          AttributeReference(s"asof_v$i", v.dataType, nullable = true)()
        }
    import org.apache.spark.sql.types.LongType
    GraftPlanShim.ofRows(spark, AsofJoinPlan(
      lPlan, rPlan,
      typed(lPlan, leftKey, LongType, "key"),
      typed(rPlan, rightKey, LongType, "key"),
      typed(lPlan, lts, TimestampType, "time"),
      typed(rPlan, rts, TimestampType, "time"),
      rv, asofAttrs))
  }
}
