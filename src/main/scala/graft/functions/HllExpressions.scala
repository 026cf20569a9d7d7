package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.GraftLogNdv

/** Native Catalyst HLL sketch aggregates [EXT] — the SQL face of the
  * [[GraftLogNdv]] kernel (the typed-Aggregator face is
  * [[HllSketch]]/[[HllUnion]]). Registered by [[GraftExtensions]] as:
  *
  *  - `graft_hll_sketch(value)`  — aggregate raw values into a sketch,
  *    returned as the zero-run hex STRING (storable in any format,
  *    including the graft-log's TSV cells);
  *  - `graft_hll_union(sketch)`  — re-aggregate stored sketches;
  *  - `graft_hll_estimate(sketch)` — scalar distinct-count read-out.
  *
  * TypedImperativeAggregate keeps the 512-byte register array as a
  * raw object in the ObjectHashAggregate buffer — update is two hashes
  * and one array max per row, merge is a register fold, and the
  * shuffle carries one serialized sketch per (group × partition).
  * This is the sketch-partials contract (`hll_sketch_agg` /
  * `hll_union_agg`) as plain SQL: per-partition sketches stored once,
  * any rollup later answered by union, never a rescan. */
abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]] {
  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](GraftLogNdv.M)
  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] =
    GraftLogNdv.merge(b, o)
  override def eval(b: Array[Byte]): Any =
    UTF8String.fromString(GraftLogNdv.serialize(b))
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
}

/** `graft_hll_sketch(value)`: any input type folds in through its
  * string form — same canonicalization as the manifest stats writer. */
case class HllSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) GraftLogNdv.add(b, v.toString)
    b
  }
  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HllSketchAgg = copy(child = c.head)
  override def prettyName: String = "graft_hll_sketch"
}

/** `graft_hll_union(sketch)`: folds STORED encoded sketches. A
  * malformed sketch string is a loud error — silently skipping one
  * would undercount forever. */
case class HllUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v == null) b
    else GraftLogNdv.merge(b, GraftLogNdv.deserialize(v.toString))
  }
  override def withNewMutableAggBufferOffset(o: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HllUnionAgg = copy(child = c.head)
  override def prettyName: String = "graft_hll_union"
}

/** `graft_hll_estimate(sketch)`: scalar read-out. CodegenFallback is
  * deliberate — this runs at aggregate-output cardinality (one call
  * per group), never in the per-row hot path. */
case class HllEstimateExpr(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    GraftLogNdv.estimate(GraftLogNdv.deserialize(input.toString))
  override protected def withNewChildInternal(
      c: Expression): HllEstimateExpr = copy(child = c)
  override def prettyName: String = "graft_hll_estimate"
}
