package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.sources.GraftLogNdv

/** Mergeable HyperLogLog sketch AGGREGATES over the same 512-register
  * kernel the graft-log manifest stats use ([[GraftLogNdv]]) — the
  * sketch-partials pattern (Databricks `hll_sketch_agg`/
  * `hll_union_agg`, BigQuery `HLL_COUNT.*`): fold each partition of a
  * 100 TB fact table into a per-(group, day) sketch ONCE, store the
  * bytes, and answer any later distinct-count rollup by merging stored
  * sketches — no rescan of the raw data, and the merge is exactly
  * lossless (register max), so partial-then-merge equals
  * direct-over-everything bit for bit.
  *
  * Both aggregates plan as ObjectHashAggregate with map-side partial
  * merge: the shuffle carries one 512-byte buffer per (group ×
  * partition), not rows. */
object HllSketch
    extends Aggregator[String, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = new Array[Byte](GraftLogNdv.M)
  override def reduce(b: Array[Byte], a: String): Array[Byte] = {
    if (a != null) GraftLogNdv.add(b, a)
    b
  }
  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
    GraftLogNdv.merge(x, y)
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  /** `graft_hll_sketch(values)` — build a sketch from raw values. */
  def toColumn(c: Column): Column = udaf(this, Encoders.STRING)(c)
}

/** Re-aggregation half: union STORED sketches (binary column) into one. */
object HllUnion
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = new Array[Byte](GraftLogNdv.M)
  override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
    if (a == null) b else GraftLogNdv.merge(b, a)
  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
    GraftLogNdv.merge(x, y)
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  def toColumn(c: Column): Column = udaf(this, Encoders.BINARY)(c)
}

object HllEstimate {
  /** Estimate read-out for a sketch column. A Scala UDF is fine here:
    * it runs at aggregate-output cardinality (one row per group), never
    * in the per-row hot path. */
  def toColumn(c: Column): Column =
    org.apache.spark.sql.functions.udf(
      // null-safe like the Catalyst twin graft_hll_estimate: a NULL
      // sketch yields NULL, never an executor NPE
      (b: Array[Byte]) =>
        if (b == null) null
        else java.lang.Long.valueOf(GraftLogNdv.estimate(b))).apply(c)
}

/** String-encoded sketch forms, for storing sketches in formats
  * without a binary type (the graft-log TSV cells): the sketch
  * travels as [[GraftLogNdv.serialize]]'s zero-run hex — the same
  * encoding the manifest stats use, safe in a TSV cell. What the
  * incremental materialized view persists per group. */
object HllSketchStr extends Aggregator[String, Array[Byte], String] {
  override def zero: Array[Byte] = new Array[Byte](GraftLogNdv.M)
  override def reduce(b: Array[Byte], a: String): Array[Byte] = {
    if (a != null) GraftLogNdv.add(b, a)
    b
  }
  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
    GraftLogNdv.merge(x, y)
  override def finish(r: Array[Byte]): String = GraftLogNdv.serialize(r)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[String] = Encoders.STRING

  def toColumn(c: Column): Column = udaf(this, Encoders.STRING)(c)

  /** The zero sketch's encoding — the `coalesce` identity for a group
    * with no prior view row. */
  lazy val emptyEncoded: String =
    GraftLogNdv.serialize(new Array[Byte](GraftLogNdv.M))

  /** Pairwise union of two encoded sketches (cold path: runs at
    * touched-group cardinality during a view refresh). */
  def unionPair(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.udf((x: String, y: String) =>
      // null-safe: a missing side contributes the zero sketch (the
      // join-miss case emptyEncoded documents), never an NPE
      if (x == null && y == null) null
      else GraftLogNdv.serialize(GraftLogNdv.merge(
        GraftLogNdv.deserialize(
          if (x == null) emptyEncoded else x),
        GraftLogNdv.deserialize(
          if (y == null) emptyEncoded else y))))
      .apply(a, b)

  def estimate(c: Column): Column =
    org.apache.spark.sql.functions.udf((x: String) =>
      if (x == null) null
      else java.lang.Long.valueOf(
        GraftLogNdv.estimate(GraftLogNdv.deserialize(x)))).apply(c)
}
