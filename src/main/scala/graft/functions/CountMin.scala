package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 55(1), 2005): a Depth×Width counter matrix; each key increments one
  * counter per row (row-seeded hash), a point estimate is the MIN over
  * that key's counters. Estimates never undercount, and overcount by
  * at most εN (ε = e/Width) per row with probability 1 − e^(−Depth).
  *
  * The aggregation buffer is the flattened matrix — constant memory
  * (Depth·Width longs) regardless of input size, and mergeable by
  * element-wise addition, so Spark partial-aggregates it on every
  * executor and ships ONE 8 KB buffer per partition: the shape a
  * 100 TB heavy-hitters pass needs. The sketch is deterministic given
  * the data (hash seeds are fixed), so oracle checks are stable. */
object CountMin extends Aggregator[Long, Array[Long], Array[Long]] {
  val Depth = 4
  val Width = 256

  /** splitmix64 finalizer (Steele, Lea & Flood, OOPSLA'14 — public
    * domain) over (row-seed XOR key): row-independent bucket hashes. */
  def bucket(row: Int, key: Long): Int = {
    var z = key ^ (0x9e3779b97f4a7c15L * (row + 1))
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    ((z % Width + Width) % Width).toInt
  }

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    var r = 0
    while (r < Depth) { b(r * Width + bucket(r, key)) += 1; r += 1 }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Untyped (DataFrame) form: the sketch of a long key column. */
  def toColumn(key: Column): Column = {
    val f = udaf(this, Encoders.scalaLong)
    f(key)
  }
}
