package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface: exact weighted mean via an `Aggregator` —
  * the extension point for aggregation logic sum/avg can't express.
  *
  * Accumulators are BigDecimal (exact, mergeable, order-independent),
  * quantized to the fixtures' 2-decimal values like the DECIMAL-cast
  * sums elsewhere; the single double division happens once at the end,
  * so the DuckDB oracle (`CAST(SUM(dec)/ AS DOUBLE) / CAST(SUM(dec) AS
  * DOUBLE)`) hash-matches. Spark plans this as an ObjectHashAggregate
  * with partial merge — the same two-phase shape as built-in aggregates,
  * so the shuffle carries one buffer per (group × partition). */
object WeightedMean
    extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private def q2(d: Double): BigDecimal =
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal),
      a: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + q2(a._1) * q2(a._2), b._2 + q2(a._2))

  override def merge(x: (BigDecimal, BigDecimal),
      y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN
    else r._1.toDouble / r._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    ExpressionEncoder[(BigDecimal, BigDecimal)]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Untyped (DataFrame) form: weighted mean of `x` with weights `w`. */
  def toColumn(x: Column, w: Column): Column = {
    val f = udaf(this, ExpressionEncoder[(Double, Double)]())
    f(x, w)
  }
}
