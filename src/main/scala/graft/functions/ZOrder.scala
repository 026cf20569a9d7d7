package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values as pure Column arithmetic — the
  * multi-column clustering key lake layouts sort by so that BOTH join/
  * filter columns get narrow per-file min/max ranges, and parquet
  * row-group skipping works for predicates on either column (Morton
  * 1966; the layout technique behind Delta/Iceberg Z-ordering).
  *
  * Built from shift/mask/add only: codegen-friendly, no UDF, and the
  * identical integer math is expressible in the DuckDB oracle. Inputs
  * must already be bucketed to [0, 2^bits). */
object ZOrder {

  /** Interleave the low `bits` of x (even positions) and y (odd). */
  def zValue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as oracle SQL over integer columns. */
  def zValueSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)}" +
        s" + (($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
}
