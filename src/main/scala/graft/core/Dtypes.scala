package graft.core

import org.apache.spark.sql.types._

/** The reference's type system (SURVEY.md §1.2): Python runtime classes
  * `int float bool str NoneType`, inferred strictly — the first non-null
  * value fixes the dtype and `int`/`float` are deliberately NOT unified
  * (reference: data_frame.py:105-116). Mapping per SURVEY.md §1.3. */
sealed abstract class DType(val spark: DataType, val pyName: String) {
  def isNumeric: Boolean = this == DType.IntT || this == DType.FloatT
}

object DType {
  case object IntT extends DType(LongType, "int")
  case object FloatT extends DType(DoubleType, "float")
  case object BoolT extends DType(BooleanType, "bool")
  case object StrT extends DType(StringType, "str")
  /** all-null or empty column (reference: data_frame.py:102-103) */
  case object NoneT extends DType(NullType, "NoneType")

  /** Exact runtime-class typing, like the reference's `type(value)` check
    * (so Boolean is NOT an Int, unlike Python's isinstance). */
  def of(v: Any): DType = v match {
    case _: Long | _: Int | _: java.lang.Long | _: java.lang.Integer => IntT
    case _: Double | _: Float | _: java.lang.Double | _: java.lang.Float => FloatT
    case _: Boolean | _: java.lang.Boolean => BoolT
    case _: String => StrT
    case null => NoneT
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported value type: ${other.getClass.getName}")
  }

  def fromSpark(dt: DataType, nullable: Boolean = false): DType = dt match {
    case LongType | IntegerType | ShortType | ByteType => IntT
    case DoubleType | FloatType => FloatT
    case BooleanType => BoolT
    case StringType => StrT
    case NullType => NoneT
    case other =>
      throw new IllegalArgumentException(s"Unsupported Spark type: $other")
  }

  /** Normalize an ingest value to the storage type for `spark`. */
  def normalize(v: Any): Any = v match {
    case i: Int => i.toLong
    case i: java.lang.Integer => i.longValue()
    case f: Float => f.toDouble
    case f: java.lang.Float => f.doubleValue()
    case other => other
  }
}

/** Strict schema inference — one scan, first non-null fixes the dtype,
  * any later value of a different class rejects the whole column with the
  * reference's exact error message (data_frame.py:91-118). Any null makes
  * the column optional; all-null → NoneType+optional; empty →
  * NoneType+non-optional (verified behavior, SURVEY.md §1.2). */
object Inference {
  final case class Inferred(dtype: DType, optional: Boolean)

  def inferColumn(data: Seq[Any]): Inferred = {
    var dtype: DType = null
    var optional = false
    data.foreach { v =>
      if (v == null) optional = true
      else {
        val t = DType.of(v)
        if (dtype == null) dtype = t
        else if (dtype != t)
          throw new IllegalArgumentException(
            "All values must have the same type")
      }
    }
    if (dtype == null) Inferred(DType.NoneT, optional)
    else Inferred(dtype, optional)
  }
}
