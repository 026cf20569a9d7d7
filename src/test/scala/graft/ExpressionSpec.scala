package graft

import graft.core.{DType, MiniFrame, MiniSeries}

/** E1-E17 expression algebra with the reference's null semantics
  * (SURVEY.md §1.4, §2.4; reference tests.py:53-95, 110-122). */
class ExpressionSpec extends SparkSpec {

  private def series(data: Any*): MiniSeries =
    MiniFrame.seriesFromArray(spark, data)

  test("E1-E4 comparisons: null input → false, output non-nullable") {
    val s = series(null, 1L, 2L)
    val r = s < 2L
    assert(r.dtype == DType.BoolT && !r.nullable)
    assert(r.values() == Seq(false, true, false))
    assert((s >= 1L).values() == Seq(false, true, true))
  }

  test("E3 scalar-on-left mirrors to flipped op (tests.py:58-61)") {
    // reference: 4 < s dispatches to s.__gt__; wrapper takes explicit side
    val s = series(3.0, 5.0)
    assert((s > 4.0).values() == Seq(false, true))
  }

  test("E6/E7 equality is null-safe: None==None → true (verified)") {
    val s = series(null, 1L, 2L)
    // series-to-series: null <=> null → true (reference: None == None → True)
    assert((s === series(null, 1L, 3L)).values() == Seq(true, true, false))
    assert((s === 1L).values() == Seq(false, true, false))
    assert((s !== 1L).values() == Seq(true, false, true))
    val r = s === 2L
    assert(!r.nullable)
    // scalar None against a typed series: type rejection, like the
    // reference's equality_comparison dtype check
    intercept[IllegalArgumentException] { s === null }
  }

  test("E6 equality allows same-dtype strings, rejects mixed (tests.py:63-83)") {
    val s = series("a", "b")
    assert((s === "a").values() == Seq(true, false))
    val e = intercept[IllegalArgumentException] { s === 1L }
    assert(e.getMessage == "Can only compare same type series or values")
  }

  test("E8-E10 arithmetic propagates null; int+int stays int") {
    val s = series(1L, null, 3L)
    val r = s + 1L
    assert(r.dtype == DType.IntT && r.nullable)
    assert(r.values() == Seq(2L, null, 4L))
    val f = s * 2.0
    assert(f.dtype == DType.FloatT)
    assert(f.values() == Seq(2.0, null, 6.0))
  }

  test("E8 cross-frame series+series aligns by position (tests.py:110-115)") {
    val a = series(1.2, null, 3.0, 4.0)
    val b = series(1.0, 2.0, 3.0, 4.0)
    assert((a + b).values() == Seq(2.2, null, 6.0, 8.0))
    val e = intercept[IllegalArgumentException] { a + series(1.0) }
    assert(e.getMessage == "Series must have the same length")
  }

  test("E11 division always yields float values ([4]/[2] → [2.0])") {
    val r = series(4L) / series(2L)
    assert(r.dtype == DType.FloatT)
    assert(r.values() == Seq(2.0))
  }

  test("E12 modulo takes the divisor's sign like Python (-7 % 3 == 2)") {
    assert((series(-7L) % 3L).values() == Seq(2L))
    assert((series(7L) % -3L).values() == Seq(-2L))
    assert((series(7L) % 3L).values() == Seq(1L))
  }

  test("E13/E14 AND/OR are non-Kleene: null input → null output") {
    val a = series(null, true, false, true)
    val b = series(false, false, false, true)
    // SQL Kleene would give false for (null AND false); reference gives null
    assert((a && b).values() == Seq(null, false, false, true))
    assert((a || b).values() == Seq(null, true, false, true))
  }

  test("E15/E16 XOR propagates null; NOT propagates null") {
    val a = series(null, false, true)
    assert((a ^ series(false, false, false)).values() == Seq(null, false, true))
    assert((!a).values() == Seq(null, true, false))
  }

  test("E17 type-error contract: exact reference messages (tests.py:63-83)") {
    val nums = series(1.0, 2.0)
    val bools = series(true, false)
    assert(intercept[IllegalArgumentException](nums < "x").getMessage ==
      "Can only compare between numeric values or series")
    assert(intercept[IllegalArgumentException](nums + true).getMessage ==
      "Can only perform arithmetic operations on numeric series or values")
    assert(intercept[IllegalArgumentException](bools && 1.0).getMessage ==
      "Can only perform boolean operations on boolean series")
    assert(intercept[IllegalArgumentException](!nums).getMessage ==
      "Can only perform boolean operations on boolean series")
  }

  test("arithmetic on NoneType series rejects (SURVEY §7.5 note 5)") {
    val s = series(null, null)
    intercept[IllegalArgumentException] { s + 1L }
  }
}
