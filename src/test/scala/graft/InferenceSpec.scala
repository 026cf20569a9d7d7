package graft

import graft.core.{DType, Inference, MiniFrame}

/** Strict schema inference — mirrors reference tests.py:39-51, 101-108
  * (construction, mixed-type rejection, null construction). */
class InferenceSpec extends SparkSpec {

  test("first non-null fixes dtype; int/float NOT unified (tests.py:46-51)") {
    // Seq[Any] keeps the boxed classes distinct (plain Seq(1L, 2.0) would
    // be widened to Seq[Double] by Scala's numeric unification)
    val e = intercept[IllegalArgumentException] {
      Inference.inferColumn(Seq[Any](1L, 2L, 3.0))
    }
    assert(e.getMessage == "All values must have the same type")
    // bool is not an int (exact runtime-class typing)
    intercept[IllegalArgumentException] {
      Inference.inferColumn(Seq[Any](true, 1L))
    }
  }

  test("nullability inferred per column (tests.py:102-108)") {
    assert(Inference.inferColumn(Seq(1L, null, 3L)) ==
      Inference.Inferred(DType.IntT, optional = true))
    assert(Inference.inferColumn(Seq("a", "b")) ==
      Inference.Inferred(DType.StrT, optional = false))
    // all-null → NoneType + optional; empty → NoneType + non-optional
    assert(Inference.inferColumn(Seq(null, null)) ==
      Inference.Inferred(DType.NoneT, optional = true))
    assert(Inference.inferColumn(Seq.empty) ==
      Inference.Inferred(DType.NoneT, optional = false))
  }

  test("fromDict: product fixture round-trips (tests.py:4-11, 39-43)") {
    val mf = MiniFrame.fromDict(spark, Seq(
      "SKU" -> Seq("X4E", "T3D", "F8D", "C7X"),
      "price" -> Seq(7.0, 3.5, 8.0, 5.0),
      "sales" -> Seq(5, 3, 1, 10),
      "taxed" -> Seq(false, false, true, false)))
    assert(mf.columnNames == Seq("SKU", "price", "sales", "taxed"))
    assert(mf.count() == 4)
    assert(mf("price").dtype == DType.FloatT)
    assert(mf("sales").dtype == DType.IntT) // Int normalized to Long storage
    assert(mf("SKU").values() == Seq("X4E", "T3D", "F8D", "C7X"))
  }

  test("fromDict rejects unequal column lengths (data_frame.py:401-402)") {
    val e = intercept[IllegalArgumentException] {
      MiniFrame.fromDict(spark, Seq("a" -> Seq(1L, 2L), "b" -> Seq(1L)))
    }
    assert(e.getMessage == "All columns must have the same length")
  }

  test("all-null series constructs with NoneType (tests.py:102-108)") {
    val s = MiniFrame.seriesFromArray(spark, Seq(null, null, null))
    assert(s.dtype == DType.NoneT)
    assert(s.nullable)
    assert(s.length == 3)
  }
}
