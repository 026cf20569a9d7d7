package graft

import graft.core.MiniFrame

/** Masking / projection / join / flagship — reference tests.py:97-99,
  * 124-131, 134-144 and the J1 intended left join (SURVEY.md §2.5). */
class FrameSpec extends SparkSpec {

  private def products: MiniFrame = MiniFrame.fromDict(spark, Seq(
    "SKU" -> Seq("X4E", "T3D", "F8D", "C7X"),
    "price" -> Seq(7.0, 3.5, 8.0, 5.0),
    "sales" -> Seq(5, 3, 1, 10),
    "taxed" -> Seq(false, false, true, false)))

  test("P1/P2 get_column; miss raises Column not found (tests.py:124-126)") {
    val df = products
    assert(df("price").values() == Seq(7.0, 3.5, 8.0, 5.0))
    val e = intercept[IllegalArgumentException] { df("nope") }
    assert(e.getMessage == "Column not found")
  }

  test("P3 positional lookup") {
    assert(products("SKU").at(2) == "F8D")
    intercept[IndexOutOfBoundsException] { products("SKU").at(99) }
  }

  test("F1 apply_mask on one column (tests.py:97-99)") {
    val df = products
    val mask = df("price") > 4.0
    assert(df("SKU").applyMask(mask).values() == Seq("X4E", "F8D", "C7X"))
  }

  test("F1 mask validation: bool + non-optional required") {
    val df = products
    assert(intercept[IllegalArgumentException] {
      df("SKU").applyMask(df("price"))
    }.getMessage == "Mask must be a boolean series")
    // nullable bool (hand-built via non-Kleene AND on nullable input)
    val nb = MiniFrame.seriesFromArray(spark, Seq(null, true, false, true))
    val nullableMask = nb && nb
    assert(intercept[IllegalArgumentException] {
      df("SKU").applyMask(nullableMask)
    }.getMessage == "Mask should be a non-optional boolean series")
  }

  test("F3 frame mask filters all columns by position (tests.py:128-131)") {
    val df = products
    val filtered = df(df("sales") > 2L)
    assert(filtered.count() == 3)
    assert(filtered("SKU").values() == Seq("X4E", "T3D", "C7X"))
    assert(filtered("price").values() == Seq(7.0, 3.5, 5.0))
  }

  test("flagship integration query (tests.py:134-144)") {
    val df = products
    val mask = ((df("price") + 5.0) > 10.0) && (df("sales") > 3L) && !df("taxed")
    val r = df(mask)("SKU").values()
    assert(r == Seq("X4E")) // price 7+5>10 ∧ sales 5>3 ∧ ¬taxed
  }

  test("J1 left join: SQL multiplicity, nulls for misses (tests.py:13-20)") {
    val left = products
    val right = MiniFrame.fromDict(spark, Seq(
      "SKU" -> Seq("X4E", "T3D", "F8D"),
      "id" -> Seq(1, 2, 3)))
    val joined = left.leftJoin(right, "SKU")
    val bySku = joined.collectRows()
      .map(r => r.getAs[String]("SKU") -> r.getAs[Any]("id")).toMap
    assert(bySku("X4E") == 1L && bySku("T3D") == 2L && bySku("F8D") == 3L)
    assert(bySku("C7X") == null) // left-outer miss
    assert(joined.count() == 4)
  }

  test("S5/S6 rendering includes dtype and order") {
    val s = MiniFrame.seriesFromArray(spark, Seq(1L, null, 3L), "x")
    assert(s.toString == "Series(x <optional int>, [1, null, 3])")
    assert(products.toString.linesIterator.next().contains("SKU"))
  }

  test("entry flagship on fixtures returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
