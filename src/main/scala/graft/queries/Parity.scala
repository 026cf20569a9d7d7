package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{MiniFrame, RefSemantics => S}
import graft.sources.Tables

/** Reference-parity queries — one driver-checkable query per operator in
  * SURVEY.md §2 (S-, P-, F-, E-, J- ids), each paired with equivalent DuckDB
  * SQL in `oracles`. All plans are pure built-in Column compositions: the
  * full expression algebra stays inside WholeStageCodegen and filters/
  * projections reach the Parquet scan (PushedFilters / ReadSchema). */
object Parity {
  type Q = (SparkSession, String) => DataFrame

  /** NULLIF(c, v) — injects nulls deterministically so the fixture tables
    * (which have no nulls) exercise the reference's null semantics. */
  private def nullify(c: Column, v: Double): Column =
    when(c === lit(v), lit(null).cast("double")).otherwise(c)

  // Raw (SQL, nullable) comparisons used to build nullable bool inputs for
  // the non-Kleene E13-E15 tests; the reference can only produce nullable
  // bools by hand-construction (SURVEY.md §1.4 note 4).
  private def qtyFlag(df: DataFrame): Column =
    nullify(col("l_quantity"), 17.0) < lit(25.0)
  private def discFlag: Column = col("l_discount") > lit(0.05)

  val queries: Map[String, Q] = Map(
    // S1/S3: strict-inference ingest of the reference's product fixture
    // (tests.py:4-11) through MiniFrame.fromDict.
    "s1_s3_from_dict_infer" -> ((s, _) =>
      MiniFrame.fromDict(s, Seq(
        "SKU" -> Seq("X4E", "T3D", "F8D", "C7X"),
        "price" -> Seq(7.0, 3.5, 8.0, 5.0),
        "sales" -> Seq(5L, 3L, 1L, 10L),
        "taxed" -> Seq(false, false, true, false))).toDF),

    // S7 __len__
    "s7_len" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows"))),

    // P1/P2 get_column — single-column projection; ReadSchema prunes to
    // exactly these two columns at the scan.
    "p1_get_column" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey"), col("p_name"))),

    // P3 positional lookup (order defined by p_partkey)
    "p3_positional_lookup" -> ((s, d) =>
      Tables.part(s, d).orderBy(col("p_partkey")).offset(41).limit(1)
        .select(col("p_name"))),

    // F1 apply_mask on one column
    "f1_apply_mask" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(S.gt(col("l_quantity"), lit(45.0)))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // F3 whole-frame mask
    "f3_frame_mask" -> ((s, d) =>
      Tables.part(s, d)
        .filter(S.and(S.gt(col("p_size"), lit(40)),
          S.lt(col("p_retailprice"), lit(950.0))))),

    // §7.1 flagship: the reference integration_test query shape
    // df[(price+5>10) & (sales>3) & ~taxed]["SKU"] on `part`.
    "flagship_mask_project" -> ((s, d) =>
      Tables.part(s, d)
        .filter(
          S.and(
            S.and(
              S.gt(S.add(col("p_retailprice"), lit(5.0)), lit(950.0)),
              S.gt(col("p_size"), lit(3))),
            S.not(S.eq(col("p_brand"), lit("Brand#13")))))
        .select(col("p_partkey"), col("p_name"))),

    // E1-E4 numeric comparisons: null input → false, non-nullable out
    "e1_lt_nullfalse" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.lt(nullify(col("l_quantity"), 17.0), lit(25.0)).as("flag"))),
    "e2_le_nullfalse" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.le(nullify(col("l_quantity"), 17.0), lit(17.0)).as("flag"))),
    "e3_gt_nullfalse" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.gt(nullify(col("l_quantity"), 17.0), lit(30.0)).as("flag"))),
    "e4_ge_nullfalse" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.ge(nullify(col("l_quantity"), 17.0), lit(30.0)).as("flag"))),

    // E6/E7 null-safe equality: None == None → True
    "e6_eq_nullsafe" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.eq(nullify(col("l_quantity"), 17.0),
          nullify(col("l_quantity"), 20.0) * lit(1.0)).as("flag"),
        S.eq(nullify(col("l_quantity"), 17.0),
          nullify(col("l_quantity"), 17.0)).as("null_eq_null"))),
    "e7_ne_nullsafe" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.ne(nullify(col("l_quantity"), 17.0),
          nullify(col("l_quantity"), 20.0) * lit(1.0)).as("flag"))),

    // E8-E10 arithmetic null propagation
    "e8_add_nullprop" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.add(nullify(col("l_quantity"), 17.0), col("l_extendedprice"))
          .as("res"))),
    "e9_sub_nullprop" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.sub(col("l_quantity"), nullify(col("l_discount"), 0.0)).as("res"))),
    "e10_mul_nullprop" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.mul(col("l_extendedprice"), nullify(col("l_tax"), 0.0)).as("res"))),

    // E11 division → Double; divide-by-zero avoided via null divisor
    // (documents the non-ANSI null choice, SURVEY.md §7.6)
    "e11_div_double" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.div(col("l_extendedprice"), nullify(col("l_discount"), 0.0))
          .as("res"))),

    // E12 Python-sign modulo: ((a % b) + b) % b, both divisor signs
    "e12_mod_pysign" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        S.pyMod(col("l_orderkey") - lit(3000L), lit(7L)).as("mod_pos"),
        S.pyMod(col("l_orderkey") - lit(3000L), lit(-5L)).as("mod_neg"))),

    // E13/E14 non-Kleene AND/OR on nullable bools
    "e13_and_nonkleene" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
        S.and(qtyFlag(li), discFlag).as("flag"))
    }),
    "e14_or_nonkleene" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
        S.or(qtyFlag(li), discFlag).as("flag"))
    }),

    // E15 XOR (propagates null) / E16 NOT
    "e15_xor" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
        S.xor(qtyFlag(li), discFlag).as("flag"))
    }),
    "e16_not" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
        S.not(qtyFlag(li)).as("flag"))
    }),

    // J1 intended left-outer equi-join (reference's is broken; SURVEY §2.5)
    "j1_left_join" -> ((s, d) =>
      Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_outer")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_acctbal"), col("o_totalprice")))
  )

  val oracles: Map[String, String] = Map(
    "s1_s3_from_dict_infer" ->
      """SELECT SKU, CAST(price AS DOUBLE) AS price,
         CAST(sales AS BIGINT) AS sales, taxed
         FROM (VALUES ('X4E', 7.0, 5, false), ('T3D', 3.5, 3, false),
                      ('F8D', 8.0, 1, true), ('C7X', 5.0, 10, false))
           AS t(SKU, price, sales, taxed)""",
    "s7_len" -> "SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem",
    "p1_get_column" -> "SELECT p_partkey, p_name FROM part",
    "p3_positional_lookup" ->
      "SELECT p_name FROM part ORDER BY p_partkey LIMIT 1 OFFSET 41",
    "f1_apply_mask" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE COALESCE(l_quantity > 45.0, false)""",
    "f3_frame_mask" ->
      """SELECT * FROM part
         WHERE COALESCE(p_size > 40, false)
           AND COALESCE(p_retailprice < 950.0, false)""",
    "flagship_mask_project" ->
      """SELECT p_partkey, p_name FROM part
         WHERE COALESCE(p_retailprice + 5.0 > 950.0, false)
           AND COALESCE(p_size > 3, false)
           AND NOT (p_brand IS NOT DISTINCT FROM 'Brand#13')""",
    "e1_lt_nullfalse" ->
      """SELECT l_orderkey, l_linenumber,
         COALESCE(NULLIF(l_quantity, 17.0) < 25.0, false) AS flag
         FROM lineitem""",
    "e2_le_nullfalse" ->
      """SELECT l_orderkey, l_linenumber,
         COALESCE(NULLIF(l_quantity, 17.0) <= 17.0, false) AS flag
         FROM lineitem""",
    "e3_gt_nullfalse" ->
      """SELECT l_orderkey, l_linenumber,
         COALESCE(NULLIF(l_quantity, 17.0) > 30.0, false) AS flag
         FROM lineitem""",
    "e4_ge_nullfalse" ->
      """SELECT l_orderkey, l_linenumber,
         COALESCE(NULLIF(l_quantity, 17.0) >= 30.0, false) AS flag
         FROM lineitem""",
    "e6_eq_nullsafe" ->
      """SELECT l_orderkey, l_linenumber,
         (NULLIF(l_quantity, 17.0) IS NOT DISTINCT FROM
          NULLIF(l_quantity, 20.0) * 1.0) AS flag,
         (NULLIF(l_quantity, 17.0) IS NOT DISTINCT FROM
          NULLIF(l_quantity, 17.0)) AS null_eq_null
         FROM lineitem""",
    "e7_ne_nullsafe" ->
      """SELECT l_orderkey, l_linenumber,
         (NULLIF(l_quantity, 17.0) IS DISTINCT FROM
          NULLIF(l_quantity, 20.0) * 1.0) AS flag
         FROM lineitem""",
    "e8_add_nullprop" ->
      """SELECT l_orderkey, l_linenumber,
         NULLIF(l_quantity, 17.0) + l_extendedprice AS res FROM lineitem""",
    "e9_sub_nullprop" ->
      """SELECT l_orderkey, l_linenumber,
         l_quantity - NULLIF(l_discount, 0.0) AS res FROM lineitem""",
    "e10_mul_nullprop" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * NULLIF(l_tax, 0.0) AS res FROM lineitem""",
    "e11_div_double" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice / NULLIF(l_discount, 0.0) AS res FROM lineitem""",
    "e12_mod_pysign" ->
      """SELECT l_orderkey, l_linenumber,
         (((l_orderkey - 3000) % 7) + 7) % 7 AS mod_pos,
         (((l_orderkey - 3000) % -5) + -5) % -5 AS mod_neg
         FROM lineitem""",
    "e13_and_nonkleene" ->
      """SELECT l_orderkey, l_linenumber,
         CASE WHEN (NULLIF(l_quantity, 17.0) < 25.0) IS NULL
                OR (l_discount > 0.05) IS NULL THEN NULL
              ELSE (NULLIF(l_quantity, 17.0) < 25.0) AND (l_discount > 0.05)
         END AS flag
         FROM lineitem""",
    "e14_or_nonkleene" ->
      """SELECT l_orderkey, l_linenumber,
         CASE WHEN (NULLIF(l_quantity, 17.0) < 25.0) IS NULL
                OR (l_discount > 0.05) IS NULL THEN NULL
              ELSE (NULLIF(l_quantity, 17.0) < 25.0) OR (l_discount > 0.05)
         END AS flag
         FROM lineitem""",
    "e15_xor" ->
      """SELECT l_orderkey, l_linenumber,
         (NULLIF(l_quantity, 17.0) < 25.0) <> (l_discount > 0.05) AS flag
         FROM lineitem""",
    "e16_not" ->
      """SELECT l_orderkey, l_linenumber,
         NOT (NULLIF(l_quantity, 17.0) < 25.0) AS flag FROM lineitem""",
    "j1_left_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_acctbal, o_totalprice
         FROM orders LEFT JOIN customer ON o_custkey = c_custkey"""
  )
}
