package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-faithful expression algebra (SURVEY.md §1.4, §2.4).
  *
  * mini-pandas routes every binary op through `Series._execute`
  * (reference: data_frame.py:208-257) with one of two null policies:
  *
  *  - comparisons: any null input → `false` output, result column
  *    non-nullable (ReplaceOutputNoneHandler, data_frame.py:49-68);
  *  - arithmetic / boolean ops: any null input → null output
  *    (PropagateNoneHandler, data_frame.py:19-29). Boolean AND/OR
  *    short-circuit on null *inputs* before evaluating and are therefore
  *    NOT Kleene/SQL (verified: `None AND False → None` in the reference,
  *    where SQL gives FALSE).
  *
  * Every combinator below is a composition of built-in, codegen'd
  * `Column` functions — no custom Catalyst `Expression` is needed for
  * reference parity, so the whole algebra stays inside a single
  * WholeStageCodegen stage (the fused single-pass evaluation the
  * reference's comments wish for at data_frame.py:210-216).
  */
object RefSemantics {

  // ---- E1-E4: numeric comparisons (data_frame.py:272-282) -------------
  // null input → false, output non-nullable.
  def lt(a: Column, b: Column): Column = coalesce(a < b, lit(false))
  def le(a: Column, b: Column): Column = coalesce(a <= b, lit(false))
  def gt(a: Column, b: Column): Column = coalesce(a > b, lit(false))
  def ge(a: Column, b: Column): Column = coalesce(a >= b, lit(false))

  // ---- E6/E7: equality (data_frame.py:285-289) ------------------------
  // Null-safe: None == None → true, None == x → false (verified). This is
  // exactly Spark's `<=>`; `!=` is its negation. Non-nullable output.
  def eq(a: Column, b: Column): Column = a <=> b
  def ne(a: Column, b: Column): Column = !(a <=> b)

  // ---- E8-E11: arithmetic (data_frame.py:292-314) ---------------------
  // Null propagates; Spark's native `+ - * /` already match. Division
  // always yields Double — matches the reference's observed *values*
  // ([4]/[2] → [2.0]) even though it mislabels the dtype (SURVEY §2.4 E11).
  def add(a: Column, b: Column): Column = a + b
  def sub(a: Column, b: Column): Column = a - b
  def mul(a: Column, b: Column): Column = a * b
  def div(a: Column, b: Column): Column = a / b

  // ---- E12: modulo with Python sign semantics (data_frame.py:316-320) -
  // Python `%` takes the divisor's sign (-7 % 3 == 2); Spark/Java `%`
  // takes the dividend's (-1). `((a % b) + b) % b` is sign-correct for
  // either sign of divisor and propagates null natively.
  def pyMod(a: Column, b: Column): Column = ((a % b) + b) % b

  // ---- E13/E14: non-Kleene AND/OR (data_frame.py:323-333) -------------
  // The reference nulls the output whenever either *input* is null —
  // unlike SQL's Kleene logic where `null AND false = false`. Masks are
  // required non-nullable (§2.3), so on mask inputs this reduces to the
  // plain codegen'd `&&`/`||`.
  def and(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null)).otherwise(a && b)
  def or(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null)).otherwise(a || b)

  // ---- E15/E16: XOR / NOT (data_frame.py:335-344) ---------------------
  // Boolean XOR ≡ non-null-safe inequality (propagates null) — exact
  // match to the reference. NOT propagates null natively.
  def xor(a: Column, b: Column): Column = a =!= b
  def not(a: Column): Column = !a
}
