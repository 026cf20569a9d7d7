package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warning-free rank / prefix-sum over SMALL frames — one row per
  * shuffle partition (P = parallelism), per language, or a post-limit
  * top-k: frames bounded by configuration or schema, never by data.
  *
  * The windowed form (`Window.partitionBy(lit(1))`) was the previous
  * idiom for these, but Spark 4's `EliminateWindowPartitions` folds a
  * constant partition spec into an EMPTY one, and the empty-spec
  * WindowExec logs the single-partition performance warning on every
  * run — indistinguishable in the logs from a genuine data-sized
  * window funnel. These helpers compute the same values with a
  * broadcast self-join on the strict ordering instead: O(k²) pairs for
  * k rows, trivial at the sizes these frames are bounded to, and the
  * plan carries no single-partition exchange at all.
  *
  * `order` lists (column, ascending) pairs forming a TOTAL order (last
  * column must be tie-free) — both helpers are exact only under a
  * total order, same as the row_number they replace. */
object SmallFrames {
  private val P = "__sf_"

  /** `b` strictly precedes `a` under the lexicographic order. */
  private def strictlyBefore(order: Seq[(String, Boolean)]): Column =
    order.foldRight(lit(false)) { case ((c, asc), tie) =>
      val l = col(P + c); val r = col(c)
      val strict = if (asc) l < r else l > r
      strict || (l === r && tie)
    }

  /** 1-based dense position in the total order (= row_number) as a
    * LONG column `out`: 1 + count of strictly-preceding rows. */
  def selfJoinRank(df: DataFrame, order: Seq[(String, Boolean)],
      out: String): DataFrame = {
    val right = df.select(order.map { case (c, _) =>
      col(c).as(P + c) }: _*)
    df.join(broadcast(right), strictlyBefore(order), "left")
      .groupBy(df.columns.map(col): _*)
      .agg((count(col(P + order.head._1)) + 1L).as(out))
  }

  /** EXCLUSIVE running sum of `value` in the total order, as `out`
    * (0 for the first row — the per-partition offset shape). */
  def selfJoinPrefixSum(df: DataFrame, order: Seq[(String, Boolean)],
      value: String, out: String): DataFrame = {
    val right = df.select((order.map(_._1) :+ value).distinct.map(c =>
      col(c).as(P + c)): _*)
    df.join(broadcast(right), strictlyBefore(order), "left")
      .groupBy(df.columns.map(col): _*)
      .agg(coalesce(sum(col(P + value)), lit(0L)).as(out))
  }
}
