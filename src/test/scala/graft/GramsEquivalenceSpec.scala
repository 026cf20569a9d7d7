package graft

import org.apache.spark.sql.functions._

/** Pins the r17 `graft_word_grams` codegen kernel to the composed
  * higher-order-function form it replaced: same strings, same counts,
  * same clamps, on real corpus text and on every edge shape the clamp
  * arithmetic has (empty array, shorter-than-n, exactly-n, null
  * elements, null array). The corpus/dedup gram pipelines and their
  * DuckDB oracles both assume the composed form's semantics. */
class GramsEquivalenceSpec extends SparkSpec {

  /** The pre-r17 composed form, verbatim. */
  private def hofGrams(toks: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  test("kernel equals the composed HOF form on real corpus text") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.operators.Corpus.toksOf(col("text")).as("tk"))
    for (n <- Seq(2, 5, 8)) {
      val diff = docs.select(col("doc_id"),
          graft.operators.Corpus.wordGrams(col("tk"), n).as("k"),
          hofGrams(col("tk"), n).as("h"))
        .filter(not(col("k") <=> col("h")))
        .count()
      assert(diff == 0, s"n=$n: $diff docs differ between kernel and HOF")
    }
  }

  test("edge shapes: empty, shorter-than-n, exactly-n, null elements, null array") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Seq.empty[String],                          // -> [""]
      Seq("a"),                                   // one short gram
      Seq("a", "b"),                              // len == n for n=2
      Seq("a", "b", "c", "d", "e"),               // len == n for n=5
      Seq("a", null, "c"),                        // null element skipped
      null                                        // null array -> null
    ).map(org.apache.spark.sql.Row(_))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tk",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = true),
        nullable = true)))
    val df = spark.createDataFrame(rows.asJava, schema)
    for (n <- Seq(1, 2, 5, 8)) {
      // Non-null arrays: element-for-element identity.
      val out = df.filter(col("tk").isNotNull).select(
          graft.operators.Corpus.wordGrams(col("tk"), n).as("k"),
          hofGrams(col("tk"), n).as("h"))
        .collect()
      out.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n: kernel=${r.get(0)} hof=${r.get(1)}")
      }
      // Null array: the composed form yields [""] (greatest() drops
      // the null size; concat_ws of a null slice is "") — the helper
      // coalesces null to the empty array so the kernel matches.
      val nullRows = df.filter(col("tk").isNull).select(
          graft.operators.Corpus.wordGrams(col("tk"), n).as("k"),
          hofGrams(col("tk"), n).as("h"))
        .collect()
      nullRows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n null array: kernel=${r.get(0)} hof=${r.get(1)}")
      }
    }
  }

  test("clamp arithmetic: gram counts match max(len-(n-1), 1)") {
    val df = spark.range(0, 12).select(
      transform(sequence(lit(1), col("id").cast("int")),
        i => concat(lit("t"), i.cast("string"))).as("tk"))
    val counts = df.select(size(col("tk")).as("len"),
        size(graft.operators.Corpus.wordGrams(col("tk"), 5)).as("g"))
      .collect()
    counts.foreach { r =>
      val len = r.getInt(0); val g = r.getInt(1)
      assert(g == math.max(len - 4, 1), s"len=$len grams=$g")
    }
  }
}
