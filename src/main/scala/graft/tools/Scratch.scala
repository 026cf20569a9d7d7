package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables
import graft.core.Par.fanout

/** Throwaway diagnostic runner (contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.functions.GraftExtensions
      .builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sim = fanout(Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        Dedup.simhashFromHashes(Dedup.tokenHashes(col("toks"))).as("simhash"))
    val pairs = Dedup.minhashPairsVerified(Tables.documents(spark, dir), 0.35)
      .filter(col("exact_jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .join(sim.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a")), "doc_a")
      .join(sim.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .orderBy(desc("hamming"))
    pairs.show(30, truncate = false)
    spark.stop()
  }
}
