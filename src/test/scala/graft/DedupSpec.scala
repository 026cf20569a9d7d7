package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** MinHash/SimHash correctness that the DuckDB oracle can't express
  * (xxhash64 signatures): recall against exact Jaccard, determinism,
  * and hamming-band pigeonhole guarantees. */
class DedupSpec extends SparkSpec {

  test("spanHash=true (8-byte shuffled span keys, the 100 TB shape) " +
      "returns the exact same rows as the default string keys") {
    val q = Dedup.queries("dedup_substring_spans")
    val exact = q(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    spark.conf.set("spark.graft.dedup.spanHash", "true")
    try {
      val hashed = q(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(hashed.toSeq == exact.toSeq,
        "xxhash64 span keys must be row-identical at test SF")
      assert(exact.nonEmpty, "fixture must contain shared spans")
    } finally spark.conf.unset("spark.graft.dedup.spanHash")
  }

  test("exactHash=true (8-byte group keys, the 100 TB shape) returns " +
      "the exact same rows as grouping on the full text") {
    val q = Dedup.queries("dedup_exact")
    def rows() = q(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val exact = rows()
    spark.conf.set("spark.graft.dedup.exactHash", "true")
    try {
      assert(rows().toSeq == exact.toSeq,
        "xxhash64 group keys must be row-identical at test SF")
      assert(exact.nonEmpty)
    } finally spark.conf.unset("spark.graft.dedup.exactHash")
  }

  test("minhash estimate tracks exact shingle Jaccard on planted dups") {
    val docs = Tables.documents(spark, sf0001)
    // exact word-3-shingle Jaccard for all pairs sharing a planted dup
    val sh = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(Dedup.shinglesFromTokens(col("toks"))).as("sh"))
    val exact = sh.as("l").join(sh.as("r"), col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        (size(array_intersect(col("l.sh"), col("r.sh"))).cast("double") /
          size(array_union(col("l.sh"), col("r.sh")))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = Dedup.minhashPairs(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // every true high-Jaccard pair must be caught (recall = 1 on J>=0.8
    // with 16 bands × 4 rows: P[miss] = (1-J^4)^16 < 1e-4 at J=0.8)
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(exact.subsetOf(found),
      s"missed pairs: ${exact.diff(found)}")
  }

  test("minhash signature is deterministic across runs") {
    val docs = Tables.documents(spark, sf0001).limit(20)
    val a = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("simhash: near-identical docs land within hamming distance 3") {
    val docs = Tables.documents(spark, sf0001)
    val sims = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        Dedup.simhashFromHashes(Dedup.tokenHashes(col("toks"))).as("sh"))
    // pairs that exact-text-duplicate each other must have simhash
    // distance small enough to share a 16-bit band
    val dupPairs = docs.as("l").join(docs.as("r"),
        col("l.text") === col("r.text") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
    val withSh = dupPairs
      .join(sims.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sha"), "a")
      .join(sims.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "shb"), "b")
      .select(bit_count(col("sha").bitwiseXOR(col("shb"))).as("dist"))
      .collect()
    withSh.foreach(r => assert(r.getInt(0) == 0,
      "exact dups must have identical simhash"))
  }

  test("graft_minhash kernel is bit-identical to the composed fold") {
    val sh = Dedup.wordShingleSets(Tables.documents(spark, sf0001))
    val both = sh.select(
      Dedup.minhashSig(transform(col("sh"), s => xxhash64(s)))
        .as("composed"),
      call_function("graft_minhash",
        transform(col("sh"), s => xxhash64(s))).as("kernel"))
    assert(both.count() > 0)
    assert(both.filter(col("composed") =!= col("kernel")).isEmpty,
      "fused kernel must reproduce the composed fold exactly")
  }
}
