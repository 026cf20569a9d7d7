package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Par.fanout
import graft.sources.Tables

/** Deduplication operators for a training-data pipeline [EXT]
  * (SURVEY.md §2.6): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: signatures (minhash, simhash, shingle arrays) are
  * computed with higher-order array functions in a single pass over each
  * row — no explode, no shuffle, no UDF. The only shuffles are (a) the
  * LSH band-bucket groupBy, which carries one (band, bucket, doc_id)
  * triple per band per doc — 16 small rows per document, not the document
  * text — and (b) the candidate-pair self-join, which joins on bucket
  * keys whose cardinality grows with corpus size, keeping partitions
  * balanced. Pair verification only ever touches candidate pairs, never
  * the n² cross product. This is the standard web-scale near-dup
  * pipeline shape (MMDS ch.3): at 100 TB the heavy text column is
  * dropped right after signature computation. */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands // 4 → catches J >= ~0.5

  /** Whitespace tokens of a text column. Kept as its own projection step
    * so downstream shingling references a materialized array attribute —
    * inlining `split` into a lambda body would re-tokenize the document
    * once per lambda element (quadratic per doc; this exact shape was 58%
    * of round-1 bench time). */
  def tokens(textCol: Column): Column = split(textCol, "\\s+")

  /** Word 3-shingles from a token-array column. `toks` is referenced four
    * times, so CollapseProject keeps the split in its own projection. */
  def shinglesFromTokens(toks: Column): Column =
    transform(sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", element_at(toks, i),
        call_function("try_element_at", toks, i + 1),
        call_function("try_element_at", toks, i + 2)))

  /** Each distinct shingle hashed ONCE to a 64-bit long — the only place
    * full strings are hashed. */
  def shingleHashes(shingleCol: Column): Column =
    array_distinct(transform(shingleCol, s => xxhash64(s)))

  /** 64-hash MinHash signature from pre-hashed shingles, in a single
    * fold over the shingle array: sig[j] = min over h of xxhash64(h, j).
    * The 64 hash functions only ever rehash an 8-byte long — total cost
    * O(64·n_shingles) cheap hashes instead of O(64·n) string hashes. */
  def minhashSig(hashCol: Column): Column =
    aggregate(
      hashCol,
      array_repeat(lit(Long.MaxValue), NumHashes),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(NumHashes - 1)),
        (m, j) => least(m, xxhash64(h, j))))

  /** LSH band keys: hash of each 4-slice of the signature. */
  def bandKeys(sigCol: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => hash(slice(sigCol, b * RowsPerBand + lit(1), lit(RowsPerBand)), b))

  /** doc_id + minhash signature + band keys for a document table. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    fanout(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesFromTokens(col("toks")).as("sh"))
      .select(col("doc_id"), minhashSig(shingleHashes(col("sh"))).as("sig"))
      .select(col("doc_id"), col("sig"), bandKeys(col("sig")).as("bands"))

  /** Candidate near-dup pairs via LSH banding, verified by signature
    * agreement (estimated Jaccard = fraction of equal minhashes). */
  def minhashPairs(docs: DataFrame, minEstJaccard: Double): DataFrame = {
    val sigs = minhashSignatures(docs).cache()
    val buckets = sigs
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bucket")))
    val cands = buckets.as("l")
      .join(buckets.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / NumHashes)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Distinct word-3-shingle STRING sets per document — the exact-
    * verification side of the MinHash pipeline. Same shingle construction
    * as [[minhashSignatures]] pre-hashing, so |grams| agree; strings are
    * kept (not hashed) because exact set intersection over strings is
    * reproducible in the DuckDB oracle while xxhash64 is not. */
  def wordShingleSets(docs: DataFrame): DataFrame =
    fanout(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        array_distinct(shinglesFromTokens(col("toks"))).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("sz"))

  /** LSH candidate pairs annotated with EXACT word-shingle Jaccard — the
    * candidate-generate → exact-verify chain a production dedup run uses.
    * Verification cost is O(candidates), never O(n²): the string shingle
    * sets are attached only to pairs that already collided in an LSH
    * band. Exact Jaccard is integer-set math (|∩| / |∪| of distinct
    * string sets), so the DuckDB oracle reproduces it bit for bit. */
  def minhashPairsVerified(docs: DataFrame, minEst: Double): DataFrame = {
    val sh = wordShingleSets(docs)
    minhashPairs(docs, minEst)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("sz").as("sz_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("sz").as("sz_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        col("sz_a"), col("sz_b"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("exact_jaccard"))
  }

  /** 64-bit SimHash from pre-hashed tokens (bit i set iff the sum of ±1
    * votes from token-hash bit i is positive). Single fold over the hash
    * array carrying a 64-wide vote accumulator — each token is hashed
    * once, upstream, instead of 64 times inside the bit loop. */
  def simhashFromHashes(hashCol: Column): Column = {
    val votes = aggregate(
      hashCol,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (v, i) => v + when(call_function("getbit", h, i) === 1, 1)
          .otherwise(-1)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Token hashes for simhash: every token hashed once (dups kept —
    * simhash weights repeated tokens by construction). */
  def tokenHashes(toks: Column): Column =
    transform(toks, w => xxhash64(w))

  /** Pairs → clusters → survivors: the decision step a dedup pipeline
    * actually runs ("which rows do I keep"), downstream of any pair
    * generator (MinHash LSH, n-gram verify, embedding cosine).
    *
    * Connected components by iterative min-label propagation: every doc
    * starts labeled with its own id; each round every node takes the min
    * of its label and its neighbors' labels, until a fixpoint. Each
    * round is one distributed join + aggregate — no driver-side graph —
    * and `localCheckpoint` truncates the growing lineage so round k
    * doesn't recompute rounds 1..k-1. Converges in graph-diameter
    * rounds; near-dup clusters are dense (diameter 2–3 in practice), and
    * the iteration cap bounds the worst case. At extreme scale swap the
    * propagation step for the large-star/small-star contraction of
    * Kiveris et al. (Connected Components in MapReduce, SoCC'14) — the
    * O(log n)-round version of this exact loop shape.
    *
    * @param docs  (doc_id) universe — isolated docs form their own cluster
    * @param pairs (doc_a, doc_b) undirected near-dup edges
    * @return (doc_id, keep_id, is_survivor): keep_id = min doc_id of the
    *         cluster; survivor = the kept copy. */
  def resolveClusters(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val e = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // Iterate ONLY over edge-touched nodes: isolated docs (the vast
    // majority after near-dup pair generation) can never change label,
    // so keeping them in the loop would shuffle the whole corpus every
    // round for nothing. They rejoin as their own cluster at the end.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("new_label"),
          (col("nbr_min") < col("label")).as("did_change"))
        .localCheckpoint()
      changed = updated.filter(col("did_change")).count()
      labels = updated.select(col("id"), col("new_label").as("label"))
      iter += 1
    }
    docs.select(col("doc_id"))
      .join(labels, docs("doc_id") === labels("id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("keep_id"))
      .withColumn("is_survivor", col("doc_id") === col("keep_id"))
  }

  val queries: Map[String, Q] = Map(
    // Exact dedup: hash-aggregate on the full text. At scale group on
    // xxhash64(text) first, verify within groups; here text is the key.
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), length(col("text"))
          .as("text_len"))),

    // MinHash + LSH near-dup pairs (est. Jaccard >= 0.5). The fixtures
    // contain planted near-dups at J ≈ 0.98 — all are caught.
    "dedup_minhash_lsh" -> ((s, d) =>
      minhashPairs(Tables.documents(s, d), 0.5)
        .select(col("doc_a"), col("doc_b"),
          (col("est_jaccard") >= 0.9).as("high_confidence"))),

    // SimHash per document + banded 16-bit keys for hamming bucketing
    // (pigeonhole: any pair at hamming distance <= 3 shares a band key)
    "dedup_simhash" -> ((s, d) =>
      fanout(Tables.documents(s, d).select(col("doc_id"), col("text")))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          simhashFromHashes(tokenHashes(col("toks"))).as("simhash"))
        // The band array is the blocking structure; the checked output
        // carries it as a CSV string because the driver's pandas hasher
        // can't sort raw list columns (this row was `err` in round 2).
        .select(col("doc_id"), col("simhash"),
          expr("""array_join(transform(sequence(0, 3),
                    b -> cast(shiftright(simhash, b * 16) & 65535L
                              as string)), ',')""")
            .as("hamming_bands_csv"))),

    // Exact n-gram (character 5-gram) Jaccard inside blocking groups —
    // the verify step of a dedup pipeline, DuckDB-checkable end to end.
    "dedup_ngram_jaccard" -> ((s, d) => ngramJaccardPairs(s, d)),

    // The end-to-end dedup DECISION: exact-Jaccard pairs → connected
    // components → per-document (keep_id, is_survivor). Oracle: DuckDB
    // recursive CTE computing min reachable id over the same edge set.
    "dedup_resolve_clusters" -> ((s, d) =>
      resolveClusters(
        Tables.documents(s, d).select(col("doc_id")),
        ngramJaccardPairs(s, d).select(col("doc_a"), col("doc_b"))))
  )

  /** Shared by dedup_ngram_jaccard (pair inventory) and
    * dedup_resolve_clusters (edge set): character-5-gram Jaccard > 0.5
    * within (lang, length-bucket) blocks. */
  private def ngramJaccardPairs(s: SparkSession, d: String): DataFrame = {
      val grams = expr(
        """array_distinct(transform(
             sequence(1, greatest(length(text) - 4, 1)),
             i -> substring(text, i, 5)))""")
      // Two-phase shape (candidate generation → verification), same as a
      // cluster-scale run: phase 1 joins only (id, block key, gram count)
      // — no gram payloads — so the optimizer can't hoist the expensive
      // set-intersection into that join's condition (measured 8× blowup
      // when the Jaccard predicate lands first in a one-join plan).
      // Phase 2 attaches gram-hash arrays to surviving pairs and
      // intersects longs, not strings (set cardinalities preserved;
      // 64-bit collisions within a ~1k-gram pair: P ≈ 3e-14).
      // Size prefilter is lossless: J = |∩|/|∪| ≤ min(|A|,|B|)/max(|A|,|B|),
      // so J > 0.5 forces the gram counts within 2× of each other.
      val sigs = fanout(Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("lang"), col("n_chars")))
        .select(col("doc_id"), col("lang"),
          floor(col("n_chars") / lit(100)).cast("int").as("len_bucket"),
          transform(grams, gm => xxhash64(gm)).as("grams"))
        .select(col("doc_id"), col("lang"), col("len_bucket"), col("grams"),
          size(col("grams")).as("sz"))
      val ids = sigs.select(col("doc_id"), col("lang"), col("len_bucket"),
        col("sz"))
      val cands = ids.as("l").join(ids.as("r"),
          col("l.lang") === col("r.lang") &&
            col("l.len_bucket") === col("r.len_bucket") &&
            col("l.doc_id") < col("r.doc_id") &&
            col("l.sz") <= col("r.sz") * 2 &&
            col("r.sz") <= col("l.sz") * 2)
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      val g = sigs.select(col("doc_id"), col("grams"), col("sz"))
      cands
        .join(g.select(col("doc_id").as("doc_a"), col("grams").as("ga"),
          col("sz").as("lsz")), "doc_a")
        .join(g.select(col("doc_id").as("doc_b"), col("grams").as("gb"),
          col("sz").as("rsz")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ga"), col("gb"))).as("inter_size"),
          col("lsz"), col("rsz"))
        // algebraic form of J > 0.5: |∩|/(|A|+|B|-|∩|) > 1/2 ⟺ 3|∩| > |A|+|B|.
        // The predicate gets pushed into the attach-join condition; this
        // form references array_intersect ONCE there (the ratio form
        // inlines it twice — numerator and denominator), halving the
        // dominant per-pair cost. Survivors recompute it in the project.
        .filter(col("inter_size") * 3 > col("lsz") + col("rsz"))
        .select(col("doc_a"), col("doc_b"), col("inter_size"),
          (col("lsz") + col("rsz") - col("inter_size")).as("union_size"))
        .select(col("doc_a"), col("doc_b"), col("inter_size"), col("union_size"),
          (col("inter_size").cast("double") / col("union_size")).as("jaccard"))
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
         CAST(COUNT(*) AS BIGINT) AS n_copies,
         CAST(LENGTH(text) AS INTEGER) AS text_len
         FROM documents GROUP BY text""",
    // dedup_minhash_lsh / dedup_simhash: xxhash64-based signatures have
    // no DuckDB equivalent → driver records the rows-only check; exact
    // recall against true Jaccard is asserted in DedupSpec instead.
    "dedup_ngram_jaccard" ->
      """WITH g AS (
           SELECT doc_id, lang,
             CAST(FLOOR(n_chars / 100) AS INTEGER) AS len_bucket,
             list_distinct(list_transform(
               range(1, GREATEST(LENGTH(text) - 4, 1) + 1),
               i -> substr(text, CAST(i AS INTEGER), 5))) AS grams
           FROM documents),
         p AS (
           SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
             CAST(LEN(list_intersect(l.grams, r.grams)) AS INTEGER) AS inter_size,
             CAST(LEN(l.grams) + LEN(r.grams)
               - LEN(list_intersect(l.grams, r.grams)) AS INTEGER) AS union_size
           FROM g l JOIN g r
             ON l.lang = r.lang AND l.len_bucket = r.len_bucket
            AND l.doc_id < r.doc_id)
         SELECT doc_a, doc_b, inter_size, union_size,
           CAST(inter_size AS DOUBLE) / union_size AS jaccard
         FROM p
         WHERE CAST(inter_size AS DOUBLE) / union_size > 0.5""",
    // Same edge set as dedup_ngram_jaccard, then min-reachable-id per
    // document via a recursive transitive closure (UNION dedups → the
    // closure terminates on the finite node set).
    "dedup_resolve_clusters" ->
      """WITH RECURSIVE
         g AS (
           SELECT doc_id, lang,
             CAST(FLOOR(n_chars / 100) AS INTEGER) AS len_bucket,
             list_distinct(list_transform(
               range(1, GREATEST(LENGTH(text) - 4, 1) + 1),
               i -> substr(text, CAST(i AS INTEGER), 5))) AS grams
           FROM documents),
         p AS (
           SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
           FROM g l JOIN g r
             ON l.lang = r.lang AND l.len_bucket = r.len_bucket
            AND l.doc_id < r.doc_id
           WHERE CAST(LEN(list_intersect(l.grams, r.grams)) AS DOUBLE)
             / (LEN(l.grams) + LEN(r.grams)
                - LEN(list_intersect(l.grams, r.grams))) > 0.5),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         reach AS (
           SELECT doc_id AS id, doc_id AS r FROM documents
           UNION
           SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src)
         SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS keep_id,
           (MIN(r) = id) AS is_survivor
         FROM reach GROUP BY id"""
  )
}
