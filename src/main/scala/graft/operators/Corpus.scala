package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Training-corpus pipeline operators [EXT]: the steps between "raw
  * documents" and "training batches" that a large-scale LLM data
  * pipeline runs after dedup — deterministic splits, test-set
  * decontamination, vocabulary stats, chunking, token-budget packing,
  * PII redaction, and per-class embedding centroids.
  *
  * Everything here is deterministic and ANSI-SQL-expressible, so every
  * query is oracle-checked end to end (no rows-only entries). The split
  * hash is a 31-bit LCG step on doc_id rather than xxhash64 purely so
  * the DuckDB oracle can recompute it; a production run would swap in
  * `xxhash64(doc_id)` — same shape, same distribution contract.
  *
  * Scale notes per operator are on each query; the common theme: token
  * and gram explosion happens AFTER filters, aggregates use map-side
  * partial combine, global top-k goes through TakeOrderedAndProject
  * (never a no-partition window), and per-group running sums window on
  * the group key. */
object Corpus {
  type Q = (SparkSession, String) => DataFrame

  // 31-bit LCG (Knuth/glibc constants) — deterministic, oracle-twinnable.
  // Shared by every query that needs a recomputable pseudo-random draw
  // (split assignment, stratified sampling, contrastive negatives) —
  // one definition so Spark code and oracle SQL cannot drift apart.
  val A = 1103515245L
  val C = 12345L
  val M = 2147483648L

  /** Deterministic split bucket in [0, 100). The id is reduced mod M
    * BEFORE the multiply: id * A overflows Long for id >= ~8.4e9 — an
    * id range a 100 TB corpus actually reaches (found by the 16x
    * amplification probe, which crashed with ARITHMETIC_OVERFLOW).
    * (id % M) < 2^31 keeps the product under 2^62; the result is
    * identical for every id by modular arithmetic. */
  def splitBucket(id: Column): Column = (((id % M) * A + C) % M) % 100

  /** Full-range LCG draw in [0, M) — same overflow-safe shape. */
  def lcgDraw(id: Column): Column = ((id % M) * A + C) % M

  /** train/valid/test assignment: 80/10/10 by hash bucket. */
  def withSplit(docs: DataFrame): DataFrame =
    docs.withColumn("bucket", splitBucket(col("doc_id")).cast("int"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))

  /** Whitespace tokens with empties dropped (leading/trailing space). */
  def toksOf(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Overlapping word n-grams joined with single spaces. Short docs
    * (< n tokens) yield one truncated gram — same clamping as DuckDB
    * list slicing, so the oracle twin matches. */
  def wordGrams(toks: Column, n: Int): Column =
    // r17: the codegen kernel replacing the interpreted HOF chain
    // transform(sequence(1, greatest(size-n+1, 1)),
    //   i => concat_ws(" ", slice(toks, i, n))) — bit-identical output
    // (GramsEquivalenceSpec pins the property), one fused loop per doc
    // instead of four nested closures per gram. The gram explosion is
    // the per-task hot loop of every gram pipeline (guide §1.2 step 2).
    // coalesce: the composed form yields [""] for a NULL token array
    // (greatest() drops the null size, the lambda's concat_ws of a
    // null slice is "") — same as for an empty array. The kernel is
    // null-intolerant, so feed it the empty array instead.
    call_function("graft_word_grams",
      coalesce(toks, array().cast("array<string>")), lit(n))

  private val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+"
  private val phonePat = "[0-9]{3}-[0-9]{4}"

  // distinct-train-gram NDV for the decontamination bloom, once per
  // session+fixture (floored at 100k so tiny fixtures keep a roomy
  // sketch)
  private val decontTrainGrams =
    new scala.collection.concurrent.TrieMap[String, Long]()

  // the built decontamination bloom BYTES, once per fixture: the
  // sketch is the ingest-maintained index of this shape (a pipeline
  // folds new train docs into it incrementally), so repeat queries
  // ship the cached bytes as a literal instead of re-aggregating the
  // whole train gram set per execution
  private val decontBloom =
    new scala.collection.concurrent.TrieMap[String, Array[Byte]]()

  /** Cache key for the decontamination bloom/NDV: the fixture's FILE
    * FINGERPRINT, not its path — a fixture regenerated in place within
    * one process must rebuild the sketch, because a stale bloom's
    * false NEGATIVES would prune genuinely-contaminated grams before
    * the exact join (unlike its harmless false positives). Same
    * staleness axis as the persisted-artifact envelope. */
  private def decontKey(d: String): String =
    graft.core.ArtifactCache.fixtureTag(d)

  /** doc-tagged overlapping-bigram explode over a tokenized frame
    * (`tk` column) — ONE definition for the LM and DSIR model builds,
    * so the bigram shape their oracle-checked scores depend on cannot
    * drift between the two (same rationale as the shared LCG). Carries
    * the requested columns through the explode. */
  private def bigramsOf(tk: DataFrame, carry: Seq[String]): DataFrame =
    tk.filter(size(col("tk")) >= 2)
      .select(carry.map(col) :+ explode(
        transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("t1"),
            element_at(col("tk"), i + 1).as("t2")))).as("bg"): _*)
      .select(carry.map(col) :+ col("bg.t1").as("t1") :+
        col("bg.t2").as("t2"): _*)

  /** Distinct split-tagged word-5-grams of every document — the shared
    * relation of BOTH decontamination queries, materialized once per
    * session+fixture (the ingest-time-artifact convention, like the
    * dedup shingles — one definition so the two queries cannot build
    * different gram shapes). Zero-token documents are dropped BEFORE
    * the gram explosion: the short-doc clamp in [[wordGrams]] would
    * otherwise emit one EMPTY-STRING gram for them, and an empty test
    * doc would read as "contaminated" by an empty train doc — a
    * content-free match. The oracles carry the same LEN(tk) >= 1
    * guard. Tokens materialize behind an exchange (Par.fanout) so
    * CollapseProject cannot inline the split+filter into the gram
    * lambda (one full tokenization per gram index per row, measured
    * 8x at sf0.1). */
  private def splitGrams(s: SparkSession, d: String): DataFrame =
    graft.core.ArtifactCache.persisted(s, d, "corpus_split_grams", "v1") {
      graft.core.Par.fanout(
          withSplit(Tables.documents(s, d))
            .select(col("doc_id"), col("split"),
              toksOf(col("text")).as("tk")))
        .filter(size(col("tk")) >= 1)
        .select(col("doc_id"), col("split"),
          explode(array_distinct(wordGrams(col("tk"), 5))).as("gram"))
    }

  /** Bigram language-model scoring (the CCNet-style perplexity quality
    * signal), shared by corpus_lm_score and corpus_ccnet_buckets —
    * materialized ONCE per fixture through [[graft.core.ArtifactCache]]
    * (the ingest-time-artifact convention; previously each query
    * retrained the model from scratch, VERDICT r8 regression #2): train
    * add-1-smoothed bigram statistics on the corpus itself and score
    * every document by its average negative log-probability. Counts are
    * three partial-combined aggregates over ONE bigram explode; the
    * model joins back by (t1, t2) and t1 — dictionary-sized relations,
    * shuffled on the gram keys, the corpus never re-scans. Determinism:
    * every ln argument is an exact integer-valued double, and the
    * per-doc average is compared under the gate's 1e-6 tolerance (fp
    * summation order may differ). */
  private def lmScored(s: SparkSession, d: String): DataFrame =
    graft.core.ArtifactCache.persisted(s, d, "corpus_lm_scored", "v1") {
      lmScoredBuild(s, d)
    }

  private def lmScoredBuild(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint (r16): tk feeds the vocab aggregate AND the
    // bigram explode, and `bigrams` is consumed three times (cb, cu,
    // join probe) — without a materialization the corpus re-tokenized
    // once per consumer (the exchanges don't canonicalize equal once
    // per-branch pruning differs). Checkpoint the token arrays once;
    // the downstream explodes are cheap array scans over it.
    // Cluster caveat (ADVICE r16), once for every localCheckpoint in
    // this file: checkpointed blocks are non-replicated executor-local
    // state, so on a real cluster an executor loss (or dynamic-
    // allocation decommission) invalidates the truncated lineage and
    // fails the job — a deployment that cannot re-run the build swaps
    // these for reliable checkpoint() or a persisted table. Local-mode
    // benching and the per-fixture artifact wrapper are unaffected.
    val tk = graft.core.Par.fanout(Tables.documents(s, d)
      .select(col("doc_id"), toksOf(col("text")).as("tk")))
      .localCheckpoint()
    val vocab = tk.select(explode(col("tk")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val bigrams = bigramsOf(tk, Seq("doc_id"))
    val cb = bigrams.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("cb"))
    val cu = bigrams.groupBy(col("t1")).agg(count(lit(1)).as("cu"))
    bigrams.join(cb, Seq("t1", "t2")).join(cu, Seq("t1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (log((col("cu") + col("v")).cast("double"))
          - log(col("cb") + 1.0)).as("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("nll")).as("avg_nll"))
  }

  /** Materialize the shared corpus model artifacts (split grams, the
    * bigram LM scores, the DSIR scores) for `d` — the bench drive's
    * build phase calls this directly instead of executing one full
    * query per model chain. */
  def warmArtifacts(s: SparkSession, d: String): Unit = {
    splitGrams(s, d); lmScored(s, d); dsirScored(s, d)
    ()
  }

  /** DSIR scoring (Xie et al. 2023), shared by corpus_dsir_weights and
    * corpus_dsir_resample — materialized ONCE per fixture through
    * [[graft.core.ArtifactCache]] like the LM model above (the
    * four-model chain was the board's most expensive non-graph
    * rebuild): per document, the average bigram
    * log-likelihood ratio of the target distribution (the English
    * subset) vs the raw corpus, both add-1 smoothed. One bigram explode
    * feeds all four count models (raw / target × bigram /
    * unigram-context); the dictionary-sized models join back on gram
    * keys — the corpus never re-scans. */
  private def dsirScored(s: SparkSession, d: String): DataFrame =
    graft.core.ArtifactCache.persisted(s, d, "corpus_dsir_scored", "v1") {
      dsirScoredBuild(s, d)
    }

  private def dsirScoredBuild(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint (r16): same rationale as lmScoredBuild — tk
    // feeds four count models plus the join probe; tokenize once.
    val tk = graft.core.Par.fanout(Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), toksOf(col("text")).as("tk")))
      .localCheckpoint()
    val bigrams = bigramsOf(tk, Seq("doc_id", "lang"))
    val tgt = bigrams.filter(col("lang") === "en")
    val cbR = bigrams.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("cbr"))
    val cuR = bigrams.groupBy(col("t1")).agg(count(lit(1)).as("cur"))
    val cbT = tgt.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("cbt"))
    val cuT = tgt.groupBy(col("t1")).agg(count(lit(1)).as("cut"))
    val vR = tk.select(explode(col("tk")).as("tok"))
      .agg(countDistinct(col("tok")).as("vr"))
    val vT = tk.filter(col("lang") === "en")
      .select(explode(col("tk")).as("tok"))
      .agg(countDistinct(col("tok")).as("vt"))
    bigrams
      .join(cbR, Seq("t1", "t2")).join(cuR, Seq("t1"))
      .join(cbT, Seq("t1", "t2"), "left").join(cuT, Seq("t1"), "left")
      .crossJoin(broadcast(vR)).crossJoin(broadcast(vT))
      .select(col("doc_id"),
        ((log(coalesce(col("cbt"), lit(0L)) + 1.0)
          - log((coalesce(col("cut"), lit(0L)) + col("vt"))
              .cast("double")))
         - (log(col("cbr") + 1.0)
          - log((col("cur") + col("vr")).cast("double")))).as("lr"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("lr")).as("avg_log_ratio"))
  }

  /** Distributed BPE merge training (Sennrich et al. 2016): learn
    * `nMerges` merges over the corpus word-frequency table. Each
    * iteration aggregates adjacent-pair counts from the CURRENT symbol
    * sequences (vocab-sized, never corpus-sized: the corpus collapses
    * to word frequencies once, up front), takes the (count desc, pair
    * asc) argmax — the convergence-style bounded driver read, a 1-row
    * aggregate per iteration like dedup_resolve_clusters — and applies
    * the merge with a left fold that replaces the accumulator's tail
    * when it completes the pair, which is exactly the greedy
    * left-to-right scan (BpeTrainSpec pins the equivalence against an
    * in-memory reference trainer). Returns the learned merge list and
    * the final per-word symbol sequences. */
  def bpeTrain(s: SparkSession, d: String,
      nMerges: Int): (Seq[(String, String)], DataFrame) = {
    var words = Tables.documents(s, d)
      .select(explode(toksOf(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        regexp_extract_all(col("w"), lit("."), lit(0)).as("syms"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      // truncate lineage each round (stays distributed — the vocab
      // never visits the driver): the plan would otherwise nest one
      // fold per learned merge (fine at 8, quadratic at 50k)
      words = words.localCheckpoint()
      // size >= 2: sequence(1, 0) DESCENDS in Spark (step defaults to
      // -1), so a fully-merged single-symbol word must not explode
      val top = words.filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            j => struct(element_at(col("syms"), j).as("a"),
              element_at(col("syms"), j + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (pa, pb) = (top(0).getString(0), top(0).getString(1))
        merges += ((pa, pb))
        words = words.withColumn("syms",
          aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, sym) => when(
              size(acc) > 0 &&
                element_at(acc, -1) === lit(pa) && sym === lit(pb),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(lit(pa + pb))))
              .otherwise(concat(acc, array(sym)))))
      }
      i += 1
    }
    (merges.toSeq, words)
  }

  val queries: Map[String, Q] = Map(
    // Deterministic train/valid/test assignment. Pure projection — no
    // shuffle, no state; the split of any document is recomputable by
    // any worker (the property that makes hash splits the standard over
    // random ones at scale).
    "corpus_split_assign" -> ((s, d) =>
      withSplit(Tables.documents(s, d))
        .select(col("doc_id"), col("bucket"), col("split"))),

    // Test-set decontamination: which held-out docs share a word-5-gram
    // with any training doc. Scale shape: explode grams (after the
    // split filter), distinct the train side (map-side combine), then a
    // shuffle join ON THE GRAM — both sides hash-partition by gram, so
    // no broadcast of a corpus-sized set; count per test doc is a
    // partial-aggregated groupBy.
    "corpus_decontaminate" -> ((s, d) => {
      val grams = splitGrams(s, d)
      val train = grams.filter(col("split") === "train")
        .select(col("gram")).distinct()
      grams.filter(col("split") === "test")
        .select(col("doc_id"), col("gram"))
        .join(train, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // Decontamination with a BLOOM PRE-FILTER — the shape that wins at
    // 100 TB: the train-gram set is summarized into one ~100 KB sketch
    // (graft_bloom_agg, Spark's internal BloomFilterAggregate exposed
    // through the session extensions) and broadcast into the test-side
    // scan, so the overwhelmingly-clean test grams die BEFORE the
    // exact shuffle join instead of hash-partitioning a corpus of
    // grams. False positives are harmless — the exact gram join still
    // verifies — so the final rows equal plain corpus_decontaminate
    // and the oracle is the identical SQL. (Spark's own runtime
    // filters inject this pattern adaptively; the explicit form
    // documents and pins it.)
    "corpus_decontaminate_bloom" -> ((s, d) => {
      val grams = splitGrams(s, d)
      // The sketch is sized from the ACTUAL distinct-train-gram count
      // (~10 bits/item, ~1% fpp), not a constant: the old fixed
      // 100k-item/800k-bit sketch was already 2x over capacity at
      // sf0.1 (~190k distinct train grams — fp rate in the tens of
      // percent) and would saturate to fpp~1 at the 100 TB scale this
      // shape exists for, silently degrading the prefilter into pure
      // probe overhead. One approx-distinct job per session over the
      // checkpointed gram artifact.
      val nTrain = decontTrainGrams.getOrElseUpdate(decontKey(d),
        math.max(100000L, grams.filter(col("split") === "train")
          .agg(expr("approx_count_distinct(gram)")).head.getLong(0)))
      // The sketch ships into every task as a BINARY LITERAL — the
      // broadcast shape BloomFilterMightContain wants — built ONCE per
      // fixture and cached driver-side (an ingest pipeline folds new
      // train docs into the sketch incrementally; repeat queries must
      // not re-aggregate the whole train gram set).
      val bf = decontBloom.getOrElseUpdate(decontKey(d),
        grams.filter(col("split") === "train")
          .select(col("gram")).distinct()
          .agg(call_function("graft_bloom_agg",
            xxhash64(col("gram")), lit(nTrain), lit(nTrain * 10L)))
          .head.getAs[Array[Byte]](0))
      val train = grams.filter(col("split") === "train")
        .select(col("gram")).distinct()
      // Join strategy left to Catalyst (r17 session 2 A/B): a
      // shuffle_merge hint on the exact-verification join measured
      // neutral-to-worse same-JVM interleaved (SMJ 0.72–1.71 s vs the
      // planned broadcast 0.77–0.87); the broadcast side here is the
      // bloom-SURVIVOR gram set — bounded by the true contamination
      // plus the sketch's ~1% fp of test grams, not by corpus size.
      grams.filter(col("split") === "test")
        .filter(call_function("graft_might_contain",
          lit(bf), xxhash64(col("gram"))))
        .select(col("doc_id"), col("gram"))
        .join(train, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // Vocabulary top-k: token explode -> partial-combined count ->
    // TakeOrderedAndProject top-20 (the distributed top-k physical op —
    // NOT a no-partition window over the whole vocabulary). The rank is
    // attached afterwards over the 20 surviving rows only.
    "corpus_vocab_topk" -> ((s, d) => {
      val top = Tables.documents(s, d)
        .select(explode(toksOf(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20)
      graft.core.SmallFrames.selfJoinRank(top,
          Seq("cnt" -> false, "token" -> true), "rnk0")
        .select(col("token"), col("cnt"),
          col("rnk0").cast("int").as("rnk"))
    }),

    // Bigram language-model scoring (the CCNet-style perplexity
    // quality signal): train add-1-smoothed bigram statistics on the
    // corpus itself and score every document by its average negative
    // log-probability. Counts are three partial-combined aggregates
    // over ONE bigram explode; the model joins back by (t1, t2) and
    // t1 — dictionary-sized relations, shuffled on the gram keys, the
    // corpus never re-scans. Determinism: every ln argument is an
    // exact integer-valued double, and the per-doc average is compared
    // under the gate's 1e-6 tolerance (fp summation order may differ).
    "corpus_lm_score" -> ((s, d) => lmScored(s, d)),

    // UniMax budget allocation (Chung et al. 2023): distribute a total
    // token budget over languages with an epoch cap — small languages
    // are fully consumed up to E epochs, the remainder waterfills
    // equally over the large ones. The classic iterative waterfilling
    // has a CLOSED FORM once capacities sort ascending: lang i is
    // capped iff capacity_i · (langs remaining incl. i) ≤ budget −
    // prefix_{i−1}, all BIGINT (multiply, never divide → exact), and
    // uncapped langs share floor((B − capped_sum) / uncapped_count).
    // Windows partition on a constant over the LANGUAGE table — 5 rows
    // here, countable-on-one-hand at any corpus scale — the corpus
    // itself contributes one token-count aggregate. Budget = half the
    // corpus tokens, E = 2.
    "corpus_unimax_alloc" -> ((s, d) => {
      val E = 2
      val perLang = Tables.documents(s, d)
        .select(col("lang"),
          size(toksOf(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("lang")).agg(sum(col("n_tok")).as("s_tokens"))
        .withColumn("capacity", col("s_tokens") * E)
      val budget = perLang.agg(
        // integer div, NOT IEEE /: past 2^53 total tokens the double
        // quotient drops low bits and the capped boundary flips vs
        // the oracle's exact // — the "multiply, never divide" BIGINT
        // contract above applies to the divisions too
        expr("sum(s_tokens) div 2").as("b"),
        count(lit(1)).as("n"))
      // ascending-capacity position + exclusive capacity prefix over
      // the 5-row language table, via the warning-free self-join form
      // (SmallFrames) instead of constant-partition windows
      val ord = Seq("capacity" -> true, "lang" -> true)
      val positioned = graft.core.SmallFrames.selfJoinPrefixSum(
        graft.core.SmallFrames.selfJoinRank(perLang, ord, "i"),
        ord, "capacity", "prefix_excl")
      val ranked = positioned.crossJoin(broadcast(budget))
        .withColumn("capped",
          col("capacity") * (col("n") - col("i") + 1) <=
            col("b") - col("prefix_excl"))
      val caps = ranked.agg(
        sum(when(col("capped"), 1L).otherwise(0L)).as("k"),
        sum(when(col("capped"), col("capacity")).otherwise(0L))
          .as("capped_sum"))
      ranked.crossJoin(broadcast(caps))
        .withColumn("alloc",
          when(col("capped"), col("capacity"))
            .otherwise(expr("(b - capped_sum) div (n - k)")))
        .select(col("lang"), col("s_tokens"), col("capacity"),
          col("capped"), col("alloc"),
          (col("alloc").cast("double") / col("s_tokens")).as("epochs"))
    }),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling"): every document is
    // scored by how much more likely its bigrams are under a TARGET
    // distribution (here the English subset — in production, the
    // high-quality domain you want more of) than under the RAW corpus:
    // avg over bigrams of log p_target(b) − log p_raw(b), both add-1
    // smoothed. One bigram explode feeds all four count models (raw /
    // target × bigram / unigram-context); the models are
    // dictionary-sized and join back on gram keys, the corpus never
    // re-scans — the same scale shape as the CCNet scorer. The keep
    // flag thresholds the 6-dp-rounded average so the boolean can't
    // flip on cross-engine fp summation order.
    "corpus_dsir_weights" -> ((s, d) => dsirScored(s, d)
      .withColumn("dsir_keep", round(col("avg_log_ratio"), 6) > 0)),

    // The RESAMPLING half of DSIR: accept each document with
    // probability sigmoid(avg_log_ratio) — documents that look more
    // like the target than the raw corpus survive more often. The
    // accept draw is the deterministic LCG already used for splits
    // (any worker recomputes membership), and the probability is
    // quantized to an exact integer in [0, 1e6] before the compare so
    // cross-engine libm noise in exp() cannot flip an acceptance.
    "corpus_dsir_resample" -> ((s, d) => {
      val p = round(lit(1.0) /
        (lit(1.0) + exp(-col("avg_log_ratio"))), 6)
      dsirScored(s, d)
        .withColumn("p_accept", p)
        .withColumn("thresh",
          round(col("p_accept") * 1000000).cast("long"))
        .filter(lcgDraw(col("doc_id")) % 1000000L < col("thresh"))
        .select(col("doc_id"), col("n_bigrams"), col("p_accept"))
    }),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    // every document with the corpus-trained bigram LM above, then
    // split each language into head/middle/tail thirds by score rank —
    // the classic quality-tiering step before mixing or filtering a
    // web corpus. The rank orders on avg_nll ROUNDED to 6 dp with a
    // doc_id tiebreak: fp summation order differs between engines, so
    // rounding first turns equal-to-tolerance scores into EXACT ties
    // broken by id, making the bucket assignment engine-independent.
    // One window per lang partition (parallel across strata, never a
    // global sort); docs with <2 tokens have no LM score and drop, as
    // in the oracle's inner join.
    "corpus_ccnet_buckets" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(round(col("avg_nll"), 6), col("doc_id"))
      lmScored(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id")
        .withColumn("b", ntile(3).over(w))
        .select(col("doc_id"), col("lang"),
          when(col("b") === 1, "head")
            .when(col("b") === 2, "middle")
            .otherwise("tail").as("tier"))
    }),

    // The END-TO-END pipeline: quality filter → exact dedup → split →
    // test-set decontamination → per-split corpus summary, one
    // composed plan. Every stage is the already-audited distributed
    // shape (broadcast percentile scalar; hash-aggregate dedup on
    // text; arithmetic split; gram semi-join decontamination that
    // shuffles grams, never documents); Catalyst pipelines them
    // without materializing any intermediate corpus copy. This is the
    // query a 100 TB training-data build actually runs.
    "corpus_pipeline_e2e" -> ((s, d) => {
      val counted = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("n_tokens", size(toksOf(col("text"))).cast("long"))
      val thresh = counted
        .agg(expr("percentile(n_tokens, 0.25D)").as("p25"))
      val kept = counted.crossJoin(broadcast(thresh))
        .filter(col("n_tokens").cast("double") > col("p25"))
      val deduped = kept.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"),
          min(col("n_tokens")).as("n_tokens"))
      val split = withSplit(deduped)
        .select(col("doc_id"), col("split"), col("n_tokens"), col("text"))
      // materialize tokens behind an exchange (same rationale as
      // corpus_decontaminate: keep the split+filter out of the gram
      // lambda so it runs once per row, not once per gram).
      // localCheckpoint (r16): the exchange alone did NOT make the
      // subtree shared — the three consumers (test grams, train grams,
      // the final anti-join count) prune different columns and Catalyst
      // pushes inferred explode guards below the repartition, so the
      // canonicalized exchanges differ and the WHOLE upstream
      // (percentile scalar + the full-text dedup shuffle + two
      // document scans) executed twice (plans/r16/
      // corpus_pipeline_e2e_before.txt: 18 exchanges, 2 text-dedup
      // shuffles, 3 corpus scans). Materializing the deduped token
      // frame once truncates the plan (guide §3.3): everything above
      // reads the checkpoint, and the pipeline's expensive stages run
      // exactly once at any scale.
      val tk = graft.core.Par.fanout(
        split.select(col("doc_id"), col("split"), col("n_tokens"),
          toksOf(col("text")).as("tk"))).localCheckpoint()
      val grams = tk.select(col("doc_id"), col("split"),
        explode(array_distinct(wordGrams(col("tk"), 5))).as("gram"))
      val testGrams = grams.filter(col("split") === "test")
        .select(col("gram")).distinct()
      val contaminated = grams.filter(col("split") === "train")
        .select(col("doc_id"), col("gram"))
        .join(testGrams, "gram")
        .select(col("doc_id")).distinct()
      tk.select(col("doc_id"), col("split"), col("n_tokens"))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    }),

    // Quality-percentile filter: drop the shortest quartile of the
    // corpus by token count. The threshold is ONE aggregated scalar
    // (exact interpolated percentile — deterministic on the sorted
    // multiset, same formula in both engines, cf. agg_median)
    // broadcast to a corpus scan: two passes, no shuffle of documents.
    // At 100 TB swap the exact percentile for percentile_approx and
    // the threshold stays a constant-memory sketch merge.
    "corpus_quality_filter" -> ((s, d) => {
      val counts = Tables.documents(s, d).select(col("doc_id"),
        size(toksOf(col("text"))).cast("long").as("n_tokens"))
      val thresh = counts
        .agg(expr("percentile(n_tokens, 0.25D)").as("p25"))
      counts.crossJoin(broadcast(thresh))
        .filter(col("n_tokens").cast("double") > col("p25"))
        .select(col("doc_id"), col("n_tokens"), col("p25"))
    }),

    // TF-IDF top terms per document: tf from one token explode with
    // map-side partial counting, document frequency from a second
    // aggregate over the (doc, term) pairs — never a re-scan of text.
    // The term join shuffles on `term` (the dictionary, orders of
    // magnitude smaller than the corpus; AQE broadcasts it when it
    // fits); the top-3 window partitions on doc_id, so no global sort
    // anywhere. n_docs is a 1-row broadcast scalar. Determinism: tf/df
    // are integers, both engines compute the identical IEEE
    // ln((n+1)/(df+1))+1 from identical integer inputs, and the window
    // tie-breaks on `term`, so equal (tf, df) pairs rank identically.
    "corpus_tfidf_topterms" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      // the TF matrix is the inverted-index statistic an ingest
      // pipeline maintains incrementally — persisted per fixture like
      // the LM/DSIR models, so repeat runs pay the join + window, not
      // the corpus-wide tokenize/explode/aggregate
      val tf = graft.core.ArtifactCache.persisted(s, d,
        "corpus_tf", "v1")(docs
        .select(col("doc_id"), explode(toksOf(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)) + 1.0))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w).cast("int"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"),
          col("df"), col("tfidf"))
    }),

    // Fixed-size chunking with overlap (200-char windows, stride 150) —
    // the context-window prep step. In-row `sequence` of start offsets
    // (no join, no shuffle), explode, substr: linear in output size.
    "corpus_chunk" -> ((s, d) =>
      Tables.documents(s, d)
        // empty docs produce NO chunks (the oracle's range(1,1,150)
        // is empty) — and Spark's `sequence` THROWS on 1..0, so the
        // guard is also what keeps a degenerate document from
        // failing the whole query
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")), lit(150)))
            .as("chunk_start"))
        .select(col("doc_id"), col("chunk_start"),
          col("text").substr(col("chunk_start"), lit(200)).as("chunk_text"))
        .withColumn("chunk_len", length(col("chunk_text")))),

    // Token-budget batching: contiguous docs (per lang, doc_id order)
    // grouped into ~512-token batches by exclusive running token count.
    // The window partitions on lang — parallel across groups, never a
    // global single-partition sort. (True greedy packing resets the
    // boundary per batch — that needs sequential state; the cumsum form
    // is the deterministic, embarrassingly-parallel approximation used
    // when batch boundaries may split at budget multiples.)
    "corpus_pack_batches" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("lang"), col("doc_id"),
        size(toksOf(col("text"))).as("n_tokens"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("batch_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(512.0))
          .cast("int"))
    }),

    // PII redaction: plant deterministic synthetic emails/phones (the
    // fixture text has none — planting makes the redaction observable),
    // then count + redact via codegen'd regexp. One projection pass, no
    // shuffle; the regex never leaves the scan stage.
    "corpus_pii_redact" -> ((s, d) => {
      val planted = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact u"), col("doc_id"), lit("@ex.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" tel 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables.documents(s, d).select(col("doc_id"), planted.as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(emailPat)).as("n_emails"),
          regexp_count(col("t"), lit(phonePat)).as("n_phones"),
          regexp_replace(
            regexp_replace(col("t"), lit(emailPat), lit("<EMAIL>")),
            lit(phonePat), lit("<PHONE>")).as("redacted"))
    }),

    // Gopher-style repetition/quality signals (Rae et al. 2021 §A1.1
    // shapes, adapted to the single-line fixture text): per-document
    // distinct-word fraction, top-word dominance, duplicate-bigram
    // fraction, mean word length, and the resulting keep flag. One
    // tokenize feeds both the unigram term-frequency aggregate and the
    // bigram distinct count — the corpus text is read once; everything
    // downstream is dictionary-sized per doc. All metrics are ratios of
    // integers (one IEEE division each) so both engines agree bitwise.
    "corpus_gopher_quality" -> ((s, d) => {
      // r16 note: the unigram and bigram branches each tokenize the
      // corpus (the bigram branch's size>=2 filter pushes below the
      // fanout exchange, so the subtrees don't canonicalize equal —
      // 2 FileScans, 0 reuse in plans/r16/corpus_gopher_quality_
      // before.txt). A localCheckpoint of the token frame was built,
      // verified, and MEASURED WORSE under the bench action (0.50 s
      // vs 0.32 s): serializing every token array to the block store
      // costs more than the second scan+tokenize, unlike the e2e
      // pipeline whose duplicated upstream includes a full-text
      // dedup SHUFFLE. Kept the recompute; see OPTIMIZATION_r16.md.
      val tk = graft.core.Par.fanout(Tables.documents(s, d)
        .select(col("doc_id"), toksOf(col("text")).as("tk")))
      val tf = tk.select(col("doc_id"), explode(col("tk")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
      val uni = tf.groupBy(col("doc_id")).agg(
        sum(col("cnt")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("top_cnt"),
        sum(col("cnt") * length(col("tok"))).as("sum_len"))
      val bg = tk.filter(size(col("tk")) >= 2)
        .select(col("doc_id"),
          explode(wordGrams(col("tk"), 2)).as("bg"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          countDistinct(col("bg")).as("n_distinct_bg"))
      val dbl = (c: Column) => c.cast("double")
      // left join: a 0/1-token document has no bigrams but must still
      // be SCORED (dup fraction 0), not silently dropped from the
      // quality report — degenerate docs are precisely what the keep
      // flag exists to judge
      uni.join(bg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          (dbl(col("n_distinct")) / dbl(col("n_words")))
            .as("distinct_word_frac"),
          (dbl(col("top_cnt")) / dbl(col("n_words")))
            .as("top_word_frac"),
          coalesce(dbl(col("n_bigrams") - col("n_distinct_bg"))
            / dbl(col("n_bigrams")), lit(0.0)).as("dup_bigram_frac"),
          (dbl(col("sum_len")) / dbl(col("n_words")))
            .as("mean_word_len"))
        .withColumn("keep",
          col("distinct_word_frac") >= 0.45 &&
            col("top_word_frac") <= 0.1 &&
            col("dup_bigram_frac") <= 0.05 &&
            col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
    }),

    // Stratified per-language sampling: a deterministic 10% sample of
    // every language, selected by LCG-hash rank so any worker can
    // recompute membership. The window partitions on lang (parallel
    // across strata, never a global sort); the per-stratum quota is a
    // windowed count over the same partition — no driver round-trip.
    // This is how a mixture-balanced training subset is cut at 100 TB:
    // hash-rank within stratum, keep rank <= ceil(q * |stratum|).
    "corpus_stratified_sample" -> ((s, d) => {
      val ord = lcgDraw(col("doc_id"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(ord, col("doc_id"))
      val cw = Window.partitionBy(col("lang"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(cw))
        .filter(col("rnk") <=
          ceil(col("n_lang").cast("double") * 0.1).cast("long"))
        .select(col("lang"), col("doc_id"), col("rnk"), col("n_lang"))
    }),

    // Source/domain mix report with blocklist: per-source doc and token
    // counts, corpus share, and the block flag — the provenance audit
    // that precedes domain filtering. One partial-combined aggregate
    // over the corpus; the grand total is a 1-row broadcast scalar, so
    // the share division never shuffles the per-source frame.
    "corpus_source_mix" -> ((s, d) => {
      val bySrc = Tables.documents(s, d)
        .select(col("source"), size(toksOf(col("text"))).cast("long")
          .as("n_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens"))
          .as("n_tokens"))
      val total = bySrc.agg(sum(col("n_docs")).as("total_docs"))
      bySrc.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (col("n_docs").cast("double") /
            col("total_docs").cast("double")).as("share"),
          col("source").isin("src3", "src7", "src13").as("blocked"))
    }),

    // Temperature-scaled language sampling weights (the UniMax /
    // multilingual-mixing step): w_l ∝ p_l^alpha with alpha=0.3 —
    // upweights tail languages, downweights the head. Two tiny
    // aggregates (per-lang counts, then the normalizer over ≤ #langs
    // rows) and two broadcast scalars; nothing corpus-sized moves.
    // The normalizer sums 5 doubles — order may differ between
    // engines, covered by the gate's 1e-6 rounding (diff ~1e-16).
    "corpus_lang_weights" -> ((s, d) => {
      val byLang = Tables.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val total = byLang.agg(sum(col("n_docs")).as("total_docs"))
      val scored = byLang.crossJoin(broadcast(total))
        .withColumn("p", col("n_docs").cast("double") /
          col("total_docs").cast("double"))
        .withColumn("w0", pow(col("p"), 0.3))
      val z = scored.agg(sum(col("w0")).as("z"))
      scored.crossJoin(broadcast(z))
        .select(col("lang"), col("n_docs"), col("p"),
          (col("w0") / col("z")).as("weight"))
    }),

    // Per-label embedding centroids: posexplode to (label, dim) cells,
    // then a partial-combined avg — the standard distributed centroid
    // (k-means update step) with no driver-side vectors. Output is one
    // row per (label, dim): 64 x #labels, constant in corpus size.
    "corpus_embedding_centroids" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("v")).as("centroid"), count(lit(1)).as("n"))),

    // BM25 retrieval (k1=1.2, b=0.75) for a fixed 3-term query — the
    // scoring half of retrieval-based decontamination / quality lookup.
    // ONE corpus scan produces doc length and matched-term frequencies
    // together; df and avgdl are dictionary/scalar-sized broadcasts; the
    // per-doc score sums <= 3 term scores through DECIMAL so the fold is
    // order-independent; global top-20 is TakeOrderedAndProject, never a
    // partitionless window. ln(1 + x) is one libm call per (doc, term) —
    // bit-equality across engines is not guaranteed but differences are
    // ~1 ulp, far inside the gate's 1e-6.
    "corpus_bm25_retrieval" -> ((s, d) => {
      val qterms = Seq("spark", "join", "window")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), toksOf(col("text")).as("tk"))
      val stats = docs.select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(filter(col("tk"), t => t.isin(qterms: _*))).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val nAvg = docs.agg(count(lit(1)).as("n_docs"),
        (sum(size(col("tk")).cast("long")).cast("double") /
          count(lit(1))).as("avgdl"))
      val dfreq = stats.groupBy(col("term")).agg(count(lit(1)).as("df"))
      stats.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(nAvg))
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
        .withColumn("tscore", col("idf") *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
            col("dl").cast("double") / col("avgdl"))))
        .groupBy(col("doc_id"))
        .agg(sum(col("tscore").cast("decimal(18,10)")).cast("double")
          .as("score"),
          count(lit(1)).as("n_matched"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // Size-proportional systematic sampling under a token budget: within
    // each (lang, shard) stratum, walk docs in id order accumulating
    // token counts and keep every doc whose span crosses a multiple of
    // (stratum total / 4) — the deterministic "sample ~4 docs per
    // stratum weighted by length" primitive of training-mix
    // construction. All integer math (BIGINT cumsum + floor division),
    // so the oracle matches bit for bit. The 16-way shard key keeps the
    // running-sum window partition-bounded at any corpus size — a plain
    // per-lang cumsum would serialize a 100 TB language into one task.
    "corpus_token_budget_sample" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("lang"), (col("doc_id") % 16).as("shard"),
          col("doc_id"), size(toksOf(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("step",
          greatest(expr("sum(n_tok) over (partition by lang, shard) div 4"),
            lit(1L)))
        .filter(expr("cum div step") > expr("(cum - n_tok) div step"))
        .select(col("lang"), col("shard"), col("doc_id"), col("n_tok"),
          col("cum"))
    }),

    // fastText-style hashed linear classifier (Joulin et al. 2017,
    // "Bag of Tricks for Efficient Text Classification") — the model
    // family CCNet and the LLaMA corpus pipeline use as their quality
    // filter. The Spark-side machinery is the real thing: word unigram
    // + bigram features through the hashing trick into 2^20 buckets, a
    // weight per bucket, score = mean feature weight, keep iff score >
    // 0. The WEIGHTS are a deterministic stub (the shared corpus LCG
    // maps bucket id → weight in [-1000, 1000]): this container has no
    // trained model, and a real deployment only swaps that one lambda
    // for a broadcast weight array. One scan, per-row compute, no
    // shuffle — classifier inference at 100 TB is embarrassingly
    // parallel and scan-bound. Feature hashing is an exact integer
    // char fold both engines replay (regexp char split keeps Spark and
    // DuckDB agreeing on every codepoint; `split(w, "")` would not:
    // Java keeps a trailing empty string that DuckDB drops).
    "corpus_quality_classifier" -> ((s, d) => {
      val P = 1048573L // feature buckets (prime ~2^20, hashing trick)
      val charHash = (w: Column) =>
        aggregate(regexp_extract_all(w, lit("."), lit(0)), lit(0L),
          (acc, c) => (acc * 31 + coalesce(ascii(c).cast("long"), lit(0L)))
            % lit(P))
      val tk = graft.core.Par.fanout(Tables.documents(s, d)
        .select(col("doc_id"), toksOf(col("text")).as("tk")))
        .filter(size(col("tk")) >= 1)
      val weight = (h: Column) =>
        ((h % M) * A + C) % M % lit(2001L) - lit(1000L)
      tk.select(col("doc_id"),
          transform(col("tk"), charHash).as("uh"))
        .select(col("doc_id"), concat(col("uh"),
          when(size(col("uh")) >= 2,
            transform(sequence(lit(1), size(col("uh")) - 1),
              i => (element_at(col("uh"), i) * 131
                + element_at(col("uh"), i + 1)) % lit(P)))
            .otherwise(array().cast("array<long>"))).as("feats"))
        .select(col("doc_id"),
          size(col("feats")).as("n_features"),
          aggregate(transform(col("feats"), weight), lit(0L),
            (acc, w) => acc + w).as("w_sum"))
        .withColumn("score_avg",
          round(col("w_sum").cast("double") / col("n_features"), 6))
        .withColumn("keep", col("w_sum") > 0)
    }),

    // BPE trainer statistic (Sennrich et al. 2016 §3.2): a byte-pair
    // tokenizer's first merge is the most frequent ADJACENT symbol pair
    // over the word-frequency table — this query surfaces that table's
    // head (top-20 character pairs weighted by word frequency, the
    // exact ranking the first merge consumes; BpeTrainSpec drives the
    // full iterative merge loop on this statistic). Scale shape: the
    // corpus collapses to a word-frequency dictionary FIRST (the one
    // big shuffle, map-side combined), pairs explode from the
    // dictionary (vocab-sized, not corpus-sized), and the pair-count
    // table is at most alphabet² rows — the final window ranks a frame
    // countable on one hand at any corpus size.
    "corpus_bpe_pair_counts" -> ((s, d) => {
      val wf = Tables.documents(s, d)
        .select(explode(toksOf(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .filter(length(col("w")) >= 2)
      val pc = wf.select(col("freq"),
          explode(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      // top-20 FIRST (TakeOrderedAndProject — distributed top-k over
      // the alphabet²-bounded pair table), then rank the 20 survivors
      // with the warning-free self-join (SmallFrames); the (n, pair)
      // order is total, so rank-within-top-20 equals global rank
      val top = pc.orderBy(col("n").desc, col("pair")).limit(20)
      graft.core.SmallFrames.selfJoinRank(top,
          Seq("n" -> false, "pair" -> true), "rank0")
        .select(col("rank0").cast("int").as("rank"), col("pair"),
          col("n"))
    }),

    // Deterministic training-order shuffle: every epoch-level data
    // loader needs a reproducible global permutation of the corpus
    // that interleaves sources (no "all of source A, then all of B" —
    // gradient quality dies on ordered data). The key is md5 of a
    // salted doc_id — identical bytes in any engine, so a resumed or
    // re-run job replays the exact order. Scale shape: a global sort
    // by hash key IS the operator; the consecutive ordinal is
    // materialized distributedly — bucket on a DETERMINISTIC prefix
    // of the key (uniform because md5 is, monotone in key order),
    // number within each bucket in parallel, then add broadcast
    // per-bucket prefix offsets (a P-row side table, P = bucket
    // count, not data size). No row ever funnels through a
    // single-partition window, so the same plan runs at 100 TB: two
    // metadata-sized passes over per-bucket counts.
    "corpus_train_order" -> ((s, d) => {
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(concat(lit("shuf42:"), col("doc_id").cast("string")))
            .as("shuffle_key"))
      // The range bucket is DETERMINISTIC — the first hex byte of the
      // md5 key (uniform by construction, monotone in key order) —
      // not a sampled RangePartitioner boundary: the offsets subtree
      // and the join's left side each evaluate this frame, and two
      // independent samplings could pick different boundaries beyond
      // reservoir scale (no ReuseExchange guarantee), silently
      // breaking the permutation. A pure function of the row can
      // never disagree with itself. 256 buckets ride the ordinary
      // hash exchange; ties still break on doc_id so the order is
      // total.
      val local = keyed
        .withColumn("pid",
          conv(substring(col("shuffle_key"), 1, 2), 16, 10).cast("int"))
        .repartition(col("pid"))
        .withColumn("lrn", row_number().over(
          Window.partitionBy(col("pid"))
            .orderBy(col("shuffle_key"), col("doc_id"))).cast("long"))
      // One row per partition — O(parallelism), not O(data) — prefix
      // offsets from the P²-pair broadcast self-join (SmallFrames),
      // not a single-partition window
      val offsets = graft.core.SmallFrames.selfJoinPrefixSum(
          local.groupBy(col("pid")).agg(count(lit(1)).as("cnt")),
          Seq("pid" -> true), "cnt", "off")
        .select(col("pid"), col("off"))
      local.join(broadcast(offsets), "pid")
        .withColumn("ord", (col("off") + col("lrn")).cast("long"))
        .withColumn("batch_id",
          floor((col("ord") - 1) / 64).cast("long"))
        .select(col("doc_id"), col("source"), col("shuffle_key"),
          col("ord"), col("batch_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "corpus_bpe_pair_counts" ->
      """WITH tk AS (
           SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
             x -> x <> '')) AS w
           FROM documents),
         wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
                FROM tk WHERE LENGTH(w) >= 2 GROUP BY w),
         p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, freq
               FROM wf, unnest(range(1, LENGTH(w))) AS u(i)),
         pc AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
                FROM p GROUP BY pair),
         r AS (SELECT pair, n,
                 CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair)
                   AS INTEGER) AS rank
               FROM pc)
         SELECT rank, pair, n FROM r WHERE rank <= 20""",
    "corpus_train_order" ->
      """WITH k AS (
           SELECT doc_id, source,
             md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
           FROM documents)
         SELECT doc_id, source, shuffle_key,
           CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key) AS BIGINT)
             AS ord,
           CAST((ROW_NUMBER() OVER (ORDER BY shuffle_key) - 1) // 64
             AS BIGINT) AS batch_id
         FROM k""",
    "corpus_split_assign" ->
      """SELECT doc_id,
           CAST((((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 100 AS INTEGER)
             AS bucket,
           CASE WHEN (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 100 < 80
                  THEN 'train'
                WHEN (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 100 < 90
                  THEN 'valid'
                ELSE 'test' END AS split
         FROM documents""",
    "corpus_decontaminate" ->
      """WITH toks AS (
           SELECT doc_id,
             (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 100 AS bucket,
             list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')
               AS tk
           FROM documents),
         g AS (
           SELECT doc_id, bucket,
             unnest(list_distinct(list_transform(
               range(1, GREATEST(LEN(tk) - 4, 1) + 1),
               i -> array_to_string(tk[i:i+4], ' ')))) AS gram
           FROM toks WHERE LEN(tk) >= 1),
         train AS (SELECT DISTINCT gram FROM g WHERE bucket < 80),
         test AS (SELECT doc_id, gram FROM g WHERE bucket >= 90)
         SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM test t JOIN train USING (gram)
         GROUP BY t.doc_id""",
    // The bloom pre-filter changes the plan, never the rows: the exact
    // join verifies every candidate, so the oracle is the same SQL.
    "corpus_decontaminate_bloom" ->
      """WITH toks AS (
           SELECT doc_id,
             (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 100 AS bucket,
             list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')
               AS tk
           FROM documents),
         g AS (
           SELECT doc_id, bucket,
             unnest(list_distinct(list_transform(
               range(1, GREATEST(LEN(tk) - 4, 1) + 1),
               i -> array_to_string(tk[i:i+4], ' ')))) AS gram
           FROM toks WHERE LEN(tk) >= 1),
         train AS (SELECT DISTINCT gram FROM g WHERE bucket < 80),
         test AS (SELECT doc_id, gram FROM g WHERE bucket >= 90)
         SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM test t JOIN train USING (gram)
         GROUP BY t.doc_id""",
    "corpus_vocab_topk" ->
      """WITH c AS (
           SELECT unnest(list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '')) AS token
           FROM documents),
         cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM c GROUP BY token)
         SELECT token, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INTEGER)
             AS rnk
         FROM cnt ORDER BY rnk LIMIT 20""",
    "corpus_lm_score" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '') AS tk
           FROM documents),
         b AS (
           SELECT doc_id, tk[i] AS t1, tk[i + 1] AS t2
           FROM tk, unnest(range(1, LEN(tk))) AS u(i)
           WHERE LEN(tk) >= 2),
         cb AS (SELECT t1, t2, COUNT(*) AS cb FROM b GROUP BY t1, t2),
         cu AS (SELECT t1, COUNT(*) AS cu FROM b GROUP BY t1),
         v AS (SELECT COUNT(DISTINCT tok) AS v
               FROM (SELECT unnest(tk) AS tok FROM tk)),
         s AS (
           SELECT doc_id, -(LN(cb + 1.0) - LN(CAST(cu + v AS DOUBLE)))
             AS nll
           FROM b JOIN cb USING (t1, t2) JOIN cu USING (t1)
           CROSS JOIN v)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           AVG(nll) AS avg_nll
         FROM s GROUP BY doc_id""",
    "corpus_dsir_resample" ->
      """WITH tk AS (
           SELECT doc_id, lang, list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '') AS tk
           FROM documents),
         b AS (
           SELECT doc_id, lang, tk[i] AS t1, tk[i + 1] AS t2
           FROM tk, unnest(range(1, LEN(tk))) AS u(i)
           WHERE LEN(tk) >= 2),
         cbr AS (SELECT t1, t2, COUNT(*) AS cbr FROM b GROUP BY t1, t2),
         cur AS (SELECT t1, COUNT(*) AS cur FROM b GROUP BY t1),
         cbt AS (SELECT t1, t2, COUNT(*) AS cbt FROM b
                 WHERE lang = 'en' GROUP BY t1, t2),
         cut AS (SELECT t1, COUNT(*) AS cut FROM b
                 WHERE lang = 'en' GROUP BY t1),
         vr AS (SELECT COUNT(DISTINCT tok) AS vr
                FROM (SELECT unnest(tk) AS tok FROM tk)),
         vt AS (SELECT COUNT(DISTINCT tok) AS vt
                FROM (SELECT unnest(tk) AS tok FROM tk
                      WHERE lang = 'en')),
         s AS (
           SELECT doc_id,
             (LN(COALESCE(cbt, 0) + 1.0)
               - LN(CAST(COALESCE(cut, 0) + vt AS DOUBLE)))
             - (LN(cbr + 1.0) - LN(CAST(cur + vr AS DOUBLE))) AS lr
           FROM b JOIN cbr USING (t1, t2) JOIN cur USING (t1)
           LEFT JOIN cbt USING (t1, t2) LEFT JOIN cut USING (t1)
           CROSS JOIN vr CROSS JOIN vt),
         sc AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             ROUND(1.0 / (1.0 + EXP(-AVG(lr))), 6) AS p_accept
           FROM s GROUP BY doc_id)
         SELECT doc_id, n_bigrams, p_accept
         FROM sc
         WHERE (((doc_id % 2147483648) * 1103515245 + 12345)
                 % 2147483648) % 1000000
               < CAST(ROUND(p_accept * 1000000, 0) AS BIGINT)""",
    "corpus_unimax_alloc" ->
      """WITH t AS (
           SELECT lang, CAST(SUM(LEN(list_filter(
             regexp_split_to_array(text, '\s+'), x -> x <> '')))
             AS BIGINT) AS s_tokens
           FROM documents GROUP BY lang),
         st AS (SELECT CAST(SUM(s_tokens) // 2 AS BIGINT) AS b,
                       CAST(COUNT(*) AS BIGINT) AS n FROM t),
         r AS (
           SELECT lang, s_tokens, s_tokens * 2 AS capacity, b, n,
             CAST(ROW_NUMBER() OVER (ORDER BY s_tokens * 2, lang)
               AS BIGINT) AS i,
             CAST(SUM(s_tokens * 2) OVER (ORDER BY s_tokens * 2, lang
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
           FROM t, st),
         c AS (
           SELECT *, capacity * (n - i + 1) <= b - (prefix - capacity)
             AS capped
           FROM r),
         k AS (
           SELECT CAST(COALESCE(SUM(CASE WHEN capped THEN 1 ELSE 0 END),
               0) AS BIGINT) AS k,
             CAST(COALESCE(SUM(CASE WHEN capped THEN capacity
               ELSE 0 END), 0) AS BIGINT) AS capped_sum
           FROM c)
         SELECT lang, s_tokens, capacity, capped,
           CAST(CASE WHEN capped THEN capacity
                ELSE (b - capped_sum) // (n - k) END AS BIGINT) AS alloc,
           CAST(CASE WHEN capped THEN capacity
                ELSE (b - capped_sum) // (n - k) END AS DOUBLE)
             / s_tokens AS epochs
         FROM c, k""",
    "corpus_dsir_weights" ->
      """WITH tk AS (
           SELECT doc_id, lang, list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '') AS tk
           FROM documents),
         b AS (
           SELECT doc_id, lang, tk[i] AS t1, tk[i + 1] AS t2
           FROM tk, unnest(range(1, LEN(tk))) AS u(i)
           WHERE LEN(tk) >= 2),
         cbr AS (SELECT t1, t2, COUNT(*) AS cbr FROM b GROUP BY t1, t2),
         cur AS (SELECT t1, COUNT(*) AS cur FROM b GROUP BY t1),
         cbt AS (SELECT t1, t2, COUNT(*) AS cbt FROM b
                 WHERE lang = 'en' GROUP BY t1, t2),
         cut AS (SELECT t1, COUNT(*) AS cut FROM b
                 WHERE lang = 'en' GROUP BY t1),
         vr AS (SELECT COUNT(DISTINCT tok) AS vr
                FROM (SELECT unnest(tk) AS tok FROM tk)),
         vt AS (SELECT COUNT(DISTINCT tok) AS vt
                FROM (SELECT unnest(tk) AS tok FROM tk
                      WHERE lang = 'en')),
         s AS (
           SELECT doc_id,
             (LN(COALESCE(cbt, 0) + 1.0)
               - LN(CAST(COALESCE(cut, 0) + vt AS DOUBLE)))
             - (LN(cbr + 1.0) - LN(CAST(cur + vr AS DOUBLE))) AS lr
           FROM b JOIN cbr USING (t1, t2) JOIN cur USING (t1)
           LEFT JOIN cbt USING (t1, t2) LEFT JOIN cut USING (t1)
           CROSS JOIN vr CROSS JOIN vt)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           AVG(lr) AS avg_log_ratio,
           ROUND(AVG(lr), 6) > 0 AS dsir_keep
         FROM s GROUP BY doc_id""",
    "corpus_ccnet_buckets" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '') AS tk
           FROM documents),
         b AS (
           SELECT doc_id, tk[i] AS t1, tk[i + 1] AS t2
           FROM tk, unnest(range(1, LEN(tk))) AS u(i)
           WHERE LEN(tk) >= 2),
         cb AS (SELECT t1, t2, COUNT(*) AS cb FROM b GROUP BY t1, t2),
         cu AS (SELECT t1, COUNT(*) AS cu FROM b GROUP BY t1),
         v AS (SELECT COUNT(DISTINCT tok) AS v
               FROM (SELECT unnest(tk) AS tok FROM tk)),
         s AS (
           SELECT doc_id, -(LN(cb + 1.0) - LN(CAST(cu + v AS DOUBLE)))
             AS nll
           FROM b JOIN cb USING (t1, t2) JOIN cu USING (t1)
           CROSS JOIN v),
         sc AS (SELECT doc_id, AVG(nll) AS avg_nll
                FROM s GROUP BY doc_id),
         r AS (
           SELECT sc.doc_id, d.lang,
             NTILE(3) OVER (PARTITION BY d.lang
               ORDER BY ROUND(avg_nll, 6), sc.doc_id) AS b
           FROM sc JOIN documents d ON sc.doc_id = d.doc_id)
         SELECT doc_id, lang,
           CASE WHEN b = 1 THEN 'head'
                WHEN b = 2 THEN 'middle'
                ELSE 'tail' END AS tier
         FROM r""",
    "corpus_pipeline_e2e" ->
      """WITH c AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\s+'),
               t -> t <> '') AS tk
           FROM documents),
         n AS (SELECT doc_id, text, tk,
                 CAST(LEN(tk) AS BIGINT) AS n_tokens FROM c),
         thr AS (SELECT quantile_cont(n_tokens, 0.25) AS p25 FROM n),
         kept AS (SELECT doc_id, text, tk, n_tokens
                  FROM n CROSS JOIN thr
                  WHERE CAST(n_tokens AS DOUBLE) > p25),
         dd AS (SELECT MIN(doc_id) AS doc_id,
                  MIN(n_tokens) AS n_tokens, text
                FROM kept GROUP BY text),
         sp AS (SELECT doc_id, n_tokens, text,
                  CASE WHEN (((doc_id % 2147483648) * 1103515245 + 12345)
                        % 2147483648) % 100 < 80 THEN 'train'
                       WHEN (((doc_id % 2147483648) * 1103515245 + 12345)
                        % 2147483648) % 100 < 90 THEN 'valid'
                       ELSE 'test' END AS split
                FROM dd),
         g AS (SELECT doc_id, split,
                 unnest(list_distinct(list_transform(
                   range(1, GREATEST(LEN(list_filter(
                     regexp_split_to_array(text, '\s+'),
                     t -> t <> '')) - 4, 1) + 1),
                   i -> array_to_string(list_filter(
                     regexp_split_to_array(text, '\s+'),
                     t -> t <> '')[i:i+4], ' ')))) AS gram
               FROM sp),
         tg AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
         bad AS (SELECT DISTINCT doc_id FROM g
                 WHERE split = 'train'
                   AND gram IN (SELECT gram FROM tg)),
         fin AS (SELECT * FROM sp
                 WHERE doc_id NOT IN (SELECT doc_id FROM bad))
         SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         FROM fin GROUP BY split""",
    "corpus_quality_filter" ->
      """WITH c AS (
           SELECT doc_id, CAST(LEN(LIST_FILTER(
             REGEXP_SPLIT_TO_ARRAY(text, '\s+'), t -> t <> ''))
             AS BIGINT) AS n_tokens
           FROM documents),
         t AS (SELECT quantile_cont(n_tokens, 0.25) AS p25 FROM c)
         SELECT doc_id, n_tokens, p25
         FROM c CROSS JOIN t
         WHERE CAST(n_tokens AS DOUBLE) > p25""",
    "corpus_tfidf_topterms" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM toks GROUP BY doc_id, term),
         dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, term, tf, df,
             CAST(tf AS DOUBLE) *
               (LN((CAST(n_docs AS DOUBLE) + 1.0) /
                   (CAST(df AS DOUBLE) + 1.0)) + 1.0) AS tfidf
           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         r AS (
           SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
             CAST(df AS BIGINT) AS df, tfidf,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term) AS INTEGER) AS rnk
           FROM scored)
         SELECT doc_id, rnk, term, tf, df, tfidf FROM r WHERE rnk <= 3""",
    "corpus_chunk" ->
      """SELECT doc_id, CAST(s AS INTEGER) AS chunk_start,
           substr(text, CAST(s AS INTEGER), 200) AS chunk_text,
           CAST(LENGTH(substr(text, CAST(s AS INTEGER), 200)) AS INTEGER)
             AS chunk_len
         FROM documents, unnest(range(1, LENGTH(text) + 1, 150)) AS u(s)""",
    "corpus_pack_batches" ->
      """WITH t AS (
           SELECT lang, doc_id,
             CAST(LEN(list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '')) AS INTEGER) AS n_tokens
           FROM documents)
         SELECT lang, doc_id, n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
             AS INTEGER) AS batch_id
         FROM t""",
    "corpus_pii_redact" ->
      """WITH p AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 5 = 0
               THEN ' contact u' || doc_id || '@ex.com' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
               THEN ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END AS t
           FROM documents)
         SELECT doc_id,
           CAST(LEN(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+'))
             AS INTEGER) AS n_emails,
           CAST(LEN(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}'))
             AS INTEGER) AS n_phones,
           regexp_replace(
             regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
         FROM p""",
    "corpus_embedding_centroids" ->
      """SELECT label, CAST(u.pos - 1 AS INTEGER) AS pos,
           AVG(u.val) AS centroid, CAST(COUNT(*) AS BIGINT) AS n
         FROM (SELECT label,
             unnest(list_transform(range(1, LEN(embedding) + 1),
               i -> struct_pack(pos := i, val := embedding[i]))) AS u
           FROM embeddings)
         GROUP BY label, u.pos - 1""",
    "corpus_gopher_quality" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '') AS tk
           FROM documents),
         tf AS (
           SELECT doc_id, tok, COUNT(*) AS cnt
           FROM (SELECT doc_id, unnest(tk) AS tok FROM tk)
           GROUP BY doc_id, tok),
         uni AS (
           SELECT doc_id, SUM(cnt) AS n_words, COUNT(*) AS n_distinct,
             MAX(cnt) AS top_cnt, SUM(cnt * LENGTH(tok)) AS sum_len
           FROM tf GROUP BY doc_id),
         bg AS (
           SELECT doc_id, COUNT(*) AS n_bigrams,
             COUNT(DISTINCT b) AS n_distinct_bg
           FROM (SELECT doc_id,
                   array_to_string(tk[i:i+1], ' ') AS b
                 FROM tk, unnest(range(1, LEN(tk))) AS u(i)
                 WHERE LEN(tk) >= 2)
           GROUP BY doc_id),
         m AS (
           SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE)
               AS distinct_word_frac,
             CAST(top_cnt AS DOUBLE) / CAST(n_words AS DOUBLE)
               AS top_word_frac,
             COALESCE(CAST(n_bigrams - n_distinct_bg AS DOUBLE)
               / CAST(n_bigrams AS DOUBLE), 0.0) AS dup_bigram_frac,
             CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE)
               AS mean_word_len
           FROM uni LEFT JOIN bg USING (doc_id))
         SELECT *,
           distinct_word_frac >= 0.45 AND top_word_frac <= 0.1
             AND dup_bigram_frac <= 0.05
             AND mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS keep
         FROM m""",
    "corpus_stratified_sample" ->
      """WITH r AS (
           SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY ((doc_id % 2147483648) * 1103515245 + 12345)
                          % 2147483648,
                        doc_id) AS BIGINT) AS rnk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
           FROM documents)
         SELECT lang, doc_id, rnk, n_lang
         FROM r
         WHERE rnk <= CAST(CEIL(CAST(n_lang AS DOUBLE) * 0.1) AS BIGINT)""",
    "corpus_source_mix" ->
      """WITH s AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(LEN(list_filter(
               regexp_split_to_array(text, '\s+'), t -> t <> '')))
               AS BIGINT) AS n_tokens
           FROM documents GROUP BY source),
         t AS (SELECT SUM(n_docs) AS total_docs FROM s)
         SELECT source, n_docs, n_tokens,
           CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE) AS share,
           source IN ('src3', 'src7', 'src13') AS blocked
         FROM s CROSS JOIN t""",
    "corpus_lang_weights" ->
      """WITH l AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY lang),
         t AS (SELECT SUM(n_docs) AS total_docs FROM l),
         sc AS (
           SELECT lang, n_docs,
             CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE) AS p,
             POW(CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE),
               0.3) AS w0
           FROM l CROSS JOIN t),
         z AS (SELECT SUM(w0) AS z FROM sc)
         SELECT lang, n_docs, p, w0 / z AS weight
         FROM sc CROSS JOIN z""",
    "corpus_bm25_retrieval" ->
      """WITH dk AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'),
               t -> t <> '') AS tk
           FROM documents),
         stats AS (
           SELECT doc_id, CAST(LEN(tk) AS BIGINT) AS dl, term,
             CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, tk, unnest(tk) AS term FROM dk)
           WHERE term IN ('spark', 'join', 'window')
           GROUP BY doc_id, LEN(tk), term),
         na AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(LEN(tk)) AS DOUBLE) / COUNT(*) AS avgdl
           FROM dk),
         dfreq AS (
           SELECT term, CAST(COUNT(*) AS BIGINT) AS df
           FROM stats GROUP BY term),
         sc AS (
           SELECT s.doc_id,
             LN(CAST(1.0 AS DOUBLE) +
                (CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE)) /
                (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))) *
             (s.tf * CAST(2.2 AS DOUBLE)) /
             (s.tf + CAST(1.2 AS DOUBLE) *
               (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
                 CAST(s.dl AS DOUBLE) / avgdl)) AS tscore
           FROM stats s JOIN dfreq USING (term) CROSS JOIN na)
         SELECT doc_id,
           CAST(SUM(CAST(tscore AS DECIMAL(18,10))) AS DOUBLE) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_matched
         FROM sc
         GROUP BY doc_id
         ORDER BY score DESC, doc_id
         LIMIT 20""",
    "corpus_token_budget_sample" ->
      """WITH t AS (
           SELECT lang, doc_id % 16 AS shard, doc_id,
             CAST(LEN(list_filter(regexp_split_to_array(text, '\s+'),
               t -> t <> '')) AS BIGINT) AS n_tok
           FROM documents),
         w AS (
           SELECT lang, shard, doc_id, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY lang, shard
               ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(GREATEST(SUM(n_tok) OVER (PARTITION BY lang, shard) // 4,
               1) AS BIGINT) AS step
           FROM t)
         SELECT lang, shard, doc_id, n_tok, cum
         FROM w
         WHERE cum // step > (cum - n_tok) // step""",
    // Exact replay of the hashed-feature classifier: the same char
    // fold (regexp char split + codepoint), bucket combine, LCG
    // weight, and integer sum — only the final mean divides.
    "corpus_quality_classifier" ->
      """WITH tk AS (
           SELECT doc_id, list_filter(
             regexp_split_to_array(text, '\s+'), t -> t <> '') AS tk
           FROM documents),
         uh AS (
           SELECT doc_id,
             list_transform(tk, w ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(regexp_extract_all(w, '.'),
                   c -> CAST(unicode(c) AS BIGINT))),
                 (acc, u) -> (acc * 31 + u) % 1048573)) AS uh
           FROM tk WHERE LEN(tk) >= 1),
         feats AS (
           SELECT doc_id,
             list_concat(uh,
               CASE WHEN LEN(uh) >= 2 THEN
                 list_transform(range(1, LEN(uh)),
                   i -> (uh[CAST(i AS INTEGER)] * 131
                     + uh[CAST(i + 1 AS INTEGER)]) % 1048573)
               ELSE CAST([] AS BIGINT[]) END) AS feats
           FROM uh),
         scored AS (
           SELECT doc_id, CAST(LEN(feats) AS INTEGER) AS n_features,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(feats, h ->
                 ((h % 2147483648) * 1103515245 + 12345)
                   % 2147483648 % 2001 - 1000)),
               (acc, w) -> acc + w) AS BIGINT) AS w_sum
           FROM feats)
         SELECT doc_id, n_features, w_sum,
           ROUND(CAST(w_sum AS DOUBLE) / n_features, 6) AS score_avg,
           w_sum > 0 AS keep
         FROM scored"""
  )
}
