package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Par.fanout
import graft.sources.Tables

/** Similarity search over embedding columns [EXT] (SURVEY.md §2.6).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the corpus, so the corpus is scanned exactly once with no
  * shuffle of the embedding column; per-query ranking is a window over
  * the query key (k heap rows per query survive the rank filter).
  * At 100 TB the corpus side stays partition-parallel and the only data
  * movement is the broadcast of the query vectors.
  *
  * Scale path: sign-random-projection LSH — a deterministic 8-bit
  * hyperplane signature buckets the corpus (one pass, no shuffle), then
  * candidate retrieval joins query signatures to corpus buckets and
  * reranks only within buckets (~1/256 of the corpus per probe). The
  * hyperplanes are a deterministic splitmix64 matrix precomputed on the
  * driver and shipped as literals, so signatures are reproducible across
  * runs and clusters with zero mutable driver state. */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  /** Dot product of two float-array columns in double precision —
    * the custom codegen'd [[graft.functions.DotProduct]] expression
    * (registered as `graft_dot` by GraftExtensions; one fused loop, no
    * intermediate array). Same strict left-fold accumulation order as
    * the composed `aggregate(zip_with(...))` form and the DuckDB
    * `list_reduce` oracles, so doubles are bit-identical. Embeddings in
    * the fixtures are L2-normalized, so dot == cosine. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Cosine similarity (does not assume normalized inputs). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** splitmix64 finalizer (public-domain PRNG, Steele et al. 2014) —
    * deterministic hyperplane source with zero driver state beyond the
    * (plane, dim) index. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hyperplane row `p` over `dim` dimensions, components in [-1, 1).
    * Precomputed ONCE on the driver and shipped as an array<float>
    * literal — the round-2 form recomputed a hash per (row, plane, dim)
    * inside nested HOF lambdas and was the slowest query in the bench
    * (27 s); a constant matrix + the codegen'd `graft_dot` kernel makes
    * the signature 8 fused loops per row. */
  private def planeRow(p: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      val h = splitmix64((p.toLong << 32) | i.toLong)
      (((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0).toFloat
    }

  /** Sign-random-projection signature of an embedding column: bit `p` is
    * the sign of the dot product with precomputed hyperplane `p`.
    * `dim` must match the embedding dimensionality (64 in the fixtures). */
  def srpSignature(emb: Column, bits: Int = 8, dim: Int = 64): Column =
    (0 until bits).map { p =>
      when(dot(emb, typedLit(planeRow(p, dim))) > 0.0, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ bitwiseOR _)

  /** Brute-force top-k neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queriesDf: DataFrame, k: Int): DataFrame = {
    val q = queriesDf.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        dot(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-5 for 8 query vectors (ids 0..7)
    "sim_cosine_topk" -> ((s, d) => {
      val emb = fanout(Tables.embeddings(s, d))
      bruteForceTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
    }),

    // LSH-bucketed ANN: signature histogram + within-bucket top-3 for the
    // same query set, reranked by exact cosine. Output: query, neighbor,
    // rank within the probed bucket.
    "sim_lsh_ann" -> ((s, d) => {
      val emb = fanout(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding"),
          srpSignature(col("embedding")).as("sig"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("sig").as("q_sig"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      emb.join(broadcast(q),
          col("sig") === col("q_sig") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          dot(col("q_emb"), col("embedding")).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("vec_id"))
    }),

    // Corpus-wide signature histogram — the bucketing balance check an
    // ANN index build would run (detects skewed hyperplanes).
    "sim_lsh_bucket_stats" -> ((s, d) =>
      fanout(Tables.embeddings(s, d))
        .select(srpSignature(col("embedding")).as("sig"))
        .groupBy(col("sig"))
        .agg(count(lit(1)).as("n_vectors"))),

    // IVF (inverted-file) ANN: a deterministic coarse quantizer (the
    // first 16 corpus vectors as centroids), every vector assigned to
    // its nearest centroid (one broadcast join — the corpus never
    // shuffles its embeddings), queries probe only their own cell and
    // rerank by exact dot product. The 1/n_cells probe fraction is the
    // classic IVF scan saving; fully DuckDB-expressible (pure fp math),
    // so this ANN variant is oracle-checked end to end.
    "sim_ivf_ann" -> ((s, d) => {
      val emb = fanout(Tables.embeddings(s, d))
      val cents = Tables.embeddings(s, d).filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_sim").desc, col("cent_id"))
      val assigned = emb.join(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cent_id"),
          dot(col("embedding"), col("c_emb")).as("c_sim"))
        .withColumn("arn", row_number().over(wAssign))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id"))
      val q = assigned.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("cent_id").as("q_cent"))
      val wRank = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      assigned.join(broadcast(q),
          col("cent_id") === col("q_cent") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          dot(col("q_emb"), col("embedding")).as("sim"))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
    }),

    // Embedding-cosine near-dup pairs: block on the sign pattern of the
    // first 4 dimensions (near-identical vectors share it unless a
    // blocked dim sits at zero), verify by exact dot within blocks.
    // Pure fp math → oracle-checked, unlike the xxhash64 SRP variant.
    // Threshold 0.35: the synthetic embeddings carry no planted
    // near-identical pairs (corpus max cosine ≈ 0.51), so a production
    // 0.9+ cut would select nothing — the lower cut keeps the operator
    // result non-vacuous while exercising the identical plan shape.
    "dedup_embedding_cosine" -> ((s, d) => {
      def signBlock(e: Column): Column =
        (when(element_at(e, 1) > 0.0f, 8).otherwise(0) +
          when(element_at(e, 2) > 0.0f, 4).otherwise(0) +
          when(element_at(e, 3) > 0.0f, 2).otherwise(0) +
          when(element_at(e, 4) > 0.0f, 1).otherwise(0))
      val emb = fanout(Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding"),
          signBlock(col("embedding")).as("blk"))
      emb.as("l").join(emb.as("r"),
          col("l.blk") === col("r.blk") &&
            col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
          dot(col("l.embedding"), col("r.embedding")).as("cos_sim"))
        .filter(col("cos_sim") >= 0.35)
    })
  )

  /** The SRP plane matrix as a DuckDB `DOUBLE[]` literal. Each float is
    * printed via `toDouble.toString` — the shortest decimal that
    * round-trips to that exact double, which IS the float's exact value
    * widened — so DuckDB's literal equals Spark's `(double) planeFloat`
    * bit for bit and sign decisions can never diverge. */
  private def planeSqlLit(p: Int, dim: Int): String =
    planeRow(p, dim).map(_.toDouble.toString)
      .mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** SQL twin of [[srpSignature]]: same strict left-fold dot per plane
    * (proven bit-identical by the sim_cosine_topk hash match), same
    * sign-to-bit packing. */
  private def srpSigSql(embExpr: String, bits: Int = 8, dim: Int = 64): String =
    (0 until bits).map { p =>
      s"""CASE WHEN list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, $dim + 1),
             i -> CAST($embExpr[CAST(i AS INTEGER)] AS DOUBLE)
                  * list_extract(${planeSqlLit(p, dim)}, CAST(i AS INTEGER)))),
         (acc, v) -> acc + v) > 0.0 THEN ${1 << p} ELSE 0 END"""
    }.mkString("(", " + ", ")")

  // Every similarity query is oracle-checked end to end: DuckDB
  // recomputes the same strict left-fold dot product via list_reduce, so
  // the doubles are bit-identical, ranks agree, and the hash matches.
  // The SRP-LSH pair needed one extra trick — the hyperplanes are
  // deterministic constants, so the generated oracle SQL embeds the
  // plane matrix as DOUBLE[] literals and recomputes the signature.
  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 8),
         scored AS (
           SELECT q.query_id, e.vec_id,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE))),
               (acc, v) -> acc + v) AS sim
           FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, vec_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
           FROM scored)
         SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= 5""",
    // Both engines compute the dot product as the identical strict left
    // fold, so assignment / ranking / thresholds agree bit-for-bit.
    "sim_ivf_ann" ->
      """WITH cents AS (SELECT vec_id AS cent_id, embedding AS c_emb
                        FROM embeddings WHERE vec_id < 16),
         ascore AS (
           SELECT e.vec_id, e.embedding, c.cent_id,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(c.c_emb[CAST(i AS INTEGER)] AS DOUBLE))),
               (acc, v) -> acc + v) AS c_sim
           FROM embeddings e CROSS JOIN cents c),
         assigned AS (
           SELECT vec_id, embedding, cent_id FROM (
             SELECT vec_id, embedding, cent_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY c_sim DESC, cent_id) AS arn
             FROM ascore) t WHERE arn = 1),
         q AS (SELECT vec_id AS query_id, embedding AS q_emb,
                      cent_id AS q_cent
               FROM assigned WHERE vec_id < 8),
         scored AS (
           SELECT q.query_id, a.vec_id,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(a.embedding) + 1),
                   i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE))),
               (acc, v) -> acc + v) AS sim
           FROM assigned a JOIN q
             ON a.cent_id = q.q_cent AND a.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, vec_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
           FROM scored)
         SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= 3""",
    "dedup_embedding_cosine" ->
      """WITH b AS (
           SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0.0 THEN 8 ELSE 0 END
              + CASE WHEN embedding[2] > 0.0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[3] > 0.0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[4] > 0.0 THEN 1 ELSE 0 END) AS blk
           FROM embeddings),
         scored AS (
           SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(l.embedding) + 1),
                   i -> CAST(l.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(r.embedding[CAST(i AS INTEGER)] AS DOUBLE))),
               (acc, v) -> acc + v) AS cos_sim
           FROM b l JOIN b r ON l.blk = r.blk AND l.vec_id < r.vec_id)
         SELECT vec_a, vec_b, cos_sim FROM scored WHERE cos_sim >= 0.35""",
    "sim_lsh_ann" ->
      s"""WITH sig AS (
           SELECT vec_id, embedding,
             ${srpSigSql("embedding")} AS sig
           FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding AS q_emb, sig AS q_sig
               FROM sig WHERE vec_id < 8),
         scored AS (
           SELECT q.query_id, e.vec_id,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE)
                        * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE))),
               (acc, v) -> acc + v) AS sim
           FROM sig e JOIN q
             ON e.sig = q.q_sig AND e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, vec_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
           FROM scored)
         SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 3""",
    "sim_lsh_bucket_stats" ->
      s"""SELECT ${srpSigSql("embedding")} AS sig,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
         FROM embeddings GROUP BY 1"""
  )
}
