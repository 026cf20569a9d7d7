package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Independent-evidence pins for the three highest-risk REPLAY-style
  * oracles (VERDICT r15 #3): `sim_ivfpq_rerank`, `dedup_semdedup`, and
  * `corpus_quality_classifier` are gate-checked against DuckDB oracles
  * that replay the implementation's own training/hashing arithmetic in
  * SQL — internal consistency, not external truth (a misconception
  * shared by both derivations passes both sides; the r15 IVF seeding
  * bug was caught by a probe, not an oracle). Each test here runs the
  * REAL registered query on a tiny HAND-CONSTRUCTED fixture whose
  * expected output is derived on paper in the comments — literal
  * numbers and structural arguments that do NOT flow through the
  * implementation's math (the classifier expectations were computed by
  * hand from the published algorithm; the ANN expectations follow from
  * a construction that makes clustering and PQ encoding provably
  * trivial).
  *
  * Fixture-construction arguments used below:
  *  - k-means with one seed per well-separated group and identical (or
  *    near-identical) in-group members provably assigns each group to
  *    its own cell: in-group squared distances are ≤ hundreds on the
  *    integer grid while cross-group distances are ≥ 2·(2000)² = 8e6.
  *  - PQ with n == PqK and all per-subspace training subvectors
  *    DISTINCT seeds every subvector as its own centroid; Lloyd keeps
  *    each singleton centroid fixed, so encoding is LOSSLESS and the
  *    ADC distance equals the exact integer squared-L2 — the search
  *    stage can then be predicted with grade-school arithmetic. */
class IndependentEvidenceSpec extends SparkSpec {

  private def writeFixture(rows: Seq[Row], schema: StructType,
      dir: java.nio.file.Path, table: String): Unit =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/$table.parquet")

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType, false),
    StructField("embedding", ArrayType(FloatType, false), false),
    StructField("label", IntegerType, false)))

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, false),
    StructField("text", StringType, false),
    StructField("lang", StringType, false),
    StructField("source", StringType, false),
    StructField("n_chars", LongType, false)))

  test("dedup_semdedup on a paper-derivable fixture: three orthogonal " +
      "triples dedup to (3 vectors, 2 dropped, 1 kept) per cell") {
    // 9 vectors, dim 4: vecs {0,1,2} = e1, {3,4,5} = e2, {6,7,8} = e3.
    // Quantized grid: 1.0 -> 2000, 0.0 -> 1000. k = ⌊√9⌋ = 3; the
    // bounded sample is all 9 (m = 1) and ANY stride-3 rank selection
    // picks exactly one seed per triple (the triples are contiguous in
    // vec_id rank), so k-means has one seed per group; in-group
    // distance is 0, cross-group is 2·10⁶ — assignment and both Lloyd
    // rounds are degenerate and each triple IS a cell, by construction,
    // not by replaying the trainer. Within a cell every cosine is
    // exactly 1 ≥ 0.3, so the min-id member is kept and the other two
    // drop: every cell reads (3, 2, 1). No arithmetic here shares code
    // or derivation with the Scala/SQL pipelines.
    val dir = java.nio.file.Files.createTempDirectory("graft-indep-sem")
    val rows = (0 until 9).map { i =>
      val a = Array.fill(4)(0.0f)
      a(i / 3) = 1.0f
      Row(i.toLong, a.toSeq, 0)
    }
    writeFixture(rows, embSchema, dir, "embeddings")
    val out = SparkEntry.queries("dedup_semdedup")(spark, dir.toString)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("n_vectors")),
        r.getLong(r.fieldIndex("n_dropped")),
        r.getLong(r.fieldIndex("n_kept"))))
      .toSeq.sorted
    assert(out == Seq((3L, 2L, 1L), (3L, 2L, 1L), (3L, 2L, 1L)),
      s"expected three (3,2,1) cells, got $out")
  }

  /** The shared 16-vector paper-derivable fixture (see the rerank
    * test's construction argument): four orthogonal groups of four,
    * per-vector jitter 0.001·(i+1) on the last dim of every subspace.
    * Built once; four ANN queries assert against it. */
  private def jit(i: Int): Float = 0.001f * (i + 1)
  private lazy val pqFixture: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-indep-pq")
    val rows = (0 until 16).map { i =>
      val a = Array.fill(64)(0.0f)
      a((i / 4) * 16) = 2.0f
      (0 until 4).foreach(s => a(s * 16 + 15) = jit(i))
      Row(i.toLong, a.toSeq, 0)
    }
    writeFixture(rows, embSchema, dir, "embeddings")
    dir.toString
  }

  /** Expected (query, rank, vec, sim) rows for the cosine-ranked
    * queries on [[pqFixture]]: groupmates by DESCENDING vec_id with
    * sim = 4 + 4·j_q·j_c — plain double arithmetic, no Spark. */
  private def cosineTop3: Seq[(Long, Int, Long, Double)] = for {
    q <- 0 until 8
    (c, rank) <- (q / 4 * 4 until q / 4 * 4 + 4)
      .filter(_ != q).sortBy(-_).zipWithIndex
  } yield (q.toLong, rank + 1, c.toLong,
    4.0 + 4.0 * jit(q).toDouble * jit(c).toDouble)

  test("sim_ivfpq_rerank on a paper-derivable fixture: lossless PQ + " +
      "group cells make the exact top-3 predictable by hand") {
    // 16 vectors, dim 64, four groups of four. Vector i (group
    // g = i/4): dim g·16 = 2.0, and dim s·16+15 = 0.001·(i+1) for
    // every subspace s (the per-vector jitter that makes all 16
    // subvectors DISTINCT in every subspace).
    //  - IVF: k = ⌊√16⌋ = 4, seeds at sample ranks {0,4,8,12} = one
    //    per group; in-group sqdist ≤ 4·15² = 900, cross-group
    //    ≥ 2·2000² — each group is a cell.
    //  - PQ: n = 16 = PqK and all 16 subvectors distinct per subspace
    //    ⇒ every training subvector seeds its own centroid and Lloyd
    //    fixes it ⇒ encoding is lossless ⇒ ADC = exact integer
    //    squared-L2 = 4·(q−c)² for same-group q,c (only the jitter
    //    dims differ).
    //  - Search: candidates = the query's 3 groupmates (< shortlist
    //    depth 10, so ADC ordering cannot drop anyone); the exact
    //    rerank orders by float cosine sim(q,c) = 2·2 + 4·jq·jc,
    //    strictly increasing in c's jitter ⇒ rank order is groupmates
    //    by DESCENDING vec_id — for q=0: (3,2,1); for q=5: (7,6,4).
    // The expected table below is constructed from that argument and
    // plain Scala double arithmetic over the same float literals the
    // fixture is built from — no Spark expression, no SQL replay.
    val got = SparkEntry.queries("sim_ivfpq_rerank")(spark, pqFixture)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("sim"))))
      .sortBy(t => (t._1, t._2))
    val expected = cosineTop3
    assert(got.length == expected.length,
      s"expected ${expected.length} rows, got ${got.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"row mismatch: got $g expected $e")
      assert(math.abs(g._4 - e._4) < 1e-9,
        s"sim mismatch for $g: expected ${e._4}")
    }
  }

  test("sim_ivf_ann on the same fixture: cell-restricted exact-cosine " +
      "top-3 equals the construction's prediction") {
    // Same argument as the rerank test minus the PQ stage: candidates
    // are the query's cell (= its group), ranked by exact float
    // cosine — so the expected rows are IDENTICAL to the rerank's.
    val got = SparkEntry.queries("sim_ivf_ann")(spark, pqFixture)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("sim"))))
      .sortBy(t => (t._1, t._2))
    val expected = cosineTop3
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"row mismatch: got $g expected $e")
      assert(math.abs(g._4 - e._4) < 1e-9, s"sim mismatch: $g vs $e")
    }
  }

  test("sim_pq_adc on the same fixture: lossless codes make flat ADC " +
      "the exact integer squared-L2 — distances predictable by hand") {
    // Flat ADC scans ALL vectors. Same-group distance = 4·(q−c)²
    // (only the four jitter dims differ); cross-group adds two
    // 2000²-sized group-dim terms = 8,000,000 + 4·(q−c)² — so the
    // top-3 are always the three groupmates, ordered by |q−c|
    // ascending with vec_id breaking the tie, and the adc_dist VALUES
    // are exact integers.
    val got = SparkEntry.queries("sim_pq_adc")(spark, pqFixture)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("vec_id")),
        r.getLong(r.fieldIndex("adc_dist"))))
      .sortBy(t => (t._1, t._2))
    val expected = for {
      q <- 0 until 8
      (c, rank) <- (q / 4 * 4 until q / 4 * 4 + 4).filter(_ != q)
        .sortBy(c => (4L * (q - c) * (q - c), c.toLong)).zipWithIndex
    } yield (q.toLong, rank + 1, c.toLong, 4L * (q - c) * (q - c))
    assert(got.toSeq == expected.toSeq,
      s"adc mismatch:\ngot      ${got.toSeq}\nexpected $expected")
  }

  test("sim_cosine_topk on the same fixture: brute-force top-5 is the " +
      "three groupmates then vectors 15 and 14") {
    // Cross-group cosine is jitter-only: 4·j_q·j_c ≤ 5.2e-4 ≪ 4, so
    // ranks 1-3 are the groupmates (descending id) and ranks 4-5 are
    // the two largest-jitter NON-group vectors — 15 then 14 for every
    // query (queries are ids 0-7; 14 and 15 are never groupmates).
    val got = SparkEntry.queries("sim_cosine_topk")(spark, pqFixture)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")),
        r.getInt(r.fieldIndex("rank")),
        r.getLong(r.fieldIndex("vec_id")),
        r.getDouble(r.fieldIndex("sim"))))
      .sortBy(t => (t._1, t._2))
    val expected = for {
      q <- 0 until 8
      (c, rank) <- ((q / 4 * 4 until q / 4 * 4 + 4)
        .filter(_ != q).sortBy(-_) ++ Seq(15, 14)).zipWithIndex
    } yield {
      val sim = if (c / 4 == q / 4) 4.0 + 4.0 * jit(q).toDouble * jit(c).toDouble
        else 4.0 * jit(q).toDouble * jit(c).toDouble
      (q.toLong, rank + 1, c.toLong, sim)
    }
    assert(got.length == expected.length,
      s"expected ${expected.length} rows, got ${got.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
        s"row mismatch: got $g expected $e")
      assert(math.abs(g._4 - e._4) < 1e-9, s"sim mismatch: $g vs $e")
    }
  }

  test("text-analysis family on hand-computed documents: token " +
      "counts, quality features, langid, and fingerprints match paper " +
      "arithmetic") {
    // Three documents small enough to work every number by hand:
    //   doc 1 "the cat and the dog. it ran!"
    //     ws tokens 7; bpe tokens 9 (7 words + '.' + '!'); chars 28;
    //     stopword hits: ' the ' x1 + ' and ' x1 = 2 (the LEADING
    //     'the' has no left space — the marker is space-delimited);
    //     punct 2; chars/token 28/7 = 4.0; stop density 200/7;
    //     langid: en=2, de=0, es=0 -> 'en'
    //   doc 2 "der hund und der ball"
    //     ws 5, bpe 5, chars 21, stop 0, punct 0; de=2 -> 'de'
    //   doc 3 "xy"
    //     ws 1, bpe 1, chars 2; all marker hits 0 -> tie -> 'en';
    //     fingerprint BY HAND: 0*31 + ascii('x')*256 + len("xy")
    //       = 120*256 + 2 = 30722 (one token, no modulus wrap).
    // Fingerprints for docs 1-2 computed externally with the published
    // Rabin-Karp fold (base 31, token contribution ascii(first)*256 +
    // len, mod 2^31-1): 1942194900 and 845468334 — doc 1 step one:
    // 0*31 + 116*256 + 3 = 29699, then fold the remaining 6 tokens.
    val dir = java.nio.file.Files.createTempDirectory("graft-indep-tx")
    val rows = Seq(
      Row(1L, "the cat and the dog. it ran!", "en", "t", 28L),
      Row(2L, "der hund und der ball", "de", "t", 21L),
      Row(3L, "xy", "en", "t", 2L))
    writeFixture(rows, docSchema, dir, "documents")
    val d = dir.toString

    val tok = SparkEntry.queries("text_token_count")(spark, d).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getInt(r.fieldIndex("ws_tokens")),
        r.getInt(r.fieldIndex("bpe_tokens")))).sortBy(_._1)
    assert(tok.toSeq == Seq((1L, 7, 9), (2L, 5, 5), (3L, 1, 1)),
      s"token counts: ${tok.toSeq}")

    val q = SparkEntry.queries("text_quality_score")(spark, d).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getInt(r.fieldIndex("n_tokens")),
        r.getInt(r.fieldIndex("n_stopwords")),
        r.getInt(r.fieldIndex("n_punct")),
        r.getDouble(r.fieldIndex("chars_per_token")),
        r.getDouble(r.fieldIndex("stop_density")))).sortBy(_._1)
    val qe = Seq((1L, 7, 2, 2, 4.0, 200.0 / 7.0),
      (2L, 5, 0, 0, 4.2, 0.0), (3L, 1, 0, 0, 2.0, 0.0))
    q.zip(qe).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4,
        s"quality ints: got $g expected $e")
      assert(math.abs(g._5 - e._5) < 1e-9 && math.abs(g._6 - e._6) < 1e-9,
        s"quality doubles: got $g expected $e")
    }

    val lid = SparkEntry.queries("text_langid")(spark, d).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("pred_lang")))).sortBy(_._1)
    assert(lid.toSeq == Seq((1L, "en"), (2L, "de"), (3L, "en")),
      s"langid: ${lid.toSeq}")

    val fp = SparkEntry.queries("text_fingerprint")(spark, d).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("fingerprint")))).sortBy(_._1)
    assert(fp.toSeq == Seq((1L, 1942194900L), (2L, 845468334L),
      (3L, 30722L)), s"fingerprints: ${fp.toSeq}")
  }

  test("dedup family on hand documents: identical texts MUST pair at " +
      "jaccard 1.0; disjoint vocabulary must not pair") {
    // Construction argument, no hash arithmetic needed: docs 1 and 2
    // share EVERY word-3-shingle (identical text), so their minhash
    // signatures are identical slot for slot -> identical band keys in
    // every band -> the pair is a candidate with certainty, est = 1.0,
    // and exact shingle-set jaccard = 1.0. Doc 3 shares NO token with
    // them, so no shingle, so exact jaccard with either would be 0 and
    // the 0.3-class verification cut drops it even in the
    // astronomically unlikely event of a full band-key hash collision.
    // dedup_exact on the same fixture is pure set arithmetic: the
    // identical pair groups to (keep_id 1, 2 copies), doc 3 stays a
    // singleton.
    val dir = java.nio.file.Files.createTempDirectory("graft-indep-mh")
    val t12 = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = Seq(
      Row(1L, t12, "en", "t", t12.length.toLong),
      Row(2L, t12, "en", "t", t12.length.toLong),
      Row(3L, "one two three four five six seven eight", "en", "t", 39L))
    writeFixture(rows, docSchema, dir, "documents")
    val d = dir.toString

    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, d)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("doc_a")),
        r.getLong(r.fieldIndex("doc_b")),
        r.getDouble(r.fieldIndex("exact_jaccard")),
        r.getBoolean(r.fieldIndex("est_ok"))))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0, true)),
      s"expected exactly the identical pair at 1.0: ${pairs.toSeq}")

    val exact = SparkEntry.queries("dedup_exact")(spark, d).collect()
      .map(r => (r.getLong(r.fieldIndex("keep_id")),
        r.getLong(r.fieldIndex("n_copies")))).sortBy(_._1)
    assert(exact.toSeq == Seq((1L, 2L), (3L, 1L)),
      s"exact dedup groups: ${exact.toSeq}")
  }

  test("corpus_quality_classifier on hand-computed documents: " +
      "features, weights, and keep decisions match paper arithmetic") {
    // Expected values computed BY HAND from the published algorithm
    // (31-fold char hash mod P=1048573, bigram combine h1·131+h2 mod P,
    // LCG weight ((h·1103515245+12345) mod 2^31) mod 2001 − 1000):
    //   "ab cd":  uh = [3105, 3169]  (97·31+98, 99·31+100)
    //             bigram = 3105·131+3169 = 409924
    //             weights = [-410, -182, 803] → w_sum 211, n 3,
    //             score 70.333333, keep TRUE
    //   "a":      uh = [97] → weight 666 → (1, 666, 666.0, TRUE)
    //   "zz top zz": uh = [3904, 115029, 3904], bigrams = [626453,
    //             392681], weights = [340, 890, 340, 871, 813]
    //             → (5, 3254, 650.8, TRUE)
    //   "go go":  uh = [3304, 3304] (103·31+111), bigram = 436128,
    //             weights = [-713, -713, -456]
    //             → (3, -1882, -627.333333, FALSE)
    //   "" and "   ": no tokens → excluded from the result entirely.
    val dir = java.nio.file.Files.createTempDirectory("graft-indep-qc")
    val rows = Seq(
      Row(1L, "ab cd", "en", "t", 5L),
      Row(2L, "a", "en", "t", 1L),
      Row(3L, "zz top zz", "en", "t", 9L),
      Row(4L, "go go", "en", "t", 5L),
      Row(5L, "", "en", "t", 0L),
      Row(6L, "   ", "en", "t", 3L))
    writeFixture(rows, docSchema, dir, "documents")
    val got = SparkEntry.queries("corpus_quality_classifier")(
      spark, dir.toString).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getInt(r.fieldIndex("n_features")),
        r.getLong(r.fieldIndex("w_sum")),
        r.getDouble(r.fieldIndex("score_avg")),
        r.getBoolean(r.fieldIndex("keep"))))
      .sortBy(_._1)
    val expected = Seq(
      (1L, 3, 211L, 70.333333, true),
      (2L, 1, 666L, 666.0, true),
      (3L, 5, 3254L, 650.8, true),
      (4L, 3, -1882L, -627.333333, false))
    assert(got.length == 4, s"docs 5 and 6 must be excluded: $got")
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 &&
        g._5 == e._5, s"got $g expected $e")
      assert(math.abs(g._4 - e._4) < 1e-9,
        s"score mismatch for doc ${g._1}: got ${g._4} expected ${e._4}")
    }
  }
}
