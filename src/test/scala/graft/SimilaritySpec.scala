package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** ANN quality checks the oracle can't express: SRP-LSH bucket recall
  * against brute force, signature determinism, cosine identity. */
class SimilaritySpec extends SparkSpec {

  test("cosine of a vector with itself is 1") {
    val emb = Tables.embeddings(spark, sf0001).limit(10)
    val r = emb.select(Similarity.cosine(col("embedding"), col("embedding"))
      .as("c")).collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-6))
  }

  test("srp signature deterministic and within 0..255") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val a = emb.select(col("vec_id"), Similarity.srpSignature(col("embedding"))
      .as("sig")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = emb.select(col("vec_id"), Similarity.srpSignature(col("embedding"))
      .as("sig")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    a.values.foreach(s => assert(s >= 0 && s < 256))
  }

  test("identical vectors share an LSH bucket; brute-force top1 is sane") {
    val emb = Tables.embeddings(spark, sf0001)
    // brute-force top-1 per query: similarity must be the max
    val top1 = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 4), 1)
      .select(col("query_id"), col("sim")).collect()
    assert(top1.length == 4)
    top1.foreach(r => assert(r.getDouble(1) <= 1.0 + 1e-6))
    // SRP property: identical embeddings → identical signatures, so a
    // vector joined with itself always lands in its own bucket
    val sigs = emb.select(col("vec_id"),
      Similarity.srpSignature(col("embedding")).as("sig"))
    assert(sigs.groupBy(col("sig")).count().count() > 1,
      "signatures should spread across multiple buckets")
  }

  test("semdedup: per-cluster accounting is consistent and non-vacuous") {
    val r = Similarity.queries("dedup_semdedup")(spark, sf0001)
      .select(col("cent_id"), col("n_vectors"), col("n_dropped"),
        col("n_kept")).collect()
    assert(r.nonEmpty)
    // kept + dropped = size per cluster; never drop a whole cluster
    // (the min-id member has no smaller-id neighbor, so it survives)
    r.foreach { row =>
      assert(row.getLong(1) == row.getLong(2) + row.getLong(3))
      assert(row.getLong(3) >= 1, s"cluster ${row.getLong(0)} lost all members")
    }
    // cluster sizes must sum to the corpus
    val n = Tables.embeddings(spark, sf0001).count()
    assert(r.map(_.getLong(1)).sum == n)
  }

  test("semdedup cellPairCap: a non-binding cap is row-identical to " +
      "the exact form; a binding cap only ever drops FEWER duplicates") {
    // the linear-envelope escape hatch (VERDICT r14 #1): capped pairs
    // compare each vector against only the C nearest preceding cell
    // members — with C >= max cell size the banded join degenerates to
    // the exact unbounded one and the committed-oracle result must be
    // IDENTICAL, row for row
    def rows(capped: Option[Int]) = {
      capped match {
        case Some(c) =>
          spark.conf.set("spark.graft.semdedup.cellPairCap", c.toString)
        case None => spark.conf.unset("spark.graft.semdedup.cellPairCap")
      }
      try Similarity.queries("dedup_semdedup")(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      finally spark.conf.unset("spark.graft.semdedup.cellPairCap")
    }
    val exact = rows(None)
    assert(rows(Some(1000000)) == exact,
      "a cap beyond every cell size must not change a single row")
    // a binding cap is a candidate-pair SUBSET: every cluster keeps at
    // least as many members (a missed witness can only un-drop)
    val capped = rows(Some(1)).map(t => t._1 -> t._3).toMap
    val exactD = exact.map(t => t._1 -> t._3).toMap
    assert(capped.keySet == exactD.keySet, "same clusters either way")
    capped.foreach { case (cell, d) =>
      assert(d <= exactD(cell),
        s"cell $cell: capped form dropped MORE ($d > ${exactD(cell)})")
    }
  }

  test("embedding-cosine srpBlockBits: 8 is the committed form; wider " +
      "blocking yields a strict subset of pairs with identical cosines") {
    def pairs(bits: Option[Int]) = {
      bits match {
        case Some(b) =>
          spark.conf.set("spark.graft.dedup.srpBlockBits", b.toString)
        case None => spark.conf.unset("spark.graft.dedup.srpBlockBits")
      }
      try Similarity.queries("dedup_embedding_cosine")(spark, sf0001)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      finally spark.conf.unset("spark.graft.dedup.srpBlockBits")
    }
    val committed = pairs(None)
    assert(pairs(Some(8)) == committed, "bits=8 must be the default form")
    val wide = pairs(Some(12))
    // the first 8 planes are a prefix of the 12-bit signature: equal
    // 12-bit blocks imply equal 8-bit blocks, so wide ⊆ committed
    assert(wide.keySet.subsetOf(committed.keySet),
      s"wide blocking must not invent pairs: ${wide.keySet -- committed.keySet}")
    wide.foreach { case (k, sim) =>
      assert(sim == committed(k), s"pair $k cosine drifted")
    }
  }

  test("ivf nprobe: 1 is row-identical to the committed single-cell " +
      "form; more probes only improve every query's best candidate") {
    def withNprobe[A](n: Option[Int])(body: => A): A = {
      n match {
        case Some(v) => spark.conf.set("spark.graft.ivf.nprobe", v.toString)
        case None => spark.conf.unset("spark.graft.ivf.nprobe")
      }
      try body finally spark.conf.unset("spark.graft.ivf.nprobe")
    }
    def ivfRows(n: Option[Int]) = withNprobe(n) {
      Similarity.queries("sim_ivf_ann")(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    val committed = ivfRows(None)
    assert(ivfRows(Some(1)) == committed,
      "nprobe=1 must be the committed form bit for bit")
    // nprobe=4: candidates are a superset (3 extra whole cells), so
    // the rank-1 similarity can only rise, per query
    val best1 = committed.filter(_._2 == 1).map(t => t._1 -> t._4).toMap
    val best4 = ivfRows(Some(4)).filter(_._2 == 1)
      .map(t => t._1 -> t._4).toMap
    assert(best4.keySet == best1.keySet)
    best1.foreach { case (q, s1) =>
      assert(best4(q) >= s1 - 1e-12,
        s"query $q: nprobe=4 best ${best4(q)} < single-cell best $s1")
    }
    // the ADC path routes through the same probe set: rank-1 distance
    // can only shrink
    def adcBest(n: Option[Int]) = withNprobe(n) {
      Similarity.queries("sim_ivfpq_ann")(spark, sf0001).collect()
        .filter(_.getInt(1) == 1)
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
    }
    val (a1, a4) = (adcBest(None), adcBest(Some(4)))
    assert(a4.keySet == a1.keySet)
    a1.foreach { case (q, d1) =>
      assert(a4(q) <= d1, s"query $q: nprobe=4 adc ${a4(q)} > $d1")
    }
  }

  test("ivfpq candidates come from the query's cell; adc ranks ascend") {
    val res = Similarity.queries("sim_ivfpq_ann")(spark, sf0001).collect()
    assert(res.nonEmpty)
    val byQ = res.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      // adc_dist non-decreasing in rank; ranks are 1..n without gaps
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val dists = sorted.map(_.getLong(3))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
    // flat ADC (scans every code) can only be at least as good as the
    // cell-restricted search per query at rank 1
    val flat = Similarity.queries("sim_pq_adc")(spark, sf0001)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    byQ.foreach { case (q, rows) =>
      val best = rows.map(_.getLong(3)).min
      flat.get(q).foreach(fb => assert(fb <= best,
        s"query $q: flat ADC best $fb worse than cell-restricted $best"))
    }
  }

  test("multi-probe ANN candidates are a superset of single-probe's") {
    // Probing the exact bucket plus all hamming-1 neighbors can only
    // widen each query's candidate set, so per query the result count
    // is at least the single-probe count (both cap at k=3).
    val single = Similarity.queries("sim_lsh_ann")(spark, sf0001)
      .groupBy(col("query_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = Similarity.queries("sim_lsh_ann_multiprobe")(spark, sf0001)
      .groupBy(col("query_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    single.foreach { case (q, n) =>
      assert(multi.getOrElse(q, 0L) >= n,
        s"query $q: multiprobe returned fewer rows than single-probe")
    }
  }

  test("srpSignature refuses widths past 31: an Int shift would wrap " +
      "and silently corrupt the blocking key") {
    val e = intercept[IllegalArgumentException](
      Similarity.srpSignature(col("embedding"), bits = 32))
    assert(e.getMessage.contains("31"), e.getMessage)
    intercept[IllegalArgumentException](
      Similarity.srpSignature(col("embedding"), bits = 0))
  }

  test("servingConfs applies exactly the documented production triple") {
    // the README serving-profile table promises (nprobe=4,
    // shortlist=40, srpBlockBits=12) — this pin keeps the one-call
    // helper and the documentation from drifting apart
    val s2 = spark.newSession()
    Similarity.servingConfs(s2)
    assert(s2.conf.get("spark.graft.ivf.nprobe") == "4")
    assert(s2.conf.get("spark.graft.ivfpq.shortlist") == "40")
    assert(s2.conf.get("spark.graft.dedup.srpBlockBits") == "12")
    // the helper scopes to the session it is handed — the shared spec
    // session must be untouched
    assert(spark.conf.getOption("spark.graft.ivf.nprobe").isEmpty)
  }
}
