package graft

/** Plan-shape contracts for the round-8 additions — the properties that
  * decide whether the same declaration survives 100 TB. Correctness is
  * the driver's DuckDB gate; these pin the physical strategy. */
class PlanShapeSpec extends SparkSpec {

  private def phys(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.executedPlan.toString

  test("neighbor jaccard: adjacency joins broadcast, top-k is TakeOrdered") {
    val p = phys("graph_neighbor_jaccard")
    // both adjacency attaches probe a broadcast node-sized relation —
    // the edge stream must never shuffle for the join
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("CartesianProduct"))
    // top-20 must be a streaming top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("ohlc bars: both windows and the aggregate share one shuffle") {
    val df = SparkEntry.queries("ts_downsample_ohlc")(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    // one hashpartitioning exchange on (user, hour); the second window
    // and the final aggregate reuse the distribution
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n" +
      p.take(1200))
  }

  test("incremental dedup: probe joins stay equi-hash, no pair explosion shape") {
    val p = phys("dedup_incremental_update")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("kcore peel: every cut restricts via broadcast, never a shuffle join") {
    val p = phys("graph_kcore_peel")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), p.take(600))
    assert(!p.contains("CartesianProduct"))
  }
}
