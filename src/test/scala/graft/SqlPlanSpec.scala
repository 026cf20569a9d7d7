package graft

import graft.queries.SqlInterface

/** Plan-shape contracts for the TPC-H-style SQL surface. Correctness is
  * the driver's DuckDB gate; these specs pin the SCALE properties — the
  * plan shapes that decide whether the same query survives 100 TB. */
class SqlPlanSpec extends SparkSpec {

  private def run(name: String) =
    SqlInterface.queries(name)(spark, sf001)

  test("q10 joins facts with shuffles and broadcasts only the dim") {
    val df = run("sql_tpch_q10")
    val phys = df.queryExecution.executedPlan.toString
    // nation is the only broadcast; lineitem/orders must NOT be a
    // broadcast build side (fact-table broadcast = OOM at scale)
    assert(phys.contains("BroadcastHashJoin"), phys.take(500))
    assert(phys.contains("SortMergeJoin"), phys.take(500))
    assert(!phys.contains("CartesianProduct"))
    assert(df.count() == 20)
  }

  test("q17 decorrelates the scalar subquery into one aggregate+join") {
    val df = run("sql_tpch_q17")
    val phys = df.queryExecution.executedPlan.toString
    // Catalyst must rewrite the correlated subquery as a per-partkey
    // aggregate joined to the probe side — a nested-loop re-execution
    // per outer row would be quadratic at scale. The only BNLJ-free
    // evidence: no nested-loop join, no cartesian, and the l_partkey
    // aggregate feeding a join on partkey.
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(800))
    assert(!phys.contains("CartesianProduct"))
    assert(phys.contains("HashAggregate"))
    assert(df.count() == 1)
  }

  test("q18 plans the IN-subquery as a left semi join") {
    val df = run("sql_tpch_q18")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("LeftSemi"), phys.take(800))
    assert(!phys.contains("BroadcastNestedLoopJoin"))
    val n = df.count()
    assert(n > 0 && n <= 100, s"expected (0,100] rows, got $n")
  }
}
