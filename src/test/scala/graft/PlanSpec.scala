package graft

/** Physical-plan gates: the properties that make these the RIGHT plans at
  * 100 TB, asserted on the executed plan string so a regression is a test
  * failure, not a bench surprise.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.executedPlan.toString

  test("q02: filters are pushed to the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), "scan advertises pushdown")
    // (the plan string truncates long filter lists — match prefixes)
    assert(p.contains("GreaterThanOrEqual(l_quantity"), "quantity predicate pushed")
    assert(p.contains("IsNotNull(l_returnflag)"), "returnflag predicate pushed")
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = plan("q03_join_agg")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "no shuffle join for broadcastable dims")
  }

  test("q28: no cartesian/broadcast-nested-loop of the corpus") {
    val p = plan("q28_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no BNLJ")
    assert(!p.contains("CartesianProduct"), "no cartesian")
  }

  test("q25: minhash signatures are persisted (computed once, not per join side)") {
    val p = plan("q25_minhash_pairs")
    assert(p.contains("InMemoryTableScan"), "signature frame cached")
  }

  test("q30/q31: top-k is aggregated, never a per-query window sort") {
    assert(!plan("q30_ann_brute").contains("Window"))
    assert(!plan("q31_ann_lsh").contains("Window"))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
