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

  test("simhash operators are scan-only — zero exchanges in the plan") {
    // SimHash is a pure per-document function; the one-pass kernel must
    // keep it that way (the r02 explode+groupBy form shuffled per token).
    // The operators are asserted directly — the q27/q39 queries append an
    // orderBy for deterministic oracle output, whose sort Exchange is the
    // query's, not the operator's.
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
    val p27 = graft.operators.Dedup.simhash(docs).queryExecution.executedPlan.toString
    val p39 = graft.operators.Dedup.simhashWeighted(docs).queryExecution.executedPlan.toString
    assert(!p27.contains("Exchange"), s"unweighted simhash shuffles: $p27")
    assert(!p39.contains("Exchange"), s"weighted simhash shuffles: $p39")
  }

  test("sequence packing shuffles by doc hash only — never a global sort") {
    // pack's window is partitioned by doc_id: one hash exchange, with the
    // sort local to each partition. A rangepartitioning exchange would mean
    // a global sort — the thing that dies first at 100 TB. (The q60 query
    // appends an orderBy for deterministic oracle output; the operator is
    // asserted directly, without it.)
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
    val p = graft.operators.SequencePack
      .pack(docs, budget = 96, chunkSize = 64, overlap = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(doc_id"), s"expected doc-hash exchange: $p")
    assert(!p.contains("rangepartitioning"), s"global sort in pack plan: $p")
  }

  test("q57: incremental dedup stays equi-join + anti-join — no cartesian") {
    val p = plan("q57_dedup_against")
    assert(!p.contains("CartesianProduct"), "no cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no BNLJ")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
