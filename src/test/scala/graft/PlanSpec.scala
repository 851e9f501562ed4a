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

  test("q84/q85: sampled trainer and blocked semdedup keep corpus joins equi, top-k heaped") {
    // the trainer's only non-equi join is the 1-row count frame (the lazy
    // scalar pattern); the corpus-sized joins — cell candidates, blocked
    // pair expansion — must never plan a BNLJ over the corpus itself, and
    // ranking must stay the bounded-heap aggregate, not a window sort
    for (q <- Seq("q84_ann_ivf_sampled", "q85_semdedup_balanced")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: no cartesian")
      assert(!p.contains("Window"), s"$q: no window sort")
      val bnljs = p.split("BroadcastNestedLoopJoin").length - 1
      // one BNLJ per 1-row count/centroid broadcast is the lazy-scalar
      // pattern; a corpus-vs-corpus BNLJ would explode this count — the
      // q28 fixture bound (<= the trainer's scalar joins) pins it
      assert(bnljs <= 8, s"$q: $bnljs BNLJs — corpus join degraded to nested loop")
    }
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

  test("packAcrossAuto: derived bucket count adds no global sort or shuffle-join") {
    // the count that derives n_buckets must arrive as a broadcast one-row
    // frame (a BNLJ against a single row is the right plan — it is the
    // 'attach a scalar' shape, not a join blowup), and the packing itself
    // stays a bucket-hash window exactly like the fixed-bucket form
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
    val p = graft.operators.SequencePack
      .packAcrossAuto(docs, budget = 256, targetDocsPerBucket = 64)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), s"bucket count not broadcast: $p")
    assert(p.contains("hashpartitioning(bucket"), s"expected bucket-hash exchange: $p")
    assert(!p.contains("rangepartitioning"), s"global sort in packAcrossAuto plan: $p")
    assert(!p.contains("CartesianProduct"), "no cartesian")
  }

  test("composed pipeline: no cartesian and no global sort anywhere") {
    // six stages chained (q65 without its presentation orderBy): every
    // join in the composition must stay an equi-join and every sort stay
    // partition-local — one accidental cross join or rangepartitioning
    // here multiplies at 100 TB
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
    val p = graft.operators.Pipeline
      .trainingData(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "no cartesian in pipeline")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no BNLJ in pipeline")
    assert(!p.contains("rangepartitioning"), s"global sort in pipeline plan: $p")
  }

  test("q57: incremental dedup stays equi-join + anti-join — no cartesian") {
    val p = plan("q57_dedup_against")
    assert(!p.contains("CartesianProduct"), "no cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no BNLJ")
  }

  test("mixing-tail plans: no cartesian; benchmark sides broadcast; budget plan BNLJ-free") {
    for (
      q <- Seq(
        "q93_token_budget",
        "q95_dsir_resample",
        "q96_redact_overlaps",
        "q98_curriculum_plan",
        "q99_bench_exposure"
      )
    ) {
      assert(!plan(q).contains("CartesianProduct"), s"$q: no cartesian")
    }
    // the gram indexes are benchmark-sized — they must broadcast, never
    // shuffle the corpus on a gram key
    assert(plan("q96_redact_overlaps").contains("BroadcastHashJoin"), "q96 index broadcasts")
    assert(plan("q99_bench_exposure").contains("BroadcastHashJoin"), "q99 index broadcasts")
    // the budget plan has no nested-loop join anywhere; the resample
    // plan's ONLY nested loop is the 1-row total (scalar cross join)
    assert(!plan("q93_token_budget").contains("BroadcastNestedLoopJoin"), "q93 BNLJ-free")
    val bnlj = plan("q95_dsir_resample").split('\n').filter(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj.forall(_.contains("Cross")), s"q95 BNLJ must be the scalar cross join: ${bnlj.toSeq}")
  }

  test("mixCorpus: every corpus-sized join is an equi-join; nested loops are scalar-only") {
    val docs = graft.sources.Tables.load(spark, Sf0001, "documents")
    val bucket = graft.functions.GraftExpressions.poly_hash(
      org.apache.spark.sql.functions.col("text")
    ) % 10
    val p = graft.operators.Pipeline
      .mixCorpus(docs.filter(bucket < 9), docs.filter(bucket >= 9), 300L, 4)
      .queryExecution
      .executedPlan
      .toString
    assert(!p.contains("CartesianProduct"), "no cartesian in the mixing pipeline")
    val bnlj = p.split('\n').filter(_.contains("BroadcastNestedLoopJoin"))
    assert(
      bnlj.forall(_.contains("Cross")),
      s"every nested loop must be a 1-row scalar cross join: ${bnlj.toSeq}"
    )
    assert(!p.contains("rangepartitioning"), "no global sort in the mixing pipeline")
  }

  test("deid-tier plans: census broadcasts in the serve join; risk audit is ONE cube pass; t-closeness never sorts the corpus globally") {
    // q169: the cell-cardinality-bounded census must broadcast back onto
    // the (unshuffled) late slice
    val p169 = plan("q169_suppress_serve")
    assert(p169.contains("BroadcastHashJoin") || p169.contains("BroadcastNestedLoopJoin"),
      s"census join must broadcast:\n$p169")
    // q171: one Expand (the cube) feeding aggregates — per-subset rescans
    // would show as multiple parquet scans
    val p171 = plan("q171_risk_audit")
    assert(p171.contains("Expand"), "cube lowered to one Expand pass")
    assert("Scan parquet".r.findAllIn(p171).size == 1, s"risk audit reads the table once:\n$p171")
    // q172: windows are cell-partitioned (domain-bounded per cell) — a
    // global Window over the corpus would be the scale-killer shape. The
    // only un-partitioned window is over the DOMAIN-bounded global
    // distribution frame (m rows), which the plan shows under the
    // broadcast exchange.
    val p172 = plan("q172_t_closeness")
    assert(p172.contains("BroadcastExchange"), "domain frame broadcasts")
  }

  test("q180/q184: DP census/sums are join-free — one quasi-key aggregate, noise scan-side") {
    // the mechanism must add NOTHING to the census's scale shape: one
    // HashAggregate (map-side partials) and a projection probing the
    // bounded LUT literal — no join, no window, no second corpus pass
    for (q <- Seq("q180_dp_counts", "q184_dp_sums")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: noise must not join:\n$p")
      assert(!p.contains("Window"), s"$q: noise must not window:\n$p")
      assert(p.contains("HashAggregate"), s"$q: the census aggregate")
      assert("Scan parquet".r.findAllIn(p).size == 1, s"$q: one table read:\n$p")
    }
  }

  test("q183: closed-domain DP histogram joins the cell-bounded census under a broadcast") {
    // the domain and the census are both cell-cardinality bounded; the
    // dense left join must broadcast, and the corpus is read only for
    // the census aggregate (plus the two domain-marginal distincts)
    val p = plan("q183_dp_closed_hist")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"domain/census join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join of cell-bounded frames:\n$p")
    assert(!p.contains("Window"), s"no window:\n$p")
  }

  test("q186/q188: user-level DP — entity-partitioned bound with rank pushdown, noise join-free, guard broadcast-scalar") {
    for (q <- Seq("q186_dp_user_counts", "q188_dp_user_sums")) {
      val p = plan(q)
      assert(p.contains("Window"), s"$q: the contribution bound is a window")
      // the window partitions by the entity key (per-entity sort, bounded by
      // entity fan-out) — an UNpartitioned window here would be the global
      // single-partition sort that dies at scale
      assert(p.contains("hashpartitioning(o_custkey"), s"$q: bound window must partition by entity:\n$p")
      // the rank-limit PUSHDOWN must survive (r18): WindowGroupLimit
      // pre-prunes each entity to its top `cap` rows map-side, which is
      // what keeps a skewed hot entity from shuffling and sorting all
      // its rows — the duplicate-id guard was specifically designed as a
      // separate aggregate so no second window function disables this
      assert(p.contains("WindowGroupLimit"), s"$q: rank-limit pushdown lost:\n$p")
      assert(p.contains("HashAggregate"), s"$q: the census aggregate")
      // r18 duplicate-id guard shape: exactly TWO reads — the release
      // read plus the guard's COLUMN-PRUNED (entity, id) multiplicity
      // scan — and exactly one join, the 1-row broadcast-scalar guard
      // crossed in as an unprunable filter. The noise path itself still
      // joins nothing (no hash/merge join anywhere in the plan).
      assert("Scan parquet".r.findAllIn(p).size == 2, s"$q: release read + pruned guard read:\n$p")
      assert(
        "BroadcastNestedLoopJoin".r.findAllIn(p).size == 1,
        s"$q: exactly the scalar guard join:\n$p"
      )
      assert(
        !p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"$q: noise must not join:\n$p"
      )
      assert(
        p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"),
        s"$q: guard read must prune to (entity, id):\n$p"
      )
    }
  }

  test("q189: DP quantiles post-process the census — cell-partitioned windows, no join, one scan") {
    val p = plan("q189_dp_quantiles")
    assert(!p.contains("Join"), s"q189: post-processing must not join:\n$p")
    // the cumulative/total windows partition by the quasi cell (band-bounded
    // frames) — an unpartitioned window would be a global sort
    assert(p.contains("hashpartitioning(c_mktsegment"), s"q189: windows partition by the cell:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"q189: one table read:\n$p")
  }

  test("q190: DP means FULL-OUTER two CELL-BOUNDED releases — support mismatch surfaces, never crosses") {
    val p = plan("q190_dp_means")
    // r15: the release join is FULL OUTER (mismatched support must surface
    // as NULL-sided rows, r14 ADVICE) — full outer cannot broadcast in
    // Spark, and that is fine AT ANY SCALE because both join inputs are
    // post-aggregate release frames (rows = released cells, never corpus
    // rows); the corpus-sized work stays in the two census aggregates
    // upstream of the join
    assert(p.contains("FullOuter"), s"release join must be full outer:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"never a cross of anything:\n$p")
    // both join children are aggregates (cell-bounded), not scans: the
    // corpus never shuffles through the join
    assert("Scan parquet".r.findAllIn(p).size == 2, s"one read per release:\n$p")
    assert(p.contains("HashAggregate"), s"join inputs are census aggregates:\n$p")
  }

  test("q187: the DP ledger never shuffles a corpus — censuses aggregate, manifests are 1-row frames") {
    val p = plan("q187_dp_ledger")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"ledger must not shuffle-join or cross anything:\n$p")
    // two releases → the customer table is read once per census, nothing more
    assert("Scan parquet".r.findAllIn(p).size == 2, s"q187: one read per release:\n$p")
    // the running-ε window runs over the RELEASE-count frame (rows = number
    // of releases, bounded by construction — the documented exception to
    // the no-global-window rule)
    assert(p.contains("Window"), "the ledger's cumulative budget window")
  }

  test("q192: budget enforcement adds no corpus work — censuses aggregate, the guard rides the ledger window") {
    val p = plan("q192_dp_budget")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"ledger must not shuffle-join or cross anything:\n$p")
    // three releases → three census scans, nothing more
    assert("Scan parquet".r.findAllIn(p).size == 3, s"q192: one read per release:\n$p")
    // the per-domain cumulative window + the assert-bearing filter both
    // survive into the executed plan (the guard is not optimized away)
    assert(p.contains("Window"), "per-domain cumulative budget window")
    // assert_true lowers to if(cond) null else raise_error(...) — the
    // raise_error in the Filter IS the surviving guard
    assert(p.contains("raise_error") && p.contains("DP budget exceeded"),
      s"the budget guard must survive planning:\n${p.take(3000)}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // ---- global-window discipline (VERDICT r14 №6) -----------------------
  // A Window with an EMPTY partition spec is a single-partition sort of its
  // whole input — fine over a census/domain/release-bounded frame, fatal
  // over a corpus. Two gates pin the discipline: the SITE INVENTORY below
  // fails the moment anyone adds a new global-window construction to main
  // (forcing them to justify its bounded input here), and the plan gate
  // after it checks every site's actual optimized plan keeps an AGGREGATE
  // between the global window and any scan — the structural property that
  // makes the window input aggregate-bounded rather than corpus-sized.

  test("global-window SITE INVENTORY: every unpartitioned window in main is enumerated + justified") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala/graft")
    val direct = raw"Window\s*\.\s*orderBy".r // Window.orderBy with no partitionBy in the chain
    val emptyPart = raw"Window\s*\.\s*partitionBy\(\)".r // explicit empty partition spec
    val walk = Files.walk(root)
    val found =
      try
        walk.iterator().asScala
          .filter(_.toString.endsWith(".scala"))
          .map { p =>
            val s = Files.readString(p)
            root.relativize(p).toString ->
              (direct.findAllIn(s).size + emptyPart.findAllIn(s).size)
          }
          .filter(_._2 > 0)
          .toMap
      finally walk.close()
    val inventory = Map(
      // packedOffsets: prefix sum over BUCKET sums (≤ `buckets` rows)
      "operators/SequencePack.scala" -> 1,
      // waterfillBudgets: supply frame + its total (≤ |sources| rows)
      "operators/Sampling.scala" -> 2,
      // rankTop: ONE query's posting-bounded score frame (per-doc agg below)
      "operators/Retrieval.scala" -> 1,
      // build/subwordVocab: vocab-bounded symbol/token rank (tf agg below)
      "operators/Vocabulary.scala" -> 2,
      // rarityBuckets: bucket-bounded rarity table
      "operators/NgramLM.scala" -> 1,
      // dpTopK (cell-bounded release rank), dpLedger (release-count cum ε),
      // tClosenessAudit global distribution: domain cum + m/n totals (×3),
      // tClosenessCategorical domain total — every input census/domain-bounded
      "operators/Deidentify.scala" -> 6
    )
    assert(found === inventory,
      s"global-window sites changed: $found — a NEW unpartitioned window needs its bounded-input " +
        "justification added HERE and coverage in the aggregate-below-global-window plan gate")
  }

  test("every global window in the gated plans sits above an aggregate — never directly over a corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // the gates that exercise every inventory site end-to-end
    val gates = Seq(
      "q172_t_closeness", // Deidentify.tClosenessAudit (domain cum + totals)
      "q177_t_closeness_cat", // Deidentify.tClosenessCategorical (domain total)
      "q187_dp_ledger", "q192_dp_budget", // Deidentify.dpLedger/enforceBudget
      "q191_dp_topk", // Deidentify.dpTopK
      "q103_bm25", // Retrieval.rankTop
      "q123_waterfill_budget", // Sampling.waterfillBudgets
      "q130_pack_ids", "q131_pack_across", "q155_pack_boundaries", // SequencePack.packedOffsets
      "q90_rarity_buckets", // NgramLM.rarityBuckets
      "q100_bpe_merges", "q134_wp_greedy_encode" // Vocabulary.build/subwordVocab
    )
    var seen = 0
    gates.foreach { q =>
      val lp = SparkEntry.queries(q)(spark, Sf0001).queryExecution.optimizedPlan
      lp.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          seen += 1
          assert(
            w.child.collectFirst { case a: Aggregate => a }.isDefined,
            s"$q: global window over NON-AGGREGATED input — a corpus-wide single-partition sort:\n$w"
          )
        case _ =>
      }
    }
    // the gate must actually be exercising the sites, not vacuously passing
    assert(seen >= 8, s"expected the inventory's global windows in these plans, saw only $seen")
  }
}
