package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, TextFunctions}
import graft.operators.Sampling

/** Laws of deterministic balanced per-group sampling. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._
  private val N = 20
  private lazy val docs = sources.Tables.load(spark, Sf001, "documents")

  test("keeps min(n, group size) per group") {
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("total"))
    val kept = Sampling
      .balanced(docs, "lang", N, "text")
      .groupBy("lang")
      .agg(count(lit(1)).as("kept"))
    val bad = sizes
      .join(kept, "lang")
      .filter(col("kept") =!= least(col("total"), lit(N.toLong)))
      .count()
    assert(bad === 0L)
  }

  test("heap aggregate == window-rank reimplementation") {
    // the operator avoids the per-group sort; this is the sorted oracle
    val w = Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)
    val viaWindow = docs
      .select(col("lang"), col("doc_id"), GraftExpressions.poly_hash(col("text")).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= N)
      .select("lang", "doc_id", "h")
    val viaHeap = Sampling.balanced(docs, "lang", N, "text")
    assert(viaHeap.except(viaWindow).count() === 0L)
    assert(viaWindow.except(viaHeap).count() === 0L)
  }

  test("deterministic under repartitioning") {
    val a = Sampling.balanced(docs, "lang", N, "text")
    val b = Sampling.balanced(docs.repartition(17), "lang", N, "text")
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
  }

  test("no rangepartitioning or Window in the physical plan") {
    val p = Sampling.balanced(docs, "lang", N, "text").queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"per-group sort crept back in: $p")
    assert(p.contains("ObjectHashAggregate"), "bounded-heap aggregate plans as ObjectHashAggregate")
  }

  // ------------------------------------------------------- temperatureFlatten

  test("temperatureFlatten: kept set == independently derived threshold predicate") {
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_g"))
    val nMin = counts.agg(min("n_g")).first().getLong(0)
    val expected = docs
      .join(
        counts.select(
          col("lang"),
          floor(sqrt(lit(nMin.toDouble) / col("n_g").cast("double")) * lit(1e6))
            .cast("long")
            .as("thr")
        ),
        "lang"
      )
      .filter(GraftExpressions.poly_hash(col("text")) % 1000000L < col("thr"))
      .select("doc_id")
    val got = Sampling.temperatureFlatten(docs, "lang", "text", 2).select("doc_id")
    assert(got.except(expected).count() === 0L && expected.except(got).count() === 0L)
  }

  test("temperatureFlatten: the rarest group is kept whole; bigger groups thinner") {
    val before = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
    val after = Sampling
      .temperatureFlatten(docs, "lang", "text", 2)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_after"))
    val joined = before.join(after, "lang").collect()
    val minRow = joined.minBy(_.getAs[Long]("n_before"))
    assert(
      minRow.getAs[Long]("n_after") === minRow.getAs[Long]("n_before"),
      "rate 1.0 for the min group means every document survives"
    )
    // keep FRACTION decreases as group size grows (the flattening)
    val fracs = joined
      .sortBy(_.getAs[Long]("n_before"))
      .map(r => r.getAs[Long]("n_after").toDouble / r.getAs[Long]("n_before"))
    assert(
      fracs.head >= fracs.last,
      s"largest group should be thinned hardest: ${fracs.mkString(", ")}"
    )
  }

  test("temperatureFlatten: higher temperature flattens less aggressively") {
    val t2 = Sampling.temperatureFlatten(docs, "lang", "text", 2).count()
    val t4 = Sampling.temperatureFlatten(docs, "lang", "text", 4).count()
    // rate_4 = (n_min/n_g)^(1/4) >= rate_2 = (n_min/n_g)^(1/2) pointwise
    assert(t4 >= t2, s"T=4 must keep at least as much as T=2 ($t4 vs $t2)")
  }

  test("temperatureFlatten: NULL-group documents sample at their derived rate, not dropped") {
    val crafted = Seq(
      (1L, "en", "alpha beta"),
      (2L, "en", "gamma delta"),
      (3L, "en", "epsilon zeta"),
      (4L, "en", "eta theta"),
      (5L, null.asInstanceOf[String], "iota kappa"),
      (6L, null.asInstanceOf[String], "lambda mu")
    ).toDF("doc_id", "lang", "text")
    val kept = Sampling.temperatureFlatten(crafted, "lang", "text", 2)
    // the NULL group is the rarest (2 docs) -> rate 1.0 -> both survive
    assert(kept.filter(col("lang").isNull).count() === 2L)
  }

  test("temperatureFlatten: rejects non-power-of-two temperatures") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureFlatten(docs, "lang", "text", 3)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureFlatten(docs, "lang", "text", 1)
    }
  }

  test("temperatureFlatten: rate table broadcasts — the corpus never shuffles") {
    val p = Sampling
      .temperatureFlatten(docs, "lang", "text", 2)
      .queryExecution
      .executedPlan
      .toString
    assert(p.contains("BroadcastHashJoin"), s"threshold join should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle on group:\n$p")
  }

  // -------------------------------------------------------------- shufflePlan

  test("shufflePlan: a permutation — every doc exactly once, positions dense per shard") {
    val plan = Sampling.shufflePlan(docs, nShards = 8, seed = 7L)
    assert(plan.count() === docs.count())
    assert(plan.select("doc_id").distinct().count() === docs.count())
    // positions are 1..count within each shard (dense ranks)
    val bad = plan
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("position")).as("mx"), min(col("position")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.count() === 0L)
  }

  test("shufflePlan: deterministic across partitionings; seed is a full reshuffle") {
    val a = Sampling.shufflePlan(docs, 8, seed = 7L)
    val b = Sampling.shufflePlan(docs.repartition(13), 8, seed = 7L)
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
    val c = Sampling.shufflePlan(docs, 8, seed = 8L)
    // a different seed must move a substantial fraction of placements
    val moved = a.join(c, Seq("doc_id", "shard", "position"), "left_semi").count()
    assert(moved < docs.count() / 2, s"seed change left $moved placements fixed")
    // ...and must not merely ROTATE the shards: before r08's remix32,
    // polyHash("id:7") vs "id:8" differed by one CONSTANT, so every doc's
    // shard shifted in lockstep (+1 mod 8) — "all placements moved" while
    // the permutation stayed identical. A real reshuffle scatters each
    // old shard across many new shards.
    val fanout = a
      .select(col("doc_id"), col("shard").as("shard_a"))
      .join(c.select(col("doc_id"), col("shard").as("shard_c")), "doc_id")
      .groupBy("shard_a")
      .agg(countDistinct("shard_c").as("targets"))
      .agg(min("targets"))
      .head()
      .getLong(0)
    assert(fanout >= 4L, s"seed change must scatter shards, not rotate them (min fanout $fanout)")
  }

  test("curriculumPlan: same shards as shufflePlan, within-shard order monotone in the score") {
    import spark.implicits._
    val scored = docs.select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tok")
    )
    val cur = Sampling.curriculumPlan(scored, 8, "n_tok", seed = 7L)
    // shard placement is the score-independent content hash — identical
    // to shufflePlan's, so each shard stays an unbiased corpus sample
    val shuf = Sampling.shufflePlan(docs, 8, seed = 7L)
    val placements =
      cur.select("doc_id", "shard").except(shuf.select("doc_id", "shard")).count()
    assert(placements === 0L, "curriculum must not move documents between shards")
    // positions dense per shard, and the score never decreases along them
    val rows = cur
      .join(scored, "doc_id")
      .select("shard", "position", "n_tok")
      .as[(Long, Long, Long)]
      .collect()
      .groupBy(_._1)
    rows.foreach { case (shard, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === (1L to rs.length).toSeq, s"shard $shard not dense")
      val scores = ordered.map(_._3).toSeq
      assert(scores === scores.sorted, s"shard $shard not easy-to-hard: $scores")
    }
  }

  test("curriculumPlan: null scores fail fast") {
    import spark.implicits._
    val bad = Seq((1L, Some(5L)), (2L, None)).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      Sampling.curriculumPlan(bad, 4, "n_tok").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("curriculumPlan")), s"expected the null-score error, got $e")
  }

  test("shufflePlan: null ids fail fast instead of silently colliding") {
    val withNull = docs
      .select(when(col("doc_id") === 0L, lit(null)).otherwise(col("doc_id")).as("doc_id"))
    val e = intercept[Exception] {
      Sampling.shufflePlan(withNull, 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(
      messages(e).exists(_.contains("shufflePlan")),
      s"expected the shufflePlan null-id error, got: $e"
    )
  }

  // ----------------------------------------------------------- capTokenBudget

  test("capTokenBudget == single-window oracle reimplementation") {
    // the operator's two-phase bucketed prefix sum must reproduce the
    // one-big-window reference order exactly
    val w = Window
      .partitionBy("source")
      .orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val oracle = docs
      .select(
        col("doc_id"),
        col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
        GraftExpressions.poly_hash(col("text")).as("h")
      )
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= 800L)
      .select("doc_id", "source", "n_tok", "cum_tok")
    val actual = Sampling.capTokenBudget(docs, 800L)
    assert(actual.except(oracle).count() === 0L)
    assert(oracle.except(actual).count() === 0L)
  }

  test("capTokenBudget: bucket count is a parallelism knob, not a semantics knob") {
    val one = Sampling.capTokenBudget(docs, 800L, buckets = 1)
    val many = Sampling.capTokenBudget(docs, 800L, buckets = 64)
    assert(one.except(many).count() === 0L && many.except(one).count() === 0L)
  }

  test("capTokenBudget: strict prefix — admission never leapfrogs a dropped doc") {
    val admitted = Sampling.capTokenBudget(docs, 800L)
    // per source, the max admitted hash must precede every dropped hash:
    // a later small doc must not slip in after the budget crossed
    val lastIn = admitted
      .join(
        docs.select(col("doc_id"), GraftExpressions.poly_hash(col("text")).as("h")),
        "doc_id"
      )
      .groupBy("source")
      .agg(max(col("h")).as("h_last"))
    val dropped = docs
      .select(
        col("doc_id"),
        col("source"),
        GraftExpressions.poly_hash(col("text")).as("h")
      )
      .join(admitted.select("doc_id"), Seq("doc_id"), "left_anti")
    val leapfrogs = dropped
      .join(lastIn, "source")
      .filter(col("h") < col("h_last"))
      .count()
    assert(leapfrogs === 0L, s"$leapfrogs dropped docs precede an admitted one")
  }

  test("capTokenBudget: degenerate budgets — zero admits none, huge admits all") {
    assert(Sampling.capTokenBudget(docs, 0L).count() === 0L)
    val all = Sampling.capTokenBudget(docs, Long.MaxValue / 4)
    assert(all.count() === docs.count())
    // the final cum_tok per source is that source's exact token total
    val totals = docs
      .groupBy("source")
      .agg(
        sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")).as("expect")
      )
    val bad = all
      .groupBy("source")
      .agg(max(col("cum_tok")).as("got"))
      .join(totals, "source")
      .filter(col("got") =!= col("expect"))
    assert(bad.count() === 0L)
  }

  test("capTokenBudget: deterministic under repartitioning") {
    val a = Sampling.capTokenBudget(docs, 800L)
    val b = Sampling.capTokenBudget(docs.repartition(17), 800L)
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
  }

  test("capTokenBudget: prefix frame broadcasts, windows stay per-bucket") {
    val p = Sampling.capTokenBudget(docs, 800L).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"bucket-prefix join should broadcast:\n$p")
    // every window must be partitioned by (source, bucket) — a window on
    // source alone would serialize each source into one sort task
    val corpusWindows = p.linesIterator.filter(l => l.contains("Window") && l.contains("__h"))
    assert(
      corpusWindows.forall(_.contains("__b")),
      s"corpus-side window not bucket-partitioned:\n$p"
    )
  }

  // ----------------------------------------------------------- waterfill

  test("waterfillBudgets: exact total, per-source bound, max-min fairness, T-monotone") {
    val supplies = docs
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("supply"))
      .as[(String, Long)].collect().toMap
    val totalSupply = supplies.values.sum
    var prev: Map[String, Long] = supplies.view.mapValues(_ => 0L).toMap
    for (t <- Seq(0L, 1L, 7L, totalSupply / 3, totalSupply / 2, totalSupply - 1, totalSupply, totalSupply * 2)) {
      val alloc = Sampling.waterfillBudgets(docs, t)
        .select("source", "alloc").as[(String, Long)].collect().toMap
      // exact conservation
      assert(alloc.values.sum === math.min(t, totalSupply), s"T=$t")
      // never over-allocate a source
      alloc.foreach { case (s, a) => assert(a <= supplies(s) && a >= 0L, s"T=$t source $s") }
      // max-min fairness: an unsatisfied source is within 1 of every allocation
      val unsat = alloc.filter { case (s, a) => a < supplies(s) }
      unsat.foreach { case (s, a) =>
        alloc.values.foreach(other => assert(a >= other - 1, s"T=$t source $s unfair"))
      }
      // raising T never lowers anyone
      alloc.foreach { case (s, a) => assert(a >= prev(s), s"T=$t source $s not monotone") }
      prev = alloc
    }
  }

  test("capTokenBudgetFair: per-source admitted mass <= its allocation; single source == capTokenBudget") {
    val admitted = Sampling.capTokenBudgetFair(docs, 9000L)
    val mass = admitted.groupBy("source").agg(sum("n_tok").as("m"))
      .as[(String, Long)].collect().toMap
    val alloc = Sampling.waterfillBudgets(docs, 9000L)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(mass.nonEmpty)
    mass.foreach { case (s, m) => assert(m <= alloc(s), s"source $s over budget") }
    // one source: the global budget IS the per-source budget
    val one = docs.withColumn("source", lit("only"))
    val fair = Sampling.capTokenBudgetFair(one, 800L).select("doc_id").as[Long].collect().toSet
    val plain = Sampling.capTokenBudget(one, 800L).select("doc_id").as[Long].collect().toSet
    assert(fair === plain)
  }

  test("shardManifest: completeness, density, digest semantics, determinism") {
    val docs = sources.Tables.load(spark, Sf001, "documents").select("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("shard")
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect()
        .toSeq
    val m = rows(Sampling.shardManifest(docs, 8, 42L))
    // completeness: shard counts sum to the corpus; density: positions
    // are exactly 1..n_rows per shard
    assert(m.map(_._2).sum === docs.count())
    m.foreach { case (s, n, maxPos, _, _, _, _) => assert(maxPos === n, s"shard $s not dense") }
    // deterministic under repartitioning
    assert(rows(Sampling.shardManifest(docs.repartition(17), 8, 42L)) === m)
    // a single changed document flips BOTH digests of exactly its shard
    // and leaves every other shard's manifest row identical
    val tweaked = docs.withColumn(
      "text",
      when(col("doc_id") === 3L, concat(col("text"), lit(" tampered"))).otherwise(col("text"))
    )
    val mt = rows(Sampling.shardManifest(tweaked, 8, 42L))
    val changed = m.zip(mt).filter { case (a, b) => a != b }
    assert(changed.size === 1, s"expected exactly one shard to differ, got ${changed.size}")
    val (orig, tamp) = changed.head
    assert(orig._6 !== tamp._6) // content digest moved
    assert(orig._7 !== tamp._7) // order digest moved
    assert(orig._2 === tamp._2) // same row count — counts alone can't see it
    // a different seed reshuffles: the manifest differs
    assert(rows(Sampling.shardManifest(docs, 8, 43L)) !== m)
  }

  test("epochExpand: whole-epoch exactness, fractional mean, monotone draw, dedup-consistent") {
    val docs = sources.Tables.load(spark, Sf001, "documents")
      .select("doc_id", "source", "text")
    // em = 2000 exactly: every doc exactly 2 copies, copy_idx 0 and 1
    val whole = Sampling.epochExpand(docs, "source", Map.empty, "text", defaultMilli = 2000L)
    assert(whole.count() === docs.count() * 2)
    assert(
      whole.groupBy("doc_id").agg(count(lit(1)).as("c"), max("copy_idx").as("m"))
        .filter(col("c") =!= 2 || col("m") =!= 1).count() === 0L
    )
    // em = 0 drops everything; default 1000 is the identity
    assert(Sampling.epochExpand(docs, "source", Map.empty, "text", 0L).count() === 0L)
    assert(Sampling.epochExpand(docs, "source", Map.empty, "text").count() === docs.count())
    // fractional epochs: realized expansion within 10% of e on 500 docs
    val e17 = Sampling.epochExpand(docs, "source", Map.empty, "text", 1700L).count().toDouble
    assert(math.abs(e17 / docs.count() - 1.7) < 0.17, s"got ${e17 / docs.count()}")
    // monotone: the extra-copy doc set at 400 milli is a subset of 700's
    def extras(m: Long) = Sampling
      .epochExpand(docs, "source", Map.empty, "text", m)
      .select("doc_id").as[Long].collect().toSet
    assert(extras(400L).subsetOf(extras(700L)))
    // dedup-consistency: two docs with IDENTICAL text expand identically
    val twins = Seq((1L, "s", "same words here"), (2L, "s", "same words here"))
      .toDF("doc_id", "source", "text")
    val tw = Sampling.epochExpand(twins, "source", Map("s" -> 1500L), "text")
      .groupBy("doc_id").agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect()
    assert(tw.length === 2 && tw.toSet.size === 1, s"twins diverged: ${tw.toSeq}")
    // per-source map + determinism under repartitioning
    val byMap = Sampling.epochExpand(
      docs, "source", Map("src0" -> 3000L, "src1" -> 0L), "text", 1000L)
    val perSrc = byMap.groupBy("source").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val baseSrc = docs.groupBy("source").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(perSrc("src0") === baseSrc("src0") * 3)
    assert(!perSrc.contains("src1"))
    assert(perSrc("src5") === baseSrc("src5"))
    val a = byMap.collect().toSet
    val b = Sampling.epochExpand(
      docs.repartition(13), "source", Map("src0" -> 3000L, "src1" -> 0L), "text", 1000L)
      .collect().toSet
    assert(a === b)
    intercept[IllegalArgumentException](
      Sampling.epochExpand(docs, "source", Map("s" -> -1L), "text")
    )
  }
}
