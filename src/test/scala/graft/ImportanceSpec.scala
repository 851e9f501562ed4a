package graft

import org.apache.spark.sql.functions._

import graft.operators.Importance

/** Laws of DSIR-style hashed-unigram importance scoring. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = sources.Tables.load(spark, Sf001, "documents")
  private lazy val target = docs.filter(col("lang") === "en")
  private lazy val raw = docs.filter(col("lang") =!= "en")

  test("model is bounded by the feature-space size, independent of corpus size") {
    val w = Importance.train(target, raw)
    assert(w.count() <= Importance.DefaultBuckets.toLong)
    // shrinking the feature space shrinks the model with it
    val small = Importance.train(target, raw, numBuckets = 8)
    assert(small.count() <= 8L)
  }

  test("unseen-vocabulary documents score exactly the neutral ratio") {
    // train on disjoint crafted vocab; score a doc whose tokens hash to
    // buckets absent from both corpora (deterministic: fails loudly on a
    // bucket collision instead of silently passing)
    val t = Seq((1L, "alpha alpha beta")).toDF("doc_id", "text")
    val r = Seq((2L, "gamma delta gamma")).toDF("doc_id", "text")
    val w = Importance.train(t, r, numBuckets = 4096)
    val scored = Importance
      .score(Seq((9L, "zebra quokka axolotl")).toDF("doc_id", "text"), w, numBuckets = 4096)
      .first()
    assert(scored.getAs[Long]("n_toks") === 3L)
    assert(scored.getAs[Long]("imp_avg") === Importance.Scale)
  }

  test("target-like documents outscore raw-like documents") {
    val t = Seq((1L, "alpha beta alpha beta alpha")).toDF("doc_id", "text")
    val r = Seq((2L, "gamma delta gamma delta gamma")).toDF("doc_id", "text")
    val w = Importance.train(t, r)
    val scored = Importance
      .score(
        Seq((10L, "alpha beta alpha"), (11L, "gamma delta gamma")).toDF("doc_id", "text"),
        w
      )
      .collect()
      .map(row => row.getLong(0) -> row.getAs[Long]("imp_avg"))
      .toMap
    assert(
      scored(10L) > scored(11L),
      s"target-like doc must outscore raw-like: ${scored(10L)} vs ${scored(11L)}"
    )
    // and the neutral ratio sits strictly between them
    assert(scored(10L) > Importance.Scale && scored(11L) < Importance.Scale)
  }

  test("filterImportant == score-threshold semi-join, all columns kept") {
    val w = Importance.train(target, raw)
    val minAvg = Importance.Scale // keep the target-leaning half
    val kept = Importance.filterImportant(raw, w, minAvg)
    assert(kept.columns.toSeq === raw.columns.toSeq)
    val expectedIds = Importance
      .score(raw, w)
      .filter(col("imp_avg") >= minAvg)
      .select("doc_id")
    val keptIds = kept.select("doc_id")
    assert(keptIds.except(expectedIds).count() === 0L)
    assert(expectedIds.except(keptIds).count() === 0L)
  }

  test("deterministic under repartitioning") {
    val a = Importance.score(raw, Importance.train(target, raw))
    val b = Importance.score(
      raw.repartition(13),
      Importance.train(target.repartition(7), raw.repartition(11))
    )
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
  }

  test("bigram features see word order that unigrams cannot") {
    // same unigram bag, opposite order: k=1 scores them identically,
    // k=2 must prefer the doc sharing the target's bigram
    val t = Seq((1L, "alpha beta alpha beta alpha beta")).toDF("doc_id", "text")
    val r = Seq((2L, "beta alpha beta alpha beta alpha")).toDF("doc_id", "text")
    val probe = Seq((10L, "alpha beta alpha beta"), (11L, "beta alpha beta alpha"))
      .toDF("doc_id", "text")
    def scores(k: Int) = Importance
      .score(probe, Importance.train(t, r, k = k), k = k)
      .collect()
      .map(row => row.getLong(0) -> row.getAs[Long]("imp_avg"))
      .toMap
    val uni = scores(1)
    assert(uni(10L) === uni(11L), "unigram bags are identical — scores must tie")
    val bi = scores(2)
    assert(
      bi(10L) > bi(11L),
      s"bigram features must prefer the target's word order: ${bi(10L)} vs ${bi(11L)}"
    )
  }

  test("resampling matches the target composition instead of thresholding it") {
    // 20 target-like docs + 20 target-unlike (the +1 smoothing over
    // per-bucket counts of 20 makes the weight ratio 2:1 here): a hard
    // mean threshold would keep ONLY the target-like region; systematic
    // ∝-weight resampling must still admit SOME low-weight docs — under-
    // represented, ∝ their mass — because matching the target
    // DISTRIBUTION (not truncating to its mode) is the point of DSIR
    val t = Seq((900L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val like = (1 to 20).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
    val unlike = (21 to 40).map(i => (i.toLong, "omega psi chi phi upsilon tau sigma rho"))
    val corpus = (like ++ unlike).toDF("doc_id", "text")
    val w = Importance.train(t, corpus)
    val picked = Importance
      .resampleImportant(corpus, w, sampleTarget = 20, seed = 3L)
      .collect()
    assert(picked.length === 20, s"no weight spans two boundaries here: exactly 20 picks")
    val ids = picked.map(_.getAs[Long]("doc_id")).toSet
    val nLike = ids.count(_ <= 20L)
    val nUnlike = ids.size - nLike
    assert(nUnlike >= 1, "distribution matching must admit some low-weight docs")
    // the composition law: selected counts track the MASS SHARE (±2 for
    // boundary effects), not the population share — that is what
    // "importance resampling" means
    val masses = Importance
      .score(corpus, w)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("imp_avg"))
      .toMap
    val likeShare = (1 to 20).map(i => masses(i.toLong)).sum.toDouble / masses.values.sum
    val expectedLike = 20 * likeShare
    assert(
      math.abs(nLike - expectedLike) <= 2.0,
      s"selected composition must match the mass share: like=$nLike expected≈$expectedLike"
    )
    // sel_idx is the boundary index: strictly increasing in draw order,
    // so all distinct
    val selIdx = picked.map(_.getAs[Long]("sel_idx"))
    assert(selIdx.distinct.length === selIdx.length)
  }

  test("resampling is deterministic under repartitioning; the seed is a full redraw") {
    val w = Importance.train(target, raw)
    val a = Importance.resampleImportant(raw, w, 40, seed = 1L)
    val b = Importance.resampleImportant(raw.repartition(13), w, 40, seed = 1L)
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
    val c = Importance.resampleImportant(raw, w, 40, seed = 2L)
    val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val cIds = c.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(aIds !== cIds, "a different seed must redraw the sample")
    // bound law: never more than sampleTarget selections
    assert(a.count() <= 40L && c.count() <= 40L)
  }

  test("weights broadcast — the corpus never shuffles on a feature key") {
    val p = Importance
      .score(raw, Importance.train(target, raw))
      .queryExecution
      .executedPlan
      .toString
    // the weight lookup on the exploded corpus must broadcast (the
    // trainer's own full-outer join of two <=numBuckets-row aggregates
    // MAY sort-merge — both sides are bounded, so that is fine)
    assert(
      p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      s"weight lookup should be a left-outer broadcast join:\n$p"
    )
  }
}
