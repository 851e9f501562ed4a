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
