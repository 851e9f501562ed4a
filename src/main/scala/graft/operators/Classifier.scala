package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LEARNED quality classification — the hashed-feature integer linear
  * scorer (the fastText-classifier / NB-count-ratio shape: Joulin et al.
  * 2017 average hashed-feature weights through a linear layer; NBSVM and
  * the production quality filters of GPT-3/LLaMA/RefinedWeb train a
  * simple linear model on labeled good/bad slices): train per-bucket
  * class-count ratios on LABELED positive/negative document slices, then
  * score any document by its mean bucket weight. The LEARNED counterpart
  * of the fixed q22 formula — the formula encodes priors someone wrote
  * down; this learns whatever separates the curated slice from the crawl
  * — and it composes into the same calibrated per-source keep
  * ([[Report.keepTopBy]]) as the formula score.
  *
  * The per-bucket weight is the class-NORMALIZED smoothed count ratio in
  * the engine's integer discipline:
  *
  *   w(b) = ((c₊(b)+1) · (N₋+B) · 10⁶) div ((c₋(b)+1) · (N₊+B))
  *
  * — `10⁶ · p(b|pos) / p(b|neg)` under add-one smoothing, the
  * likelihood-ratio term of naive Bayes with the class-size constant
  * NORMALIZED OUT (unlike [[Importance]]'s weights, where the constant
  * cancels in ranks and is deliberately left in): a bucket seen in
  * neither slice scores `(N₋+B)·10⁶ div (N₊+B)` — exactly the neutral
  * `Scale` when the slices are feature-balanced — and `Scale` is the
  * balanced decision point wherever an absolute threshold is wanted. A
  * document's score is the MEAN bucket weight of its feature occurrences
  * (`sum div count`, decimal(38,0)-summed — the [[NgramLM.score]]
  * overflow note); higher = more positive-like. Products run in
  * decimal(38,0) (≤ ~10³¹ at the 9e12-token headroom), mirroring
  * DuckDB's HUGEINT, so every weight replays bit-exactly. A true
  * logistic loss would need libm `exp`/`log` — engine-dependent last
  * ulps — and gradient descent over shuffled minibatches; the closed-form
  * count ratio is the deterministic member of the linear-classifier
  * family, and in the fastText paper's own evaluation the two sit within
  * a point of each other on quality-filter-shaped tasks.
  *
  * Scale shape: training is two partial-aggregated hash aggregates over
  * the labeled slices' exploded feature streams (labeled data is small
  * by nature; hot buckets collapse map-side), and the model at rest is
  * EXACTLY `numBuckets` rows — complete by construction (every bucket
  * row exists, so scoring needs no neutral fallback), bounded
  * independent of corpus size, always broadcast. Scoring is one corpus
  * scan, a broadcast lookup, and a per-document aggregate — the corpus
  * never shuffles on a feature key.
  */
object Classifier {

  /** Integer ratio scale ([[NgramLM.Scale]] convention); also the
    * neutral score and balanced decision point.
    */
  val Scale = 1000000L

  /** Train per-bucket weights from labeled slices: exactly `numBuckets`
    * rows `(b, w)` — complete over the feature space, broadcast-safe.
    * `k` = feature n-gram order (1 = unigram bag, 2 = bigrams — order
    * sensitivity at 2× the occurrence count, the [[Importance]] trade).
    */
  def train(
      pos: DataFrame,
      neg: DataFrame,
      numBuckets: Int = Importance.DefaultBuckets,
      k: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val pc = Importance
      .featureBuckets(pos, numBuckets, k, textCol, idCol)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("pc"))
    val nc = Importance
      .featureBuckets(neg, numBuckets, k, textCol, idCol)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("nc"))
    // class totals off the bucket-bounded frames (≤ numBuckets rows each)
    val totals = pc
      .agg(coalesce(sum(col("pc")), lit(0L)).as("np"))
      .crossJoin(nc.agg(coalesce(sum(col("nc")), lit(0L)).as("nn")))
    pos.sparkSession
      .range(numBuckets)
      .select(col("id").as("b"))
      .join(pc, Seq("b"), "left")
      .join(nc, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(
        col("b"),
        expr(
          s"(cast(coalesce(pc, 0L) + 1L AS decimal(38,0)) * (nn + ${numBuckets}L) * ${Scale}L)" +
            s" div (cast(coalesce(nc, 0L) + 1L AS decimal(38,0)) * (np + ${numBuckets}L))"
        ).as("w")
      )
  }

  /** The STATELESS half of [[score]] (the [[Importance.scoredFeatures]]
    * split, for a streaming twin): one row per feature occurrence,
    * `(idCol, w)` after the broadcast model lookup. The model is
    * complete over the bucket space, so the join is inner and total.
    */
  def scoredFeatures(
      docs: DataFrame,
      model: DataFrame,
      numBuckets: Int = Importance.DefaultBuckets,
      k: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    Importance
      .featureBuckets(docs, numBuckets, k, textCol, idCol)
      .join(broadcast(model), Seq("b"))
      .select(col(idCol), col("w"))

  /** Score `docs` under a trained `model`: one row per document,
    * `(idCol, n_feats, q_micro)` — feature count and mean bucket weight
    * (HIGHER = more positive-like; `Scale` = neutral).
    */
  def score(
      docs: DataFrame,
      model: DataFrame,
      numBuckets: Int = Importance.DefaultBuckets,
      k: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    scoredFeatures(docs, model, numBuckets, k, textCol, idCol)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_feats"),
        sum(col("w").cast("decimal(38,0)")).as("__ws")
      )
      .select(col(idCol), col("n_feats"), expr("__ws div n_feats").as("q_micro"))

  /** The absolute-threshold filter form (semi-join on the passing ids,
    * the [[Importance.filterImportant]] contract). `Scale` is the
    * balanced decision point.
    */
  def filterPositive(
      docs: DataFrame,
      model: DataFrame,
      minScore: Long = Scale,
      numBuckets: Int = Importance.DefaultBuckets,
      k: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    docs.join(
      score(docs, model, numBuckets, k, textCol, idCol)
        .filter(col("q_micro") >= minScore)
        .select(col(idCol)),
      Seq(idCol),
      "left_semi"
    )

  /** The CALIBRATED filter the classifier feeds — keep the top
    * `keepMilli`/1000 of every source by LEARNED score, through the same
    * from-above [[Report.keepTopBy]] rule as the formula score (q145):
    * raw classifier scores are no more cross-source comparable than
    * formula scores, so the per-source percentile calibration applies
    * unchanged. Returns the kept docs with `q_micro` and `pct_micro`
    * riding.
    */
  def keepTopLearned(
      docs: DataFrame,
      model: DataFrame,
      keepMilli: Long,
      numBuckets: Int = Importance.DefaultBuckets,
      k: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id",
      groupCol: String = "source"
  ): DataFrame = {
    val scored = docs.join(
      score(docs, model, numBuckets, k, textCol, idCol).select(col(idCol), col("q_micro")),
      Seq(idCol)
    )
    Report.keepTopBy(scored, "q_micro", keepMilli, groupCol)
  }
}
