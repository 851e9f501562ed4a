package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style IMPORTANCE scoring — data selection with importance
  * resampling (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): estimate how target-like each raw document
  * is from hashed n-gram features, so a web-scale crawl can be filtered
  * toward a small trusted target domain (the selection step CCNet's
  * perplexity filter approximates with a LM — this is the cheaper
  * bag-of-features form that needs no model training, just two count
  * tables).
  *
  * Features are hashed unigrams: each token's `polyHash` folded into
  * `numBuckets` buckets. The per-bucket weight is the INTEGER-scaled
  * smoothed count ratio
  *
  *   w(b) = ((c_target(b) + 1) * 1e6) div (c_raw(b) + 1)
  *
  * — `Scale * p_target(b) / p_raw(b)` up to the corpus-level constant
  * `(|raw|+B)/(|target|+B)`, which is the SAME for every bucket and so
  * cancels in any rank- or quantile-based selection (use
  * [[NgramLM.rarityBuckets]]-style tercile thresholds, or a fixed
  * cutoff calibrated on a sample). Keeping the ratio un-normalized
  * keeps every intermediate in BIGINT (the [[NgramLM]] overflow
  * discipline: `(c_target+1)·1e6 < 2^63` holds to ~9e12 target tokens);
  * a true log-likelihood-ratio would need floating `log`, whose last
  * ulp differs between libm implementations and would break the
  * bit-exact oracle mirror.
  *
  * A document's score is the MEAN bucket weight of its tokens
  * (`sum div count`, decimal-summed like [[NgramLM.score]]); higher =
  * more target-like. Buckets absent from both corpora score `Scale`
  * (the neutral ratio 1).
  *
  * Scale shape: training is two partial-aggregated hash aggregates over
  * exploded token streams (hot buckets collapse map-side), producing at
  * most `numBuckets` rows — bounded by construction, broadcast always
  * (that is the point of hashing features into a fixed space: the DSIR
  * paper uses 10^4; the model size is independent of corpus size).
  * Scoring is one scan of the raw corpus, a broadcast lookup, and a
  * per-document aggregate keyed on the document id — the corpus never
  * shuffles on a feature key.
  */
object Importance {

  /** Integer ratio scale, shared with [[NgramLM.Scale]]'s convention. */
  val Scale = 1000000L

  /** Default feature-space size (the DSIR paper's order of magnitude). */
  val DefaultBuckets = 4096

  /** One row per token occurrence: `(idCol, b)` — the token's hashed
    * feature bucket. Unigram identity is the positional shingle hash
    * (k=1), the same token hashing every other text operator uses.
    */
  def featureBuckets(
      docs: DataFrame,
      numBuckets: Int = DefaultBuckets,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(numBuckets > 0, s"need numBuckets > 0, got $numBuckets")
    docs
      .select(
        col(idCol),
        explode(TextFunctions.positionalShingleHashes(col(textCol), 1)).as("__u")
      )
      .select(col(idCol), (col("__u") % numBuckets).as("b"))
  }

  /** Train bucket weights: `(b, w)` for every bucket observed in either
    * corpus, `w = ((c_target+1)·Scale) div (c_raw+1)`. At most
    * `numBuckets` rows — always broadcastable.
    */
  def train(
      target: DataFrame,
      raw: DataFrame,
      numBuckets: Int = DefaultBuckets,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val tc = featureBuckets(target, numBuckets, textCol, idCol)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("tc"))
    val rc = featureBuckets(raw, numBuckets, textCol, idCol)
      .groupBy(col("b"))
      .agg(count(lit(1)).as("rc"))
    tc.join(rc, Seq("b"), "full_outer")
      .select(
        col("b"),
        expr(s"((coalesce(tc, 0L) + 1L) * ${Scale}L) div (coalesce(rc, 0L) + 1L)").as("w")
      )
  }

  /** Score `docs` under `weights`: one row per document,
    * `(idCol, n_toks, imp_avg)` — token count and mean bucket weight
    * (`sum div count`; HIGHER = more target-like). All BIGINT; the sum
    * runs in decimal(38,0) for the same reason [[NgramLM.score]]'s does
    * (a long sum wraps silently at reference scale; DuckDB's promotes).
    */
  def score(
      docs: DataFrame,
      weights: DataFrame,
      numBuckets: Int = DefaultBuckets,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    featureBuckets(docs, numBuckets, textCol, idCol)
      .join(broadcast(weights), Seq("b"), "left")
      .select(col(idCol), coalesce(col("w"), lit(Scale)).as("w"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_toks"),
        sum(col("w").cast("decimal(38,0)")).as("__w_sum")
      )
      .select(
        col(idCol),
        col("n_toks"),
        expr("__w_sum div n_toks").as("imp_avg")
      )

  /** The filter form: documents of `docs` whose mean importance reaches
    * `minAvg` — semi-join on the passing ids, composed like
    * [[NgramLM]]'s filter (the document frame keeps all its columns).
    */
  def filterImportant(
      docs: DataFrame,
      weights: DataFrame,
      minAvg: Long,
      numBuckets: Int = DefaultBuckets,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val passing = score(docs, weights, numBuckets, textCol, idCol)
      .filter(col("imp_avg") >= minAvg)
      .select(col(idCol))
    docs.join(passing, Seq(idCol), "left_semi")
  }
}
