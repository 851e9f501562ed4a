package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus VOCABULARY building and out-of-vocabulary scoring — the
  * tokenizer-prep surface of a training pipeline: fix a top-V token
  * vocabulary from the corpus (or a reference slice), then measure every
  * document's OOV rate against it. High-OOV documents are wrong-language,
  * encoding-mangled, or domain-alien — the third quality axis next to
  * the formula score (q22) and the LM rarity (q75), and the number that
  * sizes an `<unk>` budget before training.
  *
  * Determinism: the vocabulary is a pure function of the corpus — top V
  * by count with ties broken by the token string — and OOV rates are
  * integer permille (the q34 discipline), so both are bit-reproducible
  * across engines and runs.
  *
  * Scale shape: token counts are one partial-aggregated hash aggregate
  * (the hot token collapses map-side); the global top-V is a
  * `TakeOrderedAndProject` — per-partition bounded heaps merged at the
  * driver-side limit, NEVER a full corpus-wide sort (the same no-Window
  * argument as balanced sampling, realized by Catalyst's sort+limit
  * rewrite). Scoring broadcasts the V-row vocabulary and the corpus
  * never shuffles until the per-document aggregate.
  */
object Vocabulary {

  /** The top-`v` tokens by occurrence count: `(tok, tf, rank)` —
    * rank 1..v by (count desc, token asc).
    */
  def build(docs: DataFrame, v: Int, textCol: String = "text"): DataFrame = {
    require(v > 0, s"need v > 0, got $v")
    docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(v)
      .select(
        col("tok"),
        col("tf"),
        // rank re-derived deterministically from the same (tf, tok) order
        row_number()
          .over(org.apache.spark.sql.expressions.Window.orderBy(col("tf").desc, col("tok")))
          .cast("long")
          .as("rank")
      )
  }

  /** Per-document OOV profile against a built vocabulary:
    * `(idCol, n_tok, n_oov, oov_permille)`, all BIGINT. A token is OOV
    * iff absent from `vocab.tok`.
    */
  def oovProfile(
      docs: DataFrame,
      vocab: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .join(broadcast(vocab.select(col("tok"), lit(1L).as("__in"))), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov")
      )
      .select(
        col(idCol),
        col("n_tok"),
        col("n_oov"),
        expr("n_oov * 1000 div n_tok").as("oov_permille")
      )
}
