package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 ranked retrieval (Robertson-Sparck Jones probabilistic weighting,
  * Okapi BM25 form) in the engine's all-integer scoring discipline: no
  * `ln()`, no floating point, so ranking is bit-identical across engines
  * and a DuckDB oracle can replay every score exactly (the q34 salience
  * rule applied to retrieval).
  *
  * Fixed-point definitions (`div` = floored integer division; k1 = 1.2,
  * b = 0.75 in milli-units):
  *
  *   avgdl_m    = (total_tokens * 1000) div n_docs                [milli]
  *   idf_u      = ((n_docs - df) * 1e6) div (df + 1)              [micro]
  *     — the rational (N - df)/(df + 1), the monotone core of the BM25
  *       idf without the log damping; ranking-equivalent per query term
  *       and exactly representable
  *   k_m        = 300 + (900 * dl * 1000) div avgdl_m             [milli]
  *     — k1 * ((1-b) + b * dl/avgdl) in milli-units
  *   term_score = (idf_u * tf * 2200) div (tf * 1000 + k_m)
  *     — idf * tf(k1+1)/(tf + K); summed per document (integer sum,
  *       order-free, so partial aggregation commutes exactly)
  *
  * All intermediates stay far below 2^63 for corpora to ~10^12 documents
  * at tf <= 10^4 (idf_u <= 1e6·N/(df+1); worst term idf_u·tf·2200 ~
  * 2.2e9·N/(df+1)).
  *
  * Scale shape: the ONLY corpus-sized work is one scan — `dl` rides the
  * same projection as the exploded tokens, and the `isin(queryTerms)`
  * filter drops every non-query token BEFORE the tf aggregate, so the
  * exchange carries only query-term occurrences (|Q| keys, partially
  * aggregated). The model (per-term df + global stats) is a <= |Q|-row
  * frame broadcast back; the final top-k is a TakeOrdered of k rows, not
  * a global sort. (Reference scope: no scoring of any kind in
  * `dump_table.py` — SURVEY §2.1 north-star text-analysis surface.)
  */
object Retrieval {

  /** The query-scoped BM25 "index" frame: one row per query term —
    * `(tok, df, n, avgdl_m)` — computable in one corpus pass plus a
    * 1-row stats aggregate. This is the static side the streaming
    * scorer broadcasts.
    */
  def bm25Model(docs: DataFrame, textCol: String, queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val toks = TextFunctions.tokens(col(textCol))
    val stats = docs
      .select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
      .select(col("n"), expr("tot * 1000 div n").as("avgdl_m"))
    docs
      .select(explode(array_distinct(toks)).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
  }

  /** Per-(doc, term) integer BM25 term scores against a (broadcast)
    * [[bm25Model]] frame — `(doc_id, tok, term_score)`. STATELESS except
    * for the per-doc tf aggregate, which groups only on (doc, query-term)
    * keys that arrive together; the streaming twin
    * ([[graft.streaming.StreamingOps]]) therefore computes tf per
    * document inside `foreachBatch` (micro-batch-exact, since a doc's
    * tokens arrive with the doc) and shares THIS arithmetic.
    */
  def termScores(docs: DataFrame, model: DataFrame, textCol: String): DataFrame =
    matchedTerms(docs, model, textCol)
      .groupBy(col("doc_id"), col("dl"), col("tok"), col("df"), col("n"), col("avgdl_m"))
      .agg(count(lit(1)).as("tf"))
      .select(
        col("doc_id"),
        col("tok"),
        expr(
          "((n - df) * 1000000 div (df + 1)) * (tf * 2200)" +
            " div (tf * 1000 + (300 + (900 * dl * 1000) div avgdl_m))"
        ).as("term_score")
      )

  /** The STATELESS front half of [[termScores]]: explode tokens, keep
    * query-term hits, attach the broadcast model row — one projection,
    * no aggregate, which is what a streaming plan can run without a
    * StateStore ([[graft.streaming.StreamingOps.scoreBm25Against]]).
    */
  def matchedTerms(docs: DataFrame, model: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col("doc_id"), size(toks).cast("long").as("dl"), explode(toks).as("tok"))
      .join(broadcast(model), Seq("tok"))
  }

  /** Score `docs` against a (broadcast) [[bm25Model]] frame: one scan —
    * `(doc_id, score)` for every document containing at least one query
    * term, `score` the exact integer BM25 sum above.
    */
  def bm25ScoreAgainst(docs: DataFrame, model: DataFrame, textCol: String): DataFrame =
    termScores(docs, model, textCol)
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score"))

  /** End-to-end ranked retrieval: `(rnk, doc_id, score)` — global top-k
    * by (score desc, doc_id), ranks assigned AFTER the TakeOrdered so no
    * task ever sorts more than k rows.
    */
  def bm25TopK(docs: DataFrame, textCol: String, queryTerms: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bm25ScoreAgainst(docs, bm25Model(docs, textCol, queryTerms), textCol)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    scored
      .withColumn(
        "rnk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long")
      )
      .select(col("rnk"), col("doc_id"), col("score"))
  }
}
