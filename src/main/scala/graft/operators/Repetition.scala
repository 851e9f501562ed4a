package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Within-document REPETITION metrics — the Gopher/MassiveText-style
  * quality signals that catch degenerate machine-generated text (keyboard
  * mash, boilerplate loops, SEO keyword stuffing) which the length/
  * stopword/punctuation score ([[graft.functions.TextFunctions.qualityScore]])
  * cannot see:
  *
  *  - `dup_frac`  — fraction of n-gram OCCURRENCES that are repeats of an
  *    earlier occurrence in the same document (`1 − distinct/total`);
  *  - `top_frac`  — fraction of occurrences taken by the single most
  *    frequent n-gram (a looping generator pushes this toward 1).
  *
  * Scale shape: one explode over positional n-gram hashes, then a
  * two-level aggregate keyed on `(doc, gram)` and `doc` — both
  * partial-aggregate (map-side combine) friendly, so per-gram fan-out is
  * absorbed before the shuffle and skew is bounded by the longest single
  * document, never by corpus-wide gram popularity (the key always carries
  * the doc id). No windows, no sorts, no self-joins.
  *
  * Counts are over `poly_hash(gram)` (collisions merge two grams at
  * ~2^-30 per pair — negligible for a quality heuristic and mirrored
  * exactly by the DuckDB oracle).
  *
  * The reference has no text analysis (SURVEY.md §2.1); this extends the
  * quality-scoring family for LLM corpus filtering.
  */
object Repetition {

  /** Per-document n-gram repetition statistics:
    * `(idCol, n_grams, n_distinct, dup_frac, top_frac)`, fractions rounded
    * to 6 places for cross-engine hash-stability. A document shorter than
    * `n` tokens yields one clamped window (the whole text) — `dup_frac` 0,
    * `top_frac` 1 — matching `positionalShingles` clamp semantics on both
    * engines.
    */
  def gramStats(
      docs: DataFrame,
      n: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(n > 0, s"need n > 0, got $n")
    docs
      .select(
        col(idCol),
        explode(TextFunctions.positionalShingleHashes(col(textCol), n)).as("gh")
      )
      .groupBy(col(idCol), col("gh"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count")
      )
      .select(
        col(idCol),
        col("n_grams"),
        col("n_distinct"),
        round(
          lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"),
          6
        ).as("dup_frac"),
        round(col("top_count").cast("double") / col("n_grams").cast("double"), 6)
          .as("top_frac")
      )
  }

  /** Documents whose repetition stays UNDER both thresholds — the filter
    * form of [[gramStats]] for pipeline composition (semi join on the
    * passing id set; the corpus frame itself is not re-evaluated into the
    * stats aggregation).
    */
  def filterRepetitive(
      docs: DataFrame,
      n: Int = 2,
      maxDupFrac: Double = 0.3,
      maxTopFrac: Double = 0.2,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    docs.join(
      gramStats(docs, n, textCol, idCol)
        .filter(col("dup_frac") <= maxDupFrac && col("top_frac") <= maxTopFrac)
        .select(col(idCol)),
      Seq(idCol),
      "left_semi"
    )
}
