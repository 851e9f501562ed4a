package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Gopher/MassiveText-style DOCUMENT heuristics (Rae et al. 2021,
  * appendix A1.1): the cheap structural rules a corpus pipeline applies
  * BEFORE any model-based scoring — word-count bounds, mean-word-length
  * bounds, alphabetic-word fraction, and a minimum count of distinct stop
  * words. They catch a different failure class than
  * [[graft.functions.TextFunctions.qualityScore]] (which scores
  * prose-likeness on a continuum): these are hard structural gates for
  * machine noise — base64 blobs (mean word length off the chart), numeric
  * tables (alphabetic fraction near zero), keyword lists (no stop words
  * at all).
  *
  * Defaults are the paper's A1.1 values: 50–100,000 words, mean word
  * length 3–10 chars, ≥ 80% alphabetic words, ≥ 2 DISTINCT stop words.
  * Two deliberate divergences from the paper, both engine contracts:
  * tokens are the engine-wide single-space split (case-sensitive,
  * punctuation-attached — so "The" or "of." do not count as stop-word
  * hits), and the stop list is the engine's 8-word
  * [[graft.functions.TextFunctions.StopwordsEn]] rather than the paper's
  * larger list. Ratios follow the engine's integer discipline
  * (`x·1000 div n`, all non-negative, so truncating and floor division
  * agree) — every flag is bit-reproducible and the DuckDB oracle mirrors
  * each formula exactly (q88).
  *
  * Scale shape: both forms are ONE codegen'd kernel call per row
  * ([[graft.functions.Kernels.gopherStats]] /
  * [[graft.functions.Kernels.gopherKeep]]) — a single split feeds all
  * four metrics; one row in, one row out, no aggregate, no shuffle, no
  * UDFs. The fused-kernel form matters in the admission path:
  * `FilterExec` generates predicates without subexpression elimination,
  * so a four-metric Column composition would re-split the text once per
  * metric (the measured 50–175× `quality_score` pitfall). At 100 TB this
  * is the admission filter fused into the ingest scan, exactly like
  * q21/q22.
  *
  * The reference has no text analysis (SURVEY.md §2.1); this extends the
  * quality family for LLM corpus filtering.
  */
object Heuristics {

  /** Paper-default thresholds (Rae et al. 2021 A1.1), shared with the
    * q88/q82 oracles so the two engines cannot drift.
    */
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanLenMilli = 3000L
  val MaxMeanLenMilli = 10000L
  val MinAlphaPermille = 800L
  val MinStopDistinct = 2L

  /** The four rule metrics over `textCol` as ONE kernel struct:
    * `(n_words, mean_len_milli, alpha_permille, stop_distinct)` — all
    * BIGINT, all derived from one split of the text (see
    * [[graft.functions.Kernels.gopherStats]] for the exact formulas).
    */
  def metrics(textCol: Column): Column = GraftExpressions.gopher_stats(textCol)

  /** Per-document Gopher rule evaluation:
    * `(idCol, n_words, mean_len_milli, alpha_permille, stop_distinct,
    * keep)` with `keep` true iff every rule passes — the audit form, for
    * sizing what a threshold change would drop before committing to it.
    */
  def gopherRules(
      docs: DataFrame,
      minWords: Long = MinWords,
      maxWords: Long = MaxWords,
      minMeanLenMilli: Long = MinMeanLenMilli,
      maxMeanLenMilli: Long = MaxMeanLenMilli,
      minAlphaPermille: Long = MinAlphaPermille,
      minStopDistinct: Long = MinStopDistinct,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(minWords >= 1, s"need minWords >= 1, got $minWords")
    docs
      .select(col(idCol), metrics(col(textCol)).as("__g"))
      .select(
        col(idCol),
        col("__g.n_words").as("n_words"),
        col("__g.mean_len_milli").as("mean_len_milli"),
        col("__g.alpha_permille").as("alpha_permille"),
        col("__g.stop_distinct").as("stop_distinct"),
        (col("__g.n_words").between(minWords, maxWords) &&
          col("__g.mean_len_milli").between(minMeanLenMilli, maxMeanLenMilli) &&
          col("__g.alpha_permille") >= minAlphaPermille &&
          col("__g.stop_distinct") >= minStopDistinct).as("keep")
      )
  }

  /** Admission form: the documents [[gopherRules]] keeps, original
    * columns untouched — the predicate is one boolean kernel expression,
    * so no metric columns are ever added (no name-collision surface) and
    * the filter is scan-local: no flag frame, no join back, no shuffle.
    * (A semi-join against flagged ids would be a corpus self-join — never
    * broadcastable at 100 TB, and pointless for a row-local rule.)
    */
  def filterGopher(
      docs: DataFrame,
      minWords: Long = MinWords,
      maxWords: Long = MaxWords,
      minMeanLenMilli: Long = MinMeanLenMilli,
      maxMeanLenMilli: Long = MaxMeanLenMilli,
      minAlphaPermille: Long = MinAlphaPermille,
      minStopDistinct: Long = MinStopDistinct,
      textCol: String = "text"
  ): DataFrame = {
    require(minWords >= 1, s"need minWords >= 1, got $minWords")
    docs.filter(
      GraftExpressions.gopher_keep(
        col(textCol),
        minWords, maxWords, minMeanLenMilli, maxMeanLenMilli,
        minAlphaPermille, minStopDistinct
      )
    )
  }
}
