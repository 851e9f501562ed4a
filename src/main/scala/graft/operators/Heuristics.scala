package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher/MassiveText-style DOCUMENT heuristics (Rae et al. 2021, §A1.1):
  * the cheap structural rules a corpus pipeline applies before any
  * model-based scoring — word-count bounds, mean-word-length bounds,
  * alphabetic-word fraction, and a minimum stop-word count. They catch a
  * different failure class than [[graft.functions.TextFunctions.qualityScore]]
  * (which scores prose-likeness on a continuum): these are hard structural
  * gates for machine noise — base64 blobs (mean word length off the
  * chart), numeric tables (alphabetic fraction near zero), keyword lists
  * (no stop words at all).
  *
  * Ratios follow the engine's integer discipline (`x·1000 div n` with
  * left-assoc integer ops) so every flag is bit-reproducible across
  * engines; the DuckDB oracle mirrors each formula exactly.
  *
  * Scale shape: ONE codegen'd scan — a single `split` feeds the word
  * count, the character sum (derived from `length`, no second pass), the
  * alphabetic filter, and the stop-word filter; one row in, one row out,
  * no aggregate, no shuffle, no UDFs. At 100 TB this is the admission
  * filter fused into the ingest scan, exactly like q21/q22.
  *
  * The reference has no text analysis (SURVEY.md §2.1); this extends the
  * quality family for LLM corpus filtering.
  */
object Heuristics {

  /** The four rule metrics over `textCol`, in evaluation order:
    * `(n_words, mean_len_milli, alpha_permille, stop_hits)` — all
    * BIGINT, all derived from one `split` of the text.
    *
    *  - `n_words`        — space-token count (the engine-wide token
    *    contract, [[TextFunctions.tokens]]);
    *  - `mean_len_milli` — mean word length in integer thousandths:
    *    non-space chars `·1000 div n_words`, chars derived as
    *    `length(text) − (n_words − 1)` separators (the
    *    [[TextFunctions.avgTokenLength]] identity — no second scan);
    *  - `alpha_permille` — words containing at least one ASCII letter,
    *    as integer permille of all words;
    *  - `stop_hits`      — occurrences of the engine's English stop-word
    *    list ([[TextFunctions.StopwordsEn]]).
    */
  def metrics(textCol: String): Seq[Column] = {
    val text = col(textCol)
    val toks = TextFunctions.tokens(text)
    val nWords = size(toks).cast("long")
    val nCharsW = (length(text) - (size(toks) - lit(1))).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    Seq(
      nWords.as("n_words"),
      intDiv(nCharsW * lit(1000L), greatest(nWords, lit(1L))).as("mean_len_milli"),
      intDiv(nAlpha * lit(1000L), greatest(nWords, lit(1L))).as("alpha_permille"),
      TextFunctions.stopwordHits(text, TextFunctions.StopwordsEn)
        .cast("long")
        .as("stop_hits")
    )
  }

  /** BIGINT floor division (`a div b`) — the Column API only exposes the
    * double `/`, and the permille contract is integer.
    */
  private def intDiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  /** The keep predicate over [[metrics]]-named columns. */
  private def keepPredicate(
      minWords: Long,
      maxWords: Long,
      minMeanLenMilli: Long,
      maxMeanLenMilli: Long,
      minAlphaPermille: Long,
      minStopHits: Long
  ): Column =
    col("n_words").between(minWords, maxWords) &&
      col("mean_len_milli").between(minMeanLenMilli, maxMeanLenMilli) &&
      col("alpha_permille") >= minAlphaPermille &&
      col("stop_hits") >= minStopHits

  /** Per-document Gopher rule evaluation:
    * `(idCol, n_words, mean_len_milli, alpha_permille, stop_hits, keep)`
    * with `keep` true iff every rule passes — the audit form, for sizing
    * what a threshold change would drop before committing to it.
    */
  def gopherRules(
      docs: DataFrame,
      minWords: Long = 10L,
      maxWords: Long = 100000L,
      minMeanLenMilli: Long = 2000L,
      maxMeanLenMilli: Long = 12000L,
      minAlphaPermille: Long = 800L,
      minStopHits: Long = 2L,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(minWords >= 1, s"need minWords >= 1, got $minWords")
    docs
      .select(col(idCol) +: metrics(textCol): _*)
      .withColumn(
        "keep",
        keepPredicate(
          minWords, maxWords, minMeanLenMilli, maxMeanLenMilli,
          minAlphaPermille, minStopHits
        )
      )
  }

  /** Admission form: the documents [[gopherRules]] keeps, original
    * columns intact. The metric columns are added, filtered on, and
    * dropped in one plan — Catalyst collapses the projections, so this is
    * a scan-local predicate: no flag frame, no join back, no shuffle. (A
    * semi-join against flagged ids would be a corpus self-join — never
    * broadcastable at 100 TB, and pointless for a row-local rule.)
    */
  def filterGopher(
      docs: DataFrame,
      minWords: Long = 10L,
      maxWords: Long = 100000L,
      minMeanLenMilli: Long = 2000L,
      maxMeanLenMilli: Long = 12000L,
      minAlphaPermille: Long = 800L,
      minStopHits: Long = 2L,
      textCol: String = "text"
  ): DataFrame = {
    require(minWords >= 1, s"need minWords >= 1, got $minWords")
    docs
      .select(col("*") +: metrics(textCol): _*)
      .filter(
        keepPredicate(
          minWords, maxWords, minMeanLenMilli, maxMeanLenMilli,
          minAlphaPermille, minStopHits
        )
      )
      .select(docs.columns.map(col).toSeq: _*)
  }
}
