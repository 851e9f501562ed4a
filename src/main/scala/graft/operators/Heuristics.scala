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

  /** The default-threshold keep PREDICATE as a Column — the exact fused
    * kernel [[filterGopher]] filters on, exposed so a caller computing
    * multiple gate flags in one scan pass (the attrition audit) uses the
    * same expression and cannot drift from the admission path.
    */
  def gopherKeepExpr(textCol: Column): Column =
    GraftExpressions.gopher_keep(
      textCol,
      MinWords, MaxWords, MinMeanLenMilli, MaxMeanLenMilli,
      MinAlphaPermille, MinStopDistinct
    )

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

  /** C4-style blocklist filtering (Raffel et al. 2020 §2.2 dropped any
    * page containing a "List of Dirty, Naughty …" word): per document,
    * the OCCURRENCE count of blocklist tokens (exact token equality
    * under the engine-wide single-space split — substring matching is
    * deliberately out: "class" must not hit a blocklist entry "ass") and
    * `keep = n_hits == 0`. The audit form; compose
    * `.filter(col("keep"))` for the C4 drop rule, or threshold on
    * `n_hits` for the softer ratio gates later pipelines use (a single
    * hit in a 10k-word page is usually a quote, not a topic).
    *
    * Scale shape: the blocklist is a LITERAL array in the expression
    * (bounded: a curated list is hundreds of entries, like
    * [[graft.functions.TextFunctions.StopwordsEn]]) — one scan-local
    * filter over builtin array functions, zero shuffle, codegen'd; the
    * corpus never moves. The oracle mirrors it via the same
    * `list_filter`/`list_contains` fragment as the stop-word counts.
    */
  def blocklistReport(
      docs: DataFrame,
      words: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(words.nonEmpty, "need a non-empty blocklist")
    require(words.forall(w => w.nonEmpty && !w.contains(" ")), "blocklist entries are single tokens")
    val hits = size(
      filter(
        split(col(textCol), " "),
        t => array_contains(array(words.map(lit): _*), t)
      )
    ).cast("long")
    docs.select(
      col(idCol),
      hits.as("n_hits"),
      (hits === 0L).as("keep")
    )
  }

  /** Admission form of [[blocklistReport]]: scan-local drop of every
    * document containing any blocklist token, original columns
    * untouched.
    */
  def filterBlocklist(
      docs: DataFrame,
      words: Seq[String],
      textCol: String = "text"
  ): DataFrame = {
    require(words.nonEmpty, "need a non-empty blocklist")
    require(words.forall(w => w.nonEmpty && !w.contains(" ")), "blocklist entries are single tokens")
    docs.filter(
      !exists(split(col(textCol), " "), t => array_contains(array(words.map(lit): _*), t))
    )
  }

  /** Multi-word sibling of [[blocklistReport]]: OVERLAPPING occurrence
    * counts of blocked PHRASES — a phrase hits at token position i when
    * the k-token window starting there equals it exactly (same clamped
    * positional-window convention as the winnowing/decontamination
    * shingles, mirrored by `OracleFragments.positionalShingles`). C4's
    * list blocks phrases as well as words, and a token-level list cannot
    * express them without also banning each word alone ("watch" in
    * "watch free movies online" is innocent by itself).
    *
    * One window-compare chain per DISTINCT phrase LENGTH re-uses one
    * split; the phrase list is a bounded literal like the token list.
    * Scan-local, zero shuffle, codegen'd builtin array ops.
    */
  def phraseBlocklistReport(
      docs: DataFrame,
      phrases: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(phrases.nonEmpty, "need a non-empty phrase list")
    require(
      phrases.forall(p => p.trim == p && p.nonEmpty && p.split(" ").forall(_.nonEmpty)),
      "phrases are single-space token sequences with no leading/trailing/double spaces"
    )
    // materialize the split ONCE as a column: higher-order functions are
    // interpreted (CodegenFallback), and any computed expression inside
    // the lambda body — here the token array — re-evaluates PER ELEMENT;
    // with split inlined that is O(n_tok²) re-splits per document
    // (measured 5.5 s at sf0.1; an attribute reference is a row read)
    val withToks = docs.select(col(idCol), split(col(textCol), " ").as("__graft_toks"))
    val toks = col("__graft_toks")
    // group phrases by token count: one positional pass per length. The
    // window STRING is only built at positions whose token matches some
    // phrase's FIRST token (And short-circuits) — on ordinary text almost
    // every position fails that one array_contains, so the concat_ws
    // allocation never runs
    val hits = phrases
      .groupBy(_.split(" ").length)
      .toSeq
      .sortBy(_._1)
      .map { case (k, ps) =>
        val firsts = ps.map(_.split(" ").head).distinct
        size(
          filter(
            sequence(lit(0), greatest(size(toks) - k, lit(0))),
            i =>
              array_contains(array(firsts.map(lit): _*), element_at(toks, i + 1)) &&
                array_contains(array(ps.map(lit): _*), concat_ws(" ", slice(toks, i + 1, lit(k))))
          )
        ).cast("long")
      }
      .reduce(_ + _)
    withToks
      .select(col(idCol), hits.as("n_hits"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** Admission form of [[phraseBlocklistReport]]. */
  def filterBlockedPhrases(
      docs: DataFrame,
      phrases: Seq[String],
      textCol: String = "text"
  ): DataFrame = {
    require(phrases.nonEmpty, "need a non-empty phrase list")
    require(
      phrases.forall(p => p.trim == p && p.nonEmpty && p.split(" ").forall(_.nonEmpty)),
      "phrases are single-space token sequences with no leading/trailing/double spaces"
    )
    // same single-materialization discipline as the report form (HOF
    // lambda bodies re-evaluate computed expressions per element)
    val toks = col("__graft_toks")
    val anyHit = phrases
      .groupBy(_.split(" ").length)
      .toSeq
      .sortBy(_._1)
      .map { case (k, ps) =>
        val firsts = ps.map(_.split(" ").head).distinct
        exists(
          sequence(lit(0), greatest(size(toks) - k, lit(0))),
          i =>
            array_contains(array(firsts.map(lit): _*), element_at(toks, i + 1)) &&
              array_contains(array(ps.map(lit): _*), concat_ws(" ", slice(toks, i + 1, lit(k))))
        )
      }
      .reduce(_ || _)
    docs
      .withColumn("__graft_toks", split(col(textCol), " "))
      .filter(!anyHit)
      .drop("__graft_toks")
  }
}
