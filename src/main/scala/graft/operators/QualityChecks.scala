package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Data-quality gate for ingest pipelines: the assertions you run over a
  * freshly-landed 100 TB drop BEFORE letting it into training — null
  * rates on required columns, key uniqueness, and referential integrity
  * against a dimension. The reference's only check is its read-back row
  * count (`dump_table.py:235-248`); these are the content-level checks
  * that catch what a row count cannot (dropped joins, null-ed columns,
  * duplicated keys from a retried writer).
  *
  * Everything is one aggregate per frame plus one anti-join — no
  * collects, no per-rule passes: `profile` fuses the null/distinct
  * counts into a single scan so adding rules does not add scans.
  */
object QualityChecks {

  /** One-scan profile: total rows, per-column null counts, and the
    * distinct count of `keyCol` (duplicates = rows − distinct).
    */
  def profile(df: DataFrame, keyCol: String, requiredCols: Seq[String]): DataFrame = {
    val nullCounts = requiredCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c")
    )
    df.agg(
      count(lit(1)).as("n_rows"),
      (countDistinct(col(keyCol)).as("n_distinct_key") +: nullCounts): _*
    )
  }

  /** Rows of `fact` whose `factKey` has no match in `dim.dimKey` —
    * referential orphans, as a count. Left-anti join: one shuffle (or a
    * broadcast when the dim is small), never a full materialized join.
    */
  def orphanCount(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): Long =
    fact
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_anti")
      .count()

  /** PII exposure report per group — what
    * [[graft.functions.TextFunctions.scrub]] WOULD redact, counted before
    * it does: per `groupCol`, total docs, docs containing each pattern,
    * and total match occurrences. The audit that sizes the scrubbing
    * problem (and catches a source whose email density jumped 100×)
    * before any text is rewritten.
    *
    * Number runs are counted AFTER email redaction, exactly like the
    * scrub chain — a numeric email local-part is one `<email>`, not an
    * email plus a `<num>`. One codegen'd scan + one partial aggregate on
    * the group key; no UDFs, no second pass.
    */
  /** The scrub-mirroring PII match counts for one text column:
    * `(emails, number runs)` — numbers counted AFTER email redaction,
    * exactly like the scrub chain, so a numeric email local-part is one
    * `<email>`, never an email plus a `<num>`. ONE definition shared by
    * [[piiReport]] and [[sourceReputation]]: the redaction-order contract
    * lives here, not in two copies that could drift.
    */
  private def piiCounts(textCol: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    import graft.functions.TextFunctions.{EmailRegex, LongNumberRegex}
    (
      regexp_count(col(textCol), lit(EmailRegex)),
      regexp_count(regexp_replace(col(textCol), EmailRegex, "<email>"), lit(LongNumberRegex))
    )
  }

  def piiReport(docs: DataFrame, textCol: String = "text", groupCol: String = "lang"): DataFrame = {
    val (nEmails, nNums) = piiCounts(textCol)
    docs
      .select(col(groupCol), nEmails.as("e"), nNums.as("n"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("e") > 0, 1L).otherwise(0L)).as("docs_with_email"),
        sum(col("e")).cast("long").as("n_emails"),
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("docs_with_num"),
        sum(col("n")).cast("long").as("n_nums")
      )
  }

  /** Per-SOURCE reputation profile — the RefinedWeb/C4-style *container*
    * filter: a crawl source (domain, feed, dump) whose documents are
    * mostly low-quality or PII-laden gets dropped WHOLESALE, because
    * per-document filters leak a biased residue from a bad source while
    * burning a scan on it. One row per `groupCol`:
    *
    *   `(source, n_docs, total_tokens, mean_tokens, low_quality_docs,
    *     pii_docs, low_permille, pii_permille)`
    *
    * Ratios are integer PERMILLE (`x·1000 div n` — the q34 integer
    * discipline) so the profile is bit-reproducible across engines; the
    * one double comparison (`quality < minQuality`) sits on the
    * q65-calibrated threshold whose measured 1.9e-3 distribution gap
    * keeps cross-engine rounding from flipping a document.
    *
    * Scale shape: ONE codegen'd scan (fused quality kernel + the two
    * scrub-pattern counts) into one partial aggregate on the source key.
    * Source counts are Zipfian, but partial aggregation absorbs the hot
    * source map-side — same argument as exact dedup's 50k-copy smoke.
    */
  def sourceReputation(
      docs: DataFrame,
      minQuality: Double = 0.4275,
      textCol: String = "text",
      groupCol: String = "source"
  ): DataFrame = {
    import graft.functions.TextFunctions
    val (nEmails, nNums) = piiCounts(textCol)
    docs
      .select(
        col(groupCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("tk"),
        when(TextFunctions.qualityScoreFused(col(textCol)) < minQuality, 1L)
          .otherwise(0L)
          .as("lowq"),
        when(nEmails + nNums > 0, 1L).otherwise(0L).as("pii")
      )
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tk")).as("total_tokens"),
        sum(col("lowq")).as("low_quality_docs"),
        sum(col("pii")).as("pii_docs")
      )
      .select(
        col(groupCol),
        col("n_docs"),
        col("total_tokens"),
        expr("total_tokens div n_docs").as("mean_tokens"),
        col("low_quality_docs"),
        col("pii_docs"),
        expr("low_quality_docs * 1000 div n_docs").as("low_permille"),
        expr("pii_docs * 1000 div n_docs").as("pii_permille")
      )
  }

  /** Documents from sources whose reputation passes both gates — the
    * admission form of [[sourceReputation]] (broadcast semi join on the
    * passing source set: the source dimension is tiny next to the
    * corpus, so admission costs one scan, no shuffle).
    */
  def filterReputableSources(
      docs: DataFrame,
      maxLowPermille: Long = 500L,
      maxPiiPermille: Long = 900L,
      minQuality: Double = 0.4275,
      textCol: String = "text",
      groupCol: String = "source"
  ): DataFrame =
    docs.join(
      broadcast(
        sourceReputation(docs, minQuality, textCol, groupCol)
          .filter(
            col("low_permille") <= maxLowPermille && col("pii_permille") <= maxPiiPermille
          )
          .select(col(groupCol))
      ),
      Seq(groupCol),
      "left_semi"
    )
}
