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
  def piiReport(docs: DataFrame, textCol: String = "text", groupCol: String = "lang"): DataFrame = {
    import graft.functions.TextFunctions.{EmailRegex, LongNumberRegex}
    val nEmails = regexp_count(col(textCol), lit(EmailRegex))
    val nNums =
      regexp_count(regexp_replace(col(textCol), EmailRegex, "<email>"), lit(LongNumberRegex))
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
}
