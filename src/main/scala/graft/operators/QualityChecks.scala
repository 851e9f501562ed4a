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
}
