package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE / INTERVAL JOINS as bucketized equi-joins — the operator Spark
  * itself lacks: a raw `p >= s AND p < e` (or interval-overlap) join
  * condition has no equality conjunct, so Catalyst can only plan it as
  * BroadcastNestedLoopJoin (fine for a tiny side) or a Cartesian product
  * (the scale killer — |points|·|intervals| comparisons). The standard
  * fix, and what the dedicated engines' range-join optimizations do under
  * the hood, is to QUANTIZE the range dimension into fixed-width buckets:
  *
  *   - a point lands in bucket ⌊p/w⌋;
  *   - an interval [s, e) replicates to every bucket its span touches
  *     (⌊s/w⌋ .. ⌊(e−1)/w⌋);
  *   - the join becomes a plain EQUI-join on the bucket id (shuffled hash
  *     / sort-merge — shuffle-partitionable, AQE-skew-splittable), with
  *     the exact predicate re-checked after.
  *
  * Candidate work is |points| + Σ spans/w instead of the cross product;
  * `bucketWidth` trades replication (long intervals fan out over
  * span/w buckets) against per-bucket candidate density. Pick w near the
  * TYPICAL interval length: each interval then replicates to ~1–2 buckets.
  * [[maxBucketsPerInterval]] fail-fasts the degenerate configuration (one
  * unbounded interval replicating a million rows) instead of producing it
  * silently.
  *
  * For interval×interval overlap the bucket replication would emit a pair
  * once per SHARED bucket; the OWNER-BUCKET rule — keep a pair only in
  * bucket ⌊max(s₁,s₂)/w⌋, the bucket where the overlap region starts,
  * which both spans necessarily touch — makes every pair unique by
  * construction, with no `distinct` (no second shuffle).
  *
  * Both joins take numeric (long) range columns; timestamp callers pass
  * `unix_micros(ts)` (exact, both engines). Intervals are HALF-OPEN
  * [s, e): `p == s` matches, `p == e` does not, and an empty interval
  * (e <= s) matches nothing. NULL range values never match (SQL
  * comparison semantics; the bucket explode drops them).
  *
  * (Reference scope: the reference is a straight table dump with no
  * joins — SURVEY.md §2.1; this is the brief's named extension surface
  * "as-of join, range join" — the as-of half shipped in r01 as q15.)
  */
object RangeJoin {


  /** Exact integer floor-division bucket id: `(x − pmod(x, w)) div w` —
    * `floor(x / w)` in DOUBLE loses exactness past 2^53, and `div` alone
    * truncates toward zero (wrong for negatives); subtracting the
    * non-negative pmod makes the numerator an exact multiple of w.
    */
  private def bucketExpr(valueSql: String, w: Long): String =
    s"CAST((($valueSql) - pmod(($valueSql), ${w}L)) div ${w}L AS BIGINT)"

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty, s"join sides must have disjoint column names, shared: ${shared.mkString(", ")}")
  }

  /** All (point, interval) containment pairs: `s <= p < e`. Output
    * carries every column of both inputs.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 4096L
  ): DataFrame = {
    require(bucketWidth > 0, s"need bucketWidth > 0, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "need maxBucketsPerInterval > 0")
    requireDisjoint(points, intervals)
    val pb = points.withColumn("__graft_bkt", expr(bucketExpr(s"`$pointCol`", bucketWidth)))
    val lo = expr(bucketExpr(s"`$startCol`", bucketWidth))
    val hi = expr(bucketExpr(s"`$endCol` - 1L", bucketWidth))
    val ib = intervals
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn(
        "__graft_bkt",
        explode(
          when(
            hi - lo + 1 <= maxBucketsPerInterval,
            sequence(lo, hi)
          ).otherwise(
            raise_error(concat(
              lit(s"rangeJoin: interval spans more than $maxBucketsPerInterval buckets of width $bucketWidth "),
              lit("(start "), col(startCol).cast("string"), lit(", end "), col(endCol).cast("string"),
              lit(") — raise bucketWidth or cap the interval")
            ))
          )
        )
      )
    pb.join(ib, Seq("__graft_bkt"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__graft_bkt")
  }

  /** All (left, right) OVERLAPPING interval pairs under half-open
    * semantics: `s₁ < e₂ AND s₂ < e₁`. Each pair appears exactly once
    * (owner-bucket rule — no distinct, no second shuffle). Output
    * carries every column of both inputs.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 4096L
  ): DataFrame = {
    require(bucketWidth > 0, s"need bucketWidth > 0, got $bucketWidth")
    require(maxBucketsPerInterval > 0, "need maxBucketsPerInterval > 0")
    requireDisjoint(left, right)
    def buckets(df: DataFrame, s: String, e: String): DataFrame = {
      val lo = expr(bucketExpr(s"`$s`", bucketWidth))
      val hi = expr(bucketExpr(s"`$e` - 1L", bucketWidth))
      df.filter(col(e) > col(s))
        .withColumn(
          "__graft_bkt",
          explode(
            when(hi - lo + 1 <= maxBucketsPerInterval, sequence(lo, hi))
              .otherwise(raise_error(lit(
                s"rangeJoin: interval spans more than $maxBucketsPerInterval buckets of width $bucketWidth — raise bucketWidth or cap the interval"
              )))
          )
        )
    }
    val lb = buckets(left, leftStart, leftEnd)
    val rb = buckets(right, rightStart, rightEnd)
    lb.join(rb, Seq("__graft_bkt"))
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      // owner bucket: the overlap region starts at max(s₁, s₂), inside
      // both spans — exactly one shared bucket claims the pair
      .filter(col("__graft_bkt") === expr(bucketExpr(s"greatest(`$leftStart`, `$rightStart`)", bucketWidth)))
      .drop("__graft_bkt")
  }
}
