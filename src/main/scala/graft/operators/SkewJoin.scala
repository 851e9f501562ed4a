package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Salted equi-join for SKEWED foreign keys — the manual form of skew
  * mitigation for when AQE's runtime skew-join splitting can't apply
  * (e.g. the skew is known ahead of time, or the join feeds an operator
  * AQE won't re-plan). The reference has no joins at all (SURVEY.md §2.1);
  * this completes the engine's skew toolbox alongside
  * [[BlockedJoin.trianglePairs]] (self-join skew) and AQE (runtime skew).
  *
  * A hot key sends every one of its fact rows to ONE shuffle partition —
  * 10^9 rows of one customer land on one task while the other 999
  * executors idle. Salting splits the hot key's rows `salts` ways: the
  * fact side gets a salt derived from a UNIQUE fact column (NOT from the
  * join key — a key-derived salt would keep all hot rows together, and a
  * random salt would break determinism/retry-safety), and the small side
  * replicates ×`salts` so every (key, salt) bucket finds its match. The
  * join stays a pure equi-join on (key, salt); results are EXACTLY those
  * of the unsalted join, which is what the q55 oracle pins.
  *
  * Cost model: dim side inflates ×salts, so pick `salts` ≈ the factor by
  * which the hottest key exceeds a balanced partition — typically 8–64.
  * (When the dim side also fits in a broadcast, broadcast instead; salting
  * targets the mid-size dim that must shuffle.)
  */
object SkewJoin {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factUniqueCol: String,
      salts: Int
  ): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = fact.withColumn("__salt", pmod(xxhash64(col(factUniqueCol)), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
