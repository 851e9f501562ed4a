package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, TextFunctions}

/** Exact corpus-wide heavy hitters — every token whose frequency strictly
  * exceeds `n / k` of the `n`-token corpus — via the standard two-pass
  * sketch-then-recount plan:
  *
  *   pass 1: one scan folds the token stream into a Misra-Gries summary of
  *           `capacity = k` counters ([[graft.functions.MisraGries]]) plus
  *           the exact token total. MG's guarantee (any item with
  *           frequency > n/(capacity+1) survives) with `capacity >= k`
  *           makes the candidate set a SUPERSET of the answer regardless
  *           of data distribution or partitioning.
  *   pass 2: one scan recounts ONLY the <= k candidate tokens exactly
  *           (broadcast semi-join before the aggregate), then filters by
  *           the exact threshold `freq * k > n`.
  *
  * The output is therefore EXACT — the sketch only bounds what must be
  * recounted — which is what lets a plain GROUP-BY/HAVING DuckDB oracle
  * pin it.
  *
  * Scale shape (the reason this operator exists next to
  * [[Vocabulary.build]]'s bounded top-V): at web scale even the DISTINCT
  * token-frequency table is a multi-TB intermediate, so a plan that
  * starts `groupBy(token)` pays a corpus-wide shuffle on a Zipfian key
  * before it can rank anything. Here pass 1 shuffles `partitions × k`
  * counter rows (the MG partials), and pass 2's aggregate carries only
  * occurrences of the <= k candidates — partial aggregation reduces each
  * partition to <= k rows before its shuffle. No sort, no corpus-keyed
  * exchange anywhere. (Reference scope: `dump_table.py` has no
  * aggregation at all — SURVEY §2.1; this is north-star text-analysis
  * surface.)
  */
object HeavyHitters {

  /** Pass-1 candidate frame: `(tok, lb)` rows from the Misra-Gries summary
    * (at most `capacity`), plus the exact corpus token total `n` on every
    * row. One corpus scan, one single-row exchange.
    */
  def candidates(docs: DataFrame, textCol: String, capacity: Int): DataFrame = {
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
    toks
      .agg(
        GraftExpressions.misra_gries(col("tok"), capacity).as("sk"),
        count(lit(1)).as("n")
      )
      .select(explode(col("sk")).as("e"), col("n"))
      .select(col("e.tok").as("tok"), col("e.lb").as("lb"), col("n"))
  }

  /** Exact heavy hitters: `(tok, freq, permille)` for every token with
    * `freq * k > n`, ordered by (freq desc, tok). `capacity` defaults to
    * `k`, the smallest size that preserves the superset guarantee
    * (`n/(capacity+1) < n/k`); raise it to also surface NEAR-threshold
    * candidates in [[candidates]] audits.
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int, capacity: Int = 0): DataFrame = {
    val cap = if (capacity > 0) capacity else k
    require(cap >= k, s"capacity $cap breaks the superset guarantee for threshold n/$k")
    val cand = candidates(docs, textCol, cap)
    val toks = docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
    toks
      .join(broadcast(cand.select(col("tok"), col("n"))), Seq("tok"))
      .groupBy(col("tok"), col("n"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") * lit(k.toLong) > col("n"))
      .select(
        col("tok"),
        col("freq"),
        expr("freq * 1000 div n").as("permille")
      )
      .orderBy(col("freq").desc, col("tok"))
  }
}
