package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Block-matrix triangle self-join: all unordered pairs {a, b} (ordered by
  * `idCol`) within groups of `groupCols`, with each group's quadratic work
  * SPLIT across block-pair tasks instead of landing in one task per group.
  *
  * Every row gets block g = id mod blocks; task (i, j), i ≤ j, compares
  * block i against block j within the group. The left side replicates to
  * tasks (g, j ≥ g), the right side to (i ≤ g, g) — so the join stays a
  * pure EQUI-join on (groupCols, i, j) with ~blocks/2 replication, and a
  * skewed group (one giant LSH bucket, a Zipfian key) becomes
  * blocks·(blocks+1)/2 bounded tasks rather than a straggler. This is the
  * self-join shape that survives 1000 executors; AQE's skew splitting
  * can't help a single oversized build side, this never builds one.
  *
  * Callers join through aliases `l`/`r` and must select/rename away the
  * internal `__g/__i/__j` columns.
  */
object BlockedJoin {

  def trianglePairs(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      blocks: Int
  ): DataFrame = {
    val e = df.withColumn("__g", pmod(col(idCol), lit(blocks)))
    val left = e
      .withColumn("__j", explode(sequence(col("__g"), lit(blocks - 1))))
      .withColumn("__i", col("__g"))
    val right = e
      .withColumn("__i", explode(sequence(lit(0), col("__g"))))
      .withColumn("__j", col("__g"))
    val sameGroup = groupCols
      .map(c => col(s"l.$c") === col(s"r.$c"))
      .foldLeft(lit(true))(_ && _)
    left
      .as("l")
      .join(
        right.as("r"),
        sameGroup &&
          col("l.__i") === col("r.__i") && col("l.__j") === col("r.__j") &&
          (col("l.__g") < col("r.__g") || col(s"l.$idCol") < col(s"r.$idCol"))
      )
  }
}
