package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column library over `array<float>` columns.
  *
  * Two implementations of the same similarity contract:
  *  - [[cosine]] — the custom codegen'd Catalyst expression (hot path:
  *    one pass over the two ArrayData buffers, no intermediate allocation);
  *  - [[cosineHof]] — the pure-built-in composition (`zip_with` +
  *    `aggregate`), kept as the portable/reference form and exercised in
  *    tests to prove both agree bit-for-bit.
  *
  * All accumulation is double, in index order — the exact fold the DuckDB
  * oracle mirrors with `list_reduce`.
  */
object VectorFunctions {

  def cosine(a: Column, b: Column): Column = GraftExpressions.cosine_sim(a, b)

  def dot(a: Column, b: Column): Column = GraftExpressions.dot_product(a, b)

  /** Built-in-only cosine: products via zip_with, sequential double fold via
    * aggregate, norms likewise.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def fold(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val prods = zip_with(a, b, (x, y) => x.cast("double") * y.cast("double"))
    val sqA = transform(a, x => x.cast("double") * x.cast("double"))
    val sqB = transform(b, x => x.cast("double") * x.cast("double"))
    fold(prods) / (sqrt(fold(sqA)) * sqrt(fold(sqB)))
  }

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (s, x) => s + x))

  /** Multi-table random-hyperplane LSH signature (array<long>, one packed
    * bucket per table) — codegen'd expression over the shared deterministic
    * xor-shift plane generator ([[Kernels.planeWeight]]). See
    * [[graft.operators.Similarity]] for the probing scheme.
    */
  def lshBuckets(vec: Column, tables: Int, planesPerTable: Int, dim: Int): Column =
    GraftExpressions.lsh_buckets(vec, tables, planesPerTable, dim)

  /** Built-in-only (interpreted HOF) mirror of [[lshBuckets]], with the
    * plane weights embedded as literals from the same kernel — kept solely
    * so tests can prove the codegen'd expression and the composable form
    * bucket identically.
    */
  def lshBucketsHof(vec: Column, tables: Int, planesPerTable: Int, dim: Int): Column = {
    def planeDot(p: Int): Column = {
      val w = Array.tabulate(dim)(j => Kernels.planeWeight(p, j, dim))
      aggregate(
        zip_with(vec, lit(w), (x, ww) => x.cast("double") * ww),
        lit(0.0),
        (s, x) => s + x
      )
    }
    val buckets = (0 until tables).map { t =>
      (0 until planesPerTable)
        .map(j =>
          when(planeDot(t * planesPerTable + j) >= lit(0.0), lit(1L << j)).otherwise(lit(0L))
        )
        .reduce(_ + _)
    }
    array(buckets: _*)
  }
}
