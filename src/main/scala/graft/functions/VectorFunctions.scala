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

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a long.
    * Hyperplane components are pseudo-random but fully deterministic —
    * w[p][j] = ((p*dim+j) * 2654435761 mod 1000003) / 1000003 − 0.5 —
    * so the DuckDB oracle reproduces the identical bucketing (integer
    * intermediates stay < 2^63, and the double division/subtraction yields
    * bit-identical values in Scala and SQL).
    *
    * The planes are computed once here and embedded as array LITERALS, so
    * the per-row work is `planes` fused dot products — not re-deriving the
    * hyperplanes from scratch per row as a giant expression tree.
    */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column = {
    def plane(p: Int): Array[Double] =
      Array.tabulate(dim) { j =>
        ((p.toLong * dim + j) * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5
      }
    def planeDot(p: Int): Column =
      aggregate(
        zip_with(vec, lit(plane(p)), (x, w) => x.cast("double") * w),
        lit(0.0),
        (s, x) => s + x
      )
    (0 until planes)
      .map(p => when(planeDot(p) >= lit(0.0), lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
  }
}
