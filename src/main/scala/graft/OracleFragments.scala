package graft

import graft.operators.Dedup

/** DuckDB SQL fragments that mirror the engine's deterministic kernels
  * exactly (same fold order, same modular arithmetic, all intermediates
  * below 2^63 because DuckDB BIGINT traps on overflow). Shared constants
  * come from the Scala implementations so the two sides cannot drift.
  */
object OracleFragments {
  val P: Long = graft.functions.Kernels.HashPrime

  /** Mirror of Kernels.polyHash: left fold (h*31 + codepoint) mod P. */
  def polyHash(col: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split_regex($col, ''), c -> unicode(c))), " +
      s"(h, c) -> (h*31 + c) % $P)"

  def tokens(col: String): String = s"string_split($col, ' ')"

  /** Mirror of TextFunctions.shingles: distinct k-token windows. */
  def shingles(col: String, k: Int = Dedup.ShingleK): String = {
    val t = tokens(col)
    s"list_distinct(list_transform(range(0, greatest(len($t) - $k, 0) + 1), " +
      s"i -> array_to_string(($t)[i+1:i+$k], ' ')))"
  }

  /** Mirror of TextFunctions.shingleHashes. */
  def shingleHashes(col: String, k: Int = Dedup.ShingleK): String =
    s"list_transform(${shingles(col, k)}, s -> ${polyHash("s")})"

  /** Mirror of Dedup.minhashSignature: per permutation i, min over shingle
    * hashes of (h*(2i+1) + (i*i*31+7) mod P) mod P.
    */
  def minhashSignature(col: String): String =
    s"list_transform(range(0, ${Dedup.NumHashes}), i -> " +
      s"list_min(list_transform(${shingleHashes(col)}, " +
      s"h -> (h*(2*i+1) + (i*i*31+7) % $P) % $P)))"

  /** Mirror of Dedup.jaccard over two distinct-element list expressions. */
  def jaccard(a: String, b: String): String =
    s"(CAST(len(list_filter($a, x -> list_contains($b, x))) AS DOUBLE) / " +
      s"(CAST(len($a) AS DOUBLE) + CAST(len($b) AS DOUBLE) - " +
      s"CAST(len(list_filter($a, x -> list_contains($b, x))) AS DOUBLE)))"

  /** Mirror of Kernels.cosine: products/norms in double, sequential fold. */
  def cosine(a: String, b: String): String = {
    def fold(l: String) = s"list_reduce(list_prepend(0.0, $l), (x, y) -> x + y)"
    val dot = fold(s"list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))")
    val na = fold(s"list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val nb = fold(s"list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    s"($dot / (sqrt($na) * sqrt($nb)))"
  }

  /** Mirror of VectorFunctions.lshBucket: hyperplane w[p][j] =
    * ((p*dim+j)*2654435761 mod 1000003)/1000003 − 0.5; bucket = packed sign
    * bits of the plane dots.
    */
  def lshBucket(vec: String, planes: Int, dim: Int): String = {
    val terms = (0 until planes).map { p =>
      val w = s"CAST((($p*$dim + j) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5"
      val prods = s"list_transform(range(0, $dim), j -> CAST(($vec)[j+1] AS DOUBLE) * ($w))"
      val dot = s"list_reduce(list_prepend(0.0, $prods), (x, y) -> x + y)"
      s"(CASE WHEN $dot >= 0.0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }
    terms.mkString("(", " + ", ")")
  }

  def stopwordHits(col: String, words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(${tokens(col)}, t -> list_contains($lst, t)))"
  }
}
