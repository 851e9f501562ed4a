package graft.operators

import graft.functions.{GraftExpressions, TextFunctions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for LLM training-data pipelines (north-star
  * extension; the reference has no dedup of any kind — SURVEY.md §2.1).
  *
  * Scale design notes (the 100 TB contract):
  *  - exact dedup is one hash-aggregate shuffle on the content key;
  *  - MinHash/LSH turns the O(n²) near-dup problem into
  *    signature computation (embarrassingly parallel, codegen'd HOFs) +
  *    one `groupBy(band, key)` shuffle whose fan-in is bounded by collision
  *    groups, never all-pairs;
  *  - SimHash reduces each document to one 32-bit integer via a single
  *    explode+aggregate shuffle, then compares only within cheap buckets;
  *  - n-gram Jaccard verification runs only on LSH/bucket candidates.
  *
  * All hash arithmetic stays below 2^63 and uses the engine-wide
  * `poly_hash` (mod 1e9+7) so the DuckDB oracle can replay every step.
  */
object Dedup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4 // NumHashes / Bands
  val ShingleK = 3
  val P: Long = graft.functions.Kernels.HashPrime

  /** Exact dedup, deterministic representative: group rows by content and
    * keep the smallest id. (`dropDuplicates` keeps an arbitrary row, which
    * can never be oracle-verified; min-id is the canonical scalable idiom —
    * one hash-aggregate, map-side partial aggregation for free.)
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))

  /** MinHash signature over an already-materialized shingle-hash array
    * column: for permutation i, min over shingle hashes h of
    * (h*(2i+1) + (i²*31+7)) mod P. Pure HOF pipeline — no UDF, no shuffle.
    *
    * Takes a column REFERENCE, not the hashing expression: a nested HOF
    * re-evaluates its inner argument per outer element, so inlining the
    * shingle pipeline here would hash every document NumHashes times.
    * Callers project the hashes into a column first (see [[minhashBands]]).
    */
  def minhashSignature(shingleHashCol: Column): Column =
    transform(
      sequence(lit(0), lit(NumHashes - 1)),
      i => {
        val a = i.cast("long") * lit(2L) + lit(1L)
        val b = (i.cast("long") * i.cast("long") * lit(31L) + lit(7L)) % lit(P)
        array_min(transform(shingleHashCol, h => (h * a + b) % lit(P)))
      }
    )

  /** LSH banding: explode each signature into (band, bandKey) bucket rows.
    * Band key is the joined minhash slice — grouping on it is the one
    * shuffle of the whole near-dup pipeline.
    */
  def minhashBands(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    docs
      .select(
        col(idCol).as("doc_id"),
        TextFunctions.shingleHashes(col(textCol), ShingleK).as("shs")
      )
      .select(col("doc_id"), minhashSignature(col("shs")).as("sig"))
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), lit(Bands - 1)),
            b =>
              struct(
                b.as("band"),
                concat_ws("_", slice(col("sig"), b * lit(RowsPerBand) + lit(1), lit(RowsPerBand)))
                  .as("band_key")
              )
          )
        ).as("bk")
      )
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Exact Jaccard between two distinct-element arrays, as the shared
    * formula |A∩B| / (|A|+|B|−|A∩B|) with the intersection computed by a
    * filter/contains scan — the form both engines evaluate identically.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(filter(a, x => array_contains(b, x))).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  /** MinHash+LSH near-duplicate pairs: band-bucket join for candidates, then
    * exact shingle-set Jaccard verification at `threshold`.
    */
  def minhashPairs(
      docs: DataFrame,
      threshold: Double,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val bands = minhashBands(docs, textCol, idCol)
    val candidates = bands
      .as("l")
      .join(bands.as("r"), expr("l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    val sets = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.shingles(col(textCol), ShingleK).as("sh")
    )
    candidates
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), round(jaccard(col("sa.sh"), col("sb.sh")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash per document via one explode + one aggregate: bit i is
    * set when at least half the token hashes have bit i set. The per-bit
    * sums are 32 independent partial aggregates — map-side combined, one
    * shuffle total, no per-document array state.
    */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok")
    )
    val hashed = tok.select(col("doc_id"), GraftExpressions.poly_hash(col("tok")).as("h"))
    val bitSums = (0 until 32).map(i => sum(shiftright(col("h"), i) % lit(2L)).as(s"s$i"))
    val agg = hashed.groupBy(col("doc_id")).agg(count(lit(1)).as("n"), bitSums: _*)
    val sim = (0 until 32)
      .map(i => when(col(s"s$i") * lit(2L) >= col("n"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: compare within coarse buckets (top 16 bits
    * equal) — the scale path; hamming distance ≤ maxHamming verified with
    * xor+bit_count.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sh = simhash(docs).withColumn("bucket", shiftright(col("simhash"), 16))
    sh.as("l")
      .join(sh.as("r"), expr("l.bucket = r.bucket AND l.doc_id < r.doc_id"))
      .select(
        col("l.doc_id").as("doc_a"),
        col("r.doc_id").as("doc_b"),
        expr("bit_count(l.simhash ^ r.simhash)").as("hamming")
      )
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard near-dup pairs, candidate-bucketed by the first two
    * tokens (cheap blocking key; at scale swap in the LSH bands above).
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val withKey = docs.select(
      col("doc_id"),
      concat_ws(" ", slice(TextFunctions.tokens(col("text")), 1, 2)).as("bucket"),
      TextFunctions.shingles(col("text"), ShingleK).as("sh")
    )
    withKey
      .as("l")
      .join(withKey.as("r"), expr("l.bucket = r.bucket AND l.doc_id < r.doc_id"))
      .select(
        col("l.doc_id").as("doc_a"),
        col("r.doc_id").as("doc_b"),
        round(jaccard(col("l.sh"), col("r.sh")), 6).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-duplicates. Exact all-pairs form; the join is a
    * single equi-free comparison so Spark plans a broadcast nested loop at
    * fixture scale. At 100 TB use [[Similarity.annLsh]] buckets as the
    * blocking stage and this as the verifier.
    */
  def embeddingPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    e.as("l")
      .join(e.as("r"), col("l.vec_id") < col("r.vec_id"))
      .select(
        col("l.vec_id").as("vec_a"),
        col("r.vec_id").as("vec_b"),
        VectorFunctions.cosine(col("l.embedding"), col("r.embedding")).as("cos")
      )
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }
}
