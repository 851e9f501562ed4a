package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing — the step between chunking and training batches in an
  * LLM data pipeline: assign each document's overlapping token-window chunks
  * (see [[TextFunctions.chunks]]) to fixed token-budget training sequences,
  * in order, greedily.
  *
  * The assignment is a PER-DOCUMENT running token sum: chunk `c` lands in
  * sequence `floor(tokens_before_c / budget)`. That makes the plan a window
  * partitioned by `doc_id` — parallel across documents with no global sort,
  * so at 100 TB the only shuffle is the hash partition on `doc_id` (and the
  * per-partition sort Spark already needs for the window). Documents are
  * independent; skew is bounded by the longest single document, not the
  * corpus.
  *
  * Packing is greedy-in-order by design (the standard training-data recipe):
  * chunks stay in document order, a sequence closes as soon as the running
  * sum crosses its budget boundary, and therefore `n_tokens` of a sequence
  * is `< budget + chunkTokens_max` (the final chunk may overhang). A
  * bin-packing variant that reorders chunks would destroy document
  * contiguity, which downstream attention masking relies on.
  *
  * The reference has no notion of chunking or packing (SURVEY.md §2.1); this
  * is a north-star extension, DuckDB-mirrored by q60's oracle (same stride
  * windows, same running sum).
  */
object SequencePack {

  /** One row per (doc, chunk): the chunk text, its in-document index, and
    * its token count. `posexplode` keeps chunk order explicit rather than
    * relying on row order surviving the explode.
    */
  def chunkFrame(
      docs: DataFrame,
      chunkSize: Int,
      overlap: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      carry: Seq[String] = Nil
  ): DataFrame =
    docs
      .select(
        col(idCol) +: carry.map(col) :+
          posexplode(TextFunctions.chunks(col(textCol), chunkSize, overlap))
            .as(Seq("chunk_idx", "chunk")): _*
      )
      .select(
        col(idCol) +: carry.map(col) :+
          col("chunk_idx").cast("long").as("chunk_idx") :+
          col("chunk") :+
          size(split(col("chunk"), " ")).cast("long").as("n_tok"): _*
      )

  /** Chunk→sequence assignment for every chunk: adds `seq_id` (the training
    * sequence the chunk belongs to) to [[chunkFrame]]'s output. Exposed
    * separately so a writer can partition the physical layout by
    * `(doc_id, seq_id)` and emit actual sequence text.
    */
  def assign(
      docs: DataFrame,
      budget: Int,
      chunkSize: Int,
      overlap: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      carry: Seq[String] = Nil
  ): DataFrame = {
    require(budget > 0, s"need budget > 0, got $budget")
    val w = Window
      .partitionBy(col(idCol))
      .orderBy(col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunkFrame(docs, chunkSize, overlap, textCol, idCol, carry)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div $budget"))
  }

  /** Per-sequence summary: `(doc_id, seq_id, n_chunks, n_tokens)`. The q60
    * gate hash-matches this against the DuckDB oracle. `carry` lists
    * doc-constant columns (e.g. `lang`) to ride through the aggregate —
    * adding them to the grouping key is free (doc_id already determines
    * them) and saves the caller a join back to the source frame, i.e. a
    * whole second evaluation of whatever pipeline produced `docs`.
    */
  def pack(
      docs: DataFrame,
      budget: Int,
      chunkSize: Int,
      overlap: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      carry: Seq[String] = Nil
  ): DataFrame =
    assign(docs, budget, chunkSize, overlap, textCol, idCol, carry)
      .groupBy(col(idCol) +: col("seq_id") +: carry.map(col): _*)
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tok")).as("n_tokens"))

  /** CROSS-document packing — fill fixed token-budget training rows from
    * many (typically short) documents, the corpus-level counterpart of
    * [[pack]]'s within-document chunk packing.
    *
    * A globally optimal bin packing is inherently sequential, so the
    * scalable form shards the corpus into `buckets` content-hash buckets
    * and packs greedily WITHIN each bucket in deterministic
    * (hash, id) order: seq = floor(tokens_before / budget) over a window
    * partitioned by bucket. Buckets are hash-uniform (no natural-key
    * skew), each sorts only its own share, and the assignment is
    * reproducible across runs and partitionings. Waste per sequence is
    * bounded by the last document's overhang, exactly as in [[pack]].
    *
    * Returns `(bucket, seq_id, doc_id, h, n_tok, cum)` — one row per
    * document with its assigned training row; aggregate or write
    * partitioned by (bucket, seq_id) downstream.
    */
  def packAcross(
      docs: DataFrame,
      budget: Int,
      buckets: Int,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budget > 0 && buckets > 0, s"need budget > 0 and buckets > 0, got $budget, $buckets")
    greedyWithinBuckets(
      scoredOf(docs, textCol, idCol).withColumn("bucket", pmod(col("h"), lit(buckets.toLong))),
      budget,
      idCol
    )
  }

  /** [[packAcross]] with the bucket count DERIVED from the corpus size:
    * `buckets = max(1, ⌈n_docs / targetDocsPerBucket⌉)`, computed inside
    * the plan (one broadcast single-row count — no driver action, no
    * collect). A fixed bucket count is a driver-sized constant: at 100×
    * the corpus each bucket's single-task window sort grows 100×.
    * Deriving holds per-bucket work at ~`targetDocsPerBucket` rows at ANY
    * corpus size — the bucket count scales instead of the task. The
    * default target keeps a bucket's sort comfortably inside one
    * executor task (~1M docs ≈ tens of MB of (id, hash, count) triples);
    * the gated example passes a small target so the derivation itself is
    * exercised (multiple buckets) at fixture scale.
    */
  def packAcrossAuto(
      docs: DataFrame,
      budget: Int,
      targetDocsPerBucket: Long = 1L << 20,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(
      budget > 0 && targetDocsPerBucket > 0,
      s"need budget > 0 and targetDocsPerBucket > 0, got $budget, $targetDocsPerBucket"
    )
    val nb = docs
      .select(col(idCol))
      .agg(
        greatest(
          lit(1L),
          expr(s"(count(1) + ${targetDocsPerBucket - 1}) div $targetDocsPerBucket")
        ).as("n_buckets")
      )
    greedyWithinBuckets(
      scoredOf(docs, textCol, idCol)
        .crossJoin(broadcast(nb))
        .withColumn("bucket", pmod(col("h"), col("n_buckets"))),
      budget,
      idCol
    )
  }

  /** `(id, content hash, token count)` — the packing working set. */
  private def scoredOf(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      graft.functions.GraftExpressions.poly_hash(col(textCol)).as("h"),
      size(split(col(textCol), " ")).cast("long").as("n_tok")
    )

  /** The greedy running-sum assignment shared by both bucket strategies:
    * seq = floor(tokens_before / budget) over a window partitioned by
    * `bucket`, ordered (hash, id) for cross-run determinism.
    */
  private def greedyWithinBuckets(bucketed: DataFrame, budget: Int, idCol: String): DataFrame = {
    val w = Window
      .partitionBy(col("bucket"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div $budget"))
      .select(col("bucket"), col("seq_id"), col(idCol), col("h"), col("n_tok"), col("cum"))
  }
}
