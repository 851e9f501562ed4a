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
      idCol: String = "doc_id"
  ): DataFrame =
    docs
      .select(
        col(idCol),
        posexplode(TextFunctions.chunks(col(textCol), chunkSize, overlap))
          .as(Seq("chunk_idx", "chunk"))
      )
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk"),
        size(split(col("chunk"), " ")).cast("long").as("n_tok")
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
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budget > 0, s"need budget > 0, got $budget")
    val w = Window
      .partitionBy(col(idCol))
      .orderBy(col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunkFrame(docs, chunkSize, overlap, textCol, idCol)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div $budget"))
  }

  /** Per-sequence summary: `(doc_id, seq_id, n_chunks, n_tokens)`. The q60
    * gate hash-matches this against the DuckDB oracle.
    */
  def pack(
      docs: DataFrame,
      budget: Int,
      chunkSize: Int,
      overlap: Int,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    assign(docs, budget, chunkSize, overlap, textCol, idCol)
      .groupBy(col(idCol), col("seq_id"))
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
    val scored = docs.select(
      col(idCol),
      graft.functions.GraftExpressions.poly_hash(col(textCol)).as("h"),
      size(split(col(textCol), " ")).cast("long").as("n_tok")
    )
    val w = Window
      .partitionBy(col("bucket"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("bucket", pmod(col("h"), lit(buckets.toLong)))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", expr(s"(cum - n_tok) div $budget"))
      .select(col("bucket"), col("seq_id"), col(idCol), col("h"), col("n_tok"), col("cum"))
  }
}
