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

  /** Split each document's ENCODED id array
    * ([[Vocabulary.encodeSubwords]]'s output) into fixed-length training
    * windows — `(idCol, chunk_idx, ids, n_ids)` with every chunk exactly
    * `seqLen` ids except the last (the partial tail is KEPT; padding
    * policy is the trainer's, not the data layer's). This is the final
    * hop of the text→model-input chain: raw text → subword ids (q127) →
    * the fixed-shape sequences a training loader consumes. Document
    * boundaries are preserved (no cross-document concatenation — the
    * windows nest inside documents exactly like [[chunkFrame]]'s text
    * windows, and [[pack]]/[[packAcross]] remain the operators that
    * group whole chunks into token-budget batches).
    *
    * Scale shape: one `slice` transform per document row — no explode of
    * individual ids, no shuffle at all (the chunk arithmetic is
    * row-local); a doc's cost is its own length. Flattened, the output
    * is literally `(pos div seqLen, pos mod seqLen)` over the encoded
    * stream, which is how the oracle replays it.
    */
  def chunkIds(encoded: DataFrame, seqLen: Int, idCol: String = "doc_id"): DataFrame = {
    require(seqLen >= 1, s"need seqLen >= 1, got $seqLen")
    encoded
      .select(
        col(idCol),
        posexplode(
          when(
            size(col("ids")) > 0,
            transform(
              sequence(lit(0), expr(s"(size(ids) - 1) div $seqLen").cast("int")),
              i => slice(col("ids"), i * lit(seqLen) + lit(1), lit(seqLen))
            )
          ).otherwise(array().cast("array<array<bigint>>"))
        ).as(Seq("chunk_idx", "ids"))
      )
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("ids"),
        size(col("ids")).cast("long").as("n_ids")
      )
  }

  /** CROSS-document concat-and-chunk over ENCODED id sequences — the
    * GPT-style pretraining layout: every document's ids (each followed by
    * `eosId` when given — pass the tokenizer's real EOS; the gate uses a
    * sentinel) concatenated in `idCol` order into ONE global stream, then
    * split into exactly-`seqLen` windows that CROSS document boundaries.
    * Output `(chunk_idx, ids, n_ids)`: every window exactly `seqLen`
    * except the single global tail. Documents with empty `ids` are
    * dropped (they contribute no tokens, and a lone separator for an
    * empty document is noise, not signal). `idCol` must be non-NULL and
    * unique — the stream order is id order — and both violations RAISE
    * at execution (a NULL id's tokens would otherwise ride the offset
    * prefix sums while its rows drop at the bucket join, silently
    * shifting every later window; a duplicate would double-join its ids
    * with engine-order offsets).
    *
    * Where [[chunkIds]] nests windows INSIDE documents (attention masks
    * per document), this is the zero-padding-waste layout; the two are
    * the industry's standard packing pair.
    *
    * Scale shape — the operator needs two passes over the arrays
    * (measure every length before any window can be emitted, then emit),
    * so the base is materialized ONCE (eager localCheckpoint — a caller
    * piping the trainer+encode chain in-plan pays the chain once, the
    * probe-measured 2× of the recompute shape). A global stream position
    * looks inherently sequential, but it is exactly the
    * [[Sampling.bucketedRunningTotal]] problem in `idCol` order, and all
    * of it runs on the SLIM `(id, n)` projection (16 bytes/doc — the
    * arrays never enter a window): documents land in `buckets` contiguous
    * id-range buckets, per-bucket token sums (one partial-aggregated row
    * each) take an exclusive prefix over the ≤`buckets`-row frame and
    * broadcast back, and each bucket computes only its own within-bucket
    * running sum in parallel — the id ARRAYS never ride a window shuffle
    * and a whole-corpus sort never happens; the result is
    * bucket-count-INVARIANT (spec-pinned). The doc-count-sized offset
    * table joins back to the arrays on `idCol` (one co-keyed exchange),
    * each document emits its overlapped windows row-locally (`explode`
    * over `≤ n/seqLen + 2` window indexes, `slice` per piece), and one
    * shuffle on `chunk_idx` reassembles windows from their pieces — at
    * most `seqLen` pieces per window (a piece carries ≥ 1 id), so no key
    * can skew. Total piece rows ≈ n_docs + n_windows, never individual
    * ids.
    */
  def chunkIdsAcross(
      encoded: DataFrame,
      seqLen: Int,
      eosId: Option[Long] = None,
      buckets: Int = 256,
      idCol: String = "doc_id"
  ): DataFrame =
    packPieces(packedOffsets(encoded, seqLen, eosId, buckets, idCol), seqLen)
      .groupBy(col("chunk_idx"))
      .agg(
        flatten(
          transform(
            array_sort(collect_list(struct(col("pstart"), col("piece")))),
            s => s.getField("piece")
          )
        ).as("ids")
      )
      .select(col("chunk_idx"), col("ids"), size(col("ids")).cast("long").as("n_ids"))

  /** The (ids, off, n) offset table both packers share — the
    * two-phase bucketed prefix sum over the slim (id, n) projection,
    * joined back to the checkpointed arrays.
    */
  private def packedOffsets(
      encoded: DataFrame,
      seqLen: Int,
      eosId: Option[Long],
      buckets: Int,
      idCol: String
  ): DataFrame = {
    require(seqLen >= 1, s"need seqLen >= 1, got $seqLen")
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val withEos = eosId match {
      case Some(e) => concat(col("ids"), array(lit(e)))
      case None    => col("ids")
    }
    // the operator inherently needs two passes over the arrays (measure
    // every n before any window can be emitted, then emit) — materialize
    // the base ONCE (eager localCheckpoint) so a caller piping the
    // trainer+encode chain in-plan pays it once, not per pass; for a
    // parquet-read caller the checkpoint costs one extra sequential copy
    // bounded by the corpus, the same I/O the second scan would have been
    val base = encoded
      .filter(size(col("ids")) > 0)
      .select(col(idCol), withEos.as("ids"))
      .localCheckpoint(true)
    // the offset arithmetic never needs the arrays — it runs on the slim
    // (id, n) projection of the checkpointed base.
    // The global stream order is `idCol` order, so the contract REQUIRES
    // non-NULL unique ids — and a violation here corrupts SILENTLY, not
    // loudly: a NULL id's tokens ride the bucket prefix sums (NULL is a
    // groupBy group) but its rows drop at the null-rejecting bucket join,
    // shifting every later document's window offset; a duplicate id ties
    // the within-bucket running sum (engine-order cum) AND double-joins
    // its array back. Both fail fast: NULL scan-side, duplicates via
    // lag over the bucket window below (same-id rows always share a
    // bucket — the bucket is a function of the id — so adjacency
    // detection is complete, and the lag rides the window pass the
    // offsets already pay: no extra shuffle, no extra scan).
    val slim = base
      .filter(
        when(col(idCol).isNotNull, lit(true)).otherwise(
          raise_error(
            lit(s"chunkIdsAcross: NULL $idCol — the global stream order needs non-NULL unique ids")
          ).cast("boolean")
        )
      )
      .select(col(idCol), size(col("ids")).cast("long").as("n"))
    // id-range buckets: monotone in idCol, so (bucket, idCol) order IS
    // idCol order; the id span comes from a broadcast 1-row aggregate
    // (no driver action), width rounded up so bucket < `buckets`
    val span = slim.agg(
      min(col(idCol)).as("__lo"),
      (max(col(idCol)) - min(col(idCol)) + 1L).as("__m")
    )
    val bucketed = slim
      .crossJoin(broadcast(span))
      .withColumn("__b", (col(idCol) - col("__lo")) / expr(s"(__m + ${buckets - 1}) div $buckets"))
      .withColumn("__b", col("__b").cast("long"))
      .drop("__lo", "__m")
    val prefixes = bucketed
      .groupBy(col("__b"))
      .agg(sum(col("n")).as("__bsum"))
      .select(
        col("__b").as("__pb"),
        coalesce(
          sum(col("__bsum")).over(
            Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        ).as("__prefix")
      )
    val inBucket = Window
      .partitionBy(col("__b"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // duplicate-id raise: same window spec as `inBucket`, so Spark
    // computes the lag and the running sum in ONE Window exec
    val dup = lag(col(idCol), 1)
      .over(Window.partitionBy(col("__b")).orderBy(col(idCol))) === col(idCol)
    val offs = bucketed
      .join(broadcast(prefixes), col("__b") === col("__pb"))
      .withColumn(
        "off",
        col("__prefix") + sum(col("n")).over(inBucket) - col("n")
      )
      .withColumn("__dup", dup)
      .filter(
        when(!coalesce(col("__dup"), lit(false)), lit(true)).otherwise(
          raise_error(
            lit(
              s"chunkIdsAcross: duplicate $idCol — the global stream admits each document " +
                "once; a duplicate would double-join its ids and make the running offsets " +
                "engine-order dependent"
            )
          ).cast("boolean")
        )
      )
      .select(col(idCol), col("off"), col("n"))
    base.join(offs, Seq(idCol))
  }

  /** Row-local window emission shared by [[chunkIdsAcross]] and
    * [[chunkIdsAcrossWithBoundaries]]: this doc overlaps global windows
    * [off div L, (off + n - 1) div L]; its piece of window c is the
    * intersection [max(cL, off), min((c+1)L, off+n)) sliced from ids.
    * `is_start` marks the piece that begins the document (pstart == off).
    */
  private def packPieces(offsets: DataFrame, seqLen: Int): DataFrame =
    offsets
      .select(
        col("ids"),
        col("off"),
        col("n"),
        explode(
          sequence(expr(s"off div $seqLen"), expr(s"(off + n - 1) div $seqLen"))
        ).as("chunk_idx")
      )
      .select(
        col("chunk_idx"),
        greatest(col("chunk_idx") * seqLen, col("off")).as("pstart"),
        (greatest(col("chunk_idx") * seqLen, col("off")) === col("off")).as("is_start"),
        slice(
          col("ids"),
          (greatest(col("chunk_idx") * seqLen, col("off")) - col("off") + 1L).cast("int"),
          (least((col("chunk_idx") + 1L) * seqLen, col("off") + col("n")) -
            greatest(col("chunk_idx") * seqLen, col("off"))).cast("int")
        ).as("piece")
      )

  /** [[chunkIdsAcross]] plus the DOC-BOUNDARY metadata a packed-attention
    * trainer actually needs: each window additionally carries
    * `doc_starts` — the 0-based positions WITHIN the window where a new
    * document begins (sorted; empty for a window fully inside one long
    * document). This is the sequence-separator table behind
    * block-diagonal attention masks and position-id resets in packed
    * pretraining (the LLaMA/T5 packing recipes): without it, tokens
    * attend across the EOS into unrelated documents. The first window
    * starts with a boundary at 0 by construction (the stream's first
    * document). Same plan as [[chunkIdsAcross]] — the boundary is a
    * per-piece flag that rides the existing reassembly aggregate (one
    * extra null-skipping `collect_list`), no new shuffle.
    */
  def chunkIdsAcrossWithBoundaries(
      encoded: DataFrame,
      seqLen: Int,
      eosId: Option[Long] = None,
      buckets: Int = 256,
      idCol: String = "doc_id"
  ): DataFrame = {
    val packed = packedOffsets(encoded, seqLen, eosId, buckets, idCol)
    packPieces(packed, seqLen)
      .groupBy(col("chunk_idx"))
      .agg(
        flatten(
          transform(
            array_sort(collect_list(struct(col("pstart"), col("piece")))),
            s => s.getField("piece")
          )
        ).as("ids"),
        // collect_list skips nulls: only doc-starting pieces contribute
        array_sort(
          collect_list(
            when(col("is_start"), col("pstart") - col("chunk_idx") * seqLen)
          )
        ).as("doc_starts")
      )
      .select(
        col("chunk_idx"),
        col("ids"),
        size(col("ids")).cast("long").as("n_ids"),
        col("doc_starts")
      )
  }

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
    // NULL ids fail fast: every NULL-id document lands in ONE window
    // partition where their chunk_idx values TIE (each doc restarts at
    // 0), so the running sum — and therefore seq_id — would interleave
    // unrelated documents in engine order, silently
    chunkFrame(docs, chunkSize, overlap, textCol, idCol, carry)
      .filter(
        when(col(idCol).isNotNull, lit(true)).otherwise(
          raise_error(
            lit(s"SequencePack.assign: NULL $idCol — per-document packing needs non-NULL doc ids")
          ).cast("boolean")
        )
      )
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
  /** [[packAcross]] with SEMANTIC buckets: fill training rows from whole
    * documents within a caller-supplied group (topic cluster, source,
    * language...) instead of a hash bucket — the in-context-pretraining
    * layout (Shi et al. 2023: packing RELATED documents into one context
    * window beats random packing, because cross-document attention then
    * sees usable context). The canonical composition assigns each doc
    * its IVF cell ([[Similarity.ivfIndex]] on the doc-embedding table,
    * join on the id) and packs within the cell; the gate uses the
    * embedding table's label column the same way.
    *
    * Within a group the order is (content hash, id) — same determinism
    * contract as [[packAcross]]. `subBuckets > 1` salts each group into
    * hash sub-buckets to bound the per-task window sort when groups are
    * corpus-scale (a "group" from a clusterer is occupancy-bounded by
    * construction — √(2n) for [[Similarity.annCells]] — but a SOURCE
    * group can be half the corpus; salting trades cross-doc coherence
    * within the group for bounded tasks, the same knob as
    * `targetDocsPerBucket`).
    */
  def packGrouped(
      docs: DataFrame,
      groupCol: String,
      budget: Int,
      subBuckets: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(budget > 0 && subBuckets > 0, s"need budget > 0 and subBuckets > 0, got $budget, $subBuckets")
    val scored = docs.select(
      col(idCol),
      col(groupCol).cast("string").as("__grp"),
      graft.functions.GraftExpressions.poly_hash(col(textCol)).as("h"),
      size(split(col(textCol), " ")).cast("long").as("n_tok")
    )
    val bucket =
      if (subBuckets == 1) col("__grp")
      else concat_ws("#", col("__grp"), pmod(col("h"), lit(subBuckets.toLong)).cast("string"))
    greedyWithinBuckets(scored.withColumn("bucket", bucket).drop("__grp"), budget, idCol)
  }

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
