package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark DECONTAMINATION — remove from a training corpus every
  * document sharing an exact k-token n-gram with an evaluation/benchmark
  * set. This is the standard pre-training hygiene step (exact-substring
  * contamination checks): a model must not train on text that appears in
  * its eval suite, and near-dedup against the corpus itself
  * ([[Dedup.dedupAgainst]]) does not cover it because the benchmark is a
  * DIFFERENT, usually tiny, collection.
  *
  * Scale shape: the benchmark's distinct n-gram hash index is small by
  * nature (eval sets are thousands of documents, not billions), so it
  * broadcasts — the corpus side stays a scan + explode with NO shuffle
  * until the per-document count aggregation, whose key (doc id) is as
  * well-distributed as the corpus itself. The corpus is never self-joined
  * and never shuffled on n-gram (where boilerplate grams would skew);
  * with `broadcastIndex = false` the join falls back to a shuffled
  * equi-join on the hash for the rare giant-benchmark case.
  *
  * Determinism: n-grams are compared through the engine-wide `poly_hash`
  * (DuckDB-mirrorable; a hash collision could flag a clean document, at
  * ~2^-30 per candidate — acceptable for a removal filter and mirrored
  * exactly by the oracle).
  *
  * The reference has no analog (SURVEY.md §2.1 — no joins at all); this
  * extends the dedup family (`Dedup.scala`) with the corpus-vs-benchmark
  * direction.
  */
object Decontaminate {

  /** Default n-gram width for contamination checks. Public pipelines use
    * 10–13-token windows; the fixture documents are 10–99 tokens, so the
    * gated example passes a smaller k — the parameter is the contract.
    */
  val DefaultK = 13

  /** One row per DISTINCT k-gram hash in the benchmark — the index the
    * corpus is checked against.
    */
  def benchmarkIndex(benchmark: DataFrame, k: Int = DefaultK, textCol: String = "text"): DataFrame =
    benchmark
      .select(explode(TextFunctions.shingleHashes(col(textCol), k)).as("gh"))
      .distinct()

  /** `(idCol, n_shared)` for every CONTAMINATED corpus document: the count
    * of distinct k-gram hashes it shares with the benchmark (≥ 1 by
    * construction; clean documents are absent). `shingleHashes` is
    * per-document distinct and the index is globally distinct, so the join
    * multiplicity is exactly one per shared gram and a plain `count`
    * equals the distinct shared-gram count — no `countDistinct` pass.
    */
  def overlapReport(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = DefaultK,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastIndex: Boolean = true
  ): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val idx = benchmarkIndex(benchmark, k, textCol)
    corpus
      .select(col(idCol), explode(TextFunctions.shingleHashes(col(textCol), k)).as("gh"))
      .join(if (broadcastIndex) broadcast(idx) else idx, Seq("gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The corpus with every contaminated document REMOVED — the admission
    * side of [[overlapReport]] (anti join on the contaminated id set).
    */
  def clean(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = DefaultK,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastIndex: Boolean = true
  ): DataFrame =
    corpus.join(
      overlapReport(corpus, benchmark, k, textCol, idCol, broadcastIndex).select(col(idCol)),
      Seq(idCol),
      "left_anti"
    )

  /** The REVERSE direction — per BENCHMARK item, how exposed it is in
    * the training corpus: `(bench_id, n_corpus_docs, n_shared_grams)`
    * for every benchmark document at least one corpus document shares a
    * k-gram with. [[overlapReport]] answers "which training pages are
    * contaminated"; this answers "which EVAL items are compromised" —
    * the integrity table an evaluation writes down (the
    * train-test-overlap appendix of the GPT-3/PaLM reports), and the
    * input to deciding whether to decontaminate the corpus or drop the
    * eval item.
    *
    * Scale shape: the benchmark side (small by nature) explodes to
    * `(bench_id, gh)` and broadcasts WITH its ids; the corpus stays a
    * scan + explode joined against it, aggregated on `bench_id` — the
    * corpus is never shuffled on a gram key, and the distinct-counts
    * expand at most benchmark-sized groups.
    */
  def benchmarkExposure(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = DefaultK,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastIndex: Boolean = true
  ): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val bench = benchmark.select(
      col(idCol).as("bench_id"),
      explode(TextFunctions.shingleHashes(col(textCol), k)).as("gh")
    )
    corpus
      .select(col(idCol), explode(TextFunctions.shingleHashes(col(textCol), k)).as("gh"))
      .join(if (broadcastIndex) broadcast(bench) else bench, Seq("gh"))
      .groupBy(col("bench_id"))
      .agg(
        countDistinct(col(idCol)).as("n_corpus_docs"),
        countDistinct(col("gh")).as("n_shared_grams")
      )
  }

  /** SPAN-level decontamination — cut every k-token window a document
    * shares with the benchmark and keep the rest, instead of dropping
    * the whole document ([[clean]]'s rule). This is the Lee et al. 2021
    * exact-substring treatment applied in the corpus-vs-benchmark
    * direction: a long, mostly-original page that quotes one benchmark
    * passage loses the passage, not its training value — at web scale
    * the difference is material, since popular eval sentences are quoted
    * everywhere.
    *
    * Mechanism: the corpus side explodes POSITIONAL k-gram hashes
    * `(i, gh)`; positions whose hash hits the broadcast benchmark index
    * become cut starts covering `[i, i+k)`; the document is rebuilt from
    * the keep-gaps by [[SegmentDedup.rebuildWithoutCuts]] (the shared
    * O(cuts+tokens) interval merge). Documents redacted to nothing are
    * dropped — they were wholly benchmark text.
    *
    * Scale shape matches [[overlapReport]]: broadcast index, scan-side
    * explode, one aggregate keyed on the document id; the rebuild adds
    * no shuffle beyond the cut-list join.
    */
  def redactOverlaps(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int = DefaultK,
      textCol: String = "text",
      idCol: String = "doc_id",
      broadcastIndex: Boolean = true
  ): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val idx = benchmarkIndex(benchmark, k, textCol)
    val cutStarts = corpus
      .select(
        col(idCol),
        posexplode(TextFunctions.positionalShingleHashes(col(textCol), k)).as(Seq("i", "gh"))
      )
      .join(if (broadcastIndex) broadcast(idx) else idx, Seq("gh"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("i").cast("long"))).as("__cuts"))
    SegmentDedup.rebuildWithoutCuts(
      corpus.select(col(idCol), col(textCol)),
      cutStarts,
      k,
      textCol,
      idCol
    )
  }
}
