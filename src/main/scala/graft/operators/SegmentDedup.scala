package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, TextFunctions}

/** C4-style SEGMENT-LEVEL dedup — remove duplicated token segments
  * ACROSS the whole corpus while keeping the documents themselves: every
  * occurrence of a repeated segment except the globally first one (min
  * `(doc, position)`) is cut out, and each document is reassembled from
  * its surviving segments. This is the boilerplate remover — cookie
  * banners, nav bars, license headers repeated across millions of pages —
  * that document-level dedup ([[Dedup]]) cannot express, because the
  * documents CONTAINING the boilerplate are distinct.
  *
  * Segments are the non-overlapping `segTokens`-token tiling of the text
  * ([[TextFunctions.chunks]] with overlap 0 — the q58-gated windows), the
  * whitespace analog of C4's "three-sentence span" unit.
  *
  * Scale shape ([[dedupSegments]], r06): the hash-keyed stages move NO
  * text — the occurrence frame is `(doc, seg_idx, h)` (24 B rows), the
  * first-occurrence aggregate is partial (a billion-fold repeated banner
  * collapses map-side to one 16-byte min-struct per partition), and keep
  * decisions come back as one small sorted index array per document. The
  * document TEXT is shuffled exactly once — the final equi-join on doc
  * id — and each survivor re-tiles its own text locally (the chunk
  * kernel is O(len); recomputing it beats shipping every segment string
  * through two exchanges, which is what the r05 shape did: segment text
  * keyed by hash, then again by doc id — 190 s at 1M docs in the scale
  * smoke). No windows, no global sort.
  *
  * Determinism: occurrence order is the total order `(doc id, segment
  * index)`, reproducible across runs, engines, and partitionings; segment
  * identity is `poly_hash` (a collision merges two segments at ~2^-30 —
  * mirrored exactly by the oracle).
  */
object SegmentDedup {

  /** NULL doc ids fail fast (r18 review): the keep policy is "min
    * `(doc id, position)` stays" and struct minimums order NULLS FIRST —
    * a NULL-id document would WIN every first-occurrence race, cutting
    * the segment from every real document, while its own occurrences
    * drop at the null-rejecting keep equality: the segment text would
    * silently vanish from the whole corpus.
    */
  private def requireIds(docs: DataFrame, idCol: String, op: String): DataFrame =
    docs.filter(
      when(col(idCol).isNotNull, lit(true)).otherwise(
        raise_error(
          lit(s"$op: NULL $idCol — the global (doc id, position) first-occurrence order needs non-NULL doc ids")
        ).cast("boolean")
      )
    )

  /** Per-occurrence keep/cut decision: `(idCol, seg_idx, seg, keep)` —
    * the audit view; [[dedupSegments]] is its reassembled form.
    */
  def segmentOccurrences(
      docs0: DataFrame,
      segTokens: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(segTokens > 0, s"need segTokens > 0, got $segTokens")
    val docs = requireIds(docs0, idCol, "segmentOccurrences")
    val segs = docs
      .select(
        col(idCol),
        posexplode(TextFunctions.chunks(col(textCol), segTokens, 0))
          .as(Seq("seg_idx", "seg"))
      )
      .select(
        col(idCol),
        col("seg_idx").cast("long").as("seg_idx"),
        col("seg"),
        GraftExpressions.poly_hash(col("seg")).as("h")
      )
    val first = segs
      .groupBy(col("h"))
      .agg(min(struct(col(idCol), col("seg_idx"))).as("first_occ"))
    segs
      .join(first, Seq("h"))
      .select(
        col(idCol),
        col("seg_idx"),
        col("seg"),
        (struct(col(idCol), col("seg_idx")) === col("first_occ")).as("keep")
      )
  }

  /** The corpus with every non-first occurrence of a repeated segment
    * removed and documents reassembled from their surviving segments in
    * original order: `(idCol, textCol)`. Documents whose every segment
    * was cut (pure boilerplate) are dropped entirely — the C4 behavior.
    *
    * Unlike [[segmentOccurrences]] (the audit view, which must carry the
    * segment strings), this moves only `(doc, seg_idx, h)` through the
    * hash-keyed stages and rebuilds each survivor from its own re-tiled
    * text after one doc-id join — see the class doc for the byte math.
    */
  def dedupSegments(
      docs0: DataFrame,
      segTokens: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(segTokens > 0, s"need segTokens > 0, got $segTokens")
    val docs = requireIds(docs0, idCol, "dedupSegments")
    val occ = docs
      .select(
        col(idCol),
        posexplode(
          transform(
            TextFunctions.chunks(col(textCol), segTokens, 0),
            s => GraftExpressions.poly_hash(s)
          )
        ).as(Seq("seg_idx", "h"))
      )
      .select(col(idCol), col("seg_idx").cast("long").as("seg_idx"), col("h"))
    val first = occ
      .groupBy(col("h"))
      .agg(min(struct(col(idCol), col("seg_idx"))).as("first_occ"))
    val keepIdx = occ
      .join(first, Seq("h"))
      .filter(struct(col(idCol), col("seg_idx")) === col("first_occ"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("seg_idx"))).as("__keep_idx"))
    docs
      .join(keepIdx, Seq(idCol))
      .select(
        col(idCol),
        TextFunctions.chunks(col(textCol), segTokens, 0).as("__segs"),
        col("__keep_idx")
      )
      .select(
        col(idCol),
        array_join(
          transform(col("__keep_idx"), i => element_at(col("__segs"), (i + 1L).cast("int"))),
          " "
        ).as(textCol)
      )
  }

  /** BOILERPLATE REMOVAL — the third segment-dedup semantic, next to
    * [[dedupSegments]] (keep first occurrence) and
    * [[dedupSubstrings]] (sliding windows): remove EVERY occurrence —
    * including the first — of any segment whose DOCUMENT frequency
    * exceeds `maxDf`, and rebuild each document from its surviving
    * segments in order. This is the RefinedWeb/Dolma-style line-dedup
    * rule: "subscribe to our newsletter" on a million pages is not
    * content anybody's copy deserves to keep, while [[dedupSegments]]
    * would faithfully preserve its first occurrence. Conversely a
    * segment shared by ≤ `maxDf` documents (a quotation, a fair reuse)
    * survives in ALL of them — the two operators cut along different
    * axes and compose.
    *
    * Frequency is per DISTINCT document (`maxDf + 1` occurrences inside
    * one document are repetition, [[Repetition]]'s axis — not
    * boilerplate). A document consisting entirely of hot segments drops
    * out, like [[dedupSegments]]'s pure-boilerplate drop.
    *
    * Scale shape — same skeleton as [[dedupSegments]], hash-keyed
    * end-to-end: the df aggregate runs on `(h, doc)` rows with two
    * partial-agg levels (the billion-page banner collapses map-side);
    * the hot set (segments over `maxDf` — by construction a tiny
    * fraction of distinct segments) comes back as a LEFT ANTI join on
    * the same `h` key partitioning; document text crosses the wire once,
    * in the final doc-id join.
    */
  def dropBoilerplateSegments(
      docs0: DataFrame,
      segTokens: Int = 5,
      maxDf: Long = 2L,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(segTokens > 0, s"need segTokens > 0, got $segTokens")
    require(maxDf >= 1, s"need maxDf >= 1 (maxDf = 0 would drop every document), got $maxDf")
    // (the countDistinct df additionally IGNORES a NULL id, so a hot
    // banner could also undercount its way past maxDf — same guard)
    val docs = requireIds(docs0, idCol, "dropBoilerplateSegments")
    val occ = docs
      .select(
        col(idCol),
        posexplode(
          transform(
            TextFunctions.chunks(col(textCol), segTokens, 0),
            s => GraftExpressions.poly_hash(s)
          )
        ).as(Seq("seg_idx", "h"))
      )
      .select(col(idCol), col("seg_idx").cast("long").as("seg_idx"), col("h"))
    val hot = occ
      .groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("h"))
    val keepIdx = occ
      .join(hot, Seq("h"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("seg_idx"))).as("__keep_idx"))
    docs
      .join(keepIdx, Seq(idCol))
      .select(
        col(idCol),
        TextFunctions.chunks(col(textCol), segTokens, 0).as("__segs"),
        col("__keep_idx")
      )
      .select(
        col(idCol),
        array_join(
          transform(col("__keep_idx"), i => element_at(col("__segs"), (i + 1L).cast("int"))),
          " "
        ).as(textCol)
      )
  }

  /** EXACT-SUBSTRING dedup at window granularity — the Lee et al. 2021
    * semantics ("Deduplicating Training Data Makes Language Models
    * Better"): remove every non-first occurrence of ANY duplicated token
    * run of ≥ `minTokens`, at arbitrary positions. [[dedupSegments]]'s
    * fixed tiling misses a duplicated run that straddles a tile boundary
    * (shifted boilerplate, quoted paragraphs); this operator slides: a
    * duplicated run of length m ≥ L shares ALL of its m−L+1 positional
    * L-windows, so cutting every non-first window occurrence and merging
    * the overlapping cut intervals removes EXACTLY the duplicated run —
    * windows straddling the run boundary mix unique tokens and never
    * match, so no unique text is cut.
    *
    * Keep policy: the globally first occurrence (min `(doc id, position)`
    * per window — the same total order as [[dedupSegments]]) stays;
    * later copies are cut. A document wholly consumed by cuts drops out.
    * Documents shorter than L clamp to one whole-text window (so a short
    * exact duplicate deduplicates like [[Dedup.exact]]).
    *
    * Window identity is the window TEXT itself, not its hash — this
    * operator DELETES text, so a hash collision would silently cut L
    * innocent tokens, and at corpus scale the ~2^30 polyHash space
    * guarantees collisions (n²/2P ≈ tens of thousands of colliding pairs
    * at just 10M windows). Grouping by the string is the same exactness
    * call [[Dedup.exact]] makes for whole documents; it costs ~5× the
    * shuffle bytes of an 8-byte hash key and buys the stated guarantee
    * outright. (Audit-style operators like [[dedupSegments]] and the
    * MinHash family can afford hash identity — they either keep text or
    * verify candidates; a destructive cut cannot.)
    *
    * Scale shape: one partial-aggregated aggregate on the window string
    * (a billion-fold duplicated window collapses map-side to one
    * min-occurrence struct per partition), one equi-join back on the
    * same key, then per-document interval arithmetic in array HOFs —
    * bounded by document length, never corpus-wide. No windows, no
    * sorts. The occurrence explode is evaluated twice (once under the
    * aggregate, once on the join probe side — the exchanges have
    * different children, so ReuseExchange cannot merge them); that is
    * the deliberate lazy-plan trade — materializing the L×-corpus
    * occurrence frame at 100 TB would cost more than the second scan.
    *
    * The per-document rebuild is O(cuts + tokens): the sorted cut
    * starts collapse to disjoint merged intervals by a LOCAL
    * neighbor test (all cut intervals share length L, so a cut opens a
    * new merged interval iff its gap to the previous cut is ≥ L — no
    * fold that re-copies an accumulator), and the surviving text is
    * reassembled by slicing the token array once per KEEP gap. The
    * round-5 shape — `exists(__cuts, …)` per token position — was
    * O(tokens × cuts) inside a single row: a heavily self-duplicated
    * 1M-token document (cuts ≈ tokens) went quadratic in one task.
    *
    * Cost caveat vs [[dedupSegments]]: sliding windows explode ~L× more
    * rows than tiling (every position, not every L-th) — that is the
    * price of position-independence; L is the knob.
    */
  def dedupSubstrings(
      docs0: DataFrame,
      minTokens: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(minTokens > 0, s"need minTokens > 0, got $minTokens")
    val L = minTokens
    val docs = requireIds(docs0, idCol, "dedupSubstrings")
    val occ = docs
      .select(
        col(idCol),
        posexplode(TextFunctions.positionalShingles(col(textCol), L))
          .as(Seq("i", "w"))
      )
      .select(col(idCol), col("i").cast("long").as("i"), col("w"))
    val firstOcc = occ
      .groupBy(col("w"))
      .agg(min(struct(col(idCol), col("i"))).as("first_occ"), count(lit(1)).as("n_occ"))
    val cutStarts = occ
      .join(firstOcc, Seq("w"))
      .filter(col("n_occ") > 1 && struct(col(idCol), col("i")) =!= col("first_occ"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(col("i"))).as("__cuts"))
    rebuildWithoutCuts(docs, cutStarts, L, textCol, idCol)
  }

  /** Rebuild each document with every length-`L` cut window removed —
    * the shared interval-merge tail of [[dedupSubstrings]] (cuts = every
    * non-first duplicated window) and
    * [[Decontaminate.redactOverlaps]] (cuts = every benchmark-overlapping
    * window). `cutStarts` is `(idCol, __cuts)` with `__cuts` the SORTED
    * distinct token positions whose `[c, c+L)` windows must go; documents
    * absent from `cutStarts` pass through unchanged, documents rebuilt to
    * empty are dropped. O(cuts + tokens) per document: the merged
    * cut-interval boundaries are decided from one sorted neighbor each
    * (every interval has the same length L), and the keep-gaps are one
    * token-array slice per gap — the r06 interval-merge rewrite, kept in
    * ONE place.
    */
  private[operators] def rebuildWithoutCuts(
      docs: DataFrame,
      cutStarts: DataFrame,
      L: Int,
      textCol: String,
      idCol: String
  ): DataFrame = {
    val lL = lit(L.toLong)
    val cuts = col("__cuts")
    // Merged cut-interval starts/ends from the SORTED, DISTINCT cut
    // positions. Every cut covers [c, c+L) and all intervals have the
    // same length, so merged-interval boundaries are decidable from one
    // neighbor: cut k opens an interval iff cuts[k] − cuts[k−1] ≥ L, and
    // closes one iff cuts[k+1] − cuts[k] ≥ L. (`element_at` is 1-based;
    // the `when` guards keep the out-of-range probes unevaluated.)
    val intervalStarts = filter(
      transform(
        cuts,
        (c, k) => when(k === 0, c).when(c - element_at(cuts, k) >= lL, c)
      ),
      x => x.isNotNull
    )
    val intervalEnds = filter(
      transform(
        cuts,
        (c, k) =>
          when(k === size(cuts) - 1, c + lL)
            .when(element_at(cuts, k + 2) - c >= lL, c + lL)
      ),
      x => x.isNotNull
    )
    // KEEP gaps are the complement: [0, start_1), [end_1, start_2), …,
    // [end_m, n). One token-array slice per gap; `greatest(_, 0)` clamps
    // the short-document case, where the single whole-text cut interval
    // ends at L > n.
    val nToks = size(col("__toks")).cast("long")
    val kept = flatten(
      zip_with(
        concat(array(lit(0L)), col("__ends")),
        concat(col("__starts"), array(nToks)),
        (a, b) => slice(col("__toks"), (a + 1L).cast("int"), greatest(b - a, lit(0L)).cast("int"))
      )
    )
    docs
      .join(cutStarts, Seq(idCol), "left")
      .select(
        col(idCol),
        TextFunctions.tokens(col(textCol)).as("__toks"),
        coalesce(col("__cuts"), array().cast("array<long>")).as("__cuts")
      )
      .select(
        col(idCol),
        col("__toks"),
        intervalStarts.as("__starts"),
        intervalEnds.as("__ends")
      )
      .select(col(idCol), array_join(kept, " ").as(textCol))
      .filter(length(col(textCol)) > 0)
  }
}
