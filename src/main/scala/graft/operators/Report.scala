package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, TextFunctions}

/** Corpus-level REPORTING operators — the datasheet/data-card and
  * version-diff surfaces a production corpus publishes next to the
  * attrition funnel ([[Pipeline.attrition]]): what is IN the corpus, per
  * source, and what CHANGED between two snapshots. (Reference scope: the
  * reference dumps one table and reports row counts — `dump_table.py`'s
  * final print; these are the corpus-scale generalization, SURVEY §2.1
  * north-star.)
  *
  * Determinism discipline: every metric is an integer (milli/permille
  * ratios via floored division) or a deterministically tie-broken string,
  * so the card hash-matches the DuckDB oracle exactly.
  */
object Report {

  /** The per-source CORPUS CARD: one row per source —
    * `(source, n_docs, n_tokens, n_chars, n_langs, top_lang,
    * mean_tok_milli, dup_permille)` — the "composition" table of a
    * datasheet (Gebru et al., Datasheets for Datasets; the Pile/Dolma
    * papers publish exactly this shape).
    *
    * Scale shape: ONE corpus scan into a per-(source, lang) aggregate
    * (map-side partials; token/char counts ride the same projection),
    * then a per-source rollup of the bounded sources×langs frame.
    * `top_lang` is `min_by(lang, (-count, lang))` — max count, ties to
    * the smaller lang string, no window over anything corpus-sized.
    * Exact-duplicate mass is counted over the 8-byte content hash
    * (`poly_hash(text)`), not the text itself, so the distinct aggregate
    * shuffles hashes, never documents.
    */
  def corpusCard(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      langCol: String = "lang",
      sourceCol: String = "source"
  ): DataFrame = {
    val perLang = docs
      .select(
        col(sourceCol).as("source"),
        col(langCol).as("lang"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
        length(col(textCol)).cast("long").as("n_chr"),
        GraftExpressions.poly_hash(col(textCol)).as("ph")
      )
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chr")).as("n_chars"),
        // distinct content hashes per (source, lang); summing these per
        // source is exact because a hash identical across LANGS within a
        // source still represents distinct (lang, text) corpus entries —
        // the card's duplicate metric is per-source WITHIN-lang dup mass
        countDistinct(col("ph")).as("n_distinct")
      )
    perLang
      .groupBy(col("source"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        count(lit(1)).as("n_langs"),
        min_by(col("lang"), struct((-col("n_docs")).as("neg"), col("lang"))).as("top_lang"),
        sum(col("n_distinct")).as("n_distinct")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("n_tokens"),
        col("n_chars"),
        col("n_langs"),
        col("top_lang"),
        expr("n_tokens * 1000 div n_docs").as("mean_tok_milli"),
        expr("(n_docs - n_distinct) * 1000 div n_docs").as("dup_permille")
      )
  }

  /** SNAPSHOT DIFF between two corpus versions — the data-versioning
    * primitive under incremental pipelines ([[Dedup.dedupAgainst]]'s
    * bookkeeping face): one row per doc id present in either snapshot,
    * `(idCol, status)` with status `added` (new only), `removed` (old
    * only), `changed` (both, content hash differs), `unchanged`.
    *
    * One full outer equi-join on the id over 8-byte content hashes —
    * text never crosses the wire; at 100 TB both sides shuffle
    * (id, hash) pairs only, and the join key is the id, so the exchange
    * is as small as a diff can be.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    // presence is a PRESENCE FLAG, not hash non-nullness (r18 review): a
    // document present with NULL text would otherwise read added/removed,
    // and a text→NULL transition would compare NULL ≠ NULL → NULL and
    // fall through to "unchanged" — the null-safe <=> and the flags make
    // every NULL-text combination classify exactly (oracle twin uses
    // doc_id-presence + IS DISTINCT FROM, the same semantics)
    def hashed(df: DataFrame, p: String, as: String) =
      df.select(
        col(idCol),
        lit(true).as(p),
        GraftExpressions.poly_hash(col(textCol)).as(as)
      )
    hashed(oldSnap, "old_present", "old_ph")
      .join(hashed(newSnap, "new_present", "new_ph"), Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("old_present").isNull, lit("added"))
          .when(col("new_present").isNull, lit("removed"))
          .when(!(col("old_ph") <=> col("new_ph")), lit("changed"))
          .otherwise(lit("unchanged"))
          .as("status")
      )
  }

  /** GENERIC TABLE PROFILER — the ANALYZE surface next to the corpus
    * card: one row per column of ANY input frame, `(column, n_rows,
    * n_nulls, n_distinct, min_val, max_val)` with min/max rendered as
    * strings so the report schema is column-type-independent. ONE corpus
    * pass: every column's aggregates ride a single `agg(...)` row that
    * is then melted to per-column rows via an in-memory explode (the
    * per-column frame is schema-sized, never data-sized). The reference
    * infers a table's schema by sampling (`dump_table.py`'s
    * 10-row probe); this is the statistics sibling a warehouse keeps
    * next to it.
    *
    * `exact = false` swaps `countDistinct` for `approx_count_distinct`
    * (HLL): the exact form plans one Expand pass per distinct aggregate
    * — fine for a nightly profile, but at 100 TB the sketch is the
    * right default and the rest of the report is unchanged (the gate
    * pins the exact form; the sketch form is law-tested for bounds).
    */
  def profileTable(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    // POSITIONAL binding: rename every column to an index-keyed alias
    // first (toDF is positional), so frames with duplicate column names
    // — routine after joins — profile each occurrence instead of dying
    // in name resolution; the report still carries the original name.
    val indexed = df.toDF(fields.indices.map(i => s"__c$i"): _*)
    // Types with no ordering / no equality semantics (anything
    // containing a map) can't feed min/max/countDistinct — profile
    // their null count and report the rest as NULL rather than failing
    // the whole table on one column.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val aggs = fields.indices.flatMap { i =>
      val c = col(s"__c$i")
      if (orderable(fields(i).dataType))
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"__c${i}__nulls"),
          (if (exact) countDistinct(c) else approx_count_distinct(c)).as(s"__c${i}__distinct"),
          min(c).cast("string").as(s"__c${i}__min"),
          max(c).cast("string").as(s"__c${i}__max")
        )
      else
        Seq(
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"__c${i}__nulls"),
          lit(null).cast("long").as(s"__c${i}__distinct"),
          lit(null).cast("string").as(s"__c${i}__min"),
          lit(null).cast("string").as(s"__c${i}__max")
        )
    }
    val one = indexed.agg(count(lit(1)).as("__n"), aggs.toSeq: _*)
    val melted = fields.indices.map { i =>
      struct(
        lit(fields(i).name).as("column"),
        col("__n").as("n_rows"),
        col(s"__c${i}__nulls").as("n_nulls"),
        col(s"__c${i}__distinct").as("n_distinct"),
        col(s"__c${i}__min").as("min_val"),
        col(s"__c${i}__max").as("max_val")
      )
    }
    one
      .select(explode(array(melted: _*)).as("r"))
      .select(
        col("r.column"),
        col("r.n_rows"),
        col("r.n_nulls"),
        col("r.n_distinct"),
        col("r.min_val"),
        col("r.max_val")
      )
  }

  /** [[snapshotDiff]] rolled up to the 4-row summary `(status, n_docs)`
    * — the number a release note quotes.
    */
  def snapshotDiffSummary(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame =
    snapshotDiff(oldSnap, newSnap, textCol, idCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-group PERCENTILE calibration of an integer score — the step
    * before any cross-source quality threshold: raw quality scores are
    * not comparable across sources (a news corpus and a forum dump have
    * different score distributions), so a global cutoff silently
    * over-prunes one and under-prunes the other; ranking each document
    * WITHIN its source (`pct_micro = #strictly-lower·10⁶ div
    * max(n−1, 1)` — the percent_rank convention, integer-exact) makes
    * "keep the top 30% of every source" a single comparison. Returns
    * the input columns plus `pct_micro`.
    *
    * Scale shape — the q86 value-histogram discipline: the window runs
    * over DISTINCT (group, score) histogram rows ordered by score (its
    * partition is a group's distinct VALUE count, never its document
    * count — a 10⁹-doc source with a formula-granular score has
    * thousands of distinct values), and documents get their rank back
    * through one co-keyed join on `(group, score)`. No corpus-sized
    * sort exists in the plan.
    */
  def percentileRanks(
      docs: DataFrame,
      scoreCol: String,
      groupCol: String = "source"
  ): DataFrame =
    rankCounts(docs, scoreCol, groupCol)
      .withColumn("pct_micro", expr("__n_less * 1000000 div greatest(__n - 1, 1)"))
      .drop("__n_less", "__n_le", "__n")

  /** Shared rank machinery for [[percentileRanks]] and [[keepTopQuality]]:
    * the input plus `__n_less` (docs in the group scoring strictly below),
    * `__n_le` (scoring ≤ — so `__n − __n_le` is the strictly-ABOVE count)
    * and `__n` (group size), all via the distinct-value histogram window.
    */
  private def rankCounts(
      docs: DataFrame,
      scoreCol: String,
      groupCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL scores fail fast (r18 review): they would drop silently at
    // the null-rejecting (group, score) join below — breaking the
    // "no source silently wiped out" guarantee for all-NULL sources —
    // and "strictly below NULL" has no engine-stable meaning anyway
    // (Spark windows sort NULLS FIRST, DuckDB NULLS LAST — the dpTopK
    // divergence class)
    val checked = docs.filter(
      when(col(scoreCol).isNotNull, lit(true)).otherwise(
        raise_error(
          lit(s"percentile rank: NULL $scoreCol — percentile calibration needs non-NULL scores")
        ).cast("boolean")
      )
    )
    val hist = checked
      .groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranks = hist
      .withColumn("__n_le", sum(col("__cnt")).over(w))
      .withColumn("__n_less", col("__n_le") - col("__cnt"))
      .drop("__cnt")
    val totals = checked.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    checked
      .join(ranks, Seq(groupCol, scoreCol))
      .join(broadcast(totals), Seq(groupCol))
  }

  /** The calibrated quality FILTER [[percentileRanks]] exists for:
    * keep the top `keepMilli`/1000 of EVERY source by fused quality
    * score — each source is pruned against its own distribution, so no
    * source is silently wiped out or waved through by a global
    * threshold. Returns the kept rows with `score_micro` and
    * `pct_micro` riding (the audit columns a pipeline report wants).
    * The threshold property is exact: within a source, every kept
    * document scores ≥ every dropped one, and the realized keep
    * fraction is ≥ `keepMilli` (ties at the cut add mass, never
    * subtract it).
    *
    * The keep rule ranks FROM ABOVE: a document survives iff its
    * group's strictly-GREATER count is under the keep budget
    * (`n_greater·1000 < keepMilli·n`). Ranking from below
    * (`pct_micro ≥ cut`) looks equivalent but silently WIPES OUT any
    * source whose documents all share one score (uniform/templated
    * sources, singletons): every row there has pct_micro = 0 and fails
    * any cut < 1000. From above, a uniform source has n_greater = 0
    * everywhere and keeps everything — the documented "no source is
    * silently wiped out" guarantee made real (ADVICE r09).
    */
  def keepTopQuality(
      docs: DataFrame,
      keepMilli: Long,
      textCol: String = "text",
      groupCol: String = "source"
  ): DataFrame = {
    val scored = docs
      .withColumn("__q", graft.functions.TextFunctions.qualityScoreFused(col(textCol)))
      .withColumn("score_micro", expr("CAST(floor(__q * 1000000 + 0.5) AS BIGINT)"))
      .drop("__q")
    keepTopBy(scored, "score_micro", keepMilli, groupCol)
  }

  /** The generic calibrated keep: top `keepMilli`/1000 of every group by
    * an ALREADY-COMPUTED integer score column — [[keepTopQuality]] is
    * this over the fused formula score; any learned or derived score
    * ([[graft.operators.Classifier]]'s, LM rarity negated, DSIR
    * importance) composes through the same from-above rule and inherits
    * the no-source-wiped-out guarantee.
    */
  def keepTopBy(
      scored: DataFrame,
      scoreCol: String,
      keepMilli: Long,
      groupCol: String = "source"
  ): DataFrame = {
    require(keepMilli >= 1 && keepMilli <= 1000, s"need keepMilli in [1,1000], got $keepMilli")
    rankCounts(scored, scoreCol, groupCol)
      .filter(expr(s"(__n - __n_le) * 1000 < $keepMilli * __n"))
      .withColumn("pct_micro", expr("__n_less * 1000000 div greatest(__n - 1, 1)"))
      .drop("__n_less", "__n_le", "__n")
  }

  /** CROSS-SOURCE duplication matrix — which sources copy from which:
    * for every ordered source pair `(src_a < src_b)`, the count of
    * DISTINCT content hashes both contain, with each side's distinct
    * total and the containment ratios in milli
    * (`n_shared·1000 div n_a` — "how much of a's distinct content also
    * lives in b"). This is the datasheet table that catches a scraped
    * mirror (one source ~contained in another), shared boilerplate
    * (many small symmetric overlaps), and the per-pair dedup pressure
    * the corpus card's single `dup mass` number cannot attribute.
    *
    * Scale shape: one scan to the distinct `(hash, source)` frame (one
    * partial-aggregated shuffle on the uniform hash), then the per-hash
    * source list pairs with itself — per-hash work bounded by the
    * SOURCE COUNT (tens), never by how many documents share the hash:
    * duplicates within one source collapse before any pairing. The
    * matrix at rest is ≤ sources² rows.
    *
    * `prefixTokens = 0` keys on the WHOLE text (exact-duplicate
    * attribution); `> 0` keys on the first-k-token PREFIX fingerprint —
    * the standard cheap near-dup attribution key (scraped mirrors and
    * templated boilerplate share openings long before they share whole
    * documents), and the knob the gate exercises since the fixture has
    * no exact cross-source copies.
    */
  def sourceOverlap(
      docs: DataFrame,
      textCol: String = "text",
      sourceCol: String = "source",
      prefixTokens: Int = 0
  ): DataFrame = {
    require(prefixTokens >= 0, s"need prefixTokens >= 0, got $prefixTokens")
    val key =
      if (prefixTokens == 0) col(textCol)
      else
        concat_ws(
          " ",
          slice(graft.functions.TextFunctions.tokens(col(textCol)), 1, prefixTokens)
        )
    val hs = docs
      .select(GraftExpressions.poly_hash(key).as("h"), col(sourceCol).as("source"))
      .distinct()
      .localCheckpoint(true)
    val totals = hs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    hs
      .select(col("h"), col("source").as("src_a"))
      .join(hs.select(col("h"), col("source").as("src_b")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(totals.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
      .select(
        col("src_a"),
        col("src_b"),
        col("n_shared"),
        col("n_a"),
        col("n_b"),
        expr("n_shared * 1000 div n_a").as("contain_a_milli"),
        expr("n_shared * 1000 div n_b").as("contain_b_milli")
      )
  }

  /** Vocabulary-growth (Heaps-law) curve: at each id checkpoint `c`, the
    * number of DISTINCT tokens whose first occurrence lies in a document
    * with `id <= c`, next to the total token count of those documents —
    * the curve that sizes a tokenizer's vocab budget against corpus
    * growth and shows when a crawl stops contributing new vocabulary
    * (the slope in log-log space is Heaps' β; the report ships the exact
    * integer curve and leaves the fit to the caller — a log-log
    * regression is float-order-dependent and would break the oracle
    * discipline).
    *
    * "First occurrence" is by MINIMUM id — deterministic under any
    * partitioning, no notion of scan order. Scale shape: one shuffle on
    * the token key (map-side partials absorb hot tokens — a stop word's
    * billion occurrences reduce per partition before moving), one tiny
    * per-checkpoint aggregate; each token then explodes into only the
    * checkpoints AT OR AFTER its first occurrence (≤ |checkpoints| rows
    * per DISTINCT token, bounded by the vocabulary, not the corpus).
    */
  def vocabGrowth(
      docs: DataFrame,
      checkpoints: Seq[Long],
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(checkpoints.nonEmpty, "need at least one checkpoint")
    require(checkpoints == checkpoints.sorted && checkpoints.distinct == checkpoints,
      "checkpoints must be strictly increasing")
    val cps = array(checkpoints.map(lit): _*)
    val firstDoc = docs
      .select(col(idCol).as("id"), explode(graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(min(col("id")).as("fd"))
    val vocabAt = firstDoc
      .select(explode(filter(cps, c => col("fd") <= c)).as("checkpoint"))
      .groupBy(col("checkpoint"))
      .agg(count(lit(1)).as("vocab"))
    val tokensAt = docs
      .select(
        col(idCol).as("id"),
        size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long").as("n_tok")
      )
      .select(explode(filter(cps, c => col("id") <= c)).as("checkpoint"), col("n_tok"))
      .groupBy(col("checkpoint"))
      .agg(sum(col("n_tok")).as("n_tokens"))
    // checkpoints with no docs yet ride at 0/0 through the seed frame
    val seed = docs.sparkSession
      .createDataFrame(
        docs.sparkSession.sparkContext.parallelize(checkpoints.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("checkpoint", org.apache.spark.sql.types.LongType, nullable = false)
        ))
      )
    seed
      .join(vocabAt, Seq("checkpoint"), "left")
      .join(tokensAt, Seq("checkpoint"), "left")
      .select(
        col("checkpoint"),
        coalesce(col("vocab"), lit(0L)).as("vocab"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens")
      )
  }
}
