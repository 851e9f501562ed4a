package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** Deterministic BALANCED subsampling — keep the `n` documents with the
  * smallest content hashes per group (language, domain, source...): the
  * training-mix operator that a flat percentage sample
  * ([[graft.functions.TextFunctions.sampledBy]]) cannot express, because a
  * flat rate keeps the corpus's group imbalance.
  *
  * Selection is by `poly_hash(key)` rank, so it is reproducible across
  * runs, engines, and partitionings — and it needs NO per-group sort: the
  * [[graft.functions.TopKNeighbors]] bounded-heap aggregate reduces each
  * input partition to ≤ n candidates per group before the shuffle
  * (map-side partials), so a group with a billion rows costs its scan, not
  * a single-task sort. The same property makes it skew-safe: the biggest
  * group's reduction work is spread across every partition that holds its
  * rows. Deterministic tie-break: (hash asc, id asc) — the aggregate's
  * (score desc, id asc) ordering over the negated hash.
  */
object Sampling {

  def balanced(
      df: DataFrame,
      groupCol: String,
      n: Int,
      keyCol: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(n > 0, s"need n > 0, got $n")
    df
      .select(
        col(groupCol),
        col(idCol),
        GraftExpressions.poly_hash(col(keyCol)).as("h")
      )
      .groupBy(col(groupCol))
      // poly_hash < 2^31, exact in double; negate so "top k" = smallest
      .agg(
        GraftExpressions
          .top_k_neighbors(-col("h").cast("double"), col(idCol), n)
          .as("picks")
      )
      .select(col(groupCol), explode(col("picks")).as("p"))
      .select(
        col(groupCol),
        col("p.neighbor_id").as(idCol),
        (-col("p.cos")).cast("long").as("h")
      )
  }

  /** Per-group WEIGHTED mixture sampling — keep each group at its own
    * rate (`rates`, in [0, 1]; groups not listed fall back to
    * `defaultRate`): the training-mix operator when the recipe says "50%
    * of web, all of books, 10% of the rest", which [[balanced]]'s
    * fixed-n-per-group cannot express and a flat rate cannot either.
    *
    * The keep decision is `poly_hash(key) mod 10000 < rate·10000` — a pure
    * scan-side predicate (NO shuffle, no sort, no per-group state), a
    * deterministic function of CONTENT: reproducible across runs, engines,
    * and partitionings, and exact duplicates sample identically, so the
    * mix stays dedup-consistent (same properties as
    * [[graft.functions.TextFunctions.sampledBy]], lifted to per-group
    * rates). Rates are quantized to 1/10000 at the driver so both engines
    * compare against the identical integer threshold.
    */
  def weightedBy(
      df: DataFrame,
      groupCol: String,
      rates: Map[String, Double],
      keyCol: String,
      defaultRate: Double = 0.0
  ): DataFrame = {
    val Scale = 10000L
    def quantize(r: Double): Long = {
      require(r >= 0.0 && r <= 1.0, s"rate out of [0,1]: $r")
      math.round(r * Scale)
    }
    // fixed fold order (sorted keys) so the when-chain is deterministic
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(quantize(defaultRate))) {
      case (acc, (g, r)) => when(col(groupCol) === lit(g), lit(quantize(r))).otherwise(acc)
    }
    df.filter(GraftExpressions.poly_hash(col(keyCol)) % Scale < threshold)
  }

  /** TEMPERATURE-flattened mixture sampling — the multilingual-training
    * recipe (exponentiated sampling, temperature T: group shares p_g are
    * resampled toward p_g^(1/T), flattening head/tail imbalance without
    * [[balanced]]'s hard cap). Rates are derived FROM THE CORPUS ITSELF
    * inside the plan: keeping the rarest group whole and sampling group g
    * at `(n_min / n_g)^(1/T)` realizes the p^(1/T) mix at maximal data
    * retention — no rate table to maintain as the corpus drifts, unlike
    * [[weightedBy]]'s explicit recipe.
    *
    * `temperature` must be a POWER OF TWO: the rate is computed as a
    * chain of `sqrt`s (T=2 → one, T=4 → two, ...), because IEEE-754
    * `sqrt` is correctly rounded — the identical double emerges on every
    * engine — while `pow(x, 1/T)` is libm-dependent and would break the
    * oracle's bit-exact mirror. T=2 is the standard sqrt-sampling of the
    * multilingual-pretraining literature.
    *
    * Scale shape: the per-group rate table is one partial-aggregated
    * count plus a 1-row min, both broadcast back — the corpus itself
    * never shuffles; admission is the same content-hash predicate
    * discipline as [[weightedBy]] (`poly_hash(key) mod 1e6 < floor(rate
    * ·1e6)`), so the decision is reproducible across runs, engines, and
    * partitionings, and exact duplicates sample identically.
    */
  /** EPOCH-based source UPSAMPLING — the other half of the mixture
    * recipes: [[weightedBy]]/[[temperatureFlatten]] SUBSAMPLE (rates ≤
    * 1), but every published pretraining mix also REPEATS scarce
    * high-quality sources (GPT-3 runs Wikipedia at 3.4 epochs while
    * Common Crawl runs 0.44; the Pile and LLaMA tables are epoch
    * tables). Each document of group g is replicated `floor(e_g)` times
    * plus ONE extra copy admitted by the content-hash draw with
    * probability `frac(e_g)` — expected copies exactly `e_g`,
    * deterministic (reproducible across runs, engines, partitionings;
    * exact duplicates expand identically — the [[weightedBy]]
    * discipline, extended past 1.0). Output = the input columns plus
    * `copy_idx` (0-based; `(row, copy_idx)` unique); documents with
    * zero copies (e_g < 1 and the draw fails) drop. The draw key is
    * salted (`keyCol ++ ":epoch"`) so it decorrelates from
    * [[weightedBy]]'s own draw on the same corpus.
    *
    * Compose with [[shufflePlan]] on a composite `(id, copy_idx)` key
    * for a training order where a document's copies scatter instead of
    * clustering (each copy hashes to its own shard/position).
    *
    * Scale shape: a pure scan-side explode — no shuffle, no state, no
    * rate table beyond the broadcast-foldable CASE chain; the row
    * multiplication IS the requested output (bounded by ⌈max e_g⌉ per
    * row). `epochsMilli` maps group → milli-epochs (2500 = 2.5 epochs);
    * groups absent from the map run `defaultMilli` (1000 = one epoch,
    * the identity).
    */
  def epochExpand(
      df: DataFrame,
      groupCol: String,
      epochsMilli: Map[String, Long],
      keyCol: String,
      defaultMilli: Long = 1000L
  ): DataFrame = {
    (epochsMilli.values ++ Seq(defaultMilli)).foreach(e =>
      require(e >= 0L, s"need epochsMilli >= 0, got $e")
    )
    // fixed fold order (sorted keys) so the when-chain is deterministic
    val em = epochsMilli.toSeq.sortBy(_._1).foldLeft(lit(defaultMilli)) { case (acc, (g, e)) =>
      when(col(groupCol) === lit(g), lit(e)).otherwise(acc)
    }
    val draw = GraftExpressions.poly_hash(concat(col(keyCol), lit(":epoch"))) % 1000L
    val copies = (em / 1000L).cast("long") + when(draw < em % 1000L, 1L).otherwise(0L)
    df.withColumn("__nc", copies)
      .withColumn(
        "copy_idx",
        explode(
          when(col("__nc") >= 1L, sequence(lit(0L), col("__nc") - 1L))
            .otherwise(array().cast("array<long>"))
        )
      )
      .drop("__nc")
  }

  def temperatureFlatten(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      temperature: Int = 2
  ): DataFrame = {
    require(
      temperature >= 2 && (temperature & (temperature - 1)) == 0,
      s"temperature must be a power of two >= 2 (sqrt-chain exactness), got $temperature"
    )
    val Scale = 1000000L
    val roots = Integer.numberOfTrailingZeros(temperature)
    val ratio = col("n_min").cast("double") / col("n_g").cast("double")
    val rate = (1 to roots).foldLeft(ratio)((c, _) => sqrt(c))
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    val thresholds = counts
      .crossJoin(broadcast(counts.agg(min(col("n_g")).as("n_min"))))
      .select(col(groupCol).as("__grp"), floor(rate * lit(Scale.toDouble)).cast("long").as("__thr"))
    // null-safe group match: a NULL group aggregates its own count row,
    // and its documents must sample at that derived rate, not silently
    // vanish through a null-rejecting equi-join
    df
      .join(broadcast(thresholds), col(groupCol) <=> col("__grp"))
      .filter(GraftExpressions.poly_hash(col(keyCol)) % Scale < col("__thr"))
      .drop("__grp", "__thr")
  }

  /** Deterministic training-order SHARD PLAN — the reproducible global
    * shuffle a training run needs: every document gets `(shard,
    * position)` as a pure function of `(id, seed)`, so two runs (or two
    * engines) materialize the identical example order, and changing the
    * seed is a full reshuffle with zero state carried over.
    *
    *  - `shard`    = `remix32(poly_hash(id ":" seed)) mod nShards` —
    *    content-hash placement, so shard sizes concentrate at n/nShards
    *    (the q59 bucket-occupancy argument) with no coordinator (the
    *    remix32 avalanche is what makes the seed an actual reshuffle —
    *    see its scaladoc);
    *  - `position` = rank of the same hash within the shard (id as
    *    tie-break) — the within-shard read order.
    *
    * Scale shape: one scan computes the hash, then ONE hash-partitioned
    * exchange on `shard` and a per-shard sort — which is exactly the
    * physical plan of the writer this feeds (`repartition(shard).
    * sortWithinPartitions` → one file per shard): the "window sort" here
    * is not overhead, it IS the materialization order being produced.
    * Per-task work is bounded by the shard size n/nShards, which the
    * caller sizes to the training reader's file budget; no global sort,
    * no driver state, no RNG (reproducibility is the point — a
    * `rand(seed)` order changes with partitioning, a content hash never
    * does).
    */
  def shufflePlan(
      df: DataFrame,
      nShards: Int,
      seed: Long = 0L,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(nShards > 0, s"need nShards > 0, got $nShards")
    import org.apache.spark.sql.expressions.Window
    // the determinism contract REQUIRES non-null unique ids: concat_ws
    // skips NULLs (every null id would hash to poly_hash(seed) with an
    // arbitrary tie-break), and duplicate ids get arbitrary relative
    // positions. Nulls fail fast in-plan; uniqueness is the caller's
    // documented obligation (checking it would cost an aggregate).
    val id = when(
      col(idCol).isNull,
      raise_error(lit(s"shufflePlan: null $idCol — deterministic order needs non-null unique ids"))
    ).otherwise(col(idCol))
    // remix32 AFTER the hash is load-bearing: polyHash("id:seed") for
    // short ids never wraps the modulus (monotone in the id — "shuffle"
    // would equal id order), and the seed, appended as a SUFFIX, shifts
    // every same-length hash by one constant (a new seed would NOT
    // reshuffle). The avalanche breaks both; caught by the r08 seed law.
    val h = GraftExpressions.remix32(
      GraftExpressions.poly_hash(concat_ws(":", id, lit(seed)))
    )
    df
      .select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn(
        "position",
        row_number()
          .over(Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol)))
          .cast("long")
      )
      .select(col(idCol), col("shard"), col("position"))
  }

  /** The RELEASE MANIFEST of a [[shufflePlan]] layout — the `nShards`-row
    * table a dataset release ships next to its shards so any consumer
    * can verify what they downloaded without re-deriving the plan:
    * per shard, the row count (completeness), token/char totals (the
    * numbers a datasheet quotes), and two one-word digests —
    * `content_xor` (order-free XOR of per-row content hashes: changes
    * iff some row's CONTENT changed or a row is missing/extra) and
    * `order_xor` (the same hash with the row's position mixed in:
    * additionally changes iff rows were REORDERED). The pair separates
    * the two failure modes a shard copy has; XOR makes both exactly
    * mergeable and partition-order-free, and every hash is the engine's
    * replayable polyHash/remix32 chain, so the manifest itself is
    * oracle-pinned. Scale shape: the plan, one co-keyed join back to
    * the text, one `nShards`-bounded aggregate.
    */
  def shardManifest(
      docs: DataFrame,
      nShards: Int,
      seed: Long = 0L,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val hText = GraftExpressions.poly_hash(col(textCol))
    val rowKey = concat_ws(":", col(idCol).cast("string"), hText.cast("string"))
    val ch = GraftExpressions.remix32(GraftExpressions.poly_hash(rowKey))
    val och = GraftExpressions.remix32(
      GraftExpressions.poly_hash(concat_ws(":", col("position").cast("string"), rowKey))
    )
    shufflePlan(docs, nShards, seed, idCol)
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .select(
        col("shard"),
        col("position"),
        size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long").as("n_tok"),
        length(col(textCol)).cast("long").as("n_chars"),
        ch.as("ch"),
        och.as("och")
      )
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("position")).as("max_position"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(ch)").as("content_xor"),
        expr("bit_xor(och)").as("order_xor")
      )
  }

  /** CURRICULUM shard plan — [[shufflePlan]] with the within-shard order
    * handed to a DIFFICULTY score instead of the hash: every document
    * still lands on `shard = remix32(poly_hash(id ":" seed)) mod
    * nShards` (content-hash placement, so each shard is an unbiased
    * ~n/nShards sample of the corpus — the property curriculum training
    * needs, since each worker reads ONE shard and must see the same
    * difficulty ramp), but `position` ranks `(scoreCol asc, id)` within
    * the shard: easy-to-hard in reading order (sequence-length warmup,
    * perplexity curricula — feed `n_tok`, LM rarity, or `imp_avg`
    * negated for target-first). Same physical plan as [[shufflePlan]]:
    * one exchange on shard, one per-shard sort — which IS the writer's
    * materialization order ([[Pipeline.writeMixed]]'s layout).
    *
    * Nulls: a null score would sort arbitrarily-by-engine; it fails fast
    * in-plan like the null id.
    */
  def curriculumPlan(
      df: DataFrame,
      nShards: Int,
      scoreCol: String,
      seed: Long = 0L,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(nShards > 0, s"need nShards > 0, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val id = when(
      col(idCol).isNull,
      raise_error(lit(s"curriculumPlan: null $idCol — deterministic order needs non-null unique ids"))
    ).otherwise(col(idCol))
    val score = when(
      col(scoreCol).isNull,
      raise_error(lit(s"curriculumPlan: null $scoreCol — the curriculum order needs non-null scores"))
    ).otherwise(col(scoreCol))
    val h = GraftExpressions.remix32(
      GraftExpressions.poly_hash(concat_ws(":", id, lit(seed)))
    )
    df
      .select(col(idCol), score.as("__s"), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn(
        "position",
        row_number()
          .over(Window.partitionBy(col("shard")).orderBy(col("__s"), col(idCol)))
          .cast("long")
      )
      .select(col(idCol), col("shard"), col("position"))
  }

  /** Per-source TOKEN-BUDGET cap — the Dolma/Pile mixing primitive:
    * each source contributes documents, in deterministic content-hash
    * order, until its running token total would exceed `budgetTokens`;
    * everything after the crossing point is dropped (strict prefix —
    * the budget is an epoch boundary, not a bin-packing target, so a
    * later small document must NOT leapfrog a dropped large one: that
    * would make admission depend on what else was dropped). Ordering by
    * `poly_hash(text)` makes the admitted prefix a uniform sample of the
    * source, reproducible across runs, engines, and partitionings, with
    * `idCol` as the duplicate-text tie-break.
    *
    * Returns `(idCol, groupCol, n_tok, cum_tok)` for the admitted
    * documents — `cum_tok` is the inclusive running total, exposing the
    * budget position (join back on `idCol` for the full rows).
    *
    * Scale shape — the naive plan is a window over each source, which
    * serializes a 100-TB source into one sort task. Instead the prefix
    * sum is TWO-PHASE (the q86 histogram discipline): documents land in
    * `buckets` hash-range buckets per source (monotone in the hash, so
    * bucket order refines hash order); per-(source, bucket) token sums
    * — one partial-aggregated row each — get an exclusive prefix sum
    * over the tiny (source × buckets) frame, broadcast back; each
    * document then needs only its WITHIN-bucket running total, computed
    * by per-(source, bucket) windows whose sort is 1/`buckets` of the
    * source and runs in parallel across buckets. A whole-source sort
    * never happens; `buckets` is the straggler knob.
    */
  /** WATER-FILLING fair division of ONE global token budget across
    * sources — the mixing-design step BEFORE [[capTokenBudget]]'s
    * per-source admission: small sources keep their whole supply, large
    * sources are equalized at the common water level `L`, and the total
    * allocation equals `min(T, Σ supply)` EXACTLY (max-min fairness, the
    * Pile/Dolma budget-split question answered mechanically instead of
    * by hand-tuned per-source caps). Returns `(source, supply, alloc)`.
    *
    * All-integer and engine-exact: sources sort ascending by (supply,
    * source); `kf` = the longest prefix every member of which fits under
    * its own trial level `(T − P_{k−1}) div (S−k+1)` (a prefix-AND, so
    * no monotonicity assumption on the floored levels), the level is
    * `L = (T − P_kf) div (S − kf)`, and the division remainder
    * `r < S − kf` goes +1 to the first `r` capped sources by source
    * name — deterministic to the last token. Every frame after the
    * per-source supply aggregate is SOURCES-sized; the windows order
    * bounded rows, never the corpus.
    */
  def waterfillBudgets(
      docs: DataFrame,
      totalTokens: Long,
      sourceCol: String = "source",
      textCol: String = "text"
  ): DataFrame = {
    require(totalTokens >= 0, s"need totalTokens >= 0, got $totalTokens")
    import org.apache.spark.sql.expressions.Window
    val supplies = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long")).as("supply"))
    val w = Window.orderBy(col("supply"), col("source"))
    val ranked = supplies
      .select(
        col("source"),
        col("supply"),
        row_number().over(w).cast("long").as("k"),
        sum(col("supply")).over(w).as("pfx"),
        count(lit(1)).over(Window.partitionBy()).as("s_n")
      )
      // trial level if sources 1..k-1 are fully satisfied: the remaining
      // S-k+1 sources share what is left of T (integer div — a double
      // divide could land one off at representation boundaries)
      .withColumn(
        "full",
        col("supply") <= expr(s"($totalTokens - (pfx - supply)) div (s_n - k + 1)")
      )
    val kfRow = ranked
      .select(
        col("source"),
        col("supply"),
        col("k"),
        col("pfx"),
        col("s_n"),
        min(when(col("full"), lit(1)).otherwise(lit(0)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("pall")
      )
    val stats = kfRow
      .agg(
        max(when(col("pall") === 1, col("k")).otherwise(lit(0L))).as("kf"),
        max(when(col("pall") === 1, col("pfx")).otherwise(lit(0L))).as("p_kf"),
        max(col("s_n")).as("s_n")
      )
      .select(
        col("kf"),
        col("p_kf"),
        col("s_n"),
        when(col("s_n") === col("kf"), lit(0L))
          .otherwise(expr(s"($totalTokens - p_kf) div (s_n - kf)"))
          .as("lvl"),
        when(col("s_n") === col("kf"), lit(0L))
          .otherwise(expr(s"($totalTokens - p_kf) % (s_n - kf)"))
          .as("rem")
      )
    kfRow
      .crossJoin(broadcast(stats))
      .select(
        col("source"),
        col("supply"),
        col("k"),
        col("kf"),
        col("lvl"),
        col("rem")
      )
      // rank ONLY the capped sources by name for the +1 remainder
      .withColumn(
        "cap_rk",
        when(col("k") <= col("kf"), lit(0L))
          .otherwise(
            row_number()
              .over(Window.partitionBy(col("k") <= col("kf")).orderBy(col("source")))
              .cast("long")
          )
      )
      .select(
        col("source"),
        col("supply"),
        when(col("k") <= col("kf"), col("supply"))
          .otherwise(col("lvl") + when(col("cap_rk") <= col("rem"), 1L).otherwise(0L))
          .as("alloc")
      )
  }

  /** [[capTokenBudget]] under a GLOBAL budget fairly divided by
    * [[waterfillBudgets]]: each source's admission threshold is ITS
    * water-fill allocation (broadcast back onto the unshuffled corpus),
    * and the admission itself is the same two-phase bucketed prefix sum.
    * One row per admitted document: `(idCol, groupCol, n_tok, cum_tok)`.
    */
  def capTokenBudgetFair(
      df: DataFrame,
      totalTokens: Long,
      groupCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 64
  ): DataFrame = {
    val allocs = waterfillBudgets(df, totalTokens, groupCol, textCol)
      .select(col("source").as(groupCol), col("alloc"))
    val base = df.select(
      col(idCol),
      col(groupCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
      GraftExpressions.poly_hash(col(textCol)).as("__h")
    )
    bucketedRunningTotal(base, "n_tok", idCol, col(groupCol), buckets, "cum_tok")
      .join(broadcast(allocs), Seq(groupCol))
      .filter(col("cum_tok") <= col("alloc"))
      .select(col(idCol), col(groupCol), col("n_tok"), col("cum_tok"))
  }

  def capTokenBudget(
      df: DataFrame,
      budgetTokens: Long,
      groupCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 64
  ): DataFrame = {
    require(budgetTokens >= 0, s"need budgetTokens >= 0, got $budgetTokens")
    val base = df.select(
      col(idCol),
      col(groupCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
      GraftExpressions.poly_hash(col(textCol)).as("__h")
    )
    bucketedRunningTotal(base, "n_tok", idCol, col(groupCol), buckets, "cum_tok")
      .filter(col("cum_tok") <= budgetTokens)
      .select(col(idCol), col(groupCol), col("n_tok"), col("cum_tok"))
  }

  /** The shared TWO-PHASE running total over content-hash order (the q86
    * histogram discipline, lifted to a reusable plan shape): the naive
    * form is one window per group ordered by `(__h, id)`, which
    * serializes a 100-TB group into one sort task. Instead documents
    * land in `buckets` hash-range buckets (`floor(__h·buckets/P)` —
    * MONOTONE in the hash, so (bucket, h, id) order equals (h, id)
    * order, the single-window reference order every oracle uses);
    * per-(group, bucket) value sums — one partial-aggregated row each —
    * get an exclusive prefix over the tiny group×bucket frame, broadcast
    * back; each row then needs only its WITHIN-bucket running total,
    * whose sort is 1/`buckets` of the group and runs in parallel across
    * buckets. A whole-group sort never happens; `buckets` is the
    * straggler knob. Callers: [[capTokenBudget]] (per-source budgets)
    * and [[Importance.resampleImportant]] (one global group).
    *
    * `base` must carry `idCol`, `valueCol`, and a `__h` hash column in
    * `[0, domain)` — polyHash values use the default `HashPrime` domain,
    * remix32 values pass `2^32`; the result is `base` plus `outCol` =
    * the inclusive running total of `valueCol` in `(__h, idCol)` order
    * within `groupExpr` (pass `lit(0)` for a global total). Sums inherit
    * `valueCol`'s type — cast to decimal(38,0) upstream when a long
    * could wrap.
    */
  private[operators] def bucketedRunningTotal(
      base: DataFrame,
      valueCol: String,
      idCol: String,
      groupExpr: org.apache.spark.sql.Column,
      buckets: Int,
      outCol: String,
      domain: Long = graft.functions.Kernels.HashPrime
  ): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val P = domain
    val bucketed = base
      .withColumn("__g", groupExpr)
      .withColumn("__b", (col("__h") * buckets / P).cast("long"))
    val bucketSums = bucketed
      .groupBy(col("__g"), col("__b"))
      .agg(sum(col(valueCol)).as("__bsum"))
    val prefixW = Window
      .partitionBy(col("__g"))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = bucketSums
      .select(
        col("__g").as("__pg"),
        col("__b").as("__pb"),
        coalesce(sum(col("__bsum")).over(prefixW), lit(0L)).as("__prefix")
      )
    val inBucketW = Window
      .partitionBy(col("__g"), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed
      .join(
        broadcast(prefixes),
        col("__g") <=> col("__pg") && col("__b") === col("__pb")
      )
      .withColumn(outCol, col("__prefix") + sum(col(valueCol)).over(inBucketW))
      .drop("__pg", "__pb", "__prefix", "__b", "__g")
  }
}
