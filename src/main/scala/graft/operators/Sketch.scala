package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** KMV (k-minimum-values) DISTINCT-COUNT sketch — approximate
  * `count(distinct x)` per group from only the k smallest distinct hash
  * values: if the k-th smallest of n uniform hashes in `[0, M)` lands at
  * height `h_k`, then `n ≈ (k−1)·M / h_k` (Bar-Yossef et al., RANDOM
  * 2002). The corpus-profiling operator for cardinality questions
  * ("distinct URLs per domain", "distinct documents per source") where an
  * exact `count(distinct)` would shuffle every distinct value.
  *
  * Scale shape: the hash-distinct pass is one partial-aggregated shuffle
  * on the well-distributed `(group, hash)` key, and the per-group k-minima
  * ride the SAME bounded-heap aggregate as balanced sampling
  * ([[graft.functions.TopKNeighbors]]) — map-side partials reduce every
  * partition to ≤ k candidates per group before the tiny final shuffle,
  * so a billion-row group costs its scan, not a sort, and a skewed group's
  * reduction is spread across all partitions holding its rows. No
  * windows, no sorts.
  *
  * Unlike `approx_count_distinct` (HyperLogLog), the estimate is a pure
  * deterministic function of the value set through the engine-wide
  * `poly_hash` — reproducible across runs, partitionings, AND engines,
  * which is what lets a DuckDB oracle pin it exactly. Standard error is
  * ~`1/√(k−2)`; groups with fewer than k distinct hashes short-circuit to
  * the EXACT count (the sketch holds them whole).
  */
object Sketch {

  /** Hash domain AFTER remixing: `[0, 2^32)`. KMV needs UNIFORM hashes,
    * and raw `poly_hash` is not uniform on structured key sets — keys
    * sharing a prefix hash to `C·31^d + H(suffix) mod P`, i.e. a few
    * narrow bands (measured: a 10k-key "value N" set estimated as ~400).
    * The fix is the engine's existing `remix32` finisher (the same reason
    * SimHash must not vote on raw polyHash bits): two odd-multiplier
    * rounds with xor-shift mixing — a BIJECTION on `[0, 2^32)`, so
    * distinctness is preserved exactly while the values spread uniformly.
    */
  val M: Long = 1L << 32

  /** [[GraftExpressions.remix32]], shared engine-wide since r08. */
  private def remix32(h: Column): Column = GraftExpressions.remix32(h)

  /** Per-group distinct estimate:
    * `(groupCol, n_kept, kth_hash, est_distinct)` — `n_kept` = how many of
    * the k minima exist (< k means the group short-circuits to exact),
    * `kth_hash` the largest kept hash, `est_distinct` the estimate.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int = 64
  ): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    df
      .select(col(groupCol), remix32(GraftExpressions.poly_hash(col(keyCol))).as("h"))
      .distinct()
      .groupBy(col(groupCol))
      // remixed hashes < 2^32 are exact in double; negate so top-k = k
      // smallest. The aggregate's (score desc, id asc) output order makes
      // the LAST element the k-th smallest hash.
      .agg(
        GraftExpressions
          .top_k_neighbors(-col("h").cast("double"), col("h"), k)
          .as("mins")
      )
      .select(
        col(groupCol),
        size(col("mins")).cast("long").as("n_kept"),
        // guarded: ANSI element_at throws on an empty array (a group whose
        // every key hashed null keeps a row but collects no minima)
        when(
          size(col("mins")) > 0,
          element_at(col("mins"), -1).getField("neighbor_id")
        ).as("kth_hash")
      )
      .select(
        col(groupCol),
        col("n_kept"),
        col("kth_hash"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${(k - 1).toLong * M}L div greatest(kth_hash, 1L))"))
          .as("est_distinct")
      )
  }

  // ------------------------------------------------------------ HyperLogLog

  /** HLL register width: hashes are 32-bit after remix, so a register
    * value is at most `32 - p + 1`.
    */
  private def maxRho(p: Int): Int = 32 - p + 1

  /** 2^32 as a double — the hash-space size the large-range correction
    * is phrased in (the registers hash 32 bits; see [[hllEstimate]]).
    */
  private val HllTwoTo32: Double = 4294967296.0

  /** The alpha_m bias constant (Flajolet et al. 2007) times m², as ONE
    * Scala double both engines receive as the same literal.
    */
  def hllAlphaM2(p: Int): Double = {
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m
  }

  /** Small-range (linear-counting) correction as a PRECOMPUTED integer
    * lookup table: `lut(z-1) = round(m·ln(m/z)·10^6)` micro-units for
    * `z = 1 … m−1` empty registers. Baking `ln` into literals computed
    * ONCE in Scala is what keeps the estimate hash-exact across engines
    * — a cross-engine `ln` call could differ in the last ulp and flip a
    * rounded digit; a shared literal table cannot.
    */
  def hllLut(p: Int): Seq[Long] = {
    val m = 1 << p
    (1 until m).map(z => math.round(m * math.log(m.toDouble / z) * 1e6))
  }

  /** Per-(group, register) HLL state — `(groupCol, reg, rho)` with
    * `rho` the max leading-run rank observed: `reg = h mod m` buckets
    * the remixed 32-bit hash, `rho = trailing-zero-count(h div m) + 1`
    * (computed as `round(log2(w & −w)) + 1` — the lowest-set-bit trick;
    * the true value is an integer, so nearest-integer rounding absorbs
    * any ulp difference between engines' `log2`). One partial-aggregated
    * `max` per (group, reg): duplicates never shuffle (max over
    * occurrences == max over distinct — the property KMV's distinct
    * pass pays for and HLL gets free), and merging two corpora's
    * register tables is the same `max`, which is the mergeability a
    * monitoring pipeline ships sketches around for (spec-pinned).
    */
  def hllRegisters(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      p: Int = 4
  ): DataFrame = {
    require(p >= 4 && p <= 14, s"need 4 <= p <= 14, got $p")
    val m = 1L << p
    df
      .select(col(groupCol), remix32(GraftExpressions.poly_hash(col(keyCol))).as("h"))
      .select(col(groupCol), (col("h") % m).as("reg"), shiftright(col("h"), p).as("w"))
      .select(
        col(groupCol),
        col("reg"),
        when(col("w") === 0L, lit(maxRho(p).toLong))
          .otherwise(
            (round(log2(col("w").bitwiseAND(-col("w")))) + lit(1)).cast("long")
          )
          .as("rho")
      )
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** The HLL ESTIMATE from a register table: `(groupCol, n_regs_set,
    * zeros, est_micro)` — the distinct-count estimate in micro-units,
    * ALL-deterministic in the gated range: the harmonic sum folds
    * `2^−rho` terms (exact powers of two) in register order, the raw
    * estimate is one IEEE division, and the small-range branch reads
    * the [[hllLut]] literal. Standard error ≈ `1.04/√m`.
    *
    * Three ranges (Flajolet et al. 2007 §4, for 32-bit hashes):
    * small (`raw ≤ 2.5m`, zeros present) → linear counting via the LUT;
    * mid → the raw estimate; large (`raw > 2^32/30`) → the hash-
    * collision correction `E* = −2^32·ln(1 − E/2^32)`, which un-biases
    * the saturation as distinct counts approach the 2^32 hash space.
    * The large branch computes a genuine `ln` (no LUT — its domain is
    * continuous); it only fires above ~1.4·10^8 distinct keys per
    * group, far past any oracle fixture, and `Math.log` is
    * correctly-rounded-to-ulp on every JVM this engine targets. The
    * argument is clamped one hash below saturation so a register table
    * driven past 2^32 distincts reports the ceiling instead of NaN.
    */
  def hllEstimate(registers: DataFrame, groupCol: String, p: Int = 4): DataFrame = {
    require(p >= 4 && p <= 14, s"need 4 <= p <= 14, got $p")
    val m = 1 << p
    val lut = hllLut(p).toArray
    val sorted = array_sort(collect_list(struct(col("reg"), col("rho"))))
    registers
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_regs_set"),
        aggregate(
          sorted,
          lit(0.0),
          (acc, s) => acc + pow(lit(0.5), s.getField("rho").cast("double"))
        ).as("__sp")
      )
      .select(
        col(groupCol),
        col("n_regs_set"),
        (lit(m.toLong) - col("n_regs_set")).as("zeros"),
        (lit(hllAlphaM2(p)) /
          (col("__sp") + (lit(m.toLong) - col("n_regs_set")).cast("double"))).as("__raw")
      )
      .select(
        col(groupCol),
        col("n_regs_set"),
        col("zeros"),
        when(
          col("__raw") <= lit(2.5 * m) && col("zeros") > 0L,
          element_at(lit(lut), col("zeros").cast("int"))
        ).when(
          col("__raw") > lit(HllTwoTo32 / 30.0),
          floor(
            -lit(HllTwoTo32) *
              log(lit(1.0) - least(col("__raw"), lit(HllTwoTo32 - 1.0)) / lit(HllTwoTo32)) *
              lit(1e6) + lit(0.5)
          ).cast("long")
        ).otherwise(floor(col("__raw") * lit(1e6) + lit(0.5)).cast("long"))
          .as("est_micro")
      )
  }

  /** One-call per-group HLL distinct estimate — [[hllRegisters]] piped
    * into [[hllEstimate]]. The KMV sibling with the opposite trade:
    * fixed m-register state per group (KMV keeps k hashes), register
    * MERGE across sketches (KMV re-minimizes), duplicates never shuffle.
    */
  def hllDistinct(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      p: Int = 4
  ): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol, p), groupCol, p)

  /** CORPUS OVERLAP estimate between two document sets from their KMV
    * sketches (Beyer et al., SIGMOD 2007: sketches are composable —
    * the k minima of A ∪ B are computable from the two side sketches, and
    * the fraction of union minima present in BOTH side sketches estimates
    * Jaccard): `(n_kept, est_a, est_b, est_union, n_both, jaccard_est,
    * est_intersect)`, one row. The planning question it answers — "how
    * much of crawl B is already in corpus A" — without ever joining the
    * corpora: each side is reduced to ≤ k hashes by the same bounded-heap
    * aggregate as [[kmvDistinct]] (map-side partials, no sort), and all
    * downstream arithmetic runs on the tiny sketch frames.
    *
    * Estimates short-circuit to EXACT when a sketch is not full (fewer
    * than k distinct hashes — then the minima ARE the set). All outputs
    * are deterministic functions of the value sets through `poly_hash`,
    * so a DuckDB oracle pins them exactly; `jaccard_est` is rounded to 6
    * places, `est_intersect` uses integer arithmetic
    * (`n_both · est_union div n_kept`).
    *
    * Each corpus is scanned EXACTLY ONCE: its ≤ k-row sketch is
    * localCheckpoint-ed (eager, like the cluster family's contract), and
    * every downstream frame — the union sketch (the k minima of A ∪ B
    * are a subset of kA ∪ kB, so it composes from the side sketches
    * without touching the corpora again), the containment counts, the
    * per-side stats — runs on those materialized ≤ k-row frames.
    */
  def corpusOverlap(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      k: Int = 256
  ): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    def hashes(df: DataFrame): DataFrame =
      df.select(remix32(GraftExpressions.poly_hash(col(keyCol))).as("h")).distinct()
    def minsOf(h: DataFrame): DataFrame = h
      .agg(GraftExpressions.top_k_neighbors(-col("h").cast("double"), col("h"), k).as("mins"))
      .select(explode(col("mins")).as("m"))
      .select(col("m").getField("neighbor_id").as("h"))
    val ka = minsOf(hashes(a)).localCheckpoint(true)
    val kb = minsOf(hashes(b)).localCheckpoint(true)
    val ku = minsOf(ka.union(kb).distinct())
    def sketchStats(mins: DataFrame, prefix: String): DataFrame = mins.agg(
      count(lit(1)).as(s"${prefix}_kept"),
      max(col("h")).as(s"${prefix}_kth")
    )
    val nBoth = ku
      .join(ka, Seq("h"), "left_semi")
      .join(kb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    // integer `div` everywhere (mirrors DuckDB `//` exactly — a double
    // divide + cast could land one off at representation boundaries)
    val scaled = (k - 1).toLong * M
    def estOf(p: String): String =
      s"CASE WHEN ${p}_kept < $k THEN ${p}_kept ELSE ${scaled}L div greatest(${p}_kth, 1L) END"
    sketchStats(ku, "u")
      .crossJoin(broadcast(sketchStats(ka, "a")))
      .crossJoin(broadcast(sketchStats(kb, "b")))
      .crossJoin(broadcast(nBoth))
      .selectExpr(
        "u_kept AS n_kept",
        s"${estOf("a")} AS est_a",
        s"${estOf("b")} AS est_b",
        s"${estOf("u")} AS est_union",
        "n_both",
        "round(CAST(n_both AS DOUBLE) / CAST(greatest(u_kept, 1L) AS DOUBLE), 6) AS jaccard_est",
        s"(n_both * (${estOf("u")})) div greatest(u_kept, 1L) AS est_intersect"
      )
  }

  // ------------------------------------------------------- Count-Min sketch

  /** Count-Min FREQUENCY sketch (Cormode & Muthukrishnan, J. Algorithms
    * 2005): a `depth × width` counter grid where occurrence of key `x`
    * increments counter `(r, h_r(x) mod width)` in every row `r`, and a
    * point estimate reads the MINIMUM of `x`'s `depth` counters — always
    * `≥` the true count (counters only ever absorb EXTRA mass from
    * colliding keys), within `ε·N` of it with probability `1 − δ` at
    * `width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉`. The one-pass mergeable answer to
    * "how often does each of these tokens appear" when the key domain is
    * too wide to count exactly — the frequency-side complement of
    * [[kmvDistinct]]/[[hllRegisters]] (cardinality) and of
    * [[HeavyHitters]] (which finds the heavy KEYS but needs its second
    * pass for counts, and cannot answer point queries for keys outside
    * the top-k).
    *
    * The row-hash family is the engine's minhash affine family over
    * `poly_hash` — `h_r(x) = (H(x)·(2r+1) + (r²·31+7) mod P) mod P` —
    * deterministic and DuckDB-replayable, so the gate pins every counter
    * exactly (`approx_count_distinct`-style opacity would make the sketch
    * untestable against an oracle).
    *
    * Scale shape: one scan; the explode is `depth` (2–5) rows per
    * occurrence, partial aggregation collapses every partition to
    * `≤ depth·width` counter cells before the shuffle, and the sketch at
    * rest is `depth·width` rows — broadcastable by construction. No key
    * ever shuffles at its own cardinality, which is the point: the
    * counter GRID, not the key domain, bounds every exchange.
    */
  def cmsSketch(
      items: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 1024,
      weightCol: Option[String] = None
  ): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth, width >= 1, got $depth, $width")
    val P = graft.functions.Kernels.HashPrime
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    items
      .select(GraftExpressions.poly_hash(col(keyCol)).as("h"), w.as("w"))
      .select(
        explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col("h"),
        col("w")
      )
      .withColumn(
        "cms_col",
        expr(s"((h * (2*row + 1) + (row*row*31 + 7) % $P) % $P) % $width")
      )
      .groupBy(col("row").cast("long").as("row"), col("cms_col"))
      .agg(sum(col("w")).as("cnt"))
  }

  /** Point estimates for `keys` against a built [[cmsSketch]]: `(keyCol,
    * est)` with `est = min_r counters[r][h_r(key)]` (0 when every counter
    * is empty — a key the stream never touched). The sketch frame is
    * `depth·width` rows and broadcasts; the query side is |keys| rows
    * exploded `depth`-fold — neither side is corpus-sized, which is what
    * makes this the SERVING operator (persist the sketch once, answer
    * point queries forever, exactly the [[Similarity.lshIndex]] artifact
    * discipline on the counting tier).
    */
  def cmsEstimate(
      sketch: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth, width >= 1, got $depth, $width")
    val P = graft.functions.Kernels.HashPrime
    keys
      .select(col(keyCol), GraftExpressions.poly_hash(col(keyCol)).as("h"))
      .select(col(keyCol), explode(sequence(lit(0), lit(depth - 1))).as("row"), col("h"))
      .withColumn(
        "cms_col",
        expr(s"((h * (2*row + 1) + (row*row*31 + 7) % $P) % $P) % $width")
      )
      .join(broadcast(sketch), Seq("row", "cms_col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Counter-wise sum of sketches built with the SAME (depth, width) —
    * the property that makes CMS the distributed counter: per-shard (or
    * per-day) sketches built independently merge into exactly the sketch
    * of the concatenated stream (spec-pinned), so a 1000-executor build
    * is `union → one `depth·width`-bounded aggregate`, and incremental
    * maintenance is append-a-sketch, never rebuild.
    */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches
      .reduce(_.unionByName(_))
      .groupBy(col("row"), col("cms_col"))
      .agg(sum(col("cnt")).as("cnt"))
  }
}
