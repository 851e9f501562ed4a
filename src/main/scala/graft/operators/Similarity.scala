package graft.operators

import graft.functions.{GraftExpressions, VectorFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Similarity search over an embedding column (`array<float>`, fixed dim).
  * North-star extension — the reference has no vector operations
  * (SURVEY.md §2.1).
  *
  * Two tiers, same output contract (query_id, rnk, neighbor_id, cosine):
  *  - [[bruteForceTopK]]: exact. The (small) query set is broadcast against
  *    the corpus — a map-side nested loop with the codegen'd cosine kernel —
  *    and the per-query top-k is a bounded-heap AGGREGATE
  *    ([[graft.functions.TopKNeighbors]]): each partition reduces to ≤ k
  *    candidates before the shuffle, so no task ever sorts a full
  *    per-query candidate list (the round-1 Window/row_number plan did —
  *    VERDICT.md "What's wrong" #6).
  *  - [[annLsh]]: the approximate scale path: multi-table random-hyperplane
  *    LSH (L tables × W sign bits, codegen'd [[graft.functions.LshBuckets]])
  *    with multi-probe (all buckets within Hamming distance ≤ 2 of the
  *    query's bucket). Candidates come from an EQUI-join on (table, bucket),
  *    so shuffle volume is bounded by bucket occupancy; only candidates pay
  *    the exact cosine, and the same top-k aggregate finishes. Measured
  *    recall@10 vs [[bruteForceTopK]] ≈ 0.88 on the sf0.1 fixture (gated
  *    ≥ 0.8 in AnnRecallSpec) — this corpus's true neighbors sit at cosine
  *    ~0.3, so tighter tables would collapse recall; L/W/probe radius are
  *    the knobs to retune per corpus.
  */
object Similarity {

  val LshTables = 12
  val LshPlanesPerTable = 10
  val Dim = 64
  val IvfCells = 32
  val IvfProbes = 8

  /** Probe masks: XOR patterns for Hamming distance 0, 1 and 2 over
    * W-bit buckets — 1 + W + W(W−1)/2 probes per (query, table).
    */
  def probeMasks(w: Int): Seq[Long] = {
    val singles = (0 until w).map(j => 1L << j)
    val doubles = for {
      a <- 0 until w
      b <- (a + 1) until w
    } yield (1L << a) | (1L << b)
    0L +: (singles ++ doubles)
  }

  /** Bounded per-query top-k over a scored (query_id, neighbor_id, cos)
    * frame: partial heaps per partition, one merge, posexplode to ranks.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(GraftExpressions.top_k_neighbors(col("cos"), col("neighbor_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(
        col("query_id"),
        (col("pos") + lit(1)).cast("long").as("rnk"),
        col("n.neighbor_id").as("neighbor_id"),
        round(col("n.cos"), 6).as("cosine")
      )

  /** Exact top-k neighbors for each query vector (queries = rows whose
    * `vec_id` is in `queryIds`), self-matches excluded, ties broken by
    * neighbor id for full determinism.
    */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    val queries = e.filter(col("vec_id").isin(queryIds: _*))
    val scored = broadcast(queries.as("q"))
      .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("q.embedding"), col("c.embedding")).as("cos")
      )
    topK(scored, k)
  }

  /** Attach the L-table LSH signature column `buckets` (array<long>). */
  def withBuckets(emb: DataFrame): DataFrame =
    emb.withColumn(
      "buckets",
      GraftExpressions.lsh_buckets(col("embedding"), LshTables, LshPlanesPerTable, Dim)
    )

  /** IVF-style ANN: a deterministic coarse quantizer built from DATA
    * vectors (every ⌊n/C⌋-th vector is a seed centroid — no training loop,
    * so the DuckDB oracle reproduces the identical cells), corpus vectors
    * assigned to their max-cosine cell, queries probing their `IvfProbes`
    * nearest cells. Cell assignment and probing both reuse the bounded
    * top-k aggregate (k=1 / k=nprobe) — no window sorts anywhere. The
    * candidate join is an equi-join on cell id, so shuffle volume is
    * bounded by cell occupancy; at production scale the seed quantizer is
    * swapped for k-means centroids with the SAME assignment/probe plan.
    *
    * Lower recall than [[annLsh]] on diffuse corpora (cell membership is
    * all-or-nothing; measured ≈ 0.6 on the fixture vs 0.88 for multi-probe
    * LSH) — kept as the IVF family representative; LSH is the recall path.
    */
  def annIvf(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    val n = e.count()
    val stride = math.max(1L, n / IvfCells)
    val centroids = e
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * IvfCells)
      .select(expr(s"vec_id div $stride").as("cell"), col("embedding").as("c_emb"))
    val cellScores = e
      .crossJoin(broadcast(centroids))
      .select(
        col("vec_id").as("query_id"), // reuse the top-k agg's column contract
        col("cell").as("neighbor_id"),
        VectorFunctions.cosine(col("embedding"), col("c_emb")).as("cos")
      )
    def assign(nCells: Int) =
      topK(cellScores, nCells)
        .select(col("query_id").as("vec_id"), col("neighbor_id").as("cell"))
    val corpusCells = e.join(assign(1), "vec_id")
    val queryCells = e
      .filter(col("vec_id").isin(queryIds: _*))
      .join(assign(IvfProbes), "vec_id")
    val scored = broadcast(queryCells.as("q"))
      .join(
        corpusCells.as("c"),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id")
      )
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("q.embedding"), col("c.embedding")).as("cos")
      )
      .distinct()
    topK(scored, k)
  }

  /** ANN top-k via multi-table multi-probe LSH. The corpus explodes to
    * (table, bucket) rows once; each query probes every bucket within
    * Hamming ≤ 2 per table. Candidates are deduped before ranking so a
    * neighbor found by several tables is scored once.
    */
  def annLsh(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = withBuckets(emb).select(col("vec_id"), col("embedding"), col("buckets"))
    val corpus = e
      .select(col("vec_id"), col("embedding"), posexplode(col("buckets")).as(Seq("table", "bucket")))
    val masks = probeMasks(LshPlanesPerTable).toArray
    val queries = e
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding"), posexplode(col("buckets")).as(Seq("table", "bucket")))
      .select(
        col("vec_id"),
        col("embedding"),
        col("table"),
        explode(transform(lit(masks), m => col("bucket").bitwiseXOR(m))).as("probe")
      )
    val scored = broadcast(queries.as("q"))
      .join(
        corpus.as("c"),
        col("q.table") === col("c.table") && col("q.probe") === col("c.bucket") &&
          col("q.vec_id") =!= col("c.vec_id")
      )
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("q.embedding"), col("c.embedding")).as("cos")
      )
      .distinct()
    topK(scored, k)
  }
}
