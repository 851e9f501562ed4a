package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`, fixed dim). North-star extension — the reference has no
  * vector operations (SURVEY.md §2.1).
  *
  * Two tiers, same contract:
  *  - [[bruteForceTopK]]: exact. The (small) query set is broadcast against
  *    the corpus — a map-side nested loop with the codegen'd cosine kernel,
  *    no shuffle until the final per-query top-k. This is the correct
  *    baseline even at scale when |queries| is small: cost is
  *    |corpus| × |queries| fused multiply-adds, embarrassingly parallel.
  *  - [[annLsh]]: the scale path for query sets too large to broadcast-cross:
  *    deterministic random-hyperplane signatures bucket both sides, the join
  *    becomes an equi-join on bucket (shuffle bounded by bucket sizes, AQE
  *    splits skewed buckets), and only in-bucket candidates pay the cosine.
  *    Recall < 1 by construction; raise `planes` to sharpen buckets or probe
  *    multiple buckets for higher recall.
  */
object Similarity {

  val LshPlanes = 16
  val Dim = 64

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
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Attach the deterministic LSH bucket id (see
    * [[VectorFunctions.lshBucket]]) — the IVF-style coarse quantizer.
    */
  def withBucket(emb: DataFrame): DataFrame =
    emb.withColumn("bucket", VectorFunctions.lshBucket(col("embedding"), LshPlanes, Dim))

  /** ANN top-k: candidates restricted to the query's own LSH bucket. */
  def annLsh(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val e = withBucket(emb).select(col("vec_id"), col("embedding"), col("bucket"))
    val queries = e.filter(col("vec_id").isin(queryIds: _*))
    val scored = broadcast(queries.as("q"))
      .join(e.as("c"), col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        VectorFunctions.cosine(col("q.embedding"), col("c.embedding")).as("cos")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }
}
