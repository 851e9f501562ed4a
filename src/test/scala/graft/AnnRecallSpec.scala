package graft

import graft.operators.Similarity
import graft.sources.Tables

/** Correct-vs-mirror is not correct-vs-purpose (VERDICT.md on round-1 q31):
  * the ANN path must also RECALL what exact search finds. Gate: recall@10
  * ≥ 0.8 against bruteForceTopK on the sf0.1 embeddings (the bench-scale
  * fixture; measured ≈ 0.88 with L=12, W=10, Hamming≤2 probing).
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  test("annLsh recall@10 vs bruteForceTopK >= 0.8 on sf0.1") {
    val emb = Tables.load(spark, Sf01, "embeddings")
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k))
    val approx = pairs(Similarity.annLsh(emb, queries, k))
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"recall@$k = $recall%.3f (${(exact & approx).size}/${exact.size})")
    assert(recall >= 0.8, f"ANN recall collapsed: $recall%.3f < 0.8")
  }
}
