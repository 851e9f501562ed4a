package graft.tools

import graft.operators.Similarity
import graft.sources.Tables
import graft.GraftSession

/** Quick ANN-quality diagnostic: recall@10 of each approximate path vs
  * exact brute force on one fixture dir (arg 1, default sf0.1) — the
  * focused loop for tuning LSH/IVF knobs without a full Bench run.
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-recall", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, qids, 10))
    def recall(s: Set[(Long, Long)]): Double = (exact & s).size.toDouble / exact.size
    val t0 = System.nanoTime()
    val rIvf = recall(pairs(Similarity.annIvf(emb, qids, 10)))
    val tIvf = (System.nanoTime() - t0) / 1e9
    val t0b = System.nanoTime()
    pairs(Similarity.annIvf(emb, qids, 10))
    println(f"ivf 2nd run: ${(System.nanoTime() - t0b) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val rLsh = recall(pairs(Similarity.annLsh(emb, qids, 10)))
    val tLsh = (System.nanoTime() - t1) / 1e9
    println(f"ivf recall@10 = $rIvf%.3f (${tIvf}%.1f s)   lsh recall@10 = $rLsh%.3f (${tLsh}%.1f s)   sf=$sfDir")
    spark.stop()
  }
}
