package graft.tools
import graft.operators.Similarity
import graft.sources.Tables
import graft.GraftSession
object PqProbe {
  private def mix(x: Long): Long = {
    var h = x * 0x9e3779b97f4a7c15L
    h ^= (h >>> 32); h *= 0xbf58476d1ce4e5b9L; h ^= (h >>> 29)
    math.abs(h)
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("pq-probe", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nVec = 2000L
    val emb = spark.range(nVec).map { id =>
      val c = id % 200L
      val v = Array.tabulate(64) { j =>
        val center = ((mix(c * 977L + j) % 2001L) - 1000L).toFloat / 1000f
        val noise = ((mix(id * 131L + j) % 401L) - 200L).toFloat / 1000f
        center + noise
      }
      (id, v)
    }.toDF("vec_id", "embedding").persist()
    val qids = (0L until 5L).toSeq
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, qids, 10))
    def recall(s: Set[(Long, Long)]): Double = (exact & s).size.toDouble / exact.size
    println(f"clustered pq adc m=4:  ${recall(pairs(Similarity.annPqAdc(emb, qids, 10)))}%.3f")
    println(f"clustered pq refined m=4 sl=50: ${recall(pairs(Similarity.annPqRefined(emb, qids, 10, 50)))}%.3f")
    // uniform fixture, refined with bigger shortlists
    val fix = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val exactF = pairs(Similarity.bruteForceTopK(fix, qids, 10))
    def recallF(s: Set[(Long, Long)]): Double = (exactF & s).size.toDouble / exactF.size
    println(f"uniform refined sl=200: ${recallF(pairs(Similarity.annPqRefined(fix, qids, 10, 200)))}%.3f")
    println(f"uniform refined sl=400: ${recallF(pairs(Similarity.annPqRefined(fix, qids, 10, 400)))}%.3f")
    spark.stop()
  }
}
