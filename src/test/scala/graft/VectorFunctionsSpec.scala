package graft

import graft.functions.{Kernels, VectorFunctions}
import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded pseudo-random vectors — property-style coverage (many cases,
    * one Spark job) without a network dependency on scalatestplus.
    */
  private def randomPairs(n: Int, dim: Int, seed: Long): Seq[(Array[Float], Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(
      (
        Array.fill(dim)((rnd.nextFloat() - 0.5f) * 20f),
        Array.fill(dim)((rnd.nextFloat() - 0.5f) * 20f)
      )
    )
  }

  test("feature_hash: signed lane sums match a direct reimplementation") {
    import graft.functions.TextFunctions
    val dim = 8
    def expected(text: String): Seq[Float] = {
      val acc = new Array[Long](dim)
      text.split(" ", -1).foreach { t =>
        val h = Kernels.polyHash(t)
        acc((h % dim).toInt) += (if ((h / dim) % 2L == 0L) 1L else -1L)
      }
      acc.map(_.toFloat).toSeq
    }
    val texts = Seq("a b a", "the quick brown fox", "", "x", "a a a a a a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df
      .select(col("doc_id"), TextFunctions.embed(col("text"), dim).as("e"))
      .as[(Long, Seq[Float])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"mismatch for '$t'")
    }
    // deterministic: same text, same embedding, dim respected
    assert(got.values.forall(_.length == dim))
  }

  test("cosine: symmetric, bounded, self-similarity 1 over 100 random pairs") {
    val df = randomPairs(100, 16, seed = 42L).toDF("a", "b")
    val rows = df
      .select(
        VectorFunctions.cosine(col("a"), col("b")).as("ab"),
        VectorFunctions.cosine(col("b"), col("a")).as("ba"),
        VectorFunctions.cosine(col("a"), col("a")).as("aa")
      )
      .as[(Double, Double, Double)]
      .collect()
    rows.foreach { case (ab, ba, aa) =>
      assert(ab == ba, "symmetry (bit-for-bit)")
      assert(ab >= -1.0000001 && ab <= 1.0000001, "bounds")
      assert(math.abs(aa - 1.0) < 1e-9, "self-similarity")
    }
  }

  test("codegen cosine == HOF cosine bit-for-bit on fixture embeddings") {
    val emb = Tables.load(spark, Sf0001, "embeddings")
    val both = emb.as("l").join(emb.as("r"), col("l.vec_id") < col("r.vec_id")).limit(500)
      .select(
        VectorFunctions.cosine(col("l.embedding"), col("r.embedding")).as("expr"),
        VectorFunctions.cosineHof(col("l.embedding"), col("r.embedding")).as("hof")
      )
    assert(both.filter(col("expr") =!= col("hof")).count() == 0)
  }

  test("codegen lshBuckets == HOF literal-planes mirror on fixture embeddings") {
    val emb = Tables.load(spark, Sf0001, "embeddings")
    val t = 4; val w = 6; val dim = Similarity.Dim
    val both = emb.select(
      VectorFunctions.lshBuckets(col("embedding"), t, w, dim).as("expr"),
      VectorFunctions.lshBucketsHof(col("embedding"), t, w, dim).as("hof")
    )
    assert(both.filter(col("expr") =!= col("hof")).count() == 0)
  }

  test("planeWeight: deterministic, in [-0.5, 0.5), decorrelated adjacent rows") {
    val dim = 64
    val w0 = Array.tabulate(dim)(j => Kernels.planeWeight(0, j, dim))
    val w1 = Array.tabulate(dim)(j => Kernels.planeWeight(1, j, dim))
    assert(w0.sameElements(Array.tabulate(dim)(j => Kernels.planeWeight(0, j, dim))))
    assert((w0 ++ w1).forall(x => x >= -0.5 && x < 0.5))
    // consecutive planes must not be correlated (the round-1 lattice bug):
    val mean0 = w0.sum / dim; val mean1 = w1.sum / dim
    val cov = w0.zip(w1).map { case (x, y) => (x - mean0) * (y - mean1) }.sum / dim
    val sd0 = math.sqrt(w0.map(x => (x - mean0) * (x - mean0)).sum / dim)
    val sd1 = math.sqrt(w1.map(x => (x - mean1) * (x - mean1)).sum / dim)
    assert(math.abs(cov / (sd0 * sd1)) < 0.3, "adjacent planes decorrelated")
  }
}
