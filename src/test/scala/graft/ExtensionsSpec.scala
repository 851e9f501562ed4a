package graft

import graft.functions.Kernels

/** The SQL surface of the custom kernels, registered through
  * SparkSessionExtensions (GraftSession wires spark.sql.extensions).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("poly_hash is SQL-callable and matches the kernel") {
    val got = spark.sql("SELECT poly_hash('café 中文') AS h").as[Long].head()
    assert(got == Kernels.polyHash("café 中文"))
  }

  test("cosine_sim / dot_product are SQL-callable") {
    val row = spark
      .sql(
        """SELECT
           cosine_sim(array(cast(3.0 as float), cast(4.0 as float)),
                      array(cast(3.0 as float), cast(4.0 as float))) AS c,
           dot_product(array(cast(1.0 as float), cast(2.0 as float)),
                       array(cast(3.0 as float), cast(4.0 as float))) AS d"""
      )
      .as[(Double, Double)]
      .head()
    assert(math.abs(row._1 - 1.0) < 1e-12 && row._2 == 11.0)
  }

  test("shingle_minhash / lsh_buckets / text_stats are SQL-callable with literal params") {
    val sig = spark
      .sql("SELECT size(shingle_minhash('a b c d e', 3, 32).sig) AS n")
      .as[Int].head()
    assert(sig == 32)
    val buckets = spark
      .sql("SELECT size(lsh_buckets(array(cast(1.0 as float)), 4, 6, 1)) AS n")
      .as[Int].head()
    assert(buckets == 4)
    val stats = spark
      .sql("SELECT text_stats('the quick fox').n_tokens AS n")
      .as[Long].head()
    assert(stats == 3L)
  }

  test("simhash32 / feature_hash / jaccard_sim are SQL-callable and match the kernels") {
    val sh = spark
      .sql("SELECT simhash32('the quick fox', false) AS h")
      .as[Long].head()
    assert(sh == Kernels.simhash32(org.apache.spark.unsafe.types.UTF8String.fromString("the quick fox"), false))
    val fh = spark
      .sql("SELECT size(feature_hash('a b c', 16)) AS n")
      .as[Int].head()
    assert(fh == 16)
    val j = spark
      .sql("SELECT jaccard_sim(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
      .as[Double].head()
    assert(j == 0.5)
    val wn = spark
      .sql("SELECT winnow_fps('a b c d e f g h i j k l', 3, 8) AS fp")
      .as[Seq[Long]].head()
    val expect = Kernels
      .winnow(org.apache.spark.unsafe.types.UTF8String.fromString("a b c d e f g h i j k l"), 3, 8)
      .toLongArray().toSeq
    assert(wn == expect && wn.nonEmpty)
  }

  test("non-literal tuning params are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_minhash('x', cast(rand()*3 as int), 32)").collect()
    }
    assert(e.getMessage.contains("INT literal"))
  }
}
