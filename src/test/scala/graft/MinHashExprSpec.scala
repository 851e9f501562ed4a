package graft

import graft.functions.{GraftExpressions, TextFunctions}
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The fused ShingleMinHash kernel must reproduce, bit for bit, the
  * composable HOF pipeline it replaced (shingles via array ops, signature
  * via transform/array_min) — the HOF forms below are the round-1
  * reference semantics kept alive purely as a test oracle.
  */
class MinHashExprSpec extends SparkSpec {

  /** Round-1 HOF signature (graft r01 Dedup.minhashSignature). */
  private def hofSignature(shingleHashCol: Column): Column =
    transform(
      sequence(lit(0), lit(Dedup.NumHashes - 1)),
      i => {
        val a = i.cast("long") * lit(2L) + lit(1L)
        val b = (i.cast("long") * i.cast("long") * lit(31L) + lit(7L)) % lit(Dedup.P)
        array_min(transform(shingleHashCol, h => (h * a + b) % lit(Dedup.P)))
      }
    )

  test("fused kernel == HOF pipeline on fixture documents (shingles and signature)") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val both = docs.select(
      GraftExpressions.shingle_minhash(col("text"), Dedup.ShingleK, Dedup.NumHashes).as("sm"),
      array_distinct(TextFunctions.shingleHashes(col("text"), Dedup.ShingleK)).as("hof_sh"),
      hofSignature(TextFunctions.shingleHashes(col("text"), Dedup.ShingleK)).as("hof_sig")
    )
    assert(both.filter(col("sm.sh") =!= col("hof_sh")).count() == 0, "distinct shingle-hash arrays agree")
    assert(both.filter(col("sm.sig") =!= col("hof_sig")).count() == 0, "signatures agree")
  }

  test("edge cases: empty string, single token, text shorter than k") {
    import spark.implicits._
    val df = Seq((0L, ""), (1L, "one"), (2L, "two tokens"), (3L, "a  b"))
      .toDF("doc_id", "text")
    val both = df.select(
      GraftExpressions.shingle_minhash(col("text"), Dedup.ShingleK, Dedup.NumHashes).as("sm"),
      array_distinct(TextFunctions.shingleHashes(col("text"), Dedup.ShingleK)).as("hof_sh"),
      hofSignature(TextFunctions.shingleHashes(col("text"), Dedup.ShingleK)).as("hof_sig")
    )
    assert(both.filter(col("sm.sh") =!= col("hof_sh")).count() == 0)
    assert(both.filter(col("sm.sig") =!= col("hof_sig")).count() == 0)
  }

  test("poly_hash matches the kernel on multi-codepoint text") {
    import spark.implicits._
    val texts = Seq("hello", "", "café 中文 😀", "a b  c")
    val df = texts.toDF("t")
    val got = df.select(GraftExpressions.poly_hash(col("t"))).as[Long].collect()
    val exp = texts.map(graft.functions.Kernels.polyHash)
    assert(got.toSeq == exp)
  }
}
