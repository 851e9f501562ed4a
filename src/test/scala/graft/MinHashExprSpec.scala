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

  test("positional shingle kernels == the HOF composition they replace") {
    import spark.implicits._
    // the r06 kernels must be drop-in: window strings and hashes equal the
    // transform/sequence/slice pipeline (the oracle mirrors THAT shape) on
    // empties, sub-k docs, double spaces, unicode, and a long random doc
    val rnd = new scala.util.Random(7)
    val texts = Seq(
      "", "one", "two tokens", "a  b", "café 中文 😀 x y z",
      (0 until 500).map(_ => s"t${rnd.nextInt(9)}").mkString(" ")
    )
    for (k <- Seq(1, 2, 4, 8)) {
      def hofShingles(text: org.apache.spark.sql.Column) = {
        val t = split(text, " ")
        transform(
          sequence(lit(0), greatest(size(t) - lit(k), lit(0))),
          i => concat_ws(" ", slice(t, i + lit(1), lit(k)))
        )
      }
      val both = texts.toDF("text").select(
        TextFunctions.positionalShingles(col("text"), k).as("kern"),
        hofShingles(col("text")).as("hof"),
        TextFunctions.positionalShingleHashes(col("text"), k).as("kern_h"),
        transform(hofShingles(col("text")), s => GraftExpressions.poly_hash(s)).as("hof_h")
      )
      assert(both.filter(col("kern") =!= col("hof")).count() === 0L, s"k=$k strings diverge")
      assert(both.filter(col("kern_h") =!= col("hof_h")).count() === 0L, s"k=$k hashes diverge")
    }
  }

  test("normalize_text: whitespace collapse, edge trim, NFC composition") {
    import spark.implicits._
    val decomposed = "cafe\u0301  x" // e + combining acute, double space
    val crafted = Seq(
      (1L, " a\t\tb\r\nc "),
      (2L, decomposed),
      (3L, ""),
      (4L, "already clean")
    ).toDF("doc_id", "text")
    val got = crafted
      .orderBy("doc_id")
      .select(GraftExpressions.normalize_text(col("text")))
      .as[String]
      .collect()
    assert(got(0) === "a b c")
    assert(got(1) === "caf\u00e9 x") // precomposed e-acute, single space
    assert(got(2) === "")
    assert(got(3) === "already clean")
  }

  test("chunks kernel == the HOF tiling it replaces") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val texts = Seq(
      "", "one", "two tokens", "a  b",
      (0 until 300).map(_ => s"t${rnd.nextInt(9)}").mkString(" ")
    )
    for ((size0, overlap) <- Seq((5, 0), (64, 8), (3, 2))) {
      val step = size0 - overlap
      def hofChunks(text: org.apache.spark.sql.Column) = {
        val t = split(text, " ")
        val nChunks = ceil(size(t).cast("double") / lit(step.toDouble)).cast("int")
        transform(
          sequence(lit(0), greatest(nChunks - lit(1), lit(0))),
          i => concat_ws(" ", slice(t, i * lit(step) + lit(1), lit(size0)))
        )
      }
      val both = texts.toDF("text").select(
        TextFunctions.chunks(col("text"), size0, overlap).as("kern"),
        hofChunks(col("text")).as("hof")
      )
      assert(
        both.filter(col("kern") =!= col("hof")).count() === 0L,
        s"chunkSize=$size0 overlap=$overlap tiling diverges"
      )
    }
  }
}
