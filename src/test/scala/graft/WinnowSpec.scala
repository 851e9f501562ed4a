package graft

import org.apache.spark.sql.functions._

import graft.functions.{Kernels, TextFunctions}
import graft.operators.Dedup

/** Winnowing fingerprints: the codegen kernel against a plain-Scala
  * reimplementation, the t = w + k − 1 match guarantee, and the MOSS-style
  * pair detector's recall/df-cap behavior.
  */
class WinnowSpec extends SparkSpec {
  private val K = 3
  private val W = 8

  /** Independent reimplementation of [[Kernels.winnow]]: positional
    * shingle hashes via string building + polyHash, window minima via
    * slice().min, first-occurrence dedup. Deliberately the naive O(n·w)
    * form the kernel's deque replaces.
    */
  private def winnowRef(text: String, k: Int, w: Int): Seq[Long] = {
    val toks = text.split(" ", -1)
    val last = math.max(toks.length - k, 0)
    val hashes = (0 to last).map { i =>
      Kernels.polyHash(toks.slice(i, math.min(i + k, toks.length)).mkString(" "))
    }
    val we = math.min(w, hashes.length)
    (0 to hashes.length - we).map(j => hashes.slice(j, j + we).min).distinct
  }

  test("kernel == naive reimplementation on every fixture document") {
    import spark.implicits._
    val rows = sources.Tables
      .load(spark, Sf0001, "documents")
      .select(col("text"), TextFunctions.winnow(col("text"), K, W).as("fp"))
      .as[(String, Seq[Long])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (text, got) =>
      assert(got === winnowRef(text, K, W), s"mismatch on: ${text.take(60)}")
    }
  }

  test("kernel edge cases: empty text, single token, text shorter than a window") {
    for (t <- Seq("", "one", "a b", "a b c d e")) {
      val got = Kernels.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), K, W
      ).toLongArray().toSeq
      assert(got === winnowRef(t, K, W), s"mismatch on '$t'")
    }
  }

  test("guarantee: docs sharing a run of w + k - 1 tokens share a fingerprint") {
    // shared run of exactly W + K - 1 = 10 tokens embedded in otherwise
    // disjoint documents -> one full window lies inside the run in both
    val run = (1 to (W + K - 1)).map(i => s"shared$i").mkString(" ")
    val a = s"alpha beta gamma delta $run epsilon zeta"
    val b = s"one two three four five six $run seven eight nine ten"
    val fa = winnowRef(a, K, W).toSet
    val fb = winnowRef(b, K, W).toSet
    assert(fa.intersect(fb).nonEmpty)
    // and the kernel agrees with itself through the Spark column path
    import spark.implicits._
    val shared = Dedup
      .winnowedPairs(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
        k = K, w = W, minShared = 1, maxDf = 10
      )
      .collect()
    assert(shared.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("df cap drops corpus-wide boilerplate buckets from the pair join") {
    import spark.implicits._
    // 30 docs, all opening with the same 12-token boilerplate, bodies unique
    val boiler = (1 to 12).map(i => s"legal$i").mkString(" ")
    val docs = (1 to 30)
      .map(d => (d.toLong, s"$boiler " + (1 to 40).map(i => s"u${d}x$i").mkString(" ")))
      .toDF("doc_id", "text")
    // pure-boilerplate windows yield identical minima in every doc
    // (df = 30): uncapped, those buckets alone pair every doc with every
    // other. Capped at 10 they vanish; what survives are boundary-window
    // minima — a boilerplate hash beats SOME docs' unique body hashes
    // (df <= 10) — which is exactly why production pairing also asks for
    // minShared >= 2.
    val uncapped = Dedup.winnowedPairs(docs, k = K, w = W, minShared = 1, maxDf = 30).count()
    val capped = Dedup.winnowedPairs(docs, k = K, w = W, minShared = 1, maxDf = 10).count()
    assert(uncapped === 435L, "df=30 boilerplate buckets pair all 30*29/2 docs")
    assert(capped < 100L, s"cap leaves only boundary noise, got $capped")
  }

  test("empty corpus yields no pairs and flags nothing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.winnowedPairs(empty).count() === 0L)
    val arrival = Seq((1L, "entirely new text")).toDF("doc_id", "text")
    assert(streaming.StreamingOps.copyDetectAgainst(empty, arrival).count() === 0L)
  }

  test("copy pairs cluster transitively through the generic clustersFromPairs") {
    import spark.implicits._
    // A shares para1 with B, B shares para2 with C, A and C share nothing
    // directly -> the pair graph is a chain and the component is {A, B, C}
    val para1 = (1 to 25).map(i => s"p1x$i").mkString(" ")
    val para2 = (1 to 25).map(i => s"p2x$i").mkString(" ")
    val docs = Seq(
      (1L, (1 to 60).map(i => s"a$i").mkString(" ") + " " + para1),
      (2L, para1 + " " + (1 to 40).map(i => s"b$i").mkString(" ") + " " + para2),
      (3L, para2 + " " + (1 to 60).map(i => s"c$i").mkString(" ")),
      (4L, (1 to 60).map(i => s"d$i").mkString(" ")) // unrelated singleton
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(docs, k = K, w = W, minShared = 2, maxDf = 3)
    val labels = Dedup
      .clustersFromPairs(docs, pairs)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(labels(1L) === 1L && labels(2L) === 1L && labels(3L) === 1L, s"chain collapses: $labels")
    assert(labels(4L) === 4L, "unrelated doc stays a singleton")
  }

  test("copied paragraph is found even when overall similarity is low") {
    import spark.implicits._
    val para = (1 to 30).map(i => s"quoted$i").mkString(" ")
    // 200-token documents sharing only the 30-token paragraph (~15% overlap
    // -> far below any whole-doc near-dup threshold)
    val a = (1 to 170).map(i => s"a$i").mkString(" ") + " " + para
    val b = para + " " + (1 to 170).map(i => s"b$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(docs, k = K, w = W, minShared = 2, maxDf = 10).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(2) >= 2L, "multiple shared fingerprints from one paragraph")
  }
}
