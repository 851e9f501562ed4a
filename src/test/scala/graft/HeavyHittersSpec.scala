package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions
import graft.operators.HeavyHitters

/** Laws for the Misra-Gries sketch and the two-pass exact heavy hitters.
  * The fixture's 31-token vocabulary fits the sketch whole, so the
  * adversarial cases here build corpora where capacity << distinct and the
  * decrement/merge machinery actually fires.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** `nHot` hot tokens at `hotFreq` occurrences each, drowned in `nNoise`
    * distinct singleton tokens, shuffled deterministically so hot runs
    * interleave with noise (the decrement-all path fires constantly).
    */
  private def adversarial(nHot: Int, hotFreq: Int, nNoise: Int) = {
    val hot = (0 until nHot).flatMap(i => Seq.fill(hotFreq)(s"hot_$i"))
    val noise = (0 until nNoise).map(i => s"noise_$i")
    val toks = (hot ++ noise).sortBy(t => (t.hashCode * 2654435761L) & 0xffffffffL)
    // pack 50 tokens per "document" so the corpus shape matches the operator
    toks.grouped(50).map(_.mkString(" ")).zipWithIndex.toSeq
      .toDF("text", "doc_id")
  }

  test("MG guarantee: every token above n/(capacity+1) survives the sketch, under any partitioning") {
    val docs = adversarial(nHot = 5, hotFreq = 400, nNoise = 3000).repartition(7)
    val n = 5 * 400 + 3000 // 5000 tokens; capacity 19 -> error bound n/20 = 250 < 400
    val sk = HeavyHitters.candidates(docs, "text", capacity = 19)
    val kept = sk.select("tok").as[String].collect().toSet
    assert(sk.select(max("n")).as[Long].head() === n.toLong)
    (0 until 5).foreach(i => assert(kept.contains(s"hot_$i"), s"hot_$i above n/20 missing"))
    assert(sk.count() <= 19, "sketch exceeded its capacity")
    // and the residual counts are lower bounds undercounting by <= n/(cap+1)
    val lbs = sk.filter(col("tok").startsWith("hot_")).select("lb").as[Long].collect()
    assert(lbs.forall(lb => lb <= 400 && lb >= 400 - n / 20))
  }

  test("two-pass heavy hitters == exact groupBy threshold on an adversarial corpus, any partitioning") {
    val docs = adversarial(nHot = 8, hotFreq = 300, nNoise = 2000)
    def exact(k: Int): Set[(String, Long)] = {
      val tk = docs.select(explode(split(col("text"), " ")).as("tok"))
      val n = tk.count()
      tk.groupBy("tok").count().filter(col("count") * k > n)
        .select(col("tok"), col("count")).as[(String, Long)].collect().toSet
    }
    for (parts <- Seq(1, 13); k <- Seq(10, 40)) {
      val got = HeavyHitters
        .heavyHitters(docs.repartition(parts), "text", k = k)
        .select(col("tok"), col("freq")).as[(String, Long)].collect().toSet
      assert(got === exact(k), s"mismatch at parts=$parts k=$k")
    }
  }

  test("merge path preserves the guarantee: single-partition == multi-partition candidate supersets") {
    val docs = adversarial(nHot = 3, hotFreq = 500, nNoise = 1500)
    val hot = Set("hot_0", "hot_1", "hot_2")
    for (parts <- Seq(1, 4, 16)) {
      val kept = HeavyHitters
        .candidates(docs.repartition(parts), "text", capacity = 15)
        .select("tok").as[String].collect().toSet
      assert(hot.subsetOf(kept), s"merge at parts=$parts lost a guaranteed token")
    }
  }

  test("capacity below the threshold index fails loudly instead of silently missing hitters") {
    val docs = adversarial(2, 10, 10)
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(docs, "text", k = 64, capacity = 32)
    }
  }

  test("misra_gries aggregate output is deterministically ordered (lb desc, tok asc)") {
    val docs = Seq((0, "b b b a a c")).toDF("doc_id", "text")
    val out = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .agg(GraftExpressions.misra_gries(col("tok"), 10).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.tok"), col("e.lb")).as[(String, Long)].collect().toSeq
    assert(out === Seq(("b", 3L), ("a", 2L), ("c", 1L)))
  }

  test("physical plan: pass-2 candidate join broadcasts; no sort over the corpus") {
    val plan = HeavyHitters
      .heavyHitters(spark.read.parquet(s"$Sf001/documents.parquet"), "text", k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
