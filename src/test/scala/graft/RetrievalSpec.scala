package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Ranking laws for the integer-BM25 retrieval operator — each law pins a
  * property the fixed-point arithmetic must not break (tf saturation
  * direction, idf ordering, length normalization), plus the partition
  * invariance that proves the integer sum is order-free.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // controlled corpus: equal-length docs built from filler + planted terms
  private def corpus(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  private def pad(planted: String, len: Int): String = {
    val toks = planted.split(" ").filter(_.nonEmpty)
    (toks ++ Seq.fill(len - toks.length)("filler")).mkString(" ")
  }

  test("tf monotonicity: more occurrences of the query term rank higher at equal length") {
    val docs = corpus(
      0L -> pad("rare rare rare", 20),
      1L -> pad("rare rare", 20),
      2L -> pad("rare", 20),
      3L -> pad("", 20)
    )
    val got = Retrieval.bm25TopK(docs, "text", Seq("rare"), 10)
      .select("rnk", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 1L), (3L, 2L))) // doc 3 has no term -> absent
  }

  test("idf ordering: matching a rarer term outranks matching a common one (equal tf, dl)") {
    val fill = (0 until 20).map(i => (100L + i, pad("common", 20)))
    val docs = corpus((Seq(0L -> pad("rare", 20), 1L -> pad("common", 20)) ++ fill): _*)
    val top = Retrieval.bm25TopK(docs, "text", Seq("rare", "common"), 1)
      .select("doc_id").as[Long].head()
    assert(top === 0L)
  }

  test("length normalization: same tf, shorter doc ranks higher") {
    val docs = corpus(
      0L -> pad("rare rare", 60),
      1L -> pad("rare rare", 12),
      2L -> pad("", 30)
    )
    val got = Retrieval.bm25TopK(docs, "text", Seq("rare"), 10)
      .select("rnk", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 0L)))
  }

  test("integer score sum is partition-invariant (order-free arithmetic)") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val q = Seq("dup", "vector", "merge")
    val a = Retrieval.bm25ScoreAgainst(docs.repartition(1), Retrieval.bm25Model(docs, "text", q), "text")
      .as[(Long, Long)].collect().toMap
    val b = Retrieval.bm25ScoreAgainst(docs.repartition(17), Retrieval.bm25Model(docs.repartition(5), "text", q), "text")
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("model frame is bounded by the query vocabulary and carries global stats") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val m = Retrieval.bm25Model(docs, "text", Seq("dup", "vector", "nonexistent_term"))
      .collect()
    assert(m.length <= 3)
    val n = m.head.getAs[Long]("n")
    assert(n === docs.count())
    assert(m.map(_.getAs[Long]("avgdl_m")).distinct.length === 1)
  }

  test("empty query fails loudly") {
    val docs = corpus(0L -> "a b c")
    intercept[IllegalArgumentException] {
      Retrieval.bm25Model(docs, "text", Seq.empty)
    }
  }

  test("physical plan: model join broadcasts, top-k is a TakeOrdered, no sort-merge join") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val plan = Retrieval.bm25TopK(docs, "text", Seq("dup", "vector"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortMergeJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
