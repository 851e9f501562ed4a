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

  // ------------------------------------------------------------ inverted index

  test("inverted index: postings sorted, arrays aligned, df = |postings|, token mass conserved") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val idx = Retrieval.invertedIndex(docs).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val ids = r.getAs[collection.Seq[Long]]("doc_ids")
      val tfs = r.getAs[collection.Seq[Long]]("tfs")
      assert(ids === ids.sorted, s"postings unsorted for ${r.getAs[String]("tok")}")
      assert(ids.length === tfs.length)
      assert(r.getAs[Long]("df") === ids.length.toLong)
      assert(ids.distinct.length === ids.length, "duplicate doc in posting list")
    }
    // every token occurrence is accounted for exactly once across the index
    val indexMass = idx.map(_.getAs[collection.Seq[Long]]("tfs").sum).sum
    val corpusMass = docs
      .select(sum(size(split(col("text"), " "))).cast("long"))
      .head().getLong(0)
    assert(indexMass === corpusMass)
  }

  test("inverted index: maxDf caps the hot terms and drops nothing else") {
    val docs = corpus(
      0L -> "hot a",
      1L -> "hot b",
      2L -> "hot a",
      3L -> "hot c"
    )
    val full = Retrieval.invertedIndex(docs).collect().map(_.getAs[String]("tok")).toSet
    val capped = Retrieval.invertedIndex(docs, maxDf = 3).collect().map(_.getAs[String]("tok")).toSet
    assert(full === Set("hot", "a", "b", "c"))
    assert(capped === Set("a", "b", "c")) // df(hot)=4 > 3; df(a)=2 survives
  }

  test("blocked index flattens back to the plain index (block order refines doc order)") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val plain = Retrieval.invertedIndex(docs)
      .select(col("tok"), col("doc_ids"), col("tfs"))
      .as[(String, Seq[Long], Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val blocked = Retrieval.invertedIndexBlocked(docs, blockDocs = 64)
      .orderBy(col("tok"), col("block"))
      .select(col("tok"), col("block"), col("doc_ids"), col("tfs"))
      .as[(String, Long, Seq[Long], Seq[Long])].collect()
    // no row exceeds the block bound
    assert(blocked.forall(_._3.length <= 64))
    val flat = blocked.groupBy(_._1).map { case (tok, rows) =>
      val sorted = rows.sortBy(_._2)
      tok -> (sorted.flatMap(_._3).toSeq, sorted.flatMap(_._4).toSeq)
    }
    assert(flat === plain)
  }

  test("searchAll == direct containment filter, and handles duplicate query terms") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val terms = Seq("dup", "vector", "merge")
    val idx = Retrieval.invertedIndex(docs)
    val got = Retrieval.searchAll(idx, terms ++ Seq("dup")) // dup twice: must not double-require
      .as[(Long, Long)].collect().toMap
    val toks = split(col("text"), " ")
    val want = docs
      .filter(terms.map(t => array_contains(toks, t)).reduce(_ && _))
      .select(
        col("doc_id"),
        terms
          .map(t => size(filter(toks, x => x === lit(t))).cast("long"))
          .reduce(_ + _)
          .as("tf_sum")
      )
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("searchAll: empty query fails loudly; no-hit query returns empty") {
    val idx = Retrieval.invertedIndex(corpus(0L -> "a b"))
    intercept[IllegalArgumentException](Retrieval.searchAll(idx, Seq.empty))
    assert(Retrieval.searchAll(idx, Seq("zz")).count() === 0L)
  }

  test("searchAny / searchBoolean: OR coordination, NOT exclusion, set algebra holds") {
    val docs = corpus(
      0L -> "a b c",
      1L -> "a x y",
      2L -> "b x y",
      3L -> "x y z",
      4L -> "a b z"
    )
    val idx = Retrieval.invertedIndex(docs)
    // OR: any of {a, b} with the coordination count
    val any = Retrieval.searchAny(idx, Seq("a", "b"))
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(any === Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 4L -> 2L))
    // AND-NOT: {a, b} but not z -> doc 0 only (doc 4 has z)
    val bool = Retrieval.searchBoolean(idx, Seq("a", "b"), Seq("z"))
      .select("doc_id").as[Long].collect().toSet
    assert(bool === Set(0L))
    // algebra: searchBoolean(must, Nil) == searchAll(must); AND ⊆ OR
    val andIds = Retrieval.searchAll(idx, Seq("a", "b")).select("doc_id").as[Long].collect().toSet
    assert(Retrieval.searchBoolean(idx, Seq("a", "b")).select("doc_id").as[Long].collect().toSet === andIds)
    assert(andIds.subsetOf(any.keySet))
    intercept[IllegalArgumentException](Retrieval.searchAny(idx, Seq.empty))
  }

  test("searchPhrase: adjacency is strict, overlaps count, repeated terms work, 1-term = tf") {
    val docs = corpus(
      0L -> "x table hash y table hash",  // two matches
      1L -> "table y hash",               // gap -> no match
      2L -> "hash table",                 // wrong order -> no match
      3L -> "a a a",                      // repeated-term phrase territory
      4L -> "table hash"                  // exact doc
    )
    val got = Retrieval.searchPhrase(docs, Seq("table", "hash"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 2L, 4L -> 1L))
    // overlapping matches of a repeated-term phrase: "a a" in "a a a"
    // starts at positions 0 and 1
    val rep = Retrieval.searchPhrase(docs, Seq("a", "a")).as[(Long, Long)].collect().toMap
    assert(rep === Map(3L -> 2L))
    // single-term phrase degenerates to the term count
    val single = Retrieval.searchPhrase(docs, Seq("table")).as[(Long, Long)].collect().toMap
    assert(single === Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 4L -> 1L))
    intercept[IllegalArgumentException](Retrieval.searchPhrase(docs, Seq.empty))
  }

  test("mergeIndexes over disjoint parts == the full rebuild; degenerate cases hold") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select("tok", "df", "doc_ids", "tfs")
        .as[(String, Long, Seq[Long], Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val full = flat(Retrieval.invertedIndex(docs))
    // three-way split on an arbitrary hash of the id
    val parts = (0 until 3).map(i =>
      Retrieval.invertedIndex(docs.filter(pmod(col("doc_id") * 2654435761L, lit(3)) === i))
    )
    assert(flat(Retrieval.mergeIndexes(parts: _*)) === full)
    // single part is the identity; empty part list fails loudly
    assert(flat(Retrieval.mergeIndexes(Retrieval.invertedIndex(docs))) === full)
    intercept[IllegalArgumentException](Retrieval.mergeIndexes())
  }

  test("positional index: positions sorted and tf-consistent; indexed phrase == direct scan") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val pidx = Retrieval.invertedIndexPositional(docs)
    val tfByTokDoc = Retrieval.invertedIndex(docs)
      .select(col("tok"), explode(arrays_zip(col("doc_ids"), col("tfs"))).as("h"))
      .select(col("tok"), col("h.doc_ids").as("doc_id"), col("h.tfs").as("tf"))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pidx.collect().foreach { r =>
      val tok = r.getAs[String]("tok")
      val ids = r.getAs[collection.Seq[Long]]("doc_ids")
      val pos = r.getAs[collection.Seq[collection.Seq[Long]]]("positions")
      assert(ids.length === pos.length)
      ids.zip(pos).foreach { case (d, ps) =>
        assert(ps === ps.sorted)
        assert(ps.length.toLong === tfByTokDoc((tok, d)), s"positions vs tf for ($tok, $d)")
      }
    }
    // indexed phrase search == the direct corpus scan, for several phrases
    for (phrase <- Seq(Seq("table", "hash"), Seq("merge", "group"), Seq("table"))) {
      val direct = Retrieval.searchPhrase(docs, phrase).as[(Long, Long)].collect().toMap
      val indexed = Retrieval.searchPhraseIndexed(pidx, phrase).as[(Long, Long)].collect().toMap
      assert(indexed === direct, s"phrase $phrase")
    }
    intercept[IllegalArgumentException](Retrieval.searchPhraseIndexed(pidx, Seq.empty))
  }

  test("bm25TopKIndexed over (index, norms) artifacts == bm25TopK direct, bit-for-bit") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val idx = Retrieval.invertedIndex(docs)
    val dls = Retrieval.docLengths(docs)
    for (q <- Seq(Seq("dup", "vector", "merge"), Seq("table"), Seq("dup", "dup", "vector"))) {
      val direct = Retrieval.bm25TopK(docs, "text", q, 10).as[(Long, Long, Long)].collect().toSeq
      val served = Retrieval.bm25TopKIndexed(idx, dls, q, 10).as[(Long, Long, Long)].collect().toSeq
      assert(served === direct, s"query $q")
    }
    intercept[IllegalArgumentException](Retrieval.bm25TopKIndexed(idx, dls, Seq.empty, 5))
  }

  test("searchNear: controlled distances; indexed == direct; slop=0 is phrase-union, slop=max is AND") {
    val docs = corpus(
      0L -> "a b c", // dist 1 (ordered adjacent)
      1L -> "a c c b", // dist 3
      2L -> "b x a", // dist 2 (reversed)
      3L -> "a a a", // no b — never matches
      4L -> "b a" // dist 1 (reversed adjacent)
    )
    assert(
      Retrieval.searchNear(docs, "a", "b", 0L).as[(Long, Long)].collect().toMap
        === Map(0L -> 1L, 4L -> 1L)
    )
    assert(
      Retrieval.searchNear(docs, "a", "b", 2L).as[(Long, Long)].collect().toMap
        === Map(0L -> 1L, 1L -> 3L, 2L -> 2L, 4L -> 1L)
    )
    val pidx = Retrieval.invertedIndexPositional(docs)
    for (slop <- Seq(0L, 1L, 2L, Long.MaxValue)) {
      val d = Retrieval.searchNear(docs, "a", "b", slop).as[(Long, Long)].collect().toMap
      val i = Retrieval.searchNearIndexed(pidx, "a", "b", slop).as[(Long, Long)].collect().toMap
      assert(i === d, s"slop $slop")
    }
    // boundary law 1: slop=0 doc set == phrase "a b" ∪ phrase "b a"
    val adj = Retrieval.searchNear(docs, "a", "b", 0L).select("doc_id").as[Long].collect().toSet
    val ph = Retrieval.searchPhrase(docs, Seq("a", "b")).select("doc_id").as[Long].collect().toSet ++
      Retrieval.searchPhrase(docs, Seq("b", "a")).select("doc_id").as[Long].collect().toSet
    assert(adj === ph)
    // boundary law 2: slop=MaxValue doc set == conjunctive AND (both present)
    val win = Retrieval
      .searchNear(docs, "a", "b", Long.MaxValue).select("doc_id").as[Long].collect().toSet
    val and = Retrieval
      .searchAll(Retrieval.invertedIndex(docs), Seq("a", "b"))
      .select("doc_id").as[Long].collect().toSet
    assert(win === and)
    // and the same three laws on the real fixture corpus
    val real = spark.read.parquet(s"$Sf001/documents.parquet")
    val realIdx = Retrieval.invertedIndexPositional(real)
    for (slop <- Seq(0L, 3L, Long.MaxValue)) {
      val d = Retrieval.searchNear(real, "table", "vector", slop).as[(Long, Long)].collect().toMap
      val i = Retrieval.searchNearIndexed(realIdx, "table", "vector", slop)
        .as[(Long, Long)].collect().toMap
      assert(i === d, s"fixture slop $slop")
    }
    intercept[IllegalArgumentException](Retrieval.searchNear(docs, "a", "a", 1L))
    intercept[IllegalArgumentException](Retrieval.searchNear(docs, "a", "b", -1L))
  }

  test("searchPrefix: == searchAny over the matched dictionary range; pushdown serves the artifact") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val idx = Retrieval.invertedIndex(docs)
    val matched = idx
      .filter(col("tok").startsWith("s"))
      .select("tok").as[String].collect().toSeq.sorted
    assert(matched.nonEmpty && matched.forall(_.startsWith("s")))
    // coordination + mass == searchAny restricted to exactly those terms
    def keyed(rows: Array[(Long, Long, Long)]) = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    val viaAny = keyed(
      Retrieval.searchAny(idx, matched)
        .select("doc_id", "n_hit", "tf_sum").as[(Long, Long, Long)].collect()
    )
    val viaPrefix = keyed(
      Retrieval.searchPrefix(idx, "s")
        .select("doc_id", "n_terms", "tf_sum").as[(Long, Long, Long)].collect()
    )
    assert(viaPrefix === viaAny)
    // served from a parquet artifact the predicate reaches the SCAN:
    // StartsWith appears in the pushed filters, so only the prefix's
    // dictionary range is read
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-prefix").toString
    idx.write.mode("overwrite").parquet(dir)
    val plan = Retrieval
      .searchPrefix(spark.read.parquet(dir), "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith"), s"prefix not pushed:\n${plan.take(1500)}")
    intercept[IllegalArgumentException](Retrieval.searchPrefix(idx, ""))
  }

  test("mergeIndexes repairs text-partitioned docs (tf sums, df does not inflate); cap re-applies") {
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select("tok", "df", "doc_ids", "tfs")
        .as[(String, Long, Seq[Long], Seq[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 0's text arrives split across two parts: the merged index must
    // equal indexing the whole text (tf sums per (tok, doc); df = 1)
    val partA = Retrieval.invertedIndex(corpus(0L -> "x y", 1L -> "x z"))
    val partB = Retrieval.invertedIndex(corpus(0L -> "x"))
    val full = Retrieval.invertedIndex(corpus(0L -> "x y x", 1L -> "x z"))
    assert(flat(Retrieval.mergeIndexes(partA, partB)) === flat(full))
    // the df cap is an argument of the MERGE, never inherited: x (df 2)
    // is dropped at maxDf=1, y and z survive
    val capped = flat(Retrieval.mergeIndexesCapped(1L, partA, partB))
    assert(capped.keySet === Set("y", "z"))
    intercept[IllegalArgumentException](Retrieval.mergeIndexesCapped(0L, partA))
  }

  test("physical plan: index build and search are aggregate-only — no window, no cartesian") {
    val docs = spark.read.parquet(s"$Sf001/documents.parquet")
    val build = Retrieval.invertedIndex(docs).queryExecution.executedPlan.toString
    assert(!build.contains("Window"))
    assert(!build.contains("CartesianProduct"))
    assert(!build.contains("BroadcastNestedLoopJoin"))
    val search = Retrieval.searchAll(Retrieval.invertedIndex(docs), Seq("dup", "merge"))
      .queryExecution.executedPlan.toString
    assert(!search.contains("Window"))
    assert(!search.contains("CartesianProduct"))
    assert(!search.contains("BroadcastNestedLoopJoin"))
    // indexed BM25: the postings side broadcasts onto the norms join (the
    // only corpus-sized frame scans once, shuffle-free before its agg)
    val bm25 = Retrieval
      .bm25TopKIndexed(
        Retrieval.invertedIndex(docs),
        Retrieval.docLengths(docs),
        Seq("dup", "merge"),
        10
      )
      .queryExecution.executedPlan.toString
    assert(bm25.contains("BroadcastHashJoin"))
    assert(!bm25.contains("SortMergeJoin"))
    assert(!bm25.contains("CartesianProduct"))
    // NEAR: per-doc pairing is an equi-join on doc_id — never cartesian
    val near = Retrieval
      .searchNearIndexed(Retrieval.invertedIndexPositional(docs), "table", "vector", 3L)
      .queryExecution.executedPlan.toString
    assert(!near.contains("CartesianProduct"))
    assert(!near.contains("BroadcastNestedLoopJoin"))
    assert(!near.contains("Window"))
  }

  test("batch BM25 == single-query bm25TopKIndexed, query by query; tfidf hand-check") {
    val docs = sources.Tables.load(spark, Sf001, "documents").select("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs)
    val dls = Retrieval.docLengths(docs)
    val queries = Seq(
      (1L, Seq("dup", "vector")),
      (2L, Seq("merge")),
      (3L, Seq("dup", "vector", "merge")),
      (4L, Seq("zzz_nothing_matches"))
    ).toDF("query_id", "terms")
    val batch = Retrieval
      .bm25TopKIndexedBatch(idx, dls, queries, 10)
      .as[(Long, Long, Long, Long)]
      .collect()
      .groupBy(_._1)
    // the batch shape changes the PLAN, not the arithmetic
    Seq(1L -> Seq("dup", "vector"), 2L -> Seq("merge"), 3L -> Seq("dup", "vector", "merge"))
      .foreach { case (qid, terms) =>
        val single = Retrieval
          .bm25TopKIndexed(idx, dls, terms, 10)
          .select(col("rnk"), col("doc_id"), col("score"))
          .as[(Long, Long, Long)]
          .collect()
          .toSeq
          .sortBy(_._1)
        assert(batch(qid).map(r => (r._2, r._3, r._4)).toSeq.sortBy(_._1) === single, s"q$qid")
      }
    // a query matching nothing produces no rows, not an error
    assert(!batch.contains(4L))
    // tfidf hand-check on a crafted corpus: equal-idf single term ranks
    // by raw tf (ltn has no length dampening), score == tf * idf_u
    val crafted = Seq(
      (1L, "apple apple apple filler"),
      (2L, "apple pear filler words here"),
      (3L, "pear pear filler")
    ).toDF("doc_id", "text")
    val got = Retrieval
      .tfidfTopKIndexed(
        Retrieval.invertedIndex(crafted),
        Retrieval.docLengths(crafted),
        Seq("apple"),
        10
      )
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
      .sortBy(_._1)
    val idf = (3L - 2L) * 1000000L / (2L + 1L) // n=3, df=2
    assert(got === Seq((1L, 1L, 3L * idf), (2L, 2L, 1L * idf)))
  }

  test("rankMetrics: hand-checked values, perfect-run law, no-hit zeros") {
    // q1: hits at ranks 1,3 of 5 returned; truth = {10,11,12,13} (4 rel)
    //   prec@5 = 2*1000 div 5 = 400; rec = 2*1000 div 4 = 500
    //   rr = 1e6 div 1 = 1000000
    //   ap = (1*1e6 div 1 + 2*1e6 div 3) div 4 = (1000000 + 666666) div 4 = 416666
    //   ndcg: dcg = lut(1)+lut(3) = 1000000+500000; idcg = prefix(4) =
    //   2561607; 1500000*1e6 div 2561607 = 585569
    // q2: zero hits; q3: only in truth (excluded — run defines the set)
    val run = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 11L, 3L), (1L, 98L, 4L), (1L, 97L, 5L),
      (2L, 50L, 1L), (2L, 51L, 2L)
    ).toDF("query_id", "neighbor_id", "rnk")
    val truth = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 60L),
      (3L, 70L)
    ).toDF("query_id", "neighbor_id")
    val got = Retrieval
      .rankMetrics(run, truth, 5)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(got === Seq(
      (1L, 5L, 4L, 2L, 400L, 500L, 1000000L, 416666L, 585569L),
      (2L, 2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)
    ))
    // the LUT itself: round(1e6/log2(r+1)), exactly these literals
    assert(Retrieval.ndcgGainLut(5) === Seq(1000000L, 630930L, 500000L, 430677L, 386853L))
    assert(Retrieval.ndcgIdcgLut(4).last === 2561607L)
    // perfect-run law: any run scored against itself at its own k is
    // perfect — prec == rec == 1000, rr == ap == ndcg == 1e6 (dcg ==
    // idcg cancels the LUT entirely)
    val self = Retrieval
      .rankMetrics(run.filter(col("query_id") === 1L), run.filter(col("query_id") === 1L), 5)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()
    assert(self === ((1L, 5L, 5L, 5L, 1000L, 1000L, 1000000L, 1000000L, 1000000L)))
    // k cuts the run before anything is counted: at k=1 only rank 1 plays
    // (ndcg: dcg = lut(1), idcg = prefix(least(4,1)) = lut(1) -> 1e6)
    val cut = Retrieval
      .rankMetrics(run, truth, 1)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .sortBy(_._1)
    assert(cut.head === ((1L, 1L, 4L, 1L, 1000L, 250L, 1000000L, 250000L, 1000000L)))
    intercept[IllegalArgumentException](Retrieval.rankMetrics(run, truth, 0))
  }
}
