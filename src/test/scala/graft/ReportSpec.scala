package graft

import org.apache.spark.sql.functions._

import graft.operators.Report

/** Laws for the reporting operators: the corpus card must CONSERVE the
  * totals it summarizes (a datasheet that disagrees with its corpus is
  * worse than none), and the snapshot diff must partition the id
  * universe with the symmetry a diff owes its reader.
  */
class ReportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = sources.Tables.load(spark, Sf001, "documents")

  test("corpusCard conserves corpus totals and derives integer ratios") {
    val card = Report.corpusCard(docs).collect()
    assert(card.nonEmpty)
    val (nDocs, nTok, nChr) = docs
      .select(
        count(lit(1)),
        sum(size(split(col("text"), " "))).cast("long"),
        sum(length(col("text"))).cast("long")
      )
      .as[(Long, Long, Long)]
      .head()
    assert(card.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(card.map(_.getAs[Long]("n_tokens")).sum === nTok)
    assert(card.map(_.getAs[Long]("n_chars")).sum === nChr)
    card.foreach { r =>
      assert(r.getAs[Long]("mean_tok_milli") ===
        r.getAs[Long]("n_tokens") * 1000L / r.getAs[Long]("n_docs"))
      val dup = r.getAs[Long]("dup_permille")
      assert(dup >= 0L && dup < 1000L)
    }
  }

  test("corpusCard: top_lang is the per-source argmax with the lexical tie-break; dup mass counts") {
    val crafted = Seq(
      // s1: de wins 2-1; s2: en and fr tie at 1 -> 'en' (smaller string)
      (1L, "de", "s1", "a b"),
      (2L, "de", "s1", "c d"),
      (3L, "en", "s1", "e f"),
      (4L, "fr", "s2", "g h"),
      (5L, "en", "s2", "i j"),
      // s3: three docs, two identical -> dup_permille = 333
      (6L, "en", "s3", "same text"),
      (7L, "en", "s3", "same text"),
      (8L, "en", "s3", "other text")
    ).toDF("doc_id", "lang", "source", "text")
    val card = Report
      .corpusCard(crafted)
      .select("source", "top_lang", "dup_permille")
      .as[(String, String, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(card("s1") === (("de", 0L)))
    assert(card("s2") === (("en", 0L)))
    assert(card("s3") === (("en", 333L)))
  }

  test("snapshotDiff laws: identity, disjoint, revision, and direction symmetry") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    // identity: everything unchanged
    assert(
      Report.snapshotDiff(a, a).select("status").as[String].collect().toSet === Set("unchanged")
    )
    // revision + add + remove
    val b = Seq((2L, "two"), (3L, "three REVISED"), (4L, "four")).toDF("doc_id", "text")
    val fwd = Report.snapshotDiff(a, b).as[(Long, String)].collect().toMap
    assert(fwd === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // the reverse diff swaps added/removed and keeps changed/unchanged
    val bwd = Report.snapshotDiff(b, a).as[(Long, String)].collect().toMap
    assert(bwd === Map(1L -> "added", 2L -> "unchanged", 3L -> "changed", 4L -> "removed"))
    // every id in either snapshot appears exactly once
    assert(fwd.keySet === Set(1L, 2L, 3L, 4L))
    // summary rolls up the same rows
    val summary = Report.snapshotDiffSummary(a, b).as[(String, Long)].collect().toMap
    assert(summary === Map("removed" -> 1L, "unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("snapshotDiff: NULL-text documents classify by PRESENCE, not hash nullness (r18 review)") {
    // old: 1 has text, 2 has NULL text, 3 has text
    // new: 1 went NULL (changed), 2 still NULL (unchanged), 4 arrives NULL (added)
    val oldSnap = Seq(
      (1L, Some("one")),
      (2L, Option.empty[String]),
      (3L, Some("three"))
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, Option.empty[String]),
      (2L, Option.empty[String]),
      (4L, Option.empty[String])
    ).toDF("doc_id", "text")
    val got = Report.snapshotDiff(oldSnap, newSnap).as[(Long, String)].collect().toMap
    // the old hash-null form read 1 -> unchanged (NULL ≠ NULL -> NULL ->
    // fall-through), 2 -> added AND removed is impossible but presence
    // came from the hash, and 4 -> nothing distinguishable from absent
    assert(got === Map(1L -> "changed", 2L -> "unchanged", 3L -> "removed", 4L -> "added"))
  }

  test("percentileRanks / keepTopBy: NULL scores raise — never a silent drop or engine-order rank (r18 review)") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val withNull = Seq(
      (1L, "s1", Some(100L)),
      (2L, "s1", Option.empty[Long]),
      (3L, "s1", Some(300L))
    ).toDF("doc_id", "source", "score_micro")
    val e = intercept[Exception](Report.percentileRanks(withNull, "score_micro").collect())
    assert(messages(e).exists(_.contains("NULL score_micro")), s"got: ${messages(e)}")
    val e2 = intercept[Exception](Report.keepTopBy(withNull, "score_micro", 500L).collect())
    assert(messages(e2).exists(_.contains("NULL score_micro")), s"got: ${messages(e2)}")
    // clean frames untouched by the guard
    val clean = withNull.filter(col("score_micro").isNotNull)
    assert(Report.percentileRanks(clean, "score_micro").count() === 2L)
  }

  test("profileTable: exact null/distinct/min/max per column; sketch mode bounded; empty fails") {
    val crafted = Seq(
      (Some(1L), Some("b"), Some(2.5)),
      (Some(1L), None, Some(1.5)),
      (Some(3L), Some("a"), None),
      (None, Some("a"), Some(2.5))
    ).toDF("k", "s", "v")
    val prof = Report.profileTable(crafted).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(prof.keySet === Set("k", "s", "v"))
    prof.values.foreach(r => assert(r.getAs[Long]("n_rows") === 4L))
    assert(prof("k").getAs[Long]("n_nulls") === 1L)
    assert(prof("k").getAs[Long]("n_distinct") === 2L)
    assert(prof("k").getAs[String]("min_val") === "1")
    assert(prof("k").getAs[String]("max_val") === "3")
    assert(prof("s").getAs[Long]("n_distinct") === 2L)
    assert(prof("s").getAs[String]("min_val") === "a")
    assert(prof("v").getAs[Long]("n_nulls") === 1L)
    assert(prof("v").getAs[Long]("n_distinct") === 2L)
    // sketch mode: same report shape, distinct within HLL tolerance
    val approx = Report.profileTable(crafted, exact = false).collect()
      .map(r => r.getAs[String]("column") -> r.getAs[Long]("n_distinct")).toMap
    approx.foreach { case (c, nd) =>
      val ex = prof(c).getAs[Long]("n_distinct")
      assert(math.abs(nd - ex) <= math.max(1L, ex / 5), s"column $c: $nd vs $ex")
    }
    intercept[IllegalArgumentException](
      Report.profileTable(spark.emptyDataFrame)
    )
  }

  test("profileTable: duplicate column names (post-join frames) and map columns profile, not fail") {
    // duplicate names — binding is positional, both occurrences reported
    val l = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val r = Seq((1L, "a"), (2L, "a")).toDF("id", "v")
    val joined = l.join(r, l("id") === r("id")) // columns: id, v, id, v
    val prof = Report.profileTable(joined).collect()
    assert(prof.length === 4)
    assert(prof.map(_.getAs[String]("column")).toSeq.sorted === Seq("id", "id", "v", "v"))
    val vDistinct = prof.filter(_.getAs[String]("column") == "v").map(_.getAs[Long]("n_distinct"))
    assert(vDistinct.sorted.toSeq === Seq(1L, 2L)) // each occurrence profiled separately
    // map columns: null count real, order-dependent stats reported as NULL
    val m = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2))).toDF("id", "mp")
    val mp = Report.profileTable(m).collect().map(r2 => r2.getAs[String]("column") -> r2).toMap
    assert(mp("mp").getAs[Long]("n_nulls") === 0L)
    assert(mp("mp").isNullAt(mp("mp").fieldIndex("n_distinct")))
    assert(mp("mp").isNullAt(mp("mp").fieldIndex("min_val")))
    assert(mp("id").getAs[Long]("n_distinct") === 2L)
  }

  test("plans: card has no corpus window and one scan family; diff is a single equi-join") {
    val card = Report.corpusCard(docs).queryExecution.executedPlan.toString
    assert(!card.contains("Window"))
    assert(!card.contains("CartesianProduct"))
    val diff = Report
      .snapshotDiff(docs, docs)
      .queryExecution.executedPlan.toString
    assert(!diff.contains("CartesianProduct"))
    assert(!diff.contains("BroadcastNestedLoopJoin"))
  }

  test("percentileRanks: hand-checked percent_rank, ties share, per-group independence") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 20L), (4L, "A", 30L),
      (5L, "B", 999L), // single-row group -> pct 0 (denominator floor)
      (6L, "C", 10L), (7L, "C", 30L) // C's 10 ranks 0 regardless of A's
    ).toDF("doc_id", "source", "score_micro")
    val got = Report
      .percentileRanks(crafted, "score_micro")
      .select("doc_id", "pct_micro")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got(1L) === 0L && got(2L) === 0L) // ties share the rank
    assert(got(3L) === 2L * 1000000L / 3L) // 2 strictly lower of n-1=3
    assert(got(4L) === 1000000L) // the max is always 10^6 (n > 1)
    assert(got(5L) === 0L)
    assert(got(6L) === 0L && got(7L) === 1000000L)
    // determinism under repartitioning on the fixture scoring
    val base = sources.Tables.load(spark, Sf001, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.qualityScoreFused(col("text")).as("q"))
      .select(col("doc_id"), col("source"),
        expr("CAST(floor(q * 1000000 + 0.5) AS BIGINT)").as("score_micro"))
    val a = Report.percentileRanks(base, "score_micro").collect().toSet
    val b = Report.percentileRanks(base.repartition(17), "score_micro").collect().toSet
    assert(a === b)
  }

  test("keepTopQuality: threshold property exact per source, keep fraction calibrated") {
    import spark.implicits._
    val docs = sources.Tables.load(spark, Sf001, "documents")
      .select("doc_id", "source", "text")
    val kept = Report.keepTopQuality(docs, 300L)
      .select("doc_id", "source", "score_micro")
      .as[(Long, String, Long)].collect()
    val all = Report
      .percentileRanks(
        docs
          .withColumn("q", graft.functions.TextFunctions.qualityScoreFused(col("text")))
          .select(col("doc_id"), col("source"),
            expr("CAST(floor(q * 1000000 + 0.5) AS BIGINT)").as("score_micro")),
        "score_micro"
      )
      .select("doc_id", "source", "score_micro")
      .as[(Long, String, Long)].collect()
    val keptIds = kept.map(_._1).toSet
    // threshold property: within a source, every kept doc scores >= every
    // dropped one
    all.groupBy(_._2).foreach { case (src, rows) =>
      val (k, d) = rows.partition(r => keptIds(r._1))
      if (k.nonEmpty && d.nonEmpty)
        assert(k.map(_._3).min >= d.map(_._3).max, s"source $src violates the cut")
    }
    // calibration: every source keeps at least its 30% EXACTLY (the
    // from-above rule keeps the whole top-⌈0.3n⌉ prefix; ties can only
    // ADD mass), and no source is wiped out
    val bySrc = all.groupBy(_._2).map { case (s, r) => s -> r.length }
    kept.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.length * 1000 >= bySrc(src) * 300, s"source $src under-kept")
    }
    assert(kept.map(_._2).toSet === all.map(_._2).toSet, "a source was wiped out")
    intercept[IllegalArgumentException](Report.keepTopQuality(docs, 0L))
  }

  test("keepTopQuality: uniform-score and singleton sources survive in full (ADVICE r10)") {
    import spark.implicits._
    // source U: every doc is the SAME text (one score value — the
    // templated-source shape the from-below pct rule wiped out: every
    // row had pct_micro = 0 < any cut). Source S: a singleton (n = 1,
    // pct_micro = 0 by the greatest(n-1,1) convention). Source M: a
    // graded spread so the cut still bites somewhere.
    val docs = (
      (1L to 10L).map(i => (i, "U", "identical template text that repeats verbatim")) ++
        Seq((11L, "S", "the only document of its source")) ++
        (12L to 21L).map(i =>
          (i, "M", ("quality words and " * (i - 11).toInt) + "tail with, punctuation!!"))
    ).toDF("doc_id", "source", "text")
    val kept = Report.keepTopQuality(docs, 300L)
      .select("doc_id", "source").as[(Long, String)].collect()
    val bysrc = kept.groupBy(_._2).map { case (s, r) => s -> r.length }
    assert(bysrc.getOrElse("U", 0) === 10, "uniform source must keep everything")
    assert(bysrc.getOrElse("S", 0) === 1, "singleton source must keep its doc")
    val m = bysrc.getOrElse("M", 0)
    assert(m >= 3 && m < 10, s"graded source must be pruned but calibrated, kept $m")
    // ties at the top keep together: every kept M doc scores >= every dropped one
    val scoredM = Report.keepTopQuality(docs.filter(col("source") === "M"), 300L)
      .select("score_micro").as[Long].collect()
    assert(scoredM.length === m)
  }

  test("sourceOverlap: hand-checked matrix, within-source dups collapse, prefix knob") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "shared text one", "A"),
      (2L, "shared text one", "B"), // exact cross-source copy
      (3L, "shared text one", "A"), // within-source dup — must NOT inflate
      (4L, "only in a", "A"),
      (5L, "only in b", "B"),
      (6L, "prefix match here tail-x", "A"),
      (7L, "prefix match here tail-y", "C") // same 3-token opening, different tail
    ).toDF("doc_id", "text", "source")
    val exact = Report
      .sourceOverlap(crafted)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
    // exactly one pair row; A has 3 distinct texts, B has 2; containment
    // 1000/3 and 1000/2 floored
    assert(exact === Seq(("A", "B", 1L, 3L, 2L, 333L, 500L)))
    // the prefix knob surfaces the shared opening the exact key missed
    val pre = Report
      .sourceOverlap(crafted, prefixTokens = 3)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect()
      .toSeq
      .sortBy(r => (r._1, r._2))
    assert(pre.map(r => (r._1, r._2, r._3)) === Seq(("A", "B", 1L), ("A", "C", 1L)))
    // deterministic under repartitioning on the fixture
    val docs = sources.Tables.load(spark, Sf001, "documents")
    val a = Report.sourceOverlap(docs, prefixTokens = 4).collect().toSet
    val b = Report.sourceOverlap(docs.repartition(17), prefixTokens = 4).collect().toSet
    assert(a === b)
    intercept[IllegalArgumentException](Report.sourceOverlap(crafted, prefixTokens = -1))
  }

  test("vocabGrowth: hand-checked curve, monotone, converges to corpus totals") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "a b"),       // vocab {a,b}, 2 tokens
      (2L, "b c c"),     // +{c}, 3 tokens
      (5L, "a d")        // +{d}, 2 tokens
    ).toDF("doc_id", "text")
    val rows = Report
      .vocabGrowth(crafted, Seq(1L, 2L, 3L, 5L))
      .orderBy("checkpoint")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    assert(rows === Seq((1L, 2L, 2L), (2L, 3L, 5L), (3L, 3L, 5L), (5L, 4L, 7L)))
    // fixture: monotone in both columns; final checkpoint == corpus totals
    val curve = Report
      .vocabGrowth(docs, Seq(50L, 150L, 250L, 350L, 500L))
      .orderBy("checkpoint")
      .as[(Long, Long, Long)]
      .collect()
    assert(curve.sliding(2).forall(p => p(1)._2 >= p(0)._2 && p(1)._3 >= p(0)._3))
    val totalVocab = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t")))
      .head.getLong(0)
    val totalTok = docs
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(curve.last === ((500L, totalVocab, totalTok)))
    // a checkpoint before any doc rides at 0/0
    val zero = Report.vocabGrowth(crafted, Seq(0L, 5L)).orderBy("checkpoint")
      .as[(Long, Long, Long)].collect()
    assert(zero.head === ((0L, 0L, 0L)))
    intercept[IllegalArgumentException](Report.vocabGrowth(docs, Seq()))
    intercept[IllegalArgumentException](Report.vocabGrowth(docs, Seq(5L, 1L)))
    intercept[IllegalArgumentException](Report.vocabGrowth(docs, Seq(1L, 1L)))
  }

  test("blocklistReport: exact-token hits only, filter form == keep column") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "clean prose here"),
      (2L, "contains dup twice dup"),
      (3L, "superduper is not a hit"), // substring must NOT match
      (4L, "slow")
    ).toDF("doc_id", "text")
    val rep = graft.operators.Heuristics
      .blocklistReport(crafted, Seq("dup", "slow"))
      .as[(Long, Long, Boolean)]
      .collect()
      .toMap2
    assert(rep(1L) === ((0L, true)))
    assert(rep(2L) === ((2L, false)), "occurrence count, not distinct")
    assert(rep(3L) === ((0L, true)), "substring containment must not hit")
    assert(rep(4L) === ((1L, false)))
    val kept = graft.operators.Heuristics.filterBlocklist(crafted, Seq("dup", "slow"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    intercept[IllegalArgumentException](
      graft.operators.Heuristics.blocklistReport(crafted, Seq())
    )
    intercept[IllegalArgumentException](
      graft.operators.Heuristics.blocklistReport(crafted, Seq("two words"))
    )
  }

  test("phraseBlocklistReport: overlapping windows, mixed lengths, filter form") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "a a a"),                   // "a a" hits at positions 0 AND 1
      (2L, "watch free movies online"),
      (3L, "watch the movies"),        // words present, phrase absent
      (4L, "free movies")              // exact 2-token doc
    ).toDF("doc_id", "text")
    val rep = graft.operators.Heuristics
      .phraseBlocklistReport(crafted, Seq("a a", "free movies", "watch free movies"))
      .as[(Long, Long, Boolean)]
      .collect()
      .toMap2
    assert(rep(1L) === ((2L, false)), "overlapping occurrences both count")
    assert(rep(2L) === ((2L, false)), "'free movies' and 'watch free movies' both hit")
    assert(rep(3L) === ((0L, true)), "scattered words are not a phrase hit")
    assert(rep(4L) === ((1L, false)))
    val kept = graft.operators.Heuristics
      .filterBlockedPhrases(crafted, Seq("a a", "free movies", "watch free movies"))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept === Seq(3L))
    intercept[IllegalArgumentException](
      graft.operators.Heuristics.phraseBlocklistReport(crafted, Seq())
    )
    intercept[IllegalArgumentException](
      graft.operators.Heuristics.phraseBlocklistReport(crafted, Seq(" padded "))
    )
    intercept[IllegalArgumentException](
      graft.operators.Heuristics.phraseBlocklistReport(crafted, Seq("double  space"))
    )
  }

  private implicit class TupleSeqOps(s: Array[(Long, Long, Boolean)]) {
    def toMap2: Map[Long, (Long, Boolean)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
