package graft

import graft.operators.{Dedup, EventOps, Similarity}
import graft.sources.{ParquetLayout, ShardedParquetSink}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate inputs through every major operator: empty frames, single
  * rows, all-identical corpora. Operators must return empty/identity
  * results, never throw — at 100 TB some partition is always empty.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is result-identical to the plain join (including salts=1)") {
    import graft.operators.SkewJoin
    import graft.sources.Tables
    val orders = Tables.load(spark, Sf0001, "orders")
    val cust = Tables.load(spark, Sf0001, "customer").withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, "o_custkey")
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    Seq(1, 8).foreach { salts =>
      val salted = SkewJoin.saltedJoin(orders, cust, "o_custkey", "o_orderkey", salts)
        .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
      assert(salted == plain, s"salted($salts) diverges from the plain join")
    }
  }

  test("scrub redacts emails and long number runs, leaves clean text alone") {
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, "contact bob.smith+spam@example.co.uk or call 5551234567 now"),
      (2L, "order 42 of 100 items"), // short numbers survive
      (3L, "no pii here at all"),
      (4L, "double 12345678901 and a@b.io end")
    ).toDF("doc_id", "text")
    val got = rows
      .select(col("doc_id"), TextFunctions.scrub(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "contact <email> or call <num> now")
    assert(got(2L) == "order 42 of 100 items")
    assert(got(3L) == "no pii here at all")
    assert(got(4L) == "double <num> and <email> end")
  }

  test("quality_score kernel is bit-identical to the composable Column formula") {
    import graft.functions.TextFunctions
    import graft.sources.Tables
    // adversarial shapes: empty, single token, rounding-tie-prone short
    // docs, punct-only, stopword-dense, >100 tokens (lenScore saturation)
    val crafted = Seq(
      "", " ", "a", "the", "the the the the the", "...,,,!!!???;;;:::",
      "the and of to a in is it you that he was for on are", // all stopwords
      (1 to 150).map(i => s"w$i").mkString(" "),
      "mixed: the quick brown fox, jumps! over? the lazy; dog."
    ).zipWithIndex.map { case (t, i) => (i.toLong + 1000000L, t) }
    val fixture = Tables
      .load(spark, Sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val both = (crafted ++ fixture).toDF("doc_id", "text").select(
      col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("composed"),
      TextFunctions.qualityScoreFused(col("text")).as("fused")
    )
    val diverging = both
      .filter(!(col("composed") <=> col("fused")))
      .as[(Long, Double, Double)].collect()
    assert(diverging.isEmpty, s"kernel diverges from Column formula: ${diverging.take(5).toSeq}")
  }

  private val docSchema = StructType(
    Seq(StructField("doc_id", LongType), StructField("text", StringType))
  )
  private lazy val emptyDocs =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)

  test("dedup family on an empty corpus: empty results, no errors") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.minhashPairs(emptyDocs, 0.8).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, 0.5).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, 2).count() == 0)
    assert(Dedup.clusters(emptyDocs, 0.8).count() == 0)
    assert(Dedup.dedupNear(emptyDocs, 0.8).count() == 0)
  }

  test("single-document corpus: no pairs, one self-labeled cluster") {
    val one = Seq((42L, "just one document here")).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(one, 0.1).count() == 0)
    assert(Dedup.clusters(one, 0.1).as[(Long, Long)].collect().toSeq == Seq((42L, 42L)))
  }

  test("all-identical corpus: every pair found, one cluster") {
    val same = (0L until 12L).map(i => (i, "identical text in every row")).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(same, 0.99).count() == 12 * 11 / 2)
    val cl = Dedup.clusters(same, 0.99).as[(Long, Long)].collect()
    assert(cl.forall(_._2 == 0L), "all collapse to min id 0")
    assert(Dedup.dedupNear(same, 0.99).as[(Long, Long)].collect().toSeq == Seq((0L, 12L)))
  }

  test("similarity on empty / missing-query corpora") {
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType))
      ))
    )
    assert(Similarity.bruteForceTopK(emptyEmb, Seq(0L), 5).count() == 0)
    assert(Similarity.annLsh(emptyEmb, Seq(0L), 5).count() == 0)
    // query ids that don't exist in the corpus: empty result, no error
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(emb, Seq(999L), 5).count() == 0)
  }

  test("event ops on empty events") {
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)
      ))
    )
    assert(EventOps.tumbling(emptyEvents).count() == 0)
    assert(EventOps.sessions(emptyEvents).count() == 0)
    assert(EventOps.asofPurchaseSignup(emptyEvents).count() == 0)
  }

  test("round-8 mixing ops on empty / degenerate corpora: empty results, never a throw") {
    import graft.operators.{Decontaminate, Importance, Sampling}
    val empty = Seq.empty[(Long, String, String, String)].toDF("doc_id", "lang", "source", "text")
    val one = Seq((1L, "en", "web", "just one tiny document here")).toDF("doc_id", "lang", "source", "text")
    // importance: training on empty sides still yields a usable (empty)
    // weight table; scoring under it falls back to the neutral ratio
    val wEmpty = Importance.train(empty, empty)
    assert(wEmpty.count() === 0L)
    val scored = Importance.score(one, wEmpty).collect()
    assert(scored.length === 1 && scored.head.getAs[Long]("imp_avg") === Importance.Scale)
    // resampling an empty corpus selects nothing (W = null path)
    assert(Importance.resampleImportant(empty, wEmpty, 5).count() === 0L)
    // a single-doc corpus resampled to 1 returns exactly that doc
    val picked = Importance.resampleImportant(one, wEmpty, 1).collect()
    assert(picked.length === 1 && picked.head.getLong(0) === 1L)
    // budget/plan ops on empty frames
    assert(Sampling.capTokenBudget(empty, 100L).count() === 0L)
    assert(Sampling.shufflePlan(empty, 4).count() === 0L)
    assert(
      Sampling.curriculumPlan(empty.selectExpr("doc_id", "5L as s"), 4, "s").count() === 0L
    )
    // zero budget admits nothing; a doc exactly on the budget is admitted
    assert(Sampling.capTokenBudget(one, 0L).count() === 0L)
    assert(Sampling.capTokenBudget(one, 5L).count() === 1L)
    // span decontamination: empty benchmark cuts nothing, empty corpus ok
    val redacted = Decontaminate.redactOverlaps(one, empty, 4).collect()
    assert(redacted.length === 1 && redacted.head.getString(1) === "just one tiny document here")
    assert(Decontaminate.redactOverlaps(empty, one, 4).count() === 0L)
    assert(Decontaminate.benchmarkExposure(empty, one, 4).count() === 0L)
    // the full mixing pipeline on an empty corpus: empty plan, no throw
    // (the mean-importance head() guard and every downstream stage)
    assert(graft.operators.Pipeline.mixCorpus(empty, one, 100L, 4).count() === 0L)
  }

  test("round-9 ops on empty / degenerate inputs: empty results, never a throw") {
    import graft.operators.{Decontaminate, Retrieval, Sketch, Spectral, SequencePack, Vocabulary}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noEnc = Seq.empty[(Long, Seq[Long], Long)].toDF("doc_id", "ids", "n_ids")
    val noEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // packers: empty corpora pack to zero windows
    assert(SequencePack.chunkIds(noEnc, 64).count() === 0L)
    assert(SequencePack.chunkIdsAcross(noEnc, 64, Some(-1L)).count() === 0L)
    // one-doc stream: the tail IS the stream
    val one = Seq((7L, Seq(1L, 2L, 3L))).toDF("doc_id", "ids")
      .withColumn("n_ids", size(col("ids")).cast("long"))
    val oneOut = SequencePack.chunkIdsAcross(one, 64, None).collect()
    assert(oneOut.length === 1 && oneOut.head.getSeq[Long](1) === Seq(1L, 2L, 3L))
    // CMS: empty stream -> empty grid; estimates over it read 0
    val emptyCms = Sketch.cmsSketch(noDocs.select(col("text").as("tok")), "tok", 3, 64)
    assert(emptyCms.count() === 0L)
    assert(
      Sketch
        .cmsEstimate(emptyCms, Seq("x").toDF("tok"), "tok", 3, 64)
        .as[(String, Long)].head()._2 === 0L
    )
    // bloom: empty benchmark -> empty filter -> nothing flagged
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val emptyBloom = Decontaminate.bloomIndex(noDocs, 1024L, 3, 2)
    assert(emptyBloom.count() === 0L)
    val rep = Decontaminate.bloomReport(docs, emptyBloom, 1024L, 3, 2).collect()
    assert(rep.length === 1 && rep.head.getAs[Long]("n_maybe") === 0L)
    // rankMetrics: empty run -> empty report; empty truth -> zero recall
    val run = Seq((1L, 10L, 1L)).toDF("query_id", "neighbor_id", "rnk")
    val noPairs = Seq.empty[(Long, Long)].toDF("query_id", "neighbor_id")
    assert(Retrieval.rankMetrics(noPairs.withColumn("rnk", lit(1L)), run, 5).count() === 0L)
    val zeroRel = Retrieval.rankMetrics(run, noPairs, 5).collect().head
    assert(zeroRel.getAs[Long]("n_rel") === 0L && zeroRel.getAs[Long]("rec_milli") === 0L)
    // greedy segmentation: empty corpus and empty inventory
    assert(Vocabulary.greedySegmentations(noDocs, Seq("a").toDF("sym"), 8).count() === 0L)
    val noInv = Vocabulary
      .greedySegmentations(docs, Seq.empty[String].toDF("sym"), 8)
      .select("syms").as[Seq[String]].collect()
    assert(noInv.forall(ss => ss.forall(_.length == 1))) // all char fallback
    // spectral: single vector centers to zero -> zero moments, proj 0
    val oneVec = Seq((0L, Seq(0.5f, -0.5f, 0.25f, 0f))).toDF("vec_id", "embedding")
    val pc1 = Spectral.principalComponent(oneVec, 3)
    assert(Spectral.projectPrincipal(oneVec, pc1).as[(Long, Long)].head()._2 === 0L)
    // MMR: corpus smaller than k still returns what exists
    val tiny = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    assert(Similarity.mmrTopK(tiny, Seq(0L), 2, 2, 700).count() === 2L)
  }

  test("sharded write of an empty frame round-trips as zero rows") {
    val dir = s"$testOut/empty_dump"
    ShardedParquetSink.write(emptyDocs, dir, ParquetLayout(maxRecordsPerFile = 100L))
    val report = ShardedParquetSink.readBackReport(spark, dir)
    assert(report.totalRows == 0)
  }

  test("materializeCtes: rewrites every plain CTE, touches nothing else, idempotent") {
    // this rewrite runs over ALL oracle SQL (the driver-gate fix that
    // cut the DuckDB compare from 894 s) — a silent mis-rewrite breaks
    // the whole correctness gate, so its edges are pinned here
    import OracleFragments.materializeCtes
    // plain CTEs rewrite, every one in a chain
    assert(
      materializeCtes("WITH a AS (SELECT 1), b AS (SELECT * FROM a) SELECT * FROM b")
        === "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT * FROM a) SELECT * FROM b"
    )
    // recursive members declared with a column list stay plain (DuckDB
    // requires it): the `name(cols) AS (` shape must not match
    val rec = "WITH RECURSIVE reach(n, l) AS (SELECT 1, 0 UNION ALL SELECT n+1, l FROM reach) SELECT * FROM reach"
    assert(materializeCtes(rec) === rec)
    // named windows stay plain: `WINDOW w AS (PARTITION ...)` is not a CTE
    val win = "SELECT sum(x) OVER w FROM t WINDOW w AS (PARTITION BY k)"
    assert(materializeCtes(win) === win)
    // casts/aliases never match (no `word AS (` shape)
    val cast = "SELECT CAST(x AS BIGINT) AS y, sum(z) AS s FROM t"
    assert(materializeCtes(cast) === cast)
    // idempotent: re-applying to already-materialized SQL changes nothing
    val once = materializeCtes("WITH a AS (SELECT 1) SELECT * FROM a")
    assert(materializeCtes(once) === once)
    // the live oracle map is already-materialized output: re-application
    // must be a fixed point for EVERY gate (catches a future oracle whose
    // shape the regex would corrupt on the second pass)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(materializeCtes(sql) === sql, s"$name: materializeCtes not a fixed point")
    }
  }
}
