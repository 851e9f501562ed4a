package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classifier, Report}

/** Laws for the learned quality classifier (q150/q151): discrimination on
  * crafted labeled slices, the neutral/completeness laws of the
  * normalized count-ratio model, composition into the calibrated
  * per-source keep, determinism, and the broadcast plan shape.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // crafted labeled slices with genuinely different token distributions:
  // POS = fluent prose vocabulary, NEG = spam/boilerplate vocabulary
  private def posSlice = Seq(
    (1L, "the study presents careful analysis of the measured results and discusses methods"),
    (2L, "researchers describe the experiment design and report consistent evidence across trials"),
    (3L, "the chapter explains historical context with detailed references and clear prose")
  ).toDF("doc_id", "text")

  private def negSlice = Seq(
    (11L, "click here buy now free offer limited deal click subscribe winner prize"),
    (12L, "cheap pills discount casino bonus jackpot free spins click banner now"),
    (13L, "buy followers instant likes free download crack keygen serial click")
  ).toDF("doc_id", "text")

  test("classifier: held-out discrimination, filter form, threshold is the balanced point") {
    val model = Classifier.train(posSlice, negSlice)
    val held = Seq(
      (21L, "the analysis reports clear evidence and careful methods across the study"),
      (22L, "free bonus click now buy cheap discount offer prize winner")
    ).toDF("doc_id", "text")
    val got = Classifier
      .score(held, model)
      .select("doc_id", "q_micro")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got(21L) > Classifier.Scale, s"prose must score positive-like, got ${got(21L)}")
    assert(got(22L) < Classifier.Scale, s"spam must score negative-like, got ${got(22L)}")
    assert(got(21L) > got(22L))
    // the filter form keeps exactly the docs at/above the threshold
    val kept = Classifier.filterPositive(held, model).select("doc_id").as[Long].collect().toSet
    assert(kept === Set(21L))
    // training slices separate themselves (in-distribution sanity)
    val self = Classifier
      .score(posSlice.unionByName(negSlice), model)
      .select("doc_id", "q_micro")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(posSlice.select("doc_id").as[Long].collect().forall(id => self(id) > Classifier.Scale))
    assert(negSlice.select("doc_id").as[Long].collect().forall(id => self(id) < Classifier.Scale))
  }

  test("classifier: model complete over the bucket space; neutral law on balanced slices") {
    // feature-BALANCED slices (same token count each side) make the
    // unseen-bucket weight exactly Scale — the neutral/decision point
    val pos = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val neg = Seq((2L, "omega sigma theta kappa")).toDF("doc_id", "text")
    val model = Classifier.train(pos, neg, numBuckets = 64)
    assert(model.count() === 64L, "model must cover every bucket")
    val weights = model.select("b", "w").as[(Long, Long)].collect().toMap
    assert(weights.keySet === (0L until 64L).toSet)
    // buckets seen by neither slice carry exactly the neutral Scale
    val seen = graft.operators.Importance
      .featureBuckets(pos.unionByName(neg), 64)
      .select("b")
      .as[Long]
      .collect()
      .toSet
    (0L until 64L).filterNot(seen).foreach { b =>
      assert(weights(b) === Classifier.Scale, s"unseen bucket $b must be neutral")
    }
    // a document of only unseen features scores exactly Scale
    val neutralDoc = Seq((9L, "zz1 zz2 zz3")).toDF("doc_id", "text")
    val sc = Classifier.score(neutralDoc, model, numBuckets = 64)
      .select("q_micro").as[Long].head()
    // (its tokens may collide into seen buckets at 64 buckets — accept
    // either exact neutrality or a value, but re-check on a wide space)
    val wide = Classifier.train(pos, neg, numBuckets = 4096)
    val scWide = Classifier.score(neutralDoc, wide, numBuckets = 4096)
      .select("q_micro").as[Long].head()
    assert(scWide === Classifier.Scale, s"unseen-feature doc must be neutral, got $scWide ($sc)")
  }

  test("classifier: keepTopLearned calibrates per source and wipes out no source") {
    val model = Classifier.train(posSlice, negSlice)
    // source U: identical docs (one learned score value) — must survive
    // in full under the from-above rule; source M: graded spam-ness
    val docs = (
      (1L to 6L).map(i => (i, "U", "the same careful analysis text repeated verbatim")) ++
        (11L to 20L).map(i =>
          (i, "M", ("careful analysis " * (21 - i).toInt) + ("click free offer " * (i - 10).toInt))
        )
    ).toDF("doc_id", "source", "text")
    val kept = Classifier
      .keepTopLearned(docs, model, 300L)
      .select("doc_id", "source")
      .as[(Long, String)]
      .collect()
    val bySrc = kept.groupBy(_._2).map { case (s, r) => s -> r.length }
    assert(bySrc.getOrElse("U", 0) === 6, "uniform-score source must keep everything")
    val m = bySrc.getOrElse("M", 0)
    assert(m >= 3 && m < 10, s"graded source must calibrate, kept $m")
    // the kept M docs are the LEAST spammy ones (threshold property on
    // the learned score): kept ids are the low ids (more 'careful', less 'click')
    val keptM = kept.filter(_._2 == "M").map(_._1).sorted
    assert(keptM === (11L until (11L + m)).toVector, s"got $keptM")
  }

  test("classifier: determinism under repartitioning; broadcast-only plan") {
    val model = Classifier.train(posSlice, negSlice)
    val docs = sources.Tables.load(spark, Sf001, "documents").select("doc_id", "text")
    val a = Classifier.score(docs, model).collect().toSet
    val b = Classifier.score(docs.repartition(13), model).collect().toSet
    assert(a === b)
    val plan = Classifier.score(docs, model).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model lookup must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle on the feature key:\n$plan")
  }
}
