package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePack

/** Laws of greedy in-order sequence packing, checked on the real fixture
  * corpus (sf0.001 documents) so they hold over genuine length skew.
  */
class SequencePackSpec extends SparkSpec {
  private val Budget = 96
  private val ChunkSize = 64
  private val Overlap = 8

  private lazy val docs = sources.Tables.load(spark, Sf0001, "documents")

  test("token conservation: packed totals == chunk totals per document") {
    val chunkTotals = SequencePack
      .chunkFrame(docs, ChunkSize, Overlap)
      .groupBy("doc_id")
      .agg(sum("n_tok").as("chunk_toks"), count(lit(1)).as("n_chunks"))
    val packTotals = SequencePack
      .pack(docs, Budget, ChunkSize, Overlap)
      .groupBy("doc_id")
      .agg(sum("n_tokens").as("pack_toks"), sum("n_chunks").as("pack_chunks"))
    val mismatches = chunkTotals
      .join(packTotals, "doc_id")
      .filter(col("chunk_toks") =!= col("pack_toks") || col("n_chunks") =!= col("pack_chunks"))
      .count()
    assert(mismatches === 0L)
  }

  test("budget law: sequence totals live in (budget - chunkSize, budget + chunkSize)") {
    // greedy close-on-crossing: a sequence's total is < budget + its last
    // chunk's tokens; a NON-final sequence spans from a start boundary
    // overhung by at most one chunk to past its own end boundary, so it
    // holds strictly more than budget - chunkSize tokens (it may hold less
    // than budget when the previous sequence's overhang ate into it)
    val packed = SequencePack.pack(docs, Budget, ChunkSize, Overlap).persist()
    try {
      assert(packed.filter(col("n_tokens") >= Budget + ChunkSize).count() === 0L)
      val lastSeq = packed
        .groupBy("doc_id")
        .agg(max("seq_id").as("last_seq"))
      val tooShortNonFinal = packed
        .join(lastSeq, "doc_id")
        .filter(col("seq_id") < col("last_seq") && col("n_tokens") <= Budget - ChunkSize)
        .count()
      assert(tooShortNonFinal === 0L)
    } finally packed.unpersist()
  }

  test("seq_ids are contiguous from 0 per document") {
    val bad = SequencePack
      .pack(docs, Budget, ChunkSize, Overlap)
      .groupBy("doc_id")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1)
      .count()
    assert(bad === 0L)
  }

  test("assignment is deterministic under repartitioning") {
    val a = SequencePack.assign(docs, Budget, ChunkSize, Overlap)
      .select("doc_id", "chunk_idx", "seq_id")
    val b = SequencePack.assign(docs.repartition(13), Budget, ChunkSize, Overlap)
      .select("doc_id", "chunk_idx", "seq_id")
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
  }

  test("packAcross: conservation, budget bound, determinism, bucket-local seq ids") {
    val packed = SequencePack.packAcross(docs, budget = 256, buckets = 8).persist()
    try {
      // every document appears exactly once
      assert(packed.count() === docs.count())
      // budget law: a training row closes before budget + its last doc's tokens;
      // doc token counts vary, so bound by the max doc length
      val maxDoc = packed.agg(max("n_tok")).head().getLong(0)
      val rows = packed
        .groupBy("bucket", "seq_id")
        .agg(sum("n_tok").as("n_tokens"))
      assert(rows.filter(col("n_tokens") >= 256L + maxDoc).count() === 0L)
      // seq ids contiguous from 0 within each bucket
      val bad = rows
        .groupBy("bucket")
        .agg(min("seq_id").as("lo"), max("seq_id").as("hi"), count(lit(1)).as("n"))
        .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1)
        .count()
      assert(bad === 0L)
      // deterministic under repartitioning
      val again = SequencePack
        .packAcross(docs.repartition(13), budget = 256, buckets = 8)
      assert(packed.except(again).count() === 0L && again.except(packed).count() === 0L)
    } finally packed.unpersist()
  }

  test("packAcrossAuto: derives ceil(n/target) buckets and matches fixed-bucket packing") {
    val n = docs.count()
    val target = 40L
    val expectBuckets = ((n + target - 1) / target).max(1L)
    val auto = SequencePack.packAcrossAuto(docs, budget = 256, targetDocsPerBucket = target).persist()
    try {
      // the derived bucket count is ceil(n/target) (hash-uniform buckets:
      // every one of them is hit at fixture scale)
      assert(auto.select("bucket").distinct().count() === expectBuckets)
      // identical assignment to packAcross called with that same count —
      // the derivation changes WHERE the constant comes from, not the math
      val fixed = SequencePack.packAcross(docs, budget = 256, buckets = expectBuckets.toInt)
      assert(auto.except(fixed).count() === 0L && fixed.except(auto).count() === 0L)
      // singleton corpus degenerates to one bucket, not zero
      val one = SequencePack.packAcrossAuto(docs.limit(1), budget = 256, targetDocsPerBucket = target)
      assert(one.select("bucket").distinct().count() === 1L)
    } finally auto.unpersist()
  }

  test("chunkIds: flatten == encoded stream, exact window sizes, dense indexes, edge cases") {
    import spark.implicits._
    val crafted = Seq(
      (1L, (1L to 130L).toArray.toSeq), // 130 ids at L=64 -> 64, 64, 2
      (2L, (1L to 64L).toArray.toSeq), // exactly one full window
      (3L, Seq(7L)), // single id
      (4L, Seq.empty[Long]) // empty -> no chunks
    ).toDF("doc_id", "ids").withColumn("n_ids", size(col("ids")).cast("long"))
    val got = SequencePack
      .chunkIds(crafted, 64)
      .as[(Long, Long, Seq[Long], Long)]
      .collect()
      .toSeq
      .sortBy(r => (r._1, r._2))
    // flatten reproduces each doc's stream; sizes exact; indexes dense
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).map(_._2) === Seq(0L, 1L, 2L))
    assert(byDoc(1L).flatMap(_._3) === (1L to 130L).toSeq)
    assert(byDoc(1L).map(_._4) === Seq(64L, 64L, 2L))
    assert(byDoc(2L).map(_._4) === Seq(64L))
    assert(byDoc(3L).map(_._4) === Seq(1L))
    assert(!byDoc.contains(4L))
    // every non-final window is exactly L on the real encoded fixture
    val enc = {
      import graft.operators.Vocabulary
      val d = spark.read.parquet(s"$Sf0001/documents.parquet")
      val segs = Vocabulary.bpeSegmentations(d, 4)
      Vocabulary.encodeSubwords(d, segs, Vocabulary.subwordVocab(segs))
    }
    val real = SequencePack.chunkIds(enc, 64)
    val tails = real
      .groupBy(col("doc_id"))
      .agg(max(col("chunk_idx")).as("last"), sum(col("n_ids")).as("tot"))
    val joined = real
      .join(tails, Seq("doc_id"))
      .as[(Long, Long, Seq[Long], Long, Long, Long)]
      .collect()
    joined.foreach { case (d, idx, _, n, last, _) =>
      if (idx < last) assert(n === 64L, s"doc $d chunk $idx")
      else assert(n >= 1L && n <= 64L, s"doc $d tail")
    }
    // conservation vs the encode frame
    val tot = enc.agg(sum(col("n_ids"))).as[Long].head()
    assert(real.agg(sum(col("n_ids"))).as[Long].head() === tot)
    intercept[IllegalArgumentException](SequencePack.chunkIds(crafted, 0))
  }

  test("chunkIdsAcross: flatten == concatenated stream, exact sizes, bucket invariance") {
    import spark.implicits._
    // offsets crafted to straddle window boundaries at L=8: doc 1 fills
    // 0..4, doc 2 (with EOS) spans windows 0..1, doc 5 gap in ids is fine
    val crafted = Seq(
      (1L, Seq(10L, 11L, 12L, 13L)), // + EOS -> global 0..4
      (2L, (20L to 28L).map(identity)), // 9 ids + EOS -> global 5..14 (straddles)
      (5L, Seq(30L)), // + EOS -> 15..16
      (7L, Seq.empty[Long]) // dropped
    ).toDF("doc_id", "ids").withColumn("n_ids", size(col("ids")).cast("long"))
    val eos = Some(-1L)
    val got = SequencePack
      .chunkIdsAcross(crafted, 8, eos, buckets = 3)
      .as[(Long, Seq[Long], Long)]
      .collect()
      .sortBy(_._1)
    val stream =
      Seq(10L, 11L, 12L, 13L, -1L) ++ (20L to 28L) ++ Seq(-1L, 30L, -1L)
    assert(got.flatMap(_._2).toSeq === stream)
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got.map(_._3).toSeq === Seq(8L, 8L, 1L))
    // bucket-count invariance: the running total is a property of the
    // stream, not of how we parallelized it
    val alt = SequencePack
      .chunkIdsAcross(crafted, 8, eos, buckets = 1)
      .as[(Long, Seq[Long], Long)]
      .collect()
      .sortBy(_._1)
    assert(alt.toSeq === got.toSeq)
    // no-EOS variant is the pure concatenation
    val plain = SequencePack
      .chunkIdsAcross(crafted, 8, None, buckets = 2)
      .as[(Long, Seq[Long], Long)]
      .collect()
      .sortBy(_._1)
    assert(plain.flatMap(_._2).toSeq === (Seq(10L, 11L, 12L, 13L) ++ (20L to 28L) :+ 30L))
    // real encoded fixture: every non-final window exactly L, conservation
    val enc = {
      import graft.operators.Vocabulary
      val d = spark.read.parquet(s"$Sf0001/documents.parquet")
      val segs = Vocabulary.bpeSegmentations(d, 4)
      Vocabulary.encodeSubwords(d, segs, Vocabulary.subwordVocab(segs))
    }
    val real = SequencePack.chunkIdsAcross(enc, 64, Some(-1L)).cache()
    try {
      val maxIdx = real.agg(max(col("chunk_idx"))).as[Long].head()
      val bad = real.filter(col("chunk_idx") < maxIdx && col("n_ids") =!= 64L).count()
      assert(bad === 0L)
      val nDocs = enc.filter(size(col("ids")) > 0).count()
      val tot = enc.agg(sum(col("n_ids"))).as[Long].head()
      assert(real.agg(sum(col("n_ids"))).as[Long].head() === tot + nDocs)
      // dense window indexes 0..maxIdx
      assert(real.count() === maxIdx + 1)
    } finally real.unpersist()
    intercept[IllegalArgumentException](SequencePack.chunkIdsAcross(crafted, 0))
  }

  test("chunkIdsAcross / assign: NULL and duplicate ids raise — never a silently shifted stream (r18 review)") {
    import spark.implicits._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    // NULL id: its tokens would ride the offset prefix sums (NULL is a
    // groupBy group) while its rows drop at the bucket join — every
    // later document's windows would shift by its token count, silently
    val withNull = Seq(
      (Some(1L), Seq(10L, 11L)),
      (None, Seq(90L, 91L, 92L)),
      (Some(3L), Seq(30L))
    ).toDF("doc_id", "ids")
    val eNull = intercept[Exception](
      SequencePack.chunkIdsAcross(withNull, 4, None, buckets = 2).collect()
    )
    assert(messages(eNull).exists(_.contains("NULL doc_id")), s"got: ${messages(eNull)}")
    // duplicate id: double-joins its ids with engine-order offsets; the
    // lag guard sees the pair because equal ids always share a bucket
    val withDup = Seq(
      (1L, Seq(10L, 11L)),
      (2L, Seq(20L)),
      (2L, Seq(21L, 22L))
    ).toDF("doc_id", "ids")
    val eDup = intercept[Exception](
      SequencePack.chunkIdsAcross(withDup, 4, None, buckets = 2).collect()
    )
    assert(messages(eDup).exists(_.contains("duplicate doc_id")), s"got: ${messages(eDup)}")
    // clean frames pass both guards untouched (and the boundaries twin
    // shares packedOffsets, so one clean read covers it)
    val clean = Seq((1L, Seq(10L, 11L)), (2L, Seq(20L))).toDF("doc_id", "ids")
    assert(
      SequencePack
        .chunkIdsAcrossWithBoundaries(clean, 4, None, buckets = 2)
        .agg(sum(col("n_ids")))
        .as[Long]
        .head() === 3L
    )
    // assign: every NULL-id doc lands in ONE window partition where
    // chunk_idx TIES across documents — engine-order seq ids, silently
    val docs = Seq((Some(1L), "a b c"), (None, "d e f")).toDF("doc_id", "text")
    val eAssign = intercept[Exception](
      SequencePack.assign(docs, budget = 2, chunkSize = 2, overlap = 0).collect()
    )
    assert(messages(eAssign).exists(_.contains("NULL doc_id")), s"got: ${messages(eAssign)}")
  }

  test("hand-checked packing on a crafted document") {
    import spark.implicits._
    // 130 tokens, chunkSize 10, overlap 0, budget 25:
    // chunks of 10 tokens each (13 chunks); tokens_before = 0,10,...,120
    // seq_id = tokens_before div 25 -> 0,0,0,1,1,2,2,2,3,3,4,4,4
    val doc = Seq((1L, (1 to 130).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = SequencePack
      .assign(doc, budget = 25, chunkSize = 10, overlap = 0)
      .orderBy("chunk_idx")
      .select("seq_id")
      .as[Long]
      .collect()
      .toSeq
    assert(got === Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 4L, 4L, 4L))
  }

  test("chunkIdsAcrossWithBoundaries: hand-checked starts, ids == plain packer, laws") {
    import spark.implicits._
    // docs A(5 ids) B(10) C(2), EOS -1, L=8: stream lengths 6+11+3=20.
    // A at gpos 0..5, B at 6..16, C at 17..19.
    // w0: starts at 0 (A) and 6 (B); w1 (gpos 8..15, all B): none;
    // w2 (gpos 16..19): B's tail at 0? no — B STARTED in w0; C starts
    // at gpos 17 -> pos 1.
    val enc = Seq(
      (1L, (1L to 5L).toSeq),
      (2L, (11L to 20L).toSeq),
      (3L, Seq(31L, 32L))
    ).toDF("doc_id", "ids")
    val got = SequencePack
      .chunkIdsAcrossWithBoundaries(enc, 8, Some(-1L), buckets = 4)
      .select("chunk_idx", "ids", "doc_starts")
      .as[(Long, Seq[Long], Seq[Long])]
      .collect()
      .sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(got(0)._3 === Seq(0L, 6L))
    assert(got(1)._3 === Seq())
    assert(got(2)._3 === Seq(1L))
    // ids identical to the plain packer, window for window
    val plain = SequencePack
      .chunkIdsAcross(enc, 8, Some(-1L), buckets = 4)
      .select("chunk_idx", "ids")
      .as[(Long, Seq[Long])]
      .collect()
      .toMap
    got.foreach { case (c, ids, _) => assert(ids === plain(c)) }
    // laws on the real fixture encode: total starts == doc count, every
    // start in [0, L), sorted, first window starts at 0
    val docs = sources.Tables.load(spark, Sf001, "documents").limit(150)
    val segs = graft.operators.Vocabulary.bpeSegmentations(docs, 8)
    val realEnc = graft.operators.Vocabulary
      .encodeSubwords(docs, segs, graft.operators.Vocabulary.subwordVocab(segs))
    val real = SequencePack
      .chunkIdsAcrossWithBoundaries(realEnc, 64, Some(-1L), buckets = 8)
      .select("chunk_idx", "doc_starts")
      .as[(Long, Seq[Long])]
      .collect()
      .sortBy(_._1)
    val nDocs = realEnc.filter(size(col("ids")) > 0).count()
    assert(real.map(_._2.size.toLong).sum === nDocs, "one boundary per packed document")
    real.foreach { case (c, starts) =>
      assert(starts === starts.sorted)
      starts.foreach(p => assert(p >= 0L && p < 64L, s"window $c start $p out of range"))
    }
    assert(real.head._2.headOption === Some(0L), "the stream's first document starts window 0")
  }

  test("packGrouped: conservation, group purity, subBucket salting, IVF-cell composition") {
    import spark.implicits._
    val lab = sources.Tables
      .load(spark, Sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"), col("label"))
    val grouped = docs.join(lab, "doc_id")
    val packed = SequencePack.packGrouped(grouped, "label", Budget)
    // every doc exactly once
    assert(packed.select("doc_id").distinct().count() === grouped.count())
    assert(packed.count() === grouped.count())
    // group purity: a bucket IS the group — every doc in a bucket carries
    // that label (subBuckets = 1)
    val impure = packed
      .join(grouped.select(col("doc_id"), col("label").cast("string").as("lab")), "doc_id")
      .filter(col("bucket") =!= col("lab"))
      .count()
    assert(impure === 0L)
    // deterministic under repartitioning
    val again = SequencePack.packGrouped(grouped.repartition(13), "label", Budget)
    assert(packed.except(again).count() === 0L && again.except(packed).count() === 0L)
    // salting: bucket prefix is still the group, docs never cross groups
    val salted = SequencePack.packGrouped(grouped, "label", Budget, subBuckets = 4)
    val crossed = salted
      .join(grouped.select(col("doc_id"), col("label").cast("string").as("lab")), "doc_id")
      .filter(!col("bucket").startsWith(concat(col("lab"), lit("#"))))
      .count()
    assert(crossed === 0L)
    assert(salted.count() === grouped.count())
    // the ICLM composition: IVF cells as groups — conservation holds and
    // every sequence is cell-pure
    val emb = sources.Tables.load(spark, Sf0001, "embeddings")
    val cb = graft.operators.Similarity.trainCodebook(emb)
    val cells = graft.operators.Similarity
      .ivfIndex(emb, cb)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val byCell = SequencePack.packGrouped(docs.join(cells, "doc_id"), "cell", Budget)
    assert(byCell.select("doc_id").distinct().count() === docs.join(cells, "doc_id").count())
    val mixed = byCell
      .join(cells.select(col("doc_id"), col("cell").cast("string").as("c")), "doc_id")
      .filter(col("bucket") =!= col("c"))
      .count()
    assert(mixed === 0L)
    intercept[IllegalArgumentException](SequencePack.packGrouped(grouped, "label", 0))
    intercept[IllegalArgumentException](SequencePack.packGrouped(grouped, "label", Budget, subBuckets = 0))
  }
}
