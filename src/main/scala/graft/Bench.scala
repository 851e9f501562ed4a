package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink — unlike `count()`, which
  * lets Catalyst prune the plan to nothing, noop materializes every output
  * column through the full pipeline, so timings reflect real work.
  * A warmup action first absorbs session/codegen startup cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM + codegen + parquet footer caches. The q01 pass warms
    // scan/agg codegen; the extra passes warm the two one-shot costs the
    // r07 probes measured landing inside first runs elsewhere in the
    // sequence — the JSON parse path (q11: first run 7.5 s vs 0.73 s
    // steady in an 8-run probe) and the iterative cluster machinery's
    // generated band join + checkpoint path (q32: 7.8 s vs 1.9 s
    // steady). Warmup work is NOT measured; under a loaded host the JIT
    // of these paths is exactly what best-of-2 fails to absorb.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark
      .range(1000L)
      .selectExpr("""get_json_object(concat('{"k":', id, '}'), '$.k') AS k""")
      .selectExpr("sum(cast(k as bigint))")
      .collect()
    import spark.implicits._
    val warmDocs = spark
      .range(200L)
      .map(i => (i, if (i % 10 == 1) s"warm doc ${i - 1} tokens here" else s"warm doc $i tokens here"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.clusters(warmDocs, 0.5).count()
    // window/agg path (q34/q35's shape — explode + hash agg + ranked
    // window): their driver readings sat above band in r05 and r07 while
    // every dev re-probe landed inside; on a loaded host the one-shot
    // WindowExec + explode codegen JIT is the only q34/q35-specific cost
    // a first run can pay, so absorb it here like the JSON/cluster paths
    spark
      .range(500L)
      .selectExpr("id % 5 AS g", "id", "concat('w', id % 17, ' w', id % 13, ' w', id % 7) AS text")
      .selectExpr("g", "id", "explode(split(text, ' ')) AS term")
      .groupBy("g", "term")
      .agg(org.apache.spark.sql.functions.count("*").as("c"))
      .selectExpr("g", "term", "c", "row_number() OVER (PARTITION BY g ORDER BY c DESC, term) AS rn")
      .filter("rn <= 3")
      .collect()
    // IVF/Lloyd path (q37/q83's shape — the r08 out-of-band pair): the
    // trained-quantizer chain's generated code (seeded centroids, two
    // refine rounds of cosine-argmax + integer-quantized means, probe
    // ranking, int8 candidate codes) is a one-shot JIT cost nothing
    // above warms; r08 read q37 at 2.8x and q83 at 2.0x their anchors
    // with the code untouched — the same first-run signature q11/q32/
    // q34/q35 showed before their warmups landed. A 200-vector synthetic
    // corpus drives the full chain (both the float and the quantized
    // candidate scorers) in well under a second.
    val warmEmb = spark
      .range(200L)
      .selectExpr(
        "id AS vec_id",
        s"transform(sequence(0, ${graft.operators.Similarity.Dim - 1})," +
          " j -> cast(pmod(id * 31 + j * 7, 97) - 48 AS float)) AS embedding"
      )
    graft.operators.Similarity.annIvf(warmEmb, Seq(0L, 1L), 5).count()
    graft.operators.Similarity.annIvfQuantized(warmEmb, Seq(0L, 1L), 5).count()
    // r09 additions with their own one-shot codegen: the decimal
    // second-moment + power-round arithmetic (q138/q139 — probe run-1
    // read 1.8x median, enough to breach the ±50% band on a loaded
    // host) and the greedy-walk frontier joins (q134). Tiny frames
    // drive both chains end to end.
    graft.operators.Spectral
      .projectPrincipal(warmEmb, graft.operators.Spectral.principalComponent(warmEmb, 2))
      .count()
    locally {
      import spark.implicits._
      val warmDocs2 = spark
        .range(60L)
        .map(i => (i, s"alpha beta${i % 7} gamma alphabet"))
        .toDF("doc_id", "text")
      val wv = graft.operators.Vocabulary
        .subwordVocab(graft.operators.Vocabulary.wordpieceSegmentations(warmDocs2, 2))
      graft.operators.Vocabulary.greedySegmentations(warmDocs2, wv, 8).count()
      ()
    }
    spark.catalog.clearCache()

    // A failed query must NEVER record a (near-zero) time — that would
    // IMPROVE the bench as queries break. Failures go to an errors map and
    // are excluded from the timings (VERDICT.md "What's wrong" #9).
    //
    // Measurement mode (VERDICT r16 №3): each query runs `reps` times in
    // this one JVM and reports the per-query MEDIAN (default 3). The r09–
    // r16 rounds each spent a round-opening milestone adjudicating single-
    // run stalls on disjoint query sets — a median absorbs one stalled run
    // per query BY CONSTRUCTION, so a noisy host window can no longer
    // manufacture a flag, while a real regression (which moves every rep)
    // still reads true. The first rep still pays one-shot codegen/cache
    // warmup the later reps don't, which is exactly why the median (not
    // the mean) is the steady-state number a cluster would see.
    // `--best-of-2` (or SPARK_GRAFT_BENCH_MODE=best_of_2) keeps the
    // pre-r17 mode for anchor-compatibility comparisons during cutover;
    // `--reps N` / SPARK_GRAFT_BENCH_REPS overrides the rep count.
    // cheap-first (QueryCost anchors): the run order is also the JSON dict
    // order, so the driver's 2 KB TAIL-truncated artifact always retains the
    // expensive families' readings (VERDICT r09 #8 — lexicographic order put
    // q100+ in the truncated half); total/errors/n_failed/recall/summary
    // still land last on the line, where the tail keeps them.
    val bestOf2 = args.contains("--best-of-2") ||
      sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("best_of_2")
    val explicitReps = args.sliding(2).collectFirst { case Array("--reps", n) => n.toInt }
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt))
    // conflicting modes must fail, not silently pick one (r17 review:
    // `--best-of-2 --reps 5` used to run 2 reps with no warning)
    require(
      !(bestOf2 && explicitReps.isDefined),
      "--best-of-2 and --reps are mutually exclusive (best-of-2 is exactly 2 reps, min)"
    )
    val reps = if (bestOf2) 2 else explicitReps.getOrElse(3)
    require(reps >= 1, s"need --reps >= 1, got $reps")
    val benchMode = if (bestOf2) "best_of_2" else s"median_of_$reps"
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val ordered = QueryCost.orderedCheapFirst(SparkEntry.queries.keys)
    val queryFns = SparkEntry.queries
    // (name, reported, all reps, error)
    val results = ordered.map(name => (name, queryFns(name))).map { case (name, fn) =>
      // per-query honesty: drop cache entries leaked by EARLIER queries
      // (CacheManager dedups identical persisted plans, so without this the
      // later dedup-family queries silently ride caches the earlier ones
      // warmed and their timings look better than a cold run). Within the
      // query, the reps still measure the steady state it builds itself.
      spark.catalog.clearCache()
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val runs = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      var i = 0
      while (i < reps && err.isEmpty) {
        val (t, e) = once()
        err = e
        if (e.isEmpty) runs += t
        i += 1
      }
      val reported =
        if (runs.isEmpty) 0.0
        else if (bestOf2) runs.min
        else median(runs.toSeq)
      (name, reported, runs.toSeq, err)
    }
    val ok = results.filter(_._4.isEmpty)
    val qs = ok
      .map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    val errs = results.collect { case (k, _, _, Some(m)) => "\"" + k + "\":\"" + esc(m) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    // measured ANN quality next to the timings (VERDICT r01: correct-vs-
    // mirror is not correct-vs-purpose) — recall@10 of each approximate
    // path against exact brute force on this scale factor
    def recallOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = recallOf(graft.operators.Similarity.bruteForceTopK(emb, qids, 10))
    def recall(approx: Set[(Long, Long)]): Double = (exact & approx).size.toDouble / exact.size
    val rLsh = recall(recallOf(graft.operators.Similarity.annLsh(emb, qids, 10)))
    val rIvf = recall(recallOf(graft.operators.Similarity.annIvf(emb, qids, 10)))
    // the board summary rides the END of the line (VERDICT r15 №8): the
    // driver's artifact keeps only the LAST ~2 KB of stdout, so the
    // leading "metric"/"value" headline is exactly what truncation eats —
    // repeating the totals after "sf" makes the retained tail
    // self-sufficient ("parsed": null stops mattering)
    val summary =
      s""""summary":{"total_sec":${f"$total%.3f"},"n_queries":${results.length},"n_ok":${ok.length},"n_failed":${results.length - ok.length},"bench_mode":"$benchMode","reps":$reps}"""
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","bench_mode":"$benchMode","queries":$qs,"errors":$errs,"n_failed":${results.length - ok.length},"recall_at_10":{"ann_lsh":${f"$rLsh%.3f"},"ann_ivf":${f"$rIvf%.3f"}},"sf":"$sfDir",$summary}"""
    println(json)
    // sbt wraps stdout lines in "[info] " — a consumer grepping for a bare
    // JSON line never finds one. Emit the same line to a file (path
    // overridable via SPARK_GRAFT_BENCH_OUT) so the result is parseable
    // regardless of what log framework wraps the streams.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    // full per-query rep spread (min/med/max) rides a SIDE file, not the
    // stdout line: the driver keeps only the line's last ~2 KB, and
    // tripling the per-query payload would push most of the board out of
    // the retained tail — the spread is a local diagnosis artifact
    val stats = ok
      .map { case (k, _, runs, _) =>
        // "med" is the true median of the reps in EVERY mode — in
        // best-of-2 the REPORTED number is the min, and writing that
        // into "med" would hand a wrong median to anyone diagnosing
        // rep spread from this file (r17 review)
        "\"" + k + "\":{" +
          f""""min":${runs.min}%.3f,"med":${median(runs.toSeq)}%.3f,"max":${runs.max}%.3f""" + "}"
      }
      .mkString(
        s"""{"bench_mode":"$benchMode","reps":$reps,"sf":"$sfDir","queries":{""",
        ",",
        "}}"
      )
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      )
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath.stripSuffix(".json") + ".stats.json"),
        (stats + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      )
    } catch {
      case e: Exception => System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    if (results.length != ok.length) sys.exit(1)
  }
}
