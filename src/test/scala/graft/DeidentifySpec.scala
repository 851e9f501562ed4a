package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Deidentify

/** Laws of the de-identification tier: referential consistency of
  * pseudonyms across tables, order-leak resistance, per-entity interval
  * preservation under date shifting, floor-banding of negatives,
  * k-anonymity suppression exactness (incl. NULL quasi values — the
  * null-safe join), and the l-diversity/cell-size interaction.
  */
class DeidentifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val cust = sources.Tables.load(spark, Sf001, "customer")
  private lazy val ords = sources.Tables.load(spark, Sf001, "orders")

  /** Driver-side replay of [[Deidentify.dpCellUniform]]'s KEY string:
    * netstring-style length-prefixed components, '|'-joined (the
    * injective encoding that fixed the VERDICT r13 separator collision).
    */
  // Driver-side replay of Deidentify.cellKeyExpr: non-NULL parts encode
  // `<charlen>:<value>`, a scala null encodes the bare `n` tag (outside
  // the digit-first value space, so NULL collides with NO string value)
  private def dpKey(parts: Seq[String], saltSuffix: String): String =
    "dp:" + parts.map(p => if (p == null) "n" else s"${p.length}:$p").mkString("|") + s":$saltSuffix"

  test("pseudonyms are referentially consistent across tables") {
    // pseudonymize the two tables independently, join on the pseudonym:
    // the (cust, order) pair set must equal the raw join's, pseudonymized
    val pc = Deidentify.pseudonymize(cust, Map("c_custkey" -> "cust"), "s1")
    val po = Deidentify.pseudonymize(ords, Map("o_custkey" -> "cust"), "s1")
    val viaPseud = po
      .join(pc, po("o_custkey") === pc("c_custkey"))
      .select(po("o_orderkey"), po("o_custkey"))
    val viaRaw = Deidentify.pseudonymize(
      ords.join(cust, ords("o_custkey") === cust("c_custkey")).select(ords("o_orderkey"), ords("o_custkey")),
      Map("o_custkey" -> "cust"),
      "s1"
    )
    assert(viaPseud.except(viaRaw).count() === 0L)
    assert(viaRaw.except(viaPseud).count() === 0L)
  }

  test("salt rotation retires the mapping; same salt is deterministic") {
    val a = Deidentify.pseudonymize(cust, Map("c_custkey" -> "cust"), "s1").select("c_custkey")
    val b = Deidentify.pseudonymize(cust, Map("c_custkey" -> "cust"), "s1").select("c_custkey")
    val c = Deidentify.pseudonymize(cust, Map("c_custkey" -> "cust"), "s2").select("c_custkey")
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
    assert(c.except(a).count() > 0L, "rotating the salt must change pseudonyms")
  }

  test("pseudonyms do not leak key order (remix32 avalanche)") {
    // sequential ids must NOT map to monotone pseudonyms: count inversions
    val rows = Deidentify
      .pseudonymize(
        spark.range(0, 200).withColumn("k", col("id")),
        Map("k" -> "person"),
        "s1"
      )
      .orderBy(col("id"))
      .select(col("k"))
      .collect()
      .map(_.getLong(0))
    val inversions = rows.sliding(2).count(p => p(1) < p(0))
    assert(inversions > 50, s"pseudonyms look monotone in the key: $inversions inversions of 199")
  }

  test("distinct domains pseudonymize the same value differently") {
    val df = Seq(5L).toDF("k")
    val a = Deidentify.pseudonymize(df, Map("k" -> "person"), "s1").head.getLong(0)
    val b = Deidentify.pseudonymize(df, Map("k" -> "visit"), "s1").head.getLong(0)
    assert(a !== b)
  }

  test("dateShift preserves within-entity intervals exactly, offsets bounded") {
    val shifted = Deidentify.dateShift(ords, "o_orderdate", "o_custkey", 30, "s1")
    val spanOf = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("o_custkey")
        .agg((unix_timestamp(max("o_orderdate")) - unix_timestamp(min("o_orderdate"))).as("span"))
    val bad = spanOf(ords)
      .withColumnRenamed("span", "raw_span")
      .join(spanOf(shifted), "o_custkey")
      .filter(col("span") =!= col("raw_span"))
      .count()
    assert(bad === 0L, "per-entity max-min span must survive the shift")
    val off = ords
      .select(col("o_orderkey"), col("o_orderdate").as("raw"))
      .join(shifted.select(col("o_orderkey"), col("o_orderdate").as("sh")), "o_orderkey")
      .select(((unix_timestamp(col("sh")) - unix_timestamp(col("raw"))) / 86400L).as("days"))
    assert(off.filter(abs(col("days")) > 30).count() === 0L)
    assert(
      off.select(countDistinct(col("days"))).head.getLong(0) > 10L,
      "offsets should vary across entities"
    )
  }

  test("dateShift same entity ⇒ same offset across tables (same domain+salt)") {
    val other = ords.select(col("o_custkey"), col("o_orderdate").as("ts"))
    val a = Deidentify
      .dateShift(ords, "o_orderdate", "o_custkey", 30, "s1")
      .select(col("o_custkey"), (unix_timestamp(col("o_orderdate"))).as("sa"), col("o_orderkey"))
    val b = Deidentify
      .dateShift(other, "ts", "o_custkey", 30, "s1")
      .select(col("o_custkey"), unix_timestamp(col("ts")).as("sb"))
    // both frames shift the same underlying timestamps: the multiset of
    // (custkey, shifted seconds) must agree
    val ja = a.select(col("o_custkey"), col("sa").as("s"))
    val jb = b.select(col("o_custkey"), col("sb").as("s"))
    assert(ja.except(jb).count() === 0L && jb.except(ja).count() === 0L)
  }

  test("dateShift accepts backtick-needing column names (ADVICE r11)") {
    // the old string-SQL form (`expr(s"timestampadd(DAY, …, $tsCol)")`)
    // either failed to parse names with dots/spaces/hyphens or silently
    // bound a dotted name to a nested field; the Column-API form must
    // treat every name literally and shift identically to the plain form
    val plain = ords.select(col("o_custkey"), col("o_orderdate").as("ts"))
    val weird = Seq("order.date", "order date", "order-date", "ts`tick")
    weird.foreach { name =>
      val df = plain.withColumnRenamed("ts", name)
      val shifted = Deidentify.dateShift(df, name, "o_custkey", 30, "s1")
      assert(shifted.columns.toSeq === df.columns.toSeq, s"schema preserved for '$name'")
      val want = Deidentify
        .dateShift(plain, "ts", "o_custkey", 30, "s1")
        .select(col("o_custkey"), col("ts").as(name))
      assert(shifted.except(want).count() === 0L && want.except(shifted).count() === 0L,
        s"'$name' must shift exactly like the plain column")
    }
    // a missing column fails fast instead of producing a confusing parse error
    intercept[IllegalArgumentException](Deidentify.dateShift(plain, "nope", "o_custkey", 30, "s1"))
  }

  test("generalize floors negatives into the correct band") {
    val df = Seq(-0.5, 0.0, 1999.99, 2000.0, -2000.0).toDF("v")
    val bands = Deidentify.generalize(df, "v", 2000L, "band").select("v", "band").collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(bands(-0.5) === "[-2000,0)")
    assert(bands(0.0) === "[0,2000)")
    assert(bands(1999.99) === "[0,2000)")
    assert(bands(2000.0) === "[2000,4000)")
    assert(bands(-2000.0) === "[-2000,0)")
  }

  test("suppressSmallGroups: exactly the cells under k suppressed, rows preserved") {
    val g = Deidentify.generalize(cust, "c_acctbal", 2000L, "band")
    val out = Deidentify.suppressSmallGroups(g, Seq("c_nationkey", "band"), 5L)
    assert(out.count() === cust.count(), "suppression must never drop rows")
    // recompute cell sizes from the raw frame and check the flag exactly
    val sizes = g
      .groupBy("c_nationkey", "band")
      .agg(count(lit(1)).as("n"))
    val flagged = g
      .join(sizes, Seq("c_nationkey", "band"))
      .select(col("c_custkey"), (col("n") < 5).as("want"))
    val got = out.select(col("c_custkey"), col("suppressed"))
    assert(flagged.join(got, "c_custkey").filter(col("want") =!= col("suppressed")).count() === 0L)
    // suppressed rows carry NULL quasi columns; kept rows carry originals
    assert(out.filter(col("suppressed") && (col("c_nationkey").isNotNull || col("band").isNotNull)).count() === 0L)
    assert(out.filter(!col("suppressed") && (col("c_nationkey").isNull || col("band").isNull)).count() === 0L)
  }

  test("suppressSmallGroups is NULL-safe on quasi values") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, Some("a")),
      (4L, None), (5L, None), (6L, None),
      (7L, Some("b"))
    ).toDF("id", "q")
    val out = Deidentify.suppressSmallGroups(df, Seq("q"), 2L)
    // the three NULL-q rows form ONE cell of size 3 ≥ 2: kept
    assert(out.filter(col("id").isin(4L, 5L, 6L) && col("suppressed")).count() === 0L)
    // the singleton 'b' cell is suppressed
    assert(out.filter(col("id") === 7L && !col("suppressed")).count() === 0L)
    assert(out.count() === 7L)
  }

  test("lDiversityAudit: ok iff distinct sensitive ≥ l; small cells can't pass") {
    val df = Seq(
      ("x", "s1"), ("x", "s2"), ("x", "s3"),
      ("y", "s1"), ("y", "s1"), ("y", "s1"),
      ("z", "s1"), ("z", "s2")
    ).toDF("quasi", "sens")
    val rows = Deidentify
      .lDiversityAudit(df, Seq("quasi"), "sens", 3L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(rows("x") === ((3L, 3L, true)))
    assert(rows("y") === ((3L, 1L, false)))
    assert(rows("z") === ((2L, 2L, false)), "a 2-row cell can never be 3-diverse")
  }

  test("scan-side operators add no exchange; suppression has exactly one shuffle key") {
    val p1 = Deidentify
      .pseudonymize(cust, Map("c_custkey" -> "cust"), "s1")
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"pseudonymize must be scan-only:\n$p1")
    val p2 = Deidentify
      .dateShift(ords, "o_orderdate", "o_custkey", 30, "s1")
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"dateShift must be scan-only:\n$p2")
  }

  test("topCode: clamp + flag, interior untouched, type preserved") {
    val df = Seq(88.0, 89.0, 90.0, 93.0, 101.0).toDF("age")
    val out = Deidentify.topCode(df, "age", 90L)
      .collect().map(r => (r.getDouble(0), r.getBoolean(1))).toSet
    assert(out === Set((88.0, false), (89.0, false), (90.0, true), (90.0, true)))
    val ints = Seq(85, 95).toDF("age")
    val outInts = Deidentify.topCode(ints, "age", 90L).collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).toSet
    assert(outInts === Set((85, false), (90, true)), "integer column stays integer")
  }

  test("suppressAgainstCounts: judged by the SNAPSHOT's census, unseen cells suppressed") {
    val snapshot = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b")
    ).toDF("id", "q")
    val counts = Deidentify.cellCounts(snapshot, Seq("q"))
    val late = Seq((10L, "a"), (11L, "b"), (12L, "c")).toDF("id", "q")
    val out = Deidentify
      .suppressAgainstCounts(late, counts, Seq("q"), 2L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2))).toSet
    // "a" has 3 snapshot members: kept; "b" has 1: suppressed; "c" unseen: suppressed
    assert(out === Set((10L, Some("a"), false), (11L, None, true), (12L, None, true)))
    // against its OWN batch every late row would have been suppressed (cells of 1)
    val own = Deidentify.suppressSmallGroups(late, Seq("q"), 2L)
    assert(own.filter(!col("suppressed")).count() === 0L)
    // law: suppressSmallGroups == suppressAgainstCounts on the frame's own census
    val viaAgainst = Deidentify
      .suppressAgainstCounts(snapshot, counts, Seq("q"), 2L)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    val direct = Deidentify.suppressSmallGroups(snapshot, Seq("q"), 2L)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(viaAgainst === direct)
  }

  test("riskAudit: hand-checked subsets, NULL cell counted, grand total excluded") {
    val df = Seq(
      (1L, Some("a"), "x"),
      (2L, Some("a"), "x"),
      (3L, Some("a"), "y"),
      (4L, Some("b"), "y"),
      (5L, None, "y")
    ).toDF("id", "q1", "q2")
    val out = Deidentify.riskAudit(df, Seq("q1", "q2"), 2L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .map { case (s, a, b, c, d) => s -> ((a, b, c, d)) }
      .toMap
    // q1 alone: cells a=3, b=1, NULL=1 -> 3 cells, 2 singletons, 2 risky rows, min 1
    assert(out("q1") === ((3L, 2L, 2L, 1L)))
    // q2 alone: x=2, y=3 -> no risk
    assert(out("q2") === ((2L, 0L, 0L, 2L)))
    // both: (a,x)=2 (a,y)=1 (b,y)=1 (NULL,y)=1 -> 4 cells, 3 singletons, 3 risky
    assert(out("q1,q2") === ((4L, 3L, 3L, 1L)))
    // exactly the 2^2 - 1 non-empty subsets; the grand total is not an attack
    assert(out.size === 3)
    intercept[IllegalArgumentException](Deidentify.riskAudit(df, Seq("q1"), 2L))
  }

  test("tClosenessAudit: hand-checked EMD, identical-to-global cell reads 0, NULL sensitive excluded") {
    // global over v: {0 -> 2, 1000 -> 2}; m=2, N=4
    val df = Seq(
      ("A", Some(0L)), ("A", Some(0L)),         // cell A: all mass at 0
      ("B", Some(1000L)), ("B", Some(1000L)),   // cell B: all mass at 1000
      ("C", None)                               // NULL sensitive: excluded entirely
    ).toDF("q", "v")
    val out = Deidentify.tClosenessAudit(df, Seq("q"), "v", 400000L)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // cell A: prefix v=0: |2*4 - 2*2| = 4; v=1000: |2*4 - 4*2| = 0; S=4
    // emd = 4*1e6 / (2*4*(2-1)) = 500000
    assert(out("A") === ((2L, 500000L, false)))
    assert(out("B") === ((2L, 500000L, false)))
    // cell C had only NULL sensitive values -> absent from the report
    assert(out.size === 2)
    // a cell distributed exactly like the global reads 0
    val bal = Seq(("A", 0L), ("A", 1000L), ("B", 0L), ("B", 1000L)).toDF("q", "v")
    val out2 = Deidentify.tClosenessAudit(bal, Seq("q"), "v", 0L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(out2.forall { case (_, e, ok) => e == 0L && ok })
    // single-value domain (m=1): EMD defined as 0
    val mono = Seq(("A", 7L), ("B", 7L)).toDF("q", "v")
    assert(
      Deidentify.tClosenessAudit(mono, Seq("q"), "v", 0L)
        .collect().forall(_.getLong(2) == 0L)
    )
    intercept[IllegalArgumentException](Deidentify.tClosenessAudit(df, Seq.empty, "v", 1L))
    intercept[IllegalArgumentException](Deidentify.tClosenessAudit(df, Seq("q"), "v", -1L))
  }

  test("tClosenessCategorical: hand-checked TVD, identical cell reads 0, NULL excluded") {
    // global: {x -> 2, y -> 2}; cell A all-x: TVD = ½(|1−½| + |0−½|) = ½
    val df = Seq(
      ("A", Some("x")), ("A", Some("x")),
      ("B", Some("y")), ("B", Some("y")),
      ("C", None)
    ).toDF("q", "v")
    val out = Deidentify.tClosenessCategorical(df, Seq("q"), "v", 400000L)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("A") === ((2L, 500000L, false)))
    assert(out("B") === ((2L, 500000L, false)))
    assert(out.size === 2, "all-NULL-sensitive cell absent")
    val bal = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y")).toDF("q", "v")
    assert(
      Deidentify.tClosenessCategorical(bal, Seq("q"), "v", 0L)
        .collect().forall(r => r.getLong(2) == 0L && r.getBoolean(3))
    )
    // TVD is order-free: == the ordered EMD only when m = 2 (single prefix)
    intercept[IllegalArgumentException](Deidentify.tClosenessCategorical(df, Seq.empty, "v", 1L))
    intercept[IllegalArgumentException](Deidentify.tClosenessCategorical(df, Seq("q"), "v", -1L))
  }

  test("truncateDates: uniform truncation, no secret, scan-only; bad unit fails fast") {
    val df = Seq(
      Timestamp.valueOf("2024-03-17 10:30:00"),
      Timestamp.valueOf("2024-03-01 00:00:00"),
      Timestamp.valueOf("2023-12-31 23:59:59")
    ).toDF("ts")
    val byMonth = Deidentify.truncateDates(df, "ts", "month")
      .collect().map(_.getTimestamp(0).toString).toSet
    assert(byMonth === Set("2024-03-01 00:00:00.0", "2023-12-01 00:00:00.0"))
    val byYear = Deidentify.truncateDates(df, "ts", "year")
      .collect().map(_.getTimestamp(0).toString).toSet
    assert(byYear === Set("2024-01-01 00:00:00.0", "2023-01-01 00:00:00.0"))
    val plan = Deidentify.truncateDates(df, "ts", "year").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "truncation is scan-only")
    intercept[IllegalArgumentException](Deidentify.truncateDates(df, "ts", "day"))
  }

  test("dpNoiseLut: a valid inverse-CDF table of the two-sided geometric") {
    // the LUT is the mechanism — pin its mathematical shape, not samples
    val epsMicro = 1000000L // ε = 1
    val (kk, ts) = Deidentify.dpNoiseLut(epsMicro)
    assert(ts.size === 2 * kk)
    assert(ts === ts.sorted, "CDF thresholds must be non-decreasing")
    // the head may round to 0 (tail mass below half a u32 grid unit)
    assert(ts.head >= 0L && ts.last <= 4294967296L)
    val alpha = math.exp(-1.0)
    // truncation bound: the two-sided tail beyond ±K is below 2^-33
    assert(2.0 * math.pow(alpha, kk + 1) / (1 + alpha) < math.pow(2.0, -33))
    // the zero-noise mass (t_0 − t_{−1}) is (1−α)/(1+α) of the u32 domain
    val p0 = (ts(kk) - ts(kk - 1)).toDouble / 4294967296.0
    assert(math.abs(p0 - (1 - alpha) / (1 + alpha)) < 1e-6, s"P(Z=0) read $p0")
    // geometric decay: each step away from 0 scales the mass by α (check
    // the first three steps on both sides, within rounding of the u32 grid)
    (1 to 3).foreach { k =>
      val right = (ts(kk + k) - ts(kk + k - 1)).toDouble / (ts(kk + k - 1) - ts(kk + k - 2))
      val left = (ts(kk - k) - ts(kk - k - 1)).toDouble / (ts(kk - k + 1) - ts(kk - k))
      assert(math.abs(right - alpha) < 1e-3, s"right decay at $k read $right")
      assert(math.abs(left - alpha) < 1e-3, s"left decay at $k read $left")
    }
    intercept[IllegalArgumentException](Deidentify.dpNoiseLut(9999L))
    intercept[IllegalArgumentException](Deidentify.dpNoiseLut(20000001L))
  }

  test("dpCellCounts: exact inverse-CDF replay, determinism, post-processing clamp") {
    import graft.functions.Kernels
    val epsMicro = 500000L // ε = 0.5 — wide noise so small cells exercise the clamp
    val (kk, ts) = Deidentify.dpNoiseLut(epsMicro)
    val g = Deidentify.generalize(cust, "c_acctbal", 2000L, "bal_band")
    val quasi = Seq("c_nationkey", "bal_band")
    def cellMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("c_nationkey").cast("long"), col("bal_band"), col("n_dp"), col("epsilon_micro"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val out = cellMap(Deidentify.dpCellCounts(g, quasi, epsMicro, "spec"))
    // 1) the released value is EXACTLY clamp(n + invCdf(u), 0) — replay the
    //    whole mechanism independently in driver-side Scala from raw counts
    val raw = g
      .groupBy(col("c_nationkey").cast("long").as("k"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out.keySet === raw.keySet, "every cell released, none invented")
    var clamped = 0
    var zs = List.empty[Long]
    raw.foreach { case (cell @ (nat, band), n) =>
      val u = Kernels.remix32(Kernels.polyHash(dpKey(Seq(nat.toString, band), "spec")))
      val z = -kk + ts.count(_ <= u)
      zs ::= z.toLong
      val expect = math.max(n + z, 0L)
      if (n + z < 0L) clamped += 1
      assert(out(cell) === ((expect, epsMicro)), s"cell $cell: n=$n u=$u z=$z")
    }
    // 2) the noise is genuinely two-sided and bounded by the truncation
    assert(zs.forall(z => z >= -kk && z <= kk))
    assert(zs.exists(_ > 0) && zs.exists(_ < 0), "both noise signs present")
    // 3) determinism: same salt bit-identical, rotated salt re-noises
    assert(cellMap(Deidentify.dpCellCounts(g, quasi, epsMicro, "spec")) === out)
    val rotated = cellMap(Deidentify.dpCellCounts(g, quasi, epsMicro, "spec2"))
    assert(rotated.exists { case (cell, v) => out(cell)._1 != v._1 }, "salt rotation must re-noise")
    // 4) post-processing: never negative (and this corpus has small cells,
    //    so at ε=0.5 the clamp really fires — if it never does, the law
    //    above degenerates and the fixture should change)
    assert(out.values.forall(_._1 >= 0L))
    assert(clamped > 0, s"fixture too uniform: no cell hit the clamp (cells=${raw.size})")
    // 5) NULL quasi values key via the bare `n` tag — an all-NULL cell is
    //    a cell, and the tag sits outside the length-prefixed value space
    //    so NULL collides with NO string (r14 ADVICE: the old ␀ sentinel
    //    shared `1:␀` with the literal string "␀" — one noise draw for
    //    two distinct cells, the correlated-noise leak class)
    import spark.implicits._
    val withNull = Seq((Some(1L), "a"), (None, "a"), (None, "a")).toDF("k", "v")
    val dpNull = Deidentify.dpCellCounts(withNull, Seq("k"), epsMicro, "spec")
    assert(dpNull.count() === 2L)
    val uNull = Kernels.remix32(Kernels.polyHash(dpKey(Seq(null), "spec")))
    val zNull = -kk + ts.count(_ <= uNull)
    assert(
      dpNull.filter(col("k").isNull).select("n_dp").head().getLong(0)
        === math.max(2L + zNull, 0L)
    )
    // NULL and the literal sentinel string are DIFFERENT cells with
    // INDEPENDENT draws — both replay exactly
    val sentinel = Seq(Option("␀"), Option("␀"), None, None).toDF("k")
    val dpSent = Deidentify.dpCellCounts(sentinel, Seq("k"), epsMicro, "spec")
    val uSent = Kernels.remix32(Kernels.polyHash(dpKey(Seq("␀"), "spec")))
    assert(uSent !== uNull, "NULL and literal-sentinel cells must draw from different streams")
    val zSent = -kk + ts.count(_ <= uSent)
    assert(dpSent.filter(col("k") === "␀").select("n_dp").head().getLong(0)
      === math.max(2L + zSent, 0L))
    assert(dpSent.filter(col("k").isNull).select("n_dp").head().getLong(0)
      === math.max(2L + zNull, 0L))
    intercept[IllegalArgumentException](Deidentify.dpCellCounts(g, Seq(), epsMicro, "s"))
  }

  test("dpClosedHistogram: every domain cell released (absent → noised 0), out-of-domain dropped") {
    import graft.functions.Kernels
    import spark.implicits._
    val epsMicro = 1000000L
    val (kk, ts) = Deidentify.dpNoiseLut(epsMicro)
    // observed: (a,1) x3, (b,2) x2, (c,9) x1; domain: {a,b} x {1,2} —
    // (a,2)/(b,1) are EMPTY domain cells (must appear, noised from 0);
    // (c,9) is outside the domain (must be dropped — the release contract)
    val df = Seq(("a", 1L), ("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L), ("c", 9L)).toDF("k", "band")
    val domain = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("k", "band")
    val out = Deidentify
      .dpClosedHistogram(df, domain, Seq("k", "band"), epsMicro, "spec")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out.keySet === Set(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)))
    // exact replay per domain cell, including the empty ones from n=0
    val raw = Map(("a", 1L) -> 3L, ("a", 2L) -> 0L, ("b", 1L) -> 0L, ("b", 2L) -> 2L)
    raw.foreach { case (cell @ (k, band), n) =>
      val u = Kernels.remix32(Kernels.polyHash(dpKey(Seq(k, band.toString), "spec")))
      val z = -kk + ts.count(_ <= u)
      assert(out(cell) === math.max(n + z, 0L), s"cell $cell n=$n z=$z")
    }
    // an empty cell is indistinguishable in KIND from a small one: both
    // are plain n_dp values, no null/flag distinguishing support
    assert(out.values.forall(_ >= 0L))
    intercept[IllegalArgumentException](
      Deidentify.dpClosedHistogram(df, domain.select("k"), Seq("k", "band"), epsMicro, "s")
    )
  }

  test("dpCellSums: clip bounds the contribution, draw at sensitivity clip, independent of count draws") {
    import graft.functions.Kernels
    import spark.implicits._
    val (epsMicro, clip) = (2000000L, 4L)
    val (kk, ts) = Deidentify.dpNoiseLut(epsMicro / clip)
    // values straddle the clip range: -5 clamps to 0, 9 clamps to 4
    val df = Seq(("a", -5L), ("a", 9L), ("a", 3L), ("b", 2L), ("b", 100L)).toDF("k", "v")
    val out = Deidentify
      .dpCellSums(df, Seq("k"), "v", clip, epsMicro, "spec")
      .select("k", "sum_dp", "epsilon_micro", "clip")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val rawSums = Map("a" -> (0L + 4L + 3L), "b" -> (2L + 4L))
    rawSums.foreach { case (cell, s) =>
      val u = Kernels.remix32(Kernels.polyHash(dpKey(Seq(cell), "spec:sum:v")))
      val z = -kk + ts.count(_ <= u)
      assert(out(cell) === ((math.max(s + z, 0L), epsMicro, clip)), s"cell $cell s=$s z=$z")
    }
    // the sum draw and the count draw over the SAME cells use different
    // keys — a joint count+sum release must not reuse one noise stream
    val uCount = Kernels.remix32(Kernels.polyHash(dpKey(Seq("a"), "spec")))
    val uSum = Kernels.remix32(Kernels.polyHash(dpKey(Seq("a"), "spec:sum:v")))
    assert(uCount !== uSum)
    // sensitivity scaling is real: the sum LUT (ε/Δ) is wider than the
    // count LUT (ε) — more noise for a larger per-individual influence
    assert(ts.size > Deidentify.dpNoiseLut(epsMicro)._2.size)
    intercept[IllegalArgumentException](Deidentify.dpCellSums(df, Seq("k"), "v", 0L, epsMicro, "s"))
  }

  test("boundContributions: per-release and per-cell caps, deterministic, salted, subset") {
    import graft.functions.Kernels
    // 4 entities with 1..8 rows each; two quasi cells per entity
    val rows = for {
      e <- 1L to 4L
      i <- 1L to (2 * e)
    } yield (e, e * 100 + i, if (i % 2 == 0) "a" else "b")
    val df = rows.toDF("ent", "id", "cell")
    val perRelease = Deidentify.boundContributions(df, "ent", "id", 3, "s1")
    // cap enforced per entity; entities under the cap keep every row
    val byEnt = perRelease.groupBy("ent").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byEnt === Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // output is a SUBSET of the input (never invents or mutates rows)
    assert(perRelease.except(df).count() === 0L)
    // deterministic: bit-identical on re-run
    val again = Deidentify.boundContributions(df, "ent", "id", 3, "s1")
    assert(perRelease.except(again).count() === 0L && again.except(perRelease).count() === 0L)
    // the kept set is the salted-hash top-cap, exactly (driver replay)
    val keptIds = perRelease.select("id").collect().map(_.getLong(0)).toSet
    val wantIds = rows.groupBy(_._1).values.flatMap { g =>
      g.map(_._2).sortBy(id => (Kernels.remix32(Kernels.polyHash(s"bc:$id:s1")), id)).take(3)
    }.toSet
    assert(keptIds === wantIds)
    // salt rotation re-draws the kept subset (pinned on this fixture)
    val rot = Deidentify.boundContributions(df, "ent", "id", 3, "s2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rot !== keptIds, "rotating the rank salt must change the kept subset")
    // per-CELL mode: ≤ cap rows per (entity, cell), entity totals may exceed
    val perCell = Deidentify.boundContributions(df, "ent", "id", 2, "s1", withinCols = Seq("cell"))
    val byEntCell = perCell.groupBy("ent", "cell").count().collect().map(_.getLong(2))
    assert(byEntCell.forall(_ <= 2L))
    assert(
      perCell.groupBy("ent").count().filter(col("count") > 2).count() > 0L,
      "per-cell bounding must allow entity totals above the per-cell cap"
    )
    intercept[IllegalArgumentException](Deidentify.boundContributions(df, "ent", "id", 0, "s"))
    intercept[IllegalArgumentException](Deidentify.boundContributions(df, "nope", "id", 1, "s"))
  }

  test("dpUserCellCounts: ε-claim valid ⇔ contributions bounded (user-level DP law)") {
    import graft.functions.Kernels
    // a genuinely multi-row-per-individual frame: entity 1 owns 6 of 9 rows —
    // under dpCellCounts' unit-contribution assumption its removal would
    // shift a cell count by 6 with sensitivity-1 noise (the ε claim breaks)
    val df = Seq(
      (1L, 11L, "x"), (1L, 12L, "x"), (1L, 13L, "x"),
      (1L, 14L, "y"), (1L, 15L, "y"), (1L, 16L, "y"),
      (2L, 21L, "x"), (3L, 31L, "y"), (4L, 41L, "x")
    ).toDF("ent", "id", "cell")
    val (cap, epsMicro) = (2, 2000000L)
    val out = Deidentify
      .dpUserCellCounts(df, "ent", "id", Seq("cell"), cap, epsMicro, "spec")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // replay the WHOLE mechanism driver-side: bound (salted-hash top-cap per
    // entity), census, then the geometric draw at ε/cap
    val bounded = Seq(11L, 12L, 13L, 14L, 15L, 16L).map(id => (1L, id))
      .sortBy { case (_, id) => (Kernels.remix32(Kernels.polyHash(s"bc:$id:spec:bound")), id) }
      .take(cap)
      .map(_._2).toSet ++ Set(21L, 31L, 41L)
    val cells = df.collect()
      .map(r => (r.getLong(1), r.getString(2)))
      .filter { case (id, _) => bounded.contains(id) }
      .groupBy(_._2).map { case (c, g) => c -> g.length.toLong }
    val (kk, ts) = Deidentify.dpNoiseLut(epsMicro / cap)
    cells.foreach { case (cell, n) =>
      val u = Kernels.remix32(Kernels.polyHash(dpKey(Seq(cell), "spec")))
      val z = -kk + ts.count(_ <= u)
      assert(out(cell) === ((math.max(n + z, 0L), epsMicro, cap.toLong)), s"cell $cell n=$n z=$z")
    }
    // the LAW: after bounding, NO entity contributes more than cap rows —
    // the L1-sensitivity-≤-cap accounting the ε claim rests on — and the
    // noise really is drawn at ε/cap (wider LUT than the unit-ε mechanism)
    val maxContrib = Deidentify
      .boundContributions(df, "ent", "id", cap, "spec:bound")
      .groupBy("ent").count().agg(max("count")).head().getLong(0)
    assert(maxContrib <= cap.toLong)
    assert(ts.size > Deidentify.dpNoiseLut(epsMicro)._2.size,
      "user-level noise must be wider than the unit-contribution LUT")
    // output schema carries the claim's parameters for the audit trail
    assert(out.values.forall { case (_, e, c) => e == epsMicro && c == cap.toLong })
    intercept[IllegalArgumentException](
      Deidentify.dpUserCellCounts(df, "ent", "id", Seq("cell"), 0, epsMicro, "s"))
    intercept[IllegalArgumentException](
      Deidentify.dpUserCellCounts(df, "ent", "id", Seq("cell"), 250, epsMicro, "s"))
  }

  test("dpUserCellSums: bound × clip = the full influence cap, exact replay") {
    import graft.functions.Kernels
    // entity 1 owns 4 rows with large values — unbounded, it moves its
    // cell's sum by 4·clip even after clipping; the bound caps that at
    // cap·clip (the user-level L1 argument)
    val df = Seq(
      (1L, 11L, "x", 100L), (1L, 12L, "x", 100L), (1L, 13L, "x", 100L), (1L, 14L, "x", 100L),
      (2L, 21L, "x", 2L), (3L, 31L, "y", -7L), (4L, 41L, "y", 3L)
    ).toDF("ent", "id", "cell", "v")
    val (cap, clip, epsMicro) = (2, 4L, 4000000L)
    val out = Deidentify
      .dpUserCellSums(df, "ent", "id", Seq("cell"), "v", clip, cap, epsMicro, "spec")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // driver-side replay: bound (salted-hash top-cap), clamp, sum, LUT at ε/(cap·clip)
    val keptIds = Seq(11L, 12L, 13L, 14L)
      .sortBy(id => (Kernels.remix32(Kernels.polyHash(s"bc:$id:spec:bound")), id))
      .take(cap).toSet ++ Set(21L, 31L, 41L)
    val sums = df.collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
      .filter { case (id, _, _) => keptIds.contains(id) }
      .groupBy(_._2)
      .map { case (c, g) => c -> g.map(t => math.max(math.min(t._3, clip), 0L)).sum }
    val (kk, ts) = Deidentify.dpNoiseLut(epsMicro / (cap * clip))
    sums.foreach { case (cell, s) =>
      val u = Kernels.remix32(Kernels.polyHash(dpKey(Seq(cell), "spec:sum:v")))
      val z = -kk + ts.count(_ <= u)
      assert(out(cell) === ((math.max(s + z, 0L), epsMicro, clip, cap.toLong)), s"cell $cell s=$s z=$z")
    }
    // entity 1's influence really is capped: its cell's bounded raw sum is
    // cap·clip, not 4·clip
    assert(sums("x") === cap * clip + 2L)
    // LUT is wider than the row-level dpCellSums LUT at the same ε (the
    // extra cap factor in the sensitivity is real noise, not bookkeeping)
    assert(ts.size > Deidentify.dpNoiseLut(epsMicro / clip)._2.size)
    intercept[IllegalArgumentException](
      Deidentify.dpUserCellSums(df, "ent", "id", Seq("cell"), "v", clip, 0, epsMicro, "s"))
    intercept[IllegalArgumentException](
      Deidentify.dpUserCellSums(df, "ent", "id", Seq("cell"), "v", 400L, 10, epsMicro, "s"))
  }

  test("dpQuantiles: pure post-processing — hand-checked convention, ε carried, NULL on empty") {
    import graft.functions.Kernels
    // dpQuantiles consumes ANY released histogram frame, so the convention
    // is pinned on a hand-built one: cell A bands 0/10/20 with noised
    // counts 2/5/3 (total 10 → p250 at cum 2.5 ⇒ band 10 (cum·1000=2000 <
    // 2500 at band 0); p500 at cum 5 ⇒ band 10 EXACTLY (7000 ≥ 5000... the
    // lower rule: band 10 has cum 7 ⇒ 7000 ≥ 5000, band 0 has 2000 < 5000));
    // cell B is all-zero (clamped away) ⇒ NULL band, row kept
    val rel = Seq(
      ("A", 0L, 2L), ("A", 10L, 5L), ("A", 20L, 3L),
      ("B", 0L, 0L), ("B", 10L, 0L)
    ).toDF("q", "band", "n_dp").withColumn("epsilon_micro", lit(1000000L))
    val out = Deidentify.dpQuantiles(rel, Seq("q"), "band", Seq(250, 500, 1000))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(("A", 250)) === ((Some(10L), 10L, 1000000L)))
    assert(out(("A", 500)) === ((Some(10L), 10L, 1000000L)))
    assert(out(("A", 1000)) === ((Some(20L), 10L, 1000000L)))
    // exact boundary: cum·1000 == total·p counts as reached (>=, the q86 rule)
    val exact = Seq(("C", 0L, 1L), ("C", 10L, 3L)).toDF("q", "band", "n_dp")
      .withColumn("epsilon_micro", lit(1L))
    assert(
      Deidentify.dpQuantiles(exact, Seq("q"), "band", Seq(250))
        .head().get(2) === 0L, "cum 1 of 4 reaches p250 exactly at band 0"
    )
    // the all-zero cell reports, with a NULL band (auditable, not dropped)
    assert(out(("B", 500)) === ((None, 0L, 1000000L)))
    // a NULL band is excluded from domain AND totals (engines disagree on
    // where a NULL would sort — the contract forbids it, sentinel instead)
    val withNullBand = Seq(("D", Some(0L), 6L), ("D", None, 100L), ("D", Some(10L), 2L))
      .toDF("q", "band", "n_dp").withColumn("epsilon_micro", lit(1L))
    val d = Deidentify.dpQuantiles(withNullBand, Seq("q"), "band", Seq(500))
      .head()
    assert(d.get(2) === 0L, "p500 of 6/2 over non-null bands is band 0")
    assert(d.getLong(3) === 8L, "the NULL band's count must not enter the total")
    // composed with the real mechanism: replay histogram + quantile driver-side
    val g = cust.withColumn("bal_lo", (floor(col("c_acctbal") / 2000d) * 2000).cast("long"))
    val (kk, ts) = Deidentify.dpNoiseLut(2000000L)
    val noised = g.groupBy("c_mktsegment", "bal_lo").count().collect()
      .map { r =>
        val (seg, lo, n) = (r.getString(0), r.getLong(1), r.getLong(2))
        val u = Kernels.remix32(Kernels.polyHash(dpKey(Seq(seg, lo.toString), "spec")))
        (seg, lo, math.max(n + (-kk + ts.count(_ <= u)), 0L))
      }
    val want = noised.groupBy(_._1).flatMap { case (seg, cells) =>
      val sorted = cells.sortBy(_._2)
      val total = sorted.map(_._3).sum
      val cums = sorted.map(_._3).scanLeft(0L)(_ + _).tail
      Seq(250, 500, 750).map { p =>
        val band = sorted.map(_._2).zip(cums)
          .collectFirst { case (lo, cum) if total > 0 && cum * 1000 >= total * p => lo }
        (seg, p) -> band
      }
    }.toMap
    val got = Deidentify
      .dpQuantiles(
        Deidentify.dpCellCounts(g, Seq("c_mktsegment", "bal_lo"), 2000000L, "spec"),
        Seq("c_mktsegment"), "bal_lo", Seq(250, 500, 750))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got === want)
    // fail-fast: the band must be numeric (order!), the input a DP release
    intercept[IllegalArgumentException](
      Deidentify.dpQuantiles(rel.withColumn("band", col("band").cast("string")), Seq("q"), "band", Seq(500)))
    intercept[IllegalArgumentException](Deidentify.dpQuantiles(rel.drop("n_dp"), Seq("q"), "band", Seq(500)))
    intercept[IllegalArgumentException](Deidentify.dpQuantiles(rel, Seq("q"), "band", Seq()))
    intercept[IllegalArgumentException](Deidentify.dpQuantiles(rel, Seq("q"), "band", Seq(0)))
  }

  test("dpCellMeans: ratio of two releases, ε adds, NULL on clamped count, null-safe cells") {
    // hand-built releases pin the convention (dpCellMeans consumes ANY
    // count+sum release pair)
    val counts = Seq((Some("a"), 4L), (Some("b"), 0L), (None, 2L))
      .toDF("q", "n_dp").withColumn("epsilon_micro", lit(1000000L))
    val sums = Seq((Some("a"), 10L), (Some("b"), 7L), (None, 5L))
      .toDF("q", "sum_dp").withColumn("epsilon_micro", lit(2000000L)).withColumn("clip", lit(8L))
    val out = Deidentify.dpCellMeans(counts, sums, Seq("q"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))))
      .toMap
    // mean_milli = sum·1000 div n (integer floor), ε = 1.0 + 2.0
    assert(out(Some("a")) === ((4L, 10L, Some(2500L), 3000000L)))
    // a count clamped to 0 has no defined mean: NULL, row kept (auditable)
    assert(out(Some("b")) === ((0L, 7L, None, 3000000L)))
    // the all-NULL quasi cell joins null-safely (it is a cell)
    assert(out(None) === ((2L, 5L, Some(2500L), 3000000L)))
    assert(out.size === 3)
    // composed with the real mechanisms: equals the driver-side ratio of
    // the two collected releases
    val g = Deidentify.generalize(cust, "c_acctbal", 2000L, "bal_band")
    val quasi = Seq("c_nationkey", "bal_band")
    val rc = Deidentify.dpCellCounts(g, quasi, 1000000L, "sA")
    val rs = Deidentify.dpCellSums(
      g.withColumn("v", pmod(col("c_custkey"), lit(13L))), quasi, "v", 8L, 2000000L, "sB")
    val want = {
      val cm = rc.collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getString(1)) -> r.getLong(2)).toMap
      val sm = rs.collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getString(1)) -> r.getLong(2)).toMap
      cm.map { case (cell, n) =>
        cell -> (if (n > 0) Some(sm(cell) * 1000L / n) else None)
      }
    }
    val got = Deidentify.dpCellMeans(rc, rs, quasi)
      .collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1)) ->
        Option(r.get(4)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got === want)
    // mismatched support SURFACES as NULL-sided rows — never a silently
    // vanished cell (r14 ADVICE: the old inner join dropped them)
    val counts2 = Seq(("a", 4L), ("x", 2L))
      .toDF("q", "n_dp").withColumn("epsilon_micro", lit(1000000L))
    val sums2 = Seq(("a", 10L), ("y", 3L))
      .toDF("q", "sum_dp").withColumn("epsilon_micro", lit(2000000L))
    val mm = Deidentify.dpCellMeans(counts2, sums2, Seq("q"))
      .collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))))
      .toMap
    assert(mm.size === 3, "every cell of either release present")
    assert(mm("a") === ((Some(4L), Some(10L), Some(2500L), 3000000L)))
    assert(mm("x") === ((Some(2L), None, None, 1000000L)), "count-only cell: loud NULL sum/mean")
    assert(mm("y") === ((None, Some(3L), None, 2000000L)), "sum-only cell: loud NULL count/mean")
    intercept[IllegalArgumentException](Deidentify.dpCellMeans(counts.drop("n_dp"), sums, Seq("q")))
    intercept[IllegalArgumentException](Deidentify.dpCellMeans(counts, sums.drop("sum_dp"), Seq("q")))
    intercept[IllegalArgumentException](Deidentify.dpCellMeans(counts, sums, Seq()))
  }

  test("dpTopK: post-processing rank, deterministic ties, exactly k rows, ε carried") {
    // ties on n_dp break by the quasi values ascending — reproducible release
    val rel = Seq(
      ("b", 5L), ("a", 5L), ("c", 9L), ("d", 1L), ("e", 5L)
    ).toDF("q", "n_dp").withColumn("epsilon_micro", lit(750000L))
    val top3 = Deidentify.dpTopK(rel, Seq("q"), 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(top3.toSeq === Seq(
      ("c", 9L, 1, 750000L), ("a", 5L, 2, 750000L), ("b", 5L, 3, 750000L)
    ), "desc count, asc key tiebreak, ties not expanded past k")
    // k larger than the release: every cell, still ranked
    assert(Deidentify.dpTopK(rel, Seq("q"), 100).count() === 5L)
    // composed with the real mechanism == driver-side sort of the release
    val g = Deidentify.generalize(cust, "c_acctbal", 2000L, "bal_band")
    val quasi = Seq("c_nationkey", "bal_band")
    val release = Deidentify.dpCellCounts(g, quasi, 1000000L, "sT")
    val want = release.collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1), r.getLong(2)))
      .sortBy { case (nat, band, n) => (-n, nat, band) }
      .take(10).toSeq
    val got = Deidentify.dpTopK(release, quasi, 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1), r.getLong(2))).toSeq
    assert(got === want)
    intercept[IllegalArgumentException](Deidentify.dpTopK(rel, Seq("q"), 0))
    intercept[IllegalArgumentException](Deidentify.dpTopK(rel.drop("n_dp"), Seq("q"), 3))
    intercept[IllegalArgumentException](Deidentify.dpTopK(rel, Seq(), 3))
  }

  test("dpManifest/dpLedger: salt-free domain digest, running ε, replayable") {
    import graft.functions.Kernels
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("q", "id")
    val rel1 = Deidentify.dpCellCounts(df, Seq("q"), 1000000L, "sA")
    val rel2 = Deidentify.dpCellCounts(df, Seq("q"), 500000L, "sB")
    val ledger = Deidentify
      .dpLedger(Seq(
        Deidentify.dpManifest(rel1, Seq("q"), "r1", "count", 1000000L, 1L, "sA"),
        Deidentify.dpManifest(rel2, Seq("q"), "r2", "count", 500000L, 1L, "sB")
      ))
      .orderBy("release_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6), r.getString(7), r.getLong(8)))
    // the domain digest replays driver-side and is SALT-FREE: both releases
    // over the same cells share it even though their noise salts differ.
    // XOR-fold, not sum (r14 ADVICE): stays in [0, 2^32) at any cell count
    // in both engines — a sum wraps a Spark long silently where DuckDB's
    // HUGEINT→BIGINT cast errors, diverging the replays
    val wantDom = Seq("a", "b")
      .map(v => Kernels.remix32(Kernels.polyHash(s"dom:${v.length}:$v")))
      .reduce(_ ^ _)
    assert(ledger(0) === (("r1", "count", 1000000L, 1L, "sA", 2L, wantDom, "q", 1000000L)))
    assert(ledger(1) === (("r2", "count", 500000L, 1L, "sB", 2L, wantDom, "q", 1500000L)))
    // a release over DIFFERENT cells shows a different domain at a glance
    val rel3 = Deidentify.dpCellCounts(df.filter(col("q") === "a"), Seq("q"), 1000000L, "sA")
    val dom3 = Deidentify.dpManifest(rel3, Seq("q"), "r3", "count", 1000000L, 1L, "sA")
      .head().getLong(6)
    assert(dom3 !== wantDom)
    // an EMPTY release manifests with the sentinel domain 0 (bit_xor over
    // zero rows is NULL in both engines — pinned NULL-free; n_cells=0
    // disambiguates, the ε still counts against it)
    val relEmpty = Deidentify.dpCellCounts(df.filter(col("q") === "zzz"), Seq("q"), 1000000L, "sA")
    val mEmpty = Deidentify.dpManifest(relEmpty, Seq("q"), "r4", "count", 1000000L, 1L, "sA").head()
    assert(mEmpty.getLong(5) === 0L && mEmpty.getLong(6) === 0L)
    intercept[IllegalArgumentException](Deidentify.dpLedger(Seq.empty))
    intercept[IllegalArgumentException](
      Deidentify.dpManifest(rel1.drop("q"), Seq("q"), "r", "count", 1L, 1L, "s"))
  }

  test("enforceBudget: per-domain cumulative ε, at-cap passes, over-cap raises, unprunable") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("q", "id")
    val rel1 = Deidentify.dpCellCounts(df, Seq("q"), 1000000L, "sA")
    val rel2 = Deidentify.dpCellCounts(df, Seq("q"), 500000L, "sB")
    val relO = Deidentify.dpCellCounts(df, Seq("id"), 500000L, "sC") // disjoint domain
    val ledger = Deidentify.dpLedger(Seq(
      Deidentify.dpManifest(rel1, Seq("q"), "r1", "count", 1000000L, 1L, "sA"),
      Deidentify.dpManifest(rel2, Seq("q"), "r2", "count", 500000L, 1L, "sB"),
      Deidentify.dpManifest(relO, Seq("id"), "r3", "count", 500000L, 1L, "sC")
    ))
    // cap exactly the q-domain total: at-cap PASSES (≤, not <), and the
    // disjoint domain's 0.5 composes in parallel — per-domain, not global
    // (the GLOBAL running total is 2.0 > cap and must NOT trip the guard)
    val ok = Deidentify.enforceBudget(ledger, 1500000L).orderBy("release_id").collect()
    assert(ok.map(r => (r.getString(0), r.getLong(r.length - 1))).toSeq ===
      Seq(("r1", 1000000L), ("r2", 1500000L), ("r3", 500000L)))
    // one µ under the q-domain total: its second release crosses → any
    // ACTION over the frame raises with the offending domain and release
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val e = intercept[Exception](Deidentify.enforceBudget(ledger, 1499999L).collect())
    assert(messages(e).exists(m => m.contains("DP budget exceeded") && m.contains("r2")),
      s"budget violation must name the release: ${messages(e)}")
    // the guard is a FILTER, not a projected column: selecting an
    // unrelated column cannot prune the enforcement away
    val e2 = intercept[Exception](
      Deidentify.enforceBudget(ledger, 1499999L).select("release_id").collect())
    assert(messages(e2).exists(_.contains("DP budget exceeded")))
    intercept[IllegalArgumentException](Deidentify.enforceBudget(ledger, 0L))
    intercept[IllegalArgumentException](
      Deidentify.enforceBudget(ledger.drop("domain_hash"), 1L))
    intercept[IllegalArgumentException](
      Deidentify.enforceBudget(ledger.drop("domain"), 1L))
  }

  test("enforceBudget: keys on the authoritative domain, not the collidable digest (ADVICE r15)") {
    // two EMPTY releases over DIFFERENT quasi-column sets: both carry the
    // digest sentinel 0, but they are distinct domains — under hash-keyed
    // enforcement their ε summed to 2.0 against one cap and raised on a
    // pipeline that is within budget per real domain. Domain-keyed
    // enforcement composes them in parallel.
    val df = Seq(("a", 1L), ("b", 2L)).toDF("q", "id")
    val none = df.filter(col("q") === "zzz")
    val eQ = Deidentify.dpCellCounts(none, Seq("q"), 1000000L, "sA")
    val eI = Deidentify.dpCellCounts(none, Seq("id"), 1000000L, "sB")
    val ledger = Deidentify.dpLedger(Seq(
      Deidentify.dpManifest(eQ, Seq("q"), "r1", "count", 1000000L, 1L, "sA"),
      Deidentify.dpManifest(eI, Seq("id"), "r2", "count", 1000000L, 1L, "sB")
    ))
    val rows = Deidentify.enforceBudget(ledger, 1000000L).orderBy("release_id").collect()
    assert(rows.map(r => (r.getAs[Long]("domain_hash"), r.getAs[String]("domain"),
      r.getAs[Long]("eps_domain_cum_micro"))).toSeq ===
      Seq((0L, "q", 1000000L), (0L, "id", 1000000L)),
      "colliding digests must not share a budget partition")
    // the domain identity is ORDER-FREE: Seq(a,b) and Seq(b,a) name one
    // domain (sorted column set), so their ε compose sequentially
    val two = Deidentify.dpCellCounts(df, Seq("q", "id"), 500000L, "sA")
    val m1 = Deidentify.dpManifest(two, Seq("q", "id"), "ra", "count", 500000L, 1L, "sA")
    val m2 = Deidentify.dpManifest(two, Seq("id", "q"), "rb", "count", 500000L, 1L, "sA")
    assert(m1.head().getAs[String]("domain") === m2.head().getAs[String]("domain"))
  }

  test("enforceBudget: duplicate release_id raises at execution (VERDICT r15 №4)") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("q", "id")
    val rel = Deidentify.dpCellCounts(df, Seq("q"), 500000L, "sA")
    def m(id: String) = Deidentify.dpManifest(rel, Seq("q"), id, "count", 500000L, 1L, "sA")
    val dup = Deidentify.dpLedger(Seq(m("r1"), m("r1")))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    // well within the ε cap — the raise is about the id, not the budget,
    // and fires even through a narrowing select (same unprunable filter)
    val e = intercept[Exception](
      Deidentify.enforceBudget(dup, 10000000L).select("kind").collect())
    assert(messages(e).exists(_.contains("duplicate release_id")), s"got: ${messages(e)}")
    assert(Deidentify.enforceBudget(Deidentify.dpLedger(Seq(m("r1"), m("r2"))), 10000000L)
      .count() === 2L, "distinct ids pass")
  }

  test("boundContributions: NULL ids raise at execution — never a silent nondeterministic keep") {
    val df = Seq((Some(1L), "e1"), (None, "e1"), (Some(3L), "e1"))
      .toDF("id", "ent")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val e = intercept[Exception](
      Deidentify.boundContributions(df, "ent", "id", 2, "s").collect())
    assert(messages(e).exists(_.contains("NULL id")), s"got: ${messages(e)}")
    // non-NULL frames are untouched by the guard (short-circuit coalesce)
    val clean = df.filter(col("id").isNotNull)
    assert(Deidentify.boundContributions(clean, "ent", "id", 2, "s").count() === 2L)
  }

  test("dpCellUniform: colliding-by-concatenation cells draw DIFFERENT noise (VERDICT r13)") {
    import graft.functions.Kernels
    // under a bare '|' join both tuples key as "a|b|c" — the length-prefixed
    // encoding keys them "3:a|b|1:c" vs "1:a|3:b|c": distinct, so the two
    // cells' released counts carry INDEPENDENT draws (correlated noise
    // leaks their exact count difference)
    val df = Seq(("a|b", "c", 1L), ("a", "b|c", 2L)).toDF("q1", "q2", "id")
    val us = df
      .select(Deidentify.dpCellUniform(Seq("q1", "q2"), "s").as("u"))
      .collect()
      .map(_.getLong(0))
    assert(us.distinct.length === 2, s"colliding cells must draw distinct uniforms: $us")
    // and the engine key replays the documented netstring encoding exactly
    assert(us.toSet === Set(
      Kernels.remix32(Kernels.polyHash("dp:3:a|b|1:c:s")),
      Kernels.remix32(Kernels.polyHash("dp:1:a|3:b|c:s"))
    ))
    // the release itself: with the OLD key both cells drew the same Z, so
    // the released pair leaked the exact count difference; the fixed keys
    // give each cell its own draw
    val rel = Deidentify.dpCellCounts(df, Seq("q1", "q2"), 500000L, "s")
    assert(rel.count() === 2L)
  }

  test("fail-fast on bad parameters") {
    intercept[IllegalArgumentException](Deidentify.pseudonymize(cust, Map.empty, "s"))
    intercept[IllegalArgumentException](Deidentify.pseudonymize(cust, Map("nope" -> "d"), "s"))
    intercept[IllegalArgumentException](Deidentify.dateShift(ords, "o_orderdate", "o_custkey", 0, "s"))
    intercept[IllegalArgumentException](Deidentify.generalize(cust, "c_acctbal", 0L, "b"))
    intercept[IllegalArgumentException](Deidentify.suppressSmallGroups(cust, Seq(), 5L))
    intercept[IllegalArgumentException](Deidentify.suppressSmallGroups(cust, Seq("c_nationkey"), 0L))
    intercept[IllegalArgumentException](Deidentify.lDiversityAudit(cust, Seq(), "c_acctbal", 2L))
  }

  test("topCode preserves NULL: missing data must not fabricate a cap-or-older record (r18 review)") {
    // Spark's least() SKIPS NULLs, so the unguarded form rewrote NULL -> cap
    val df = Seq[(Long, java.lang.Long)]((1L, 95L), (2L, 40L), (3L, null))
      .toDF("id", "age")
    val out = Deidentify.topCode(df, "age", 90L).orderBy("id").collect()
    assert(out(0).getLong(1) === 90L && out(0).getBoolean(2))
    assert(out(1).getLong(1) === 40L && !out(1).getBoolean(2))
    assert(out(2).isNullAt(1), "NULL age must stay NULL, not become the cap")
    assert(out(2).isNullAt(2), "flag on a NULL value is NULL, not a claim")
  }

  test("cellSums: a NULL value contributes ZERO, not a full clip (r18 review)") {
    val df = Seq[(String, java.lang.Long)](("a", 7L), ("a", null), ("a", 500L), ("b", null))
      .toDF("g", "v")
    val sums = Deidentify.cellSums(df, Seq("g"), "v", clip = 100L)
      .orderBy("__graft_q_g").collect()
    // cell a: 7 + 0 (NULL) + 100 (clipped) = 107 — the old clamp read 207
    assert(sums(0).getLong(1) === 107L, s"got ${sums(0).getLong(1)}")
    // cell b: only a NULL row -> 0, not clip
    assert(sums(1).getLong(1) === 0L, s"got ${sums(1).getLong(1)}")
  }

  test("dpTopK ranks NULL quasi cells LAST on ties — the DuckDB replay order (r18 review)") {
    // two cells tied on n_dp, one the all-NULL suppression cell: Spark's
    // default ASC is NULLS FIRST, DuckDB's is NULLS LAST — the release
    // must pin the oracle's order or the k boundary diverges
    val rel = Seq[(String, Long, Long)](("x", 5L, 1000000L), (null, 5L, 1000000L), ("m", 9L, 1000000L))
      .toDF("g", "n_dp", "epsilon_micro")
    val top = Deidentify.dpTopK(rel, Seq("g"), 2).orderBy("rank").collect()
    assert(top(0).getString(0) === "m")
    assert(top(1).getString(0) === "x", "the NULL cell must rank after 'x' on the tie")
  }

  test("dateShift raises on a NULL entity instead of silently NULLing the timestamp (r18 review)") {
    val df = Seq[(java.lang.Long, Timestamp)](
      (1L, Timestamp.valueOf("2024-03-01 00:00:00")),
      (null, Timestamp.valueOf("2024-03-02 00:00:00"))
    ).toDF("ent", "ts")
    val e = intercept[Exception](Deidentify.dateShift(df, "ts", "ent", 30, "s").collect())
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("NULL ent")), s"got: ${msgs(e)}")
    // and a typo'd entity column fails with the module's clear message
    intercept[IllegalArgumentException](Deidentify.dateShift(df, "ts", "nope", 30, "s"))
  }

  test("generalize bands integral values exactly above 2^53 (r18 review)") {
    // 2^53 + 1 is not representable as a double: the old double-division
    // form rounded it to 2^53 and banded it one bucket low when the true
    // band boundary sits between them
    val big = (1L << 53) + 1L // 9007199254740993, band [9007199254740993, ...) for width 1
    val df = Seq(big).toDF("v")
    val out = Deidentify.generalize(df, "v", 1L, "band").head().getString(1)
    assert(out === s"[$big,${big + 1})", s"got $out")
    // floor semantics on negatives unchanged
    val neg = Deidentify.generalize(Seq(-1L).toDF("v"), "v", 1000L, "band").head().getString(1)
    assert(neg === "[-1000,0)")
  }

  test("dpUserCellSums validates clip BEFORE the budget arithmetic (r18 review)") {
    val df = Seq(("e1", 1L, "g", 5L)).toDF("ent", "id", "g", "v")
    // clip = 0 used to throw a raw ArithmeticException from the plan-time
    // division; it must be the module's own require message
    val e = intercept[IllegalArgumentException](
      Deidentify.dpUserCellSums(df, "ent", "id", Seq("g"), "v", 0L, 4, 40000000L, "s"))
    assert(e.getMessage.contains("clip >= 1"), e.getMessage)
  }

  test("pseudonym key encoding is injective across domains for ':'-bearing string values (r18 review)") {
    // the bare domain:value:salt concatenation collapsed these two:
    // ("visit", "1:x") and ("visit:1", "x") concatenate identically
    val df = Seq("1:x").toDF("v")
    val a = df.select(Deidentify.pseudonymExpr("visit", col("v"), "s").as("p")).head().getLong(0)
    val b = Seq("x").toDF("v")
      .select(Deidentify.pseudonymExpr("visit:1", col("v"), "s").as("p")).head().getLong(0)
    assert(a !== b, "cross-domain collision: two key spaces pseudonymized equally")
    // NULL value still pseudonymizes to NULL (the pre-r18 contract)
    val n = Seq[java.lang.Long](null.asInstanceOf[java.lang.Long]).toDF("v")
      .select(Deidentify.pseudonymExpr("visit", col("v"), "s").as("p")).head()
    assert(n.isNullAt(0))
  }

  test("boundContributions raises on duplicate ids — a tied rank key is a nondeterministic kept set (r18 review)") {
    val dup = Seq(("e1", 7L, 1), ("e1", 7L, 2), ("e1", 8L, 3)).toDF("ent", "id", "payload")
    val e = intercept[Exception](
      Deidentify.boundContributions(dup, "ent", "id", cap = 2, "s").collect())
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("duplicate id")), s"got: ${msgs(e)}")
    // duplicates BEYOND the cap still raise (the guard rides the rank
    // column itself, before the cap filter)
    val dupTail = Seq(("e1", 1L, 1), ("e1", 2L, 2), ("e1", 9L, 3), ("e1", 9L, 4))
      .toDF("ent", "id", "payload")
    val e2 = intercept[Exception](
      Deidentify.boundContributions(dupTail, "ent", "id", cap = 2, "s").collect())
    assert(msgs(e2).exists(_.contains("duplicate id")), s"got: ${msgs(e2)}")
    // the same id in DIFFERENT entities is legal (ids are ranked per entity)
    val ok = Seq(("e1", 7L, 1), ("e2", 7L, 2)).toDF("ent", "id", "payload")
    assert(Deidentify.boundContributions(ok, "ent", "id", cap = 2, "s").count() === 2L)
  }
}
