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

  test("fail-fast on bad parameters") {
    intercept[IllegalArgumentException](Deidentify.pseudonymize(cust, Map.empty, "s"))
    intercept[IllegalArgumentException](Deidentify.pseudonymize(cust, Map("nope" -> "d"), "s"))
    intercept[IllegalArgumentException](Deidentify.dateShift(ords, "o_orderdate", "o_custkey", 0, "s"))
    intercept[IllegalArgumentException](Deidentify.generalize(cust, "c_acctbal", 0L, "b"))
    intercept[IllegalArgumentException](Deidentify.suppressSmallGroups(cust, Seq(), 5L))
    intercept[IllegalArgumentException](Deidentify.suppressSmallGroups(cust, Seq("c_nationkey"), 0L))
    intercept[IllegalArgumentException](Deidentify.lDiversityAudit(cust, Seq(), "c_acctbal", 2L))
  }
}
