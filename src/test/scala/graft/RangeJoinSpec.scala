package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Laws of the bucketized range joins: exact equality with the naive
  * theta join (the semantics oracle), half-open boundaries, empty and
  * NULL ranges, owner-bucket uniqueness with NO distinct, negative-value
  * bucket math, the replication guard, and the no-cartesian plan gate.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(ps: (Long, Long)*) = ps.toDF("p_id", "p")
  private def intervals(is: (Long, Long, Long)*) = is.toDF("i_id", "s", "e")

  test("pointInInterval == the naive theta join; half-open boundaries") {
    // deterministic pseudo-random fixture: points 0..999 scattered, 60
    // intervals of mixed spans (some spanning many buckets)
    val ps = (0L until 1000L).map(i => (i, (i * 37L) % 5000L))
    val is = (0L until 60L).map { i =>
      val s = (i * 83L) % 4500L
      (i, s, s + 1L + (i * 13L) % 700L)
    }
    val got = RangeJoin
      .pointInInterval(points(ps: _*), intervals(is: _*), "p", "s", "e", 100L)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    val naive = points(ps: _*)
      .join(intervals(is: _*), col("p") >= col("s") && col("p") < col("e"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(naive.nonEmpty, "fixture must exercise matches")
    // half-open: p == s in, p == e out
    val edge = RangeJoin
      .pointInInterval(points((1L, 10L), (2L, 20L)), intervals((7L, 10L, 20L)), "p", "s", "e", 7L)
      .select("p_id").as[Long].collect().toSet
    assert(edge === Set(1L))
  }

  test("intervalOverlap == naive; every pair exactly ONCE without distinct; touching endpoints do not overlap") {
    val ls = (0L until 80L).map { i => val s = (i * 61L) % 3000L; (i, s, s + 1L + (i * 17L) % 900L) }
    val rs = (0L until 70L).map { i => val s = (i * 97L) % 3200L; (i + 1000L, s, s + 1L + (i * 23L) % 400L) }
    val left = ls.toDF("l_id", "ls", "le")
    val right = rs.toDF("r_id", "rs", "re")
    val gotAll = RangeJoin
      .intervalOverlap(left, right, "ls", "le", "rs", "re", 50L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    val naive = left
      .join(right, col("ls") < col("re") && col("rs") < col("le"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(gotAll.toSet === naive)
    assert(gotAll.size === naive.size, "owner-bucket rule: no duplicate pairs, no distinct needed")
    assert(naive.nonEmpty)
    // half-open: [0, 10) and [10, 20) share only the excluded endpoint
    val touch = RangeJoin.intervalOverlap(
      Seq((1L, 0L, 10L)).toDF("l_id", "ls", "le"),
      Seq((2L, 10L, 20L)).toDF("r_id", "rs", "re"),
      "ls", "le", "rs", "re", 4L
    )
    assert(touch.count() === 0L)
  }

  test("empty and NULL ranges match nothing; negative values bucket correctly") {
    val empt = RangeJoin.pointInInterval(
      points((1L, 5L)), intervals((1L, 5L, 5L), (2L, 9L, 3L)), "p", "s", "e", 10L)
    assert(empt.count() === 0L, "e <= s intervals are empty")
    val withNull = Seq((1L, Some(5L)), (2L, None)).toDF("p_id", "p")
    val n = RangeJoin.pointInInterval(withNull, intervals((1L, 0L, 10L)), "p", "s", "e", 10L)
    assert(n.select("p_id").as[Long].collect().toSeq === Seq(1L))
    // negative domain: floor semantics, not truncate-toward-zero
    val neg = RangeJoin
      .pointInInterval(points((1L, -5L), (2L, -15L)), intervals((9L, -10L, 0L)), "p", "s", "e", 10L)
      .select("p_id").as[Long].collect().toSet
    assert(neg === Set(1L))
  }

  test("replication guard fail-fasts; disjoint-columns fail-fast; param fail-fasts") {
    val overspan = RangeJoin.pointInInterval(
      points((1L, 5L)), intervals((1L, 0L, 1000000L)), "p", "s", "e", 10L, maxBucketsPerInterval = 100L)
    val err = intercept[Exception](overspan.count())
    assert(err.getMessage != null)
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(points((1L, 5L)), points((2L, 6L)), "p", "s", "e", 10L))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(points((1L, 5L)), intervals((1L, 0L, 1L)), "p", "s", "e", 0L))
  }

  test("plan gate: equi-join on the bucket — no cartesian, no BNLJ") {
    val ps = (0L until 100L).map(i => (i, i * 31L % 900L))
    val is = (0L until 20L).map(i => (i, i * 50L, i * 50L + 120L))
    val plan = RangeJoin
      .pointInInterval(points(ps: _*), intervals(is: _*), "p", "s", "e", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$plan")
    val plan2 = RangeJoin
      .intervalOverlap(
        points(ps: _*).toDF("l_id", "ls").withColumn("le", col("ls") + 10L),
        points(is.map(t => (t._1 + 500L, t._2)): _*).toDF("r_id", "rs").withColumn("re", col("rs") + 10L),
        "ls", "le", "rs", "re", 100L
      )
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("CartesianProduct") && !plan2.contains("BroadcastNestedLoopJoin"))
  }
}
