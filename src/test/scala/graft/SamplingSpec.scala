package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions
import graft.operators.Sampling

/** Laws of deterministic balanced per-group sampling. */
class SamplingSpec extends SparkSpec {
  private val N = 20
  private lazy val docs = sources.Tables.load(spark, Sf001, "documents")

  test("keeps min(n, group size) per group") {
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("total"))
    val kept = Sampling
      .balanced(docs, "lang", N, "text")
      .groupBy("lang")
      .agg(count(lit(1)).as("kept"))
    val bad = sizes
      .join(kept, "lang")
      .filter(col("kept") =!= least(col("total"), lit(N.toLong)))
      .count()
    assert(bad === 0L)
  }

  test("heap aggregate == window-rank reimplementation") {
    // the operator avoids the per-group sort; this is the sorted oracle
    val w = Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)
    val viaWindow = docs
      .select(col("lang"), col("doc_id"), GraftExpressions.poly_hash(col("text")).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= N)
      .select("lang", "doc_id", "h")
    val viaHeap = Sampling.balanced(docs, "lang", N, "text")
    assert(viaHeap.except(viaWindow).count() === 0L)
    assert(viaWindow.except(viaHeap).count() === 0L)
  }

  test("deterministic under repartitioning") {
    val a = Sampling.balanced(docs, "lang", N, "text")
    val b = Sampling.balanced(docs.repartition(17), "lang", N, "text")
    assert(a.except(b).count() === 0L && b.except(a).count() === 0L)
  }

  test("no rangepartitioning or Window in the physical plan") {
    val p = Sampling.balanced(docs, "lang", N, "text").queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"per-group sort crept back in: $p")
    assert(p.contains("ObjectHashAggregate"), "bounded-heap aggregate plans as ObjectHashAggregate")
  }
}
