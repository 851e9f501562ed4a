package graft

import graft.functions.GraftExpressions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must agree exactly with the window
  * row_number formulation it replaces — including duplicate scores (the
  * (score desc, id asc) tiebreak), groups smaller than k, and inputs spread
  * over many partitions (exercising partial/merge/serialize paths).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def viaAggregate(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored
      .groupBy(col("query_id"))
      .agg(GraftExpressions.top_k_neighbors(col("cos"), col("neighbor_id"), k).as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(
        col("query_id"),
        (col("pos") + lit(1)).cast("long").as("rnk"),
        col("n.neighbor_id").as("neighbor_id"),
        col("n.cos").as("cos")
      )

  private def viaWindow(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  test("top-k aggregate == window row_number (ties, many partitions)") {
    val rnd = new scala.util.Random(7L)
    // duplicate scores on purpose: cos quantized to 1 decimal
    val rows = for (q <- 0L until 20L; n <- 0L until 300L) yield
      (q, n, math.floor(rnd.nextDouble() * 10) / 10.0)
    val scored = rows.toDF("query_id", "neighbor_id", "cos").repartition(13)
    val a = viaAggregate(scored, 10).as[(Long, Long, Long, Double)].collect().toSet
    val w = viaWindow(scored, 10).as[(Long, Long, Long, Double)].collect().toSet
    assert(a == w)
  }

  test("groups smaller than k return all members") {
    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (2L, 20L, 0.5))
      .toDF("query_id", "neighbor_id", "cos")
    val got = viaAggregate(scored, 10).as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8), (2L, 1L, 20L, 0.5)))
  }

  test("plan has no per-query Window sort — partial aggregation before shuffle") {
    val scored = Seq((1L, 10L, 0.9)).toDF("query_id", "neighbor_id", "cos")
    val plan = viaAggregate(scored, 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window operator in the top-k plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), "aggregate-based")
  }
}
