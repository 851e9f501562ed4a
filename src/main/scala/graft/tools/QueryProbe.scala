package graft.tools

import graft._

/** Dev tool: time ONE gated query N times (cache cleared between runs,
  * noop sink, warmup first) and dump its executed plan — for
  * distinguishing a real regression from run-to-run variance when a
  * single bench number moves (best-of-2 in the full bench hides the
  * distribution this prints).
  *
  * Run: `java -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
  *   graft.tools.QueryProbe <query> [sfDir] [runs]`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <queryName> [sfDir] [runs]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.local("query-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q01_pricing_summary")(spark, dir).write.format("noop").mode("overwrite").save()
    val times = (1 to runs).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name run $i: $t%.3f s")
      t
    }
    println(
      f"[probe] $name min=${times.min}%.3f median=${times.sorted.apply(runs / 2)}%.3f " +
        f"max=${times.max}%.3f over $runs runs"
    )
    println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
