package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Throwaway micro-probe for the Misra-Gries update path: isolates the
  * sketch aggregate's cost from the explode and the recount pass.
  */
object MgProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = GraftSession.local("mg-probe", 32)
    import spark.implicits._
    val docs = spark
      .range(n)
      .map { id =>
        val sb = new StringBuilder(450)
        var i = 0
        while (i < 50) {
          if (i > 0) sb.append(' ')
          val h = {
            var x = (id * 53L + i) * 2654435761L % 2147483648L
            x = x ^ (x >> 15); x = x * 48271L % 2147483648L; x ^ (x >> 13)
          }
          if (h % 3 == 0) sb.append("hot").append((h / 3) % 10L)
          else sb.append("tok").append(h % 20000000L)
          i += 1
        }
        (id, sb.toString)
      }
      .toDF("doc_id", "text")
      .persist()
    docs.count()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
    }
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    time("explode + count")(toks.count())
    time("explode + count")(toks.count())
    time("mg sketch agg") {
      toks.agg(graft.functions.GraftExpressions.misra_gries(col("tok"), 64).as("sk"))
        .select(size(col("sk"))).head()
    }
    time("mg sketch agg (2nd)") {
      toks.agg(graft.functions.GraftExpressions.misra_gries(col("tok"), 64).as("sk"))
        .select(size(col("sk"))).head()
    }
    time("topk agg baseline") {
      toks.agg(graft.functions.GraftExpressions
        .top_k_neighbors(lit(1.0), expr("hash(tok)").cast("long"), 64).as("sk"))
        .select(size(col("sk"))).head()
    }
    println(toks.agg(graft.functions.GraftExpressions.misra_gries(col("tok"), 64))
      .queryExecution.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    spark.stop()
  }
}
