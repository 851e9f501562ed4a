package graft.tools

import graft._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

object StarDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("star-debug", 8)
    import spark.implicits._
    val chain = (0 until 150).map { i =>
      (i.toLong, (i until i + 60).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val sc = time("clustersScalable") {
      Dedup.clustersScalable(chain, 0.8, maxRounds = 15).as[(Long, Long)].collect().toMap
    }
    println(s"scalable: ${sc.values.toSet.size} clusters (expect 1), all-zero=${sc.values.forall(_ == 0L)}")
    val pl = time("clusters (plain, 64 rounds)") {
      Dedup.clusters(chain, 0.8, maxRounds = 64).as[(Long, Long)].collect().toMap
    }
    println(s"plain == scalable: ${pl == sc}")
    spark.stop()
  }
}
