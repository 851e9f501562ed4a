package graft.tools

import graft._
import graft.sources.Tables
import graft.operators.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Dev profiler: times the stages of the heaviest pipelines so regressions
  * are attributable to a stage, not a query. Run with the usual classpath
  * (classes + the spark jars dir): `java -cp ... graft.tools.Profile [sfDir]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("prof", 32)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("shingleHashes") {
      docs.select(TextFunctions.shingleHashes(col("text"), 3).as("shs"))
        .selectExpr("sum(size(shs))").collect()(0).getLong(0)
    }
    time("signatures") {
      docs.select(col("doc_id"), TextFunctions.shingleHashes(col("text"), 3).as("shs"))
        .select(Dedup.minhashSignature(col("shs")).as("sig"))
        .selectExpr("sum(size(sig))").collect()(0).getLong(0)
    }
    time("bands") { Dedup.minhashBands(docs, "text", "doc_id").count() }
    val bands = Dedup.minhashBands(docs, "text", "doc_id")
    time("candidates") {
      bands.as("l")
        .join(bands.as("r"), expr("l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id"))
        .distinct().count()
    }
    time("full minhashPairs") { Dedup.minhashPairs(docs, 0.8).count() }
    spark.stop()
  }
}
