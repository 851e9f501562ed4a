package graft.tools

import graft._
import graft.functions.GraftExpressions
import graft.sources.Tables
import graft.operators.Dedup
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
    time("shingle_minhash kernel") {
      docs.select(GraftExpressions.shingle_minhash(col("text"), Dedup.ShingleK, Dedup.NumHashes).as("sm"))
        .selectExpr("sum(size(sm.sig))").collect()(0).getLong(0)
    }
    val base = Dedup.shingleSignatures(docs, "text", "doc_id")
    time("signatures (persisted)") { base.count() }
    val bands = Dedup.bandsOf(base, Dedup.Bands, Dedup.RowsPerBand)
    time("bands") { bands.count() }
    time("candidates") {
      bands.as("l")
        .join(bands.as("r"), expr("l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id"))
        .distinct().count()
    }
    base.unpersist()
    time("full minhashPairs") { Dedup.minhashPairs(docs, 0.8).count() }
    time("full ngramJaccardPairs") { Dedup.ngramJaccardPairs(docs, 0.5).count() }
    spark.stop()
  }
}
