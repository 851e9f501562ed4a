package graft.tools

import graft._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scratch stage-attribution probe for the langid chain (q148/q149):
  * times train-materialize, scoring with 1-partition vs repartitioned
  * input, and the aggregate tail, to decide where the cost actually is.
  */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("lang-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.LangId
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lp] $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    println(s"[lp] input partitions: ${docs.rdd.getNumPartitions}")
    val model = {
      val m0 = LangId.train(docs.filter(col("doc_id") % 2 === 0))
      time("train.grams materialize")(m0.grams.count())
      time("train.prefixes materialize")(m0.prefixes.count())
      time("train.vocab materialize")(m0.vocab.count())
      time("train + persist + materialize") {
        val m = LangId.persistModel(LangId.train(docs.filter(col("doc_id") % 2 === 0)))
        m.grams.count(); m.prefixes.count(); m.vocab.count(); m
      }
    }
    val held = docs.filter(col("doc_id") % 2 === 1)
    time("gramPairs explode only (count)") {
      LangId.gramPairs(held).count()
    }
    time("scoredPairs (count)") {
      LangId.scoredPairs(held, model).count()
    }
    time("scoreByLang (count)") {
      LangId.scoreByLang(held, model).count()
    }
    time("assign (count)") {
      LangId.assign(held, model).count()
    }
    time("assign repartition(32) (count)") {
      LangId.assign(held.repartition(32), model).count()
    }
    time("assign again (count)") {
      LangId.assign(held, model).count()
    }
    spark.stop()
  }
}
