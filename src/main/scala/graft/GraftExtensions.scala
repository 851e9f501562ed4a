package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers every custom Catalyst
  * kernel as a SQL function, so `spark.sql("SELECT poly_hash(text) ...")`
  * works anywhere the library is on the classpath — the standard
  * extension-library surface (`--conf spark.sql.extensions=graft.GraftExtensions`,
  * wired by default in [[GraftSession]]).
  *
  * The engine needs no custom Rule/Strategy (SURVEY.md §4: parity's
  * optimizations are built into Catalyst); expressions + this registry are
  * the whole extension footprint.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an INT literal, got $other")
  }

  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      require(args.length == n, s"$name expects $n arguments, got ${args.length}")
      build(args)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("poly_hash"), info("poly_hash"),
        arity("poly_hash", 1)(args => PolyHash(args.head)))
    )
    ext.injectFunction(
      (FunctionIdentifier("cosine_sim"), info("cosine_sim"),
        arity("cosine_sim", 2)(args => CosineSimilarity(args(0), args(1))))
    )
    ext.injectFunction(
      (FunctionIdentifier("dot_product"), info("dot_product"),
        arity("dot_product", 2)(args => DotProduct(args(0), args(1))))
    )
    ext.injectFunction(
      (FunctionIdentifier("text_stats"), info("text_stats"),
        arity("text_stats", 1)(args => TextStats(args.head)))
    )
    ext.injectFunction(
      (FunctionIdentifier("quality_score"), info("quality_score"),
        arity("quality_score", 1)(args => QualityScore(args.head)))
    )
    ext.injectFunction(
      (FunctionIdentifier("shingle_minhash"), info("shingle_minhash"),
        arity("shingle_minhash", 3)(args =>
          ShingleMinHash(args(0), intLit(args(1), "k"), intLit(args(2), "numHashes"))))
    )
    ext.injectFunction(
      (FunctionIdentifier("lsh_buckets"), info("lsh_buckets"),
        arity("lsh_buckets", 4)(args =>
          LshBuckets(
            args(0),
            intLit(args(1), "tables"),
            intLit(args(2), "planesPerTable"),
            intLit(args(3), "dim")
          )))
    )
    ext.injectFunction(
      (FunctionIdentifier("jaccard_sim"), info("jaccard_sim"),
        arity("jaccard_sim", 2)(args => JaccardSim(args(0), args(1))))
    )
    // simhash32(text, weighted BOOLEAN literal) -> 32-bit fingerprint
    ext.injectFunction(
      (FunctionIdentifier("simhash32"), info("simhash32"),
        arity("simhash32", 2)(args =>
          SimHash32(
            args(0),
            args(1) match {
              case Literal(v: Boolean, _) => v
              case other =>
                throw new IllegalArgumentException(s"weighted must be a BOOLEAN literal, got $other")
            }
          )))
    )
    ext.injectFunction(
      (FunctionIdentifier("feature_hash"), info("feature_hash"),
        arity("feature_hash", 2)(args => FeatureHash(args(0), intLit(args(1), "dim"))))
    )
    ext.injectFunction(
      (FunctionIdentifier("winnow_fps"), info("winnow_fps"),
        arity("winnow_fps", 3)(args =>
          WinnowFingerprints(args(0), intLit(args(1), "k"), intLit(args(2), "w"))))
    )
  }
}
