package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the fixture tables (TPC-H-ish star schema + events/documents/
  * embeddings, see TESTDATA.md). One parquet file per table; Spark's
  * vectorized parquet reader + Catalyst column pruning / predicate pushdown
  * make `load` the only scan primitive the whole engine needs for file data.
  */
object Tables {
  val dimensions: Seq[String] = Seq("region", "nation", "customer", "supplier", "part")
  val facts: Seq[String] = Seq("orders", "lineitem", "events")
  val llm: Seq[String] = Seq("documents", "embeddings")
  val all: Seq[String] = dimensions ++ facts ++ llm

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * refuses by default (PARQUET_TYPE_ILLEGAL). Read the raw nanos as long
    * and truncate to microseconds with integer division — the same
    * truncation DuckDB applies, so event-time results hash-match the oracle.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's view of the data exactly.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
