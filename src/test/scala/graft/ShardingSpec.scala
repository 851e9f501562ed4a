package graft

import graft.sources.{ParquetLayout, ShardedParquetSink}
import org.apache.spark.sql.functions._

/** O9–O11 invariants (SURVEY.md §5): for arbitrary row counts vs
  * maxRecordsPerFile — including the tail-flush and the n < max cases —
  * Σ per-file footer rows = input rows, no file exceeds the cap, and the
  * read-back schema matches what was written. Multi-partition inputs
  * exercise the per-task split the q50 oracle entry (single-partition,
  * deterministic file count) deliberately avoids.
  */
class ShardingSpec extends SparkSpec {

  private def roundTrip(n: Long, maxPerFile: Long, parts: Int): Unit = {
    val dir = s"$testOut/shard_${n}_${maxPerFile}_$parts"
    val df = spark
      .range(n)
      .repartition(parts)
      .select(col("id"), (col("id") % 7).as("grp"), concat(lit("row-"), col("id")).as("payload"))
    ShardedParquetSink.write(df, dir, ParquetLayout(maxRecordsPerFile = maxPerFile))
    val report = ShardedParquetSink.readBackReport(spark, dir)
    assert(report.totalRows == n, s"total rows $n")
    assert(report.shards.forall(_.rows <= maxPerFile), "per-file cap")
    assert(report.shards.forall(_.rows > 0), "no empty shards")
    // parquet round-trips drop NOT NULL (file formats store everything
    // nullable) — names and types must survive exactly
    assert(
      spark.read.parquet(dir).schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "column names and types survive round-trip"
    )
    // at least ceil(n / maxPerFile) files regardless of partitioning
    assert(report.numFiles >= ((n + maxPerFile - 1) / maxPerFile).toInt)
  }

  test("sharding invariant: tail flush, multi-partition") { roundTrip(10237, 1000, 4) }
  test("sharding invariant: exact multiple") { roundTrip(4000, 1000, 2) }
  test("sharding invariant: n < maxRecordsPerFile") { roundTrip(37, 1000, 3) }
  test("sharding invariant: single row") { roundTrip(1, 1000, 1) }
  test("sharding invariant: reference layout constant 2^19") {
    assert(ParquetLayout().maxRecordsPerFile == 524288L)
  }

  test("writeNamed: the reference's omop_notes.{N}.parquet template, content transparent") {
    val dir = s"$testOut/shard_named"
    val df = spark
      .range(1050)
      .coalesce(1)
      .select(col("id"), concat(lit("row-"), col("id")).as("payload"))
    val paths = ShardedParquetSink.writeNamed(df, dir, "omop_notes", ParquetLayout(maxRecordsPerFile = 400L))
    // dump_table.py:157 template, N sequential from 0, no part-* residue
    assert(paths.size == 3)
    paths.zipWithIndex.foreach { case (p, i) =>
      assert(p.endsWith(s"omop_notes.$i.parquet"), s"template name: $p")
    }
    val listed = new java.io.File(dir).listFiles().map(_.getName).filter(_.endsWith(".parquet")).sorted
    assert(listed.toSeq == Seq("omop_notes.0.parquet", "omop_notes.1.parquet", "omop_notes.2.parquet"))
    // read-back verification still works on the renamed files, and the
    // content round-trips exactly
    val report = ShardedParquetSink.readBackReport(spark, dir)
    assert(report.totalRows == 1050L)
    assert(report.shards.map(_.rows) == Seq(400L, 400L, 250L))
    assert(spark.read.parquet(dir).count() == 1050L)
    assert(
      spark.read.parquet(dir).agg(sum(col("id"))).head.getLong(0) ==
        (0L until 1050L).sum
    )
    intercept[IllegalArgumentException](ShardedParquetSink.writeNamed(df, dir, "a/b"))
  }
}
