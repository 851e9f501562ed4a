package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC interchange: the OTHER columnar envelope (Hive/Trino ecosystems
  * ingest ORC natively). Same bounded-shard discipline as
  * [[ParquetLayout]]; ORC stripes are splittable under every codec, so
  * unlike gzip-JSONL ([[JsonlLayout]]) the shard count bounds only file
  * parallelism, not read parallelism — a large shard still splits into
  * stripe-aligned tasks. Schema is self-describing; the reader takes an
  * optional pinned DDL anyway because an interchange contract should
  * fail loudly on drift, not adapt silently.
  *
  * Reference analog: none (`dump_table.py:189` emits parquet only) —
  * north-star interchange surface.
  */
/** Block-sharding for interchange writes whose shard COUNT is part of
  * the contract: range-partition on the exact-`rowsPerFile`-row block id
  * so every partition is a run of whole blocks (only the corpus's last
  * block can be partial) and, with `maxRecordsPerFile = rowsPerFile`,
  * the file count is `ceil(n / rowsPerFile)` under ANY boundary
  * sampling — while compression and file creates spread across
  * `writers` tasks instead of serializing in one coalesced task (the
  * per-file-create latency ×(n/rowsPerFile) mechanism behind the r17
  * q105 flag history). Range, not hash, partitioning: Spark writes a
  * schema-bearing EMPTY file when write-partition 0 gets no rows, and
  * hash placement can leave it empty — a phantom extra shard.
  *
  * The block id is `(id - min) / rowsPerFile`, which is exact-100-row
  * blocks ONLY over a contiguous id space — REQUIRED loudly here
  * (min/max/count is one tiny aggregate). The alternative, a rank
  * window, would be a corpus-wide single-partition sort: exactly the
  * global-window anti-pattern the plan gates forbid. A sparse corpus
  * should dump through [[ShardedParquetSink]]'s count-free sharding
  * instead; this helper is for contracts that pin the shard count.
  */
object BlockShard {
  import org.apache.spark.sql.functions.{col, count, floor, lit, max, min}

  def apply(df: DataFrame, idCol: String, rowsPerFile: Long, writers: Int): DataFrame = {
    val b = df.agg(min(col(idCol)), max(col(idCol)), count(lit(1))).head()
    require(!b.isNullAt(2) && b.getLong(2) > 0L, s"block-sharded write of an empty frame")
    val (lo, hi, n) = (b.getLong(0), b.getLong(1), b.getLong(2))
    require(
      hi - lo + 1L == n,
      s"block-sharded write needs a CONTIGUOUS $idCol space (got [$lo,$hi] over $n rows): " +
        "with id gaps the blocks are not exact and the shard count stops being " +
        "ceil(n/rowsPerFile) — use ShardedParquetSink for sparse corpora"
    )
    df.repartitionByRange(writers, floor((col(idCol) - lo) / rowsPerFile))
  }
}

object OrcSink {

  def write(
      df: DataFrame,
      outputDir: String,
      maxRecordsPerFile: Long = 524288L,
      codec: String = "zlib"
  ): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", codec)
      .orc(outputDir)

  def read(spark: SparkSession, dir: String, schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
    schemaDdl.fold(r)(ddl => r.schema(StructType.fromDDL(ddl))).orc(dir)
  }

  def shardCount(spark: SparkSession, dir: String): Long =
    JsonlSink.shardCount(spark, dir)
}

/** CSV interchange: the lowest-common-denominator export (spreadsheets,
  * SQL bulk loaders). Writing always quotes-and-escapes (embedded
  * delimiters, quotes, and CR/LF survive); reading back is SCHEMA-PINNED
  * and FAILFAST like [[JsonlSink.read]] — silent null-filling on a
  * malformed row is how exports rot.
  *
  * SCALE CAVEAT (the reason parquet stays the processing format): a CSV
  * file with quoted embedded newlines is only parseable with
  * `multiLine=true`, which makes each file a single unsplittable task.
  * [[write]] therefore emits bounded-row shards (the JSONL discipline —
  * parallelism from many files, not from splitting), and [[read]] flags
  * `multiLine` explicitly so single-line corpora keep in-file split
  * parallelism.
  */
object CsvSink {

  def write(
      df: DataFrame,
      outputDir: String,
      maxRecordsPerFile: Long = 524288L,
      codec: String = "gzip"
  ): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", codec)
      .option("header", "true")
      .option("escape", "\"") // RFC-4180 doubled-quote escaping
      // Spark's CSV WRITER trims cell whitespace by default — an exact
      // interchange contract cannot silently rewrite content
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(outputDir)

  def read(
      spark: SparkSession,
      dir: String,
      schemaDdl: String,
      multiLine: Boolean = false
  ): DataFrame =
    spark.read
      .schema(StructType.fromDDL(schemaDdl))
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", multiLine)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "FAILFAST")
      .csv(dir)

  def shardCount(spark: SparkSession, dir: String): Long =
    JsonlSink.shardCount(spark, dir)
}
