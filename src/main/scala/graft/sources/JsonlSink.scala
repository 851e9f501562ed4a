package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sharded-JSONL layout: the LLM-corpus interchange format (one JSON
  * object per line, gzip-compressed shards of bounded row count). Same
  * shard-size discipline as the parquet envelope ([[ParquetLayout]]);
  * gzip because JSONL consumers stream-decompress, and splittability is
  * provided by the many-shards layout rather than the codec.
  */
final case class JsonlLayout(
    maxRecordsPerFile: Long = 524288L,
    codec: String = "gzip"
)

/** Sharded JSON-Lines sink + strict reader — the export face of the
  * corpus pipeline (training stacks ingest JSONL; parquet stays the
  * processing format). Writing is the same per-task bounded-shard split
  * as the parquet sink (`maxRecordsPerFile`, no driver buffering);
  * reading back is SCHEMA-PINNED and FAILFAST: a corrupt line fails the
  * job loudly instead of nulling fields, and no inference pass scans the
  * data twice.
  *
  * Reference analog: none (the reference emits parquet only —
  * dump_table.py:189); this is a north-star extension for corpus
  * interchange.
  */
object JsonlSink {

  def write(df: DataFrame, outputDir: String, layout: JsonlLayout = JsonlLayout()): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", layout.maxRecordsPerFile)
      .option("compression", layout.codec)
      .json(outputDir)

  /** Read a JSONL directory under an explicit schema. FAILFAST: any line
    * that does not parse as the schema aborts the read — silent nulls
    * from a half-corrupt export are worse than a loud failure.
    */
  def read(spark: SparkSession, dir: String, schemaDdl: String): DataFrame =
    spark.read
      .schema(StructType.fromDDL(schemaDdl))
      .option("mode", "FAILFAST")
      .json(dir)

  /** Count the data shards the writer produced (by extension — the
    * `_SUCCESS` marker and checksums are excluded).
    */
  def shardCount(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).count { s =>
      s.isFile && s.getPath.getName.startsWith("part-")
    }.toLong
  }
}
