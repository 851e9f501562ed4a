package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sharded-JSONL layout: the LLM-corpus interchange format (one JSON
  * object per line, gzip-compressed shards of bounded row count). Same
  * shard-size discipline as the parquet envelope ([[ParquetLayout]]);
  * gzip because JSONL consumers stream-decompress, and splittability is
  * provided by the many-shards layout rather than the codec.
  *
  * READ-PARALLELISM CONTRACT: gzip is an unsplittable codec — a shard
  * can never be subdivided, so the shard count is a HARD CEILING on the
  * export's read parallelism (small shards may additionally bin-pack
  * into fewer tasks via `files.openCostInBytes`; splitting never
  * happens, and a shard larger than one task's memory envelope is a
  * straggler no config can fix). Size `maxRecordsPerFile` for a target
  * shard size, or let [[JsonlSink.writeSized]] derive it from a
  * measured bytes-per-row sample — a fixed row count that is right at
  * one document length is thousand-way wrong when the corpus mixes
  * tweets with books.
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

  /** [[write]] with `maxRecordsPerFile` DERIVED from a target
    * UNCOMPRESSED shard size (the packAcrossAuto discipline: derive the
    * knob from the data, don't hard-code the fixture's value): JSON line
    * bytes are measured on a bounded `sampleRows` prefix (one small job —
    * `to_json` length mean), rows-per-shard = targetShardBytes /
    * avgLineBytes. Because gzip shards are unsplittable (see
    * [[JsonlLayout]]), this pins READ parallelism ≈ dataBytes /
    * targetShardBytes at any corpus size — a 100 TB export gets ~400k
    * 256 MB readers instead of whatever a fixed row count happens to
    * produce on that corpus's document-length mix. Compression typically
    * shrinks shards 3–10× below the target; size the target for the
    * DECOMPRESSED task envelope, which is what bounds reader memory.
    */
  def writeSized(
      df: DataFrame,
      outputDir: String,
      targetShardBytes: Long = 256L << 20,
      sampleRows: Int = 4096,
      codec: String = "gzip"
  ): JsonlLayout = {
    require(targetShardBytes > 0, s"need targetShardBytes > 0, got $targetShardBytes")
    import org.apache.spark.sql.functions.{avg, length, struct, to_json}
    val avgLine = df
      .limit(sampleRows)
      .select(avg(length(to_json(struct(df.columns.map(df.col): _*)))) .as("b"))
      .head()
    val bytesPerRow =
      if (avgLine.isNullAt(0)) 1.0 else math.max(1.0, avgLine.getDouble(0) + 1.0) // +1: newline
    val layout = JsonlLayout(
      maxRecordsPerFile = math.max(1L, (targetShardBytes / bytesPerRow).toLong),
      codec = codec
    )
    write(df, outputDir, layout)
    layout
  }

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
