package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{JsonlLayout, JsonlSink}

/** JSONL export laws: lossless round-trip (including JSON-hostile
  * characters), bounded shard sizes, and loud failure on corrupt input.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"jsonl-$tag").toString

  private val Ddl = "doc_id BIGINT, lang STRING, text STRING"

  test("round trip is exact, including quotes, backslashes, and unicode") {
    val docs = Seq(
      (1L, "en", """he said "hi" \ and left"""),
      (2L, "de", "tabs\tand\nnewlines survive"),
      (3L, "zh", "中文 λ ∑ emoji é字"),
      (4L, "en", "") // empty text
    ).toDF("doc_id", "lang", "text")
    val dir = tmpDir("roundtrip")
    JsonlSink.write(docs, dir)
    val back = JsonlSink.read(spark, dir, Ddl)
    assert(back.except(docs).count() === 0L && docs.except(back).count() === 0L)
  }

  test("maxRecordsPerFile bounds every shard; single writer splits exactly") {
    val docs = sources.Tables
      .load(spark, Sf001, "documents")
      .select("doc_id", "lang", "text")
      .coalesce(1)
    val dir = tmpDir("shards")
    JsonlSink.write(docs, dir, JsonlLayout(maxRecordsPerFile = 100L))
    val n = docs.count()
    assert(JsonlSink.shardCount(spark, dir) === (n + 99) / 100)
    // no shard exceeds the bound (FAILFAST read, then per-file counts)
    val perFile = JsonlSink
      .read(spark, dir, Ddl)
      .groupBy(input_file_name())
      .count()
      .agg(max("count"))
      .collect()
      .head
      .getLong(0)
    assert(perFile <= 100L)
  }

  test("gzip shards round-trip and carry the .gz extension") {
    val docs = Seq((1L, "en", "compressed")).toDF("doc_id", "lang", "text")
    val dir = tmpDir("gzip")
    JsonlSink.write(docs, dir, JsonlLayout(codec = "gzip"))
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path).filter(_.getPath.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getPath.getName.endsWith(".gz")))
    assert(JsonlSink.read(spark, dir, Ddl).count() === 1L)
  }

  test("gzip read parallelism is CAPPED by shard count (unsplittable codec contract)") {
    // the scale fact writeSized exists for: a gzip shard can never be
    // SPLIT, so shard count is a hard ceiling on read parallelism (small
    // shards may additionally bin-pack into fewer tasks) — a one-shard
    // 100 TB export reads on one task no matter the cluster size
    val docs = sources.Tables
      .load(spark, Sf001, "documents")
      .select("doc_id", "lang", "text")
      .coalesce(1)
    val dir = tmpDir("gzpar")
    JsonlSink.write(docs, dir, JsonlLayout(maxRecordsPerFile = 100L, codec = "gzip"))
    val shards = JsonlSink.shardCount(spark, dir)
    assert(shards > 1, "fixture must produce a multi-shard export")
    val partitions = JsonlSink.read(spark, dir, Ddl).rdd.getNumPartitions
    assert(partitions <= shards.toInt, s"gzip: $shards shards can never read as more tasks")
    // the degenerate export: everything in ONE gzip shard -> ONE task,
    // however large — the straggler writeSized exists to prevent
    val dir1 = tmpDir("gzpar1")
    JsonlSink.write(docs, dir1, JsonlLayout(codec = "gzip"))
    assert(JsonlSink.shardCount(spark, dir1) === 1L)
    assert(JsonlSink.read(spark, dir1, Ddl).rdd.getNumPartitions === 1)
  }

  test("writeSized derives rows-per-shard from measured line bytes") {
    val docs = sources.Tables
      .load(spark, Sf001, "documents")
      .select("doc_id", "lang", "text")
      .coalesce(1)
    val n = docs.count()
    val dir = tmpDir("sized")
    // target ~1/5 of the uncompressed data: expect ~5 shards (sampling
    // slack allowed), never the single shard a too-big fixed row count
    // would produce, never per-row shards
    val totalBytes = docs
      .select(sum(length(to_json(struct(col("doc_id"), col("lang"), col("text"))))).as("b"))
      .head()
      .getLong(0)
    val layout = JsonlSink.writeSized(docs, dir, targetShardBytes = totalBytes / 5)
    assert(layout.maxRecordsPerFile >= 1L && layout.maxRecordsPerFile < n)
    val shards = JsonlSink.shardCount(spark, dir)
    assert(shards >= 3 && shards <= 8, s"expected ~5 derived shards, got $shards")
    // the derived layout still round-trips losslessly
    val back = JsonlSink.read(spark, dir, Ddl)
    assert(back.except(docs).count() === 0L && docs.except(back).count() === 0L)
  }

  test("corrupt line fails the read loudly (FAILFAST contract)") {
    val docs = Seq((1L, "en", "fine")).toDF("doc_id", "lang", "text")
    val dir = tmpDir("corrupt")
    JsonlSink.write(docs, dir, JsonlLayout(codec = "none"))
    // splice a malformed line into a new shard
    Files.write(
      java.nio.file.Paths.get(dir, "part-99999-corrupt.json"),
      "{not json at all\n".getBytes("UTF-8")
    )
    val ex = intercept[Exception] {
      JsonlSink.read(spark, dir, Ddl).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).mkString.toLowerCase.contains("malformed"))
  }
}
