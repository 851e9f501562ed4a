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
