package graft

import org.apache.spark.sql.functions._

import graft.sources.{BlockShard, CsvSink, OrcSink}

/** Round-trip laws for the ORC and CSV interchange sinks — the adversarial
  * content (delimiters, quotes, CR/LF, unicode) is the part of an export
  * that silently corrupts when the escaping contract is wrong.
  */
class InterchangeSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    1L -> "plain text",
    2L -> "comma, separated, values",
    3L -> "a \"quoted\" phrase",
    4L -> "trailing backslash \\",
    5L -> "unicode: héllo wörld ζω 中文",
    6L -> "tab\tseparated",
    7L -> "quote-comma \",\" mix",
    8L -> "line one\nline two", // CR/LF content: CSV needs multiLine
    9L -> "  leading and trailing  "
  )

  test("ORC round-trips adversarial strings exactly, any content") {
    val out = s"$testOut/orc_nasty"
    val df = nasty.toDF("id", "s")
    OrcSink.write(df, out, maxRecordsPerFile = 4L)
    val back = OrcSink.read(spark, out, Some("id BIGINT, s STRING"))
      .as[(Long, String)].collect().toMap
    assert(back === nasty.toMap)
  }

  test("CSV round-trips embedded delimiters/quotes/CRLF exactly under multiLine read") {
    val out = s"$testOut/csv_nasty"
    val df = nasty.toDF("id", "s")
    CsvSink.write(df, out, maxRecordsPerFile = 100L, codec = "none")
    val back = CsvSink.read(spark, out, "id BIGINT, s STRING", multiLine = true)
      .as[(Long, String)].collect().toMap
    assert(back === nasty.toMap)
  }

  test("CSV single-line corpora round-trip without multiLine (the splittable path)") {
    val out = s"$testOut/csv_singleline"
    val df = nasty.filterNot(_._2.contains("\n")).toDF("id", "s")
    CsvSink.write(df, out, maxRecordsPerFile = 100L)
    val back = CsvSink.read(spark, out, "id BIGINT, s STRING")
      .as[(Long, String)].collect().toMap
    assert(back === nasty.filterNot(_._2.contains("\n")).toMap)
  }

  test("CSV read is FAILFAST: a malformed row aborts instead of nulling") {
    val out = s"$testOut/csv_corrupt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/part-corrupt.csv"),
      "id,s\nnot_a_number,hello\n"
    )
    val ex = intercept[org.apache.spark.SparkException] {
      CsvSink.read(spark, out, "id BIGINT, s STRING").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("both sinks honor maxRecordsPerFile sharding") {
    val df = (0 until 50).map(i => (i.toLong, s"row $i")).toDF("id", "s").coalesce(1)
    val orcOut = s"$testOut/orc_shards"
    OrcSink.write(df, orcOut, maxRecordsPerFile = 10L)
    assert(OrcSink.shardCount(spark, orcOut) === 5L)
    val csvOut = s"$testOut/csv_shards"
    CsvSink.write(df, csvOut, maxRecordsPerFile = 10L)
    assert(CsvSink.shardCount(spark, csvOut) === 5L)
  }

  test("block-sharded PARALLEL write keeps the file count pure arithmetic (r18: the q105/q106 gate shape)") {
    // the gate's claim (BlockShard): RANGE-partitioning on the
    // exact-B-row block id keeps every partition a run of whole blocks
    // (only the LAST block can be partial), so the file count is
    // ceil(n/B) under ANY boundary sampling — the writers parallelize
    // without the coalesce(1) serialization of n/B file creates. Range,
    // not hash: Spark writes a schema-bearing EMPTY file when
    // write-partition 0 gets no rows, and hash placement can leave
    // partition 0 empty (observed: 6 files for 500 rows at 32
    // partitions) — range always lands the lowest block there. The
    // arithmetic requires a CONTIGUOUS id space and must say so LOUDLY
    // (r18 review: silent doc_id/100 blocks broke on sparse ids; a rank
    // window would fix that only by becoming the corpus-wide
    // single-task sort the plan gates forbid). Exact-multiple n (the
    // fixtures), partial-last-block n, sub-block n, and an OFFSET but
    // contiguous id space are pinned across several writer counts; a
    // sparse id space is refused with the ShardedParquetSink pointer.
    for ((n, want) <- Seq((500, 5L), (437, 5L), (99, 1L))) {
      for (offset <- Seq(0L, 1000L)) {
        val df = (0 until n).map(i => (i.toLong + offset, s"row $i")).toDF("doc_id", "s")
        for (parts <- Seq(3, 10, 32)) {
          val out = s"$testOut/orc_block_${n}_${offset}_$parts"
          OrcSink.write(BlockShard(df, "doc_id", 100L, parts), out, maxRecordsPerFile = 100L)
          assert(OrcSink.shardCount(spark, out) === want, s"n=$n offset=$offset parts=$parts")
        }
      }
    }
    val sparse = (0 until 300).map(i => ((i * 7).toLong, s"row $i")).toDF("doc_id", "s")
    val e = intercept[IllegalArgumentException](BlockShard(sparse, "doc_id", 100L, 10))
    assert(e.getMessage.contains("CONTIGUOUS"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      BlockShard(sparse.filter(col("doc_id") < 0), "doc_id", 100L, 10))
    assert(e2.getMessage.contains("empty frame"), e2.getMessage)
  }
}
