package graft

import org.apache.spark.sql.functions._

import graft.sources.{CsvSink, OrcSink}

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
    import org.apache.spark.sql.functions.{col, floor}
    // the gate's claim: RANGE-partitioning on the exact-B-row block id
    // keeps every partition a run of whole blocks (only the LAST block
    // can be partial), so the file count is ceil(n/B) under ANY boundary
    // sampling — the writers parallelize without the coalesce(1)
    // serialization of n/B file creates. Range, not hash: Spark writes
    // a schema-bearing EMPTY file when write-partition 0 gets no rows,
    // and hash placement can leave partition 0 empty (observed: 6 files
    // for 500 rows at 32 partitions) — range always lands the lowest
    // block there. The block id is the id's RANK, so the arithmetic is
    // id-distribution-independent (r18 review: doc_id/100 blocks break
    // on sparse ids). Exact-multiple n (the fixtures),
    // partial-last-block n, sub-block n, and a SPARSE id space are
    // pinned across several partition counts.
    def blockSharded(df: org.apache.spark.sql.DataFrame, parts: Int) =
      df.withColumn(
          "__blk",
          floor((org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))) - 1) / 100L)
        )
        .repartitionByRange(parts, col("__blk"))
        .drop("__blk")
    for ((n, want) <- Seq((500, 5L), (437, 5L), (99, 1L))) {
      // dense ids AND a sparse id space (every 7th id): rank-blocking
      // must give the same file count for both
      for (stride <- Seq(1, 7)) {
        val df = (0 until n).map(i => ((i * stride).toLong, s"row $i")).toDF("doc_id", "s")
        for (parts <- Seq(3, 10, 32)) {
          val out = s"$testOut/orc_block_${n}_${stride}_$parts"
          OrcSink.write(blockSharded(df, parts), out, maxRecordsPerFile = 100L)
          assert(OrcSink.shardCount(spark, out) === want, s"n=$n stride=$stride parts=$parts")
        }
      }
    }
  }
}
