package graft

import graft.operators.OmopDump
import graft.sources.{ParquetLayout, ParquetNoteSource}

/** The parity pipeline end-to-end (dump_table.py:175-248 semantics):
  * limit mode caps at min(n, |table|), grab-everything dumps all rows,
  * out-of-range limits fail loudly instead of silently clamping.
  */
class DumpSpec extends SparkSpec {

  private def src(coalesce: Option[Int] = None) =
    new ParquetNoteSource(s"$Sf0001/documents.parquet", coalesce)

  private lazy val total = src().countAtSource(spark)

  test("limit mode: exactly min(n, count) rows round-trip") {
    val res = OmopDump.run(spark, src(), s"$testOut/dump_limit", Some(7L), ParquetLayout(maxRecordsPerFile = 5L))
    assert(res.report.totalRows == math.min(7L, total))
    assert(res.sourceCount == total)
  }

  test("limit larger than table: whole table") {
    val res =
      OmopDump.run(spark, src(), s"$testOut/dump_biglimit", Some(total + 1000), ParquetLayout())
    assert(res.report.totalRows == total)
  }

  test("grab-everything mode: no limit, all rows") {
    val res = OmopDump.run(spark, src(), s"$testOut/dump_all", None, ParquetLayout(maxRecordsPerFile = 11L))
    assert(res.report.totalRows == total)
    assert(res.report.shards.forall(_.rows <= 11L))
  }

  test("limit beyond Int.MaxValue fails loudly (no silent clamp)") {
    intercept[IllegalArgumentException] {
      OmopDump.run(spark, src(), s"$testOut/dump_huge", Some(Int.MaxValue.toLong + 1), ParquetLayout())
    }
  }

  test("non-positive limit fails") {
    intercept[IllegalArgumentException] {
      OmopDump.run(spark, src(), s"$testOut/dump_zero", Some(0L), ParquetLayout())
    }
  }
}
