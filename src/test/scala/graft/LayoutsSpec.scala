package graft

import graft.sources.{Layouts, ParquetLayout}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The storage-layout scale levers, asserted at the PLAN level: partition
  * pruning must reach the scan, bucketed joins must not shuffle.
  */
class LayoutsSpec extends SparkSpec {

  test("partitioned write: reader filtering on the partition key prunes partitions") {
    val dir = s"$testOut/events_by_type"
    val events = Tables.load(spark, Sf0001, "events")
    Layouts.writePartitioned(events, dir, Seq("event_type"))
    val read = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), s"pruning in plan: $plan")
    // pruning is real: only the purchase partition's rows are read
    val expected = events.filter(col("event_type") === "purchase").count()
    assert(read.count() == expected)
    // and the non-matching partitions' files are not listed in the scan
    assert(!plan.contains("event_type=click"), "pruned partitions absent from scan")
  }

  test("compact merges small files without losing or duplicating rows") {
    val small = s"$testOut/compact_small"
    val out = s"$testOut/compact_out"
    val docs = Tables.load(spark, Sf0001, "documents")
    docs.coalesce(1).write.mode("overwrite").option("maxRecordsPerFile", 7L).parquet(small)
    val rep = Layouts.compact(spark, small, out, 100L)
    val n = docs.count()
    assert(rep.rows == n)
    assert(rep.filesBefore == ((n + 6) / 7).toInt, s"fragmented into ${rep.filesBefore} files")
    assert(rep.filesAfter == ((n + 99) / 100).toInt, s"compacted to ${rep.filesAfter} files")
    assert(rep.filesAfter < rep.filesBefore)
    // content round-trips exactly (same rows, nothing dropped/duplicated)
    val back = spark.read.parquet(out)
    assert(back.count() == n)
    assert(back.select("doc_id").except(docs.select("doc_id")).isEmpty)
    assert(docs.select("doc_id").except(back.select("doc_id")).isEmpty)
  }

  test("bucketed tables join with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, Sf0001, "orders")
      val customer = Tables.load(spark, Sf0001, "customer")
      Layouts.writeBucketed(orders, "orders_b", 8, "o_custkey", ParquetLayout())
      Layouts.writeBucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", 8, "o_custkey", ParquetLayout()
      )
      val joined = spark
        .table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"no shuffle for co-bucketed join: $plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
