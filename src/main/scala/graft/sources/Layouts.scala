package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout strategies beyond flat sharding — the two levers that
  * matter most for downstream reads at 100 TB:
  *
  *  - PARTITIONED layout (`partitionBy`): directory-encoded key columns.
  *    Readers filtering on the partition key scan only matching
  *    directories (partition pruning — `PartitionFilters` in the plan),
  *    turning a full-corpus scan into a touched-partitions scan.
  *  - BUCKETED layout (`bucketBy` + `sortBy`, table-managed): rows
  *    hash-bucketed on the join key at WRITE time. Two tables bucketed the
  *    same way join with NO shuffle exchange — the join that dominates a
  *    pipeline's cost runs co-located, paid once at ingest instead of on
  *    every query.
  *
  * Both compose with [[ParquetLayout]]'s file knobs.
  */
object Layouts {

  def writePartitioned(
      df: DataFrame,
      dir: String,
      partitionCols: Seq[String],
      layout: ParquetLayout = ParquetLayout()
  ): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", layout.maxRecordsPerFile)
      .option("parquet.block.size", layout.rowGroupBytes)
      .option("parquet.page.size", layout.pageBytes)
      .option("compression", layout.codec)
      .parquet(dir)

  /** Bucketed + sorted table write (bucketing lives in the catalog, so
    * this goes through `saveAsTable`). Join two tables written with the
    * same `buckets`/`key` and the exchange disappears from the plan.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      key: String,
      layout: ParquetLayout = ParquetLayout()
  ): Unit = {
    // a fresh in-memory catalog forgets managed tables from previous
    // sessions but their directories survive in the warehouse, and
    // saveAsTable refuses to adopt an existing location — drop both the
    // catalog entry and any stale directory so overwrite means overwrite
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val path = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("maxRecordsPerFile", layout.maxRecordsPerFile)
      .option("compression", layout.codec)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
