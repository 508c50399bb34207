package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Layout-aware sinks — the write-side half of the 100 TB story. The
  * reference publishes opaque result folders (A10); a Spark-native engine
  * should publish *queryable layouts*:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning. Readers with
  *    a predicate on the partition column scan only matching directories
  *    (PartitionFilters at the scan — asserted in SinkSpec), the storage
  *    analog of predicate pushdown.
  *  - [[writeBucketed]]: pre-shuffled bucket layout registered in the
  *    catalog. Two tables bucketed on the same key join WITHOUT a shuffle —
  *    the bucketing *is* the exchange, paid once at write time. This is the
  *    co-located-join primitive for repeatedly-joined 100 TB facts.
  */
object SinkOps {

  def writePartitioned(df: DataFrame, outDir: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)

  /** Bucketed + sorted table (requires the session catalog; bucket layout
    * only has meaning through catalog metadata). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
