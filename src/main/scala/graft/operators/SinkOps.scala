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

  /** Small-file compaction — the operational tool every long-lived 100 TB
    * layout needs: streaming/incremental writers leave thousands of KB-
    * sized part files whose per-file open/footer overhead eventually
    * dominates scans. Rewrites a parquet directory into
    * ceil(bytes / targetFileBytes) files via coalesce (NARROW — no
    * shuffle; each output file concatenates whole input partitions),
    * staging to a sibling temp dir then swapping, so a crashed compaction
    * never destroys the source.
    *
    * @return number of part files after compaction */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetFileBytes: Long = 128L << 20): Int = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def parts(d: String): Seq[java.nio.file.Path] =
      Files.list(Paths.get(d)).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
    val totalBytes = parts(dir).map(Files.size).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val staged = dir.stripSuffix("/") + ".compact-tmp"
    spark.read.parquet(dir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    // swap: remove originals, move staged parts + marker in
    val dirPath = Paths.get(dir)
    Files.walk(dirPath).iterator().asScala.toSeq.reverse
      .filter(_ != dirPath).foreach(Files.delete)
    Files.list(Paths.get(staged)).iterator().asScala.foreach { p =>
      Files.move(p, dirPath.resolve(p.getFileName))
    }
    Files.delete(Paths.get(staged))
    parts(dir).size
  }
}
