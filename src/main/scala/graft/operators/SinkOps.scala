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

  /** Z-ordered (Morton-curve) layout: range-partition + sort by the
    * bit-interleaved key of two dimension columns before writing, so
    * every output file covers a TIGHT min/max rectangle in BOTH
    * dimensions — parquet row-group/file stats then prune 2-D predicates
    * (the Delta/Iceberg OPTIMIZE ZORDER move; q_zorder is the audit
    * query over the same curve). Cost model: ONE range-partitioned
    * shuffle at write time, amortized over every later scan that carries
    * a predicate on either dimension. The curve key is pure codegen'd
    * bit math; `bits` bounds the interleave (10 → 2^20 curve cells). */
  def writeZOrdered(df: DataFrame, outDir: String,
                    colA: String, colB: String,
                    files: Int = 8, bits: Int = 10): Unit = {
    import org.apache.spark.sql.functions._
    val xb = pmod(col(colA), lit(1L << bits))
    val yb = pmod(col(colB), lit(1L << bits))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Small-file compaction — the operational tool every long-lived 100 TB
    * layout needs: streaming/incremental writers leave thousands of KB-
    * sized part files whose per-file open/footer overhead eventually
    * dominates scans. Rewrites a FLAT parquet directory into
    * ceil(bytes / targetFileBytes) files via coalesce (NARROW — no
    * shuffle; each output file concatenates whole input partitions).
    *
    * Crash safety: the rewrite stages to a sibling temp dir, then the swap
    * is two directory renames (source aside → staged in) — a crash leaves
    * either the original or the staged result addressable, never an
    * emptied directory.
    *
    * Hive-partitioned layouts (k=v subdirectories) are REFUSED — blind
    * compaction would flatten the layout and kill pruned reads; compact
    * each leaf partition directory instead.
    *
    * @return number of part files after compaction */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetFileBytes: Long = 128L << 20): Int = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def ls(d: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val s = Files.list(d)
      try s.iterator().asScala.toVector finally s.close()
    }
    val dirPath = Paths.get(dir)
    def rmTree(p: java.nio.file.Path): Unit = {
      val w = Files.walk(p)
      try w.iterator().asScala.toVector.reverse.foreach(Files.delete)
      finally w.close()
    }
    // Recover from a crashed prior compaction before touching anything:
    //  - old exists, dir missing → the crash hit BETWEEN the two renames;
    //    `old` IS the live data — restore it.
    //  - old exists, dir exists  → promotion succeeded, only the cleanup
    //    crashed; `old` is superseded garbage — clear it (a leftover would
    //    wedge every future swap with FileAlreadyExists).
    val old = Paths.get(dir.stripSuffix("/") + ".compact-old")
    if (Files.exists(old)) {
      if (!Files.exists(dirPath)) Files.move(old, dirPath)
      else rmTree(old)
    }
    def parts(d: java.nio.file.Path): Seq[java.nio.file.Path] =
      ls(d).filter(p => p.getFileName.toString.startsWith("part-"))
    if (ls(dirPath).exists(p => Files.isDirectory(p)))
      throw new IllegalArgumentException(
        s"compact: '$dir' has subdirectories (partitioned layout?) — " +
          "compact leaf partition directories individually")
    val existing = parts(dirPath)
    if (existing.isEmpty)
      throw new IllegalArgumentException(s"compact: no part files in '$dir'")
    val totalBytes = existing.map(Files.size).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val staged = Paths.get(dir.stripSuffix("/") + ".compact-tmp")
    spark.read.parquet(dir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    // two-rename swap; clean the old tree only after the new one is live
    // (the recovery block above handles a crash at any point here)
    Files.move(dirPath, old)
    Files.move(staged, dirPath)
    rmTree(old)
    parts(dirPath).size
  }
}
