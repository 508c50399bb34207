package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the fixture corpus (TESTDATA.md): TPC-H-ish star schema +
  * `events` stream table + `documents`/`embeddings` for the scale ops.
  *
  * Scale notes (the same loaders must behave on a 1000-executor cluster):
  *  - plain `spark.read.parquet` keeps partition planning with the
  *    FileSourceScanExec / `spark.sql.files.maxPartitionBytes`, so a 100 TB
  *    table splits into size-bounded tasks automatically;
  *  - no `.cache()` here — callers decide lifetime;
  *  - `events.ts` is nanosecond parquet, which Spark reads only as a long
  *    (`spark.sql.legacy.parquet.nanosAsLong`). We normalize to *microsecond*
  *    precision (`ts_us` bigint + `ts` timestamp) because every other engine
  *    (incl. the DuckDB oracle) truncates ns→µs at scan; ordering and window
  *    semantics then agree across engines.
  */
object Tables {
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = relational ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events with `ts_us` (bigint, µs since epoch) and `ts` (TimestampType,
    * µs precision) — both derived from the raw ns column by integer
    * truncation, matching DuckDB's ns→µs scan behavior exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
