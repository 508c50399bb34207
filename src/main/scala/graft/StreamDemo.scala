package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps

/** End-to-end streaming walkthrough: fixture events replayed through the
  * file source → watermarked windowed aggregation → checkpointed sink, then
  * the same events through the keyed upsert sink — the "sensor push /
  * hourly export" narrative (reference DESIGN.md:76-78) as a runnable
  * pipeline. Run: `sbt "runMain graft.StreamDemo"`. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Files.createTempDirectory("graft-streamdemo").toString

    // stage fixture events as the "incoming" directory
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("ts", "user_id", "event_type", "value")
    events.write.mode("overwrite").parquet(s"$base/incoming")

    // windowed export with watermark, checkpointed parquet sink
    val agg = StreamOps.windowedCounts(
      StreamOps.fileEventSource(spark, s"$base/incoming", events),
      watermarkDelay = "30 minutes", windowDur = "1 hour")
    val q1 = agg.writeStream.format("parquet")
      .option("path", s"$base/hourly")
      .option("checkpointLocation", s"$base/ckpt1")
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000); q1.stop()
    val hourly = spark.read.parquet(s"$base/hourly")
    println(s"hourly export: ${hourly.count()} closed windows")
    hourly.orderBy(desc("n")).limit(3).collect().foreach(r =>
      println(s"  ${r.getAs[java.sql.Timestamp]("w_start")} " +
        s"${r.getAs[String]("event_type")} n=${r.getAs[Long]("n")}"))

    // keyed upsert: latest event per user materialized as a table
    val q2 = StreamOps.upsertSink(
      StreamOps.fileEventSource(spark, s"$base/incoming", events),
      s"$base/latest", keys = Seq("user_id"), checkpoint = s"$base/ckpt2")
    q2.processAllAvailable(); q2.stop()
    val latest = spark.read.parquet(s"$base/latest")
    println(s"latest-state table: ${latest.count()} users")

    spark.stop()
  }
}
