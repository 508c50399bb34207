package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.SparkEntry
import graft.jobs.ResultPublisher

/** Whole-surface query harness, independent of the DuckDB oracle:
  *
  *  1. every SparkEntry query runs at sf0.001 and produces the same
  *     canonical content id twice — the in-repo nondeterminism tripwire
  *     (catching rand(), unordered limits, map-iteration dependence before
  *     the driver gate would);
  *  2. every query also runs against EMPTY copies of all tables — a
  *     complete library doesn't throw on zero rows.
  */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // raw events read
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private var emptyDir: String = _

  override def beforeAll(): Unit = {
    emptyDir = Files.createTempDirectory("graft-empty").toString
    graft.Tables.all.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$emptyDir/$t.parquet")
    }
  }

  override def afterAll(): Unit = spark.stop()

  test("every query is run-to-run deterministic (content ids agree)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = ResultPublisher.contentId(fn(spark, sf))
      val b = ResultPublisher.contentId(fn(spark, sf))
      spark.catalog.clearCache()
      if (a == b) None else Some(name)
    }
    assert(bad.isEmpty, s"nondeterministic queries: $bad")
  }

  test("every query tolerates empty inputs") {
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}") }
      finally spark.catalog.clearCache()
    }
    assert(failed.isEmpty, s"queries failing on empty input: $failed")
  }
}
