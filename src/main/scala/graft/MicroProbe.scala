package graft
import org.apache.spark.sql.SparkSession

/** Micro-measurement for the optimization round: what does DataFrame
  * BUILD time (PlanProbe's `build` column) consist of? Times repeated
  * table-loader calls (each `spark.read.parquet` re-reads the footer
  * for schema inference) vs pre-supplied-schema reads. Not part of the
  * driver contract. */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm once
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"MICRO $label: ${(System.nanoTime() - t0) / 1e6 / n}%.2f ms/call")
    }
    time("Tables.lineitem build", 50) { Tables.lineitem(spark, d) }
    time("Tables.events build", 50) { Tables.events(spark, d) }
    time("Tables.documents build", 50) { Tables.documents(spark, d) }
    val sch = spark.read.parquet(s"$d/lineitem.parquet").schema
    time("read with supplied schema", 50) {
      spark.read.schema(sch).parquet(s"$d/lineitem.parquet")
    }
    time("4-table join build (tradeEdges shape)", 20) {
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    locally {
      import org.apache.spark.sql.functions._
      val DayUs = 86400000000L
      def dailySeries(typ: String, name: String) =
        Tables.events(spark, d).filter(col("event_type") === typ)
          .groupBy(expr(s"ts_us div $DayUs").as("day"))
          .agg(count(lit(1)).as("x"))
          .agg(min("day").as("mn"), max("day").as("mx"),
            collect_list(struct(col("day"), col("x"))).as("raw"))
          .select(transform(sequence(col("mn"), col("mx")), dd =>
            coalesce(element_at(map_from_entries(col("raw")), dd), lit(0L)))
            .as(name))
      time("dtw: dailySeries(click) alone", 3) { noop(dailySeries("click", "a")) }
      time("dtw: both series crossJoin", 3) {
        noop(dailySeries("click", "a")
          .crossJoin(broadcast(dailySeries("view", "b"))))
      }
      time("dtw: full query", 3) {
        noop(graft.queries.SeqMl.queries("q_dtw")(spark, d))
      }
    }
    time("analyzed: 4-table join", 20) {
      import org.apache.spark.sql.functions._
      Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .queryExecution.analyzed
    }
    spark.stop()
  }
}
