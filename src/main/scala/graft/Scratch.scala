package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch timing harness (not part of the deliverable; removed before commit). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.jobs.ResultPublisher
    def time(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.catalog.clearCache()
      }
    }
    time("current") {
      SparkEntry.queries("q_ngram_jaccard")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    def setForm = {
      val docs = Tables.documents(spark, d)
      val gsets = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), array_distinct(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => concat(element_at(col("ws"), i + 1), lit(" "),
            element_at(col("ws"), i + 2)))).as("gs"))
      val a = gsets.select(col("doc_id").as("da"), col("gs").as("ga"))
      val b = gsets.select(col("doc_id").as("db"), col("gs").as("gb"))
      a.join(b, col("db") === col("da") + 1)
        .select(col("da"), col("db"),
          size(array_intersect(col("ga"), col("gb"))).cast("long").as("inter"),
          size(col("ga")).cast("long").as("na"),
          size(col("gb")).cast("long").as("nb"))
        .select(col("da"), col("db"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 6).as("jac"))
        .orderBy("da")
    }
    time("set_form") {
      setForm.write.format("noop").mode("overwrite").save()
    }
    println("ids equal: " + (ResultPublisher.contentId(SparkEntry.queries("q_ngram_jaccard")(spark, d)) ==
      ResultPublisher.contentId(setForm)))
    spark.stop()
  }
}
