package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming specs: watermarked windows (late-data drop), session windows,
  * and the mapGroupsWithState job state machine — the streaming re-statement
  * of the reference's control-plane semantics (SURVEY §2.A A15/A16). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed counts emit closed windows and drop late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = StreamOps.windowedCounts(events,
        watermarkDelay = "10 minutes", windowDur = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append")
      .start()
    try {
      // batch 1: two events in the 10:00 window, one in 10:05
      in.addData(
        (ts("2024-01-01 10:00:30"), 1L, "view", 1.0),
        (ts("2024-01-01 10:01:10"), 2L, "view", 2.0),
        (ts("2024-01-01 10:06:00"), 1L, "click", 3.0))
      q.processAllAvailable()
      // nothing closed yet (watermark still behind)
      assert(spark.table("wc").count() === 0)

      // batch 2: jump to 11:00 → watermark 10:50 → both earlier windows close
      in.addData((ts("2024-01-01 11:00:00"), 3L, "view", 4.0))
      q.processAllAvailable()
      val closed = spark.table("wc")
        .select("w_start", "event_type", "n").as[(Timestamp, String, Long)]
        .collect().toSet
      assert(closed === Set(
        (ts("2024-01-01 10:00:00"), "view", 2L),
        (ts("2024-01-01 10:05:00"), "click", 1L)))

      // batch 3: a late row at 10:02 (behind watermark) must be dropped
      in.addData((ts("2024-01-01 10:02:00"), 9L, "view", 9.0))
      // and advance far enough to close the 11:00 window too
      in.addData((ts("2024-01-01 12:00:00"), 3L, "view", 5.0))
      q.processAllAvailable()
      val all = spark.table("wc").as[(Timestamp, Timestamp, String, Long, Double)]
        .collect().map(r => (r._1, r._3, r._4)).toSet
      // late 10:02 row appears nowhere; 11:00 window has exactly 1 event
      assert(all.contains((ts("2024-01-01 11:00:00"), "view", 1L)))
      assert(!all.exists { case (w, _, _) =>
        w == ts("2024-01-01 10:00:00") && all.count(_._1 == w) > 1 })
      assert(spark.table("wc").where(col("n") === 3).count() === 0)
    } finally q.stop()
  }

  test("corpus ingest: quality filter + exact dedup + near-dup in one stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.corpusIngest(docs)
      .writeStream.format("memory").queryName("ingest").outputMode("append")
      .start()
    try {
      val good = "alpha beta gamma delta epsilon zeta"
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, good),
        (ts("2024-01-01 10:00:01"), 2L, good),              // exact dup: dropped
        (ts("2024-01-01 10:00:02"), 3L, "tiny doc"),        // too short: dropped
        (ts("2024-01-01 10:00:03"), 4L, "x x x x x x x x"), // repetitive: dropped
        (ts("2024-01-01 10:00:04"), 5L,
          "one two three four five six seven eight"))       // distinct sig: kept
      q.processAllAvailable()
      val kept = spark.table("ingest").select("doc_id").as[Long]
        .collect().toSet
      assert(kept === Set(1L, 5L), s"kept=$kept")
      // a near-identical variant (same token multiset → same simhash) of
      // doc 5 arrives later: suppressed by the signature dedup despite a
      // different md5
      in.addData((ts("2024-01-01 10:00:05"), 6L,
        "one two three four five six eight seven"))
      q.processAllAvailable()
      val kept2 = spark.table("ingest").select("doc_id").as[Long]
        .collect().toSet
      assert(kept2 === Set(1L, 5L), s"near-dup not suppressed: $kept2")
    } finally q.stop()
  }

  test("minhash near-dup twin: stream suppressions match batch band-key " +
    "decisions on fixture docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 20 real fixture docs + variants: exact copies (all 4 bands collide),
    // edited near-variants (most shingles shared), and <3-word docs that
    // the batch chain never signs (must pass through un-suppressed)
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 20).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val variants = Seq(
      (100L, base(3)._2),                          // exact copy
      (101L, base(7)._2 + " zzz"),                 // appended word
      (102L, base(11)._2),                         // exact copy
      (103L, base(5)._2.replaceAll("^\\S+ ", "")), // first word dropped
      (104L, "tiny doc"),                          // short: no signature
      (105L, "tiny doc"))                          // short dup text
    val docs = base ++ variants

    // batch-side ground truth from the SAME shared primitives
    // (Dedup.shingleCodes → minhash8 → Dedup.bandStructs)
    graft.functions.MinHash8.register(spark)
    val ws = split(col("text"), " ")
    val bandRows = docs.toDF("doc_id", "text")
      .filter(size(ws) >= 3)
      .select(col("doc_id"), explode(graft.queries.Dedup.bandStructs(
        call_function("minhash8", graft.queries.Dedup.shingleCodes(ws))))
        .as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.h1"), col("bs.h2"))
      .as[(Long, Int, Long, Long)].collect()
    val bandMap: Map[Long, Seq[(Int, Long, Long)]] =
      bandRows.groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq)
        .toMap

    // the chained-dedup fold: process docs in arrival order; a doc dropped
    // at band b has registered its keys for bands < b only (it never
    // reaches the later operators) — the exact semantics of four chained
    // dropDuplicatesWithinWatermark stages
    val seen = Array.fill(4)(scala.collection.mutable.Set[(Long, Long)]())
    val expectedKept = scala.collection.mutable.Set[Long]()
    for ((id, _) <- docs) {
      val bands = bandMap.getOrElse(id,
        (0 until 4).map(b => (b, -(id + 1), -(id + 1))))
      var dropped = false
      for ((b, h1, h2) <- bands if !dropped) {
        if (seen(b).contains((h1, h2))) dropped = true
        else seen(b) += ((h1, h2))
      }
      if (!dropped) expectedKept += id
    }
    // every expected suppression must be a batch LSH candidate pair
    // (band collision ⇒ ≥2 of 8 minhashes match — q_lsh_pairs' floor)
    val suppressed = docs.map(_._1).toSet -- expectedKept
    for (s <- suppressed) {
      val earlier = docs.map(_._1).takeWhile(_ != s).toSet
      assert(bandMap(s).exists { case (b, h1, h2) =>
        earlier.exists(e =>
          bandMap.get(e).exists(_.contains((b, h1, h2)))) },
        s"suppressed doc $s has no earlier band partner")
    }
    assert(suppressed.contains(100L) && suppressed.contains(102L),
      "exact copies must be suppressed")

    val in = MemoryStream[(Timestamp, Long, String)]
    val stream = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.dedupeNearDocsMinhash(stream)
      .writeStream.format("memory").queryName("mhdedup")
      .outputMode("append").start()
    try {
      // one micro-batch per doc: arrival order is the decision order
      var sec = 0
      for ((id, text) <- docs) {
        in.addData((ts(f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d"),
          id, text))
        sec += 1
        q.processAllAvailable()
      }
      val kept = spark.table("mhdedup").select("doc_id").as[Long]
        .collect().toSet
      assert(kept === expectedKept.toSet,
        s"stream kept $kept, batch-derived expectation $expectedKept")
      // short docs pass through even with identical text — the batch
      // chain signs nothing under 3 words, so nothing to collide on
      assert(kept.contains(104L) && kept.contains(105L))
    } finally q.stop()
  }

  test("trending tokens: sliding-window counts close and rank like batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.trendingTokens(docs,
        watermarkDelay = "10 minutes", windowDur = "10 minutes",
        slide = "5 minutes")
      .writeStream.format("memory").queryName("trend").outputMode("append")
      .start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, "spam spam ham"),
        (ts("2024-01-01 10:03:00"), 2L, "spam eggs"),
        (ts("2024-01-01 10:07:00"), 3L, "ham ham eggs"))
      q.processAllAvailable()
      // advance event time far enough that every earlier window closes
      in.addData((ts("2024-01-01 11:00:00"), 9L, "quiet"))
      q.processAllAvailable()
      val emitted = spark.table("trend")
      // batch twin over the same rows, restricted to the closed windows
      val batch = Seq(
        (ts("2024-01-01 10:00:00"), "spam spam ham"),
        (ts("2024-01-01 10:03:00"), "spam eggs"),
        (ts("2024-01-01 10:07:00"), "ham ham eggs")).toDF("ts", "text")
        .select(col("ts"),
          explode(split(col("text"), " ")).as("token"))
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
          col("token"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
          col("token"), col("n"))
      val got = StreamOps.topTokensPerWindow(emitted, k = 2)
        .as[(Timestamp, Timestamp, Int, String, Long)].collect().toSet
      val want = StreamOps.topTokensPerWindow(batch, k = 2)
        .as[(Timestamp, Timestamp, Int, String, Long)].collect().toSet
      assert(got.nonEmpty, "no closed windows emitted")
      assert(got === want, s"stream ranks diverge from batch:\n$got\n$want")
      // 10:00-10:10 window: spam (3) then ham (3 incl 10:07? no — ham=1
      // in :00 doc + 2 in :07 doc = 3, tie broken lexicographically: ham
      // first). Spot-pin one window so the parity check can't pass
      // vacuously on empty-vs-empty.
      val w1 = got.filter(r => r._1 == ts("2024-01-01 10:00:00"))
      assert(w1.map(r => (r._3, r._4, r._5)) ===
        Set((1, "ham", 3L), (2, "spam", 3L)), s"w1=$w1")
    } finally q.stop()
  }

  test("streaming anomaly detection: outliers flagged after warmup, state carries over") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.MetricIn]
    val q = StreamOps.anomalies(in.toDS(), zThresh = 3.0, minN = 10)
      .writeStream.format("memory").queryName("anom").outputMode("append")
      .start()
    try {
      // warmup: 12 calm points around 10.0 (sd ~0.3), no anomalies —
      // including none for the FIRST 10 (pre-warmup)
      val calm = (1 to 12).map(i =>
        StreamOps.MetricIn(i * 1000L, i.toLong, "lat",
          10.0 + (if (i % 2 == 0) 0.3 else -0.3)))
      in.addData(calm: _*)
      q.processAllAvailable()
      assert(spark.table("anom").count() === 0,
        "calm warmup must not fire")
      // a later batch: one 10-sigma spike among normal points — exactly
      // the spike fires, proving per-key state survived the batch gap
      in.addData(
        StreamOps.MetricIn(13000L, 13L, "lat", 10.3),
        StreamOps.MetricIn(14000L, 14L, "lat", 25.0),
        StreamOps.MetricIn(15000L, 15L, "lat", 9.7))
      q.processAllAvailable()
      val hits = spark.table("anom").as[StreamOps.Anomaly].collect()
      assert(hits.map(_.event_id).toSet === Set(14L), s"hits=${hits.toSeq}")
      assert(hits.head.z > 3.0 && hits.head.n_seen >= 12L)
      // an unrelated key starts its own warmup — no cross-key bleed
      in.addData(StreamOps.MetricIn(16000L, 16L, "qps", 99999.0))
      q.processAllAvailable()
      assert(spark.table("anom").count() === 1,
        "fresh key must warm up independently")
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = StreamOps.enrichWithDim(events, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich").outputMode("append")
      .start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
        (ts("2024-01-01 10:00:01"), 2L, "view", 2.0),
        (ts("2024-01-01 10:00:02"), 7L, "view", 3.0)) // no dim row
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .select("user_id", "tier").as[(Long, Option[String])]
        .collect().toSet
      // left join: matched rows decorated, unmatched kept with null
      assert(rows === Set((1L, Some("gold")), (2L, Some("silver")),
        (7L, None)))
    } finally q.stop()
    // inner variant drops the unmatched stream row
    val in2 = MemoryStream[(Timestamp, Long, String, Double)]
    val q2 = StreamOps.enrichWithDim(
        in2.toDF().toDF("ts", "user_id", "event_type", "value"),
        dim, Seq("user_id"), how = "inner")
      .writeStream.format("memory").queryName("enrich2").outputMode("append")
      .start()
    try {
      in2.addData((ts("2024-01-01 10:00:00"), 7L, "view", 1.0),
        (ts("2024-01-01 10:00:01"), 1L, "view", 2.0))
      q2.processAllAvailable()
      assert(spark.table("enrich2").select("user_id").as[Long]
        .collect().toSeq === Seq(1L))
    } finally q2.stop()
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = StreamOps.sessionCounts(events, gap = "30 minutes",
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append")
      .start()
    try {
      // user 1: two events 10 min apart (one session), then one 2h later
      in.addData(
        (ts("2024-01-01 09:00:00"), 1L, "view", 1.0),
        (ts("2024-01-01 09:10:00"), 1L, "click", 1.0),
        (ts("2024-01-01 11:00:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 13:00:00"), 2L, "view", 1.0)) // advance wm
      q.processAllAvailable()
      val sess = spark.table("sess")
        .where(col("user_id") === 1)
        .select("s_start", "n_events").as[(Timestamp, Long)].collect().toSet
      assert(sess === Set(
        (ts("2024-01-01 09:00:00"), 2L), // merged session, gap-extended
        (ts("2024-01-01 11:00:00"), 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops redelivered events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = StreamOps.dedupeEvents(events, Seq("user_id", "event_type"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append")
      .start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
        (ts("2024-01-01 10:00:00"), 1L, "view", 1.0), // same-batch dup
        (ts("2024-01-01 10:01:00"), 2L, "view", 2.0))
      q.processAllAvailable()
      // cross-batch redelivery inside the watermark horizon
      in.addData((ts("2024-01-01 10:02:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("dedup").select("user_id", "event_type")
        .as[(Long, String)].collect().toSeq
      assert(rows.sorted === Seq((1L, "view"), (2L, "view")))
    } finally q.stop()
  }

  test("streaming near-dup drop: same-signature docs suppressed in-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamOps.dedupeNearDocs(docs, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("neardup").outputMode("append")
      .start()
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
        (ts("2024-01-01 10:00:30"), 2L, "the quick brown fox"), // exact dup
        (ts("2024-01-01 10:01:00"), 3L, "a completely different document"))
      q.processAllAvailable()
      // cross-batch near-dup (identical token set → identical signature)
      in.addData((ts("2024-01-01 10:02:00"), 4L, "the quick brown fox"))
      q.processAllAvailable()
      val kept = spark.table("neardup").select("doc_id")
        .as[Long].collect().toSeq.sorted
      assert(kept === Seq(1L, 3L)) // first per signature survives
      // streaming result matches the batch dedup of the same rows
      val batch = Seq(
        (ts("2024-01-01 10:00:00"), 1L, "the quick brown fox"),
        (ts("2024-01-01 10:00:30"), 2L, "the quick brown fox"),
        (ts("2024-01-01 10:01:00"), 3L, "a completely different document"),
        (ts("2024-01-01 10:02:00"), 4L, "the quick brown fox"))
        .toDF("ts", "doc_id", "text")
      graft.functions.SimHash64.register(spark)
      val sigged = batch.withColumn("sig", call_function("simhash32",
        graft.functions.SimHash64.tokenHashes(col("text"))))
      // (min per signature, not orderBy+dropDuplicates — the latter keeps
      // an ARBITRARY row per key in batch Spark)
      val batchKept = sigged.groupBy("sig").agg(min("doc_id").as("doc_id"))
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(batchKept === kept)
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to in-horizon views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vIn = MemoryStream[(Timestamp, Long)]
    val cIn = MemoryStream[(Timestamp, Long)]
    val views = vIn.toDF().toDF("ts", "user_id")
    val clicks = cIn.toDF().toDF("ts", "user_id")
    val q = StreamOps.clickAttribution(views, clicks,
        watermarkDelay = "5 minutes", horizon = "10 minutes")
      .writeStream.format("memory").queryName("attr").outputMode("append")
      .start()
    try {
      vIn.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:30:00"), 1L),
        (ts("2024-01-01 10:00:00"), 2L))
      cIn.addData(
        (ts("2024-01-01 10:05:00"), 1L), // within 10 min of 10:00 view
        (ts("2024-01-01 10:45:00"), 1L), // not within any horizon
        (ts("2024-01-01 10:08:00"), 3L)) // no view for user 3
      q.processAllAvailable()
      vIn.addData((ts("2024-01-01 12:00:00"), 9L)) // advance watermarks
      cIn.addData((ts("2024-01-01 12:00:00"), 9L))
      q.processAllAvailable()
      val got = spark.table("attr")
        .select("user_id", "view_ts", "click_ts")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(got.contains((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))))
      assert(!got.exists(_._1 == 3L))
      assert(!got.exists(r => r._3 == ts("2024-01-01 10:45:00")))
      // 12:00 self-match for user 9 is in-horizon (click at view ts): allowed
      assert(got.size === 2)
    } finally q.stop()
  }

  test("file event source: streaming windowed counts equal the batch twin") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    // stream the fixture events dir (ns-ts normalized like Tables.events)
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("ts", "user_id", "event_type", "value")
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    batch.write.mode("overwrite").parquet(srcDir)
    val stream = StreamOps.fileEventSource(spark, srcDir, batch)
    val q = StreamOps.windowedCounts(stream,
        watermarkDelay = "0 seconds", windowDur = "1 hour")
      .writeStream.format("memory").queryName("filewc")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("filewc")
        .select("w_start", "event_type", "n", "total")
      val expected = batch
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("n"), col("total"))
      assert(streamed.count() > 0)
      assert(streamed.except(expected).count() === 0)
      assert(expected.except(streamed).count() === 0)
    } finally q.stop()
  }

  test("foreachBatch upsert sink: latest value per key wins across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-upsert").toString
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = StreamOps.upsertSink(events, s"$base/store",
      keys = Seq("user_id"), checkpoint = s"$base/ckpt")
    try {
      in.addData(
        (ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
        (ts("2024-01-01 10:05:00"), 1L, "click", 2.0), // same key, later ts
        (ts("2024-01-01 10:00:00"), 2L, "view", 3.0))
      q.processAllAvailable()
      val s1 = spark.read.parquet(s"$base/store")
        .select("user_id", "event_type").as[(Long, String)].collect().toMap
      assert(s1 === Map(1L -> "click", 2L -> "view"))
      // second batch updates key 1, inserts key 3
      in.addData(
        (ts("2024-01-01 11:00:00"), 1L, "purchase", 9.0),
        (ts("2024-01-01 11:00:00"), 3L, "signup", 1.0))
      q.processAllAvailable()
      val s2 = spark.read.parquet(s"$base/store")
        .select("user_id", "event_type").as[(Long, String)].collect().toMap
      assert(s2 === Map(1L -> "purchase", 2L -> "view", 3L -> "signup"))
    } finally q.stop()
  }

  test("checkpointed file sink restarts exactly-once") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft-ckpt").toString
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    val sample = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("ts", "user_id", "event_type", "value")
    sample.limit(100).write.mode("overwrite").parquet(src)
    def runOnce(): Unit = {
      val q = StreamOps.fileEventSource(spark, src, sample)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    runOnce()
    val n1 = spark.read.parquet(out).count()
    assert(n1 === 100)
    // restart with no new input: checkpoint prevents reprocessing
    runOnce()
    assert(spark.read.parquet(out).count() === 100)
    // new file appears → only the delta is appended
    sample.limit(130).write.mode("overwrite").parquet(s"$base/tmp2")
    Files.list(java.nio.file.Paths.get(s"$base/tmp2")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        Files.copy(p, java.nio.file.Paths.get(src, "extra-" + p.getFileName))
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 230)
  }

  test("job state machine folds events with partial-update semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{EventIn, NodeState}
    val in = MemoryStream[EventIn]
    val q = StreamOps.jobStateMachine(in.toDS())
      .writeStream.format("memory").queryName("jsm").outputMode("update")
      .start()
    try {
      in.addData(
        EventIn("j1", "n1", "Bid", eventTimeUs = 1),
        EventIn("j1", "n1", "BidAccepted", eventTimeUs = 2),
        EventIn("j1", "n1", "Running", status = "50%", eventTimeUs = 3))
      q.processAllAvailable()
      // second batch: Completed with resultsId, then a Completed with empty
      // resultsId — the empty one must NOT erase cid-1 (reference partial
      // update, controller.go:368-379)
      in.addData(
        EventIn("j1", "n1", "Completed", resultsId = "cid-1", eventTimeUs = 4),
        EventIn("j1", "n1", "Completed", eventTimeUs = 5),
        EventIn("j1", "n2", "Bid", eventTimeUs = 4),
        EventIn("j1", "n2", "BidCancelled", eventTimeUs = 5))
      q.processAllAvailable()
      val last = spark.table("jsm").as[NodeState].collect()
        .groupBy(s => (s.jobId, s.nodeId))
        .map { case (k, vs) => k -> vs.maxBy(_.updatedUs) }
      assert(last(("j1", "n1")).state === "Complete")
      assert(last(("j1", "n1")).resultsId === "cid-1")
      assert(last(("j1", "n1")).status === "50%")
      assert(last(("j1", "n2")).state === "Cancelled")
    } finally q.stop()
  }

  test("streaming IVF assignment equals batch q_ivf_assign row for row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, sf)
    // offline index build: the same per-label means the batch query uses,
    // collected as the bounded k×dim centroid matrix
    val centroids = emb
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "i", "x")
      .groupBy("label", "i").agg(avg(col("x").cast("double")).as("cx"))
      .collect()
      .groupBy(_.getAs[Int]("label"))
      .map { case (lbl, rows) =>
        lbl -> rows.sortBy(_.getAs[Int]("i")).map(_.getAs[Double]("cx")).toArray
      }.toSeq
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.ivfAssign(
        in.toDS().toDF("vec_id", "embedding"), centroids)
      .writeStream.format("memory").queryName("ivf")
      .outputMode("append").start()
    try {
      vecs.grouped(120).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val stream = spark.table("ivf").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      val batch = graft.SparkEntry.queries("q_ivf_assign")(spark, sf)
        .collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      assert(stream.size === batch.size)
      for ((id, (nb, db)) <- batch) {
        val (ns, ds) = stream(id)
        assert(ns === nb, s"vec $id: stream cell $ns vs batch $nb")
        assert(math.abs(ds - db) < 1e-5,
          s"vec $id: stream d2 $ds vs batch $db")
      }
    } finally q.stop()
  }

  test("streaming Holt forecast equals batch q_holt once a sentinel " +
       "closes the fixture's last day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"))
      .as[StreamOps.HoltPoint]
      .collect().sortBy(_.ts_us)
    val in = MemoryStream[StreamOps.HoltPoint]
    val q = StreamOps.holtForecast(in.toDS()).writeStream
      .format("memory").queryName("holt").outputMode("append").start()
    try {
      pts.grouped(500).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // mid-stream: the open day is never folded, so closed-day count
      // trails the distinct-day count by exactly one
      val mid = spark.table("holt").as[StreamOps.HoltUpdate]
        .collect().maxBy(_.n_days)
      val nDistinct = pts.map(_.ts_us / 86400000000L).distinct.length
      assert(mid.n_days === nDistinct - 1,
        s"open day must stay unfolded: ${mid.n_days} vs $nDistinct days")
      // sentinel one day past the end closes the final real day — from
      // here the stream state must equal the batch fold over ALL days
      in.addData(StreamOps.HoltPoint(pts.last.ts_us + 86400000000L))
      q.processAllAvailable()
      val last = spark.table("holt").as[StreamOps.HoltUpdate]
        .collect().maxBy(_.n_days)
      val batch = graft.SparkEntry.queries("q_holt")(spark, sf)
        .collect().head
      assert(last.n_days === batch.getAs[Long]("n_days"))
      // same literals, same fold order → bit-identical doubles; compare
      // at the batch's published 4-dp rounding
      def r4(v: Double) = math.rint(v * 1e4) / 1e4
      assert(r4(last.level.get) === batch.getAs[Double]("level"))
      assert(r4(last.trend.get) === batch.getAs[Double]("trend"))
      assert(r4(last.forecast_7d.get) === batch.getAs[Double]("forecast_7d"))
      // updates before two closed days carry no estimate
      val early = spark.table("holt").as[StreamOps.HoltUpdate]
        .collect().filter(_.n_days < 2)
      assert(early.forall(u => u.level.isEmpty && u.forecast_7d.isEmpty))
    } finally q.stop()
  }

  test("streaming Croston equals batch q_croston once a sentinel closes " +
       "the last demand day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // demand events only: the stream twin of the batch signup filter
    val pts = graft.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "signup")
      .select(org.apache.spark.sql.functions.col("ts_us"))
      .as[StreamOps.HoltPoint]
      .collect().sortBy(_.ts_us)
    val in = MemoryStream[StreamOps.HoltPoint]
    val q = StreamOps.crostonMonitor(in.toDS()).writeStream
      .format("memory").queryName("croston").outputMode("append").start()
    try {
      pts.grouped(200).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // mid-stream: the open day is never folded — closed demand days
      // trail the distinct demand days by exactly one
      val nDistinct = pts.map(_.ts_us / 86400000000L).distinct.length
      val mid = spark.table("croston").as[StreamOps.CrostonUpdate]
        .collect().maxBy(_.n_demand)
      assert(mid.n_demand === nDistinct - 1,
        s"open day must stay unfolded: ${mid.n_demand} vs $nDistinct days")
      // sentinel one day past the end closes the final real day — state
      // must now equal the batch fold over the full calendar
      in.addData(StreamOps.HoltPoint(pts.last.ts_us + 86400000000L))
      q.processAllAvailable()
      val last = spark.table("croston").as[StreamOps.CrostonUpdate]
        .collect().maxBy(_.n_demand)
      val batch = graft.SparkEntry.queries("q_croston")(spark, sf)
        .collect().head
      assert(last.n_days === batch.getAs[Long]("n_days"))
      assert(last.n_demand === batch.getAs[Long]("n_demand"))
      // same literals, same fold order → bit-identical doubles; compare
      // at the batch's published rounding
      def r4(v: Double) = math.rint(v * 1e4) / 1e4
      def r6(v: Double) = math.rint(v * 1e6) / 1e6
      assert(r4(last.size_hat.get) === batch.getAs[Double]("size_hat"))
      assert(r4(last.interval_hat.get) ===
        batch.getAs[Double]("interval_hat"))
      assert(r6(last.demand_rate.get) === batch.getAs[Double]("demand_rate"))
    } finally q.stop()
  }

  test("streaming Holt-Winters equals batch q_holt_winters after the " +
       "sentinel close; no estimate before 14 closed days") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"))
      .as[StreamOps.HoltPoint]
      .collect().sortBy(_.ts_us)
    val in = MemoryStream[StreamOps.HoltPoint]
    val q = StreamOps.holtWintersForecast(in.toDS()).writeStream
      .format("memory").queryName("hw").outputMode("append").start()
    try {
      // drip the first 13 days' events alone: every update must carry no
      // estimate (the two-week init hasn't closed)
      val (head, tail) = pts.partition(_.ts_us / 86400000000L <
        pts.head.ts_us / 86400000000L + 13)
      head.grouped(400).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val early = spark.table("hw").as[StreamOps.HwUpdate].collect()
      assert(early.nonEmpty && early.forall(u =>
        u.level.isEmpty && u.forecast_1d.isEmpty && u.season_range.isEmpty))
      tail.grouped(400).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // sentinel one day past the end closes the final real day — state
      // must now equal the batch fold over ALL days
      in.addData(StreamOps.HoltPoint(pts.last.ts_us + 86400000000L))
      q.processAllAvailable()
      val last = spark.table("hw").as[StreamOps.HwUpdate]
        .collect().maxBy(_.n_days)
      val batch = graft.SparkEntry.queries("q_holt_winters")(spark, sf)
        .collect().head
      assert(last.n_days === batch.getAs[Long]("n_days"))
      // same literals, same fold order → bit-identical doubles; compare
      // at the batch's published 4-dp rounding
      def r4(v: Double) = math.rint(v * 1e4) / 1e4
      assert(r4(last.level.get) === batch.getAs[Double]("level"))
      assert(r4(last.trend.get) === batch.getAs[Double]("trend"))
      assert(r4(last.forecast_1d.get) === batch.getAs[Double]("forecast_1d"))
      assert(r4(last.season_range.get) ===
        batch.getAs[Double]("season_range"))
    } finally q.stop()
  }

  test("Misra-Gries heavy hitters: exact when distinct <= k; heavy items " +
       "guaranteed present when distinct > k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val types = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect().sortBy(r => (r.getLong(0), r.getLong(1)))
      .zipWithIndex
      .map { case (r, i) => StreamOps.HhEvent(i.toLong, r.getString(2)) }
    val exact = types.groupBy(_.item).map { case (t, xs) =>
      t -> xs.length.toLong }
    val n = types.length.toLong

    // k = 8 > 5 distinct types: no decrement ever fires → EXACT parity
    val in = MemoryStream[StreamOps.HhEvent]
    val q = StreamOps.heavyHitters(in.toDS(), k = 8).writeStream
      .format("memory").queryName("hh8").outputMode("append").start()
    try {
      types.grouped(700).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val last = spark.table("hh8").as[StreamOps.HhUpdate]
        .collect().maxBy(_.n_seen)
      assert(last.n_seen === n)
      assert(last.candidates === exact,
        s"distinct<=k must be exact: ${last.candidates} vs $exact")
    } finally q.stop()

    // k = 2 < 5 distinct: bounded state, and every item with true count
    // > n/(k+1) MUST survive; surviving counters lower-bound the truth
    val in2 = MemoryStream[StreamOps.HhEvent]
    val q2 = StreamOps.heavyHitters(in2.toDS(), k = 2).writeStream
      .format("memory").queryName("hh2").outputMode("append").start()
    try {
      types.grouped(700).foreach { chunk =>
        in2.addData(chunk.toIndexedSeq: _*); q2.processAllAvailable()
      }
      val last = spark.table("hh2").as[StreamOps.HhUpdate]
        .collect().maxBy(_.n_seen)
      assert(last.candidates.size <= 2, "state must stay bounded by k")
      val guaranteed = exact.filter(_._2 > n / 3).keySet
      assert(guaranteed.subsetOf(last.candidates.keySet),
        s"heavy items $guaranteed must be present: ${last.candidates}")
      for ((t, c) <- last.candidates)
        assert(c <= exact(t) && c >= exact(t) - n / 3,
          s"counter for $t out of MG bounds: $c vs ${exact(t)}")
    } finally q2.stop()
  }

  test("streaming CUSUM equals batch q_cusum after the sentinel close " +
       "(offline-calibrated integer constants)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"))
      .as[StreamOps.HoltPoint]
      .collect().sortBy(_.ts_us)
    // offline calibration: the same (n_days, total) the batch fold uses
    val nd = pts.map(_.ts_us / 86400000000L).distinct.length.toLong
    val sx = pts.length.toLong
    val in = MemoryStream[StreamOps.HoltPoint]
    val q = StreamOps.cusumMonitor(in.toDS(), nd, sx).writeStream
      .format("memory").queryName("cusum").outputMode("append").start()
    try {
      pts.grouped(500).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // sentinel closes the last real day
      in.addData(StreamOps.HoltPoint(pts.last.ts_us + 86400000000L))
      q.processAllAvailable()
      val last = spark.table("cusum").as[StreamOps.CusumUpdate]
        .collect().maxBy(_.n_days)
      val batch = graft.SparkEntry.queries("q_cusum")(spark, sf)
        .collect().head
      assert(last.n_days === batch.getAs[Long]("n_days"))
      assert(last.max_cusum === batch.getAs[Double]("max_cusum"))
      val batchAlarm = Option(batch.get(2)).map(_.asInstanceOf[Long])
      assert(last.alarm_day === batchAlarm,
        s"alarm day: stream ${last.alarm_day} vs batch $batchAlarm")
    } finally q.stop()
  }

  test("streaming Page–Hinkley equals batch q_page_hinkley after the " +
       "sentinel close (reset-free drift twin of the CUSUM monitor)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"))
      .as[StreamOps.HoltPoint]
      .collect().sortBy(_.ts_us)
    val nd = pts.map(_.ts_us / 86400000000L).distinct.length.toLong
    val sx = pts.length.toLong
    val in = MemoryStream[StreamOps.HoltPoint]
    val q = StreamOps.pageHinkleyMonitor(in.toDS(), nd, sx).writeStream
      .format("memory").queryName("ph").outputMode("append").start()
    try {
      pts.grouped(500).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      in.addData(StreamOps.HoltPoint(pts.last.ts_us + 86400000000L))
      q.processAllAvailable()
      val last = spark.table("ph").as[StreamOps.PhUpdate]
        .collect().maxBy(_.n_days)
      val batch = graft.SparkEntry.queries("q_page_hinkley")(spark, sf)
        .collect().head
      assert(last.n_days === batch.getAs[Long]("n_days"))
      assert(last.max_ph === batch.getAs[Double]("max_ph"))
      val batchAlarm = Option(batch.get(2)).map(_.asInstanceOf[Long])
      assert(last.alarm_day === batchAlarm,
        s"alarm day: stream ${last.alarm_day} vs batch $batchAlarm")
    } finally q.stop()
  }

  test("streaming SPRT equals batch q_sprt on the time-ordered fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val trials = graft.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("view", "purchase"))
      .select(org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.col("event_id"),
        (org.apache.spark.sql.functions.col("event_type") === "purchase")
          .as("purchase"))
      .as[StreamOps.SprtTrial]
      .collect().sortBy(t => (t.ts_us, t.event_id))
    val in = MemoryStream[StreamOps.SprtTrial]
    val q = StreamOps.sprtMonitor(in.toDS()).writeStream
      .format("memory").queryName("sprt").outputMode("append").start()
    try {
      trials.grouped(150).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val updates = spark.table("sprt").as[StreamOps.SprtUpdate]
        .collect().sortBy(_.n_trials)
      val last = updates.last
      val batch = graft.SparkEntry.queries("q_sprt")(spark, sf)
        .collect().head
      assert(last.n_trials === batch.getAs[Long]("n_trials"))
      assert(math.abs(last.llr - batch.getAs[Double]("llr_final")) < 1e-6,
        s"stream llr ${last.llr} vs batch ${batch.getAs[Double]("llr_final")}")
      assert(last.decision === batch.getAs[String]("decision"))
      // Wald stop latches: every update after the first decision carries it
      val firstDecided = updates.indexWhere(_.decision != "continue")
      assert(firstDecided >= 0, "fixture stream must reach a decision")
      assert(updates.drop(firstDecided)
        .forall(_.decision === last.decision))
    } finally q.stop()
  }

  test("streaming Kalman equals batch q_kalman_1d after a sentinel " +
       "closes the last day — bit-identical filter doubles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val dayUs = 86400000000L
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"))
      .as[StreamOps.HoltPoint]
      .collect().sortBy(_.ts_us)
    val in = MemoryStream[StreamOps.HoltPoint]
    val q = StreamOps.kalmanMonitor(in.toDS()).writeStream
      .format("memory").queryName("kalman").outputMode("append").start()
    try {
      pts.grouped(300).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // the open (last) day can't have folded yet
      val openDay = pts.last.ts_us / dayUs
      val mid = spark.table("kalman").as[StreamOps.KalmanUpdate].collect()
      assert(mid.forall(_.day < openDay),
        "no update may precede its day closing")
      // sentinel one day past the end closes the last real day
      in.addData(StreamOps.HoltPoint(pts.last.ts_us + dayUs))
      q.processAllAvailable()
      val stream = spark.table("kalman").as[StreamOps.KalmanUpdate]
        .collect().sortBy(_.day)
      val batch = graft.SparkEntry.queries("q_kalman_1d")(spark, sf)
        .collect()
      assert(stream.length === batch.length,
        s"stream ${stream.length} days vs batch ${batch.length}")
      stream.zip(batch).foreach { case (sv, br) =>
        assert(sv.day === br.getAs[Long]("day"))
        assert(sv.x === br.getAs[Long]("x"), s"day ${sv.day}")
        // same constants, same op order → bit-identical doubles
        assert(sv.level === br.getAs[Double]("level"), s"day ${sv.day}")
        assert(sv.p_var === br.getAs[Double]("p_var"), s"day ${sv.day}")
      }
    } finally q.stop()
  }

  test("streaming Hampel equals batch q_hampel after a sentinel closes " +
       "the band; verdicts lag the open day by the half-band") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val dayUs = 86400000000L
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100)
          .cast("long").as("cents"))
      .as[StreamOps.ValuePoint]
      .collect().sortBy(_.ts_us)
    val in = MemoryStream[StreamOps.ValuePoint]
    val q = StreamOps.hampelMonitor(in.toDS()).writeStream
      .format("memory").queryName("hampel").outputMode("append").start()
    try {
      pts.grouped(200).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      // mid-stream: a centered ±3 band means no verdict for any day the
      // open day hasn't moved strictly past by 4
      val openDay = pts.last.ts_us / dayUs
      val mid = spark.table("hampel").as[StreamOps.HampelVerdict].collect()
      assert(mid.forall(_.day + 3 < openDay),
        "no verdict may precede its band closing")
      // sentinel 4 days past the end finalizes every real day's band
      in.addData(StreamOps.ValuePoint(pts.last.ts_us + 4 * dayUs, 0L))
      q.processAllAvailable()
      val stream = spark.table("hampel").as[StreamOps.HampelVerdict]
        .collect().sortBy(_.day)
      val batch = graft.SparkEntry.queries("q_hampel")(spark, sf).collect()
      assert(stream.length === batch.length,
        s"stream ${stream.length} days vs batch ${batch.length}")
      stream.zip(batch).foreach { case (sv, br) =>
        assert(sv.day === br.getAs[Long]("day"))
        assert(sv.dollars === br.getAs[Double]("dollars"), s"day ${sv.day}")
        // same percentile formula on exact binary cents → bit-identical
        assert(sv.med_cents === br.getAs[Double]("med_cents"),
          s"day ${sv.day} med")
        assert(sv.mad_cents === br.getAs[Double]("mad_cents"),
          s"day ${sv.day} mad")
        assert(sv.n_window === br.getAs[Long]("n_window"), s"day ${sv.day}")
        assert(sv.outlier === br.getAs[Boolean]("outlier"), s"day ${sv.day}")
      }
    } finally q.stop()
  }

  test("streaming GARCH equals the batch (1,5) combo of q_garch_grid " +
       "after a sentinel closes the last hour — exact integer state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val hourUs = 3600000000L
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100)
          .cast("long").as("cents"))
      .as[StreamOps.ValuePoint]
      .collect().sortBy(_.ts_us)
    // offline calibration: the batch's own s² = Σr² div m over the
    // zero-filled hourly diff series
    val byHour = pts.groupBy(_.ts_us / hourUs)
      .map { case (h, ps) => h -> ps.map(_.cents).sum }
    val span = (byHour.keys.min to byHour.keys.max)
      .map(h => byHour.getOrElse(h, 0L))
    val diffs = span.sliding(2).map(w => w(1) - w(0)).toVector
    val s2 = diffs.map(r => r * r).sum / diffs.length
    val in = MemoryStream[StreamOps.ValuePoint]
    val q = StreamOps.garchMonitor(in.toDS(), s2).writeStream
      .format("memory").queryName("garch").outputMode("append").start()
    try {
      // PARITY CONTRACT: events must arrive in hour order per series —
      // a late event for a closed hour is dropped (batch would include
      // it) and surfaces only through the late_dropped counter.
      pts.grouped(200).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val openHour = pts.last.ts_us / hourUs
      val mid = spark.table("garch").as[StreamOps.GarchUpdate].collect()
      assert(mid.forall(_.hour < openHour),
        "no update may precede its hour closing")
      assert(mid.forall(_.late_dropped === 0L), "in-order feed: no drops")
      // a duplicate of the earliest point is late for its closed hour:
      // it must NOT perturb the state, only increment the counter —
      // and because its micro-batch produces no close, the counter
      // must flush IMMEDIATELY as a counter-only update (hour = -1)
      val nBefore = spark.table("garch").count()
      in.addData(pts.head)
      q.processAllAvailable()
      val flushed = spark.table("garch").as[StreamOps.GarchUpdate]
        .collect().drop(nBefore.toInt)
      assert(flushed.length === 1 && flushed.head.hour === -1L &&
        flushed.head.late_dropped === 1L,
        "a close-less late drop must surface as a counter-only update")
      in.addData(StreamOps.ValuePoint(pts.last.ts_us + hourUs, 0L))
      q.processAllAvailable()
      val stream = spark.table("garch").as[StreamOps.GarchUpdate]
        .collect().filter(_.hour >= 0L).sortBy(_.hour)
      assert(stream.length === diffs.length,
        s"stream ${stream.length} diffs vs batch ${diffs.length}")
      val batch = graft.SparkEntry.queries("q_garch_grid")(spark, sf)
        .collect().filter(r => r.getAs[Long]("a") == 1L &&
          r.getAs[Long]("b") == 5L)
      assert(batch.length === 1)
      // same integer recursion, same quantization → exact equality
      assert(stream.last.nll_micro ===
        batch.head.getAs[Long]("nll_micro"))
      assert(batch.head.getAs[Long]("n_returns") === diffs.length.toLong)
      assert(stream.last.late_dropped === 1L,
        "the injected late event must be counted, not folded")
    } finally q.stop()
  }

  test("streaming Viterbi equals batch q_viterbi after a sentinel " +
       "closes the last day — final path and score bit-identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val dayUs = 86400000000L
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"))
      .as[StreamOps.HoltPoint]
      .collect().sortBy(_.ts_us)
    // offline calibration: the batch's busy threshold is the global
    // daily mean — n days with events, Σx total events
    val daily = pts.groupBy(_.ts_us / dayUs).map { case (d, ps) =>
      d -> ps.length.toLong }
    val (totN, totSx) = (daily.size.toLong, daily.values.sum)
    val in = MemoryStream[StreamOps.HoltPoint]
    val q = StreamOps.viterbiMonitor(in.toDS(), totN, totSx).writeStream
      .format("memory").queryName("viterbi").outputMode("append").start()
    try {
      // PARITY CONTRACT: in-day-order arrival; late events only count
      pts.grouped(300).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val openDay = pts.last.ts_us / dayUs
      val mid = spark.table("viterbi").as[StreamOps.ViterbiUpdate]
        .collect()
      assert(mid.forall(_.day < openDay),
        "no update may precede its day closing")
      in.addData(StreamOps.HoltPoint(pts.last.ts_us + dayUs))
      q.processAllAvailable()
      val stream = spark.table("viterbi").as[StreamOps.ViterbiUpdate]
        .collect().sortBy(_.day)
      val batch = graft.SparkEntry.queries("q_viterbi")(spark, sf)
        .collect()
      assert(stream.length === batch.length,
        s"stream ${stream.length} days vs batch ${batch.length}")
      // per-day observations match; the FINAL decode is retroactive,
      // so only the last update's path is the batch's (day, state)
      // column — compare it character by character
      stream.zip(batch).foreach { case (sv, br) =>
        assert(sv.day === br.getAs[Long]("day"))
        assert(sv.x === br.getAs[Long]("x"), s"day ${sv.day}")
        assert(sv.busy === br.getAs[Long]("busy"), s"day ${sv.day}")
        assert(sv.late_dropped === 0L)
      }
      val finalPath = stream.last.path
      assert(finalPath.length === batch.length)
      batch.zipWithIndex.foreach { case (br, i) =>
        assert(finalPath.substring(i, i + 1) ===
          br.getAs[String]("state"), s"decode position ${i + 1}")
      }
      assert(stream.last.score_micronat ===
        batch.head.getAs[Long]("path_score_micronat"))
    } finally q.stop()
  }

  test("streaming HMM forward equals batch q_hmm_forward with no " +
       "sentinel — truly online per-event integer alpha updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id").cast("long"),
        org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.col("event_id").cast("long"),
        org.apache.spark.sql.functions.col("event_type"))
      .as[StreamOps.HmmPoint]
      .collect().sortBy(p => (p.ts_us, p.event_id))
    val in = MemoryStream[StreamOps.HmmPoint]
    val q = StreamOps.hmmForwardMonitor(in.toDS()).writeStream
      .format("memory").queryName("hmmfwd").outputMode("append").start()
    try {
      // PARITY CONTRACT: per-user (ts_us, event_id)-ordered arrival —
      // global sort implies it; an out-of-order event would only
      // increment late_dropped
      pts.grouped(300).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val ups = spark.table("hmmfwd").as[StreamOps.HmmUpdate].collect()
      assert(ups.forall(_.late_dropped === 0L), "in-order feed: no drops")
      // final per-user update (max len) carries the batch's ll
      val fin = ups.groupBy(_.user_id)
        .map { case (_, us) => us.maxBy(_.len) }
      val got = fin.groupBy(_.len).map { case (l, us) =>
        (l, us.size.toLong, us.map(_.ll_micro).sum) }
        .toSeq.sortBy(_._1)
      val batch = graft.SparkEntry.queries("q_hmm_forward")(spark, sf)
        .collect().map(r => (r.getAs[Long]("len"),
          r.getAs[Long]("n_users"), r.getAs[Long]("total_ll_micro")))
        .toSeq.sortBy(_._1)
      assert(got === batch)
    } finally q.stop()
  }

  test("late-drop counters flush as counter-only updates without a " +
       "close, and capped HMM state neither advances the cursor nor " +
       "counts late — ADVICE r12 observability contract") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dayUs = 86400000000L
    // --- Viterbi: two closed days, then a late event with NO close in
    // its micro-batch → one counter-only update (day = -1) carrying it
    val vin = MemoryStream[StreamOps.HoltPoint]
    val vq = StreamOps.viterbiMonitor(vin.toDS(), 2L, 4L).writeStream
      .format("memory").queryName("vflush").outputMode("append").start()
    try {
      vin.addData(StreamOps.HoltPoint(0L), StreamOps.HoltPoint(dayUs),
        StreamOps.HoltPoint(2 * dayUs))
      vq.processAllAvailable()
      val closed = spark.table("vflush")
        .as[StreamOps.ViterbiUpdate].collect()
      assert(closed.length === 2 && closed.forall(_.day >= 0L))
      vin.addData(StreamOps.HoltPoint(0L)) // late for closed day 0
      vq.processAllAvailable()
      val all = spark.table("vflush")
        .as[StreamOps.ViterbiUpdate].collect()
      assert(all.length === 3)
      val co = all.filter(_.day === -1L)
      assert(co.length === 1 && co.head.late_dropped === 1L,
        "close-less late drop must flush as a day = -1 update")
    } finally vq.stop()
    // --- HMM: 8 in-order events cap the state; a 9th (even one that
    // sorts before the 8th) must neither fold, nor advance the
    // cursor, nor count as late. A true late event BELOW the cap
    // flushes counter-only (len = -1).
    val hin = MemoryStream[StreamOps.HmmPoint]
    val hq = StreamOps.hmmForwardMonitor(hin.toDS()).writeStream
      .format("memory").queryName("hflush").outputMode("append").start()
    try {
      // user 1: fill to the cap in-order
      hin.addData((1L to 8L).map(i =>
        StreamOps.HmmPoint(1L, i * 1000L, i, "click")): _*)
      hq.processAllAvailable()
      // user 1 capped: an event BEFORE the cursor is parity-irrelevant
      hin.addData(StreamOps.HmmPoint(1L, 500L, 0L, "view"))
      hq.processAllAvailable()
      val u1 = spark.table("hflush").as[StreamOps.HmmUpdate]
        .collect().filter(_.user_id == 1L)
      assert(u1.length === 8 && u1.forall(_.late_dropped === 0L),
        "capped-state arrivals must not count as late")
      // user 2: two in-order, then one genuinely late with no
      // in-order event to carry the counter → counter-only flush
      hin.addData(StreamOps.HmmPoint(2L, 1000L, 1L, "click"),
        StreamOps.HmmPoint(2L, 2000L, 2L, "view"))
      hq.processAllAvailable()
      hin.addData(StreamOps.HmmPoint(2L, 1500L, 0L, "signup"))
      hq.processAllAvailable()
      val u2 = spark.table("hflush").as[StreamOps.HmmUpdate]
        .collect().filter(_.user_id == 2L)
      assert(u2.count(_.len >= 0L) === 2)
      val co2 = u2.filter(_.len === -1L)
      assert(co2.length === 1 && co2.head.late_dropped === 1L,
        "below-cap close-less late drop must flush as len = -1")
    } finally hq.stop()
  }

  test("streaming UCB1 replay equals batch q_ucb_replay after a " +
       "sentinel closes the last day — picks, rewards, cumulative") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val dayUs = 86400000000L
    def r6(v: Double): Double = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100)
          .cast("long").as("cents"))
      .as[StreamOps.UcbPoint]
      .collect().sortBy(_.ts_us)
    val in = MemoryStream[StreamOps.UcbPoint]
    val q = StreamOps.ucbMonitor(in.toDS()).writeStream
      .format("memory").queryName("ucb").outputMode("append").start()
    try {
      // PARITY CONTRACT: in-day-order arrival; late events only count
      pts.grouped(300).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val openDay = pts.last.ts_us / dayUs
      val mid = spark.table("ucb").as[StreamOps.UcbUpdate].collect()
      assert(mid.forall(_.day < openDay),
        "no round may precede its day closing")
      in.addData(StreamOps.UcbPoint(pts.last.ts_us + dayUs, "view", 0L))
      q.processAllAvailable()
      val stream = spark.table("ucb").as[StreamOps.UcbUpdate]
        .collect().sortBy(_.day)
      val batch = graft.SparkEntry.queries("q_ucb_replay")(spark, sf)
        .collect()
      assert(stream.length === batch.length,
        s"stream ${stream.length} rounds vs batch ${batch.length}")
      stream.zip(batch).foreach { case (sv, br) =>
        assert(sv.day === br.getAs[Long]("day"))
        assert(sv.t === br.getAs[Long]("t"), s"day ${sv.day}")
        assert(sv.arm === br.getAs[String]("arm"), s"day ${sv.day}")
        assert(r6(sv.reward) === br.getAs[Double]("reward"),
          s"day ${sv.day} reward")
        assert(r6(sv.cum_reward) === br.getAs[Double]("cum_reward"),
          s"day ${sv.day} cum")
        assert(sv.late_dropped === 0L)
      }
    } finally q.stop()
  }

  test("streaming first-touch extractor reproduces q_group_seq cells " +
       "and z under a deliberately SHUFFLED feed — order-insensitive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val dayUs = 86400000000L
    val pts = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id").cast("long"),
        org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100)
          .cast("long").as("cents"))
      .as[StreamOps.FunnelEvent].collect()
      // NOT time order: min-folds are commutative, so parity must hold
      .sortBy(p => (p.event_type, p.cents, p.ts_us))
    val in = MemoryStream[StreamOps.FunnelEvent]
    val q = StreamOps.firstTouchMonitor(in.toDS()).writeStream
      .format("memory").queryName("firsts").outputMode("append").start()
    try {
      pts.grouped(250).foreach { chunk =>
        in.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val ups = spark.table("firsts").as[StreamOps.FirstTouch].collect()
      // last emission per user = the settled (fd, fp) pair; emissions
      // only ever improve, so take the per-user minimum of each field
      val firsts = ups.groupBy(_.user_id).map { case (u, us) =>
        (u, us.map(_.first_day).min,
          us.flatMap(_.first_conv_day).sorted.headOption)
      }.toSeq
      val d0 = firsts.map(_._2).min
      val batch = graft.SparkEntry.queries("q_group_seq")(spark, sf)
        .collect().sortBy(_.getAs[Long]("k"))
      assert(batch.length === 4)
      batch.foreach { br =>
        val k = br.getAs[Long]("k")
        val cut = d0 + 7L * k
        def cell(arm: Long): (Long, Long) = {
          val enr = firsts.filter(f => f._1 % 2 == arm && f._2 < cut)
          (enr.length.toLong,
            enr.count(f => f._3.exists(_ < cut)).toLong)
        }
        val (n1, c1) = cell(0L)
        val (n2, c2) = cell(1L)
        assert(n1 === br.getAs[Long]("n1"), s"k=$k n1")
        assert(n2 === br.getAs[Long]("n2"), s"k=$k n2")
        assert(c1 === br.getAs[Long]("c1"), s"k=$k c1")
        assert(c2 === br.getAs[Long]("c2"), s"k=$k c2")
        // identical double op order -> identical z after 4-dp rounding
        val p1 = c1.toDouble / n1.toDouble
        val p2 = c2.toDouble / n2.toDouble
        val pb = (c1 + c2).toDouble / (n1 + n2).toDouble
        val se = math.sqrt(pb * (1.0 - pb) *
          (1.0 / n1.toDouble + 1.0 / n2.toDouble))
        val z = if (se > 0.0) (p1 - p2) / se else 0.0
        val z4 = BigDecimal(z)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(z4 === br.getAs[Double]("z"), s"k=$k z")
      }
    } finally q.stop()
  }
}
