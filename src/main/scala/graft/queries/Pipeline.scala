package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Composed training-data pipeline ops — the end-to-end corpus-preparation
  * story (builder brief: what a 100 TB pretraining pipeline runs daily),
  * built purely by composing the primitive operators:
  *
  *  - q_corpus_pipeline: exact-dedup → language gate → quality gate →
  *    token accounting, one declarative plan (Catalyst fuses the stages;
  *    the dedup group-by is the only shuffle);
  *  - q_hash_sample: deterministic content-hash sampling — the reproducible
  *    alternative to rand()-sampling, which the determinism gate rejects;
  *    every engine selects the identical subset;
  *  - q_shuffle_order: deterministic "training shuffle" — a pseudo-random
  *    but reproducible global ordering by content hash (at scale this is a
  *    total-order sort, i.e. one range-partitioned shuffle; the per-shard
  *    variant drops the global sort and orders within partitions).
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Shared doc-quality columns (identical formulas to TextOps so the
    * pipeline is the composition of the primitive ops, not a re-derivation). */
  private def withQuality(df: DataFrame): DataFrame = {
    val nTokens = (length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
    val stopCnt =
      size(regexp_extract_all(col("text"), lit("\\b(the|a)\\b"), lit(0)))
        .cast(LongType)
    val nonAscii =
      size(regexp_extract_all(col("text"), lit("[^\\x00-\\x7f]"), lit(0)))
    val theCnt =
      size(regexp_extract_all(col("text"), lit("\\bthe\\b"), lit(0)))
    df.withColumn("n_tokens", nTokens)
      .withColumn("stop_ratio",
        round(stopCnt.cast("double") / col("n_tokens"), 6))
      .withColumn("quality",
        round(log(lit(1.0) + col("n_tokens")) * (lit(1.0) - col("stop_ratio")), 6))
      .withColumn("pred_lang",
        when(nonAscii > 0, "zh").when(theCnt >= 3, "en").otherwise("unknown"))
  }

  /** Deterministic per-row hash in [0, 100) from the doc id. */
  private val pct =
    conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast(LongType) % 100

  val queries: Map[String, Q] = Map(
    "q_corpus_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // stage 1: exact dedup — keep the lowest doc_id per content hash
      // (shuffle carries the 32-byte digest, not the text)
      val keep = docs
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val deduped = docs.join(keep, Seq("doc_id"), "left_semi")
      // stages 2-4: language gate, quality gate, token accounting
      withQuality(deduped)
        .filter(col("pred_lang") === "en" && col("quality") >= 2.5)
        .select("doc_id", "n_tokens", "stop_ratio", "quality")
        .orderBy("doc_id")
    }),

    "q_hash_sample" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(pct < 10) // deterministic ~10% sample
        .select(col("doc_id"), col("lang"), pct.as("bucket"))
        .orderBy("doc_id")
    }),

    // salted two-phase aggregation (operators.Skew): hot-key mitigation
    // whose oracle is the PLAIN group-by — identical results is the claim
    "q_salted_agg" -> ((s, d) => {
      graft.operators.Skew
        .saltedAgg(Tables.events(s, d).select("user_id", "value"),
          Seq("user_id"), "value", salts = 16)
        .select(col("user_id"), round(col("sum_value"), 2).as("total"),
          col("n"))
        .orderBy("user_id")
    }),

    // salted equi-join (operators.Skew.saltedJoin): the hot-KEY join
    // mitigation — events key on event_type (5 values; the "one key is
    // 10% of 100 TB" regime where a plain shuffle join funnels a fifth
    // of the corpus through one reducer). Facts take a deterministic
    // per-row salt, the derived 5-row dim replicates ×8, the shuffle
    // key widens to (event_type, _salt) — and the oracle is the PLAIN
    // join: identical rows is the claim, exactly like q_salted_agg.
    // Sums stay exact (integer cents) so no FP-order drift.
    "q_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val dim = ev.select("event_type").distinct()
        .withColumn("wt", length(col("event_type")).cast("long"))
      graft.operators.Skew.saltedJoin(ev, dim, "event_type", salts = 8)
        .groupBy("event_type")
        .agg(max("wt").as("wt"), count(lit(1)).as("n"),
          sum("cents").as("cents"))
        .orderBy("event_type")
    }),

    // stratified sample: per-language quotas via the deterministic hash
    // (lang 'en' keeps 20%, others 5%) — reproducible downsampling with
    // class balance control
    "q_stratified_sample" -> ((s, d) => {
      val quota = when(col("lang") === "en", 20).otherwise(5)
      Tables.documents(s, d)
        .filter(pct < quota)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    }),

    "q_shuffle_order" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("shuf"))
        .orderBy("shuf")
        .limit(100)
    }),

    // ---- Z-order (Morton) clustering audit: interleave the low 10 bits
    // of two join/filter dimensions of lineitem into a single 20-bit
    // curve key, bucket rows by the top 12 curve bits, and report each
    // bucket's per-dimension min/max envelope. WHY: sorting 100 TB by z
    // before a partitioned/bucketed write (SinkOps) gives every file a
    // TIGHT min/max rectangle in BOTH dimensions, so parquet row-group
    // stats prune 2-D predicates — the standard multi-dimensional
    // data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER). The envelope
    // widths this query emits are exactly the skipping quality a table
    // maintainer monitors. Scale shape: the z key is pure per-row bit
    // math (codegen'd, no UDF); the audit is one partial-combined agg on
    // a 64-value key. The production write path is a range-partitioned
    // sort by z — one shuffle, amortized over every later scan.
    "q_zorder" -> ((s, d) => {
      val xb = pmod(col("l_partkey"), lit(1024L))
      val yb = pmod(col("l_suppkey"), lit(1024L))
      val z = (0 until 10).map { i =>
        shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _)
      Tables.lineitem(s, d)
        .select(xb.as("xb"), yb.as("yb"), z.as("z"))
        .groupBy(shiftright(col("z"), 8).as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min("xb").as("x_min"), max("xb").as("x_max"),
          min("yb").as("y_min"), max("yb").as("y_max"))
        .orderBy("z_bucket")
    }),

    // ---- equi-depth feature binning: 10 quantile bins of extendedprice.
    // The scale-correct shape is NOT a global ntile (that's a total sort
    // of the corpus through one partition): compute the 9 exact decile
    // cut points via the (value, freq) pre-agg, BROADCAST them, and
    // assign bins with a per-row comparison fold — one bounded agg plus
    // one map-only pass, any corpus size. Bin populations drift from
    // n/10 exactly where value ties straddle a cut — the honest
    // quantile-binning semantics. Note: prices are near-unique (~583k
    // distinct at sf0.1), so the exact percentile state is large —
    // this query is the EXACT-path demonstration; for continuous
    // domains at 100 TB swap the cuts to approx_percentile (the
    // q_approx_percentile sketch path), assignment unchanged.
    "q_equidepth_bins" -> ((s, d) => {
      // r14: the exact decile cuts are computed DISTRIBUTED.
      // percentile()'s partial state is a value→count map per task,
      // merged AND sorted on ONE reducer — ~583k entries at sf0.1, the
      // measured ~3 s serial chunk of this query. The same cuts now
      // come from the (value, count) pre-aggregate + one GlobalRank
      // prefix pass + an 18-row broadcast rank lookup (the rich-club
      // bounded-grid fan-in class). Cut values follow Spark
      // Percentile's interpolation ((hi−pos)·v_lo + (pos−lo)·v_hi at
      // pos = pct·(n−1)); the DuckDB oracle derives the SAME bins from
      // its own quantile_cont — binning is robust to the two engines'
      // ulp-level differences because an interpolated cut falls
      // strictly between adjacent distinct prices (or exactly on a
      // tie), so the published bins are unchanged (hash-green
      // re-verified at all three SFs).
      // NO fanoutReady here: round(avg(p), 4) is a float sum whose
      // accumulation order a repartition would reshuffle — measured one
      // 4th-decimal flip at sf0.01 — so the scan keeps its native
      // partitioning; the projected single column is cached for the
      // two passes.
      val li = graft.CacheScope.cached(Tables.lineitem(s, d)
        .select(col("l_extendedprice").as("p")))
      val vc = li.groupBy("p").agg(count(lit(1)).as("cnt"))
      val pre = graft.CacheScope.cached(
        graft.operators.GlobalRank.withPrefixAggs(vc, Seq(col("p").asc),
          Seq(graft.operators.GlobalRank.PrefixAgg("cnt", "cumex"))))
      val n = pre.agg(sum("cnt").as("n"))
      import s.implicits._
      val pcts = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
        .zipWithIndex.map { case (pc, i) => (i + 1, pc) }.toDF("i", "pct")
      val grid = pcts.crossJoin(broadcast(n))
        .select(col("i"),
          (col("pct") * (col("n").cast("double") - 1.0)).as("pos"))
        .select(col("i"), col("pos"),
          floor(col("pos")).cast("long").as("lo"),
          ceil(col("pos")).cast("long").as("hi"))
      // 0-based rank r lives on the distinct-value row with
      // cumex ≤ r < cumex + cnt (cumex = count of strictly-lower rows)
      val ranks = grid.select(col("i"), col("pos"), col("lo"), col("hi"),
        explode(array(col("lo"), col("hi"))).as("rank"))
      val hit = pre.join(broadcast(ranks),
          col("cumex") <= col("rank") &&
            col("rank") < col("cumex") + col("cnt"))
        .groupBy("i").agg(min("pos").as("pos"),
          min("lo").as("lo2"), min("hi").as("hi2"),
          min(when(col("rank") === col("lo"), col("p"))).as("vlo"),
          min(when(col("rank") === col("hi"), col("p"))).as("vhi"))
      val cutv = when(col("lo2") === col("hi2") ||
          col("vlo") === col("vhi"), col("vlo").cast("double"))
        .otherwise(
          (col("hi2").cast("double") - col("pos")) *
            col("vlo").cast("double") +
          (col("pos") - col("lo2").cast("double")) *
            col("vhi").cast("double"))
      val cuts = hit.select(col("i"), cutv.as("cut"))
        .agg(transform(
          sort_array(collect_list(struct(col("i"), col("cut")))),
          x => x.getField("cut")).as("cs"))
      val bin = (1 to 9).map(i =>
        when(col("p") > element_at(col("cs"), i), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
      li.crossJoin(broadcast(cuts))
        .select(col("p"), bin.as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min("p").as("lo"), max("p").as("hi"),
          round(avg("p"), 4).as("mean_p"))
        .orderBy("bin")
    })
  )

  private val qualitySql =
    """SELECT doc_id, text,
      |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
      |    AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT)
      |    AS stop_cnt,
      |  len(regexp_extract_all(text, '[^\x00-\x7f]')) AS non_ascii,
      |  len(regexp_extract_all(text, '\bthe\b')) AS the_cnt
      |FROM documents""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_corpus_pipeline" ->
      s"""WITH keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |q AS ($qualitySql),
         |t AS (
         |  SELECT doc_id, n_tokens,
         |    round(CAST(stop_cnt AS DOUBLE) / n_tokens, 6) AS stop_ratio,
         |    round(ln(1.0 + n_tokens) *
         |      (1.0 - round(CAST(stop_cnt AS DOUBLE) / n_tokens, 6)), 6)
         |      AS quality,
         |    CASE WHEN non_ascii > 0 THEN 'zh'
         |         WHEN the_cnt >= 3 THEN 'en' ELSE 'unknown' END AS pred_lang
         |  FROM q WHERE doc_id IN (SELECT doc_id FROM keep))
         |SELECT doc_id, n_tokens, stop_ratio, quality FROM t
         |WHERE pred_lang = 'en' AND quality >= 2.5
         |ORDER BY doc_id""".stripMargin,
    "q_hash_sample" ->
      """SELECT doc_id, lang,
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 100 AS bucket
        |FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 100 < 10
        |ORDER BY doc_id""".stripMargin,
    "q_salted_agg" ->
      """SELECT user_id, round(sum(value), 2) AS total,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_join" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |dim AS (
        |  SELECT event_type,
        |    CAST(length(event_type) AS BIGINT) AS wt
        |  FROM (SELECT DISTINCT event_type FROM ev))
        |SELECT ev.event_type, CAST(max(wt) AS BIGINT) AS wt,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM ev JOIN dim USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stratified_sample" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
        |FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 100 < CASE WHEN lang = 'en' THEN 20 ELSE 5 END
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_shuffle_order" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuf
        |FROM documents ORDER BY shuf LIMIT 100""".stripMargin,
    "q_zorder" -> {
      val zSql = (0 until 10).map { i =>
        s"(((xb // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
          s"((yb // ${1L << i}) % 2) * ${1L << (2 * i + 1)})"
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT l_partkey % 1024 AS xb, l_suppkey % 1024 AS yb
         |  FROM lineitem),
         |z AS (SELECT xb, yb, $zSql AS z FROM b)
         |SELECT z // 256 AS z_bucket, CAST(count(*) AS BIGINT) AS n,
         |  min(xb) AS x_min, max(xb) AS x_max,
         |  min(yb) AS y_min, max(yb) AS y_max
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q_equidepth_bins" -> {
      val binExpr = (1 to 9)
        .map(i => s"(CASE WHEN p > cs[$i] THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH li AS (SELECT l_extendedprice AS p FROM lineitem),
         |cuts AS (SELECT quantile_cont(p,
         |  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs FROM li),
         |assigned AS (
         |  SELECT p, 1 + $binExpr AS bin FROM li CROSS JOIN cuts)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |  min(p) AS lo, max(p) AS hi, round(avg(p), 4) AS mean_p
         |FROM assigned GROUP BY bin ORDER BY bin""".stripMargin
    }
  )
}
