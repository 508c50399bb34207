package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-10 third batch: probabilistic-forecast evaluation (Brier /
  * Murphy decomposition), ranked-retrieval evaluation (average
  * precision), multi-feature closed-form OLS, spectral seasonality
  * (DFT periodogram), MERGE/upsert semantics, and bounded
  * edit-distance matching — the evaluation + maintenance surface of a
  * curation pipeline (reference analog: the job summarize/verify
  * surface, cmd/bacalhau/describe.go; the reference ships results
  * around, the engine here scores them).
  *
  * House disciplines (same as Stats2/3/4):
  *  - exact integer sums (cents / counts / 6-dp-quantized scores) until
  *    ONE final division; squared-cents class sums route through
  *    decimal(38,0) ↔ HUGEINT;
  *  - any float term entering a SUM quantizes to nano-units first;
  *  - corpus-scale work is a single map-side-combined aggregate; SF-
  *    scaled prefix scans run through GlobalRank's two-phase form; all
  *    later joins are calendar/bin-bounded frames or broadcast scalars;
  *  - ties break on explicit deterministic keys.
  */
object Stats5 {

  private type Q = (SparkSession, String) => DataFrame
  private val DayUs = 86400000000L

  /** The Pipeline/TextOps quality score (textually identical to
    * Evaluation.quality — the shared gate heuristic under test). */
  private def quality = {
    val nTokens = (length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
    val stopCnt =
      size(regexp_extract_all(col("text"), lit("\\b(the|a)\\b"), lit(0)))
        .cast(LongType)
    val stopRatio = round(stopCnt.cast("double") / nTokens, 6)
    round(log(lit(1.0) + nTokens) * (lit(1.0) - stopRatio), 6)
  }

  /** The quality score squashed to a probability of lang='en' via a
    * fixed logistic link (center 1.2, unit scale) — 6-dp-rounded so the
    * micro-quantized integer form p6 = p·10⁶ is exact on both engines. */
  private def prob6: Column =
    round(lit(1.0) / (lit(1.0) + exp(lit(1.2) - quality)) * 1e6)
      .cast(LongType)

  /** Shared oracle fragment: per-document (p6, y) — the logistic
    * probability in micro-units and the lang='en' outcome bit. */
  private val scoredSql =
    """scored AS (
      |  SELECT CAST(round(1.0 / (1.0 + exp(1.2 -
      |      round(ln(1.0 + n_tokens) *
      |        (1.0 - round(CAST(stop_cnt AS DOUBLE) / n_tokens, 6)), 6)))
      |      * 1e6) AS BIGINT) AS p6,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
      |    doc_id
      |  FROM (
      |    SELECT doc_id, lang,
      |      CAST(length(text) - length(replace(text, ' ', '')) + 1
      |        AS BIGINT) AS n_tokens,
      |      CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT)
      |        AS stop_cnt
      |    FROM documents) t)""".stripMargin

  val queries: Map[String, Q] = Map(
    // ---- Brier score + Murphy decomposition: is the quality-score
    // probability CALIBRATED as a predictor of lang='en', and how much
    // of its error is miscalibration (reliability) vs genuine
    // discrimination (resolution)? The whole statistic collapses in ONE
    // corpus aggregate keyed on the 10-way probability bin: per-bin
    // (n, Σp6, Σy, Σd²) where d = p6 − y·10⁶ is an exact integer, d²
    // routed through decimal(38,0) (1.8 M docs × 10¹² per-row max
    // already brushes BIGINT). The 10-row bin frame then produces the
    // decomposition with per-bin terms nano-quantized before the final
    // 10-term sum, so neither engine's addition order can move a digit.
    "q_brier_score" -> ((s, d) => {
      val bins = graft.CacheScope.cached(Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(prob6.as("p6"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .groupBy(least(expr("p6 div 100000"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("nk"), sum("p6").as("sp6"),
          sum("y").as("sy"),
          sum(((col("p6") - col("y") * 1000000L) *
            (col("p6") - col("y") * 1000000L)).cast("decimal(38,0)"))
            .as("sd2")))
      val tot = bins.agg(sum("nk").as("n"), sum("sy").as("syt"),
        sum("sd2").as("sd2t"))
      val ybar = col("syt").cast("double") / col("n")
      val pbar = col("sp6").cast("double") / col("nk") / 1e6
      val ykbar = col("sy").cast("double") / col("nk")
      bins.crossJoin(broadcast(tot))
        .select(col("n"), col("syt"), col("sd2t"),
          round(col("nk") * (pbar - ykbar) * (pbar - ykbar) * 1e9)
            .cast(LongType).as("rel9"),
          round(col("nk") * (ykbar - ybar) * (ykbar - ybar) * 1e9)
            .cast(LongType).as("res9"))
        .groupBy("n", "syt", "sd2t")
        .agg(sum("rel9").as("rel9"), sum("res9").as("res9"))
        .select(col("n").as("n_docs"),
          round(col("sd2t").cast("double") / col("n") / 1e12, 6)
            .as("brier"),
          round(col("rel9").cast("double") / col("n") / 1e9, 6)
            .as("reliability"),
          round(col("res9").cast("double") / col("n") / 1e9, 6)
            .as("resolution"),
          round(ybar * (lit(1.0) - ybar), 6).as("uncertainty"))
    }),

    // ---- Average precision (area under the precision–recall curve,
    // interpolation-free): rank ALL documents by the probability score
    // descending with doc_id as the deterministic tiebreaker (a total
    // order — no midrank ambiguity), then AP = (1/np)·Σ_{positives}
    // precision@k. The global rank k and the positive prefix count run
    // through GlobalRank's two-phase prefix (range-repartition + local
    // window + broadcast offsets) — no single task ever sorts the
    // corpus. Each positive's precision ratio nano-quantizes before the
    // SF-scaled sum.
    "q_avg_precision" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), prob6.as("p6"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        .withColumn("one", lit(1L))
      val ranked = graft.operators.GlobalRank.withPrefixAggs(scored,
        Seq(negate(col("p6")), col("doc_id")),
        Seq(graft.operators.GlobalRank.PrefixAgg("one", "k",
            inclusive = true),
          graft.operators.GlobalRank.PrefixAgg("pos", "cumpos",
            inclusive = true)))
      ranked.filter(col("pos") === 1L)
        .select(round(col("cumpos").cast("double") / col("k") * 1e9)
          .cast(LongType).as("prec9"))
        .agg(count(lit(1)).as("np"), sum("prec9").as("sprec9"))
        .select(col("np"),
          round(col("sprec9").cast("double") / col("np") / 1e9, 6)
            .as("avg_precision"))
    }),

    // ---- Two-feature closed-form OLS: event value (cents) against
    // trend (day index) and a weekend indicator — "is revenue growing,
    // net of the weekend dip?". Because both predictors are functions
    // of the DAY alone, the row-level normal equations collapse exactly
    // onto the per-day aggregate: Σ_rows f(day)·y = Σ_day f·sc_d and
    // Σ_rows f² = Σ_day n_d·f², so ONE corpus aggregate (day → n, Σc,
    // Σc² with the squared-cents sum in decimal(38,0)) feeds an exact
    // integer moment frame; the 3×3 Cramer solve and R² happen in
    // double on the one-row frame with an identical expression tree in
    // the oracle. SSE re-expands over the calendar-bounded day frame
    // with unit-quantized terms (cents² resolution).
    "q_ols2" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .select(expr(s"ts_us div $DayUs").as("day"),
          round(col("value") * 100).cast(LongType).as("cents"))
        .groupBy("day")
        .agg(count(lit(1)).as("nd"), sum("cents").as("sc"),
          sum((col("cents") * col("cents")).cast("decimal(38,0)"))
            .as("syy")))
      val mn = daily.agg(min("day").as("mn"))
      val dd = daily.crossJoin(broadcast(mn))
        .select(col("nd"), col("sc"), col("syy"),
          (col("day") - col("mn")).as("x1"),
          when((col("day") % 7).isin(2, 3), 1L).otherwise(0L).as("x2"))
      val m = graft.CacheScope.cached(dd.agg(
        sum("nd").as("n"), sum(col("nd") * col("x1")).as("s1"),
        sum(col("nd") * col("x2")).as("s2"),
        sum(col("nd") * col("x1") * col("x1")).as("s11"),
        sum(col("nd") * col("x1") * col("x2")).as("s12"),
        sum(col("nd") * col("x2") * col("x2")).as("s22"),
        sum("sc").as("sy"), sum(col("x1") * col("sc")).as("s1y"),
        sum(col("x2") * col("sc")).as("s2y"),
        sum("syy").as("syyt")))
      def det3(a: Column, b: Column, c: Column, p: Column, q: Column,
          r: Column, x: Column, y: Column, z: Column): Column =
        a * (q * z - r * y) - b * (p * z - r * x) + c * (p * y - q * x)
      val (n, s1, s2) = (col("n").cast("double"),
        col("s1").cast("double"), col("s2").cast("double"))
      val (s11, s12, s22) = (col("s11").cast("double"),
        col("s12").cast("double"), col("s22").cast("double"))
      val (sy, s1y, s2y) = (col("sy").cast("double"),
        col("s1y").cast("double"), col("s2y").cast("double"))
      val den = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
      val beta = m.select(col("n").as("n_events"), col("sy"),
        col("syyt"),
        (det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / den).as("b0"),
        (det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / den).as("b1"),
        (det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / den).as("b2"))
      val sse = dd.crossJoin(broadcast(beta))
        .select((col("b0") + col("b1") * col("x1") +
          col("b2") * col("x2")).as("yh"), col("nd"), col("sc"),
          col("n_events"), col("sy"), col("syyt"), col("b0"),
          col("b1"), col("b2"))
        .groupBy("n_events", "sy", "syyt", "b0", "b1", "b2")
        .agg(sum(round(col("nd") * col("yh") * col("yh") -
          lit(2.0) * col("yh") * col("sc")).cast(LongType)).as("sseq"))
      val sst = col("syyt").cast("double") -
        col("sy").cast("double") * col("sy") / col("n_events")
      sse.select(col("n_events"),
        round(col("b0") / 100.0, 4).as("intercept_dollars"),
        round(col("b1") / 100.0, 6).as("trend_per_day"),
        round(col("b2") / 100.0, 4).as("weekend_effect"),
        round(lit(1.0) - (col("sseq") + col("syyt")).cast("double") /
          sst, 6).as("r2"))
    }),

    // ---- DFT periodogram: spectral power of the daily event-count
    // series at candidate periods 2..14 days — "is the cadence weekly,
    // biweekly, or something odder?" (q_seasonality's autocorrelation
    // asks one lag; the periodogram prices all of them at once). The
    // corpus collapses to calendar-bounded daily counts; the
    // (day × period) expansion is a broadcast of a 13-row literal
    // frame; each cos/sin product micro-quantizes before its sum so
    // both engines add identical integers. Power normalizes by n²
    // (squared total count): power_p = (A_p² + B_p²)/n².
    "q_periodogram" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("c")))
      val mn = daily.agg(min("day").as("mn"), sum("c").as("n"))
      val periods = s.range(2, 15).toDF("p")
      val ang = lit(6.283185307179586) *
        (col("day") - col("mn")).cast("double") / col("p")
      daily.crossJoin(broadcast(mn))
        .crossJoin(broadcast(periods))
        .select(col("p"), col("n"),
          round(col("c") * cos(ang) * 1e6).cast(LongType).as("ca6"),
          round(col("c") * sin(ang) * 1e6).cast(LongType).as("sb6"))
        .groupBy("p", "n")
        .agg(sum("ca6").as("a6"), sum("sb6").as("b6"))
        .select(col("p").as("period"),
          round((col("a6") / 1e6 * col("a6") / 1e6 +
            col("b6") / 1e6 * col("b6") / 1e6) /
            (col("n").cast("double") * col("n")), 8).as("power"))
        .orderBy("period")
    }),

    // ---- MERGE/upsert semantics (the Delta-style three-branch MERGE,
    // run as a batch set-op): the first calendar half builds the target
    // per-user profile, the second half is the change batch; matched
    // users UPDATE (batch ≥ 2 events) or DELETE (batch gone quiet: 1
    // event), unmatched batch users INSERT. Because both sides derive
    // from the same scan, the whole merge is ONE corpus aggregate
    // keyed on user_id with conditional halves — no join at all; the
    // calendar midpoint derives from the per-user frame like q_mcnemar
    // (integer div, no second scan).
    "q_merge_upsert" -> ((s, d) => {
      val per = graft.CacheScope.cached(Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"),
          round(col("value") * 100).cast(LongType).as("cents"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("nd"), sum("cents").as("sc")))
      val mid = per.agg(min("day").as("mn"), max("day").as("mx"))
        .select(expr("(mn + mx + 1) div 2").as("mid"))
      val u = per.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("day") < col("mid"), col("nd")).otherwise(0L))
            .as("pre_n"),
          sum(when(col("day") >= col("mid"), col("nd")).otherwise(0L))
            .as("post_n"),
          sum(when(col("day") < col("mid"), col("sc")).otherwise(0L))
            .as("pre_c"),
          sum(when(col("day") >= col("mid"), col("sc")).otherwise(0L))
            .as("post_c"))
      val ins = col("pre_n") === 0L && col("post_n") > 0L
      val del = col("pre_n") > 0L && col("post_n") === 1L
      val upd = col("pre_n") > 0L && col("post_n") >= 2L
      val untouched = col("pre_n") > 0L && col("post_n") === 0L
      u.agg(
        sum(when(col("pre_n") > 0L, 1L).otherwise(0L)).as("n_target"),
        sum(when(col("post_n") > 0L, 1L).otherwise(0L)).as("n_batch"),
        sum(when(ins, 1L).otherwise(0L)).as("n_inserted"),
        sum(when(upd, 1L).otherwise(0L)).as("n_updated"),
        sum(when(del, 1L).otherwise(0L)).as("n_deleted"),
        sum(when(untouched, 1L).otherwise(0L)).as("n_untouched"),
        sum(when(ins || upd || untouched, 1L).otherwise(0L))
          .as("n_after"),
        round(sum(when(ins, col("post_c"))
          .when(upd, col("pre_c") + col("post_c"))
          .when(untouched, col("pre_c")).otherwise(0L))
          .cast("double") / 100.0, 2).as("dollars_after"))
    }),

    // ---- bounded edit-distance matching: for the 50 lowest-keyed
    // suppliers, the nearest of the 50 lowest-keyed customer names by
    // Levenshtein distance (tiebreak: smallest custkey) — the
    // fixed-candidate form of fuzzy matching (q_fuzzy_join blocks by
    // key prefix and SCALES; this op is the audit panel a human reads,
    // so it is top-k-bounded BY CONSTRUCTION: two TakeOrdered(50)
    // pulls, a 2 500-pair broadcast product, nothing SF-scaled past
    // the limits).
    "q_edit_distance" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
        .select("s_suppkey", "s_name").orderBy("s_suppkey").limit(50)
      val cust = Tables.customer(s, d)
        .select("c_custkey", "c_name").orderBy("c_custkey").limit(50)
      sup.crossJoin(broadcast(cust))
        .select(col("s_suppkey"), col("s_name"),
          struct(levenshtein(col("s_name"), col("c_name")).as("dist"),
            col("c_custkey").as("ck")).as("cand"))
        .groupBy("s_suppkey", "s_name")
        .agg(min("cand").as("best"))
        .select(col("s_suppkey"), col("s_name"),
          col("best.ck").as("best_custkey"),
          col("best.dist").as("dist"))
        .orderBy("s_suppkey")
    }))

  val oracle: Map[String, String] = Map(
    "q_brier_score" ->
      s"""WITH $scoredSql,
         |bins AS (
         |  SELECT least(p6 // 100000, 9) AS bin,
         |    CAST(count(*) AS BIGINT) AS nk,
         |    CAST(sum(p6) AS BIGINT) AS sp6,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    sum(CAST((p6 - y * 1000000) AS HUGEINT)
         |      * (p6 - y * 1000000)) AS sd2
         |  FROM scored GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(nk) AS BIGINT) AS n,
         |    CAST(sum(sy) AS BIGINT) AS syt,
         |    CAST(sum(sd2) AS HUGEINT) AS sd2t
         |  FROM bins),
         |terms AS (
         |  SELECT t.n, t.syt, t.sd2t,
         |    CAST(round(b.nk * (CAST(b.sp6 AS DOUBLE) / b.nk / 1e6 -
         |        CAST(b.sy AS DOUBLE) / b.nk) *
         |      (CAST(b.sp6 AS DOUBLE) / b.nk / 1e6 -
         |        CAST(b.sy AS DOUBLE) / b.nk) * 1e9) AS BIGINT) AS rel9,
         |    CAST(round(b.nk * (CAST(b.sy AS DOUBLE) / b.nk -
         |        CAST(t.syt AS DOUBLE) / t.n) *
         |      (CAST(b.sy AS DOUBLE) / b.nk -
         |        CAST(t.syt AS DOUBLE) / t.n) * 1e9) AS BIGINT) AS res9
         |  FROM bins b CROSS JOIN tot t)
         |SELECT n AS n_docs,
         |  round(CAST(sd2t AS DOUBLE) / n / 1e12, 6) AS brier,
         |  round(CAST(sum(rel9) AS DOUBLE) / n / 1e9, 6) AS reliability,
         |  round(CAST(sum(res9) AS DOUBLE) / n / 1e9, 6) AS resolution,
         |  round((CAST(syt AS DOUBLE) / n) *
         |    (1.0 - CAST(syt AS DOUBLE) / n), 6) AS uncertainty
         |FROM terms GROUP BY n, syt, sd2t""".stripMargin,
    "q_avg_precision" ->
      s"""WITH $scoredSql,
         |ranked AS (
         |  SELECT y,
         |    CAST(row_number() OVER (ORDER BY p6 DESC, doc_id)
         |      AS BIGINT) AS k,
         |    CAST(sum(y) OVER (ORDER BY p6 DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cumpos
         |  FROM scored)
         |SELECT CAST(count(*) AS BIGINT) AS np,
         |  round(CAST(sum(CAST(round(CAST(cumpos AS DOUBLE) / k * 1e9)
         |    AS BIGINT)) AS DOUBLE) / count(*) / 1e9, 6)
         |    AS avg_precision
         |FROM ranked WHERE y = 1""".stripMargin,
    "q_ols2" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sc,
        |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
        |      * CAST(round(value * 100) AS BIGINT)) AS syy
        |  FROM events GROUP BY 1),
        |dd AS (
        |  SELECT nd, sc, syy, day - (SELECT min(day) FROM daily) AS x1,
        |    CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END AS x2
        |  FROM daily),
        |m AS (
        |  SELECT CAST(sum(nd) AS DOUBLE) AS n,
        |    CAST(sum(nd * x1) AS DOUBLE) AS s1,
        |    CAST(sum(nd * x2) AS DOUBLE) AS s2,
        |    CAST(sum(nd * x1 * x1) AS DOUBLE) AS s11,
        |    CAST(sum(nd * x1 * x2) AS DOUBLE) AS s12,
        |    CAST(sum(nd * x2 * x2) AS DOUBLE) AS s22,
        |    CAST(sum(sc) AS DOUBLE) AS sy,
        |    CAST(sum(x1 * sc) AS DOUBLE) AS s1y,
        |    CAST(sum(x2 * sc) AS DOUBLE) AS s2y,
        |    CAST(sum(syy) AS HUGEINT) AS syyt,
        |    CAST(sum(nd) AS BIGINT) AS n_events
        |  FROM dd),
        |beta AS (
        |  SELECT n_events, sy, syyt,
        |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y)) /
        |    (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2)) AS b0,
        |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2)) /
        |    (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2)) AS b1,
        |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2)) /
        |    (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2)) AS b2
        |  FROM m),
        |sse AS (
        |  SELECT b.n_events, b.sy, b.syyt, b.b0, b.b1, b.b2,
        |    CAST(sum(CAST(round(d.nd * (b.b0 + b.b1 * d.x1 + b.b2 * d.x2)
        |        * (b.b0 + b.b1 * d.x1 + b.b2 * d.x2)
        |      - 2.0 * (b.b0 + b.b1 * d.x1 + b.b2 * d.x2) * d.sc)
        |      AS BIGINT)) AS BIGINT) AS sseq
        |  FROM dd d CROSS JOIN beta b
        |  GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT n_events,
        |  round(b0 / 100.0, 4) AS intercept_dollars,
        |  round(b1 / 100.0, 6) AS trend_per_day,
        |  round(b2 / 100.0, 4) AS weekend_effect,
        |  round(1.0 - CAST(sseq + syyt AS DOUBLE) /
        |    (CAST(syyt AS DOUBLE) - sy * sy / n_events), 6) AS r2
        |FROM sse""".stripMargin,
    "q_periodogram" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |mn AS (SELECT min(day) AS mn, CAST(sum(c) AS BIGINT) AS n
        |       FROM daily),
        |periods AS (SELECT CAST(range AS BIGINT) AS p
        |            FROM range(2, 15)),
        |terms AS (
        |  SELECT p.p, m.n,
        |    CAST(round(d.c * cos(6.283185307179586 *
        |      CAST(d.day - m.mn AS DOUBLE) / p.p) * 1e6) AS BIGINT)
        |      AS ca6,
        |    CAST(round(d.c * sin(6.283185307179586 *
        |      CAST(d.day - m.mn AS DOUBLE) / p.p) * 1e6) AS BIGINT)
        |      AS sb6
        |  FROM daily d CROSS JOIN mn m CROSS JOIN periods p)
        |SELECT p AS period,
        |  round((CAST(sum(ca6) AS DOUBLE) / 1e6 *
        |      (CAST(sum(ca6) AS DOUBLE) / 1e6) +
        |    CAST(sum(sb6) AS DOUBLE) / 1e6 *
        |      (CAST(sum(sb6) AS DOUBLE) / 1e6)) /
        |    (CAST(n AS DOUBLE) * n), 8) AS power
        |FROM terms GROUP BY p, n ORDER BY period""".stripMargin,
    "q_merge_upsert" ->
      """WITH per AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sc
        |  FROM events GROUP BY 1, 2),
        |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM per),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN day < mid THEN nd ELSE 0 END) AS BIGINT)
        |      AS pre_n,
        |    CAST(sum(CASE WHEN day >= mid THEN nd ELSE 0 END) AS BIGINT)
        |      AS post_n,
        |    CAST(sum(CASE WHEN day < mid THEN sc ELSE 0 END) AS BIGINT)
        |      AS pre_c,
        |    CAST(sum(CASE WHEN day >= mid THEN sc ELSE 0 END) AS BIGINT)
        |      AS post_c
        |  FROM per CROSS JOIN mid GROUP BY 1)
        |SELECT
        |  CAST(sum(CASE WHEN pre_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_target,
        |  CAST(sum(CASE WHEN post_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_batch,
        |  CAST(sum(CASE WHEN pre_n = 0 AND post_n > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_inserted,
        |  CAST(sum(CASE WHEN pre_n > 0 AND post_n >= 2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_updated,
        |  CAST(sum(CASE WHEN pre_n > 0 AND post_n = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_deleted,
        |  CAST(sum(CASE WHEN pre_n > 0 AND post_n = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_untouched,
        |  CAST(sum(CASE WHEN post_n >= 2 OR (pre_n > 0 AND post_n = 0)
        |    OR pre_n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
        |  round(CAST(sum(CASE
        |    WHEN pre_n = 0 AND post_n > 0 THEN post_c
        |    WHEN pre_n > 0 AND post_n >= 2 THEN pre_c + post_c
        |    WHEN pre_n > 0 AND post_n = 0 THEN pre_c
        |    ELSE 0 END) AS DOUBLE) / 100.0, 2) AS dollars_after
        |FROM u""".stripMargin,
    "q_edit_distance" ->
      """WITH sup AS (
        |  SELECT s_suppkey, s_name FROM supplier
        |  ORDER BY s_suppkey LIMIT 50),
        |cust AS (
        |  SELECT c_custkey, c_name FROM customer
        |  ORDER BY c_custkey LIMIT 50),
        |pairs AS (
        |  SELECT s.s_suppkey, s.s_name, c.c_custkey,
        |    CAST(levenshtein(s.s_name, c.c_name) AS INTEGER) AS dist,
        |    row_number() OVER (PARTITION BY s.s_suppkey
        |      ORDER BY levenshtein(s.s_name, c.c_name), c.c_custkey)
        |      AS rn
        |  FROM sup s CROSS JOIN cust c)
        |SELECT s_suppkey, s_name, c_custkey AS best_custkey, dist
        |FROM pairs WHERE rn = 1 ORDER BY s_suppkey""".stripMargin)
}
