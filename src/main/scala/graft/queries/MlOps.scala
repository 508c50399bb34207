package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-10 fourth batch: supervised classifier TRAINING on the engine
  * (multinomial Naive Bayes with Laplace smoothing — train and score in
  * one declarative plan), family-wise multiple-testing control (Holm
  * step-down, the FWER companion to q_bh_fdr's FDR control), and
  * two-series cointegration (Engle–Granger two-step) — the
  * model-building / inference surface a curation team runs beyond
  * per-row heuristics (reference analog: the batch-job surface,
  * cmd/bacalhau/run.go; the reference schedules such jobs, the engine
  * here executes their math).
  *
  * House disciplines (same as Stats2-5):
  *  - log-likelihood / probability weights quantize to micro-units
  *    (round(ln·10⁶) → BIGINT) so per-doc score sums are exact integer
  *    arithmetic and argmax ties break on explicit keys;
  *  - squared-cents moment sums route decimal(38,0) ↔ HUGEINT;
  *  - corpus-scale work is map-side-combined aggregates + one
  *    vocabulary-keyed scoring join; everything later is bounded
  *    (classes / event types / calendar days) or broadcast scalars.
  */
object MlOps {

  private type Q = (SparkSession, String) => DataFrame
  private val DayUs = 86400000000L

  /** Φ-tail helper via Abramowitz & Stegun 7.1.26 (textually identical
    * to q_bh_fdr's): two-sided p = 2·(1−Φ(|z|)). */
  private def twoSidedP(z: Column): Column = {
    val x = abs(z) / lit(math.sqrt(2.0))
    val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * tt - lit(1.453152027)) * tt +
      lit(1.421413741)) * tt - lit(0.284496736)) * tt +
      lit(0.254829592)) * tt
    lit(1.0) - (lit(1.0) - poly * exp(-x * x))
  }

  val queries: Map[String, Q] = Map(
    // ---- multinomial Naive Bayes, trained AND evaluated in one plan:
    // class-conditional token log-likelihoods with Laplace smoothing
    // (α = 1) from the (lang, word) count table, log-priors from the
    // class counts, then every document scores against all 5 classes
    // and takes the argmax. Exactness: every weight is a micro-
    // quantized BIGINT (round(ln θ·10⁶)), so per-document score sums
    // are exact integers under any partition order and the argmax
    // tiebreak (smallest lang) is total. Scale shape: ONE corpus
    // tokenize → (doc, word) counts (cached; map-side combine), a
    // vocabulary-bounded weight table, a 5-way candidate expansion
    // joined on the word key, and two keyed aggregates back down to
    // docs then classes — no driver loop, no UDF, the whole classifier
    // is Catalyst-visible.
    "q_naive_bayes" -> ((s, d) => {
      val dw = graft.CacheScope.cached(Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("c")))
      val cl = graft.CacheScope.cached(dw.groupBy(col("lang").as("l"),
        col("w")).agg(sum("c").as("cwl")))
      val tot = cl.groupBy("l").agg(sum("cwl").as("totl"))
      val vocab = cl.agg(countDistinct("w").as("vv"))
      val prior = graft.CacheScope.cached(dw
        .select("doc_id", "lang").distinct()
        .groupBy(col("lang").as("l")).agg(count(lit(1)).as("nl")))
      val nTot = prior.agg(sum("nl").as("n"))
      val classes = graft.CacheScope.cached(prior
        .join(tot, "l").crossJoin(broadcast(vocab))
        .crossJoin(broadcast(nTot))
        .select(col("l"),
          round(log(col("nl").cast("double") / col("n")) * 1e6)
            .cast(LongType).as("prior6"),
          round(log(lit(1.0) / (col("totl") + col("vv")).cast("double"))
            * 1e6).cast(LongType).as("miss6"),
          (col("totl") + col("vv")).as("denom")))
      val weights = cl.join(classes, "l")
        .select(col("l"), col("w"),
          round(log((col("cwl") + 1L).cast("double") / col("denom"))
            * 1e6).cast(LongType).as("l6"))
      val scored = dw
        .crossJoin(broadcast(classes.select("l", "prior6", "miss6")))
        .join(weights, Seq("l", "w"), "left")
        .select(col("doc_id"), col("lang"), col("l"), col("prior6"),
          (col("c") * coalesce(col("l6"), col("miss6"))).as("contrib"))
        .groupBy("doc_id", "lang", "l", "prior6")
        .agg(sum("contrib").as("ll6"))
        .select(col("doc_id"), col("lang"),
          struct((negate(col("ll6")) - col("prior6")).as("neg"),
            col("l")).as("cand"))
        .groupBy("doc_id", "lang")
        .agg(min("cand").as("best"))
        .select(col("lang"), col("best.l").as("pred"))
      val byClass = graft.CacheScope.cached(scored
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L))
            .as("n_correct")))
      val byPred = scored.groupBy(col("pred")).agg(count(lit(1))
        .as("n_pred"))
      byClass.join(byPred, col("lang") === col("pred"), "left")
        .select(col("lang"), col("n_docs"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          col("n_correct"),
          round(col("n_correct").cast("double") / col("n_docs"), 6)
            .as("accuracy"))
        .orderBy("lang")
    }),

    // ---- Holm step-down multiple-testing control: per event type, a
    // Welch z-test of weekend-vs-weekday mean value; the five raw
    // p-values (A&S erf, textually q_bh_fdr's) then adjust by the
    // step-down rule holm_p(i) = max_{j≤i} min(1, (k−j+1)·p(j)) —
    // family-wise error control where q_bh_fdr controls FDR. The
    // corpus collapses in ONE conditional aggregate keyed on type
    // (squared cents through decimal(38,0)); ranking and the running
    // max are broadcast self-joins on the 5-row frame with explicit
    // (p, type) tiebreaks.
    "q_holm_bonferroni" -> ((s, d) => {
      val g = graft.CacheScope.cached(Tables.events(s, d)
        .select(col("event_type").as("t"),
          (expr(s"ts_us div $DayUs") % 7).isin(2, 3).as("we"),
          round(col("value") * 100).cast(LongType).as("v"))
        .groupBy("t")
        .agg(
          sum(when(col("we"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("we"), col("v")).otherwise(0L)).as("s1"),
          sum(when(col("we"), (col("v") * col("v"))
            .cast("decimal(38,0)")).otherwise(lit(0).cast("decimal(38,0)")))
            .as("q1"),
          sum(when(!col("we"), 1L).otherwise(0L)).as("n0"),
          sum(when(!col("we"), col("v")).otherwise(0L)).as("s0"),
          sum(when(!col("we"), (col("v") * col("v"))
            .cast("decimal(38,0)")).otherwise(lit(0).cast("decimal(38,0)")))
            .as("q0")))
      val m1 = col("s1").cast("double") / col("n1")
      val m0 = col("s0").cast("double") / col("n0")
      val v1 = col("q1").cast("double") / col("n1") - m1 * m1
      val v0 = col("q0").cast("double") / col("n0") - m0 * m0
      val z = (m1 - m0) / sqrt(v1 / col("n1") + v0 / col("n0"))
      val p = graft.CacheScope.cached(g.select(col("t"), col("n1"),
        col("n0"), round(z, 6).as("z"),
        round(twoSidedP(z), 9).as("p")))
      val ranked = p
        .join(broadcast(p.select(col("p").as("pb"), col("t").as("tb"))),
          col("pb") < col("p") ||
            (col("pb") === col("p") && col("tb") <= col("t")))
        .groupBy("t", "n1", "n0", "z", "p")
        .agg(count(lit(1)).as("rank"))
      val k = p.agg(count(lit(1)).as("k"))
      val cand = graft.CacheScope.cached(ranked.crossJoin(broadcast(k))
        .select(col("t"), col("n1"), col("n0"), col("z"), col("p"),
          col("rank"),
          least((col("k") - col("rank") + 1).cast("double") * col("p"),
            lit(1.0)).as("cand")))
      cand
        .join(broadcast(cand.select(col("rank").as("rb"),
          col("cand").as("cb"))), col("rb") <= col("rank"))
        .groupBy("t", "n1", "n0", "z", "p", "rank")
        .agg(round(max("cb"), 9).as("holm_p"))
        .select(col("t").as("event_type"), col("n1").as("n_weekend"),
          col("n0").as("n_weekday"), col("z"), col("p"), col("holm_p"),
          (col("holm_p") < 0.05).as("significant"))
        .orderBy("event_type")
    }),

    // ---- Engle–Granger cointegration: do daily purchase revenues
    // track daily view revenues as one long-run relationship? Step 1:
    // OLS of purchase-cents on view-cents over the calendar-bounded
    // daily frame (exact integer moments, cross-products through
    // decimal(38,0)). Step 2: Dickey–Fuller regression of Δe on e₍t₋₁₎
    // over consecutive-day residual pairs — centi-quantized dollar²
    // terms (the DF ratio is invariant under the uniform scale) so
    // neither engine's addition order moves the statistic.
    // cointegrated at 5% ⟺ DF < −3.41 (Engle–Granger constant-case
    // critical value). ONE corpus aggregate; everything after is the
    // bounded day frame.
    "q_cointegration" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(
          sum(when(col("event_type") === "view",
            round(col("value") * 100).cast(LongType)).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast(LongType)).otherwise(0L))
            .as("y")))
      val mo = daily.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        // cast BEFORE the multiply: daily cents reach ~1.5e10 at the
        // 30x sweep, whose square wraps a Long silently
        sum(col("x").cast("decimal(19,0)") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(19,0)") * col("y")).as("sxy"))
      val nD = col("n").cast("double")
      val beta = mo.select(col("n"),
        ((nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (nD * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")))
          .as("b"),
        col("sx"), col("sy"))
        .select(col("n"), col("b"),
          ((col("sy").cast("double") - col("b") *
            col("sx").cast("double")) / col("n").cast("double"))
            .as("a"))
      val resid = graft.CacheScope.cached(daily
        .crossJoin(broadcast(beta))
        .select(col("day"), col("n"), col("a"), col("b"),
          ((col("y").cast("double") - col("a") -
            col("b") * col("x")) / 100.0).as("e")))
      val pairs = resid.select(col("day"), col("e"), col("n"),
          col("a"), col("b"))
        .join(resid.select((col("day") + 1L).as("day"),
          col("e").as("e1")), "day")
      val df = pairs
        .select(col("n"), col("a"), col("b"),
          round(col("e1") * (col("e") - col("e1")) * 100).cast(LongType)
            .as("num1"),
          round(col("e1") * col("e1") * 100).cast(LongType).as("den1"),
          col("e"), col("e1"))
        .groupBy("n", "a", "b")
        .agg(count(lit(1)).as("tt"), sum("num1").as("snum"),
          sum("den1").as("sden"),
          sum(round((col("e") - col("e1")) * (col("e") - col("e1")) * 100)
            .cast(LongType)).as("sdd"))
      val gamma = col("snum").cast("double") / col("sden")
      val sse = col("sdd").cast("double") -
        gamma * gamma * col("sden").cast("double")
      val se = sqrt(sse / (col("tt") - lit(1L)).cast("double") /
        col("sden").cast("double"))
      df.select(col("n").as("n_days"), col("tt").as("n_pairs"),
        round(col("a") / 100.0, 2).as("alpha_dollars"),
        round(col("b"), 6).as("beta"),
        round(gamma / se, 4).as("df_stat"),
        (gamma / se < -3.41).as("cointegrated"))
    }))

  val oracle: Map[String, String] = Map(
    "q_naive_bayes" ->
      """WITH dw AS MATERIALIZED (
        |  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' '))
        |          AS w FROM documents) t
        |  GROUP BY 1, 2, 3),
        |cl AS MATERIALIZED (
        |  SELECT lang AS l, w, CAST(sum(c) AS BIGINT) AS cwl
        |  FROM dw GROUP BY 1, 2),
        |tot AS (SELECT l, CAST(sum(cwl) AS BIGINT) AS totl
        |        FROM cl GROUP BY 1),
        |vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vv
        |          FROM cl),
        |prior AS (SELECT lang AS l,
        |            CAST(count(DISTINCT doc_id) AS BIGINT) AS nl
        |          FROM dw GROUP BY 1),
        |ntot AS (SELECT CAST(sum(nl) AS BIGINT) AS n FROM prior),
        |classes AS MATERIALIZED (
        |  SELECT p.l,
        |    CAST(round(ln(CAST(p.nl AS DOUBLE) / ntot.n) * 1e6)
        |      AS BIGINT) AS prior6,
        |    CAST(round(ln(1.0 / CAST(t.totl + vocab.vv AS DOUBLE))
        |      * 1e6) AS BIGINT) AS miss6,
        |    CAST(t.totl + vocab.vv AS BIGINT) AS denom
        |  FROM prior p JOIN tot t ON t.l = p.l
        |  CROSS JOIN vocab CROSS JOIN ntot),
        |weights AS MATERIALIZED (
        |  SELECT cl.l, cl.w,
        |    CAST(round(ln(CAST(cl.cwl + 1 AS DOUBLE) / c2.denom) * 1e6)
        |      AS BIGINT) AS l6
        |  FROM cl JOIN classes c2 ON c2.l = cl.l),
        |scoredoc AS (
        |  SELECT dw.doc_id, dw.lang, c2.l,
        |    CAST(c2.prior6 + sum(dw.c * coalesce(w2.l6, c2.miss6))
        |      AS BIGINT) AS s6
        |  FROM dw CROSS JOIN classes c2
        |  LEFT JOIN weights w2 ON w2.l = c2.l AND w2.w = dw.w
        |  GROUP BY 1, 2, 3, c2.prior6),
        |pred AS MATERIALIZED (
        |  SELECT doc_id, lang, l AS pred
        |  FROM (SELECT doc_id, lang, l,
        |          row_number() OVER (PARTITION BY doc_id
        |            ORDER BY s6 DESC, l) AS rn
        |        FROM scoredoc) r WHERE rn = 1),
        |byclass AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_correct
        |  FROM pred GROUP BY 1),
        |bypred AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_pred
        |           FROM pred GROUP BY 1)
        |SELECT b.lang, b.n_docs,
        |  CAST(coalesce(p.n_pred, 0) AS BIGINT) AS n_pred, b.n_correct,
        |  round(CAST(b.n_correct AS DOUBLE) / b.n_docs, 6) AS accuracy
        |FROM byclass b LEFT JOIN bypred p ON p.pred = b.lang
        |ORDER BY b.lang""".stripMargin,
    "q_holm_bonferroni" ->
      """WITH g AS (
        |  SELECT event_type AS t,
        |    CAST(sum(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN we THEN v ELSE 0 END) AS BIGINT) AS s1,
        |    sum(CASE WHEN we THEN CAST(v AS HUGEINT) * v
        |        ELSE CAST(0 AS HUGEINT) END) AS q1,
        |    CAST(sum(CASE WHEN we THEN 0 ELSE 1 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN we THEN 0 ELSE v END) AS BIGINT) AS s0,
        |    sum(CASE WHEN we THEN CAST(0 AS HUGEINT)
        |        ELSE CAST(v AS HUGEINT) * v END) AS q0
        |  FROM (SELECT event_type,
        |          (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS we,
        |          CAST(round(value * 100) AS BIGINT) AS v
        |        FROM events) e
        |  GROUP BY 1),
        |zp AS MATERIALIZED (
        |  SELECT t, n1, n0, round(z, 6) AS z,
        |    round(1.0 - (1.0 - (((((1.061405429 * tt - 1.453152027) * tt
        |      + 1.421413741) * tt - 0.284496736) * tt + 0.254829592)
        |      * tt) * exp(-x * x)), 9) AS p
        |  FROM (
        |    SELECT t, n1, n0, z, abs(z) / sqrt(2.0) AS x,
        |      1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
        |    FROM (
        |      SELECT t, n1, n0,
        |        (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) /
        |        sqrt((CAST(q1 AS DOUBLE) / n1 -
        |            (CAST(s1 AS DOUBLE) / n1) * (CAST(s1 AS DOUBLE) / n1))
        |            / n1 +
        |          (CAST(q0 AS DOUBLE) / n0 -
        |            (CAST(s0 AS DOUBLE) / n0) * (CAST(s0 AS DOUBLE) / n0))
        |            / n0) AS z
        |      FROM g) z1) z2),
        |ranked AS (
        |  SELECT a.t, a.n1, a.n0, a.z, a.p,
        |    CAST(count(*) AS BIGINT) AS rank
        |  FROM zp a JOIN zp b
        |    ON b.p < a.p OR (b.p = a.p AND b.t <= a.t)
        |  GROUP BY 1, 2, 3, 4, 5),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM zp),
        |cand AS MATERIALIZED (
        |  SELECT r.t, r.n1, r.n0, r.z, r.p, r.rank,
        |    least(CAST(k.k - r.rank + 1 AS DOUBLE) * r.p, 1.0) AS cand
        |  FROM ranked r CROSS JOIN k)
        |SELECT a.t AS event_type, a.n1 AS n_weekend, a.n0 AS n_weekday,
        |  a.z, a.p, round(max(b.cand), 9) AS holm_p,
        |  round(max(b.cand), 9) < 0.05 AS significant
        |FROM cand a JOIN cand b ON b.rank <= a.rank
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY event_type""".stripMargin,
    "q_cointegration" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'view'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM daily),
        |beta AS (
        |  SELECT n, b,
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) /
        |      CAST(n AS DOUBLE) AS a
        |  FROM (
        |    SELECT n, sx, sy,
        |      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
        |    FROM mo) t),
        |resid AS MATERIALIZED (
        |  SELECT d.day, b.n, b.a, b.b,
        |    (CAST(d.y AS DOUBLE) - b.a - b.b * d.x) / 100.0 AS e
        |  FROM daily d CROSS JOIN beta b),
        |pairs AS (
        |  SELECT r.n, r.a, r.b, r.e, r1.e AS e1
        |  FROM resid r JOIN resid r1 ON r1.day = r.day - 1),
        |df AS (
        |  SELECT n, a, b, CAST(count(*) AS BIGINT) AS tt,
        |    CAST(sum(CAST(round(e1 * (e - e1) * 100) AS BIGINT))
        |      AS BIGINT) AS snum,
        |    CAST(sum(CAST(round(e1 * e1 * 100) AS BIGINT)) AS BIGINT)
        |      AS sden,
        |    CAST(sum(CAST(round((e - e1) * (e - e1) * 100) AS BIGINT))
        |      AS BIGINT) AS sdd
        |  FROM pairs GROUP BY 1, 2, 3)
        |SELECT n AS n_days, tt AS n_pairs,
        |  round(a / 100.0, 2) AS alpha_dollars,
        |  round(b, 6) AS beta,
        |  round((CAST(snum AS DOUBLE) / sden) /
        |    sqrt((CAST(sdd AS DOUBLE) - (CAST(snum AS DOUBLE) / sden) *
        |        (CAST(snum AS DOUBLE) / sden) * sden) / (tt - 1) / sden),
        |    4) AS df_stat,
        |  (CAST(snum AS DOUBLE) / sden) /
        |    sqrt((CAST(sdd AS DOUBLE) - (CAST(snum AS DOUBLE) / sden) *
        |        (CAST(snum AS DOUBLE) / sden) * sden) / (tt - 1) / sden)
        |    < -3.41 AS cointegrated
        |FROM df""".stripMargin)
}
