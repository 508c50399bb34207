package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-10 sixth batch: the nonparametric / panel counterparts of the
  * Stats2–6 parametric diagnostics — median-based group comparison
  * (Mood's median test), robust variance homogeneity (Brown–Forsythe),
  * ordered-alternative trend across groups (Jonckheere–Terpstra) and
  * across repeated blocks (Page's L), the two-way within (fixed-effects)
  * estimator for panel data, and multivariate outlier scanning
  * (Mahalanobis distance). Reference analog: the per-job-class latency /
  * reliability comparisons the reference's dashboards eyeball over its
  * event history (pkg/requesternode/requester_node.go records them; the
  * engine here tests them).
  *
  * House disciplines (same as Stats2–6 / MlOps):
  *  - the corpus collapses in ONE map-side-combined aggregate — either to
  *    the calendar/type frame (≤ ~40×k rows) or to the VALUE-DOMAIN
  *    histogram (distinct cents ≤ the fixed price range, ~50k rows at ANY
  *    scale factor — the same bound q_equidepth_bins rides): medians and
  *    rank counts come off the histogram, never a global sort;
  *  - exact integer moments (cents / half-cents / counts) until the final
  *    double algebra; squared-cents and cubic-count sums route
  *    decimal(38,0) ↔ HUGEINT;
  *  - cross-group pair counts run on the dense (group × value) grid —
  *    a (k × domain)-bounded frame — with per-group cumulative windows
  *    (k-way parallel, domain-bounded partitions), not an O(N²) pair
  *    enumeration;
  *  - ties break on explicit keys (event_id, event_type).
  */
object Stats7 {

  private type Q = (SparkSession, String) => DataFrame
  private val DayUs = 86400000000L

  /** (event_type, cents) projection every query in this batch starts
    * from — one scan, exact integer cents. */
  private def evCents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .transform(Tables.fanoutReady)
      .select(col("event_type"),
        round(col("value") * 100).cast(LongType).as("c"))

  val queries: Map[String, Q] = Map(
    // ---- Mood's median test: do the event types share one median value?
    // The GLOBAL median comes off the value-domain histogram (groupBy
    // cents is domain-bounded at any SF — exact weighted percentile, no
    // corpus sort); each type's above-median count is one more pass over
    // the cached projection; the k×2 contingency χ² runs on the k-row
    // frame. χ²(k−1) 5% critical for the fixture's 5 types = 9.488 —
    // fixed literal, mirrored in the oracle.
    "q_moods_median" -> ((s, d) => {
      val ev = graft.CacheScope.cached(evCents(s, d))
      val med = ev.groupBy("c").agg(count(lit(1)).as("f"))
        .agg(expr("percentile(c, 0.5, f)").as("med"))
      val byType = ev.crossJoin(broadcast(med))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("c").cast("double") > col("med"), 1L)
            .otherwise(0L)).as("a"))
      val tot = byType.agg(sum("n").as("nn"), sum("a").as("aa"))
      val cells = graft.CacheScope.cached(byType.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n"), col("a"),
          (col("n").cast("double") * col("aa") / col("nn")).as("ea"),
          (col("n").cast("double") * (col("nn") - col("aa")) / col("nn"))
            .as("eb")))
      val chi = cells
        .select(((col("a") - col("ea")) * (col("a") - col("ea")) /
          col("ea") +
          (col("n") - col("a") - col("eb")) *
            (col("n") - col("a") - col("eb")) / col("eb")).as("x"))
        .agg(sum("x").as("chi2"))
      cells.crossJoin(broadcast(chi))
        .select(col("event_type"), col("n"), col("a").as("n_above"),
          round(col("ea"), 4).as("expected_above"),
          round(col("chi2"), 4).as("chi2_stat"),
          (col("chi2") > 9.488).as("median_differs"))
        .orderBy("event_type")
    }),

    // ---- Brown–Forsythe homogeneity of variance: Levene's test with the
    // GROUP MEDIAN center (robust to the skew q_levene's mean center
    // inflates under). Per-type medians come off the per-type value
    // histograms (domain-bounded); |c − med| is an exact multiple of a
    // half cent, so z quantizes to half-cent units losslessly and the
    // one-way ANOVA F on z runs on exact integer group sums (z² through
    // decimal — half-cent squares pass BIGINT at sweep scale). F(4, N−5)
    // 5% critical ≈ 2.372 — fixed literal.
    "q_brown_forsythe" -> ((s, d) => {
      val ev = graft.CacheScope.cached(evCents(s, d))
      val med = ev.groupBy("event_type", "c").agg(count(lit(1)).as("f"))
        .groupBy("event_type")
        .agg(expr("percentile(c, 0.5, f)").as("med"))
      val z = ev.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"),
          round(lit(2.0) * abs(col("c") - col("med"))).cast(LongType)
            .as("z2"))
      val g = z.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("z2").as("sz"),
          sum((col("z2") * col("z2")).cast("decimal(38,0)")).as("szz"))
      val per = graft.CacheScope.cached(g.select(col("event_type"),
        col("n"), col("sz"), col("szz"),
        (col("sz").cast("double") * col("sz") / col("n")).as("sb")))
      val tot = per.agg(sum("n").as("nn"), count(lit(1)).as("k"),
        sum("sz").as("st"), sum("sb").as("sbt"), sum("szz").as("szzt"))
      val ssb = col("sbt") - col("st").cast("double") * col("st") /
        col("nn")
      val ssw = col("szzt").cast("double") - col("sbt")
      val f = ssb / (col("k") - 1L).cast("double") /
        (ssw / (col("nn") - col("k")).cast("double"))
      per.crossJoin(broadcast(tot.select(f.as("fstat"))))
        .select(col("event_type"), col("n"),
          round(col("sz").cast("double") / col("n") / 200.0, 4)
            .as("mean_absdev_dollars"),
          round(col("fstat"), 4).as("f_stat"),
          (col("fstat") > 2.372).as("spread_differs"))
        .orderBy("event_type")
    }),

    // ---- Jonckheere–Terpstra ordered-alternative test: is there a
    // monotone value trend across the alphabetically-ordered event types?
    // JT = Σ_{i<j} #(xᵢ < xⱼ) + ½#(xᵢ = xⱼ), computed WITHOUT pair
    // enumeration: per-group value histograms densify onto the shared
    // (group × value) grid (domain-bounded), per-group cumulative counts
    // run k-way-parallel windows, and the cross-group products reduce on
    // the value key — O(k²·domain), independent of N². Doubled JT stays
    // integral (ties contribute halves); the null mean/variance use the
    // no-tie closed forms (cubic count terms through decimal ↔ HUGEINT).
    "q_jonckheere" -> ((s, d) => {
      val ev = graft.CacheScope.cached(evCents(s, d)
        .select(col("event_type").as("g"), col("c")))
      val hist = graft.CacheScope.cached(
        ev.groupBy("g", "c").agg(count(lit(1)).as("cnt")))
      val grid = hist.select("c").distinct()
        .crossJoin(hist.select("g").distinct())
      val dense = grid.join(hist, Seq("g", "c"), "left")
        .na.fill(0L, Seq("cnt"))
      val w = Window.partitionBy("g").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = dense
        .withColumn("cumlt", coalesce(sum("cnt").over(w), lit(0L)))
      val jt2 = cum.as("i")
        .join(cum.as("j"),
          col("i.c") === col("j.c") && col("i.g") < col("j.g"))
        .agg(sum((lit(2L) * col("j.cnt").cast("decimal(38,0)") *
          col("i.cumlt") +
          col("j.cnt").cast("decimal(38,0)") * col("i.cnt"))
          .cast("decimal(38,0)")).as("jt2"))
      val sizes = ev.groupBy("g").agg(count(lit(1)).as("n"))
      val mo = sizes.agg(sum("n").as("nn"),
        sum((col("n").cast("decimal(38,0)") * col("n"))
          .cast("decimal(38,0)")).as("sn2"),
        sum((col("n").cast("decimal(38,0)") * col("n") *
          (lit(2L) * col("n") + 3L)).cast("decimal(38,0)")).as("sn3"))
      val e = (col("nn").cast("double") * col("nn") -
        col("sn2").cast("double")) / 4.0
      val v = (col("nn").cast("decimal(38,0)") * col("nn") *
        (lit(2L) * col("nn") + 3L)).cast("double") / 72.0 -
        col("sn3").cast("double") / 72.0
      val z = (col("jt2").cast("double") / 2.0 - e) / sqrt(v)
      jt2.crossJoin(broadcast(mo))
        .select(col("nn").as("n_events"),
          (col("jt2").cast("double") / 2.0).as("jt_stat"),
          round(e, 1).as("e_jt"), round(z, 4).as("z"),
          (abs(z) > 1.96).as("trend_present"))
    }),

    // ---- Page's L trend test: across the day blocks, do the
    // alphabetically-ordered event types keep a consistent mean-value
    // ordering? One corpus aggregate to the (day × type) frame,
    // restricted to COMPLETE blocks (days observing every type — Page's
    // statistic assumes balanced blocks); within each day the types rank
    // by exact mean cents (row_number, type tiebreak — day-bounded
    // windows); the treatment index j is a bounded self-join count (no
    // partition-less window); L = Σ j·Rⱼ with the closed-form null
    // mean/variance. |z| > 1.96 flags a stable ordering.
    "q_page_trend" -> ((s, d) => {
      val cellAll = graft.CacheScope.cached(Tables.events(s, d)
        .select(expr(s"ts_us div $DayUs").as("day"), col("event_type"),
          round(col("value") * 100).cast(LongType).as("cents"))
        .groupBy("day", "event_type")
        .agg(sum("cents").as("sc"), count(lit(1)).as("n")))
      val types = cellAll.select(col("event_type")).distinct()
      val kcnt = types.agg(count(lit(1)).as("kt"))
      val full = cellAll.groupBy("day").agg(count(lit(1)).as("nt"))
        .crossJoin(broadcast(kcnt))
        .filter(col("nt") === col("kt")).select("day")
      val daily = cellAll.join(broadcast(full), Seq("day"))
      val ranked = daily.withColumn("r",
        row_number().over(Window.partitionBy("day")
          .orderBy(col("sc").cast("double") / col("n"),
            col("event_type"))))
      val ord = types.as("a")
        .join(types.as("b"), col("b.event_type") <= col("a.event_type"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(count(lit(1)).as("j"))
      val rsum = ranked.groupBy("event_type")
        .agg(sum("r").as("rank_sum"), count(lit(1)).as("b"))
        .join(broadcast(ord), Seq("event_type"))
      val mo = rsum.agg(sum(col("j") * col("rank_sum")).as("l"),
        max("b").as("b"), count(lit(1)).as("k"))
      val bD = col("b").cast("double")
      val kD = col("k").cast("double")
      val e = bD * kD * (kD + 1.0) * (kD + 1.0) / 4.0
      val v = bD * kD * kD * (kD + 1.0) * (kD * kD - 1.0) / 144.0
      val z = (col("l").cast("double") - e) / sqrt(v)
      rsum.crossJoin(broadcast(mo.select(col("l"), col("b"),
          round(e, 1).as("e_l"), round(z, 4).as("z"),
          (abs(z) > 1.96).as("ordering_stable"))))
        .select(col("event_type"), col("j"), col("rank_sum"),
          col("l").as("l_stat"), col("e_l"), col("z"),
          col("ordering_stable"))
        .orderBy("event_type")
    }),

    // ---- two-way fixed-effects (within) estimator: cents of revenue per
    // marginal event, controlling for event-type AND day effects — the
    // panel regression a naive pooled OLS confounds (types with more
    // traffic also price differently; busy days shift both). ONE corpus
    // aggregate to the (type × day) cell frame; the double demeaning and
    // the within slope run on the ≤ k×40-row frame with broadcast means;
    // the pooled slope ships beside it so the output SHOWS the
    // confounding delta. All moments exact integers (cell revenue squares
    // through decimal).
    "q_fixed_effects" -> ((s, d) => {
      val cell = graft.CacheScope.cached(Tables.events(s, d)
        .select(expr(s"ts_us div $DayUs").as("day"), col("event_type"),
          round(col("value") * 100).cast(LongType).as("cents"))
        .groupBy("day", "event_type")
        .agg(count(lit(1)).as("x"), sum("cents").as("y")))
      val mi = cell.groupBy("event_type")
        .agg(sum("x").as("sxi"), sum("y").as("syi"),
          count(lit(1)).as("ci"))
      val mt = cell.groupBy("day")
        .agg(sum("x").as("sxt"), sum("y").as("syt"),
          count(lit(1)).as("ct"))
      val mg = cell.agg(sum("x").as("sx"), sum("y").as("sy"),
        count(lit(1)).as("cg"))
      val dm = cell
        .join(broadcast(mi), Seq("event_type"))
        .join(broadcast(mt), Seq("day"))
        .crossJoin(broadcast(mg))
        .select(
          (col("x").cast("double") -
            col("sxi").cast("double") / col("ci") -
            col("sxt").cast("double") / col("ct") +
            col("sx").cast("double") / col("cg")).as("xt"),
          (col("y").cast("double") -
            col("syi").cast("double") / col("ci") -
            col("syt").cast("double") / col("ct") +
            col("sy").cast("double") / col("cg")).as("yt"),
          col("x"), col("y"))
      val mo = dm.agg(count(lit(1)).as("n_cells"),
        sum(col("xt") * col("yt")).as("sxy"),
        sum(col("xt") * col("xt")).as("sxx"),
        sum(col("yt") * col("yt")).as("syy"),
        sum("x").as("px"), sum("y").as("py"),
        sum(col("x").cast("double") * col("x")).as("pxx"),
        sum(col("x").cast("double") * col("y")).as("pxy"))
      val beta = col("sxy") / col("sxx")
      val pooled = (col("n_cells").cast("double") * col("pxy") -
        col("px").cast("double") * col("py")) /
        (col("n_cells").cast("double") * col("pxx") -
          col("px").cast("double") * col("px"))
      mo.select(col("n_cells"),
        round(beta / 100.0, 6).as("within_dollars_per_event"),
        round(pooled / 100.0, 6).as("pooled_dollars_per_event"),
        round(beta * beta * col("sxx") / col("syy"), 6).as("r2_within"))
    }),

    // ---- Mahalanobis outlier scan over the (value, hour-of-day) plane:
    // the top-20 events by squared Mahalanobis distance under the exact
    // 2×2 corpus covariance, plus the corpus count beyond the χ²(2) 99%
    // contour (9.21). ONE moment aggregate (cents² through decimal)
    // broadcasts back onto the cached projection; the top-k is a
    // TakeOrdered on the raw double (identical trees both engines —
    // event_id tiebreak), never a global sort.
    "q_mahalanobis" -> ((s, d) => {
      val ev = graft.CacheScope.cached(Tables.events(s, d)
        .transform(Tables.fanoutReady)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("value") * 100).cast(LongType).as("c"),
          expr(s"(ts_us div 3600000000) % 24").as("h")))
      val mo = ev.agg(count(lit(1)).as("n"), sum("c").as("sc"),
        sum("h").as("sh"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("scc"),
        sum(col("h") * col("h")).as("shh"),
        sum((col("c").cast("decimal(38,0)") * col("h"))
          .cast("decimal(38,0)")).as("sch"))
      val nD = col("n").cast("double")
      val muC = col("sc").cast("double") / nD
      val muH = col("sh").cast("double") / nD
      val vc = col("scc").cast("double") / nD - muC * muC
      val vh = col("shh").cast("double") / nD - muH * muH
      val vch = col("sch").cast("double") / nD - muC * muH
      val dx = col("c").cast("double") - muC
      val dy = col("h").cast("double") - muH
      val d2 = (vh * dx * dx - lit(2.0) * vch * dx * dy + vc * dy * dy) /
        (vc * vh - vch * vch)
      val scored = graft.CacheScope.cached(ev.crossJoin(broadcast(mo))
        .select(col("event_id"), col("event_type"), col("value"),
          col("h"), d2.as("d2")))
      val flagged = scored.agg(
        sum(when(col("d2") > 9.21, 1L).otherwise(0L)).as("n_flagged"))
      scored.crossJoin(broadcast(flagged))
        .orderBy(col("d2").desc, col("event_id"))
        .limit(20)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 2).as("dollars"), col("h").as("hour"),
          round(col("d2"), 4).as("d2"), col("n_flagged"))
    }))

  val oracle: Map[String, String] = Map(
    "q_moods_median" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |med AS (SELECT quantile_cont(c, 0.5) AS med FROM ev),
        |bytype AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN CAST(c AS DOUBLE) > med.med
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a
        |  FROM ev CROSS JOIN med GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |          CAST(sum(a) AS BIGINT) AS aa FROM bytype),
        |cells AS (
        |  SELECT event_type, n, a,
        |    CAST(n AS DOUBLE) * aa / nn AS ea,
        |    CAST(n AS DOUBLE) * (nn - aa) / nn AS eb
        |  FROM bytype CROSS JOIN tot),
        |chi AS (
        |  SELECT sum((a - ea) * (a - ea) / ea +
        |    (n - a - eb) * (n - a - eb) / eb) AS chi2
        |  FROM cells)
        |SELECT event_type, n, a AS n_above,
        |  round(ea, 4) AS expected_above,
        |  round(chi2, 4) AS chi2_stat,
        |  chi2 > 9.488 AS median_differs
        |FROM cells CROSS JOIN chi
        |ORDER BY event_type""".stripMargin,
    "q_brown_forsythe" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |med AS (SELECT event_type, quantile_cont(c, 0.5) AS med
        |        FROM ev GROUP BY 1),
        |z AS (
        |  SELECT ev.event_type,
        |    CAST(round(2.0 * abs(ev.c - med.med)) AS BIGINT) AS z2
        |  FROM ev JOIN med ON med.event_type = ev.event_type),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(z2) AS BIGINT) AS sz,
        |    sum(CAST(z2 AS HUGEINT) * z2) AS szz
        |  FROM z GROUP BY 1),
        |per AS (
        |  SELECT event_type, n, sz, szz,
        |    CAST(sz AS DOUBLE) * sz / n AS sb
        |  FROM g),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(sz) AS BIGINT) AS st, sum(sb) AS sbt,
        |    sum(szz) AS szzt
        |  FROM per),
        |f AS (
        |  SELECT (sbt - CAST(st AS DOUBLE) * st / nn) /
        |    CAST(k - 1 AS DOUBLE) /
        |    ((CAST(szzt AS DOUBLE) - sbt) / CAST(nn - k AS DOUBLE))
        |    AS fstat
        |  FROM tot)
        |SELECT event_type, n,
        |  round(CAST(sz AS DOUBLE) / n / 200.0, 4)
        |    AS mean_absdev_dollars,
        |  round(fstat, 4) AS f_stat,
        |  fstat > 2.372 AS spread_differs
        |FROM per CROSS JOIN f
        |ORDER BY event_type""".stripMargin,
    "q_jonckheere" ->
      """WITH ev AS (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |hist AS (
        |  SELECT g, c, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT cc.c, gg.g
        |  FROM (SELECT DISTINCT c FROM hist) cc
        |  CROSS JOIN (SELECT DISTINCT g FROM hist) gg),
        |dense AS (
        |  SELECT grid.g, grid.c, coalesce(hist.cnt, 0) AS cnt
        |  FROM grid LEFT JOIN hist
        |    ON hist.g = grid.g AND hist.c = grid.c),
        |cum AS (
        |  SELECT g, c, cnt,
        |    coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumlt
        |  FROM dense),
        |jt AS (
        |  SELECT sum(2 * CAST(j.cnt AS HUGEINT) * i.cumlt +
        |    CAST(j.cnt AS HUGEINT) * i.cnt) AS jt2
        |  FROM cum i JOIN cum j ON j.c = i.c AND i.g < j.g),
        |sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1),
        |mo AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    sum(CAST(n AS HUGEINT) * n) AS sn2,
        |    sum(CAST(n AS HUGEINT) * n * (2 * n + 3)) AS sn3
        |  FROM sizes)
        |SELECT nn AS n_events,
        |  CAST(jt2 AS DOUBLE) / 2.0 AS jt_stat,
        |  round((CAST(nn AS DOUBLE) * nn - CAST(sn2 AS DOUBLE)) / 4.0, 1)
        |    AS e_jt,
        |  round((CAST(jt2 AS DOUBLE) / 2.0 -
        |    (CAST(nn AS DOUBLE) * nn - CAST(sn2 AS DOUBLE)) / 4.0) /
        |    sqrt(CAST(CAST(nn AS HUGEINT) * nn * (2 * nn + 3) AS DOUBLE)
        |      / 72.0 - CAST(sn3 AS DOUBLE) / 72.0), 4) AS z,
        |  abs((CAST(jt2 AS DOUBLE) / 2.0 -
        |    (CAST(nn AS DOUBLE) * nn - CAST(sn2 AS DOUBLE)) / 4.0) /
        |    sqrt(CAST(CAST(nn AS HUGEINT) * nn * (2 * nn + 3) AS DOUBLE)
        |      / 72.0 - CAST(sn3 AS DOUBLE) / 72.0)) > 1.96
        |    AS trend_present
        |FROM jt CROSS JOIN mo""".stripMargin,
    "q_page_trend" ->
      """WITH cellall AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sc,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |types0 AS (SELECT DISTINCT event_type FROM cellall),
        |full0 AS (
        |  SELECT day FROM cellall GROUP BY day
        |  HAVING count(*) = (SELECT count(*) FROM types0)),
        |daily AS (
        |  SELECT c.* FROM cellall c JOIN full0 f ON f.day = c.day),
        |ranked AS (
        |  SELECT day, event_type,
        |    CAST(row_number() OVER (PARTITION BY day
        |      ORDER BY CAST(sc AS DOUBLE) / n, event_type) AS BIGINT)
        |      AS r
        |  FROM daily),
        |ord AS (
        |  SELECT a.event_type, CAST(count(*) AS BIGINT) AS j
        |  FROM types0 a JOIN types0 b ON b.event_type <= a.event_type
        |  GROUP BY 1),
        |rsum AS (
        |  SELECT r.event_type, o.j,
        |    CAST(sum(r.r) AS BIGINT) AS rank_sum,
        |    CAST(count(*) AS BIGINT) AS b
        |  FROM ranked r JOIN ord o ON o.event_type = r.event_type
        |  GROUP BY 1, 2),
        |mo AS (
        |  SELECT CAST(sum(j * rank_sum) AS BIGINT) AS l,
        |    CAST(max(b) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS k
        |  FROM rsum),
        |st AS (
        |  SELECT l, b,
        |    round(CAST(b AS DOUBLE) * k * (k + 1.0) * (k + 1.0) / 4.0, 1)
        |      AS e_l,
        |    round((CAST(l AS DOUBLE) -
        |      CAST(b AS DOUBLE) * k * (k + 1.0) * (k + 1.0) / 4.0) /
        |      sqrt(CAST(b AS DOUBLE) * k * k * (k + 1.0) *
        |        (k * k - 1.0) / 144.0), 4) AS z,
        |    abs((CAST(l AS DOUBLE) -
        |      CAST(b AS DOUBLE) * k * (k + 1.0) * (k + 1.0) / 4.0) /
        |      sqrt(CAST(b AS DOUBLE) * k * k * (k + 1.0) *
        |        (k * k - 1.0) / 144.0)) > 1.96 AS ordering_stable
        |  FROM mo)
        |SELECT r.event_type, r.j, r.rank_sum, st.l AS l_stat, st.e_l,
        |  st.z, st.ordering_stable
        |FROM rsum r CROSS JOIN st
        |ORDER BY r.event_type""".stripMargin,
    "q_fixed_effects" ->
      """WITH cell AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |mi AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS sxi,
        |         CAST(sum(y) AS BIGINT) AS syi,
        |         CAST(count(*) AS BIGINT) AS ci
        |       FROM cell GROUP BY 1),
        |mt AS (SELECT day, CAST(sum(x) AS BIGINT) AS sxt,
        |         CAST(sum(y) AS BIGINT) AS syt,
        |         CAST(count(*) AS BIGINT) AS ct
        |       FROM cell GROUP BY 1),
        |mg AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(count(*) AS BIGINT) AS cg
        |       FROM cell),
        |dm AS (
        |  SELECT
        |    CAST(c.x AS DOUBLE) - CAST(mi.sxi AS DOUBLE) / mi.ci -
        |      CAST(mt.sxt AS DOUBLE) / mt.ct +
        |      CAST(mg.sx AS DOUBLE) / mg.cg AS xt,
        |    CAST(c.y AS DOUBLE) - CAST(mi.syi AS DOUBLE) / mi.ci -
        |      CAST(mt.syt AS DOUBLE) / mt.ct +
        |      CAST(mg.sy AS DOUBLE) / mg.cg AS yt,
        |    c.x, c.y
        |  FROM cell c
        |  JOIN mi ON mi.event_type = c.event_type
        |  JOIN mt ON mt.day = c.day
        |  CROSS JOIN mg),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |    sum(xt * yt) AS sxy, sum(xt * xt) AS sxx,
        |    sum(yt * yt) AS syy,
        |    CAST(sum(x) AS BIGINT) AS px, CAST(sum(y) AS BIGINT) AS py,
        |    sum(CAST(x AS DOUBLE) * x) AS pxx,
        |    sum(CAST(x AS DOUBLE) * y) AS pxy
        |  FROM dm)
        |SELECT n_cells,
        |  round(sxy / sxx / 100.0, 6) AS within_dollars_per_event,
        |  round((CAST(n_cells AS DOUBLE) * pxy -
        |    CAST(px AS DOUBLE) * py) /
        |    (CAST(n_cells AS DOUBLE) * pxx -
        |      CAST(px AS DOUBLE) * px) / 100.0, 6)
        |    AS pooled_dollars_per_event,
        |  round((sxy / sxx) * (sxy / sxx) * sxx / syy, 6) AS r2_within
        |FROM mo""".stripMargin,
    "q_mahalanobis" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value * 100) AS BIGINT) AS c,
        |    (epoch_us(ts) // 3600000000) % 24 AS h
        |  FROM events),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(h) AS BIGINT) AS sh,
        |    sum(CAST(c AS HUGEINT) * c) AS scc,
        |    CAST(sum(h * h) AS BIGINT) AS shh,
        |    sum(CAST(c AS HUGEINT) * h) AS sch
        |  FROM ev),
        |scored AS (
        |  SELECT event_id, event_type, value, h,
        |    ((CAST(shh AS DOUBLE) / n -
        |        (CAST(sh AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n)) *
        |      (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / n) *
        |      (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / n) -
        |      2.0 * (CAST(sch AS DOUBLE) / n -
        |        (CAST(sc AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n)) *
        |      (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / n) *
        |      (CAST(h AS DOUBLE) - CAST(sh AS DOUBLE) / n) +
        |      (CAST(scc AS DOUBLE) / n -
        |        (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)) *
        |      (CAST(h AS DOUBLE) - CAST(sh AS DOUBLE) / n) *
        |      (CAST(h AS DOUBLE) - CAST(sh AS DOUBLE) / n)) /
        |    ((CAST(scc AS DOUBLE) / n -
        |        (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)) *
        |      (CAST(shh AS DOUBLE) / n -
        |        (CAST(sh AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n)) -
        |      (CAST(sch AS DOUBLE) / n -
        |        (CAST(sc AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n)) *
        |      (CAST(sch AS DOUBLE) / n -
        |        (CAST(sc AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n)))
        |      AS d2
        |  FROM ev CROSS JOIN mo),
        |flagged AS (
        |  SELECT CAST(sum(CASE WHEN d2 > 9.21 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_flagged
        |  FROM scored)
        |SELECT event_id, event_type, round(value, 2) AS dollars,
        |  h AS hour, round(d2, 4) AS d2, n_flagged
        |FROM scored CROSS JOIN flagged
        |ORDER BY d2 DESC, event_id LIMIT 20""".stripMargin)
}
