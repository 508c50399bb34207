package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 statistics additions: rank association (Spearman, Kendall),
  * robust variance testing (Brown–Forsythe Levene), autoregressive
  * forecasting (Yule–Walker AR(2)), extreme-value fitting (Gumbel), and
  * ecological diversity (Simpson) — the remaining standard members of
  * the daily-series / per-group answer sheet the r6/r7 stats families
  * built (q_mk_trend, q_theil_sen, q_kruskal, q_holt, q_tail_index).
  *
  * Shared disciplines (the FP-parity rules that keep hashes green):
  *  - values lift to exact integer units first (cents, half-cent
  *    medians, doubled average ranks) so every accumulated sum is a
  *    BIGINT independent of partition order;
  *  - daily/rank self-joins run on AGGREGATED frames (≤ #days /
  *    #distinct-values rows), never on the raw event stream — the
  *    q_autocorr shape: the corpus is scanned once, the O(frame²) work
  *    happens after reduction;
  *  - one fixed-order double expression at the very end, rounded.
  *
  * Reference anchor: the reference runs opaque per-file stats jobs
  * (pkg/job docker entrypoints); these are the relational re-expressions
  * a Spark-native engine states declaratively.
  */
object Stats2 {
  type Q = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L

  /** Daily (count, cent-sum) series — the two-variable frame the rank
    * association tests compare. One events pass, map-side combined. */
  private def dailyXY(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(expr(s"ts_us div $DayUs").as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("day")
      .agg(count(lit(1)).as("x"), sum("v").as("y"))

  val queries: Map[String, Q] = Map(
    // ---- Spearman rank correlation between daily event count and
    // daily value volume — "do busy days move money?" answered on
    // ranks, immune to the heavy value tail that pulls Pearson around.
    // Average ranks ride as 2r = 2·(#less) + (#equal incl. self) + 1 —
    // an exact BIGINT computed by a self-join of the ≤#days daily frame
    // against itself (the q_autocorr aggregated-frame discipline; the
    // corpus contributes ONE pass) — then Spearman is Pearson's formula
    // on the doubled ranks, all five moments BIGINT, one double at the
    // end. Ties need no special-casing: the 2r encoding IS the
    // average-rank convention.
    "q_spearman" -> ((s, d) => {
      val daily = graft.CacheScope.cached(dailyXY(s, d))
      val a = daily.toDF("da", "xa", "ya")
      val b = daily.toDF("db", "xb", "yb")
      val ranks = a.crossJoin(b)
        .groupBy(col("da").as("day"))
        .agg(
          (sum(when(col("xb") < col("xa"), 2L).otherwise(0L)) +
            sum(when(col("xb") === col("xa"), 1L).otherwise(0L)) + 1L)
            .as("rx2"),
          (sum(when(col("yb") < col("ya"), 2L).otherwise(0L)) +
            sum(when(col("yb") === col("ya"), 1L).otherwise(0L)) + 1L)
            .as("ry2"))
      val m = ranks.agg(count(lit(1)).as("n"),
        sum("rx2").as("sa"), sum("ry2").as("sb"),
        sum(col("rx2") * col("rx2")).as("saa"),
        sum(col("ry2") * col("ry2")).as("sbb"),
        sum(col("rx2") * col("ry2")).as("sab"))
      val n = col("n").cast("double")
      val den = (n * col("saa") - col("sa").cast("double") * col("sa")) *
        (n * col("sbb") - col("sb").cast("double") * col("sb"))
      m.select(col("n").as("n_days"),
        round(when(col("n") <= 1 || den <= 0.0, lit(null))
          .otherwise((n * col("sab") -
            col("sa").cast("double") * col("sb")) / sqrt(den)), 6)
          .as("rho"))
    }),

    // ---- Kendall's τ-b on the same daily (count, volume) pairs — the
    // concordance twin of q_spearman (τ is more robust to a few wild
    // days; when the two disagree the association is driven by a small
    // pair subset). All pair classification happens in ONE self-join of
    // the aggregated daily frame with day<day ordering: concordant /
    // discordant / tied-x / tied-y counts are exact BIGINTs, and τ-b's
    // tie-corrected denominator is one final double expression.
    "q_kendall_tau" -> ((s, d) => {
      val daily = graft.CacheScope.cached(dailyXY(s, d))
      val a = daily.toDF("da", "xa", "ya")
      val b = daily.toDF("db", "xb", "yb")
      val sgn = (col("xa") - col("xb")) * (col("ya") - col("yb"))
      val m = a.crossJoin(b).filter(col("da") < col("db"))
        .agg(count(lit(1)).as("n0"),
          sum(when(col("xa") =!= col("xb") && col("ya") =!= col("yb") &&
            sgn > 0, 1L).otherwise(0L)).as("c"),
          sum(when(col("xa") =!= col("xb") && col("ya") =!= col("yb") &&
            sgn < 0, 1L).otherwise(0L)).as("dd"),
          sum(when(col("xa") === col("xb"), 1L).otherwise(0L)).as("tx"),
          sum(when(col("ya") === col("yb"), 1L).otherwise(0L)).as("ty"))
      val den = (col("n0") - col("tx")).cast("double") *
        (col("n0") - col("ty")).cast("double")
      m.select(col("n0").as("n_pairs"), col("c").as("concordant"),
        col("dd").as("discordant"),
        round(when(den <= 0.0, lit(null))
          .otherwise((col("c") - col("dd")).cast("double") / sqrt(den)), 6)
          .as("tau_b"))
    }),

    // ---- Brown–Forsythe Levene test: do event-value SPREADS differ by
    // event type? (q_anova asks about means; unequal variances are what
    // invalidate it, so this is the check that gates it.) The robust
    // variant centers each group at its MEDIAN — here the LOWER median
    // (first value whose cumulative frequency reaches ⌈n/2⌉), kept in
    // exact cents so the |v − med| deviations are exact BIGINTs and the
    // whole F assembly reuses q_anova's sufficient-sums machinery.
    // Scale shape: one corpus pass to (type, cent-value) frequencies;
    // the cumulative-median window is PARTITIONED by type over distinct
    // cent values; deviations aggregate map-side; the final k-row fold
    // follows the q_anova ≤k-term precedent.
    "q_levene" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // the (group, cent-value) frequency frame feeds BOTH the median
      // pass and the deviation fold — cached, so the corpus scan+agg
      // runs once (≤ groups × distinct-cents rows held)
      val freq = graft.CacheScope.cached(Tables.events(s, d)
        .select(col("event_type").as("g"),
          round(col("value") * 100).cast("long").as("v"))
        .groupBy("g", "v").agg(count(lit(1)).as("f")))
      val w = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
      val med = freq
        .withColumn("cum", sum("f").over(w))
        .withColumn("ng", sum("f").over(Window.partitionBy("g")))
        .filter(col("cum") * 2 >= col("ng"))
        .groupBy("g").agg(min("v").as("med"))
      val z = freq.join(med, "g")
        .select(col("g"), abs(col("v") - col("med")).as("z"), col("f"))
        .groupBy("g")
        .agg(sum("f").as("n"), sum(col("z") * col("f")).as("s1"),
          sum(col("z") * col("z") * col("f")).as("s2"))
      val ssb = col("ssbp") -
        col("t1").cast("double") * col("t1") / col("nd")
      z.agg(count(lit(1)).as("k"), sum("n").as("nd"),
          sum("s1").as("t1"), sum("s2").as("t2"),
          sum(col("s1").cast("double") * col("s1") / col("n")).as("ssbp"))
        .select(col("k").as("n_groups"), col("nd").as("n"),
          round(when(col("k") <= 1 || col("nd") <= col("k") ||
              (col("t2").cast("double") - col("ssbp")) <= 0.0, lit(null))
            .otherwise((ssb / (col("k") - 1)) /
              ((col("t2").cast("double") - col("ssbp")) /
                (col("nd") - col("k")))), 4).as("f_stat"))
    }),

    // ---- Yule–Walker AR(2) fit + 3-step forecast on the daily count
    // series — the autoregressive member of the forecasting answer
    // sheet (q_holt smooths, q_holt_winters adds season, this one
    // MODELS the dependence and exposes φ₁/φ₂, the "is today's volume
    // momentum or mean-reversion?" readout). Lag products come from
    // day+k equi-joins of the aggregated daily frame (q_autocorr's
    // shape); every centered covariance is an n²-scaled BIGINT
    // (n²Σxy − nS(Σa+Σb) + n_k·S²), so the Yule–Walker solve and the
    // recursive 3-step forecast are one fixed-order double chain seeded
    // from exact integers.
    "q_ar2_forecast" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x")))
      val base = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"), max("day").as("dmax"))
      def lagSums(k: Int): DataFrame = daily.toDF("day", "xa")
        .join(daily.toDF("db", "xb"), col("db") === col("day") + k)
        .agg(count(lit(1)).as(s"n$k"), sum(col("xa") * col("xb")).as(s"p$k"),
          sum("xa").as(s"a$k"), sum("xb").as(s"b$k"))
      val last2 = daily.toDF("day", "xl")
        .join(base.select(col("dmax")), col("day") >= col("dmax") - 1)
        .groupBy(lit(1).as("one"))
        .agg(max(when(col("day") === col("dmax"), col("xl"))).as("xn"),
          max(when(col("day") === col("dmax") - 1, col("xl"))).as("xn1"))
      val m = base.crossJoin(broadcast(lagSums(1)))
        .crossJoin(broadcast(lagSums(2)))
        .crossJoin(broadcast(last2.drop("one")))
      val n = col("n").cast("double")
      val s0 = col("sx").cast("double")
      // n-scaled c0; n²-scaled c1, c2 (exact integer identities)
      val c0 = n * col("sxx") - s0 * s0
      def ck(k: Int) = n * n * col(s"p$k") -
        n * s0 * (col(s"a$k") + col(s"b$k")) + col(s"n$k") * s0 * s0
      val r1 = ck(1) / (n * c0)
      val r2 = ck(2) / (n * c0)
      val det = lit(1.0) - r1 * r1
      val phi1 = r1 * (lit(1.0) - r2) / det
      val phi2 = (r2 - r1 * r1) / det
      val mu = s0 / n
      val c = mu * (lit(1.0) - phi1 - phi2)
      val f1 = c + phi1 * col("xn") + phi2 * col("xn1")
      val f2 = c + phi1 * f1 + phi2 * col("xn")
      val f3 = c + phi1 * f2 + phi2 * f1
      // a flat series (c0 = 0) or unit-root fit (1 − r1² = 0) has no
      // AR(2) solution: keep the row, null the estimates (both engines)
      val ok = c0 > 0 && det =!= 0.0
      def g(e: org.apache.spark.sql.Column, nd: Int) =
        round(when(ok, e), nd)
      m.select(col("n").as("n_days"),
          g(r1, 6).as("r1"), g(r2, 6).as("r2"),
          g(phi1, 6).as("phi1"), g(phi2, 6).as("phi2"),
          g(f1, 4).as("f1"), g(f2, 4).as("f2"), g(f3, 4).as("f3"))
        .filter(col("n_days") >= 3)
    }),

    // ---- Gumbel extreme-value fit on daily MAX event values — the
    // block-maxima member of the tail answer sheet (q_tail_index fits
    // the survival tail; this fits the distribution of per-day records,
    // the "how big is next month's biggest transaction" question).
    // Method-of-moments: β = s·√6/π, μ = m − γβ over the ≤#days maxima
    // frame, both moments exact BIGINTs in cents; reports the fitted
    // parameters (in value units) and the Gumbel exceedance probability
    // of the observed global max — all one fixed-order double chain.
    "q_gumbel_fit" -> ((s, d) => {
      val dm = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(max(round(col("value") * 100).cast("long")).as("mx"))
      val m = dm.agg(count(lit(1)).as("n"), sum("mx").as("s1"),
        sum(col("mx") * col("mx")).as("s2"), max("mx").as("gmax"))
      val n = col("n").cast("double")
      val s1 = col("s1").cast("double")
      val varS = (n * col("s2") - s1 * s1) / (n * (n - lit(1.0)))
      val beta = sqrt(varS * lit(6.0)) / lit(math.Pi)
      val muG = s1 / n - lit(0.5772156649015329) * beta
      val pEx = lit(1.0) -
        exp(-exp(-(col("gmax").cast("double") - muG) / beta))
      m.select(col("n").as("n_days"),
        round(when(col("n") <= 1 || varS <= 0.0, lit(null))
          .otherwise(muG / 100.0), 4).as("gumbel_mu"),
        round(when(col("n") <= 1 || varS <= 0.0, lit(null))
          .otherwise(beta / 100.0), 4).as("gumbel_beta"),
        round(when(col("n") <= 1 || varS <= 0.0, lit(null))
          .otherwise(pEx), 6).as("p_exceed_max"))
    }),

    // ---- Friedman test (uncorrected, average ranks): do the event
    // TYPES keep the same volume ordering day after day? The
    // repeated-measures member of the answer sheet — q_kruskal compares
    // independent groups, this one blocks by day, so a global traffic
    // surge can't masquerade as a between-type difference. The daily
    // k-cell grid (k = #types, absent cells = 0) ranks WITHIN each day
    // via a day-keyed self-join of the k-row cells (k² per day, k
    // bounded by the event vocabulary — no window at all); doubled
    // average ranks keep every rank sum an exact BIGINT, and
    // χ²_F = 3·ΣR₂ⱼ²/(n·k·(k+1)) − 3n(k+1) folds the k per-type sums
    // in one final double expression.
    "q_friedman" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"),
          col("event_type").as("t"))
        .agg(count(lit(1)).as("x")))
      val days = c.select("day").distinct()
      val types = c.select("t").distinct()
      val grid = graft.CacheScope.cached(days.crossJoin(broadcast(types))
        .join(c, Seq("day", "t"), "left")
        .select(col("day"), col("t"), coalesce(col("x"), lit(0L)).as("x")))
      // the grid is days × types — calendar × vocabulary bounded, never
      // corpus-sized — so the rank self-join broadcasts one side
      val r2 = grid.toDF("day", "ta", "xa")
        .join(broadcast(grid.toDF("day", "tb", "xb")), "day")
        .groupBy(col("day"), col("ta").as("t"))
        .agg((sum(when(col("xb") < col("xa"), 2L).otherwise(0L)) +
          sum(when(col("xb") === col("xa"), 1L).otherwise(0L)) + 1L)
          .as("r2"))
      val perType = r2.groupBy("t")
        .agg(count(lit(1)).as("n"), sum("r2").as("rj2"))
      val m = perType.agg(count(lit(1)).as("k"), max("n").as("n"),
        sum(col("rj2") * col("rj2")).as("sr2"))
      val n = col("n").cast("double")
      val k = col("k").cast("double")
      m.select(col("n").as("n_days"), col("k").as("k_treatments"),
        round(when(col("k") <= 1 || col("n") === 0, lit(null))
          .otherwise(lit(3.0) * col("sr2") / (n * k * (k + 1)) -
            lit(3.0) * n * (k + 1)), 4).as("chi2_f"))
    }),

    // ---- Hurst exponent by rescaled range (single full-window R/S) on
    // the daily count series — the long-memory diagnostic next to
    // q_autocorr's short-lag view: H > 0.5 means streaks (persistent
    // volume), H < 0.5 mean reversion. Prefix sums of the ≤#days daily
    // frame come from an aggregated self-join (no window); the centered
    // cumulative deviates are n-scaled BIGINTs (nZ_t = n·P_t − t·S), so
    // range and variance enter one final double expression:
    // R/S = (max nZ − min nZ)/√(nΣx² − S²), H = ln(R/S)/ln(n).
    "q_hurst" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x")))
      val pre = daily.toDF("da", "xa")
        .join(daily.toDF("db", "xb"), col("db") <= col("da"))
        .groupBy(col("da"))
        .agg(count(lit(1)).as("idx"), sum("xb").as("p"))
      val base = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val z = pre.crossJoin(broadcast(base))
        .select((col("n") * col("p") - col("idx") * col("sx")).as("nz"))
        .agg(max("nz").as("mxz"), min("nz").as("mnz"))
      val m = base.crossJoin(broadcast(z))
      val n = col("n").cast("double")
      val disc = n * col("sxx") - col("sx").cast("double") * col("sx")
      val rs = (col("mxz") - col("mnz")).cast("double") / sqrt(disc)
      m.select(col("n").as("n_days"),
        round(when(col("n") <= 1 || disc <= 0.0 ||
          col("mxz") <= col("mnz"), lit(null)).otherwise(rs), 4).as("rs"),
        round(when(col("n") <= 1 || disc <= 0.0 ||
            col("mxz") <= col("mnz"), lit(null))
          .otherwise(log(rs) / log(n)), 6).as("hurst"))
    }),

    // ---- Ljung–Box portmanteau test to lag 3 on the daily counts —
    // "is there ANY autocorrelation left?", the residual-whiteness
    // check that closes the q_autocorr/q_pacf/q_ar2_forecast set. The
    // ρ_k reuse the n²-scaled integer autocovariance identity
    // (q_pacf's), each lag from one day+k equi-join of the aggregated
    // daily frame; Q = n(n+2)Σ ρ_k²/(n−k) is one double expression.
    "q_ljung_box" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x")))
      val base = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      def lagSums(k: Int): DataFrame = daily.toDF("day", "xa")
        .join(daily.toDF("db", "xb"), col("db") === col("day") + k)
        .agg(count(lit(1)).as(s"n$k"), sum(col("xa") * col("xb")).as(s"p$k"),
          sum("xa").as(s"a$k"), sum("xb").as(s"b$k"))
      val m = base.crossJoin(broadcast(lagSums(1)))
        .crossJoin(broadcast(lagSums(2)))
        .crossJoin(broadcast(lagSums(3)))
      val n = col("n").cast("double")
      val s0 = col("sx").cast("double")
      val c0 = n * col("sxx") - s0 * s0
      def rk(k: Int) = (n * n * col(s"p$k") -
        n * s0 * (col(s"a$k") + col(s"b$k")) + col(s"n$k") * s0 * s0) /
        (n * c0)
      val q = n * (n + 2) * (rk(1) * rk(1) / (n - 1) +
        rk(2) * rk(2) / (n - 2) + rk(3) * rk(3) / (n - 3))
      val ok = col("n") > 3 && c0 > 0
      m.select(col("n").as("n_days"),
        round(when(ok, rk(1)), 6).as("r1"),
        round(when(ok, rk(2)), 6).as("r2"),
        round(when(ok, rk(3)), 6).as("r3"),
        round(when(ok, q), 4).as("q_lb"))
    }),

    // ---- Granger causality (lag-1): does daily event COUNT carry
    // predictive information about next-day value VOLUME beyond what
    // volume's own history explains? Restricted y_t~y_{t-1} vs
    // unrestricted y_t~y_{t-1}+x_{t-1}, F on the RSS drop. All ten
    // pairwise moments come from ONE day+1 equi-join of the aggregated
    // daily frame as exact BIGINTs; the centered second moments use the
    // m-scaled identity M_ab = m·Σab − Σa·Σb (integer), in which the
    // m factors cancel inside F — so the closed-form 2-regressor OLS
    // solve is one fixed-order double expression over integer inputs.
    "q_granger" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .select(expr(s"ts_us div $DayUs").as("day"),
          round(col("value") * 100).cast("long").as("v"))
        .groupBy("day")
        .agg(count(lit(1)).as("x"), sum("v").as("y")))
      val m = daily.toDF("da", "xl", "yl")
        .join(daily.toDF("db", "xn", "y"), col("db") === col("da") + 1)
        .agg(count(lit(1)).as("m"),
          sum("y").as("sy"), sum("yl").as("syl"), sum("xl").as("sxl"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("yl") * col("yl")).as("sll"),
          sum(col("xl") * col("xl")).as("sxx"),
          sum(col("y") * col("yl")).as("pyl"),
          sum(col("y") * col("xl")).as("pyx"),
          sum(col("yl") * col("xl")).as("plx"))
      val mm = col("m").cast("double")
      def cM(sab: org.apache.spark.sql.Column,
             sa: org.apache.spark.sql.Column,
             sb: org.apache.spark.sql.Column) =
        mm * sab - sa.cast("double") * sb.cast("double")
      val myy = cM(col("syy"), col("sy"), col("sy"))
      val mll = cM(col("sll"), col("syl"), col("syl"))
      val mxx = cM(col("sxx"), col("sxl"), col("sxl"))
      val myl = cM(col("pyl"), col("sy"), col("syl"))
      val myx = cM(col("pyx"), col("sy"), col("sxl"))
      val mlx = cM(col("plx"), col("syl"), col("sxl"))
      val det = mll * mxx - mlx * mlx
      val rss0 = myy - myl * myl / mll
      val rss1 = myy - (myl * (myl * mxx - myx * mlx) +
        myx * (myx * mll - myl * mlx)) / det
      val ok = col("m") > 3 && mll > 0.0 && det > 0.0 && rss1 > 0.0
      m.select(col("m").as("n_pairs"),
        round(when(ok, (rss0 - rss1) / (rss1 / (mm - 3))), 4)
          .as("f_granger"),
        round(when(ok, (myx * mll - myl * mlx) / det / 100.0), 6)
          .as("beta_count"))
    }),

    // ---- Cochran–Mantel–Haenszel test, stratified by DAY: is event
    // type (view vs purchase) associated with a high-value outcome
    // (≥ $50) AFTER conditioning out the day? — the confounder-robust
    // 2×2 the pooled χ² (q_ab_test's cousin) gets wrong whenever daily
    // traffic mix shifts. Per-stratum cell counts are one events pass;
    // each stratum's expectation and variance are rationals of BIGINT
    // margins, quantized to 1e-6 units BEFORE the cross-day sum (the
    // q_adamic_adar rule) so the statistic is partition-order exact.
    "q_cmh" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(expr(s"ts_us div $DayUs").as("day"),
          (col("event_type") === "view").as("e"),
          (round(col("value") * 100).cast("long") >= 5000L).as("hi"))
        .groupBy("day")
        .agg(sum(when(col("e") && col("hi"), 1L).otherwise(0L)).as("a"),
          sum(when(col("e") && !col("hi"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("e") && col("hi"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("e") && !col("hi"), 1L).otherwise(0L)).as("dd"))
        .filter(col("a") + col("b") + col("c") + col("dd") >= 2)
      val n = (col("a") + col("b") + col("c") + col("dd")).cast("double")
      val r1 = (col("a") + col("b")).cast("double")
      val r2 = (col("c") + col("dd")).cast("double")
      val c1 = (col("a") + col("c")).cast("double")
      val c2 = (col("b") + col("dd")).cast("double")
      val terms = cells.select(
        (col("a") * 1000000L).as("a6"),
        round(r1 * c1 / n * 1e6).cast("long").as("e6"),
        round(r1 * r2 * c1 * c2 / (n * n * (n - 1)) * 1e6).cast("long")
          .as("v6"))
      val agg = terms.agg(count(lit(1)).as("n_strata"),
        sum("a6").as("sa"), sum("e6").as("se"), sum("v6").as("sv"))
      val dev = (col("sa") - col("se")).cast("double") / 1e6
      agg.select(col("n_strata"),
        round(when(col("sv") <= 0, lit(null))
          .otherwise(dev * dev / (col("sv").cast("double") / 1e6)), 4)
          .as("chi2_cmh"))
    }),

    // ---- Mantel–Haenszel common odds ratio — q_cmh's EFFECT-SIZE
    // companion (the test says whether exposure and outcome associate
    // net of day; this says by HOW MUCH, as one pooled odds ratio).
    // Same day-stratified 2×2 cells; OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ),
    // each stratum's two rationals quantized to 1e-6 units before the
    // cross-day sums (the q_cmh discipline) so both totals are exact
    // BIGINTs and the ratio divides once.
    "q_mh_odds" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(expr(s"ts_us div $DayUs").as("day"),
          (col("event_type") === "view").as("e"),
          (round(col("value") * 100).cast("long") >= 5000L).as("hi"))
        .groupBy("day")
        .agg(sum(when(col("e") && col("hi"), 1L).otherwise(0L)).as("a"),
          sum(when(col("e") && !col("hi"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("e") && col("hi"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("e") && !col("hi"), 1L).otherwise(0L)).as("dd"))
        .filter(col("a") + col("b") + col("c") + col("dd") >= 2)
      val n = (col("a") + col("b") + col("c") + col("dd")).cast("double")
      val terms = cells.select(
        round(col("a").cast("double") * col("dd") / n * 1e6).cast("long")
          .as("num6"),
        round(col("b").cast("double") * col("c") / n * 1e6).cast("long")
          .as("den6"))
      terms.agg(count(lit(1)).as("n_strata"),
          sum("num6").as("sn"), sum("den6").as("sd"))
        .select(col("n_strata"),
          round(when(col("sd") <= 0, lit(null))
            .otherwise(col("sn").cast("double") / col("sd")), 4)
            .as("or_mh"))
    }),

    // ---- Chapman capture–recapture estimate of the TOTAL user
    // population from two overlapping "captures" (users seen viewing
    // vs users seen purchasing): N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — the
    // classic "how many users exist beyond the ones any single event
    // type sees" estimator a funnel only hints at. Three distinct
    // counts (two captures + the overlap via a user-keyed semi-join)
    // feed one closed-form expression; everything before the final
    // division is BIGINT.
    "q_chapman" -> ((s, d) => {
      val ev = graft.CacheScope.cached(Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_type")).distinct())
      val v = ev.filter(col("event_type") === "view").select("user_id")
      val p = ev.filter(col("event_type") === "purchase").select("user_id")
      val n1 = v.agg(count(lit(1)).as("n1"))
      val n2 = p.agg(count(lit(1)).as("n2"))
      val m = v.join(p, Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("m"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
        .select(col("n1").as("n_viewers"), col("n2").as("n_purchasers"),
          col("m").as("n_both"),
          round((col("n1") + 1).cast("double") * (col("n2") + 1) /
            (col("m") + 1) - 1.0, 2).as("n_hat"))
    }),

    // ---- Benjamini–Hochberg FDR over the per-event-type "is this
    // type's mean value off the global mean?" z-tests — the
    // multiple-testing closer for the answer sheet: with k types even
    // pure noise hands you ~k·α raw rejections, and BH is the standard
    // step-up correction a metrics pipeline runs before alerting.
    // z from exact cent moments; Φ via the Abramowitz–Stegun 7.1.26
    // polynomial with IDENTICAL literals in both engines (one
    // fixed-order double chain — no erf builtin needed); ranks by the
    // doubled-rank self-join over the k-row frame (k = type vocabulary,
    // bounded); the step-up cutoff is a broadcast 1-row max.
    "q_bh_fdr" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type").as("t"),
          round(col("value") * 100).cast("long").as("v"))
      val g = graft.CacheScope.cached({
        // per feeds BOTH the global-moment fold and the per-type z —
        // cached so the corpus aggregates once (k rows held)
        val per = graft.CacheScope.cached(
          ev.groupBy("t").agg(count(lit(1)).as("n"),
            sum("v").as("s1"), sum(col("v") * col("v")).as("s2")))
        val tot = per.agg(sum("n").as("nn"), sum("s1").as("t1"),
          sum("s2").as("t2"))
        val nn = col("nn").cast("double")
        val mu = col("t1").cast("double") / nn
        val sg = sqrt(col("t2").cast("double") / nn - mu * mu)
        val z = (col("s1").cast("double") / col("n") - mu) /
          (sg / sqrt(col("n").cast("double")))
        // Φ(|z|) via A&S 7.1.26: erf(x) ≈ 1 − poly(1/(1+0.3275911·x))·e^(−x²)
        val x = abs(z) / lit(math.sqrt(2.0))
        val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
        val poly = ((((lit(1.061405429) * tt - lit(1.453152027)) * tt +
          lit(1.421413741)) * tt - lit(0.284496736)) * tt +
          lit(0.254829592)) * tt
        val erfX = lit(1.0) - poly * exp(-x * x)
        val p = lit(1.0) - erfX // = 2·(1−Φ(|z|))
        per.crossJoin(broadcast(tot))
          .select(col("t"), col("n"), round(z, 6).as("z"),
            round(p, 9).as("p"))
      })
      val ranked = g.toDF("t", "n", "z", "p")
        .join(broadcast(g.select(col("p").as("pb"), col("t").as("tb"))),
          col("pb") < col("p") ||
            (col("pb") === col("p") && col("tb") <= col("t")), "left")
        .groupBy("t", "n", "z", "p")
        .agg(count(col("tb")).as("rank"))
      val kTot = g.agg(count(lit(1)).as("k"))
      val withK = ranked.crossJoin(broadcast(kTot))
      val rmax = withK
        .filter(col("p") * col("k") <= lit(0.1) * col("rank"))
        .agg(coalesce(max("rank"), lit(0L)).as("rmax"))
      withK.crossJoin(broadcast(rmax))
        .select(col("t").as("event_type"), col("n"), col("z"), col("p"),
          col("rank"),
          (col("rank") <= col("rmax")).as("significant"))
        .orderBy("rank", "event_type")
    }),

    // ---- Grubbs outlier statistic on the daily counts — "is the most
    // extreme day a statistical outlier?", the single-point companion
    // to the drift monitors (q_cusum/q_page_hinkley alarm on RUNS;
    // Grubbs scores the one wildest day). G = max|x−x̄|/s from exact
    // BIGINT moments; the argmax day resolves by (deviation, day)
    // ordering in n-scaled integers so tie-breaks are engine-exact.
    "q_grubbs" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x")))
      val base = daily.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      // n-scaled absolute deviation |n·x − S| is an exact BIGINT
      val dev = daily.crossJoin(broadcast(base))
        .select(col("day"), col("n"), col("sx"), col("sxx"),
          abs(col("n") * col("x") - col("sx")).as("ndev"))
        .orderBy(col("ndev").desc, col("day").asc).limit(1)
      val n = col("n").cast("double")
      val sdn = sqrt((n * col("sxx") - col("sx").cast("double") * col("sx"))
        / (n - lit(1.0)))
      dev.select(col("n").as("n_days"), col("day").as("extreme_day"),
        round(when(col("n") <= 1 || sdn <= 0.0, lit(null))
          .otherwise(col("ndev").cast("double") / n /
            (sdn / sqrt(n))), 4).as("grubbs_g"))
    }),

    // ---- Pettitt changepoint test on the daily counts — the
    // NONPARAMETRIC "when did the level shift?" answer next to the
    // parametric q_changepoint: K = max|U_t| with
    // U_t = 2·Σ_{i≤t}R_i − t(n+1) over average ranks, distribution-free
    // and immune to the value tail. Doubled average ranks (the
    // q_spearman 2r discipline) and their prefix sums both come from
    // aggregated-frame self-joins (no window anywhere), so
    // 2·U_t = 2·Σ2R − 2t(n+1) stays an exact BIGINT and the argmax
    // split resolves by (|2U|, day) integer ordering.
    "q_pettitt" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x")))
      val a = daily.toDF("da", "xa")
      val b = daily.toDF("db", "xb")
      // doubled average rank of each day's count among all days
      val r2 = a.crossJoin(b)
        .groupBy(col("da").as("day"))
        .agg((sum(when(col("xb") < col("xa"), 2L).otherwise(0L)) +
          sum(when(col("xb") === col("xa"), 1L).otherwise(0L)) + 1L)
          .as("r2"))
      val base = daily.agg(count(lit(1)).as("n"))
      // prefix sums of 2R by day (aggregated self-join, no window)
      val pre = r2.toDF("da", "r2a")
        .join(r2.toDF("db", "r2b"), col("db") <= col("da"))
        .groupBy(col("da").as("day"))
        .agg(count(lit(1)).as("t"), sum("r2b").as("p2"))
      // p2 = 2ΣR is integer even under half-integer average ranks, so
      // U_t = 2Σ_{i≤t}R_i − t(n+1) = p2 − t(n+1) is an exact BIGINT
      val u = pre.crossJoin(broadcast(base))
        .filter(col("t") < col("n")) // U_n = 0 by construction: not a split
        .select(col("day"), col("n"),
          (col("p2") - col("t") * (col("n") + 1)).as("u"))
      val k = u.orderBy(abs(col("u")).desc, col("day").asc).limit(1)
      val kd = abs(col("u")).cast("double")
      k.select(col("n").as("n_days"), col("day").as("change_day"),
        abs(col("u")).as("k_stat"),
        // Pettitt's approximate p: 2·exp(−6K²/(n³+n²))
        round(when(col("n") <= 1, lit(null))
          .otherwise(least(lit(1.0), lit(2.0) * exp(
            lit(-6.0) * kd * kd /
              (pow(col("n").cast("double"), 3) +
                pow(col("n").cast("double"), 2))))), 6).as("p_approx"))
    }),

    // ---- Simpson diversity per source — the concentration-side
    // companion to q_entropy's Shannon diversity (Simpson weights
    // dominant words quadratically, so boilerplate-heavy sources score
    // LOW even when their long tail keeps entropy respectable).
    // λ = Σ n_w(n_w−1) / (N(N−1)) is exact in BIGINTs end to end; the
    // diversity 1−λ and inverse-Simpson 1/λ round once. One corpus
    // tokenize pass → per-(source, word) counts → per-source fold.
    "q_simpson" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      wc.groupBy("source")
        .agg(sum("c").as("nt"), count(lit(1)).as("n_vocab"),
          sum(col("c") * (col("c") - 1)).as("ss"))
        .select(col("source"), col("nt").as("n_tokens"), col("n_vocab"),
          round(when(col("nt") <= 1, lit(null))
            .otherwise(lit(1.0) - col("ss").cast("double") /
              (col("nt").cast("double") * (col("nt") - 1))), 6)
            .as("simpson_d"),
          round(when(col("ss") === 0, lit(null))
            .otherwise(col("nt").cast("double") * (col("nt") - 1) /
              col("ss").cast("double")), 4).as("inv_simpson"))
        .orderBy("source")
    }))

  val oracle: Map[String, String] = Map(
    "q_spearman" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |ranks AS (
        |  SELECT a.day,
        |    CAST(sum(CASE WHEN b.x < a.x THEN 2 ELSE 0 END) +
        |      sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS BIGINT)
        |      AS rx2,
        |    CAST(sum(CASE WHEN b.y < a.y THEN 2 ELSE 0 END) +
        |      sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END) + 1 AS BIGINT)
        |      AS ry2
        |  FROM daily a CROSS JOIN daily b GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(rx2) AS BIGINT) AS sa, CAST(sum(ry2) AS BIGINT) AS sb,
        |    CAST(sum(rx2 * rx2) AS BIGINT) AS saa,
        |    CAST(sum(ry2 * ry2) AS BIGINT) AS sbb,
        |    CAST(sum(rx2 * ry2) AS BIGINT) AS sab
        |  FROM ranks)
        |SELECT n AS n_days,
        |  round(CASE WHEN n <= 1 OR
        |      (CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa) *
        |      (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb) <= 0.0
        |    THEN NULL
        |    ELSE (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb) /
        |      sqrt((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa) *
        |        (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb))
        |    END, 6) AS rho
        |FROM m""".stripMargin,
    "q_kendall_tau" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN a.x <> b.x AND a.y <> b.y AND
        |      (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(sum(CASE WHEN a.x <> b.x AND a.y <> b.y AND
        |      (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS dd,
        |    CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tx,
        |    CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ty
        |  FROM daily a JOIN daily b ON a.day < b.day)
        |SELECT n0 AS n_pairs, c AS concordant, dd AS discordant,
        |  round(CASE WHEN CAST(n0 - tx AS DOUBLE) *
        |      CAST(n0 - ty AS DOUBLE) <= 0.0 THEN NULL
        |    ELSE CAST(c - dd AS DOUBLE) /
        |      sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))
        |    END, 6) AS tau_b
        |FROM m""".stripMargin,
    "q_levene" ->
      """WITH freq AS (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS f
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, f,
        |    CAST(sum(f) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(f) OVER (PARTITION BY g) AS BIGINT) AS ng
        |  FROM freq),
        |med AS (
        |  SELECT g, CAST(min(v) AS BIGINT) AS med FROM cum
        |  WHERE cum * 2 >= ng GROUP BY 1),
        |z AS (
        |  SELECT freq.g, CAST(sum(f) AS BIGINT) AS n,
        |    CAST(sum(abs(v - med) * f) AS BIGINT) AS s1,
        |    CAST(sum(abs(v - med) * abs(v - med) * f) AS BIGINT) AS s2
        |  FROM freq JOIN med ON freq.g = med.g GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT)
        |      AS nd,
        |    CAST(sum(s1) AS BIGINT) AS t1, CAST(sum(s2) AS BIGINT) AS t2,
        |    sum(CAST(s1 AS DOUBLE) * s1 / n) AS ssbp
        |  FROM z)
        |SELECT k AS n_groups, nd AS n,
        |  round(CASE WHEN k <= 1 OR nd <= k OR
        |      (CAST(t2 AS DOUBLE) - ssbp) <= 0.0 THEN NULL
        |    ELSE ((ssbp - CAST(t1 AS DOUBLE) * t1 / nd) / (k - 1)) /
        |      ((CAST(t2 AS DOUBLE) - ssbp) / (nd - k))
        |    END, 4) AS f_stat
        |FROM tot""".stripMargin,
    "q_ar2_forecast" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT)
        |      AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(max(day) AS BIGINT) AS dmax
        |  FROM daily),
        |l1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(a.x * b.x) AS BIGINT) AS p1,
        |    CAST(sum(a.x) AS BIGINT) AS a1, CAST(sum(b.x) AS BIGINT) AS b1
        |  FROM daily a JOIN daily b ON b.day = a.day + 1),
        |l2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n2,
        |    CAST(sum(a.x * b.x) AS BIGINT) AS p2,
        |    CAST(sum(a.x) AS BIGINT) AS a2, CAST(sum(b.x) AS BIGINT) AS b2
        |  FROM daily a JOIN daily b ON b.day = a.day + 2),
        |lst AS (
        |  SELECT
        |    max(CASE WHEN day = dmax THEN x END) AS xn,
        |    max(CASE WHEN day = dmax - 1 THEN x END) AS xn1
        |  FROM daily CROSS JOIN base WHERE day >= dmax - 1),
        |f AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS s0,
        |    sxx, n1, p1, a1, b1, n2, p2, a2, b2, xn, xn1
        |  FROM base CROSS JOIN l1 CROSS JOIN l2 CROSS JOIN lst),
        |g AS (
        |  SELECT n, nd, s0, xn, xn1,
        |    nd * sxx - s0 * s0 AS c0,
        |    nd * nd * p1 - nd * s0 * (a1 + b1) + n1 * s0 * s0 AS c1s,
        |    nd * nd * p2 - nd * s0 * (a2 + b2) + n2 * s0 * s0 AS c2s
        |  FROM f),
        |h AS (
        |  SELECT n, nd, s0, xn, xn1, c0,
        |    c1s / (nd * c0) AS r1, c2s / (nd * c0) AS r2
        |  FROM g),
        |i AS (
        |  SELECT n, nd, s0, xn, xn1, c0, r1, r2,
        |    r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
        |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2,
        |    CASE WHEN c0 > 0 AND 1.0 - r1 * r1 <> 0.0
        |      THEN TRUE ELSE FALSE END AS ok
        |  FROM h),
        |j AS (
        |  SELECT n, r1, r2, phi1, phi2, xn, xn1, ok,
        |    s0 / nd * (1.0 - phi1 - phi2) AS c
        |  FROM i),
        |k AS (
        |  SELECT n, r1, r2, phi1, phi2, xn, xn1, c, ok,
        |    c + phi1 * xn + phi2 * xn1 AS f1
        |  FROM j),
        |l AS (
        |  SELECT n, r1, r2, phi1, phi2, xn, c, f1, ok,
        |    c + phi1 * f1 + phi2 * xn AS f2
        |  FROM k)
        |SELECT n AS n_days,
        |  round(CASE WHEN ok THEN r1 END, 6) AS r1,
        |  round(CASE WHEN ok THEN r2 END, 6) AS r2,
        |  round(CASE WHEN ok THEN phi1 END, 6) AS phi1,
        |  round(CASE WHEN ok THEN phi2 END, 6) AS phi2,
        |  round(CASE WHEN ok THEN f1 END, 4) AS f1,
        |  round(CASE WHEN ok THEN f2 END, 4) AS f2,
        |  round(CASE WHEN ok THEN c + phi1 * f2 + phi2 * f1 END, 4) AS f3
        |FROM l WHERE n >= 3""".stripMargin,
    "q_gumbel_fit" ->
      """WITH dm AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(mx) AS BIGINT)
        |      AS s1,
        |    CAST(sum(mx * mx) AS BIGINT) AS s2,
        |    CAST(max(mx) AS BIGINT) AS gmax
        |  FROM dm),
        |f AS (
        |  SELECT n, CAST(s1 AS DOUBLE) AS s1v, gmax,
        |    (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /
        |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS varS
        |  FROM m),
        |g AS (
        |  SELECT n, s1v, gmax, varS,
        |    sqrt(varS * 6.0) / pi() AS beta
        |  FROM f),
        |h AS (
        |  SELECT n, gmax, varS, beta,
        |    s1v / n - 0.5772156649015329 * beta AS muG
        |  FROM g)
        |SELECT n AS n_days,
        |  round(CASE WHEN n <= 1 OR varS <= 0.0 THEN NULL
        |    ELSE muG / 100.0 END, 4) AS gumbel_mu,
        |  round(CASE WHEN n <= 1 OR varS <= 0.0 THEN NULL
        |    ELSE beta / 100.0 END, 4) AS gumbel_beta,
        |  round(CASE WHEN n <= 1 OR varS <= 0.0 THEN NULL
        |    ELSE 1.0 - exp(-exp(-(CAST(gmax AS DOUBLE) - muG) / beta))
        |    END, 6) AS p_exceed_max
        |FROM h""".stripMargin,
    "q_friedman" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type AS t,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM c),
        |types AS (SELECT DISTINCT t FROM c),
        |grid AS (
        |  SELECT d.day, ty.t, CAST(coalesce(c.x, 0) AS BIGINT) AS x
        |  FROM days d CROSS JOIN types ty
        |  LEFT JOIN c ON c.day = d.day AND c.t = ty.t),
        |r2 AS (
        |  SELECT a.day, a.t,
        |    CAST(sum(CASE WHEN b.x < a.x THEN 2 ELSE 0 END) +
        |      sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS BIGINT)
        |      AS r2
        |  FROM grid a JOIN grid b ON a.day = b.day GROUP BY 1, 2),
        |pt AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r2) AS BIGINT) AS rj2
        |  FROM r2 GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(n) AS BIGINT)
        |      AS n,
        |    CAST(sum(rj2 * rj2) AS BIGINT) AS sr2
        |  FROM pt)
        |SELECT n AS n_days, k AS k_treatments,
        |  round(CASE WHEN k <= 1 OR n = 0 THEN NULL
        |    ELSE 3.0 * sr2 / (CAST(n AS DOUBLE) * k * (k + 1)) -
        |      3.0 * n * (k + 1) END, 4) AS chi2_f
        |FROM m""".stripMargin,
    "q_hurst" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |pre AS (
        |  SELECT a.day, CAST(count(*) AS BIGINT) AS idx,
        |    CAST(sum(b.x) AS BIGINT) AS p
        |  FROM daily a JOIN daily b ON b.day <= a.day GROUP BY 1),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT)
        |      AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily),
        |z AS (
        |  SELECT max(n * p - idx * sx) AS mxz, min(n * p - idx * sx)
        |      AS mnz
        |  FROM pre CROSS JOIN base),
        |m AS (
        |  SELECT n, sx, sxx, mxz, mnz,
        |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS disc
        |  FROM base CROSS JOIN z),
        |f AS (
        |  SELECT n, mxz, mnz, disc,
        |    CAST(mxz - mnz AS DOUBLE) / sqrt(disc) AS rs
        |  FROM m)
        |SELECT n AS n_days,
        |  round(CASE WHEN n <= 1 OR disc <= 0.0 OR mxz <= mnz THEN NULL
        |    ELSE rs END, 4) AS rs,
        |  round(CASE WHEN n <= 1 OR disc <= 0.0 OR mxz <= mnz THEN NULL
        |    ELSE ln(rs) / ln(CAST(n AS DOUBLE)) END, 6) AS hurst
        |FROM f""".stripMargin,
    "q_ljung_box" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT)
        |      AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily),
        |l1 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(a.x * b.x) AS BIGINT) AS p1,
        |    CAST(sum(a.x) AS BIGINT) AS a1, CAST(sum(b.x) AS BIGINT) AS b1
        |  FROM daily a JOIN daily b ON b.day = a.day + 1),
        |l2 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n2,
        |    CAST(sum(a.x * b.x) AS BIGINT) AS p2,
        |    CAST(sum(a.x) AS BIGINT) AS a2, CAST(sum(b.x) AS BIGINT) AS b2
        |  FROM daily a JOIN daily b ON b.day = a.day + 2),
        |l3 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n3,
        |    CAST(sum(a.x * b.x) AS BIGINT) AS p3,
        |    CAST(sum(a.x) AS BIGINT) AS a3, CAST(sum(b.x) AS BIGINT) AS b3
        |  FROM daily a JOIN daily b ON b.day = a.day + 3),
        |f AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS s0,
        |    sxx, n1, p1, a1, b1, n2, p2, a2, b2, n3, p3, a3, b3
        |  FROM base CROSS JOIN l1 CROSS JOIN l2 CROSS JOIN l3),
        |g AS (
        |  SELECT n, nd, s0,
        |    nd * sxx - s0 * s0 AS c0,
        |    nd * nd * p1 - nd * s0 * (a1 + b1) + n1 * s0 * s0 AS c1s,
        |    nd * nd * p2 - nd * s0 * (a2 + b2) + n2 * s0 * s0 AS c2s,
        |    nd * nd * p3 - nd * s0 * (a3 + b3) + n3 * s0 * s0 AS c3s
        |  FROM f),
        |h AS (
        |  SELECT n, nd, c0,
        |    c1s / (nd * c0) AS r1, c2s / (nd * c0) AS r2,
        |    c3s / (nd * c0) AS r3
        |  FROM g)
        |SELECT n AS n_days,
        |  round(CASE WHEN n > 3 AND c0 > 0 THEN r1 END, 6) AS r1,
        |  round(CASE WHEN n > 3 AND c0 > 0 THEN r2 END, 6) AS r2,
        |  round(CASE WHEN n > 3 AND c0 > 0 THEN r3 END, 6) AS r3,
        |  round(CASE WHEN n > 3 AND c0 > 0 THEN
        |    nd * (nd + 2) * (r1 * r1 / (nd - 1) + r2 * r2 / (nd - 2) +
        |      r3 * r3 / (nd - 3)) END, 4) AS q_lb
        |FROM h""".stripMargin,
    "q_granger" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(b.y) AS BIGINT) AS sy,
        |    CAST(sum(a.y) AS BIGINT) AS syl,
        |    CAST(sum(a.x) AS BIGINT) AS sxl,
        |    CAST(sum(b.y * b.y) AS BIGINT) AS syy,
        |    CAST(sum(a.y * a.y) AS BIGINT) AS sll,
        |    CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
        |    CAST(sum(b.y * a.y) AS BIGINT) AS pyl,
        |    CAST(sum(b.y * a.x) AS BIGINT) AS pyx,
        |    CAST(sum(a.y * a.x) AS BIGINT) AS plx
        |  FROM daily a JOIN daily b ON b.day = a.day + 1),
        |c AS (
        |  SELECT m, CAST(m AS DOUBLE) AS mm,
        |    CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS myy,
        |    CAST(m AS DOUBLE) * sll - CAST(syl AS DOUBLE) * syl AS mll,
        |    CAST(m AS DOUBLE) * sxx - CAST(sxl AS DOUBLE) * sxl AS mxx,
        |    CAST(m AS DOUBLE) * pyl - CAST(sy AS DOUBLE) * syl AS myl,
        |    CAST(m AS DOUBLE) * pyx - CAST(sy AS DOUBLE) * sxl AS myx,
        |    CAST(m AS DOUBLE) * plx - CAST(syl AS DOUBLE) * sxl AS mlx
        |  FROM m),
        |e AS (
        |  SELECT m, mm, myy, mll, mxx, myl, myx, mlx,
        |    mll * mxx - mlx * mlx AS det
        |  FROM c),
        |f AS (
        |  SELECT m, mm, mll, det, myx, myl, mlx,
        |    myy - myl * myl / mll AS rss0,
        |    myy - (myl * (myl * mxx - myx * mlx) +
        |      myx * (myx * mll - myl * mlx)) / det AS rss1
        |  FROM e)
        |SELECT m AS n_pairs,
        |  round(CASE WHEN m > 3 AND mll > 0.0 AND det > 0.0
        |      AND rss1 > 0.0
        |    THEN (rss0 - rss1) / (rss1 / (mm - 3)) END, 4) AS f_granger,
        |  round(CASE WHEN m > 3 AND mll > 0.0 AND det > 0.0
        |      AND rss1 > 0.0
        |    THEN (myx * mll - myl * mlx) / det / 100.0 END, 6)
        |    AS beta_count
        |FROM f""".stripMargin,
    "q_cmh" ->
      """WITH cells AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'view' AND
        |      CAST(round(value * 100) AS BIGINT) >= 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN event_type = 'view' AND
        |      CAST(round(value * 100) AS BIGINT) < 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN event_type = 'purchase' AND
        |      CAST(round(value * 100) AS BIGINT) >= 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN event_type = 'purchase' AND
        |      CAST(round(value * 100) AS BIGINT) < 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS dd
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |kept AS (SELECT * FROM cells WHERE a + b + c + dd >= 2),
        |terms AS (
        |  SELECT a * 1000000 AS a6,
        |    CAST(round(CAST(a + b AS DOUBLE) * (a + c) /
        |      (a + b + c + dd) * 1e6) AS BIGINT) AS e6,
        |    CAST(round(CAST(a + b AS DOUBLE) * (c + dd) * (a + c) *
        |      (b + dd) / (CAST(a + b + c + dd AS DOUBLE) *
        |        (a + b + c + dd) * (a + b + c + dd - 1)) * 1e6)
        |      AS BIGINT) AS v6
        |  FROM kept),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(a6) AS BIGINT) AS sa, CAST(sum(e6) AS BIGINT) AS se,
        |    CAST(sum(v6) AS BIGINT) AS sv
        |  FROM terms)
        |SELECT n_strata,
        |  round(CASE WHEN sv <= 0 THEN NULL
        |    ELSE (CAST(sa - se AS DOUBLE) / 1e6) *
        |      (CAST(sa - se AS DOUBLE) / 1e6) /
        |      (CAST(sv AS DOUBLE) / 1e6) END, 4) AS chi2_cmh
        |FROM agg""".stripMargin,
    "q_mh_odds" ->
      """WITH cells AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'view' AND
        |      CAST(round(value * 100) AS BIGINT) >= 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN event_type = 'view' AND
        |      CAST(round(value * 100) AS BIGINT) < 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN event_type = 'purchase' AND
        |      CAST(round(value * 100) AS BIGINT) >= 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN event_type = 'purchase' AND
        |      CAST(round(value * 100) AS BIGINT) < 5000 THEN 1 ELSE 0
        |      END) AS BIGINT) AS dd
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1),
        |kept AS (SELECT * FROM cells WHERE a + b + c + dd >= 2),
        |terms AS (
        |  SELECT
        |    CAST(round(CAST(a AS DOUBLE) * dd /
        |      (a + b + c + dd) * 1e6) AS BIGINT) AS num6,
        |    CAST(round(CAST(b AS DOUBLE) * c /
        |      (a + b + c + dd) * 1e6) AS BIGINT) AS den6
        |  FROM kept),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(num6) AS BIGINT) AS sn, CAST(sum(den6) AS BIGINT)
        |      AS sd
        |  FROM terms)
        |SELECT n_strata,
        |  round(CASE WHEN sd <= 0 THEN NULL
        |    ELSE CAST(sn AS DOUBLE) / sd END, 4) AS or_mh
        |FROM agg""".stripMargin,
    "q_chapman" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |  WHERE event_type IN ('view', 'purchase')),
        |v AS (SELECT user_id FROM ev WHERE event_type = 'view'),
        |p AS (SELECT user_id FROM ev WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM v) AS n1,
        |    (SELECT CAST(count(*) AS BIGINT) FROM p) AS n2,
        |    (SELECT CAST(count(*) AS BIGINT) FROM v
        |     WHERE EXISTS (SELECT 1 FROM p WHERE p.user_id = v.user_id))
        |      AS m)
        |SELECT n1 AS n_viewers, n2 AS n_purchasers, m AS n_both,
        |  round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0, 2)
        |    AS n_hat
        |FROM c""".stripMargin,
    "q_bh_fdr" ->
      """WITH ev AS (
        |  SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |per AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s1,
        |    CAST(sum(v * v) AS BIGINT) AS s2
        |  FROM ev GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s1) AS BIGINT)
        |      AS t1,
        |    CAST(sum(s2) AS BIGINT) AS t2
        |  FROM per),
        |zc AS (
        |  SELECT t, n,
        |    (CAST(s1 AS DOUBLE) / n - CAST(t1 AS DOUBLE) / nn) /
        |      (sqrt(CAST(t2 AS DOUBLE) / nn -
        |        (CAST(t1 AS DOUBLE) / nn) * (CAST(t1 AS DOUBLE) / nn)) /
        |       sqrt(CAST(n AS DOUBLE))) AS z
        |  FROM per CROSS JOIN tot),
        |pp AS (
        |  SELECT t, n, z,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt,
        |    abs(z) / sqrt(2.0) AS x
        |  FROM zc),
        |g AS (
        |  SELECT t, n, round(z, 6) AS z,
        |    round(1.0 - (1.0 - ((((1.061405429 * tt - 1.453152027) * tt +
        |      1.421413741) * tt - 0.284496736) * tt + 0.254829592) * tt *
        |      exp(-x * x)), 9) AS p
        |  FROM pp),
        |ranked AS (
        |  SELECT a.t, a.n, a.z, a.p, CAST(count(b.t) AS BIGINT) AS rank
        |  FROM g a LEFT JOIN g b
        |    ON b.p < a.p OR (b.p = a.p AND b.t <= a.t)
        |  GROUP BY 1, 2, 3, 4),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM g),
        |rmax AS (
        |  SELECT coalesce(max(rank), 0) AS rmax
        |  FROM ranked CROSS JOIN k WHERE p * k <= 0.1 * rank)
        |SELECT t AS event_type, n, z, p, rank,
        |  rank <= rmax AS significant
        |FROM ranked CROSS JOIN rmax
        |ORDER BY rank, event_type""".stripMargin,
    "q_grubbs" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT)
        |      AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily),
        |dev AS (
        |  SELECT day, n, sx, sxx, abs(n * x - sx) AS ndev
        |  FROM daily CROSS JOIN base
        |  ORDER BY ndev DESC, day ASC LIMIT 1),
        |f AS (
        |  SELECT day, n, ndev,
        |    sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
        |      (CAST(n AS DOUBLE) - 1.0)) AS sdn
        |  FROM dev)
        |SELECT n AS n_days, day AS extreme_day,
        |  round(CASE WHEN n <= 1 OR sdn <= 0.0 THEN NULL
        |    ELSE CAST(ndev AS DOUBLE) / n / (sdn / sqrt(CAST(n AS DOUBLE)))
        |    END, 4) AS grubbs_g
        |FROM f""".stripMargin,
    "q_pettitt" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |r2 AS (
        |  SELECT a.day,
        |    CAST(sum(CASE WHEN b.x < a.x THEN 2 ELSE 0 END) +
        |      sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS BIGINT)
        |      AS r2
        |  FROM daily a CROSS JOIN daily b GROUP BY 1),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |pre AS (
        |  SELECT a.day, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(b.r2) AS BIGINT) AS p2
        |  FROM r2 a JOIN r2 b ON b.day <= a.day GROUP BY 1),
        |u AS (
        |  SELECT day, n, p2 - t * (n + 1) AS u
        |  FROM pre CROSS JOIN base WHERE t < n),
        |k AS (
        |  SELECT day, n, abs(u) AS k_stat
        |  FROM u ORDER BY abs(u) DESC, day ASC LIMIT 1)
        |SELECT n AS n_days, day AS change_day, CAST(k_stat AS BIGINT)
        |    AS k_stat,
        |  round(CASE WHEN n <= 1 THEN NULL
        |    ELSE least(1.0, 2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE) *
        |      k_stat / (power(CAST(n AS DOUBLE), 3) +
        |        power(CAST(n AS DOUBLE), 2)))) END, 6) AS p_approx
        |FROM k""".stripMargin,
    "q_simpson" ->
      """WITH wc AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |c AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM wc GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS nt,
        |    CAST(count(*) AS BIGINT) AS n_vocab,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS ss
        |  FROM c GROUP BY 1)
        |SELECT source, nt AS n_tokens, n_vocab,
        |  round(CASE WHEN nt <= 1 THEN NULL
        |    ELSE 1.0 - CAST(ss AS DOUBLE) /
        |      (CAST(nt AS DOUBLE) * (nt - 1)) END, 6) AS simpson_d,
        |  round(CASE WHEN ss = 0 THEN NULL
        |    ELSE CAST(nt AS DOUBLE) * (nt - 1) / CAST(ss AS DOUBLE)
        |    END, 4) AS inv_simpson
        |FROM agg ORDER BY source""".stripMargin)
}
