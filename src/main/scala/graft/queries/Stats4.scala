package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 statistics batch: paired-categorical and variance tests,
  * categorical association (information-theoretic), robust quantile
  * regression, seasonal trend, and survival comparison — the analytics
  * layer a data-curation team runs on its event exhaust and corpus
  * metadata (reference analog: the summarize/describe surface,
  * cmd/bacalhau/describe.go + docs/examples analytics notebooks; the
  * reference ships the transport for these jobs, the engine here IS the
  * analytics).
  *
  * House disciplines (same as Stats2/Stats3):
  *  - exact integer sums (cents / counts) until ONE final division;
  *  - any float term that enters a SUM is quantized to nano-units
  *    (round(x·1e9) → BIGINT) first, so no engine's summation order can
  *    move a result;
  *  - corpus-scale work is a single map-side-combined aggregate; all
  *    later joins run on calendar/type/user-aggregated bounded frames
  *    (or broadcast 1-row scalars);
  *  - ties and argmins break on explicit deterministic keys.
  */
object Stats4 {

  private type Q = (SparkSession, String) => DataFrame
  private val DayUs = 86400000000L

  val queries: Map[String, Q] = Map(
    // ---- McNemar's test: did individual users CHANGE activity between
    // the two calendar halves? A marginal 2×2 (q_ab_test) can look flat
    // while users churn symmetrically; McNemar looks only at the
    // discordant users (active-then-silent vs silent-then-active).
    // Per-user presence bits are one corpus aggregate keyed on user_id
    // (map-side combine, SF-scaled key reduced to one row per user);
    // the 2×2 collapse and χ² = (b−c)²/(b+c) are exact integers until
    // the final division. The calendar midpoint reuses q_diff_in_diff's
    // integer-div discipline.
    "q_mcnemar" -> ((s, d) => {
      // ONE corpus pass: per-user first/last activity day; "active pre"
      // ⟺ min day < mid and "active post" ⟺ max day ≥ mid, and the
      // global calendar bounds are the min/max OF the user bounds — so
      // the midpoint derives from the cached user frame instead of a
      // second events scan
      val per = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(expr(s"ts_us div $DayUs")).as("mn_u"),
          max(expr(s"ts_us div $DayUs")).as("mx_u")))
      val mid = per.agg(min("mn_u").as("mn"), max("mx_u").as("mx"))
        .select(expr("(mn + mx + 1) div 2").as("mid"))
      per.crossJoin(broadcast(mid))
        .agg(
          sum(when(col("mn_u") < col("mid") && col("mx_u") >= col("mid"),
            1L).otherwise(0L)).as("n_both"),
          sum(when(col("mx_u") < col("mid"), 1L).otherwise(0L))
            .as("n_pre_only"),
          sum(when(col("mn_u") >= col("mid"), 1L).otherwise(0L))
            .as("n_post_only"))
        .select(col("n_both"), col("n_pre_only"), col("n_post_only"),
          round(when(col("n_pre_only") + col("n_post_only") === 0,
              lit(null)).otherwise(
            ((col("n_pre_only") - col("n_post_only")) *
             (col("n_pre_only") - col("n_post_only"))).cast("double") /
              (col("n_pre_only") + col("n_post_only"))), 4).as("chi2"))
    }),

    // ---- Bartlett's test for variance homogeneity across event types —
    // the variance companion to q_levene (Levene is robust to
    // non-normality; Bartlett is the more powerful classical form, and
    // running both is the standard practice). Per-group (n, Σx, Σx²) in
    // exact cents (x² through decimal — q_jarque_bera's overflow
    // discipline); the k-row ln-variance fold quantizes each term to
    // nano before the integer sum.
    "q_bartlett" -> ((s, d) => {
      val v = round(col("value") * 100).cast("long")
      val g = Tables.events(s, d)
        .select(col("event_type").as("t"), v.as("v"), (v * v).as("v2"))
        .groupBy("t")
        .agg(count(lit(1)).as("n"), sum("v").as("s1"),
          sum(col("v2").cast("decimal(20,0)")).as("s2"))
        .filter(col("n") >= 2)
      val nn = col("n").cast("double")
      val gvar = (col("s2").cast("double") -
        col("s1").cast("double") * col("s1") / nn) / (nn - 1.0)
      val terms = g.select(col("n"), col("s1"), col("s2"),
        gvar.as("s2i"),
        ((col("n") - 1).cast("double") * (col("s2").cast("double") -
          col("s1").cast("double") * col("s1") / nn) / (nn - 1.0))
          .as("wss"))
        // a zero-variance group has no defined ln-variance term (the
        // test itself is undefined there); excluded on BOTH engines
        .filter(col("s2i") > 0)
      val sums = terms.agg(count(lit(1)).as("k"), sum("n").as("nt"),
        sum(round(col("wss") * 1e4).cast("long")).as("wss4"),
        sum(round(((col("n") - 1).cast("double") * log(col("s2i"))) * 1e9)
          .cast("long")).as("lnterm9"),
        sum(round((lit(1.0) / (col("n") - 1).cast("double")) * 1e12)
          .cast("long")).as("inv12"))
      val nk = (col("nt") - col("k")).cast("double")
      val sp2 = col("wss4").cast("double") / 1e4 / nk
      val tRaw = nk * log(sp2) - col("lnterm9").cast("double") / 1e9
      val cFac = lit(1.0) +
        (col("inv12").cast("double") / 1e12 - lit(1.0) / nk) /
          (lit(3.0) * (col("k") - 1.0))
      sums.select(col("k").as("n_groups"), col("nt").as("n_events"),
        round(sp2, 4).as("pooled_var"),
        round(when(col("k") <= 1, lit(null)).otherwise(tRaw / cFac), 4)
          .as("bartlett_t"))
    }),

    // ---- Theil's uncertainty coefficient U(lang | source) on the
    // documents grid — the ASYMMETRIC association measure next to the
    // symmetric Cramér's V / mutual information: "knowing the source,
    // what fraction of language entropy disappears?" (the number a
    // mixture designer actually wants when deciding whether source
    // labels can stand in for language labels). Entropy terms quantize
    // to nano before the bounded-grid sum.
    "q_theil_u" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.documents(s, d)
        .groupBy(col("lang").as("l"), col("source").as("src"))
        .agg(count(lit(1)).as("o")))
      val n = c.agg(sum("o").as("n"))
      val lt = c.groupBy("l").agg(sum("o").as("nl"))
      val st = c.groupBy("src").agg(sum("o").as("ns"))
      val hl = lt.crossJoin(broadcast(n))
        .select((col("nl").cast("double") / col("n")).as("p"))
        .agg(sum(round(-col("p") * log(col("p")) * 1e9).cast("long"))
          .as("hl9"))
      val hls = c.join(broadcast(st), "src").crossJoin(broadcast(n))
        .select((col("o").cast("double") / col("n")).as("p"),
          (col("o").cast("double") / col("ns")).as("pc"))
        .agg(sum(round(-col("p") * log(col("pc")) * 1e9).cast("long"))
          .as("hls9"))
      hl.crossJoin(broadcast(hls)).crossJoin(broadcast(n))
        .select(col("n").as("n_docs"),
          round(col("hl9") / 1e9, 6).as("h_lang"),
          round(col("hls9") / 1e9, 6).as("h_lang_given_source"),
          round(when(col("hl9") === 0, lit(null)).otherwise(
            (col("hl9") - col("hls9")).cast("double") / col("hl9")), 6)
            .as("theil_u"))
    }),

    // ---- G-test of independence (likelihood-ratio χ²) on the events
    // type × weekday grid — the log-likelihood sibling of
    // q_cramers_v_events' Pearson χ² on the SAME grid (additive across
    // partitions of the table, the property Pearson lacks; the standard
    // pairing in corpus-linguistics work, e.g. Dunning 1993, whose
    // per-keyword form is q_log_odds/q_chi2_keywords). Zero cells
    // contribute 0 (lim x→0 of x·ln x); each cell term quantizes to
    // nano before the bounded-grid sum.
    "q_gtest" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(col("event_type").as("t"),
          (expr(s"ts_us div $DayUs") % 7).as("wd"))
        .agg(count(lit(1)).as("o")))
      val rt = c.groupBy("t").agg(sum("o").as("rt"))
      val ct = c.groupBy("wd").agg(sum("o").as("ct"))
      val tot = c.agg(sum("o").as("n"), countDistinct("t").as("r"),
        countDistinct("wd").as("cc"))
      val e = col("rt").cast("double") * col("ct") / col("n")
      val term = lit(2.0) * col("o") * log(col("o").cast("double") / e)
      val g = c.join(broadcast(rt), "t").join(broadcast(ct), "wd")
        .crossJoin(broadcast(tot))
        .agg(sum(round(term * 1e9).cast("long")).as("g9"),
          max("n").as("n"), max("r").as("r"), max("cc").as("cc"))
      g.select(col("n").as("n_events"),
        ((col("r") - 1) * (col("cc") - 1)).as("df"),
        round(col("g9") / 1e9, 4).as("g_stat"))
    }),

    // ---- quantile (pinball-loss) regression of daily revenue on time,
    // τ = 0.5 and 0.9 — the median trend an outlier day cannot drag
    // (q_theil_sen's loss-based sibling) plus the P90 envelope a
    // capacity planner reads. Exact search over a DETERMINISTIC integer
    // grid: 41 slopes × 21 intercepts derived from the series' integer
    // range (no float steps whose rounding could differ); pinball loss
    // is kept in scaled integer cents (τ·r and (τ−1)·r both ×10
    // integers), so the argmin is an exact lexicographic (loss, slope,
    // intercept) minimum on both engines. The corpus collapses to the
    // calendar frame in one pass; the grid join is
    // calendar-bounded × 861 — nothing scales with the corpus.
    "q_quantile_reg" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        .localCheckpoint(true)
      val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"),
        min("y").as("y0"), max("y").as("y1"))
        .select(col("d0"), col("y0"),
          greatest(col("d1") - col("d0"), lit(1L)).as("dd"),
          greatest(col("y1") - col("y0"), lit(1L)).as("yr"))
      val grid = bounds
        .select(col("d0"), col("y0"), col("dd"), col("yr"),
          explode(sequence(lit(-20), lit(20))).as("i"))
        .select(col("d0"), col("y0"), col("dd"), col("yr"),
          expr("(yr * i) div (20 * dd)").as("slope"),
          explode(sequence(lit(0), lit(20))).as("j"))
        .select(col("d0"), col("slope"),
          (col("y0") + expr("(yr * j) div 20")).as("icept"))
      val scored = daily.crossJoin(broadcast(grid))
        .select(col("slope"), col("icept"),
          (col("y") - col("icept") -
            col("slope") * (col("day") - col("d0"))).as("r"))
        .groupBy("slope", "icept")
        .agg(sum(when(col("r") >= 0, col("r")).otherwise(-col("r")))
            .as("loss05x2"),
          sum(when(col("r") >= 0, lit(9L) * col("r"))
            .otherwise(-col("r"))).as("loss90x10"))
        .localCheckpoint(true)
      val m05 = scored.orderBy(col("loss05x2").asc, col("slope").asc,
          col("icept").asc).limit(1)
        .select(lit(0.5).as("tau"), col("slope").as("slope_cents_per_day"),
          col("icept").as("icept_cents"),
          round(col("loss05x2").cast("double") / 2.0 / 100.0, 4)
            .as("pinball_loss"))
      val m90 = scored.orderBy(col("loss90x10").asc, col("slope").asc,
          col("icept").asc).limit(1)
        .select(lit(0.9).as("tau"), col("slope").as("slope_cents_per_day"),
          col("icept").as("icept_cents"),
          round(col("loss90x10").cast("double") / 10.0 / 100.0, 4)
            .as("pinball_loss"))
      m05.unionByName(m90).orderBy("tau")
    }),

    // ---- seasonal Mann–Kendall (Hirsch–Slack): q_mk_trend compares
    // every day to every day, which a weekly cycle contaminates (Monday
    // vs Sunday pairs read as "trend"); the seasonal form compares days
    // only WITHIN each weekday slot and sums the seven statistics —
    // S = Σ_w S_w, Var = Σ_w Var_w(tie-corrected), Z continuity-
    // corrected. Identical integer disciplines to q_mk_trend; the
    // pairwise join is weekday-keyed over the calendar-bounded frame
    // (pairs shrink 7× vs the plain test).
    "q_seasonal_mk" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .select(col("day"), (col("day") % 7).as("wd"), col("x"))
        .localCheckpoint(true)
      val a = daily.toDF("di", "wd", "xi")
      val b = daily.toDF("dj", "wd", "xj")
      val sStat = a.join(b, Seq("wd")).filter(col("dj") > col("di"))
        .agg(sum(signum((col("xj") - col("xi")).cast("double"))
          .cast("long")).as("s_stat"), count(lit(1)).as("n_pairs"))
      val perW = daily.groupBy("wd").agg(count(lit(1)).as("nw"))
        .agg(sum(col("nw") * (col("nw") - 1) * (lit(2L) * col("nw") + 5))
          .as("var_base18"), sum("nw").as("n_days"))
      val ties = daily.groupBy("wd", "x").agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .as("tie_adj18"))
      sStat.crossJoin(broadcast(perW)).crossJoin(broadcast(ties))
        .select(col("n_days"), col("n_pairs"), col("s_stat"),
          round((col("var_base18") - coalesce(col("tie_adj18"), lit(0L)))
            .cast("double") / 18.0, 4).as("var_s"),
          round(when(col("var_base18") - coalesce(col("tie_adj18"),
              lit(0L)) <= 0, lit(null)).otherwise(
            (col("s_stat").cast("double") -
              signum(col("s_stat").cast("double"))) /
            sqrt((col("var_base18") - coalesce(col("tie_adj18"), lit(0L)))
              .cast("double") / 18.0)), 6).as("z"))
    }),

    // ---- 1-D two-component Gaussian mixture over daily revenue, 3 EM
    // iterations — "is revenue bimodal (weekday/weekend regimes), and
    // where are the modes?" — the model-based companion to q_sax /
    // q_equidepth_bins' nonparametric binning. Determinism: init is
    // closed-form (μ at the exact integer range ends, shared population
    // variance from integer sums, π = ½); every E-step responsibility
    // quantizes to picounits (round(r·10¹²) → BIGINT) so M-step
    // numerators are EXACT integer products (r12·y, r12·y² through
    // decimal/HUGEINT — component 2's weight is exactly 10¹²−r12);
    // variances floor at 1e-6 so a component collapsing onto one day
    // can't divide by zero; the 1/√2π factor cancels in r and appears
    // only in the final log-likelihood. Scale shape: the corpus
    // collapses once; each EM iteration is one aggregate over the
    // checkpointed calendar frame + a broadcast 1-row parameter update.
    "q_em_gmm" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        .localCheckpoint(true)
      val T = 1000000000000L // 1e12 responsibility scale
      val init = daily.agg(count(lit(1)).as("n"), min("y").as("mn"),
          max("y").as("mx"), sum("y").as("s1"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("s2"))
        .select(col("n"), col("mn").cast("double").as("mu1"),
          col("mx").cast("double").as("mu2"),
          greatest(col("s2").cast("double") / col("n") -
            (col("s1").cast("double") / col("n")) *
            (col("s1").cast("double") / col("n")), lit(1e-6)).as("v1"),
          greatest(col("s2").cast("double") / col("n") -
            (col("s1").cast("double") / col("n")) *
            (col("s1").cast("double") / col("n")), lit(1e-6)).as("v2"),
          lit(0.5).as("p1"))
        .localCheckpoint(true)
      def a1(y: Column): Column = col("p1") *
        exp(-(y - col("mu1")) * (y - col("mu1")) / (lit(2.0) * col("v1"))) /
        sqrt(col("v1"))
      def a2(y: Column): Column = (lit(1.0) - col("p1")) *
        exp(-(y - col("mu2")) * (y - col("mu2")) / (lit(2.0) * col("v2"))) /
        sqrt(col("v2"))
      def estep(params: DataFrame): DataFrame = {
        val y = col("y").cast("double")
        val den = a1(y) + a2(y)
        daily.crossJoin(broadcast(params))
          .select(col("y"), col("n"),
            round(when(den > 0, a1(y) / den).otherwise(lit(0.5)) * T)
              .cast("long").as("r12"))
      }
      def mstep(e: DataFrame): DataFrame = {
        val agg = e.agg(max("n").as("n"), sum("r12").as("sr"),
          sum(col("r12").cast("decimal(38,0)") * col("y")).as("sry"),
          sum(col("r12").cast("decimal(38,0)") * col("y") * col("y"))
            .as("sry2"),
          sum((lit(T) - col("r12")).cast("decimal(38,0)") * col("y"))
            .as("swy"),
          sum((lit(T) - col("r12")).cast("decimal(38,0)") * col("y") *
            col("y")).as("swy2"))
        val n2 = col("n").cast("double") * T - col("sr").cast("double")
        val mu1n = col("sry").cast("double") / col("sr").cast("double")
        val mu2n = col("swy").cast("double") / n2
        agg.select(col("n"), mu1n.as("mu1"), mu2n.as("mu2"),
            greatest(col("sry2").cast("double") /
              col("sr").cast("double") - mu1n * mu1n, lit(1e-6)).as("v1"),
            greatest(col("swy2").cast("double") / n2 - mu2n * mu2n,
              lit(1e-6)).as("v2"),
            (col("sr").cast("double") / (col("n").cast("double") * T))
              .as("p1"))
          .localCheckpoint(true)
      }
      val fin = mstep(estep(mstep(estep(mstep(estep(init))))))
      val y = col("y").cast("double")
      val mix = (a1(y) + a2(y)) / sqrt(lit(2.0) * lit(3.141592653589793))
      val ll = daily.crossJoin(broadcast(fin))
        .agg(max("n").as("n_days"), max("p1").as("p1f"),
          max("mu1").as("mu1f"), max("mu2").as("mu2f"),
          max("v1").as("v1f"), max("v2").as("v2f"),
          sum(round(when(mix > 0, log(mix)).otherwise(lit(-690.0)) * 1e6)
            .cast("long")).as("ll6"))
      ll.select(col("n_days"), round(col("p1f"), 6).as("pi1"),
        round(col("mu1f") / 100.0, 4).as("mu1_dollars"),
        round(col("mu2f") / 100.0, 4).as("mu2_dollars"),
        round(sqrt(col("v1f")) / 100.0, 4).as("sd1_dollars"),
        round(sqrt(col("v2f")) / 100.0, 4).as("sd2_dollars"),
        round(col("ll6") / 1e6, 4).as("loglik"))
    }),

    // ---- energy distance (Székely–Rizzo two-sample E-statistic)
    // between weekend and weekday daily revenue: E = 2·E|X−Y| −
    // E|X−X′| − E|Y−Y′| — the distribution-level "are weekends a
    // different regime?" test that sees shape differences a mean test
    // misses. All three terms are EXACT integer sums of |cents
    // differences| over the calendar-bounded pairwise frames (V-
    // statistic form, full n² denominators); the corpus contributes
    // one daily aggregate. Epoch day 0 is a Thursday, so weekend =
    // day % 7 ∈ {2, 3} — a pure integer predicate both engines share.
    "q_energy_distance" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        .select((col("day") % 7).isin(2, 3).as("we"), col("y"))
        .localCheckpoint(true)
      val a = daily.filter(col("we")).select(col("y").as("xa"))
      val b = daily.filter(!col("we")).select(col("y").as("xb"))
      val sab = a.crossJoin(b)
        .agg(sum(abs(col("xa") - col("xb"))).as("sab"),
          count(lit(1)).as("nab"))
      val saa = a.toDF("x1").crossJoin(a.toDF("x2"))
        .agg(sum(abs(col("x1") - col("x2"))).as("saa"),
          count(lit(1)).as("naa"))
      val sbb = b.toDF("x1").crossJoin(b.toDF("x2"))
        .agg(sum(abs(col("x1") - col("x2"))).as("sbb"),
          count(lit(1)).as("nbb"))
      sab.crossJoin(broadcast(saa)).crossJoin(broadcast(sbb))
        .select(col("nab").as("n_pairs"),
          round((lit(2.0) * col("sab") / col("nab") -
            col("saa").cast("double") / col("naa") -
            col("sbb").cast("double") / col("nbb")) / 100.0, 4)
            .as("e_stat_dollars"))
    }),

    // ---- Cliff's delta between the same weekend/weekday samples: the
    // ordinal effect size δ = (#(x>y) − #(x<y)) / (n_a·n_b) that
    // q_mann_whitney's p-value doesn't report — "HOW MUCH bigger are
    // weekend days", robust to any monotone transform. Exact integer
    // pair counts over the bounded calendar pairs.
    "q_cliffs_delta" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        .select((col("day") % 7).isin(2, 3).as("we"), col("y"))
        .localCheckpoint(true)
      val a = daily.filter(col("we")).select(col("y").as("xa"))
      val b = daily.filter(!col("we")).select(col("y").as("xb"))
      a.crossJoin(b)
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("xa") > col("xb"), 1L).otherwise(0L)).as("gt"),
          sum(when(col("xa") < col("xb"), 1L).otherwise(0L)).as("lt"))
        .select(col("n_pairs"), col("gt"), col("lt"),
          round(when(col("n_pairs") === 0, lit(null)).otherwise(
            (col("gt") - col("lt")).cast("double") / col("n_pairs")), 6)
            .as("cliffs_delta"))
    }),

    // ---- permutation (randomization) test of the weekend−weekday mean
    // daily-revenue difference: the assumption-free p-value next to the
    // parametric tests — under the null, group labels are exchangeable,
    // so the observed difference is compared against 200 relabelings.
    // The permutations are DETERMINISTIC and size-preserving: for each
    // k, days rank by md5(k‖day) and the first n_weekend ranks form the
    // pseudo-weekend (a hash order is a pure function of (k, day), so
    // both engines and any two replicas draw the SAME 200 permutations
    // — the q_stratified_topk salted-order trick). Differences compare
    // in quantized tenth-cent units so the ≥ boundary can't float.
    // Scale shape: one corpus collapse; the permutation frame is
    // calendar × 200 — bounded at any SF.
    "q_perm_test" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        .select(col("day"), ((col("day") % 7).isin(2, 3)).as("we"),
          col("y"))
        .localCheckpoint(true)
      val obs = daily.agg(count(lit(1)).as("n_days"),
          sum(when(col("we"), 1L).otherwise(0L)).as("na"),
          sum(when(col("we"), col("y")).otherwise(0L)).as("sa"),
          sum(when(!col("we"), col("y")).otherwise(0L)).as("sb"))
        .select(col("n_days"), col("na"),
          round((col("sa").cast("double") / col("na") -
            col("sb").cast("double") / (col("n_days") - col("na"))) * 10.0)
            .cast("long").as("obs10"))
        .localCheckpoint(true)
      val perms = daily.crossJoin(broadcast(
          s.range(1, 201).select(col("id").as("k"))))
        .select(col("k"), col("day"), col("y"),
          md5(concat(col("k").cast("string"), lit("_"),
            col("day").cast("string"))).as("h"))
      val wr = Window.partitionBy("k").orderBy(col("h").asc, col("day").asc)
      val diffs = perms.withColumn("rn", row_number().over(wr))
        .crossJoin(broadcast(obs.select(col("na").as("na_"),
          col("n_days").as("nd_"))))
        .groupBy("k")
        .agg(max("na_").as("na"), max("nd_").as("nd"),
          sum(when(col("rn") <= col("na_"), col("y")).otherwise(0L))
            .as("pa"),
          sum(when(col("rn") > col("na_"), col("y")).otherwise(0L))
            .as("pb"))
        .select(col("k"),
          round((col("pa").cast("double") / col("na") -
            col("pb").cast("double") / (col("nd") - col("na"))) * 10.0)
            .cast("long").as("d10"))
      diffs.crossJoin(broadcast(obs))
        .agg(max("n_days").as("n_days"),
          max(round(col("obs10") / 1000.0, 4)).as("obs_diff_dollars"),
          count(lit(1)).as("n_perms"),
          sum(when(abs(col("d10")) >= abs(col("obs10")), 1L).otherwise(0L))
            .as("n_extreme"))
        .select(col("n_days"), col("obs_diff_dollars"), col("n_perms"),
          col("n_extreme"),
          round((col("n_extreme") + 1).cast("double") /
            (col("n_perms") + 1), 4).as("p_value"))
    }),

    // ---- log-rank test: do odd-user_id users churn on a different
    // schedule than even ones? The two-sample companion to
    // q_kaplan_meier's curve — churn day is each user's last activity
    // (everyone "dies" inside the fixture window, so no censoring
    // term). At-risk counts come from reverse cumulative sums over the
    // calendar-bounded death-day grid (one window, keyed nowhere
    // because the grid is ≤ calendar days × 2 — bounded); expectation
    // and variance terms quantize to nano before the sum;
    // χ² = (O₁−E₁)²/V. The corpus contributes ONE user-keyed aggregate.
    "q_log_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val deaths = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(expr(s"ts_us div $DayUs")).as("dday"))
        .groupBy(col("dday"), (col("user_id") % 2 === 1).as("g1"))
        .agg(count(lit(1)).as("deaths"))
        .localCheckpoint(true) // calendar×2-bounded grid
      val grid = deaths.select("dday").distinct()
        .join(deaths.filter(col("g1")).select(col("dday"),
          col("deaths").as("d1")), Seq("dday"), "left")
        .join(deaths.filter(!col("g1")).select(col("dday"),
          col("deaths").as("d0")), Seq("dday"), "left")
        .select(col("dday"), coalesce(col("d1"), lit(0L)).as("d1"),
          coalesce(col("d0"), lit(0L)).as("d0"))
      // at-risk at t = deaths at ≥ t (no censoring): reverse running sum
      // over the bounded grid — single partition is CORRECT here, the
      // frame is calendar-sized at any SF
      val w = Window.orderBy(col("dday").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = grid
        .withColumn("r1", sum("d1").over(w))
        .withColumn("r0", sum("d0").over(w))
      val nt = (col("r1") + col("r0")).cast("double")
      val dt = (col("d1") + col("d0")).cast("double")
      val e1 = dt * col("r1") / nt
      val vt = when(col("r1") + col("r0") <= 1, lit(0.0)).otherwise(
        dt * (col("r1") / nt) * (col("r0") / nt) *
          (nt - dt) / (nt - lit(1.0)))
      val sums = risk.agg(
        sum("d1").as("o1"),
        sum(round(e1 * 1e9).cast("long")).as("e19"),
        sum(round(vt * 1e9).cast("long")).as("v9"),
        (sum("d1") + sum("d0")).as("n_users"))
      sums.select(col("n_users"), col("o1").as("observed_g1"),
        round(col("e19") / 1e9, 4).as("expected_g1"),
        round(when(col("v9") <= 0, lit(null)).otherwise(
          pow(col("o1").cast("double") - col("e19") / 1e9, 2) /
            (col("v9") / 1e9)), 4).as("chi2"))
    }))

  /** One unrolled EM iteration for the q_em_gmm oracle (E-step
    * responsibilities in exact picounits, M-step integer moments through
    * HUGEINT) — the compile-time-unrolled loop discipline of the BPE /
    * PageRank oracles. */
  private def emStepSql(i: Int): String = {
    val prev = if (i == 1) "it0" else s"m${i - 1}"
    s"""e$i AS (
       |  SELECT y, n,
       |    CAST(round(CASE WHEN a1 + a2 > 0 THEN a1 / (a1 + a2)
       |      ELSE 0.5 END * 1000000000000) AS BIGINT) AS r12
       |  FROM (
       |    SELECT d.y, p.n,
       |      p.p1 * exp(-(d.y - p.mu1) * (d.y - p.mu1) / (2.0 * p.v1))
       |        / sqrt(p.v1) AS a1,
       |      (1.0 - p.p1) * exp(-(d.y - p.mu2) * (d.y - p.mu2)
       |        / (2.0 * p.v2)) / sqrt(p.v2) AS a2
       |    FROM daily d CROSS JOIN $prev p) q),
       |m$i AS (
       |  SELECT n, mu1, mu2,
       |    greatest(sry2d / srd - mu1 * mu1, 1e-6) AS v1,
       |    greatest(swy2d / n2 - mu2 * mu2, 1e-6) AS v2,
       |    srd / (CAST(n AS DOUBLE) * 1000000000000) AS p1
       |  FROM (
       |    SELECT n, CAST(sr AS DOUBLE) AS srd,
       |      CAST(n AS DOUBLE) * 1000000000000 - CAST(sr AS DOUBLE) AS n2,
       |      CAST(sry AS DOUBLE) / CAST(sr AS DOUBLE) AS mu1,
       |      CAST(swy AS DOUBLE) /
       |        (CAST(n AS DOUBLE) * 1000000000000 - CAST(sr AS DOUBLE))
       |        AS mu2,
       |      CAST(sry2 AS DOUBLE) AS sry2d, CAST(swy2 AS DOUBLE) AS swy2d
       |    FROM (
       |      SELECT max(n) AS n, CAST(sum(r12) AS BIGINT) AS sr,
       |        sum(CAST(r12 AS HUGEINT) * y) AS sry,
       |        sum(CAST(r12 AS HUGEINT) * y * y) AS sry2,
       |        sum(CAST(1000000000000 - r12 AS HUGEINT) * y) AS swy,
       |        sum(CAST(1000000000000 - r12 AS HUGEINT) * y * y) AS swy2
       |      FROM e$i) t) u)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_em_gmm" ->
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |it0 AS (
         |  SELECT n, CAST(mn AS DOUBLE) AS mu1, CAST(mx AS DOUBLE) AS mu2,
         |    greatest(CAST(s2 AS DOUBLE) / n -
         |      (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1e-6)
         |      AS v1,
         |    greatest(CAST(s2 AS DOUBLE) / n -
         |      (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1e-6)
         |      AS v2,
         |    0.5 AS p1
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS n, min(y) AS mn,
         |        max(y) AS mx, CAST(sum(y) AS BIGINT) AS s1,
         |        sum(CAST(y AS HUGEINT) * y) AS s2
         |        FROM daily) t),
         |${emStepSql(1)},
         |${emStepSql(2)},
         |${emStepSql(3)},
         |lls AS (
         |  SELECT CAST(sum(CAST(round(CASE WHEN mix > 0 THEN ln(mix)
         |      ELSE -690.0 END * 1e6) AS BIGINT)) AS BIGINT) AS ll6
         |  FROM (
         |    SELECT (p.p1 * exp(-(d.y - p.mu1) * (d.y - p.mu1)
         |        / (2.0 * p.v1)) / sqrt(p.v1) +
         |      (1.0 - p.p1) * exp(-(d.y - p.mu2) * (d.y - p.mu2)
         |        / (2.0 * p.v2)) / sqrt(p.v2))
         |      / sqrt(2.0 * 3.141592653589793) AS mix
         |    FROM daily d CROSS JOIN m3 p) q)
         |SELECT n AS n_days, round(p1, 6) AS pi1,
         |  round(mu1 / 100.0, 4) AS mu1_dollars,
         |  round(mu2 / 100.0, 4) AS mu2_dollars,
         |  round(sqrt(v1) / 100.0, 4) AS sd1_dollars,
         |  round(sqrt(v2) / 100.0, 4) AS sd2_dollars,
         |  round(ll6 / 1e6, 4) AS loglik
         |FROM m3 CROSS JOIN lls""".stripMargin,
    "q_perm_test" ->
      """WITH daily AS (
        |  SELECT day, day % 7 IN (2, 3) AS we, y FROM (
        |    SELECT epoch_us(ts) // 86400000000 AS day,
        |      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |    FROM events GROUP BY 1) q),
        |obs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(round((CAST(sum(CASE WHEN we THEN y ELSE 0 END)
        |        AS DOUBLE) / sum(CASE WHEN we THEN 1 ELSE 0 END) -
        |      CAST(sum(CASE WHEN NOT we THEN y ELSE 0 END) AS DOUBLE) /
        |      (count(*) - sum(CASE WHEN we THEN 1 ELSE 0 END))) * 10.0)
        |      AS BIGINT) AS obs10
        |  FROM daily),
        |perms AS (
        |  SELECT k.k, d.day, d.y,
        |    md5(CAST(k.k AS VARCHAR) || '_' || CAST(d.day AS VARCHAR))
        |      AS h
        |  FROM daily d CROSS JOIN generate_series(1, 200) k(k)),
        |rk AS (
        |  SELECT k, y,
        |    row_number() OVER (PARTITION BY k ORDER BY h, day) AS rn
        |  FROM perms),
        |diffs AS (
        |  SELECT k, CAST(round((CAST(sum(CASE WHEN rn <= obs.na THEN y
        |      ELSE 0 END) AS DOUBLE) / obs.na -
        |    CAST(sum(CASE WHEN rn > obs.na THEN y ELSE 0 END) AS DOUBLE)
        |      / (obs.n_days - obs.na)) * 10.0) AS BIGINT) AS d10
        |  FROM rk CROSS JOIN obs GROUP BY k, obs.na, obs.n_days)
        |SELECT obs.n_days,
        |  round(obs.obs10 / 1000.0, 4) AS obs_diff_dollars,
        |  CAST(count(*) AS BIGINT) AS n_perms,
        |  CAST(sum(CASE WHEN abs(d10) >= abs(obs.obs10) THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_extreme,
        |  round(CAST(sum(CASE WHEN abs(d10) >= abs(obs.obs10) THEN 1
        |    ELSE 0 END) + 1 AS DOUBLE) / (count(*) + 1), 4) AS p_value
        |FROM diffs CROSS JOIN obs GROUP BY obs.n_days, obs.obs10""".stripMargin,
    "q_energy_distance" ->
      """WITH daily AS (
        |  SELECT (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS we,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY epoch_us(ts) // 86400000000),
        |a AS (SELECT y AS xa FROM daily WHERE we),
        |b AS (SELECT y AS xb FROM daily WHERE NOT we),
        |sab AS (SELECT CAST(sum(abs(xa - xb)) AS BIGINT) AS sab,
        |    CAST(count(*) AS BIGINT) AS nab FROM a CROSS JOIN b),
        |saa AS (SELECT CAST(sum(abs(a1.xa - a2.xa)) AS BIGINT) AS saa,
        |    CAST(count(*) AS BIGINT) AS naa
        |  FROM a a1 CROSS JOIN a a2),
        |sbb AS (SELECT CAST(sum(abs(b1.xb - b2.xb)) AS BIGINT) AS sbb,
        |    CAST(count(*) AS BIGINT) AS nbb
        |  FROM b b1 CROSS JOIN b b2)
        |SELECT nab AS n_pairs,
        |  round((2.0 * sab / nab -
        |    CAST(saa AS DOUBLE) / naa -
        |    CAST(sbb AS DOUBLE) / nbb) / 100.0, 4) AS e_stat_dollars
        |FROM sab CROSS JOIN saa CROSS JOIN sbb""".stripMargin,
    "q_cliffs_delta" ->
      """WITH daily AS (
        |  SELECT (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS we,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY epoch_us(ts) // 86400000000),
        |a AS (SELECT y AS xa FROM daily WHERE we),
        |b AS (SELECT y AS xb FROM daily WHERE NOT we)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN xa > xb THEN 1 ELSE 0 END) AS BIGINT) AS gt,
        |  CAST(sum(CASE WHEN xa < xb THEN 1 ELSE 0 END) AS BIGINT) AS lt,
        |  round(CASE WHEN count(*) = 0 THEN NULL ELSE
        |    CAST(sum(CASE WHEN xa > xb THEN 1 ELSE 0 END) -
        |         sum(CASE WHEN xa < xb THEN 1 ELSE 0 END) AS DOUBLE) /
        |    count(*) END, 6) AS cliffs_delta
        |FROM a CROSS JOIN b""".stripMargin,
    "q_mcnemar" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |cal AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
        |per AS (
        |  SELECT user_id,
        |    max(CASE WHEN day < mid THEN 1 ELSE 0 END) AS pre,
        |    max(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS post
        |  FROM e CROSS JOIN cal GROUP BY user_id),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_both,
        |    CAST(sum(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pre_only,
        |    CAST(sum(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_post_only
        |  FROM per)
        |SELECT n_both, n_pre_only, n_post_only,
        |  round(CASE WHEN n_pre_only + n_post_only = 0 THEN NULL
        |    ELSE CAST((n_pre_only - n_post_only) *
        |      (n_pre_only - n_post_only) AS DOUBLE) /
        |      (n_pre_only + n_post_only) END, 4) AS chi2
        |FROM cells""".stripMargin,
    "q_bartlett" ->
      """WITH g AS (
        |  SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s1,
        |    CAST(sum(CAST(v * v AS HUGEINT)) AS HUGEINT) AS s2
        |  FROM (SELECT event_type,
        |          CAST(round(value * 100) AS BIGINT) AS v FROM events) q
        |  GROUP BY 1 HAVING count(*) >= 2),
        |terms AS (
        |  SELECT n,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1.0)
        |      AS s2i,
        |    (n - 1.0) * (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
        |      / (n - 1.0) AS wss
        |  FROM g),
        |kept AS (SELECT * FROM terms WHERE s2i > 0),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(CAST(round(wss * 1e4) AS BIGINT)) AS BIGINT) AS wss4,
        |    CAST(sum(CAST(round((n - 1.0) * ln(s2i) * 1e9) AS BIGINT))
        |      AS BIGINT) AS lnterm9,
        |    CAST(sum(CAST(round(1.0 / (n - 1.0) * 1e12) AS BIGINT))
        |      AS BIGINT) AS inv12
        |  FROM kept)
        |SELECT k AS n_groups, nt AS n_events,
        |  round(CAST(wss4 AS DOUBLE) / 1e4 / (nt - k), 4) AS pooled_var,
        |  round(CASE WHEN k <= 1 THEN NULL ELSE
        |    ((nt - k) * ln(CAST(wss4 AS DOUBLE) / 1e4 / (nt - k)) -
        |      CAST(lnterm9 AS DOUBLE) / 1e9) /
        |    (1.0 + (CAST(inv12 AS DOUBLE) / 1e12 - 1.0 / (nt - k)) /
        |      (3.0 * (k - 1.0))) END, 4) AS bartlett_t
        |FROM sums""".stripMargin,
    "q_theil_u" ->
      """WITH c AS (
        |  SELECT lang AS l, source AS src, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c),
        |lt AS (SELECT l, CAST(sum(o) AS BIGINT) AS nl FROM c GROUP BY 1),
        |st AS (SELECT src, CAST(sum(o) AS BIGINT) AS ns FROM c GROUP BY 1),
        |hl AS (
        |  SELECT CAST(sum(CAST(round(
        |      -(CAST(nl AS DOUBLE) / n.n) * ln(CAST(nl AS DOUBLE) / n.n)
        |      * 1e9) AS BIGINT)) AS BIGINT) AS hl9
        |  FROM lt CROSS JOIN n),
        |hls AS (
        |  SELECT CAST(sum(CAST(round(
        |      -(CAST(c.o AS DOUBLE) / n.n) *
        |      ln(CAST(c.o AS DOUBLE) / st.ns) * 1e9) AS BIGINT))
        |      AS BIGINT) AS hls9
        |  FROM c JOIN st ON st.src = c.src CROSS JOIN n)
        |SELECT n.n AS n_docs,
        |  round(hl9 / 1e9, 6) AS h_lang,
        |  round(hls9 / 1e9, 6) AS h_lang_given_source,
        |  round(CASE WHEN hl9 = 0 THEN NULL
        |    ELSE CAST(hl9 - hls9 AS DOUBLE) / hl9 END, 6) AS theil_u
        |FROM hl CROSS JOIN hls CROSS JOIN n""".stripMargin,
    "q_gtest" ->
      """WITH c AS (
        |  SELECT event_type AS t,
        |    (epoch_us(ts) // 86400000000) % 7 AS wd,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT t, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
        |ct AS (SELECT wd, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT t) AS BIGINT) AS r,
        |    CAST(count(DISTINCT wd) AS BIGINT) AS cc FROM c)
        |SELECT max(tot.n) AS n_events,
        |  (max(tot.r) - 1) * (max(tot.cc) - 1) AS df,
        |  round(CAST(sum(CAST(round(2.0 * c.o * ln(CAST(c.o AS DOUBLE) /
        |    (CAST(rt.rt AS DOUBLE) * ct.ct / tot.n)) * 1e9) AS BIGINT))
        |    AS BIGINT) / 1e9, 4) AS g_stat
        |FROM c JOIN rt ON rt.t = c.t JOIN ct ON ct.wd = c.wd
        |CROSS JOIN tot""".stripMargin,
    "q_quantile_reg" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |bounds AS (
        |  SELECT min(day) AS d0, min(y) AS y0,
        |    greatest(max(day) - min(day), 1) AS dd,
        |    greatest(max(y) - min(y), 1) AS yr
        |  FROM daily),
        |grid AS (
        |  SELECT d0, (yr * i.i) // (20 * dd) AS slope,
        |    y0 + (yr * j.j) // 20 AS icept
        |  FROM bounds, generate_series(-20, 20) AS i(i),
        |       generate_series(0, 20) AS j(j)),
        |scored AS (
        |  SELECT slope, icept,
        |    CAST(sum(CASE WHEN r >= 0 THEN r ELSE -r END) AS BIGINT)
        |      AS loss05x2,
        |    CAST(sum(CASE WHEN r >= 0 THEN 9 * r ELSE -r END) AS BIGINT)
        |      AS loss90x10
        |  FROM (SELECT g.slope, g.icept,
        |          d.y - g.icept - g.slope * (d.day - g.d0) AS r
        |        FROM daily d CROSS JOIN grid g) q
        |  GROUP BY 1, 2)
        |(SELECT 0.5 AS tau, slope AS slope_cents_per_day,
        |   icept AS icept_cents,
        |   round(CAST(loss05x2 AS DOUBLE) / 2.0 / 100.0, 4)
        |     AS pinball_loss
        | FROM scored ORDER BY loss05x2, slope, icept LIMIT 1)
        |UNION ALL
        |(SELECT 0.9 AS tau, slope, icept,
        |   round(CAST(loss90x10 AS DOUBLE) / 10.0 / 100.0, 4)
        | FROM scored ORDER BY loss90x10, slope, icept LIMIT 1)
        |ORDER BY tau""".stripMargin,
    "q_seasonal_mk" ->
      """WITH daily AS (
        |  SELECT day, day % 7 AS wd, x FROM (
        |    SELECT epoch_us(ts) // 86400000000 AS day,
        |      CAST(count(*) AS BIGINT) AS x
        |    FROM events GROUP BY 1) q),
        |p AS (
        |  SELECT CAST(sum(sign(CAST(b.x - a.x AS DOUBLE))) AS BIGINT)
        |      AS s_stat,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM daily a JOIN daily b ON b.wd = a.wd AND b.day > a.day),
        |vb AS (
        |  SELECT CAST(sum(CAST(nw AS HUGEINT) * (nw - 1) * (2 * nw + 5))
        |      AS BIGINT) AS var_base18,
        |    CAST(sum(nw) AS BIGINT) AS n_days
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS nw FROM daily
        |        GROUP BY wd) q),
        |t AS (
        |  SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
        |      AS BIGINT) AS tie_adj18
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily
        |        GROUP BY wd, x) q)
        |SELECT n_days, n_pairs, s_stat,
        |  round(CAST(var_base18 - coalesce(tie_adj18, 0) AS DOUBLE)
        |    / 18.0, 4) AS var_s,
        |  round(CASE WHEN var_base18 - coalesce(tie_adj18, 0) <= 0
        |    THEN NULL ELSE
        |    (CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE))) /
        |    sqrt(CAST(var_base18 - coalesce(tie_adj18, 0) AS DOUBLE)
        |      / 18.0) END, 6) AS z
        |FROM p CROSS JOIN vb CROSS JOIN t""".stripMargin,
    "q_log_rank" ->
      """WITH deaths AS (
        |  SELECT dday, g1, CAST(count(*) AS BIGINT) AS deaths FROM (
        |    SELECT user_id,
        |      max(epoch_us(ts) // 86400000000) AS dday,
        |      user_id % 2 = 1 AS g1
        |    FROM events GROUP BY user_id) u
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.dday,
        |    coalesce(d1.deaths, 0) AS d1, coalesce(d0.deaths, 0) AS d0
        |  FROM (SELECT DISTINCT dday FROM deaths) d
        |  LEFT JOIN deaths d1 ON d1.dday = d.dday AND d1.g1
        |  LEFT JOIN deaths d0 ON d0.dday = d.dday AND NOT d0.g1),
        |risk AS (
        |  SELECT dday, d1, d0,
        |    sum(d1) OVER (ORDER BY dday DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
        |    sum(d0) OVER (ORDER BY dday DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r0
        |  FROM grid),
        |sums AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |    CAST(sum(CAST(round((d1 + d0) * CAST(r1 AS DOUBLE) /
        |      (r1 + r0) * 1e9) AS BIGINT)) AS BIGINT) AS e19,
        |    CAST(sum(CAST(round(CASE WHEN r1 + r0 <= 1 THEN 0.0 ELSE
        |      (d1 + d0) * (CAST(r1 AS DOUBLE) / (r1 + r0)) *
        |      (CAST(r0 AS DOUBLE) / (r1 + r0)) *
        |      (r1 + r0 - d1 - d0) / (r1 + r0 - 1.0) END * 1e9)
        |      AS BIGINT)) AS BIGINT) AS v9,
        |    CAST(sum(d1) + sum(d0) AS BIGINT) AS n_users
        |  FROM risk)
        |SELECT n_users, o1 AS observed_g1,
        |  round(e19 / 1e9, 4) AS expected_g1,
        |  round(CASE WHEN v9 <= 0 THEN NULL ELSE
        |    pow(CAST(o1 AS DOUBLE) - e19 / 1e9, 2) / (v9 / 1e9) END, 4)
        |    AS chi2
        |FROM sums""".stripMargin)
}
