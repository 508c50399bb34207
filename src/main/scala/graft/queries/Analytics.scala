package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Product-analytics composites over the event stream + catalog — the
  * funnel / retention / skyline shapes BI users run constantly. All time
  * arithmetic uses `ts_us` (µs integers) so both engines compute identical
  * values regardless of timestamp precision semantics.
  *
  * Scale notes per query inline; the common principle: reduce to the
  * smallest per-entity aggregate FIRST (per-user firsts, per-price maxima),
  * then join/window over the reduced frame.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L

  /** Funnel stage frames (view → click → purchase): each stage is the
    * user's EARLIEST qualifying event strictly after the previous stage —
    * shared by q_funnel (stage counts) and q_funnel_latency (transition
    * timing). */
  private def funnelStages(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val e = Tables.events(s, d).select("user_id", "event_type", "ts_us")
    val a = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t_view"))
    val b = e.filter(col("event_type") === "click").join(a, "user_id")
      .filter(col("ts_us") > col("t_view"))
      .groupBy("user_id").agg(min("ts_us").as("t_click"))
    val c = e.filter(col("event_type") === "purchase").join(b, "user_id")
      .filter(col("ts_us") > col("t_click"))
      .groupBy("user_id").agg(min("ts_us").as("t_buy"))
    (a, b, c)
  }

  val queries: Map[String, Q] = Map(
    // ---- conversion funnel view → click → purchase: three per-user
    // min-aggregations chained by equi-joins on user_id — each stage's
    // frame shrinks, and nothing wider than (user, ts) ever shuffles.
    "q_funnel" -> ((s, d) => {
      val (a, b, c) = funnelStages(s, d)
      a.agg(count(lit(1)).as("users")).select(lit(1).as("stage"),
          lit("view").as("step"), col("users"))
        .unionAll(b.agg(count(lit(1)).as("users")).select(lit(2).as("stage"),
          lit("click").as("step"), col("users")))
        .unionAll(c.agg(count(lit(1)).as("users")).select(lit(3).as("stage"),
          lit("purchase").as("step"), col("users")))
        .orderBy("stage")
    }),

    // ---- funnel transition latency: how long converting users take
    // between stages — the metric that tells a slow funnel from a leaky
    // one. Deltas are exact µs BIGINTs; the p50/p90 run through the
    // (delta, freq) pre-agg exact-percentile discipline, so per-group
    // state is bounded by distinct latencies, not users.
    "q_funnel_latency" -> ((s, d) => {
      val (a, b, c) = funnelStages(s, d)
      def lat(df: DataFrame, dcol: org.apache.spark.sql.Column,
              name: String): DataFrame =
        df.select(dcol.as("delta_us"))
          .groupBy("delta_us").agg(count(lit(1)).as("f"))
          .agg(sum("f").as("n_users"),
            round(expr("percentile(delta_us, 0.5, f)"), 1).as("p50_us"),
            round(expr("percentile(delta_us, 0.9, f)"), 1).as("p90_us"),
            max("delta_us").as("max_us"))
          .select(lit(name).as("transition"), col("n_users"),
            col("p50_us"), col("p90_us"), col("max_us"))
      lat(b.join(a, "user_id"), col("t_click") - col("t_view"),
          "1_view_to_click")
        .unionAll(lat(c.join(b, "user_id"), col("t_buy") - col("t_click"),
          "2_click_to_buy"))
        .orderBy("transition")
    }),

    // ---- cohort retention matrix: users bucketed by first-activity day,
    // counted by distinct active day offset. Two aggregations: per-user
    // first day (tiny), then (cohort_day, offset) distinct-user counts —
    // the user dimension collapses before the matrix aggregation.
    "q_cohort" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      val cohorts = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(cohorts, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day"))
          .as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // ---- 2D skyline (pareto frontier): parts where no other part is
    // strictly cheaper AND strictly larger. Classic quadratic NOT-EXISTS
    // semantics, computed linearly: collapse to max-size per DISTINCT
    // price, prefix-max over the price order, keep parts not beaten by
    // any strictly-cheaper price. The prefix-max runs through the
    // two-phase GlobalRank.withPrefixAggs (range-repartition + local
    // prefix-max + broadcast per-partition maxima), so no single task
    // ever holds the whole price domain — the domain is distinct-price
    // bounded at fixture scale but unbounded in principle.
    "q_skyline" -> ((s, d) => {
      val p = Tables.part(s, d)
      val perPrice = p.groupBy("p_retailprice").agg(max("p_size").as("msz"))
      val pm = graft.operators.GlobalRank.withPrefixAggs(perPrice,
          Seq(col("p_retailprice")),
          Seq(graft.operators.GlobalRank.PrefixAgg("msz", "prevmax",
            isMax = true)))
        .select("p_retailprice", "prevmax")
      p.join(pm, "p_retailprice")
        .filter(col("prevmax").isNull || col("prevmax") <= col("p_size"))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    }),

    // ---- lag-k autocorrelation of daily event volume (k = 1..3) — the
    // seasonality/burstiness detector for an ingest stream. The corpus
    // collapses to one (day, count) row per day; each lag is Pearson r
    // over calendar-adjacent day pairs, computed from the integer
    // moment sums (n·Σxy − Σx·Σy etc.) so every accumulated term is
    // exact BIGINT and only the final normalize touches floats. Days
    // absent from the log are excluded from pairing (documented
    // semantics; the fixture stream is contiguous). The daily frame
    // localCheckpoints — three lag joins reuse it without re-scanning.
    "q_autocorr" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint()
      val lags = (1 to 3).map { k =>
        daily.toDF("day", "xa")
          .join(daily.toDF("dayb", "xb"), col("dayb") === col("day") + k)
          .agg(count(lit(1)).as("n"), sum("xa").as("sx"), sum("xb").as("sy"),
            sum(col("xa") * col("xa")).as("sxx"),
            sum(col("xb") * col("xb")).as("syy"),
            sum(col("xa") * col("xb")).as("sxy"))
          .select(lit(k).as("lag"), col("n").as("n_pairs"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy"))
                  .cast("double")), 6).as("r"))
      }
      lags.reduce(_ unionByName _).orderBy("lag")
    }),

    // ---- rolling 7-day active users (DAU / WAU / stickiness): the
    // engagement headline metric. Scale shape: collapse the event
    // stream to DISTINCT (user, day) pairs FIRST (the dedup bounds
    // everything after by active-pairs, not events), then fan each
    // pair out to the ≤7 window days it supports (bounded explode)
    // and equi-join to the observed-day dimension — every join keyed,
    // no range join, no window over the corpus. WAU ≥ DAU ≥ 1 on any
    // reported day, so the ratio never divides by zero.
    "q_rolling_active" -> ((s, d) => {
      val pairs = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
        .distinct()
      val days = pairs.select(col("day").as("rday")).distinct()
      val wau = pairs
        .withColumn("rday", explode(sequence(col("day"), col("day") + 6)))
        .join(days, "rday")
        .groupBy("rday").agg(count_distinct(col("user_id")).as("wau"))
      val dau = pairs.groupBy(col("day").as("rday"))
        .agg(count_distinct(col("user_id")).as("dau"))
      dau.join(wau, "rday")
        .select(col("rday").as("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
        .orderBy("day")
    }),

    // ---- RFM segmentation (recency / frequency / monetary) over the
    // orders history — the classic customer-value grid. Per-customer
    // metrics are exact integers (days, counts, cents); the quintile
    // cut points come from the freq-pre-agg exact percentile and
    // broadcast back over the customer frame (the q_equidepth_bins
    // discipline — no global ntile sort), so scoring is a map stage.
    // Output is the |5³|-bounded segment grid, not per-customer rows.
    "q_rfm" -> ((s, d) => {
      // calendar math on DATEs (timezone-free on the NTZ column)
      val cust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("cmax"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val g = cust.agg(max("cmax").as("maxd"))
      val r = graft.CacheScope.cached(cust.crossJoin(broadcast(g))
        .select(col("o_custkey"),
          datediff(col("maxd"), col("cmax")).as("rec"),
          col("freq"), col("cents")))
      def cuts(m: String): DataFrame =
        r.groupBy(m).agg(count(lit(1)).as("f"))
          .agg(expr(s"percentile($m, array(0.2,0.4,0.6,0.8), f)")
            .as(m + "_c"))
      def quint(c: org.apache.spark.sql.Column,
                cut: String): org.apache.spark.sql.Column =
        (1 to 4).map(i =>
          (c > element_at(col(cut), i)).cast("int")).reduce(_ + _) + lit(1)
      r.crossJoin(broadcast(cuts("rec")))
        .crossJoin(broadcast(cuts("freq")))
        .crossJoin(broadcast(cuts("cents")))
        .select((lit(6) - quint(col("rec"), "rec_c")).as("r_score"),
          quint(col("freq"), "freq_c").as("f_score"),
          quint(col("cents"), "cents_c").as("m_score"),
          col("cents"))
        .groupBy("r_score", "f_score", "m_score")
        // segment TOTAL, not average: cents are exact BIGINTs, and a
        // 2-dp decimal never sits on a round-half boundary, where the
        // engines' tie rules differ (an avg hit one at sf0.01)
        .agg(count(lit(1)).as("n_cust"),
          round(sum("cents").cast("double") / 100, 2).as("tot_monetary"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    // ---- Welch's t-test (unequal variances) between two event types'
    // value distributions — the A/B-test primitive. Values are cent-
    // quantized (round(v·100) — deterministic from the same float64 in
    // both engines) so Σv and Σv² are exact BIGINTs; the only doubles
    // are the final mean/variance/t expressions, mirrored op-for-op.
    // Scale shape: ONE pass, two-row aggregate — nothing shuffles but
    // the per-group partial sums.
    "q_ab_test" -> ((s, d) => {
      val v6 = round(col("value") * 100).cast("long")
      val g = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_type"), v6.as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("s1"),
          sum(col("c") * col("c")).as("s2"))
      val a = g.filter(col("event_type") === "view")
        .select(col("n").as("n1"), col("s1").as("a1"), col("s2").as("a2"))
      val b = g.filter(col("event_type") === "purchase")
        .select(col("n").as("n2"), col("s1").as("b1"), col("s2").as("b2"))
      val m1 = col("a1").cast("double") / col("n1")
      val m2 = col("b1").cast("double") / col("n2")
      val v1 = (col("a2").cast("double") -
        col("a1").cast("double") * col("a1") / col("n1")) / (col("n1") - 1)
      val v2 = (col("b2").cast("double") -
        col("b1").cast("double") * col("b1") / col("n2")) / (col("n2") - 1)
      a.crossJoin(broadcast(b))
        .select(col("n1"), col("n2"),
          round(m1 / 100, 4).as("mean_a"),
          round(m2 / 100, 4).as("mean_b"),
          round((m1 - m2) / sqrt(v1 / col("n1") + v2 / col("n2")), 4)
            .as("t_stat"))
    }),

    // ---- deterministic bootstrap CI for the mean purchase value: 32
    // resampling replicas whose per-row multiplicities come from an
    // md5-derived Poisson(1) table (368/736/920/981 ‰ cut points) — the
    // reproducible bootstrap the determinism gate allows (rand() is
    // rejected). Replica sums are exact integer (cent × multiplicity);
    // the interval is the 2nd-smallest / 2nd-largest replica mean
    // (≈ 94% coverage with B = 32). Scale shape: one 32× map-side
    // expansion, one 32-key aggregate, a 32-row window — the corpus
    // never sorts.
    "q_bootstrap_ci" -> ((s, d) => {
      val v6 = round(col("value") * 100).cast("long")
      val base = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), v6.as("c"))
      val rep = base
        .select(col("event_id"), col("c"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .select(col("b"), col("c"),
          (conv(substring(md5(concat(col("event_id").cast("string"),
            lit("_"), col("b").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 1000).as("u"))
        .select(col("b"), col("c"),
          when(col("u") < 368, 0L).when(col("u") < 736, 1L)
            .when(col("u") < 920, 2L).when(col("u") < 981, 3L)
            .otherwise(4L).as("w"))
      val means = rep.groupBy("b")
        .agg((sum(col("w") * col("c")).cast("double") / sum("w")).as("m"))
      val lo = Window.orderBy(col("m").asc, col("b").asc)
      val hi = Window.orderBy(col("m").desc, col("b").desc)
      val picked = means
        .withColumn("ra", row_number().over(lo))
        .withColumn("rd", row_number().over(hi))
      val bounds = picked.agg(
        max(when(col("ra") === 2, col("m"))).as("lo_m"),
        max(when(col("rd") === 2, col("m"))).as("hi_m"))
      base.agg(count(lit(1)).as("n"), sum("c").as("s"))
        .crossJoin(broadcast(bounds))
        .select(col("n"),
          round(col("s").cast("double") / col("n") / 100, 4).as("mean_v"),
          round(col("lo_m") / 100, 4).as("ci_lo"),
          round(col("hi_m") / 100, 4).as("ci_hi"))
    }),

    // ---- two-sample Kolmogorov-Smirnov statistic between the `value`
    // distributions of two event types — the distribution-drift test a
    // pipeline runs between data drops (nonparametric: no binning choice
    // to defend). EXACT arithmetic: D = max|F1−F2| is compared as the
    // integer |c1·n2 − c2·n1| (common denominator n1·n2), so no float
    // ever decides the max; the division + rounding happen once on the
    // winner. Scale shape: values CENT-QUANTIZE first (like
    // q_mann_whitney), so the per-distinct-value pre-aggregation's
    // cardinality bound is structural — the cent domain saturates —
    // rather than an accident of the fixture's 2-dp values; the two
    // running CDFs then go through GlobalRank.withPrefixAggs (both
    // prefix sums share one range exchange), so even a saturated cent
    // domain never funnels through a single task; the raw samples are
    // never globally sorted. (Binning is part of the statistic's
    // definition here: D is computed over the quantized empirical CDFs.)
    "q_ks_test" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("s1"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("s2"))
      val byVal = e.groupBy("v")
        .agg(sum("s1").as("a1"), sum("s2").as("a2"))
      val run = graft.operators.GlobalRank.withPrefixAggs(byVal,
        Seq(col("v")),
        Seq(graft.operators.GlobalRank.PrefixAgg("a1", "c1", inclusive = true),
          graft.operators.GlobalRank.PrefixAgg("a2", "c2", inclusive = true)))
      run.crossJoin(broadcast(
          e.agg(sum("s1").as("n1"), sum("s2").as("n2"))))
        .select(col("n1"), col("n2"),
          abs(col("c1") * col("n2") - col("c2") * col("n1")).as("dnum"))
        .groupBy("n1", "n2")
        .agg(max("dnum").as("dmax"))
        .select(col("n1"), col("n2"),
          round(col("dmax").cast("double") / (col("n1") * col("n2")), 6)
            .as("ks_d"))
    }),

    // ---- PSI (population stability index) between the same two
    // distributions over 10 equal-width bins of the global value range —
    // the binned drift score ML-ops dashboards track (PSI < 0.1 stable,
    // > 0.25 shifted). Bin edges come from a broadcast 1-row min/max
    // aggregate; counts are add-0.5 smoothed; each bin's term is rounded
    // to pico-units and INTEGER-summed so partition order cannot move
    // the score (the q_dsir/q_jsd discipline).
    "q_psi" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("value"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("s1"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("s2"))
      val mm = e.agg(min("value").as("lo"), max("value").as("hi"),
        sum("s1").as("n1"), sum("s2").as("n2"))
      val binned = e.crossJoin(broadcast(mm))
        .select(least(lit(9L), floor(
            (col("value") - col("lo")) / (col("hi") - col("lo")) * 10)
          .cast("long")).as("bin"),
          col("s1"), col("s2"), col("n1"), col("n2"))
      binned.groupBy("bin", "n1", "n2")
        .agg(sum("s1").as("b1"), sum("s2").as("b2"))
        .select(col("bin"),
          (((col("b1") + 0.5) / (col("n1") + 5.0)) -
            ((col("b2") + 0.5) / (col("n2") + 5.0))).as("dp"),
          log(((col("b1") + 0.5) / (col("n1") + 5.0)) /
            ((col("b2") + 0.5) / (col("n2") + 5.0))).as("lr"))
        .select(round(col("dp") * col("lr") * 1e12).cast("long").as("t"))
        .agg(round(sum("t") / 1e12, 6).as("psi"))
    }),

    // ---- market-basket association rules (support / confidence / lift)
    // over order baskets: the cross-sell primitive. Pair generation is the
    // bounded basket self-join (items-per-order ≤ 7 in TPC-H, so the
    // fan-out is O(k²) per basket, never all-pairs over parts); pair and
    // item counts are exact BIGINTs from map-side-combined aggs, and the
    // item-count joins stay keyed on the part id (the item-count frame is
    // a per-part dim — AQE broadcasts it at small SF, shuffles it at
    // scale; no hint either way). Lift multiplies as DOUBLEs from the
    // start — BIGINT×BIGINT basket counts overflow at the 100 TB design
    // point (the q_mi lesson). Rules with n_both < 2 are noise and would
    // dominate the output; the ≥2 floor is part of the operator contract.
    "q_assoc_rules" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
        .distinct()
      val n = items.agg(count_distinct(col("ok")).as("n_baskets"))
      val cu = items.groupBy(col("item")).agg(count(lit(1)).as("c"))
      val pairs = items.toDF("ok", "u")
        .join(items.toDF("ok", "v"), Seq("ok"))
        .filter(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= 2)
      pairs
        .join(cu.toDF("u", "c_u"), "u")
        .join(cu.toDF("v", "c_v"), "v")
        .crossJoin(broadcast(n))
        .select(col("u").as("u_part"), col("v").as("v_part"), col("n_both"),
          round(col("n_both").cast("double") /
            col("n_baskets").cast("double"), 6).as("support"),
          round(col("n_both").cast("double") /
            col("c_u").cast("double"), 6).as("conf_uv"),
          round(col("n_both").cast("double") /
            col("c_v").cast("double"), 6).as("conf_vu"),
          round((col("n_both").cast("double") * col("n_baskets")
              .cast("double")) /
            (col("c_u").cast("double") * col("c_v").cast("double")), 6)
            .as("lift"))
        .orderBy("u_part", "v_part")
    }),

    // ---- Kaplan–Meier survival curve for time-to-first-high-value
    // purchase (≥ $99): the time-to-event estimator with real right-
    // censoring — users who never convert are censored at their last
    // observed event. One per-user agg collapses the stream to
    // (time_s, observed); everything after runs on the distinct-time
    // frame (≤ |users| rows), so the risk-set window and the cumulative
    // log-sum are bounded — the global windows never see the corpus.
    // At-risk counts come from a time-DESC cumulative sum (KM ties
    // convention: deaths precede censorings, so censored at t still
    // count in n(t)). Each factor ln(1 - d/n) rounds to micro-nats and
    // INTEGER-sums (q_dsir discipline) so the product is partition-
    // order-proof; d = n can only happen at the final death time (no
    // survivors after), where S is exactly 0.
    "q_kaplan_meier" -> ((s, d) => {
      val u = Tables.events(s, d).groupBy("user_id").agg(
        min("ts_us").as("t0"),
        min(when(col("event_type") === "purchase" &&
          round(col("value") * 100) >= 9900, col("ts_us"))).as("tp"),
        max("ts_us").as("tl"))
        .select(
          expr("(coalesce(tp, tl) - t0) div 1000000").as("time_s"),
          when(col("tp").isNotNull, 1L).otherwise(0L).as("obs"))
      val byT = u.groupBy("time_s")
        .agg(count(lit(1)).as("m"), sum("obs").as("d"))
      // at-risk counts = suffix sums of m — an inclusive prefix under the
      // DESCENDING time order, distributed two-phase via GlobalRank:
      // distinct observation times are seconds-granular and grow with the
      // corpus, so no single task may hold the whole time domain
      val risk = graft.operators.GlobalRank.withPrefixAggs(byT,
          Seq(col("time_s").desc),
          Seq(graft.operators.GlobalRank.PrefixAgg("m", "n_risk",
            inclusive = true)))
        .filter(col("d") > 0)
      kmRisk(risk)
    }),

    // ---- DBSCAN neighborhood phase (eps = 5, minPts = 10) over a 2-D
    // point set: per-point ε-neighbor counts and the core-point flag —
    // the density step that defines the clustering (full DBSCAN then
    // runs connected components over core-core edges, the machinery
    // q_dedup_groups already provides). Scale shape: grid-bucket the
    // plane at cell = ε, fan each probe point out to its 9 neighbor
    // cells (bounded ×9 explode — the q_rolling_active discipline), and
    // equi-join on the cell key; the exact-distance filter then prunes
    // the corners. No range join, no all-pairs — cost is Σ per-cell
    // density², the standard spatial-join bound.
    "q_dbscan_core" -> ((s, d) => {
      val eps = 5.0
      val p = Tables.events(s, d).filter(col("event_id") <= 4000)
        .select(col("event_id").as("pid"), col("value").as("x"),
          (col("event_id") % 100).cast("double").as("y"))
        .withColumn("cx", floor(col("x") / eps).cast("long"))
        .withColumn("cy", floor(col("y") / eps).cast("long"))
      val probe = p
        .withColumn("gx", explode(sequence(col("cx") - 1, col("cx") + 1)))
        .withColumn("gy", explode(sequence(col("cy") - 1, col("cy") + 1)))
        .select(col("pid"), col("x"), col("y"), col("gx"), col("gy"))
      val build = p.select(col("cx").as("gx"), col("cy").as("gy"),
        col("x").as("bx"), col("y").as("by"))
      probe.join(build, Seq("gx", "gy"))
        .filter((col("x") - col("bx")) * (col("x") - col("bx")) +
          (col("y") - col("by")) * (col("y") - col("by")) <= eps * eps)
        .groupBy("pid").agg(count(lit(1)).as("n_nb"))
        .select(col("pid"), col("n_nb"),
          (col("n_nb") >= 10).cast("int").as("is_core"))
        .orderBy("pid")
    }),

    // ---- Benford first-digit audit of order totals — the forensic
    // data-quality screen (fabricated numbers flunk it). The leading
    // digit comes from the INTEGER cents string, never float formatting
    // (engines disagree on double→text); expected shares are
    // ln(1+1/d)/ln(10) and the χ² contribution is one double expression
    // over the exact counts and the broadcast 1-row total.
    "q_benford" -> ((s, d) => {
      val dig = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = dig.agg(sum("n").as("tot"))
      dig.crossJoin(broadcast(tot))
        .withColumn("exp_p",
          log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
            log(lit(10.0)))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("tot").cast("double"), 6)
            .as("obs_p"),
          round(col("exp_p"), 6).as("exp_p"),
          round((col("n").cast("double") -
              col("tot").cast("double") * col("exp_p")) *
            (col("n").cast("double") -
              col("tot").cast("double") * col("exp_p")) /
            (col("tot").cast("double") * col("exp_p")), 6).as("chi2_term"))
        .orderBy("digit")
    }),

    // ---- per-group OLS (value vs. day) with slope / intercept / R²:
    // the trend-fit primitive. All five moment sums are exact BIGINTs
    // (x = day index, y = cent-quantized value), so the shuffle carries
    // six integers per group; the closed-form coefficients are computed
    // in DOUBLEs from the start — BIGINT moment products overflow at
    // the 100 TB design point (the q_mi lesson) — with the op order
    // mirrored in the oracle. Degenerate groups (zero x- or y-variance)
    // yield NULL, guarded against ANSI division-by-zero.
    "q_groupreg" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_type"),
        expr(s"ts_us div $DayUs").as("x"),
        round(col("value") * 100).cast("long").as("y"))
      val m = e.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      val dn = col("n").cast("double")
      def dd(c: String) = col(c).cast("double")
      val covN = dn * dd("sxy") - dd("sx") * dd("sy")
      val varX = dn * dd("sxx") - dd("sx") * dd("sx")
      val varY = dn * dd("syy") - dd("sy") * dd("sy")
      m.select(col("event_type"), col("n"),
          round(when(varX === 0.0, lit(null))
            .otherwise(covN / varX / 100.0), 6).as("slope"),
          round(when(varX === 0.0, lit(null))
            .otherwise((dd("sy") - (covN / varX) * dd("sx")) / dn / 100.0),
            6).as("intercept"),
          round(when(varX * varY === 0.0, lit(null))
            .otherwise(covN * covN / (varX * varY)), 6).as("r2"))
        .orderBy("event_type")
    }),

    // ---- Pareto concentration per region: the smallest number of
    // customers covering ≥80% of the region's revenue (the 80/20
    // check). The event stream... rather, orders collapse to per-
    // customer cent totals FIRST (the shuffle carries one BIGINT per
    // customer), the rank/cumsum window partitions by region, and the
    // 80% threshold is the EXACT integer test 5·cum ≥ 4·total — no
    // float boundary can flip a customer in or out. Output is 5 rows.
    "q_pareto" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"),
            col("c_nationkey")), "o_custkey")
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nationkey"),
            col("n_regionkey").as("rk"))), "c_nationkey")
      val wR = Window.partitionBy("rk")
        .orderBy(col("cents").desc, col("o_custkey"))
      val ranked = cust
        .withColumn("rnk", row_number().over(wR).cast("long"))
        .withColumn("cum", sum("cents").over(
          wR.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum("cents").over(Window.partitionBy("rk")))
      ranked.filter(col("cum") * 5 >= col("tot") * 4)
        .groupBy("rk").agg(min("rnk").as("k80"))
        .join(ranked.groupBy("rk")
          .agg(count(lit(1)).as("n_cust")), "rk")
        .join(broadcast(Tables.region(s, d)
          .select(col("r_regionkey").as("rk"), col("r_name"))), "rk")
        .select(col("r_name"), col("n_cust"), col("k80"),
          round(col("k80").cast("double") / col("n_cust").cast("double"),
            6).as("k80_share"))
        .orderBy("r_name")
    }),

    // ---- Mann–Whitney U (normal approximation, tie-corrected) between
    // 'view' and 'purchase' value distributions — the nonparametric
    // sibling of q_welch. Values cent-quantize, the pooled stream
    // pre-aggregates to (value, f_a, f_b) so rank math runs on the
    // distinct-value frame (its prefix-count distributed two-phase via
    // GlobalRank.withPrefixAggs), and every rank quantity stays an exact
    // integer by doubling (2·avgrank = 2·cumBefore + f + 1). The tie
    // correction Σ(t³−t) accumulates in DECIMAL(38,0) — exact under
    // any partition order, and big enough for 100 TB frequencies where
    // BIGINT cubes overflow. Only the final z-score touches doubles.
    "q_mann_whitney" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "view", 1L).otherwise(0L).as("a"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("b"))
        .groupBy("v").agg(sum("a").as("fa"), sum("b").as("fb"))
        .withColumn("f", col("fa") + col("fb"))
      val ranked = graft.operators.GlobalRank.withPrefixAggs(e,
          Seq(col("v")),
          Seq(graft.operators.GlobalRank.PrefixAgg("f", "cumBefore")))
        .withColumn("r2", lit(2L) * col("cumBefore") + col("f") + 1L)
      val agg = ranked.agg(
        sum("fa").as("na"), sum("fb").as("nb"),
        sum(col("fa") * col("r2")).as("ra2"),
        sum((col("f").cast("decimal(38,0)") * col("f") * col("f") -
          col("f"))).as("ties"))
      val na = col("na").cast("double")
      val nb = col("nb").cast("double")
      val nn = na + nb
      val u2 = col("ra2").cast("double") - na * (na + 1.0)
      val mu2 = na * nb
      val sig = sqrt((na * nb / 12.0) *
        ((nn + 1.0) - col("ties").cast("double") / (nn * (nn - 1.0))))
      agg.select(col("na"), col("nb"),
        round(u2 / 2.0, 2).as("u_a"),
        round(when(sig === 0.0, lit(null))
          .otherwise((u2 - mu2) / (lit(2.0) * sig)), 6).as("z"))
    }),

    // ---- time-constrained funnel (ClickHouse windowFunnel semantics):
    // each stage must land within 24 h of the PREVIOUS stage's event,
    // not merely after it — the funnel that distinguishes an active
    // journey from a months-later coincidence. Same chained min-agg
    // shape as q_funnel (each stage's frame shrinks, keyed joins only);
    // the window bound is exact µs integer arithmetic.
    "q_window_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select("user_id", "event_type", "ts_us")
      val a = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_us").as("t_view"))
      val b = e.filter(col("event_type") === "click").join(a, "user_id")
        .filter(col("ts_us") > col("t_view") &&
          col("ts_us") <= col("t_view") + DayUs)
        .groupBy("user_id").agg(min("ts_us").as("t_click"))
      val c = e.filter(col("event_type") === "purchase").join(b, "user_id")
        .filter(col("ts_us") > col("t_click") &&
          col("ts_us") <= col("t_click") + DayUs)
        .groupBy("user_id").agg(min("ts_us").as("t_buy"))
      a.agg(count(lit(1)).as("users")).select(lit(1).as("stage"),
          lit("view").as("step"), col("users"))
        .unionAll(b.agg(count(lit(1)).as("users"))
          .select(lit(2).as("stage"), lit("click").as("step"),
            col("users")))
        .unionAll(c.agg(count(lit(1)).as("users"))
          .select(lit(3).as("stage"), lit("purchase").as("step"),
            col("users")))
        .orderBy("stage")
    }),

    // ---- new vs. returning daily split: each active (user, day) pair
    // is "new" iff the day is the user's first-seen day. The stream
    // collapses to distinct pairs, the per-user first is one more
    // keyed agg, and the classification join stays on user_id — the
    // standard growth-accounting companion to q_rolling_active.
    "q_new_returning" -> ((s, d) => {
      val pairs = graft.CacheScope.cached(Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
        .distinct())
      val first = pairs.groupBy("user_id").agg(min("day").as("fday"))
      pairs.join(first, "user_id")
        .groupBy("day")
        .agg(sum(when(col("day") === col("fday"), 1L).otherwise(0L))
          .as("new_users"),
          sum(when(col("day") =!= col("fday"), 1L).otherwise(0L))
            .as("returning_users"))
        .orderBy("day")
    }),

    // ---- incremental aggregate maintenance: the merge step of a
    // materialized view — a BASE partial aggregate (first 15 days) and
    // a DELTA partial aggregate (the rest) union and re-aggregate, and
    // the result must equal the oracle's full recompute. This is the
    // property that makes 100 TB rollups maintainable: count/sum
    // moments are mergeable, so a day's delta never re-reads history.
    // The split point derives from a broadcast 1-row min-day aggregate.
    "q_incremental_agg" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), expr(s"ts_us div $DayUs").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
      val cut = e.agg((min("day") + 15L).as("cut"))
      val tagged = e.crossJoin(broadcast(cut))
      def part(p: DataFrame): DataFrame =
        p.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      val base = part(tagged.filter(col("day") < col("cut")))
      val delta = part(tagged.filter(col("day") >= col("cut")))
      base.unionByName(delta)
        .groupBy("event_type")
        .agg(sum("n").as("n"), sum("s").as("s"))
        .select(col("event_type"), col("n"),
          round(col("s").cast("double") / 100, 2).as("total"),
          round(col("s").cast("double") / col("n").cast("double") / 100,
            6).as("mean"))
        .orderBy("event_type")
    }),

    // ---- period-over-period top movers: the 20 parts with the largest
    // absolute revenue change between the first and second half of the
    // order-date range. Revenue cent-quantizes per row, the half flag
    // comes from a broadcast 1-row (min, max) date aggregate, and the
    // per-part frame carries two conditional BIGINT sums — so the
    // TakeOrdered top-k ranks on an exact integer delta (no float-tie
    // rank flake) with partkey as the deterministic tie-break.
    "q_topk_movers" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey"),
          to_date(col("o_orderdate")).as("od"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            100).cast("long").as("cents"))
      val mm = rev.agg(min("od").as("lo"), max("od").as("hi"))
      rev.crossJoin(broadcast(mm))
        .withColumn("h2",
          col("od") > date_add(col("lo"),
            (datediff(col("hi"), col("lo")) / 2).cast("int")))
        .groupBy("l_partkey")
        .agg(sum(when(!col("h2"), col("cents")).otherwise(0L)).as("c1"),
          sum(when(col("h2"), col("cents")).otherwise(0L)).as("c2"))
        .withColumn("delta_c", col("c2") - col("c1"))
        .orderBy(abs(col("delta_c")).desc, col("l_partkey"))
        .limit(20)
        .select(col("l_partkey"),
          round(col("c1").cast("double") / 100, 2).as("rev_h1"),
          round(col("c2").cast("double") / 100, 2).as("rev_h2"),
          round(col("delta_c").cast("double") / 100, 2).as("delta"))
    }),

    // ---- Herfindahl–Hirschman market concentration per region: HHI =
    // Σ(sᵢ/T)² over supplier revenue shares, plus the n-normalized form
    // antitrust screens use. Squared cent totals exceed 2^63 already at
    // ~1500 suppliers, so Σsᵢ² accumulates in DECIMAL(38,0) (exact
    // under any partition order; DuckDB mirrors in HUGEINT) and only
    // the final share division touches doubles. One keyed supplier agg,
    // broadcast dims, a |regions|-bounded output.
    "q_hhi" -> ((s, d) => {
      val sup = Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            100).cast("long").as("cents"))
        .groupBy("l_suppkey").agg(sum("cents").as("sc"))
        .join(Tables.supplier(s, d)
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          "l_suppkey")
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nationkey"),
            col("n_regionkey").as("rk"))), "s_nationkey")
      sup.groupBy("rk")
        .agg(count(lit(1)).as("n_sup"),
          sum(col("sc").cast("decimal(38,0)") * col("sc")).as("s2"),
          sum("sc").as("t"))
        .join(broadcast(Tables.region(s, d)
          .select(col("r_regionkey").as("rk"), col("r_name"))), "rk")
        .select(col("r_name"), col("n_sup"),
          round(col("s2").cast("double") /
            (col("t").cast("double") * col("t").cast("double")), 6)
            .as("hhi"),
          round(when(col("n_sup") === 1, lit(null))
            .otherwise((col("s2").cast("double") /
              (col("t").cast("double") * col("t").cast("double")) -
              lit(1.0) / col("n_sup").cast("double")) /
              (lit(1.0) - lit(1.0) / col("n_sup").cast("double"))), 6)
            .as("hhi_norm"))
        .orderBy("r_name")
    }),

    // ---- CUPED variance reduction (Deng et al. 2013): adjust each
    // user's post-period metric by θ·(pre − mean(pre)) with θ =
    // cov(pre, post)/var(pre) from the POOLED pre-period — the standard
    // way to cut A/B test variance without changing the point estimate.
    // Arms assign deterministically (user_id % 2); the experiment split
    // day is the broadcast min-day + 15 (the q_incremental_agg cut).
    // Everything reduces to exact BIGINT cent moments per arm; θ, the
    // adjusted means, and the closed-form var(adj) = var(post) −
    // 2θcov + θ²var(pre) are doubles over those moments — no second
    // pass over users.
    "q_cuped" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
      val cut = e.agg((min("day") + 15L).as("cut"))
      val users = e.crossJoin(broadcast(cut))
        .groupBy("user_id")
        .agg(sum(when(col("day") < col("cut"), col("cents"))
          .otherwise(0L)).as("pre"),
          sum(when(col("day") >= col("cut"), col("cents"))
            .otherwise(0L)).as("post"))
        .select(col("user_id") % 2, col("pre"), col("post"))
        .toDF("arm", "pre", "post")
      val byArm = graft.CacheScope.cached(users.groupBy("arm").agg(
        count(lit(1)).as("n"), sum("pre").as("sp"), sum("post").as("so"),
        sum(col("pre") * col("pre")).as("spp"),
        sum(col("pre") * col("post")).as("spo"),
        sum(col("post") * col("post")).as("soo")))
      val pooled = byArm.agg(sum("n").as("pn"), sum("sp").as("psp"),
        sum("so").as("pso"), sum("spp").as("pspp"),
        sum("spo").as("pspo"), sum("soo").as("psoo"))
      def dd(c: String) = col(c).cast("double")
      val covP = dd("pn") * dd("pspo") - dd("psp") * dd("pso")
      val varP = dd("pn") * dd("pspp") - dd("psp") * dd("psp")
      val varO = dd("pn") * dd("psoo") - dd("pso") * dd("pso")
      val theta = covP / varP
      byArm.crossJoin(broadcast(pooled))
        .select(col("arm"), col("n"),
          round(dd("so") / dd("n") / 100.0, 6).as("mean_post"),
          round((dd("so") / dd("n") -
            theta * (dd("sp") / dd("n") - dd("psp") / dd("pn"))) / 100.0,
            6).as("mean_adj"),
          round(theta, 6).as("theta"),
          round(lit(1.0) -
            (varO - lit(2.0) * theta * covP + theta * theta * varP) /
              varO, 6).as("var_reduction"))
        .orderBy("arm")
    }),

    // ---- sample-ratio mismatch check: the A/B sanity gate that
    // catches broken assignment before anyone reads the metrics. One
    // count agg; χ² against the designed 50/50 split is one double
    // expression over the exact counts.
    "q_srm" -> ((s, d) => {
      val arms = Tables.events(s, d)
        .select(col("user_id")).distinct()
        .groupBy((col("user_id") % 2).as("arm"))
        .agg(count(lit(1)).as("n"))
      arms.agg(
          sum(when(col("arm") === 0, col("n")).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("n_b"))
        .select(col("n_a"), col("n_b"),
          round(((col("n_a") - col("n_b")).cast("double") *
            (col("n_a") - col("n_b")).cast("double")) /
            (col("n_a") + col("n_b")).cast("double"), 6).as("chi2"))
    }),

    // ---- Lorenz curve of customer revenue by decile — the curve
    // behind the Gini/Pareto numbers (decile revenue + cumulative
    // share). Deciles come from broadcast exact percentile cuts over
    // the (cents, freq) pre-agg (the q_rfm/q_equidepth discipline — no
    // global ntile sort of customers); the cumulative share is one
    // window over the ≤10-row decile frame, and every share divides
    // exact BIGINT cent sums.
    "q_lorenz" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val cuts = cust.groupBy("cents").agg(count(lit(1)).as("f"))
        .agg(expr("percentile(cents, " +
          "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9), f)").as("cs"))
      val dec = cust.crossJoin(broadcast(cuts))
        .select(col("cents"),
          (lit(1) + size(filter(col("cs"),
            c => col("cents").cast("double") > c))).as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_cust"), sum("cents").as("dc"))
      val tot = dec.agg(sum("dc").as("tc"))
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec.crossJoin(broadcast(tot))
        .withColumn("cum", sum("dc").over(w))
        .select(col("decile"), col("n_cust"),
          round(col("dc").cast("double") / 100, 2).as("revenue"),
          round(col("dc").cast("double") / col("tc").cast("double"), 6)
            .as("share"),
          round(col("cum").cast("double") / col("tc").cast("double"), 6)
            .as("cum_share"))
        .orderBy("decile")
    }),

    // ---- growth accounting: each day's active users split into new /
    // retained (also active yesterday) / resurrected (seen before, not
    // yesterday), plus yesterday's churned — the MAU ledger every
    // growth team reads. One cached distinct-pair frame feeds the
    // first-day agg and BOTH day-adjacency self-joins (keyed on
    // (user, day), exact counts, no windows over the stream).
    "q_growth_acct" -> ((s, d) => {
      val pairs = graft.CacheScope.cached(Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
        .distinct())
      val first = pairs.groupBy("user_id").agg(min("day").as("fday"))
      val prev = pairs.select(col("user_id"),
        (col("day") + 1L).as("day"), lit(1L).as("was_active"))
      val today = pairs
        .join(first, "user_id")
        .join(prev, Seq("user_id", "day"), "left")
        .groupBy("day")
        .agg(sum(when(col("day") === col("fday"), 1L).otherwise(0L))
          .as("new_users"),
          sum(when(col("day") =!= col("fday") &&
            col("was_active").isNotNull, 1L).otherwise(0L))
            .as("retained"),
          sum(when(col("day") =!= col("fday") &&
            col("was_active").isNull, 1L).otherwise(0L))
            .as("resurrected"))
      val churn = pairs.withColumn("is_active", lit(1L))
        .join(prev, Seq("user_id", "day"), "right")
        .groupBy(col("day"))
        .agg(sum(when(col("is_active").isNull, 1L).otherwise(0L))
          .as("churned"))
      today.join(churn, Seq("day"), "left")
        .na.fill(0L, Seq("churned"))
        .orderBy("day")
    }),

    // ---- Hill tail-index estimator over order totals — the heavy-tail
    // diagnostic that complements q_zipf (rank domain), q_pareto (share
    // domain) and q_benford (digit domain): α̂ = k / Σᵢ₌₁..ₖ ln(x₍ᵢ₎/x₍ₖ₊₁₎)
    // over the top k+1 order statistics; α̂ ≈ 1 says "pareto-heavy", large
    // α̂ says thin tail. Cents-quantized and each log-ratio rounded to
    // pico-units so the 201-term sum is an exact integer under any
    // partition order; ties AT the threshold contribute ln(1) = 0 exactly
    // as the formula demands, so the arbitrary tie-break inside the top-k
    // cannot move the answer. Scale shape: the only corpus-touching
    // operator is a distributed TakeOrderedAndProject top-(k+1)
    // (per-partition heaps, no global sort); everything after runs on
    // 201 rows with the 1-row threshold broadcast back.
    "q_tail_index" -> ((s, d) => {
      val k = 200
      val top = Tables.orders(s, d)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
        .orderBy(col("cents").desc).limit(k + 1)
      val thr = top.agg(min("cents").as("xk"))
      top.crossJoin(broadcast(thr))
        .select(col("xk"),
          round(log(col("cents").cast("double") /
            col("xk").cast("double")) * 1e12).cast("long").as("t"))
        .groupBy("xk").agg(sum("t").as("st"))
        .select(
          lit(k).cast("long").as("k"),
          round(col("xk").cast("double") / 100, 2).as("x_threshold"),
          round(lit(k * 1e12) / col("st").cast("double"), 6).as("hill_alpha"))
    }),

    // ---- Wald SPRT (sequential probability ratio test) on the purchase
    // rate: each view/purchase event is a Bernoulli trial in time order,
    // H0: p = 0.2 vs H1: p = 0.3, α = β = 0.05 — the early-stopping A/B
    // machinery that decides AS DATA ARRIVES instead of at a fixed n
    // (q_ab_test's shape). The cumulative log-likelihood ratio is a
    // corpus-length prefix sum over the event order — exactly the frame
    // a partition-less window must never hold, so it runs through the
    // two-phase GlobalRank.withPrefixAggs (range-partition on (ts, id),
    // local prefix, broadcast offsets), with the trial index as a second
    // prefix sum sharing the same exchange. Integer discipline: the two
    // LLR increments and both Wald boundaries are pico-nat integers
    // (shared constants with the oracle SQL), so the running sum is
    // exact under any partition order and the first-crossing trial is
    // engine-independent.
    "q_sprt" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("ts_us"), col("event_id"),
          when(col("event_type") === "purchase", lit(SprtUp))
            .otherwise(lit(SprtDn)).as("inc"),
          lit(1L).as("one"))
      val cum = graft.operators.GlobalRank.withPrefixAggs(e,
        Seq(col("ts_us"), col("event_id")),
        Seq(graft.operators.GlobalRank.PrefixAgg("inc", "llr",
            inclusive = true),
          graft.operators.GlobalRank.PrefixAgg("one", "trial",
            inclusive = true)))
      cum.agg(
          count(lit(1)).as("n_trials"),
          min(when(col("llr") >= SprtBound, col("trial"))).as("up_cross"),
          min(when(col("llr") <= -SprtBound, col("trial"))).as("down_cross"),
          round(sum("inc").cast("double") / 1e12, 6).as("llr_final"))
        .select(col("n_trials"), col("up_cross"), col("down_cross"),
          when(col("up_cross").isNotNull &&
            (col("down_cross").isNull ||
              col("up_cross") < col("down_cross")), "accept_h1")
            .when(col("down_cross").isNotNull, "accept_h0")
            .otherwise("continue").as("decision"),
          col("llr_final"))
    }),

    // ---- Holt linear-trend forecast (double exponential smoothing,
    // α = 0.5, β = 0.3) of daily event volume: level/trend recursion
    // l_t = αx_t + (1−α)(l_{t−1}+b_{t−1}), b_t = β(l_t−l_{t−1}) +
    // (1−β)b_{t−1}, initialized l_0 = x_0, b_0 = x_1−x_0, updates from
    // x_1 — the capacity-planning forecast (7-day-ahead volume) next to
    // q_ewma's per-user smoothing and q_changepoint's retrospective
    // CUSUM. The recursion is inherently sequential, but its FRAME is
    // the per-day aggregate (≤ |days| rows — a structural calendar
    // bound, not corpus-scaled), so it folds in one `aggregate` HOF
    // over the day-sorted array: corpus → daily counts is the only
    // shuffle; both engines run the identical IEEE double sequence, so
    // results agree bit-for-bit before the final 4-dp round.
    "q_holt" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      val series = daily
        .agg(array_sort(collect_list(struct(col("day"), col("x"))))
          .as("a"))
        .select(col("a"), size(col("a")).as("nd"))
      val x0 = element_at(col("a"), 1).getField("x")
      val x1 = element_at(col("a"), 2).getField("x")
      val init = when(col("nd") >= 2,
        struct(x0.as("l"), (x1 - x0).as("b")))
      val folded = aggregate(
        slice(col("a"), lit(2), greatest(col("nd") - 1, lit(0))),
        init,
        (acc, e) => {
          val lNew = lit(0.5) * e.getField("x") +
            lit(0.5) * (acc.getField("l") + acc.getField("b"))
          struct(lNew.as("l"),
            (lit(0.3) * (lNew - acc.getField("l")) +
              lit(0.7) * acc.getField("b")).as("b"))
        })
      series.select(col("nd").cast("long").as("n_days"),
        round(folded.getField("l"), 4).as("level"),
        round(folded.getField("b"), 4).as("trend"),
        round(folded.getField("l") + lit(7.0) * folded.getField("b"), 4)
          .as("forecast_7d"))
    }),

    // ---- Holt–Winters additive triple-exponential forecast (weekly
    // seasonality) — q_holt's seasonal sibling: level, trend AND a
    // 7-slot seasonal profile evolve per day (α=0.3, β=0.2, γ=0.4,
    // one-minus constants literal on both sides). Classical init from
    // the first two weeks: l₀ = mean(week 1), b₀ = (mean(week 2) −
    // mean(week 1))/7, sᵢ = xᵢ − l₀ — means written as LEFT-ASSOCIATED
    // adds so both engines fold identical IEEE doubles (SQL sum() has
    // no order guarantee). Same scale shape as q_holt: the corpus
    // collapses to one calendar-bounded daily aggregate; the sequential
    // recurrence folds over that array in-plan (oracle: recursive CTE
    // carrying the 7 seasonal slots as columns). Seasonal slots are
    // series-index based (day i → slot ((i−1) mod 7)+1), matching the
    // skip-missing-days convention of q_holt.
    "q_holt_winters" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      val series = daily
        .agg(array_sort(collect_list(struct(col("day"), col("x"))))
          .as("a"))
        .select(col("a"), size(col("a")).as("nd"))
      def x(i: Column) = element_at(col("a"), i).getField("x")
      val m1 = (1 to 7).map(i => x(lit(i))).reduceLeft(_ + _) / 7
      val m2 = (8 to 14).map(i => x(lit(i))).reduceLeft(_ + _) / 7
      val l0 = m1
      val b0 = (m2 - m1) / 7
      val s0 = array((1 to 7).map(i => x(lit(i)) - l0): _*)
      val folded = when(col("nd") >= 14, aggregate(
        sequence(lit(8), col("nd")),
        struct(l0.as("l"), b0.as("b"), s0.as("s")),
        (acc, i) => {
          val pos = ((i - 1) % 7) + 1
          val xi = element_at(col("a"), i).getField("x")
          val sOld = element_at(acc.getField("s"), pos)
          val lNew = lit(0.3) * (xi - sOld) +
            lit(0.7) * (acc.getField("l") + acc.getField("b"))
          val bNew = lit(0.2) * (lNew - acc.getField("l")) +
            lit(0.8) * acc.getField("b")
          val sNew = lit(0.4) * (xi - lNew) + lit(0.6) * sOld
          struct(lNew.as("l"), bNew.as("b"),
            transform(acc.getField("s"),
              (v, j) => when(j + 1 === pos, sNew).otherwise(v)).as("s"))
        }))
      series.select(col("nd").cast("long").as("n_days"),
        round(folded.getField("l"), 4).as("level"),
        round(folded.getField("b"), 4).as("trend"),
        round(folded.getField("l") + folded.getField("b") +
          element_at(folded.getField("s"), (col("nd") % 7) + 1), 4)
          .as("forecast_1d"),
        round(array_max(folded.getField("s")) -
          array_min(folded.getField("s")), 4).as("season_range"))
    }),

    // ---- Mann–Kendall trend test over daily event volume — the
    // nonparametric "is volume actually rising?" answer next to q_holt's
    // forecast (no distribution or linearity assumed; a single spike
    // can't fake a trend): S = Σ_{i<j} sign(x_j − x_i), tie-corrected
    // normal approximation. S and the tie adjustment are exact integer
    // sums. The pairwise comparison is O(days²) on a CALENDAR-bounded
    // frame (a century is ~36k rows) — the corpus contributes one
    // map-side-combined daily aggregate, never its own pairs.
    "q_mk_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint(true) // one corpus scan; three consumers below
      val a = daily.toDF("di", "xi")
      val b = daily.toDF("dj", "xj")
      val pairs = a.join(b, col("dj") > col("di"))
        .agg(sum(signum((col("xj") - col("xi")).cast("double"))
          .cast("long")).as("s_stat"),
          count(lit(1)).as("n_pairs"))
      val ties = daily.groupBy("x").agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .as("tie_adj"))
      val nd = daily.agg(count(lit(1)).as("n_days"))
      pairs.crossJoin(broadcast(nd)).crossJoin(broadcast(ties))
        .select(col("n_days"), col("n_pairs"), col("s_stat"),
          round((col("s_stat").cast("double") -
              signum(col("s_stat").cast("double"))) /
            sqrt((col("n_days").cast("double") * (col("n_days") - 1) *
              (lit(2L) * col("n_days") + 5) -
              coalesce(col("tie_adj"), lit(0L)).cast("double")) / 18.0),
            6).as("z"))
    }),

    // ---- Theil–Sen robust trend line over the same daily frame: slope
    // = median of all pairwise slopes, intercept = median of
    // (x_i − slope·day_i) — the estimator a 30%-outlier day cannot
    // move (q_groupreg's OLS twin for dirty series). Slopes round to
    // 6 dp BEFORE the median so both engines interpolate the identical
    // multiset; medians run on frequency pre-aggregates (distinct
    // rounded slopes), the q_percentiles bounded-state discipline.
    "q_theil_sen" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint(true)
      val a = daily.toDF("di", "xi")
      val b = daily.toDF("dj", "xj")
      val med = a.join(b, col("dj") > col("di"))
        .select(round((col("xj") - col("xi")).cast("double") /
          (col("dj") - col("di")), 6).as("m"))
        .groupBy("m").agg(count(lit(1)).as("f"))
        .agg(expr("percentile(m, 0.5, f)").as("med"),
          sum("f").as("n_pairs"))
      val icept = daily.crossJoin(broadcast(med.select("med")))
        .select(round(col("x") - col("med") * col("day"), 6).as("c"))
        .groupBy("c").agg(count(lit(1)).as("f"))
        .agg(expr("percentile(c, 0.5, f)").as("icept"))
      med.crossJoin(broadcast(icept))
        .select(col("n_pairs"), round(col("med"), 6).as("slope"),
          round(col("icept"), 6).as("intercept"))
    }),

    // ---- seasonal strength (STL-style decomposition): detrend daily
    // volume with a centered 7-day moving average (full windows only),
    // take per-weekday-slot means as the seasonal component, and
    // report F_s = max(0, 1 − Var(remainder)/Var(detrended)) — ~1
    // means the weekly cycle explains the series, ~0 means it's
    // noise. Determinism: detrended values quantize to exact micro
    // longs the moment they're born; the slot means, the remainder,
    // and both variance numerators (n·Σv² − (Σv)², squares in
    // DECIMAL(38,0)) are then integer-exact, and the closing ratio is
    // one double division. All windows run over the CALENDAR-bounded
    // daily frame.
    "q_stl_strength" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint(true)
      val wOrd = Window.orderBy("day")
      val wMa = Window.orderBy("day").rowsBetween(-3, 3)
      val det = daily
        .withColumn("i", row_number().over(wOrd).cast("long"))
        .withColumn("wsum", sum("x").over(wMa))
        .withColumn("wcnt", count(lit(1)).over(wMa))
        .filter(col("wcnt") === 7)
        .select(((col("i") - 1) % 7).as("slot"),
          round((col("x").cast("double") -
            col("wsum").cast("double") / 7.0) * 1e6).cast("long")
            .as("dm"))
      val seas = det.groupBy("slot")
        .agg(round(sum("dm").cast("double") / count(lit(1)))
          .cast("long").as("sm"))
      val r = det.join(broadcast(seas), "slot")
        .select(col("dm"), (col("dm") - col("sm")).as("rm"))
      r.agg(count(lit(1)).as("n"),
          sum("dm").as("sd"),
          sum(col("dm").cast("decimal(38,0)") * col("dm")).as("sdd"),
          sum("rm").as("sr"),
          sum(col("rm").cast("decimal(38,0)") * col("rm")).as("srr"))
        .select(col("n").as("n_days_used"),
          round(greatest(lit(0.0), lit(1.0) -
            (col("n").cast("decimal(38,0)") * col("srr") -
              col("sr").cast("decimal(38,0)") * col("sr")).cast("double") /
            (col("n").cast("decimal(38,0)") * col("sdd") -
              col("sd").cast("decimal(38,0)") * col("sd")).cast("double")),
            6).as("seasonal_strength"))
    }),

    // ---- A/B sample-size planning (two-proportion power analysis):
    // how many users per arm to DETECT A 10% RELATIVE REGRESSION of
    // the purchase share at α=0.05 (two-sided), power 0.8 — the
    // guardrail question every q_ab_test consumer asks next. n =
    // (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁+p₂q₂))²/δ², z constants as 6-dp
    // literals shared verbatim with the oracle. Base share
    // np/(nv+np) from exact counts (bounded in (0,1), so the −10%
    // target always is too); one fixed-order expression; ceil to
    // whole users. Corpus cost: one filtered count aggregate.
    "q_power" -> ((s, d) => {
      val agg = Tables.events(s, d)
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("nv"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
      val p1 = col("np").cast("double") /
        (col("nv") + col("np")).cast("double")
      val p2 = p1 * 0.9
      val pbar = (p1 + p2) / 2.0
      val delta = p1 * 0.1
      val nArm = ceil(
        (lit(1.959964) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
          lit(0.841621) * sqrt(p1 * (lit(1.0) - p1) +
            p2 * (lit(1.0) - p2))) *
        (lit(1.959964) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar)) +
          lit(0.841621) * sqrt(p1 * (lit(1.0) - p1) +
            p2 * (lit(1.0) - p2))) /
        (delta * delta)).cast("long")
      agg.select(round(p1, 6).as("p_base"),
        round(p2, 6).as("p_target"),
        nArm.as("n_per_arm"),
        (nArm * 2L).as("n_total"))
    }),

    // ---- forecast backtest: hold out the LAST 7 days, fit q_holt's
    // double-exponential fold on the rest, score ŷ(t+h) = l + h·b
    // against the held-out actuals — MAE/MAPE/bias, the eval loop that
    // turns a forecaster into a monitored one. Same fold, same
    // constants, same array discipline as q_holt (so the train step is
    // definitionally the production model); errors aggregate from
    // exact actual counts against one broadcast (l, b) pair, and the
    // per-horizon absolute/percent terms quantize to micro-units so
    // the 7-term sums are integers. Horizon index h is per-day
    // POSITION (train_days + position-in-holdout), gap-robust.
    "q_forecast_error" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).cast("double").as("x"))
      val series = daily
        .agg(array_sort(collect_list(struct(col("day"), col("x"))))
          .as("a"))
        .select(col("a"), size(col("a")).as("nd"))
        .filter(col("nd") >= 10)
        .select(col("a"), col("nd"), (col("nd") - 7).as("tn"))
      val x0 = element_at(col("a"), 1).getField("x")
      val x1 = element_at(col("a"), 2).getField("x")
      val init = struct(x0.as("l"), (x1 - x0).as("b"))
      val folded = aggregate(
        slice(col("a"), lit(2), col("tn") - 1),
        init,
        (acc, e) => {
          val lNew = lit(0.5) * e.getField("x") +
            lit(0.5) * (acc.getField("l") + acc.getField("b"))
          struct(lNew.as("l"),
            (lit(0.3) * (lNew - acc.getField("l")) +
              lit(0.7) * acc.getField("b")).as("b"))
        })
      val scored = series
        .select(col("a"), col("nd"), col("tn"),
          folded.getField("l").as("l"), folded.getField("b").as("b"))
        .select(col("tn"), col("l"), col("b"),
          explode(transform(sequence(lit(1), lit(7)),
            h => struct(h.as("h"),
              element_at(col("a"), col("tn") + h).getField("x")
                .as("actual")))).as("e"))
        .select(col("tn"), col("l"), col("b"), col("e.h").as("h"),
          col("e.actual").as("actual"))
        .withColumn("pred", col("l") + col("h").cast("double") * col("b"))
      scored.agg(
          count(lit(1)).as("n_holdout"),
          sum(round(abs(col("actual") - col("pred")) * 1e6)
            .cast("long")).as("aem"),
          sum(round((col("actual") - col("pred")) * 1e6).cast("long"))
            .as("bem"),
          sum(round(abs(col("actual") - col("pred")) / col("actual") *
            1e6).cast("long")).as("apm"))
        .select(col("n_holdout"),
          round(col("aem") / 1e6 / col("n_holdout"), 4).as("mae"),
          round(col("bem") / 1e6 / col("n_holdout"), 4).as("bias"),
          round(col("apm") / 1e6 / col("n_holdout") * 100.0, 4)
            .as("mape_pct"))
    }),

    // ---- Kruskal–Wallis H: does event VALUE differ across the five
    // event types? — q_mann_whitney's k-group generalization, same
    // machinery end to end: values quantize to exact cents, pooled
    // average ranks ride in half-units off the GlobalRank prefix over
    // the (value, freq) pre-aggregate, per-group rank sums 2R_g =
    // Σ(2·cumBefore + t + 1)·f_gv stay BIGINT, the per-group
    // R_g²/n_g terms quantize to milli-units in DECIMAL(38,0) (their
    // magnitude squares the rank scale — the q_entropy discipline at
    // a wider type), and ties correct via Σ(t³−t)/(N³−N). One double
    // expression per output.
    "q_kruskal" -> ((s, d) => {
      val gv = Tables.events(s, d)
        .select(col("event_type").as("g"),
          round(col("value") * 100).cast("long").as("v"))
        .groupBy("g", "v").agg(count(lit(1)).as("f"))
        .localCheckpoint(true)
      val vt = gv.groupBy("v").agg(sum("f").as("t"))
      val ranked = graft.operators.GlobalRank.withPrefixAggs(vt,
        Seq(col("v")),
        Seq(graft.operators.GlobalRank.PrefixAgg("t", "cl")))
      val byGroup = gv.join(ranked, "v")
        .groupBy("g")
        .agg(sum("f").as("ng"),
          sum((lit(2L) * col("cl") + col("t") + 1L) * col("f"))
            .as("tw2"))
      // R_g = tw2/2 exact in doubles (≪ 2^53); term·1e3 → DECIMAL sum
      val term = (col("tw2").cast("double") / 2.0) *
        (col("tw2").cast("double") / 2.0) / col("ng").cast("double")
      val agg = byGroup.agg(
        count(lit(1)).as("k"),
        sum("ng").as("n"),
        sum(round(term * 1e3).cast("decimal(38,0)")).as("s3"))
      val ties = ranked.agg(
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") -
          col("t")).as("ties"))
      val n = col("n").cast("double")
      val h = lit(12.0) / (n * (n + 1.0)) *
        (col("s3").cast("double") / 1e3) - lit(3.0) * (n + 1.0)
      val corr = lit(1.0) - col("ties").cast("double") /
        (col("n").cast("decimal(38,0)") * col("n") * col("n") -
          col("n")).cast("double")
      agg.crossJoin(broadcast(ties))
        .select(col("n"), col("k").as("n_groups"),
          round(h, 6).as("h"),
          round(h / corr, 6).as("h_corr"))
    }),

    // ---- empirical-Bayes conversion-rate shrinkage (beta-binomial,
    // method-of-moments prior): per-user purchase-per-view rates are
    // wildly unstable at small n — a 1/1 user is not a 100% converter.
    // The prior (α, β) is FIT FROM THE DATA: rates quantize to exact
    // micro-units (the q_entropy discipline) so their mean/variance
    // come from exact integer sums S1/S2 in ONE fixed-order double
    // expression, then MoM inverts m(1−m)/v − 1 = α+β (degenerate
    // moments fall back to a strength-20 prior — mirrored). Each
    // user's shrunk rate (x+α)/(n+α+β) is a broadcast-prior map stage.
    // Scale shape: per-user aggregate with map-side partials, 1-row
    // prior broadcast, linear everywhere — the canonical "millions of
    // sparse keys" rate-smoothing a ranking pipeline runs.
    "q_ctr_smoothing" -> ((s, d) => {
      val per = graft.CacheScope.cached(Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x"))
        .filter(col("n") >= 1))
      val mom = per
        .select(round(col("x").cast("double") / col("n").cast("double")
          * 1e6).cast("long").as("rm"))
        .agg(count(lit(1)).as("k"), sum("rm").as("s1"),
          sum(col("rm") * col("rm")).as("s2"))
      val m = col("s1").cast("double") / col("k").cast("double") / 1e6
      val v = col("s2").cast("double") / col("k").cast("double") / 1e12 -
        m * m
      val abSum = m * (lit(1.0) - m) / v - 1.0
      val prior = mom.select(
        when(v > 0.0 && abSum > 0.0, m * abSum)
          .otherwise(m * 20.0).as("alpha"),
        when(v > 0.0 && abSum > 0.0, (lit(1.0) - m) * abSum)
          .otherwise((lit(1.0) - m) * 20.0).as("beta"))
      per.crossJoin(broadcast(prior))
        .select(col("user_id"), col("x"), col("n"),
          round((col("x").cast("double") + col("alpha")) /
            (col("n").cast("double") + col("alpha") + col("beta")), 6)
            .as("shrunk_rate"))
        .orderBy("user_id")
    }),

    // ---- one-sided CUSUM monitor (Page 1954) over daily volume — the
    // RESETTING detector next to q_changepoint's offline curve: s_t =
    // max(0, s_{t−1} + x_t − μ − k), alarm when s_t > h. Unlike the
    // CUSUM curve (a prefix, expressible as a window), the reset makes
    // this a true sequential fold — the same aggregate()-over-the-
    // calendar-array discipline as q_holt. EVERYTHING stays in exact
    // integers: with k = μ/2 and h = 4μ, scaling by 2n turns the
    // increment into 2n·x_t − 3S and the alarm bound into 8S (n, S =
    // day count / event total), so the fold never touches a double
    // until the final report. Alarm day is the FIRST crossing (−1
    // sentinel → NULL). Streaming twin: StreamOps.cusumMonitor, same
    // integers, parity-pinned.
    "q_cusum" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
      val series = daily
        .agg(array_sort(collect_list(struct(col("day"), col("x"))))
          .as("a"),
          count(lit(1)).as("nd"), sum("x").as("sx"))
      val folded = aggregate(
        col("a"),
        struct(lit(0L).as("s"), lit(0L).as("mx"), lit(-1L).as("cr")),
        (acc, e) => {
          val sNew = greatest(lit(0L),
            acc.getField("s") + lit(2L) * col("nd") * e.getField("x") -
              lit(3L) * col("sx"))
          struct(sNew.as("s"),
            greatest(acc.getField("mx"), sNew).as("mx"),
            when(acc.getField("cr") =!= -1L, acc.getField("cr"))
              .otherwise(when(sNew > lit(8L) * col("sx"),
                e.getField("day")).otherwise(lit(-1L))).as("cr"))
        })
      series.select(col("nd").as("n_days"),
        // empty-series guard: nd = 0 must yield NULL, not 0/0 (ANSI)
        when(col("nd") === 0, lit(null))
          .otherwise(round(folded.getField("mx").cast("double") /
            (lit(2.0) * col("nd")), 4)).as("max_cusum"),
        when(folded.getField("cr") === -1L, lit(null))
          .otherwise(folded.getField("cr")).as("alarm_day"))
    }),

    // ---- Page–Hinkley drift test on the daily counts — q_cusum's
    // reset-free sibling: PH tracks the cumulative deviation from the
    // window mean (with a 10% tolerance band) MINUS its running
    // minimum, so a slow upward drift accumulates where CUSUM's
    // max(0,·) reset would repeatedly forgive it. Same integer
    // discipline as q_cusum: the increment rides in 10·nd-scale
    // (10·nd·x − 11·sx ⟺ x − 1.1·μ per day), the running min and the
    // PH gap stay BIGINT, alarm at gap > 30·sx (λ = 3μ); the fold is
    // the same array_sort + aggregate over the calendar-bounded daily
    // series, so replay order cannot move the alarm day.
    "q_page_hinkley" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
      val series = daily
        .agg(array_sort(collect_list(struct(col("day"), col("x"))))
          .as("a"),
          count(lit(1)).as("nd"), sum("x").as("sx"))
      val folded = aggregate(
        col("a"),
        struct(lit(0L).as("m"), lit(0L).as("mn"), lit(0L).as("mph"),
          lit(-1L).as("cr")),
        (acc, e) => {
          val mNew = acc.getField("m") +
            lit(10L) * col("nd") * e.getField("x") - lit(11L) * col("sx")
          val mnNew = least(acc.getField("mn"), mNew)
          val ph = mNew - mnNew
          struct(mNew.as("m"), mnNew.as("mn"),
            greatest(acc.getField("mph"), ph).as("mph"),
            when(acc.getField("cr") =!= -1L, acc.getField("cr"))
              .otherwise(when(ph > lit(30L) * col("sx"),
                e.getField("day")).otherwise(lit(-1L))).as("cr"))
        })
      series.select(col("nd").as("n_days"),
        when(col("nd") === 0, lit(null))
          .otherwise(round(folded.getField("mph").cast("double") /
            (lit(10.0) * col("nd")), 4)).as("max_ph"),
        when(folded.getField("cr") === -1L, lit(null))
          .otherwise(folded.getField("cr")).as("alarm_day"))
    }),

    // ---- partial autocorrelation (Durbin–Levinson to lag 3) over the
    // daily series — q_autocorr's conditional sibling: PACF(k) is the
    // correlation at lag k AFTER removing what lags 1..k−1 already
    // explain, the AR-order-selection diagnostic. ACF inputs use the
    // n²-scaled expansion Σ(x_t−μ)(x_{t+k}−μ)·n² = n²Σxy − nS(Σa+Σb)
    // + mS², so every aggregate is an EXACT integer (gap-robust: m is
    // the realized pair count, not n−k) and each ρ_k is one double
    // division; the recursion is a fixed-order scalar expression tree
    // on a 1-row frame. Corpus cost: one daily aggregate + three
    // calendar-bounded self-joins.
    "q_pacf" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint(true)
      val base = daily.agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("sxx"))
      def lagAgg(k: Int) = daily.toDF("day", "xa")
        .join(daily.toDF("dayb", "xb"), col("dayb") === col("day") + k)
        .agg(sum(col("xa") * col("xb")).as(s"sxy$k"),
          sum("xa").as(s"sa$k"), sum("xb").as(s"sb$k"),
          count(lit(1)).as(s"m$k"))
      val j = base
        .crossJoin(broadcast(lagAgg(1)))
        .crossJoin(broadcast(lagAgg(2)))
        .crossJoin(broadcast(lagAgg(3)))
      def rho(k: Int): Column =
        (col("n") * col("n") * col(s"sxy$k") -
          col("n") * col("s") * (col(s"sa$k") + col(s"sb$k")) +
          col(s"m$k") * col("s") * col("s")).cast("double") /
        (col("n") * col("n") * col("sxx") -
          col("n") * col("s") * col("s")).cast("double")
      val r1 = rho(1); val r2 = rho(2); val r3 = rho(3)
      val p2 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
      val p21 = r1 - p2 * r1
      val p3 = (r3 - p21 * r2 - p2 * r1) /
        (lit(1.0) - p21 * r1 - p2 * r2)
      j.select(round(r1, 6).as("pacf1"), round(p2, 6).as("pacf2"),
        round(p3, 6).as("pacf3"))
    }),

    // ---- SAX symbolic series (Lin et al. 2003): z-normalize each
    // event type's daily-count series, PAA-pool it into 6 segments,
    // map segment means onto the 4-letter Gaussian-breakpoint alphabet
    // (±0.6745, 0) — the motif/novelty index form a series store keys
    // shards by. All inputs to the z expression are exact integer sums
    // (segment sum/count, series S/Sxx), so both engines branch the
    // breakpoint CASE on bit-identical doubles. The only windows run
    // per event type over CALENDAR-bounded frames (day rank within
    // type); the corpus prices one (type, day) aggregate.
    "q_sax" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint(true)
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val seg = daily
        .withColumn("i", (row_number().over(w) - 1).cast("long"))
        .join(broadcast(stats), "event_type")
        .withColumn("seg", expr("(i * 6) DIV n"))
        .groupBy("event_type", "seg")
        .agg(sum("x").as("segsum"), count(lit(1)).as("segn"),
          max("n").as("n"), max("sx").as("sx"), max("sxx").as("sxx"))
      val mu = col("sx").cast("double") / col("n").cast("double")
      val sigma = sqrt(col("sxx").cast("double") / col("n").cast("double")
        - mu * mu)
      val z = (col("segsum").cast("double") / col("segn").cast("double")
        - mu) / sigma
      val sym = when(z < -0.6745, "a").when(z < 0.0, "b")
        .when(z < 0.6745, "c").otherwise("d")
      seg.select(col("event_type"), col("seg"), sym.as("sym"), col("n"))
        .groupBy("event_type")
        .agg(max("n").as("n_days"),
          array_join(transform(
            array_sort(collect_list(struct(col("seg"), col("sym")))),
            e => e.getField("sym")), "").as("sax"))
        .orderBy("event_type")
    }),

    // ---- paired t-test on the same per-user half-month diffs as
    // q_wilcoxon — the parametric twin, so the two answer sheets are
    // directly comparable (when they disagree, the diffs aren't
    // normal): t = d̄ / (s_d/√n) with the sample variance from the
    // n·Σd² − (Σd)² identity — diffs are exact integers, so both
    // moments are BIGINT and t is one double expression.
    "q_paired_t" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      val d0 = ev.agg(min("day").as("d0"))
      val per = ev.crossJoin(broadcast(d0))
        .groupBy("user_id")
        .agg((sum(when(col("day") >= col("d0") + 15, 1L).otherwise(0L)) -
          sum(when(col("day") < col("d0") + 15, 1L).otherwise(0L)))
          .as("diff"))
      val agg = per.agg(count(lit(1)).as("n"), sum("diff").as("sd"),
        sum(col("diff") * col("diff")).as("sdd"))
      val n = col("n").cast("double")
      val sd = col("sd").cast("double")
      val sdd = col("sdd").cast("double")
      val varS = (n * sdd - sd * sd) / (n * (n - lit(1.0)))
      agg.select(col("n").as("n_pairs"),
        round(sd / n, 6).as("mean_diff"),
        round(when(col("n") <= 1 || varS <= 0.0, lit(null))
          .otherwise((sd / n) / sqrt(varS / n)), 6).as("t"))
    }),

    // ---- Cohen's d effect size between view-event and purchase-event
    // VALUES — the "is the difference big, not just significant"
    // companion to q_ab_test: d = (m₁ − m₂)/s_pooled, all moments from
    // exact integer cents (the q_mann_whitney quantization), pooled
    // variance from the two-sample sums in one fixed-order expression.
    "q_effect_size" -> ((s, d) => {
      val agg = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(round(col("value") * 100).cast("long").as("v"),
          (col("event_type") === "view").as("isA"))
        .agg(
          sum(when(col("isA"), 1L).otherwise(0L)).as("na"),
          sum(when(col("isA"), col("v")).otherwise(0L)).as("sa"),
          sum(when(col("isA"), col("v") * col("v")).otherwise(0L))
            .as("saa"),
          sum(when(!col("isA"), 1L).otherwise(0L)).as("nb"),
          sum(when(!col("isA"), col("v")).otherwise(0L)).as("sb"),
          sum(when(!col("isA"), col("v") * col("v")).otherwise(0L))
            .as("sbb"))
      val na = col("na").cast("double"); val nb = col("nb").cast("double")
      val sa = col("sa").cast("double"); val sb = col("sb").cast("double")
      val ssa = (col("saa").cast("double") - sa * sa / na)
      val ssb = (col("sbb").cast("double") - sb * sb / nb)
      val sp = sqrt((ssa + ssb) / (na + nb - lit(2.0)))
      agg.select(col("na"), col("nb"),
        round((sa / na - sb / nb) / 100.0, 4).as("mean_diff"),
        round(when(col("na") + col("nb") <= 2 || sp === 0.0, lit(null))
          .otherwise((sa / na - sb / nb) / sp), 6).as("cohens_d"))
    }),

    // ---- Wilcoxon signed-rank test: did per-user activity SHIFT from
    // the first half of the window to the second? Pairs are each
    // user's (first-15-days count, rest count) — exact integer diffs,
    // so the tie structure is identical across engines by construction.
    // q_mann_whitney's machinery applied to the paired form: zero
    // diffs drop (standard), |diff| ranks come from the two-phase
    // GlobalRank prefix over the (|d|, freq) pre-aggregate (bounded by
    // DISTINCT diffs, no corpus-growing window), average ranks ride in
    // half-units (2W⁺ = Σ(2·cumBefore + t + 1)·n_pos stays a BIGINT),
    // ties correct the normal approximation via Σ(t³−t)/48.
    "q_wilcoxon" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"))
      val d0 = ev.agg(min("day").as("d0"))
      val per = ev.crossJoin(broadcast(d0))
        .groupBy("user_id")
        .agg(sum(when(col("day") < col("d0") + 15, 1L).otherwise(0L))
            .as("n1"),
          sum(when(col("day") >= col("d0") + 15, 1L).otherwise(0L))
            .as("n2"))
        .select((col("n2") - col("n1")).as("diff"))
        .filter(col("diff") =!= 0)
      val freq = per
        .select(abs(col("diff")).as("ad"),
          when(col("diff") > 0, 1L).otherwise(0L).as("p"))
        .groupBy("ad").agg(count(lit(1)).as("t"), sum("p").as("npos"))
      val ranked = graft.operators.GlobalRank.withPrefixAggs(freq,
        Seq(col("ad")),
        Seq(graft.operators.GlobalRank.PrefixAgg("t", "cl")))
      val agg = ranked.agg(
        sum("t").as("m"),
        sum((lit(2L) * col("cl") + col("t") + 1L) * col("npos"))
          .as("tw2"),
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") -
          col("t")).as("ties"))
      val m = col("m").cast("double")
      val wPlus = col("tw2").cast("double") / 2.0
      val mu = m * (m + 1.0) / 4.0
      val v = m * (m + 1.0) * (lit(2.0) * m + 1.0) / 24.0 -
        col("ties").cast("double") / 48.0
      agg.select(col("m"), round(wPlus, 1).as("w_plus"),
        round(when(v <= 0.0, lit(null)).otherwise((wPlus - mu) / sqrt(v)),
          6).as("z"))
    })
  )

  /** SPRT constants (p0 = 0.2, p1 = 0.3, α = β = 0.05): per-trial
    * log-likelihood increments and the Wald boundary ln((1−β)/α) = ln 19
    * in pico-nat INTEGER units — shared verbatim between the Spark query,
    * its oracle SQL, and the streaming twin
    * (streaming.StreamOps.sprtMonitor) so all three sum identical
    * integers. */
  private[graft] val SprtUp = math.round(math.log(0.3 / 0.2) * 1e12)
  private[graft] val SprtDn = math.round(math.log(0.7 / 0.8) * 1e12)
  private[graft] val SprtBound = math.round(math.log(19.0) * 1e12)

  /** KM tail: the survival-product machinery over the (time_s, d, n_risk)
    * risk frame — factor rounds to micro-nats, integer cumulative sum,
    * exp back; d = n_risk (the final death time) pins S to exactly 0. */
  private def kmRisk(risk: DataFrame): DataFrame = {
    val withT = risk.withColumn("t_int",
      when(col("d") < col("n_risk"),
        round(log(lit(1.0) - col("d").cast("double") /
          col("n_risk").cast("double")) * 1e6).cast("long"))
        .otherwise(lit(0L)))
    // survival log-product = inclusive prefix sum of the micro-nat
    // factors over death times — same two-phase GlobalRank routing as
    // the at-risk suffix sums (death times grow with the corpus)
    graft.operators.GlobalRank.withPrefixAggs(withT,
        Seq(col("time_s")),
        Seq(graft.operators.GlobalRank.PrefixAgg("t_int", "cum",
          inclusive = true)))
      .select(col("time_s"), col("n_risk"), col("d").as("deaths"),
        when(col("d") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(col("cum").cast("double") / 1e6), 6))
          .as("surv"))
      .orderBy("time_s")
  }

  /** DuckDB twin of q_holt_winters. The recurrence carries the 7
    * seasonal slots as explicit columns through a recursive CTE (built
    * here so the slot-update CASEs aren't hand-copied 7×); the init
    * means are LEFT-ASSOCIATED adds, textually matching the Spark
    * fold's reduceLeft order so both engines produce identical IEEE
    * doubles. */
  private def holtWintersSql: String = {
    def xi(i: Int) = s"(SELECT x FROM ord WHERE i = $i)"
    def mean(lo: Int) =
      s"(${(lo + 1 to lo + 6).foldLeft(xi(lo))((a, i) => s"($a + ${xi(i)})")} / 7)"
    val m1 = mean(1)
    val m2 = mean(8)
    val sInit = (1 to 7).map(k => s"    ${xi(k)} - $m1 AS s$k").mkString(",\n")
    val sCols = (1 to 7).map(k => s"r.s$k").mkString(", ")
    val soldCase = "CASE (r.i % 7) + 1 " +
      (1 to 7).map(k => s"WHEN $k THEN r.s$k").mkString(" ") + " END"
    val sNext = (1 to 7).map(k =>
      s"    CASE WHEN t2.pos = $k THEN 0.4 * (t2.x - t2.lnew) + 0.6 * t2.sold " +
      s"ELSE t2.s$k END AS s$k").mkString(",\n")
    val fcCase = "CASE (nd % 7) + 1 " +
      (1 to 7).map(k => s"WHEN $k THEN s$k").mkString(" ") + " END"
    val sList = (1 to 7).map(k => s"s$k").mkString(", ")
    s"""WITH RECURSIVE d AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |    CAST(count(*) AS DOUBLE) AS x
       |  FROM events GROUP BY 1),
       |ord AS (SELECT day, x, row_number() OVER (ORDER BY day) AS i
       |        FROM d),
       |n AS (SELECT count(*) AS nd FROM ord),
       |rec AS (
       |  SELECT 7 AS i, $m1 AS l, ($m2 - $m1) / 7 AS b,
       |$sInit
       |  UNION ALL
       |  SELECT t2.i, t2.lnew AS l,
       |    0.2 * (t2.lnew - t2.l) + 0.8 * t2.b AS b,
       |$sNext
       |  FROM (
       |    SELECT t1.*, 0.3 * (t1.x - t1.sold) + 0.7 * (t1.l + t1.b) AS lnew
       |    FROM (
       |      SELECT r.i + 1 AS i, o.x, r.l, r.b, $sCols,
       |        (r.i % 7) + 1 AS pos, $soldCase AS sold
       |      FROM rec r JOIN ord o ON o.i = r.i + 1) t1) t2)
       |SELECT CAST(nd AS BIGINT) AS n_days,
       |  round(l, 4) AS level, round(b, 4) AS trend,
       |  round(l + b + $fcCase, 4) AS forecast_1d,
       |  round(greatest($sList) - least($sList), 4) AS season_range
       |FROM rec CROSS JOIN n WHERE i = nd""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_holt_winters" -> holtWintersSql,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |             epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(ts_us) AS t_click
        |      FROM e JOIN a ON a.user_id = e.user_id
        |      WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t_buy
        |      FROM e JOIN b ON b.user_id = e.user_id
        |      WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
        |SELECT 1 AS stage, 'view' AS step,
        |  CAST((SELECT count(*) FROM a) AS BIGINT) AS users
        |UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM b) AS BIGINT)
        |UNION ALL SELECT 3, 'purchase',
        |  CAST((SELECT count(*) FROM c) AS BIGINT)
        |ORDER BY stage""".stripMargin,
    "q_autocorr" -> {
      def lagArm(k: Int): String =
        s"""SELECT $k AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
           |  round(CAST(count(*) * sum(xa * xb) - sum(xa) * sum(xb)
           |      AS DOUBLE) /
           |    sqrt(CAST(count(*) * sum(xa * xa) - sum(xa) * sum(xa)
           |        AS DOUBLE) *
           |      CAST(count(*) * sum(xb * xb) - sum(xb) * sum(xb)
           |        AS DOUBLE)), 6) AS r
           |FROM (SELECT a.x AS xa, b.x AS xb FROM daily a
           |      JOIN daily b ON b.day = a.day + $k) t$k""".stripMargin
      s"""WITH daily AS (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1)
         |${(1 to 3).map(lagArm).mkString("\nUNION ALL\n")}
         |ORDER BY lag""".stripMargin
    },
    "q_rolling_active" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |days AS (SELECT DISTINCT day AS rday FROM pairs),
        |wau AS (
        |  SELECT d.rday, CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
        |  FROM days d JOIN pairs p ON p.day BETWEEN d.rday - 6 AND d.rday
        |  GROUP BY 1),
        |dau AS (SELECT day AS rday, CAST(count(DISTINCT user_id) AS BIGINT)
        |          AS dau FROM pairs GROUP BY 1)
        |SELECT dau.rday AS day, dau, wau,
        |  round(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
        |FROM dau JOIN wau ON wau.rday = dau.rday
        |ORDER BY day""".stripMargin,
    "q_rfm" -> {
      def quint(m: String): String =
        (1 to 4).map(i => s"CAST($m > ${m}_c[$i] AS INTEGER)")
          .mkString(" + ") + " + 1"
      s"""WITH cust AS (
         |  SELECT o_custkey,
         |    max(CAST(o_orderdate AS DATE)) AS cmax,
         |    CAST(count(*) AS BIGINT) AS freq,
         |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM orders GROUP BY 1),
         |g AS (SELECT max(cmax) AS maxd FROM cust),
         |r AS (SELECT o_custkey, CAST(maxd - cmax AS INTEGER) AS rec,
         |      freq, cents FROM cust, g),
         |cut AS (SELECT
         |    quantile_cont(CAST(rec AS DOUBLE), [0.2,0.4,0.6,0.8])
         |      AS rec_c,
         |    quantile_cont(CAST(freq AS DOUBLE), [0.2,0.4,0.6,0.8])
         |      AS freq_c,
         |    quantile_cont(CAST(cents AS DOUBLE), [0.2,0.4,0.6,0.8])
         |      AS cents_c
         |  FROM r),
         |sc AS (SELECT 6 - (${quint("rec")}) AS r_score,
         |    ${quint("freq")} AS f_score, ${quint("cents")} AS m_score,
         |    cents
         |  FROM r, cut)
         |SELECT r_score, f_score, m_score,
         |  CAST(count(*) AS BIGINT) AS n_cust,
         |  round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS tot_monetary
         |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },
    "q_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type,
        |             epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(ts_us) AS t_click
        |      FROM e JOIN a ON a.user_id = e.user_id
        |      WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t_buy
        |      FROM e JOIN b ON b.user_id = e.user_id
        |      WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1),
        |ab AS (SELECT t_click - t_view AS delta
        |       FROM b JOIN a ON a.user_id = b.user_id),
        |bc AS (SELECT t_buy - t_click AS delta
        |       FROM c JOIN b ON b.user_id = c.user_id)
        |SELECT '1_view_to_click' AS transition,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  round(quantile_cont(delta, 0.5), 1) AS p50_us,
        |  round(quantile_cont(delta, 0.9), 1) AS p90_us,
        |  CAST(max(delta) AS BIGINT) AS max_us FROM ab
        |UNION ALL
        |SELECT '2_click_to_buy', CAST(count(*) AS BIGINT),
        |  round(quantile_cont(delta, 0.5), 1),
        |  round(quantile_cont(delta, 0.9), 1),
        |  CAST(max(delta) AS BIGINT) FROM bc
        |ORDER BY transition""".stripMargin,
    "q_cohort" ->
      """WITH e AS (SELECT user_id,
        |             epoch_us(ts) // 86400000000 AS day FROM events),
        |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM e
        |            GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN cohorts ON cohorts.user_id = e.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part o
        |  WHERE o.p_retailprice < p.p_retailprice
        |    AND o.p_size > p.p_size)
        |ORDER BY p_partkey""".stripMargin,
    "q_ab_test" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM (SELECT event_type,
        |          CAST(round(value * 100) AS BIGINT) AS c
        |        FROM events WHERE event_type IN ('view', 'purchase')) t
        |  GROUP BY 1),
        |a AS (SELECT n AS n1, s1 AS a1, s2 AS a2 FROM g
        |      WHERE event_type = 'view'),
        |b AS (SELECT n AS n2, s1 AS b1, s2 AS b2 FROM g
        |      WHERE event_type = 'purchase')
        |SELECT n1, n2,
        |  round(CAST(a1 AS DOUBLE) / n1 / 100, 4) AS mean_a,
        |  round(CAST(b1 AS DOUBLE) / n2 / 100, 4) AS mean_b,
        |  round((CAST(a1 AS DOUBLE) / n1 - CAST(b1 AS DOUBLE) / n2) /
        |    sqrt(((CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n1)
        |            / (n1 - 1)) / n1 +
        |         ((CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE) * b1 / n2)
        |            / (n2 - 1)) / n2), 4) AS t_stat
        |FROM a CROSS JOIN b""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |rep AS (
        |  SELECT b, c,
        |    CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR) || '_'
        |      || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS u
        |  FROM base, generate_series(0, 31) g(b)),
        |w AS (
        |  SELECT b, c, CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
        |    WHEN u < 920 THEN 2 WHEN u < 981 THEN 3 ELSE 4 END AS w
        |  FROM rep),
        |means AS (
        |  SELECT b, CAST(CAST(sum(w * c) AS BIGINT) AS DOUBLE)
        |    / CAST(sum(w) AS BIGINT) AS m
        |  FROM w GROUP BY 1),
        |picked AS (
        |  SELECT m,
        |    row_number() OVER (ORDER BY m ASC, b ASC) AS ra,
        |    row_number() OVER (ORDER BY m DESC, b DESC) AS rd
        |  FROM means),
        |bounds AS (
        |  SELECT max(CASE WHEN ra = 2 THEN m END) AS lo_m,
        |    max(CASE WHEN rd = 2 THEN m END) AS hi_m
        |  FROM picked),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(c) AS BIGINT) AS s FROM base)
        |SELECT n, round(CAST(s AS DOUBLE) / n / 100, 4) AS mean_v,
        |  round(lo_m / 100, 4) AS ci_lo, round(hi_m / 100, 4) AS ci_hi
        |FROM tot CROSS JOIN bounds""".stripMargin,
    "q_ks_test" ->
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS s1,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s2
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |byval AS (
        |  SELECT v, CAST(sum(s1) AS BIGINT) AS a1,
        |    CAST(sum(s2) AS BIGINT) AS a2
        |  FROM e GROUP BY 1),
        |run AS (
        |  SELECT v,
        |    sum(a1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
        |    sum(a2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
        |  FROM byval),
        |tot AS (SELECT CAST(sum(s1) AS BIGINT) AS n1,
        |          CAST(sum(s2) AS BIGINT) AS n2 FROM e)
        |SELECT n1, n2,
        |  round(CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
        |    / (n1 * n2), 6) AS ks_d
        |FROM run CROSS JOIN tot GROUP BY 1, 2""".stripMargin,
    "q_psi" ->
      """WITH e AS (
        |  SELECT value,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS s1,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s2
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |mm AS (SELECT min(value) AS lo, max(value) AS hi,
        |         CAST(sum(s1) AS BIGINT) AS n1,
        |         CAST(sum(s2) AS BIGINT) AS n2 FROM e),
        |b AS (
        |  SELECT least(9, CAST(floor((value - lo) / (hi - lo) * 10)
        |    AS BIGINT)) AS bin, s1, s2, n1, n2
        |  FROM e CROSS JOIN mm),
        |g AS (SELECT bin, n1, n2, CAST(sum(s1) AS BIGINT) AS b1,
        |        CAST(sum(s2) AS BIGINT) AS b2
        |      FROM b GROUP BY 1, 2, 3),
        |t AS (
        |  SELECT CAST(round((
        |    ((CAST(b1 AS DOUBLE) + 0.5) / (CAST(n1 AS DOUBLE) + 5.0)) -
        |    ((CAST(b2 AS DOUBLE) + 0.5) / (CAST(n2 AS DOUBLE) + 5.0))) *
        |    ln(((CAST(b1 AS DOUBLE) + 0.5) / (CAST(n1 AS DOUBLE) + 5.0)) /
        |       ((CAST(b2 AS DOUBLE) + 0.5) / (CAST(n2 AS DOUBLE) + 5.0)))
        |    * 1e12) AS BIGINT) AS t
        |  FROM g)
        |SELECT round(sum(t) / 1e12, 6) AS psi FROM t""".stripMargin,
    "q_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
        |  FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
        |      FROM items),
        |cu AS (SELECT item, CAST(count(*) AS BIGINT) AS c
        |       FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT a.item AS u, b.item AS v, CAST(count(*) AS BIGINT)
        |      AS n_both
        |  FROM items a JOIN items b
        |    ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.u AS u_part, p.v AS v_part, n_both,
        |  round(CAST(n_both AS DOUBLE) / CAST(n_baskets AS DOUBLE), 6)
        |    AS support,
        |  round(CAST(n_both AS DOUBLE) / CAST(cu.c AS DOUBLE), 6)
        |    AS conf_uv,
        |  round(CAST(n_both AS DOUBLE) / CAST(cv.c AS DOUBLE), 6)
        |    AS conf_vu,
        |  round((CAST(n_both AS DOUBLE) * CAST(n_baskets AS DOUBLE)) /
        |    (CAST(cu.c AS DOUBLE) * CAST(cv.c AS DOUBLE)), 6) AS lift
        |FROM pairs p
        |JOIN cu ON cu.item = p.u
        |JOIN cu cv ON cv.item = p.v
        |CROSS JOIN n
        |ORDER BY u_part, v_part""".stripMargin,
    "q_kaplan_meier" ->
      """WITH s AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t0,
        |    min(CASE WHEN event_type = 'purchase'
        |          AND round(value * 100) >= 9900
        |        THEN epoch_us(ts) END) AS tp,
        |    max(epoch_us(ts)) AS tl
        |  FROM events GROUP BY 1),
        |u AS (SELECT (coalesce(tp, tl) - t0) // 1000000 AS time_s,
        |        CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
        |      FROM s),
        |byt AS (SELECT time_s, CAST(count(*) AS BIGINT) AS m,
        |          CAST(sum(obs) AS BIGINT) AS d
        |        FROM u GROUP BY 1),
        |risk AS (
        |  SELECT time_s, d, CAST(sum(m) OVER (ORDER BY time_s DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_risk
        |  FROM byt),
        |dd AS (
        |  SELECT time_s, n_risk, d,
        |    CASE WHEN d < n_risk THEN
        |      CAST(round(ln(1 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |        * 1e6) AS BIGINT)
        |    ELSE 0 END AS t_int
        |  FROM risk WHERE d > 0),
        |cm AS (SELECT time_s, n_risk, d,
        |         sum(t_int) OVER (ORDER BY time_s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |       FROM dd)
        |SELECT time_s, n_risk, d AS deaths,
        |  CASE WHEN d = n_risk THEN CAST(0 AS DOUBLE)
        |  ELSE round(exp(CAST(cum AS DOUBLE) / 1e6), 6) END AS surv
        |FROM cm ORDER BY time_s""".stripMargin,
    "q_dbscan_core" ->
      """WITH p AS (
        |  SELECT event_id AS pid, value AS x,
        |    CAST(event_id % 100 AS DOUBLE) AS y
        |  FROM events WHERE event_id <= 4000),
        |nb AS (
        |  SELECT a.pid, CAST(count(*) AS BIGINT) AS n_nb
        |  FROM p a JOIN p b
        |    ON floor(b.x / 5.0) BETWEEN floor(a.x / 5.0) - 1
        |         AND floor(a.x / 5.0) + 1
        |   AND floor(b.y / 5.0) BETWEEN floor(a.y / 5.0) - 1
        |         AND floor(a.y / 5.0) + 1
        |   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        |         <= 25.0
        |  GROUP BY 1)
        |SELECT pid, n_nb, CAST(n_nb >= 10 AS INTEGER) AS is_core
        |FROM nb ORDER BY pid""".stripMargin,
    "q_benford" ->
      """WITH dig AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
        |      AS digit
        |  FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |        FROM orders) c
        |  WHERE cents > 0),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
        |      FROM dig GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g),
        |x AS (SELECT digit, n, tot,
        |        ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) /
        |          ln(CAST(10 AS DOUBLE)) AS exp_p
        |      FROM g CROSS JOIN t)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS obs_p,
        |  round(exp_p, 6) AS exp_p,
        |  round((CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * exp_p) *
        |    (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * exp_p) /
        |    (CAST(tot AS DOUBLE) * exp_p), 6) AS chi2_term
        |FROM x ORDER BY digit""".stripMargin,
    "q_groupreg" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM e GROUP BY 1),
        |f AS (
        |  SELECT event_type, n,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary,
        |    CAST(sx AS DOUBLE) AS dsx, CAST(sy AS DOUBLE) AS dsy,
        |    CAST(n AS DOUBLE) AS dn
        |  FROM m)
        |SELECT event_type, n,
        |  round(CASE WHEN varx = 0 THEN NULL
        |    ELSE covn / varx / 100.0 END, 6) AS slope,
        |  round(CASE WHEN varx = 0 THEN NULL
        |    ELSE (dsy - (covn / varx) * dsx) / dn / 100.0 END, 6)
        |    AS intercept,
        |  round(CASE WHEN varx * vary = 0 THEN NULL
        |    ELSE covn * covn / (varx * vary) END, 6) AS r2
        |FROM f ORDER BY event_type""".stripMargin,
    "q_pareto" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT cust.o_custkey, cents, n.n_regionkey AS rk
        |  FROM cust
        |  JOIN customer c ON c.c_custkey = cust.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey),
        |rankd AS (
        |  SELECT rk,
        |    CAST(row_number() OVER (PARTITION BY rk
        |      ORDER BY cents DESC, o_custkey) AS BIGINT) AS rnk,
        |    CAST(sum(cents) OVER (PARTITION BY rk
        |      ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(sum(cents) OVER (PARTITION BY rk) AS BIGINT) AS tot
        |  FROM j),
        |k AS (SELECT rk, min(rnk) AS k80 FROM rankd
        |      WHERE cum * 5 >= tot * 4 GROUP BY 1),
        |cnt AS (SELECT rk, CAST(count(*) AS BIGINT) AS n_cust
        |        FROM rankd GROUP BY 1)
        |SELECT r.r_name, n_cust, k80,
        |  round(CAST(k80 AS DOUBLE) / CAST(n_cust AS DOUBLE), 6)
        |    AS k80_share
        |FROM k JOIN cnt ON cnt.rk = k.rk
        |JOIN region r ON r.r_regionkey = k.rk
        |ORDER BY r_name""".stripMargin,
    "q_mann_whitney" ->
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |g AS (SELECT v, CAST(sum(a) AS BIGINT) AS fa,
        |        CAST(sum(b) AS BIGINT) AS fb,
        |        CAST(sum(a) + sum(b) AS BIGINT) AS f
        |      FROM e GROUP BY 1),
        |r AS (
        |  SELECT fa, fb, f,
        |    CAST(coalesce(sum(f) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb
        |  FROM g),
        |agg AS (
        |  SELECT CAST(sum(fa) AS BIGINT) AS na,
        |    CAST(sum(fb) AS BIGINT) AS nb,
        |    CAST(sum(fa * (2 * cb + f + 1)) AS BIGINT) AS ra2,
        |    sum(CAST(f AS HUGEINT) * f * f - f) AS ties
        |  FROM r),
        |ff AS (
        |  SELECT na, nb, CAST(na AS DOUBLE) AS nad,
        |    CAST(nb AS DOUBLE) AS nbd,
        |    CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) AS nnd,
        |    CAST(ra2 AS DOUBLE) - CAST(na AS DOUBLE) *
        |      (CAST(na AS DOUBLE) + 1.0) AS u2,
        |    CAST(ties AS DOUBLE) AS tiesd
        |  FROM agg)
        |SELECT na, nb, round(u2 / 2.0, 2) AS u_a,
        |  round(CASE WHEN sqrt((nad * nbd / 12.0) *
        |      ((nnd + 1.0) - tiesd / (nnd * (nnd - 1.0)))) = 0 THEN NULL
        |    ELSE (u2 - nad * nbd) / (2.0 * sqrt((nad * nbd / 12.0) *
        |      ((nnd + 1.0) - tiesd / (nnd * (nnd - 1.0))))) END, 6) AS z
        |FROM ff""".stripMargin,
    "q_window_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |             epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |b AS (SELECT e.user_id, min(ts_us) AS t_click
        |      FROM e JOIN a ON a.user_id = e.user_id
        |      WHERE event_type = 'click' AND ts_us > t_view
        |        AND ts_us <= t_view + 86400000000 GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t_buy
        |      FROM e JOIN b ON b.user_id = e.user_id
        |      WHERE event_type = 'purchase' AND ts_us > t_click
        |        AND ts_us <= t_click + 86400000000 GROUP BY 1)
        |SELECT 1 AS stage, 'view' AS step,
        |  CAST((SELECT count(*) FROM a) AS BIGINT) AS users
        |UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM b) AS BIGINT)
        |UNION ALL SELECT 3, 'purchase',
        |  CAST((SELECT count(*) FROM c) AS BIGINT)
        |ORDER BY stage""".stripMargin,
    "q_new_returning" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS fday FROM pairs GROUP BY 1)
        |SELECT day,
        |  CAST(sum(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  CAST(sum(CASE WHEN day <> fday THEN 1 ELSE 0 END) AS BIGINT)
        |    AS returning_users
        |FROM pairs JOIN f USING (user_id)
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q_incremental_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |    / 100, 2) AS total,
        |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / 100, 6) AS mean
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_topk_movers" ->
      """WITH rev AS (
        |  SELECT l_partkey, CAST(o_orderdate AS DATE) AS od,
        |    CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |mm AS (SELECT min(od) AS lo, max(od) AS hi FROM rev),
        |h AS (SELECT l_partkey, cents,
        |        od > lo + CAST((hi - lo) // 2 AS INTEGER) AS h2
        |      FROM rev CROSS JOIN mm),
        |g AS (
        |  SELECT l_partkey,
        |    CAST(sum(CASE WHEN NOT h2 THEN cents ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN h2 THEN cents ELSE 0 END) AS BIGINT) AS c2
        |  FROM h GROUP BY 1)
        |SELECT l_partkey,
        |  round(CAST(c1 AS DOUBLE) / 100, 2) AS rev_h1,
        |  round(CAST(c2 AS DOUBLE) / 100, 2) AS rev_h2,
        |  round(CAST(c2 - c1 AS DOUBLE) / 100, 2) AS delta
        |FROM g ORDER BY abs(c2 - c1) DESC, l_partkey
        |LIMIT 20""".stripMargin,
    "q_hhi" ->
      """WITH sup AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) *
        |      100) AS BIGINT)) AS BIGINT) AS sc
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT sc, n.n_regionkey AS rk
        |  FROM sup
        |  JOIN supplier s ON s.s_suppkey = sup.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey),
        |g AS (
        |  SELECT rk, CAST(count(*) AS BIGINT) AS n_sup,
        |    sum(CAST(sc AS HUGEINT) * sc) AS s2,
        |    CAST(sum(sc) AS BIGINT) AS t
        |  FROM j GROUP BY 1)
        |SELECT r.r_name, n_sup,
        |  round(CAST(s2 AS DOUBLE) /
        |    (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS hhi,
        |  round(CASE WHEN n_sup = 1 THEN NULL
        |    ELSE (CAST(s2 AS DOUBLE) /
        |      (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) -
        |      1.0 / CAST(n_sup AS DOUBLE)) /
        |      (1.0 - 1.0 / CAST(n_sup AS DOUBLE)) END, 6) AS hhi_norm
        |FROM g JOIN region r ON r.r_regionkey = g.rk
        |ORDER BY r_name""".stripMargin,
    "q_cuped" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |c AS (SELECT min(day) + 15 AS cut FROM e),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN day < cut THEN cents ELSE 0 END)
        |      AS BIGINT) AS pre,
        |    CAST(sum(CASE WHEN day >= cut THEN cents ELSE 0 END)
        |      AS BIGINT) AS post
        |  FROM e CROSS JOIN c GROUP BY 1),
        |a AS (
        |  SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(pre) AS BIGINT) AS sp,
        |    CAST(sum(post) AS BIGINT) AS so,
        |    CAST(sum(pre * pre) AS BIGINT) AS spp,
        |    CAST(sum(pre * post) AS BIGINT) AS spo,
        |    CAST(sum(post * post) AS BIGINT) AS soo
        |  FROM u GROUP BY 1),
        |p AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS pn,
        |    CAST(sum(sp) AS BIGINT) AS psp,
        |    CAST(sum(so) AS BIGINT) AS pso,
        |    CAST(sum(spp) AS BIGINT) AS pspp,
        |    CAST(sum(spo) AS BIGINT) AS pspo,
        |    CAST(sum(soo) AS BIGINT) AS psoo
        |  FROM a),
        |f AS (
        |  SELECT arm, n, sp, so,
        |    CAST(n AS DOUBLE) AS nd, CAST(sp AS DOUBLE) AS spd,
        |    CAST(so AS DOUBLE) AS sod,
        |    CAST(pn AS DOUBLE) AS pnd, CAST(psp AS DOUBLE) AS pspd,
        |    CAST(pn AS DOUBLE) * CAST(pspo AS DOUBLE) -
        |      CAST(psp AS DOUBLE) * CAST(pso AS DOUBLE) AS covp,
        |    CAST(pn AS DOUBLE) * CAST(pspp AS DOUBLE) -
        |      CAST(psp AS DOUBLE) * CAST(psp AS DOUBLE) AS varp,
        |    CAST(pn AS DOUBLE) * CAST(psoo AS DOUBLE) -
        |      CAST(pso AS DOUBLE) * CAST(pso AS DOUBLE) AS varo
        |  FROM a CROSS JOIN p)
        |SELECT arm, n,
        |  round(sod / nd / 100.0, 6) AS mean_post,
        |  round((sod / nd - (covp / varp) *
        |    (spd / nd - pspd / pnd)) / 100.0, 6) AS mean_adj,
        |  round(covp / varp, 6) AS theta,
        |  round(1.0 - (varo - 2.0 * (covp / varp) * covp +
        |    (covp / varp) * (covp / varp) * varp) / varo, 6)
        |    AS var_reduction
        |FROM f ORDER BY arm""".stripMargin,
    "q_srm" ->
      """WITH arms AS (
        |  SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT DISTINCT user_id FROM events) u GROUP BY 1)
        |SELECT
        |  CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n_b,
        |  round((CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) -
        |      sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS DOUBLE) *
        |    CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) -
        |      sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS DOUBLE)) /
        |    CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) +
        |      sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS DOUBLE), 6)
        |    AS chi2
        |FROM arms""".stripMargin,
    "q_lorenz" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |cuts AS (SELECT quantile_cont(CAST(cents AS DOUBLE),
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs FROM cust),
        |dec AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(cents) AS BIGINT) AS dc
        |  FROM (
        |    SELECT cents, CAST(1 + len(list_filter(cs,
        |      x -> CAST(cents AS DOUBLE) > x)) AS INTEGER) AS decile
        |    FROM cust CROSS JOIN cuts) b
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(dc) AS BIGINT) AS tc FROM dec)
        |SELECT decile, n_cust,
        |  round(CAST(dc AS DOUBLE) / 100, 2) AS revenue,
        |  round(CAST(dc AS DOUBLE) / CAST(tc AS DOUBLE), 6) AS share,
        |  round(CAST(sum(dc) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
        |    CAST(tc AS DOUBLE), 6) AS cum_share
        |FROM dec CROSS JOIN tot ORDER BY decile""".stripMargin,
    "q_growth_acct" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS fday FROM pairs GROUP BY 1),
        |prev AS (SELECT user_id, day + 1 AS day, 1 AS was_active
        |         FROM pairs),
        |today AS (
        |  SELECT p.day,
        |    CAST(sum(CASE WHEN p.day = fday THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new_users,
        |    CAST(sum(CASE WHEN p.day <> fday AND was_active IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS retained,
        |    CAST(sum(CASE WHEN p.day <> fday AND was_active IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        |  FROM pairs p
        |  JOIN f ON f.user_id = p.user_id
        |  LEFT JOIN prev ON prev.user_id = p.user_id AND prev.day = p.day
        |  GROUP BY 1),
        |churn AS (
        |  SELECT prev.day,
        |    CAST(sum(CASE WHEN p.user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS churned
        |  FROM prev LEFT JOIN pairs p
        |    ON p.user_id = prev.user_id AND p.day = prev.day
        |  GROUP BY 1)
        |SELECT t.day, new_users, retained, resurrected,
        |  coalesce(churned, 0) AS churned
        |FROM today t LEFT JOIN churn ON churn.day = t.day
        |ORDER BY t.day""".stripMargin,
    "q_tail_index" ->
      """WITH top AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders ORDER BY cents DESC LIMIT 201),
        |thr AS (SELECT min(cents) AS xk FROM top),
        |t AS (
        |  SELECT xk,
        |    CAST(round(ln(CAST(cents AS DOUBLE) / xk) * 1e12) AS BIGINT)
        |      AS t
        |  FROM top CROSS JOIN thr)
        |SELECT CAST(200 AS BIGINT) AS k,
        |  round(CAST(min(xk) AS DOUBLE) / 100, 2) AS x_threshold,
        |  round(200e12 / CAST(sum(t) AS DOUBLE), 6) AS hill_alpha
        |FROM t""".stripMargin,
    "q_sprt" ->
      s"""WITH e AS (
         |  SELECT epoch_us(ts) AS ts_us, event_id,
         |    CASE WHEN event_type = 'purchase' THEN $SprtUp
         |         ELSE $SprtDn END AS inc
         |  FROM events WHERE event_type IN ('view', 'purchase')),
         |c AS (
         |  SELECT inc,
         |    sum(inc) OVER (ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr,
         |    row_number() OVER (ORDER BY ts_us, event_id) AS trial
         |  FROM e),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_trials,
         |    min(CASE WHEN llr >= $SprtBound THEN trial END) AS up_cross,
         |    min(CASE WHEN llr <= -$SprtBound THEN trial END) AS down_cross,
         |    round(CAST(sum(inc) AS DOUBLE) / 1e12, 6) AS llr_final
         |  FROM c)
         |SELECT n_trials, up_cross, down_cross,
         |  CASE WHEN up_cross IS NOT NULL AND
         |    (down_cross IS NULL OR up_cross < down_cross) THEN 'accept_h1'
         |       WHEN down_cross IS NOT NULL THEN 'accept_h0'
         |       ELSE 'continue' END AS decision,
         |  llr_final
         |FROM agg""".stripMargin,
    "q_holt" ->
      """WITH RECURSIVE d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1),
        |ord AS (SELECT day, x, row_number() OVER (ORDER BY day) AS i
        |        FROM d),
        |n AS (SELECT count(*) AS nd FROM ord),
        |rec AS (
        |  SELECT 1 AS i, (SELECT x FROM ord WHERE i = 1) AS l,
        |    (SELECT x FROM ord WHERE i = 2) -
        |      (SELECT x FROM ord WHERE i = 1) AS b
        |  UNION ALL
        |  SELECT r.i + 1,
        |    0.5 * o.x + 0.5 * (r.l + r.b),
        |    0.3 * ((0.5 * o.x + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
        |  FROM rec r JOIN ord o ON o.i = r.i + 1)
        |SELECT CAST(nd AS BIGINT) AS n_days,
        |  round(l, 4) AS level, round(b, 4) AS trend,
        |  round(l + 7 * b, 4) AS forecast_7d
        |FROM rec CROSS JOIN n WHERE i = nd""".stripMargin,
    "q_mk_trend" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT CAST(sum(sign(CAST(b.x - a.x AS DOUBLE))) AS BIGINT)
        |      AS s_stat,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM daily a JOIN daily b ON b.day > a.day),
        |t AS (
        |  SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily
        |        GROUP BY x) q),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
        |SELECT n_days, n_pairs, s_stat,
        |  round((CAST(s_stat AS DOUBLE) - sign(CAST(s_stat AS DOUBLE))) /
        |    sqrt((CAST(n_days AS DOUBLE) * (n_days - 1) *
        |      (2 * n_days + 5) -
        |      CAST(coalesce(tie_adj, 0) AS DOUBLE)) / 18.0), 6) AS z
        |FROM p CROSS JOIN n CROSS JOIN t""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |slopes AS (
        |  SELECT round(CAST(b.x - a.x AS DOUBLE) / (b.day - a.day), 6)
        |    AS m
        |  FROM daily a JOIN daily b ON b.day > a.day),
        |med AS (SELECT quantile_cont(m, 0.5) AS med,
        |        CAST(count(*) AS BIGINT) AS n_pairs FROM slopes),
        |ic AS (
        |  SELECT quantile_cont(c, 0.5) AS icept FROM (
        |    SELECT round(x - med * day, 6) AS c
        |    FROM daily CROSS JOIN med) q)
        |SELECT n_pairs, round(med, 6) AS slope,
        |  round(icept, 6) AS intercept
        |FROM med CROSS JOIN ic""".stripMargin,
    "q_paired_t" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |d0 AS (SELECT min(day) AS d0 FROM ev),
        |per AS (
        |  SELECT CAST(sum(CASE WHEN day >= d0.d0 + 15 THEN 1 ELSE 0 END)
        |      AS BIGINT) -
        |    CAST(sum(CASE WHEN day < d0.d0 + 15 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS diff
        |  FROM ev CROSS JOIN d0 GROUP BY user_id),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(diff) AS BIGINT) AS sd,
        |  CAST(sum(diff * diff) AS BIGINT) AS sdd FROM per),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sd AS DOUBLE)
        |  AS sdv, CAST(sdd AS DOUBLE) AS sddv FROM a)
        |SELECT n AS n_pairs, round(sdv / nd, 6) AS mean_diff,
        |  round(CASE WHEN n <= 1 OR
        |      (nd * sddv - sdv * sdv) / (nd * (nd - 1.0)) <= 0.0 THEN NULL
        |    ELSE (sdv / nd) /
        |      sqrt(((nd * sddv - sdv * sdv) / (nd * (nd - 1.0))) / nd)
        |    END, 6) AS t
        |FROM f""".stripMargin,
    "q_effect_size" ->
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    event_type = 'view' AS isa
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |  CAST(sum(CASE WHEN isa THEN v ELSE 0 END) AS BIGINT) AS sa,
        |  CAST(sum(CASE WHEN isa THEN v * v ELSE 0 END) AS BIGINT) AS saa,
        |  CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |  CAST(sum(CASE WHEN NOT isa THEN v ELSE 0 END) AS BIGINT) AS sb,
        |  CAST(sum(CASE WHEN NOT isa THEN v * v ELSE 0 END) AS BIGINT)
        |    AS sbb
        |  FROM e),
        |f AS (SELECT na, nb, CAST(na AS DOUBLE) AS nad,
        |  CAST(nb AS DOUBLE) AS nbd, CAST(sa AS DOUBLE) AS sad,
        |  CAST(sb AS DOUBLE) AS sbd, CAST(saa AS DOUBLE) AS saad,
        |  CAST(sbb AS DOUBLE) AS sbbd FROM a)
        |SELECT na, nb,
        |  round((sad / nad - sbd / nbd) / 100.0, 4) AS mean_diff,
        |  round(CASE WHEN na + nb <= 2 OR
        |      sqrt(((saad - sad * sad / nad) + (sbbd - sbd * sbd / nbd))
        |        / (nad + nbd - 2.0)) = 0.0 THEN NULL
        |    ELSE (sad / nad - sbd / nbd) /
        |      sqrt(((saad - sad * sad / nad) + (sbbd - sbd * sbd / nbd))
        |        / (nad + nbd - 2.0)) END, 6) AS cohens_d
        |FROM f""".stripMargin,
    "q_stl_strength" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day, x,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(sum(x) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
        |      AS wsum,
        |    CAST(count(*) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
        |      AS wcnt
        |  FROM daily),
        |det AS (
        |  SELECT (i - 1) % 7 AS slot,
        |    CAST(round((CAST(x AS DOUBLE) - CAST(wsum AS DOUBLE) / 7.0)
        |      * 1e6) AS BIGINT) AS dm
        |  FROM w WHERE wcnt = 7),
        |seas AS (SELECT slot,
        |  CAST(round(CAST(sum(dm) AS DOUBLE) / count(*)) AS BIGINT) AS sm
        |  FROM det GROUP BY 1),
        |r AS (SELECT dm, dm - sm AS rm FROM det JOIN seas USING (slot)),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(dm) AS HUGEINT) AS sd,
        |  sum(CAST(dm AS HUGEINT) * dm) AS sdd,
        |  CAST(sum(rm) AS HUGEINT) AS sr,
        |  sum(CAST(rm AS HUGEINT) * rm) AS srr FROM r)
        |SELECT n AS n_days_used,
        |  round(greatest(0.0, 1.0 -
        |    CAST(n * srr - sr * sr AS DOUBLE) /
        |    CAST(n * sdd - sd * sd AS DOUBLE)), 6) AS seasonal_strength
        |FROM agg""".stripMargin,
    "q_power" ->
      """WITH a AS (
        |  SELECT CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nv,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np
        |  FROM events),
        |p AS (SELECT CAST(np AS DOUBLE) / CAST(nv + np AS DOUBLE) AS p1
        |      FROM a),
        |q AS (SELECT p1, p1 * 0.9 AS p2, (p1 + p1 * 0.9) / 2.0 AS pbar,
        |        p1 * 0.1 AS delta FROM p),
        |z AS (SELECT p1, p2, delta,
        |  1.959964 * sqrt(2.0 * pbar * (1.0 - pbar)) +
        |    0.841621 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS zz
        |  FROM q)
        |SELECT round(p1, 6) AS p_base, round(p2, 6) AS p_target,
        |  CAST(ceil(zz * zz / (delta * delta)) AS BIGINT) AS n_per_arm,
        |  CAST(ceil(zz * zz / (delta * delta)) AS BIGINT) * 2 AS n_total
        |FROM z""".stripMargin,
    "q_forecast_error" ->
      """WITH RECURSIVE d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS DOUBLE) AS x
        |  FROM events GROUP BY 1),
        |ord AS (SELECT day, x,
        |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM d),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM ord),
        |t AS (SELECT nd, nd - 7 AS tn FROM n WHERE nd >= 10),
        |rec AS (
        |  SELECT 1 AS i, (SELECT x FROM ord WHERE i = 1) AS l,
        |    (SELECT x FROM ord WHERE i = 2) -
        |      (SELECT x FROM ord WHERE i = 1) AS b
        |  UNION ALL
        |  SELECT r.i + 1,
        |    0.5 * o.x + 0.5 * (r.l + r.b),
        |    0.3 * ((0.5 * o.x + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b
        |  FROM rec r JOIN ord o ON o.i = r.i + 1 CROSS JOIN t
        |  WHERE r.i + 1 <= t.tn),
        |fit AS (SELECT l, b FROM rec CROSS JOIN t WHERE i = tn),
        |err AS (
        |  SELECT o.x AS actual,
        |    f.l + CAST(o.i - t.tn AS DOUBLE) * f.b AS pred
        |  FROM ord o CROSS JOIN t CROSS JOIN fit f WHERE o.i > t.tn)
        |SELECT CAST(count(*) AS BIGINT) AS n_holdout,
        |  round(sum(CAST(round(abs(actual - pred) * 1e6) AS BIGINT))
        |    / 1e6 / count(*), 4) AS mae,
        |  round(sum(CAST(round((actual - pred) * 1e6) AS BIGINT))
        |    / 1e6 / count(*), 4) AS bias,
        |  round(sum(CAST(round(abs(actual - pred) / actual * 1e6)
        |    AS BIGINT)) / 1e6 / count(*) * 100.0, 4) AS mape_pct
        |FROM err""".stripMargin,
    "q_kruskal" ->
      """WITH gv AS MATERIALIZED (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS f
        |  FROM events GROUP BY 1, 2),
        |vt AS (SELECT v, CAST(sum(f) AS BIGINT) AS t FROM gv GROUP BY 1),
        |ranked AS (
        |  SELECT *, CAST(coalesce(sum(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cl
        |  FROM vt),
        |bg AS (
        |  SELECT g, CAST(sum(f) AS BIGINT) AS ng,
        |    CAST(sum((2 * cl + t + 1) * f) AS BIGINT) AS tw2
        |  FROM gv JOIN ranked USING (v) GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    sum(CAST(round((CAST(tw2 AS DOUBLE) / 2.0) *
        |      (CAST(tw2 AS DOUBLE) / 2.0) / CAST(ng AS DOUBLE) * 1e3)
        |      AS HUGEINT)) AS s3
        |  FROM bg),
        |tie AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS ties FROM ranked),
        |hh AS (
        |  SELECT n, k, ties,
        |    12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) *
        |      (CAST(s3 AS DOUBLE) / 1e3) -
        |      3.0 * (CAST(n AS DOUBLE) + 1.0) AS h
        |  FROM agg CROSS JOIN tie)
        |SELECT n, k AS n_groups, round(h, 6) AS h,
        |  round(h / (1.0 - CAST(ties AS DOUBLE) /
        |    CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE)), 6) AS h_corr
        |FROM hh""".stripMargin,
    "q_ctr_smoothing" ->
      """WITH per AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |  GROUP BY 1 HAVING sum(CASE WHEN event_type = 'view' THEN 1
        |    ELSE 0 END) >= 1),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(rm) AS BIGINT) AS s1,
        |    CAST(sum(rm * rm) AS BIGINT) AS s2
        |  FROM (SELECT CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
        |          * 1e6) AS BIGINT) AS rm FROM per)),
        |mv AS (
        |  SELECT
        |    CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) / 1e6 AS m,
        |    CAST(s2 AS DOUBLE) / CAST(k AS DOUBLE) / 1e12 -
        |      (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) / 1e6) *
        |      (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) / 1e6) AS v
        |  FROM mom),
        |prior AS (
        |  SELECT
        |    CASE WHEN v > 0.0 AND m * (1.0 - m) / v - 1.0 > 0.0
        |      THEN m * (m * (1.0 - m) / v - 1.0) ELSE m * 20.0 END
        |      AS alpha,
        |    CASE WHEN v > 0.0 AND m * (1.0 - m) / v - 1.0 > 0.0
        |      THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0)
        |      ELSE (1.0 - m) * 20.0 END AS beta
        |  FROM mv)
        |SELECT user_id, x, n,
        |  round((CAST(x AS DOUBLE) + alpha) /
        |    (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate
        |FROM per CROSS JOIN prior ORDER BY user_id""".stripMargin,
    "q_cusum" ->
      """WITH RECURSIVE d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |ord AS (SELECT day, x,
        |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM d),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |  CAST(sum(x) AS BIGINT) AS sx FROM ord),
        |rec AS (
        |  SELECT o.i,
        |    greatest(CAST(0 AS BIGINT), 2*t.nd*o.x - 3*t.sx) AS s,
        |    greatest(CAST(0 AS BIGINT), 2*t.nd*o.x - 3*t.sx) AS mx,
        |    CASE WHEN greatest(CAST(0 AS BIGINT), 2*t.nd*o.x - 3*t.sx)
        |        > 8*t.sx THEN o.day ELSE CAST(-1 AS BIGINT) END AS cr
        |  FROM ord o CROSS JOIN t WHERE o.i = 1
        |  UNION ALL
        |  SELECT r.i + 1,
        |    greatest(CAST(0 AS BIGINT), r.s + 2*t.nd*o.x - 3*t.sx),
        |    greatest(r.mx,
        |      greatest(CAST(0 AS BIGINT), r.s + 2*t.nd*o.x - 3*t.sx)),
        |    CASE WHEN r.cr <> -1 THEN r.cr
        |      WHEN greatest(CAST(0 AS BIGINT), r.s + 2*t.nd*o.x - 3*t.sx)
        |        > 8*t.sx THEN o.day
        |      ELSE CAST(-1 AS BIGINT) END
        |  FROM rec r JOIN ord o ON o.i = r.i + 1 CROSS JOIN t)
        |SELECT nd AS n_days,
        |  round(CAST(mx AS DOUBLE) / (2.0 * nd), 4) AS max_cusum,
        |  CASE WHEN cr = -1 THEN NULL ELSE cr END AS alarm_day
        |FROM rec CROSS JOIN t WHERE i = nd""".stripMargin,
    "q_page_hinkley" ->
      """WITH RECURSIVE d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |ord AS (SELECT day, x,
        |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM d),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |  CAST(sum(x) AS BIGINT) AS sx FROM ord),
        |rec AS (
        |  SELECT o.i,
        |    10*t.nd*o.x - 11*t.sx AS m,
        |    least(CAST(0 AS BIGINT), 10*t.nd*o.x - 11*t.sx) AS mn,
        |    (10*t.nd*o.x - 11*t.sx) -
        |      least(CAST(0 AS BIGINT), 10*t.nd*o.x - 11*t.sx) AS mph,
        |    CASE WHEN (10*t.nd*o.x - 11*t.sx) -
        |        least(CAST(0 AS BIGINT), 10*t.nd*o.x - 11*t.sx)
        |        > 30*t.sx THEN o.day ELSE CAST(-1 AS BIGINT) END AS cr
        |  FROM ord o CROSS JOIN t WHERE o.i = 1
        |  UNION ALL
        |  SELECT r.i + 1,
        |    r.m + 10*t.nd*o.x - 11*t.sx,
        |    least(r.mn, r.m + 10*t.nd*o.x - 11*t.sx),
        |    greatest(r.mph, (r.m + 10*t.nd*o.x - 11*t.sx) -
        |      least(r.mn, r.m + 10*t.nd*o.x - 11*t.sx)),
        |    CASE WHEN r.cr <> -1 THEN r.cr
        |      WHEN (r.m + 10*t.nd*o.x - 11*t.sx) -
        |        least(r.mn, r.m + 10*t.nd*o.x - 11*t.sx) > 30*t.sx
        |        THEN o.day
        |      ELSE CAST(-1 AS BIGINT) END
        |  FROM rec r JOIN ord o ON o.i = r.i + 1 CROSS JOIN t)
        |SELECT nd AS n_days,
        |  round(CAST(mph AS DOUBLE) / (10.0 * nd), 4) AS max_ph,
        |  CASE WHEN cr = -1 THEN NULL ELSE cr END AS alarm_day
        |FROM rec CROSS JOIN t WHERE i = nd""".stripMargin,
    "q_pacf" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS s,
        |  CAST(sum(x * x) AS BIGINT) AS sxx FROM daily),
        |l1 AS (SELECT CAST(sum(a.x * b.x) AS BIGINT) AS sxy1,
        |  CAST(sum(a.x) AS BIGINT) AS sa1, CAST(sum(b.x) AS BIGINT) AS sb1,
        |  CAST(count(*) AS BIGINT) AS m1
        |  FROM daily a JOIN daily b ON b.day = a.day + 1),
        |l2 AS (SELECT CAST(sum(a.x * b.x) AS BIGINT) AS sxy2,
        |  CAST(sum(a.x) AS BIGINT) AS sa2, CAST(sum(b.x) AS BIGINT) AS sb2,
        |  CAST(count(*) AS BIGINT) AS m2
        |  FROM daily a JOIN daily b ON b.day = a.day + 2),
        |l3 AS (SELECT CAST(sum(a.x * b.x) AS BIGINT) AS sxy3,
        |  CAST(sum(a.x) AS BIGINT) AS sa3, CAST(sum(b.x) AS BIGINT) AS sb3,
        |  CAST(count(*) AS BIGINT) AS m3
        |  FROM daily a JOIN daily b ON b.day = a.day + 3),
        |rho AS (SELECT
        |  CAST(n*n*sxy1 - n*s*(sa1 + sb1) + m1*s*s AS DOUBLE) /
        |    CAST(n*n*sxx - n*s*s AS DOUBLE) AS r1,
        |  CAST(n*n*sxy2 - n*s*(sa2 + sb2) + m2*s*s AS DOUBLE) /
        |    CAST(n*n*sxx - n*s*s AS DOUBLE) AS r2,
        |  CAST(n*n*sxy3 - n*s*(sa3 + sb3) + m3*s*s AS DOUBLE) /
        |    CAST(n*n*sxx - n*s*s AS DOUBLE) AS r3
        |  FROM base CROSS JOIN l1 CROSS JOIN l2 CROSS JOIN l3),
        |p AS (SELECT r1, r2, r3,
        |  (r2 - r1*r1) / (1.0 - r1*r1) AS p2 FROM rho),
        |q AS (SELECT *, r1 - p2*r1 AS p21 FROM p)
        |SELECT round(r1, 6) AS pacf1, round(p2, 6) AS pacf2,
        |  round((r3 - p21*r2 - p2*r1) / (1.0 - p21*r1 - p2*r2), 6)
        |    AS pacf3
        |FROM q""".stripMargin,
    "q_sax" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1),
        |si AS (
        |  SELECT event_type, x,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) - 1 AS i
        |  FROM daily),
        |sg AS (
        |  SELECT s.event_type, (s.i * 6) // st.n AS seg,
        |    CAST(sum(s.x) AS BIGINT) AS segsum,
        |    CAST(count(*) AS BIGINT) AS segn,
        |    st.n, st.sx, st.sxx
        |  FROM si s JOIN stats st USING (event_type)
        |  GROUP BY 1, 2, st.n, st.sx, st.sxx),
        |sym AS (
        |  SELECT event_type, seg, n,
        |    CASE
        |      WHEN (CAST(segsum AS DOUBLE) / CAST(segn AS DOUBLE)
        |            - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |           / sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
        |             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |               * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |           < -0.6745 THEN 'a'
        |      WHEN (CAST(segsum AS DOUBLE) / CAST(segn AS DOUBLE)
        |            - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |           / sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
        |             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |               * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |           < 0.0 THEN 'b'
        |      WHEN (CAST(segsum AS DOUBLE) / CAST(segn AS DOUBLE)
        |            - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |           / sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
        |             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |               * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |           < 0.6745 THEN 'c'
        |      ELSE 'd' END AS sym
        |  FROM sg)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
        |  string_agg(sym, '' ORDER BY seg) AS sax
        |FROM sym GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_wilcoxon" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |d0 AS (SELECT min(day) AS d0 FROM ev),
        |per AS (
        |  SELECT CAST(sum(CASE WHEN day >= d0.d0 + 15 THEN 1 ELSE 0 END)
        |      AS BIGINT) -
        |    CAST(sum(CASE WHEN day < d0.d0 + 15 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS diff
        |  FROM ev CROSS JOIN d0 GROUP BY user_id),
        |freq AS (
        |  SELECT abs(diff) AS ad, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS npos
        |  FROM per WHERE diff <> 0 GROUP BY 1),
        |ranked AS (
        |  SELECT *, CAST(coalesce(sum(t) OVER (ORDER BY ad
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cl
        |  FROM freq),
        |agg AS (
        |  SELECT CAST(sum(t) AS BIGINT) AS m,
        |    CAST(sum((2 * cl + t + 1) * npos) AS BIGINT) AS tw2,
        |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS ties
        |  FROM ranked)
        |SELECT m, round(CAST(tw2 AS DOUBLE) / 2.0, 1) AS w_plus,
        |  round(CASE WHEN
        |      CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(m AS DOUBLE) + 1.0) / 24.0
        |        - CAST(ties AS DOUBLE) / 48.0 <= 0.0 THEN NULL
        |    ELSE (CAST(tw2 AS DOUBLE) / 2.0 -
        |        CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0) / 4.0) /
        |      sqrt(CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0)
        |        * (2.0 * CAST(m AS DOUBLE) + 1.0) / 24.0
        |        - CAST(ties AS DOUBLE) / 48.0) END, 6) AS z
        |FROM agg""".stripMargin
  )
}
