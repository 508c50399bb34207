package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 analytics batch: experiment analysis (diff-in-diff),
  * association/concordance effect sizes (Cramér's V, Kendall's W),
  * distribution distances (Hellinger / Bhattacharyya / total variation),
  * intermittent-demand forecasting (Croston), deterministic stratified
  * sampling, and RAKE keyword extraction.
  *
  * House disciplines (same as Stats2/Analytics): the corpus collapses to
  * a calendar/vocabulary-bounded aggregate in ONE pass; every
  * order-sensitive accumulation is integer-quantized (cents, micro- or
  * nano-units) so partition order can't move a rounding boundary; scalar
  * fan-ins broadcast; sequential recurrences fold over an ordered array
  * in-plan with a recursive-CTE oracle twin computing the identical IEEE
  * sequence. Reference analog for the workload class: the curation /
  * reporting jobs of DESIGN.md §data-pipelines (batch analytics over job
  * outputs), re-expressed as native Spark operators.
  */
object Stats3 {
  private type Q = (SparkSession, String) => DataFrame
  private val DayUs = 86400000000L

  /** RAKE stopword set — matched literally in the oracle; absent words
    * are harmless no-ops against the fixture vocabulary. */
  private val RakeStops = Seq("the", "a", "of", "and", "in", "on", "to",
    "for", "with", "is")

  val queries: Map[String, Q] = Map(
    // ---- difference-in-differences: odd user_ids are the treated
    // cohort (a structural assignment both engines derive identically),
    // the calendar midpoint splits pre/post, outcome is mean event value
    // in EXACT cents. One corpus pass prices the (treat, day) frame;
    // the midpoint broadcasts back over that bounded frame, and the four
    // cell means + the DiD estimate are one final double expression.
    "q_diff_in_diff" -> ((s, d) => {
      val cell = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"),
          (col("user_id") % 2 === 1).as("treat"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n")))
      // ADVICE r9: Column `/` on longs is DOUBLE division — an even
      // mn+mx would yield an X.5 midpoint on Spark while the oracle's
      // `// 2` floors; `div` is integer division on both engines
      val mid = cell.agg(min("day").as("mn"), max("day").as("mx"))
        .select(expr("(mn + mx + 1) div 2").as("mid"))
      val g = cell.crossJoin(broadcast(mid))
        .withColumn("post", col("day") >= col("mid"))
      def m(tr: Boolean, po: Boolean): Column = {
        val f = col("treat") === tr && col("post") === po
        sum(when(f, col("cents")).otherwise(0L)).cast("double") /
          sum(when(f, col("n")).otherwise(0L)) / 100.0
      }
      g.agg(sum("n").as("n_events"),
          round(m(true, false), 4).as("treat_pre"),
          round(m(true, true), 4).as("treat_post"),
          round(m(false, false), 4).as("ctrl_pre"),
          round(m(false, true), 4).as("ctrl_post"),
          round((m(true, true) - m(true, false)) -
            (m(false, true) - m(false, false)), 4).as("did"))
    }),

    // ---- Cramér's V: association strength between event type and
    // weekday. The full r×c grid (types × 7, zero cells included — a
    // zero observed against a positive expectation still pays its χ²
    // term) comes from the friedman grid pattern; each cell's
    // (o−e)²/e quantizes to nano-units before the sum so engine-side
    // addition order is irrelevant.
    "q_cramers_v_events" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(col("event_type").as("t"),
          (expr(s"ts_us div $DayUs") % 7).as("wd"))
        .agg(count(lit(1)).as("o")))
      val grid = c.select("t").distinct()
        .crossJoin(broadcast(c.select("wd").distinct()))
        .join(c, Seq("t", "wd"), "left")
        .select(col("t"), col("wd"), coalesce(col("o"), lit(0L)).as("o"))
      val rt = grid.groupBy("t").agg(sum("o").as("rt"))
      val ct = grid.groupBy("wd").agg(sum("o").as("ct"))
      val tot = grid.agg(sum("o").as("n"),
        countDistinct("t").as("r"), countDistinct("wd").as("cc"))
      val e = col("rt").cast("double") * col("ct") / col("n")
      val term = (col("o") - e) * (col("o") - e) / e
      val chi = grid.join(broadcast(rt), "t").join(broadcast(ct), "wd")
        .crossJoin(broadcast(tot))
        .agg(sum(round(term * 1e9).cast("long")).as("chi9"),
          max("n").as("n"), max("r").as("r"), max("cc").as("cc"))
      chi.select(col("n").as("n_events"), col("r").as("n_types"),
        col("cc").as("n_weekdays"),
        round(col("chi9") / 1e9, 4).as("chi2"),
        round(when(col("n") === 0 || least(col("r"), col("cc")) <= 1,
            lit(null)).otherwise(
          sqrt(col("chi9") / 1e9 /
            (col("n") * (least(col("r"), col("cc")) - 1.0)))), 6)
          .as("cramers_v"))
    }),

    // ---- Kendall's coefficient of concordance W (tie-corrected): do
    // the days agree on how the event types rank? Friedman asks "are
    // the treatments different"; W is the effect size of that
    // agreement. Doubled average ranks (2·rank is always an integer)
    // keep S = Σ(Rⱼ−R̄)² exact: W = 3(k·ΣR2ⱼ² − (ΣR2ⱼ)²) /
    // (k·(m²(k³−k) − m·T)) with T = Σ(t³−t) over per-day tie groups —
    // every operand a BIGINT until the one final division.
    "q_kendall_w" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"),
          col("event_type").as("t"))
        .agg(count(lit(1)).as("x")))
      val grid = graft.CacheScope.cached(c.select("day").distinct()
        .crossJoin(broadcast(c.select("t").distinct()))
        .join(c, Seq("day", "t"), "left")
        .select(col("day"), col("t"), coalesce(col("x"), lit(0L)).as("x")))
      val r2 = grid.toDF("day", "ta", "xa")
        .join(broadcast(grid.toDF("day", "tb", "xb")), "day")
        .groupBy(col("day"), col("ta").as("t"))
        .agg((sum(when(col("xb") < col("xa"), 2L).otherwise(0L)) +
          sum(when(col("xb") === col("xa"), 1L).otherwise(0L)) + 1L)
          .as("r2"))
      val perType = r2.groupBy("t")
        .agg(count(lit(1)).as("m"), sum("r2").as("rj2"))
      val ties = grid.groupBy("day", "x").agg(count(lit(1)).as("tt"))
        .agg(coalesce(sum(col("tt") * col("tt") * col("tt") - col("tt")),
          lit(0L)).as("tcorr"))
      val agg0 = perType.agg(count(lit(1)).as("k"), max("m").as("m"),
        sum(col("rj2") * col("rj2")).as("sr2"),
        sum("rj2").as("sr"))
      val a = agg0.crossJoin(broadcast(ties))
      val k = col("k").cast("double")
      val m = col("m").cast("double")
      val num = lit(3.0) * (k * col("sr2") - col("sr").cast("double") *
        col("sr"))
      val den = k * (m * m * (k * k * k - k) - m * col("tcorr"))
      a.select(col("m").as("n_days"), col("k").as("k_types"),
        col("tcorr").as("tie_corr"),
        round(when(col("k") <= 1 || col("m") === 0 || den <= 0.0,
          lit(null)).otherwise(num / den), 6).as("w"),
        round(when(col("k") <= 1 || col("m") === 0 || den <= 0.0,
            lit(null))
          .otherwise(m * (k - 1) * (num / den)), 4).as("chi2_w"))
    }),

    // ---- distribution distances between two sources' document-length
    // histograms (50-char bins): Bhattacharyya coefficient, Hellinger,
    // and total variation from ONE bounded bin frame — the "did the
    // corpus mix drift" triple that sits beside q_psi and q_ks_test.
    // Per-bin terms quantize to nano-units before summation.
    "q_dist_distance" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.documents(s, d)
        .filter(col("source").isin("src0", "src1"))
        .groupBy((col("n_chars") / 50).cast("long").as("bin"),
          col("source").as("src"))
        .agg(count(lit(1)).as("o")))
      val tot = c.groupBy("src").agg(sum("o").as("n"))
      val bins = c.select("bin").distinct()
      val p = c.filter(col("src") === "src0")
        .join(broadcast(tot.filter(col("src") === "src0")), "src")
        .select(col("bin"), (col("o").cast("double") / col("n")).as("p"))
      val q = c.filter(col("src") === "src1")
        .join(broadcast(tot.filter(col("src") === "src1")), "src")
        .select(col("bin"), (col("o").cast("double") / col("n")).as("q"))
      val g = bins.join(broadcast(p), Seq("bin"), "left")
        .join(broadcast(q), Seq("bin"), "left")
        .select(coalesce(col("p"), lit(0.0)).as("p"),
          coalesce(col("q"), lit(0.0)).as("q"))
      val sums = g.agg(count(lit(1)).as("n_bins"),
        sum(round(sqrt(col("p") * col("q")) * 1e9).cast("long")).as("bc9"),
        sum(round(abs(col("p") - col("q")) * 1e9).cast("long")).as("tv9"))
      sums.select(col("n_bins"),
        round(col("bc9") / 1e9, 6).as("bhatt_coef"),
        round(sqrt(greatest(lit(0.0), lit(1.0) - col("bc9") / 1e9)), 6)
          .as("hellinger"),
        round(when(col("bc9") <= 0, lit(null))
          .otherwise(-log(col("bc9") / 1e9)), 6).as("bhatt_dist"),
        round(col("tv9") / 2e9, 6).as("tv_dist"))
    }),

    // ---- Croston's method for an intermittent series (signup events):
    // separate exponential smoothing (α=0.2) of nonzero demand SIZES
    // and of the INTER-ARRIVAL gaps over the full min..max calendar
    // (missing days are real zero-demand days — the whole point of the
    // method). The corpus collapses to one daily aggregate; the
    // recurrence folds over the ordered calendar array in-plan, oracle
    // twin is the identical recursive CTE (q_holt's discipline).
    "q_croston" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "signup")
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x"))
      val series = daily
        .agg(min("day").as("mn"), max("day").as("mx"),
          collect_list(struct(col("day"), col("x"))).as("raw"))
        .select(col("mn"), col("mx"),
          transform(sequence(col("mn"), col("mx")), dd =>
            coalesce(
              element_at(
                map_from_entries(col("raw")), dd).cast("double"),
              lit(0.0))).as("a"))
        .select(col("a"), size(col("a")).as("nd"))
      val folded = aggregate(
        sequence(lit(1), col("nd")),
        struct(lit(0.0).as("z"), lit(0.0).as("p"),
          lit(0L).as("last"), lit(0L).as("seen")),
        (acc, i) => {
          val xi = element_at(col("a"), i)
          val first = struct(xi.as("z"), i.cast("double").as("p"),
            i.cast("long").as("last"), lit(1L).as("seen"))
          val gap = (i.cast("long") - acc.getField("last")).cast("double")
          val upd = struct(
            (lit(0.2) * xi + lit(0.8) * acc.getField("z")).as("z"),
            (lit(0.2) * gap + lit(0.8) * acc.getField("p")).as("p"),
            i.cast("long").as("last"),
            (acc.getField("seen") + 1L).as("seen"))
          when(xi > 0.0,
            when(acc.getField("seen") === 0L, first).otherwise(upd))
            .otherwise(acc)
        })
      series.select(col("nd").cast("long").as("n_days"),
        folded.getField("seen").as("n_demand"),
        round(folded.getField("z"), 4).as("size_hat"),
        round(folded.getField("p"), 4).as("interval_hat"),
        round(when(folded.getField("seen") === 0L, lit(null))
            .otherwise(folded.getField("z") / folded.getField("p")), 6)
          .as("demand_rate"))
    }),

    // ---- deterministic stratified sample: exactly min(10, |stratum|)
    // documents per source, picked by a salted-MD5 order — the
    // reproducible eyeball-sample every corpus pipeline wants (a true
    // random sample can't be oracle-compared; a hash order is both
    // "random" and a pure function of the key). One per-source window
    // off a single exchange; at 100 TB the partition count follows the
    // stratum key, never a global sort.
    "q_stratified_topk" -> ((s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(col("h").asc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(concat(lit("strat-"), col("doc_id").cast("string")))
            .as("h"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("doc_id"), col("source"), col("rn"))
        .orderBy("source", "rn")
    }),

    // ---- RAKE keyword extraction (Rose et al. 2010): candidate
    // phrases are maximal stopword-free token runs; a word scores
    // degree/frequency (degree = summed length of phrases it appears
    // in), a phrase scores the sum of its words' scores. The classic
    // cheap keyworder next to q_textrank's graph ranking. Shape: one
    // token explode, BOTH per-doc windows (run-islands + phrase length)
    // share the doc_id exchange, word scores are vocabulary-bounded and
    // broadcast back, top-15 is a TakeOrdered. Word scores quantize to
    // micro-units so phrase sums are exact integers.
    "q_rake" -> ((s, d) => {
      val toks = Tables.documents(s, d).transform(Tables.fanoutReady)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val wNs = Window.partitionBy("doc_id").orderBy("pos")
      val wG = Window.partitionBy("doc_id", "grp")
      val occ = graft.CacheScope.cached(toks
        .filter(!col("w").isin(RakeStops: _*))
        .withColumn("grp", col("pos") - row_number().over(wNs))
        .withColumn("plen", count(lit(1)).over(wG)))
      val wordScore = occ.groupBy("w")
        .agg(round(sum("plen").cast("double") * 1e6 / count(lit(1)))
          .cast("long").as("scorei"))
      val phrase = occ.groupBy("doc_id", "grp")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            e => e.getField("w")), " ").as("phrase"))
      val phraseScore = occ.join(broadcast(wordScore), "w")
        .groupBy("doc_id", "grp")
        .agg(sum("scorei").as("si"))
      phrase.join(phraseScore, Seq("doc_id", "grp"))
        .groupBy("phrase")
        .agg(count(lit(1)).as("n_occur"), max("si").as("si"))
        .select(col("phrase"), col("n_occur"),
          round(col("si") / 1e6, 6).as("score"))
        .orderBy(col("score").desc, col("phrase").asc)
        .limit(15)
    }),

    // ---- Jarque–Bera normality test on the event-value distribution:
    // skewness/kurtosis from RAW integer power sums (cents ≤ ~49k, so
    // v² and v³ fit BIGINT per-term; v⁴ and the v³/v⁴ SUMS go through
    // DECIMAL(38,0) / HUGEINT — the q_kruskal overflow discipline).
    // Central moments derive from the raw sums by the binomial
    // identities in ONE mirrored double chain; χ²(2df) survival is the
    // closed form exp(−JB/2), so no CDF polynomial is even needed.
    // Scale shape: a single corpus scan folding to four sums.
    "q_jarque_bera" -> ((s, d) => {
      val v = round(col("value") * 100).cast("long")
      val sums = Tables.events(s, d)
        .select(v.as("v"), (v * v).as("v2"))
        .agg(count(lit(1)).as("n"), sum("v").as("s1"),
          // ADVICE r9: v² through decimal like s3/s4 — a BIGINT sum of v²
          // overflows first at ~4e8 max-cent rows, where non-ANSI Spark
          // wraps silently while DuckDB raises
          sum(col("v2").cast("decimal(20,0)")).as("s2"),
          sum(col("v2").cast("decimal(20,0)") * col("v")).as("s3"),
          sum(col("v2").cast("decimal(20,0)") * col("v2")).as("s4"))
      val n = col("n").cast("double")
      val mu = col("s1").cast("double") / n
      val m2 = col("s2").cast("double") / n - mu * mu
      val m3 = col("s3").cast("double") / n -
        lit(3.0) * mu * (col("s2").cast("double") / n) +
        lit(2.0) * mu * mu * mu
      val m4 = col("s4").cast("double") / n -
        lit(4.0) * mu * (col("s3").cast("double") / n) +
        lit(6.0) * mu * mu * (col("s2").cast("double") / n) -
        lit(3.0) * mu * mu * mu * mu
      val skew = m3 / sqrt(m2 * m2 * m2)
      val kurt = m4 / (m2 * m2) - lit(3.0)
      val jb = n / lit(6.0) * (skew * skew + kurt * kurt / lit(4.0))
      sums.select(col("n").as("n_events"),
        round(skew, 6).as("skewness"),
        round(kurt, 6).as("excess_kurtosis"),
        round(jb, 4).as("jb_stat"),
        round(exp(-jb / lit(2.0)), 9).as("p_value"))
    }),

    // ---- Durbin–Watson autocorrelation test on the residuals of the
    // daily-revenue OLS trend line — the regression-residual companion
    // to q_ljung_box (which tests the raw series). Slope/intercept come
    // from exact BIGINT sums over the calendar frame; residuals and
    // their consecutive differences are pure per-index functions of
    // those sums, each term quantized to micro-units BEFORE the sum so
    // no engine's summation order can move the ratio. The consecutive
    // pairing folds over the croston-style calendar array — missing
    // days are zero-revenue days, and no window ever sees an unbounded
    // frame.
    "q_durbin_watson" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val series = daily
        .agg(min("day").as("mn"), max("day").as("mx"),
          collect_list(struct(col("day"), col("cents"))).as("raw"))
        .select(
          transform(sequence(col("mn"), col("mx")), dd =>
            coalesce(element_at(map_from_entries(col("raw")), dd),
              lit(0L))).as("y"))
        .select(col("y"), size(col("y")).cast("long").as("nd"))
      // exact integer sums for the OLS line y = a + b·t, t = 1..n
      val st = col("nd") * (col("nd") + 1L) / lit(2L)
      val st2 = col("nd") * (col("nd") + 1L) *
        (lit(2L) * col("nd") + 1L) / lit(6L)
      val sy = aggregate(col("y"), lit(0L), (acc, yi) => acc + yi)
      val sty = aggregate(
        zip_with(sequence(lit(1L), col("nd")), col("y"),
          (t, yi) => t * yi),
        lit(0L), (acc, x) => acc + x)
      val withSums = series.select(col("y"), col("nd"),
        st.as("st"), st2.as("st2"), sy.as("sy"), sty.as("sty"))
      val nD = col("nd").cast("double")
      val b = (nD * col("sty") - col("st").cast("double") * col("sy")) /
        (nD * col("st2") - col("st").cast("double") * col("st"))
      val a = (col("sy") - b * col("st")) / nD
      // DW is scale-free, so residuals normalize by mean daily revenue
      // BEFORE pico-quantization: terms stay ~O(1e12) longs at any SF
      // (raw cent residuals squared would overflow BIGINT at ~30×)
      val ybar = when(col("sy") === 0L, lit(1.0))
        .otherwise(col("sy").cast("double") / nD)
      val resid = transform(sequence(lit(1L), col("nd")), t =>
        (element_at(col("y"), t.cast("int")).cast("double") - a - b * t) /
          col("ybar"))
      val wr = withSums.withColumn("ybar", ybar)
        .select(col("nd"), resid.as("e"),
          round(b, 6).as("slope"), round(a, 2).as("intercept"))
      val den12 = aggregate(col("e"), lit(0L),
        (acc, ei) => acc + round(ei * ei * lit(1e12)).cast("long"))
      val num12 = aggregate(sequence(lit(2L), col("nd")), lit(0L),
        (acc, i) => {
          val di = element_at(col("e"), i.cast("int")) -
            element_at(col("e"), (i - 1L).cast("int"))
          acc + round(di * di * lit(1e12)).cast("long")
        })
      wr.select(col("nd").as("n_days"), col("slope"), col("intercept"),
        round(when(den12 === 0L, lit(null))
          .otherwise(num12.cast("double") / den12), 6).as("dw"),
        round(when(den12 === 0L, lit(null))
          .otherwise(lit(1.0) - num12.cast("double") / den12 / lit(2.0)),
          6).as("rho1_approx"))
    }),

    // ---- Cochran–Armitage trend test: does purchase propensity TREND
    // across ordered value bands (0–99, 100–199, … cents·100)? The χ²
    // independence tests (q_cramers_v_events) ignore band order; CA is the
    // one that earns its power from it. Five (n_g, r_g) integer pairs
    // from one scan; T, Var(T), and z are one mirrored double chain;
    // Φ via the A&S 7.1.26 polynomial with identical literals in both
    // engines (the q_bh_fdr discipline).
    "q_cochran_armitage" -> ((s, d) => {
      val g = least(lit(4L), floor(col("value") / 100).cast("long"))
      val bands = Tables.events(s, d)
        .select(g.as("g"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("r"))
        .groupBy("g")
        .agg(count(lit(1)).as("n"), sum("r").as("r"))
      val tot = bands.agg(sum("n").as("nn"), sum("r").as("rr"),
        sum(col("n") * col("g")).as("sng"),
        sum(col("n") * col("g") * col("g")).as("sng2"),
        sum(col("r") * col("g")).as("srg"),
        count(lit(1)).as("n_bands"))
      val nn = col("nn").cast("double")
      val pbar = col("rr").cast("double") / nn
      val tstat = col("srg").cast("double") -
        pbar * col("sng").cast("double")
      val vr = pbar * (lit(1.0) - pbar) *
        (col("sng2").cast("double") -
          col("sng").cast("double") * col("sng") / nn)
      val z = tstat / sqrt(vr)
      val x = abs(z) / lit(math.sqrt(2.0))
      val tpoly = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val poly = ((((lit(1.061405429) * tpoly - lit(1.453152027)) *
        tpoly + lit(1.421413741)) * tpoly - lit(0.284496736)) * tpoly +
        lit(0.254829592)) * tpoly
      val p = poly * exp(-x * x) // = 2·(1−Φ(|z|))
      tot.select(col("nn").as("n_events"), col("n_bands"),
        col("rr").as("n_purchases"),
        round(z, 6).as("z"), round(p, 9).as("p_value"))
    }),

    // ---- Cronbach's alpha over the day × event-type count matrix:
    // items = the k event types, cases = the calendar days (zero-fill
    // grid — a type with no events that day scored 0, exactly the
    // kendall_w grid). Sample variances from exact BIGINT sums; the
    // item-variance sum and the total-score variance meet in one final
    // double ratio. The reliability read: do the daily type counts
    // move together (one underlying "activity" factor) or not?
    "q_cronbach_alpha" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"),
          col("event_type").as("t"))
        .agg(count(lit(1)).as("x")))
      val grid = graft.CacheScope.cached(c.select("day").distinct()
        .crossJoin(broadcast(c.select("t").distinct()))
        .join(c, Seq("day", "t"), "left")
        .select(col("day"), col("t"),
          coalesce(col("x"), lit(0L)).as("x")))
      // per-item (type) sufficient stats over the n days
      val item = grid.groupBy("t")
        .agg(count(lit(1)).as("n"), sum("x").as("s1"),
          sum(col("x") * col("x")).as("s2"))
      val nI = col("n").cast("double")
      val varI = (nI * col("s2") - col("s1").cast("double") * col("s1")) /
        (nI * (nI - lit(1.0)))
      val items = item.agg(count(lit(1)).as("k"), max("n").as("n"),
        sum(round(varI * lit(1e6)).cast("long")).as("iv6"))
      // total daily score = the day's full event count
      val dayTot = grid.groupBy("day").agg(sum("x").as("sx"))
        .agg(count(lit(1)).as("nd"), sum("sx").as("t1"),
          sum(col("sx") * col("sx")).as("t2"))
      val nT = col("nd").cast("double")
      val varT = (nT * col("t2") - col("t1").cast("double") * col("t1")) /
        (nT * (nT - lit(1.0)))
      val j = items.crossJoin(broadcast(dayTot))
      val kD = col("k").cast("double")
      j.select(col("k").as("k_items"), col("n").as("n_days"),
        round(col("iv6") / 1e6, 4).as("sum_item_var"),
        round(varT, 4).as("total_var"),
        round(when(col("k") <= 1 || varT <= 0.0, lit(null)).otherwise(
          kD / (kD - lit(1.0)) *
            (lit(1.0) - col("iv6") / lit(1e6) / varT)), 6).as("alpha"))
    }),

    // ---- sharp regression discontinuity: does the quality gate's keep
    // rate JUMP at the 300-char mark, beyond what the local linear
    // trend explains? Completes the causal family (q_diff_in_diff's
    // time contrast, q_cuped's variance reduction — this is the cutoff
    // contrast). Local linear fits on both sides of the cutoff within
    // a ±150-char bandwidth, τ = intercept(right) − intercept(left) at
    // the cutoff. y is the exact q_quality_logit keep bit and u the
    // integer char offset, so all five per-side sums are BIGINTs and
    // the two OLS closed forms are one mirrored double chain. One scan,
    // two-row collapse.
    "q_reg_discontinuity" -> ((s, d) => {
      val nTok = (length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + 1).cast("long")
      val stopRatio = size(regexp_extract_all(col("text"),
        lit("\\b(the|a)\\b"), lit(0))).cast("double") / nTok
      val digitRatio = size(regexp_extract_all(col("text"),
        lit("[0-9]"), lit(0))).cast("double") /
        greatest(length(col("text")), lit(1)).cast("double")
      val meanWlen = (length(col("text")) -
        (nTok - lit(1))).cast("double") / nTok
      val x = lit(-2.0) + lit(0.9) * log(lit(1.0) + nTok) -
        lit(3.0) * stopRatio - lit(0.5) * digitRatio +
        lit(0.2) * meanWlen
      val side = graft.CacheScope.cached(Tables.documents(s, d)
        .filter(col("n_chars") >= 150 && col("n_chars") < 450)
        .select((col("n_chars") >= 300).as("right"),
          (col("n_chars") - 300L).as("u"),
          when(x >= 0.0, 1L).otherwise(0L).as("y"))
        .groupBy("right")
        .agg(count(lit(1)).as("n"), sum("u").as("su"),
          sum(col("u") * col("u")).as("su2"), sum("y").as("sy"),
          sum(col("u") * col("y")).as("suy")))
      val nD = col("n").cast("double")
      val b = (nD * col("suy") - col("su").cast("double") * col("sy")) /
        (nD * col("su2") - col("su").cast("double") * col("su"))
      val a = (col("sy") - b * col("su")) / nD
      val per = side.select(col("right"), col("n"),
        round(b, 6).as("slope"), a.as("a0"))
      val lft = per.filter(!col("right"))
        .select(col("n").as("n_left"), col("slope").as("slope_left"),
          col("a0").as("al"))
      val rgt = per.filter(col("right"))
        .select(col("n").as("n_right"), col("slope").as("slope_right"),
          col("a0").as("ar"))
      lft.crossJoin(broadcast(rgt))
        .select(col("n_left"), col("n_right"),
          round(col("al"), 6).as("int_left"),
          round(col("ar"), 6).as("int_right"),
          col("slope_left"), col("slope_right"),
          round(col("ar") - col("al"), 6).as("rdd_tau"))
    }),

    // ---- Hodges–Lehmann location estimate of the daily count
    // distribution: the lower median of all Walsh averages
    // (xᵢ+xⱼ)/2, i ≤ j — the robust companion to the plain daily mean
    // (30% breakdown, the estimator behind the Wilcoxon CI). Walsh
    // SUMS stay integers; the median comes from the q_levene
    // cumulative rule over the sum histogram via the GlobalRank
    // two-phase prefix (no partition-less window over the pair frame);
    // the ÷2 happens once at the end. Pair frame is calendar-bounded²
    // over the aggregated daily frame.
    "q_hodges_lehmann" -> ((s, d) => {
      val daily = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(expr(s"ts_us div $DayUs").as("day"))
        .agg(count(lit(1)).as("x")))
      val pairs = graft.CacheScope.cached(daily.toDF("da", "xa")
        .join(broadcast(daily.toDF("db", "xb")), col("da") <= col("db"))
        .select((col("xa") + col("xb")).as("w")))
      val hist = pairs.groupBy("w").agg(count(lit(1)).as("f"))
      val run = graft.operators.GlobalRank.withPrefixAggs(hist,
        Seq(col("w")),
        Seq(graft.operators.GlobalRank.PrefixAgg("f", "cum",
          inclusive = true)))
      val tot = pairs.agg(count(lit(1)).as("np"))
      val med = run.crossJoin(broadcast(tot))
        .filter(col("cum") * 2 >= col("np"))
        .agg(min("w").as("wmed"), max("np").as("np"))
      daily.agg(count(lit(1)).as("n_days")).crossJoin(broadcast(med))
        .select(col("n_days"), col("np").as("n_pairs"),
          round(col("wmed") / 2.0, 1).as("hl_location"))
    }),

    // ---- Gini decision stump: the best single threshold on event
    // value for predicting purchase — the depth-1 tree every
    // feature-selection pass trains first. Candidate splits are the
    // distinct cent values; cumulative (n, positives) come from
    // GlobalRank's two-phase prefix (the q_ks_test shape — no
    // partition-less window over the value frame); the weighted-Gini
    // cost per split is nano-quantized from exact BIGINT prefix counts
    // so the argmin is an integer comparison, and the winner is one
    // TakeOrdered row.
    "q_gini_stump" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(round(col("value") * 100).cast("long").as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"))
      val byVal = e.groupBy("v")
        .agg(count(lit(1)).as("f"), sum("y").as("p"))
      val run = graft.operators.GlobalRank.withPrefixAggs(byVal,
        Seq(col("v")),
        Seq(graft.operators.GlobalRank.PrefixAgg("f", "nl",
          inclusive = true),
          graft.operators.GlobalRank.PrefixAgg("p", "pl",
            inclusive = true)))
      val tot = e.agg(count(lit(1)).as("nn"), sum("y").as("pp"))
      val j = run.crossJoin(broadcast(tot))
        .filter(col("nl") < col("nn")) // right side must be non-empty
      val nr = col("nn") - col("nl")
      val pr = col("pp") - col("pl")
      // weighted Gini · N/2 = posL·negL/nL + posR·negR/nR — each term a
      // deterministic double of exact BIGINTs, nano-quantized pre-argmin
      val cost = (col("pl").cast("double") * (col("nl") - col("pl")) /
        col("nl")) + (pr.cast("double") * (nr - pr) / nr)
      val scored = j.select(col("v"), col("nl"), col("pl"),
        nr.as("nr"), pr.as("pr"), col("nn"), col("pp"),
        round(cost * 1e9).cast("long").as("c9"))
      val best = scored.orderBy(col("c9").asc, col("v").asc).limit(1)
      val parent = (col("pp").cast("double") * (col("nn") - col("pp")) /
        col("nn"))
      best.select(col("v").as("split_cents"),
        col("nl").as("n_left"), col("nr").as("n_right"),
        round(col("pl").cast("double") / col("nl"), 6).as("rate_left"),
        round(col("pr").cast("double") / col("nr"), 6).as("rate_right"),
        round((parent - col("c9") / lit(1e9)) * 2.0 / col("nn"), 9)
          .as("gini_gain"))
    }),

    // ---- Information Value / Weight of Evidence over the value bands
    // (the credit-scoring feature screen; IV < 0.02 "useless",
    // > 0.3 "strong"): WOEg = ln((goodg/G)/(badg/B)) per band, IV the
    // nano-quantized sum of (goodg/G − badg/B)·WOEg. Same one-scan
    // five-band collapse as q_cochran_armitage; the IV total broadcasts
    // back onto the per-band rows.
    "q_iv_woe" -> ((s, d) => {
      val g = least(lit(4L), floor(col("value") / 100).cast("long"))
      val bands = graft.CacheScope.cached(Tables.events(s, d)
        .select(g.as("band"),
          when(col("event_type") === "purchase", 1L).otherwise(0L)
            .as("y"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), sum("y").as("good")))
      val tot = bands.agg(sum("good").as("gg"),
        sum(col("n") - col("good")).as("bb"))
      val w = bands.crossJoin(broadcast(tot))
        .withColumn("bad", col("n") - col("good"))
      val gr = col("good").cast("double") / col("gg")
      val br = col("bad").cast("double") / col("bb")
      val woe = when(col("good") === 0L || col("bad") === 0L, lit(null))
        .otherwise(log(gr / br))
      val rows = graft.CacheScope.cached(w.select(col("band"), col("n"),
        col("good"), col("bad"), round(woe, 6).as("woe"),
        when(woe.isNull, lit(0L))
          .otherwise(round((gr - br) * woe * lit(1e9)).cast("long"))
          .as("iv9")))
      val ivTot = rows.agg(sum("iv9").as("iv9t"))
      rows.crossJoin(broadcast(ivTot))
        .select(col("band"), col("n"), col("good"), col("bad"),
          col("woe"), round(col("iv9") / 1e9, 6).as("iv_term"),
          round(col("iv9t") / 1e9, 6).as("iv_total"))
        .orderBy("band")
    })
  )

  private val stopsSql = RakeStops.map(w => s"'$w'").mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_diff_in_diff" ->
      """WITH cell AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    (user_id % 2 = 1) AS treat,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM cell),
        |g AS (SELECT cell.*, day >= mid AS post FROM cell CROSS JOIN mid),
        |m AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN treat AND NOT post THEN cents ELSE 0 END)
        |      AS DOUBLE) /
        |      sum(CASE WHEN treat AND NOT post THEN n ELSE 0 END) / 100.0
        |      AS tpre,
        |    CAST(sum(CASE WHEN treat AND post THEN cents ELSE 0 END)
        |      AS DOUBLE) /
        |      sum(CASE WHEN treat AND post THEN n ELSE 0 END) / 100.0
        |      AS tpost,
        |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0
        |      END) AS DOUBLE) /
        |      sum(CASE WHEN NOT treat AND NOT post THEN n ELSE 0 END)
        |      / 100.0 AS cpre,
        |    CAST(sum(CASE WHEN NOT treat AND post THEN cents ELSE 0 END)
        |      AS DOUBLE) /
        |      sum(CASE WHEN NOT treat AND post THEN n ELSE 0 END) / 100.0
        |      AS cpost
        |  FROM g)
        |SELECT n_events, round(tpre, 4) AS treat_pre,
        |  round(tpost, 4) AS treat_post, round(cpre, 4) AS ctrl_pre,
        |  round(cpost, 4) AS ctrl_post,
        |  round((tpost - tpre) - (cpost - cpre), 4) AS did
        |FROM m""".stripMargin,
    "q_cramers_v_events" ->
      """WITH c AS (
        |  SELECT event_type AS t,
        |    (epoch_us(ts) // 86400000000) % 7 AS wd,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT ts.t, ws.wd, CAST(coalesce(c.o, 0) AS BIGINT) AS o
        |  FROM (SELECT DISTINCT t FROM c) ts
        |  CROSS JOIN (SELECT DISTINCT wd FROM c) ws
        |  LEFT JOIN c ON c.t = ts.t AND c.wd = ws.wd),
        |rt AS (SELECT t, CAST(sum(o) AS BIGINT) AS rt FROM grid
        |       GROUP BY 1),
        |ct AS (SELECT wd, CAST(sum(o) AS BIGINT) AS ct FROM grid
        |       GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT t) AS BIGINT) AS r,
        |    CAST(count(DISTINCT wd) AS BIGINT) AS cc
        |  FROM grid),
        |chi AS (
        |  SELECT CAST(sum(CAST(round(
        |      (g.o - CAST(rt.rt AS DOUBLE) * ct.ct / tot.n) *
        |      (g.o - CAST(rt.rt AS DOUBLE) * ct.ct / tot.n) /
        |      (CAST(rt.rt AS DOUBLE) * ct.ct / tot.n) * 1e9) AS BIGINT))
        |      AS BIGINT) AS chi9,
        |    CAST(max(tot.n) AS BIGINT) AS n,
        |    CAST(max(tot.r) AS BIGINT) AS r,
        |    CAST(max(tot.cc) AS BIGINT) AS cc
        |  FROM grid g JOIN rt ON rt.t = g.t JOIN ct ON ct.wd = g.wd
        |  CROSS JOIN tot)
        |SELECT n AS n_events, r AS n_types, cc AS n_weekdays,
        |  round(chi9 / 1e9, 4) AS chi2,
        |  round(CASE WHEN n = 0 OR least(r, cc) <= 1 THEN NULL
        |    ELSE sqrt(chi9 / 1e9 /
        |      (n * (least(r, cc) - 1.0))) END, 6) AS cramers_v
        |FROM chi""".stripMargin,
    "q_kendall_w" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type AS t,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.day, ty.t, CAST(coalesce(c.x, 0) AS BIGINT) AS x
        |  FROM (SELECT DISTINCT day FROM c) d
        |  CROSS JOIN (SELECT DISTINCT t FROM c) ty
        |  LEFT JOIN c ON c.day = d.day AND c.t = ty.t),
        |r2 AS (
        |  SELECT a.day, a.t,
        |    CAST(sum(CASE WHEN b.x < a.x THEN 2 ELSE 0 END) +
        |      sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS BIGINT)
        |      AS r2
        |  FROM grid a JOIN grid b ON a.day = b.day GROUP BY 1, 2),
        |pt AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(r2) AS BIGINT) AS rj2
        |  FROM r2 GROUP BY 1),
        |ties AS (
        |  SELECT CAST(coalesce(sum(tt * tt * tt - tt), 0) AS BIGINT)
        |      AS tcorr
        |  FROM (SELECT day, x, CAST(count(*) AS BIGINT) AS tt
        |        FROM grid GROUP BY 1, 2) q),
        |agg0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, CAST(max(m) AS BIGINT)
        |      AS m,
        |    CAST(sum(rj2 * rj2) AS BIGINT) AS sr2,
        |    CAST(sum(rj2) AS BIGINT) AS sr
        |  FROM pt),
        |f AS (
        |  SELECT m, k, tcorr,
        |    3.0 * (CAST(k AS DOUBLE) * sr2 - CAST(sr AS DOUBLE) * sr)
        |      AS num,
        |    CAST(k AS DOUBLE) * (CAST(m AS DOUBLE) * m *
        |      (CAST(k AS DOUBLE) * k * k - k) -
        |      CAST(m AS DOUBLE) * tcorr) AS den
        |  FROM agg0 CROSS JOIN ties)
        |SELECT m AS n_days, k AS k_types, tcorr AS tie_corr,
        |  round(CASE WHEN k <= 1 OR m = 0 OR den <= 0.0 THEN NULL
        |    ELSE num / den END, 6) AS w,
        |  round(CASE WHEN k <= 1 OR m = 0 OR den <= 0.0 THEN NULL
        |    ELSE m * (k - 1) * (num / den) END, 4) AS chi2_w
        |FROM f""".stripMargin,
    "q_dist_distance" ->
      """WITH c AS (
        |  SELECT n_chars // 50 AS bin, source AS src,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM documents WHERE source IN ('src0', 'src1')
        |  GROUP BY 1, 2),
        |tot AS (SELECT src, CAST(sum(o) AS BIGINT) AS n FROM c
        |        GROUP BY 1),
        |bins AS (SELECT DISTINCT bin FROM c),
        |p AS (SELECT bin, CAST(o AS DOUBLE) / n AS p
        |  FROM c JOIN tot USING (src) WHERE src = 'src0'),
        |q AS (SELECT bin, CAST(o AS DOUBLE) / n AS q
        |  FROM c JOIN tot USING (src) WHERE src = 'src1'),
        |g AS (
        |  SELECT coalesce(p.p, 0.0) AS p, coalesce(q.q, 0.0) AS q
        |  FROM bins LEFT JOIN p USING (bin) LEFT JOIN q USING (bin)),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(sum(CAST(round(sqrt(p * q) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS bc9,
        |    CAST(sum(CAST(round(abs(p - q) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS tv9
        |  FROM g)
        |SELECT n_bins, round(bc9 / 1e9, 6) AS bhatt_coef,
        |  round(sqrt(greatest(0.0, 1.0 - bc9 / 1e9)), 6) AS hellinger,
        |  round(CASE WHEN bc9 <= 0 THEN NULL
        |    ELSE -ln(bc9 / 1e9) END, 6) AS bhatt_dist,
        |  round(tv9 / 2e9, 6) AS tv_dist
        |FROM sums""".stripMargin,
    "q_croston" ->
      """WITH RECURSIVE dly AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM dly),
        |cal AS (
        |  SELECT row_number() OVER (ORDER BY d.day) AS i,
        |    CAST(coalesce(dly.x, 0) AS DOUBLE) AS x
        |  FROM (SELECT unnest(generate_series(mn, mx)) AS day
        |        FROM bounds) d
        |  LEFT JOIN dly ON dly.day = d.day),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM cal),
        |rec AS (
        |  SELECT CAST(0 AS BIGINT) AS i, CAST(0.0 AS DOUBLE) AS z,
        |    CAST(0.0 AS DOUBLE) AS p,
        |    CAST(0 AS BIGINT) AS last_i, CAST(0 AS BIGINT) AS seen
        |  UNION ALL
        |  SELECT r.i + 1,
        |    CASE WHEN c.x > 0.0 THEN
        |      CASE WHEN r.seen = 0 THEN c.x
        |        ELSE 0.2 * c.x + 0.8 * r.z END
        |    ELSE r.z END,
        |    CASE WHEN c.x > 0.0 THEN
        |      CASE WHEN r.seen = 0 THEN CAST(r.i + 1 AS DOUBLE)
        |        ELSE 0.2 * CAST(r.i + 1 - r.last_i AS DOUBLE) +
        |          0.8 * r.p END
        |    ELSE r.p END,
        |    CASE WHEN c.x > 0.0 THEN r.i + 1 ELSE r.last_i END,
        |    CASE WHEN c.x > 0.0 THEN r.seen + 1 ELSE r.seen END
        |  FROM rec r JOIN cal c ON c.i = r.i + 1)
        |SELECT nd AS n_days, seen AS n_demand,
        |  round(z, 4) AS size_hat, round(p, 4) AS interval_hat,
        |  round(CASE WHEN seen = 0 THEN NULL ELSE z / p END, 6)
        |    AS demand_rate
        |FROM rec CROSS JOIN n WHERE i = nd""".stripMargin,
    "q_gini_stump" ->
      """WITH e AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |bv AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS f,
        |    CAST(sum(y) AS BIGINT) AS p
        |  FROM e GROUP BY 1),
        |run AS (
        |  SELECT v, CAST(sum(f) OVER (ORDER BY v) AS BIGINT) AS nl,
        |    CAST(sum(p) OVER (ORDER BY v) AS BIGINT) AS pl
        |  FROM bv),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |    CAST(sum(y) AS BIGINT) AS pp FROM e),
        |sc AS (
        |  SELECT v, nl, pl, nn - nl AS nr, pp - pl AS pr, nn, pp,
        |    CAST(round((CAST(pl AS DOUBLE) * (nl - pl) / nl +
        |      CAST(pp - pl AS DOUBLE) * ((nn - nl) - (pp - pl)) /
        |      (nn - nl)) * 1e9) AS BIGINT) AS c9
        |  FROM run CROSS JOIN tot WHERE nl < nn),
        |best AS (SELECT * FROM sc ORDER BY c9 ASC, v ASC LIMIT 1)
        |SELECT v AS split_cents, nl AS n_left, nr AS n_right,
        |  round(CAST(pl AS DOUBLE) / nl, 6) AS rate_left,
        |  round(CAST(pr AS DOUBLE) / nr, 6) AS rate_right,
        |  round((CAST(pp AS DOUBLE) * (nn - pp) / nn - c9 / 1e9) *
        |    2.0 / nn, 9) AS gini_gain
        |FROM best""".stripMargin,
    "q_iv_woe" ->
      """WITH bands AS (
        |  SELECT least(4, CAST(floor(value / 100) AS BIGINT)) AS band,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS good
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(good) AS BIGINT) AS gg,
        |    CAST(sum(n - good) AS BIGINT) AS bb FROM bands),
        |w AS (
        |  SELECT band, n, good, n - good AS bad, gg, bb,
        |    CASE WHEN good = 0 OR n - good = 0 THEN NULL
        |      ELSE ln((CAST(good AS DOUBLE) / gg) /
        |        (CAST(n - good AS DOUBLE) / bb)) END AS woe_raw
        |  FROM bands CROSS JOIN tot),
        |r AS (
        |  SELECT band, n, good, bad, round(woe_raw, 6) AS woe,
        |    CASE WHEN woe_raw IS NULL THEN 0
        |      ELSE CAST(round((CAST(good AS DOUBLE) / gg -
        |        CAST(bad AS DOUBLE) / bb) * woe_raw * 1e9) AS BIGINT)
        |      END AS iv9
        |  FROM w),
        |t2 AS (SELECT CAST(sum(iv9) AS BIGINT) AS iv9t FROM r)
        |SELECT band, n, good, bad, woe,
        |  round(iv9 / 1e9, 6) AS iv_term,
        |  round(iv9t / 1e9, 6) AS iv_total
        |FROM r CROSS JOIN t2 ORDER BY band""".stripMargin,
    "q_reg_discontinuity" ->
      """WITH t AS (
        |  SELECT n_chars,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_tokens,
        |    len(regexp_extract_all(text, '\b(the|a)\b')) AS stop_cnt,
        |    len(regexp_extract_all(text, '[0-9]')) AS dig_cnt,
        |    length(text) AS lc
        |  FROM documents WHERE n_chars >= 150 AND n_chars < 450),
        |yb AS (
        |  SELECT (n_chars >= 300) AS r,
        |    CAST(n_chars - 300 AS BIGINT) AS u,
        |    CASE WHEN -2.0 + 0.9 * ln(1.0 + n_tokens)
        |      - 3.0 * (CAST(stop_cnt AS DOUBLE) / n_tokens)
        |      - 0.5 * (CAST(dig_cnt AS DOUBLE) / greatest(lc, 1))
        |      + 0.2 * (CAST(lc - (n_tokens - 1) AS DOUBLE) / n_tokens)
        |      >= 0.0 THEN 1 ELSE 0 END AS y
        |  FROM t),
        |side AS (
        |  SELECT r, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(u) AS BIGINT) AS su,
        |    CAST(sum(u * u) AS BIGINT) AS su2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(u * y) AS BIGINT) AS suy
        |  FROM yb GROUP BY 1),
        |fit AS (
        |  SELECT r, n,
        |    (CAST(n AS DOUBLE) * suy - CAST(su AS DOUBLE) * sy) /
        |      (CAST(n AS DOUBLE) * su2 - CAST(su AS DOUBLE) * su) AS b,
        |    su, sy
        |  FROM side),
        |fit2 AS (
        |  SELECT r, n, round(b, 6) AS slope,
        |    (sy - b * su) / CAST(n AS DOUBLE) AS a0
        |  FROM fit)
        |SELECT l.n AS n_left, rr.n AS n_right,
        |  round(l.a0, 6) AS int_left, round(rr.a0, 6) AS int_right,
        |  l.slope AS slope_left, rr.slope AS slope_right,
        |  round(rr.a0 - l.a0, 6) AS rdd_tau
        |FROM (SELECT * FROM fit2 WHERE NOT r) l
        |CROSS JOIN (SELECT * FROM fit2 WHERE r) rr""".stripMargin,
    "q_hodges_lehmann" ->
      """WITH dly AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT CAST(a.x + b.x AS BIGINT) AS w
        |  FROM dly a JOIN dly b ON a.day <= b.day),
        |hist AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM p
        |         GROUP BY 1),
        |run AS (
        |  SELECT w, CAST(sum(f) OVER (ORDER BY w) AS BIGINT) AS cum
        |  FROM hist),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS np FROM p),
        |med AS (
        |  SELECT CAST(min(w) AS BIGINT) AS wmed,
        |    CAST(max(np) AS BIGINT) AS np
        |  FROM run CROSS JOIN tot WHERE cum * 2 >= np)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM dly) AS n_days,
        |  np AS n_pairs, round(wmed / 2.0, 1) AS hl_location
        |FROM med""".stripMargin,
    "q_jarque_bera" ->
      """WITH sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s1,
        |    CAST(sum(CAST(v * v AS HUGEINT)) AS HUGEINT) AS s2,
        |    CAST(sum(CAST(v * v AS HUGEINT) * v) AS HUGEINT) AS s3,
        |    CAST(sum(CAST(v * v AS HUGEINT) * (v * v)) AS HUGEINT)
        |      AS s4
        |  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS v
        |        FROM events) t),
        |m AS (
        |  SELECT n,
        |    CAST(s1 AS DOUBLE) / n AS mu,
        |    CAST(s2 AS DOUBLE) / n AS r2,
        |    CAST(s3 AS DOUBLE) / n AS r3,
        |    CAST(s4 AS DOUBLE) / n AS r4
        |  FROM sums),
        |c AS (
        |  SELECT n, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 -
        |      3.0 * mu * mu * mu * mu AS m4
        |  FROM m),
        |f AS (
        |  SELECT n, m3 / sqrt(m2 * m2 * m2) AS skew,
        |    m4 / (m2 * m2) - 3.0 AS kurt
        |  FROM c)
        |SELECT n AS n_events, round(skew, 6) AS skewness,
        |  round(kurt, 6) AS excess_kurtosis,
        |  round(n / 6.0 * (skew * skew + kurt * kurt / 4.0), 4)
        |    AS jb_stat,
        |  round(exp(-(n / 6.0 * (skew * skew + kurt * kurt / 4.0))
        |    / 2.0), 9) AS p_value
        |FROM f""".stripMargin,
    "q_durbin_watson" ->
      """WITH dly AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT min(day) AS mn, max(day) AS mx FROM dly),
        |cal AS (
        |  SELECT row_number() OVER (ORDER BY d.day) AS t,
        |    CAST(coalesce(dly.cents, 0) AS BIGINT) AS y
        |  FROM (SELECT unnest(generate_series(mn, mx)) AS day
        |        FROM bounds) d
        |  LEFT JOIN dly ON dly.day = d.day),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(t) AS BIGINT) AS st,
        |    CAST(sum(t * t) AS BIGINT) AS st2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(t * y) AS BIGINT) AS sty
        |  FROM cal),
        |ab AS (
        |  SELECT nd, sy,
        |    (CAST(nd AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy) /
        |      (CAST(nd AS DOUBLE) * st2 - CAST(st AS DOUBLE) * st) AS b,
        |    st,
        |    CASE WHEN sy = 0 THEN 1.0
        |      ELSE CAST(sy AS DOUBLE) / nd END AS ybar
        |  FROM s),
        |ab2 AS (
        |  SELECT nd, b, ybar,
        |    (sy - b * st) / CAST(nd AS DOUBLE) AS a
        |  FROM ab),
        |e AS (
        |  SELECT cal.t,
        |    (CAST(cal.y AS DOUBLE) - ab2.a - ab2.b * cal.t) / ab2.ybar
        |      AS e,
        |    ab2.nd, ab2.b, ab2.a
        |  FROM cal CROSS JOIN ab2),
        |terms AS (
        |  SELECT nd, b, a,
        |    CAST(round(e * e * 1e12) AS BIGINT) AS d12,
        |    CASE WHEN t >= 2 THEN CAST(round(
        |      (e - lag(e) OVER (ORDER BY t)) *
        |      (e - lag(e) OVER (ORDER BY t)) * 1e12) AS BIGINT)
        |      ELSE 0 END AS n12
        |  FROM e),
        |agg AS (
        |  SELECT CAST(max(nd) AS BIGINT) AS n_days,
        |    round(max(b), 6) AS slope, round(max(a), 2) AS intercept,
        |    CAST(sum(d12) AS BIGINT) AS den12,
        |    CAST(sum(n12) AS BIGINT) AS num12
        |  FROM terms)
        |SELECT n_days, slope, intercept,
        |  round(CASE WHEN den12 = 0 THEN NULL
        |    ELSE CAST(num12 AS DOUBLE) / den12 END, 6) AS dw,
        |  round(CASE WHEN den12 = 0 THEN NULL
        |    ELSE 1.0 - CAST(num12 AS DOUBLE) / den12 / 2.0 END, 6)
        |    AS rho1_approx
        |FROM agg""".stripMargin,
    "q_cochran_armitage" ->
      """WITH bands AS (
        |  SELECT least(4, CAST(floor(value / 100) AS BIGINT)) AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS r
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(r) AS BIGINT) AS rr,
        |    CAST(sum(n * g) AS BIGINT) AS sng,
        |    CAST(sum(n * g * g) AS BIGINT) AS sng2,
        |    CAST(sum(r * g) AS BIGINT) AS srg,
        |    CAST(count(*) AS BIGINT) AS n_bands
        |  FROM bands),
        |zc AS (
        |  SELECT nn, n_bands, rr,
        |    (CAST(srg AS DOUBLE) -
        |      (CAST(rr AS DOUBLE) / nn) * CAST(sng AS DOUBLE)) /
        |    sqrt((CAST(rr AS DOUBLE) / nn) *
        |      (1.0 - CAST(rr AS DOUBLE) / nn) *
        |      (CAST(sng2 AS DOUBLE) -
        |        CAST(sng AS DOUBLE) * sng / nn)) AS z
        |  FROM tot),
        |pv AS (
        |  SELECT nn, n_bands, rr, z, abs(z) / sqrt(2.0) AS x,
        |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
        |  FROM zc)
        |SELECT nn AS n_events, n_bands, rr AS n_purchases,
        |  round(z, 6) AS z,
        |  round(((((1.061405429 * tt - 1.453152027) * tt +
        |    1.421413741) * tt - 0.284496736) * tt + 0.254829592) * tt *
        |    exp(-x * x), 9) AS p_value
        |FROM pv""".stripMargin,
    "q_cronbach_alpha" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type AS t,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT d.day, ty.t, CAST(coalesce(c.x, 0) AS BIGINT) AS x
        |  FROM (SELECT DISTINCT day FROM c) d
        |  CROSS JOIN (SELECT DISTINCT t FROM c) ty
        |  LEFT JOIN c ON c.day = d.day AND c.t = ty.t),
        |item AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(x * x) AS BIGINT) AS s2
        |  FROM grid GROUP BY 1),
        |items AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(
        |      (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /
        |      (CAST(n AS DOUBLE) * (n - 1.0)) * 1e6) AS BIGINT))
        |      AS BIGINT) AS iv6
        |  FROM item),
        |daytot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(sx) AS BIGINT) AS t1,
        |    CAST(sum(sx * sx) AS BIGINT) AS t2
        |  FROM (SELECT day, CAST(sum(x) AS BIGINT) AS sx FROM grid
        |        GROUP BY 1) q),
        |f AS (
        |  SELECT k, n, iv6,
        |    (CAST(nd AS DOUBLE) * t2 - CAST(t1 AS DOUBLE) * t1) /
        |      (CAST(nd AS DOUBLE) * (nd - 1.0)) AS vart
        |  FROM items CROSS JOIN daytot)
        |SELECT k AS k_items, n AS n_days,
        |  round(iv6 / 1e6, 4) AS sum_item_var,
        |  round(vart, 4) AS total_var,
        |  round(CASE WHEN k <= 1 OR vart <= 0.0 THEN NULL
        |    ELSE CAST(k AS DOUBLE) / (k - 1.0) *
        |      (1.0 - iv6 / 1e6 / vart) END, 6) AS alpha
        |FROM f""".stripMargin,
    "q_stratified_topk" ->
      """SELECT doc_id, source, rn FROM (
        |  SELECT doc_id, source, CAST(row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY md5('strat-' || CAST(doc_id AS VARCHAR)),
        |        doc_id) AS INTEGER) AS rn
        |  FROM documents) t
        |WHERE rn <= 10 ORDER BY source, rn""".stripMargin,
    "q_rake" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    generate_subscripts(string_split(text, ' '), 1) AS pos,
         |    unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |isl AS (
         |  SELECT doc_id, pos, w,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
         |      AS grp
         |  FROM toks WHERE w NOT IN ($stopsSql)),
         |occ AS (
         |  SELECT doc_id, pos, w, grp,
         |    CAST(count(*) OVER (PARTITION BY doc_id, grp) AS BIGINT)
         |      AS plen
         |  FROM isl),
         |ws AS (
         |  SELECT w, CAST(round(CAST(sum(plen) AS DOUBLE) * 1e6 /
         |      count(*)) AS BIGINT) AS scorei
         |  FROM occ GROUP BY 1),
         |phr AS (
         |  SELECT doc_id, grp, string_agg(w, ' ' ORDER BY pos) AS phrase
         |  FROM isl GROUP BY 1, 2),
         |psc AS (
         |  SELECT o.doc_id, o.grp, CAST(sum(ws.scorei) AS BIGINT) AS si
         |  FROM occ o JOIN ws ON ws.w = o.w GROUP BY 1, 2)
         |SELECT phrase, n_occur, round(si / 1e6, 6) AS score FROM (
         |  SELECT p.phrase, CAST(count(*) AS BIGINT) AS n_occur,
         |    CAST(max(s.si) AS BIGINT) AS si
         |  FROM phr p JOIN psc s ON s.doc_id = p.doc_id AND s.grp = p.grp
         |  GROUP BY 1) t
         |ORDER BY score DESC, phrase LIMIT 15""".stripMargin
  )
}
