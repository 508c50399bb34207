package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Model-evaluation operators — the QA half of a training-data pipeline:
  * once heuristics (lang-id, quality scores) gate 100 TB of data, someone
  * has to measure how good the gates are against labeled truth.
  *
  *  - q_kappa: Cohen's kappa between the lang-id heuristic (TextOps
  *    q_lang_id's exact rule) and the true `lang` column — chance-
  *    corrected agreement, the standard labeler-QA statistic;
  *  - q_auc: ROC-AUC of the quality score as a predictor of lang='en',
  *    via the Mann-Whitney rank-sum identity with midrank tie handling.
  *
  * Exactness: both reduce to INTEGER contingency/rank arithmetic — the
  * only floating-point operations are the final divisions, mirrored
  * op-for-op in the DuckDB oracles. The AUC rank sum is kept ×2 scaled
  * (midranks are halves) so it stays an exact BIGINT under any partition
  * order.
  */
object Evaluation {
  type Q = (SparkSession, String) => DataFrame

  /** The q_lang_id prediction rule (kept textually identical). */
  private def predLang = {
    val nonAscii =
      size(regexp_extract_all(col("text"), lit("[^\\x00-\\x7f]"), lit(0)))
    val theCnt =
      size(regexp_extract_all(col("text"), lit("\\bthe\\b"), lit(0)))
    when(nonAscii > 0, "zh").when(theCnt >= 3, "en").otherwise("unknown")
  }

  /** The Pipeline/TextOps quality score (textually identical formula). */
  private def quality = {
    val nTokens = (length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
    val stopCnt =
      size(regexp_extract_all(col("text"), lit("\\b(the|a)\\b"), lit(0)))
        .cast(LongType)
    val stopRatio = round(stopCnt.cast("double") / nTokens, 6)
    round(log(lit(1.0) + nTokens) * (lit(1.0) - stopRatio), 6)
  }

  val queries: Map[String, Q] = Map(
    // ---- Cohen's kappa: observed agreement po vs chance agreement pe
    // from the marginals; kappa = (po − pe) / (1 − pe). Scale shape: one
    // map stage computes predictions, then THREE label-bounded aggregates
    // (diagonal count + two marginal tables, joined on the label —
    // |labels| rows each, broadcast); the corpus shuffles nothing but
    // label keys.
    // ---- rank-biased overlap (Webber, Moffat & Zobel 2010), truncated
    // at depth 20, p = 0.9 — "how similar are two sources' vocabulary
    // rankings?", the top-weighted comparison Kendall's τ gets wrong
    // for rankings where only the head matters. Per source the top-20
    // words rank by (count desc, word asc) — deterministic ties — and
    // the pairwise term Σ_d p^d·|A∩B@d|/d regroups PER WORD: a word at
    // ranks (ra, rb) contributes Σ_{d≥max(ra,rb)} p^d/d, so the whole
    // statistic is one keyed word join against a 20-row weight frame.
    // Scale: the corpus prices one (source, word) count; rankings and
    // weights are top-k-bounded frames.
    "q_rbo" -> ((s, d) => {
      val sc = graft.CacheScope.cached(Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c")))
      val s1 = sc.agg(min("source").as("s1"))
      val s2 = sc.crossJoin(broadcast(s1))
        .filter(col("source") > col("s1"))
        .agg(min("source").as("s2"))
      val rw = Window.partitionBy("source")
        .orderBy(col("c").desc, col("w").asc)
      val ranked = sc.withColumn("r", row_number().over(rw))
        .filter(col("r") <= 20)
      val a = ranked.crossJoin(broadcast(s1))
        .filter(col("source") === col("s1"))
        .select(col("w"), col("r").as("ra"))
      val b = ranked.crossJoin(broadcast(s2))
        .filter(col("source") === col("s2"))
        .select(col("w"), col("r").as("rb"))
      val joined = a.join(b, "w")
        .select(col("w"), greatest(col("ra"), col("rb")).as("m"))
      // weights quantize to exact pico-units so the term sum is an
      // integer under ANY partial-aggregation order (q_entropy
      // discipline); the 0.9^d doubles themselves are bit-identical
      // across engines (same pow, same inputs)
      val weights = s.range(1, 21).toDF("dd")
        .select(col("dd").cast("int").as("dd"),
          round(pow(lit(0.9), col("dd")) / col("dd") * 1e12)
            .cast(LongType).as("wtp"))
      val contrib = joined.join(broadcast(weights), col("dd") >= col("m"))
        .agg(sum("wtp").as("swp"), count_distinct(col("w")).as("n_common"))
      contrib.select(col("n_common"),
        round(col("swp").cast("double") / 1e12 * (lit(1.0) - 0.9) / 0.9, 6)
          .as("rbo"))
    }),

    // ---- Matthews correlation of the lang-id gate as a binary
    // 'en' detector vs truth — the single-number confusion summary
    // that stays honest under class imbalance (accuracy and even F1
    // inflate when one class dominates; MCC cannot). Confusion cells
    // are exact counts; the four marginal products ride in
    // DECIMAL(38,0) (they square the corpus scale), and MCC is one
    // double expression. Complements q_kappa (chance-corrected
    // agreement) and q_prf (per-class P/R/F).
    "q_mcc" -> ((s, d) => {
      val agg = Tables.documents(s, d)
        .select((predLang === "en").as("p"), (col("lang") === "en").as("t"))
        .agg(
          sum(when(col("p") && col("t"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("p") && !col("t"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("p") && col("t"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("p") && !col("t"), 1L).otherwise(0L)).as("tn"))
      def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      val num = (d38(col("tp")) * col("tn") -
        d38(col("fp")) * col("fn")).cast("double")
      val den = sqrt((d38(col("tp") + col("fp")) *
        (col("tp") + col("fn")) * (col("tn") + col("fp")) *
        (col("tn") + col("fn"))).cast("double"))
      agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(when(den === 0.0, lit(null)).otherwise(num / den), 6)
          .as("mcc"))
    }),

    "q_kappa" -> ((s, d) => {
      val preds = graft.CacheScope.cached(
        Tables.documents(s, d)
          .transform(Tables.fanoutReady)
          .select(col("lang"), predLang.as("pred")))
      val tot = preds.agg(count(lit(1)).as("n"),
        sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("diag"))
      val tm = preds.groupBy(col("lang").as("lbl")).agg(count(lit(1)).as("ct"))
      val pm = preds.groupBy(col("pred").as("lbl")).agg(count(lit(1)).as("cp"))
      val chance = tm.join(pm, Seq("lbl"))
        .agg(sum(col("ct") * col("cp")).as("x"))
      tot.crossJoin(broadcast(chance))
        .select(col("n"),
          round(col("diag").cast("double") / col("n"), 6).as("po"),
          round(col("x").cast("double") / (col("n") * col("n")), 6).as("pe"))
        .select(col("n"), col("po"), col("pe"),
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)
            .as("kappa"))
    }),

    // ---- calibration curve of the logistic quality classifier
    // (q_quality_logit's exact formula): bin predicted P(keep) into 10
    // fixed-width bins, compare mean prediction vs observed lang='en'
    // rate per bin — the reliability diagram that decides whether the
    // gate's probabilities can be thresholded as probabilities. The
    // rounded score × 1e6 is integral, so per-bin mean prediction is an
    // exact integer sum; scale shape is one map stage + one 10-key agg.
    "q_calibration" -> ((s, d) => {
      val nTok = (length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
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
      val score = round(lit(1.0) / (lit(1.0) + exp(-x)), 6)
      Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(least(lit(9L), floor(score * 10).cast("long")).as("bin"),
          round(score * 1e6).cast("long").as("s6"),
          when(col("lang") === "en", 1L).otherwise(0L).as("en"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("s6").as("ss"), sum("en").as("ne"))
        .select(col("bin"), col("n"),
          round(col("ss").cast("double") / col("n") / 1e6, 6)
            .as("mean_pred"),
          round(col("ne").cast("double") / col("n"), 6).as("obs_en"))
        .orderBy("bin")
    }),

    // ---- isotonic calibration (PAV by the minimax identity): fit the
    // best NON-DECREASING mapping from quality-score bins to observed
    // lang='en' rate — what turns a ranker's scores into usable
    // probabilities when the reliability diagram (q_calibration) shows
    // them mis-calibrated. Pool-adjacent-violators is inherently
    // sequential, but its L2 solution has the closed minimax form
    //   fitted(i) = max_{k<=i} min_{j>=i} weightedMean(y, bins k..j),
    // which is pure relational algebra over the BIN table. The 100 TB
    // shape: the corpus collapses to <=20 equal-width score bins in one
    // map-side-combined aggregation; the O(B^3) minimax then runs on
    // broadcast-tiny frames (8000 combinations at B=20) — the binning
    // is the scale reduction, the cubic part never sees corpus rows.
    // Integer prefix sums end to end; one double division at the leaf.
    "q_isotonic" -> ((s, d) => {
      val nTok = (length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
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
      val score = round(lit(1.0) / (lit(1.0) + exp(-x)), 6)
      val bins = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(least(lit(19L), floor(score * 20).cast(LongType)).as("bin"),
          when(col("lang") === "en", 1L).otherwise(0L).as("en"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("en").as("ysum"))
      // <=20 rows from here down — the unpartitioned window is bounded
      // by construction (the q_lorenz decile discipline)
      val w = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = bins.select(col("bin"), col("n"), col("ysum"),
        sum("n").over(w).as("q"), sum("ysum").over(w).as("p"))
      val iF = pre.select(col("bin").as("ib"))
      val kF = pre.select(col("bin").as("kb"),
        (col("q") - col("n")).as("f"), (col("p") - col("ysum")).as("e"))
      val jF = pre.select(col("bin").as("jb"),
        col("q").as("qj"), col("p").as("pj"))
      val fit = iF.join(broadcast(kF), col("kb") <= col("ib"))
        .join(broadcast(jF), col("jb") >= col("ib"))
        .groupBy("ib", "f", "e")
        .agg(min((col("pj") - col("e")).cast("double") /
          (col("qj") - col("f"))).as("mn"))
        .groupBy("ib").agg(max("mn").as("fitted"))
      bins.join(broadcast(fit), col("bin") === col("ib"))
        .select(col("bin"), col("n"),
          round(col("ysum").cast("double") / col("n"), 6).as("raw_rate"),
          round(col("fitted"), 6).as("iso_rate"))
        .orderBy("bin")
    }),

    // ---- ROC-AUC via the rank-sum identity: rank all scores ascending
    // with MIDRANKS for ties, then
    //   AUC = (Σ ranks(pos) − np(np+1)/2) / (np·nn).
    // The rank sum is computed ×2 (midranks are halves) so it is an
    // exact integer: srp2 = Σ cp·(2·before + c + 1) over DISTINCT
    // scores. Scale shape: the corpus collapses to per-distinct-score
    // (cp, cn) counts first, then the prefix-count runs through the
    // two-phase GlobalRank.withPrefixAggs (range-repartition + local
    // prefix + broadcast offsets) — no single task ever holds the whole
    // score domain, which matters because a 6-dp double score over a
    // 100 TB corpus can reach millions of distinct values (VERDICT r6).
    "q_auc" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(quality.as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val byScore = scored.groupBy("score")
        .agg(sum("pos").as("cp"),
          sum(lit(1L) - col("pos")).as("cn"))
        .withColumn("c", col("cp") + col("cn"))
      val ranked = graft.operators.GlobalRank.withPrefixAggs(byScore,
        Seq(col("score")),
        Seq(graft.operators.GlobalRank.PrefixAgg("c", "before")))
      ranked
        .select((col("cp") * (lit(2L) * col("before") + col("c") + 1))
          .as("t"), col("cp"), col("cn"))
        .agg(sum("t").as("srp2"), sum("cp").as("np"), sum("cn").as("nn"))
        .select(col("np"), col("nn"),
          round((col("srp2") - col("np") * (col("np") + 1)).cast("double")
            / (lit(2.0) * col("np") * col("nn")), 6).as("auc"))
    }),

    // ---- MAD robust outlier gate: per-group median absolute deviation
    // and the count of robust-z outliers (|x − med| > 3·1.4826·MAD) —
    // the outlier detector that, unlike q_zscore, a heavy tail cannot
    // poison (mean/stddev move with the outliers; medians don't). Both
    // medians run exact via the (group, value, freq) pre-agg (per-group
    // state bounded by DISTINCT values, the q_percentiles discipline);
    // the deviations pass joins the 4-row median table back broadcast.
    "q_mad" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .transform(Tables.fanoutReady)
        .select("event_type", "value")
      val med = ev.groupBy("event_type", "value").agg(count(lit(1)).as("f"))
        .groupBy("event_type")
        .agg(expr("percentile(value, 0.5, f)").as("med"))
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type", "adev").agg(count(lit(1)).as("f"))
        .groupBy("event_type")
        .agg(expr("percentile(adev, 0.5, f)").as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(max("med"), 6).as("median"),
          round(max("mad"), 6).as("mad"),
          sum(when(col("adev") > lit(4.4478) * col("mad"), 1L)
            .otherwise(0L)).as("n_outlier"))
        .orderBy("event_type")
    }),

    // ---- per-class precision / recall / F1 of the n-gram lang-id
    // classifier (q_kappa's confusion marginals, exposed per class).
    // tp/fp/fn derive from three label-bounded aggregates over the
    // cached prediction frame; F1 uses the single-ratio form
    // 2tp/(2tp+fp+fn) — one exact integer division, no p·r/(p+r)
    // float chain. Classes never predicted get NULL precision; rows
    // are the observed classes (support ≥ 1 by construction).
    "q_prf" -> ((s, d) => {
      val preds = graft.CacheScope.cached(
        Tables.documents(s, d)
          .transform(Tables.fanoutReady)
          .select(col("lang"), predLang.as("pred")))
      val actual = preds.groupBy(col("lang").as("cls"))
        .agg(count(lit(1)).as("support"))
      val predicted = preds.groupBy(col("pred").as("cls"))
        .agg(count(lit(1)).as("n_pred"))
      val tp = preds.filter(col("pred") === col("lang"))
        .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("tp"))
      actual
        .join(predicted, Seq("cls"), "left")
        .join(tp, Seq("cls"), "left")
        .na.fill(0L, Seq("n_pred", "tp"))
        .select(col("cls"), col("support"), col("tp"),
          (col("n_pred") - col("tp")).as("fp"),
          (col("support") - col("tp")).as("fn"))
        .select(col("cls"), col("support"), col("tp"), col("fp"),
          col("fn"),
          round(when(col("tp") + col("fp") === 0, lit(null))
            .otherwise(col("tp").cast("double") /
              (col("tp") + col("fp")).cast("double")), 6).as("precision"),
          round(col("tp").cast("double") /
            col("support").cast("double"), 6).as("recall"),
          round(lit(2.0) * col("tp").cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"),
            6).as("f1"))
        .orderBy("cls")
    }),

    // ---- decile lift curve of the quality score against lang='en' —
    // the ranking-quality companion to q_auc (threshold-free) and
    // q_calibration (probability quality): sort the corpus by score,
    // cut into 10 EQUAL-COUNT bins, report per-bin positive rate over
    // the base rate. Equal-count deciles need the exact global rank of
    // every document — a corpus-sized frame, so the rank runs through
    // the two-phase GlobalRank.withRowNumber, never a single-partition
    // window; the 1-row totals broadcast back for the bin arithmetic.
    "q_lift_curve" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), quality.as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val ranked = graft.operators.GlobalRank.withRowNumber(scored, "rn",
        Seq(col("score").desc, col("doc_id").asc))
      val tot = scored.agg(count(lit(1)).as("nt"), sum("pos").as("np"))
      ranked.crossJoin(broadcast(tot))
        .select(expr("((CAST(rn AS BIGINT) - 1) * 10) DIV nt").as("decile"),
          col("pos"), col("nt"), col("np"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum("pos").as("n_pos"),
          round((sum("pos").cast("double") * max("nt").cast("double")) /
            (count(lit(1)).cast("double") * max("np").cast("double")), 4)
            .as("lift"))
        .orderBy("decile")
    }),

    // ---- logistic regression P(purchase | value), intercept + slope,
    // two Newton–Raphson steps from β = (0, 0) — the trainable sibling
    // of q_quality_logit's fixed-weight gate (q_groupreg is the OLS
    // analog). Each step is ONE aggregation of five sufficient sums
    // (Σw, Σwx, Σwx², Σ(y−p), Σ(y−p)x for w = p(1−p)) with the current
    // β broadcast as a 1-row side; the 2×2 normal equations solve by
    // Cramer on the driver-free 1-row frame. Exactness: every per-row
    // term rounds to nano-units and accumulates in DECIMAL(38,0), so
    // the sums — and therefore each β step — are identical under any
    // partition order and any engine; the oracle replays the same two
    // steps textually.
    "q_logit_fit" -> ((s, d) => {
      val base = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("value").cast("double").as("x"),
          when(col("event_type") === "purchase", 1.0).otherwise(0.0)
            .as("y"))
      def step(bf: DataFrame): DataFrame = {
        val dec = (c: org.apache.spark.sql.Column) =>
          sum(round(c * 1e9).cast("decimal(38,0)"))
        val p = lit(1.0) /
          (lit(1.0) + exp(-(col("b0") + col("b1") * col("x"))))
        val w = p * (lit(1.0) - p)
        val agg = base.crossJoin(broadcast(bf)).agg(
          dec(w).as("sw"), dec(w * col("x")).as("swx"),
          dec(w * col("x") * col("x")).as("swx2"),
          dec(col("y") - p).as("sr"),
          dec((col("y") - p) * col("x")).as("srx"),
          max("b0").as("pb0"), max("b1").as("pb1"))
        val dbl = (n: String) => col(n).cast("double") / 1e9
        val (sw, swx, swx2, sr, srx) =
          (dbl("sw"), dbl("swx"), dbl("swx2"), dbl("sr"), dbl("srx"))
        val det = sw * swx2 - swx * swx
        agg.select(
          (col("pb0") + (sr * swx2 - srx * swx) / det).as("b0"),
          (col("pb1") + (sw * srx - swx * sr) / det).as("b1"))
      }
      val bz = s.range(1).select(lit(0.0).as("b0"), lit(0.0).as("b1"))
      val b2 = step(step(bz))
      base.agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(b2))
        .select(col("n"), round(col("b0"), 6).as("b0"),
          round(col("b1"), 6).as("b1"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_rbo" ->
      """WITH sc AS MATERIALIZED (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |p1 AS (SELECT min(source) AS s1 FROM sc),
        |p2 AS (SELECT min(source) AS s2 FROM sc CROSS JOIN p1
        |       WHERE source > p1.s1),
        |ranked AS (
        |  SELECT source, w,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY c DESC, w ASC) AS INTEGER) AS r
        |  FROM sc QUALIFY r <= 20),
        |a AS (SELECT w, r AS ra FROM ranked CROSS JOIN p1
        |      WHERE source = p1.s1),
        |b AS (SELECT w, r AS rb FROM ranked CROSS JOIN p2
        |      WHERE source = p2.s2),
        |j AS (SELECT a.w, greatest(a.ra, b.rb) AS m
        |      FROM a JOIN b USING (w)),
        |weights AS (
        |  SELECT CAST(dd AS INTEGER) AS dd,
        |    CAST(round(pow(0.9, dd) / dd * 1e12) AS BIGINT) AS wtp
        |  FROM generate_series(1, 20) AS t(dd)),
        |contrib AS (
        |  SELECT CAST(sum(wtp) AS BIGINT) AS swp,
        |    CAST(count(DISTINCT j.w) AS BIGINT) AS n_common
        |  FROM j JOIN weights ON weights.dd >= j.m)
        |SELECT n_common,
        |  round(CAST(swp AS DOUBLE) / 1e12 * (1.0 - 0.9) / 0.9, 6) AS rbo
        |FROM contrib""".stripMargin,
    "q_mcc" ->
      """WITH p AS (
        |  SELECT (CASE WHEN len(regexp_extract_all(text, '[^\x00-\x7f]'))
        |        > 0 THEN 'zh'
        |      WHEN len(regexp_extract_all(text, '\bthe\b')) >= 3 THEN 'en'
        |      ELSE 'unknown' END) = 'en' AS pr,
        |    lang = 'en' AS tr
        |  FROM documents),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN pr AND tr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS tp,
        |  CAST(sum(CASE WHEN pr AND NOT tr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS fp,
        |  CAST(sum(CASE WHEN NOT pr AND tr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS fn,
        |  CAST(sum(CASE WHEN NOT pr AND NOT tr THEN 1 ELSE 0 END)
        |    AS BIGINT) AS tn
        |  FROM p)
        |SELECT tp, fp, fn, tn,
        |  round(CASE WHEN sqrt(CAST(
        |      CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn)
        |      AS DOUBLE)) = 0.0 THEN NULL
        |    ELSE CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
        |        AS DOUBLE) /
        |      sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp)
        |        * (tn + fn) AS DOUBLE)) END, 6) AS mcc
        |FROM a""".stripMargin,
    "q_kappa" ->
      """WITH p AS (
        |  SELECT lang,
        |    CASE WHEN len(regexp_extract_all(text, '[^\x00-\x7f]')) > 0
        |      THEN 'zh'
        |    WHEN len(regexp_extract_all(text, '\bthe\b')) >= 3 THEN 'en'
        |    ELSE 'unknown' END AS pred
        |  FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END)
        |            AS BIGINT) AS diag FROM p),
        |tm AS (SELECT lang AS lbl, CAST(count(*) AS BIGINT) AS ct
        |       FROM p GROUP BY 1),
        |pm AS (SELECT pred AS lbl, CAST(count(*) AS BIGINT) AS cp
        |       FROM p GROUP BY 1),
        |ch AS (SELECT CAST(sum(ct * cp) AS BIGINT) AS x
        |       FROM tm JOIN pm ON pm.lbl = tm.lbl),
        |r AS (
        |  SELECT n, round(CAST(diag AS DOUBLE) / n, 6) AS po,
        |    round(CAST(x AS DOUBLE) / (n * n), 6) AS pe
        |  FROM tot CROSS JOIN ch)
        |SELECT n, po, pe, round((po - pe) / (1.0 - pe), 6) AS kappa
        |FROM r""".stripMargin,
    "q_calibration" ->
      """WITH f AS (
        |  SELECT lang,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_tokens,
        |    len(regexp_extract_all(text, '\b(the|a)\b')) AS stop_cnt,
        |    len(regexp_extract_all(text, '[0-9]')) AS dig_cnt,
        |    length(text) AS lc
        |  FROM documents),
        |x AS (
        |  SELECT lang,
        |    -2.0 + 0.9 * ln(1.0 + n_tokens)
        |      - 3.0 * (CAST(stop_cnt AS DOUBLE) / n_tokens)
        |      - 0.5 * (CAST(dig_cnt AS DOUBLE)
        |               / CAST(greatest(lc, 1) AS DOUBLE))
        |      + 0.2 * (CAST(lc - (n_tokens - 1) AS DOUBLE) / n_tokens)
        |      AS x
        |  FROM f),
        |sc AS (
        |  SELECT lang, round(1.0 / (1.0 + exp(-x)), 6) AS score FROM x),
        |b AS (
        |  SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bin,
        |    CAST(round(score * 1e6) AS BIGINT) AS s6,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
        |  FROM sc)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(s6) AS DOUBLE) / count(*) / 1e6, 6) AS mean_pred,
        |  round(CAST(sum(en) AS DOUBLE) / count(*), 6) AS obs_en
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_isotonic" ->
      """WITH f AS (
        |  SELECT lang,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_tokens,
        |    len(regexp_extract_all(text, '\b(the|a)\b')) AS stop_cnt,
        |    len(regexp_extract_all(text, '[0-9]')) AS dig_cnt,
        |    length(text) AS lc
        |  FROM documents),
        |x AS (
        |  SELECT lang,
        |    -2.0 + 0.9 * ln(1.0 + n_tokens)
        |      - 3.0 * (CAST(stop_cnt AS DOUBLE) / n_tokens)
        |      - 0.5 * (CAST(dig_cnt AS DOUBLE)
        |               / CAST(greatest(lc, 1) AS DOUBLE))
        |      + 0.2 * (CAST(lc - (n_tokens - 1) AS DOUBLE) / n_tokens)
        |      AS x
        |  FROM f),
        |sc AS (
        |  SELECT round(1.0 / (1.0 + exp(-x)), 6) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en
        |  FROM x),
        |bins AS (
        |  SELECT least(19, CAST(floor(score * 20) AS BIGINT)) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(en) AS BIGINT) AS ysum
        |  FROM sc GROUP BY 1),
        |pre AS (
        |  SELECT bin, n, ysum,
        |    sum(n) OVER (ORDER BY bin) AS q,
        |    sum(ysum) OVER (ORDER BY bin) AS p
        |  FROM bins),
        |inner_min AS (
        |  SELECT i.bin AS ib, k.q - k.n AS f, k.p - k.ysum AS e,
        |    min(CAST(j.p - (k.p - k.ysum) AS DOUBLE) /
        |        (j.q - (k.q - k.n))) AS mn
        |  FROM pre i
        |  JOIN pre k ON k.bin <= i.bin
        |  JOIN pre j ON j.bin >= i.bin
        |  GROUP BY 1, 2, 3),
        |fit AS (SELECT ib, max(mn) AS fitted FROM inner_min GROUP BY 1)
        |SELECT b.bin, b.n,
        |  round(CAST(b.ysum AS DOUBLE) / b.n, 6) AS raw_rate,
        |  round(f2.fitted, 6) AS iso_rate
        |FROM bins b JOIN fit f2 ON f2.ib = b.bin
        |ORDER BY b.bin""".stripMargin,
    "q_auc" ->
      """WITH q AS (
        |  SELECT round(ln(1.0 + n_tokens) *
        |      (1.0 - round(CAST(stop_cnt AS DOUBLE) / n_tokens, 6)), 6)
        |      AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM (
        |    SELECT lang,
        |      CAST(length(text) - length(replace(text, ' ', '')) + 1
        |        AS BIGINT) AS n_tokens,
        |      CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT)
        |        AS stop_cnt
        |    FROM documents) t),
        |byscore AS (
        |  SELECT score, CAST(sum(pos) AS BIGINT) AS cp,
        |    CAST(sum(1 - pos) AS BIGINT) AS cn,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM q GROUP BY 1),
        |ranked AS (
        |  SELECT cp, cn, c,
        |    CAST(coalesce(sum(c) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS before
        |  FROM byscore),
        |agg AS (
        |  SELECT CAST(sum(cp * (2 * before + c + 1)) AS BIGINT) AS srp2,
        |    CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn
        |  FROM ranked)
        |SELECT np, nn,
        |  round(CAST(srp2 - np * (np + 1) AS DOUBLE) / (2.0 * np * nn), 6)
        |    AS auc
        |FROM agg""".stripMargin,
    "q_mad" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |        FROM ev GROUP BY 1),
        |dev AS (
        |  SELECT ev.event_type, ev.value, med.med,
        |    abs(ev.value - med.med) AS adev
        |  FROM ev JOIN med ON med.event_type = ev.event_type),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |        FROM dev GROUP BY 1)
        |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(max(dev.med), 6) AS median,
        |  round(max(mad.mad), 6) AS mad,
        |  CAST(sum(CASE WHEN dev.adev > CAST(4.4478 AS DOUBLE) * mad.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier
        |FROM dev JOIN mad ON mad.event_type = dev.event_type
        |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin,
    "q_prf" ->
      """WITH p AS (
        |  SELECT lang,
        |    CASE WHEN len(regexp_extract_all(text, '[^\x00-\x7f]')) > 0
        |      THEN 'zh'
        |    WHEN len(regexp_extract_all(text, '\bthe\b')) >= 3 THEN 'en'
        |    ELSE 'unknown' END AS pred
        |  FROM documents),
        |a AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS support
        |      FROM p GROUP BY 1),
        |pr AS (SELECT pred AS cls, CAST(count(*) AS BIGINT) AS n_pred
        |       FROM p GROUP BY 1),
        |tp AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tp
        |       FROM p WHERE pred = lang GROUP BY 1),
        |f AS (
        |  SELECT a.cls, support, coalesce(tp.tp, 0) AS tp,
        |    coalesce(pr.n_pred, 0) - coalesce(tp.tp, 0) AS fp,
        |    support - coalesce(tp.tp, 0) AS fn
        |  FROM a LEFT JOIN pr ON pr.cls = a.cls
        |         LEFT JOIN tp ON tp.cls = a.cls)
        |SELECT cls, support, tp, fp, fn,
        |  round(CASE WHEN tp + fp = 0 THEN NULL
        |    ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6)
        |    AS precision,
        |  round(CAST(tp AS DOUBLE) / CAST(support AS DOUBLE), 6)
        |    AS recall,
        |  round(2.0 * CAST(tp AS DOUBLE) /
        |    CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
        |FROM f ORDER BY cls""".stripMargin,
    "q_lift_curve" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    round(ln(1.0 + n_tokens) *
        |      (1.0 - round(CAST(stop_cnt AS DOUBLE) / n_tokens, 6)), 6)
        |      AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM (
        |    SELECT doc_id, lang,
        |      CAST(length(text) - length(replace(text, ' ', '')) + 1
        |        AS BIGINT) AS n_tokens,
        |      CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT)
        |        AS stop_cnt
        |    FROM documents) t),
        |r AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
        |  FROM q),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt,
        |        CAST(sum(pos) AS BIGINT) AS np FROM q)
        |SELECT ((rn - 1) * 10) // nt AS decile,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(pos) AS BIGINT) AS n_pos,
        |  round((CAST(sum(pos) AS DOUBLE) * CAST(max(nt) AS DOUBLE)) /
        |    (CAST(count(*) AS DOUBLE) * CAST(max(np) AS DOUBLE)), 4)
        |    AS lift
        |FROM r CROSS JOIN tot
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_logit_fit" -> {
      // one Newton step as a CTE pair: t<i> scores with the incoming
      // beta, a<i>/b<i> accumulate nano-unit integer sums and solve the
      // 2x2 normal equations — textually the same arithmetic order as
      // the Spark side so the IEEE doubles agree bit-for-bit
      def step(i: Int, prev: String): String =
        s"""t$i AS (
           |  SELECT x, y, b0, b1,
           |    1.0 / (1.0 + exp(-(b0 + b1 * x))) AS p
           |  FROM base CROSS JOIN $prev),
           |a$i AS (
           |  SELECT
           |    sum(CAST(round(p * (1.0 - p) * 1e9) AS BIGINT)) AS sw,
           |    sum(CAST(round(p * (1.0 - p) * x * 1e9) AS BIGINT)) AS swx,
           |    sum(CAST(round(p * (1.0 - p) * x * x * 1e9) AS BIGINT))
           |      AS swx2,
           |    sum(CAST(round((y - p) * 1e9) AS BIGINT)) AS sr,
           |    sum(CAST(round((y - p) * x * 1e9) AS BIGINT)) AS srx,
           |    max(b0) AS pb0, max(b1) AS pb1
           |  FROM t$i),
           |b$i AS (
           |  SELECT
           |    pb0 + ((CAST(sr AS DOUBLE) / 1e9) *
           |        (CAST(swx2 AS DOUBLE) / 1e9) -
           |      (CAST(srx AS DOUBLE) / 1e9) *
           |        (CAST(swx AS DOUBLE) / 1e9)) /
           |      ((CAST(sw AS DOUBLE) / 1e9) *
           |        (CAST(swx2 AS DOUBLE) / 1e9) -
           |      (CAST(swx AS DOUBLE) / 1e9) *
           |        (CAST(swx AS DOUBLE) / 1e9)) AS b0,
           |    pb1 + ((CAST(sw AS DOUBLE) / 1e9) *
           |        (CAST(srx AS DOUBLE) / 1e9) -
           |      (CAST(swx AS DOUBLE) / 1e9) *
           |        (CAST(sr AS DOUBLE) / 1e9)) /
           |      ((CAST(sw AS DOUBLE) / 1e9) *
           |        (CAST(swx2 AS DOUBLE) / 1e9) -
           |      (CAST(swx AS DOUBLE) / 1e9) *
           |        (CAST(swx AS DOUBLE) / 1e9)) AS b1
           |  FROM a$i)""".stripMargin
      s"""WITH base AS (
         |  SELECT CAST(value AS DOUBLE) AS x,
         |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
         |  FROM events WHERE event_type IN ('view', 'purchase')),
         |bz AS (SELECT 0.0 AS b0, 0.0 AS b1),
         |${step(1, "bz")},
         |${step(2, "b1")}
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS n,
         |  round(b0, 6) AS b0, round(b1, 6) AS b1
         |FROM b2""".stripMargin
    }
  )
}
