package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.operators.GlobalRank

/** Round-10 eighth batch: distribution-shape economics and release
  * audits — revenue concentration (Hoover index, Palma ratio, Atkinson
  * ε=2), the t-closeness privacy audit (the distributional sibling of
  * q_kanon/q_l_diversity), the Nelson–Aalen cumulative hazard (the
  * estimator q_kaplan_meier's product form approximates), and Slope One
  * collaborative filtering (the deviation-matrix recommender beside
  * q_item_cf/q_als). Reference analog: per-client spend summaries and
  * job-survival curves a requester dashboard reads off the event history
  * (pkg/requesternode/requester_node.go).
  *
  * House disciplines:
  *  - per-user collapses keep their SF-scaled frames in keyed shuffles;
  *    only bounded aggregates broadcast (type-pair deviation matrix,
  *    bucket grids, scalar moments);
  *  - global order statistics (Palma deciles, at-risk suffix counts,
  *    hazard prefix sums) run through GlobalRank's two-phase machinery —
  *    no single task ever holds the corpus;
  *  - ratios of SF-scaled sums stay exact: cross-products route
  *    decimal(38,0) ↔ HUGEINT, reciprocals and ratings quantize to fixed
  *    micro-units BEFORE any order-sensitive float sum.
  */
object Econ {

  private type Q = (SparkSession, String) => DataFrame

  /** Per-user revenue cents — the one corpus collapse the inequality
    * family starts from. */
  private def userCents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast(LongType)).as("c"))

  val queries: Map[String, Q] = Map(
    // ---- Hoover (Robin Hood) index of revenue concentration: the share
    // of total revenue that would have to move to equalize users —
    // ½·Σ|sᵢ − 1/n| = Σ|cᵢ·n − T| / (2nT), computed entirely on exact
    // integers (cᵢ·n routes decimal ↔ HUGEINT; the absolute deviations
    // sum exactly, no float accumulation over the SF-scaled user frame).
    "q_hoover" -> ((s, d) => {
      val u = graft.CacheScope.cached(userCents(s, d))
      val tot = u.agg(count(lit(1)).as("n"), sum("c").as("t"))
      val res = u.crossJoin(broadcast(tot))
        .agg(max("n").as("n"), max("t").as("t"),
          sum(abs((col("c").cast("decimal(38,0)") * col("n"))
            .cast("decimal(38,0)") - col("t")).cast("decimal(38,0)"))
            .as("sad"))
      res.select(col("n").as("n_users"),
        round(col("t").cast("double") / 100.0, 2).as("total_dollars"),
        round(col("sad").cast("double") /
          (lit(2.0) * col("n").cast("double") * col("t").cast("double")),
          6).as("hoover"))
    }),

    // ---- Palma ratio: top-10% users' revenue share over the bottom
    // 40%'s. The decile cut is an exact GLOBAL rank over (cents,
    // user_id) — GlobalRank's two-phase row number, so no single task
    // sorts the user frame — with integer-division thresholds mirrored
    // verbatim in the oracle.
    "q_palma" -> ((s, d) => {
      val u = graft.CacheScope.cached(userCents(s, d))
      val tot = u.agg(count(lit(1)).as("n"), sum("c").as("t"))
      val ranked = GlobalRank.withRowNumber(u, "r",
        Seq(col("c"), col("user_id")))
      val agg = ranked.crossJoin(broadcast(tot))
        .agg(max("n").as("n"), max("t").as("t"),
          sum(when(col("r") > col("n") - expr("n div 10"), col("c"))
            .otherwise(0L)).as("top"),
          sum(when(col("r") <= lit(4L) * expr("n div 10"), col("c"))
            .otherwise(0L)).as("bot"))
      agg.select(col("n").as("n_users"),
        round(col("top").cast("double") / col("t"), 6)
          .as("top10_share"),
        round(col("bot").cast("double") / col("t"), 6)
          .as("bottom40_share"),
        round(col("top").cast("double") / col("bot"), 6).as("palma"))
    }),

    // ---- Atkinson inequality index at ε=2: A = 1 − harmonic/arithmetic
    // mean — the member of the Atkinson family with a closed rational
    // form (no per-user logs). Reciprocals quantize to pico-units via
    // integer division (10¹² div c, identical floor semantics both
    // engines) so the SF-scaled reciprocal sum is exact.
    "q_atkinson" -> ((s, d) => {
      // The ε=2 Atkinson index is only defined on strictly positive
      // incomes: a zero-cents user NULLs the reciprocal (silently
      // dropping them from the harmonic mean) and a negative one would
      // expose the Spark-div (truncate) vs DuckDB-// (floor) split. The
      // c > 0 filter makes the domain assumption explicit in BOTH
      // engines so neither hazard is reachable.
      val u = graft.CacheScope.cached(userCents(s, d)
        .filter(col("c") > 0L))
      val agg = u.agg(count(lit(1)).as("n"), sum("c").as("sc"),
        sum(expr("1000000000000 div c")).as("sq"))
      val nD = col("n").cast("double")
      val a2 = lit(1.0) - nD * nD * lit(1e12) /
        (col("sc").cast("double") * col("sq").cast("double"))
      agg.select(col("n").as("n_users"),
        round(col("sc").cast("double") / nD / 100.0, 4)
          .as("mean_dollars"),
        round(nD * lit(1e12) / col("sq").cast("double") / 100.0, 4)
          .as("harmonic_mean_dollars"),
        round(a2, 6).as("atkinson2"))
    }),

    // ---- t-closeness audit: for each source (the quasi-identifier
    // stratum), the earth-mover's distance between its document-length
    // distribution and the corpus's, over the ordered n_chars/100
    // buckets — the release gate that catches a stratum whose SENSITIVE
    // distribution differs even when k-anonymity and l-diversity pass.
    // EMD on an ordered domain = mean |cumulative difference|; the
    // cumulative counts stay exact integers on the dense (source ×
    // bucket) grid (domain-bounded — same bound as the cents
    // histograms), and the cross-products route decimal ↔ HUGEINT.
    "q_t_closeness" -> ((s, d) => {
      val doc = graft.CacheScope.cached(Tables.documents(s, d)
        .select(col("source"), expr("n_chars div 100").as("b")))
      val sb = graft.CacheScope.cached(
        doc.groupBy("source", "b").agg(count(lit(1)).as("cnt")))
      val grid = sb.select("b").distinct()
        .crossJoin(sb.select("source").distinct())
      val dense = grid.join(sb, Seq("source", "b"), "left")
        .na.fill(0L, Seq("cnt"))
      val cum = graft.CacheScope.cached(dense.withColumn("cs",
        sum("cnt").over(Window.partitionBy("source").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0))))
      val cg = cum.groupBy("b").agg(sum("cs").as("cg"))
      val ns = cum.groupBy("source").agg(sum("cnt").as("ns"))
      val tot = doc.agg(count(lit(1)).as("ng"))
      val nb = sb.agg(countDistinct("b").as("nb"))
      cum.join(broadcast(cg), Seq("b"))
        .join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
        .groupBy("source", "ns", "ng", "nb")
        .agg(sum(abs((col("cs").cast("decimal(38,0)") * col("ng"))
          .cast("decimal(38,0)") -
          (col("cg").cast("decimal(38,0)") * col("ns"))
            .cast("decimal(38,0)")).cast("decimal(38,0)")).as("sdiff"))
        .select(col("source"), col("ns").as("n_docs"),
          round(col("sdiff").cast("double") /
            (col("ns").cast("double") * col("ng").cast("double") *
              (col("nb") - 1L).cast("double")), 6).as("t_close"),
          (col("sdiff").cast("double") /
            (col("ns").cast("double") * col("ng").cast("double") *
              (col("nb") - 1L).cast("double")) > 0.05).as("skewed"))
        .orderBy("source")
    }),

    // ---- Nelson–Aalen cumulative hazard for time-to-first-high-value
    // purchase — the same survival frame as q_kaplan_meier (censoring at
    // last observed event, deaths-precede-censorings risk sets via the
    // time-DESC two-phase suffix sum), but the additive hazard estimator
    // Ĥ(t) = Σ dᵢ/nᵢ instead of the product form. Each increment
    // quantizes to micro-hazards and INTEGER-prefix-sums through
    // GlobalRank (the q_dsir/q_kaplan_meier discipline), so the
    // cumulative is partition-order-proof; exp(−Ĥ) ships beside it as
    // the Fleming–Harrington survival twin.
    "q_nelson_aalen" -> ((s, d) => {
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
      val risk = GlobalRank.withPrefixAggs(byT,
          Seq(col("time_s").desc),
          Seq(GlobalRank.PrefixAgg("m", "n_risk", inclusive = true)))
        .filter(col("d") > 0)
        .withColumn("h6",
          round(col("d").cast("double") / col("n_risk").cast("double") *
            1e6).cast(LongType))
      val cum = GlobalRank.withPrefixAggs(risk, Seq(col("time_s")),
        Seq(GlobalRank.PrefixAgg("h6", "cum", inclusive = true)))
      cum.select(col("time_s"), col("n_risk"), col("d").as("deaths"),
        round(col("cum").cast("double") / 1e6, 6).as("cum_hazard"),
        round(exp(-(col("cum").cast("double") / 1e6)), 6).as("surv_fh"))
        .orderBy("time_s")
    }),

    // ---- weighted Slope One recommender over the (user × event-type)
    // implicit rating matrix (mean cents per interaction): the pairwise
    // deviation matrix is a BOUNDED k²-key aggregate (broadcast
    // everywhere after); per-user rating diffs quantize to milli-cents
    // before the SF-scaled deviation sums, predictions re-expand through
    // one keyed join, and the in-sample RMSE ships on every matrix row.
    // The classic one-join recommender a 100 TB interaction log can
    // actually afford — no factorization, one shuffle on user_id.
    "q_slope_one" -> ((s, d) => {
      val r = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(sum(round(col("value") * 100).cast(LongType)).as("sc"),
          count(lit(1)).as("n")))
      val ri = r.select(col("user_id"), col("event_type").as("i"),
        (col("sc").cast("double") / col("n")).as("ri"))
      val rj = r.select(col("user_id"), col("event_type").as("j"),
        (col("sc").cast("double") / col("n")).as("rj"))
      val dev = graft.CacheScope.cached(ri.join(rj, Seq("user_id"))
        .filter(col("i") =!= col("j"))
        .groupBy("i", "j")
        .agg(count(lit(1)).as("support"),
          sum(round((col("rj") - col("ri")) * 1000).cast(LongType))
            .as("sdev")))
      val cand = ri.join(broadcast(dev), Seq("i"))
        .select(col("user_id"), col("j"),
          round(((col("ri") + col("sdev").cast("double") /
            col("support") / 1000.0) * col("support")) * 1000.0)
            .cast(LongType).as("num3"),
          col("support"))
        .groupBy("user_id", "j")
        .agg(sum("num3").as("nsum"), sum("support").as("dsum"))
      val err = cand.join(rj, Seq("user_id", "j"))
        .select(round(
          (col("nsum").cast("double") / 1000.0 / col("dsum") -
            col("rj")) *
          (col("nsum").cast("double") / 1000.0 / col("dsum") -
            col("rj")) * 1000.0).cast(LongType).as("e3"))
        .agg(count(lit(1)).as("np"), sum("e3").as("se3"))
      val rmse = err.select(col("np"),
        round(sqrt(col("se3").cast("double") / 1000.0 /
          col("np").cast("double")) / 100.0, 6).as("rmse_dollars"))
      dev.crossJoin(broadcast(rmse))
        .select(col("i"), col("j"), col("support"),
          round(col("sdev").cast("double") / col("support") / 1000.0 /
            100.0, 6).as("dev_dollars"),
          col("np").as("n_scored"), col("rmse_dollars"))
        .orderBy("i", "j")
    }))

  val oracle: Map[String, String] = Map(
    "q_hoover" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(c) AS BIGINT) AS t FROM u),
        |res AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n, CAST(max(t) AS BIGINT) AS t,
        |    sum(abs(CAST(c AS HUGEINT) * n - t)) AS sad
        |  FROM u CROSS JOIN tot)
        |SELECT n AS n_users,
        |  round(CAST(t AS DOUBLE) / 100.0, 2) AS total_dollars,
        |  round(CAST(sad AS DOUBLE) /
        |    (2.0 * CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS hoover
        |FROM res""".stripMargin,
    "q_palma" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |          CAST(sum(c) AS BIGINT) AS t FROM u),
        |ranked AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY c, user_id)
        |    AS BIGINT) AS r
        |  FROM u),
        |agg AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n, CAST(max(t) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN r > n - n // 10 THEN c ELSE 0 END)
        |      AS BIGINT) AS top,
        |    CAST(sum(CASE WHEN r <= 4 * (n // 10) THEN c ELSE 0 END)
        |      AS BIGINT) AS bot
        |  FROM ranked CROSS JOIN tot)
        |SELECT n AS n_users,
        |  round(CAST(top AS DOUBLE) / t, 6) AS top10_share,
        |  round(CAST(bot AS DOUBLE) / t, 6) AS bottom40_share,
        |  round(CAST(top AS DOUBLE) / bot, 6) AS palma
        |FROM agg""".stripMargin,
    "q_atkinson" ->
      """WITH u0 AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |u AS (SELECT * FROM u0 WHERE c > 0),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(sum(1000000000000 // c) AS BIGINT) AS sq
        |  FROM u)
        |SELECT n AS n_users,
        |  round(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4)
        |    AS mean_dollars,
        |  round(CAST(n AS DOUBLE) * 1e12 / CAST(sq AS DOUBLE) / 100.0, 4)
        |    AS harmonic_mean_dollars,
        |  round(1.0 - CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12 /
        |    (CAST(sc AS DOUBLE) * CAST(sq AS DOUBLE)), 6) AS atkinson2
        |FROM agg""".stripMargin,
    "q_t_closeness" ->
      """WITH doc AS (
        |  SELECT source, n_chars // 100 AS b FROM documents),
        |sb AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cnt
        |       FROM doc GROUP BY 1, 2),
        |grid AS (
        |  SELECT ss.source, bb.b
        |  FROM (SELECT DISTINCT source FROM sb) ss
        |  CROSS JOIN (SELECT DISTINCT b FROM sb) bb),
        |dense AS (
        |  SELECT g.source, g.b, coalesce(sb.cnt, 0) AS cnt
        |  FROM grid g LEFT JOIN sb
        |    ON sb.source = g.source AND sb.b = g.b),
        |cum AS (
        |  SELECT source, b, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cs
        |  FROM dense),
        |cg AS (SELECT b, CAST(sum(cs) AS BIGINT) AS cg
        |       FROM cum GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ns
        |       FROM cum GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM doc),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM sb),
        |agg AS (
        |  SELECT c.source, ns.ns, tot.ng, nb.nb,
        |    sum(abs(CAST(c.cs AS HUGEINT) * tot.ng -
        |      CAST(cg.cg AS HUGEINT) * ns.ns)) AS sdiff
        |  FROM cum c
        |  JOIN cg ON cg.b = c.b
        |  JOIN ns ON ns.source = c.source
        |  CROSS JOIN tot CROSS JOIN nb
        |  GROUP BY 1, 2, 3, 4)
        |SELECT source, ns AS n_docs,
        |  round(CAST(sdiff AS DOUBLE) /
        |    (CAST(ns AS DOUBLE) * CAST(ng AS DOUBLE) *
        |      CAST(nb - 1 AS DOUBLE)), 6) AS t_close,
        |  CAST(sdiff AS DOUBLE) /
        |    (CAST(ns AS DOUBLE) * CAST(ng AS DOUBLE) *
        |      CAST(nb - 1 AS DOUBLE)) > 0.05 AS skewed
        |FROM agg ORDER BY source""".stripMargin,
    "q_nelson_aalen" ->
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
        |    CAST(round(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e6)
        |      AS BIGINT) AS h6
        |  FROM risk WHERE d > 0),
        |cm AS (SELECT time_s, n_risk, d,
        |         CAST(sum(h6) OVER (ORDER BY time_s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum
        |       FROM dd)
        |SELECT time_s, n_risk, d AS deaths,
        |  round(CAST(cum AS DOUBLE) / 1e6, 6) AS cum_hazard,
        |  round(exp(-(CAST(cum AS DOUBLE) / 1e6)), 6) AS surv_fh
        |FROM cm ORDER BY time_s""".stripMargin,
    "q_slope_one" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sc,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |ri AS (SELECT user_id, event_type AS i,
        |         CAST(sc AS DOUBLE) / n AS ri FROM r),
        |rj AS (SELECT user_id, event_type AS j,
        |         CAST(sc AS DOUBLE) / n AS rj FROM r),
        |dev AS (
        |  SELECT i, j, CAST(count(*) AS BIGINT) AS support,
        |    CAST(sum(CAST(round((rj - ri) * 1000) AS BIGINT)) AS BIGINT)
        |      AS sdev
        |  FROM ri JOIN rj ON rj.user_id = ri.user_id AND ri.i <> rj.j
        |  GROUP BY 1, 2),
        |cand AS (
        |  SELECT ri.user_id, dev.j,
        |    CAST(sum(CAST(round(((ri.ri + CAST(dev.sdev AS DOUBLE) /
        |      dev.support / 1000.0) * dev.support) * 1000.0) AS BIGINT))
        |      AS BIGINT) AS nsum,
        |    CAST(sum(dev.support) AS BIGINT) AS dsum
        |  FROM ri JOIN dev ON dev.i = ri.i
        |  GROUP BY 1, 2),
        |err AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np,
        |    CAST(sum(CAST(round(
        |      (CAST(nsum AS DOUBLE) / 1000.0 / dsum - rj.rj) *
        |      (CAST(nsum AS DOUBLE) / 1000.0 / dsum - rj.rj) * 1000.0)
        |      AS BIGINT)) AS BIGINT) AS se3
        |  FROM cand JOIN rj
        |    ON rj.user_id = cand.user_id AND rj.j = cand.j),
        |rmse AS (
        |  SELECT np, round(sqrt(CAST(se3 AS DOUBLE) / 1000.0 /
        |    CAST(np AS DOUBLE)) / 100.0, 6) AS rmse_dollars
        |  FROM err)
        |SELECT dev.i, dev.j, dev.support,
        |  round(CAST(dev.sdev AS DOUBLE) / dev.support / 1000.0 / 100.0,
        |    6) AS dev_dollars,
        |  rmse.np AS n_scored, rmse.rmse_dollars
        |FROM dev CROSS JOIN rmse
        |ORDER BY dev.i, dev.j""".stripMargin)
}
