package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-11 ordinal-association / contingency batch over the events
  * table: the measures an experimentation platform reaches for when both
  * variables are ordered categories (Somers' D, Goodman–Kruskal gamma,
  * Stuart's tau-c), matched-binary designs (Cochran's Q), transition
  * symmetry (Bowker), and unequal-variance group comparison (Welch's
  * ANOVA).
  *
  * House disciplines (SCALING.md): every statistic reduces the corpus to
  * a BOUNDED frame in ONE keyed aggregate — a 24×10 (hour × value-bucket)
  * contingency grid, a 5-type moment table, a per-user 3-bit profile —
  * and all cross-cell pair products route decimal(38,0) ↔ HUGEINT so
  * nothing wraps at any scale. Cross-group sums of DOUBLES never ride a
  * nondeterministic aggregation order: each per-group term quantizes to
  * micro-units (round(x·10⁶) → BIGINT) first, so the reduce is an exact
  * integer sum in both engines (the q_bowker/q_welch_anova pattern;
  * identical to the kmRisk micro-nat log-product discipline).
  */
object Stats9 {
  private type Q = (SparkSession, String) => DataFrame

  /** (hour-of-day, value-bucket, cents) projection — the two ordinal
    * axes of the association family. Buckets are fixed-width $20 steps
    * capped at 9 (cents are strictly positive in the fixture and the
    * cap keeps the grid 24×10 at any scale). */
  private def ordinalEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(expr("(ts_us div 3600000000) % 24").as("x"),
        least(round(col("value") * 100).cast(LongType)
          .divide(lit(2000)).cast(LongType), lit(9L)).as("y"))

  /** The 24×10 contingency grid plus the four pair masses every ordinal
    * measure is built from: concordant C, discordant D, tied-on-x Tx,
    * tied-on-y Ty (each unordered pair counted once — cell pairs are
    * enumerated with a broadcast cross join of the ≤240-row grid, never
    * a row-level self-join). */
  private def pairMasses(s: SparkSession, d: String): DataFrame = {
    val cells = graft.CacheScope.cached(
      ordinalEvents(s, d).groupBy("x", "y").agg(count(lit(1)).as("n")))
    val a = cells.toDF("xa", "ya", "na")
    val b = cells.toDF("xb", "yb", "nb")
    def prod = (col("na").cast("decimal(38,0)") * col("nb"))
      .cast("decimal(38,0)")
    def dz = lit(0).cast("decimal(38,0)")
    a.crossJoin(broadcast(b)).agg(
      coalesce(sum(when(col("xb") > col("xa") && col("yb") > col("ya"),
        prod)), dz).as("c_mass"),
      coalesce(sum(when(col("xb") > col("xa") && col("yb") < col("ya"),
        prod)), dz).as("d_mass"),
      coalesce(sum(when(col("xb") === col("xa") && col("yb") > col("ya"),
        prod)), dz).as("tx_mass"),
      coalesce(sum(when(col("xb") > col("xa") && col("yb") === col("ya"),
        prod)), dz).as("ty_mass"))
      .crossJoin(broadcast(cells.agg(
        sum("n").cast("decimal(38,0)").as("nn"),
        countDistinct("x").as("rx"), countDistinct("y").as("ry"))))
  }

  private val DayUs = 86400000000L

  val queries: Map[String, Q] = Map(
    // ---- Somers' D (asymmetric ordinal association, predicting the
    // value bucket from the hour): D_yx = (C − D)/(C + D + T_y) — the
    // concordance excess among pairs NOT tied on the predictor. The
    // corpus collapses to the 24×10 grid in one keyed aggregate; all
    // pair masses are exact decimal products of cell counts.
    "q_somers_d" -> ((s, d) => {
      pairMasses(s, d).select(
        col("nn").cast("long").as("n_events"),
        col("c_mass").cast("long").as("concordant"),
        col("d_mass").cast("long").as("discordant"),
        when(col("c_mass").cast("double") + col("d_mass").cast("double") +
            col("ty_mass").cast("double") > 0,
          round((col("c_mass").cast("double") -
            col("d_mass").cast("double")) /
            (col("c_mass").cast("double") + col("d_mass").cast("double") +
              col("ty_mass").cast("double")), 6)).as("somers_dyx"))
    }),

    // ---- Goodman–Kruskal gamma: (C − D)/(C + D), ties ignored — the
    // symmetric companion of Somers' D on the same grid.
    "q_gk_gamma" -> ((s, d) => {
      pairMasses(s, d).select(
        col("nn").cast("long").as("n_events"),
        col("c_mass").cast("long").as("concordant"),
        col("d_mass").cast("long").as("discordant"),
        when(col("c_mass").cast("double") +
            col("d_mass").cast("double") > 0,
          round((col("c_mass").cast("double") -
            col("d_mass").cast("double")) /
            (col("c_mass").cast("double") + col("d_mass").cast("double")),
            6)).as("gamma"))
    }),

    // ---- Stuart's tau-c: 2m(C − D)/(N²(m − 1)), m = min(levels) — the
    // rectangular-table correction that keeps the range at ±1 when the
    // grid is not square (ours is 24×10, so m = 10 from the data).
    "q_stuart_tau_c" -> ((s, d) => {
      pairMasses(s, d).select(
        col("nn").cast("long").as("n_events"),
        least(col("rx"), col("ry")).as("m_levels"),
        round(lit(2.0) * least(col("rx"), col("ry")).cast("double") *
          (col("c_mass").cast("double") - col("d_mass").cast("double")) /
          ((col("nn").cast("decimal(38,0)") * col("nn"))
            .cast("decimal(38,0)").cast("double") *
            (least(col("rx"), col("ry")).cast("double") - 1.0)), 6)
          .as("tau_c"))
    }),

    // ---- Cochran's Q over the matched-binary design "did each user
    // ever view / click / purchase": Q = (k−1)(k·ΣTⱼ² − N²) /
    // (k·ΣRᵢ − ΣRᵢ²) — the k-treatment McNemar. ONE corpus aggregate to
    // the per-user 3-bit profile; every term is an exact integer
    // (column totals square through decimal ↔ HUGEINT); the χ²(2) 95%
    // cut (5.991) flags unequal treatment rates.
    "q_cochran_q" -> ((s, d) => {
      val prof = Tables.events(s, d)
        .groupBy("user_id").agg(
          max(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("t1"),
          max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("t2"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("t3"))
      val agg = prof.agg(count(lit(1)).as("n_users"),
        sum("t1").as("c1"), sum("t2").as("c2"), sum("t3").as("c3"),
        sum(col("t1") + col("t2") + col("t3")).as("nt"),
        sum((col("t1") + col("t2") + col("t3")) *
          (col("t1") + col("t2") + col("t3"))).as("sr2"))
      def sq(c: String) = (col(c).cast("decimal(38,0)") * col(c))
        .cast("decimal(38,0)")
      val num = lit(2.0) * (lit(3.0) *
        (sq("c1") + sq("c2") + sq("c3")).cast("double") -
        (col("nt").cast("decimal(38,0)") * col("nt"))
          .cast("decimal(38,0)").cast("double"))
      // Q is undefined when every user's row total is 0 or 3 (all three
      // treatments tied within every block): 3·ΣR − ΣR² = 0. NULL the
      // statistic rather than divide by zero (ANSI mode errors) — the
      // sf0.001 fixture is exactly this degenerate case.
      val den = nullif(lit(3.0) * col("nt").cast("double") -
        col("sr2").cast("double"), lit(0.0))
      agg.select(col("n_users"), col("c1"), col("c2"), col("c3"),
        round(num / den, 4).as("q_stat"),
        (num / den > 5.991).as("rates_differ"))
    }),

    // ---- Bowker's symmetry test on the event-type transition matrix:
    // Q = Σ_{i<j} (n_ij − n_ji)²/(n_ij + n_ji) over consecutive
    // same-user transitions — does traffic flow i→j as often as j→i?
    // The corpus pays ONE user-keyed lag window; the matrix is ≤ k²
    // cells; each pair's term quantizes to micro-units so the ≤10-term
    // reduce is an exact integer sum (no FP-order drift).
    "q_bowker" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val trans = Tables.events(s, d)
        .withColumn("from_t", lag("event_type", 1).over(w))
        .filter(col("from_t").isNotNull &&
          col("from_t") =!= col("event_type"))
        .select(col("from_t"), col("event_type").as("to_t"))
      // symmetrize with least/greatest + ONE keyed aggregate — no join
      // (a full-outer upper⋈lower can only SortMergeJoin in Spark)
      val cells = trans
        .select(least(col("from_t"), col("to_t")).as("i"),
          greatest(col("from_t"), col("to_t")).as("j"),
          when(col("from_t") < col("to_t"), 1L).otherwise(0L).as("fwd"),
          when(col("from_t") > col("to_t"), 1L).otherwise(0L).as("rev"))
        .groupBy("i", "j")
        .agg(sum("fwd").as("nij"), sum("rev").as("nji"))
      val term = round((col("nij") - col("nji")).cast("double") *
        (col("nij") - col("nji")).cast("double") /
        (col("nij") + col("nji")).cast("double") * 1e6).cast(LongType)
      cells.agg(count(lit(1)).as("df"), sum(term).as("q6"),
          sum(col("nij") + col("nji")).as("n_trans"))
        .select(col("n_trans").as("n_transitions"), col("df"),
          round(col("q6").cast("double") / 1e6, 6).as("bowker_q"))
    }),

    // ---- Welch's ANOVA (unequal variances) of value cents across the
    // event types: F* = Σwᵢ(x̄ᵢ − x̄w)²/(k−1) over
    // 1 + 2(k−2)/(k²−1)·Σ(1 − wᵢ/W)²/(nᵢ−1), wᵢ = nᵢ/sᵢ². The corpus
    // collapses ONCE to the k-row moment table (cents² exact through
    // decimal); every cross-group reduce quantizes its per-group term
    // to micro-units first, so both engines sum identical integers in
    // any order. The type-count k comes from the data.
    "q_welch_anova" -> ((s, d) => {
      val g = graft.CacheScope.cached(Tables.events(s, d)
        .select(col("event_type").as("g"),
          round(col("value") * 100).cast(LongType).as("c"))
        .groupBy("g").agg(count(lit(1)).as("n"), sum("c").as("sc"),
          sum((col("c").cast("decimal(38,0)") * col("c"))
            .cast("decimal(38,0)")).as("scc"))
        .filter(col("n") >= 2))
      val nD = col("n").cast("double")
      // unbiased s² from exact integer sums: (n·Σc² − (Σc)²)/(n(n−1))
      val s2 = (nD * col("scc").cast("double") -
        col("sc").cast("double") * col("sc").cast("double")) /
        (nD * (nD - 1.0))
      val mean = col("sc").cast("double") / nD
      val wq = g.select(col("g"), col("n"),
        round(nD / s2 * 1e6).cast(LongType).as("w6"),
        round(nD / s2 * mean * 1e6).cast(LongType).as("wx6"))
      val tot = wq.agg(count(lit(1)).as("k"), sum("w6").as("sw6"),
        sum("wx6").as("swx6"))
      val kD = col("k").cast("double")
      val xw = col("swx6").cast("double") / col("sw6").cast("double")
      val joined = graft.CacheScope.cached(wq.crossJoin(broadcast(tot)))
      val a6 = round((col("w6").cast("double") / 1e6) *
        (col("wx6").cast("double") / col("w6").cast("double") - xw) *
        (col("wx6").cast("double") / col("w6").cast("double") - xw) * 1e6)
        .cast(LongType)
      val b6 = round(
        (lit(1.0) - col("w6").cast("double") /
          col("sw6").cast("double")) *
        (lit(1.0) - col("w6").cast("double") /
          col("sw6").cast("double")) /
        (col("n").cast("double") - 1.0) * 1e6).cast(LongType)
      joined.agg(max("k").as("k"), sum(a6).as("sa6"), sum(b6).as("sb6"))
        .select(col("k"),
          round((col("sa6").cast("double") / 1e6 / (kD - 1.0)) /
            (lit(1.0) + lit(2.0) * (kD - 2.0) / (kD * kD - 1.0) *
              (col("sb6").cast("double") / 1e6)), 4).as("welch_f"))
    }))

  private val gridSql =
    """cells AS (
      |  SELECT (epoch_us(ts) // 3600000000) % 24 AS x,
      |    least(CAST(round(value * 100) AS BIGINT) // 2000, 9) AS y,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |pm AS (
      |  SELECT
      |    coalesce(sum(CASE WHEN b.x > a.x AND b.y > a.y
      |      THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS c_mass,
      |    coalesce(sum(CASE WHEN b.x > a.x AND b.y < a.y
      |      THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS d_mass,
      |    coalesce(sum(CASE WHEN b.x = a.x AND b.y > a.y
      |      THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS tx_mass,
      |    coalesce(sum(CASE WHEN b.x > a.x AND b.y = a.y
      |      THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS ty_mass
      |  FROM cells a CROSS JOIN cells b),
      |nt AS (
      |  SELECT CAST(sum(n) AS HUGEINT) AS nn,
      |    CAST(count(DISTINCT x) AS BIGINT) AS rx,
      |    CAST(count(DISTINCT y) AS BIGINT) AS ry
      |  FROM cells)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_somers_d" ->
      s"""WITH $gridSql
         |SELECT CAST(nn AS BIGINT) AS n_events,
         |  CAST(c_mass AS BIGINT) AS concordant,
         |  CAST(d_mass AS BIGINT) AS discordant,
         |  CASE WHEN CAST(c_mass AS DOUBLE) + CAST(d_mass AS DOUBLE) +
         |      CAST(ty_mass AS DOUBLE) > 0 THEN
         |    round((CAST(c_mass AS DOUBLE) - CAST(d_mass AS DOUBLE)) /
         |      (CAST(c_mass AS DOUBLE) + CAST(d_mass AS DOUBLE) +
         |       CAST(ty_mass AS DOUBLE)), 6) END AS somers_dyx
         |FROM pm CROSS JOIN nt""".stripMargin,
    "q_gk_gamma" ->
      s"""WITH $gridSql
         |SELECT CAST(nn AS BIGINT) AS n_events,
         |  CAST(c_mass AS BIGINT) AS concordant,
         |  CAST(d_mass AS BIGINT) AS discordant,
         |  CASE WHEN CAST(c_mass AS DOUBLE) +
         |      CAST(d_mass AS DOUBLE) > 0 THEN
         |    round((CAST(c_mass AS DOUBLE) - CAST(d_mass AS DOUBLE)) /
         |      (CAST(c_mass AS DOUBLE) + CAST(d_mass AS DOUBLE)), 6)
         |  END AS gamma
         |FROM pm CROSS JOIN nt""".stripMargin,
    "q_stuart_tau_c" ->
      s"""WITH $gridSql
         |SELECT CAST(nn AS BIGINT) AS n_events,
         |  least(rx, ry) AS m_levels,
         |  round(2.0 * CAST(least(rx, ry) AS DOUBLE) *
         |    (CAST(c_mass AS DOUBLE) - CAST(d_mass AS DOUBLE)) /
         |    (CAST(nn * nn AS DOUBLE) *
         |     (CAST(least(rx, ry) AS DOUBLE) - 1.0)), 6) AS tau_c
         |FROM pm CROSS JOIN nt""".stripMargin,
    "q_cochran_q" ->
      """WITH prof AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS t1,
        |    CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS t2,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS t3
        |  FROM events GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(t1) AS BIGINT) AS c1, CAST(sum(t2) AS BIGINT) AS c2,
        |    CAST(sum(t3) AS BIGINT) AS c3,
        |    CAST(sum(t1 + t2 + t3) AS BIGINT) AS nt,
        |    CAST(sum((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS sr2
        |  FROM prof)
        |SELECT n_users, c1, c2, c3,
        |  round(2.0 * (3.0 * CAST(CAST(c1 AS HUGEINT) * c1 +
        |      CAST(c2 AS HUGEINT) * c2 + CAST(c3 AS HUGEINT) * c3
        |      AS DOUBLE) -
        |    CAST(CAST(nt AS HUGEINT) * nt AS DOUBLE)) /
        |    nullif(3.0 * CAST(nt AS DOUBLE) - CAST(sr2 AS DOUBLE), 0.0),
        |    4) AS q_stat,
        |  2.0 * (3.0 * CAST(CAST(c1 AS HUGEINT) * c1 +
        |      CAST(c2 AS HUGEINT) * c2 + CAST(c3 AS HUGEINT) * c3
        |      AS DOUBLE) -
        |    CAST(CAST(nt AS HUGEINT) * nt AS DOUBLE)) /
        |    nullif(3.0 * CAST(nt AS DOUBLE) - CAST(sr2 AS DOUBLE), 0.0)
        |    > 5.991 AS rates_differ
        |FROM agg""".stripMargin,
    "q_bowker" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS from_t
        |  FROM events),
        |cells AS (
        |  SELECT least(from_t, event_type) AS i,
        |    greatest(from_t, event_type) AS j,
        |    CAST(sum(CASE WHEN from_t < event_type THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nij,
        |    CAST(sum(CASE WHEN from_t > event_type THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nji
        |  FROM ordered
        |  WHERE from_t IS NOT NULL AND from_t <> event_type
        |  GROUP BY 1, 2)
        |SELECT CAST(sum(nij + nji) AS BIGINT) AS n_transitions,
        |  CAST(count(*) AS BIGINT) AS df,
        |  round(CAST(sum(CAST(round(
        |    CAST(nij - nji AS DOUBLE) * CAST(nij - nji AS DOUBLE) /
        |    CAST(nij + nji AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE)
        |    / 1e6, 6) AS bowker_q
        |FROM cells""".stripMargin,
    "q_welch_anova" ->
      """WITH g AS (
        |  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sc,
        |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) *
        |      CAST(round(value * 100) AS BIGINT)) AS scc
        |  FROM events GROUP BY 1 HAVING count(*) >= 2),
        |wq AS (
        |  SELECT g, n,
        |    CAST(round(CAST(n AS DOUBLE) /
        |      ((CAST(n AS DOUBLE) * CAST(scc AS DOUBLE) -
        |        CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) * 1e6)
        |      AS BIGINT) AS w6,
        |    CAST(round(CAST(n AS DOUBLE) /
        |      ((CAST(n AS DOUBLE) * CAST(scc AS DOUBLE) -
        |        CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) *
        |      (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS wx6
        |  FROM g),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(w6) AS BIGINT) AS sw6,
        |    CAST(sum(wx6) AS BIGINT) AS swx6
        |  FROM wq),
        |terms AS (
        |  SELECT k, sw6,
        |    CAST(round((CAST(w6 AS DOUBLE) / 1e6) *
        |      (CAST(wx6 AS DOUBLE) / CAST(w6 AS DOUBLE) -
        |       CAST(swx6 AS DOUBLE) / CAST(sw6 AS DOUBLE)) *
        |      (CAST(wx6 AS DOUBLE) / CAST(w6 AS DOUBLE) -
        |       CAST(swx6 AS DOUBLE) / CAST(sw6 AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS a6,
        |    CAST(round((1.0 - CAST(w6 AS DOUBLE) / CAST(sw6 AS DOUBLE)) *
        |      (1.0 - CAST(w6 AS DOUBLE) / CAST(sw6 AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) - 1.0) * 1e6) AS BIGINT) AS b6
        |  FROM wq CROSS JOIN tot)
        |SELECT max(k) AS k,
        |  round((CAST(sum(a6) AS DOUBLE) / 1e6 /
        |      (CAST(max(k) AS DOUBLE) - 1.0)) /
        |    (1.0 + 2.0 * (CAST(max(k) AS DOUBLE) - 2.0) /
        |      (CAST(max(k) AS DOUBLE) * CAST(max(k) AS DOUBLE) - 1.0) *
        |      (CAST(sum(b6) AS DOUBLE) / 1e6)), 4) AS welch_f
        |FROM terms""".stripMargin)
}
