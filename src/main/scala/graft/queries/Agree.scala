package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 inter-annotator agreement — the acceptance statistics an
  * LLM labeling pipeline runs over redundant annotations before
  * trusting a label set: Fleiss' κ and Krippendorff's α (nominal)
  * over a 3-rater × N-document matrix.
  *
  * The three "raters" are deterministic heuristic labelers with FIXED
  * absolute cuts (no global pass): length tercile on n_chars
  * (<250 / <400 / rest), token-count tercile (<45 / <75 / rest), and
  * a "the"-frequency tercile (≤1 / ≤3 / rest) — correlated but not
  * identical judgments, so agreement sits meaningfully above chance.
  *
  * Exactness: with n = 3 raters, the per-item category counts n_ij
  * satisfy Σ_j n_ij² = 3 + 2·e_i where e_i ∈ {0,1,3} is the number of
  * agreeing rater pairs — so BOTH statistics reduce to two integer
  * aggregates: E = Σe_i and the per-category assignment totals.
  * P̄ = E/(3N), P̄e = Σ(n_c/3N)², κ = (P̄−P̄e)/(1−P̄e);
  * D_o = 1 − E/(3N), D_e = 1 − Σ n_c(n_c−1)/(M(M−1)) with M = 3N,
  * α = 1 − D_o/D_e. Doubles appear only in the final one-row formula,
  * mirrored literally in the oracle.
  *
  * Scale shape: one map stage (three per-row labels + the pair-equal
  * count) + one global aggregate; no join, no window, no collection.
  */
object Agree {
  private type Q = (SparkSession, String) => DataFrame

  private def raters: (Column, Column, Column) = {
    val ra = when(col("n_chars") < 250, 0L)
      .when(col("n_chars") < 400, 1L).otherwise(2L)
    val nTok = size(split(col("text"), " "))
    val rb = when(nTok < 45, 0L).when(nTok < 75, 1L).otherwise(2L)
    val nThe = size(regexp_extract_all(col("text"), lit("the"), lit(0)))
    val rc = when(nThe <= 1, 0L).when(nThe <= 3, 1L).otherwise(2L)
    (ra, rb, rc)
  }

  private def labeled(s: SparkSession, d: String): DataFrame = {
    val (ra, rb, rc) = raters
    Tables.documents(s, d).transform(Tables.fanoutReady)
      .select(ra.as("ra"), rb.as("rb"), rc.as("rc"))
      .withColumn("e",
        when(col("ra") === col("rb"), 1L).otherwise(0L) +
        when(col("ra") === col("rc"), 1L).otherwise(0L) +
        when(col("rb") === col("rc"), 1L).otherwise(0L))
  }

  private def catCount(cat: Int): Column =
    when(col("ra") === cat.toLong, 1L).otherwise(0L) +
      when(col("rb") === cat.toLong, 1L).otherwise(0L) +
      when(col("rc") === cat.toLong, 1L).otherwise(0L)

  private def baseAgg(s: SparkSession, d: String): DataFrame =
    labeled(s, d).agg(count(lit(1)).as("n"), sum("e").as("ee"),
      sum(catCount(0)).as("m0"), sum(catCount(1)).as("m1"),
      sum(catCount(2)).as("m2"))

  val queries: Map[String, Q] = Map(
    "q_fleiss_kappa" -> ((s, d) => {
      val agg = baseAgg(s, d)
      val nD = col("n").cast("double")
      val pbar = col("ee").cast("double") / (lit(3.0) * nD)
      def pj(c: Column): Column =
        c.cast("double") / (lit(3.0) * nD)
      val pe = pj(col("m0")) * pj(col("m0")) +
        pj(col("m1")) * pj(col("m1")) + pj(col("m2")) * pj(col("m2"))
      agg.select(col("n").as("n_docs"),
        round(pbar, 6).as("p_bar"), round(pe, 6).as("p_e"),
        round(when(pe >= 1.0, lit(null).cast("double"))
          .otherwise((pbar - pe) / (lit(1.0) - pe)), 6)
          .as("fleiss_kappa"))
    }),

    "q_krippendorff_alpha" -> ((s, d) => {
      val agg = baseAgg(s, d)
      val nD = col("n").cast("double")
      val mD = lit(3.0) * nD
      val dObs = lit(1.0) - col("ee").cast("double") / mD
      def t(c: Column): Column =
        c.cast("double") * (c.cast("double") - 1.0)
      val dExp = lit(1.0) -
        (t(col("m0")) + t(col("m1")) + t(col("m2"))) /
          (mD * (mD - 1.0))
      agg.select(col("n").as("n_docs"),
        round(dObs, 6).as("d_o"), round(dExp, 6).as("d_e"),
        round(when(dExp <= 0.0, lit(null).cast("double"))
          .otherwise(lit(1.0) - dObs / dExp), 6).as("kripp_alpha"))
    }),

    // ---- Gwet's AC1 over the same 3-rater matrix: the chance
    // correction Pe_γ = (1/(K−1))·Σ_c π_c(1−π_c) stays stable when
    // category prevalence is skewed (the κ paradox), which is why
    // labeling pipelines report it beside κ. Same two integer
    // aggregates as Fleiss.
    "q_gwet_ac1" -> ((s, d) => {
      val agg = baseAgg(s, d)
      val nD = col("n").cast("double")
      val pbar = col("ee").cast("double") / (lit(3.0) * nD)
      def pi(c: Column): Column = c.cast("double") / (lit(3.0) * nD)
      val peg = (pi(col("m0")) * (lit(1.0) - pi(col("m0"))) +
        pi(col("m1")) * (lit(1.0) - pi(col("m1"))) +
        pi(col("m2")) * (lit(1.0) - pi(col("m2")))) / lit(2.0)
      agg.select(col("n").as("n_docs"),
        round(pbar, 6).as("p_bar"), round(peg, 6).as("p_e_gamma"),
        round(when(peg >= 1.0, lit(null).cast("double"))
          .otherwise((pbar - peg) / (lit(1.0) - peg)), 6)
          .as("gwet_ac1"))
    }),

    // ---- Scott's π for the two length-based raters (A = chars,
    // B = tokens): chance agreement from the POOLED category
    // distribution ((m_c^A + m_c^B)/2N)² — the 2-rater sibling of
    // Fleiss' κ (identical chance model).
    "q_scott_pi" -> ((s, d) => {
      val agg = labeled(s, d).agg(count(lit(1)).as("n"),
        sum(when(col("ra") === col("rb"), 1L).otherwise(0L)).as("ag"),
        sum(when(col("ra") === 0L, 1L).otherwise(0L) +
          when(col("rb") === 0L, 1L).otherwise(0L)).as("m0"),
        sum(when(col("ra") === 1L, 1L).otherwise(0L) +
          when(col("rb") === 1L, 1L).otherwise(0L)).as("m1"),
        sum(when(col("ra") === 2L, 1L).otherwise(0L) +
          when(col("rb") === 2L, 1L).otherwise(0L)).as("m2"))
      val nD = col("n").cast("double")
      val po = col("ag").cast("double") / nD
      def p(c: Column): Column = c.cast("double") / (lit(2.0) * nD)
      val pe = p(col("m0")) * p(col("m0")) +
        p(col("m1")) * p(col("m1")) + p(col("m2")) * p(col("m2"))
      agg.select(col("n").as("n_docs"),
        round(po, 6).as("p_o"), round(pe, 6).as("p_e"),
        round(when(pe >= 1.0, lit(null).cast("double"))
          .otherwise((po - pe) / (lit(1.0) - pe)), 6).as("scott_pi"))
    }))

  private val labeledSql: String =
    """WITH lb AS (
      |  SELECT
      |    CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1
      |      ELSE 2 END AS ra,
      |    CASE WHEN len(string_split(text, ' ')) < 45 THEN 0
      |      WHEN len(string_split(text, ' ')) < 75 THEN 1
      |      ELSE 2 END AS rb,
      |    CASE WHEN len(regexp_extract_all(text, 'the')) <= 1 THEN 0
      |      WHEN len(regexp_extract_all(text, 'the')) <= 3 THEN 1
      |      ELSE 2 END AS rc
      |  FROM documents),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum((CASE WHEN ra = rb THEN 1 ELSE 0 END) +
      |      (CASE WHEN ra = rc THEN 1 ELSE 0 END) +
      |      (CASE WHEN rb = rc THEN 1 ELSE 0 END)) AS BIGINT) AS ee,
      |    CAST(sum((CASE WHEN ra = 0 THEN 1 ELSE 0 END) +
      |      (CASE WHEN rb = 0 THEN 1 ELSE 0 END) +
      |      (CASE WHEN rc = 0 THEN 1 ELSE 0 END)) AS BIGINT) AS m0,
      |    CAST(sum((CASE WHEN ra = 1 THEN 1 ELSE 0 END) +
      |      (CASE WHEN rb = 1 THEN 1 ELSE 0 END) +
      |      (CASE WHEN rc = 1 THEN 1 ELSE 0 END)) AS BIGINT) AS m1,
      |    CAST(sum((CASE WHEN ra = 2 THEN 1 ELSE 0 END) +
      |      (CASE WHEN rb = 2 THEN 1 ELSE 0 END) +
      |      (CASE WHEN rc = 2 THEN 1 ELSE 0 END)) AS BIGINT) AS m2
      |  FROM lb)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_fleiss_kappa" ->
      s"""$labeledSql
        |SELECT n AS n_docs,
        |  round(CAST(ee AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)), 6)
        |    AS p_bar,
        |  round(CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |      (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |    CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |      (CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |    CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |      (CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))), 6)
        |    AS p_e,
        |  round(CASE WHEN CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE)) * (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE))) + CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE)) * (CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE))) + CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE)) * (CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE))) >= 1.0 THEN NULL
        |    ELSE (CAST(ee AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) -
        |      (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |      CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |      CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))))) /
        |      (1.0 - (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |      CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |      CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))))
        |    END, 6) AS fleiss_kappa
        |FROM agg""".stripMargin,

    "q_krippendorff_alpha" ->
      s"""$labeledSql
        |SELECT n AS n_docs,
        |  round(1.0 - CAST(ee AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)),
        |    6) AS d_o,
        |  round(1.0 - (CAST(m0 AS DOUBLE) * (CAST(m0 AS DOUBLE) - 1.0)
        |      + CAST(m1 AS DOUBLE) * (CAST(m1 AS DOUBLE) - 1.0)
        |      + CAST(m2 AS DOUBLE) * (CAST(m2 AS DOUBLE) - 1.0)) /
        |    (3.0 * CAST(n AS DOUBLE) * (3.0 * CAST(n AS DOUBLE) -
        |      1.0)), 6) AS d_e,
        |  round(CASE WHEN 1.0 - (CAST(m0 AS DOUBLE) * (CAST(m0 AS
        |      DOUBLE) - 1.0) + CAST(m1 AS DOUBLE) * (CAST(m1 AS
        |      DOUBLE) - 1.0) + CAST(m2 AS DOUBLE) * (CAST(m2 AS
        |      DOUBLE) - 1.0)) / (3.0 * CAST(n AS DOUBLE) *
        |      (3.0 * CAST(n AS DOUBLE) - 1.0)) <= 0.0 THEN NULL
        |    ELSE 1.0 - (1.0 - CAST(ee AS DOUBLE) /
        |      (3.0 * CAST(n AS DOUBLE))) /
        |      (1.0 - (CAST(m0 AS DOUBLE) * (CAST(m0 AS DOUBLE) - 1.0)
        |        + CAST(m1 AS DOUBLE) * (CAST(m1 AS DOUBLE) - 1.0)
        |        + CAST(m2 AS DOUBLE) * (CAST(m2 AS DOUBLE) - 1.0)) /
        |      (3.0 * CAST(n AS DOUBLE) * (3.0 * CAST(n AS DOUBLE) -
        |        1.0)))
        |    END, 6) AS kripp_alpha
        |FROM agg""".stripMargin,

    "q_gwet_ac1" ->
      s"""$labeledSql
        |SELECT n AS n_docs,
        |  round(CAST(ee AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)), 6)
        |    AS p_bar,
        |  round((CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |      (1.0 - CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |    CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |      (1.0 - CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))) +
        |    CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |      (1.0 - CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE))))
        |    / 2.0, 6) AS p_e_gamma,
        |  round(CASE WHEN (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE)) * (1.0 - CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE))) + CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE)) * (1.0 - CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE))) + CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE)) * (1.0 - CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS
        |      DOUBLE)))) / 2.0 >= 1.0 THEN NULL
        |    ELSE (CAST(ee AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) -
        |      (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (1.0 - CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS
        |        DOUBLE))) + CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS
        |        DOUBLE)) * (1.0 - CAST(m1 AS DOUBLE) / (3.0 * CAST(n
        |        AS DOUBLE))) + CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS
        |        DOUBLE)) * (1.0 - CAST(m2 AS DOUBLE) / (3.0 * CAST(n
        |        AS DOUBLE)))) / 2.0) /
        |      (1.0 - (CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)) *
        |        (1.0 - CAST(m0 AS DOUBLE) / (3.0 * CAST(n AS
        |        DOUBLE))) + CAST(m1 AS DOUBLE) / (3.0 * CAST(n AS
        |        DOUBLE)) * (1.0 - CAST(m1 AS DOUBLE) / (3.0 * CAST(n
        |        AS DOUBLE))) + CAST(m2 AS DOUBLE) / (3.0 * CAST(n AS
        |        DOUBLE)) * (1.0 - CAST(m2 AS DOUBLE) / (3.0 * CAST(n
        |        AS DOUBLE)))) / 2.0)
        |    END, 6) AS gwet_ac1
        |FROM agg""".stripMargin,

    "q_scott_pi" ->
      """WITH lb AS (
        |  SELECT
        |    CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1
        |      ELSE 2 END AS ra,
        |    CASE WHEN len(string_split(text, ' ')) < 45 THEN 0
        |      WHEN len(string_split(text, ' ')) < 75 THEN 1
        |      ELSE 2 END AS rb
        |  FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ag,
        |    CAST(sum((CASE WHEN ra = 0 THEN 1 ELSE 0 END) +
        |      (CASE WHEN rb = 0 THEN 1 ELSE 0 END)) AS BIGINT) AS m0,
        |    CAST(sum((CASE WHEN ra = 1 THEN 1 ELSE 0 END) +
        |      (CASE WHEN rb = 1 THEN 1 ELSE 0 END)) AS BIGINT) AS m1,
        |    CAST(sum((CASE WHEN ra = 2 THEN 1 ELSE 0 END) +
        |      (CASE WHEN rb = 2 THEN 1 ELSE 0 END)) AS BIGINT) AS m2
        |  FROM lb)
        |SELECT n AS n_docs,
        |  round(CAST(ag AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_o,
        |  round(CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |      (CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) +
        |    CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |      (CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) +
        |    CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |      (CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))), 6)
        |    AS p_e,
        |  round(CASE WHEN CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS
        |      DOUBLE)) * (CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS
        |      DOUBLE))) + CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS
        |      DOUBLE)) * (CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS
        |      DOUBLE))) + CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS
        |      DOUBLE)) * (CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS
        |      DOUBLE))) >= 1.0 THEN NULL
        |    ELSE (CAST(ag AS DOUBLE) / CAST(n AS DOUBLE) -
        |      (CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) +
        |      CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) +
        |      CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))))) /
        |      (1.0 - (CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m0 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) +
        |      CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m1 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE))) +
        |      CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)) *
        |        (CAST(m2 AS DOUBLE) / (2.0 * CAST(n AS DOUBLE)))))
        |    END, 6) AS scott_pi
        |FROM agg""".stripMargin)
}
