package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-10 seventh batch: collaborative-filtering TRAINING on the
  * engine — alternating least squares (k = 2, ridge λ = 0.1, two full
  * unrolled rounds) over the implicit (user × event-type) interaction
  * matrix, ending in the trained item factors and the model's exact
  * RMSE (reference analog: the reference schedules long-running batch
  * jobs, cmd/bacalhau/run.go; the engine here IS the job).
  *
  * Scale shape: the ratings matrix builds in ONE corpus aggregate
  * (user, type) and caches; each half-step is one keyed join + one
  * keyed aggregate — user solves group per user (SF-scaled output,
  * never broadcast), item solves collapse to the 5-type frame
  * (broadcast back). Nothing quadratic, nothing collected; rounds are
  * unrolled so the whole 2-round trainer is a single Catalyst plan per
  * half-step with cached frontiers.
  *
  * Exactness discipline: factors micro-quantize (round(v·10⁶) →
  * BIGINT) at every half-step boundary, so ALL cross-row sums —
  * per-user Gram entries, per-type Gram entries, squared-error terms —
  * are exact integer arithmetic (Gram products cast decimal(38,0) ↔
  * HUGEINT BEFORE the multiply); the 2×2 ridge solves run double on
  * identical expression trees in both engines. Item-factor init is the
  * deterministic alphabetical type rank (q = [1, idx/10]). */
object Recsys {

  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_als" -> ((s, d) => {
      val lam = 0.1
      val ratings = graft.CacheScope.cached(Tables.events(s, d)
        .groupBy(col("user_id").as("u"), col("event_type").as("t"))
        .agg(count(lit(1)).as("r")))
      // deterministic init: alphabetical type rank idx → q = [1, idx/10]
      val types = ratings.select("t").distinct()
      val items0 = graft.CacheScope.cached(types
        .join(broadcast(types.select(col("t").as("tb"))),
          col("tb") <= col("t"))
        .groupBy("t").agg(count(lit(1)).as("idx"))
        .select(col("t"), lit(1000000L).as("q0"),
          (col("idx") * 100000L).as("q1")))

      // users ← argmin_p Σ_t (r − p·q_t)² + λ|p|²  (per-user 2×2 ridge)
      def userStep(items: DataFrame): DataFrame =
        graft.CacheScope.cached {
          val g = ratings.join(broadcast(items), "t")
            .groupBy("u")
            .agg(
              sum(col("q0").cast("decimal(19,0)") * col("q0")).as("a11"),
              sum(col("q0").cast("decimal(19,0)") * col("q1")).as("a12"),
              sum(col("q1").cast("decimal(19,0)") * col("q1")).as("a22"),
              sum(col("q0").cast("decimal(19,0)") * col("r")).as("b0"),
              sum(col("q1").cast("decimal(19,0)") * col("r")).as("b1"))
          val (a11, a12, a22) = (
            g("a11").cast("double") / 1e12 + lam,
            g("a12").cast("double") / 1e12,
            g("a22").cast("double") / 1e12 + lam)
          val (b0, b1) = (g("b0").cast("double") / 1e6,
            g("b1").cast("double") / 1e6)
          val det = a11 * a22 - a12 * a12
          g.select(col("u"),
            round((b0 * a22 - b1 * a12) / det * 1e6).cast(LongType)
              .as("p0"),
            round((b1 * a11 - b0 * a12) / det * 1e6).cast(LongType)
              .as("p1"))
        }

      // items ← argmin_q Σ_u (r − p_u·q)² + λ|q|²  (per-type 2×2 ridge;
      // the ratings×users join is keyed on u — both sides SF-scaled,
      // never broadcast)
      def itemStep(users: DataFrame): DataFrame =
        graft.CacheScope.cached {
          val g = ratings.join(users, "u")
            .groupBy("t")
            .agg(
              sum(col("p0").cast("decimal(19,0)") * col("p0")).as("a11"),
              sum(col("p0").cast("decimal(19,0)") * col("p1")).as("a12"),
              sum(col("p1").cast("decimal(19,0)") * col("p1")).as("a22"),
              sum(col("p0").cast("decimal(19,0)") * col("r")).as("b0"),
              sum(col("p1").cast("decimal(19,0)") * col("r")).as("b1"))
          val (a11, a12, a22) = (
            g("a11").cast("double") / 1e12 + lam,
            g("a12").cast("double") / 1e12,
            g("a22").cast("double") / 1e12 + lam)
          val (b0, b1) = (g("b0").cast("double") / 1e6,
            g("b1").cast("double") / 1e6)
          val det = a11 * a22 - a12 * a12
          g.select(col("t"),
            round((b0 * a22 - b1 * a12) / det * 1e6).cast(LongType)
              .as("q0"),
            round((b1 * a11 - b0 * a12) / det * 1e6).cast(LongType)
              .as("q1"))
        }

      val users1 = userStep(items0)
      val items1 = itemStep(users1)
      val users2 = userStep(items1)
      val items2 = itemStep(users2)

      // exact RMSE of the round-2 model: per-rating squared error
      // quantizes to 1e-4 before the corpus-scale sum
      val err = ratings.join(users2, "u").join(broadcast(items2), "t")
        .select(col("t"),
          (col("r").cast("double") -
            (col("p0").cast("double") * col("q0") / 1e12 +
              col("p1").cast("double") * col("q1") / 1e12)).as("e"))
      val rmse = err
        .select(round(col("e") * col("e") * 1e4).cast(LongType).as("e4"))
        .agg(count(lit(1)).as("nr"), sum("e4").as("se4"))
        .select(col("nr"),
          round(sqrt(col("se4").cast("double") / 1e4 / col("nr")), 4)
            .as("rmse"))
      val nPerType = ratings.groupBy("t").agg(count(lit(1)).as("n_users"),
        sum("r").as("n_events"))
      items2.join(broadcast(nPerType), "t").crossJoin(broadcast(rmse))
        .select(col("t").as("event_type"), col("n_users"),
          col("n_events"),
          round(col("q0").cast("double") / 1e6, 4).as("factor0"),
          round(col("q1").cast("double") / 1e6, 4).as("factor1"),
          col("nr").as("n_ratings"), col("rmse"))
        .orderBy("event_type")
    }))

  val oracle: Map[String, String] = Map(
    "q_als" ->
      """WITH ratings AS MATERIALIZED (
        |  SELECT user_id AS u, event_type AS t,
        |    CAST(count(*) AS BIGINT) AS r
        |  FROM events GROUP BY 1, 2),
        |items0 AS (
        |  SELECT t, CAST(1000000 AS BIGINT) AS q0,
        |    CAST(row_number() OVER (ORDER BY t) * 100000 AS BIGINT)
        |      AS q1
        |  FROM (SELECT DISTINCT t FROM ratings) d),
        |u1g AS (
        |  SELECT ra.u,
        |    sum(CAST(i.q0 AS HUGEINT) * i.q0) AS a11,
        |    sum(CAST(i.q0 AS HUGEINT) * i.q1) AS a12,
        |    sum(CAST(i.q1 AS HUGEINT) * i.q1) AS a22,
        |    sum(CAST(i.q0 AS HUGEINT) * ra.r) AS b0,
        |    sum(CAST(i.q1 AS HUGEINT) * ra.r) AS b1
        |  FROM ratings ra JOIN items0 i ON i.t = ra.t GROUP BY 1),
        |users1 AS MATERIALIZED (
        |  SELECT u,
        |    CAST(round((b0d * a22d - b1d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS p0,
        |    CAST(round((b1d * a11d - b0d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS p1
        |  FROM (
        |    SELECT u, CAST(a11 AS DOUBLE) / 1e12 + 0.1 AS a11d,
        |      CAST(a12 AS DOUBLE) / 1e12 AS a12d,
        |      CAST(a22 AS DOUBLE) / 1e12 + 0.1 AS a22d,
        |      CAST(b0 AS DOUBLE) / 1e6 AS b0d,
        |      CAST(b1 AS DOUBLE) / 1e6 AS b1d
        |    FROM u1g) t),
        |i1g AS (
        |  SELECT ra.t,
        |    sum(CAST(us.p0 AS HUGEINT) * us.p0) AS a11,
        |    sum(CAST(us.p0 AS HUGEINT) * us.p1) AS a12,
        |    sum(CAST(us.p1 AS HUGEINT) * us.p1) AS a22,
        |    sum(CAST(us.p0 AS HUGEINT) * ra.r) AS b0,
        |    sum(CAST(us.p1 AS HUGEINT) * ra.r) AS b1
        |  FROM ratings ra JOIN users1 us ON us.u = ra.u GROUP BY 1),
        |items1 AS MATERIALIZED (
        |  SELECT t,
        |    CAST(round((b0d * a22d - b1d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS q0,
        |    CAST(round((b1d * a11d - b0d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS q1
        |  FROM (
        |    SELECT t, CAST(a11 AS DOUBLE) / 1e12 + 0.1 AS a11d,
        |      CAST(a12 AS DOUBLE) / 1e12 AS a12d,
        |      CAST(a22 AS DOUBLE) / 1e12 + 0.1 AS a22d,
        |      CAST(b0 AS DOUBLE) / 1e6 AS b0d,
        |      CAST(b1 AS DOUBLE) / 1e6 AS b1d
        |    FROM i1g) t2),
        |u2g AS (
        |  SELECT ra.u,
        |    sum(CAST(i.q0 AS HUGEINT) * i.q0) AS a11,
        |    sum(CAST(i.q0 AS HUGEINT) * i.q1) AS a12,
        |    sum(CAST(i.q1 AS HUGEINT) * i.q1) AS a22,
        |    sum(CAST(i.q0 AS HUGEINT) * ra.r) AS b0,
        |    sum(CAST(i.q1 AS HUGEINT) * ra.r) AS b1
        |  FROM ratings ra JOIN items1 i ON i.t = ra.t GROUP BY 1),
        |users2 AS MATERIALIZED (
        |  SELECT u,
        |    CAST(round((b0d * a22d - b1d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS p0,
        |    CAST(round((b1d * a11d - b0d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS p1
        |  FROM (
        |    SELECT u, CAST(a11 AS DOUBLE) / 1e12 + 0.1 AS a11d,
        |      CAST(a12 AS DOUBLE) / 1e12 AS a12d,
        |      CAST(a22 AS DOUBLE) / 1e12 + 0.1 AS a22d,
        |      CAST(b0 AS DOUBLE) / 1e6 AS b0d,
        |      CAST(b1 AS DOUBLE) / 1e6 AS b1d
        |    FROM u2g) t),
        |i2g AS (
        |  SELECT ra.t,
        |    sum(CAST(us.p0 AS HUGEINT) * us.p0) AS a11,
        |    sum(CAST(us.p0 AS HUGEINT) * us.p1) AS a12,
        |    sum(CAST(us.p1 AS HUGEINT) * us.p1) AS a22,
        |    sum(CAST(us.p0 AS HUGEINT) * ra.r) AS b0,
        |    sum(CAST(us.p1 AS HUGEINT) * ra.r) AS b1
        |  FROM ratings ra JOIN users2 us ON us.u = ra.u GROUP BY 1),
        |items2 AS MATERIALIZED (
        |  SELECT t,
        |    CAST(round((b0d * a22d - b1d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS q0,
        |    CAST(round((b1d * a11d - b0d * a12d) /
        |      (a11d * a22d - a12d * a12d) * 1e6) AS BIGINT) AS q1
        |  FROM (
        |    SELECT t, CAST(a11 AS DOUBLE) / 1e12 + 0.1 AS a11d,
        |      CAST(a12 AS DOUBLE) / 1e12 AS a12d,
        |      CAST(a22 AS DOUBLE) / 1e12 + 0.1 AS a22d,
        |      CAST(b0 AS DOUBLE) / 1e6 AS b0d,
        |      CAST(b1 AS DOUBLE) / 1e6 AS b1d
        |    FROM i2g) t2),
        |err AS (
        |  SELECT CAST(round((CAST(ra.r AS DOUBLE) -
        |      (CAST(us.p0 AS DOUBLE) * i.q0 / 1e12 +
        |       CAST(us.p1 AS DOUBLE) * i.q1 / 1e12)) *
        |    (CAST(ra.r AS DOUBLE) -
        |      (CAST(us.p0 AS DOUBLE) * i.q0 / 1e12 +
        |       CAST(us.p1 AS DOUBLE) * i.q1 / 1e12)) * 1e4) AS BIGINT)
        |    AS e4
        |  FROM ratings ra JOIN users2 us ON us.u = ra.u
        |  JOIN items2 i ON i.t = ra.t),
        |rmse AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_ratings,
        |    round(sqrt(CAST(sum(e4) AS DOUBLE) / 1e4 / count(*)), 4)
        |      AS rmse
        |  FROM err),
        |pertype AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(r) AS BIGINT) AS n_events
        |  FROM ratings GROUP BY 1)
        |SELECT i.t AS event_type, p.n_users, p.n_events,
        |  round(CAST(i.q0 AS DOUBLE) / 1e6, 4) AS factor0,
        |  round(CAST(i.q1 AS DOUBLE) / 1e6, 4) AS factor1,
        |  r.n_ratings, r.rmse
        |FROM items2 i JOIN pertype p ON p.t = i.t CROSS JOIN rmse r
        |ORDER BY event_type""".stripMargin)
}
