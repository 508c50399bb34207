package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, Q] = Map(
    // ---- conversion funnel view → click → purchase: each stage is the
    // user's EARLIEST qualifying event strictly after the previous stage.
    // Three per-user min-aggregations chained by equi-joins on user_id —
    // each stage's frame shrinks, and nothing wider than (user, ts) ever
    // shuffles.
    "q_funnel" -> ((s, d) => {
      val e = Tables.events(s, d).select("user_id", "event_type", "ts_us")
      val a = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_us").as("t_view"))
      val b = e.filter(col("event_type") === "click").join(a, "user_id")
        .filter(col("ts_us") > col("t_view"))
        .groupBy("user_id").agg(min("ts_us").as("t_click"))
      val c = e.filter(col("event_type") === "purchase").join(b, "user_id")
        .filter(col("ts_us") > col("t_click"))
        .groupBy("user_id").agg(min("ts_us").as("t_buy"))
      a.agg(count(lit(1)).as("users")).select(lit(1).as("stage"),
          lit("view").as("step"), col("users"))
        .unionAll(b.agg(count(lit(1)).as("users")).select(lit(2).as("stage"),
          lit("click").as("step"), col("users")))
        .unionAll(c.agg(count(lit(1)).as("users")).select(lit(3).as("stage"),
          lit("purchase").as("step"), col("users")))
        .orderBy("stage")
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
    // any strictly-cheaper price. The global window runs over the
    // per-price AGGREGATE (cardinality = distinct prices, orders of
    // magnitude below row count; an unbounded price domain gets bucketed
    // first — same two-phase shape).
    "q_skyline" -> ((s, d) => {
      val p = Tables.part(s, d)
      val perPrice = p.groupBy("p_retailprice").agg(max("p_size").as("msz"))
      val w = Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
      val pm = perPrice.withColumn("prevmax", max("msz").over(w))
        .select("p_retailprice", "prevmax")
      p.join(pm, "p_retailprice")
        .filter(col("prevmax").isNull || col("prevmax") <= col("p_size"))
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    })
  )

  val oracle: Map[String, String] = Map(
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
        |ORDER BY p_partkey""".stripMargin
  )
}
