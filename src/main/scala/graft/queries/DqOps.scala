package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-10 sixth batch: the data-quality / validation surface a
  * curation team runs before shipping a corpus — k-fold cross-validated
  * calibration of the quality gate (does the gate generalize, fold by
  * fold?), an l-diversity privacy audit (the companion to q_kanon's
  * k-anonymity: do quasi-identifier groups carry diverse sensitive
  * values?), and a referential-integrity audit across the relational
  * tables (orphan foreign keys — the reference's verification step
  * checks results exist, pkg/verifier/noop/verifier.go; the engine
  * here checks they JOIN).
  *
  * House disciplines:
  *  - one cached corpus pass per query; per-fold / per-group frames are
  *    bounded (5 folds, lang×source cells) and broadcast;
  *  - the CV threshold compare is EXACT integer arithmetic
  *    (p6·train_n ≥ train_Σp6 — no division, no float drift);
  *  - ratio outputs guard zero denominators with explicit NULL on both
  *    engines; ties and orderings are explicit.
  */
object DqOps {

  private type Q = (SparkSession, String) => DataFrame

  /** The Pipeline/TextOps quality score (textually identical to
    * Evaluation.quality — the shared gate heuristic under test). */
  private def quality = {
    val nTokens = (length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
    val stopCnt =
      size(regexp_extract_all(col("text"), lit("\\b(the|a)\\b"), lit(0)))
        .cast(LongType)
    val stopRatio = round(stopCnt.cast("double") / nTokens, 6)
    round(log(lit(1.0) + nTokens) * (lit(1.0) - stopRatio), 6)
  }

  /** The quality score squashed to a probability of lang='en' via the
    * fixed logistic link (center 1.2, unit scale) — micro-quantized. */
  private def prob6: Column =
    round(lit(1.0) / (lit(1.0) + exp(lit(1.2) - quality)) * 1e6)
      .cast(LongType)

  /** Shared oracle fragment: per-document (doc_id, p6, y). */
  private val scoredSql =
    """scored AS (
      |  SELECT doc_id,
      |    CAST(round(1.0 / (1.0 + exp(1.2 -
      |      round(ln(1.0 + n_tokens) *
      |        (1.0 - round(CAST(stop_cnt AS DOUBLE) / n_tokens, 6)), 6)))
      |      * 1e6) AS BIGINT) AS p6,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      |  FROM (
      |    SELECT doc_id, lang,
      |      CAST(length(text) - length(replace(text, ' ', '')) + 1
      |        AS BIGINT) AS n_tokens,
      |      CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT)
      |        AS stop_cnt
      |    FROM documents) t)""".stripMargin

  val queries: Map[String, Q] = Map(
    // ---- 5-fold cross-validated gate evaluation: fold by doc_id % 5;
    // each fold's threshold is the TRAIN folds' mean probability
    // (leave-one-fold-out), and the compare is exact integer
    // arithmetic — p6·train_n ≥ train_Σp6 — so no division enters the
    // corpus-scale path and partition order can't move a prediction.
    // ONE cached scored pass; the fold totals are a 5-row broadcast;
    // train stats derive as total−fold (no second scan, no 5× rework).
    "q_cv_gate" -> ((s, d) => {
      val scored = graft.CacheScope.cached(Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select((col("doc_id") % 5).as("fold"), prob6.as("p6"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y")))
      val folds = graft.CacheScope.cached(scored.groupBy("fold")
        .agg(count(lit(1)).as("nf"), sum("p6").as("spf")))
      val tot = folds.agg(sum("nf").as("n"), sum("spf").as("sp"))
      val pred = scored
        .join(broadcast(folds), "fold")
        .crossJoin(broadcast(tot))
        .select(col("fold"), col("y"),
          (col("p6") * (col("n") - col("nf")) >=
            (col("sp") - col("spf"))).as("pred"))
      val cm = pred.groupBy("fold").agg(
        count(lit(1)).as("n_test"),
        sum(when(col("pred") && col("y") === 1L, 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("pred") && col("y") === 0L, 1L).otherwise(0L))
          .as("fp"),
        sum(when(!col("pred") && col("y") === 1L, 1L).otherwise(0L))
          .as("fn"),
        sum(when(!col("pred") && col("y") === 0L, 1L).otherwise(0L))
          .as("tn"))
      def ratio(num: Column, den: Column): Column =
        when(den > 0L, round(num.cast("double") / den, 6))
      cm.select(col("fold"), col("n_test"), col("tp"), col("fp"),
        col("fn"), col("tn"),
        ratio(col("tp") + col("tn"), col("n_test")).as("accuracy"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
        .orderBy("fold")
    }),

    // ---- l-diversity audit: for each quasi-identifier cell
    // (lang × source), how DIVERSE is the sensitive attribute (the
    // document-length 200-char band, capped at decile 9)? A cell k-
    // anonymous but length-homogeneous still leaks. Two keyed
    // aggregates — (lang, source, band) counts, then per-cell distinct
    // count, dominant-band share, and the l ≥ 3 flag. All frames are
    // domain-bounded (langs × sources × 10 bands).
    "q_l_diversity" -> ((s, d) => {
      val bands = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          least(expr("n_chars div 200"), lit(9L)).as("band"))
        .agg(count(lit(1)).as("cnt"))
      bands.groupBy("lang", "source")
        .agg(sum("cnt").as("n_docs"),
          count(lit(1)).as("l_distinct"),
          max("cnt").as("dom_cnt"))
        .select(col("lang"), col("source"), col("n_docs"),
          col("l_distinct"),
          round(col("dom_cnt").cast("double") / col("n_docs"), 6)
            .as("dominant_share"),
          (col("l_distinct") >= 3L).as("meets_l3"))
        .orderBy("lang", "source")
    }),

    // ---- referential-integrity audit: orphan foreign keys across the
    // star — orders without a customer, lineitems without an order /
    // part / supplier. Each arm is a keyed LEFT ANTI join (map-side
    // prunable, AQE picks broadcast when the dim side is small) over
    // ONE cached key projection per fact; the six counts meet in a
    // broadcast 1-row fan-in. At 100 TB every arm stays a keyed
    // shuffle — nothing quadratic, nothing collected.
    "q_fk_orphans" -> ((s, d) => {
      val li = graft.CacheScope.cached(Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey"))
      val nOrders = Tables.orders(s, d).agg(count(lit(1)).as("n_orders"))
      val oOrph = Tables.orders(s, d).select("o_custkey")
        .join(Tables.customer(s, d).select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orders_no_customer"))
      val nLi = li.agg(count(lit(1)).as("n_lineitem"))
      val liO = li.select("l_orderkey")
        .join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("lineitem_no_order"))
      val liP = li.select("l_partkey")
        .join(Tables.part(s, d).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_anti")
        .agg(count(lit(1)).as("lineitem_no_part"))
      val liS = li.select("l_suppkey")
        .join(Tables.supplier(s, d).select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .agg(count(lit(1)).as("lineitem_no_supplier"))
      nOrders.crossJoin(broadcast(oOrph)).crossJoin(broadcast(nLi))
        .crossJoin(broadcast(liO)).crossJoin(broadcast(liP))
        .crossJoin(broadcast(liS))
        .select(col("n_orders"), col("orders_no_customer"),
          col("n_lineitem"), col("lineitem_no_order"),
          col("lineitem_no_part"), col("lineitem_no_supplier"),
          (col("orders_no_customer") + col("lineitem_no_order") +
            col("lineitem_no_part") + col("lineitem_no_supplier") === 0L)
            .as("referentially_intact"))
    }))

  val oracle: Map[String, String] = Map(
    "q_cv_gate" ->
      s"""WITH $scoredSql,
         |sf AS (SELECT doc_id % 5 AS fold, p6, y FROM scored),
         |folds AS (
         |  SELECT fold, CAST(count(*) AS BIGINT) AS nf,
         |    CAST(sum(p6) AS BIGINT) AS spf
         |  FROM sf GROUP BY 1),
         |tot AS (SELECT CAST(sum(nf) AS BIGINT) AS n,
         |          CAST(sum(spf) AS BIGINT) AS sp FROM folds),
         |pred AS (
         |  SELECT s.fold, s.y,
         |    (s.p6 * (t.n - f.nf) >= (t.sp - f.spf)) AS pred
         |  FROM sf s JOIN folds f ON f.fold = s.fold CROSS JOIN tot t),
         |cm AS (
         |  SELECT fold, CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(CASE WHEN pred AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN pred AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN NOT pred AND y = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN NOT pred AND y = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tn
         |  FROM pred GROUP BY 1)
         |SELECT fold, n_test, tp, fp, fn, tn,
         |  CASE WHEN n_test > 0 THEN
         |    round(CAST(tp + tn AS DOUBLE) / n_test, 6) END AS accuracy,
         |  CASE WHEN tp + fp > 0 THEN
         |    round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
         |  CASE WHEN tp + fn > 0 THEN
         |    round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
         |  CASE WHEN 2 * tp + fp + fn > 0 THEN
         |    round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) END
         |    AS f1
         |FROM cm ORDER BY fold""".stripMargin,
    "q_l_diversity" ->
      """WITH bands AS (
        |  SELECT lang, source, least(n_chars // 200, 9) AS band,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT lang, source, CAST(sum(cnt) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS l_distinct,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6)
        |    AS dominant_share,
        |  count(*) >= 3 AS meets_l3
        |FROM bands GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,
    "q_fk_orphans" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey))
        |    AS orders_no_customer,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lineitem,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_orderkey = l.l_orderkey))
        |    AS lineitem_no_order,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM part p
        |                     WHERE p.p_partkey = l.l_partkey))
        |    AS lineitem_no_part,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |                     WHERE s.s_suppkey = l.l_suppkey))
        |    AS lineitem_no_supplier,
        |  ((SELECT count(*) FROM orders o
        |    WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                      WHERE c.c_custkey = o.o_custkey)) +
        |   (SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                      WHERE o.o_orderkey = l.l_orderkey)) +
        |   (SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM part p
        |                      WHERE p.p_partkey = l.l_partkey)) +
        |   (SELECT count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |                      WHERE s.s_suppkey = l.l_suppkey)) = 0)
        |    AS referentially_intact""".stripMargin)
}
