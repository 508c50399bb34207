package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 generation-evaluation batch: the n-gram overlap metrics an
  * LLM-data pipeline scores candidate generations with — corpus BLEU-2,
  * macro-averaged ROUGE-2, chrF (character 3-gram F with β=2), and the
  * distinct-n diversity ratios.
  *
  * Reference/candidate pairs are deterministic: doc_id div 2 groups the
  * corpus into (even = reference, odd = candidate) pairs — no RNG, no
  * windows, and the pairing key rides the scan. All gram extraction is
  * map-only (array `transform` over token/char offsets — no
  * self-joins); every clipped-count aggregate is ONE keyed group-by on
  * (pair, gram) with role-conditional sums, so the corpus shuffles
  * 32-byte gram rows exactly once per metric. At 100 TB: pair-keyed
  * hash exchanges with map-side partials, nothing quadratic, no
  * broadcast of corpus-sized frames.
  *
  * Reference analog: bacalhau evaluation jobs wrap sacrebleu/rouge
  * scripts as opaque execs (docs/examples); re-expressed natively.
  */
object TextEval {
  private type Q = (SparkSession, String) => DataFrame

  /** (grp, role, ws) for complete (ref, cand) pairs: role 0 = ref,
    * 1 = cand; only groups with both docs survive. */
  private def pairDocs(s: SparkSession, d: String): DataFrame =
    graft.CacheScope.cached {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(expr("doc_id div 2").as("grp"),
          (col("doc_id") % 2).as("role"),
          split(col("text"), " ").as("ws"),
          col("text"))
        .filter(size(col("ws")) >= 2)
      val ok = docs.groupBy("grp").agg(count(lit(1)).as("nr"))
        .filter(col("nr") === 2).select("grp")
      docs.join(ok, "grp")
    }

  /** Role-conditional gram counts per (grp, gram): cc = candidate
    * occurrences, rc = reference occurrences — ONE group-by, no
    * cand⋈ref join. */
  private def gramCounts(d2: DataFrame, gram: org.apache.spark.sql.Column)
      : DataFrame =
    d2.select(col("grp"), col("role"), explode(gram).as("g"))
      .groupBy("grp", "g")
      .agg(sum(when(col("role") === 1, 1L).otherwise(0L)).as("cc"),
        sum(when(col("role") === 0, 1L).otherwise(0L)).as("rc"))

  private def bigrams = transform(
    sequence(lit(1), size(col("ws")) - 1),
    i => concat(element_at(col("ws"), i), lit(" "),
      element_at(col("ws"), i + 1)))

  val queries: Map[String, Q] = Map(
    // ---- corpus BLEU-2: micro-averaged clipped 1/2-gram precisions
    // with the brevity penalty, candidate = odd docs scored against
    // their even reference twins. Clipped counts least(cc, rc) come
    // straight off the role-conditional aggregate; corpus totals are
    // one more keyed reduce. bleu = BP·exp(½(ln p₁ + ln p₂)).
    "q_bleu" -> ((s, d) => {
      val d2 = pairDocs(s, d)
      val uni = gramCounts(d2, col("ws"))
      val bi = gramCounts(d2, bigrams)
      val u = uni.agg(sum("cc").as("c1"),
        sum("rc").as("r1"),
        sum(least(col("cc"), col("rc"))).as("m1"))
      val b = bi.agg(sum("cc").as("c2"),
        sum(least(col("cc"), col("rc"))).as("m2"))
      val np = d2.select(col("grp")).distinct()
        .agg(count(lit(1)).as("n_pairs"))
      val p1 = col("m1").cast("double") / col("c1").cast("double")
      val p2 = col("m2").cast("double") / col("c2").cast("double")
      val bp = when(col("c1") >= col("r1"), lit(1.0))
        .otherwise(exp(lit(1.0) -
          col("r1").cast("double") / col("c1").cast("double")))
      u.crossJoin(broadcast(b)).crossJoin(broadcast(np))
        .select(col("n_pairs"), col("c1").as("cand_tokens"),
          col("r1").as("ref_tokens"),
          round(p1, 4).as("p1"), round(p2, 4).as("p2"),
          round(bp * exp(lit(0.5) * (log(p1) + log(p2))), 4)
            .as("bleu2"))
    }),

    // ---- macro ROUGE-2: per-pair bigram recall / precision / F1
    // averaged over pairs (the summarization-eval convention, vs
    // BLEU's micro corpus pooling). Zero-denominator pairs score 0 —
    // identical CASE in both engines.
    "q_rouge_2" -> ((s, d) => {
      val bi = gramCounts(pairDocs(s, d), bigrams)
      val per = bi.groupBy("grp").agg(
        sum("cc").as("ct"), sum("rc").as("rt"),
        sum(least(col("cc"), col("rc"))).as("mt"))
      val pr = per.select(
        when(col("ct") > 0,
          col("mt").cast("double") / col("ct").cast("double"))
          .otherwise(0.0).as("p"),
        when(col("rt") > 0,
          col("mt").cast("double") / col("rt").cast("double"))
          .otherwise(0.0).as("r"))
        .withColumn("f1", when(col("p") + col("r") > 0.0,
          lit(2.0) * col("p") * col("r") / (col("p") + col("r")))
          .otherwise(0.0))
      pr.agg(count(lit(1)).as("n_pairs"),
        round(avg("p"), 4).as("rouge2_p"),
        round(avg("r"), 4).as("rouge2_r"),
        round(avg("f1"), 4).as("rouge2_f1"))
    }),

    // ---- chrF (β=2): character 3-gram precision/recall with the
    // recall-weighted harmonic mean 5PR/(4P+R), macro over pairs —
    // the tokenization-robust MT metric. Char grams are map-only
    // substring transforms; same clipped-count machinery as ROUGE.
    "q_chrf" -> ((s, d) => {
      val d2 = pairDocs(s, d).filter(length(col("text")) >= 3)
      val grams = expr(
        "transform(sequence(1, length(text) - 2), " +
          "i -> substring(text, i, 3))")
      val per = gramCounts(d2, grams).groupBy("grp").agg(
        sum("cc").as("ct"), sum("rc").as("rt"),
        sum(least(col("cc"), col("rc"))).as("mt"))
      val pr = per.select(
        when(col("ct") > 0,
          col("mt").cast("double") / col("ct").cast("double"))
          .otherwise(0.0).as("p"),
        when(col("rt") > 0,
          col("mt").cast("double") / col("rt").cast("double"))
          .otherwise(0.0).as("r"))
        .withColumn("chrf", when(
          lit(4.0) * col("p") + col("r") > 0.0,
          lit(5.0) * col("p") * col("r") /
            (lit(4.0) * col("p") + col("r"))).otherwise(0.0))
      pr.agg(count(lit(1)).as("n_pairs"),
        round(avg("p"), 4).as("chrf_p"),
        round(avg("r"), 4).as("chrf_r"),
        round(avg("chrf"), 4).as("chrf_score"))
    }),

    // ---- distinct-n diversity per source: distinct 1/2-grams over
    // total — the repetitiveness signal generation pipelines gate on
    // (low distinct-2 = degenerate sampling). One exploded scan per
    // order, keyed (source) aggregates with map-side partials.
    "q_distinct_n" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("source"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
      val u = docs.select(col("source"), explode(col("ws")).as("g"))
        .groupBy("source").agg(count(lit(1)).as("n_tokens"),
          countDistinct("g").as("u1"))
      val b = docs.select(col("source"), explode(bigrams).as("g"))
        .groupBy("source").agg(count(lit(1)).as("n_bigrams"),
          countDistinct("g").as("u2"))
      u.join(b, "source")
        .select(col("source"), col("n_tokens"), col("n_bigrams"),
          round(col("u1").cast("double") /
            col("n_tokens").cast("double"), 4).as("distinct1"),
          round(col("u2").cast("double") /
            col("n_bigrams").cast("double"), 4).as("distinct2"))
        .orderBy("source")
    }))

  private val pairSql =
    """WITH docs AS MATERIALIZED (
      |  SELECT doc_id // 2 AS grp, doc_id % 2 AS role,
      |    string_split(text, ' ') AS ws, text
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |ok AS MATERIALIZED (
      |  SELECT grp FROM docs GROUP BY 1 HAVING count(*) = 2),
      |d2 AS MATERIALIZED (
      |  SELECT docs.* FROM docs JOIN ok USING (grp))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_bleu" ->
      s"""$pairSql,
         |uni AS MATERIALIZED (
         |  SELECT grp, g,
         |    CAST(sum(CASE WHEN role = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cc,
         |    CAST(sum(CASE WHEN role = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS rc
         |  FROM d2, unnest(ws) AS t(g) GROUP BY 1, 2),
         |bi AS MATERIALIZED (
         |  SELECT grp, g,
         |    CAST(sum(CASE WHEN role = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cc,
         |    CAST(sum(CASE WHEN role = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS rc
         |  FROM d2, unnest(list_transform(range(1, len(ws)),
         |    i -> ws[i] || ' ' || ws[i + 1])) AS t(g)
         |  GROUP BY 1, 2),
         |u AS (SELECT CAST(sum(cc) AS BIGINT) AS c1,
         |    CAST(sum(rc) AS BIGINT) AS r1,
         |    CAST(sum(least(cc, rc)) AS BIGINT) AS m1 FROM uni),
         |b AS (SELECT CAST(sum(cc) AS BIGINT) AS c2,
         |    CAST(sum(least(cc, rc)) AS BIGINT) AS m2 FROM bi),
         |np AS (SELECT CAST(count(DISTINCT grp) AS BIGINT) AS n_pairs
         |       FROM d2)
         |SELECT n_pairs, c1 AS cand_tokens, r1 AS ref_tokens,
         |  round(CAST(m1 AS DOUBLE) / CAST(c1 AS DOUBLE), 4) AS p1,
         |  round(CAST(m2 AS DOUBLE) / CAST(c2 AS DOUBLE), 4) AS p2,
         |  round((CASE WHEN c1 >= r1 THEN 1.0
         |      ELSE exp(1.0 - CAST(r1 AS DOUBLE) / CAST(c1 AS DOUBLE))
         |    END) * exp(0.5 *
         |      (ln(CAST(m1 AS DOUBLE) / CAST(c1 AS DOUBLE)) +
         |       ln(CAST(m2 AS DOUBLE) / CAST(c2 AS DOUBLE)))), 4)
         |    AS bleu2
         |FROM u CROSS JOIN b CROSS JOIN np""".stripMargin,
    "q_rouge_2" ->
      s"""$pairSql,
         |bi AS MATERIALIZED (
         |  SELECT grp, g,
         |    CAST(sum(CASE WHEN role = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cc,
         |    CAST(sum(CASE WHEN role = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS rc
         |  FROM d2, unnest(list_transform(range(1, len(ws)),
         |    i -> ws[i] || ' ' || ws[i + 1])) AS t(g)
         |  GROUP BY 1, 2),
         |per AS (
         |  SELECT grp, CAST(sum(cc) AS BIGINT) AS ct,
         |    CAST(sum(rc) AS BIGINT) AS rt,
         |    CAST(sum(least(cc, rc)) AS BIGINT) AS mt
         |  FROM bi GROUP BY 1),
         |pr AS (
         |  SELECT
         |    CASE WHEN ct > 0
         |      THEN CAST(mt AS DOUBLE) / CAST(ct AS DOUBLE)
         |      ELSE 0.0 END AS p,
         |    CASE WHEN rt > 0
         |      THEN CAST(mt AS DOUBLE) / CAST(rt AS DOUBLE)
         |      ELSE 0.0 END AS r
         |  FROM per),
         |pf AS (
         |  SELECT p, r, CASE WHEN p + r > 0.0
         |    THEN 2.0 * p * r / (p + r) ELSE 0.0 END AS f1
         |  FROM pr)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(p), 4) AS rouge2_p, round(avg(r), 4) AS rouge2_r,
         |  round(avg(f1), 4) AS rouge2_f1
         |FROM pf""".stripMargin,
    "q_chrf" ->
      s"""$pairSql,
         |d3 AS MATERIALIZED (
         |  SELECT * FROM d2 WHERE length(text) >= 3),
         |cg AS MATERIALIZED (
         |  SELECT grp, g,
         |    CAST(sum(CASE WHEN role = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS cc,
         |    CAST(sum(CASE WHEN role = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS rc
         |  FROM d3, unnest(list_transform(range(1, length(text) - 1),
         |    i -> substr(text, CAST(i AS INT), 3))) AS t(g)
         |  GROUP BY 1, 2),
         |per AS (
         |  SELECT grp, CAST(sum(cc) AS BIGINT) AS ct,
         |    CAST(sum(rc) AS BIGINT) AS rt,
         |    CAST(sum(least(cc, rc)) AS BIGINT) AS mt
         |  FROM cg GROUP BY 1),
         |pr AS (
         |  SELECT
         |    CASE WHEN ct > 0
         |      THEN CAST(mt AS DOUBLE) / CAST(ct AS DOUBLE)
         |      ELSE 0.0 END AS p,
         |    CASE WHEN rt > 0
         |      THEN CAST(mt AS DOUBLE) / CAST(rt AS DOUBLE)
         |      ELSE 0.0 END AS r
         |  FROM per),
         |pf AS (
         |  SELECT p, r, CASE WHEN 4.0 * p + r > 0.0
         |    THEN 5.0 * p * r / (4.0 * p + r) ELSE 0.0 END AS chrf
         |  FROM pr)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(avg(p), 4) AS chrf_p, round(avg(r), 4) AS chrf_r,
         |  round(avg(chrf), 4) AS chrf_score
         |FROM pf""".stripMargin,
    "q_distinct_n" ->
      """WITH docs AS MATERIALIZED (
        |  SELECT source, string_split(text, ' ') AS ws
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |u AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT g) AS BIGINT) AS u1
        |  FROM docs, unnest(ws) AS t(g) GROUP BY 1),
        |b AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(count(DISTINCT g) AS BIGINT) AS u2
        |  FROM docs, unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i + 1])) AS t(g)
        |  GROUP BY 1)
        |SELECT u.source, n_tokens, n_bigrams,
        |  round(CAST(u1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4)
        |    AS distinct1,
        |  round(CAST(u2 AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 4)
        |    AS distinct2
        |FROM u JOIN b USING (source)
        |ORDER BY source""".stripMargin)
}
