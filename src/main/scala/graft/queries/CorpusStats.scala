package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Corpus-distribution statistics — the profiling pass a training-data
  * pipeline runs BEFORE deciding filters and mixes (reference workloads
  * stop at grep/wc; these are the "know your corpus" extensions the
  * builder brief asks for alongside dedup/quality):
  *
  *  - q_zipf: Zipf's-law slope of the unigram frequency distribution,
  *    fit by least squares over (ln rank, ln freq) of the top-200 words.
  *    A healthy natural-language corpus sits near -1; machine-generated
  *    or template spam bends the curve. Corpus reduces to a vocabulary-
  *    bounded count table FIRST; the regression runs over 200 rows.
  *  - q_mi: mutual information between the source and lang columns —
  *    detects when a "random" shard assignment actually correlates with
  *    language (a mix-design hazard). All probability terms derive from
  *    ONE contingency-table aggregate (|sources|×|langs| rows) plus
  *    broadcast marginals.
  *  - q_vocab_growth: per-source type/token counts and the Herdan C
  *    (log-log type-token ratio) — the dial for how lexically diverse
  *    each source is. One explode → per-(source,word) reduce →
  *    per-source reduce; both aggs partial-combine map-side.
  *
  * Scale shapes: every statistic is computed on an aggregate that is
  * orders of magnitude smaller than the corpus (vocab table, contingency
  * table, per-source rollup); the corpus itself is touched by exactly one
  * explode+reduce pass per query.
  */
object CorpusStats {
  type Q = (SparkSession, String) => DataFrame

  /** (source, w) token stream — one explode over documents. */
  private def words(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))

  val queries: Map[String, Q] = Map(
    // ---- Zipf slope: rank words by corpus frequency (ties → word asc so
    // both engines rank identically), keep the top 200, least-squares fit
    // ln(freq) ~ ln(rank). The vocabulary aggregate is the only corpus
    // pass; the window orders a vocab-bounded table, not the corpus.
    "q_zipf" -> ((s, d) => {
      val freq = words(s, d).groupBy("w").agg(count(lit(1)).as("c"))
      // top-200 via orderBy+limit → TakeOrderedAndProject (distributed
      // top-k over the vocab table); the rank window then orders 200 rows,
      // never the vocabulary
      val top = freq.orderBy(col("c").desc, col("w").asc).limit(200)
      val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("w").asc)))
        .select(log(col("rank").cast("double")).as("lr"),
          log(col("c").cast("double")).as("lc"))
      ranked.agg(
        count(lit(1)).as("n_words"),
        round(regr_slope(col("lc"), col("lr")), 4).as("zipf_slope"),
        round(regr_intercept(col("lc"), col("lr")), 4).as("zipf_intercept"),
        round(regr_r2(col("lc"), col("lr")), 4).as("r2"))
    }),

    // ---- mutual information I(source; lang) in nats, plus the two
    // entropies: sum over the contingency table of p(x,y)·ln(p(x,y)/
    // (p(x)p(y))). The joint table aggregates once; marginals and the
    // total are broadcast 1-row/tiny sides around it.
    "q_mi" -> ((s, d) => {
      val joint = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("nxy"))
        .localCheckpoint(true) // one corpus scan; 4 plan branches below
      val total = joint.agg(sum("nxy").cast("double").as("n"))
      val px = joint.groupBy("source").agg(sum("nxy").as("nx"))
      val py = joint.groupBy("lang").agg(sum("nxy").as("ny"))
      joint.join(broadcast(px), "source")
        .join(broadcast(py), "lang")
        .crossJoin(broadcast(total))
        .select(
          // nx·ny promotes to double BEFORE multiplying: per-source ×
          // per-lang doc counts at the 100 TB design point (~1e11 each)
          // would overflow a Long product; n is already double and the
          // result feeds log() anyway
          (col("nxy") / col("n") *
            log(col("nxy") * col("n") /
              (col("nx").cast("double") * col("ny"))))
            .as("mi_term"),
          (col("nxy") / col("n") * -log(col("nxy") / col("n")))
            .as("hxy_term"))
        .agg(round(sum("mi_term"), 6).as("mi_nats"),
          round(sum("hxy_term"), 6).as("h_joint_nats"))
    }),

    // ---- per-source vocabulary growth: tokens, types, Herdan's
    // C = ln(types)/ln(tokens). Two-stage reduce — (source,word) then
    // source — so the big shuffle carries one row per distinct word per
    // source, never the token stream.
    "q_vocab_growth" -> ((s, d) => {
      words(s, d)
        .groupBy("source", "w").agg(count(lit(1)).as("cw"))
        .groupBy("source")
        .agg(sum("cw").as("n_tokens"),
          count(lit(1)).as("n_types"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          round(log(col("n_types").cast("double")) /
            log(col("n_tokens").cast("double")), 6).as("herdan_c"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_zipf" ->
      """WITH freq AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, w ASC)
        |    AS DOUBLE)) AS lr, ln(CAST(c AS DOUBLE)) AS lc
        |  FROM freq
        |  QUALIFY row_number() OVER (ORDER BY c DESC, w ASC) <= 200)
        |SELECT CAST(count(*) AS BIGINT) AS n_words,
        |  round(regr_slope(lc, lr), 4) AS zipf_slope,
        |  round(regr_intercept(lc, lr), 4) AS zipf_intercept,
        |  round(regr_r2(lc, lr), 4) AS r2
        |FROM ranked""".stripMargin,
    "q_mi" ->
      """WITH joint AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS nxy
        |  FROM documents GROUP BY 1, 2),
        |total AS (SELECT CAST(sum(nxy) AS DOUBLE) AS n FROM joint),
        |px AS (SELECT source, sum(nxy) AS nx FROM joint GROUP BY 1),
        |py AS (SELECT lang, sum(nxy) AS ny FROM joint GROUP BY 1)
        |SELECT
        |  round(sum(nxy / n * ln(nxy * n / (nx * ny))), 6) AS mi_nats,
        |  round(sum(nxy / n * -ln(nxy / n)), 6) AS h_joint_nats
        |FROM joint
        |JOIN px USING (source) JOIN py USING (lang) CROSS JOIN total""".stripMargin,
    "q_vocab_growth" ->
      """WITH cw AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS cw
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2)
        |SELECT source, CAST(sum(cw) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  round(ln(CAST(count(*) AS DOUBLE)) /
        |    ln(CAST(sum(cw) AS DOUBLE)), 6) AS herdan_c
        |FROM cw GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
