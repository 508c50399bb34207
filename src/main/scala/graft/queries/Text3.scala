package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-13 batch 3 — corpus-linguistics operators the TextOps/
  * CorpusStats/TextEval families don't cover: Good–Turing frequency
  * smoothing (the count-of-counts table every open-vocabulary LM
  * discount starts from), the Rényi entropy spectrum (Hartley /
  * Shannon / collision / min-entropy of the unigram distribution),
  * Burrows' Delta (the classical stylometric distance between
  * sources), and Dunning's log-likelihood G² keyness (the
  * variance-stable alternative to q_chi2_keywords' χ²).
  *
  * Exactness strategy: everything reduces to the integer word-count
  * tables (w, c) and (source, w, c). Per-term transcendentals
  * (c·ln c, |z|-gaps, G² cell terms) micro-quantize to integers per
  * ROW/GROUP before any corpus- or vocab-sized sum (q_dsir
  * discipline); relative frequencies quantize to nano BEFORE the
  * cross-source moments so Burrows' μ/σ come from exact integer sums.
  * Doubles appear only in final bounded-frame formulas.
  *
  * Scale shapes: one vocabulary aggregate each (map-side combined);
  * count-of-counts and the top-20 panel are value-domain- or
  * k-bounded broadcasts; Burrows' z-frame is sources × 20 rows; G²
  * ranks via TakeOrderedAndProject (distributed top-k, no corpus
  * window).
  */
object Text3 {
  private type Q = (SparkSession, String) => DataFrame

  private def words(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .transform(Tables.fanoutReady)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))

  val queries: Map[String, Q] = Map(
    // ---- Good–Turing: count-of-counts N_r and the Turing discount
    // r* = (r+1)·N_{r+1}/N_r for r ≤ 5, plus the unseen-mass estimate
    // P₀ = N₁/T — all exact integers off the species histogram until
    // the two final divisions. Species are token TRIGRAM shingles
    // (within-document): the fixture's closed 31-word vocabulary has
    // no rare unigrams at all (min count 26), while trigram types are
    // genuinely sparse — the regime GT smoothing exists for.
    "q_good_turing" -> ((s, d) => {
      // r14: hoist split(text) into a materialized column — the previous
      // form re-ran `split` INSIDE the transform lambda (4 references,
      // one per element access), i.e. O(words²) splits + allocations per
      // document; same trigram strings, one split per row (guide §1.2
      // step 2 / §4 expression cost).
      val freq = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(split(col("text"), " ").as("ws"))
        .select(expr("transform(slice(ws, 1, " +
          "greatest(size(ws) - 2, 0)), (x, i) -> " +
          "concat(x, ' ', ws[i + 1], ' ', ws[i + 2]))").as("gs"))
        .select(explode(col("gs")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.cached)
      val nr = freq.groupBy("c").agg(count(lit(1)).as("n_r"))
        .transform(graft.CacheScope.cached)
      val tot = freq.agg(sum("c").as("t"))
      val n1 = nr.filter(col("c") === 1L)
        .select(col("n_r").as("n1"))
      val nr1 = nr.select((col("c") - 1L).as("c"),
        col("n_r").as("n_r1"))
      nr.filter(col("c") <= 5L)
        .join(nr1, Seq("c"), "left")
        .na.fill(0L, Seq("n_r1"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(n1))
        .select(col("c").as("r"), col("n_r"), col("n_r1"),
          round((col("c") + 1L).cast("double") *
            col("n_r1").cast("double") / col("n_r").cast("double"), 6)
            .as("r_star"),
          col("t").as("total_tokens"),
          round(col("n1").cast("double") / col("t").cast("double"), 6)
            .as("p0_mass"))
        .orderBy("r")
    }),

    // ---- Rényi entropy spectrum of the unigram distribution:
    // H₀ (Hartley, ln V), H₁ (Shannon), H₂ (collision, −ln Σp²), H∞
    // (min-entropy, −ln max p). Shannon's Σc·ln c micro-quantizes per
    // WORD before the vocabulary sum; Σc² rides decimal(38,0); the
    // identities H₁ = ln T − Σc·ln c/T and H₂ = 2 ln T − ln Σc² keep
    // every corpus-sized term integral.
    "q_renyi" -> ((s, d) => {
      val freq = words(s, d).groupBy("w").agg(count(lit(1)).as("c"))
      val agg = freq.agg(count(lit(1)).as("vocab"),
        sum("c").as("t"),
        sum((col("c").cast("decimal(38,0)") * col("c"))
          .cast("decimal(38,0)")).as("s2"),
        max("c").as("cmax"),
        sum(round(col("c").cast("double") *
          log(col("c").cast("double")) * 1e6).cast(LongType)).as("cl6"))
      val tD = col("t").cast("double")
      agg.select(col("vocab"), col("t").as("total_tokens"),
        round(log(col("vocab").cast("double")), 6).as("hartley"),
        round(log(tD) - col("cl6").cast("double") / 1e6 / tD, 6)
          .as("shannon"),
        round(lit(2.0) * log(tD) - log(col("s2").cast("double")), 6)
          .as("collision"),
        round(log(tD) - log(col("cmax").cast("double")), 6)
          .as("min_entropy"))
    }),

    // ---- Burrows' Delta between sources over the 20 most frequent
    // corpus words (the stylometric standard: function words carry
    // authorial signal): z-score each source's relative frequency per
    // panel word (population σ across sources), Delta = mean |z₁−z₂|.
    // Relative frequencies quantize to nano ints BEFORE the
    // cross-source moments; |z|-gaps micro-quantize per word before
    // the 20-row pair sum. Frames after the two corpus aggregates are
    // sources × 20.
    "q_burrows_delta" -> ((s, d) => {
      val w0 = words(s, d)
      val wc = w0.groupBy("source", "w").agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.cached)
      val srcTot = wc.groupBy("source").agg(sum("c").as("ts"))
      val top20 = wc.groupBy("w").agg(sum("c").as("cw"))
        .orderBy(col("cw").desc, col("w").asc).limit(20).select("w")
      val dense = srcTot.crossJoin(broadcast(top20))
        .join(wc, Seq("source", "w"), "left")
        .na.fill(0L, Seq("c"))
        .select(col("source"), col("w"),
          round(col("c").cast("double") / col("ts").cast("double") *
            1e9).cast(LongType).as("f9"))
      val mo = dense.groupBy("w").agg(count(lit(1)).as("ns"),
        sum("f9").as("sf"),
        sum((col("f9").cast("decimal(38,0)") * col("f9"))
          .cast("decimal(38,0)")).as("sf2"))
      val nD = col("ns").cast("double")
      val mean = col("sf").cast("double") / nD
      val sd = sqrt(greatest(lit(0.0),
        col("sf2").cast("double") / nD - mean * mean))
      val z = dense.join(broadcast(mo.select(col("w"), mean.as("mu"),
          sd.as("sd"))), Seq("w"))
        .select(col("source"), col("w"),
          when(col("sd") <= 0.0, lit(0.0))
            .otherwise((col("f9").cast("double") - col("mu")) /
              col("sd")).as("z"))
      val a = z.select(col("source").as("s1"), col("w"),
        col("z").as("z1"))
      val b = z.select(col("source").as("s2"), col("w"),
        col("z").as("z2"))
      a.join(b, Seq("w")).filter(col("s1") < col("s2"))
        .select(col("s1"), col("s2"),
          round(abs(col("z1") - col("z2")) * 1e6).cast(LongType)
            .as("t6"))
        .groupBy("s1", "s2")
        .agg(count(lit(1)).as("n_words"),
          round(sum("t6").cast("double") / count(lit(1)) / 1e6, 6)
            .as("delta"))
        .orderBy("s1", "s2")
    }),

    // ---- Dunning's G² keyness (source vs rest-of-corpus, 2×2
    // log-likelihood ratio per observed (source, word) cell): the
    // variance-stable keyword statistic that doesn't blow up on rare
    // words like χ² does. All four cells and margins are exact
    // integers; G² is a final per-row double; ranking is a global
    // top-10 via TakeOrderedAndProject with (source, w) tie-breaks.
    "q_dunning_g2" -> ((s, d) => {
      val wc = words(s, d).groupBy("source", "w")
        .agg(count(lit(1)).as("a"))
        .transform(graft.CacheScope.cached)
      val srcTot = wc.groupBy("source").agg(sum("a").as("ts"))
      val wTot = wc.groupBy("w").agg(sum("a").as("cw"))
      val tot = srcTot.agg(sum("ts").as("t"))
      val f = wc.join(broadcast(srcTot), Seq("source"))
        .join(wTot, Seq("w"))
        .crossJoin(broadcast(tot))
      val aD = col("a").cast("double")
      val bD = (col("ts") - col("a")).cast("double")
      val cD = (col("cw") - col("a")).cast("double")
      val dD = (col("t") - col("ts") - (col("cw") - col("a")))
        .cast("double")
      val tD = col("t").cast("double")
      val tsD = col("ts").cast("double")
      val cwD = col("cw").cast("double")
      def term(o: org.apache.spark.sql.Column,
          e: org.apache.spark.sql.Column) =
        when(o <= 0.0, lit(0.0)).otherwise(o * log(o / e))
      val g2 = lit(2.0) * (
        term(aD, tsD * cwD / tD) +
        term(bD, tsD * (tD - cwD) / tD) +
        term(cD, (tD - tsD) * cwD / tD) +
        term(dD, (tD - tsD) * (tD - cwD) / tD))
      f.select(col("source"), col("w"), col("a"), g2.as("g2u"))
        .orderBy(col("g2u").desc, col("source").asc, col("w").asc)
        .limit(10)
        .select(col("source"), col("w"), col("a").as("count_in_src"),
          round(col("g2u"), 4).as("g2"))
    }))

  val oracle: Map[String, String] = Map(
    "q_good_turing" ->
      """WITH freq AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (
        |    SELECT unnest(list_transform(
        |      range(greatest(len(string_split(text, ' ')) - 2, 0)),
        |      i -> string_split(text, ' ')[i + 1] || ' ' ||
        |        string_split(text, ' ')[i + 2] || ' ' ||
        |        string_split(text, ' ')[i + 3])) AS w
        |    FROM documents)
        |  GROUP BY 1),
        |nr AS (
        |  SELECT c, CAST(count(*) AS BIGINT) AS n_r
        |  FROM freq GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM freq),
        |n1 AS (SELECT n_r AS n1 FROM nr WHERE c = 1)
        |SELECT a.c AS r, a.n_r,
        |  coalesce(b.n_r, 0) AS n_r1,
        |  round((a.c + 1) * CAST(coalesce(b.n_r, 0) AS DOUBLE) /
        |    a.n_r, 6) AS r_star,
        |  t AS total_tokens,
        |  round(CAST(n1 AS DOUBLE) / t, 6) AS p0_mass
        |FROM nr a LEFT JOIN nr b ON b.c = a.c + 1
        |CROSS JOIN tot CROSS JOIN n1
        |WHERE a.c <= 5 ORDER BY r""".stripMargin,

    "q_renyi" ->
      """WITH freq AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(c) AS BIGINT) AS t,
        |    sum(CAST(c AS HUGEINT) * c) AS s2,
        |    CAST(max(c) AS BIGINT) AS cmax,
        |    CAST(sum(CAST(round(CAST(c AS DOUBLE) *
        |      ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT)
        |      AS cl6
        |  FROM freq)
        |SELECT vocab, t AS total_tokens,
        |  round(ln(CAST(vocab AS DOUBLE)), 6) AS hartley,
        |  round(ln(CAST(t AS DOUBLE)) -
        |    CAST(cl6 AS DOUBLE) / 1e6 / t, 6) AS shannon,
        |  round(2.0 * ln(CAST(t AS DOUBLE)) -
        |    ln(CAST(s2 AS DOUBLE)), 6) AS collision,
        |  round(ln(CAST(t AS DOUBLE)) - ln(CAST(cmax AS DOUBLE)), 6)
        |    AS min_entropy
        |FROM agg""".stripMargin,

    "q_burrows_delta" ->
      """WITH wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |src AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts
        |        FROM wc GROUP BY 1),
        |top20 AS (
        |  SELECT w FROM (
        |    SELECT w, sum(c) AS cw,
        |      row_number() OVER (ORDER BY sum(c) DESC, w ASC) AS rn
        |    FROM wc GROUP BY w) WHERE rn <= 20),
        |dense AS (
        |  SELECT s.source, t.w,
        |    CAST(round(CAST(coalesce(wc.c, 0) AS DOUBLE) / s.ts * 1e9)
        |      AS BIGINT) AS f9
        |  FROM src s CROSS JOIN top20 t
        |  LEFT JOIN wc ON wc.source = s.source AND wc.w = t.w),
        |mo AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(f9) AS BIGINT) AS sf,
        |    sum(CAST(f9 AS HUGEINT) * f9) AS sf2
        |  FROM dense GROUP BY 1),
        |z AS (
        |  SELECT d.source, d.w,
        |    CASE WHEN sqrt(greatest(0.0, CAST(sf2 AS DOUBLE) / ns -
        |        (CAST(sf AS DOUBLE) / ns) * (CAST(sf AS DOUBLE) / ns)))
        |        <= 0.0 THEN 0.0
        |      ELSE (CAST(f9 AS DOUBLE) - CAST(sf AS DOUBLE) / ns) /
        |        sqrt(greatest(0.0, CAST(sf2 AS DOUBLE) / ns -
        |          (CAST(sf AS DOUBLE) / ns) *
        |          (CAST(sf AS DOUBLE) / ns)))
        |      END AS z
        |  FROM dense d JOIN mo ON mo.w = d.w)
        |SELECT a.source AS s1, b.source AS s2,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  round(CAST(sum(CAST(round(abs(a.z - b.z) * 1e6) AS BIGINT))
        |    AS DOUBLE) / count(*) / 1e6, 6) AS delta
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_dunning_g2" ->
      """WITH wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS a
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |src AS (SELECT source, CAST(sum(a) AS BIGINT) AS ts
        |        FROM wc GROUP BY 1),
        |wt AS (SELECT w, CAST(sum(a) AS BIGINT) AS cw
        |       FROM wc GROUP BY 1),
        |tot AS (SELECT CAST(sum(ts) AS BIGINT) AS t FROM src),
        |f AS (
        |  SELECT wc.source, wc.w, wc.a, src.ts, wt.cw, tot.t
        |  FROM wc JOIN src ON src.source = wc.source
        |  JOIN wt ON wt.w = wc.w CROSS JOIN tot),
        |g AS (
        |  SELECT source, w, a,
        |    2.0 * (
        |      (CASE WHEN a <= 0 THEN 0.0 ELSE CAST(a AS DOUBLE) *
        |        ln(CAST(a AS DOUBLE) / (CAST(ts AS DOUBLE) * cw / t))
        |        END) +
        |      (CASE WHEN ts - a <= 0 THEN 0.0
        |        ELSE CAST(ts - a AS DOUBLE) *
        |        ln(CAST(ts - a AS DOUBLE) /
        |          (CAST(ts AS DOUBLE) * (t - cw) / t)) END) +
        |      (CASE WHEN cw - a <= 0 THEN 0.0
        |        ELSE CAST(cw - a AS DOUBLE) *
        |        ln(CAST(cw - a AS DOUBLE) /
        |          (CAST(t - ts AS DOUBLE) * cw / t)) END) +
        |      (CASE WHEN t - ts - (cw - a) <= 0 THEN 0.0
        |        ELSE CAST(t - ts - (cw - a) AS DOUBLE) *
        |        ln(CAST(t - ts - (cw - a) AS DOUBLE) /
        |          (CAST(t - ts AS DOUBLE) * (t - cw) / t)) END))
        |      AS g2u
        |  FROM f)
        |SELECT source, w, a AS count_in_src, round(g2u, 4) AS g2
        |FROM g ORDER BY g2u DESC, source ASC, w ASC LIMIT 10"""
        .stripMargin)
}
