package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Corpus curation operators, round 4: contamination spans, composite
  * quality filtering, and domain mixing — the three decisions a
  * training-data pipeline makes after dedup (what leaked, what's junk,
  * how much of each source to sample).
  *
  * Scale notes: q_gopher_filter is a pure map stage (every signal folds in
  * per-row expressions on the document's own row); q_mix_weights reduces
  * the corpus to one row per (source, lang) before any of the tiny
  * broadcast normalizations; q_dup_spans is the one gram-level shuffle and
  * its key is the gram string (at petabyte scale you'd key on a 64-bit
  * gram hash instead — same plan shape, narrower shuffle).
  */
object CorpusMix {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- quantile normalization of the quality score across sources —
    // the "make scores comparable before mixing" step: a score of 0.7
    // from a lenient source and 0.7 from a strict one mean different
    // things, so each document's score maps to the POOLED empirical
    // quantile at its within-source percentile (lower interpolation,
    // position arithmetic all in exact BIGINTs — ((r−1)(N−1)) div
    // (nₛ−1) — so there is no float-boundary floor risk). Scale shape:
    // BOTH rankings are two-phase GlobalRank forms — the per-source rank
    // via the keyed operator (global rank under (source, score, doc_id)
    // minus a broadcast per-source exclusive prefix count, itself built
    // two-phase; see GlobalRank.withKeyedRowNumber). The pos→pooled
    // lookup is a corpus-sized EQUI join on the rank.
    "q_quantile_norm" -> ((s, d) => {
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
      val scored = graft.CacheScope.cached(Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), col("source"),
          round(lit(1.0) / (lit(1.0) + exp(-x)), 6).as("score")))
      // r14: the within-source rank and the pooled rank share ONE total
      // order (score, doc_id) — the fused GlobalRank form computes both
      // off a single range partitioning instead of two full range+hash
      // passes (guide §2.4; the q_cvm_2sample fusion applied here). The
      // per-source count ns and the corpus count come off the cached
      // fused frame as tiny aggregates; the pos→pooled lookup is the
      // same corpus-sized equi join, now a self-join of the cached
      // frame. Ranks/positions are exact integers — values identical.
      val fused = graft.CacheScope.cached(
        graft.operators.GlobalRank.withPooledAndKeyedRowNumber(scored,
          "prn", "r0", Seq("source"),
          Seq(col("score").asc, col("doc_id").asc)))
      val ns = fused.groupBy("source").agg(count(lit(1)).as("ns"))
      val pooled = fused.select(col("prn").cast("long").as("pos"),
        col("score").as("norm_score"))
      val n = fused.agg(count(lit(1)).as("nd"))
      fused.join(broadcast(ns), "source")
        .crossJoin(broadcast(n))
        .withColumn("r", col("r0").cast("long"))
        .withColumn("pos",
          when(col("ns") === 1, expr("(nd + 1) DIV 2"))
            .otherwise(expr("1 + ((r - 1) * (nd - 1)) DIV (ns - 1)")))
        .join(pooled, "pos")
        .select(col("doc_id"), col("source"), col("score"),
          col("norm_score"))
        .orderBy("doc_id")
    }),

    // ---- cross-document duplicate 5-gram spans: the contamination-span
    // report (which exact phrases repeat across documents, how widely).
    // One explode → one gram-keyed aggregation with map-side partials;
    // top-100 by spread via TakeOrdered, never a global sort.
    "q_dup_spans" -> ((s, d) => {
      // reuses CorpusOps' shared tokenize/gram helpers (one definition of
      // gram construction across the corpus-prep family)
      CorpusOps.grams(CorpusOps.toks(s, d), 5)
        .withColumnRenamed("g", "gram")
        .groupBy("gram")
        .agg(count_distinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min("doc_id").as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram").asc)
        .limit(100)
    }),

    // ---- Gopher-style composite quality filter: keep/drop + the reasons,
    // all signals folding per-row (word count band, mean word length band,
    // distinct-word ratio). mean_wlen uses the EXACT identity
    // sum(len(w)) = len(text) - (n_words - 1) for single-char separators,
    // so both engines compute bit-identical doubles.
    "q_gopher_filter" -> ((s, d) => {
      val ws = split(col("text"), " ")
      Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"),
          size(ws).cast(LongType).as("n_words"),
          length(col("text")).cast(LongType).as("n_len"),
          size(array_distinct(ws)).cast(LongType).as("n_distinct"))
        .select(col("doc_id"), col("n_words"),
          round((col("n_len") - col("n_words") + 1).cast("double")
            / col("n_words"), 4).as("mean_wlen"),
          round(col("n_distinct").cast("double") / col("n_words"), 4)
            .as("distinct_ratio"))
        .select(col("doc_id"), col("n_words"), col("mean_wlen"),
          col("distinct_ratio"),
          (col("n_words").between(20, 80) &&
            col("mean_wlen").between(4.0, 5.0) &&
            col("distinct_ratio") >= 0.45).as("keep"),
          concat_ws(",",
            when(!col("n_words").between(20, 80), "words"),
            when(!col("mean_wlen").between(4.0, 5.0), "wlen"),
            when(col("distinct_ratio") < 0.45, "repetitive")).as("reasons"))
      // no trailing sort: per-document output, the gate canonicalizes order
    }),

    // ---- temperature-scaled domain mixing weights (α = 0.5): per
    // (source, lang), token share and the normalized sampling weight
    // w ∝ share^α — the standard up-weighting of small domains when
    // composing a training mix. Corpus reduces to one row per domain
    // FIRST; both normalizations are broadcast 1-row aggregates.
    "q_mix_weights" -> ((s, d) => {
      // materialize the per-domain aggregate (a few hundred rows) so the
      // corpus scan provably runs ONCE — g otherwise sits under four plan
      // branches (tot, shared, wTot, final) and relies on exchange reuse
      val g = Tables.documents(s, d)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
        .localCheckpoint(true)
      val tot = g.agg(sum("n_tokens").cast("double").as("tot"))
      val shared = g.crossJoin(broadcast(tot))
        .withColumn("share", col("n_tokens") / col("tot"))
        .withColumn("w_raw", sqrt(col("share")))
      val wTot = shared.agg(sum("w_raw").as("w_tot"))
      shared.crossJoin(broadcast(wTot))
        .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
          round(col("share"), 6).as("share"),
          round(col("w_raw") / col("w_tot"), 6).as("weight"))
        .orderBy("source", "lang")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_quantile_norm" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS n_tokens,
        |    len(regexp_extract_all(text, '\b(the|a)\b')) AS stop_cnt,
        |    len(regexp_extract_all(text, '[0-9]')) AS dig_cnt,
        |    length(text) AS lc
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, source,
        |    round(1.0 / (1.0 + exp(-(-2.0 + 0.9 * ln(1.0 + n_tokens)
        |      - 3.0 * (CAST(stop_cnt AS DOUBLE) / n_tokens)
        |      - 0.5 * (CAST(dig_cnt AS DOUBLE)
        |               / CAST(greatest(lc, 1) AS DOUBLE))
        |      + 0.2 * (CAST(lc - (n_tokens - 1) AS DOUBLE) / n_tokens)))),
        |      6) AS score
        |  FROM f),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM sc),
        |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
        |       FROM sc GROUP BY 1),
        |bysrc AS (
        |  SELECT doc_id, source, score,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY score, doc_id) AS BIGINT) AS r
        |  FROM sc),
        |pooled AS (
        |  SELECT score AS norm_score,
        |    CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)
        |      AS pos
        |  FROM sc)
        |SELECT b.doc_id, b.source, b.score, p.norm_score
        |FROM bysrc b JOIN ns USING (source) CROSS JOIN n
        |JOIN pooled p ON p.pos = CASE WHEN ns.ns = 1 THEN (n.nd + 1) // 2
        |  ELSE 1 + ((b.r - 1) * (n.nd - 1)) // (ns.ns - 1) END
        |ORDER BY b.doc_id""".stripMargin,
    "q_dup_spans" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS wi,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    w || ' ' || lead(w, 1) OVER pw || ' ' || lead(w, 2) OVER pw
        |      || ' ' || lead(w, 3) OVER pw || ' ' || lead(w, 4) OVER pw
        |      AS gram
        |  FROM words
        |  WINDOW pw AS (PARTITION BY doc_id ORDER BY wi)
        |  QUALIFY lead(w, 4) OVER pw IS NOT NULL)
        |SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occ, min(doc_id) AS first_doc
        |FROM g GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, n_occ DESC, gram ASC LIMIT 100""".stripMargin,
    "q_gopher_filter" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(text) AS BIGINT) AS n_len,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS n_distinct
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_words,
        |    round(CAST(n_len - n_words + 1 AS DOUBLE) / n_words, 4)
        |      AS mean_wlen,
        |    round(CAST(n_distinct AS DOUBLE) / n_words, 4) AS distinct_ratio
        |  FROM s)
        |SELECT doc_id, n_words, mean_wlen, distinct_ratio,
        |  (n_words BETWEEN 20 AND 80 AND mean_wlen BETWEEN 4.0 AND 5.0
        |    AND distinct_ratio >= 0.45) AS keep,
        |  concat_ws(',',
        |    CASE WHEN NOT (n_words BETWEEN 20 AND 80) THEN 'words' END,
        |    CASE WHEN NOT (mean_wlen BETWEEN 4.0 AND 5.0) THEN 'wlen' END,
        |    CASE WHEN distinct_ratio < 0.45 THEN 'repetitive' END)
        |    AS reasons
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_mix_weights" ->
      """WITH g AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1, 2),
        |s AS (
        |  SELECT *, n_tokens / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM g)
        |    AS share
        |  FROM g),
        |w AS (SELECT *, sqrt(share) AS w_raw FROM s)
        |SELECT source, lang, n_docs, n_tokens,
        |  round(share, 6) AS share,
        |  round(w_raw / (SELECT sum(w_raw) FROM w), 6) AS weight
        |FROM w ORDER BY source, lang""".stripMargin
  )
}
