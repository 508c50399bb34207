package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Corpus quality-signal and selection operators — the per-document
  * scoring / capping / sampling moves of a web-scale training-data
  * pipeline that sit between raw ingestion and the dedup/mixing
  * families already in `Curation`/`CorpusMix`:
  *
  *  - q_entropy: char-level Shannon entropy per document — the classic
  *    gibberish/boilerplate detector (low entropy = repeated filler,
  *    high = encoding noise);
  *  - q_readability: Flesch reading-ease per document from the public
  *    formula (206.835 − 1.015·words/sentences − 84.6·syllables/words),
  *    syllables approximated by vowel-group runs — a pure map-only
  *    scalar pass;
  *  - q_domain_cap: per-source quota capping (keep the best K docs per
  *    domain) — the anti-monoculture move every crawl pipeline applies
  *    before mixing;
  *  - q_weighted_sample: weighted sampling without replacement via the
  *    Efraimidis–Spirakis exponential-key trick (key = ln(u)/w), with a
  *    deterministic md5 coin — one global top-k, no per-group state;
  *  - q_oov_rate: out-of-vocabulary rate per document against the
  *    corpus top-K token vocabulary — the tokenizer-fit signal.
  *
  * Exactness discipline: every cross-engine float is either rounded
  * integer math before aggregation (entropy micro-nat terms, sample
  * keys) or pure per-row scalar arithmetic with an identical operation
  * order in both engines (readability) — partition order can never
  * flip a bit. Reference anchor: the reference's map/filter jobs over
  * mounted corpora (pkg/job/spec.go entrypoints; ROADMAP.md 100 TB
  * target) — these are the curation analogs expressed natively.
  */
object Quality {
  type Q = (SparkSession, String) => DataFrame

  /** Per-source quota for q_domain_cap (binding at every fixture SF:
    * 25 docs/source at sf0.001). */
  private val CapK = 10

  /** Vocabulary size for q_oov_rate — the fixture corpus has ~31
    * distinct tokens, so top-16 leaves a real OOV tail at every SF. */
  private val VocabK = 16

  /** Sample size for q_weighted_sample. */
  private val SampleK = 100

  val queries: Map[String, Q] = Map(
    // ---- Char-level Shannon entropy. One explode to (doc, char), one
    // partial-combined count keyed (doc_id, n, ch) — at most |alphabet|
    // rows per document survive the map side — then one per-doc integer
    // sum of micro-nat terms. Scale shape: the shuffle carries
    // |alphabet| rows per doc (bounded, ~100), never the text; at
    // 100 TB this is a single linear scan + a bounded-fan-in agg.
    "q_entropy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
      val chars = docs
        .select(col("doc_id"), length(col("text")).cast(LongType).as("n"),
          explode(split(col("text"), "(?!^)")).as("ch"))
        .filter(length(col("ch")) > 0)
      chars.groupBy("doc_id", "n", "ch")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n")
        .agg(sum(
          round(col("c").cast("double") *
            log(col("n").cast("double") / col("c").cast("double")) /
            col("n").cast("double") * 1e6).cast(LongType)).as("em"))
        .select(col("doc_id"), col("n").as("n_chars_m"),
          round(col("em") / 1e6, 6).as("entropy_nats"))
        .orderBy("doc_id")
    }),

    // ---- Robust (median/IQR) length scaling per source — the outlier-
    // immune twin of z-scoring for feature normalization: rs =
    // (n_chars − median) / (q3 − q1), so a handful of monster documents
    // cannot recentre a source's scale the way a mean/stddev pair
    // would. The three quantiles come from the q_percentiles
    // discipline — a (source, n_chars, freq) pre-aggregate feeds the
    // frequency-weighted exact percentile, per-source state bounded by
    // DISTINCT lengths — and broadcast back over one map stage. A
    // degenerate source (IQR 0) yields NULL, mirrored in the oracle.
    "q_robust_scale" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
      val q = docs.groupBy("source", "n_chars")
        .agg(count(lit(1)).as("f"))
        .groupBy("source")
        .agg(expr("percentile(n_chars, 0.5, f)").as("med"),
          expr("percentile(n_chars, 0.25, f)").as("q1"),
          expr("percentile(n_chars, 0.75, f)").as("q3"))
      docs.join(broadcast(q), "source")
        .select(col("doc_id"), col("source"),
          round(when(col("q3") === col("q1"), lit(null))
            .otherwise((col("n_chars").cast("double") - col("med")) /
              (col("q3") - col("q1"))), 6).as("rs"))
        .orderBy("doc_id")
    }),

    // ---- Flesch reading ease. Pure per-row scalar arithmetic: word
    // count, sentence count (min 1 — the fixture corpus carries no
    // terminal punctuation, so this leg is constant here), vowel-group
    // syllable estimate, then the public formula. Map-only: zero
    // shuffles, whole-stage codegen end to end; the band is derived
    // from the ROUNDED score so both engines classify identically.
    "q_readability" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
      val nw = size(split(col("text"), " ")).cast(LongType)
      val ns = greatest(lit(1L),
        regexp_count(col("text"), lit("[.!?]")).cast(LongType))
      val syl = regexp_count(col("text"), lit("[aeiouyAEIOUY]+"))
        .cast(LongType)
      val flesch = round(
        lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            col("n_sent").cast("double")) -
          lit(84.6) * (col("n_syll").cast("double") /
            col("n_words").cast("double")), 4)
      docs.select(col("doc_id"), nw.as("n_words"), ns.as("n_sent"),
          syl.as("n_syll"))
        .withColumn("flesch", flesch)
        .withColumn("band",
          when(col("flesch") >= 60d, "easy")
            .when(col("flesch") >= 30d, "medium")
            .otherwise("hard"))
        .orderBy("doc_id")
    }),

    // ---- Per-domain quota cap: keep the K best docs per source
    // (longest first, doc_id tie-break). ONE shuffle keyed by source +
    // a row_number window; at 100 TB a hot domain is the skew case —
    // AQE splits it, or the two-phase trick (per-partition top-K, then
    // global top-K per source) bounds any single task, since top-K is
    // an associative selection.
    "q_domain_cap" -> ((s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= CapK)
        .orderBy("source", "rk")
    }),

    // ---- Weighted sampling without replacement (Efraimidis–Spirakis
    // 2006): each doc draws a deterministic 20-bit md5 uniform u and
    // gets key ln(u)/weight (weight = n_chars: longer docs
    // proportionally likelier); the global top-K keys ARE a weighted
    // sample without replacement. Keys are micro-scaled integers so
    // the cross-engine ranking is exact integer comparison. Scale
    // shape: map-only scoring + TakeOrderedAndProject — per-partition
    // top-K then K·partitions rows to one reducer; no full sort, no
    // per-group state, any corpus size.
    "q_weighted_sample" -> ((s, d) => {
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast(LongType) % 1048576L + 1L).cast("double") /
        lit(1048577d)
      Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(log(u) / col("n_chars").cast("double") * 1e6)
            .cast(LongType).as("ki"))
        .orderBy(col("ki").desc, col("doc_id"))
        .limit(SampleK)
    }),

    // ---- Out-of-vocabulary rate vs the corpus top-K vocabulary.
    // Two-phase: (1) token counts — partial-combined agg keyed by
    // token, then TakeOrdered K (count desc, token asc — deterministic
    // boundary); (2) re-scan joining tokens against the BROADCAST
    // vocabulary, one per-doc agg. At 100 TB the vocab pass is the
    // standard sampled/partial pre-pass; the scoring pass stays a
    // single linear scan with a tiny broadcast hash join.
    "q_oov_rate" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(VocabK)
        .select(col("w"), lit(1).as("inv"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tok"), col("n_oov"),
          round(col("n_oov").cast("double") / col("n_tok").cast("double"),
            4).as("oov_rate"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_robust_scale" ->
      """WITH q AS (
        |  SELECT source, quantile_cont(n_chars, 0.5) AS med,
        |    quantile_cont(n_chars, 0.25) AS q1,
        |    quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents GROUP BY 1)
        |SELECT doc_id, source,
        |  round(CASE WHEN q3 = q1 THEN NULL
        |    ELSE (CAST(n_chars AS DOUBLE) - med) / (q3 - q1) END, 6) AS rs
        |FROM documents JOIN q USING (source)
        |ORDER BY doc_id""".stripMargin,
    "q_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
        |    unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE length(text) > 0),
        |cnt AS (
        |  SELECT doc_id, n, ch, count(*) AS c FROM chars GROUP BY 1, 2, 3)
        |SELECT doc_id, n AS n_chars_m,
        |  round(sum(CAST(round(CAST(c AS DOUBLE) *
        |    ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) /
        |    CAST(n AS DOUBLE) * 1e6) AS BIGINT)) / 1e6, 6)
        |    AS entropy_nats
        |FROM cnt GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    "q_readability" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]'))
        |      AS BIGINT)) AS n_sent,
        |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
        |      AS BIGINT) AS n_syll
        |  FROM documents),
        |scored AS (
        |  SELECT doc_id, n_words, n_sent, n_syll,
        |    round(CAST(206.835 AS DOUBLE) -
        |      CAST(1.015 AS DOUBLE) *
        |        (CAST(n_words AS DOUBLE) / CAST(n_sent AS DOUBLE)) -
        |      CAST(84.6 AS DOUBLE) *
        |        (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)), 4)
        |      AS flesch
        |  FROM base)
        |SELECT doc_id, n_words, n_sent, n_syll, flesch,
        |  CASE WHEN flesch >= 60 THEN 'easy'
        |       WHEN flesch >= 30 THEN 'medium'
        |       ELSE 'hard' END AS band
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q_domain_cap" ->
      s"""SELECT doc_id, source, n_chars, rk FROM (
         |  SELECT doc_id, source, n_chars,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= $CapK ORDER BY source, rk""".stripMargin,
    "q_weighted_sample" ->
      s"""SELECT doc_id, source, n_chars,
         |  CAST(round(ln(
         |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
         |      1, 8)) AS BIGINT) % 1048576 + 1 AS DOUBLE) /
         |    CAST(1048577 AS DOUBLE)) /
         |    CAST(n_chars AS DOUBLE) * 1e6) AS BIGINT) AS ki
         |FROM documents
         |ORDER BY ki DESC, doc_id LIMIT $SampleK""".stripMargin,
    "q_oov_rate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |vocab AS (
         |  SELECT w FROM (
         |    SELECT w, count(*) AS c FROM toks GROUP BY 1
         |    ORDER BY c DESC, w LIMIT $VocabK) v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |  CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_oov,
         |  round(CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS oov_rate
         |FROM toks LEFT JOIN vocab ON vocab.w = toks.w
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
