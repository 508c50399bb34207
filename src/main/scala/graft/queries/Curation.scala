package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Corpus-curation operators beyond the dedup/quality families already in
  * `Dedup`/`CorpusOps`/`CorpusMix` — the remaining standard moves of a
  * large-scale training-data pipeline:
  *
  *  - q_line_dedup: CCNet-style segment-level dedup — repeated segments
  *    (boilerplate) are removed CORPUS-WIDE, not per-document;
  *  - q_dsir: DSIR (Xie et al. 2023) hashed-n-gram importance weights —
  *    score every raw document by how target-like its token distribution
  *    is, the standard data-selection signal;
  *  - q_temperature_sample: temperature-flattened domain mixing — the
  *    multilingual-corpus resampling rule (up-weight tail domains,
  *    down-weight the head) with a deterministic per-doc coin.
  *
  * All arithmetic is integer or integer-scaled (micro-nats, 2^20-scaled
  * thresholds) so per-partition summation order can never flip a result —
  * the same exactness discipline as Dedup's minhash math.
  * Reference anchor: the reference's map/filter workloads over mounted
  * corpora (pkg/job/spec.go docker entrypoints); these are the
  * corpus-curation analogs a Spark-native engine expresses natively.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  /** PUBLIC seed for the oracle-parity bench form of the DP-shaped
    * release (q_dp_counts). Being public, any release drawn with it has
    * ZERO privacy — see [[laplaceNoisePrf]]. */
  val PublicBenchSeed = "graft-public-bench-seed"

  /** Laplace(b=1) perturbation as a keyed PRF of (seed, key), by
    * inverse-CDF over the md5 uniform (the q_hash_sample discipline).
    *
    * Privacy contract, enforced by this signature: the draw is a
    * DETERMINISTIC function of the seed and the key. With a SECRET
    * seed it behaves as a seeded-PRF Laplace mechanism (privacy up to
    * PRF security — the standard derandomized-DP construction); with a
    * public seed (e.g. [[PublicBenchSeed]]) it provides NO privacy at
    * all — anyone can recompute and subtract the noise. Callers who
    * need an actual DP release must thread a secret here; the bench
    * query deliberately does not. Columnar and codegen-friendly: one
    * md5 + arithmetic, no UDF. */
  def laplaceNoisePrf(seed: String, key: Column): Column = {
    val u = conv(substring(md5(concat(lit(seed), key)), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    -signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
  }

  /** Segment length (words) for q_line_dedup: the fixture corpus carries
    * no newlines, so "lines" are non-overlapping 10-word windows. */
  private val SegLen = 10

  /** Duplication bound: a segment seen >= this many times corpus-wide is
    * boilerplate and is dropped from every document. */
  private val DupBound = 3

  val queries: Map[String, Q] = Map(
    // ---- CCNet-style line/segment dedup. Split each document into
    // non-overlapping 10-word segments, count each segment's md5 across
    // the WHOLE corpus, drop segments occurring >= 3 times (boilerplate:
    // headers, navigation, license blocks), reassemble the survivors in
    // order. Scale shape: ONE shuffle keyed by the 32-byte segment hash
    // (the segment text rides along once to be re-emitted), then one
    // per-doc aggregation; this is exactly the CCNet sharded-dedup plan —
    // no document ever compares to another document, so it scales
    // linearly with corpus size at any duplication rate.
    "q_line_dedup" -> ((s, d) => {
      val ws = split(col("text"), " ")
      val segs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), ws.as("ws"))
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), ceil(size(col("ws")) / SegLen.toDouble)
            .cast("int") - 1),
          i => array_join(slice(col("ws"), i * SegLen + 1, lit(SegLen)), " ")
        )).as(Seq("si", "seg")))
      val cnt = segs.groupBy(md5(col("seg")).as("h"))
        .agg(count(lit(1)).as("c"))
      segs.join(cnt, md5(col("seg")) === col("h"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_seg"),
          sum(when(col("c") >= DupBound, 1L).otherwise(0L)).as("n_removed"),
          array_join(transform(
            array_sort(collect_list(
              when(col("c") < DupBound, struct(col("si"), col("seg"))))),
            x => x.getField("seg")), " ").as("kept_text"))
        .orderBy("doc_id")
    }),

    // ---- DSIR importance weights: hash every token into 256 buckets
    // (md5-derived, engine-portable), estimate the target (lang='en') and
    // raw (whole-corpus) bucket distributions with add-1 smoothing, and
    // score each document by the summed log-likelihood ratio of its
    // tokens. High weight = target-like. Weights are computed in
    // micro-nats (rounded to integer BEFORE the per-doc sum) so the
    // aggregation is exact integer math — partition order cannot change
    // a single output bit. Scale shape: the two distributions are
    // 256-row aggregates (broadcast); the document pass is one explode +
    // broadcast-join + integer sum keyed by doc_id. At 100 TB the
    // distributions come from a sample pass and the scoring pass remains
    // a single linear scan.
    "q_dsir" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
      val toks = docs
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " "))
          .as("w"))
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("w")), 1, 8), 16, 10).cast(LongType)
            % 256).as("b"))
      val tokC = graft.CacheScope.cached(toks)
      val raw = tokC.groupBy("b").agg(count(lit(1)).as("cr"))
      val tgt = tokC.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("ct"))
      // totals as 1-row broadcast scalars via crossJoin (bounded)
      val totals = tokC.agg(
        count(lit(1)).as("sr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("st"))
      val lr = raw.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(totals))
        .select(col("b"),
          round(log(
            (coalesce(col("ct"), lit(0L)) + 1).cast("double") *
              (col("sr") + 256) /
              (((col("cr") + 1) * (col("st") + 256)).cast("double"))
          ) * 1e6).cast(LongType).as("lri"))
      tokC.join(broadcast(lr), Seq("b"))
        .groupBy("doc_id")
        .agg(sum("lri").as("wm"))
        .select(col("doc_id"), round(col("wm") / 1e6, 6).as("weight"))
        .orderBy("doc_id")
    }),

    // ---- Temperature-flattened domain sampling (the multilingual mixing
    // rule): resample so domain (lang) shares move from n_l/N toward
    // uniform — target share ∝ n_l^(1/T) with T=2 — at a 0.5 overall
    // rate. Each doc flips a DETERMINISTIC coin (md5 of doc_id, 20-bit
    // uniform); the keep test is cross-multiplied to pure BIGINT compare
    //   u · Σw · n_l · 2  <  w_l · N · 2^20
    // so no engine ever divides (no float rounding in the decision; the
    // BIGINT products stay < 2^63 up to ~10^12 docs — past that the
    // comparison moves to 128-bit, a comment-level change). Scale shape:
    // one 5-row aggregate joined back broadcast, then a map-only filter
    // and one final per-domain aggregate.
    "q_temperature_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
      val byLang = docs.groupBy("lang").agg(count(lit(1)).as("nl"))
        .select(col("lang"), col("nl"),
          round(sqrt(col("nl").cast("double"))).cast(LongType).as("wl"))
      val tot = byLang.agg(sum("nl").as("n"), sum("wl").as("sw"))
      val scored = docs.select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast(LongType) % 1048576L).as("u"))
        .join(broadcast(byLang), Seq("lang"))
        .crossJoin(broadcast(tot))
      scored
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(
            col("u") * col("sw") * col("nl") * 2 <
              col("wl") * col("n") * 1048576L, 1L).otherwise(0L))
            .as("n_kept"))
        .select(col("lang"), col("n_docs"), col("n_kept"),
          round(col("n_kept").cast("double") / col("n_docs"), 4).as("rate"))
        .orderBy("lang")
    }),

    // ---- k-anonymity risk audit over the customer table: group by the
    // quasi-identifier tuple (nation, market segment, account-balance
    // kilobucket) and count equivalence classes smaller than k = 5 — the
    // re-identification audit a pipeline runs BEFORE publishing derived
    // data (q_pii_scrub removes direct identifiers; this measures what
    // the indirect ones still leak: a customer alone in their QI class
    // is re-identifiable by linkage even with the name gone). Outputs
    // class counts, the unsafe-row total, the smallest class, and the
    // at-risk rate. Scale shape: one map-side-combined aggregate over
    // the QI tuple, then a QI-cardinality-bounded re-aggregate — the
    // corpus shuffles once, keyed by the tuple.
    // ---- DP-SHAPED release counts (Laplace-mechanism plan shape,
    // ε = 1) — q_kanon's release-side sibling: per-source document
    // counts published with a Laplace(1/ε)-distributed perturbation
    // drawn by inverse-CDF from a keyed PRF uniform
    // ([[laplaceNoisePrf]]). The seed used HERE is [[PublicBenchSeed]]
    // — a public constant — so the release has NO actual privacy (the
    // noise is recomputable and subtractable by anyone); the query
    // exists to pin the release plan shape against the oracle, which
    // needs a deterministic draw. A production release MUST call
    // [[laplaceNoisePrf]] with a secret seed — the caveat lives in the
    // API signature, not just this comment. Map-only over a
    // source-count aggregate; nothing here grows past the number of
    // sources.
    "q_dp_counts" -> ((s, d) => {
      val noise = laplaceNoisePrf(PublicBenchSeed, col("source"))
      Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("n_docs"),
          (col("n_docs") + round(noise).cast(LongType)).as("n_released"),
          round(noise, 6).as("noise"))
        .orderBy("source")
    }),

    "q_kanon" -> ((s, d) => {
      val classes = Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast(LongType).as("bal_kb"))
        .agg(count(lit(1)).as("sz"))
      classes.agg(
          count(lit(1)).as("n_classes"),
          sum(when(col("sz") < 5, 1L).otherwise(0L)).as("n_unsafe_classes"),
          sum(when(col("sz") < 5, col("sz")).otherwise(0L))
            .as("n_unsafe_rows"),
          min("sz").as("min_class"),
          sum("sz").as("n_rows"))
        .select(col("n_classes"), col("n_unsafe_classes"),
          col("n_unsafe_rows"), col("min_class"),
          round(col("n_unsafe_rows").cast("double") /
            col("n_rows").cast("double"), 4).as("risk_rate"))
    }),

    // ---- curriculum staging: order the corpus easy→hard and cut it
    // into four equal-mass stages — the curriculum-learning data prep
    // (Bengio et al. shape). Difficulty is a pure integer per-doc
    // score (mean chars/token in milli-units + token count — longer
    // words and longer docs read harder); the stage cuts are EXACT
    // quartiles from a (difficulty, freq) pre-aggregate broadcast back
    // over the corpus (the q_equidepth_bins discipline — no global
    // ntile sort, the partition count follows the data). Output: one
    // row per stage with exact-integer means.
    "q_curriculum_stages" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").cast(LongType).as("nc"),
          size(split(col("text"), " ")).cast(LongType).as("ntok"))
        // integer div (`div`), not Column `/` (double division) — the
        // q_diff_in_diff lesson
        .select(col("doc_id"),
          expr("nc * 1000 div ntok + ntok").as("difficulty"), col("ntok"))
      val cuts = docs.groupBy("difficulty").agg(count(lit(1)).as("f"))
        .agg(expr("percentile(difficulty, array(0.25, 0.5, 0.75), f)")
          .as("cs"))
      docs.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("difficulty"), col("ntok"),
          (lit(1) + size(filter(col("cs"), c => col("difficulty") > c)))
            .as("stage"))
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"),
          min("difficulty").as("lo"), max("difficulty").as("hi"),
          round(sum("difficulty").cast("double") / count(lit(1)), 4)
            .as("mean_difficulty"),
          round(sum("ntok").cast("double") / count(lit(1)), 4)
            .as("mean_tokens"))
        .orderBy("stage")
    }),

    // ---- span-corruption planning (T5 denoising shape): partition
    // each document's tokens into 3-token blocks and select ~1/5 of
    // the blocks for masking by a content-defined hash of
    // (doc_id, block) — deterministic, so two engines (and a re-run on
    // shuffled shards) mask the SAME spans, which is what makes the
    // corruption auditable. Pure per-row map + per-doc aggregate;
    // reports the realized mask budget per document.
    "q_span_corrupt" -> ((s, d) => {
      val blocks = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("ntok"))
        .select(col("doc_id"), col("ntok"),
          explode(expr("sequence(CAST(0 AS BIGINT), (ntok - 1) div 3)"))
            .as("b"))
      val sel = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#"), col("b").cast("string"))), 1, 8), 16, 10)
        .cast(LongType) % 5 === 0
      blocks
        .select(col("doc_id"), col("ntok"), col("b"),
          when(sel, least(lit(3L), col("ntok") - col("b") * 3))
            .otherwise(0L).as("masked"))
        .groupBy("doc_id")
        .agg(max("ntok").as("n_tokens"),
          sum(when(col("masked") > 0, 1L).otherwise(0L)).as("n_spans"),
          sum("masked").as("n_masked"))
        .select(col("doc_id"), col("n_tokens"), col("n_spans"),
          col("n_masked"),
          round(col("n_masked").cast("double") / col("n_tokens"), 6)
            .as("mask_ratio"))
        .orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_curriculum_stages" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(n_chars AS BIGINT) * 1000 //
        |      len(string_split(text, ' ')) +
        |      len(string_split(text, ' ')) AS difficulty,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |cuts AS (
        |  SELECT quantile_cont(difficulty, [0.25, 0.5, 0.75]) AS cs
        |  FROM docs),
        |assigned AS (
        |  SELECT doc_id, difficulty, ntok,
        |    1 + (CASE WHEN difficulty > cs[1] THEN 1 ELSE 0 END)
        |      + (CASE WHEN difficulty > cs[2] THEN 1 ELSE 0 END)
        |      + (CASE WHEN difficulty > cs[3] THEN 1 ELSE 0 END) AS stage
        |  FROM docs CROSS JOIN cuts)
        |SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(difficulty) AS lo, max(difficulty) AS hi,
        |  round(CAST(sum(difficulty) AS DOUBLE) / count(*), 4)
        |    AS mean_difficulty,
        |  round(CAST(sum(ntok) AS DOUBLE) / count(*), 4) AS mean_tokens
        |FROM assigned GROUP BY stage ORDER BY stage""".stripMargin,
    "q_span_corrupt" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |words AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS wi
        |  FROM documents),
        |blocks0 AS (
        |  SELECT DISTINCT doc_id, CAST((wi - 1) // 3 AS BIGINT) AS b
        |  FROM words),
        |blocks AS (
        |  SELECT d.doc_id, d.ntok, b0.b,
        |    CASE WHEN CAST(('0x' || substring(md5(
        |        CAST(d.doc_id AS VARCHAR) || '#' ||
        |        CAST(b0.b AS VARCHAR)), 1, 8)) AS BIGINT) % 5 = 0
        |      THEN least(3, d.ntok - b0.b * 3) ELSE 0 END AS masked
        |  FROM docs d JOIN blocks0 b0 ON b0.doc_id = d.doc_id)
        |SELECT doc_id, max(ntok) AS n_tokens,
        |  CAST(sum(CASE WHEN masked > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_spans,
        |  CAST(sum(masked) AS BIGINT) AS n_masked,
        |  round(CAST(sum(masked) AS DOUBLE) / max(ntok), 6) AS mask_ratio
        |FROM blocks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_line_dedup" ->
      s"""WITH words AS (
         |  SELECT doc_id,
         |    generate_subscripts(string_split(text, ' '), 1) AS wi,
         |    unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |segs AS (
         |  SELECT doc_id, CAST((wi - 1) // $SegLen AS BIGINT) AS si,
         |    string_agg(w, ' ' ORDER BY wi) AS seg
         |  FROM words GROUP BY 1, 2),
         |cnt AS (
         |  SELECT md5(seg) AS h, count(*) AS c FROM segs GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seg,
         |  CAST(sum(CASE WHEN c >= $DupBound THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  coalesce(string_agg(CASE WHEN c < $DupBound THEN seg END,
         |    ' ' ORDER BY si), '') AS kept_text
         |FROM segs JOIN cnt ON cnt.h = md5(seg)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) % 256 AS b
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents) t),
        |raw AS (SELECT b, count(*) AS cr FROM toks GROUP BY 1),
        |tgt AS (SELECT b, count(*) AS ct FROM toks WHERE lang = 'en'
        |        GROUP BY 1),
        |tot AS (SELECT count(*) AS sr,
        |          sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS st
        |        FROM toks),
        |lr AS (
        |  SELECT raw.b,
        |    CAST(round(ln(
        |      CAST(coalesce(ct, 0) + 1 AS DOUBLE) * (sr + 256) /
        |      (CAST((cr + 1) * (st + 256) AS DOUBLE))) * 1e6) AS BIGINT)
        |      AS lri
        |  FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot)
        |SELECT doc_id, round(sum(lri) / 1e6, 6) AS weight
        |FROM toks JOIN lr ON lr.b = toks.b
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_temperature_sample" ->
      """WITH bylang AS (
        |  SELECT lang, count(*) AS nl,
        |    CAST(round(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS wl
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT sum(nl) AS n, sum(wl) AS sw FROM bylang)
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN
        |    (CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1048576) * t.sw * b.nl * 2 <
        |    b.wl * t.n * 1048576
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(CAST(sum(CASE WHEN
        |    (CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1048576) * t.sw * b.nl * 2 <
        |    b.wl * t.n * 1048576
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS rate
        |FROM documents d
        |JOIN bylang b ON b.lang = d.lang CROSS JOIN tot t
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q_dp_counts" ->
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |u AS (
        |  SELECT source, n_docs,
        |    CAST(CAST(('0x' || substring(
        |        md5('graft-public-bench-seed' || source), 1, 8)) AS BIGINT)
        |      AS DOUBLE) / 4294967296.0 AS u
        |  FROM c)
        |SELECT source, n_docs,
        |  n_docs + CAST(round(-sign(u - 0.5) *
        |    ln(1.0 - 2.0 * abs(u - 0.5))) AS BIGINT) AS n_released,
        |  round(-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noise
        |FROM u ORDER BY source""".stripMargin,
    "q_kanon" ->
      """WITH classes AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb,
        |    count(*) AS sz
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unsafe_classes,
        |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
        |    AS n_unsafe_rows,
        |  CAST(min(sz) AS BIGINT) AS min_class,
        |  round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE) /
        |    CAST(sum(sz) AS DOUBLE), 4) AS risk_rate
        |FROM classes""".stripMargin
  )
}
