package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.Tables

/** Corpus-preparation operators a 100 TB training-data pipeline needs beyond
  * dedup/similarity (builder brief): repetition-based quality signals (the
  * published Gopher/MassiveText rules use duplicate n-gram fractions), token-
  * budget shard packing, benchmark decontamination by n-gram overlap, PII
  * scrubbing with redaction accounting, per-class embedding centroids, and
  * int8 scalar quantization of embedding columns (the ANN-index build step).
  *
  * Scale shapes: every op is explode → hash-aggregate (map-side partial
  * combine) or a broadcast join against a tiny derived side; the one window
  * (shard packing) partitions by a deterministic content-hash bucket so the
  * cumulative sum parallelizes across buckets instead of forming one global
  * sequential prefix sum.
  */
object CorpusOps {
  type Q = (SparkSession, String) => DataFrame

  /** doc_id, ws(array of tokens) — shared pre-projection, map-only. */
  private[queries] def toks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .transform(Tables.fanoutReady)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))

  /** Word n-grams via array indexing (map-only, no window shuffle). */
  private[queries] def grams(df: DataFrame, n: Int): DataFrame =
    df.filter(size(col("ws")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ws")) - n),
        i => concat_ws(" ", (0 until n).map(k =>
          element_at(col("ws"), i + k + 1)): _*))).as("g"))

  val queries: Map[String, Q] = Map(
    // ---- repetition signals (Gopher-style): most-frequent-unigram fraction
    // and duplicate word-trigram fraction per document. ZERO-shuffle form:
    // both signals fold inside array expressions on the document's own row
    // — top1 as the longest run in the sorted token array (codegen'd
    // `aggregate`), trigram dedup as array_distinct on the per-row gram
    // array. No explode, no groupBy; the whole query is one map stage.
    "q_repetition" -> ((s, d) => {
      val runBest = aggregate(
        array_sort(col("ws")),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc("best"), run).as("best"))
        },
        acc => acc("best"))
      val tg = transform(
        sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2), element_at(col("ws"), i + 3)))
      toks(s, d)
        .withColumn("n_tokens", size(col("ws")).cast(LongType))
        .withColumn("top1", runBest)
        .withColumn("tg", when(size(col("ws")) >= 3, tg))
        .select(col("doc_id"), col("n_tokens"),
          round(col("top1").cast("double") / col("n_tokens"), 6)
            .as("top1_frac"),
          round(coalesce(lit(1.0) -
            size(array_distinct(col("tg"))).cast("double") /
              size(col("tg")), lit(0.0)), 6)
            .as("dup3_frac"))
      // no trailing ORDER BY: the gate canonicalizes row order, and a
      // global range sort of one row per document is the scale artifact
      // round 1 flagged on q_scan_project
    }),

    // ---- token-budget shard packing: assign docs to training shards of
    // ~5000 tokens each. The cumulative sum runs PER content-hash bucket
    // (not one global ordering), so at 100 TB each bucket's prefix sum is an
    // independent window — parallel across buckets, sequential only within.
    // Shard ids are bucket*2^40 + within-bucket ordinal: 2^40 shard slots
    // per bucket (~5.5e15 tokens at 5000/shard) so ids cannot collide
    // across buckets at any plausible corpus size.
    "q_shard_pack" -> ((s, d) => {
      val nTokens = (length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
      val bucket = (conv(substring(md5(col("text")), 1, 4), 16, 10)
        .cast(LongType) % 8).cast(IntegerType)
      val t = Tables.documents(s, d)
        .select(col("doc_id"), nTokens.as("n_tokens"), bucket.as("bucket"))
      val w = Window.partitionBy("bucket").orderBy("doc_id")
      t.withColumn("cum", sum("n_tokens").over(w) - col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("bucket"),
          (col("bucket").cast(LongType) * (1L << 40) +
            floor(col("cum").cast("double") / 5000)).as("shard"))
    }),

    // ---- benchmark decontamination: flag corpus docs sharing any word
    // trigram with the held-out benchmark subset (doc_id % 97 == 0 stands in
    // for an eval set; real pipelines use 8-13-gram overlap, n is a dial).
    // The benchmark gram set is tiny → broadcast; the corpus side stays
    // map-only until the per-doc count aggregation.
    "q_decontam" -> ((s, d) => {
      val g = grams(toks(s, d), 3)
      val bench = g.filter(col("doc_id") % 97 === 0)
        .select("g").distinct()
      g.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(count_distinct(col("g")).as("n_hits"))
      // no trailing sort: per-document output, the gate canonicalizes order
    }),

    // ---- PII scrub: redact digit runs from event payloads, with per-event
    // redaction accounting and a digest of the scrubbed payload (the
    // verify-what-you-scrubbed shape). Map-only — no shuffle at all.
    "q_pii_scrub" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") <= 2000)
        .select(col("event_id"),
          size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
            .cast(LongType).as("n_redacted"),
          md5(regexp_replace(col("props"), "[0-9]+", "#")).as("scrub_md5"))
    }),

    // ---- per-label embedding centroids: posexplode to (label, pos, v) and
    // hash-aggregate — the class-prototype / clustering-seed build. Vectors
    // never leave executors un-exploded; output is labels × dims rows.
    "q_centroids" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(round(avg(col("v").cast("double")), 4).as("c"))
        .orderBy("label", "pos")
    }),

    // ---- embedding analogy (king − man + woman): the target vector is
    // an arithmetic combination of the three smallest labels' centroids
    // (c₀ − c₁ + c₂), and the answer is the 5 nearest embeddings by L2.
    // Determinism discipline end to end: centroids round to 4 dp (the
    // q_centroids rule) BEFORE entering arithmetic; the conditional
    // per-label sums touch exactly one row each (exact); per-dimension
    // distance terms quantize to pico-units so the 8-term row sums are
    // BIGINT under any aggregation order. Scale shape: one posexplode
    // scan, a labels×dims centroid aggregate, the 8-row target
    // broadcast back over the corpus of vectors, top-5 by TakeOrdered.
    "q_vec_analogy" -> ((s, d) => {
      val pe = graft.CacheScope.cached(Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "x0")))
        .select(col("vec_id"), col("label"), col("pos"),
          col("x0").cast("double").as("x")))
      // three smallest labels, pivoted to one broadcast row (the rank
      // window runs over the distinct-label frame — class-bounded)
      val labs = pe.select("label").distinct()
        .withColumn("r", row_number().over(Window.orderBy("label")))
        .filter(col("r") <= 3)
        .agg(max(when(col("r") === 1, col("label"))).as("l0"),
          max(when(col("r") === 2, col("label"))).as("l1"),
          max(when(col("r") === 3, col("label"))).as("l2"))
      val cent = pe.groupBy("label", "pos")
        .agg(round(avg("x"), 4).as("c"))
      val target = cent.crossJoin(broadcast(labs))
        .groupBy("pos")
        .agg((sum(when(col("label") === col("l0"), col("c"))
            .otherwise(0.0)) -
          sum(when(col("label") === col("l1"), col("c")).otherwise(0.0)) +
          sum(when(col("label") === col("l2"), col("c")).otherwise(0.0)))
          .as("t"))
      pe.join(broadcast(target), "pos")
        .select(col("vec_id"),
          round((col("x") - col("t")) * (col("x") - col("t")) * 1e12)
            .cast(LongType).as("dm"))
        .groupBy("vec_id").agg(sum("dm").as("d2m"))
        .select(col("vec_id"), round(col("d2m") / 1e12, 6).as("d2"))
        .orderBy(col("d2").asc, col("vec_id").asc).limit(5)
    }),

    // ---- bigram language-model statistics: KenLM-style conditional
    // probabilities P(w2|w1) = c(w1,w2)/c(w1·) from ONE explode over the
    // corpus. Context counts derive from the (w1,w2) aggregate by a window
    // sum over vocabulary²-bounded rows — the corpus is scanned exactly
    // once; the window's sort touches only the tiny count table.
    "q_bigram_lm" -> ((s, d) => {
      val bg = toks(s, d)
        .filter(size(col("ws")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => struct(element_at(col("ws"), i + 1).as("w1"),
            element_at(col("ws"), i + 2).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .withColumn("c1", sum("c12").over(Window.partitionBy("w1")))
        .select(col("w1"), col("w2"), col("c12"),
          round(col("c12").cast("double") / col("c1"), 6).as("p"))
    }),

    // ---- collocation extraction: top-20 bigrams by pointwise mutual
    // information (min count 5) — the classic multi-word-expression
    // detector a tokenizer/vocab pipeline runs before merging phrases.
    // Scale shape: everything after the two token scans is VOCABULARY-
    // bounded (unigram + bigram-type tables), so the joins broadcast and
    // the top-20 is a TakeOrdered, never a global sort. PMI is computed
    // as a product of ratios — each factor stays near 1/p(w), so no
    // Long-overflowing count products appear at any corpus size (the
    // q_mi overflow lesson, applied from the start).
    // ---- skip-gram co-occurrence matrix (±2 window, 1/distance
    // weighting) — the GloVe/word2vec input statistic, one step wider
    // than q_collocations' adjacent-bigram PMI. Pair extraction is the
    // textrank transform shape: each position emits its k=1,2
    // right-neighbors in ONE map pass (fan-out bounded by the window,
    // no self-join); weights ride in exact HALF-units (2/k ∈ {2,1}) so
    // the aggregation is a pure BIGINT sum under any partial order.
    // Top-30 by weight is a TakeOrdered.
    "q_cooc_matrix" -> ((s, d) => {
      val t = graft.CacheScope.cached(toks(s, d))
      val pairs = (1 to 2).map { k =>
        t.filter(size(col("ws")) >= k + 1)
          .select(explode(transform(
            sequence(lit(0), size(col("ws")) - k - 1),
            i => struct(element_at(col("ws"), i + 1).as("a"),
              element_at(col("ws"), i + 1 + k).as("b")))).as("p"),
            lit(2L / k).as("w2"))
          .select(col("p.a").as("a"), col("p.b").as("b"), col("w2"))
      }.reduce(_ unionByName _)
      pairs.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("wa"),
          greatest(col("a"), col("b")).as("wb"), col("w2"))
        .groupBy("wa", "wb")
        .agg(sum("w2").as("w2sum"), count(lit(1)).as("n_pairs"))
        .select(col("wa"), col("wb"), col("n_pairs"),
          round(col("w2sum") / 2.0, 1).as("weight"))
        .orderBy(col("weight").desc, col("wa").asc, col("wb").asc)
        .limit(30)
    }),

    "q_collocations" -> ((s, d) => {
      val t = graft.CacheScope.cached(toks(s, d))
      val uni = t.select(explode(col("ws")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cu"))
      val nu = uni.agg(sum("cu").as("nu"))
      val bg = t.filter(size(col("ws")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => struct(element_at(col("ws"), i + 1).as("w1"),
            element_at(col("ws"), i + 2).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val nb = c12.agg(sum("c12").as("nb"))
      c12.filter(col("c12") >= 5)
        .join(broadcast(uni.toDF("w1", "cu1")), Seq("w1"))
        .join(broadcast(uni.toDF("w2", "cu2")), Seq("w2"))
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c12"),
          round(log(
            (col("c12").cast("double") / col("nb")) *
              (col("nu").cast("double") / col("cu1")) *
              (col("nu").cast("double") / col("cu2"))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // ---- interpolated Kneser-Ney bigram probabilities (D = 0.75): the
    // smoothing a production n-gram LM actually ships (vs q_bigram_lm's
    // raw MLE). Continuation counts N1+(•w), N1+(w•), N1+(••) all come
    // from ONE bigram-type table — three vocabulary-bounded aggregates
    // over it, joined back keyed (AQE broadcasts them at any realistic
    // vocab size). P_kn = max(c12−D,0)/c1 + D·N1+(w1•)/c1 · N1+(•w2)/N1+(••).
    "q_kn_lm" -> ((s, d) => {
      val bg = toks(s, d)
        .filter(size(col("ws")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => struct(element_at(col("ws"), i + 1).as("w1"),
            element_at(col("ws"), i + 2).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = graft.CacheScope.cached(
        bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
      val fw = c12.groupBy("w1")
        .agg(sum("c12").as("c1"), count(lit(1)).as("n1p_fw"))
      val bw = c12.groupBy("w2").agg(count(lit(1)).as("n1p_bw"))
      val nt = c12.agg(count(lit(1)).as("nt"))
      c12.join(fw, Seq("w1")).join(bw, Seq("w2"))
        .crossJoin(broadcast(nt))
        .select(col("w1"), col("w2"), col("c12"),
          round(
            greatest(col("c12").cast("double") - 0.75, lit(0.0)) / col("c1")
              + (lit(0.75) * col("n1p_fw") / col("c1")) *
                (col("n1p_bw").cast("double") / col("nt")), 6).as("p_kn"))
        .orderBy("w1", "w2")
    }),

    // ---- per-document LM scoring: mean negative log-likelihood of each
    // document's bigrams under the corpus's own bigram LM — the classic
    // perplexity-based quality filter (docs whose avg_nll is far above the
    // corpus norm are junk; far below are boilerplate). The bigram stream
    // is exploded ONCE and localCheckpointed (same single-scan pattern as
    // q_mi's joint table): both the LM derivation and the per-doc join
    // read the materialized stream instead of re-scanning + re-exploding
    // the corpus. The LM side is vocab²-bounded — orders of magnitude
    // smaller than the corpus at 100 TB — so the join shuffles on bigram
    // keys with map-side partial aggregation on both derivations.
    "q_lm_score" -> ((s, d) => {
      val bg = toks(s, d)
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => struct(element_at(col("ws"), i + 1).as("w1"),
            element_at(col("ws"), i + 2).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint(true)
      val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .withColumn("c1", sum("c12").over(Window.partitionBy("w1")))
      bg.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log(col("c12").cast("double") / col("c1"))), 4)
            .as("avg_nll"))
    }),

    // ---- document-length histogram: fixed-width bucketing — the corpus
    // profiling pass that sizes the length filters. Pure map + one tiny agg.
    "q_length_hist" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(floor(col("n_chars") / 50).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("bucket")
    }),

    // ---- RAG-style chunking: overlapping token windows (size 32, stride
    // 24) per document, each with its token count, leading token and a
    // content hash — the retrieval-corpus build step between cleaning and
    // embedding. Pure map + explode of per-doc start offsets: no shuffle,
    // no join; chunk boundaries derive from the document's own row. At
    // 100 TB this is the narrow stage before the embedding UDF.
    "q_doc_chunk" -> ((s, d) => {
      val chunkSize = 32
      val stride = 24
      toks(s, d)
        .select(col("doc_id"), col("ws"), explode(
          sequence(lit(0), greatest(size(col("ws")) - 1, lit(0)),
            lit(stride))).as("start"))
        .select(col("doc_id"),
          (col("start") / stride).cast(IntegerType).as("chunk_id"),
          slice(col("ws"), col("start") + 1, lit(chunkSize)).as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).as("n_tokens"),
          element_at(col("chunk"), 1).as("first_tok"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
    }),

    // ---- perplexity-band corpus filter: keep documents whose bigram-LM
    // mean NLL sits inside the corpus's own [p05, p95] band — the
    // two-sided perplexity filter (too-surprising = junk, too-predictable
    // = boilerplate). Reuses the one-explode LM derivation; the band is a
    // frequency-weighted exact percentile over per-doc scores (the
    // winsorize shape: percentile state bounded by DISTINCT rounded
    // scores) broadcast back over the scored frame.
    "q_lm_filter" -> ((s, d) => {
      val bg = toks(s, d)
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => struct(element_at(col("ws"), i + 1).as("w1"),
            element_at(col("ws"), i + 2).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint(true)
      val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .withColumn("c1", sum("c12").over(Window.partitionBy("w1")))
      val scored = bg.join(lm, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(round(avg(-log(col("c12").cast("double") / col("c1"))), 4)
          .as("nll"))
        .localCheckpoint(true) // feeds the band aggregate AND the filter
      val band = scored.groupBy("nll").agg(count(lit(1)).as("f"))
        .agg(expr("percentile(nll, 0.05, f)").as("lo"),
          expr("percentile(nll, 0.95, f)").as("hi"))
      scored.crossJoin(broadcast(band))
        .filter(col("nll") >= col("lo") && col("nll") <= col("hi"))
        .select(col("doc_id"), col("nll"))
        .orderBy("doc_id")
    }),

    // ---- int8 scalar quantization: per-dimension min/max over the corpus
    // (64-row broadcast side), then q = round(255·(v-min)/(max-min)) per
    // element. The index-build primitive that shrinks a float32 corpus 4×
    // before ANN search; sampled to vec_id <= 20 for the fixture output.
    "q_vec_quantize" -> ((s, d) => {
      val pe = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
      val stats = pe.groupBy("pos")
        .agg(min("v").as("lo"), max("v").as("hi"))
      pe.filter(col("vec_id") <= 20)
        .join(broadcast(stats), "pos")
        .select(col("vec_id"), col("pos"),
          when(col("hi") > col("lo"),
            round((col("v") - col("lo")) / (col("hi") - col("lo")) * 255))
            .otherwise(0.0).cast(IntegerType).as("q"))
        .orderBy("vec_id", "pos")
    })
  )

  private val tokSql =
    "SELECT doc_id, string_split(text, ' ') AS ws FROM documents"

  /** DuckDB word n-grams: generate_subscripts in the SELECT list (DuckDB
    * 1.0 rejects lateral column args to generate_series — same workaround
    * as the q_minhash_sig oracle), then a 1-based index slice. */
  private def gramSql(n: Int): String = {
    val parts = (0 until n).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
    s"""SELECT doc_id, $parts AS g
       |FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM t)
       |WHERE i <= len(ws) - ${n - 1}""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_repetition" ->
      s"""WITH t AS ($tokSql),
         |uni AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(max(c) AS BIGINT) AS top1
         |  FROM (SELECT doc_id, w, count(*) AS c
         |        FROM (SELECT doc_id, unnest(ws) AS w FROM t) GROUP BY 1, 2)
         |  GROUP BY 1),
         |tri AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n3,
         |    CAST(count(DISTINCT g) AS BIGINT) AS d3
         |  FROM (${gramSql(3)})
         |  GROUP BY 1)
         |SELECT uni.doc_id, n_tokens,
         |  round(CAST(top1 AS DOUBLE) / n_tokens, 6) AS top1_frac,
         |  round(coalesce(1.0 - CAST(d3 AS DOUBLE) / n3, 0.0), 6)
         |    AS dup3_frac
         |FROM uni LEFT JOIN tri ON uni.doc_id = tri.doc_id
         |ORDER BY 1""".stripMargin,
    "q_shard_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |      AS n_tokens,
        |    CAST(CAST('0x' || substring(md5(text), 1, 4) AS BIGINT) % 8
        |      AS INTEGER) AS bucket
        |  FROM documents)
        |SELECT doc_id, n_tokens, bucket,
        |  CAST(bucket * 1099511627776 + floor(
        |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
        |      - n_tokens AS DOUBLE) / 5000) AS BIGINT) AS shard
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_decontam" ->
      s"""WITH t AS ($tokSql),
         |g AS (${gramSql(3)}),
         |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
         |SELECT doc_id, CAST(count(DISTINCT g.g) AS BIGINT) AS n_hits
         |FROM g JOIN bench USING (g)
         |WHERE doc_id % 97 <> 0
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_bigram_lm" ->
      s"""WITH t AS ($tokSql),
         |bg AS (
         |  SELECT ws[i] AS w1, ws[i+1] AS w2
         |  FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE i <= len(ws) - 1),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
         |       FROM bg GROUP BY 1)
         |SELECT c12.w1, w2, c12,
         |  round(CAST(c12 AS DOUBLE) / c1, 6) AS p
         |FROM c12 JOIN c1 ON c12.w1 = c1.w1
         |ORDER BY 1, 2""".stripMargin,
    "q_cooc_matrix" ->
      s"""WITH t AS ($tokSql),
         |p1 AS (SELECT ws[i] AS a, ws[i+1] AS b, CAST(2 AS BIGINT) AS w2
         |  FROM (SELECT ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE i <= len(ws) - 1),
         |p2 AS (SELECT ws[i] AS a, ws[i+2] AS b, CAST(1 AS BIGINT) AS w2
         |  FROM (SELECT ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE i <= len(ws) - 2),
         |p AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
         |c AS (SELECT least(a, b) AS wa, greatest(a, b) AS wb,
         |  CAST(sum(w2) AS BIGINT) AS w2sum,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM p WHERE a <> b GROUP BY 1, 2)
         |SELECT wa, wb, n_pairs, round(w2sum / 2.0, 1) AS weight
         |FROM c ORDER BY weight DESC, wa ASC, wb ASC LIMIT 30""".stripMargin,
    "q_collocations" ->
      s"""WITH t AS ($tokSql),
         |bg AS (
         |  SELECT ws[i] AS w1, ws[i+1] AS w2
         |  FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE i <= len(ws) - 1),
         |uni AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cu
         |  FROM (SELECT unnest(ws) AS w FROM t) GROUP BY 1),
         |nu AS (SELECT sum(cu) AS nu FROM uni),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM bg GROUP BY 1, 2),
         |nb AS (SELECT sum(c12) AS nb FROM c12)
         |SELECT w1, w2, c12,
         |  round(ln((CAST(c12 AS DOUBLE) / nb) *
         |           (CAST(nu AS DOUBLE) / u1.cu) *
         |           (CAST(nu AS DOUBLE) / u2.cu)), 6) AS pmi
         |FROM c12
         |JOIN uni u1 ON u1.w = w1
         |JOIN uni u2 ON u2.w = w2
         |CROSS JOIN nu CROSS JOIN nb
         |WHERE c12 >= 5
         |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    "q_kn_lm" ->
      s"""WITH t AS ($tokSql),
         |bg AS (
         |  SELECT ws[i] AS w1, ws[i+1] AS w2
         |  FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE i <= len(ws) - 1),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM bg GROUP BY 1, 2),
         |fw AS (SELECT w1, sum(c12) AS c1, CAST(count(*) AS BIGINT)
         |         AS n1p_fw FROM c12 GROUP BY 1),
         |bw AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bw
         |       FROM c12 GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM c12)
         |SELECT c12.w1, c12.w2, c12.c12,
         |  round(greatest(CAST(c12.c12 AS DOUBLE) - 0.75, 0.0) / fw.c1
         |    + (0.75 * fw.n1p_fw / fw.c1) *
         |      (CAST(bw.n1p_bw AS DOUBLE) / nt.nt), 6) AS p_kn
         |FROM c12
         |JOIN fw ON fw.w1 = c12.w1
         |JOIN bw ON bw.w2 = c12.w2
         |CROSS JOIN nt
         |ORDER BY c12.w1, c12.w2""".stripMargin,
    "q_lm_score" ->
      s"""WITH t AS ($tokSql),
         |bg AS (
         |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
         |  FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE i <= len(ws) - 1),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
         |       FROM bg GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(avg(-ln(CAST(c12.c12 AS DOUBLE) / c1.c1)), 4) AS avg_nll
         |FROM bg
         |JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
         |JOIN c1 ON bg.w1 = c1.w1
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_doc_chunk" ->
      s"""WITH t AS ($tokSql),
         |st AS (
         |  SELECT doc_id, ws, CAST(i - 1 AS INTEGER) AS start
         |  FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE (i - 1) % 24 = 0)
         |SELECT doc_id, CAST(start / 24 AS INTEGER) AS chunk_id,
         |  CAST(len(ws[start+1 : least(start+32, len(ws))]) AS INTEGER)
         |    AS n_tokens,
         |  ws[start+1] AS first_tok,
         |  md5(array_to_string(ws[start+1 : least(start+32, len(ws))], ' '))
         |    AS chunk_hash
         |FROM st""".stripMargin,
    "q_lm_filter" ->
      s"""WITH t AS ($tokSql),
         |bg AS (
         |  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
         |  FROM (SELECT doc_id, ws, generate_subscripts(ws, 1) AS i FROM t)
         |  WHERE i <= len(ws) - 1),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
         |        FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
         |       FROM bg GROUP BY 1),
         |scored AS (
         |  SELECT doc_id,
         |    round(avg(-ln(CAST(c12.c12 AS DOUBLE) / c1.c1)), 4) AS nll
         |  FROM bg
         |  JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
         |  JOIN c1 ON bg.w1 = c1.w1
         |  GROUP BY 1),
         |band AS (
         |  SELECT quantile_cont(nll, 0.05) AS lo, quantile_cont(nll, 0.95) AS hi
         |  FROM scored)
         |SELECT doc_id, nll FROM scored, band
         |WHERE nll >= lo AND nll <= hi
         |ORDER BY doc_id""".stripMargin,
    "q_length_hist" ->
      """SELECT CAST(floor(n_chars / 50.0) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pii_scrub" ->
      """SELECT event_id,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
        |    AS n_redacted,
        |  md5(regexp_replace(props, '[0-9]+', '#', 'g')) AS scrub_md5
        |FROM events WHERE event_id <= 2000 ORDER BY 1""".stripMargin,
    "q_vec_analogy" ->
      """WITH pe AS MATERIALIZED (
        |  SELECT vec_id, label, CAST(i - 1 AS INTEGER) AS pos,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, label, embedding,
        |          generate_subscripts(embedding, 1) AS i FROM embeddings)),
        |labs AS (
        |  SELECT max(CASE WHEN r = 1 THEN label END) AS l0,
        |    max(CASE WHEN r = 2 THEN label END) AS l1,
        |    max(CASE WHEN r = 3 THEN label END) AS l2
        |  FROM (SELECT label,
        |          CAST(row_number() OVER (ORDER BY label) AS INTEGER) AS r
        |        FROM (SELECT DISTINCT label FROM pe))
        |  WHERE r <= 3),
        |cent AS (SELECT label, pos, round(avg(x), 4) + 0.0 AS c
        |         FROM pe GROUP BY 1, 2),
        |target AS (
        |  SELECT pos,
        |    sum(CASE WHEN label = l0 THEN c ELSE 0.0 END) -
        |    sum(CASE WHEN label = l1 THEN c ELSE 0.0 END) +
        |    sum(CASE WHEN label = l2 THEN c ELSE 0.0 END) AS t
        |  FROM cent CROSS JOIN labs GROUP BY 1)
        |SELECT vec_id,
        |  round(sum(CAST(round((x - t) * (x - t) * 1e12) AS BIGINT))
        |    / 1e12, 6) AS d2
        |FROM pe JOIN target USING (pos)
        |GROUP BY 1 ORDER BY d2 ASC, vec_id ASC LIMIT 5""".stripMargin,
    "q_centroids" ->
      // `+ 0.0` normalizes IEEE negative zero: DuckDB's C round() keeps the
      // sign of a tiny negative mean (-1e-6 → -0.0) where Spark's
      // BigDecimal rounding has no signed zero — without it the hash gate
      // flakes whenever a (label,pos) mean rounds to zero from below
      """SELECT label, CAST(i - 1 AS INTEGER) AS pos,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS c
        |FROM (SELECT label, embedding,
        |        generate_subscripts(embedding, 1) AS i FROM embeddings)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_vec_quantize" ->
      """WITH pe AS (
        |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM (SELECT vec_id, embedding,
        |          generate_subscripts(embedding, 1) AS i FROM embeddings)),
        |stats AS (
        |  SELECT pos, min(v) AS lo, max(v) AS hi FROM pe GROUP BY 1)
        |SELECT vec_id, pe.pos,
        |  CAST(CASE WHEN hi > lo
        |    THEN round((v - lo) / (hi - lo) * 255) ELSE 0 END AS INTEGER)
        |    AS q
        |FROM pe JOIN stats ON pe.pos = stats.pos
        |WHERE vec_id <= 20 ORDER BY 1, 2""".stripMargin
  )
}
