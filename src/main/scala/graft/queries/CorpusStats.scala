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
      .transform(Tables.fanoutReady)
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

    // ---- term burstiness (Church & Gale): content words don't arrive
    // Poisson — they CLUMP in the documents that mention them, and the
    // ratio between clumped and Poisson behavior is the signal behind
    // burst-aware term weighting and topicality screens. Per top-200
    // term: Fano factor var/mean of the per-document count (zero-docs
    // included via the identity var/mean = Σc²/cf − cf/N — integer sums
    // only, two divisions at the leaf) and the clumping rate cf/df
    // (mean occurrences inside mentioning docs; 1.0 ⟺ never repeats).
    // Scale shape: (term, doc) partial counts map-side combine, the
    // term rollup is one vocab-sized shuffle, N broadcasts as 1 row.
    "q_burstiness" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
      val td = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
      val nd = docs.agg(count(lit(1)).as("nd"))
      td.groupBy("w")
        .agg(sum("c").as("cf"), count(lit(1)).as("df"),
          sum(col("c") * col("c")).as("s2"))
        .crossJoin(broadcast(nd))
        .select(col("w"), col("cf"), col("df"),
          round(col("s2").cast("double") / col("cf") -
            col("cf").cast("double") / col("nd"), 6).as("fano"),
          round(col("cf").cast("double") / col("df"), 6).as("clump"))
        .orderBy(col("cf").desc, col("w").asc).limit(200)
    }),

    // ---- one-way ANOVA: does mean document quality differ across
    // sources? F = (SSB/(k−1)) / (SSW/(N−k)) from per-source sufficient
    // sums only — the 6-dp quality score lifts to exact micro-unit
    // integers, so n/Σx/Σx² per source are EXACT BIGINTs and the one
    // corpus pass map-side combines; the F assembly runs on the k-row
    // group frame (k = #sources, broadcast-tiny). Micro² units cancel in
    // both reported ratios. Cross-group double sums span ≤k rounded
    // terms (the q_jsd_sources precedent).
    "q_anova" -> ((s, d) => {
      val nTok = (length(col("text")) -
        length(regexp_replace(col("text"), " ", "")) + 1).cast(LongType)
      val stopCnt = size(regexp_extract_all(col("text"),
        lit("\\b(the|a)\\b"), lit(0))).cast(LongType)
      val q6 = round(round(log(lit(1.0) + nTok) *
        (lit(1.0) - round(stopCnt.cast("double") / nTok, 6)), 6) * 1e6)
        .cast(LongType)
      val g = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("source"), q6.as("s6"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("s6").as("s1"),
          sum(col("s6") * col("s6")).as("s2"))
      val ssb = col("ssbp") -
        col("t1").cast("double") * col("t1") / col("nd")
      val sst = col("t2").cast("double") -
        col("t1").cast("double") * col("t1") / col("nd")
      g.agg(count(lit(1)).as("k"), sum("n").as("nd"),
          sum("s1").as("t1"), sum("s2").as("t2"),
          sum(col("s1").cast("double") * col("s1") / col("n")).as("ssbp"))
        .select(col("k"), col("nd"),
          round((ssb / (col("k") - 1)) /
            ((col("t2").cast("double") - col("ssbp")) /
              (col("nd") - col("k"))), 4).as("f_stat"),
          round(ssb / sst, 6).as("eta2"))
    }),

    // ---- Cramér's V: strength of the lang × source association from
    // the FULL contingency grid (absent cells enter as o = 0 with their
    // expected mass — a chi² over observed cells only understates). One
    // corpus aggregation to the cell table; marginals, the grid cross,
    // and the cell fold are all bounded by #langs × #sources.
    "q_cramers_v" -> ((s, d) => {
      val c = graft.CacheScope.cached(Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .groupBy("lang", "source").agg(count(lit(1)).as("o")))
      val r = c.groupBy("lang").agg(sum("o").as("rt"))
      val cl = c.groupBy("source").agg(sum("o").as("ct"))
      val n = c.agg(sum("o").as("nd"))
      val dims = c.agg(
        count_distinct(col("lang")).as("nr"),
        count_distinct(col("source")).as("nc"))
      val cells = r.crossJoin(cl).crossJoin(broadcast(n))
        .join(c, Seq("lang", "source"), "left")
        .select((coalesce(col("o"), lit(0L)) -
          col("rt").cast("double") * col("ct") / col("nd")).as("d0"),
          (col("rt").cast("double") * col("ct") / col("nd")).as("e"))
      cells.agg(sum(col("d0") * col("d0") / col("e")).as("chi2"))
        .crossJoin(broadcast(n)).crossJoin(broadcast(dims))
        .select(col("nr"), col("nc"), round(col("chi2"), 4).as("chi2"),
          round(sqrt(col("chi2") /
            (col("nd") * (least(col("nr"), col("nc")) - 1))), 6)
            .as("cramers_v"))
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
    }),

    // ---- per-source distinctive keywords by chi-square: for each
    // (source, word) 2×2 contingency cell, χ² = N·(o11·o22 − o12·o21)² /
    // (st·wt·(N−st)·(N−wt)); keep positively-associated words seen ≥ 5
    // times, top-3 per source — "what does this crawl talk about that
    // the rest of the corpus doesn't", the domain-labeling signal a mix
    // designer reads before weighting sources. Scale shape: one
    // (source × word) reduce, marginals broadcast back, the rank window
    // orders vocabulary-bounded rows per source. The determinant math is
    // DOUBLE from the start (counts·counts at 100 TB overflow BIGINT —
    // the q_mi lesson), mirrored op-for-op in the oracle.
    // ---- Yule's characteristic K — vocabulary richness from the
    // frequency-of-frequencies spectrum: K = 10⁴·(Σ m²·V_m − N)/N²
    // (V_m = words occurring exactly m times). Repetitive/templated
    // corpora score high, lexically rich ones low — a quality signal
    // independent of length, and (unlike type-token ratio) stable in
    // expectation across corpus size. EVERYTHING here is an exact
    // integer until the single closing division: word counts → V_m →
    // Σm²V_m all BIGINT. Per-source rows so sources are comparable.
    // Scale shape: one (source, word) aggregate prices the corpus;
    // the spectrum is a vocabulary-bounded re-aggregate.
    "q_yule_k" -> ((s, d) => {
      val wc = words(s, d).groupBy("source", "w")
        .agg(count(lit(1)).as("m"))
      wc.groupBy("source", "m").agg(count(lit(1)).as("vm"))
        .groupBy("source")
        .agg(sum(col("m") * col("vm")).as("n"),
          sum(col("m") * col("m") * col("vm")).as("s2"))
        .select(col("source"), col("n").as("n_tokens"),
          round(lit(1e4) * (col("s2") - col("n")).cast("double") /
            (col("n").cast("double") * col("n").cast("double")), 6)
            .as("yule_k"))
        .orderBy("source")
    }),

    // ---- "Fightin' Words" log-odds keywords (Monroe, Colaresi &
    // Quinn 2008): which words does the (deterministically) first
    // source OVERUSE relative to the rest, under an informative
    // Dirichlet prior drawn from the pooled corpus (α_w = α0·f_w/N,
    // α0 = 1000)? The z-scored log-odds-ratio delta fixes χ²'s
    // rare-word explosion — the prior shrinks low-count words toward
    // the corpus rate, so the ranking surfaces genuinely
    // characteristic vocabulary. Every input is an exact integer count
    // (per-word, per-side, totals); delta and variance are single
    // fixed-order double expressions mirrored op-for-op in the oracle.
    // Scale shape: one (source, word) aggregation with map-side
    // partials prices the corpus; the side-split re-aggregate is
    // vocabulary-sized, the totals a broadcast 1-row frame, the top-15
    // a TakeOrdered — no window, no global sort.
    "q_log_odds" -> ((s, d) => {
      val sc = graft.CacheScope.cached(
        words(s, d).groupBy("source", "w").agg(count(lit(1)).as("c")))
      val aSrc = sc.agg(min("source").as("asrc"))
      val byWord = sc.crossJoin(broadcast(aSrc))
        .select(col("w"),
          when(col("source") === col("asrc"), col("c")).otherwise(0L)
            .as("ca"),
          when(col("source") =!= col("asrc"), col("c")).otherwise(0L)
            .as("cb"))
        .groupBy("w").agg(sum("ca").as("ya"), sum("cb").as("yb"))
      val tot = byWord.agg(sum("ya").as("na"), sum("yb").as("nb"),
        sum(col("ya") + col("yb")).as("n"))
      val aw = lit(1000.0) * (col("ya") + col("yb")).cast("double") /
        col("n").cast("double")
      val da = log((col("ya").cast("double") + aw) /
        (col("na").cast("double") + 1000.0 - col("ya").cast("double") - aw))
      val db = log((col("yb").cast("double") + aw) /
        (col("nb").cast("double") + 1000.0 - col("yb").cast("double") - aw))
      val z = (da - db) / sqrt(lit(1.0) / (col("ya").cast("double") + aw) +
        lit(1.0) / (col("yb").cast("double") + aw))
      byWord.crossJoin(broadcast(tot))
        .filter(col("ya") + col("yb") >= 10)
        .select(col("w"), col("ya"), col("yb"), round(z, 4).as("z"))
        .orderBy(col("z").desc, col("w").asc).limit(15)
    }),

    "q_chi2_keywords" -> ((s, d) => {
      val sc = graft.CacheScope.cached(
        words(s, d).groupBy("source", "w").agg(count(lit(1)).as("c")))
      val st = sc.groupBy("source").agg(sum("c").as("st"))
      val wt = sc.groupBy("w").agg(sum("c").as("wt"))
      val n = sc.agg(sum("c").as("n"))
      val o11 = col("c").cast("double")
      val o12 = (col("st") - col("c")).cast("double")
      val o21 = (col("wt") - col("c")).cast("double")
      val o22 = (col("n") - col("st") - col("wt") + col("c")).cast("double")
      val det = o11 * o22 - o12 * o21
      val chi2 = round(col("n").cast("double") * det * det /
        (col("st").cast("double") * col("wt") *
          (col("n") - col("st")) * (col("n") - col("wt"))), 4)
      val scored = sc
        .join(broadcast(st), Seq("source"))
        .join(broadcast(wt), Seq("w"))
        .crossJoin(broadcast(n))
        .filter(col("c") >= 5 && det > 0)
        .select(col("source"), col("w"), chi2.as("chi2"))
      val rw = Window.partitionBy("source")
        .orderBy(col("chi2").desc, col("w").asc)
      scored.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 3)
        .select(col("source"), col("rank"), col("w").as("keyword"),
          col("chi2"))
        .orderBy("source", "rank")
    }),

    // ---- pairwise Jensen-Shannon divergence between source token
    // distributions — the corpus-drift / source-redundancy matrix (two
    // sources with JSD ≈ 0 are the same crawl twice; a source whose JSD
    // to every other spikes is an outlier to audit). Scale shape: the
    // corpus collapses to a (source × word) count table in one pass;
    // densification is dims × vocab (both bounded — the crossJoin is the
    // sanctioned dim×dim case), and the pair join is keyed on the word.
    // Each JSD term is rounded to pico-nats and summed as INTEGERS so
    // partition order can never flip a bit (the q_dsir discipline).
    "q_jsd_sources" -> ((s, d) => {
      val sc = graft.CacheScope.cached(
        words(s, d).groupBy("source", "w").agg(count(lit(1)).as("c")))
      val tot = sc.groupBy("source").agg(sum("c").as("n"))
      val vocab = sc.select("w").distinct()
      val dense = tot.crossJoin(vocab)
        .join(sc, Seq("source", "w"), "left")
        .select(col("source"), col("w"),
          (coalesce(col("c"), lit(0L)).cast("double") / col("n")).as("p"))
      val a = dense.toDF("s1", "w", "p")
      val b = dense.toDF("s2", "w", "q")
      val term = (p: org.apache.spark.sql.Column,
                  q: org.apache.spark.sql.Column) =>
        when(p > 0, p * log(p * 2 / (p + q))).otherwise(lit(0.0))
      a.join(b, Seq("w"))
        .filter(col("s1") < col("s2"))
        .select(col("s1"), col("s2"),
          round((term(col("p"), col("q")) + term(col("q"), col("p"))) * 0.5
            * 1e12).cast(LongType).as("t"))
        .groupBy("s1", "s2")
        .agg(round(sum("t") / 1e12, 6).as("jsd"))
        .orderBy("s1", "s2")
    }),

    // ---- Gini concentration of document length per source — the
    // inequality dial (is a source a few giant pages plus stubs, or
    // uniform?). Sorted-rank formula G = (2·Σi·x_i − (n+1)·Σx)/(n·Σx):
    // every accumulated term is INTEGER (rank × length), so the only
    // float is the final division — exact under any partition order.
    // One shuffle keyed by source + the rank window + one agg; at
    // larger-than-2^63 per-source mass the sums move to decimal(38,0),
    // a type-level change.
    "q_gini" -> ((s, d) => {
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("source"), col("n_chars"), col("doc_id"))
        .withColumn("i", row_number().over(w).cast(LongType))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("i") * col("n_chars")).as("s1"),
          sum(col("n_chars")).as("t"))
        .select(col("source"), col("n"),
          round((col("s1") * 2 - (col("n") + 1) * col("t")).cast("double") /
            (col("n") * col("t")).cast("double"), 6).as("gini"))
        .orderBy("source")
    }),

    // ---- Theil T inequality of doc lengths, DECOMPOSED: unlike Gini,
    // Theil splits exactly into within-source + between-source terms
    // (T = Σ s_g·T_g + Σ s_g·ln(μ_g/μ)), which answers "is length
    // inequality a property of sources or within them?". Per-group
    // needs only (n, Σx, Σ x·ln x); the x·ln x terms round to
    // micro-units and INTEGER-sum (q_dsir discipline) so partition
    // order can't move a sum; the one global row broadcasts. Output:
    // per-source within-T + share, plus a TOTAL row carrying the
    // decomposition (within, between, total).
    "q_theil" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("source"), col("n_chars"))
        .filter(col("n_chars") > 0)
      val g = graft.CacheScope.cached(base.groupBy("source").agg(
        count(lit(1)).as("n"), sum("n_chars").as("sx"),
        sum(round(col("n_chars").cast("double") *
          log(col("n_chars").cast("double")) * 1e6).cast("long"))
          .as("sxlx")))
      val tot = g.agg(sum("n").as("nn"), sum("sx").as("tx"))
      val mu = (c: org.apache.spark.sql.Column,
                nc: org.apache.spark.sql.Column) =>
        c.cast("double") / nc.cast("double")
      // T_g = ΣxlnX/(n_g·μ_g) − ln μ_g  with ΣxlnX in micro-units;
      // the TOTAL row's component sums go through nano-unit integers so
      // the 1-row reduction is partition-order-proof in both engines
      val withinG = (col("sxlx").cast("double") / 1e6) /
        col("sx").cast("double") - log(mu(col("sx"), col("n")))
      val rows = g.crossJoin(broadcast(tot))
        .select(col("source"), col("n"),
          round(mu(col("sx"), col("n")), 2).as("mean_chars"),
          round(col("sx").cast("double") / col("tx").cast("double"), 6)
            .as("share"),
          round(withinG, 6).as("theil_within"),
          round((col("sx").cast("double") / col("tx").cast("double") *
            withinG) * 1e9).cast("long").as("w_int"),
          round((col("sx").cast("double") / col("tx").cast("double") *
            log(mu(col("sx"), col("n")) / mu(col("tx"), col("nn")))) *
            1e9).cast("long").as("b_int"))
      val total = rows
        .agg(sum("w_int").as("wi"), sum("b_int").as("bi"))
        .select(lit("TOTAL").as("source"), lit(null).cast("long").as("n"),
          lit(null).cast("double").as("mean_chars"), lit(1.0).as("share"),
          round(col("wi").cast("double") / 1e9, 6).as("theil_within"),
          round(col("bi").cast("double") / 1e9, 6).as("theil_between"))
      rows.select(col("source"), col("n"), col("mean_chars"),
          col("share"), col("theil_within"),
          lit(null).cast("double").as("theil_between"))
        .unionByName(total)
        .orderBy("source")
    }),

    // ---- Iterative proportional fitting (raking): reweight the
    // source×lang contingency so both marginals hit uniform targets —
    // the classic survey/corpus rebalancing move (Deming–Stephan 1940).
    // Two IPF rounds (row-scale then column-scale), run ENTIRELY on the
    // aggregated |sources|×|langs| cell table: at 100 TB the corpus
    // contributes one partial-combined count agg and the iteration cost
    // is independent of corpus size. Oracle unrolls the same two rounds
    // as chained CTEs.
    "q_ipf" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tot = broadcast(cells.agg(sum("n").as("nn"),
        countDistinct("source").as("ns"), countDistinct("lang").as("nl")))
      var w = cells.withColumn("w", lit(1d))
      for (_ <- 1 to 2) {
        val rs = w.groupBy("source").agg(sum(col("n") * col("w")).as("rs"))
        w = w.join(rs, Seq("source")).crossJoin(tot)
          .select(col("source"), col("lang"), col("n"),
            (col("w") * ((col("nn").cast("double") / col("ns")) / col("rs")))
              .as("w"))
        val cs = w.groupBy("lang").agg(sum(col("n") * col("w")).as("cs"))
        w = w.join(cs, Seq("lang")).crossJoin(tot)
          .select(col("source"), col("lang"), col("n"),
            (col("w") * ((col("nn").cast("double") / col("nl")) / col("cs")))
              .as("w"))
          .localCheckpoint()
      }
      w.select(col("source"), col("lang"), col("n"),
          round(col("w"), 6).as("w"),
          round(col("n") * col("w"), 4).as("fitted"))
        .orderBy("source", "lang")
    }),

    // ---- dataset card: the per-source datasheet row (Gebru et al.'s
    // "datasheets for datasets" shape) a curation team publishes with
    // every corpus release — volume, token mass, exact duplicate rate,
    // language spread and its entropy, and the dominant language. One
    // cached narrow projection of the corpus feeds two aggregates
    // (per-source scalars incl. distinct-digest dup rate; per-
    // (source,lang) counts for mode + entropy); everything after is
    // bounded-frame joins. Entropy terms quantize to nano before the
    // sum; the dominant language ties break lexicographically.
    "q_dataset_card" -> ((s, d) => {
      val base = graft.CacheScope.cached(Tables.documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"),
          md5(col("text")).as("h"),
          size(split(col("text"), " ")).as("ntok")))
      val per = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum(col("ntok").cast("long")).as("total_tokens"),
        countDistinct("h").as("n_distinct"))
      val sl = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // bounded |sources|×|langs| grid
      val wtop = Window.partitionBy("source")
        .orderBy(col("c").desc, col("lang").asc)
      val top = sl.withColumn("rn", row_number().over(wtop))
        .filter(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"))
      val ent = sl.join(sl.groupBy("source").agg(sum("c").as("nt")),
          "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_langs"),
          sum(round(-(col("c").cast("double") / col("nt")) *
            log(col("c").cast("double") / col("nt")) * 1e9).cast("long"))
            .as("ent9"))
      per.join(broadcast(top), "source").join(broadcast(ent), "source")
        .select(col("source"), col("n_docs"), col("total_chars"),
          col("total_tokens"),
          round(col("total_tokens").cast("double") / col("n_docs"), 4)
            .as("mean_tokens"),
          round(lit(1.0) - col("n_distinct").cast("double") /
            col("n_docs"), 6).as("dup_rate"),
          col("n_langs"), col("top_lang"),
          round(col("ent9") / 1e9, 6).as("lang_entropy"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_dataset_card" ->
      """WITH base AS (
        |  SELECT source, lang, n_chars, md5(text) AS h,
        |    len(string_split(text, ' ')) AS ntok
        |  FROM documents),
        |per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(ntok) AS BIGINT) AS total_tokens,
        |    CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
        |  FROM base GROUP BY 1),
        |sl AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |top AS (
        |  SELECT source, lang AS top_lang FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY c DESC, lang ASC) AS rn
        |    FROM sl) t
        |  WHERE rn = 1),
        |ent AS (
        |  SELECT sl.source, CAST(count(*) AS BIGINT) AS n_langs,
        |    CAST(sum(CAST(round(
        |      -(CAST(c AS DOUBLE) / nt.nt) *
        |      ln(CAST(c AS DOUBLE) / nt.nt) * 1e9) AS BIGINT)) AS BIGINT)
        |      AS ent9
        |  FROM sl JOIN (SELECT source, CAST(sum(c) AS BIGINT) AS nt
        |                FROM sl GROUP BY 1) nt ON nt.source = sl.source
        |  GROUP BY 1)
        |SELECT per.source, n_docs, total_chars, total_tokens,
        |  round(CAST(total_tokens AS DOUBLE) / n_docs, 4) AS mean_tokens,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_docs, 6) AS dup_rate,
        |  n_langs, top_lang,
        |  round(ent9 / 1e9, 6) AS lang_entropy
        |FROM per JOIN top ON top.source = per.source
        |JOIN ent ON ent.source = per.source
        |ORDER BY per.source""".stripMargin,
    "q_anova" ->
      """WITH q AS (
        |  SELECT source,
        |    CAST(round(round(ln(1.0 + n_tokens) *
        |      (1.0 - round(CAST(stop_cnt AS DOUBLE) / n_tokens, 6)), 6)
        |      * 1e6) AS BIGINT) AS s6
        |  FROM (
        |    SELECT source,
        |      CAST(length(text) - length(replace(text, ' ', '')) + 1
        |        AS BIGINT) AS n_tokens,
        |      CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT)
        |        AS stop_cnt
        |    FROM documents) t),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s6) AS BIGINT) AS s1,
        |    CAST(sum(s6 * s6) AS BIGINT) AS s2
        |  FROM q GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS nd,
        |    CAST(sum(s1) AS BIGINT) AS t1,
        |    CAST(sum(s2) AS BIGINT) AS t2,
        |    sum(CAST(s1 AS DOUBLE) * s1 / n) AS ssbp
        |  FROM g)
        |SELECT k, nd,
        |  round(((ssbp - CAST(t1 AS DOUBLE) * t1 / nd) / (k - 1)) /
        |    ((CAST(t2 AS DOUBLE) - ssbp) / (nd - k)), 4) AS f_stat,
        |  round((ssbp - CAST(t1 AS DOUBLE) * t1 / nd) /
        |    (CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * t1 / nd), 6) AS eta2
        |FROM tot""".stripMargin,
    "q_cramers_v" ->
      """WITH c AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
        |cl AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS nd FROM c),
        |dims AS (
        |  SELECT CAST(count(DISTINCT lang) AS BIGINT) AS nr,
        |    CAST(count(DISTINCT source) AS BIGINT) AS nc
        |  FROM c),
        |cells AS (
        |  SELECT coalesce(c.o, 0) - CAST(r.rt AS DOUBLE) * cl.ct / n.nd AS d0,
        |    CAST(r.rt AS DOUBLE) * cl.ct / n.nd AS e
        |  FROM r CROSS JOIN cl CROSS JOIN n
        |  LEFT JOIN c ON c.lang = r.lang AND c.source = cl.source),
        |chi AS (SELECT sum(d0 * d0 / e) AS chi2 FROM cells)
        |SELECT nr, nc, round(chi2, 4) AS chi2,
        |  round(sqrt(chi2 / (nd * (least(nr, nc) - 1))), 6) AS cramers_v
        |FROM chi CROSS JOIN n CROSS JOIN dims""".stripMargin,
    "q_burstiness" ->
      """WITH td AS (
        |  SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) t
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |agg AS (
        |  SELECT w, CAST(sum(c) AS BIGINT) AS cf,
        |    CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM td GROUP BY 1)
        |SELECT w, cf, df,
        |  round(CAST(s2 AS DOUBLE) / cf - CAST(cf AS DOUBLE) / nd, 6)
        |    AS fano,
        |  round(CAST(cf AS DOUBLE) / df, 6) AS clump
        |FROM agg CROSS JOIN n
        |ORDER BY cf DESC, w ASC LIMIT 200""".stripMargin,
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
        |FROM cw GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_yule_k" ->
      """WITH wc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS m
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |fof AS (SELECT source, m, CAST(count(*) AS BIGINT) AS vm
        |        FROM wc GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, CAST(sum(m * vm) AS BIGINT) AS n,
        |    CAST(sum(m * m * vm) AS BIGINT) AS s2
        |  FROM fof GROUP BY 1)
        |SELECT source, n AS n_tokens,
        |  round(1e4 * CAST(s2 - n AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS yule_k
        |FROM agg ORDER BY source""".stripMargin,
    "q_log_odds" ->
      """WITH sc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |a AS (SELECT min(source) AS asrc FROM sc),
        |bw AS (
        |  SELECT w,
        |    CAST(sum(CASE WHEN source = a.asrc THEN c ELSE 0 END)
        |      AS BIGINT) AS ya,
        |    CAST(sum(CASE WHEN source <> a.asrc THEN c ELSE 0 END)
        |      AS BIGINT) AS yb
        |  FROM sc CROSS JOIN a GROUP BY 1),
        |tot AS (SELECT CAST(sum(ya) AS BIGINT) AS na,
        |               CAST(sum(yb) AS BIGINT) AS nb,
        |               CAST(sum(ya + yb) AS BIGINT) AS n FROM bw),
        |scored AS (
        |  SELECT w, ya, yb,
        |    round(
        |      (ln((CAST(ya AS DOUBLE) + 1000.0 * (ya + yb)
        |             / CAST(n AS DOUBLE)) /
        |          (CAST(na AS DOUBLE) + 1000.0 - CAST(ya AS DOUBLE)
        |             - 1000.0 * (ya + yb) / CAST(n AS DOUBLE))) -
        |       ln((CAST(yb AS DOUBLE) + 1000.0 * (ya + yb)
        |             / CAST(n AS DOUBLE)) /
        |          (CAST(nb AS DOUBLE) + 1000.0 - CAST(yb AS DOUBLE)
        |             - 1000.0 * (ya + yb) / CAST(n AS DOUBLE)))) /
        |      sqrt(1.0 / (CAST(ya AS DOUBLE) + 1000.0 * (ya + yb)
        |             / CAST(n AS DOUBLE)) +
        |           1.0 / (CAST(yb AS DOUBLE) + 1000.0 * (ya + yb)
        |             / CAST(n AS DOUBLE))), 4) AS z
        |  FROM bw CROSS JOIN tot
        |  WHERE ya + yb >= 10)
        |SELECT w, ya, yb, z FROM scored
        |ORDER BY z DESC, w ASC LIMIT 15""".stripMargin,
    "q_chi2_keywords" ->
      """WITH sc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS st
        |       FROM sc GROUP BY 1),
        |wt AS (SELECT w, CAST(sum(c) AS BIGINT) AS wt FROM sc GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sc),
        |scored AS (
        |  SELECT sc.source, sc.w,
        |    round(CAST(n.n AS DOUBLE) *
        |      (CAST(sc.c AS DOUBLE) *
        |         CAST(n.n - st.st - wt.wt + sc.c AS DOUBLE) -
        |       CAST(st.st - sc.c AS DOUBLE) *
        |         CAST(wt.wt - sc.c AS DOUBLE)) *
        |      (CAST(sc.c AS DOUBLE) *
        |         CAST(n.n - st.st - wt.wt + sc.c AS DOUBLE) -
        |       CAST(st.st - sc.c AS DOUBLE) *
        |         CAST(wt.wt - sc.c AS DOUBLE)) /
        |      (CAST(st.st AS DOUBLE) * wt.wt * (n.n - st.st)
        |        * (n.n - wt.wt)), 4) AS chi2
        |  FROM sc
        |  JOIN st ON st.source = sc.source
        |  JOIN wt ON wt.w = sc.w
        |  CROSS JOIN n
        |  WHERE sc.c >= 5
        |    AND CAST(sc.c AS DOUBLE) *
        |          CAST(n.n - st.st - wt.wt + sc.c AS DOUBLE) -
        |        CAST(st.st - sc.c AS DOUBLE) *
        |          CAST(wt.wt - sc.c AS DOUBLE) > 0)
        |SELECT source, rank, w AS keyword, chi2 FROM (
        |  SELECT source, w, chi2,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY chi2 DESC, w ASC) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    "q_jsd_sources" ->
      """WITH sc AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY 1, 2),
        |tot AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
        |vocab AS (SELECT DISTINCT w FROM sc),
        |dense AS (
        |  SELECT t.source, v.w,
        |    CAST(coalesce(sc.c, 0) AS DOUBLE) / t.n AS p
        |  FROM tot t CROSS JOIN vocab v
        |  LEFT JOIN sc ON sc.source = t.source AND sc.w = v.w),
        |terms AS (
        |  SELECT a.source AS s1, b.source AS s2,
        |    CAST(round((
        |      CASE WHEN a.p > 0
        |        THEN a.p * ln(a.p * 2 / (a.p + b.p)) ELSE 0.0 END +
        |      CASE WHEN b.p > 0
        |        THEN b.p * ln(b.p * 2 / (b.p + a.p)) ELSE 0.0 END
        |    ) * 0.5 * 1e12) AS BIGINT) AS t
        |  FROM dense a JOIN dense b ON b.w = a.w AND a.source < b.source)
        |SELECT s1, s2, round(sum(t) / 1e12, 6) AS jsd
        |FROM terms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_gini" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS i
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(i * n_chars) * 2 - (count(*) + 1) * sum(n_chars)
        |      AS DOUBLE) /
        |    CAST(count(*) * sum(n_chars) AS DOUBLE), 6) AS gini
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q_theil" ->
      """WITH base AS (SELECT source, n_chars FROM documents
        |              WHERE n_chars > 0),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(CAST(round(CAST(n_chars AS DOUBLE) *
        |      ln(CAST(n_chars AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT)
        |      AS sxlx
        |  FROM base GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |          CAST(sum(sx) AS BIGINT) AS tx FROM g),
        |rws AS (
        |  SELECT source, n,
        |    round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 2) AS mean_chars,
        |    round(CAST(sx AS DOUBLE) / CAST(tx AS DOUBLE), 6) AS share,
        |    round((CAST(sxlx AS DOUBLE) / 1e6) / CAST(sx AS DOUBLE) -
        |      ln(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |      AS theil_within,
        |    CAST(round((CAST(sx AS DOUBLE) / CAST(tx AS DOUBLE) *
        |      ((CAST(sxlx AS DOUBLE) / 1e6) / CAST(sx AS DOUBLE) -
        |       ln(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) * 1e9)
        |      AS BIGINT) AS w_int,
        |    CAST(round((CAST(sx AS DOUBLE) / CAST(tx AS DOUBLE) *
        |      ln((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
        |         (CAST(tx AS DOUBLE) / CAST(nn AS DOUBLE)))) * 1e9)
        |      AS BIGINT) AS b_int
        |  FROM g CROSS JOIN tot)
        |SELECT source, n, mean_chars, share, theil_within,
        |  CAST(NULL AS DOUBLE) AS theil_between
        |FROM rws
        |UNION ALL
        |SELECT 'TOTAL', NULL, NULL, CAST(1.0 AS DOUBLE),
        |  round(CAST(sum(w_int) AS DOUBLE) / 1e9, 6),
        |  round(CAST(sum(b_int) AS DOUBLE) / 1e9, 6)
        |FROM rws
        |ORDER BY source""".stripMargin,
    "q_ipf" -> {
      def ipfRound(i: Int): String = {
        val prev = if (i == 1) "w0" else s"wc${i - 1}"
        s"""rs$i AS (SELECT source, sum(n * w) AS rs FROM $prev GROUP BY 1),
           |wr$i AS (
           |  SELECT p.source, p.lang, p.n,
           |    p.w * ((CAST(nn AS DOUBLE) / ns) / rs.rs) AS w
           |  FROM $prev p JOIN rs$i rs ON rs.source = p.source
           |  CROSS JOIN tot),
           |cs$i AS (SELECT lang, sum(n * w) AS cs FROM wr$i GROUP BY 1),
           |wc$i AS (
           |  SELECT p.source, p.lang, p.n,
           |    p.w * ((CAST(nn AS DOUBLE) / nl) / cs.cs) AS w
           |  FROM wr$i p JOIN cs$i cs ON cs.lang = p.lang
           |  CROSS JOIN tot)""".stripMargin
      }
      s"""WITH cells AS (
         |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |  CAST(count(DISTINCT source) AS BIGINT) AS ns,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS nl FROM cells),
         |w0 AS (SELECT source, lang, n, CAST(1 AS DOUBLE) AS w FROM cells),
         |${(1 to 2).map(ipfRound).mkString(",\n")}
         |SELECT source, lang, n, round(w, 6) AS w,
         |  round(n * w, 4) AS fitted
         |FROM wc2 ORDER BY source, lang""".stripMargin
    }
  )
}
