package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Round-11 ML/graph/sketch batch: two-round gradient-boosted stumps
  * trained on the engine, a Bradley–Terry preference fit (the pairwise-
  * comparison model RLHF reward pipelines start from), truncated Katz
  * centrality, a k-minimum-values sketch with set-intersection estimates
  * vs exact truth, and quadratic-weighted Cohen's kappa.
  *
  * House disciplines: ONE corpus collapse per query to a value-domain /
  * per-user / distinct-edge frame; every iterative fit (boosting rounds,
  * MM rounds, Katz hops) is a bounded unrolled chain of aggregates over
  * the cached collapsed frame with scalars broadcast back — nothing
  * collected, nothing sequential; cross-row double sums quantize to
  * fixed-point integers first; squared count/cents products route
  * decimal(38,0) ↔ HUGEINT.
  */
object MlOps2 {
  private type Q = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L

  private def dec(c: Column) = c.cast("decimal(38,0)")

  /** (hour, weekday, cents) cell grid — the 168-cell value-domain frame
    * both boosting rounds read; the corpus is scanned exactly once. */
  private def gbmCells(s: SparkSession, d: String): DataFrame =
    graft.CacheScope.cached(Tables.events(s, d)
      .select(expr("(ts_us div 3600000000) % 24").as("h"),
        expr(s"(ts_us div $DayUs) % 7").as("w"),
        round(col("value") * 100).cast(LongType).as("y"))
      .groupBy("h", "w")
      .agg(count(lit(1)).as("cnt"), sum("y").as("sy"),
        sum((dec(col("y")) * col("y")).cast("decimal(38,0)")).as("syy")))

  val queries: Map[String, Q] = Map(
    // ---- Two rounds of gradient boosting with depth-1 trees (stumps)
    // on hour/weekday → event cents. The corpus collapses ONCE to the
    // 168-cell (hour × weekday) grid; each round's best split is an
    // argmax over ≤29 candidate thresholds built from bounded prefix
    // sums of the grid margins (gain = S_L²/n_L + S_R²/n_R − S²/n, the
    // Σy² term cancels), and the winning stump broadcasts back as a
    // 1-row frame. Round-2 residual sums per cell are EXACT integer
    // micro-cents (sy − cnt·pred quantized), so the fit is reduce-order-
    // proof; the final MSE folds the per-cell second-moment identity
    // syy − 2p·sy + cnt·p² through decimal.
    "q_gbm2" -> ((s, d) => {
      val cells = gbmCells(s, d)
      val tot = cells.agg(sum("cnt").as("n"), sum("sy").as("sgl"),
        sum("syy").as("ssq"))
      // candidate splits of one round: per-feature margin prefix sums
      // over a ≤24-row bounded frame (left side = values ≤ threshold)
      def cand(src: DataFrame, f: String, valCol: String,
          cntCol: String): DataFrame = {
        val m = src.groupBy(f).agg(sum(cntCol).as("nv"),
          sum(valCol).as("sv"))
        val wnd = Window.orderBy(f)
          .rowsBetween(Window.unboundedPreceding, 0)
        m.select(lit(f).as("feat"), col(f).cast("long").as("thr"),
          sum("nv").over(wnd).as("nl"), sum("sv").over(wnd).as("sl"))
      }
      def best(src: DataFrame, valCol: String, cntCol: String,
          totN: Column, totS: Column): DataFrame = {
        val cs = cand(src, "h", valCol, cntCol)
          .unionAll(cand(src, "w", valCol, cntCol))
          .crossJoin(broadcast(tot))
          .filter(col("nl") < totN)
        val sl = col("sl").cast("double")
        val sr = (totS - col("sl")).cast("double")
        val nl = col("nl").cast("double")
        val nr = (totN - col("nl")).cast("double")
        val gain = sl * sl / nl + sr * sr / nr -
          totS.cast("double") * totS.cast("double") / totN.cast("double")
        cs.select(col("feat"), col("thr"), gain.as("gain"),
            (sl / nl).as("ml"), (sr / nr).as("mr"))
          .orderBy(col("gain").desc, col("feat").asc, col("thr").asc)
          .limit(1)
      }
      val s1 = best(cells, "sy", "cnt", col("n"), col("sgl"))
        .toDF("f1", "t1", "g1", "ml1", "mr1")
      def pred1 = when((when(col("f1") === "h", col("h"))
        .otherwise(col("w"))) <= col("t1"), col("ml1"))
        .otherwise(col("mr1"))
      // r13: cached — the ≤168-row residual grid feeds tot2, both
      // round-2 candidate scans and the final MSE fold; un-cached each
      // consumer re-ran round 1's best-split window + broadcast chain.
      val cells2 = graft.CacheScope.cached(cells.crossJoin(broadcast(s1))
        .withColumn("p1", pred1)
        .withColumn("rs6", round((col("sy").cast("double") -
          col("cnt").cast("double") * col("p1")) * 1e6).cast(LongType)))
      val tot2 = cells2.agg(sum("cnt").as("n2"), sum("rs6").as("sr6"))
      val s2 = {
        val cs = cand(cells2, "h", "rs6", "cnt")
          .unionAll(cand(cells2, "w", "rs6", "cnt"))
          .crossJoin(broadcast(tot2))
          .filter(col("nl") < col("n2"))
        val sl = col("sl").cast("double") / 1e6
        val sr = (col("sr6") - col("sl")).cast("double") / 1e6
        val nl = col("nl").cast("double")
        val nr = (col("n2") - col("nl")).cast("double")
        val st = col("sr6").cast("double") / 1e6
        val gain = sl * sl / nl + sr * sr / nr -
          st * st / col("n2").cast("double")
        cs.select(col("feat"), col("thr"), gain.as("gain"),
            (sl / nl).as("ml"), (sr / nr).as("mr"))
          .orderBy(col("gain").desc, col("feat").asc, col("thr").asc)
          .limit(1).toDF("f2", "t2", "g2", "ml2", "mr2")
      }
      def pred2 = when((when(col("f2") === "h", col("h"))
        .otherwise(col("w"))) <= col("t2"), col("ml2"))
        .otherwise(col("mr2"))
      cells2.crossJoin(broadcast(s2))
        .withColumn("p", col("p1") + pred2)
        .select(col("f1"), col("t1"), col("g1"), col("f2"), col("t2"),
          col("g2"), col("cnt"),
          round((col("syy").cast("double") -
            lit(2.0) * col("p") * col("sy").cast("double") +
            col("cnt").cast("double") * col("p") * col("p")) * 1e2)
            .cast("decimal(38,0)").as("sse2"))
        .groupBy("f1", "t1", "g1", "f2", "t2", "g2")
        .agg(sum("cnt").as("n"), sum("sse2").as("sse2"))
        .select(col("n").as("n_events"),
          col("f1").as("feat1"), col("t1").as("thr1"),
          round(col("g1"), 4).as("gain1"),
          col("f2").as("feat2"), col("t2").as("thr2"),
          round(col("g2"), 4).as("gain2"),
          round(col("sse2").cast("double") / 1e2 /
            col("n").cast("double"), 4).as("mse"))
    }),

    // ---- Bradley–Terry preference strengths over part brands, two MM
    // iterations (Hunter 2004): within each order, a brand with the
    // strictly larger total quantity "beats" the other — pairwise
    // comparisons are a keyed self-join WITHIN l_orderkey (bounded by
    // order width), collapsed once to the ≤625-row brand-pair win
    // matrix. Each MM round is s'ᵢ = Wᵢ / Σⱼ nᵢⱼ/(sᵢ+sⱼ) over that
    // bounded matrix with the strength vector broadcast back; per-brand
    // denominators quantize each term to nano-units (exact integer
    // reduce), and rounds renormalize to mean 1.
    "q_bradley_terry" -> ((s, d) => {
      val ob = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .agg(sum(round(col("l_quantity")).cast(LongType)).as("q"))
      val a = ob.toDF("o", "ba", "qa")
      val b = ob.toDF("o", "bb", "qb")
      val wm = graft.CacheScope.cached(a.join(b, Seq("o"))
        .filter(col("ba") < col("bb") && col("qa") =!= col("qb"))
        .select(
          when(col("qa") > col("qb"), col("ba")).otherwise(col("bb"))
            .as("win"),
          when(col("qa") > col("qb"), col("bb")).otherwise(col("ba"))
            .as("lose"))
        .groupBy("win", "lose").agg(count(lit(1)).as("nw")))
      val wins = wm.groupBy(col("win").as("b"))
        .agg(sum("nw").as("wi"))
      val games = graft.CacheScope.cached(
        wm.select(col("win").as("i"), col("lose").as("j"), col("nw"))
          .unionAll(wm.select(col("lose").as("i"), col("win").as("j"),
            col("nw")))
          .groupBy("i", "j").agg(sum("nw").as("g")))
      // one MM round: s = strengths (b, sv) → updated (b, sv).
      // r13: the round INPUT and the ≤625-row `raw` frame are eagerly
      // checkpointed. Without this, every broadcast inside round 2 (si,
      // sj, norm, the final join) re-executed round 1's whole subtree —
      // the probe measured 96 jobs / 417 Exchanges for the query; the
      // checkpoints make each broadcast a ≤|brands|-row cache read
      // (guide §5 localCheckpoint / §3.3 plan truncation). Same math,
      // same values — only the re-execution is gone.
      def ckpt25(df: DataFrame): DataFrame = {
        val ck = df.localCheckpoint(true)
        ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
      }
      def mm(sv: DataFrame): DataFrame = {
        val si = sv.toDF("i", "si")
        val sj = sv.toDF("j", "sj")
        val den = games.join(broadcast(si), "i")
          .join(broadcast(sj), "j")
          .groupBy("i")
          .agg(sum(round(col("g").cast("double") /
            (col("si") + col("sj")) * 1e9).cast(LongType)).as("den9"))
        val raw = ckpt25(den.join(broadcast(wins),
            den("i") === wins("b"))
          .select(col("b"), (col("wi").cast("double") /
            (col("den9").cast("double") / 1e9)).as("sraw")))
        val norm = raw.agg(sum(round(col("sraw") * 1e6)
          .cast(LongType)).as("m6"), count(lit(1)).as("k"))
        ckpt25(raw.crossJoin(broadcast(norm))
          .select(col("b"), (col("sraw") /
            (col("m6").cast("double") / 1e6 / col("k").cast("double")))
            .as("sv")))
      }
      val s0 = wins.select(col("b"), lit(1.0).as("sv"))
      val s2 = mm(mm(s0))
      s2.join(broadcast(wins), "b")
        .select(col("b").as("brand"), round(col("sv"), 6).as("strength"),
          col("wi").as("wins"))
        .orderBy(col("strength").desc, col("brand").asc)
        .limit(10)
    }),

    // ---- Truncated Katz centrality on the nation trade graph: K =
    // Σ_{ℓ=1..3} β^ℓ (Aᵀ)^ℓ 1 with β = 0.1 — how reachable each nation
    // is by 1-, 2-, 3-hop trade paths. The corpus pays ONE distinct-edge
    // collapse (the q_pagerank derivation); the three hops are keyed
    // joins over the ≤625-row bounded edge frame with exact integer
    // path counts, combined at the end.
    "q_katz" -> ((s, d) => {
      val e = graft.CacheScope.cached(
        GraphOps.tradeEdges(s, d).distinct())
      val nodes = e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
      val v1 = e.groupBy(col("dst").as("node"))
        .agg(count(lit(1)).as("x1"))
      def hop(v: DataFrame, xin: String, xout: String): DataFrame =
        e.join(v.toDF("src", xin), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(xin).as(xout))
      val v2 = hop(v1.toDF("node", "x1"), "x1", "x2")
      val v3 = hop(v2, "x2", "x3")
      nodes.join(broadcast(v1), Seq("node"), "left")
        .join(broadcast(v2), Seq("node"), "left")
        .join(broadcast(v3), Seq("node"), "left")
        .select(col("node").cast("long").as("node"),
          round(lit(0.1) * coalesce(col("x1"), lit(0L)) +
            lit(0.01) * coalesce(col("x2"), lit(0L)) +
            lit(0.001) * coalesce(col("x3"), lit(0L)), 6).as("katz"))
        .orderBy("node")
    }),

    // ---- K-minimum-values sketches (k = 256) of per-type distinct-user
    // sets, with union/intersection estimates vs exact truth: the
    // mergeable-sketch algebra a 100 TB audience-overlap query runs
    // instead of exact pairwise distincts. The corpus collapses once to
    // distinct (type, user); per-type sketches keep the 256 smallest
    // 60-bit md5 prefixes via withKeyedRowNumber (5 keys, corpus-sized
    // slices — its designed regime); pair sketches merge two ≤256-row
    // frames. Estimator (k−1)/h_k, exact below k; intersections by
    // inclusion–exclusion, floored at 0.
    "q_kmv_intersect" -> ((s, d) => {
      // r14: ONE corpus pass instead of two — the per-user type-bitmask
      // fold (prof, needed anyway for the exact intersections) already
      // holds exactly the distinct (type, user) pairs, so `du` explodes
      // the ≤3 set flags per user instead of paying a second corpus
      // scan + a corpus-sized distinct exchange (guide §2.3: the
      // user-keyed exchange is shared by both consumers).
      val prof = graft.CacheScope.cached(Tables.events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id").agg(
          max(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("tv"),
          max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("tc"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("tp")))
      val emptyS = array().cast("array<string>")
      // still cached: GlobalRank's two-phase form scans its input twice
      val du = graft.CacheScope.cached(prof
        .select(explode(concat(
            when(col("tv") === 1L, array(lit("view"))).otherwise(emptyS),
            when(col("tc") === 1L, array(lit("click"))).otherwise(emptyS),
            when(col("tp") === 1L, array(lit("purchase")))
              .otherwise(emptyS))).as("t"),
          col("user_id"))
        .withColumn("h", conv(substring(md5(col("user_id")
          .cast("string")), 1, 15), 16, 10).cast(LongType)))
      val sk = graft.CacheScope.cached(
        graft.operators.GlobalRank.withKeyedRowNumber(du, "rk",
          Seq("t"), Seq(col("h").asc, col("user_id").asc))
          .filter(col("rk") <= 256)
          .select(col("t"), col("h")))
      val two60 = 1152921504606846976.0
      def est(cs: Column, hk: Column): Column =
        when(cs < 256L, cs.cast("double"))
          .otherwise(lit(255.0) * two60 / hk.cast("double"))
      val perT = sk.groupBy("t")
        .agg(count(lit(1)).as("cs"), max("h").as("hk"))
        .select(col("t"), est(col("cs"), col("hk")).as("e"))
      val exact = prof.agg(
        sum(col("tv") * col("tc")).as("x_view_click"),
        sum(col("tv") * col("tp")).as("x_view_purchase"),
        sum(col("tc") * col("tp")).as("x_click_purchase"))
      val pairs = Seq(("click", "view"), ("purchase", "view"),
        ("click", "purchase")).map { case (x, y) =>
          if (x < y) (x, y) else (y, x) }
      import s.implicits._
      val pf = pairs.toDF("a", "b")
      val merged = pf.join(sk, pf("a") === sk("t"))
        .select(col("a"), col("b"), col("h"))
        .unionAll(pf.join(sk, pf("b") === sk("t"))
          .select(col("a"), col("b"), col("h")))
        .distinct()
      val wnd = Window.partitionBy("a", "b").orderBy("h")
      val uni = merged.withColumn("rk", row_number().over(wnd))
        .filter(col("rk") <= 256)
        .groupBy("a", "b")
        .agg(count(lit(1)).as("cs"), max("h").as("hk"))
        .select(col("a"), col("b"), est(col("cs"), col("hk")).as("eu"))
      val ea = perT.toDF("a", "ea")
      val eb = perT.toDF("b", "eb")
      uni.join(broadcast(ea), "a").join(broadcast(eb), "b")
        .crossJoin(broadcast(exact))
        .select(col("a"), col("b"),
          round(col("ea"), 2).as("est_a"), round(col("eb"), 2).as("est_b"),
          round(col("eu"), 2).as("est_union"),
          round(greatest(col("ea") + col("eb") - col("eu"), lit(0.0)), 2)
            .as("est_intersect"),
          when(col("a") === "click" && col("b") === "view",
            col("x_view_click"))
            .when(col("a") === "purchase" && col("b") === "view",
              col("x_view_purchase"))
            .otherwise(col("x_click_purchase")).as("exact_intersect"))
        .withColumn("rel_err",
          round(abs(col("est_intersect") -
            col("exact_intersect").cast("double")) /
            col("exact_intersect").cast("double"), 4))
        .orderBy("a", "b")
    }),

    // ---- Two full Lloyd iterations of k-means (k = 8) on the
    // embeddings, trained on the engine: deterministic init from the
    // fixture's first 8 vectors, assignment by exact pico-quantized L2
    // (the q_vec_analogy distance discipline — per-dimension terms are
    // BIGINT so argmin ties resolve identically in both engines), new
    // centroids as per-(cluster, dim) means rounded to 4 dp before
    // re-entering arithmetic (the q_centroids rule). Each assignment is
    // one broadcast join of the ≤64-row centroid frame against the
    // cached exploded corpus — k× linear work per round, nothing
    // collected.
    "q_kmeans_lloyd" -> ((s, d) => {
      val pe = graft.CacheScope.cached(Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("pos", "x0")))
        .select(col("vec_id"), col("pos"),
          col("x0").cast("double").as("x")))
      val cent0 = pe.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("pos"),
          col("x").as("c"))
      def assign(cent: DataFrame): DataFrame = {
        val d2 = pe.join(broadcast(cent), "pos")
          .groupBy("vec_id", "cid")
          .agg(sum(round((col("x") - col("c")) * (col("x") - col("c"))
            * 1e12).cast(LongType)).as("d2"))
        val wnd = Window.partitionBy("vec_id")
          .orderBy(col("d2").asc, col("cid").asc)
        d2.withColumn("rk", row_number().over(wnd))
          .filter(col("rk") === 1)
          .select(col("vec_id"), col("cid"), col("d2"))
      }
      def recenter(asg: DataFrame): DataFrame =
        pe.join(asg.select("vec_id", "cid"), "vec_id")
          .groupBy("cid", "pos")
          .agg((round(avg(col("x")), 4) + 0.0).as("c"))
      val a1 = assign(cent0)
      val cent1 = recenter(a1)
      val a2 = assign(cent1)
      a2.groupBy("cid")
        .agg(count(lit(1)).as("n_members"),
          sum("d2").as("in12"))
        .select(col("cid").cast("long").as("cluster"), col("n_members"),
          round(col("in12").cast("double") / 1e12, 4).as("inertia"))
        .orderBy("cluster")
    }),

    // ---- Quadratic-weighted Cohen's kappa between each user's first-
    // half and second-half spend tier (fixed $500 value-domain tiers,
    // capped at 4): do users keep their spend tier across the two
    // calendar halves? ONE per-user collapse (midpoint derived in-plan,
    // the q_merge_upsert pattern) → the 5×5 confusion grid; expected
    // counts are exact decimal margin products; the weighted sums are
    // exact integers so κ_w has no reduce-order drift.
    "q_weighted_kappa" -> ((s, d) => {
      val per = Tables.events(s, d)
        .select(col("user_id"), expr(s"ts_us div $DayUs").as("day"),
          round(col("value") * 100).cast(LongType).as("cents"))
        .groupBy("user_id", "day")
        .agg(sum("cents").as("sc"))
      val mid = per.agg(min("day").as("mn"), max("day").as("mx"))
        .select(expr("(mn + mx + 1) div 2").as("mid"))
      val tiers = per.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("day") < col("mid"), col("sc")).otherwise(0L))
            .as("c1"),
          sum(when(col("day") >= col("mid"), col("sc")).otherwise(0L))
            .as("c2"))
        // integer div (cents are non-negative, so div == floor — the
        // ADVICE r10 q_atkinson div/floor hazard is unreachable here)
        .select(least(expr("c1 div 50000"), lit(4L)).as("ta"),
          least(expr("c2 div 50000"), lit(4L)).as("tb"))
      val grid = graft.CacheScope.cached(
        tiers.groupBy("ta", "tb").agg(count(lit(1)).as("o")))
      val rowm = grid.groupBy("ta").agg(sum("o").as("ra"))
      val colm = grid.groupBy("tb").agg(sum("o").as("cb"))
      val n = grid.agg(sum("o").as("nn"))
      val full = grid.join(broadcast(rowm), "ta")
        .join(broadcast(colm), "tb")
        .crossJoin(broadcast(n))
      val wsq = (col("ta") - col("tb")) * (col("ta") - col("tb"))
      full.agg(
          max("nn").as("n_users"),
          sum(wsq * col("o")).as("wo"),
          sum((wsq.cast("decimal(38,0)") * col("ra") * col("cb"))
            .cast("decimal(38,0)")).as("we"),
          max("nn").as("nn2"))
        .select(col("n_users"),
          round(lit(1.0) - col("wo").cast("double") /
            (col("we").cast("double") / col("nn2").cast("double")), 6)
            .as("kappa_w"))
    }))

  private val gbmCellsSql =
    """cells AS (
      |  SELECT (epoch_us(ts) // 3600000000) % 24 AS h,
      |    (epoch_us(ts) // 86400000000) % 7 AS w,
      |    CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
      |    sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) *
      |      CAST(round(value * 100) AS BIGINT)) AS syy
      |  FROM events GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
      |  CAST(sum(sy) AS BIGINT) AS sgl, sum(syy) AS ssq FROM cells)""".stripMargin

  /** One boosting round's candidate/argmax SQL over a cell frame named
    * `src` with value column `vc` (divided by `scale` into cents) and
    * totals (tn, ts) — emits `cand<tag>` and `s<tag>` CTEs. */
  private def gbmRoundSql(tag: String, src: String, vc: String,
      scale: String, tn: String, ts: String): String =
    s"""cand$tag AS (
       |  SELECT feat, thr, nl, sl FROM (
       |    SELECT 'h' AS feat, CAST(h AS BIGINT) AS thr,
       |      CAST(sum(sum(cnt)) OVER (ORDER BY h
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |        AS BIGINT) AS nl,
       |      CAST(sum(sum($vc)) OVER (ORDER BY h
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |        AS BIGINT) AS sl
       |    FROM $src GROUP BY h
       |    UNION ALL
       |    SELECT 'w' AS feat, CAST(w AS BIGINT) AS thr,
       |      CAST(sum(sum(cnt)) OVER (ORDER BY w
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |        AS BIGINT) AS nl,
       |      CAST(sum(sum($vc)) OVER (ORDER BY w
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |        AS BIGINT) AS sl
       |    FROM $src GROUP BY w)),
       |s$tag AS (
       |  SELECT feat, thr,
       |    (CAST(sl AS DOUBLE) / $scale) * (CAST(sl AS DOUBLE) / $scale)
       |      / CAST(nl AS DOUBLE) +
       |    ((CAST($ts AS DOUBLE) - sl) / $scale) *
       |      ((CAST($ts AS DOUBLE) - sl) / $scale) /
       |      (CAST($tn AS DOUBLE) - nl) -
       |    (CAST($ts AS DOUBLE) / $scale) * (CAST($ts AS DOUBLE) / $scale)
       |      / CAST($tn AS DOUBLE) AS gain,
       |    CAST(sl AS DOUBLE) / $scale / CAST(nl AS DOUBLE) AS ml,
       |    (CAST($ts AS DOUBLE) - sl) / $scale /
       |      (CAST($tn AS DOUBLE) - nl) AS mr
       |  FROM cand$tag CROSS JOIN tot2x
       |  WHERE nl < $tn
       |  ORDER BY gain DESC, feat, thr LIMIT 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_gbm2" ->
      s"""WITH $gbmCellsSql,
         |tot2x AS (SELECT n, sgl, CAST(NULL AS BIGINT) AS n2,
         |  CAST(NULL AS BIGINT) AS sr6 FROM tot),
         |${gbmRoundSql("1", "cells", "sy", "1.0", "n", "sgl")},
         |cells2 AS (
         |  SELECT c.h, c.w, c.cnt, c.sy, c.syy, s1.feat AS f1,
         |    s1.thr AS t1, s1.gain AS g1,
         |    CASE WHEN (CASE WHEN s1.feat = 'h' THEN c.h ELSE c.w END)
         |      <= s1.thr THEN s1.ml ELSE s1.mr END AS p1
         |  FROM cells c CROSS JOIN s1),
         |cells2r AS (
         |  SELECT *, CAST(round((CAST(sy AS DOUBLE) -
         |    CAST(cnt AS DOUBLE) * p1) * 1e6) AS BIGINT) AS rs6
         |  FROM cells2),
         |tot2 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n2,
         |  CAST(sum(rs6) AS BIGINT) AS sr6 FROM cells2r),
         |cand2 AS (
         |  SELECT feat, thr, nl, sl FROM (
         |    SELECT 'h' AS feat, CAST(h AS BIGINT) AS thr,
         |      CAST(sum(sum(cnt)) OVER (ORDER BY h
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS BIGINT) AS nl,
         |      CAST(sum(sum(rs6)) OVER (ORDER BY h
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS BIGINT) AS sl
         |    FROM cells2r GROUP BY h
         |    UNION ALL
         |    SELECT 'w' AS feat, CAST(w AS BIGINT) AS thr,
         |      CAST(sum(sum(cnt)) OVER (ORDER BY w
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS BIGINT) AS nl,
         |      CAST(sum(sum(rs6)) OVER (ORDER BY w
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS BIGINT) AS sl
         |    FROM cells2r GROUP BY w)),
         |s2 AS (
         |  SELECT feat, thr,
         |    (CAST(sl AS DOUBLE) / 1e6) * (CAST(sl AS DOUBLE) / 1e6)
         |      / CAST(nl AS DOUBLE) +
         |    ((CAST(sr6 AS DOUBLE) - sl) / 1e6) *
         |      ((CAST(sr6 AS DOUBLE) - sl) / 1e6) /
         |      (CAST(n2 AS DOUBLE) - nl) -
         |    (CAST(sr6 AS DOUBLE) / 1e6) * (CAST(sr6 AS DOUBLE) / 1e6)
         |      / CAST(n2 AS DOUBLE) AS gain,
         |    CAST(sl AS DOUBLE) / 1e6 / CAST(nl AS DOUBLE) AS ml,
         |    (CAST(sr6 AS DOUBLE) - sl) / 1e6 /
         |      (CAST(n2 AS DOUBLE) - nl) AS mr
         |  FROM cand2 CROSS JOIN tot2
         |  WHERE nl < n2
         |  ORDER BY gain DESC, feat, thr LIMIT 1),
         |fin AS (
         |  SELECT c.cnt, c.f1, c.t1, c.g1, s2.feat AS f2, s2.thr AS t2,
         |    s2.gain AS g2,
         |    c.p1 + CASE WHEN (CASE WHEN s2.feat = 'h' THEN c.h
         |      ELSE c.w END) <= s2.thr THEN s2.ml ELSE s2.mr END AS p,
         |    c.sy, c.syy
         |  FROM cells2r c CROSS JOIN s2)
         |SELECT CAST(sum(cnt) AS BIGINT) AS n_events,
         |  max(f1) AS feat1, max(t1) AS thr1, round(max(g1), 4) AS gain1,
         |  max(f2) AS feat2, max(t2) AS thr2, round(max(g2), 4) AS gain2,
         |  round(CAST(sum(CAST(round((CAST(syy AS DOUBLE) -
         |      2.0 * p * CAST(sy AS DOUBLE) +
         |      CAST(cnt AS DOUBLE) * p * p) * 1e2) AS HUGEINT))
         |    AS DOUBLE) / 1e2 / CAST(sum(cnt) AS DOUBLE), 4) AS mse
         |FROM fin""".stripMargin,
    "q_bradley_terry" ->
      """WITH ob AS (
        |  SELECT l_orderkey AS o, p_brand AS b,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |wm AS (
        |  SELECT CASE WHEN a.q > b.q THEN a.b ELSE b.b END AS win,
        |    CASE WHEN a.q > b.q THEN b.b ELSE a.b END AS lose,
        |    CAST(count(*) AS BIGINT) AS nw
        |  FROM ob a JOIN ob b ON a.o = b.o AND a.b < b.b AND a.q <> b.q
        |  GROUP BY 1, 2),
        |wins AS (SELECT win AS b, CAST(sum(nw) AS BIGINT) AS wi
        |         FROM wm GROUP BY 1),
        |games AS (
        |  SELECT i, j, CAST(sum(nw) AS BIGINT) AS g FROM (
        |    SELECT win AS i, lose AS j, nw FROM wm
        |    UNION ALL
        |    SELECT lose AS i, win AS j, nw FROM wm)
        |  GROUP BY 1, 2),
        |s0 AS (SELECT b, 1.0 AS sv FROM wins),
        |den1 AS (
        |  SELECT g.i, CAST(sum(CAST(round(CAST(g.g AS DOUBLE) /
        |    (si.sv + sj.sv) * 1e9) AS BIGINT)) AS BIGINT) AS den9
        |  FROM games g
        |  JOIN s0 si ON si.b = g.i JOIN s0 sj ON sj.b = g.j
        |  GROUP BY 1),
        |raw1 AS (
        |  SELECT w.b, CAST(w.wi AS DOUBLE) /
        |    (CAST(d.den9 AS DOUBLE) / 1e9) AS sraw
        |  FROM den1 d JOIN wins w ON w.b = d.i),
        |nrm1 AS (SELECT CAST(sum(CAST(round(sraw * 1e6) AS BIGINT))
        |    AS BIGINT) AS m6, CAST(count(*) AS BIGINT) AS k
        |  FROM raw1),
        |s1 AS (SELECT b, sraw / (CAST(m6 AS DOUBLE) / 1e6 /
        |    CAST(k AS DOUBLE)) AS sv
        |  FROM raw1 CROSS JOIN nrm1),
        |den2 AS (
        |  SELECT g.i, CAST(sum(CAST(round(CAST(g.g AS DOUBLE) /
        |    (si.sv + sj.sv) * 1e9) AS BIGINT)) AS BIGINT) AS den9
        |  FROM games g
        |  JOIN s1 si ON si.b = g.i JOIN s1 sj ON sj.b = g.j
        |  GROUP BY 1),
        |raw2 AS (
        |  SELECT w.b, CAST(w.wi AS DOUBLE) /
        |    (CAST(d.den9 AS DOUBLE) / 1e9) AS sraw
        |  FROM den2 d JOIN wins w ON w.b = d.i),
        |nrm2 AS (SELECT CAST(sum(CAST(round(sraw * 1e6) AS BIGINT))
        |    AS BIGINT) AS m6, CAST(count(*) AS BIGINT) AS k
        |  FROM raw2),
        |s2 AS (SELECT b, sraw / (CAST(m6 AS DOUBLE) / 1e6 /
        |    CAST(k AS DOUBLE)) AS sv
        |  FROM raw2 CROSS JOIN nrm2)
        |SELECT s2.b AS brand, round(s2.sv, 6) AS strength, w.wi AS wins
        |FROM s2 JOIN wins w ON w.b = s2.b
        |ORDER BY strength DESC, brand LIMIT 10""".stripMargin,
    "q_katz" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
        |    CAST(s.s_nationkey AS BIGINT) AS dst
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |v1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS x1
        |       FROM e GROUP BY 1),
        |v2 AS (SELECT e.dst AS node, CAST(sum(v1.x1) AS BIGINT) AS x2
        |       FROM e JOIN v1 ON v1.node = e.src GROUP BY 1),
        |v3 AS (SELECT e.dst AS node, CAST(sum(v2.x2) AS BIGINT) AS x3
        |       FROM e JOIN v2 ON v2.node = e.src GROUP BY 1)
        |SELECT n.node,
        |  round(0.1 * coalesce(v1.x1, 0) + 0.01 * coalesce(v2.x2, 0) +
        |    0.001 * coalesce(v3.x3, 0), 6) AS katz
        |FROM nodes n
        |LEFT JOIN v1 ON v1.node = n.node
        |LEFT JOIN v2 ON v2.node = n.node
        |LEFT JOIN v3 ON v3.node = n.node
        |ORDER BY n.node""".stripMargin,
    "q_kmv_intersect" ->
      """WITH du AS (
        |  SELECT DISTINCT event_type AS t, user_id,
        |    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS h
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |sk AS (
        |  SELECT t, h FROM (
        |    SELECT t, h, row_number() OVER (PARTITION BY t
        |      ORDER BY h, user_id) AS rk
        |    FROM du)
        |  WHERE rk <= 256),
        |pert AS (
        |  SELECT t, CASE WHEN count(*) < 256
        |    THEN CAST(count(*) AS DOUBLE)
        |    ELSE 255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)
        |    END AS e
        |  FROM sk GROUP BY 1),
        |prof AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS tv,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS tc,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS tp
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')
        |  GROUP BY 1),
        |exact AS (
        |  SELECT CAST(sum(tv * tc) AS BIGINT) AS x_view_click,
        |    CAST(sum(tv * tp) AS BIGINT) AS x_view_purchase,
        |    CAST(sum(tc * tp) AS BIGINT) AS x_click_purchase
        |  FROM prof),
        |pairs AS (SELECT 'click' AS a, 'view' AS b
        |  UNION ALL SELECT 'purchase', 'view'
        |  UNION ALL SELECT 'click', 'purchase'),
        |merged AS (
        |  SELECT DISTINCT p.a, p.b, s.h
        |  FROM pairs p JOIN sk s ON s.t = p.a OR s.t = p.b),
        |uni AS (
        |  SELECT a, b, CASE WHEN count(*) < 256
        |    THEN CAST(count(*) AS DOUBLE)
        |    ELSE 255.0 * 1152921504606846976.0 / CAST(max(h) AS DOUBLE)
        |    END AS eu
        |  FROM (
        |    SELECT a, b, h, row_number() OVER (PARTITION BY a, b
        |      ORDER BY h) AS rk
        |    FROM merged)
        |  WHERE rk <= 256 GROUP BY 1, 2)
        |SELECT u.a, u.b, round(ea.e, 2) AS est_a, round(eb.e, 2) AS est_b,
        |  round(u.eu, 2) AS est_union,
        |  round(greatest(ea.e + eb.e - u.eu, 0.0), 2) AS est_intersect,
        |  CASE WHEN u.a = 'click' AND u.b = 'view' THEN x.x_view_click
        |    WHEN u.a = 'purchase' AND u.b = 'view' THEN x.x_view_purchase
        |    ELSE x.x_click_purchase END AS exact_intersect,
        |  round(abs(greatest(ea.e + eb.e - u.eu, 0.0) -
        |    CAST(CASE WHEN u.a = 'click' AND u.b = 'view'
        |        THEN x.x_view_click
        |      WHEN u.a = 'purchase' AND u.b = 'view'
        |        THEN x.x_view_purchase
        |      ELSE x.x_click_purchase END AS DOUBLE)) /
        |    CAST(CASE WHEN u.a = 'click' AND u.b = 'view'
        |        THEN x.x_view_click
        |      WHEN u.a = 'purchase' AND u.b = 'view'
        |        THEN x.x_view_purchase
        |      ELSE x.x_click_purchase END AS DOUBLE), 4) AS rel_err
        |FROM uni u
        |JOIN pert ea ON ea.t = u.a
        |JOIN pert eb ON eb.t = u.b
        |CROSS JOIN exact x
        |ORDER BY a, b""".stripMargin,
    "q_kmeans_lloyd" ->
      """WITH pe AS (
        |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM (SELECT vec_id, embedding,
        |          generate_subscripts(embedding, 1) AS i
        |        FROM embeddings)),
        |cent0 AS (
        |  SELECT vec_id AS cid, pos, x AS c FROM pe WHERE vec_id < 8),
        |d1 AS (
        |  SELECT pe.vec_id, c0.cid,
        |    CAST(sum(CAST(round((pe.x - c0.c) * (pe.x - c0.c) * 1e12)
        |      AS BIGINT)) AS BIGINT) AS d2
        |  FROM pe JOIN cent0 c0 USING (pos) GROUP BY 1, 2),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d2, cid) AS rk
        |    FROM d1)
        |  WHERE rk = 1),
        |cent1 AS (
        |  SELECT a1.cid, pe.pos, round(avg(pe.x), 4) + 0.0 AS c
        |  FROM pe JOIN a1 USING (vec_id) GROUP BY 1, 2),
        |d2f AS (
        |  SELECT pe.vec_id, c1.cid,
        |    CAST(sum(CAST(round((pe.x - c1.c) * (pe.x - c1.c) * 1e12)
        |      AS BIGINT)) AS BIGINT) AS d2
        |  FROM pe JOIN cent1 c1 USING (pos) GROUP BY 1, 2),
        |a2 AS (
        |  SELECT vec_id, cid, d2 FROM (
        |    SELECT vec_id, cid, d2,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d2, cid) AS rk
        |    FROM d2f)
        |  WHERE rk = 1)
        |SELECT CAST(cid AS BIGINT) AS cluster,
        |  CAST(count(*) AS BIGINT) AS n_members,
        |  round(CAST(sum(d2) AS DOUBLE) / 1e12, 4) AS inertia
        |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_weighted_kappa" ->
      """WITH per AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM per),
        |tiers AS (
        |  SELECT least(sum(CASE WHEN day < mid THEN sc ELSE 0 END)
        |      // 50000, 4) AS ta,
        |    least(sum(CASE WHEN day >= mid THEN sc ELSE 0 END)
        |      // 50000, 4) AS tb
        |  FROM per CROSS JOIN mid GROUP BY user_id),
        |grid AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS o
        |         FROM tiers GROUP BY 1, 2),
        |rowm AS (SELECT ta, CAST(sum(o) AS BIGINT) AS ra
        |         FROM grid GROUP BY 1),
        |colm AS (SELECT tb, CAST(sum(o) AS BIGINT) AS cb
        |         FROM grid GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM grid)
        |SELECT max(nn) AS n_users,
        |  round(1.0 - CAST(sum((g.ta - g.tb) * (g.ta - g.tb) * g.o)
        |      AS DOUBLE) /
        |    (CAST(sum(CAST((g.ta - g.tb) * (g.ta - g.tb) AS HUGEINT) *
        |      r.ra * c.cb) AS DOUBLE) / CAST(max(nn) AS DOUBLE)), 6)
        |    AS kappa_w
        |FROM grid g
        |JOIN rowm r ON r.ta = g.ta
        |JOIN colm c ON c.tb = g.tb
        |CROSS JOIN n""".stripMargin)
}
