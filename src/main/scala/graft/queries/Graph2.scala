package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 graph batch on the part co-purchase graph
  * ([[GraphOps.coPurchaseEdges]]): community detection by synchronous
  * label propagation and Weisfeiler–Lehman color refinement — the two
  * standard "what communities / what structure" passes a pipeline runs
  * after the centrality family (pagerank/kcore/triangles already in
  * GraphOps).
  *
  * Both operators follow the house iteration discipline (SCALING.md
  * round-5 lesson): the corpus-scale work is the ONE distinct-edge
  * derivation (cached); every round is a keyed equi-join + aggregate on
  * the (node,·) frame, eagerly checkpointed so the final plan reads
  * materialized rounds instead of re-deriving the join tree
  * combinatorially. Fixed round counts (no data-dependent convergence
  * loop) keep the plan a static DAG; every tie breaks on an explicit
  * deterministic key, so two engines (and two replicas) derive identical
  * labels.
  */
object Graph2 {
  private type Q = (SparkSession, String) => DataFrame

  /** Symmetrized adjacency (node, nbr) of the co-purchase graph. */
  private def adjacency(s: SparkSession, d: String): DataFrame = {
    val e = GraphOps.coPurchaseEdges(s, d)
    e.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
  }

  private def bcastNodeCap: Long = GraphOps.bcastNodeCap

  val queries: Map[String, Q] = Map(
    // ---- synchronous label propagation (3 rounds, Raghavan et al.
    // shape): init label = node id; each round every node adopts the
    // most frequent label among its NEIGHBORS (count desc, label asc —
    // the deterministic tie-break that replaces the classic random
    // one). Scale shape: each round is one equi-join on the adjacency +
    // one (node, label) aggregate — keyed shuffles that partition with
    // the data; labels never fan out beyond degree. Output: the 10
    // largest communities after round 3.
    "q_label_prop" -> ((s, d) => {
      // r14: adjacency cached HASH-PARTITIONED BY node. The per-round
      // label frame is |V| rows (parts), ~30x smaller than the
      // adjacency — broadcast it (size-gated on the measured vertex
      // count, keyed-join fallback above the cap). A broadcast join
      // preserves the streamed side's partitioning, and
      // HashPartitioning(node) satisfies ClusteredDistribution for BOTH
      // per-round aggregates (groupBy(node,lbl) and groupBy(node)), so
      // each round runs with ZERO exchanges — r13 paid 3 per round
      // (adj-by-nbr, by-(node,lbl), by-node); guide §2.4/§3.1.
      val adj = graft.CacheScope.cached(
        adjacency(s, d).repartition(col("node")))
      val l0 = adj.select("node").distinct()
        .select(col("node"), col("node").as("lbl"))
      val bcastV = l0.count() <= bcastNodeCap
      // Per-node argmax (cnt desc, lbl asc) as min(struct(-cnt, lbl)) —
      // r13: this was a row_number window over the full (node, lbl)
      // count frame, i.e. an extra exchange + SORT of every row per
      // round; min(struct) is a plain hash aggregate with map-side
      // partial combine and the identical deterministic tie-break
      // (guide §2.3 "aggregate before you shuffle", §2.4). Values are
      // unchanged: lexicographic struct min = (max cnt, then min lbl).
      def round(lbl: DataFrame): DataFrame = {
        val lf = lbl.toDF("nbr", "lbl")
        adj.join(if (bcastV) broadcast(lf) else lf, "nbr")
          .groupBy("node", "lbl").agg(count(lit(1)).as("cnt"))
          .groupBy("node")
          .agg(min(struct(negate(col("cnt")).as("nc"),
            col("lbl").as("lbl"))).as("m"))
          .select(col("node"), col("m.lbl").as("lbl"))
          .localCheckpoint(true)
      }
      val l3 = round(round(round(l0)))
      l3.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("size"))
        .orderBy(col("size").desc, col("community").asc)
        .limit(10)
    }),

    // ---- SimRank (Jeh & Widom) on the event-type transition graph —
    // "two event types are similar if similar types lead to them":
    // s(a,b) = C/(|I(a)||I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j), C = 0.8,
    // two iterations from s₀ = identity, on the DISTINCT directed
    // transition edges (q_markov's per-user lag derivation; self-loops
    // excluded as in the classic formulation). The vertex set is the
    // event-type alphabet — structurally bounded like the nation graphs
    // — so the pair frame is ≤ |T|²; scores live in nano-units
    // (round(s·10⁹) → BIGINT) so every Σ s(i,j) is an exact integer
    // sum. Scale shape: the corpus contributes ONE lag + distinct pass;
    // each iteration is two keyed equi-joins on the bounded pair frame.
    "q_simrank" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val edges = graft.CacheScope.cached(graft.Tables.events(s, d)
        .withColumn("from_t", lag("event_type", 1).over(w))
        .filter(col("from_t").isNotNull &&
          col("from_t") =!= col("event_type"))
        .select(col("from_t").as("src"), col("event_type").as("dst"))
        .distinct())
      val nodes = edges.select(col("src").as("t"))
        .unionAll(edges.select(col("dst").as("t"))).distinct()
        .localCheckpoint(true)
      val ideg = edges.groupBy(col("dst").as("t"))
        .agg(count(lit(1)).as("ideg"))
      val s0 = nodes.toDF("a").crossJoin(broadcast(nodes.toDF("b")))
        .select(col("a"), col("b"),
          when(col("a") === col("b"), 1000000000L).otherwise(0L).as("s9"))
        .localCheckpoint(true)
      def iterate(prev: DataFrame): DataFrame = {
        val num = edges.toDF("i", "a")
          .join(prev.toDF("i", "j", "s9"), "i")
          .join(edges.toDF("j", "b"), "j")
          .groupBy("a", "b").agg(sum("s9").as("num9"))
        s0.select("a", "b")
          .join(num, Seq("a", "b"), "left")
          .join(broadcast(ideg.toDF("a", "ida")), Seq("a"), "left")
          .join(broadcast(ideg.toDF("b", "idb")), Seq("b"), "left")
          .select(col("a"), col("b"),
            when(col("a") === col("b"), 1000000000L)
              // a node with no in-neighbors has s = 0 to everything (the
              // 0/0 of the formula is defined away, as in the paper)
              .when(col("ida").isNull || col("idb").isNull, 0L)
              .otherwise(round(lit(0.8) *
                coalesce(col("num9"), lit(0L)).cast("double") /
                (col("ida") * col("idb"))).cast("long"))
              .as("s9"))
          .localCheckpoint(true)
      }
      val s2 = iterate(iterate(s0))
      s2.filter(col("a") < col("b") && col("s9") > 0)
        .select(col("a").as("type_a"), col("b").as("type_b"),
          round(col("s9") / 1e9, 6).as("simrank"))
        .orderBy("type_a", "type_b")
    }),

    // ---- Weisfeiler–Lehman color refinement (2 rounds): color₀ =
    // degree; colorᵣ₊₁ = md5(own color ‖ sorted neighbor colors) — the
    // 1-WL graph fingerprint used for isomorphism screening and as the
    // feature map of WL graph kernels. The color alphabet refines
    // monotonically; the per-round distinct-color count (and largest
    // color class) is the structure signature. Determinism: neighbor
    // multisets serialize SORTED (lexicographic on the string form, the
    // same binary collation both engines use), md5 hex is identical
    // everywhere. Scale shape: a round is one adjacency join + one
    // degree-bounded list aggregate per node — the standard distributed
    // WL; heavy-degree nodes bound the list size, nothing is quadratic.
    "q_wl_colors" -> ((s, d) => {
      // r14: same zero-exchange-round shape as q_label_prop — adjacency
      // cached partitioned by node, |V|-row color frame broadcast into
      // both the neighbor join and the own-color join (size-gated,
      // keyed fallback above the cap); groupBy(node) then runs
      // in-partition with no exchange (guide §2.4/§3.1).
      val adj = graft.CacheScope.cached(
        adjacency(s, d).repartition(col("node")))
      val c0 = adj.groupBy("node").agg(count(lit(1)).as("dg"))
        .select(col("node"), col("dg").cast("string").as("c"))
        .localCheckpoint(true)
      val bcastV = c0.count() <= bcastNodeCap
      def bc(df: DataFrame): DataFrame =
        if (bcastV) broadcast(df) else df
      def refine(c: DataFrame): DataFrame =
        adj.join(bc(c.toDF("nbr", "nc")), "nbr")
          .groupBy("node")
          .agg(concat_ws(",", sort_array(collect_list(col("nc"))))
            .as("ns"))
          .join(bc(c), "node")
          .select(col("node"),
            md5(concat(col("c"), lit("|"), col("ns"))).as("c"))
          .localCheckpoint(true)
      val c1 = refine(c0)
      val c2 = refine(c1)
      def summarize(c: DataFrame, r: Int): DataFrame =
        c.groupBy("c").agg(count(lit(1)).as("sz"))
          .agg(lit(r).as("round"), count(lit(1)).as("n_colors"),
            max("sz").as("largest_class"))
      summarize(c0, 0).unionByName(summarize(c1, 1))
        .unionByName(summarize(c2, 2)).orderBy("round")
    }))

  /** Bench-only production form of q_wl_colors (VERDICT r10 "next round"
    * #5). The gate query's neighbor-multiset serialization
    * (`concat_ws(",", sort_array(collect_list(nc)))`) builds a per-node
    * string proportional to degree — a non-commutative holistic aggregate
    * with no map-side combine, so at 100× one celebrity node makes one
    * hot string/row on one task. This twin replaces it with a COMMUTATIVE
    * hash-combine: each neighbor color contributes its md5 60-bit prefix
    * and the multiset is summarized as (count, Σ prefix) — partial
    * (map-side) aggregation applies, every shuffle row is constant-size,
    * and a skewed node's combine spreads across partitions. Two multisets
    * collide only on a 60-bit-sum + count collision (≪ md5's own rate),
    * so the refinement trajectory — and the (n_colors, largest_class)
    * summary this query returns — matches the exact form's with
    * overwhelming probability; the exact sorted-concat form stays the
    * correctness-gate query. Σ routes decimal(38,0): degree·2⁶⁰ wraps
    * i64 above ~16 neighbors. */
  val benchForm: Map[String, Q] = Map(
    "q_wl_colors" -> ((s, d) => {
      // r14: zero-exchange rounds — see the gate form above (adjacency
      // partitioned by node, size-gated |V|-row broadcast joins).
      val adj = graft.CacheScope.cached(
        adjacency(s, d).repartition(col("node")))
      val c0 = adj.groupBy("node").agg(count(lit(1)).as("dg"))
        .select(col("node"), col("dg").cast("string").as("c"))
        .localCheckpoint(true)
      val bcastV = c0.count() <= bcastNodeCap
      def bc(df: DataFrame): DataFrame =
        if (bcastV) broadcast(df) else df
      // r13: the neighbor-color hash used to be computed PER EDGE ROW
      // (md5+conv+decimal on every adjacency row, 2|E| evaluations per
      // round); hoisting it onto the |V|-row color frame before the
      // join evaluates it once per node instead (guide §1.2 step 2 —
      // per-task work; the sum of identical per-neighbor terms is
      // bit-identical either way).
      def refine(c: DataFrame): DataFrame =
        adj.join(bc(c.select(col("node").as("nbr"),
            conv(substring(md5(col("c")), 1, 15), 16, 10)
              .cast("decimal(38,0)").as("hc"))), "nbr")
          .groupBy("node")
          .agg(count(lit(1)).as("hn"), sum(col("hc")).as("hsum"))
          .join(bc(c), "node")
          .select(col("node"),
            md5(concat_ws("|", col("c"), col("hn").cast("string"),
              col("hsum").cast("string"))).as("c"))
          .localCheckpoint(true)
      val c1 = refine(c0)
      val c2 = refine(c1)
      def summarize(c: DataFrame, r: Int): DataFrame =
        c.groupBy("c").agg(count(lit(1)).as("sz"))
          .agg(lit(r).as("round"), count(lit(1)).as("n_colors"),
            max("sz").as("largest_class"))
      summarize(c0, 0).unionByName(summarize(c1, 1))
        .unionByName(summarize(c2, 2)).orderBy("round")
    }))

  private val edgeSql =
    """e AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |adj AS MATERIALIZED (
      |  SELECT u AS node, v AS nbr FROM e
      |  UNION ALL SELECT v, u FROM e)""".stripMargin

  private def lpRound(i: Int): String = {
    val prev = if (i == 1) "l0" else s"l${i - 1}"
    s"""l$i AS MATERIALIZED (
       |  SELECT node, lbl FROM (
       |    SELECT a.node, l.lbl, count(*) AS cnt,
       |      row_number() OVER (PARTITION BY a.node
       |        ORDER BY count(*) DESC, l.lbl ASC) AS rn
       |    FROM adj a JOIN $prev l ON l.node = a.nbr
       |    GROUP BY a.node, l.lbl) q
       |  WHERE rn = 1)""".stripMargin
  }

  private def wlRound(i: Int): String = {
    val prev = if (i == 1) "c0" else s"c${i - 1}"
    s"""c$i AS MATERIALIZED (
       |  SELECT a.node,
       |    md5(own.c || '|' || string_agg(n.c, ',' ORDER BY n.c)) AS c
       |  FROM adj a JOIN $prev n ON n.node = a.nbr
       |  JOIN $prev own ON own.node = a.node
       |  GROUP BY a.node, own.c)""".stripMargin
  }

  /** One unrolled SimRank iteration for the q_simrank oracle. */
  private def srIter(i: Int): String = {
    val prev = if (i == 1) "sr0" else s"sr${i - 1}"
    s"""sr$i AS MATERIALIZED (
       |  SELECT p.a, p.b,
       |    CASE WHEN p.a = p.b THEN 1000000000
       |      WHEN da.ideg IS NULL OR db.ideg IS NULL THEN 0
       |      ELSE CAST(round(0.8 *
       |        CAST(coalesce(num.num9, 0) AS DOUBLE) /
       |        (da.ideg * db.ideg)) AS BIGINT) END AS s9
       |  FROM pairs p
       |  LEFT JOIN (
       |    SELECT ea.dst AS a, eb.dst AS b,
       |      CAST(sum(sp.s9) AS BIGINT) AS num9
       |    FROM tedges ea JOIN $prev sp ON sp.a = ea.src
       |    JOIN tedges eb ON eb.src = sp.b
       |    GROUP BY 1, 2) num ON num.a = p.a AND num.b = p.b
       |  LEFT JOIN ideg da ON da.t = p.a
       |  LEFT JOIN ideg db ON db.t = p.b)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_simrank" ->
      s"""WITH x AS (
         |  SELECT event_type,
         |    lag(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS from_t
         |  FROM events),
         |tedges AS MATERIALIZED (
         |  SELECT DISTINCT from_t AS src, event_type AS dst
         |  FROM x WHERE from_t IS NOT NULL AND from_t <> event_type),
         |nodes AS (
         |  SELECT DISTINCT t FROM (
         |    SELECT src AS t FROM tedges
         |    UNION ALL SELECT dst FROM tedges) q),
         |ideg AS (
         |  SELECT dst AS t, CAST(count(*) AS BIGINT) AS ideg
         |  FROM tedges GROUP BY 1),
         |pairs AS (SELECT na.t AS a, nb.t AS b
         |          FROM nodes na CROSS JOIN nodes nb),
         |sr0 AS (
         |  SELECT a, b,
         |    CASE WHEN a = b THEN 1000000000 ELSE 0 END AS s9
         |  FROM pairs),
         |${srIter(1)},
         |${srIter(2)}
         |SELECT a AS type_a, b AS type_b,
         |  round(s9 / 1e9, 6) AS simrank
         |FROM sr2 WHERE a < b AND s9 > 0
         |ORDER BY type_a, type_b""".stripMargin,
    "q_label_prop" ->
      s"""WITH $edgeSql,
         |l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
         |${lpRound(1)},
         |${lpRound(2)},
         |${lpRound(3)}
         |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS size
         |FROM l3 GROUP BY 1
         |ORDER BY size DESC, community ASC LIMIT 10""".stripMargin,
    "q_wl_colors" ->
      s"""WITH $edgeSql,
         |c0 AS MATERIALIZED (
         |  SELECT node, CAST(CAST(count(*) AS BIGINT) AS VARCHAR) AS c
         |  FROM adj GROUP BY node),
         |${wlRound(1)},
         |${wlRound(2)},
         |s0 AS (SELECT 0 AS round, CAST(count(*) AS BIGINT) AS n_colors,
         |    CAST(max(sz) AS BIGINT) AS largest_class
         |  FROM (SELECT c, CAST(count(*) AS BIGINT) AS sz FROM c0
         |        GROUP BY c) q),
         |s1 AS (SELECT 1 AS round, CAST(count(*) AS BIGINT) AS n_colors,
         |    CAST(max(sz) AS BIGINT) AS largest_class
         |  FROM (SELECT c, CAST(count(*) AS BIGINT) AS sz FROM c1
         |        GROUP BY c) q),
         |s2 AS (SELECT 2 AS round, CAST(count(*) AS BIGINT) AS n_colors,
         |    CAST(max(sz) AS BIGINT) AS largest_class
         |  FROM (SELECT c, CAST(count(*) AS BIGINT) AS sz FROM c2
         |        GROUP BY c) q)
         |SELECT * FROM s0 UNION ALL SELECT * FROM s1
         |UNION ALL SELECT * FROM s2 ORDER BY round""".stripMargin)
}
