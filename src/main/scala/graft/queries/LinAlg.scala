package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Distributed linear-algebra operators over the embedding table — the
  * numeric core under PCA whitening / dimensionality reduction in a
  * large-scale embedding pipeline:
  *
  *  - q_pca_power: top principal component by power iteration. ONE
  *    corpus pass accumulates the sufficient statistics (n, Σx_i,
  *    Σx_i·x_j — the textbook one-pass covariance), every term an
  *    integer-scaled exact sum; the d×d covariance then lives in a
  *    64-row frame and three matvec+normalize rounds run as broadcast
  *    joins — the PageRank shape, nothing ever larger than d² leaves
  *    the corpus scan. Computed on the leading 8-dim slice so the
  *    DuckDB oracle (the same iteration unrolled as CTEs) stays
  *    readable; the plan is dimension-generic.
  *  - q_rand_proj: Johnson–Lindenstrauss random projection 64→8 dims
  *    with a deterministic Rademacher (±1) matrix derived from md5 —
  *    a PURE map-only pass (per-row zip_with·fold inside codegen, no
  *    joins, no aggregation), the shape that projects any corpus in
  *    one scan.
  *
  * Exactness: covariance inputs are micro-scaled integer sums (exact
  * under any partition order); the subsequent double arithmetic has an
  * identical operation order in both engines, and 8-term float sums
  * (matvec / projection) agree to ~1e-13 ≪ the 1e-6 rounding. */
object LinAlg {
  type Q = (SparkSession, String) => DataFrame

  /** PCA slice dimensionality and power-iteration rounds. */
  private val D = 8
  private val Iters = 3

  /** JL target dimensionality (input dim fixed at 64 by the fixture). */
  private val K = 8
  private val InDim = 64

  /** Deterministic Rademacher entry for flat index `idx` — the SAME
    * md5-parity formula the oracle writes in SQL. */
  private def rademacher(idx: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(idx.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % 2L).toInt * 2 - 1
  }

  /** One-pass covariance of the leading D dims as a (i, j, cij) frame —
    * the corpus-touching subplan of q_pca_power, exposed so PlanSpec can
    * audit it pre-checkpoint (the published query plan is a checkpoint
    * scan, the PageRank pattern). C_ij = E[x_i·x_j] − E[x_i]·E[x_j] from
    * exact integer-scaled sufficient statistics. */
  private[queries] def pcaCov(s: SparkSession, d: String): DataFrame = {
    val pairs = for { i <- 1 to D; j <- i to D } yield (i, j)
    val base = Tables.embeddings(s, d)
      .transform(Tables.fanoutReady)
      .select((1 to D).map(i =>
        element_at(col("embedding"), i).cast("double").as(s"x$i")): _*)
    // one-pass sufficient statistics: n, Σx_i, Σx_i·x_j (exact ints)
    val aggs =
      (1 to D).map(i => sum(round(col(s"x$i") * 1e6).cast(LongType))
        .as(s"s$i")) ++
      pairs.map { case (i, j) =>
        sum(round(col(s"x$i") * col(s"x$j") * 1e6).cast(LongType))
          .as(s"p${i}_$j") }
    val stats = base.agg(count(lit(1)).as("n"), aggs: _*)
    val nd = col("n").cast("double")
    stats.select(explode(array(
        (for { i <- 1 to D; j <- 1 to D } yield {
          val p = col(s"p${math.min(i, j)}_${math.max(i, j)}")
          struct(lit(i).as("i"), lit(j).as("j"),
            (p / 1e6 / nd -
              (col(s"s$i") / 1e6 / nd) * (col(s"s$j") / 1e6 / nd))
              .as("cij"))
        }): _*)).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.cij").as("cij"))
  }

  val queries: Map[String, Q] = Map(
    // ---- Top principal component via power iteration.
    "q_pca_power" -> ((s, d) => {
      // localCheckpoint: the covariance is 64 rows — materialize it once
      // so the iteration's lineage never re-runs the corpus-wide stats
      // agg (one corpus pass total, the iterative-DataFrame rule; see
      // ConnectedComponents/PageRank)
      val cov = pcaCov(s, d).localCheckpoint()
      // v0 = 1/sqrt(D) uniform; T rounds of w = C·v, v = w/‖w‖
      // (v localCheckpoints per round — d rows — so plan depth stays O(1))
      var v: DataFrame = s.range(1, D + 1)
        .select(col("id").cast("int").as("j"),
          (lit(1d) / sqrt(lit(D.toDouble))).as("vj"))
      var nrm: DataFrame = null
      for (_ <- 1 to Iters) {
        val w = cov.join(broadcast(v), Seq("j"))
          .groupBy("i").agg(sum(col("cij") * col("vj")).as("wi"))
        nrm = w.agg(sqrt(sum(col("wi") * col("wi"))).as("nrm"))
        v = w.crossJoin(broadcast(nrm))
          .select(col("i").as("j"), (col("wi") / col("nrm")).as("vj"))
          .localCheckpoint()
      }
      // sign convention: first component non-negative (both engines)
      val sgn = v.filter(col("j") === 1)
        .select(when(col("vj") < 0, -1d).otherwise(1d).as("sg"))
      v.crossJoin(broadcast(sgn)).crossJoin(broadcast(nrm))
        .select(col("j").as("dim"),
          round(col("vj") * col("sg"), 6).as("pc1"),
          round(col("nrm"), 6).as("lambda1"))
        .orderBy("dim")
    }),

    // ---- Johnson–Lindenstrauss Rademacher projection, map-only.
    "q_rand_proj" -> ((s, d) => {
      def yk(k: Int): Column = {
        val rk = array((0 until InDim).map(j =>
          lit(rademacher(j * K + k))): _*)
        aggregate(
          zip_with(col("embedding"), rk, (x, r) => x.cast("double") * r),
          lit(0d), (acc, t) => acc + t) / sqrt(lit(K.toDouble))
      }
      Tables.embeddings(s, d)
        .transform(Tables.fanoutReady)
        .select(col("vec_id"), explode(array((0 until K).map(k =>
          struct(lit(k).as("k"), round(yk(k), 6).as("y"))): _*)).as("e"))
        .select(col("vec_id"), col("e.k").as("k"), col("e.y").as("y"))
    }),

    // ---- kernel two-sample test (MMD², Gretton et al.) between the
    // lower and upper label halves of the embedding space — "did the
    // new batch's embedding DISTRIBUTION drift?", answered from
    // sufficient statistics only. Linear kernel: MMD² = ‖μ_A − μ_B‖²
    // (d sums). Quadratic kernel (x·y)²: MMD² = ‖M_A − M_B‖²_F with
    // M = E[xxᵀ] — the d² second-moment matrices, so the corpus
    // contributes ONE keyed self-join pass per vector (d² products,
    // map-side combined) and the test itself runs on two 64×64 frames.
    // That is THE form that exists at 100 TB: no pairwise kernel matrix
    // is ever built (the naive estimator is O(n²)). Exactness: every
    // per-row term quantizes to micro-units before the sum (the pcaCov
    // discipline), so the moment matrices are exact integers and both
    // engines derive identical doubles.
    "q_mmd_embed" -> ((s, d) => {
      val fl = graft.CacheScope.cached(Tables.embeddings(s, d)
        .transform(Tables.fanoutReady)
        .select(col("vec_id"), (col("label") < 5).as("ga"),
          posexplode(col("embedding")))
        .toDF("vec_id", "ga", "i", "x")
        .select(col("vec_id"), col("ga"), col("i"),
          col("x").cast("double").as("x")))
      val mu = fl.groupBy("ga", "i")
        .agg(sum(round(col("x") * 1e6).cast(LongType)).as("s6"),
          count(lit(1)).as("n"))
      def m(s6: Column, n: Column): Column =
        s6.cast("double") / 1e6 / n
      val muA = mu.filter(col("ga"))
        .select(col("i"), col("s6").as("sa"), col("n").as("na"))
      val muB = mu.filter(!col("ga"))
        .select(col("i"), col("s6").as("sb"), col("n").as("nb"))
      val lin = muA.join(muB, "i")
        .agg(sum(round((m(col("sa"), col("na")) - m(col("sb"), col("nb"))) *
            (m(col("sa"), col("na")) - m(col("sb"), col("nb"))) * 1e12)
          .cast(LongType)).as("l12"),
          max("na").as("n_a"), max("nb").as("n_b"))
      val mom = fl.toDF("vec_id", "ga", "i", "xi")
        .join(fl.toDF("vec_id", "gb", "j", "xj"), "vec_id")
        .groupBy(col("ga"), col("i"), col("j"))
        .agg(sum(round(col("xi") * col("xj") * 1e6).cast(LongType))
          .as("m6"), count(lit(1)).as("n"))
      val momA = mom.filter(col("ga"))
        .select(col("i"), col("j"), col("m6").as("ma6"), col("n").as("na"))
      val momB = mom.filter(!col("ga"))
        .select(col("i"), col("j"), col("m6").as("mb6"), col("n").as("nb"))
      val quad = momA.join(momB, Seq("i", "j"))
        .agg(sum(round((m(col("ma6"), col("na")) - m(col("mb6"), col("nb"))) *
            (m(col("ma6"), col("na")) - m(col("mb6"), col("nb"))) * 1e12)
          .cast(LongType)).as("q12"))
      lin.crossJoin(broadcast(quad))
        .select(col("n_a"), col("n_b"),
          round(col("l12") / 1e12, 6).as("mmd2_linear"),
          round(col("q12") / 1e12, 6).as("mmd2_quad"))
    })
  )

  val oracle: Map[String, String] = {
    val pairs = for { i <- 1 to D; j <- i to D } yield (i, j)
    val sumExprs =
      (1 to D).map(i =>
        s"sum(CAST(round(x$i * 1e6) AS BIGINT)) AS s$i") ++
      pairs.map { case (i, j) =>
        s"sum(CAST(round(x$i * x$j * 1e6) AS BIGINT)) AS p${i}_$j" }
    val covRows = (for { i <- 1 to D; j <- 1 to D } yield {
      val p = s"p${math.min(i, j)}_${math.max(i, j)}"
      s"SELECT $i AS i, $j AS j, CAST($p AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) - " +
        s"(CAST(s$i AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)) * " +
        s"(CAST(s$j AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)) AS cij FROM stats"
    }).mkString(" UNION ALL ")
    val iterCtes = (1 to Iters).map { t =>
      s"""w$t AS (SELECT i, sum(cij * vj) AS wi
         |  FROM cov JOIN v${t - 1} ON v${t - 1}.j = cov.j GROUP BY i),
         |n$t AS (SELECT sqrt(sum(wi * wi)) AS nrm FROM w$t),
         |v$t AS (SELECT i AS j, wi / nrm AS vj FROM w$t CROSS JOIN n$t)"""
        .stripMargin
    }.mkString(",\n")
    Map(
      "q_pca_power" ->
        s"""WITH base AS (
           |  SELECT ${(1 to D).map(i =>
                s"CAST(embedding[$i] AS DOUBLE) AS x$i").mkString(", ")}
           |  FROM embeddings),
           |stats AS (
           |  SELECT count(*) AS n, ${sumExprs.mkString(", ")} FROM base),
           |cov AS ($covRows),
           |v0 AS (SELECT CAST(j AS INTEGER) AS j,
           |  CAST(1 AS DOUBLE) / sqrt(CAST($D AS DOUBLE)) AS vj
           |  FROM generate_series(1, $D) t(j)),
           |$iterCtes,
           |sgn AS (SELECT CASE WHEN vj < 0 THEN CAST(-1 AS DOUBLE)
           |  ELSE CAST(1 AS DOUBLE) END AS sg FROM v$Iters WHERE j = 1)
           |SELECT v$Iters.j AS dim, round(vj * sg, 6) AS pc1,
           |  round(nrm, 6) AS lambda1
           |FROM v$Iters CROSS JOIN sgn CROSS JOIN n$Iters
           |ORDER BY dim""".stripMargin,
      "q_rand_proj" ->
        s"""WITH rmat AS (
           |  SELECT CAST(j AS INTEGER) AS j, CAST(k AS INTEGER) AS k,
           |    CAST(('0x' || substring(md5(CAST(j * $K + k AS VARCHAR)),
           |      1, 8)) AS BIGINT) % 2 * 2 - 1 AS r
           |  FROM generate_series(0, ${InDim - 1}) t(j),
           |       generate_series(0, ${K - 1}) t2(k)),
           |flat AS (
           |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
           |    unnest(embedding) AS x
           |  FROM embeddings)
           |SELECT vec_id, k,
           |  round(sum(CAST(x AS DOUBLE) * r) / sqrt(CAST($K AS DOUBLE)), 6)
           |    AS y
           |FROM flat JOIN rmat ON rmat.j = flat.j
           |GROUP BY vec_id, k""".stripMargin,
      "q_mmd_embed" ->
        """WITH flat AS (
          |  SELECT vec_id, label < 5 AS ga,
          |    generate_subscripts(embedding, 1) AS i,
          |    CAST(unnest(embedding) AS DOUBLE) AS x
          |  FROM embeddings),
          |mu AS (
          |  SELECT ga, i,
          |    CAST(sum(CAST(round(x * 1e6) AS BIGINT)) AS BIGINT) AS s6,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM flat GROUP BY 1, 2),
          |lin AS (
          |  SELECT CAST(sum(CAST(round(
          |      (CAST(a.s6 AS DOUBLE) / 1e6 / a.n -
          |       CAST(b.s6 AS DOUBLE) / 1e6 / b.n) *
          |      (CAST(a.s6 AS DOUBLE) / 1e6 / a.n -
          |       CAST(b.s6 AS DOUBLE) / 1e6 / b.n) * 1e12)
          |      AS BIGINT)) AS BIGINT) AS l12,
          |    CAST(max(a.n) AS BIGINT) AS n_a,
          |    CAST(max(b.n) AS BIGINT) AS n_b
          |  FROM mu a JOIN mu b ON a.i = b.i AND a.ga AND NOT b.ga),
          |mom AS (
          |  SELECT a.ga, a.i, b.i AS j,
          |    CAST(sum(CAST(round(a.x * b.x * 1e6) AS BIGINT)) AS BIGINT)
          |      AS m6,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM flat a JOIN flat b ON a.vec_id = b.vec_id
          |  GROUP BY 1, 2, 3),
          |quad AS (
          |  SELECT CAST(sum(CAST(round(
          |      (CAST(ma.m6 AS DOUBLE) / 1e6 / ma.n -
          |       CAST(mb.m6 AS DOUBLE) / 1e6 / mb.n) *
          |      (CAST(ma.m6 AS DOUBLE) / 1e6 / ma.n -
          |       CAST(mb.m6 AS DOUBLE) / 1e6 / mb.n) * 1e12)
          |      AS BIGINT)) AS BIGINT) AS q12
          |  FROM mom ma JOIN mom mb ON ma.i = mb.i AND ma.j = mb.j
          |    AND ma.ga AND NOT mb.ga)
          |SELECT n_a, n_b, round(l12 / 1e12, 6) AS mmd2_linear,
          |  round(q12 / 1e12, 6) AS mmd2_quad
          |FROM lin CROSS JOIN quad""".stripMargin
    )
  }
}
