package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank by power iteration — the second iterative-graph operator class
  * (after [[ConnectedComponents]]): rank quality scoring over a link graph,
  * the web-corpus filtering signal a training pipeline derives before
  * sampling (high-rank pages are kept preferentially).
  *
  * Simplified formulation (no dangling-mass redistribution; nodes without
  * in-links settle at (1-d)/N): r'(v) = (1-d)/N + d * Σ_{u→v} r(u)/out(u).
  * Deterministic — pure double arithmetic, order-independent up to FP
  * rounding (callers round the published rank).
  *
  * Scale shape: out-degrees are computed once; each round is one
  * shuffle-join of edges⋈ranks on src plus one aggregation by dst —
  * the same per-round cost as connected components. Fixed iteration count
  * keeps the plan finite; lineage is truncated per round (localCheckpoint)
  * so Catalyst analysis stays O(1) per round instead of doubling.
  */
object PageRank {

  /** @param edges DataFrame with two long columns `src`, `dst` (directed,
    *              pre-deduplicated)
    * @param iters fixed power-iteration count (with `tol` set: hard cap)
    * @param d     damping factor
    * @param redistributeDangling when true, each round adds the standard
    *   dangling-mass term d·D/N (D = Σ rank over nodes with no out-edges)
    *   so rank mass is conserved — the correction real web graphs need
    *   (sink pages otherwise leak mass every round). The per-round cost is
    *   one extra tiny aggregate, broadcast to the update join.
    * @param checkpointEvery truncate lineage every N rounds (0 = pick by
    *   path). Unlike ConnectedComponents, the base recurrence references
    *   the previous round's frame ONCE, so the un-checkpointed plan grows
    *   LINEARLY and a handful of rounds can fuse into one job — each
    *   eager checkpoint is a blocking materialization (fixed scheduler
    *   cost that dominates small/aggregated graphs). The dangling term
    *   references ranks twice per round (plan doubles per skipped round),
    *   so that path checkpoints more often.
    * @param tol L1 convergence threshold (0 = off, the default: a FIXED
    *   round count keeps the whole run one lazily-composed plan with no
    *   mid-iteration actions, and is what the unrolled-CTE oracles
    *   verify). When tol > 0 the iteration stops early once
    *   Σ|r'−r| < tol — the ConnectedComponents-style data-dependent stop
    *   (its label-sum invariant, adapted to ranks: rank DELTAS shrink
    *   geometrically under power iteration, so a per-round L1 compare is
    *   the natural fixpoint test). Costs one self-join + 1-row aggregate
    *   per round and forces per-round materialization; on graphs that
    *   converge well before the cap, rounds saved dwarf that overhead.
    * @return DataFrame(node, rank) — unrounded doubles */
  def run(edges: DataFrame, iters: Int = 5, d: Double = 0.85,
          redistributeDangling: Boolean = false,
          checkpointEvery: Int = 0, tol: Double = 0.0): DataFrame =
    runCounted(edges, iters, d, redistributeDangling, checkpointEvery, tol)._1

  /** [[run]] plus the executed round count (observability + convergence
    * tests). */
  def runCounted(edges: DataFrame, iters: Int = 5, d: Double = 0.85,
                 redistributeDangling: Boolean = false,
                 checkpointEvery: Int = 0, tol: Double = 0.0)
      : (DataFrame, Int) = {
    val interval =
      if (checkpointEvery > 0) checkpointEvery
      else if (redistributeDangling) 2
      else 4
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count().toDouble
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      i += 1
      val contrib = e.join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      val updated = nodes.join(contrib, Seq("node"), "left")
      val next =
        if (!redistributeDangling)
          updated.select(col("node"),
            (lit((1 - d) / n) + lit(d) * coalesce(col("c"), lit(0.0)))
              .as("rank"))
        else {
          // dangling mass as a broadcast 1-row aggregate, NOT a driver-side
          // collect — the whole round stays one declarative plan
          val dangling = ranks
            .join(outdeg.withColumnRenamed("src", "node"), Seq("node"),
              "left_anti")
            .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
          updated.crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit((1 - d) / n) + lit(d) *
                (coalesce(col("c"), lit(0.0)) + col("dm") / n)).as("rank"))
        }
      if (tol > 0) {
        // the delta test needs this round's ranks twice (delta + next
        // round), so the checkpoint it forces is also lineage hygiene
        val mat = next.localCheckpoint(true)
        val delta = mat
          .join(ranks.select(col("node"), col("rank").as("prev")), "node")
          .agg(coalesce(sum(abs(col("rank") - col("prev"))), lit(0.0))
            .as("l1"))
          .head().getDouble(0)
        ranks = mat
        if (delta < tol) converged = true
      } else {
        // last rounds stay un-checkpointed: the caller's action fuses them
        // into one job instead of paying another blocking materialization
        ranks = if (i % interval == 0 && i < iters) next.localCheckpoint(true)
                else next
      }
    }
    (ranks, i)
  }
}
