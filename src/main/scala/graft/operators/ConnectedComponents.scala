package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by label propagation — the iterative-graph operator
  * class (dedup's final step: near-dup *pairs* → canonical *groups*, keep
  * one representative per component).
  *
  * Algorithm (large-star/small-star simplified to min-label propagation):
  * every node starts labeled with itself; each round, a node takes the
  * minimum label among itself and its neighbors; stop when no label
  * changes. Deterministic — no RNG, min is order-independent.
  *
  * Scale shape: per round, one shuffle (join edges⋈labels on the node key)
  * + one aggregation (min per node). Round count is the graph diameter in
  * the worst case; near-dup graphs are dense small clusters, so a handful
  * of rounds converge. For planet-scale graphs the alternating-star
  * optimization halves rounds; the round structure below is unchanged.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two long columns `src`, `dst` (undirected;
    *              each pair listed once is enough)
    * @param maxIters hard stop (safety; convergence usually comes first)
    * @return DataFrame(node, component) — component = min node id reachable */
  def run(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // localCheckpoint (NOT cache): iterative plans reference the previous
    // round's frame multiple times, so without lineage TRUNCATION the
    // logical plan doubles every round and Catalyst analysis time explodes
    // exponentially — the classic iterative-DataFrame pitfall. Checkpointing
    // materializes each round and restarts the plan from the stored blocks.
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .localCheckpoint(true)
    // seed labels with min(self, neighbors) — the same aggregation shape
    // the plain self-init would need for its distinct, but it fuses the
    // first propagation round into initialization (one fewer loop round)
    var labels = sym.groupBy(col("u").as("node"))
      .agg(min("v").as("mn"))
      .select(col("node"), least(col("node"), col("mn")).as("component"))
      .localCheckpoint(true)
    // convergence via the label-sum invariant: propagation is monotone
    // decreasing (labels only ever take a smaller value), so the rounds
    // have converged exactly when sum(component) stops falling. One narrow
    // scan+agg of the checkpointed frame per round — replaces the r1 form's
    // join-against-previous-labels + count.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast("decimal(38,0)"))).head()
        .getDecimal(0)) // null on an empty graph
        .map(_.stripTrailingZeros())
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var changed = true
    var iter = 0
    while (changed && iter < maxIters) {
      // candidate label per node: min of own and neighbors' labels
      val viaNeighbors = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .select(col("u").as("node"), col("component"))
      val propagated = labels.select("node", "component")
        .union(viaNeighbors)
        .groupBy("node")
        .agg(min("component").as("component"))
      // pointer jump: component ← component's own component. Min-label
      // alone needs diameter-many rounds (a 40-long dup chain = 40 rounds);
      // jumping halves remaining depth each round → O(log diameter).
      val parents = propagated
        .select(col("node").as("p_node"), col("component").as("p_comp"))
      val next = propagated
        .join(parents, propagated("component") === parents("p_node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("p_comp"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    labels
  }
}
