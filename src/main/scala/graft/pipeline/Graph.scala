package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed graph analytics over edge DataFrames — the weighted
 * PageRank power iteration a training-data pipeline uses to score
 * domains/pages by link structure (reference scope has no graph
 * operators; this is part of the additive large-scale surface).
 *
 * Design for 100 TB: the graph never leaves the cluster. Each
 * iteration is one join of the normalized edge list against the
 * current rank vector plus one partial-aggregated groupBy on dst —
 * both hash-partitioned on the join key, so iterating reuses the
 * same shuffle partitioning. Rank state is O(|V|) rows, edges are
 * streamed from their source; nothing is collected to the driver
 * (the only driver scalar is |V| via count()). For deep iteration
 * counts, callers should checkpoint every ~10 rounds to truncate
 * lineage; the bounded iteration counts used here don't need it.
 */
object Graph {

  /**
   * Weighted PageRank by power iteration.
   *
   * @param edges   (src, dst, weight) rows; weights need not be
   *                normalized — out-edge probabilities are derived as
   *                weight / sum(weight per src).
   * @param iters   fixed iteration count (deterministic, oracle-friendly;
   *                no convergence test, so both engines run the same
   *                arithmetic).
   * @param damping d in r' = (1-d)/N + d * sum_in p * r.
   *
   * Nodes with no out-edges leak their mass (no dangling-mass
   * redistribution) — the simplified recurrence both the operator and
   * the SQL oracle implement identically; ranks then sum to < 1 in
   * graphs with sinks, which is fine for relative ordering.
   */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    val outMass = edges.groupBy("src").agg(sum("weight").as("wout"))
    // materialize the normalized edge list and node set once
    // (localCheckpoint, the same iterative-dataframe pattern as
    // Dedup.connectedComponents): every iteration re-reads THESE, not
    // the upstream edge derivation, and rank lineage stays flat.
    val probs = edges.join(outMass, "src")
      .select(col("src"), col("dst"),
        (col("weight") / col("wout")).as("p"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("r"))
    for (_ <- 1 to iters) {
      val inflow = probs.join(ranks, probs("src") === ranks("node"))
        .groupBy(probs("dst").as("node"))
        .agg(sum(col("p") * col("r")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n)
            + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("r"))
    }
    ranks
  }
}
