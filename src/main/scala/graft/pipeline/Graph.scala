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
   * @param dangling when true, mass parked on sink nodes (no out-edges)
   *                is redistributed uniformly each iteration: r' =
   *                (1-d)/N + d*(danglingMass/N) + d*inflow, the full
   *                PageRank recurrence whose ranks sum to 1. The
   *                dangling mass is ONE scalar (a <=1-row agg) per
   *                iteration — the only driver traffic besides |V|.
   *                Default false keeps the simplified leaky recurrence
   *                (ranks sum to < 1 with sinks; fine for relative
   *                ordering, and exactly what the SQL oracle unrolls).
   * @param tol     when > 0, stop as soon as max |r' - r| < tol (early
   *                convergence; `iters` stays the hard cap) — one
   *                scalar agg per round, same driver-traffic shape as
   *                the dangling mass. 0 (default) = fixed iterations.
   * @param seeds   when set, PERSONALIZED PageRank (random walk with
   *                restart): teleport mass lands only on the given
   *                ("node") seed set, 1/|seeds| each — the
   *                topic-sensitive ranking that scores nodes by
   *                proximity to the seeds. Dangling mass (when
   *                enabled) restarts at the seeds likewise. Ranks
   *                still start uniform at 1/N (iteration count
   *                governs how far the restart bias has propagated —
   *                deterministic, oracle-friendly). None (default)
   *                keeps the uniform teleport with its original
   *                single-literal arithmetic, bit-identical to the
   *                existing oracles.
   * @param saltBuckets when > 1, the dst-keyed inflow aggregation runs
   *                TWO-STAGE (groupBy(dst, salt) then groupBy(dst),
   *                salt = hash(src) mod saltBuckets — the repo's
   *                saltedAgg pattern): a power-law in-degree hub no
   *                longer funnels its whole inflow through one reduce
   *                task. Summation ORDER changes, so floating-point
   *                results can differ in the last ulp from the
   *                single-stage plan — opt in for skewed graphs, keep
   *                the default 1 when bit-stable output matters.
   *
   * Lineage: probs/nodes are localCheckpointed once; the rank vector is
   * additionally localCheckpointed every 10 iterations (and every
   * iteration when `dangling` forces a per-round action anyway), so
   * deep iteration counts neither replay the full chain nor grow an
   * unbounded plan.
   */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
      dangling: Boolean = false, saltBuckets: Int = 1,
      tol: Double = 0.0, seeds: Option[DataFrame] = None): DataFrame =
    pageRankConverged(edges, iters, damping, dangling, saltBuckets, tol,
      seeds)._1

  /** [[pageRank]] plus the number of iterations actually run — the
    * production convergence mode. When `tol` > 0 the power iteration
    * STOPS EARLY once max |r' - r| < tol (one <=1-row scalar agg per
    * round, the same driver-traffic pattern as the dangling mass;
    * `iters` stays the hard cap). tol = 0 keeps the fixed-iteration
    * mode — deterministic and oracle-friendly, both engines run the
    * same arithmetic. */
  private[graft] def pageRankConverged(edges: DataFrame, iters: Int,
      damping: Double, dangling: Boolean = false, saltBuckets: Int = 1,
      tol: Double = 0.0, seeds: Option[DataFrame] = None): (DataFrame, Int) = {
    val outMass = edges.groupBy("src").agg(sum("weight").as("wout"))
    // materialize the normalized edge list and node set once
    // (localCheckpoint, the same iterative-dataframe pattern as
    // Dedup.connectedComponents): every iteration re-reads THESE, not
    // the upstream edge derivation, and rank lineage stays flat.
    val probs = edges.join(outMass, "src")
      .select(col("src"), col("dst"),
        (col("weight") / col("wout")).as("p"))
      .localCheckpoint()
    // node set from the MATERIALIZED probs, not the raw edges: probs
    // carries exactly the same (src, dst) pairs (the outMass join is a
    // same-keyed inner join that never drops an edge), so this reads
    // checkpointed blocks instead of re-running the caller's edge
    // derivation two more times (r18: the q_pagerank window+agg
    // upstream ran 4x per call)
    val nodes = probs.select(col("src").as("node"))
      .union(probs.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    // PERSONALIZED teleport (random walk with restart): mass restarts
    // only at the seed nodes — tele(node) = 1/|seeds| on the seed set,
    // 0 elsewhere; dangling mass (when enabled) restarts at the seeds
    // too. The uniform path below keeps its original single-literal
    // arithmetic, so seeds = None stays bit-identical to the oracles.
    val nodesTele = seeds.map { s =>
      val marked = nodes.join(
        s.select(col("node")).distinct(), Seq("node"), "left_semi")
        .localCheckpoint()
      val nSeeds = marked.count()
      require(nSeeds > 0, "pageRank seeds must intersect the node set")
      nodes.join(marked.withColumn("__isSeed", lit(1)),
          Seq("node"), "left")
        .select(col("node"),
          when(col("__isSeed").isNotNull, lit(1.0 / nSeeds))
            .otherwise(lit(0.0)).as("tele"))
        .localCheckpoint()
    }
    // sinks: nodes that never appear as a src (only needed for the
    // dangling-mass scalar; O(|V|) rows, checkpointed once)
    lazy val sinks = nodes.join(
      probs.select(col("src").as("node")).distinct(),
      Seq("node"), "left_anti").localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("r"))
    var ran = 0
    var converged = false
    for (i <- 1 to iters if !converged) {
      // dangling mass stays IN the plan as a 1-row broadcast scalar
      // (the lmScore CROSS JOIN shape) instead of a per-round
      // .head() driver action — one job per round (the checkpoint),
      // not two. The rank vector still checkpoints each round: the
      // scalar agg and the inflow join are two consumers of it, and
      // the per-round lineage must stay flat. Arithmetic below
      // replicates the former driver-literal op order exactly
      // ((damping * dm) / n, added after the teleport term), so ranks
      // are bit-identical to the collected-scalar plan.
      val dMassCol = if (!dangling) None else {
        ranks = ranks.localCheckpoint()
        Some(sinks.join(ranks, "node")
          .agg(coalesce(sum("r"), lit(0.0)).as("__dm")))
      }
      val contrib = probs.join(ranks, probs("src") === ranks("node"))
        .select(probs("dst").as("node"), probs("src").as("src"),
          (col("p") * col("r")).as("c"))
      val inflow =
        if (saltBuckets <= 1)
          contrib.groupBy("node").agg(sum("c").as("inflow"))
        else contrib
          .withColumn("__salt", pmod(hash(col("src")), lit(saltBuckets)))
          .groupBy("node", "__salt").agg(sum("c").as("c1"))
          .groupBy("node").agg(sum("c1").as("inflow"))
      def withDm(df: DataFrame): DataFrame = dMassCol match {
        case None => df.withColumn("__dm", lit(0.0))
        case Some(dm) => df.crossJoin(broadcast(dm))
      }
      val next = nodesTele match {
        case None =>
          withDm(nodes.join(inflow, Seq("node"), "left"))
            .select(col("node"),
              (lit((1.0 - damping) / n)
                + lit(damping) * col("__dm") / lit(n.toDouble)
                + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("r"))
        case Some(nt) =>
          withDm(nt.join(inflow, Seq("node"), "left"))
            .select(col("node"),
              (col("tele") * lit(1.0 - damping)
                + lit(damping) * col("__dm") * col("tele")
                + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("r"))
      }
      ran = i
      if (tol > 0.0) {
        // convergence test: one scalar agg joining consecutive rank
        // vectors on the node key (<=1 row to the driver per round) —
        // checkpoint the new vector first so the diff and the next
        // round's inflow join both read cached blocks
        val prev = ranks
        ranks = next.localCheckpoint()
        val maxDelta = ranks
          .join(prev.withColumnRenamed("r", "__r0"), "node")
          .agg(coalesce(max(abs(col("r") - col("__r0"))), lit(0.0)))
          .head().getDouble(0)
        converged = maxDelta < tol
      } else {
        ranks = next
        if (i % 10 == 0) ranks = ranks.localCheckpoint()
      }
    }
    (ranks, ran)
  }

  /**
   * Per-node TRIANGLE COUNTS via the degree-ordered wedge join
   * (Chiba–Nishizeki / "compact-forward" — the shape every
   * distributed triangle counter uses): orient each undirected edge
   * from its (degree, node)-smaller endpoint, enumerate wedges
   * u→v, u→w with v preceding w in the same total order, close them
   * against the oriented edge v→w. The orientation is the scale
   * lever: a node's oriented out-degree is bounded by O(√|E|)
   * regardless of its raw degree, so the wedge join never explodes on
   * hubs (a raw adjacency self-join would square the hottest degree).
   * Three shuffle joins on node keys, no window, no driver traffic.
   * Each triangle is enumerated exactly once and credits all three
   * corners. `edges`: (src, dst), any orientation/duplication — they
   * are canonicalized and distinct'd first.
   */
  def triangles(edges: DataFrame): DataFrame =
    trianglesOf(canonicalUndirected(edges))

  /** Canonical undirected edge set, MATERIALIZED once: the wedge
    * topology below consumes it many times (degree agg, orientation,
    * both wedge sides, the closing join) — left lazy, the dedup
    * `distinct` shuffle and the caller's edge derivation re-ran per
    * consumer (r18 profile: ~6x). */
  private def canonicalUndirected(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    .filter(col("a") =!= col("b") && col("a").isNotNull &&
      col("b").isNotNull)
    .distinct()
    .localCheckpoint()

  private def trianglesOf(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // total order: (degree, node) — explicit boolean (engine-neutral)
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // materialized: feeds both wedge sides AND the closing join
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    val e1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("d2"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
      .select(col("u"), col("v1"), col("v2"))
    val closed = wedges.join(
      oriented.select(col("u").as("v1"), col("v").as("v2")),
      Seq("v1", "v2"))
    closed
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
  }

  /** Local CLUSTERING COEFFICIENT per node: 2·tri / (deg·(deg−1)),
    * zero for degree-1 nodes — [[triangles]] plus one degree aggregate
    * over the same canonical edge set (shared scan shape; both are
    * node-keyed partial aggs). Returns (node, deg, tri, cc) with cc
    * rounded to 6 — tri and deg stay exact integers so the ratio is
    * the only float and both engines compute it from identical
    * operands. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    // ONE canonical edge set shared by the degree aggregate and the
    // triangle count (previously triangles(edges) re-derived and
    // re-distinct'd the whole set)
    val und = canonicalUndirected(edges)
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    deg.join(trianglesOf(und), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(lit(2.0) * coalesce(col("tri"), lit(0L))
            / (col("deg") * (col("deg") - 1)), 6)).as("cc"))
  }
}
