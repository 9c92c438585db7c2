package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Structural audit over EVERY registered query's physical plan at
 * sf0.001: the scale-killer shapes past rounds flagged — a true
 * cartesian product, a no-partition window (global sort through one
 * task), and a forced broadcast of an unbounded aggregate (round 4's
 * `q_lm_score`: broadcasting a corpus token-frequency table OOMs at
 * 100 TB where the vocabulary is billions of tokens) — must never
 * reappear anywhere in the surface.
 */
class PlanAuditSpec extends SparkSpec {

  /**
   * Queries allowed to broadcast a frame that CONTAINS an aggregate,
   * because the broadcast side is constant-bounded by construction:
   * - q_kmeans / q_ann_ivf_kmeans: the k-means update joins the k x dim
   *   centroid table (k <= ~1024 by the coarse-codebook contract).
   * - q_heavy_mg / q_heavy_mg_grouped: the recount joins the
   *   Misra-Gries candidate table — <= k (= 64) rows per group by the
   *   aggregate's own state bound, x a bounded group count (1 global /
   *   the event-type enum), riding one (item, n) pair each.
   * - q_quality_trim: the broadcast side is the per-language p99 cut —
   *   ONE row per language (the quantile estimate collapses the ~2k
   *   bucket rows per group before the join).
   * - q_quality_trim_float: same shape over the SIGNED fixed-point
   *   sketch — the broadcast side is one (cut1_fx, cut99_fx) row per
   *   language.
   * Statically-planned broadcasts of non-hinted aggregates only happen
   * when the planner PROVES the side small, so anything else that shows
   * up here is a deliberate `broadcast()` hint that must justify
   * itself.
   */
  private val broadcastAggAllowlist = Set("q_kmeans", "q_ann_ivf_kmeans",
    "q_heavy_mg", "q_heavy_mg_grouped", "q_quality_trim",
    "q_quality_trim_float")

  private def offenders(name: String, plan: SparkPlan): Seq[String] = {
    val cartesian = plan.collect { case c: CartesianProductExec => c }
      .map(_ => "CartesianProductExec")
    val globalWindow = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.map(_ => "unpartitioned WindowExec")
    val broadcastAgg =
      if (broadcastAggAllowlist(name)) Nil
      else plan.collect {
        case b: BroadcastExchangeExec
            if b.child.collectFirst { case a: BaseAggregateExec => a }.nonEmpty =>
          "broadcast of an aggregate (unbounded at scale — drop the " +
            "hint and let AQE decide, or allowlist with a bound argument)"
      }
    cartesian ++ globalWindow ++ broadcastAgg
  }

  test("no query plans a cartesian product, an unpartitioned window, " +
      "or a forced broadcast of an unbounded aggregate") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.sparkPlan
      offenders(name, plan).map(o => s"$name: $o")
    }
    Queries.clearCache()
    assert(bad.isEmpty, s"scale-killer plan shapes found:\n${bad.mkString("\n")}")
  }
}
