package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("pageRank: hand-computed two-node cycle converges to symmetry") {
    import spark.implicits._
    // a <-> b with equal weights: ranks stay at 0.5 every iteration.
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0))
      .toDF("src", "dst", "weight")
    val ranks = Graph.pageRank(edges, iters = 5, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks("a") - 0.5) < 1e-12)
    assert(math.abs(ranks("b") - 0.5) < 1e-12)
  }

  test("pageRank: weighted star matches the unrolled recurrence") {
    import spark.implicits._
    // hub -> x (w=3), hub -> y (w=1); x -> hub, y -> hub.
    // p(hub->x)=0.75, p(hub->y)=0.25; x and y return all mass to hub.
    val edges = Seq(
      ("hub", "x", 3.0), ("hub", "y", 1.0),
      ("x", "hub", 1.0), ("y", "hub", 1.0)).toDF("src", "dst", "weight")
    val got = Graph.pageRank(edges, iters = 2, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Hand-unrolled: r0 = 1/3 each.
    val third = 1.0 / 3
    val base = 0.15 / 3
    val r1h = base + 0.85 * (third + third)          // x + y inflow
    val r1x = base + 0.85 * 0.75 * third
    val r1y = base + 0.85 * 0.25 * third
    val r2h = base + 0.85 * (r1x + r1y)
    val r2x = base + 0.85 * 0.75 * r1h
    val r2y = base + 0.85 * 0.25 * r1h
    assert(math.abs(got("hub") - r2h) < 1e-12)
    assert(math.abs(got("x") - r2x) < 1e-12)
    assert(math.abs(got("y") - r2y) < 1e-12)
  }

  test("pageRank: sink node leaks mass but keeps base rank") {
    import spark.implicits._
    val edges = Seq(("a", "sink", 1.0)).toDF("src", "dst", "weight")
    val got = Graph.pageRank(edges, iters = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 'a' receives no inflow: rank is the (1-d)/N floor after round 1.
    assert(math.abs(got("a") - 0.15 / 2) < 1e-12)
    assert(got("sink") > got("a"))
  }
}
