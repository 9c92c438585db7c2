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

  test("pageRank: empty edge list fails loudly") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, Double)]
      .toDF("src", "dst", "weight")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(empty, iters = 1, damping = 0.85)
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("pageRank dangling: ranks sum to 1 with a sink, and match the " +
      "hand-unrolled full recurrence") {
    import spark.implicits._
    // a -> sink, b -> a: sink holds mass that must be redistributed.
    val edges = Seq(("a", "sink", 1.0), ("b", "a", 1.0))
      .toDF("src", "dst", "weight")
    val got = Graph.pageRank(edges, iters = 2, damping = 0.85,
        dangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
    // hand-unrolled: n=3, r0 = 1/3 each; sink and b are dangling?
    // sinks = nodes never appearing as src = {sink} only (b IS a src).
    val n = 3.0
    val d = 0.85
    def round(r: Map[String, Double]): Map[String, Double] = {
      val dm = r("sink")
      val base = (1.0 - d) / n + d * dm / n
      Map(
        "a" -> (base + d * r("b")),     // b -> a with p=1
        "sink" -> (base + d * r("a")),  // a -> sink with p=1
        "b" -> base)                    // no inflow
    }
    val r0 = Map("a" -> 1 / n, "b" -> 1 / n, "sink" -> 1 / n)
    val want = round(round(r0))
    for ((k, v) <- want)
      assert(math.abs(got(k) - v) < 1e-12, s"node $k: ${got(k)} vs $v")
  }

  test("pageRank dangling: no sinks means identical to the plain path") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
      ("b", "a", 1.0)).toDF("src", "dst", "weight")
    val plain = Graph.pageRank(edges, iters = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dang = Graph.pageRank(edges, iters = 3, damping = 0.85,
        dangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, v) <- plain) assert(math.abs(dang(k) - v) < 1e-12)
  }

  test("pageRank salted inflow: hub-heavy graph matches unsalted " +
      "within float tolerance") {
    import spark.implicits._
    // power-law shape: 200 spokes all pointing at one hub, hub points
    // back at spoke 0 — the dst-keyed agg funnels 200 rows into 'hub'.
    val spokes = (0 until 200).map(i => (s"s$i", "hub", 1.0 + i % 3))
    val edges = (spokes :+ (("hub", "s0", 1.0)))
      .toDF("src", "dst", "weight")
    val plain = Graph.pageRank(edges, iters = 3, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Graph.pageRank(edges, iters = 3, damping = 0.85,
        saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plain.keySet == salted.keySet)
    for ((k, v) <- plain)
      assert(math.abs(salted(k) - v) < 1e-9, s"node $k: ${salted(k)} vs $v")
  }

  test("pageRank tol: early stop on a converged graph, ranks identical " +
      "to the fixed-iteration run at the stopping round") {
    import spark.implicits._
    // the symmetric two-node cycle is its own fixed point: one round
    // should already satisfy any tolerance
    val cyc = Seq(("a", "b", 1.0), ("b", "a", 1.0))
      .toDF("src", "dst", "weight")
    val (_, ranCyc) = Graph.pageRankConverged(cyc, iters = 50,
      damping = 0.85, tol = 1e-9)
    assert(ranCyc == 1, s"fixed point must stop after round 1, ran $ranCyc")
    // a non-trivial graph: converges well before the 100-round cap
    val edges = Seq(
      ("hub", "x", 3.0), ("hub", "y", 1.0),
      ("x", "hub", 1.0), ("y", "hub", 1.0),
      ("y", "x", 1.0)).toDF("src", "dst", "weight")
    val (ranksDf, ran) = Graph.pageRankConverged(edges, iters = 100,
      damping = 0.85, tol = 1e-10)
    assert(ran < 100, s"must converge early, ran all $ran rounds")
    val got = ranksDf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // identical to the plain fixed-iteration run over the same rounds
    val fixed = Graph.pageRank(edges, iters = ran, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == fixed.keySet)
    for ((k, v) <- fixed)
      assert(math.abs(got(k) - v) < 1e-9, s"node $k: ${got(k)} vs $v")
    // the cap still binds when the tolerance is unreachable
    val (_, ranCap) = Graph.pageRankConverged(edges, iters = 3,
      damping = 0.85, tol = 0.0)
    assert(ranCap == 3)
  }

  test("personalized PageRank: hand-unrolled restart recurrence; no " +
      "teleport mass off the seeds; all-node seeds == uniform teleport") {
    import spark.implicits._
    // cycle a -> b -> c -> a plus d -> a; seed at a only
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
      ("d", "a", 1.0)).toDF("src", "dst", "weight")
    val one = Graph.pageRank(edges, iters = 1, damping = 0.85,
        seeds = Some(Seq("a").toDF("node")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // from uniform r0 = 0.25: inflow(a) = r(c) + r(d) = 0.5,
    // inflow(b) = inflow(c) = 0.25, d gets neither inflow nor teleport
    assert(math.abs(one("a") - (0.15 + 0.85 * 0.5)) < 1e-12)
    assert(math.abs(one("b") - 0.85 * 0.25) < 1e-12)
    assert(math.abs(one("c") - 0.85 * 0.25) < 1e-12)
    assert(one("d") == 0.0)
    assert(math.abs(one.values.sum - 1.0) < 1e-12) // no sinks: mass kept
    // deep run: the seed dominates (restart bias), d stays at 0
    val deep = Graph.pageRank(edges, iters = 30, damping = 0.85,
        seeds = Some(Seq("a").toDF("node")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(deep("a") == deep.values.max && deep("d") == 0.0)
    // seeding EVERY node is the uniform teleport (up to fp op order)
    val allSeeds = Seq("a", "b", "c", "d").toDF("node")
    val uni = Graph.pageRank(edges, iters = 5, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val seededAll = Graph.pageRank(edges, iters = 5, damping = 0.85,
        seeds = Some(allSeeds))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, v) <- uni)
      assert(math.abs(seededAll(k) - v) < 1e-12, s"node $k")
    // seeds outside the node set fail loudly
    assertThrows[IllegalArgumentException](Graph.pageRank(edges, 1, 0.85,
      seeds = Some(Seq("zz").toDF("node"))))
  }

  test("triangles: hand-computed counts; duplicates/orientation/self-" +
      "loops canonicalized; hub wedge work stays degree-bounded") {
    import spark.implicits._
    // K4 on {a,b,c,d} (4 triangles, each node in 3) plus a pendant
    // edge d-e (no triangle), fed with duplicates, reversed
    // orientations, and a self-loop — all must canonicalize away
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c",
      "b" -> "d", "c" -> "d")
    val noisy = (k4 ++ k4.map(_.swap) ++ Seq("d" -> "e", "e" -> "e"))
      .toDF("src", "dst")
    val got = Graph.triangles(noisy).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // triangle total: sum of per-node counts = 3 * #triangles = 12
    assert(got.values.sum == 12L)
    // a star (hub h with 50 spokes, no spoke-spoke edges) has no
    // triangles, and the degree orientation points every edge INTO
    // the hub — the hub's oriented out-degree is 0, so the wedge join
    // generates zero rows instead of 50*49 hub wedges
    val star = (0 until 50).map(i => (s"s$i", "h")).toDF("src", "dst")
    assert(Graph.triangles(star).count() == 0)
    // one closing edge -> exactly one triangle, all three corners
    val starPlus = star.unionByName(Seq("s0" -> "s1").toDF("src", "dst"))
    val t = Graph.triangles(starPlus).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t == Map("h" -> 1L, "s0" -> 1L, "s1" -> 1L))
  }
}
