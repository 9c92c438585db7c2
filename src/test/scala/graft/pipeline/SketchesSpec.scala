package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: raw-estimate branch within HLL error at 100k") {
    // standard error ~ 1.04/sqrt(256) = 6.5%; assert 4 sigma
    val df = spark.range(100000).select(lit("g").as("g"),
      concat(lit("v"), col("id")).as("v"))
    val est = Sketches.hllDistinct(df, "g", "v")
      .collect().head.getLong(1)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.26, s"est $est")
  }

  test("hllDistinct: linear-counting branch is near-exact on small sets") {
    val df = spark.range(40).select(lit("g").as("g"),
      concat(lit("x"), col("id")).as("v"))
    val est = Sketches.hllDistinct(df, "g", "v").collect().head.getLong(1)
    assert(math.abs(est - 40L) <= 5, s"est $est")
  }

  test("hllDistinct: duplicates don't move the estimate (idempotent max)") {
    val base = spark.range(500).select(lit("g").as("g"),
      concat(lit("d"), col("id")).as("v"))
    val est1 = Sketches.hllDistinct(base, "g", "v").collect().head.getLong(1)
    val est2 = Sketches.hllDistinct(base.union(base).union(base), "g", "v")
      .collect().head.getLong(1)
    assert(est1 == est2)
  }

  test("count-min: estimates always dominate true counts, exact for " +
      "collision-free heavy hitter") {
    val toks = (Seq.fill(50)("hot") ++ (0 until 200).map("cold" + _))
      .toDF("tok")
    val counters = Sketches.countMinTable(toks, "tok")
    assert(counters.agg(sum("c")).collect().head.getLong(0)
      == 250L * Sketches.CmDepth)
    val cands = Seq(("hot", 50L)).toDF("tok", "n")
    val est = Sketches.countMinEstimate(counters, cands, "tok")
      .collect().head.getAs[Long]("est_n")
    assert(est >= 50L)
    // d=3 rows x 1024 cells over 201 distinct tokens: the min across
    // rows avoiding all collisions is overwhelmingly likely
    assert(est <= 55L, s"est $est")
  }
}
