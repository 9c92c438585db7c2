package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesMergeSpec extends SparkSpec {

  test("hll registers merge: shard-fold == full-corpus sketch exactly") {
    val a = spark.range(0, 6000).select(lit("g").as("g"),
      concat(lit("m"), col("id")).as("v"))
    val b = spark.range(4000, 10000).select(lit("g").as("g"),
      concat(lit("m"), col("id")).as("v")) // overlaps a: union != sum
    val full = Sketches.hllEstimate(
      Sketches.hllRegisters(a.union(b), "g", "v"))
      .collect().head.getLong(1)
    val merged = Sketches.hllEstimate(Sketches.hllMerge(
      Sketches.hllRegisters(a, "g", "v"),
      Sketches.hllRegisters(b, "g", "v")))
      .collect().head.getLong(1)
    assert(merged == full)
    // and the estimate tracks the true 10k distinct within HLL error
    assert(math.abs(merged - 10000.0) / 10000.0 < 0.26, s"est $merged")
  }
}
