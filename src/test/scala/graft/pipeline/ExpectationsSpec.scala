package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val frame = Seq(
    (Some(1L), Some("a"), Some(10L)),
    (Some(2L), Some("b"), Some(20L)),
    (Some(2L), None, Some(-5L)),      // dup id, null name, below range
    (None, Some("zz"), Some(2000L))   // null id, out-of-set, above range
  ).toDF("id", "name", "v")

  test("violation counts are exact and checks evaluate independently") {
    val out = Expectations.run(frame, Seq(
      Expectations.complete("id"),
      Expectations.unique("id"),
      Expectations.complete("name"),
      Expectations.inSet("name", Seq("a", "b")),
      Expectations.inRange("v", 0L, 100L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(("complete", "id")) == (1L, false))
    assert(out(("unique", "id")) == (1L, false))  // one surplus row for id 2
    assert(out(("complete", "name")) == (1L, false))
    // null name violates in_set too (predicate null => violation),
    // plus the out-of-set 'zz'
    assert(out(("in_set", "name")) == (2L, false))
    assert(out(("in_range", "v")) == (2L, false))
  }

  test("allowed thresholds are row budgets; clean data passes") {
    val out = Expectations.run(frame, Seq(
      Expectations.complete("id", allowed = 1L),
      Expectations.inRange("v", 0L, 100L, allowed = 2L)))
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(out("complete") && out("in_range"))
    val clean = Expectations.run(frame.filter(col("id").isNotNull && col("name") === "a"),
      Seq(Expectations.complete("id"), Expectations.unique("id"), Expectations.inRange("v", 0L, 100L)))
      .collect()
    assert(clean.forall(_.getBoolean(4)))
  }

  test("the whole suite is ONE scan of the data") {
    val plan = Expectations.run(frame, Seq(
      Expectations.complete("id"), Expectations.unique("id"), Expectations.complete("name"),
      Expectations.inRange("v", 0L, 100L)))
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").count(l =>
      l.contains("LocalTableScan") || l.contains("Scan "))
    assert(scans == 1, s"expected one scan, plan:\n$plan")
  }

  test("gate refuses a violating batch with the report; passes clean") {
    val err = intercept[IllegalArgumentException] {
      Expectations.gate(frame, Seq(Expectations.complete("id")))
    }
    assert(err.getMessage.contains("complete(id): 1 violations"))
    val clean = frame.filter(col("id").isNotNull && col("name").isNotNull)
    assert(Expectations.gate(clean,
      Seq(Expectations.complete("id"))).count() == clean.count())
  }

  test("empty check list and empty frame behave sanely") {
    intercept[IllegalArgumentException] { Expectations.run(frame, Nil) }
    val empty = Expectations.run(frame.limit(0), Seq(Expectations.complete("id"), Expectations.unique("id")))
      .collect()
    assert(empty.length == 2 && empty.forall(_.getBoolean(4)),
      "an empty batch has zero violations")
  }
}
