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

  test("uniqueApprox agrees with exact unique within the HLL error " +
      "bound at 100k distinct, and keeps the suite at ONE scan with " +
      "no distinct-value Expand") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    // 100k distinct keys + 5k planted duplicate rows: exact surplus 5000
    val big = s.range(105000L)
      .select((col("id") % 100000L).cast("string").as("k"),
        (col("id") % 7).as("grp"))
    val exact = Expectations.run(big, Seq(Expectations.unique("k")))
      .collect().head.getLong(2)
    assert(exact == 5000L)
    val approx = Expectations.run(big,
        Seq(Expectations.uniqueApprox("k", allowed = 10000L)))
      .collect().head.getLong(2)
    // violations ~= 105000 - est(100k): HLL rel err ~1.04/sqrt(4096)
    // = 1.6% of 100k => |approx - exact| within ~3 sigma = 5k
    assert(math.abs(approx - exact) <= 5000L,
      s"approx $approx too far from exact $exact")
    // a 10-check suite mixing kinds stays one scan, and the approx
    // checks add NO Expand (the exact-unique Expand is the thing
    // uniqueApprox exists to avoid)
    val manyApprox = Expectations.run(big,
      (1 to 8).map(_ => Expectations.uniqueApprox("k", allowed = 10000L)) ++
        Seq(Expectations.complete("k"), Expectations.inRange("grp", 0L, 6L)))
    val plan = manyApprox.queryExecution.executedPlan.toString
    val scans = plan.split("\n").count(l =>
      l.contains("LocalTableScan") || l.contains("Scan ") || l.contains("Range ("))
    assert(scans == 1, s"expected one scan, plan:\n$plan")
    assert(!plan.contains("Expand"), s"approx suite must not Expand:\n$plan")
    assert(manyApprox.collect().forall(_.getBoolean(4)))
    // the gate accepts both kinds side by side
    assert(Expectations.gate(big, Seq(
      Expectations.unique("k", allowed = 5000L),
      Expectations.uniqueApprox("k", allowed = 10000L))).count() == 105000L)
    // a fully-unique column: clamped at 0 when the estimate overshoots,
    // within the error band otherwise
    val uniq = s.range(100000L).select(col("id").cast("string").as("k"))
    val v = Expectations.run(uniq,
        Seq(Expectations.uniqueApprox("k", allowed = 5000L)))
      .collect().head
    assert(v.getLong(2) >= 0L && v.getLong(2) <= 5000L && v.getBoolean(4))
  }

  test("empty check list and empty frame behave sanely") {
    intercept[IllegalArgumentException] { Expectations.run(frame, Nil) }
    val empty = Expectations.run(frame.limit(0), Seq(Expectations.complete("id"), Expectations.unique("id")))
      .collect()
    assert(empty.length == 2 && empty.forall(_.getBoolean(4)),
      "an empty batch has zero violations")
  }
}
