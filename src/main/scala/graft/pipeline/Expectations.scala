package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality EXPECTATIONS over a frame — the Deequ/Great-Expectations
 * shape, engine-native: a declared list of checks (completeness,
 * uniqueness, range, set containment, custom predicates) evaluated in
 * ONE aggregation pass over the data.
 *
 * Design rules, all in service of the 100 TB gate check a pipeline
 * runs before promoting a batch:
 *  - every check's observation is an exact integer VIOLATION COUNT
 *    (null rows, duplicate surplus, out-of-range rows …) — never a
 *    float score, so the report is engine-reproducible bit-for-bit
 *    and thresholds are exact row budgets;
 *  - all violation counts evaluate in a single `agg` over one scan
 *    (uniqueness adds Spark's count_distinct expand within the same
 *    pass) — a 40-check suite costs one corpus read, not 40;
 *  - the report is one row per check: (check, column, violations,
 *    allowed, passed). `passed` is pure integer comparison. A gate
 *    caller folds `min(passed)`.
 */
object Expectations {

  /** One declared check: a named aggregate producing an exact integer
    * violation count, and the number of violations tolerated. */
  final case class Check(name: String, column: String,
      violations: Column, allowed: Long = 0L)

  /** The row must have a non-null value. */
  def complete(c: String, allowed: Long = 0L): Check =
    Check("complete", c,
      sum(when(col(c).isNull, 1L).otherwise(0L)), allowed)

  /** NON-NULL values must be unique (violations = non-null rows
    * beyond the first per value; nulls are [[complete]]'s job).
    * EXACT: count_distinct adds a distinct-aggregate Expand to the
    * suite's one scan — the right gate for key columns, but several
    * of these on high-cardinality columns multiply the scanned rows
    * by the number of distinct aggs and shuffle the full value space.
    * For wide profiling suites use [[uniqueApprox]]. */
  def unique(c: String, allowed: Long = 0L): Check =
    Check("unique", c, count(col(c)) - count_distinct(col(c)), allowed)

  /** [[unique]] with the distinct count estimated by the in-house HLL
    * aggregate ([[graft.functions.HllSketchAgg]] — 2^b bytes of state
    * per check, no Expand, no distinct-value shuffle): violations
    * ~= count - estimate, clamped at 0 (the estimate can exceed the
    * true count by its relative error ~1.04/sqrt(2^b), ~1.6 % at the
    * default b = 12). `allowed` is REQUIRED, not defaulted: it must
    * absorb that error band (a fully-unique column can still report
    * up to ~error*count false violations), so an approximate check
    * with a zero budget is a declaration mistake. Keep [[unique]] for
    * gate-critical key columns; this keeps a 40-check profiling suite
    * at one scan with constant state per check. */
  def uniqueApprox(c: String, allowed: Long, b: Int = 12): Check = {
    import org.apache.spark.sql.GraftSqlBridge
    val est = GraftSqlBridge.column(
      graft.functions.HllSketchAgg(
        GraftSqlBridge.expression(col(c).cast("string")), b)
        .toAggregateExpression())
    Check("unique_approx", c, greatest(count(col(c)) - est, lit(0L)),
      allowed)
  }

  /** Values must satisfy the predicate (nulls violate — declare
    * nullable columns with an explicit isNull escape). */
  def satisfies(name: String, c: String, pred: Column,
      allowed: Long = 0L): Check =
    Check(name, c,
      sum(when(pred.isNull || !pred, 1L).otherwise(0L)), allowed)

  /** Values must lie in [lo, hi]. */
  def inRange(c: String, lo: Long, hi: Long, allowed: Long = 0L): Check =
    satisfies("in_range", c, col(c) >= lo && col(c) <= hi, allowed)

  /** Values must belong to the given set. */
  def inSet(c: String, values: Seq[String], allowed: Long = 0L): Check =
    satisfies("in_set", c, col(c).isin(values.map(v => v: Any): _*),
      allowed)

  /** GATE a batch: evaluate the suite and fail loudly (with the full
    * per-check report in the message) unless every check passes —
    * compose in front of any sink. Unlike
    * [[graft.io.Versioned.appendChecked]]'s per-row CHECK constraints,
    * this admits AGGREGATE checks (uniqueness, violation budgets) —
    * the two gates stack: expectations on the batch, CHECKs in the
    * commit. Costs the one evaluation scan; the returned frame is the
    * input, untouched. */
  def gate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val report = run(df, checks).collect()
    val failed = report.filterNot(_.getBoolean(4))
    require(failed.isEmpty,
      "expectations gate refused the batch:\n" + failed.map(r =>
        s"  ${r.getString(0)}(${r.getString(1)}): " +
          s"${r.getLong(2)} violations > allowed ${r.getLong(3)}")
        .mkString("\n"))
    df
  }

  /**
   * Evaluate all checks in one aggregation pass. Returns
   * (check, column, violations, allowed, passed) — one row per check,
   * in declaration order via the check/column sort the caller applies.
   */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations, lit(0L)).cast("long").as(s"__c$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        col(s"__c$i").as("violations"), lit(c.allowed).as("allowed"),
        (col(s"__c$i") <= c.allowed).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
