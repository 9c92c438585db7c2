package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Structural audit over EVERY registered query's physical plan at
 * sf0.001: the two scale-killer shapes round 1 flagged — a true
 * cartesian product and a no-partition window (global sort through one
 * task) — must never reappear anywhere in the surface.
 */
class PlanAuditSpec extends SparkSpec {

  private def offenders(plan: SparkPlan): Seq[String] = {
    val cartesian = plan.collect { case c: CartesianProductExec => c }
      .map(_ => "CartesianProductExec")
    val globalWindow = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.map(_ => "unpartitioned WindowExec")
    cartesian ++ globalWindow
  }

  test("no query plans a cartesian product or an unpartitioned window") {
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.sparkPlan
      offenders(plan).map(o => s"$name: $o")
    }
    Queries.clearCache()
    assert(bad.isEmpty, s"scale-killer plan shapes found:\n${bad.mkString("\n")}")
  }
}
