package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into `private[sql]` helpers so the engine's custom
 * Catalyst expressions (e.g. graft.functions.DotProduct) can be exposed
 * as `Column`s — the standard technique for Spark extension libraries
 * (the public API deliberately hides Expression plumbing).
 */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
