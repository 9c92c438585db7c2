package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * expressions so plain SQL can use them on any cluster via
 * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
 *
 * For an already-running session (notebooks, tests), [[GraftExtensions.register]]
 * installs the same functions directly into the session's registry.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductDescriptor)
  }
}

object GraftExtensions {

  private val dotProductBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"graft_dot_product expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  private[plans] val dotProductDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
    dotProductBuilder)

  /** Install the functions into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_product", dotProductBuilder, "built-in")
}
