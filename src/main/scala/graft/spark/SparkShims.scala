package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the package-private Column<->Expression converters (Spark 4 moved
  * Column to ColumnNode wrappers; ExpressionUtils is private[sql]). */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column -> Expression conversion. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that only the Dataset API's own
    * plan-construction path converts; a tree spliced into a LogicalPlan by
    * an analyzer rule bypasses that path, so the wrapper would survive to
    * execution and fail codegen (Unevaluable). This converts the node tree
    * to real catalyst expressions up front (UnresolvedFunction /
    * UnresolvedAttribute nodes, which analysis then resolves in place). */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Register a NATIVE expression builder as a session temp function — the
    * route `SparkSessionExtensions.injectFunction` takes at startup, available
    * post-startup (sessionState is private[sql], hence this shim). Unlike
    * `spark.udf.register`, the builder returns a Catalyst Expression, so the
    * function can take struct inputs as InternalRow (no Row conversion) and
    * declare its own result type from the arguments. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Block until all queued listener events are delivered (listenerBus is
    * private[spark]); lets measurement mains read listener-collected maxima
    * deterministically after a job completes. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
