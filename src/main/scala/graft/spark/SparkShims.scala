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
