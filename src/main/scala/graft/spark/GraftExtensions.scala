package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Session extensions (`spark.sql.extensions=graft.spark.GraftExtensions`):
  * registers `jsonata(json, 'expr')` as a NATIVE function in the catalog —
  * unlike the UDF form, the expression string is extracted at plan time, the
  * AST compiles once on the driver, and determinism flags participate in
  * Catalyst optimization (constant folding is blocked for $random et al.,
  * SURVEY.md §4.1). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("jsonata"),
      new ExpressionInfo(classOf[JsonataExpression].getName, "jsonata"),
      (args: Seq[Expression]) => {
        if (args.length < 2 || args.length > 4)
          throw new IllegalArgumentException("jsonata(json, expr[, timeoutMs[, maxDepth]])")
        def litString(e: Expression, what: String): String = e match {
          case Literal(s: UTF8String, StringType) => s.toString
          case _ => throw new IllegalArgumentException(s"jsonata $what must be a string literal")
        }
        def litLong(e: Expression, dflt: Long): Long = e match {
          case Literal(v, _) => v.toString.toLong
          case _ => dflt
        }
        JsonataExpression(
          args.head,
          litString(args(1), "expression"),
          if (args.length > 2) litLong(args(2), 5000L) else 5000L,
          if (args.length > 3) litLong(args(3), 1000L).toInt else 1000)
      }))
  }
}
