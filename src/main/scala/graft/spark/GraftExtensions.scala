package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Session extensions (`spark.sql.extensions=graft.spark.GraftExtensions`):
  * registers the jsonata surface as NATIVE functions in the catalog — unlike
  * the UDF forms, the expression string is extracted at plan time, the AST
  * compiles once on the driver, and determinism flags participate in Catalyst
  * optimization (constant folding is blocked for $random et al., SURVEY.md
  * §4.1):
  *
  *  - `jsonata(json, 'expr'[, timeoutMs[, maxDepth]])` → JSON string
  *  - `jsonata_row(struct, 'expr')` → JSON string (struct input, no to_json)
  *  - `jsonata_typed(struct, 'expr', 'a INT, b STRING')` → typed struct
  *    (direct codec both ways, zero JSON text ops)
  *  - `jsonata_variant(json_or_variant, 'expr')` → VariantType (binary
  *    dynamic format; input variants are walked directly, no text)
  *
  * The same builders are installable post-startup via
  * [[JsonataFunctions.registerSql]] / `registerNativeSql`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(s"$what must be a string literal")
  }
  private def litLong(e: Expression, dflt: Long): Long = e match {
    case Literal(v, _) => v.toString.toLong
    case _ => dflt
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("jsonata"),
      new ExpressionInfo(classOf[JsonataExpression].getName, "jsonata"),
      (args: Seq[Expression]) => {
        if (args.length < 2 || args.length > 4)
          throw new IllegalArgumentException("jsonata(json, expr[, timeoutMs[, maxDepth]])")
        JsonataExpression(
          args.head,
          litString(args(1), "jsonata expression"),
          if (args.length > 2) litLong(args(2), 5000L) else 5000L,
          if (args.length > 3) litLong(args(3), 1000L).toInt else 1000)
      }))
    ext.injectFunction((
      FunctionIdentifier("jsonata_row"),
      new ExpressionInfo(classOf[JsonataRowJsonExpression].getName, "jsonata_row"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException("jsonata_row(struct, 'expr')")
        JsonataRowJsonExpression(args.head, litString(args(1), "jsonata_row expression"))
      }))
    ext.injectFunction((
      FunctionIdentifier("jsonata_typed"),
      new ExpressionInfo(classOf[JsonataRowExpression].getName, "jsonata_typed"),
      (args: Seq[Expression]) => {
        if (args.length != 3)
          throw new IllegalArgumentException("jsonata_typed(struct, 'expr', 'ddl')")
        JsonataRowExpression(args.head,
          litString(args(1), "jsonata_typed expression"),
          org.apache.spark.sql.types.StructType.fromDDL(
            litString(args(2), "jsonata_typed output schema")))
      }))
    ext.injectFunction((
      FunctionIdentifier("jsonata_row_try"),
      new ExpressionInfo(classOf[JsonataRowJsonExpression].getName, "jsonata_row_try"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException("jsonata_row_try(struct, 'expr')")
        JsonataRowJsonExpression(args.head,
          litString(args(1), "jsonata_row_try expression"), permissive = true)
      }))
    ext.injectFunction((
      FunctionIdentifier("jsonata_variant"),
      new ExpressionInfo(classOf[JsonataVariantExpression].getName, "jsonata_variant"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException("jsonata_variant(json_or_variant, 'expr')")
        JsonataVariantExpression(args.head, litString(args(1), "jsonata_variant expression"))
      }))
  }
}
