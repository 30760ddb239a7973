package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic for the similarity/ANN operators.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is correct but runs on higher-order functions, which are CodegenFallback
  * (interpreted lambda per element) AND materialize the intermediate
  * products array per pair. For the all-pairs/top-k workloads in ss01-ss05
  * the dot product is the innermost loop over millions of candidate pairs,
  * so it is implemented here as a single Catalyst expression with
  * `doGenCode`: one fused multiply-add loop inside whole-stage codegen, no
  * allocation.
  *
  * Semantics are IDENTICAL to the HOF formulation (pinned by
  * VectorExpressionsSpec): same left-to-right FP summation order (bit-exact
  * results, so the DuckDB oracles are unaffected), NULL when either array is
  * NULL, when lengths differ (zip_with pads with null → null sum), or when
  * any element is null; empty arrays give 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // AbstractDataType (and with it ExpectsInputTypes' implicit coercion) is
  // private[sql]; callers cast to array<double> explicitly and this check
  // rejects anything else at analysis
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]
    val r = b.asInstanceOf[ArrayData]
    val n = l.numElements()
    if (n != r.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      acc += l.getDouble(i) * r.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $l.getDouble($i) * $r.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance Σ(a_i−b_i)², the [[DotProduct]] pattern applied to
  * the PQ/k-means assignment loops (ss10's encode evaluates it K×M times
  * per corpus row — nested inside HOF lambdas, so the composable
  * `aggregate(zip_with(...))` form paid an interpreted evaluation with an
  * intermediate array allocation per (row, m, j)). Same contract as the HOF
  * formulation, pinned by VectorExpressionsSpec: identical left-to-right
  * accumulation of (a_i−b_i)*(a_i−b_i) — bit-exact, oracles unaffected —
  * NULL on NULL/ragged/null-element inputs, 0.0 on empty. */
case class SquaredDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]
    val r = b.asInstanceOf[ArrayData]
    val n = l.numElements()
    if (n != r.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      val d = l.getDouble(i) - r.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = $l.getDouble($i) - $r.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product over two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))

  /** Codegen'd squared L2 distance over two `array<double>` columns. */
  def sqdist(a: Column, b: Column): Column =
    Shims.column(SquaredDistance(Shims.expression(a), Shims.expression(b)))

  /** SQL builders, injected at startup by [[GraftExtensions]] and installable
    * post-startup via [[registerNativeSql]] (one definition, like the jsonata
    * family): `vec_dot(array<double>, array<double>)` → double. Cosine
    * composes in SQL: `vec_dot(a,b)/(sqrt(vec_dot(a,a))*sqrt(vec_dot(b,b)))`. */
  private[spark] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> {
      case Seq(a, b) => DotProduct(a, b)
      case args => throw new IllegalArgumentException(
        s"vec_dot(array<double>, array<double>) takes 2 arguments, got ${args.length}")
    },
    "vec_sqdist" -> {
      case Seq(a, b) => SquaredDistance(a, b)
      case args => throw new IllegalArgumentException(
        s"vec_sqdist(array<double>, array<double>) takes 2 arguments, got ${args.length}")
    })

  /** Session-wide registration of the vector surface (same caveats as
    * [[JsonataFunctions.registerNativeSql]]). */
  def registerNativeSql(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) => Shims.registerFunction(spark, name, b) }
}
