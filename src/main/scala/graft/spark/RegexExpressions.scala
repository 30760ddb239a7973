package graft.spark

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for JSONata's `$match`: every regex match in a string as a
  * `{match, index, groups}` struct — the compiled-tier equivalent of the
  * interpreter's fMatch (graft.jsonata.Functions) so regex queries stay out
  * of the per-record envelope path.
  *
  * No builtin composition yields the `index` (character offset) or the
  * per-match `groups` array — `regexp_extract_all` returns one group's text
  * only — hence a kernel rather than a function tree. The match loop runs in
  * compiled Scala invoked from generated code (same shape as the sketch
  * kernels), so the expression stays INSIDE whole-stage codegen: one static
  * call per row, no interpreted-eval fallback in the hot path.
  *
  * Semantics pinned to the interpreter (DifferentialSpec):
  *  - `Matcher.find()` scan — zero-width matches auto-advance;
  *  - `index` is the Java char offset of the match start (UTF-16 units,
  *    exactly what the interpreter reports);
  *  - `groups` holds capture groups 1..groupCount, null for non-participating
  *    groups (the interpreter's nullNode);
  *  - at most `limit` matches (negative limit = none, like `n < limit`).
  */
case class RegexMatchAll(child: Expression, regex: String, flags: Int, limit: Int)
  extends UnaryExpression {

  @transient private lazy val pattern: Pattern = Pattern.compile(regex, flags)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = RegexMatchAll.resultType
  override def prettyName: String = "regex_match_all"

  override def nullSafeEval(input: Any): Any =
    RegexMatchAll.matchAll(pattern, input.asInstanceOf[UTF8String], limit)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      // the Pattern rides along as a reference object; the loop body is this
      // class's compiled matchAll — generated code is a single static call
      val pRef = ctx.addReferenceObj("matchAllPattern", pattern, classOf[Pattern].getName)
      s"${ev.value} = graft.spark.RegexMatchAll.matchAll($pRef, $in, $limit);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexMatchAll {

  /** array<struct<match,index,groups>> — field order matches the
    * interpreter's matchObj insertion order. */
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("match", StringType, nullable = false),
    StructField("index", LongType, nullable = false),
    StructField("groups", ArrayType(StringType, containsNull = true), nullable = false))),
    containsNull = false)

  /** Invoked from generated code — keep the signature codegen-friendly. */
  def matchAll(p: Pattern, s: UTF8String, limit: Int): GenericArrayData = {
    val str = s.toString
    val m = p.matcher(str)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var n = 0
    while (n < limit && m.find()) {
      val groups = new Array[Any](m.groupCount())
      var g = 0
      while (g < m.groupCount()) {
        val gv = m.group(g + 1)
        groups(g) = if (gv == null) null else UTF8String.fromString(gv)
        g += 1
      }
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromString(m.group()), m.start().toLong, new GenericArrayData(groups)))
      n += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  def column(str: Column, regex: String, flags: Int, limit: Int = Int.MaxValue): Column =
    Shims.column(RegexMatchAll(Shims.expression(str), regex, flags, limit))

  /** SQL builders, injected by [[GraftExtensions]]:
    * `regex_match_all(str, 'pattern'[, limit])` → the match struct array.
    * Pattern (and limit) must be literals — they size/compile per plan, not
    * per row, which is what keeps the kernel one static call inside codegen. */
  private[spark] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "regex_match_all" -> { args =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.unsafe.types.UTF8String
      args match {
        case Seq(str, Literal(re: UTF8String, StringType)) =>
          RegexMatchAll(str, re.toString, 0, Int.MaxValue)
        case Seq(str, Literal(re: UTF8String, StringType), Literal(lim: Int, IntegerType)) =>
          RegexMatchAll(str, re.toString, 0, lim)
        case _ => throw new IllegalArgumentException(
          "regex_match_all(str, 'pattern'[, limit]) needs a literal pattern (and literal limit)")
      }
    })
}
