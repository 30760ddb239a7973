package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** tx13's frozen hashed linear classifier score as ONE codegen'd pass —
  * the eleventh native kernel, and the NumArrayFold lesson applied to the
  * classifier: the Column formulation (`TextOps.clfScoreOf`) composes
  * split → transform → aggregate twice, four LambdaFunction HOFs that are
  * all CodegenFallback and block subexpression elimination. This kernel
  * is the same arithmetic in one int-buffer pass per row (tokenize once,
  * hash once, both folds share the hash array), inside whole-stage codegen.
  *
  * BIT-IDENTICAL BY CONSTRUCTION with the compose (ClfChunkSpec pins it on
  * corpus + adversaries, both eval paths): it calls the same UTF8String
  * entry points the StringTrim/Lower/StringSplit expressions call
  * (trim/toLowerCase/split), replays Substring's substringSQL for the
  * last-char step, and accumulates the unigram and bigram folds as two
  * separate left-to-right double sums in word order — the exact IEEE
  * operation order of the two aggregate() calls it replaces — then one
  * add and one divide. ascii() is Spark 4's codepoint semantics (measured;
  * DuckDB's ascii agrees), so kernel == compose == oracle on any UTF-8
  * text, and the hash index is provably non-negative.
  *
  * Weights ride codegen as TWO broadcast-referenced double[64] tables +
  * a bias constant; a learned 2^20-bucket production table swaps in
  * behind the same Expression contract.
  */
case class ClfScore(child: Expression, uniW: Seq[Double], biW: Seq[Double],
                    bias: Double) extends UnaryExpression {

  @transient private lazy val uniArr: Array[Double] = uniW.toArray
  @transient private lazy val biArr: Array[Double] = biW.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "clf_score"

  override def nullSafeEval(input: Any): Any =
    ClfScore.compute(input.asInstanceOf[UTF8String], uniArr, biArr, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("clfUni", uniArr, "double[]")
    val b = ctx.addReferenceObj("clfBi", biArr, "double[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.spark.ClfScore.compute($s, $u, $b, ${bias}D);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ClfScore {

  /** Hash-table modulus; must equal both weight tables' length. */
  val Buckets = 64

  /** The whitespace tokenizer pattern StringSplit would compile. */
  private val WsPattern = UTF8String.fromString("\\s+")

  /** Spark Ascii semantics (4.x): the Unicode CODEPOINT of the first
    * character, 0 for empty — measured against the ascii() expression
    * (é → 233, € → 8364), and the same thing DuckDB's ascii() returns, so
    * the hash is engine-exact on ANY UTF-8 text, not just ASCII. */
  private def asciiOf(w: UTF8String): Int = {
    val c = w.substring(0, 1)
    if (c.numBytes() > 0) c.toString.codePointAt(0) else 0
  }

  /** Word feature hash — the Column formulation verbatim:
    * len*31 + ascii(first)*17 + ascii(substr(w, len(w), 1))*7 mod 64.
    * Codepoints and lengths are non-negative, so % never goes negative
    * and the table index is always in range — the kernel is TOTAL. */
  private def hash(w: UTF8String): Int = {
    val n = w.numChars()
    (n * 31 + asciiOf(w) * 17 + asciiOf(w.substringSQL(n, 1)) * 7) % Buckets
  }

  /** The score loop shared verbatim by interpreted eval and codegen. */
  def compute(s: UTF8String, uni: Array[Double], bi: Array[Double],
              bias: Double): Double = {
    val words = s.trim().toLowerCase().split(WsPattern, -1)
    val n = words.length
    val hs = new Array[Int](n)
    var u = 0.0
    var i = 0
    while (i < n) {
      hs(i) = hash(words(i)); u += uni(hs(i)); i += 1
    }
    var b = 0.0
    i = 0
    while (i < n - 1) {
      b += bi((hs(i) * 131 + hs(i + 1) * 17) % Buckets); i += 1
    }
    bias + (u + b) / (2 * n - 1)
  }
}

object ClfExpressions {
  /** Codegen'd classifier score of `text` under frozen (uniW, biW, bias) —
    * see [[ClfScore]]. Tables must be [[ClfScore.Buckets]] long. */
  def clfScore(text: Column, uniW: Seq[Double], biW: Seq[Double],
               bias: Double): Column = {
    require(uniW.length == ClfScore.Buckets && biW.length == ClfScore.Buckets,
      s"weight tables must have ${ClfScore.Buckets} buckets")
    Shims.column(ClfScore(Shims.expression(text), uniW, biW, bias))
  }
}
