package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused framing + per-frame energy kernel for the audio stub family
  * (mm07). Replaces the HOF pipeline
  * `transform(slice(sequence...)) -> posexplode -> aggregate(transform(...))`
  * — 64 interpreted lambda steps per frame PLUS a materialized array of
  * frame substrings per document — with one pass over the document's code
  * points emitting the per-frame energy array directly, inside whole-stage
  * codegen (static-call shape like the sketch kernels).
  *
  * Bit-equal to the HOF form it replaces (pinned by AudioKernelSpec):
  *  - `substring`/`ascii` semantics are CODE POINTS (probed on 4.1:
  *    `ascii(substring(s,i,1))` yields the full code point, and substring
  *    indexes by code point);
  *  - amplitude = codepoint - bias, squared and summed in LONG arithmetic.
  *    The HOF's `(c * c).cast("bigint")` squared in int under ANSI mode
  *    (Spark 4 default), so it RAISED on |amplitude| > 46340 — no input
  *    ever produced a wrapped value to be bit-compatible with; the kernel
  *    simply extends the defined domain (no overflow before ~1.5e9-char
  *    frames of astral code points);
  *  - only FULL frames count: floor(len/frameLen) energies, the tail
  *    remainder is dropped — `length(text) div F` in the old framing.
  */
case class FrameEnergies(child: Expression, frameLen: Int, bias: Int)
  extends UnaryExpression {

  require(frameLen > 0, "frameLen must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "frame_energies"

  override def nullSafeEval(input: Any): Any =
    FrameEnergies.energies(input.asInstanceOf[UTF8String], frameLen, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.spark.FrameEnergies.energies($in, $frameLen, $bias);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameEnergies {

  /** Invoked from generated code. One pass over the UTF-16 string, counting
    * CODE POINTS (surrogate pairs advance two chars, one sample). */
  def energies(s: UTF8String, frameLen: Int, bias: Int): UnsafeArrayData = {
    val str = s.toString
    val n = str.length // UTF-16 units; code points counted in the loop
    // worst case one frame per frameLen code points; size after the pass
    val buf = new Array[Long](str.codePointCount(0, n) / frameLen)
    var i = 0      // UTF-16 index
    var inFrame = 0
    var frame = 0
    var acc = 0L
    while (i < n && frame < buf.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val d = (cp - bias).toLong
      acc += d * d // long math: see scaladoc (HOF raised here under ANSI)
      inFrame += 1
      if (inFrame == frameLen) {
        buf(frame) = acc
        frame += 1
        inFrame = 0
        acc = 0L
      }
    }
    UnsafeArrayData.fromPrimitiveArray(buf)
  }

  def column(text: Column, frameLen: Int, bias: Int): Column =
    Shims.column(FrameEnergies(Shims.expression(text), frameLen, bias))
}
