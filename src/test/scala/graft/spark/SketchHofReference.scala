package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, EvalMode, Multiply}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims

/** The HOF sketch formulations the native kernels replaced, kept as the
  * test-side reference implementations (one definition, shared by
  * SketchExpressionsSpec and the ProfSketch profiler, parameterized on the
  * PRODUCTION coefficient scheme from graft.ops.Dedup — so if Dedup's scheme
  * ever changes, the bit-identity pin follows it automatically). */
object SketchHofReference {

  private def wrapMul(a: Column, b: Column): Column =
    Shims.column(Multiply(Shims.expression(a), Shims.expression(b), EvalMode.LEGACY))
  private def wrapAdd(a: Column, b: Column): Column =
    Shims.column(Add(Shims.expression(a), Shims.expression(b), EvalMode.LEGACY))

  /** transform-over-perms of aggregate-over-hashes running-min MinHash. */
  def hofMinhash(sh: Column, permA: Seq[Long], permB: Seq[Long], mask: Long): Column = {
    val aC = array(permA.map(lit): _*)
    val bC = array(permB.map(lit): _*)
    transform(sequence(lit(0), lit(permA.length - 1)), i =>
      aggregate(sh, lit(Long.MaxValue),
        (acc, h) => least(acc, wrapAdd(wrapMul(h, get(aC, i)), get(bC, i)).bitwiseAND(lit(mask)))))
  }

  /** aggregate-over-bits of aggregate-over-hashes sign-sum 32-bit SimHash. */
  def hofSimhash(wh: Column): Column =
    aggregate(sequence(lit(31), lit(0), lit(-1)), lit(0L), (acc, i) =>
      acc * 2 + when(aggregate(wh, lit(0L), (a2, h) =>
        a2 + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) >= 0, 1L).otherwise(0L))
}
