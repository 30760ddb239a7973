package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword token COUNT under a frozen BPE merge table — the accounting
  * kernel for budget operators that must pack by what a trained model
  * actually consumes, not whitespace words (reference delegation site for
  * the language surface: JsonataTransformation.java:104; the counting
  * semantics here are the standard byte-pair-encoding apply loop).
  *
  * Semantics (one pass per rank, per whitespace-delimited word):
  *   tokens(word) = |word| after applying each merge (l, r) -> placeholder
  *   in RANK ORDER, each rank replacing occurrences LEFT-TO-RIGHT,
  *   NON-OVERLAPPING; tokens(text) = sum over maximal ' '-free runs.
  *
  * Rank-sequential application equals the textbook lowest-rank-first
  * greedy loop for every WELL-FORMED merge table (operands are base chars
  * or strictly-earlier placeholders): a merge only ever creates
  * adjacencies involving its own placeholder, so a pair of rank r can
  * never (re)appear after rank r's pass — there is nothing for an earlier
  * rank to miss. BpeCountSpec pins this against an independent
  * priority-greedy reference. The same fact is what makes the DuckDB
  * oracle EXACT: one nested `replace()` chain in rank order (SQL replace
  * is left-to-right non-overlapping), placeholders as private-use chars,
  * token count = length(replaced) − spaces.
  *
  * Scale: the count is per-row map work inside whole-stage codegen — one
  * int-buffer pass per (word × rank), merges as ONE broadcast-referenced
  * long[] (l << 32 | r << 16 | new). That is the right shape for the
  * frozen few-dozen-merge table shipped here ([[graft.ops.TextOps]]);
  * a production 50k-merge vocabulary would swap the inner rank loop for
  * the heap-of-adjacent-pairs merger (O(len log len) per word) behind the
  * same Expression contract — the plumbing (broadcast table, one-pass
  * count, codegen) is what this kernel pins.
  */
case class BpeCount(child: Expression, merges: Seq[Long])
  extends UnaryExpression {

  @transient private lazy val mergesArr: Array[Long] = merges.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeCount.compute(input.asInstanceOf[UTF8String], mergesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergesArr, "long[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.spark.BpeCount.compute($s, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {

  /** First private-use char — placeholder for the rank-0 merge; rank k
    * merges to (PlaceholderBase + k). Input text must not contain
    * private-use chars (ASCII fixtures trivially satisfy this; a guard
    * here would put a branch in the hot loop for a corpus-validation
    * property — the vecs zero-norm precedent). */
  val PlaceholderBase: Char = 0xE000.toChar

  /** Encode (left, right) pairs in rank order into the kernel's packed
    * long form; rank k's output token is PlaceholderBase + k. */
  def encodeMerges(pairs: Seq[(Char, Char)]): Seq[Long] =
    pairs.zipWithIndex.map { case ((l, r), k) =>
      (l.toLong << 32) | (r.toLong << 16) | (PlaceholderBase + k).toLong
    }

  /** The count loop shared verbatim by interpreted eval and codegen (the
    * LshCodes pattern: one body, no dual-implementation divergence). */
  def compute(s: UTF8String, merges: Array[Long]): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    val buf = new Array[Int](n)
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (str.charAt(i) == ' ') i += 1
      else {
        var wlen = 0
        while (i < n && str.charAt(i) != ' ') {
          buf(wlen) = str.charAt(i).toInt; wlen += 1; i += 1
        }
        var m = 0
        while (m < merges.length && wlen > 1) {
          val mm = merges(m)
          val l = (mm >>> 32).toInt
          val r = ((mm >>> 16) & 0xFFFF).toInt
          val nw = (mm & 0xFFFF).toInt
          var w = 0
          var p = 0
          while (p < wlen) {
            if (p + 1 < wlen && buf(p) == l && buf(p + 1) == r) {
              buf(w) = nw; w += 1; p += 2 // non-overlapping: skip both
            } else {
              buf(w) = buf(p); w += 1; p += 1
            }
          }
          wlen = w
          m += 1
        }
        cnt += wlen
      }
    }
    cnt
  }
}

object BpeExpressions {
  /** Codegen'd subword token count of `text` under the frozen merge
    * `pairs` (rank order) — see [[BpeCount]]. */
  def bpeCount(text: Column, pairs: Seq[(Char, Char)]): Column =
    Shims.column(BpeCount(Shims.expression(text), BpeCount.encodeMerges(pairs)))
}
