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
  * Semantics (per whitespace-delimited word, symbols = Unicode CODEPOINTS):
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
  * token count = length(replaced) − spaces. Counting by CODEPOINT (not
  * UTF-16 code unit) is part of that exactness: DuckDB's length/replace
  * arithmetic is codepoint-based, so an astral-plane character is ONE
  * symbol on both engines (the tx13 ClfScore convention — one codepoint
  * discipline across every text kernel).
  *
  * TWO execution paths behind one Expression contract, dispatched on the
  * table size ([[BpeCount.HeapThreshold]]):
  *  - SEQUENTIAL (small frozen tables, the shipped [[graft.ops.TextOps]]
  *    case): one int-buffer pass per (word × rank) — O(len × ranks) per
  *    word, unbeatable constant factor at a few dozen ranks;
  *  - HEAP (production-vocabulary tables, e.g. 50k merges): the classic
  *    heap-of-adjacent-pairs merger — a linked list of symbols plus a
  *    lazy-deletion min-heap of (rank, pos) candidates, O(len log len)
  *    per word and INDEPENDENT of the table size (pair ranks resolve
  *    through an open-addressed long→int table built once per plan).
  *    The heap pops (lowest rank, leftmost pos) — exactly the textbook
  *    greedy order — so it computes the same count the sequential pass
  *    does on well-formed tables; BpeCountSpec pins the two paths
  *    bit-identical on the fuzz corpus at a forced threshold.
  *
  * Scale: both paths are per-row map work inside whole-stage codegen; the
  * merge table is ONE broadcast-referenced object (packed long[] + the
  * heap path's rank table). The Column API takes (Char, Char) pairs —
  * operands stay BMP — while the packed form carries 21-bit symbols.
  * Table WIDTH is capped at [[BpeCount.MaxRanks]] = 6400: placeholders
  * live in the BMP private-use block U+E000..U+F8FF, and rank 6400 would
  * spill past U+F8FF into REAL assigned characters (CJK compatibility
  * ideographs etc.), which input text may legitimately contain — a
  * false-match hazard, so [[BpeCount.encodeMerges]] refuses it outright.
  */
case class BpeCount(child: Expression, merges: Seq[Long])
  extends UnaryExpression {

  @transient private lazy val table: BpeCount.MergeTable =
    new BpeCount.MergeTable(merges.toArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_count"

  override def nullSafeEval(input: Any): Any =
    BpeCount.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("bpeTable", table, "graft.spark.BpeCount.MergeTable")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.spark.BpeCount.compute($s, $tRef);")
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

  /** Above this many ranks the kernel switches from the rank-sequential
    * pass (O(len × ranks) per word) to the heap merger (O(len log len),
    * table-size-independent). Measured (ProfBpe, 2k texts × 20 words):
    * the heap is FLAT at ~8-30 ms across 16→4096 ranks while the
    * sequential pass scales linearly (45 ms at 64 ranks → 1.7 s at 4096,
    * i.e. heap wins 5.2× at 64 and 56× at 4096 on sparse-hitting random
    * tables); the shipped DENSE-hitting 28-rank table is the other end of
    * the hit-density spectrum and stays 1.3× faster sequential. 64 keeps
    * every dense few-dozen-rank frozen table on its winning path while a
    * production vocabulary (where most scanned ranks never fire) lands on
    * the heap. */
  val HeapThreshold: Int = 64

  /** Hard cap on table width: placeholders must stay inside the BMP
    * private-use block U+E000..U+F8FF (0x1900 = 6400 codepoints). Rank
    * 6400 would emit U+F900 — a real assigned character (CJK
    * compatibility ideograph) that input text may contain, silently
    * false-matching merged tokens and diverging from the DuckDB oracle's
    * private-use replay. */
  val MaxRanks: Int = 0xF8FF - 0xE000 + 1

  /** Encode (left, right) pairs in rank order into the kernel's packed
    * 21-bit-field long form (l << 42 | r << 21 | new); rank k's output
    * token is PlaceholderBase + k. Refuses tables wider than
    * [[MaxRanks]] — see its note. */
  def encodeMerges(pairs: Seq[(Char, Char)]): Seq[Long] = {
    require(pairs.length <= MaxRanks,
      s"merge table has ${pairs.length} ranks — placeholders past rank " +
        s"$MaxRanks leave the private-use block and collide with real text")
    pairs.zipWithIndex.map { case ((l, r), k) =>
      (l.toLong << 42) | (r.toLong << 21) | (PlaceholderBase + k).toLong
    }
  }

  /** The frozen merge table in the form the kernel consumes: the packed
    * rank-ordered array plus — on the heap path only — an open-addressed
    * (l, r) → rank lookup built once and shared by every row.
    * `useHeap` is explicit so the spec can force either path onto the
    * same table and pin them bit-identical.
    *
    * WELL-FORMEDNESS (validated here, in the one constructor every path
    * goes through): no (l, r) pair may repeat across ranks, and every
    * operand must be a base symbol or an EARLIER rank's placeholder. The
    * heap greedy equals the documented rank-sequential semantics (and the
    * DuckDB replace-chain oracle) only under these conditions — a
    * duplicated pair makes rankOf ambiguous, and a forward-referencing
    * operand can fire under the greedy order but never under the
    * sequential one. Any request for the heap path — explicit or the
    * auto-dispatch width rule — THROWS on a malformed table: a
    * production-width corrupt artifact silently degraded to the
    * sequential pass would be a 56× perf cliff at 100 TB, and silently
    * changed token counts would be worse, so the only honest answer is a
    * loud refusal. Small tables (≤ [[HeapThreshold]] ranks, sequential
    * path) stay permissive: rank-sequential application is well-defined
    * — and replayed exactly by the replace-chain oracle — for ANY pair
    * list, well-formed or not. */
  final class MergeTable(val merges: Array[Long], requestedHeap: Boolean)
    extends Serializable {

    def this(merges: Array[Long]) = this(merges, merges.length > HeapThreshold)

    // open addressing, power-of-two capacity, linear probing; slots hold
    // the packed (l << 21 | r) key (+1 so 0 means empty) and the rank
    private val cap: Int = {
      var c = 16
      while (c < merges.length * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keySlots = new Array[Long](cap)
    private val rankSlots = new Array[Int](cap)

    /** True iff no (l, r) duplicates and no forward placeholder refs —
      * computed during the same insert loop that builds the rank table. */
    val wellFormed: Boolean = {
      var ok = true
      // operand x is a placeholder iff it falls in this table's own
      // placeholder range; its rank must precede the referencing rank
      val pBase = PlaceholderBase.toInt
      val pEnd = pBase + merges.length
      def operandOk(x: Int, k: Int): Boolean =
        x < pBase || x >= pEnd || (x - pBase) < k
      var k = 0
      while (k < merges.length) {
        val mm = merges(k)
        val l = (mm >>> 42).toInt
        val r = ((mm >>> 21) & 0x1FFFFF).toInt
        if (!operandOk(l, k) || !operandOk(r, k)) ok = false
        val key = (mm >>> 21) + 1L // top 42 bits = l<<21|r; +1 reserves 0
        var i = (scala.util.hashing.byteswap64(key) & mask).toInt
        while (keySlots(i) != 0L) {
          if (keySlots(i) == key) ok = false // duplicate (l, r) pair
          i = (i + 1) & mask
        }
        keySlots(i) = key
        rankSlots(i) = k
        k += 1
      }
      ok
    }
    require(!requestedHeap || wellFormed,
      "malformed BPE merge table (duplicate pair or forward placeholder " +
        "reference) — the heap path would silently diverge from the " +
        "rank-sequential semantics; fix the table or stay sequential")

    /** Effective dispatch — by the require above, true implies wellFormed. */
    val useHeap: Boolean = requestedHeap

    /** Rank of the merge (l, r), or -1 when the pair never merges. */
    def rankOf(l: Int, r: Int): Int = {
      val key = ((l.toLong << 21) | r.toLong) + 1L
      var i = (scala.util.hashing.byteswap64(key) & mask).toInt
      while (true) {
        val k = keySlots(i)
        if (k == key) return rankSlots(i)
        if (k == 0L) return -1
        i = (i + 1) & mask
      }
      -1 // unreachable
    }

    def newTokenOf(rank: Int): Int = (merges(rank) & 0x1FFFFF).toInt
  }

  /** The count loop shared verbatim by interpreted eval and codegen (the
    * LshCodes pattern: one body, no dual-implementation divergence).
    * Iterates CODEPOINTS — an astral char is one symbol, matching the
    * DuckDB oracle's length/replace arithmetic. */
  def compute(s: UTF8String, table: MergeTable): Long = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0L
    val buf = new Array[Int](n)
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (str.charAt(i) == ' ') i += 1 // ' ' is BMP; a surrogate can't equal it
      else {
        var wlen = 0
        while (i < n && str.charAt(i) != ' ') {
          val cp = str.codePointAt(i)
          buf(wlen) = cp; wlen += 1; i += Character.charCount(cp)
        }
        cnt += (if (table.useHeap) mergeHeap(buf, wlen, table)
                else mergeSeq(buf, wlen, table.merges))
      }
    }
    cnt
  }

  /** Rank-sequential pass: for each rank in order, one left-to-right
    * non-overlapping replacement sweep over the word buffer. */
  private[spark] def mergeSeq(buf: Array[Int], wlen0: Int, merges: Array[Long]): Int = {
    var wlen = wlen0
    var m = 0
    while (m < merges.length && wlen > 1) {
      val mm = merges(m)
      val l = (mm >>> 42).toInt
      val r = ((mm >>> 21) & 0x1FFFFF).toInt
      val nw = (mm & 0x1FFFFF).toInt
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
    wlen
  }

  /** Heap-of-adjacent-pairs merger: textbook greedy — always apply the
    * LOWEST-RANK pair present, leftmost occurrence first. Entries are
    * (rank << 32 | pos) longs in a binary min-heap with LAZY deletion: a
    * popped entry applies only if the pair at `pos` still IS that rank's
    * pair (each rank names exactly one pair, so the equality check is the
    * whole validation); merges push entries for the ≤2 adjacencies they
    * create, so every currently-present pair always has a live entry.
    * NOTE: mutates `buf` (merged symbols written in place) exactly like
    * [[mergeSeq]]; callers refill the buffer per word. */
  private[spark] def mergeHeap(buf: Array[Int], wlen: Int, table: MergeTable): Int = {
    if (wlen <= 1) return wlen
    // doubly-linked list over buf positions; -1 terminates; dead nodes
    // are unlinked (never revisited — validation goes through links)
    val next = new Array[Int](wlen)
    val prev = new Array[Int](wlen)
    val alive = new Array[Boolean](wlen)
    var p = 0
    while (p < wlen) {
      next(p) = if (p + 1 < wlen) p + 1 else -1
      prev(p) = p - 1
      alive(p) = true
      p += 1
    }
    // min-heap of rank<<32|pos (rank major, pos minor = leftmost-first)
    var heap = new Array[Long](math.max(16, wlen))
    var hn = 0
    def push(e: Long): Unit = {
      if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
      var i = hn; heap(i) = e; hn += 1
      while (i > 0 && heap((i - 1) / 2) > heap(i)) {
        val t = heap(i); heap(i) = heap((i - 1) / 2); heap((i - 1) / 2) = t
        i = (i - 1) / 2
      }
    }
    def pop(): Long = {
      val top = heap(0)
      hn -= 1; heap(0) = heap(hn)
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < hn && heap(l) < heap(m)) m = l
        if (r < hn && heap(r) < heap(m)) m = r
        if (m == i) return top
        val t = heap(i); heap(i) = heap(m); heap(m) = t
        i = m
      }
      top // unreachable
    }
    def pushPair(pos: Int): Unit = {
      val nx = next(pos)
      if (nx >= 0) {
        val rk = table.rankOf(buf(pos), buf(nx))
        if (rk >= 0) push((rk.toLong << 32) | pos.toLong)
      }
    }
    p = 0
    while (p + 1 < wlen) { pushPair(p); p += 1 }
    var count = wlen
    while (hn > 0) {
      val e = pop()
      val rank = (e >>> 32).toInt
      val pos = (e & 0xFFFFFFFFL).toInt
      val nx = if (alive(pos)) next(pos) else -1
      if (nx >= 0 && table.rankOf(buf(pos), buf(nx)) == rank) {
        buf(pos) = table.newTokenOf(rank)
        val nnx = next(nx)
        alive(nx) = false
        next(pos) = nnx
        if (nnx >= 0) prev(nnx) = pos
        count -= 1
        if (prev(pos) >= 0) pushPair(prev(pos))
        pushPair(pos)
      }
    }
    count
  }
}

object BpeExpressions {
  /** Codegen'd subword token count of `text` under the frozen merge
    * `pairs` (rank order) — see [[BpeCount]]. */
  def bpeCount(text: Column, pairs: Seq[(Char, Char)]): Column =
    Shims.column(BpeCount(Shims.expression(text), BpeCount.encodeMerges(pairs)))
}
