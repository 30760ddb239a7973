package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch kernels for the dedup operators.
  *
  * The HOF formulations (transform-over-perms of aggregate-over-hashes for
  * MinHash; aggregate-over-bits of aggregate-over-hashes for SimHash) are
  * CodegenFallback: every permutation/bit × every hash is an interpreted
  * lambda step — 64·n and 32·n per document. These expressions fuse each
  * sketch into one pass over the hash array with the permutation/bit loop
  * unrolled inside JIT-compiled code, inside whole-stage codegen.
  *
  * Arithmetic is IDENTICAL to the HOF forms (Java long ops wrap exactly like
  * the EvalMode.LEGACY Multiply/Add nodes they replace), so the DuckDB
  * oracles that replay the sketches in SQL are unaffected — pinned
  * bit-for-bit by SketchExpressionsSpec. Null ELEMENTS are skipped (they
  * cannot occur in the callers' hash arrays — xxhash64/md5 of non-null words
  * — the skip only defines totality); a null ARRAY yields null.
  */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long], mask: Long)
  extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty, "permutation coefficient arrays must align")

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray
  private def nPerms: Int = a.length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val accs = Array.fill(nPerms)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var p = 0
        while (p < nPerms) {
          val v = (h * aArr(p) + bArr(p)) & mask
          if (v < accs(p)) accs(p) = v
          p += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(accs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val n = ctx.freshName("n")
      val accs = ctx.freshName("accs")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $in.numElements();
         |final long[] $accs = new long[$nPerms];
         |java.util.Arrays.fill($accs, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$in.isNullAt($j)) {
         |    final long $h = $in.getLong($j);
         |    for (int $p = 0; $p < $nPerms; $p++) {
         |      final long $v = ($h * $aRef[$p] + $bRef[$p]) & ${mask}L;
         |      if ($v < $accs[$p]) $accs[$p] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($accs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 32-bit SimHash over a word-hash array: bit i is set when the sign-sum of
  * the hashes' bit i (±1 per hash) is non-negative — including the empty
  * array (all sums 0 → all 32 bits set), matching the HOF fold it replaces. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Long](32)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var i = 0
        while (i < 32) {
          cnt(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
          i += 1
        }
      }
      j += 1
    }
    var sim = 0L
    var i = 31
    while (i >= 0) {
      sim = sim * 2 + (if (cnt(i) >= 0) 1L else 0L)
      i -= 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
         |final int $n = $in.numElements();
         |final long[] $cnt = new long[32];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$in.isNullAt($j)) {
         |    final long $h = $in.getLong($j);
         |    for (int $i = 0; $i < 32; $i++) {
         |      $cnt[$i] += ((($h >> $i) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $sim = 0L;
         |for (int $i = 31; $i >= 0; $i--) {
         |  $sim = $sim * 2 + (($cnt[$i] >= 0L) ? 1L : 0L);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused distinct 3-word shingle hashes STRAIGHT FROM TEXT: the whole
  * `array_distinct(transform(idx, i => xxhash64(wh[i], wh[i+1], wh[i+2])))`
  * over `transform(split(lower(text), " "), w => xxhash64(w))` compose
  * (ops/Dedup.scala shingleHashes) as ONE static-call expression. The
  * compose paid TWO interpreted transform layers — one lambda step per word
  * and one per shingle window, each with the codegen'd hash inside but an
  * interpreted dispatch + accumulator around it — across every dd03/dd04/
  * dd06/dd12/dd14/dc01 scan (the documented verifiedPairs floor).
  *
  * Bit-identical by CONSTRUCTION, not reimplementation: tokenization calls
  * the same `UTF8String.toLowerCase.split(" ", -1)` the Lower/StringSplit
  * expressions call; word hashes call `XXH64.hashUTF8String(tok, 42)` and
  * shingles chain `XXH64.hashLong` from seed 42 — exactly XxHash64's
  * multi-argument seed chaining; distinct keeps FIRST-occurrence order like
  * array_distinct (LinkedHashSet). Sub-trigram docs yield the compose's
  * EMPTY set (the zero-length-slice guard) — and so does NULL text: the
  * compose's `greatest(size(null), 0)` swallows the null into the same
  * empty set (caught by the spec's first run; never nullable, like the
  * compose). Pinned against the compose by SketchExpressionsSpec. */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingle_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHashes.emptyArray()
    else ShingleHashes.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $jt ${ev.value} = ${c.isNull}
        ? graft.spark.ShingleHashes.emptyArray()
        : graft.spark.ShingleHashes.compute(${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val Empty: ArrayData = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** The compose's null-text result: the same empty set (immutable, shared). */
  def emptyArray(): ArrayData = Empty

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val toks = s.toLowerCase.split(Space, -1)
    val n = toks.length
    if (n < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) { wh(i) = XXH64.hashUTF8String(toks(i), 42L); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - 3) {
      var h = 42L
      h = XXH64.hashLong(wh(i), h)
      h = XXH64.hashLong(wh(i + 1), h)
      h = XXH64.hashLong(wh(i + 2), h)
      seen.add(h)
      i += 1
    }
    val res = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(res)
  }
}

/** Fused per-word xxhash64 straight from text — the single-layer
  * `transform(split(lower(text), " "), w => xxhash64(w))` compose as one
  * static call (order preserved, duplicates kept, NULL text → NULL like
  * the transform). Same construction-identity contract as
  * [[ShingleHashes]]; feeds dd05's SimHash and dd13's span windows. */
case class WordHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_hashes"

  override def nullSafeEval(input: Any): Any =
    WordHashes.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.spark.WordHashes.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordHashes {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val toks = s.toLowerCase.split(Space, -1)
    val res = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { res(i) = XXH64.hashUTF8String(toks(i), 42L); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(res)
  }
}

/** Fused K-gram span hashes WITH MULTIPLICITY over a word-hash array — the
  * `transform(idx, i => xxhash64(wh[i..i+k-1]))` compose of spansFromWh
  * (dd13 counts every window, unlike [[ShingleHashes]]'s set). Same
  * zero-length guard for sub-K docs (empty, never null — greatest swallows
  * the size like the compose); chains `XXH64.hashLong` from seed 42. A
  * NULL ARRAY input also yields the compose's empty set (the slice/
  * sequence guard nulls collapse through greatest). */
case class SpanHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull = false ONLY: the window chain reads getLong without
    // per-element null checks, so a null-bearing array would silently hash
    // a garbage slot where the xxhash64 compose SKIPS null arguments — the
    // analyzer rejects such inputs rather than diverging at runtime (the
    // intended feeder, [[WordHashes]], declares non-null elements)
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with non-nullable elements, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "span_hashes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHashes.emptyArray()
    else SpanHashes.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $jt ${ev.value} = ${c.isNull}
        ? graft.spark.ShingleHashes.emptyArray()
        : graft.spark.SpanHashes.compute(${c.value}, $k);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanHashes {
  def compute(wh: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = wh.numElements()
    if (n < k) return ShingleHashes.emptyArray()
    val res = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = 42L
      var o = 0
      while (o < k) { h = XXH64.hashLong(wh.getLong(i + o), h); o += 1 }
      res(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(res)
  }
}

object SketchExpressions {
  /** Codegen'd MinHash signature: per permutation i, min over the hash array
    * of (a(i)*h + b(i)) & mask. Empty array → all Long.MaxValue. */
  def minhashSig(hashes: Column, a: Seq[Long], b: Seq[Long], mask: Long): Column =
    Shims.column(MinHashSignature(Shims.expression(hashes), a, b, mask))

  /** Codegen'd 32-bit SimHash over a word-hash array. */
  def simhash32(hashes: Column): Column =
    Shims.column(SimHash32(Shims.expression(hashes)))

  /** Codegen'd distinct 3-shingle hashes straight from text — see
    * [[ShingleHashes]]. */
  def shingleHashes(text: Column): Column =
    Shims.column(ShingleHashes(Shims.expression(text)))

  /** Codegen'd per-word hashes straight from text — see [[WordHashes]]. */
  def wordHashes(text: Column): Column =
    Shims.column(WordHashes(Shims.expression(text)))

  /** Codegen'd K-span hashes with multiplicity — see [[SpanHashes]]. */
  def spanHashes(wh: Column, k: Int): Column =
    Shims.column(SpanHashes(Shims.expression(wh), k))
}
