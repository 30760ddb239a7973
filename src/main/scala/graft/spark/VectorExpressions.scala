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

/** Fused PQ encoder: the whole `transform(sequence(0, M−1), m =>
  * aggregate(cb, (MaxValue,−1), argmin-by-sqdist))` compose of ss10/ss11
  * (ops/Similarity.scala pqEncode) as ONE codegen'd expression. The fold
  * form runs K(≤256) interpreted lambda steps — each allocating an
  * accumulator struct and re-reading `subs[m]` — per (row, m): ~M·K ≈ 2k
  * interpreted sqdists per corpus row, the dominant cost of the PQ family
  * and the exact shape the DotProduct/SquaredDistance kernels fixed for
  * ss01/ss09 (flagged again by the round-9 review as the ANN serving hot
  * loop).
  *
  * left  = subs : array<array<double>> — the M pre-sliced subvectors
  * right = cb   : array<struct<j:int, subs:array<array<double>>>> — the
  *                one-row broadcast sub-codebook, iterated in array order
  *                (= ascending j after pqCodebook's array_sort)
  * result       : array<int> of M sub-codes
  *
  * Bit-identical replay of the HOF compose (pinned by
  * VectorExpressionsSpec): per m, left-to-right strict-< argmin with init
  * (Double.MaxValue, −1) — ties keep the FIRST (lowest-j) entry; a null
  * codebook entry / null or ragged subvector makes the fold's sqdist null,
  * whose `when(dd < acc.d, …)` evaluates to the `otherwise` branch, i.e.
  * the entry is SKIPPED — replicated here as `continue`. A null element of
  * `subs` skips every entry, yielding that fold's −1. Divergence (documented,
  * registry-unreachable): a NULL top-level input returns NULL, where the
  * compose gives per-element nulls / all −1.
  *
  * FIXED-M CONTRACT: the compose always emits exactly `m` entries
  * (`sequence(0, M−1)` is constructed from the same config constant), so
  * this kernel iterates a constructor-supplied `m` and RAISES on a subs
  * row whose length differs — a malformed row fails loudly instead of
  * silently changing the output shape and shifting downstream pqAdc
  * element_at lookups. */
case class PqEncode(left: Expression, right: Expression, m: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types._
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType, _, _),
              StructField(_, ArrayType(ArrayType(DoubleType, _), _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<double>>, array<struct<int, array<array<double>>>>), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val subs = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    if (subs.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_encode: subs row has ${subs.numElements()} subvectors, expected M=$m")
    val k = cb.numElements()
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var best = Double.MaxValue
      var bestJ: Any = -1
      if (!subs.isNullAt(mi)) {
        val sub = subs.getArray(mi)
        val n = sub.numElements()
        var ki = 0
        while (ki < k) {
          if (!cb.isNullAt(ki)) {
            val e = cb.getStruct(ki, 2)
            if (!e.isNullAt(1)) {
              val esubs = e.getArray(1)
              if (mi < esubs.numElements() && !esubs.isNullAt(mi)) {
                val es = esubs.getArray(mi)
                if (es.numElements() == n) {
                  var dd = 0.0
                  var i = 0
                  var isNull = false
                  while (i < n && !isNull) {
                    if (sub.isNullAt(i) || es.isNullAt(i)) isNull = true
                    else { val d = sub.getDouble(i) - es.getDouble(i); dd += d * d }
                    i += 1
                  }
                  if (!isNull && dd < best) {
                    best = dd
                    bestJ = if (e.isNullAt(0)) null else e.getInt(0)
                  }
                }
              }
            }
          }
          ki += 1
        }
      }
      out(mi) = bestJ
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (subs, cb) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val out = ctx.freshName("out")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val sub = ctx.freshName("sub")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val esubs = ctx.freshName("esubs")
      val es = ctx.freshName("es")
      val dd = ctx.freshName("dd")
      val ddNull = ctx.freshName("ddNull")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |if ($subs.numElements() != ${this.m}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: subs row has " + $subs.numElements() +
         |    " subvectors, expected M=" + ${this.m});
         |}
         |final int $m = ${this.m};
         |final int $k = $cb.numElements();
         |final Object[] $out = new Object[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double $best = Double.MAX_VALUE;
         |  Object $bestJ = (Object) (-1);
         |  if (!$subs.isNullAt($mi)) {
         |    final ArrayData $sub = $subs.getArray($mi);
         |    final int $n = $sub.numElements();
         |    for (int $ki = 0; $ki < $k; $ki++) {
         |      if ($cb.isNullAt($ki)) continue;
         |      final InternalRow $e = $cb.getStruct($ki, 2);
         |      if ($e.isNullAt(1)) continue;
         |      final ArrayData $esubs = $e.getArray(1);
         |      if ($mi >= $esubs.numElements() || $esubs.isNullAt($mi)) continue;
         |      final ArrayData $es = $esubs.getArray($mi);
         |      if ($es.numElements() != $n) continue;
         |      double $dd = 0.0;
         |      boolean $ddNull = false;
         |      for (int $i = 0; $i < $n; $i++) {
         |        if ($sub.isNullAt($i) || $es.isNullAt($i)) { $ddNull = true; break; }
         |        final double $d = $sub.getDouble($i) - $es.getDouble($i);
         |        $dd += $d * $d;
         |      }
         |      if (!$ddNull && $dd < $best) {
         |        $best = $dd;
         |        $bestJ = $e.isNullAt(0) ? null : (Object) $e.getInt(0);
         |      }
         |    }
         |  }
         |  $out[$mi] = $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused ADC query-table builder: the `transform(sequence(0,M−1), m =>
  * transform(cb, e => sqdist(subs[m], e.subs[m])))` compose of
  * pqQueryTables as ONE codegen'd expression — per QUERY row it ran M·K
  * interpreted lambda steps (K ≤ 256), the dominant task of ss10's table
  * broadcast at sf1 (2.3 s max task). Same operand shapes as [[PqEncode]];
  * result array<array<double>> with qtab[m][j] = ‖subs[m] − cb[j].subs[m]‖².
  * Null semantics replay the transform compose (it MAPS, it does not skip):
  * a null codebook entry / null-or-ragged subvector / null element makes
  * that table CELL null. Divergence (documented, registry-unreachable):
  * NULL top-level inputs return NULL where the compose yields nested nulls.
  * Same FIXED-M CONTRACT as [[PqEncode]]: iterates a constructor-supplied
  * `m` and raises on a subs row of any other length. */
case class PqQueryTable(left: Expression, right: Expression, m: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types._
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType, _, _),
              StructField(_, ArrayType(ArrayType(DoubleType, _), _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<double>>, array<struct<int, array<array<double>>>>), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_query_table"

  private def cell(subs: ArrayData, cb: ArrayData, mi: Int, ki: Int): Any = {
    if (subs.isNullAt(mi) || cb.isNullAt(ki)) return null
    val e = cb.getStruct(ki, 2)
    if (e.isNullAt(1)) return null
    val esubs = e.getArray(1)
    if (mi >= esubs.numElements() || esubs.isNullAt(mi)) return null
    val a = subs.getArray(mi)
    val b = esubs.getArray(mi)
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override def nullSafeEval(s: Any, c: Any): Any = {
    val subs = s.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    if (subs.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_query_table: subs row has ${subs.numElements()} subvectors, expected M=$m")
    val k = cb.numElements()
    val rows = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val row = new Array[Any](k)
      var ki = 0
      while (ki < k) { row(ki) = cell(subs, cb, mi, ki); ki += 1 }
      rows(mi) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (subs, cb) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val mi = ctx.freshName("mi")
      val ki = ctx.freshName("ki")
      val rows = ctx.freshName("rows")
      val row = ctx.freshName("row")
      val sub = ctx.freshName("sub")
      val e = ctx.freshName("e")
      val esubs = ctx.freshName("esubs")
      val es = ctx.freshName("es")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val dd = ctx.freshName("dd")
      s"""
         |if ($subs.numElements() != ${this.m}) {
         |  throw new IllegalArgumentException(
         |    "pq_query_table: subs row has " + $subs.numElements() +
         |    " subvectors, expected M=" + ${this.m});
         |}
         |final int $m = ${this.m};
         |final int $k = $cb.numElements();
         |final Object[] $rows = new Object[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  final Object[] $row = new Object[$k];
         |  if (!$subs.isNullAt($mi)) {
         |    final ArrayData $sub = $subs.getArray($mi);
         |    final int $n = $sub.numElements();
         |    for (int $ki = 0; $ki < $k; $ki++) {
         |      if ($cb.isNullAt($ki)) continue;
         |      final InternalRow $e = $cb.getStruct($ki, 2);
         |      if ($e.isNullAt(1)) continue;
         |      final ArrayData $esubs = $e.getArray(1);
         |      if ($mi >= $esubs.numElements() || $esubs.isNullAt($mi)) continue;
         |      final ArrayData $es = $esubs.getArray($mi);
         |      if ($es.numElements() != $n) continue;
         |      double $acc = 0.0;
         |      boolean $ok = true;
         |      for (int $i = 0; $i < $n; $i++) {
         |        if ($sub.isNullAt($i) || $es.isNullAt($i)) { $ok = false; break; }
         |        final double $dd = $sub.getDouble($i) - $es.getDouble($i);
         |        $acc += $dd * $dd;
         |      }
         |      if ($ok) $row[$ki] = (Object) $acc;
         |    }
         |  }
         |  $rows[$mi] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused coarse-assignment argmax for ss11/ss13's inverted-file build: the
  * `aggregate(anchors, (−∞,−1), argmax-by-cosine)` fold as ONE codegen'd
  * expression — the last interpreted per-row loop in the IVFADC build path
  * (N × ≤MaxAnchors interpreted lambda steps with an accumulator struct
  * allocation each; the [[PqEncode]] class of cost).
  *
  * children: vec array<double>, nrm double, anchors
  * array<struct<aid:long, av:array<double>, an:double>> (the aid-sorted
  * one-row broadcast). Bit-identical replay of the fold (pinned by
  * VectorExpressionsSpec): left-to-right strict-> argmax of
  * dot(vec,av)/(nrm·an) — ties keep the FIRST (lowest-aid) entry; a null
  * entry / null-or-ragged av makes the fold's cosine null, whose
  * `when(c > acc.c, …)` takes the otherwise branch — the entry is skipped;
  * a NaN cosine (NaN/Inf-bearing vectors) WINS the fold's `>` against any
  * non-NaN accumulator and loses against a NaN one — Spark compares
  * doubles with nanSafeCompareDoubles (NaN ordered greatest), and that
  * ordering is replicated here, not Java's compares-false NaN.
  * Divergence (documented, registry-unreachable): NULL top-level inputs
  * return NULL where the compose yields −1. */
case class CosineArgmax(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types._
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType,
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _),
              StructField(_, DoubleType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double, array<struct<long, array<double>, double>>), " +
          s"got ${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_argmax_cos"

  override def nullSafeEval(v: Any, n: Any, a: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val nrm = n.asInstanceOf[Double]
    val anchors = a.asInstanceOf[ArrayData]
    val d = vec.numElements()
    val k = anchors.numElements()
    var best = Double.NegativeInfinity
    var bestAid: Any = -1L
    var ki = 0
    while (ki < k) {
      if (!anchors.isNullAt(ki)) {
        val e = anchors.getStruct(ki, 3)
        if (!e.isNullAt(1) && !e.isNullAt(2)) {
          val av = e.getArray(1)
          if (av.numElements() == d) {
            var dot = 0.0
            var i = 0
            var isNull = false
            while (i < d && !isNull) {
              if (vec.isNullAt(i) || av.isNullAt(i)) isNull = true
              else { dot += vec.getDouble(i) * av.getDouble(i) }
              i += 1
            }
            if (!isNull && nrm * e.getDouble(2) != 0.0) {
              // zero divisor mirrors the fold: NULL cosine (non-ANSI
              // division) takes the otherwise branch = skip (under ANSI
              // the fold raises instead — documented, registry-unreachable)
              val c = dot / (nrm * e.getDouble(2))
              // Spark's GreaterThan orders NaN greatest — a NaN cosine wins
              // against any non-NaN best and loses to a NaN best
              val wins =
                if (java.lang.Double.isNaN(c)) !java.lang.Double.isNaN(best)
                else c > best
              if (wins) {
                best = c
                bestAid = if (e.isNullAt(0)) null else e.getLong(0)
              }
            }
          }
        }
      }
      ki += 1
    }
    bestAid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, nrm, anchors) => {
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val ki = ctx.freshName("ki")
      val best = ctx.freshName("best")
      val bestAid = ctx.freshName("bestAid")
      val bestNull = ctx.freshName("bestNull")
      val e = ctx.freshName("e")
      val av = ctx.freshName("av")
      val dot = ctx.freshName("dot")
      val dNull = ctx.freshName("dNull")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $d = $vec.numElements();
         |final int $k = $anchors.numElements();
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bestAid = -1L;
         |boolean $bestNull = false;
         |for (int $ki = 0; $ki < $k; $ki++) {
         |  if ($anchors.isNullAt($ki)) continue;
         |  final InternalRow $e = $anchors.getStruct($ki, 3);
         |  if ($e.isNullAt(1) || $e.isNullAt(2)) continue;
         |  final ArrayData $av = $e.getArray(1);
         |  if ($av.numElements() != $d) continue;
         |  double $dot = 0.0;
         |  boolean $dNull = false;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($vec.isNullAt($i) || $av.isNullAt($i)) { $dNull = true; break; }
         |    $dot += $vec.getDouble($i) * $av.getDouble($i);
         |  }
         |  if ($dNull || $nrm * $e.getDouble(2) == 0.0) continue;
         |  final double $c = $dot / ($nrm * $e.getDouble(2));
         |  // NaN-greatest, matching Spark's nanSafeCompareDoubles ordering
         |  if (Double.isNaN($c) ? !Double.isNaN($best) : ($c > $best)) {
         |    $best = $c;
         |    $bestNull = $e.isNullAt(0);
         |    $bestAid = $bestNull ? -1L : $e.getLong(0);
         |  }
         |}
         |${ev.isNull} = $bestNull;
         |${ev.value} = $bestAid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Fused nearest-centroid argmin for the dd11/ss09 assignment folds: the
  * `aggregate(cents, (MaxValue,−1), argmin-by-sqdist)` compose as ONE
  * codegen'd expression. children: vec array<double>, cents
  * array<struct<cid:long, cen:array<double>>> (cid-sorted one-row
  * broadcast). Bit-identical to the fold (VectorExpressionsSpec): strict-<
  * left-to-right argmin, ties keep the FIRST (lowest-cid) entry, null
  * entry / null-or-ragged cen skipped, NaN skipped (compares false).
  * Divergence (documented, registry-unreachable): NULL top-level inputs
  * return NULL where the compose yields −1. */
case class SqdistArgmin(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    import org.apache.spark.sql.types._
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<struct<long, array<double>>>), " +
          s"got ${a.catalogString} and ${b.catalogString}")
    }
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_argmin_sqd"

  override def nullSafeEval(v: Any, a: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = a.asInstanceOf[ArrayData]
    val d = vec.numElements()
    val k = cents.numElements()
    var best = Double.MaxValue
    var bestCid: Any = -1L
    var ki = 0
    while (ki < k) {
      if (!cents.isNullAt(ki)) {
        val e = cents.getStruct(ki, 2)
        if (!e.isNullAt(1)) {
          val cen = e.getArray(1)
          if (cen.numElements() == d) {
            var dd = 0.0
            var i = 0
            var isNull = false
            while (i < d && !isNull) {
              if (vec.isNullAt(i) || cen.isNullAt(i)) isNull = true
              else { val x = vec.getDouble(i) - cen.getDouble(i); dd += x * x }
              i += 1
            }
            if (!isNull && dd < best) {
              best = dd
              bestCid = if (e.isNullAt(0)) null else e.getLong(0)
            }
          }
        }
      }
      ki += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val ki = ctx.freshName("ki")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val bestNull = ctx.freshName("bestNull")
      val e = ctx.freshName("e")
      val cen = ctx.freshName("cen")
      val dd = ctx.freshName("dd")
      val dNull = ctx.freshName("dNull")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |final int $d = $vec.numElements();
         |final int $k = $cents.numElements();
         |double $best = Double.MAX_VALUE;
         |long $bestCid = -1L;
         |boolean $bestNull = false;
         |for (int $ki = 0; $ki < $k; $ki++) {
         |  if ($cents.isNullAt($ki)) continue;
         |  final InternalRow $e = $cents.getStruct($ki, 2);
         |  if ($e.isNullAt(1)) continue;
         |  final ArrayData $cen = $e.getArray(1);
         |  if ($cen.numElements() != $d) continue;
         |  double $dd = 0.0;
         |  boolean $dNull = false;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($vec.isNullAt($i) || $cen.isNullAt($i)) { $dNull = true; break; }
         |    final double $x = $vec.getDouble($i) - $cen.getDouble($i);
         |    $dd += $x * $x;
         |  }
         |  if ($dNull) continue;
         |  if ($dd < $best) {
         |    $best = $dd;
         |    $bestNull = $e.isNullAt(0);
         |    $bestCid = $bestNull ? -1L : $e.getLong(0);
         |  }
         |}
         |${ev.isNull} = $bestNull;
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused multi-table LSH bucket codes: the ss03 compose —
  * `transform(tables, tb => aggregate(bits, 0L, acc*2 + (dot(plane,vec)>=0)))`
  * — as ONE expression (L×B interpreted fold steps per corpus row before,
  * native dot inside each). Bit-identical replay: per table, bits fold
  * left-to-right as acc*2 + bit where bit=1 iff the plane·vec dot is
  * non-null and `>= 0` under Spark's NaN-greatest double ordering
  * (nanSafeCompareDoubles) — so a NaN dot yields bit=1, exactly as the
  * compose's GreaterThanOrEqual does, NOT Java's compares-false NaN; a
  * NULL dot (null element / length mismatch) takes the compose's
  * otherwise-0 branch; a NULL vector yields the compose's ALL-ZERO code
  * array (dot(plane, null) is null for every bit), so the expression is
  * never nullable. Plane multiplication/sum order matches the DotProduct
  * kernel exactly. */
case class LshCodes(child: Expression, planes: Seq[Seq[Seq[Double]]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val planesArr: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_codes"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    LshCodes.compute(child.eval(input).asInstanceOf[ArrayData], planesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val pRef = ctx.addReferenceObj("lshPlanes", planesArr, "double[][][]")
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${c.code}
      $jt ${ev.value} = graft.spark.LshCodes.compute(
        ${c.isNull} ? null : ${c.value}, $pRef);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshCodes {
  def compute(vec: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Long](planes.length)
    val n = if (vec == null) -1 else vec.numElements()
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var code = 0L
      var b = 0
      while (b < tbl.length) {
        val plane = tbl(b)
        var bit = 0L
        if (n == plane.length) {
          var d = 0.0
          var i = 0
          var isNull = false
          while (i < n && !isNull) {
            if (vec.isNullAt(i)) isNull = true
            else d += plane(i) * vec.getDouble(i)
            i += 1
          }
          // d >= 0 under Spark's NaN-greatest ordering: NaN ⇒ bit=1
          if (!isNull && (d >= 0 || java.lang.Double.isNaN(d))) bit = 1L
        }
        code = code * 2 + bit
        b += 1
      }
      out(t) = code
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object VectorExpressions {
  /** Codegen'd dot product over two `array<double>` columns. */
  def dot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))

  /** Codegen'd squared L2 distance over two `array<double>` columns. */
  def sqdist(a: Column, b: Column): Column =
    Shims.column(SquaredDistance(Shims.expression(a), Shims.expression(b)))

  /** Codegen'd PQ sub-code argmin over (subs, codebook); `m` is the fixed
    * subspace count the subs rows must carry — see [[PqEncode]]. */
  def pqEncode(subs: Column, cb: Column, m: Int): Column =
    Shims.column(PqEncode(Shims.expression(subs), Shims.expression(cb), m))

  /** Codegen'd ADC query-table build over (subs, codebook); same fixed-M
    * contract — see [[PqQueryTable]]. */
  def pqQueryTable(subs: Column, cb: Column, m: Int): Column =
    Shims.column(PqQueryTable(Shims.expression(subs), Shims.expression(cb), m))

  /** Codegen'd multi-table LSH bucket codes — see [[LshCodes]]. */
  def lshCodes(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    Shims.column(LshCodes(Shims.expression(vec), planes))

  /** Codegen'd nearest-anchor argmax-by-cosine — see [[CosineArgmax]]. */
  def cosArgmax(vec: Column, nrm: Column, anchors: Column): Column =
    Shims.column(CosineArgmax(Shims.expression(vec), Shims.expression(nrm),
      Shims.expression(anchors)))

  /** Codegen'd nearest-centroid argmin-by-sqdist — see [[SqdistArgmin]]. */
  def sqdArgmin(vec: Column, cents: Column): Column =
    Shims.column(SqdistArgmin(Shims.expression(vec), Shims.expression(cents)))

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
    },
    "pq_encode" -> {
      // the M must be a literal int — the fixed-M contract is part of the
      // expression, not data-dependent
      case Seq(a, b, org.apache.spark.sql.catalyst.expressions.Literal(m: Int, org.apache.spark.sql.types.IntegerType)) =>
        PqEncode(a, b, m)
      case args => throw new IllegalArgumentException(
        s"pq_encode(subs, codebook, m) takes 2 array arguments plus a literal int M, got ${args.length} argument(s)")
    })

  /** Session-wide registration of the vector surface (same caveats as
    * [[JsonataFunctions.registerNativeSql]]). */
  def registerNativeSql(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) => Shims.registerFunction(spark, name, b) }
}
