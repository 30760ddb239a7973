package graft.spark

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a real aggregate function.
  *
  * A proper [[TypedImperativeAggregate]]: each map task reduces its slice to
  * a ≤k-element heap per group before the shuffle (PARTIAL aggregation), the
  * exchange carries at most k·groups·tasks entries, and the final merge is
  * k-way per group — no sort of the relation ever happens; admission is one
  * O(log k) compare-and-replace per row. The same bounded-state shape is
  * what q08's global TakeOrderedAndProject does for ONE group; this is the
  * grouped version Spark lacks as a builtin aggregate.
  *
  * Measured against the `row_number() OVER (...) <= k` window formulation
  * (scratch/ProfTopK, 10M rows / 1000 groups / k=10): shuffle volume is at
  * PARITY (3.7 vs 3.9 MB) — Spark 4's WindowGroupLimit also prunes rank
  * filters map-side — and wall time is comparable. What the aggregate adds:
  * (a) no per-task O(n log n) sort (heap admission is O(n log k)); (b) the
  * top-k arrives as ONE compact array row per group, composable inside a
  * wider agg or broadcastable downstream without a second rollup; (c) the
  * bound holds in contexts the WindowGroupLimit rewrite cannot see (the
  * rank filter must be syntactically adjacent for Spark to push it).
  *
  * Semantics: among input rows, the k largest by `(score, then LOWER id
  * wins ties)`; rows where score or id is NULL are ignored. Result is
  * `array<struct<score:bigint, id:bigint>>` sorted best-first — exactly the
  * rows `row_number() OVER (ORDER BY score DESC, id ASC) <= k` keeps, so a
  * SQL oracle can mirror it verbatim. Both inputs are BIGINT: integer scores
  * (token counts, byte sizes, quality ranks) sidestep any cross-engine
  * float-ordering hazard at the driver's hash gate.
  */
case class TopKByLong(
    score: Expression,
    id: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  // k must be a positive integer literal: it sizes every heap up front and
  // a per-row k has no sane merge semantics
  private lazy val kVal: Int = k match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"topk_by: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == LongType && id.dataType == LongType && kVal > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (score: bigint, id: bigint, k: positive int literal), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString}, k=$kVal)")

  override def children: Seq[Expression] = Seq(score, id, k)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByLong.resultType
  override def prettyName: String = "topk_by"

  // heap head = the WORST kept entry (lowest score; ties: highest id), so
  // one O(log k) compare-and-replace admits or rejects each row
  private def worstFirst: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](worstFirst)

  private def admit(heap: mutable.PriorityQueue[(Long, Long)], s: Long, i: Long): Unit =
    if (heap.size < kVal) heap.enqueue((s, i))
    else {
      val (ws, wi) = heap.head
      // better than the worst kept: higher score, or same score and lower id
      if (s > ws || (s == ws && i < wi)) { heap.dequeue(); heap.enqueue((s, i)) }
    }

  override def update(heap: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      admit(heap, sv.asInstanceOf[Long], iv.asInstanceOf[Long])
    heap
  }

  override def merge(heap: mutable.PriorityQueue[(Long, Long)],
                     other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach { case (s, i) => admit(heap, s, i) }
    heap
  }

  override def eval(heap: mutable.PriorityQueue[(Long, Long)]): Any = {
    val best = heap.toArray.sortBy { case (s, i) => (-s, i) } // best-first
    new GenericArrayData(best.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(heap: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * heap.size)
    bb.putInt(heap.size)
    heap.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var j = 0
    while (j < n) { heap.enqueue((bb.getLong, bb.getLong)); j += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), k = newChildren(2))
}

object TopKByLong {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
}

/** [[TopKByLong]] with a DOUBLE score — the similarity-search shape (cosine
  * relevance top-C per query) where a per-group `row_number` window would
  * sort the whole corpus slice per group. Comparison semantics mirror Spark
  * SQL's double ordering where it matters for agreement with the windowed
  * form: -0.0 ties 0.0 (primitive compares, not IEEE total order). NaN
  * scores are ignored at admission (a NaN relevance is a broken input, and
  * NaN admission order would be merge-order-dependent). */
case class TopKByDouble(
    score: Expression,
    id: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  private lazy val kVal: Int = k match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"topk_by_double: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType && kVal > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (score: double, id: bigint, k: positive int literal), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString}, k=$kVal)")

  override def children: Seq[Expression] = Seq(score, id, k)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByDouble.resultType
  override def prettyName: String = "topk_by_double"

  // head = WORST kept (lowest score; ties: highest id); primitive compares
  private def worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      if (a._1 < b._1) 1
      else if (a._1 > b._1) -1
      else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def admit(heap: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit =
    if (s != s) () // NaN
    else if (heap.size < kVal) heap.enqueue((s, i))
    else {
      val (ws, wi) = heap.head
      if (s > ws || (s == ws && i < wi)) { heap.dequeue(); heap.enqueue((s, i)) }
    }

  override def update(heap: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      admit(heap, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    heap
  }

  override def merge(heap: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => admit(heap, s, i) }
    heap
  }

  override def eval(heap: mutable.PriorityQueue[(Double, Long)]): Any = {
    // worstFirst ranks the best entry LEAST, so an ascending sort by it is
    // best-first
    val best = heap.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(heap: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * heap.size)
    bb.putInt(heap.size)
    heap.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var j = 0
    while (j < n) { heap.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDouble =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDouble =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), k = newChildren(2))
}

object TopKByDouble {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
}

object TopKAggregate {
  /** `topk_by(score, id, k)` as a typed Column aggregate: the k best
    * (score desc, id asc) pairs per group, best-first. */
  def topkBy(score: Column, id: Column, k: Int): Column =
    Shims.column(TopKByLong(Shims.expression(score), Shims.expression(id),
      Literal(k)).toAggregateExpression())

  /** Double-score variant (cosine/score top-C per group). */
  def topkByDouble(score: Column, id: Column, k: Int): Column =
    Shims.column(TopKByDouble(Shims.expression(score), Shims.expression(id),
      Literal(k)).toAggregateExpression())

  private[spark] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "topk_by" -> {
      case Seq(s, i, k) => TopKByLong(s, i, k).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"topk_by(score, id, k) takes 3 arguments, got ${args.length}")
    },
    "topk_by_double" -> {
      case Seq(s, i, k) => TopKByDouble(s, i, k).toAggregateExpression()
      case args => throw new IllegalArgumentException(
        s"topk_by_double(score, id, k) takes 3 arguments, got ${args.length}")
    })

  def registerNativeSql(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, b) => Shims.registerFunction(spark, name, b) }
}
