package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, EvalMode, Multiply}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native sketch kernels must be bit-identical to the HOF formulations
  * they replaced, on real corpus data — same wrap-around arithmetic, same
  * empty-array behavior — or the DuckDB oracles replaying the sketches in
  * SQL would silently diverge. */
class SketchExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // the exact coefficient scheme Dedup uses
  private val P = 64
  private val Mask = (1L << 61) - 1
  private val permA = Seq.tabulate(P)(i => 2L * (1103515245L * (i + 1) + 12345L) + 1L)
  private val permB = Seq.tabulate(P)(i => 6364136223846793005L * (i + 7) + 1442695040888963407L)

  private def wrapMul(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Shims.column(Multiply(Shims.expression(a), Shims.expression(b), EvalMode.LEGACY))
  private def wrapAdd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Shims.column(Add(Shims.expression(a), Shims.expression(b), EvalMode.LEGACY))

  private def hofMinhash(sh: org.apache.spark.sql.Column) = {
    val aC = array(permA.map(lit): _*)
    val bC = array(permB.map(lit): _*)
    transform(sequence(lit(0), lit(P - 1)), i =>
      aggregate(sh, lit(Long.MaxValue),
        (acc, h) => least(acc, wrapAdd(wrapMul(h, get(aC, i)), get(bC, i)).bitwiseAND(lit(Mask)))))
  }

  private def hofSimhash(wh: org.apache.spark.sql.Column) =
    aggregate(sequence(lit(31), lit(0), lit(-1)), lit(0L), (acc, i) =>
      acc * 2 + when(aggregate(wh, lit(0L), (a2, h) =>
        a2 + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) >= 0, 1L).otherwise(0L))

  private def docHashes = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), transform(split(lower(col("text")), " "), w => xxhash64(w)).as("wh"))

  test("minhash signature bit-identical to the HOF form on the real corpus") {
    val rows = docHashes
      .select(SketchExpressions.minhashSig(col("wh"), permA, permB, Mask).as("fast"),
        hofMinhash(col("wh")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "signature mismatch")
    }
  }

  test("simhash bit-identical to the HOF form on the real corpus") {
    val rows = docHashes
      .select(SketchExpressions.simhash32(col("wh")).as("fast"),
        hofSimhash(col("wh")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"simhash mismatch: $r"))
  }

  test("empty array: minhash all-MaxValue, simhash all bits set; null array -> null") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Some(Seq.empty[Long])), (Option.empty[Seq[Long]])).toDF("wh")
    val rows = df.select(
      SketchExpressions.minhashSig(col("wh"), permA, permB, Mask).as("sig"),
      SketchExpressions.simhash32(col("wh")).as("sim")).collect()
    assert(rows(0).getSeq[Long](0) == Seq.fill(P)(Long.MaxValue))
    assert(rows(0).getLong(1) == 0xFFFFFFFFL)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("interpreted eval agrees with codegen") {
    val sp = spark
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = docHashes.limit(50)
        .select(SketchExpressions.minhashSig(col("wh"), permA, permB, Mask).as("fast"),
          hofMinhash(col("wh")).as("ref"),
          SketchExpressions.simhash32(col("wh")).as("sfast"),
          hofSimhash(col("wh")).as("sref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
        assert(r.getLong(2) == r.getLong(3))
      }
    } finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
