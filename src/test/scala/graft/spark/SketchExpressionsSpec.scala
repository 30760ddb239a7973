package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** The native sketch kernels must be bit-identical to the HOF formulations
  * they replaced, on real corpus data — same wrap-around arithmetic, same
  * empty-array behavior — or the DuckDB oracles replaying the sketches in
  * SQL would silently diverge. Coefficients come from graft.ops.Dedup (the
  * production scheme), the HOF references from [[SketchHofReference]]. */
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

  private def permA = Dedup.permA.toIndexedSeq
  private def permB = Dedup.permB.toIndexedSeq

  private def docHashes = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), transform(split(lower(col("text")), " "), w => xxhash64(w)).as("wh"))

  test("minhash signature bit-identical to the HOF form on the real corpus") {
    val rows = docHashes
      .select(SketchExpressions.minhashSig(col("wh"), permA, permB, Dedup.Mask).as("fast"),
        SketchHofReference.hofMinhash(col("wh"), permA, permB, Dedup.Mask).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "signature mismatch")
    }
  }

  test("simhash bit-identical to the HOF form on the real corpus") {
    val rows = docHashes
      .select(SketchExpressions.simhash32(col("wh")).as("fast"),
        SketchHofReference.hofSimhash(col("wh")).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"simhash mismatch: $r"))
  }

  test("empty array: minhash all-MaxValue, simhash all bits set; null array -> null") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Some(Seq.empty[Long])), (Option.empty[Seq[Long]])).toDF("wh")
    val rows = df.select(
      SketchExpressions.minhashSig(col("wh"), permA, permB, Dedup.Mask).as("sig"),
      SketchExpressions.simhash32(col("wh")).as("sim")).collect()
    assert(rows(0).getSeq[Long](0) == Seq.fill(Dedup.P)(Long.MaxValue))
    assert(rows(0).getLong(1) == 0xFFFFFFFFL)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("ShingleHashes bit-identical to the two-layer HOF compose (real corpus + adversarial texts)") {
    val sp = spark
    import sp.implicits._
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.select(
        SketchExpressions.shingleHashes(col("text")).as("fast"),
        Dedup.shingleHashesCompose(col("text")).as("ref")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
        if (!r.isNullAt(0))
          assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"shingle mismatch: $r")
      }
    }
    check(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    // adversarial: multi-space runs (empty tokens hash too), sub-trigram
    // docs (empty SET, not null), duplicate shingles (first-occurrence
    // distinct order), unicode + case folding, null text
    check(Seq(
      Option("a  b   c a  b   c"), Option("one two"), Option(""), Option("  "),
      Option("x y z x y z x y z"), Option("ÅÄÖ Istá ß ÅÄÖ Istá ß mixED Case tokens"),
      Option("w1 w2 w3 w4 w5 w6 w7"), None).toDF("text"))
  }

  test("ShingleHashes: both eval paths agree") {
    val sp = spark
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val fast = df.select(col("doc_id"), SketchExpressions.shingleHashes(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(col("doc_id"), SketchExpressions.shingleHashes(col("text")).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fast == interp)
    } finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("WordHashes and SpanHashes bit-identical to their composes") {
    val sp = spark
    import sp.implicits._
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val base = df.withColumn("whf", SketchExpressions.wordHashes(col("text")))
        .withColumn("whr", Dedup.wordHashesCompose(col("text")))
      val rows = base.select(
        col("whf"), col("whr"),
        SketchExpressions.spanHashes(col("whf"), 5).as("spf"),
        Dedup.spansFromWhCompose(col("whr"), 5).as("spr"),
        SketchExpressions.spanHashes(col("whf"), 1).as("sp1f"),
        Dedup.spansFromWhCompose(col("whr"), 1).as("sp1r")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"wh null mismatch: $r")
        if (!r.isNullAt(0)) assert(r.getSeq[Long](0) == r.getSeq[Long](1), "wh mismatch")
        assert(r.getSeq[Long](2) == r.getSeq[Long](3), "span k=5 mismatch")
        assert(r.getSeq[Long](4) == r.getSeq[Long](5), "span k=1 mismatch")
      }
    }
    check(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    // adversarial: multi-space, sub-K, empty, unicode case folds, null text
    // (wordHashes compose is NULL on null text; spans of that null array
    // collapse to the compose's empty set — both replayed)
    check(Seq(Option("a  b   c"), Option("one two"), Option(""), Option("  "),
      Option("ÅÄÖ Istá ß MiXeD"), None).toDF("text"))
  }

  test("SpanHashes rejects null-bearing element arrays at analysis") {
    // the kernel reads getLong without per-element null checks, so a
    // containsNull=true input must fail analysis rather than silently
    // hashing a garbage slot where the xxhash64 compose skips nulls
    val sp = spark
    import sp.implicits._
    val df = Seq(Seq[java.lang.Long](1L, null, 3L)).toDF("wh")
    val e = intercept[Exception](
      df.select(SketchExpressions.spanHashes(col("wh"), 2)).collect())
    assert(e.getMessage.contains("non-nullable"), e.getMessage)
  }

  test("interpreted eval agrees with codegen") {
    val sp = spark
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = docHashes.limit(50)
        .select(SketchExpressions.minhashSig(col("wh"), permA, permB, Dedup.Mask).as("fast"),
          SketchHofReference.hofMinhash(col("wh"), permA, permB, Dedup.Mask).as("ref"),
          SketchExpressions.simhash32(col("wh")).as("sfast"),
          SketchHofReference.hofSimhash(col("wh")).as("sref"))
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
