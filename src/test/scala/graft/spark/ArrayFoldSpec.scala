package graft.spark

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, LongType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[NumArrayFold]] must be value-identical (bitwise for doubles) to the
  * filter→transform→aggregate / array_min / array_max compose it replaced
  * in the compiled $sum/$min/$max/$average consumers — on both eval paths,
  * across nulls, NaNs, empties, all-null arrays, and every numeric width.
  */
class ArrayFoldSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // ---- the replaced composes (the round-11 compiler forms, verbatim) ----
  private def refSumD(c: Column): Column = {
    val vs = transform(filter(c, x => x.isNotNull), x => x.cast("double"))
    when(c.isNotNull, aggregate(vs, lit(0.0), (a, x) => a + x))
  }
  private def refSumL(c: Column): Column = {
    val vs = transform(filter(c, x => x.isNotNull), x => x.cast("bigint"))
    when(c.isNotNull, aggregate(vs, lit(0L), (a, x) => a + x))
  }
  private def refMinMax(c: Column, mn: Boolean, dt: String): Column = {
    val vs = transform(filter(c, x => x.isNotNull), x => x.cast(dt))
    if (mn) array_min(vs) else array_max(vs)
  }
  private def refCnt(c: Column): Column =
    size(filter(c, x => x.isNotNull)).cast("bigint")

  private def doubleCases: Seq[Option[Seq[Option[Double]]]] = {
    val rnd = new scala.util.Random(4127L)
    val specials = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, 0.0, Double.MinPositiveValue)
    val normal = (1 to 80).map { _ =>
      Some(Seq.fill(rnd.nextInt(8))(
        if (rnd.nextInt(5) == 0) None
        else if (rnd.nextInt(6) == 0) Some(specials(rnd.nextInt(specials.length)))
        else Some(rnd.nextDouble() * 200 - 100)))
    }
    val edge: Seq[Option[Seq[Option[Double]]]] = Seq(
      None,                                  // null array -> null
      Some(Seq.empty),                       // empty: sum 0, min/max null
      Some(Seq(None, None)),                 // all-null: sum 0, min/max null
      Some(Seq(Some(Double.NaN))),           // all-NaN: min = max = NaN
      Some(Seq(Some(Double.NaN), Some(1.0))), // NaN greatest: max NaN, min 1
      Some(Seq(Some(-0.0), Some(0.0))))      // signed zero ordering
    normal ++ edge
  }

  private def checkDouble(): Unit = {
    val sp = spark
    import sp.implicits._
    val df = doubleCases.toDF("a")
    val rows = df.select(
      NumArrayFold.sum(col("a"), long = false).as("s"), refSumD(col("a")).as("rs"),
      NumArrayFold.min(col("a"), DoubleType).as("mn"), refMinMax(col("a"), mn = true, "double").as("rmn"),
      NumArrayFold.max(col("a"), DoubleType).as("mx"), refMinMax(col("a"), mn = false, "double").as("rmx"),
      NumArrayFold.cnt(col("a")).as("c"), refCnt(col("a")).as("rc"),
      col("a")).collect()
    rows.foreach { r =>
      Seq((0, 1), (2, 3), (4, 5), (6, 7)).foreach { case (f, g) =>
        assert(r.isNullAt(f) == r.isNullAt(g), s"null mismatch at $f: $r")
        if (!r.isNullAt(f) && f < 6)
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(f)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(g)), s"bits mismatch at $f: $r")
        if (!r.isNullAt(f) && f == 6) assert(r.getLong(6) == r.getLong(7), s"cnt: $r")
      }
    }
  }

  private def checkLong(): Unit = {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(913L)
    val cases: Seq[Option[Seq[Option[Long]]]] =
      (1 to 60).map(_ => Some(Seq.fill(rnd.nextInt(6))(
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextLong() % 1000000)))) ++
        Seq(None, Some(Seq.empty), Some(Seq(None)))
    val df = cases.toDF("a")
    val rows = df.select(
      NumArrayFold.sum(col("a"), long = true).as("s"), refSumL(col("a")).as("rs"),
      NumArrayFold.min(col("a"), LongType).as("mn"), refMinMax(col("a"), mn = true, "bigint").as("rmn"),
      NumArrayFold.max(col("a"), LongType).as("mx"), refMinMax(col("a"), mn = false, "bigint").as("rmx"),
      (when(NumArrayFold.cnt(col("a")) > 0,
        NumArrayFold.sum(col("a"), long = false) / NumArrayFold.cnt(col("a")))).as("av"),
      (when(size(filter(col("a"), x => x.isNotNull)) > 0,
        aggregate(transform(filter(col("a"), x => x.isNotNull), _.cast("double")),
          lit(0.0), (a, x) => a + x) / size(filter(col("a"), x => x.isNotNull)))).as("rav"))
      .collect()
    rows.foreach { r =>
      Seq((0, 1), (2, 3), (4, 5), (6, 7)).foreach { case (f, g) =>
        assert(r.isNullAt(f) == r.isNullAt(g), s"null mismatch at $f: $r")
        if (!r.isNullAt(f)) assert(r.get(f) == r.get(g), s"value mismatch at $f: $r")
      }
    }
  }

  private def checkFloat(): Unit = {
    val sp = spark
    import sp.implicits._
    val cases: Seq[Option[Seq[Option[Float]]]] = Seq(
      Some(Seq(Some(1.5f), Some(Float.NaN), None, Some(-2.25f))),
      Some(Seq(Some(Float.NaN))), Some(Seq.empty), None,
      Some(Seq(Some(0.0f), Some(-0.0f))))
    val df = cases.toDF("a")
    val rows = df.select(
      NumArrayFold.min(col("a"), FloatType).as("mn"), refMinMax(col("a"), mn = true, "float").as("rmn"),
      NumArrayFold.max(col("a"), FloatType).as("mx"), refMinMax(col("a"), mn = false, "float").as("rmx"),
      NumArrayFold.sum(col("a"), long = false).as("s"), refSumD(col("a")).as("rs")).collect()
    rows.foreach { r =>
      Seq((0, 1), (2, 3), (4, 5)).foreach { case (f, g) =>
        assert(r.isNullAt(f) == r.isNullAt(g), s"null mismatch at $f: $r")
        if (!r.isNullAt(f)) assert(r.get(f).toString == r.get(g).toString, s"value mismatch at $f: $r")
      }
    }
  }

  test("fold equals the lambda compose on doubles/longs/floats (codegen path)") {
    checkDouble(); checkLong(); checkFloat()
  }

  test("interpreted eval agrees with codegen") {
    val sp = spark
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try { checkDouble(); checkLong(); checkFloat() }
    finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("several folds over a NON-NULLABLE array compile in one codegen function") {
    // When the child is non-nullable, nullSafeExec inlines each fold's body
    // WITHOUT its own braces — so two folds in one generated function
    // (exactly the $average cnt+sum pair) would collide on fixed local
    // names and fail Janino, silently dropping to interpreted eval. Fresh
    // names per instance are the fix; fallback is disabled here so a
    // collision fails the test instead of hiding.
    val sp = spark
    import sp.implicits._
    sp.conf.set("spark.sql.codegen.fallback", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq((1.0, 2.0), (3.0, 4.0)).toDF("x", "y")
        .select(array(col("x"), col("y")).as("a"))
      assert(!df.schema("a").nullable, "fixture must be non-nullable to pin the inline path")
      val r = df.select(
        NumArrayFold.sum(col("a"), long = false).as("s"),
        NumArrayFold.cnt(col("a")).as("c"),
        NumArrayFold.min(col("a"), DoubleType).as("mn"),
        NumArrayFold.max(col("a"), DoubleType).as("mx"))
        .orderBy(col("s")).collect()
      assert(r.map(_.getDouble(0)).toSeq == Seq(3.0, 7.0))
      assert(r.map(_.getLong(1)).toSeq == Seq(2L, 2L))
      assert(r.map(_.getDouble(2)).toSeq == Seq(1.0, 3.0))
      assert(r.map(_.getDouble(3)).toSeq == Seq(2.0, 4.0))
    } finally {
      sp.conf.set("spark.sql.codegen.fallback", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("long sum wraps like the legacy (non-ANSI) add it replaced") {
    val sp = spark
    import sp.implicits._
    // the compiler's compose summed through EvalMode.LEGACY arithmetic,
    // which wraps — the ANSI lambda `+` would raise here instead
    val r = Seq(Some(Seq(Some(Long.MaxValue), Some(1L)))).toDF("a")
      .select(NumArrayFold.sum(col("a"), long = true)).collect().head
    assert(r.getLong(0) == Long.MinValue)
  }

  test("int elements widen exactly; analysis rejects bad op/type pairs") {
    val sp = spark
    import sp.implicits._
    val df = Seq(Some(Seq(Some(3), None, Some(4)))).toDF("a")
    val r = df.select(
      NumArrayFold.sum(col("a"), long = true).as("s"),
      NumArrayFold.min(col("a"), LongType).as("mn"),
      NumArrayFold.cnt(col("a")).as("c")).collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    // float MIN must carry the FLOAT result type, never silently widen
    intercept[Exception] {
      Seq(Some(Seq(Some(1.5f)))).toDF("a")
        .select(NumArrayFold.min(col("a"), DoubleType)).collect()
    }
    // a string array is not a numeric fold
    intercept[Exception] {
      Seq(Some(Seq(Some("x")))).toDF("a")
        .select(NumArrayFold.cnt(col("a"))).collect()
    }
  }
}
