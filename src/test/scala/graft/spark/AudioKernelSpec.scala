package graft.spark

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The fused framing+energy kernel (FrameEnergies) must be BIT-EQUAL to the
  * HOF pipeline it replaced in mm07 — same code-point indexing, same
  * full-frames-only framing — on the real fixture and on adversarial
  * unicode/edge rows. The ONE intentional domain difference: the HOF's int
  * square RAISED an ANSI overflow error on |amplitude| > 46340, where the
  * kernel's long math is defined (third test below pins both sides). */
class AudioKernelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val F = 64

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

  /** The exact HOF formulation mm07 used before the kernel. */
  private def hofEnergies(text: Column): Column = {
    val amp = (fstr: Column, i: Column) => {
      val c = ascii(substring(fstr, i, lit(1))) - 96
      (c * c).cast("bigint")
    }
    val nf = (length(text) / F).cast("int")
    transform(
      transform(slice(sequence(lit(0), greatest(nf - 1, lit(0))), lit(1), nf),
        j => substring(text, j * F + 1, lit(F))),
      fstr => aggregate(sequence(lit(1), lit(F)), lit(0L), (a, i) => a + amp(fstr, i)))
  }

  private def assertEqual(df: DataFrame): Unit = {
    val cmp = df.select(
        FrameEnergies.column(col("text"), F, 96).as("kernel"),
        hofEnergies(col("text")).as("hof"))
      .filter(not(col("kernel") <=> col("hof")))
    assert(cmp.count() === 0, cmp.take(3).mkString("\n"))
  }

  test("kernel equals the HOF pipeline on the documents fixture") {
    assertEqual(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
  }

  test("kernel equals the HOF pipeline on unicode and edge rows") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      "", // empty -> no frames
      "a" * 63, // sub-frame tail only -> no frames
      "a" * 64, // exactly one frame
      "b" * 129, // two frames + dropped tail
      ("é€x" * 32), // multi-byte code points: 96 cps -> one frame
      "mixed ascii with spaces " * 10)
    assertEqual(rows.toDF("text"))
  }

  test("astral code points: long math where the HOF raised under ANSI") {
    val sp = spark; import sp.implicits._
    // (66376-96)^2 overflows int — the HOF form THREW here (ANSI multiply);
    // the kernel computes the square in long, extending the domain
    intercept[Exception] {
      Seq("𐍈" * 64).toDF("text").select(hofEnergies(col("text"))).collect()
    }
    val d = 66376L - 96L
    val got = Seq("𐍈" * 64, "a𐍈b" * 100).toDF("text")
      .select(FrameEnergies.column(col("text"), F, 96).as("es")).collect()
    assert(got(0).getSeq[Long](0) == Seq(64L * d * d))
    // surrogate pairs advance two UTF-16 units but count one sample:
    // 300 cps -> 4 full frames
    assert(got(1).getSeq[Long](0).length == 300 / F)
  }

  test("kernel is measurably faster than the HOF pipeline on repeated fixture text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).cache()
    docs.count()
    def time(c: Column): Double = {
      val t0 = System.nanoTime()
      docs.select(sum(aggregate(c, lit(0L), (a, v) => a + v))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(FrameEnergies.column(col("text"), F, 96)) // warm
    time(hofEnergies(col("text"))) // warm
    val k = time(FrameEnergies.column(col("text"), F, 96))
    val h = time(hofEnergies(col("text")))
    info(f"kernel=$k%.3fs hof=$h%.3fs speedup=${h / k}%.1fx")
    docs.unpersist()
    // no hard assert on the ratio (CI noise) — the pin is bit-equality above;
    // the measured ratio is recorded via info() for BASELINE.md
    assert(k > 0 && h > 0)
  }
}
