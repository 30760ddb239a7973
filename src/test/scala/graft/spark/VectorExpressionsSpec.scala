package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** DotProduct must be bit-identical to the HOF formulation it replaces
  * (same left-to-right FP order) across normal, null, empty, and
  * length-mismatched inputs, in both codegen and interpreted evaluation. */
class VectorExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def cases = {
    val rnd = new scala.util.Random(42)
    val normal = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(8)
      (Seq.fill(n)(Option(rnd.nextDouble() * 20 - 10)),
        Seq.fill(n)(Option(rnd.nextDouble() * 20 - 10)))
    }
    val edge = Seq(
      (Seq.empty[Option[Double]], Seq.empty[Option[Double]]),              // empty -> 0.0
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0))),                         // mismatch -> null
      (Seq(Some(1.0), None), Seq(Some(3.0), Some(4.0))),                   // null elem -> null
      (Seq(Some(1e308), Some(1e308)), Seq(Some(2.0), Some(2.0))))          // overflow -> Infinity
    normal ++ edge
  }

  test("bit-identical to the zip_with/aggregate formulation (codegen path)") {
    val sp = spark
    import sp.implicits._
    val df = cases.toDF("a", "b")
    val rows = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("ref")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"value mismatch: $r")
    }
  }

  test("interpreted eval agrees with codegen") {
    val sp = spark
    import sp.implicits._
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = cases.toDF("a", "b")
      val rows = df.select(
        VectorExpressions.dot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("ref")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
        if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"value mismatch: $r")
      }
    } finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null array input yields null") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val out = df.select(VectorExpressions.dot(col("a"), col("b")).as("d"))
    assert(out.collect().head.isNullAt(0))
  }

  test("vec_dot reachable from SQL via registerNativeSql; cosine composes") {
    VectorExpressions.registerNativeSql(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .createOrReplaceTempView("vx")
    val r = spark.sql(
      """SELECT vec_dot(vec, vec) AS d,
                vec_dot(vec, vec) / (sqrt(vec_dot(vec, vec)) * sqrt(vec_dot(vec, vec))) AS cos1
         FROM vx LIMIT 5""").collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getDouble(0) > 0)
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-12) // self-cosine = 1
    }
    val bad = intercept[Exception](spark.sql("SELECT vec_dot(array(1.0))").collect())
    assert(bad.getMessage.contains("takes 2 arguments"), bad.getMessage)
  }

  test("stays inside whole-stage codegen on a parquet-backed scan") {
    // local relations constant-fold, so the codegen pin needs a real scan
    val v = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val out = v.select(VectorExpressions.dot(col("vec"), col("vec")).as("d"))
    val plan = out.queryExecution.executedPlan.toString
    // the `*(N)` prefix marks a whole-stage-codegen span; vec_dot must be
    // inside one, not a fallback Project
    assert("\\*\\(\\d+\\) Project \\[vec_dot".r.findFirstIn(plan).isDefined, plan.take(2000))
    assert(out.filter(col("d") > 0).count() > 0)
  }

  private def hofSqd = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  test("SquaredDistance bit-identical to the zip_with/aggregate formulation (both eval paths)") {
    val sp = spark
    import sp.implicits._
    val df = cases.toDF("a", "b")
    def check(): Unit = {
      val rows = df.select(
        VectorExpressions.sqdist(col("a"), col("b")).as("fast"),
        hofSqd(col("a"), col("b")).as("ref")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
        if (!r.isNullAt(0))
          assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"value mismatch: $r")
      }
    }
    check() // codegen path
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check() // interpreted path
    finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
