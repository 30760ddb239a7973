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

  // ---- PqEncode: the fused M×K argmin must replay the transform+aggregate
  // compose it replaced in ops/Similarity.scala pqEncode bit-for-bit ----

  /** The EXACT former compose (interpreted HOF fold over the codebook with
    * the native sqdist inside), kept here as the reference semantics. */
  private def pqRef(subs: org.apache.spark.sql.Column,
                    cb: org.apache.spark.sql.Column, m: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(m - 1)), mi =>
      aggregate(cb,
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("j")),
        (acc, e) => {
          val dd = VectorExpressions.sqdist(get(subs, mi), get(e.getField("subs"), mi))
          when(dd < acc.getField("d"),
            struct(dd.as("d"), e.getField("j").as("j"))).otherwise(acc)
        },
        acc => acc.getField("j")))

  private def pqCases: Seq[PqCase] = {
    val rnd = new scala.util.Random(7)
    def vec(n: Int): Seq[Option[Double]] = Seq.fill(n)(Some(rnd.nextDouble() * 4 - 2))
    def subs(m: Int, n: Int): Seq[Option[Seq[Option[Double]]]] =
      Seq.fill(m)(Some(vec(n)))
    val m = 4; val n = 3
    val normal = (0 until 120).map { _ =>
      val k = 1 + rnd.nextInt(6)
      PqCase(Some(subs(m, n)),
        (0 until k).map(j => Some(PqEntry(Some(j), Some(subs(m, n))))))
    }
    val shared = subs(m, n)
    val edges = Seq(
      // exact tie: identical entries at j=0 and j=1 -> strict < keeps j=0
      PqCase(Some(shared), Seq(Some(PqEntry(Some(0), Some(shared))),
        Some(PqEntry(Some(1), Some(shared))))),
      // empty codebook -> all -1
      PqCase(Some(subs(m, n)), Seq.empty),
      // null codebook ENTRY is skipped (fold: getField on null -> null dd)
      PqCase(Some(subs(m, n)), Seq(None, Some(PqEntry(Some(5), Some(subs(m, n)))))),
      // entry with null subs is skipped
      PqCase(Some(subs(m, n)), Seq(Some(PqEntry(Some(0), None)),
        Some(PqEntry(Some(1), Some(subs(m, n)))))),
      // ragged entry subvector (len 2 vs 3) is skipped for that m
      PqCase(Some(subs(m, n)), Seq(
        Some(PqEntry(Some(0), Some(Seq(Some(vec(2)), Some(vec(n)), Some(vec(n)), Some(vec(n)))))),
        Some(PqEntry(Some(1), Some(subs(m, n)))))),
      // null element INSIDE a row subvector -> every entry skipped for that m -> -1
      PqCase(Some(Seq(Some(Seq(Some(1.0), None, Some(2.0))), Some(vec(n)), Some(vec(n)), Some(vec(n)))),
        (0 until 3).map(j => Some(PqEntry(Some(j), Some(subs(m, n)))))),
      // null row subvector at m=0 -> -1 there
      PqCase(Some(Seq(None, Some(vec(n)), Some(vec(n)), Some(vec(n)))),
        (0 until 3).map(j => Some(PqEntry(Some(j), Some(subs(m, n)))))),
      // null j on the winning entry propagates as a null code element
      PqCase(Some(shared), Seq(Some(PqEntry(None, Some(shared))))))
    normal ++ edges
  }

  test("PqEncode bit-identical to the transform+aggregate compose (both eval paths)") {
    val sp = spark
    import sp.implicits._
    val df = pqCases.toDF("subs", "cb")
    def check(): Unit = {
      val rows = df.select(
        VectorExpressions.pqEncode(col("subs"), col("cb"), 4).as("fast"),
        pqRef(col("subs"), col("cb"), 4).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Any](0) == r.getSeq[Any](1), s"mismatch: $r")
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

  /** The EXACT former compose for the query tables (nested transforms). */
  private def qtabRef(subs: org.apache.spark.sql.Column,
                      cb: org.apache.spark.sql.Column, m: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(m - 1)), mi =>
      transform(cb, e =>
        VectorExpressions.sqdist(get(subs, mi), get(e.getField("subs"), mi))))

  test("PqQueryTable bit-identical to the nested-transform compose (both eval paths)") {
    val sp = spark
    import sp.implicits._
    val df = pqCases.toDF("subs", "cb")
    def check(): Unit = {
      val rows = df.select(
        VectorExpressions.pqQueryTable(col("subs"), col("cb"), 4).as("fast"),
        qtabRef(col("subs"), col("cb"), 4).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Seq[Any]](0) == r.getSeq[Seq[Any]](1), s"mismatch: $r")
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

  // ---- CosineArgmax / SqdistArgmin: the fused assignment argmax/argmin
  // must replay the aggregate folds they replaced bit-for-bit ----

  private def argmaxRef(vec: org.apache.spark.sql.Column, nrm: org.apache.spark.sql.Column,
                        anchors: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(anchors,
      struct(lit(Double.NegativeInfinity).as("c"), lit(-1L).as("aid")),
      (acc, a) => {
        val c = VectorExpressions.dot(vec, a.getField("av")) / (nrm * a.getField("an"))
        when(c > acc.getField("c"),
          struct(c.as("c"), a.getField("aid").as("aid"))).otherwise(acc)
      },
      acc => acc.getField("aid"))

  private def argminRef(vec: org.apache.spark.sql.Column,
                        cents: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(cents,
      struct(lit(Double.MaxValue).as("d2"), lit(-1L).as("cid")),
      (acc, c) => {
        val d2 = VectorExpressions.sqdist(vec, c.getField("cen"))
        when(d2 < acc.getField("d2"),
          struct(d2.as("d2"), c.getField("cid").as("cid"))).otherwise(acc)
      },
      acc => acc.getField("cid"))

  test("CosineArgmax and SqdistArgmin bit-identical to their folds (both eval paths)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(31)
    def vec(n: Int): Seq[Option[Double]] = Seq.fill(n)(Some(rnd.nextDouble() * 2 - 1))
    val dim = 4
    val normal = (0 until 150).map { _ =>
      val k = 1 + rnd.nextInt(7)
      val v = vec(dim)
      val nrm = math.sqrt(v.flatten.map(x => x * x).sum)
      ArgCase(Some(v), Some(nrm),
        (0 until k).map(j => Some(AnchorEntry(Some(j.toLong), Some(vec(dim)), Some(1.0 + j)))))
    }
    val shared = vec(dim)
    val edges = Seq(
      // exact tie (identical anchors at aid 0 and 1) -> first wins
      ArgCase(Some(shared), Some(1.0), Seq(
        Some(AnchorEntry(Some(0L), Some(shared), Some(2.0))),
        Some(AnchorEntry(Some(1L), Some(shared), Some(2.0))))),
      // empty anchor array -> -1
      ArgCase(Some(vec(dim)), Some(1.0), Seq.empty),
      // null entry skipped; ragged av skipped (zero-norm NaN is pinned
      // separately below: under ANSI the fold's division RAISES where the
      // kernel's Java arithmetic skips the NaN — registry-unreachable,
      // fixtures have no zero vectors)
      ArgCase(Some(vec(dim)), Some(1.0), Seq(None,
        Some(AnchorEntry(Some(3L), Some(vec(2)), Some(1.0))),
        Some(AnchorEntry(Some(5L), Some(vec(dim)), Some(1.5))))),
      // null element inside vec -> every entry skipped -> -1
      ArgCase(Some(Seq(Some(1.0), None, Some(2.0), Some(0.5))), Some(1.0),
        (0 until 3).map(j => Some(AnchorEntry(Some(j.toLong), Some(vec(dim)), Some(1.0))))),
      // NaN cosine (Inf*0 in the dot) WINS the fold's `>` — Spark orders
      // NaN greatest (nanSafeCompareDoubles) — and a later Inf cosine does
      // NOT displace it (Inf > NaN is false in that ordering). The kernel
      // replicates NaN-greatest, not Java's compares-false NaN.
      ArgCase(Some(Seq(Some(Double.PositiveInfinity), Some(1.0), Some(1.0), Some(1.0))),
        Some(1.0), Seq(
          Some(AnchorEntry(Some(0L), Some(Seq(Some(0.0), Some(1.0), Some(1.0), Some(1.0))), Some(1.0))),
          Some(AnchorEntry(Some(1L), Some(Seq(Some(1.0), Some(1.0), Some(1.0), Some(1.0))), Some(1.0))))))
    val df = (normal ++ edges).toDF("vec", "nrm", "anchors")
      .withColumn("cents", transform(col("anchors"), a =>
        struct(a.getField("aid").as("cid"), a.getField("av").as("cen"))))
    def check(): Unit = {
      val rows = df.select(
        VectorExpressions.cosArgmax(col("vec"), col("nrm"), col("anchors")).as("fmax"),
        argmaxRef(col("vec"), col("nrm"), col("anchors")).as("rmax"),
        VectorExpressions.sqdArgmin(col("vec"), col("cents")).as("fmin"),
        argminRef(col("vec"), col("cents")).as("rmin")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1) && (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
          s"argmax mismatch: $r")
        assert(r.isNullAt(2) == r.isNullAt(3) && (r.isNullAt(2) || r.getLong(2) == r.getLong(3)),
          s"argmin mismatch: $r")
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

    // zero-norm anchor: the fold's NaN cosine compares false and skips —
    // the kernel matches that NON-ANSI semantics (under ANSI the fold
    // raises DIVIDE_BY_ZERO instead; documented registry-unreachable
    // divergence — the fixtures hold no zero vectors)
    val prevAnsi = sp.conf.get("spark.sql.ansi.enabled")
    try {
      sp.conf.set("spark.sql.ansi.enabled", "false")
      val zdf = Seq(ArgCase(Some(shared), Some(1.0), Seq(
        Some(AnchorEntry(Some(4L), Some(shared), Some(0.0))),
        Some(AnchorEntry(Some(5L), Some(shared), Some(1.5))))))
        .toDF("vec", "nrm", "anchors")
      val zr = zdf.select(
        VectorExpressions.cosArgmax(col("vec"), col("nrm"), col("anchors")).as("f"),
        argmaxRef(col("vec"), col("nrm"), col("anchors")).as("r")).collect().head
      assert(zr.getLong(0) == 5L && zr.getLong(1) == 5L, s"zero-norm skip: $zr")
    } finally sp.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("LshCodes bit-identical to the transform/fold compose (corpus + adversarial vectors)") {
    val sp = spark
    import sp.implicits._
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.select(
        graft.ops.Similarity.lshCodesKernel(col("vec")).as("fast"),
        graft.ops.Similarity.lshCodesCompose(col("vec")).as("ref")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(!r.isNullAt(0), "kernel is never null")
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"codes mismatch: $r")
      }
    }
    check(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("vec")))
    // adversarial: NULL vector (compose folds every bit to 0 -> all-zero
    // codes), ragged length (dot null -> 0 bits), null element, zero vector
    // (dot 0.0 >= 0 -> all-ones codes on every table), all-Inf vector
    // (signed gaussian planes make the dot Inf-Inf = NaN, and the compose's
    // GreaterThanOrEqual orders NaN greatest -> bit=1 — the kernel must
    // replicate NaN-greatest, not Java's compares-false NaN)
    check(Seq(
      Option.empty[Seq[java.lang.Double]],
      Option(Seq.fill(3)(java.lang.Double.valueOf(1.0))),
      Option(Seq[java.lang.Double](1.0, null) ++ Seq.fill(62)(java.lang.Double.valueOf(0.5))),
      Option(Seq.fill(64)(java.lang.Double.valueOf(0.0))),
      Option(Seq.fill(64)(java.lang.Double.valueOf(Double.PositiveInfinity))),
      Option(Seq.fill(64)(java.lang.Double.valueOf(-0.25))))
      .toDF("vec").select(col("vec").cast("array<double>").as("vec")))
  }

  test("PqEncode rejects wrong input types at analysis") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Seq(1.0), Seq(2.0))).toDF("a", "b")
    val e = intercept[Exception](
      df.select(VectorExpressions.pqEncode(col("a"), col("b"), 4)).collect())
    assert(e.getMessage.contains("pq_encode"), e.getMessage)
  }

  test("PqEncode/PqQueryTable fail loudly on a subs row whose length != M (both eval paths)") {
    val sp = spark
    import sp.implicits._
    // a malformed 3-long subs row against M=4 must RAISE, not silently emit
    // a 3-long code that shifts downstream pqAdc element_at lookups
    val bad = Seq(PqCase(Some(Seq.fill(3)(Option(Seq(Option(1.0), Option(2.0))))),
      Seq(Some(PqEntry(Some(0), Some(Seq.fill(4)(Option(Seq(Option(0.0), Option(0.0))))))))))
      .toDF("subs", "cb")
    def check(): Unit = {
      val e1 = intercept[Exception](
        bad.select(VectorExpressions.pqEncode(col("subs"), col("cb"), 4)).collect())
      assert(exceptionChain(e1).exists(c =>
        Option(c.getMessage).exists(_.contains("expected M=4"))), e1.toString)
      val e2 = intercept[Exception](
        bad.select(VectorExpressions.pqQueryTable(col("subs"), col("cb"), 4)).collect())
      assert(exceptionChain(e2).exists(c =>
        Option(c.getMessage).exists(_.contains("expected M=4"))), e2.toString)
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

  private def exceptionChain(t: Throwable): Seq[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
}

private[spark] case class PqEntry(j: Option[Int], subs: Option[Seq[Option[Seq[Option[Double]]]]])
private[spark] case class PqCase(subs: Option[Seq[Option[Seq[Option[Double]]]]],
                                 cb: Seq[Option[PqEntry]])
private[spark] case class AnchorEntry(aid: Option[Long], av: Option[Seq[Option[Double]]],
                                      an: Option[Double])
private[spark] case class ArgCase(vec: Option[Seq[Option[Double]]], nrm: Option[Double],
                                  anchors: Seq[Option[AnchorEntry]])
