package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bounded per-group top-k aggregate: result equals the window
  * formulation exactly (same rows, same order, same tie-breaks), nulls are
  * ignored, the bound holds, partial/merge paths agree across partitionings,
  * and the plan is an ObjectHashAggregate with a partial stage — never a
  * corpus-wide sort. */
class TopKAggregateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("i"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("long").as("rank"), col("s"), col("i"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAggregate.topkBy(col("s"), col("i"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("s"), col("col.id").as("i"))

  test("equals the window formulation, including score ties broken by lower id") {
    val sp = spark
    import sp.implicits._
    // deterministic synthetic: scores collide on purpose (s = n % 7)
    val df = (0L until 500L).map(n => (s"g${n % 5}", n % 7, n)).toDF("g", "s", "i")
    val k = 4
    val expected = windowTopK(df, k).orderBy("g", "rank").collect().toSeq
    val actual = aggTopK(df, k).orderBy("g", "rank").collect().toSeq
    assert(actual == expected)
  }

  test("bound holds and result is identical under adversarial repartitioning") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 1000L).map(n => (s"g${n % 3}", (n * 37) % 101, n)).toDF("g", "s", "i")
    val base = aggTopK(df, 5).orderBy("g", "rank").collect().toSeq
    for (parts <- Seq(1, 7, 32)) {
      val re = aggTopK(df.repartition(parts), 5).orderBy("g", "rank").collect().toSeq
      assert(re == base, s"partitioning with $parts partitions changed the result")
    }
    assert(base.groupBy(_.getString(0)).forall(_._2.size <= 5))
  }

  test("double variant equals the window formulation under adversarial repartitioning") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    // collide scores on purpose (two distinct doubles repeat per group)
    val df = (0L until 800L).map(n => (s"g${n % 4}", ((n * 13) % 19).toDouble / 7.0, n))
      .toDF("g", "s", "i")
    val k = 5
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("i"))
    val expected = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("long").as("rank"), col("s"), col("i"))
      .orderBy("g", "rank").collect().toSeq
    def agg(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("g"))
        .agg(TopKAggregate.topkByDouble(col("s"), col("i"), k).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
          col("col.score").as("s"), col("col.id").as("i"))
    for (parts <- Seq(1, 7, 32)) {
      val got = agg(df.repartition(parts)).orderBy("g", "rank").collect().toSeq
      assert(got == expected, s"double top-k diverged from the window at $parts partitions")
    }
    // NaN scores are ignored, not admitted
    val withNaN = df.union(Seq(("g0", Double.NaN, 9999L)).toDF("g", "s", "i"))
    val gotNaN = agg(withNaN).orderBy("g", "rank").collect().toSeq
    assert(gotNaN == expected, "NaN row must not enter any heap")
  }

  test("null score or id rows are ignored; groups smaller than k return all rows") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("a", Some(10L), Some(1L)), ("a", None, Some(2L)), ("a", Some(7L), None),
      ("a", Some(3L), Some(4L)), ("b", Some(1L), Some(9L))
    ).toDF("g", "s", "i")
    val rows = aggTopK(df, 10).orderBy("g", "rank").collect().toSeq
    assert(rows == Seq(Row("a", 1L, 10L, 1L), Row("a", 2L, 3L, 4L), Row("b", 1L, 1L, 9L)))
  }

  test("SQL surface: topk_by registered by the extensions") {
    val sp = spark
    import sp.implicits._
    (0L until 100L).map(n => (n % 4, n % 9, n)).toDF("g", "s", "i")
      .createOrReplaceTempView("tk_in")
    val viaSql = spark.sql(
      "SELECT g, topk_by(s, i, 3) AS top FROM tk_in GROUP BY g")
      .select(col("g"), posexplode(col("top")))
      .orderBy("g", "pos").collect().toSeq
    val viaCol = (0L until 100L).map(n => (n % 4, n % 9, n)).toDF("g", "s", "i")
      .groupBy(col("g")).agg(TopKAggregate.topkBy(col("s"), col("i"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .orderBy("g", "pos").collect().toSeq
    assert(viaSql == viaCol)
  }

  test("SQL surface: regex_match_all registered by the extensions, literal pattern enforced") {
    val sp = spark
    import sp.implicits._
    Seq("a1b22c333", "none").toDF("s").createOrReplaceTempView("rx_in")
    val got = spark.sql(
      "SELECT s, regex_match_all(s, '([0-9])[0-9]*') AS m FROM rx_in ORDER BY s")
      .collect()
    // row 0: "a1b22c333" -> matches "1"@1, "22"@3, "333"@6, group 1 = first digit
    val ms = got(0).getSeq[org.apache.spark.sql.Row](1)
    assert(ms.map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).head)) ==
      Seq(("1", 1L, "1"), ("22", 3L, "2"), ("333", 6L, "3")))
    assert(got(1).getSeq[org.apache.spark.sql.Row](1).isEmpty)
    // limit arg
    val lim = spark.sql(
      "SELECT regex_match_all(s, '[0-9]+', 2) AS m FROM rx_in WHERE s LIKE 'a%'").head()
    assert(lim.getSeq[org.apache.spark.sql.Row](0).length == 2)
    // non-literal pattern is a plan-time error, not a silent per-row compile
    val e = intercept[Exception] {
      spark.sql("SELECT regex_match_all(s, s) FROM rx_in").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("plan: partial ObjectHashAggregate before the shuffle, no corpus sort") {
    val sp = spark
    import sp.implicits._
    val df = (0L until 1000L).map(n => (s"g${n % 3}", n % 11, n)).toDF("g", "s", "i")
    val plan = df.groupBy(col("g"))
      .agg(TopKAggregate.topkBy(col("s"), col("i"), 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("partial_topk_by"), "no partial (map-side) stage:\n" + plan.take(2000))
    assert(!plan.contains("SortExec"), "unexpected sort in the top-k plan:\n" + plan.take(2000))
  }
}
