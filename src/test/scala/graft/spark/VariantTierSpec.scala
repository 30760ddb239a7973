package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Variant envelope tier (SURVEY §1.4): jsonata_variant output must agree
  * with the JSON-string tier, accept variant input, keep downstream traversal
  * native (variant_get in the plan, exactly one evaluator call), and drop
  * tombstones as NULL variants. */
class VariantTierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def events = spark.read.parquet(s"$sfDir/events.parquet")

  test("variant tier agrees with the JSON-string tier") {
    val expr = "{'event_id': value.event_id, 'k': $eval(value.props, {}).k, 'et': $uppercase(value.event_type)}"
    val env = to_json(struct(struct(col("event_id"), col("props"), col("event_type")).as("value")))
    val viaVariant = events
      .select(JsonataFunctions.jsonataVariant(env, expr).as("v"))
      .select(
        try_variant_get(col("v"), "$.event_id", "bigint").as("event_id"),
        try_variant_get(col("v"), "$.k", "bigint").as("k"),
        try_variant_get(col("v"), "$.et", "string").as("et"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val viaString = JsonataDF.transformAs(events, expr,
        StructType.fromDDL("event_id BIGINT, k BIGINT, et STRING"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(viaVariant.size == viaString.size && viaVariant.size > 0)
    viaVariant.zip(viaString).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("variant INPUT: evaluate directly against a parse_json column") {
    val out = events
      .select(col("event_id"), JsonataFunctions.jsonataVariant(
        parse_json(col("props")), "{'k2': $.k * 2}").as("v"))
      .select(col("event_id"), try_variant_get(col("v"), "$.k2", "bigint").as("k2"))
      .orderBy("event_id")
    val expected = events
      .select(col("event_id"),
        (try_variant_get(parse_json(col("props")), "$.k", "bigint") * 2).as("k2"))
      .orderBy("event_id")
    assert(out.collect().map(_.toSeq).toSeq == expected.collect().map(_.toSeq).toSeq)
  }

  test("tombstone result is a NULL variant") {
    val env = to_json(struct(struct(col("event_id"), col("event_type")).as("value")))
    val out = events.select(JsonataFunctions.jsonataVariant(env,
      "value.event_type = 'click' ? {'id': value.event_id} : null").as("v"))
    val total = events.count()
    val kept = out.filter(col("v").isNotNull).count()
    val clicks = events.filter(col("event_type") === "click").count()
    assert(kept == clicks && kept < total)
  }

  test("plan: downstream traversal is native variant_get, one evaluator call") {
    val env = to_json(struct(struct(col("event_id"), col("props")).as("value")))
    val df = events
      .select(JsonataFunctions.jsonataVariant(env,
        "{'event_id': value.event_id, 'props': $eval(value.props, {})}").as("v"))
      .select(try_variant_get(col("v"), "$.props.k", "bigint").as("k"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("variant_get"), s"expected native variant_get in plan:\n$plan")
    val evals = "jsonata_variant".r.findAllIn(plan).length
    assert(evals >= 1, s"expected the evaluator in the plan:\n$plan")
    assert(!plan.contains("from_json"), "no JSON re-parse on the traversal side")
  }

  test("VariantJson binary walker == toJson+reparse on representative trees") {
    import org.apache.spark.types.variant.VariantBuilder
    val samples = Seq(
      """{"a":1,"b":-2147483649,"c":2147483647,"d":9007199254740993}""",
      """{"x":1.5,"y":-0.25,"z":1e30,"w":2.5e-7}""",
      """{"dec":1.23,"dec0":5.00,"big":123456789012345678901234567890}""",
      """{"s":"héllo \"q\" \u2028","empty":"","nested":{"a":[1,2,{"b":null}]}}""",
      """[true,false,null,{},[],{"k":[{"v":0.1}]}]""",
      """"bare string"""", "42", "-7.5", "null", "true", "[]", "{}")
    samples.foreach { s =>
      val v = VariantBuilder.parseJson(s, false)
      val variant = new org.apache.spark.types.variant.Variant(v.getValue, v.getMetadata)
      val walked = VariantJson.toJsonNode(variant)
      val reparsed = graft.jsonata.Jsonata.parseJson(variant.toJson(java.time.ZoneOffset.UTC))
      assert(walked == reparsed, s"walker diverged on $s:\n$walked\n$reparsed")
      // node TYPES must match too (IntNode(1) != LongNode(1) under equals, but
      // assert the textual shape as well for belt and braces)
      assert(walked.toString == reparsed.toString, s"serialized form diverged on $s")
    }
  }

  test("numeric fidelity: longs, doubles, booleans, strings through variant") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, 2.5, true, "x")).toDF("a", "b", "c", "d")
    val env = to_json(struct(struct(col("a"), col("b"), col("c"), col("d")).as("value")))
    val out = df.select(JsonataFunctions.jsonataVariant(env,
        "{'a': value.a, 'b': value.b, 'c': value.c, 'd': value.d, 's': value.a + value.b}").as("v"))
      .select(
        try_variant_get(col("v"), "$.a", "bigint").as("a"),
        try_variant_get(col("v"), "$.b", "double").as("b"),
        try_variant_get(col("v"), "$.c", "boolean").as("c"),
        try_variant_get(col("v"), "$.d", "string").as("d"),
        try_variant_get(col("v"), "$.s", "double").as("s"))
      .head()
    assert(out.toSeq == Seq(1L, 2.5, true, "x", 3.5))
  }
}
