package graft.spark

import java.math.BigInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Corner types through the direct row codec (RowJson): the end-to-end typed
  * transform must agree with what the to_json/from_json round-trip produced
  * for every type the envelope can carry. */
class RowJsonSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def roundTrip(schema: StructType, rows: Seq[Row], expr: String,
                        out: StructType): Seq[Row] =
    JsonataDF.transformAs(
      spark.createDataFrame(rows.asJava, schema), expr, out).collect().toSeq

  test("numeric, boolean, string, null-skip") {
    val schema = StructType.fromDDL("id BIGINT, d DOUBLE, f FLOAT, i INT, b BOOLEAN, s STRING")
    val rows = Seq(Row(1L, 2.5, 1.5f, 7, true, "x"), Row(2L, null, null, null, null, null))
    val got = roundTrip(schema, rows,
      "{'id': value.id, 'd': value.d, 'f': value.f, 'i': value.i, 'b': value.b, 's': value.s, 'miss': $exists(value.d)}",
      StructType.fromDDL("id BIGINT, d DOUBLE, f FLOAT, i INT, b BOOLEAN, s STRING, miss BOOLEAN"))
    assert(got.map(_.toSeq).toSet == Set(
      Seq(1L, 2.5, 1.5f, 7, true, "x", true),
      Seq(2L, null, null, null, null, null, false))) // nulls omitted => undefined => $exists false
  }

  test("date renders ISO and survives string ops; decimal is a JSON number") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("d", DateType),
      StructField("m", DecimalType(10, 2))))
    val rows = Seq(Row(1L, java.sql.Date.valueOf("1996-01-02"),
      new java.math.BigDecimal(new BigInteger("12345"), 2)))
    val got = roundTrip(schema, rows,
      "{'id': value.id, 'y': $substring(value.d, 0, 4), 'm2': value.m * 2}",
      StructType.fromDDL("id BIGINT, y STRING, m2 DOUBLE"))
    assert(got.head.toSeq == Seq(1L, "1996", 246.9))
  }

  test("timestamp_ntz renders zone-free ISO local and decodes back exactly") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", TimestampNTZType)))
    val rows = Seq(
      Row(1L, java.time.LocalDateTime.parse("2024-01-30T23:57:12.194062")),
      Row(2L, java.time.LocalDateTime.parse("2024-01-01T00:00:00")))
    // encode: the envelope must carry the wall-clock reading with NO 'Z'
    val enc = roundTrip(schema, rows,
      "{'id': value.id, 'iso': value.t, 'hasZ': $contains(value.t, 'Z')}",
      StructType.fromDDL("id BIGINT, iso STRING, hasZ BOOLEAN"))
    assert(enc.map(_.toSeq).toSet == Set(
      Seq(1L, "2024-01-30T23:57:12.194062", false),
      Seq(2L, "2024-01-01T00:00:00", false))) // fixed formatter: seconds always print
    // decode: identity projection back into a TIMESTAMP_NTZ output column
    // must preserve micros exactly (symmetric branch)
    val dec = roundTrip(schema, rows, "{'id': value.id, 't': value.t}",
      StructType(Seq(StructField("id", LongType), StructField("t", TimestampNTZType))))
    assert(dec.map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
    // instant-form input (trailing Z) is accepted at its UTC reading
    val z = roundTrip(StructType.fromDDL("id BIGINT, s STRING"),
      Seq(Row(1L, "2024-01-30T23:57:12.194062Z")), "{'id': value.id, 't': value.s}",
      StructType(Seq(StructField("id", LongType), StructField("t", TimestampNTZType))))
    assert(z.head.getAs[java.time.LocalDateTime]("t") ==
      java.time.LocalDateTime.parse("2024-01-30T23:57:12.194062"))
  }

  test("binary encodes base64 both ways") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("p", BinaryType)))
    val rows = Seq(Row(1L, "hello".getBytes("UTF-8")))
    val got = roundTrip(schema, rows, "{'id': value.id, 'p': value.p, 'n': $length(value.p)}",
      StructType(Seq(StructField("id", LongType), StructField("p", BinaryType),
        StructField("n", LongType))))
    assert(new String(got.head.getAs[Array[Byte]]("p"), "UTF-8") == "hello")
    assert(got.head.getAs[Long]("n") == 8L) // length of the base64 text "aGVsbG8="
  }

  test("arrays with nulls, nested structs, and maps round-trip") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("xs", ArrayType(LongType)),
      StructField("st", StructType.fromDDL("a BIGINT, b STRING")),
      StructField("mp", MapType(StringType, LongType))))
    val rows = Seq(Row(1L, Seq(1L, null, 3L), Row(9L, "z"), Map("k1" -> 5L, "k2" -> 6L)))
    val got = roundTrip(schema, rows,
      "{'id': value.id, 'xs': value.xs, 'a': value.st.a, 'b': value.st.b, 'mp': value.mp, 'k1': $lookup(value.mp, 'k1')}",
      StructType(Seq(
        StructField("id", LongType),
        StructField("xs", ArrayType(LongType)),
        StructField("a", LongType), StructField("b", StringType),
        StructField("mp", MapType(StringType, LongType)),
        StructField("k1", LongType))))
    val r = got.head
    assert(r.getSeq[Any](r.fieldIndex("xs")).toList == List(1L, null, 3L))
    assert(r.getAs[Long]("a") == 9L && r.getAs[String]("b") == "z")
    assert(r.getAs[Map[String, Long]]("mp") == Map("k1" -> 5L, "k2" -> 6L))
    assert(r.getAs[Long]("k1") == 5L)
  }

  test("non-string node declared STRING decodes to compact JSON text (from_json parity)") {
    val schema = StructType.fromDDL("id BIGINT, a BIGINT, b BIGINT")
    val rows = Seq(Row(1L, 2L, 3L))
    val got = roundTrip(schema, rows, "{'id': value.id, 'obj': {'a': value.a, 'b': value.b}}",
      StructType.fromDDL("id BIGINT, obj STRING"))
    assert(got.head.getAs[String]("obj") == """{"a":2,"b":3}""")
  }

  test("tombstones drop through the typed path") {
    val schema = StructType.fromDDL("id BIGINT, k STRING")
    val rows = Seq(Row(1L, "keep"), Row(2L, "drop"), Row(3L, "keep"))
    val got = roundTrip(schema, rows, "value.k = 'drop' ? null : {'id': value.id}",
      StructType.fromDDL("id BIGINT"))
    assert(got.map(_.getLong(0)).sorted == Seq(1L, 3L))
  }
}
