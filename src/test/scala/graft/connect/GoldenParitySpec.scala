package graft.connect

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap

/** Port of the reference's six golden end-to-end tests (reference
  * JsonataTransformationTest.java:40-211) with logical-type-aware deep
  * equality mirroring AssertStruct/AssertSchema (reference
  * utils/AssertStruct.java:95-157, utils/AssertSchema.java:38-96). */
class GoldenParitySpec extends AnyFunSuite {

  // ---- deep equality (AssertStruct/AssertSchema semantics) ----

  def schemaEquals(a: CSchema, b: CSchema): Boolean = {
    if (a == null || b == null) return a == b
    a.ctype == b.ctype && a.optional == b.optional && a.name == b.name &&
      a.version == b.version && a.doc == b.doc &&
      (a.parameters == null) == (b.parameters == null) &&
      (a.parameters == null || a.parameters == b.parameters) &&
      valueEquals(a.defaultValue, b.defaultValue) &&
      schemaEquals(a.keySchema, b.keySchema) && schemaEquals(a.valueSchema, b.valueSchema) && {
        val af = Option(a.fields).getOrElse(Vector.empty)
        val bf = Option(b.fields).getOrElse(Vector.empty)
        af.length == bf.length && af.zip(bf).forall { case (x, y) =>
          x.name == y.name && x.index == y.index && schemaEquals(x.schema, y.schema)
        }
      }
  }

  def valueEquals(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y) == 0
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: Array[Byte], y: java.nio.ByteBuffer) => valueEquals(y, x)
    case (x: java.nio.ByteBuffer, y: Array[Byte]) =>
      val arr = new Array[Byte](x.remaining()); x.duplicate().get(arr)
      java.util.Arrays.equals(arr, y)
    case (x: java.util.Date, y: java.util.Date) => x.getTime == y.getTime
    case (x: CStruct, y: CStruct) =>
      schemaEquals(x.schema, y.schema) &&
        x.schema.fields.forall(f => valueEquals(x.get(f.name), y.get(f.name)))
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (i, j) => valueEquals(i, j) }
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      x.keySet == y.keySet && x.forall { case (k, v) =>
        valueEquals(v, y.asInstanceOf[scala.collection.Map[Any, Any]](k)) }
    case (x: java.lang.Number, y: java.lang.Number)
        if x.getClass == y.getClass => x == y
    case _ => a == b
  }

  private def assertStructEq(expected: CStruct, actual: Any): Unit = {
    assert(actual.isInstanceOf[CStruct], s"expected CStruct, got $actual")
    assert(valueEquals(expected, actual), s"struct mismatch:\n  expected: $expected\n  actual:   $actual")
  }

  // ---- fixtures (reference JsonataTransformationTest.java:28-38) ----

  private def mkRecord(value: Any, schema: CSchema): CRecord = {
    val headers = Vector(
      CHeader("key1", "value1", CSchema.STRING),
      CHeader("key2", "value2", CSchema.STRING))
    CRecord("test", 1, CSchema.STRING, "mykey", schema, value, 1234L,
      headers, SinkMeta(1000L, "CREATE_TIME"))
  }

  private def transform(r: CRecord, expr: String): CRecord =
    JsonataTransform.apply(r, JsonataTransform.Config(expr))

  // ---- tests ----

  test("noop: identity round-trips struct and schema") {
    val schema = CSchema.struct(
      "first" -> CSchema.STRING, "last" -> CSchema.STRING, "email" -> CSchema.STRING)
    val struct = new CStruct(schema)
      .put("first", "test").put("last", "user").put("email", "none@none.com")
    val actual = transform(mkRecord(struct, schema), "$")
    assert(actual != null)
    assertStructEq(struct, actual.value)
    assert(schemaEquals(schema, actual.valueSchema))
    assert(actual.topic == "test" && actual.kafkaPartition == 1)
    assert(actual.key == "mykey" && actual.timestamp == 1234L)
    assert(actual.headers.map(h => h.key -> h.value) ==
      Vector("key1" -> "value1", "key2" -> "value2"))
  }

  test("removeEmail: schema rewriting as data ($sift/$merge/lambda/bindings)") {
    val schema = CSchema.struct(
      "first" -> CSchema.STRING, "last" -> CSchema.STRING, "email" -> CSchema.STRING)
      .copy(optional = true)
    val struct = new CStruct(schema)
      .put("first", "test").put("last", "user").put("email", "none@none.com")
    val expr =
      """(
        |    $root := $;
        |    $removeEmail := function($v, $k) {$k != 'email'};
        |    $newValueSchemaFields := $sift($root.valueSchema.fields, $removeEmail);
        |    $newValueSchema := $merge([$root.valueSchema, {"fields": $newValueSchemaFields}]);
        |    $newValue := $sift($root.value, $removeEmail);
        |    $newRoot := $merge([$root, {"valueSchema": $newValueSchema}, {"value": $newValue}])
        |)""".stripMargin
    val actual = transform(mkRecord(struct, schema), expr)

    val expectedSchema = CSchema.struct(
      "first" -> CSchema.STRING, "last" -> CSchema.STRING).copy(optional = true)
    val expectedStruct = new CStruct(expectedSchema).put("first", "test").put("last", "user")
    assert(actual != null)
    assertStructEq(expectedStruct, actual.value)
    assert(schemaEquals(expectedSchema, actual.valueSchema))
  }

  test("filterTombstone: null value drops the record") {
    val schema = CSchema.struct(
      "first" -> CSchema.STRING, "last" -> CSchema.STRING, "email" -> CSchema.STRING)
    val actual = transform(mkRecord(null, schema), "value = null ? null : $")
    assert(actual == null)
  }

  test("valueWithoutSchema: schemaless value passes through") {
    val actual = transform(mkRecord("hi", null), "$")
    assert(actual != null)
    assert(actual.value == "hi")
    assert(actual.valueSchema == null)
  }

  test("noopEmpty: all-null record survives identity") {
    val record = CRecord(null, 1, null, null, null, null, 1000L, null, SinkMeta(1000L, null))
    val actual = transform(record, "$")
    assert(actual != null)
    assert(actual.key == null && actual.keySchema == null)
    assert(actual.value == null && actual.valueSchema == null)
  }

  test("noopComplex: full type matrix incl. logical types round-trips") {
    val dateDefVal = 100
    val timeDefVal = 1000 * 60 * 60 * 2
    val tsDefVal = 1000L * 60 * 60 * 24 * 365 + 100
    val dateDef = Logical.dateToLogical(dateDefVal)
    val timeDef = Logical.timeToLogical(timeDefVal)
    val tsDef = Logical.timestampToLogical(tsDefVal)
    val decimalDef = new java.math.BigDecimal(java.math.BigInteger.valueOf(314159L), 5)

    def withDefDoc(s: CSchema, dv: Any, doc: String): CSchema = s.copy(defaultValue = dv, doc = doc)

    val schema = CSchema.struct(
      "int8" -> withDefDoc(CSchema(CType.INT8), 2.toByte, "int8 field"),
      "int16" -> withDefDoc(CSchema(CType.INT16), 12.toShort, "int16 field"),
      "int32" -> withDefDoc(CSchema(CType.INT32), 12, "int32 field"),
      "int64" -> withDefDoc(CSchema(CType.INT64), 12L, "int64 field"),
      "float32" -> withDefDoc(CSchema(CType.FLOAT32), 12.2f, "float32 field"),
      "float64" -> withDefDoc(CSchema(CType.FLOAT64), 12.2, "float64 field"),
      "boolean" -> withDefDoc(CSchema(CType.BOOLEAN), true, "bool field"),
      "string" -> withDefDoc(CSchema(CType.STRING), "foo", "string field"),
      "bytes" -> withDefDoc(CSchema(CType.BYTES), "foo".getBytes, "bytes field"),
      "array" -> CSchema.array(CSchema.STRING).copy(defaultValue = Vector("a", "b", "c")),
      "map" -> CSchema.map(CSchema.STRING, CSchema.INT32).copy(defaultValue = ListMap("field" -> 1)),
      "date" -> Logical.dateSchema.copy(defaultValue = dateDef, doc = "date field"),
      "time" -> Logical.timeSchema.copy(defaultValue = timeDef, doc = "time field"),
      "ts" -> Logical.timestampSchema.copy(defaultValue = tsDef, doc = "ts field"),
      "decimal" -> Logical.decimalSchema(5).copy(defaultValue = decimalDef, doc = "decimal field"))

    val struct = new CStruct(schema)
      .put("int8", 2.toByte).put("int16", 12.toShort).put("int32", 12).put("int64", 12L)
      .put("float32", 12.2f).put("float64", 12.2).put("boolean", true).put("string", "foo")
      .put("bytes", "foo".getBytes)
      .put("array", Vector("a", "b", "c"))
      .put("map", ListMap("field" -> 1))
      .put("date", dateDef).put("time", timeDef).put("ts", tsDef)
      .put("decimal", decimalDef)

    val actual = transform(mkRecord(struct, schema), "$")
    assert(actual != null)
    val actualStruct = actual.value.asInstanceOf[CStruct]
    schema.fields.foreach { f =>
      assert(valueEquals(struct.get(f.name), actualStruct.get(f.name)),
        s"field ${f.name}: expected ${struct.get(f.name)}, got ${actualStruct.get(f.name)}")
    }
    assert(schemaEquals(schema, actual.valueSchema))
  }

  test("identity fast-path: empty expression returns record unchanged") {
    val r = mkRecord("hi", null)
    assert(JsonataTransform.apply(r, JsonataTransform.Config("")) eq r)
  }

  test("topic/partition rewrite") {
    val r = mkRecord("hi", null)
    val actual = transform(r, "$merge([$, {'topic': 'other', 'kafkaPartition': 7}])")
    assert(actual.topic == "other")
    assert(actual.kafkaPartition == 7)
    assert(actual.value == "hi")
  }

  test("evaluation error maps to DataException") {
    assertThrows[DataException](transform(mkRecord("hi", null), "$error('nope')"))
    assertThrows[DataException](JsonataTransform.compile("a.b["))
  }
}
