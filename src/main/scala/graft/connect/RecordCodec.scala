package graft.connect

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Record/schema/value <-> JSON envelope codec.
  *
  * Faithful re-expression of the reference's codec:
  *  - encode: recordToJsonNode / schemaToJsonNode / objectToJsonNode
  *    (reference JsonataTransformation.java:133-291)
  *  - decode: jsonNodeToRecord / jsonNodeToSchema / jsonNodeToObject /
  *    jsonNodeToObjectWithoutSchema + logical-type coercions
  *    (reference JsonataTransformation.java:294-649)
  *
  * Schemas are reified as data ("schema-as-data") so expressions can rewrite
  * them; decode is structural-first (valueSchema => MAP/ARRAY, else `type`).
  */
object RecordCodec {
  private val nf = JsonNodeFactory.instance

  // ================================================================
  // encode
  // ================================================================

  def recordToJsonNode(r: CRecord): ObjectNode = {
    val node = nf.objectNode()
    node.put("topic", r.topic)
    if (r.kafkaPartition == null) node.putNull("kafkaPartition")
    else node.put("kafkaPartition", r.kafkaPartition.intValue())
    if (r.keySchema != null) node.set[JsonNode]("keySchema", schemaToJsonNode(r.keySchema))
    if (r.key != null) node.set[JsonNode]("key", objectToJsonNode(r.key))
    if (r.valueSchema != null) node.set[JsonNode]("valueSchema", schemaToJsonNode(r.valueSchema))
    if (r.value != null) node.set[JsonNode]("value", objectToJsonNode(r.value))
    if (r.timestamp != null) node.put("timestamp", r.timestamp.longValue())
    if (r.headers != null) node.set[JsonNode]("headers", headersToJsonNode(r.headers))
    node
  }

  def schemaToJsonNode(s: CSchema): ObjectNode = {
    val node = nf.objectNode()
    node.put("type", s.ctype.typeName)
    if (s.optional) node.put("optional", true)
    if (s.defaultValue != null) node.set[JsonNode]("defaultValue", objectToJsonNode(s.defaultValue))
    if (s.name != null) node.put("name", s.name)
    if (s.version != null) node.put("version", s.version.intValue())
    if (s.doc != null) node.put("doc", s.doc)
    if (s.parameters != null) {
      val p = nf.objectNode()
      s.parameters.foreach { case (k, v) => p.put(k, v) }
      node.set[JsonNode]("parameters", p)
    }
    if (s.ctype == CType.MAP && s.keySchema != null)
      node.set[JsonNode]("keySchema", schemaToJsonNode(s.keySchema))
    if ((s.ctype == CType.MAP || s.ctype == CType.ARRAY) && s.valueSchema != null)
      node.set[JsonNode]("valueSchema", schemaToJsonNode(s.valueSchema))
    if (s.ctype == CType.STRUCT && s.fields != null) {
      val fs = nf.objectNode()
      s.fields.foreach { f =>
        val fn = nf.objectNode()
        fn.put("name", f.name)
        fn.put("index", f.index)
        if (f.schema != null) fn.set[JsonNode]("schema", schemaToJsonNode(f.schema))
        fs.set[JsonNode](f.name, fn)
      }
      node.set[JsonNode]("fields", fs)
    }
    node
  }

  /** Typed value -> JSON, preserving the numeric tower exactly
    * (reference objectToJsonNode, JsonataTransformation.java:201-253). */
  def objectToJsonNode(value: Any): JsonNode = value match {
    case null => NullNode.getInstance()
    case seq: scala.collection.Seq[_] =>
      val arr = nf.arrayNode(seq.size)
      seq.foreach(v => arr.add(objectToJsonNode(v)))
      arr
    case l: java.util.List[_] =>
      val arr = nf.arrayNode(l.size)
      l.asScala.foreach(v => arr.add(objectToJsonNode(v)))
      arr
    case m: scala.collection.Map[_, _] =>
      val o = nf.objectNode()
      m.foreach { case (k, v) => o.set[JsonNode](k.toString, objectToJsonNode(v)) }
      o
    case m: java.util.Map[_, _] =>
      val o = nf.objectNode()
      m.asScala.foreach { case (k, v) => o.set[JsonNode](k.toString, objectToJsonNode(v)) }
      o
    case b: Boolean => BooleanNode.valueOf(b)
    case bd: java.math.BigDecimal => DecimalNode.valueOf(bd)
    case bi: java.math.BigInteger => BigIntegerNode.valueOf(bi)
    case l: Long => LongNode.valueOf(l)
    case d: Double => DoubleNode.valueOf(d)
    case f: Float => FloatNode.valueOf(f)
    case i: Int => IntNode.valueOf(i)
    case s: Short => ShortNode.valueOf(s)
    case b: Byte => IntNode.valueOf(b.toInt) // Jackson numberNode(Byte) yields IntNode
    case bytes: Array[Byte] => BinaryNode.valueOf(bytes)
    case bb: java.nio.ByteBuffer =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
      BinaryNode.valueOf(arr)
    case d: java.util.Date => TextNode.valueOf(CValues.formatDate(d))
    case st: CStruct =>
      val o = nf.objectNode()
      st.schema.fields.foreach(f => o.set[JsonNode](f.name, objectToJsonNode(st.get(f))))
      o
    case s: String => TextNode.valueOf(s)
    case other => throw new DataException(s"Unsupported type ${other.getClass.getName}")
  }

  private def headersToJsonNode(headers: Vector[CHeader]): ArrayNode = {
    val arr = nf.arrayNode()
    headers.foreach { h =>
      val o = nf.objectNode()
      o.put("key", h.key)
      if (h.value != null) o.set[JsonNode]("value", objectToJsonNode(h.value))
      if (h.schema != null) o.set[JsonNode]("schema", schemaToJsonNode(h.schema))
      arr.add(o)
    }
    arr
  }

  // ================================================================
  // decode
  // ================================================================

  /** Rebuild a record from the (possibly rewritten) envelope; engine metadata
    * is copied from the original. A JSON-null result means "drop". */
  def jsonNodeToRecord(original: CRecord, node: JsonNode): CRecord = {
    if (node == null || node.isNull) return null
    val topic = if (node.hasNonNull("topic")) node.get("topic").asText() else null
    val kafkaPartition: Integer =
      if (node.hasNonNull("kafkaPartition")) Integer.valueOf(node.get("kafkaPartition").asInt()) else Integer.valueOf(-1)
    val keySchema = if (node.hasNonNull("keySchema")) jsonNodeToSchema(node.get("keySchema")) else null
    val key = if (node.hasNonNull("key")) jsonNodeToObject(keySchema, node.get("key")) else null
    val valueSchema = if (node.hasNonNull("valueSchema")) jsonNodeToSchema(node.get("valueSchema")) else null
    val value = if (node.hasNonNull("value")) jsonNodeToObject(valueSchema, node.get("value")) else null
    val timestamp: java.lang.Long =
      if (node.hasNonNull("timestamp")) java.lang.Long.valueOf(node.get("timestamp").asLong()) else null
    val headers = if (node.hasNonNull("headers")) jsonNodeToHeaders(node.get("headers")) else null
    CRecord(topic, kafkaPartition, keySchema, key, valueSchema, value, timestamp, headers, original.meta)
  }

  /** Structural-first schema decode (reference jsonNodeToSchema:361-408). */
  def jsonNodeToSchema(node: JsonNode): CSchema = {
    if (node == null || node.isNull) return null
    var s: CSchema =
      if (node.hasNonNull("valueSchema")) {
        val valueSchema = jsonNodeToSchema(node.get("valueSchema"))
        if (node.hasNonNull("keySchema"))
          CSchema(CType.MAP, keySchema = jsonNodeToSchema(node.get("keySchema")), valueSchema = valueSchema)
        else CSchema(CType.ARRAY, valueSchema = valueSchema)
      } else if (node.hasNonNull("type")) {
        CSchema(CType.forName(node.get("type").asText()))
      } else throw new DataException("Schema node must have 'type' or 'valueSchema'")

    if (node.hasNonNull("optional") && node.get("optional").asBoolean()) s = s.copy(optional = true)
    if (node.hasNonNull("name")) s = s.copy(name = node.get("name").asText())
    if (node.hasNonNull("version")) s = s.copy(version = Integer.valueOf(node.get("version").asInt()))
    if (node.hasNonNull("doc")) s = s.copy(doc = node.get("doc").asText())
    if (node.hasNonNull("parameters")) {
      var params = ListMap.empty[String, String]
      node.get("parameters").fields().asScala.foreach(e => params += (e.getKey -> e.getValue.asText()))
      s = s.copy(parameters = params)
    }
    if (node.hasNonNull("fields")) {
      // field order = JSON insertion order; indexes re-assigned sequentially
      // (Connect SchemaBuilder.field does the same when rebuilding)
      val fields = node.get("fields").fields().asScala.zipWithIndex.map { case (e, i) =>
        val fnode = e.getValue
        if (!fnode.hasNonNull("name") || !fnode.hasNonNull("index"))
          throw new DataException("Field node must have 'name' and 'index'")
        val fschema = if (fnode.hasNonNull("schema")) jsonNodeToSchema(fnode.get("schema")) else null
        CField(e.getKey, i, fschema)
      }.toVector
      s = s.copy(fields = fields)
    }
    if (node.hasNonNull("defaultValue"))
      s = s.copy(defaultValue = jsonNodeToObject(s, node.get("defaultValue")))
    s
  }

  private def jsonNodeToHeaders(node: JsonNode): Vector[CHeader] =
    node.elements().asScala.map { item =>
      val schema = if (item.hasNonNull("schema")) jsonNodeToSchema(item.get("schema")) else null
      val value = if (item.has("value")) jsonNodeToObject(schema, item.get("value")) else null
      CHeader(item.get("key").asText(), value, schema)
    }.toVector

  /** Schema-directed value decode with logical-type dispatch by schema name
    * (reference jsonNodeToObject:441-495 + converters 530-649). */
  def jsonNodeToObject(schema: CSchema, node: JsonNode): Any = {
    if (node == null || node.isNull) return null
    if (schema == null) return jsonNodeToObjectWithoutSchema(node)
    schema.ctype match {
      case CType.INT8 =>
        if (node.numberValue() == null) throw new DataException(s"Cannot convert $node to INT8")
        node.numberValue().byteValue()
      case CType.INT16 => node.shortValue()
      case CType.INT32 =>
        convertMaybeLogicalInteger(schema, if (node.isNumber) node.intValue() else node.textValue())
      case CType.INT64 =>
        convertMaybeLogicalLong(schema, if (node.isNumber) node.longValue() else node.textValue())
      case CType.FLOAT32 => node.floatValue()
      case CType.FLOAT64 => node.doubleValue()
      case CType.BOOLEAN => node.booleanValue()
      case CType.STRING => node.textValue()
      case CType.BYTES =>
        val raw: Any =
          if (node.isBinary) node.binaryValue()
          else if (node.isNumber) node.numberValue()
          else node.textValue()
        convertMaybeLogicalBytes(schema, raw)
      case CType.ARRAY =>
        node.elements().asScala.map(item => jsonNodeToObject(schema.valueSchema, item)).toVector
      case CType.MAP =>
        var m = ListMap.empty[String, Any]
        node.fields().asScala.foreach(e => m += (e.getKey -> jsonNodeToObject(schema.valueSchema, e.getValue)))
        m
      case CType.STRUCT =>
        val st = new CStruct(schema)
        schema.fields.foreach { f =>
          val fn = node.get(f.name)
          if (fn != null) st.put(f, jsonNodeToObject(f.schema, fn))
        }
        st
    }
  }

  /** Structural decode when no schema is present (reference :497-528). */
  def jsonNodeToObjectWithoutSchema(node: JsonNode): Any = {
    if (node.isNull) null
    else if (node.isNumber) node.numberValue() // narrowest Jackson representation
    else if (node.isBoolean) node.booleanValue()
    else if (node.isBinary) node.binaryValue()
    else if (node.isArray)
      node.elements().asScala.map(jsonNodeToObjectWithoutSchema).toVector
    else if (node.isObject) {
      var m = ListMap.empty[String, Any]
      node.fields().asScala.foreach(e => m += (e.getKey -> jsonNodeToObjectWithoutSchema(e.getValue)))
      m
    } else node.textValue()
  }

  // ---- logical-type coercions (reference :530-649) ----

  private def convertMaybeLogicalBytes(schema: CSchema, value: Any): Any =
    if (schema != null && Logical.DecimalName == schema.name) convertToDecimal(schema, value)
    else value match {
      case bytes: Array[Byte] => bytes
      case bb: java.nio.ByteBuffer => val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case other => throw new DataException(s"Unable to convert $other to BYTES")
    }

  private def convertToDecimal(schema: CSchema, value: Any): java.math.BigDecimal = value match {
    case bytes: Array[Byte] => Logical.decimalToLogical(schema, bytes)
    case bd: java.math.BigDecimal => bd
    case n: java.lang.Number => java.math.BigDecimal.valueOf(n.doubleValue())
    case s: String => new java.math.BigDecimal(s)
    case other => throw new DataException(s"Unable to convert $other to Decimal")
  }

  private def convertMaybeLogicalInteger(schema: CSchema, value: Any): Any =
    if (schema != null && Logical.DateName == schema.name) convertToDateLogical(value, days => Logical.dateToLogical(days.toInt))
    else if (schema != null && Logical.TimeName == schema.name) convertToDateLogical(value, ms => Logical.timeToLogical(ms.toInt))
    else value match {
      case n: java.lang.Number => n.intValue()
      case s: String => asLong(s).toInt
      case other => throw new DataException(s"Unable to convert $other to INT32")
    }

  private def convertMaybeLogicalLong(schema: CSchema, value: Any): Any =
    if (schema != null && Logical.TimestampName == schema.name) convertToDateLogical(value, Logical.timestampToLogical)
    else value match {
      case n: java.lang.Number => n.longValue()
      case s: String => asLong(s)
      case other => throw new DataException(s"Unable to convert $other to INT64")
    }

  private def convertToDateLogical(value0: Any, fromNumeric: Long => java.util.Date): java.util.Date = {
    var value = value0
    value match {
      case s: String =>
        val parsed = CValues.parseDateString(s)
        if (parsed != null) value = parsed
      case _ =>
    }
    value match {
      case d: java.util.Date => d
      case _ => fromNumeric(asLong(value))
    }
  }

  def asLong(value: Any): Long = value match {
    case n: java.lang.Number => n.longValue()
    case s: String =>
      try new java.math.BigDecimal(s).longValue()
      catch { case _: NumberFormatException => throw new DataException(s"Unable to convert $s to a number") }
    case other => throw new DataException(s"Unable to convert $other to a number")
  }
}
