package graft.spark

import java.time.LocalDate

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.jsonata.Values

/** Direct InternalRow <-> JsonNode codec for the interpreted tier.
  *
  * Replaces the to_json -> Jackson-parse / serialize -> from_json double JSON
  * round-trip (two parses + two serializations per record) with an in-memory
  * tree conversion on each side — the Spark analog of the reference's
  * tree-in/tree-out apply() (JsonataTransformation.java:133-156).
  *
  * Encoding mirrors `to_json` semantics the envelope relied on:
  *  - null fields are OMITTED (SQL NULL == JSONata undefined — the compiled
  *    tier's soundness argument depends on this);
  *  - dates render as ISO strings, binary as base64, decimals as numbers;
  *  - array elements keep explicit nulls.
  *
  * Decoding mirrors `from_json` where behaviors are observable:
  *  - missing/null properties decode to SQL NULL;
  *  - a non-string node declared STRING decodes to its compact JSON text;
  *  - integral targets accept only integral numbers (no silent 5.5 -> 5).
  */
object RowJson {

  private val F = JsonNodeFactory.instance

  /** NTZ render shape: seconds ALWAYS present (unlike LocalDateTime
    * .toString), fraction only when non-zero, up to micros (the column's
    * precision). */
  private[spark] val NtzFormatter: java.time.format.DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd'T'HH:mm:ss")
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 6, true)
      .optionalEnd()
      .toFormatter

  def rowToJson(row: InternalRow, schema: StructType): JsonNode = {
    val o = F.objectNode()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val f = schema(i)
        o.set[JsonNode](f.name, valueToNode(row.get(i, f.dataType), f.dataType))
      }
      i += 1
    }
    o
  }

  private def valueToNode(v: Any, dt: DataType): JsonNode = dt match {
    case BooleanType => F.booleanNode(v.asInstanceOf[Boolean])
    case ByteType => F.numberNode(v.asInstanceOf[Byte].toInt)
    case ShortType => F.numberNode(v.asInstanceOf[Short].toInt)
    case IntegerType => F.numberNode(v.asInstanceOf[Int])
    case LongType => F.numberNode(v.asInstanceOf[Long])
    case FloatType => F.numberNode(v.asInstanceOf[Float])
    case DoubleType => F.numberNode(v.asInstanceOf[Double])
    case _: DecimalType => F.numberNode(v.asInstanceOf[Decimal].toJavaBigDecimal)
    case StringType => F.textNode(v.toString)
    case BinaryType =>
      F.textNode(java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]]))
    case DateType => F.textNode(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
    case TimestampType =>
      // micros since epoch, UTC ISO-8601 (sessions here pin UTC)
      F.textNode(java.time.Instant.ofEpochSecond(
        Math.floorDiv(v.asInstanceOf[Long], 1000000L),
        Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toString)
    case TimestampNTZType =>
      // micros since epoch with NO zone attached: render the wall-clock
      // reading as ISO-8601 local date-time (no 'Z'), mirroring the logical
      // type's zone-free semantics (and the reference's logical-type
      // fidelity, JsonataTransformation.java:530-649). A FIXED formatter,
      // not LocalDateTime.toString: toString drops ":00" seconds, so the
      // envelope string's width would vary per value and string operations
      // ($substring, $split, lexicographic compares) over a rendered NTZ
      // column would behave inconsistently across rows. Seconds always
      // print; a non-zero fraction prints at its natural width (the decoder
      // accepts both shapes).
      F.textNode(java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(v.asInstanceOf[Long], 1000000L),
        (Math.floorMod(v.asInstanceOf[Long], 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC).format(RowJson.NtzFormatter))
    case _: TimeType =>
      // nanos of day -> ISO-8601 local time
      F.textNode(java.time.LocalTime.ofNanoOfDay(v.asInstanceOf[Long]).toString)
    case st: StructType => rowToJson(v.asInstanceOf[InternalRow], st)
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      val a = F.arrayNode(arr.numElements())
      var i = 0
      while (i < arr.numElements()) {
        if (arr.isNullAt(i)) a.add(F.nullNode())
        else a.add(valueToNode(arr.get(i, et), et))
        i += 1
      }
      a
    case MapType(StringType, vt, _) =>
      val m = v.asInstanceOf[MapData]
      val o = F.objectNode()
      val keys = m.keyArray()
      val vals = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        val k = keys.getUTF8String(i).toString
        if (vals.isNullAt(i)) o.set[JsonNode](k, F.nullNode())
        else o.set[JsonNode](k, valueToNode(vals.get(i, vt), vt))
        i += 1
      }
      o
    case other => throw new UnsupportedOperationException(s"rowToJson: unsupported type $other")
  }

  def jsonToRow(node: JsonNode, schema: StructType): InternalRow = {
    val out = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      out(i) = nodeToValue(node.get(schema(i).name), schema(i).dataType)
      i += 1
    }
    new GenericInternalRow(out)
  }

  private def nodeToValue(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull) return null
    dt match {
      case StringType =>
        if (n.isTextual) UTF8String.fromString(n.textValue())
        else UTF8String.fromString(Values.jsonSerialize(n, prettify = false))
      case BooleanType => if (n.isBoolean) n.booleanValue() else null
      case LongType => if (n.canConvertToLong && n.isIntegralNumber) n.longValue() else null
      case IntegerType => if (n.canConvertToInt && n.isIntegralNumber) n.intValue() else null
      case ShortType => if (n.canConvertToInt && n.isIntegralNumber) n.intValue().toShort else null
      case ByteType => if (n.canConvertToInt && n.isIntegralNumber) n.intValue().toByte else null
      case DoubleType => if (n.isNumber) n.doubleValue() else null
      case FloatType => if (n.isNumber) n.floatValue() else null
      case d: DecimalType =>
        if (!n.isNumber) null
        else {
          val dec = Decimal(n.decimalValue())
          if (dec.changePrecision(d.precision, d.scale)) dec else null
        }
      case DateType =>
        if (!n.isTextual) null
        else try LocalDate.parse(n.textValue()).toEpochDay.toInt
        catch { case _: java.time.format.DateTimeParseException => null }
      case TimestampType =>
        if (!n.isTextual) null
        else try {
          val inst = java.time.Instant.parse(n.textValue())
          inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        } catch { case _: java.time.format.DateTimeParseException => null }
      case TimestampNTZType =>
        // symmetric with encode: ISO local date-time (no zone) -> epoch
        // micros of the wall-clock reading; a trailing 'Z'/offset is ALSO
        // accepted (instant form), taken at its UTC reading
        if (!n.isTextual) null
        else try {
          val ldt = java.time.LocalDateTime.parse(n.textValue())
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
        } catch {
          case _: java.time.format.DateTimeParseException =>
            try {
              val inst = java.time.Instant.parse(n.textValue())
              inst.getEpochSecond * 1000000L + inst.getNano / 1000L
            } catch { case _: java.time.format.DateTimeParseException => null }
        }
      case _: TimeType =>
        if (!n.isTextual) null
        else try java.time.LocalTime.parse(n.textValue()).toNanoOfDay
        catch { case _: java.time.format.DateTimeParseException => null }
      case BinaryType =>
        if (!n.isTextual) null
        else try java.util.Base64.getDecoder.decode(n.textValue())
        catch { case _: IllegalArgumentException => null }
      case st: StructType => if (n.isObject) jsonToRow(n, st) else null
      case ArrayType(et, _) =>
        if (!n.isArray) null
        else {
          val out = new Array[Any](n.size())
          var i = 0
          while (i < n.size()) { out(i) = nodeToValue(n.get(i), et); i += 1 }
          new GenericArrayData(out)
        }
      case MapType(StringType, vt, _) =>
        if (!n.isObject) null
        else {
          val keys = new scala.collection.mutable.ArrayBuffer[Any](n.size())
          val vals = new scala.collection.mutable.ArrayBuffer[Any](n.size())
          val it = n.fields()
          while (it.hasNext) {
            val e = it.next()
            keys += UTF8String.fromString(e.getKey)
            vals += nodeToValue(e.getValue, vt)
          }
          ArrayBasedMapData(keys.toArray, vals.toArray)
        }
      case other => throw new UnsupportedOperationException(s"jsonToRow: unsupported type $other")
    }
  }
}
