package graft.cdc.source

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}

/**
 * Executor-side JSON → InternalRow decoder, driven by a StructType.
 *
 * This is the engine's analogue of the reference's per-type
 * deserialization-converter stack (RowDataDebeziumDeserializeSchema.java:
 * 243-657): null-safe per-field converters over the §1.3 type set —
 * primitives, DECIMAL, DATE, TIME-less temporals, STRING, BINARY, and nested
 * ROW (plus ARRAY/MAP, which the reference only supports in its MongoDB BSON
 * converter, MongoDBConnectorDeserializationSchema.java:220-272).
 *
 * The encode side is Spark's own `df.write.json` (fixture writer), so the
 * wire format is Spark-JSON: ISO-8601 temporals, base64 binary.
 */
class JsonRowCodec(schema: StructType, serverTimeZone: String = "UTC")
    extends Serializable {

  @transient private lazy val mapper = new ObjectMapper()

  /** Zone that zoneless TIMESTAMP wire strings are interpreted in — the
    * reference's `server-time-zone` shift (RowDataDebeziumDeserializeSchema
    * .java:469-530: MySQL TIMESTAMP values reach the converter as wall-clock
    * strings in the SERVER's zone and must be shifted to epoch). */
  @transient private lazy val serverZoneId = java.time.ZoneId.of(serverTimeZone)

  /** Per-struct custom-converter slots (U2 hook): for every StructType
    * reachable from `schema` with at least one `graft.type`-tagged field,
    * the field-indexed converter array (null = default dispatch). Built
    * once per codec and read-only after (thread-safe reads); lookup is by
    * StructType VALUE (deep equals/hashCode), so structurally-equal schema
    * instances — e.g. one re-parsed from DDL — hit the same slots. The
    * map is empty when nothing is tagged, making the per-row cost one
    * failed probe. Unknown tags fail HERE (first use), not per line. */
  @transient private lazy val customSlots
      : java.util.HashMap[StructType, Array[JsonNode => Any]] = {
    val m = new java.util.HashMap[StructType, Array[JsonNode => Any]]()
    def walk(st: StructType): Unit = if (!m.containsKey(st)) {
      val arr = st.fields.map(f => CustomConverters.converterFor(f).orNull)
      if (arr.exists(_ != null)) m.put(st, arr)
      st.fields.foreach { f =>
        f.dataType match {
          case s: StructType => walk(s)
          case ArrayType(s: StructType, _) => walk(s)
          case MapType(_, s: StructType, _) => walk(s)
          case _ => ()
        }
      }
    }
    walk(schema)
    m
  }
  // force tag validation at construction (and after executor-side
  // deserialization, on first use) — an unknown tag must be a loud
  // configuration error, never a per-line parse-policy skip
  customSlots

  def decode(line: String): InternalRow =
    convertStruct(mapper.readTree(line), schema)

  /** Decode only, returning the parsed tree too (for envelope routing). */
  def parse(line: String): JsonNode = mapper.readTree(line)

  def convertStruct(node: JsonNode, st: StructType): InternalRow = {
    if (node == null || node.isNull) return null
    // isEmpty guard: HashMap.get hashes the key even on an empty map, and
    // StructType.hashCode is O(fields) — untagged tables skip it entirely
    val custom = if (customSlots.isEmpty) null else customSlots.get(st)
    val row = new GenericInternalRow(st.size)
    var i = 0
    while (i < st.size) {
      val f = st(i)
      val v = node.get(f.name)
      val conv = if (custom == null) null else custom(i)
      row.update(i,
        if (conv != null && v != null && !v.isNull) conv(v)
        else convert(v, f.dataType))
      i += 1
    }
    row
  }

  def convert(node: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull) return null
    dt match {
      case BooleanType => node.asBoolean()
      case ByteType => node.asInt().toByte
      case ShortType => node.asInt().toShort
      case IntegerType => node.asInt()
      case LongType => node.asLong()
      case FloatType => node.asDouble().toFloat
      case DoubleType => node.asDouble()
      case StringType => UTF8String.fromString(
        if (node.isTextual) node.asText() else node.toString)
      case d: DecimalType =>
        Decimal(new java.math.BigDecimal(node.asText()), d.precision, d.scale)
      case BinaryType =>
        java.util.Base64.getDecoder.decode(node.asText())
      case DateType =>
        LocalDate.parse(node.asText()).toEpochDay.toInt
      case TimestampType =>
        JsonRowCodec.parseTimestampMicros(node.asText(), serverZoneId)
      case TimestampNTZType =>
        val ldt = LocalDateTime.parse(node.asText(),
          DateTimeFormatter.ISO_LOCAL_DATE_TIME)
        ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case st: StructType => convertStruct(node, st)
      case ArrayType(et, _) =>
        val n = node.size()
        val arr = new Array[Any](n)
        var i = 0
        while (i < n) { arr(i) = convert(node.get(i), et); i += 1 }
        new GenericArrayData(arr)
      case MapType(StringType, vt, _) =>
        val keys = scala.collection.mutable.ArrayBuffer[Any]()
        val vals = scala.collection.mutable.ArrayBuffer[Any]()
        node.properties().forEach { e =>
          keys += UTF8String.fromString(e.getKey)
          vals += convert(e.getValue, vt)
        }
        ArrayBasedMapData(keys.toArray, vals.toArray)
      case other =>
        throw new UnsupportedOperationException(
          s"JsonRowCodec: unsupported type $other")
    }
  }
}

object JsonRowCodec {
  /** Parse Spark-JSON timestamps to epoch micros. Strings carrying an
    * explicit offset ("2024-01-01T00:09:58.778Z", "+02:00") are absolute;
    * ZONELESS wall-clock strings are interpreted in `zone` — the
    * reference's server-time-zone semantics (MySqlSourceOptions
    * `server-time-zone`; RowDataDebeziumDeserializeSchema.java:469-530). */
  def parseTimestampMicros(s: String,
      zone: java.time.ZoneId = ZoneOffset.UTC): Long = {
    val inst: Instant =
      try OffsetDateTime.parse(s).toInstant
      catch {
        case _: Exception =>
          LocalDateTime.parse(s, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
            .atZone(zone).toInstant
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }
}
