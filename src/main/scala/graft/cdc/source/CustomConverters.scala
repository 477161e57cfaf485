package graft.cdc.source

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * User-defined deserialization converters — the engine's analogue of the
 * reference's converter-factory hook (SURVEY §2.6 U2,
 * MySqlDeserializationConverterFactory.java:44-151): a per-column override
 * that runs INSTEAD of [[JsonRowCodec]]'s default dispatch for columns
 * whose database type needs interpretation the wire format doesn't carry.
 *
 * Binding: a column opts in through its field COMMENT carrying a
 * `graft.type=<name>` tag (the stand-in for Debezium's logical schema
 * names — `io.debezium.data.geometry.Geometry`, `io.debezium.data.EnumSet`
 * — which ride the Kafka schema, not the value). The tag survives
 * `StructType.toDDL`/`fromDDL`, so it flows from the store's declared
 * schema through schema history to every decoder.
 *
 * Shipped converters (each mirrors a reference conversion):
 *  - `geometry`: wire `{"wkb": <base64 WKB>, "srid": n}` → GeoJSON string
 *    `{"type":"Point","coordinates":[x,y],"srid":n}` — the reference parses
 *    the Debezium geometry struct's WKB bytes and emits GeoJSON
 *    (MySqlDeserializationConverterFactory.java:77-106).
 *  - `set`: wire comma-joined string (how Debezium serializes MySQL SET)
 *    → `ARRAY<STRING>` (reference createArrayConverter, :117-151; Java
 *    split semantics, so `""` → `[""]` exactly as the reference's
 *    `String.split` does).
 *  - `year`: wire int → INT with MySQL YEAR two-digit widening
 *    (0-69 → 2000+v, 70-99 → 1900+v — io.debezium.time.Year semantics).
 *  - `objectid`: BSON extended-JSON `{"$oid": <24-hex>}` (or a bare hex
 *    string) → STRING — the reference renders ObjectId as its hex string
 *    (MongoDBConnectorDeserializationSchema.java:580-582).
 *  - `decimal128`: `{"$numberDecimal": "…"}` / string / number → DECIMAL,
 *    with the reference's coercions and non-finite clamping to
 *    ±Double.MAX_VALUE (createDecimalConverter, :657-687).
 *  - `uuid`: `{"$binary":{"base64":…,"subType":"04"}}` (or `{"$uuid":…}`)
 *    → canonical UUID STRING — the reference stringifies UUID-subtype
 *    binaries via `bsonBinary.asUuid()` (:573-578). Legacy subtype 0x03
 *    is rejected (driver-dependent byte order, as `asUuid()` throws
 *    without a UuidRepresentation) unless the column opts in via
 *    `uuid:java-legacy` / `uuid:csharp-legacy` / `uuid:python-legacy`,
 *    the analogue of constructing the Mongo driver with that
 *    UuidRepresentation.
 *  - `charset:<name>`: base64 bytes → STRING decoded with the declared
 *    column charset — the engine-side half of Debezium's per-column
 *    charset handling (the reference pins the capability in
 *    MysqlConnectorCharsetITCase: latin1/gbk/big5/… tables must read back
 *    as correct strings). The charset name resolves at construction.
 */
object CustomConverters {

  private val TagMark = "graft.type="

  /** The `graft.type` tag of a field, if its comment carries one. */
  def tagOf(f: StructField): Option[String] =
    if (f.metadata.contains("comment")) {
      val c = f.metadata.getString("comment")
      val i = c.indexOf(TagMark)
      if (i >= 0) {
        val rest = c.substring(i + TagMark.length)
        val end = rest.indexWhere(ch => ch.isWhitespace || ch == ';')
        Some(if (end >= 0) rest.substring(0, end) else rest)
      } else None
    } else None

  /** Converter for a tagged field, or None for untagged fields (default
    * codec dispatch). Unknown tags and tag/declared-type mismatches fail
    * at decoder CONSTRUCTION — a misconfigured column must not silently
    * fall back to the default and emit garbage. */
  def converterFor(f: StructField): Option[JsonNode => Any] = tagOf(f).map {
    case "geometry" =>
      require(f.dataType == StringType,
        s"graft.type=geometry column '${f.name}' must be declared STRING, " +
          s"got ${f.dataType.sql}")
      geometryToGeoJson _
    case "set" =>
      require(f.dataType == ArrayType(StringType) ||
        f.dataType == ArrayType(StringType, containsNull = false),
        s"graft.type=set column '${f.name}' must be declared ARRAY<STRING>," +
          s" got ${f.dataType.sql}")
      setToArray _
    case "year" =>
      require(f.dataType == IntegerType,
        s"graft.type=year column '${f.name}' must be declared INT, " +
          s"got ${f.dataType.sql}")
      yearToInt _
    case "objectid" =>
      require(f.dataType == StringType,
        s"graft.type=objectid column '${f.name}' must be declared STRING, " +
          s"got ${f.dataType.sql}")
      objectIdToString _
    case "decimal128" =>
      val d = f.dataType match {
        case d: DecimalType => d
        case other => throw new IllegalArgumentException(
          s"graft.type=decimal128 column '${f.name}' must be declared " +
            s"DECIMAL(p,s), got ${other.sql}")
      }
      (n: JsonNode) => decimal128ToDecimal(n, d.precision, d.scale)
    case "uuid" =>
      require(f.dataType == StringType,
        s"graft.type=uuid column '${f.name}' must be declared STRING, " +
          s"got ${f.dataType.sql}")
      (n: JsonNode) => uuidToString(n, None)
    case u if u.startsWith("uuid:") =>
      require(f.dataType == StringType,
        s"graft.type=$u column '${f.name}' must be declared STRING, " +
          s"got ${f.dataType.sql}")
      val rep = u.substring("uuid:".length) match {
        case r @ ("java-legacy" | "csharp-legacy" | "python-legacy") => r
        case other => throw new IllegalArgumentException(
          s"unknown legacy UUID representation '$other' on column " +
            s"'${f.name}' (known: java-legacy, csharp-legacy, " +
            "python-legacy)")
      }
      (n: JsonNode) => uuidToString(n, Some(rep))
    case cs if cs.startsWith("charset:") =>
      require(f.dataType == StringType,
        s"graft.type=$cs column '${f.name}' must be declared STRING, " +
          s"got ${f.dataType.sql}")
      val charset = // resolve NOW: a bad name is a configuration error
        try java.nio.charset.Charset.forName(cs.substring("charset:".length))
        catch { case e: Exception => throw new IllegalArgumentException(
          s"unknown charset in graft.type=$cs on column '${f.name}'", e) }
      (n: JsonNode) => charsetDecode(n, charset)
    case other => throw new IllegalArgumentException(
      s"unknown graft.type converter '$other' on column '${f.name}' " +
        "(known: geometry, set, year, objectid, decimal128, uuid, " +
        "uuid:<legacy-representation>, charset:<name>)")
  }

  /** Debezium-geometry wire struct → GeoJSON string. Parses point WKB
    * (byte order, uint32 type, x, y); a non-point or malformed value
    * throws (the reference throws IllegalArgumentException on conversion
    * failure too) and so flows to the reader's parse-error policy. */
  private def geometryToGeoJson(node: JsonNode): Any = {
    val wkbNode = node.get("wkb")
    require(wkbNode != null && wkbNode.isTextual,
      s"geometry value carries no 'wkb' field: $node")
    val wkb = java.util.Base64.getDecoder.decode(wkbNode.asText())
    require(wkb.length >= 21, s"WKB too short: ${wkb.length} bytes")
    val order =
      if (wkb(0) == 1) java.nio.ByteOrder.LITTLE_ENDIAN
      else java.nio.ByteOrder.BIG_ENDIAN
    val bb = java.nio.ByteBuffer.wrap(wkb, 1, wkb.length - 1).order(order)
    val geomType = bb.getInt
    require(geomType == 1, s"only point WKB supported here, got type $geomType")
    val x = bb.getDouble; val y = bb.getDouble
    val srid = node.get("srid") match {
      case s if s != null && s.canConvertToLong => s.asInt()
      case _ => 0 // reference: srid.orElse(0)
    }
    UTF8String.fromString(
      s"""{"type":"Point","coordinates":[$x,$y],"srid":$srid}""")
  }

  /** Comma-joined SET string → ARRAY<STRING> (Java split semantics,
    * matching the reference's `((String) dbzObj).split(",")`). */
  private def setToArray(node: JsonNode): Any = {
    require(node.isTextual, s"SET value must be a string, got: $node")
    val parts = node.asText().split(",")
    new GenericArrayData(
      parts.map(p => UTF8String.fromString(p): Any))
  }

  /** MySQL YEAR widening: two-digit years map into 1970–2069. */
  private def yearToInt(node: JsonNode): Any = {
    require(node.canConvertToLong, s"YEAR value must be integral, got: $node")
    val v = node.asInt()
    if (v >= 0 && v <= 69) 2000 + v
    else if (v >= 70 && v <= 99) 1900 + v
    else v
  }

  /** BSON ObjectId → hex string (reference
    * `asObjectId().getValue().toHexString()`). Accepts the extended-JSON
    * `{"$oid": …}` wrapper or a bare string. */
  private def objectIdToString(node: JsonNode): Any = {
    val hex =
      if (node.isTextual) node.asText()
      else {
        val oid = node.get("$oid")
        require(oid != null && oid.isTextual,
          s"ObjectId value carries no '$$oid' field: $node")
        oid.asText()
      }
    require(hex.length == 24 && hex.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')
        || (c >= 'A' && c <= 'F')),
      s"not a 24-hex ObjectId: '$hex'")
    UTF8String.fromString(hex.toLowerCase)
  }

  /** BSON Decimal128 → Spark Decimal, with the reference's coercion set
    * (string, int32/int64, double) and its non-finite clamping: ±Infinity
    * (and NaN, which Decimal128 treats as non-negative non-finite) map to
    * ±Double.MAX_VALUE (createDecimalConverter, :664-672). */
  private def decimal128ToDecimal(node: JsonNode, precision: Int,
      scale: Int): Any = {
    val text =
      if (node.isObject) {
        val d = node.get("$numberDecimal")
        require(d != null && d.isTextual,
          s"Decimal128 value carries no '$$numberDecimal' field: $node")
        d.asText()
      } else if (node.isTextual || node.isNumber) node.asText()
      else throw new IllegalArgumentException(
        s"unable to convert to decimal from: $node")
    val bd = text match {
      case "-Infinity" => java.math.BigDecimal.valueOf(-Double.MaxValue)
      case "Infinity" | "NaN" => java.math.BigDecimal.valueOf(Double.MaxValue)
      case t => new java.math.BigDecimal(t)
    }
    // overflow → null, the reference's DecimalData.fromBigDecimal contract
    // (a clamped ±Double.MAX_VALUE rarely fits the declared precision)
    try Decimal(bd, precision, scale)
    catch { case _: ArithmeticException => null }
  }

  /** Base64 bytes in the declared column charset → string. */
  private def charsetDecode(node: JsonNode,
      charset: java.nio.charset.Charset): Any = {
    require(node.isTextual, s"charset value must be base64 text, got: $node")
    UTF8String.fromString(new String(
      java.util.Base64.getDecoder.decode(node.asText()), charset))
  }

  /** BSON UUID-subtype binary → canonical UUID string (reference
    * `bsonBinary.asUuid().toString()`). Accepts extended-JSON
    * `{"$binary":{"base64":…,"subType":"04"}}` or the `{"$uuid": …}`
    * canonical form.
    *
    * Legacy subtype 0x03's byte order depends on the WRITING driver
    * (Java/C#/Python all differ) — decoding it big-endian would emit a
    * wrong-but-plausible UUID. The reference's `bsonBinary.asUuid()`
    * throws for 0x03 without an explicit UuidRepresentation, and so does
    * the bare `uuid` tag here; `legacyRep` is the opt-in analogue of
    * passing a UuidRepresentation (`uuid:java-legacy` etc.), applying the
    * Mongo driver's documented byte orders:
    *  - java-legacy: both 8-byte halves byte-reversed,
    *  - csharp-legacy: bytes 0-3, 4-5, 6-7 each reversed (GUID layout),
    *  - python-legacy: big-endian, same bytes as standard.
    * Standard 0x04 values always decode big-endian; `legacyRep` only
    * governs 0x03. */
  private def uuidToString(node: JsonNode,
      legacyRep: Option[String]): Any = {
    val u = node.get("$uuid")
    if (u != null && u.isTextual)
      return UTF8String.fromString(
        java.util.UUID.fromString(u.asText()).toString)
    val bin = node.get("$binary")
    require(bin != null && bin.isObject,
      s"UUID value carries no '$$binary'/'$$uuid' field: $node")
    val sub = Option(bin.get("subType")).map(_.asText()).getOrElse("")
    val isLegacy = sub == "03" || sub == "3"
    require(isLegacy || sub == "04" || sub == "4",
      s"not a UUID binary subtype: '$sub'")
    require(!isLegacy || legacyRep.isDefined,
      "legacy UUID binary subtype 0x03 has driver-dependent byte order; " +
        "re-write with the standard subtype 0x04, tag the column " +
        "uuid:<java-legacy|csharp-legacy|python-legacy>, or decode as " +
        "raw binary")
    val bytes = java.util.Base64.getDecoder.decode(
      bin.get("base64").asText())
    require(bytes.length == 16, s"UUID binary must be 16 bytes, " +
      s"got ${bytes.length}")
    val ordered =
      if (!isLegacy) bytes
      else legacyRep.get match {
        case "java-legacy" =>
          bytes.slice(0, 8).reverse ++ bytes.slice(8, 16).reverse
        case "csharp-legacy" =>
          bytes.slice(0, 4).reverse ++ bytes.slice(4, 6).reverse ++
            bytes.slice(6, 8).reverse ++ bytes.slice(8, 16)
        case "python-legacy" => bytes
      }
    val bb = java.nio.ByteBuffer.wrap(ordered)
    UTF8String.fromString(
      new java.util.UUID(bb.getLong, bb.getLong).toString)
  }
}
