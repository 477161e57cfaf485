package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.cdc.source.{CustomConverters, JsonRowCodec}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The U2 converter hook (CustomConverters / JsonRowCodec dispatch):
  * tag parsing, each shipped converter's edge behavior, and fail-fast on
  * misconfiguration. Reference behaviors mirrored from
  * MySqlDeserializationConverterFactory.java:44-151. */
class CustomConvertersSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def tagged(name: String, dt: DataType, tag: String): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder().putString("comment", s"graft.type=$tag").build())

  private def convert(f: StructField, json: String): Any = {
    val codec = new JsonRowCodec(StructType(Seq(f)))
    val row = codec.convertStruct(mapper.readTree(s"""{"${f.name}":$json}"""),
      StructType(Seq(f)))
    row.get(0, f.dataType)
  }

  test("tag parsing: bare, trailing text, absent") {
    assert(CustomConverters.tagOf(tagged("c", IntegerType, "year"))
      === Some("year"))
    val withText = StructField("c", IntegerType, nullable = true,
      new MetadataBuilder()
        .putString("comment", "established graft.type=year legacy").build())
    assert(CustomConverters.tagOf(withText) === Some("year"))
    assert(CustomConverters.tagOf(StructField("c", IntegerType)) === None)
  }

  test("year widening: MySQL YEAR two-digit mapping into 1970-2069") {
    val f = tagged("y", IntegerType, "year")
    assert(convert(f, "0") === 2000)
    assert(convert(f, "69") === 2069)
    assert(convert(f, "70") === 1970)
    assert(convert(f, "99") === 1999)
    assert(convert(f, "1985") === 1985)
  }

  test("set: comma split with Java semantics (empty string -> [''])") {
    val f = tagged("s", ArrayType(StringType), "set")
    val arr = convert(f, "\"a,b,c\"")
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() === 3)
    assert(arr.getUTF8String(1) === UTF8String.fromString("b"))
    val empty = convert(f, "\"\"")
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(empty.numElements() === 1) // "".split(",") == [""] (reference)
    assert(empty.getUTF8String(0) === UTF8String.fromString(""))
  }

  test("geometry: little- and big-endian point WKB to GeoJSON") {
    def wkb(le: Boolean, x: Double, y: Double): String = {
      val bb = java.nio.ByteBuffer.allocate(21).order(
        if (le) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      bb.put(if (le) 1.toByte else 0.toByte)
      bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
    val f = tagged("g", StringType, "geometry")
    val le = convert(f, s"""{"wkb":"${wkb(le = true, 3.0, -4.5)}","srid":7}""")
    assert(le.toString ===
      """{"type":"Point","coordinates":[3.0,-4.5],"srid":7}""")
    val be = convert(f, s"""{"wkb":"${wkb(le = false, 1.0, 2.0)}"}""")
    assert(be.toString ===
      """{"type":"Point","coordinates":[1.0,2.0],"srid":0}""") // srid.orElse(0)
  }

  test("null values bypass converters (nullable columns stay null)") {
    assert(convert(tagged("y", IntegerType, "year"), "null") === null)
  }

  test("unknown tag and declared-type mismatch fail at codec construction") {
    val unknown = StructType(Seq(tagged("c", StringType, "nosuch")))
    val e = intercept[IllegalArgumentException] { new JsonRowCodec(unknown) }
    assert(e.getMessage.contains("nosuch"))
    val mismatch = StructType(Seq(tagged("g", IntegerType, "geometry")))
    val e2 = intercept[IllegalArgumentException] { new JsonRowCodec(mismatch) }
    assert(e2.getMessage.contains("STRING"))
  }

  test("objectid: extended-JSON and bare hex forms " +
    "(MongoDBConnectorDeserializationSchema.java:580-582)") {
    val f = tagged("o", StringType, "objectid")
    val hex = "65a1b2c3d4e5f60718293a4b"
    assert(convert(f, s"""{"$$oid":"$hex"}""").toString === hex)
    assert(convert(f, s""""${hex.toUpperCase}"""").toString === hex)
    intercept[IllegalArgumentException] { convert(f, """{"$oid":"zz"}""") }
    intercept[IllegalArgumentException] { convert(f, """{"oid":"ab"}""") }
  }

  test("decimal128: $numberDecimal / string / number coercions and " +
    "non-finite clamping (:657-687)") {
    val f = tagged("d", DecimalType(20, 4), "decimal128")
    assert(convert(f, """{"$numberDecimal":"12.5"}""").toString === "12.5000")
    assert(convert(f, "\"7.25\"").toString === "7.2500")
    assert(convert(f, "42").toString === "42.0000")
    // non-finite Decimal128 clamps to ±Double.MAX_VALUE in the reference;
    // at DECIMAL(20,4) that overflows precision → null (Spark's overflow
    // contract for Decimal.set with precision bound), never garbage
    val inf = convert(f, """{"$numberDecimal":"Infinity"}""")
    assert(inf === null)
    intercept[IllegalArgumentException] { convert(f, "true") }
  }

  test("uuid: binary subtype 04 and $uuid forms stringify canonically " +
    "(:573-578)") {
    val f = tagged("u", StringType, "uuid")
    val msb = 0x0123456789abcdefL; val lsb = 0xfedcba9876543210L
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(msb); bb.putLong(lsb)
    val b64 = java.util.Base64.getEncoder.encodeToString(bb.array())
    val expect = new java.util.UUID(msb, lsb).toString
    assert(convert(f,
      s"""{"$$binary":{"base64":"$b64","subType":"04"}}""").toString
      === expect)
    assert(convert(f, s"""{"$$uuid":"$expect"}""").toString === expect)
    intercept[IllegalArgumentException] { // generic (non-UUID) subtype
      convert(f, s"""{"$$binary":{"base64":"$b64","subType":"00"}}""")
    }
    // legacy subtype 0x03: byte order depends on the WRITING driver —
    // decoding it big-endian would emit a wrong-but-plausible UUID, so it
    // is rejected (the reference's bsonBinary.asUuid() throws the same way)
    val legacy = intercept[IllegalArgumentException] {
      convert(f, s"""{"$$binary":{"base64":"$b64","subType":"03"}}""")
    }
    assert(legacy.getMessage.contains("0x03"), legacy.getMessage)
  }

  test("uuid:<legacy-representation>: opt-in 0x03 decode per driver " +
    "byte order; 0x04 stays standard; unknown rep fails at construction") {
    // raw BSON bytes as a Java-legacy driver writes them for this UUID
    val expect = "01234567-89ab-cdef-fedc-ba9876543210"
    val u = java.util.UUID.fromString(expect)
    val std = java.nio.ByteBuffer.allocate(16)
    std.putLong(u.getMostSignificantBits)
    std.putLong(u.getLeastSignificantBits)
    val stdBytes = std.array()
    val javaBytes = stdBytes.slice(0, 8).reverse ++
      stdBytes.slice(8, 16).reverse
    val csBytes = stdBytes.slice(0, 4).reverse ++
      stdBytes.slice(4, 6).reverse ++ stdBytes.slice(6, 8).reverse ++
      stdBytes.slice(8, 16)
    val b64 = java.util.Base64.getEncoder
    def legacyJson(bytes: Array[Byte]) =
      s"""{"$$binary":{"base64":"${b64.encodeToString(bytes)}","subType":"03"}}"""
    assert(convert(tagged("u", StringType, "uuid:java-legacy"),
      legacyJson(javaBytes)).toString === expect)
    assert(convert(tagged("u", StringType, "uuid:csharp-legacy"),
      legacyJson(csBytes)).toString === expect)
    assert(convert(tagged("u", StringType, "uuid:python-legacy"),
      legacyJson(stdBytes)).toString === expect)
    // subtype 04 decodes identically with or without a legacy rep
    val stdJson =
      s"""{"$$binary":{"base64":"${b64.encodeToString(stdBytes)}","subType":"04"}}"""
    assert(convert(tagged("u", StringType, "uuid:java-legacy"),
      stdJson).toString === expect)
    // unknown representation is a construction-time error
    val bad = StructType(Seq(tagged("u", StringType, "uuid:oracle-legacy")))
    val e = intercept[IllegalArgumentException] { new JsonRowCodec(bad) }
    assert(e.getMessage.contains("legacy UUID representation"))
  }

  test("charset:<name>: bytes decode with the declared column charset " +
    "(MysqlConnectorCharsetITCase capability)") {
    val b64 = java.util.Base64.getEncoder
    val latin1 = tagged("s", StringType, "charset:ISO-8859-1")
    val latin1Bytes = "café nº 7".getBytes(
      java.nio.charset.Charset.forName("ISO-8859-1"))
    assert(convert(latin1,
      s""""${b64.encodeToString(latin1Bytes)}"""").toString === "café nº 7")
    // the same bytes under a UTF-8 assumption would NOT round-trip
    // (0xE9 is not valid UTF-8 alone) — that is the decode being tested
    assert(new String(latin1Bytes, "UTF-8") != "café nº 7")
    val gbk = tagged("s", StringType, "charset:GBK")
    val gbkBytes = "数据 3".getBytes(java.nio.charset.Charset.forName("GBK"))
    assert(convert(gbk,
      s""""${b64.encodeToString(gbkBytes)}"""").toString === "数据 3")
    // unknown charset fails at construction, not per row
    val bad = StructType(Seq(tagged("s", StringType, "charset:NO-SUCH")))
    val e = intercept[IllegalArgumentException] { new JsonRowCodec(bad) }
    assert(e.getMessage.contains("charset"))
  }

  test("malformed geometry flows to the parse-error policy, not garbage") {
    val f = tagged("g", StringType, "geometry")
    intercept[IllegalArgumentException] { // non-point WKB type
      val bb = java.nio.ByteBuffer.allocate(21)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte); bb.putInt(2); bb.putDouble(0); bb.putDouble(0)
      convert(f, s"""{"wkb":"${
        java.util.Base64.getEncoder.encodeToString(bb.array())}"}""")
    }
    intercept[IllegalArgumentException] { // no wkb field at all
      convert(f, """{"srid":1}""")
    }
  }
}
