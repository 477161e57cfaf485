package graft

import graft.cdc.{ChangeRecord, Deserializers}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Schema-included Debezium-JSON wire format (the reference's
  * `includeSchema` variant, JsonDebeziumDeserializationSchema.java two-arg
  * constructor): the embedded Connect schema must re-derive the exact row
  * type, and values must round-trip through it without any caller-supplied
  * StructType on the parse path. */
class DeserializersSpec extends SparkSpecBase {

  private val payload = StructType(Seq(
    StructField("id", LongType),
    StructField("c_int", IntegerType),
    StructField("c_double", DoubleType),
    StructField("c_bool", BooleanType),
    StructField("c_str", StringType),
    StructField("c_dec", DecimalType(12, 3)),
    StructField("c_date", DateType),
    StructField("c_ts", TimestampType),
    StructField("c_arr", ArrayType(IntegerType)),
    StructField("c_map", MapType(StringType, LongType)),
    StructField("c_row", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  private def mkPayload(id: Long): Row = Row(
    id, id.toInt * 7, id * 0.25d, id % 2 == 0, s"s$id",
    new java.math.BigDecimal(s"$id.125"),
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(19000 + id)),
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + id)),
    Seq(id.toInt, id.toInt + 1), Map(s"k$id" -> id),
    Row(id.toInt, s"b$id"))

  private def envelope() = {
    import ChangeRecord._
    val rows = (1L to 5L).map { id =>
      Row(1000L + id, ExternalOp.Update, 1000L + id, "graft", "t",
        mkPayload(id), mkPayload(id * 10))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows),
      ChangeRecord.envelopeSchema(payload))
  }

  test("embedded Connect schema re-derives the exact StructType") {
    val jsons = Deserializers.toJsonStringsWithSchema(envelope(), payload)
    val derived = Deserializers.payloadSchemaFromJson(jsons.head())
    // compare type-for-type (nullability of primitives rides `optional`)
    assert(derived.treeString === payload.treeString)
  }

  test("schema-included documents round-trip values without a caller schema") {
    val env = envelope()
    val jsons = Deserializers.toJsonStringsWithSchema(env, payload)
    val back = Deserializers.fromJsonStringsWithSchema(jsons)
    // from_json output is uniformly nullable — compare modulo nullability
    // (the payload struct inside is what the embedded schema derived)
    def nn(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        f.copy(dataType = nn(f.dataType), nullable = true)))
      case ArrayType(et, _) => ArrayType(nn(et), containsNull = true)
      case MapType(kt, vt, _) => MapType(nn(kt), nn(vt),
        valueContainsNull = true)
      case other => other
    }
    assert(nn(back.schema).asInstanceOf[StructType].treeString ===
      nn(env.schema).asInstanceOf[StructType].treeString)
    val a = env.orderBy("__offset").collect().map(_.toString)
    val b = back.orderBy("__offset").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("foreign-format documents (whitespace / key order) parse identically" +
      " through the full-parse fallback") {
    val env = envelope()
    val jsons = Deserializers.toJsonStringsWithSchema(env, payload)
    // Re-shape every document so it can NOT match the canonical constant
    // prefix: payload first, a space after the opening brace. A correct
    // reader must produce the same envelope rows through the general path.
    val foreign = jsons.map { doc =>
      val i = doc.indexOf(""","payload":""")
      val schemaPart = doc.substring(1, i) // "schema":{...}
      val payloadPart = doc.substring(i + 1, doc.length - 1) // "payload":{...}
      s"""{ $payloadPart, $schemaPart }"""
    }(org.apache.spark.sql.Encoders.STRING)
    val canonical = Deserializers.fromJsonStringsWithSchema(jsons)
      .orderBy("__offset").collect().map(_.toString)
    val viaFallback = Deserializers.fromJsonStringsWithSchema(foreign)
      .orderBy("__offset").collect().map(_.toString)
    assert(viaFallback.toSeq === canonical.toSeq)
  }

  test("schemaless documents are rejected by the schema-included reader") {
    val jsons = Deserializers.toJsonStrings(envelope())
    val e = intercept[IllegalArgumentException] {
      Deserializers.fromJsonStringsWithSchema(jsons)
    }
    assert(e.getMessage.contains("no embedded schema"))
  }
}
