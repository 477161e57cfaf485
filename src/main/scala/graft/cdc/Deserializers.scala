package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * User-facing deserialization surface (SURVEY §2.6 U1) — the Spark
 * re-expression of `DebeziumDeserializationSchema<T>`:
 *
 *  - the typed path is just `Dataset[T]`: `df.as[T]` with an `Encoder`
 *    (the reference's custom `T` deserializers);
 *  - [[toJsonStrings]] mirrors `JsonDebeziumDeserializationSchema` — each
 *    change as one Debezium-style JSON document
 *    `{"before":…,"after":…,"op":…,"ts_ms":…,"source":{"db":…,"table":…}}`;
 *  - [[fromJsonStrings]] parses that JSON back into the envelope schema,
 *    so external changelog feeds (e.g. a Kafka topic of Debezium JSON) can
 *    enter the same pipeline.
 *
 * Both directions are native (`to_json`/`from_json` — codegen'd Jackson),
 * no UDFs.
 */
object Deserializers {

  import ChangeRecord._

  /** One Debezium-style JSON string per envelope record. */
  def toJsonStrings(envelope: DataFrame): Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    envelope.select(
      to_json(struct(
        col(BeforeCol).as("before"),
        col(AfterCol).as("after"),
        col(OpCol).as("op"),
        col(OffsetCol).as("offset"),
        col(TsCol).as("ts_ms"),
        struct(col(DbCol).as("db"), col(TableCol).as("table")).as("source")))
        .as("json")).as[String]
  }

  private def envelopeDocSchema(payload: StructType): StructType =
    StructType(Seq(
      StructField("before", payload, nullable = true),
      StructField("after", payload, nullable = true),
      StructField("op", StringType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("ts_ms", LongType, nullable = false),
      StructField("source", StructType(Seq(
        StructField("db", StringType), StructField("table", StringType))))))

  /** Parse Debezium-style JSON documents back into envelope rows. */
  def fromJsonStrings(jsons: Dataset[String], payload: StructType): DataFrame =
    jsons.toDF("value")
      .select(from_json(col("value"), envelopeDocSchema(payload)).as("d"))
      .select(
        col("d.offset").as(OffsetCol),
        col("d.op").as(OpCol),
        col("d.ts_ms").as(TsCol),
        col("d.source.db").as(DbCol),
        col("d.source.table").as(TableCol),
        col("d.before").as(BeforeCol),
        col("d.after").as(AfterCol))

  // ---- schema-included wire format (JsonDebeziumDeserializationSchema's
  // two-arg `includeSchema` constructor, flink-connector-debezium/.../
  // JsonDebeziumDeserializationSchema.java): each document is
  // {"schema": <Connect-style envelope schema>, "payload": <envelope>} and
  // the reader re-derives the row type FROM the embedded schema, not from
  // caller-supplied metadata. Connect type names follow Kafka's
  // JsonSchema ("int64", "float", "struct", ...); logical types ride the
  // `name` slot (org.apache.kafka.connect.data.Decimal/Date/Timestamp).
  // One honest deviation, kept for round-trip fidelity with the
  // schemaless form: temporal/decimal VALUES are rendered as Spark-JSON
  // (ISO-8601 / plain numbers), not Connect's epoch-int encodings — the
  // `name` annotation still identifies the logical type.

  private def connectTypeNode(mapper: com.fasterxml.jackson.databind.ObjectMapper,
      dt: DataType, optional: Boolean)
      : com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    dt match {
      case ByteType => n.put("type", "int8")
      case ShortType => n.put("type", "int16")
      case IntegerType => n.put("type", "int32")
      case LongType => n.put("type", "int64")
      case FloatType => n.put("type", "float")
      case DoubleType => n.put("type", "double")
      case BooleanType => n.put("type", "boolean")
      case StringType => n.put("type", "string")
      case BinaryType => n.put("type", "bytes")
      case d: DecimalType =>
        n.put("type", "bytes")
        n.put("name", "org.apache.kafka.connect.data.Decimal")
        val p = mapper.createObjectNode()
        p.put("scale", d.scale.toString)
        p.put("connect.decimal.precision", d.precision.toString)
        n.set("parameters", p)
      case DateType =>
        n.put("type", "int32")
        n.put("name", "org.apache.kafka.connect.data.Date")
      case TimestampType =>
        n.put("type", "int64")
        n.put("name", "org.apache.kafka.connect.data.Timestamp")
      case TimestampNTZType =>
        // Debezium's zoneless DATETIME semantic type (io.debezium.time
        // .Timestamp = epoch without zone), distinct from the zoned form
        n.put("type", "int64")
        n.put("name", "io.debezium.time.Timestamp")
      case ArrayType(et, containsNull) =>
        n.put("type", "array")
        n.set("items", connectTypeNode(mapper, et, containsNull))
      case MapType(kt, vt, valueContainsNull) =>
        n.put("type", "map")
        n.set("keys", connectTypeNode(mapper, kt, optional = false))
        n.set("values", connectTypeNode(mapper, vt, valueContainsNull))
      case st: StructType =>
        n.put("type", "struct")
        val fs = mapper.createArrayNode()
        st.fields.foreach { f =>
          val fn = connectTypeNode(mapper, f.dataType, f.nullable)
          fn.put("field", f.name)
          fs.add(fn)
        }
        n.set("fields", fs)
      case other => throw new UnsupportedOperationException(
        s"no Connect schema mapping for $other")
    }
    n.put("optional", optional)
    n
  }

  /** The Connect-style schema JSON for an envelope over `payload`. */
  def connectSchemaJson(payload: StructType): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    connectTypeNode(mapper, envelopeDocSchema(payload), optional = false)
      .toString
  }

  private def sparkTypeOf(node: com.fasterxml.jackson.databind.JsonNode)
      : DataType = {
    val name = Option(node.get("name")).map(_.asText()).getOrElse("")
    val tpe = node.get("type").asText()
    name match {
      case "org.apache.kafka.connect.data.Decimal" =>
        val p = node.get("parameters")
        DecimalType(p.get("connect.decimal.precision").asText().toInt,
          p.get("scale").asText().toInt)
      case "org.apache.kafka.connect.data.Date" => DateType
      case "org.apache.kafka.connect.data.Timestamp" => TimestampType
      case "io.debezium.time.Timestamp" => TimestampNTZType
      case _ => tpe match {
        case "int8" => ByteType
        case "int16" => ShortType
        case "int32" => IntegerType
        case "int64" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "boolean" => BooleanType
        case "string" => StringType
        case "bytes" => BinaryType
        case "array" => ArrayType(sparkTypeOf(node.get("items")),
          node.get("items").get("optional").asBoolean())
        case "map" => MapType(sparkTypeOf(node.get("keys")),
          sparkTypeOf(node.get("values")),
          node.get("values").get("optional").asBoolean())
        case "struct" =>
          val fs = node.get("fields")
          StructType((0 until fs.size()).map { i =>
            val f = fs.get(i)
            StructField(f.get("field").asText(), sparkTypeOf(f),
              f.get("optional").asBoolean())
          })
        case other => throw new UnsupportedOperationException(
          s"unknown Connect type '$other' in embedded schema")
      }
    }
  }

  /** Re-derive the table row type from one schema-included document — the
    * reader-side half of `includeSchema`: no caller-supplied StructType. */
  def payloadSchemaFromJson(doc: String): StructType = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(doc)
    val schema = root.get("schema")
    require(schema != null && !schema.isNull,
      "document carries no embedded schema — use fromJsonStrings with an " +
        "explicit payload StructType for the schemaless wire format")
    val before = {
      val fs = schema.get("fields")
      (0 until fs.size()).map(fs.get)
        .find(f => f.get("field").asText() == "before")
        .getOrElse(throw new IllegalArgumentException(
          "embedded schema has no 'before' field"))
    }
    sparkTypeOf(before) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"embedded 'before' schema is not a struct: $other")
    }
  }

  /** One schema-INCLUDED Debezium-style JSON document per envelope record:
    * `{"schema": …, "payload": {before, after, op, …}}`. The schema block
    * is constant across records (one table), so it is rendered once and
    * concatenated — the payload stays native codegen'd `to_json`. */
  def toJsonStringsWithSchema(envelope: DataFrame, payload: StructType)
      : Dataset[String] = {
    implicit val enc = org.apache.spark.sql.Encoders.STRING
    val schemaJson = connectSchemaJson(payload)
    envelope.select(
      concat(
        lit(s"""{"schema":$schemaJson,"payload":"""),
        to_json(struct(
          col(BeforeCol).as("before"),
          col(AfterCol).as("after"),
          col(OpCol).as("op"),
          col(OffsetCol).as("offset"),
          col(TsCol).as("ts_ms"),
          struct(col(DbCol).as("db"), col(TableCol).as("table"))
            .as("source"))),
        lit("}")).as("json")).as[String]
  }

  /** Parse schema-included documents: the row type comes from the FIRST
    * document's embedded schema (one driver-side head() — schema
    * inference is O(1), the data pass stays distributed `from_json`). */
  def fromJsonStringsWithSchema(jsons: Dataset[String]): DataFrame = {
    val first = jsons.limit(1).collect()
    require(first.nonEmpty,
      "cannot infer the embedded Connect schema from an EMPTY document " +
        "set — schema-included decoding needs at least one envelope " +
        "(use fromJsonStrings with an explicit schema for empty slices)")
    val payload = payloadSchemaFromJson(first.head)
    val docSchema = StructType(Seq(
      StructField("payload", envelopeDocSchema(payload))))
    jsons.toDF("value")
      .select(from_json(col("value"), docSchema).getField("payload").as("d"))
      .select(
        col("d.offset").as(OffsetCol),
        col("d.op").as(OpCol),
        col("d.ts_ms").as(TsCol),
        col("d.source.db").as(DbCol),
        col("d.source.table").as(TableCol),
        col("d.before").as(BeforeCol),
        col("d.after").as(AfterCol))
  }
}
