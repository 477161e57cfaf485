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

  /** Parse Debezium-style JSON documents back into envelope rows. */
  def fromJsonStrings(jsons: Dataset[String], payload: StructType): DataFrame = {
    val docSchema = StructType(Seq(
      StructField("before", payload, nullable = true),
      StructField("after", payload, nullable = true),
      StructField("op", StringType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("ts_ms", LongType, nullable = false),
      StructField("source", StructType(Seq(
        StructField("db", StringType), StructField("table", StringType))))))
    jsons.toDF("value").select(from_json(col("value"), docSchema).as("d"))
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
