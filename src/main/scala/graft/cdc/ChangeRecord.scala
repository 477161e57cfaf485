package graft.cdc

import org.apache.spark.sql.types._

/**
 * The changelog data model: a Spark-native re-expression of the Debezium
 * envelope the reference emits from every connector
 * (reference: flink-connector-debezium/src/main/java/com/ververica/cdc/debezium/table/
 * RowDataDebeziumDeserializeSchema.java:118-146 — ops c/r/u/d dispatched to
 * INSERT / UPDATE_BEFORE / UPDATE_AFTER / DELETE row kinds).
 *
 * Spark has no out-of-band RowKind, so the operation travels as an ordinary
 * column (`__op`) and Catalyst prunes/pushes around it like any other column.
 */
object ChangeRecord {

  /** External (storage) operation codes — Debezium envelope codes. */
  object ExternalOp {
    val Create = "c" // insert
    val Read   = "r" // snapshot read
    val Update = "u"
    val Delete = "d"
    /** Table truncation (Debezium emits `t` for MySQL TRUNCATE TABLE).
      * Carries no row images. The snapshot merge treats it as "every row
      * whose newest write precedes this offset is dead"; the log phase
      * emits nothing for it — there is no retract-stream row kind for a
      * whole-table operation. Upstream that is Debezium's
      * skipped.operations DEFAULT (`t`) dropping truncates before the
      * deserializer ever sees one; the reference's deserializer
      * (RowDataDebeziumDeserializeSchema.java:123-145) special-cases only
      * CREATE/READ/DELETE and routes every other op through its update
      * branch, so a truncate reaching it would be mis-emitted, not
      * skipped — the drop must happen at the envelope filter, as here. */
    val Truncate = "t"
    /** Schema-change event (reference: surfaced when includeSchemaChanges,
      * MySqlRecordEmitter.java:95-107; tracked in the database history,
      * FlinkDatabaseHistory / EmbeddedFlinkDatabaseHistory). Routed to the
      * schema history, never into the data stream. */
    val SchemaChange = "ddl"
  }

  /**
   * Emitted row kinds, mirroring Flink's RowKind short strings
   * (reference RowDataDebeziumDeserializeSchema.java:123-145).
   */
  object RowKind {
    val Insert       = "+I"
    val UpdateBefore = "-U"
    val UpdateAfter  = "+U"
    val Delete       = "-D"
  }

  /**
   * Changelog modes (reference: flink-connector-debezium/.../table/
   * DebeziumChangelogMode.java:20-27). ALL = retract stream with -U/+U;
   * UPSERT suppresses UPDATE_BEFORE (valid only with a primary key —
   * MongoDB is inherently upsert-only, MongoDBTableSource.java:132-138).
   */
  sealed trait ChangelogMode
  case object ChangelogAll    extends ChangelogMode
  case object ChangelogUpsert extends ChangelogMode

  // ---- metadata / envelope column names --------------------------------

  /** Emitted operation kind (+I/-U/+U/-D). */
  val OpCol = "__op"
  /** Total order over the change stream — the "binlog position". */
  val OffsetCol = "__offset"
  /** Change timestamp; 0 for snapshot records, mirroring the reference's
    * snapshot normalization (RecordUtils.java:117-148). */
  val TsCol = "__ts_ms"
  /** Metadata ("virtual") columns, reference MySqlReadableMetadata.java:33-86. */
  val DbCol    = "__db"
  val TableCol = "__table"
  /** Per-connector EXTRA metadata columns, NULL where the source store has
    * no such concept: Oracle exposes the owning schema
    * (OracleReadableMetaData.java:34-99, `schema_name`) and OceanBase the
    * tenant (OceanBaseReadableMetadata.java:28-86, `tenant_name`). One
    * closed column set serves every dialect — Catalyst prunes the columns
    * when unused, so dialects without the concept pay nothing. */
  val SchemaCol = "__schema"
  val TenantCol = "__tenant"

  val MetaCols: Seq[String] =
    Seq(OpCol, OffsetCol, TsCol, DbCol, TableCol, SchemaCol, TenantCol)

  /** Envelope storage columns (before/after images as nested structs). */
  val BeforeCol = "before"
  val AfterCol  = "after"

  /** Schema-change record columns (only on `__op = "ddl"` log lines): the
    * DDL statement and the full post-change schema as Spark DDL — what the
    * reference serializes per TableChange (FlinkJsonTableChangeSerializer). */
  val DdlCol       = "__ddl"
  val SchemaDdlCol = "__schema_ddl"

  /** Envelope schema for a table with the given payload schema. */
  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField(OffsetCol, LongType, nullable = false),
    StructField(OpCol, StringType, nullable = false), // external: c/r/u/d
    StructField(TsCol, LongType, nullable = false),
    StructField(DbCol, StringType, nullable = false),
    StructField(TableCol, StringType, nullable = false),
    StructField(BeforeCol, payload, nullable = true),
    StructField(AfterCol, payload, nullable = true)
  ))
}
