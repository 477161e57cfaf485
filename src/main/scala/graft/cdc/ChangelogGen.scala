package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic changelog derivation — the zero-egress stand-in for a live
 * database transaction log (SURVEY §5 / FIXTURES §2.1). The reference's tests
 * run real databases in Testcontainers and mutate them mid-test
 * (e.g. MySqlConnectorITCase.java:214-310 interleaves INSERT/UPDATE/DELETE);
 * here every change is a pure, seedless function of the base parquet table so
 * the post-change state is independently computable by the DuckDB oracle.
 *
 * Change set for a base table with integral primary key `pk` and a numeric
 * `measure` column:
 *   - UPDATE rows where pk % updEvery == updSel: measure := measure * 2
 *     (exact in binary floating point — no cross-engine rounding skew)
 *   - INSERT copies of rows where pk % insEvery == insSel, with
 *     pk' = pk + insertKeyOffset
 *   - DELETE rows where pk % delEvery == delSel
 * Offsets are monotone and disjoint: updates < inserts < deletes, so the
 * materialized result is order-insensitive to ties.
 */
object ChangelogGen {

  case class Spec(
      pk: String,
      measure: String,
      db: String = "graft",
      table: String = "t",
      updEvery: Int = 10, updSel: Int = 7,
      insEvery: Int = 100, insSel: Int = 1,
      delEvery: Int = 13, delSel: Int = 3,
      insertKeyOffset: Long = 1000000000L) {

    // Offset bands; each event's offset = band + pk (unique, deterministic).
    val updBand = 1000000L
    val insBand = 2000000000L
    val delBand = 4000000000L
    // Schema-evolution bands (fullWithDdl): the DDL lands after inserts,
    // note-updates follow it, deletes come last.
    val ddlBand  = 3000000000L
    val noteBand = 3500000000L
  }

  import ChangeRecord._

  /** All payload (non-meta) columns of `base`, in schema order. */
  private def payloadCols(base: DataFrame): Seq[String] = base.schema.fieldNames.toSeq

  private def image(base: DataFrame, overrides: Map[String, Column]): Column =
    struct(payloadCols(base).map(c => overrides.getOrElse(c, col(c)).as(c)): _*)

  private def nullImage(base: DataFrame): Column =
    lit(null).cast(base.schema).as("nullimg")

  /**
   * The change events (no snapshot records) as an envelope DataFrame with
   * schema [[ChangeRecord.envelopeSchema]], ordered by `__offset`.
   */
  def changes(base: DataFrame, spec: Spec): DataFrame = {
    val pk = col(spec.pk)

    val updated = base
      .filter(pk % spec.updEvery === spec.updSel)
      .select(
        (lit(spec.updBand) + pk.cast(LongType)).as(OffsetCol),
        lit(ExternalOp.Update).as(OpCol),
        (lit(spec.updBand) + pk.cast(LongType)).as(TsCol),
        lit(spec.db).as(DbCol),
        lit(spec.table).as(TableCol),
        image(base, Map.empty).as(BeforeCol),
        image(base, Map(spec.measure -> col(spec.measure) * 2)).as(AfterCol))

    val inserted = base
      .filter(pk % spec.insEvery === spec.insSel)
      .select(
        (lit(spec.insBand) + pk.cast(LongType)).as(OffsetCol),
        lit(ExternalOp.Create).as(OpCol),
        (lit(spec.insBand) + pk.cast(LongType)).as(TsCol),
        lit(spec.db).as(DbCol),
        lit(spec.table).as(TableCol),
        nullImage(base).as(BeforeCol),
        image(base, Map(spec.pk ->
          (pk.cast(LongType) + spec.insertKeyOffset).cast(base.schema(spec.pk).dataType)))
          .as(AfterCol))

    val deleted = base
      .filter(pk % spec.delEvery === spec.delSel)
      .select(
        (lit(spec.delBand) + pk.cast(LongType)).as(OffsetCol),
        lit(ExternalOp.Delete).as(OpCol),
        (lit(spec.delBand) + pk.cast(LongType)).as(TsCol),
        lit(spec.db).as(DbCol),
        lit(spec.table).as(TableCol),
        // before-image reflects any earlier update (offset order: upd < del)
        image(base, Map(spec.measure -> when(pk % spec.updEvery === spec.updSel,
          col(spec.measure) * 2).otherwise(col(spec.measure)))).as(BeforeCol),
        nullImage(base).as(AfterCol))

    updated.unionByName(inserted).unionByName(deleted)
  }

  /**
   * Snapshot records (`op = r`, offset 0, ts 0 — the reference normalizes
   * snapshot ts_ms to 0, RecordUtils.java:117-148) for the base table.
   */
  def snapshotRecords(base: DataFrame, spec: Spec): DataFrame =
    base.select(
      lit(0L).as(OffsetCol),
      lit(ExternalOp.Read).as(OpCol),
      lit(0L).as(TsCol),
      lit(spec.db).as(DbCol),
      lit(spec.table).as(TableCol),
      nullImage(base).as(BeforeCol),
      image(base, Map.empty).as(AfterCol))

  /** Full envelope stream: snapshot followed by changes. */
  def full(base: DataFrame, spec: Spec): DataFrame =
    snapshotRecords(base, spec).unionByName(changes(base, spec))

  /**
   * Schema-evolution changelog (SURVEY §1.4): the [[full]] stream with, in
   * offset order after the inserts, one `__op="ddl"` record adding a STRING
   * column `note`, then UPDATEs that set `note = 'n' || pk` on the
   * measure-updated keys (pk % updEvery == updSel). Pre-DDL records simply
   * lack the column (null on decode); the DDL record carries the statement
   * and the full widened schema for [[SchemaHistory]].
   */
  def changesWithDdl(base: DataFrame, spec: Spec): DataFrame = {
    val widened = base.withColumn("note", lit(null).cast(StringType))
    val widenedSchema = StructType(base.schema.fields :+
      StructField("note", StringType))
    val pk = col(spec.pk)
    val doubled = col(spec.measure) * 2

    // pre-DDL events generated over the widened image (note = null
    // everywhere; the JSON writer drops null fields, so the wire bytes are
    // identical to base-schema lines)
    val preDdl = changes(widened, spec)

    val ddlRecord = base.limit(1).select(
      lit(spec.ddlBand).as(OffsetCol),
      lit(ExternalOp.SchemaChange).as(OpCol),
      lit(spec.ddlBand).as(TsCol),
      lit(spec.db).as(DbCol),
      lit(spec.table).as(TableCol),
      nullImage(widened).as(BeforeCol),
      nullImage(widened).as(AfterCol),
      lit(s"ALTER TABLE ${spec.table} ADD COLUMN note STRING").as(DdlCol),
      lit(widenedSchema.toDDL).as(SchemaDdlCol))

    val noteUpdates = widened
      .filter(pk % spec.updEvery === spec.updSel)
      .select(
        (lit(spec.noteBand) + pk.cast(LongType)).as(OffsetCol),
        lit(ExternalOp.Update).as(OpCol),
        (lit(spec.noteBand) + pk.cast(LongType)).as(TsCol),
        lit(spec.db).as(DbCol),
        lit(spec.table).as(TableCol),
        // these keys were measure-updated earlier (same selector)
        image(widened, Map(spec.measure -> doubled)).as(BeforeCol),
        image(widened, Map(spec.measure -> doubled,
          "note" -> concat(lit("n"), pk.cast(StringType)))).as(AfterCol))

    val withDdlCols = preDdl.unionByName(noteUpdates)
      .withColumn(DdlCol, lit(null).cast(StringType))
      .withColumn(SchemaDdlCol, lit(null).cast(StringType))
    withDdlCols.unionByName(ddlRecord)
  }

  /** Oracle SQL for the final state after [[fullWithDdl]]'s stream. */
  def oracleFinalStateWithDdlSql(spec: Spec, cols: Seq[String],
      table: String): String = {
    val noteExpr = s"CASE WHEN ${spec.pk} % ${spec.updEvery} = ${spec.updSel} " +
      s"THEN 'n' || CAST(${spec.pk} AS VARCHAR) END"
    val updatedCols = (cols.map {
      case c if c == spec.measure =>
        s"CASE WHEN ${spec.pk} % ${spec.updEvery} = ${spec.updSel} " +
          s"THEN ${spec.measure} * 2 ELSE ${spec.measure} END AS ${spec.measure}"
      case c => c
    } :+ s"$noteExpr AS note").mkString(", ")
    val insertCols = (cols.map {
      case c if c == spec.pk => s"${spec.pk} + ${spec.insertKeyOffset} AS ${spec.pk}"
      case c => c
    } :+ "NULL AS note").mkString(", ")
    s"""SELECT $updatedCols FROM $table WHERE ${spec.pk} % ${spec.delEvery} <> ${spec.delSel}
       |UNION ALL
       |SELECT $insertCols FROM $table WHERE ${spec.pk} % ${spec.insEvery} = ${spec.insSel}""".stripMargin
  }

  /**
   * DuckDB-oracle SQL for the table state AS OF a log offset `bound`
   * (inclusive) — the point-in-time twin of [[oracleFinalStateSql]].
   * Offsets band by change kind (updates < inserts < deletes, each band =
   * band + pk), so the bound selects per-kind which keys have been applied.
   */
  def oracleStateAtSql(spec: Spec, cols: Seq[String], table: String,
      bound: Long): String = {
    def applied(band: Long): String =
      // event offset = band + pk; applied iff band + pk <= bound
      s"${spec.pk} <= ${bound} - ${band}"
    val updatedCols = cols.map {
      case c if c == spec.measure =>
        s"CASE WHEN ${spec.pk} % ${spec.updEvery} = ${spec.updSel} " +
          s"AND ${applied(spec.updBand)} " +
          s"THEN ${spec.measure} * 2 ELSE ${spec.measure} END AS ${spec.measure}"
      case c => c
    }.mkString(", ")
    val insertCols = cols.map {
      case c if c == spec.pk => s"${spec.pk} + ${spec.insertKeyOffset} AS ${spec.pk}"
      case c => c
    }.mkString(", ")
    s"""SELECT $updatedCols FROM $table
       |WHERE NOT (${spec.pk} % ${spec.delEvery} = ${spec.delSel} AND ${applied(spec.delBand)})
       |UNION ALL
       |SELECT $insertCols FROM $table
       |WHERE ${spec.pk} % ${spec.insEvery} = ${spec.insSel} AND ${applied(spec.insBand)}""".stripMargin
  }

  /**
   * DuckDB-oracle SQL for the post-change ("materialized") state of `table`,
   * given the payload column list. Mirrors [[changes]] exactly.
   */
  def oracleFinalStateSql(spec: Spec, cols: Seq[String], table: String): String = {
    val updatedCols = cols.map {
      case c if c == spec.measure =>
        s"CASE WHEN ${spec.pk} % ${spec.updEvery} = ${spec.updSel} " +
          s"THEN ${spec.measure} * 2 ELSE ${spec.measure} END AS ${spec.measure}"
      case c => c
    }.mkString(", ")
    val insertCols = cols.map {
      case c if c == spec.pk => s"${spec.pk} + ${spec.insertKeyOffset} AS ${spec.pk}"
      case c => c
    }.mkString(", ")
    s"""SELECT $updatedCols FROM $table WHERE ${spec.pk} % ${spec.delEvery} <> ${spec.delSel}
       |UNION ALL
       |SELECT $insertCols FROM $table WHERE ${spec.pk} % ${spec.insEvery} = ${spec.insSel}""".stripMargin
  }
}
