package graft

import graft.cdc.source.CdcSourceConfig
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/**
 * Locks the source's option surface to the reference's option table
 * (MySqlSourceOptions.java:30-249): every reference option is either
 * MAPPED to a config key with the same name (and, where the reference
 * declares one, the same default), carried by a named ANALOGUE, or
 * explicitly N/A with a recorded reason. A reference option missing from
 * this table — or a name/default that drifts — fails the suite.
 */
class OptionParitySpec extends AnyFunSuite {

  sealed trait Parity
  /** Same option name; `default` asserts the reference default survives a
    * minimal `fromOptions` round-trip (None = reference has no default). */
  case class Mapped(key: String, default: Option[CdcSourceConfig => Boolean])
      extends Parity
  /** Different name/shape, same capability. */
  case class Analogue(key: String, why: String) extends Parity
  /** No Spark-side counterpart, with the reason recorded. */
  case class NA(why: String) extends Parity

  private def minimal(extra: (String, String)*): CdcSourceConfig =
    CdcSourceConfig.fromOptions(new CaseInsensitiveStringMap(
      (Map("path" -> "/tmp/parity-db", "table" -> "t") ++ extra).asJava))

  /** The reference's full option table (MySqlSourceOptions.java), each row
    * classified. Defaults quoted from the reference source. */
  private val parity: Map[String, Parity] = Map(
    // -- connection endpoint: replaced by (path, dialect) --------------
    "hostname" -> NA("zero-egress store addressing: `path` + `dialect` " +
      "select the database (file / embedded-jdbc), not a network endpoint"),
    "port" -> NA("no network endpoint (see hostname); reference default 3306"),
    "username" -> NA("in-process stores carry no credentials"),
    "password" -> NA("in-process stores carry no credentials"),
    "database-name" -> NA("the database is the store at `path`; its name " +
      "is read from store metadata and emitted as the `__db` column"),
    "table-name" -> Mapped(CdcSourceConfig.TableNameKey, None),
    "server-time-zone" -> Mapped(CdcSourceConfig.ServerTimeZoneKey,
      // reference default: system zone; here UTC — zero-egress stores are
      // colocated, and a non-UTC store declares its zone explicitly
      Some(_.serverTimeZone == "UTC")),
    "server-id" -> NA("binlog wire-protocol client identity (ServerIdRange" +
      ".java) — a Spark reader holds no replication-protocol session; " +
      "documented accepted gap (SURVEY §2)"),

    // -- snapshot phase ------------------------------------------------
    "scan.incremental.snapshot.enabled" ->
      Mapped(CdcSourceConfig.IncrementalSnapshotKey,
        Some(_.incrementalSnapshot == true)), // reference default: true
    "scan.incremental.snapshot.chunk.size" ->
      Mapped(CdcSourceConfig.ChunkSizeKey,
        Some(_.chunkSize == 8096)), // reference default: 8096
    "scan.snapshot.fetch.size" ->
      Mapped(CdcSourceConfig.SnapshotFetchSizeKey,
        Some(_.snapshotFetchSize == 1024)), // reference default: 1024
    "scan.incremental.snapshot.chunk.key-column" ->
      Mapped(CdcSourceConfig.ChunkKeyColumnKey, None),
    "chunk-key.even-distribution.factor.upper-bound" ->
      Mapped(CdcSourceConfig.FactorUpperKey,
        Some(_.distributionFactorUpper == 1000.0)), // reference: 1000.0d
    "chunk-key.even-distribution.factor.lower-bound" ->
      Mapped(CdcSourceConfig.FactorLowerKey,
        Some(_.distributionFactorLower == 0.05)), // reference: 0.05d
    "chunk-meta.group.size" -> Analogue(
      CdcSourceConfig.MaxSnapshotPartitionsKey,
      "the reference groups chunk METAS (default 1000/group) to bound " +
        "enumerator RPC payloads; the Spark planner bounds the TASK count " +
        "directly — consecutive chunks group until the partition count " +
        "fits scan.snapshot.max-partitions"),

    // -- connection management -----------------------------------------
    "connect.timeout" -> NA("in-process engines have no network connect " +
      "phase to time out (reference default 30s)"),
    "connect.max-retries" -> NA("no network connect phase to retry " +
      "(reference default 3)"),
    "connection.pool.size" ->
      Mapped(CdcSourceConfig.ConnectionPoolSizeKey,
        // deliberate default drift, asserted so it stays documented: the
        // reference idles 20 server connections; an embedded engine's
        // connections are post-boot cheap, so 0 here = dialect default (8
        // idle per database), and any positive value sizes the pool as the
        // reference's option does
        Some(_.connectionPoolSize == 0)),

    // -- startup -------------------------------------------------------
    "scan.startup.mode" -> Mapped(CdcSourceConfig.StartupModeKey,
      Some(_.startupMode == "initial")), // reference default: initial
    "scan.startup.specific-offset.file" -> Analogue(
      CdcSourceConfig.SpecificOffsetKey,
      "binlog (file, pos) pairs and GTID sets collapse into the one " +
        "comparable offset space the store exposes"),
    "scan.startup.specific-offset.pos" -> Analogue(
      CdcSourceConfig.SpecificOffsetKey, "see specific-offset.file"),
    "scan.startup.specific-offset.gtid-set" -> Analogue(
      CdcSourceConfig.SpecificOffsetKey, "see specific-offset.file"),
    "scan.startup.specific-offset.skip-events" -> Mapped(
      CdcSourceConfig.SkipEventsKey, Some(_.skipEvents == 0L)),
    "scan.startup.specific-offset.skip-rows" -> Mapped(
      CdcSourceConfig.SkipRowsKey, Some(_.skipRows == 0)),
    "scan.startup.timestamp-millis" ->
      Mapped(CdcSourceConfig.TimestampKey, None),

    // -- stream phase --------------------------------------------------
    "heartbeat.interval" -> NA("heartbeats keep a push-based source's " +
      "offset fresh on idle streams; a micro-batch source's latestOffset " +
      "poll IS the heartbeat (reference default 30s)"),
    "scan.newly-added-table.enabled" -> Analogue(
      CdcSourceConfig.TableKey,
      "always on: `table` regexes select tables at every batch boundary " +
        "and the stream offset carries the snapshotted-table set, so a " +
        "later-matching table is snapshotted then streamed without a flag"))

  test("every reference option is classified (table drift fails here)") {
    // names transcribed from MySqlSourceOptions.java:30-249 — adding an
    // option to the reference without classifying it here must fail
    val referenceOptions = Set(
      "hostname", "port", "username", "password", "database-name",
      "table-name", "server-time-zone", "server-id",
      "scan.incremental.snapshot.enabled",
      "scan.incremental.snapshot.chunk.size", "scan.snapshot.fetch.size",
      "connect.timeout", "connection.pool.size", "connect.max-retries",
      "scan.startup.mode", "scan.startup.specific-offset.file",
      "scan.startup.specific-offset.pos",
      "scan.startup.specific-offset.gtid-set",
      "scan.startup.specific-offset.skip-events",
      "scan.startup.specific-offset.skip-rows",
      "scan.startup.timestamp-millis", "heartbeat.interval",
      "chunk-meta.group.size",
      "chunk-key.even-distribution.factor.upper-bound",
      "chunk-key.even-distribution.factor.lower-bound",
      "scan.newly-added-table.enabled",
      "scan.incremental.snapshot.chunk.key-column")
    assert(parity.keySet === referenceOptions)
  }

  test("mapped options use the reference's exact name") {
    parity.foreach {
      case (ref, Mapped(key, _)) =>
        assert(key === ref, s"mapped option '$ref' drifted to '$key'")
      case _ => ()
    }
  }

  test("mapped defaults survive a minimal fromOptions round-trip") {
    val cfg = minimal()
    parity.foreach {
      case (ref, Mapped(_, Some(check))) =>
        assert(check(cfg), s"default of '$ref' drifted")
      case _ => ()
    }
  }

  test("mapped options parse through fromOptions under their own key") {
    // a key that fromOptions never reads would silently fall back to its
    // default — prove each mapped key actually lands in the config
    assert(minimal(CdcSourceConfig.ChunkSizeKey -> "123").chunkSize === 123)
    assert(minimal(CdcSourceConfig.SnapshotFetchSizeKey -> "77")
      .snapshotFetchSize === 77)
    assert(minimal(CdcSourceConfig.IncrementalSnapshotKey -> "false")
      .incrementalSnapshot === false)
    assert(minimal(CdcSourceConfig.ConnectionPoolSizeKey -> "5")
      .connectionPoolSize === 5)
    assert(minimal(CdcSourceConfig.FactorUpperKey -> "42.0")
      .distributionFactorUpper === 42.0)
    assert(minimal(CdcSourceConfig.FactorLowerKey -> "0.2")
      .distributionFactorLower === 0.2)
    assert(minimal(CdcSourceConfig.StartupModeKey -> "timestamp",
      CdcSourceConfig.TimestampKey -> "12345").timestampMs === 12345L)
    assert(minimal(CdcSourceConfig.ChunkKeyColumnKey -> "k2")
      .chunkKeyColumn === Some("k2"))
    // table-name works standalone (the reference's only table selector)
    val byRefName = CdcSourceConfig.fromOptions(new CaseInsensitiveStringMap(
      Map("path" -> "/tmp/parity-db",
        CdcSourceConfig.TableNameKey -> "orders_.*").asJava))
    assert(byRefName.table === "orders_.*")
  }

  test("legacy key spellings remain readable as fallback aliases") {
    assert(minimal(CdcSourceConfig.TimestampLegacyKey -> "999")
      .timestampMs === 999L)
    assert(minimal(CdcSourceConfig.ChunkKeyColumnLegacyKey -> "k3")
      .chunkKeyColumn === Some("k3"))
    // canonical wins when both are present
    assert(minimal(CdcSourceConfig.TimestampKey -> "1",
      CdcSourceConfig.TimestampLegacyKey -> "2").timestampMs === 1L)
  }

  test("MongoDB poll/copy-existing option names are accepted " +
      "(MongoDBSourceOptions.java:81-111)") {
    // poll.max.batch.size bounds events per change-stream fetch — the
    // micro-batch analogue is max-events-per-trigger, so it aliases
    assert(minimal(CdcSourceConfig.PollMaxBatchSizeKey -> "250")
      .maxEventsPerTrigger === 250L)
    // canonical key wins when both are present
    assert(minimal(CdcSourceConfig.MaxEventsPerTriggerKey -> "7",
      CdcSourceConfig.PollMaxBatchSizeKey -> "250")
      .maxEventsPerTrigger === 7L)
    // await-time / queue-size are pull-model no-ops but must VALIDATE:
    // a malformed value fails at analysis like the reference
    assert(minimal(CdcSourceConfig.PollAwaitTimeMsKey -> "1500")
      .maxEventsPerTrigger === 0L) // accepted, no behavioral coupling
    assert(minimal(CdcSourceConfig.CopyExistingQueueSizeKey -> "10240")
      .path.nonEmpty)
    intercept[IllegalArgumentException] {
      minimal(CdcSourceConfig.PollAwaitTimeMsKey -> "-1")
    }
    intercept[IllegalArgumentException] {
      minimal(CdcSourceConfig.CopyExistingQueueSizeKey -> "0")
    }
  }
}
