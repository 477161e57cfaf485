package graft.cdc.source

import graft.cdc.dialect.CdcDialects
import graft.cdc.{ChangeRecord, FileCdcDatabase}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/**
 * Executor-side read tasks of the CDC source.
 *
 * [[SnapshotChunkReader]] implements the DBLog-style chunk read (SURVEY §2.3
 * W1/W2, public algorithm arXiv:2010.12597): capture low watermark (0 — the
 * file snapshot's fixed point), read the chunk's rows, then replay the log
 * slice (low, high] restricted to the chunk's key range and merge by key —
 * CREATE/UPDATE replace, DELETE removes — exactly the normalization in the
 * reference's RecordUtils.upsertBinlog (RecordUtils.java:77-114). Output rows
 * are snapshot-kind inserts with ts 0 (RecordUtils.java:117-148).
 *
 * [[LogRangeReader]] is the stream-phase task: events in (from, to], with the
 * per-key shouldEmit gate (BinlogSplitReader.java:222-273) — here the
 * finished chunks share one high watermark (== from), so the gate reduces to
 * the range lower bound, but duplicates from the snapshot merge are provably
 * excluded either way.
 *
 * Memory bound: one chunk holds ≤ chunk-size merged rows (default 8096);
 * the log reader streams line by line. Both hold O(chunk), not O(table).
 */
/** Partitions carry their payload schema DDL (resolved on the driver from
  * the snapshot schema + DDL history at analysis time) — the same move as
  * the reference's snapshot splits carrying their `TableChange` schemas
  * (MySqlSnapshotSplit.tableSchemas, SURVEY §1.4): executors decode with
  * exactly the analyzed schema, never a fresher one.
  *
  * A snapshot partition holds one or more consecutive chunk ranges: at
  * 100 TB a table splits into millions of 8096-row chunks, and one Spark
  * partition per chunk would melt the scheduler — so the planner groups
  * consecutive chunks up to `scan.snapshot.max-partitions` partitions
  * (the scheduling analogue of the reference's chunk-meta groups,
  * MySqlSourceOptions.java:199-205). The reader still merges ONE chunk at
  * a time, so task memory stays O(chunk), not O(group). */
case class SnapshotChunkPartition(dialect: String, path: String,
    table: String, chunkId: Int,
    ranges: Seq[(Option[Long], Option[Long])],
    high: Long, schemaDdl: String,
    chunkKey: String = "",
    parsePolicy: String = "fail",
    serverTimeZone: String = "UTC",
    maskSpec: String = "") extends InputPartition

case class LogRangePartition(dialect: String, path: String, table: String,
    from: Long, to: Long, changelogMode: String,
    schemaDdl: String,
    parsePolicy: String = "fail",
    serverTimeZone: String = "UTC",
    maskSpec: String = "",
    skippedOps: String = "",
    /** Emitted rows of this range's FIRST event to drop — the
      * mid-transaction resume of BinlogOffset.rowsToSkip; nonzero only on
      * the range starting at a specific-offset seek position. */
    skipRows: Int = 0) extends InputPartition

class CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: SnapshotChunkPartition => new SnapshotChunkReader(p)
      case p: LogRangePartition => new LogRangeReader(p)
    }
}

/** Shared envelope-line decoding (the P2 projection: envelope → typed row).
  *
  * `schemaDdl` is the partition-carried OUTPUT schema: the analyzed table
  * schema after Catalyst column pruning — payload columns interleaved (in
  * original order) with whichever metadata columns the query references.
  * Decode runs over only the required payload fields (plus the chunk key,
  * which the merge always needs) — at 100 TB a 2-column projection over a
  * 40-column table must not JSON-decode the other 38. */
private[source] class EnvelopeDecoder(dialectName: String, path: String,
    table: String, schemaDdl: String, chunkKeyOpt: String = "",
    parsePolicy: String = "fail", serverTimeZone: String = "UTC",
    maskSpec: String = "") {
  val dialect = CdcDialects.byName(dialectName)
  val meta: FileCdcDatabase.TableMeta = dialect.tableMeta(path, table)
  /** Snapshot split key: pk unless overridden (chunk-key.column). Range
    * membership uses this; merge identity always uses the pk. */
  val chunkKey: String =
    if (chunkKeyOpt == null || chunkKeyOpt.isEmpty) meta.pk else chunkKeyOpt

  /** Output schema (payload subset + metadata subset), as analyzed. */
  val outSchema: StructType =
    if (schemaDdl == null || schemaDdl.isEmpty)
      StructType(meta.schema.fields ++ CdcTable.metaFields)
    else StructType.fromDDL(schemaDdl)

  private val metaNames = ChangeRecord.MetaCols.toSet
  /** Requested payload columns, in output order. */
  val payload: StructType =
    StructType(outSchema.fields.filterNot(f => metaNames.contains(f.name)))
  /** Decode schema = requested payload + pk and chunk key if pruned away
    * (the merge always needs the identity; range checks need the split
    * key). */
  val decodeSchema: StructType = {
    val need = Seq(meta.pk, chunkKey).distinct
      .filterNot(payload.fieldNames.contains)
    StructType(payload.fields ++
      need.map(n => meta.schema(meta.schema.fieldIndex(n))))
  }

  val codec = new JsonRowCodec(decodeSchema, serverTimeZone)
  val pkIdx: Int = decodeSchema.fieldIndex(meta.pk)
  val pkType = decodeSchema(pkIdx).dataType
  val ckIdx: Int = decodeSchema.fieldIndex(chunkKey)
  val ckType = decodeSchema(ckIdx).dataType

  case class Env(offset: Long, op: String, ts: Long,
      before: InternalRow, after: InternalRow) {
    private def img: InternalRow = if (after != null) after else before
    /** Merge identity (primary key). */
    def key: Long = CdcPlanner.toLongKey(img.get(pkIdx, pkType))
    /** Range membership (chunk key; key-stable by contract). */
    def chunkKeyVal: Long = CdcPlanner.toLongKey(img.get(ckIdx, ckType))
  }

  // meta longs must be integral JSON numbers: Jackson's asLong() coerces a
  // string/null/object to 0, which would mint a phantom offset-0 event
  // instead of surfacing the malformed line to the parse-error policy
  private def requireLong(n: com.fasterxml.jackson.databind.JsonNode,
      field: String): Long = {
    val v = n.get(field)
    require(v != null && v.canConvertToLong,
      s"envelope field '$field' is not an integral number: $v")
    v.asLong()
  }

  def decodeEnvelope(line: String): Env = {
    val n = codec.parse(line)
    Env(
      requireLong(n, ChangeRecord.OffsetCol),
      n.get(ChangeRecord.OpCol).asText(),
      requireLong(n, ChangeRecord.TsCol),
      codec.convertStruct(n.get(ChangeRecord.BeforeCol), decodeSchema),
      codec.convertStruct(n.get(ChangeRecord.AfterCol), decodeSchema))
  }

  /** [[decodeEnvelope]] under the parse-error policy (the reference's
    * Debezium errors.tolerance): None = line dropped (`skip`); `fail`
    * rethrows with the offending line's prefix for diagnosis. */
  def decodeEnvelopeSafe(line: String): Option[Env] =
    try Some(decodeEnvelope(line))
    catch {
      case scala.util.control.NonFatal(e) =>
        if (parsePolicy == "skip") None
        else throw new IllegalStateException(
          s"undecodable log line for $table (scan.parse.error-policy=fail): " +
            s"'${line.take(120)}'", e)
    }

  // out position -> decodeSchema position (payload) or -1-tag (meta col)
  private val MetaOp = -1; private val MetaOffset = -2; private val MetaTs = -3
  private val MetaDb = -4; private val MetaTable = -5
  private val MetaSchema = -6; private val MetaTenant = -7
  private val outMap: Array[Int] = outSchema.fields.map { f =>
    f.name match {
      case ChangeRecord.OpCol => MetaOp
      case ChangeRecord.OffsetCol => MetaOffset
      case ChangeRecord.TsCol => MetaTs
      case ChangeRecord.DbCol => MetaDb
      case ChangeRecord.TableCol => MetaTable
      case ChangeRecord.SchemaCol => MetaSchema
      case ChangeRecord.TenantCol => MetaTenant
      case n => decodeSchema.fieldIndex(n)
    }
  }
  // hoisted: per-row Option.map allocation is decode-loop hot-path cost
  private val metaSchemaName: UTF8String =
    meta.schemaName.map(UTF8String.fromString).orNull
  private val metaTenant: UTF8String =
    meta.tenant.map(UTF8String.fromString).orNull

  /** Capture-time mask rule per decodeSchema slot (null = pass-through) —
    * applied at emit so BOTH images of every change event and all snapshot
    * rows leave the reader already redacted (Debezium applies its
    * column.mask/truncate options at the same point: before the record is
    * handed to the pipeline). Pruned-away masked columns cost nothing. */
  private val maskers: Array[ColumnMasks.Rule] = {
    val rules = ColumnMasks.decode(maskSpec)
    decodeSchema.fields.map(f => rules.getOrElse(f.name, null))
  }

  /** Project a decoded image + event metadata onto the output schema. */
  def emit(img: InternalRow, op: String, offset: Long, ts: Long): InternalRow = {
    val out = new GenericInternalRow(outSchema.size)
    var i = 0
    while (i < outSchema.size) {
      outMap(i) match {
        case MetaOp => out.update(i, UTF8String.fromString(op))
        case MetaOffset => out.update(i, offset)
        case MetaTs => out.update(i, ts)
        case MetaDb => out.update(i, UTF8String.fromString(meta.db))
        case MetaTable => out.update(i, UTF8String.fromString(meta.table))
        case MetaSchema => out.update(i, metaSchemaName)
        case MetaTenant => out.update(i, metaTenant)
        case j => out.update(i,
          if (img.isNullAt(j)) null
          else if (maskers(j) != null)
            maskers(j)(img.get(j, decodeSchema(j).dataType)
              .asInstanceOf[UTF8String])
          else img.get(j, decodeSchema(j).dataType))
      }
      i += 1
    }
    out
  }

  /** Log lines with offsets in (from, to] — dialect-served (offset-sorted,
    * prefilter + early stop inside the file dialect). */
  def logLinesInRange(from: Long, to: Long): Iterator[String] =
    dialect.logLines(path, table, from, to)

  /** Snapshot lines possibly overlapping the chunk range [lo, hi) on the
    * chunk key — dialect-served (file pruning via per-file PK stats + early
    * stop in the file dialect; SQL range pushdown in a JDBC dialect). */
  def snapshotLines(lo: Option[Long], hi: Option[Long]): Iterator[String] =
    dialect.snapshotLines(path, table, chunkKey, lo, hi)
}

/** Final surviving state of one log-touched key: its chunk-key value
  * (range membership at apply time) and newest (offset, image), None =
  * deleted. */
private[source] case class OverlayEntry(ckVal: Long,
    value: Option[(Long, InternalRow)])

/** One log pass's merge state: surviving entries per key plus the newest
  * TRUNCATE offset seen in the slice (0 = none) — the death frontier the
  * merge applies to snapshot rows and pre-truncate writes alike. */
private[source] case class SnapshotOverlay(
    entries: mutable.LinkedHashMap[Long, OverlayEntry],
    truncateOffset: Long)

/**
 * Per-executor shared log-overlay builds. Every snapshot partition of one
 * read replays the same log slice (0, high]; on an executor running many
 * such partitions that is k identical store scans + envelope decodes. The
 * cache builds the UNFILTERED overlay once per (source, table, high,
 * projection) and lets each partition apply its own span filter — one log
 * pass per executor instead of one per partition.
 *
 * Memory contract: an unfiltered overlay holds O(log-touched keys) rows.
 * The build aborts at [[MaxEntries]] and marks the key oversized; every
 * partition then falls back to its own span-FILTERED build (the previous
 * behavior — bounded by span change volume), so executor memory stays
 * bounded no matter the change volume. Values are soft-referenced: memory
 * pressure reclaims cached overlays before an OOM.
 */
private[graft] object SnapshotOverlayCache {
  /** Shared-overlay entry cap (~tens of MB worst case for narrow rows).
    * Test seam: @volatile var so specs can force the oversized → span-
    * filtered fallback path at tiny fixture sizes. */
  @volatile private[graft] var MaxEntries: Int = 1 << 20

  /** Test seam: drop all cached overlays (a new cap only applies to
    * builds that have not happened yet). */
  private[graft] def clear(): Unit = cache.clear()

  private case class Key(dialect: String, path: String, table: String,
      high: Long, schemaDdl: String, chunkKey: String, policy: String,
      contentToken: String)
  private val Oversized = new AnyRef
  /** Key → SoftReference[map] | Oversized. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Key, AnyRef]()

  /** The shared unfiltered overlay, or None when this (table, high) is
    * known oversized — caller builds span-filtered locally. `build(cap)`
    * must return None when the overlay would exceed `cap` entries. */
  def sharedOverlay(p: SnapshotChunkPartition,
      build: Int => Option[SnapshotOverlay])
      : Option[SnapshotOverlay] = {
    // content token closes the stale-cache hole: a force=true rewrite at
    // the same path/max-offset changes file sizes/mtimes → new key
    val k = Key(p.dialect, p.path, p.table, p.high, p.schemaDdl,
      p.chunkKey, p.parsePolicy,
      graft.cdc.dialect.CdcDialects.byName(p.dialect)
        .contentToken(p.path, p.table))
    // computeIfAbsent serializes concurrent builders of the same key: the
    // first partition scans, the rest block and reuse — exactly the
    // sharing this cache exists for
    val v = cache.compute(k, (_, cur) => cur match {
      case Oversized => Oversized
      case ref: java.lang.ref.SoftReference[_] if ref.get != null => ref
      case _ => build(MaxEntries) match {
        case Some(m) => new java.lang.ref.SoftReference(m)
        case None => Oversized
      }
    })
    v match {
      case Oversized => None
      case ref: java.lang.ref.SoftReference[_] =>
        // a reclaim between compute and here: rebuild locally this once
        Option(ref.get.asInstanceOf[SnapshotOverlay])
    }
  }
}

/** Test seam (CdcSourceSpec failover tests, local-mode single-JVM only):
  * arm a countdown to make the Nth opened snapshot/log reader throw —
  * simulates losing an executor MID-BATCH with earlier partitions already
  * read, the reference's TM-kill failover matrix
  * (flink-connector-mysql-cdc/src/test/java/.../MySqlSourceITCase.java:149-209).
  * Disarmed (<0) in production; nothing else references it. */
private[graft] object ReaderFailureInjection {
  val snapshotCountdown = new java.util.concurrent.atomic.AtomicInteger(-1)
  val logCountdown = new java.util.concurrent.atomic.AtomicInteger(-1)
  private[source] def maybeFail(isSnapshot: Boolean): Unit = {
    val c = if (isSnapshot) snapshotCountdown else logCountdown
    if (c.get() >= 0 && c.getAndDecrement() == 0)
      throw new RuntimeException(
        "injected reader failure (failover test seam)")
  }
}

class SnapshotChunkReader(p: SnapshotChunkPartition)
    extends PartitionReader[InternalRow] {
  import ChangeRecord.ExternalOp

  ReaderFailureInjection.maybeFail(isSnapshot = true)

  private val dec = new EnvelopeDecoder(p.dialect, p.path, p.table,
    p.schemaDdl, p.chunkKey, p.parsePolicy, p.serverTimeZone, p.maskSpec)

  // The partition's chunk ranges are consecutive, so the whole partition
  // spans one contiguous key interval.
  private val spanLo: Option[Long] = p.ranges.head._1
  private val spanHi: Option[Long] = p.ranges.last._2
  private def inSpan(k: Long): Boolean =
    spanLo.forall(k >= _) && spanHi.forall(k < _)

  /** ONE log pass building the final surviving entry per log-touched merge
    * key (pk). Sequential newest-wins application over the offset-sorted
    * slice equals replaying events per key. `filterSpan` = keep only this
    * partition's key span (the bounded-memory local mode); unfiltered is
    * the shared-cache mode. `cap` aborts an oversized unfiltered build. */
  private def buildOverlay(filterSpan: Boolean, cap: Int)
      : Option[SnapshotOverlay] = {
    val m = mutable.LinkedHashMap[Long, OverlayEntry]()
    var truncOff = 0L
    val it = dec.logLinesInRange(0L, p.high)
    var oversized = false
    while (!oversized && it.hasNext) {
      val line = it.next()
      // cheap key prefilter: the chunk-key value is identical in before/
      // after (key-stable by the chunk-key contract — the reference dedups
      // by the key Struct the same way, RecordUtils.upsertBinlog), so the
      // chunk-key field inside the envelope structs gives range membership;
      // full decode only in-span
      val quick = FileCdcDatabase.quickNestedLongFieldOpt(line, dec.chunkKey)
      if (!filterSpan || quick.forall(inSpan))
        dec.decodeEnvelopeSafe(line).foreach { env =>
          // schema-change records go to the history, not the data merge
          // (T2); truncate has no images — it only advances the death
          // frontier (EVERY key span sees it, so it must be tracked even
          // in span-filtered builds)
          if (env.op == ExternalOp.Truncate)
            truncOff = math.max(truncOff, env.offset)
          else if (env.op != ExternalOp.SchemaChange
            && (!filterSpan || inSpan(env.chunkKeyVal))) {
            env.op match {
              case ExternalOp.Delete =>
                m(env.key) = OverlayEntry(env.chunkKeyVal, None)
              case _ =>
                m(env.key) = OverlayEntry(env.chunkKeyVal,
                  Some((env.offset, env.after)))
            }
            // oversized for sharing: stop wasting this scan (the caller
            // switches every partition of this read to filtered builds)
            if (m.size > cap) oversized = true
          }
        }
    }
    if (oversized) {
      it match { case c: AutoCloseable => c.close(); case _ => () }
      None
    } else Some(SnapshotOverlay(m, truncOff))
  }

  // Shared unfiltered overlay when change volume permits (one log scan per
  // executor); span-filtered local build otherwise. mergeRange filters by
  // ckVal either way, so the two modes merge identically.
  private lazy val overlay: SnapshotOverlay =
    SnapshotOverlayCache.sharedOverlay(p,
      cap => buildOverlay(filterSpan = false, cap))
      .getOrElse(buildOverlay(filterSpan = true, Int.MaxValue).get)

  // W2 per chunk range: chunk rows keyed by pk, then the partition's log
  // overlay applied — CREATE/UPDATE replace, DELETE removes, and a
  // TRUNCATE in (0, high] kills every row whose newest write precedes it
  // (the snapshot is state at offset 0, so a truncate skips its scan
  // entirely — only post-truncate log writes can be live). Snapshot input
  // is range-pushed to the dialect. Ranges evaluate lazily one at a time
  // (flatMap), so a grouped partition holds O(chunk + span changes) rows.
  private def mergeRange(lo: Option[Long], hi: Option[Long]): Iterator[InternalRow] = {
    def inRange(k: Long): Boolean = lo.forall(k >= _) && hi.forall(k < _)
    val byKey = mutable.LinkedHashMap[Long, (Long, InternalRow)]()
    if (overlay.truncateOffset == 0L)
      dec.snapshotLines(lo, hi).foreach { line =>
        val row = dec.codec.decode(line)
        val ck = CdcPlanner.toLongKey(row.get(dec.ckIdx, dec.ckType))
        if (inRange(ck))
          byKey(CdcPlanner.toLongKey(row.get(dec.pkIdx, dec.pkType))) = (0L, row)
      }
    overlay.entries.foreach { case (k, e) =>
      if (inRange(e.ckVal)) e.value match {
        case None => byKey.remove(k)
        case Some(offImg) =>
          if (offImg._1 > overlay.truncateOffset) byKey(k) = offImg
          else byKey.remove(k) // newest write precedes the truncate
      }
    }
    byKey.valuesIterator.map { case (off, img) =>
      dec.emit(img, ChangeRecord.RowKind.Insert, off, 0L)
    }
  }

  private val merged: Iterator[InternalRow] =
    p.ranges.iterator.flatMap { case (lo, hi) => mergeRange(lo, hi) }

  // resources opened while this reader's loop runs land in its own scope,
  // so close() sweeps exactly this reader's leftovers (fd hygiene at
  // many-chunk scale) even if Spark interleaves readers on one task thread
  private val scope = new FileCdcDatabase.ResourceScope
  private var cur: InternalRow = _
  override def next(): Boolean = FileCdcDatabase.inScope(scope) {
    if (merged.hasNext) { cur = merged.next(); true } else false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = {
    scope.closeAll()
    // safety net: sweep anything a scope-less consumer left open on this
    // task thread (scoped readers are untouched — their resources are not
    // in the thread scope)
    FileCdcDatabase.closeAllOnThread()
  }
}

class LogRangeReader(p: LogRangePartition)
    extends PartitionReader[InternalRow] {
  import ChangeRecord.{ExternalOp, RowKind}

  ReaderFailureInjection.maybeFail(isSnapshot = false)

  private val dec = new EnvelopeDecoder(p.dialect, p.path, p.table,
    p.schemaDdl, parsePolicy = p.parsePolicy,
    serverTimeZone = p.serverTimeZone, maskSpec = p.maskSpec)

  // lazy: a JDBC dialect's logLines borrows a pooled connection and
  // registers the cursor the moment it is CALLED — that must happen inside
  // next()'s inScope so the cursor lands in this reader's scope (a
  // constructor-time open would fall into the thread scope and survive
  // close() on early-stopped scans, leaking the pooled connection)
  // Debezium skipped.operations: op types dropped from the emitted stream
  // (log phase only — the snapshot merge still applies every op, like
  // Debezium's snapshot of live state that already reflects them)
  private val skipped: Set[String] =
    p.skippedOps.split(",").map(_.trim).filter(_.nonEmpty).toSet

  private lazy val rows: Iterator[InternalRow] = {
    // shouldEmit (W3): only events past the key's finished-chunk high
    // watermark; uniform high == p.from for the file dialect. Offsets are
    // prefiltered cheaply before the full envelope decode.
    var firstEventOffset = Long.MinValue
    dec.logLinesInRange(p.from, p.to).flatMap(dec.decodeEnvelopeSafe)
      .filterNot(env => skipped.contains(env.op))
      .flatMap { env =>
        val emitted: Seq[InternalRow] = env.op match {
          // schema changes route to SchemaHistory, not the row stream (the
          // reference emits them only under includeSchemaChanges);
          // truncates carry no images and Flink's retract stream has no
          // whole-table row kind — upstream, Debezium's skipped.operations
          // default drops truncates before the reference's deserializer
          // (whose else-branch would otherwise mis-emit them as updates)
          // ever sees one, so a truncate contributes no log-phase rows
          // (its state effect lives in the snapshot merge's death frontier)
          case ExternalOp.SchemaChange | ExternalOp.Truncate => Seq.empty
          case ExternalOp.Create | ExternalOp.Read =>
            Seq(dec.emit(env.after, RowKind.Insert, env.offset, env.ts))
          case ExternalOp.Delete =>
            Seq(dec.emit(env.before, RowKind.Delete, env.offset, env.ts))
          case ExternalOp.Update if p.changelogMode == "upsert" =>
            Seq(dec.emit(env.after, RowKind.UpdateAfter, env.offset, env.ts))
          case ExternalOp.Update =>
            Seq(dec.emit(env.before, RowKind.UpdateBefore, env.offset, env.ts),
              dec.emit(env.after, RowKind.UpdateAfter, env.offset, env.ts))
        }
        // mid-transaction resume (skipRows): rows already delivered from
        // the FIRST event past the seek position are dropped; later
        // events are never affected (BinlogOffset.rowsToSkip scope)
        if (p.skipRows > 0 && emitted.nonEmpty &&
            (firstEventOffset == Long.MinValue ||
              env.offset == firstEventOffset)) {
          firstEventOffset = env.offset
          emitted.drop(p.skipRows)
        } else emitted
      }
  }

  private val scope = new FileCdcDatabase.ResourceScope
  private var cur: InternalRow = _
  override def next(): Boolean = FileCdcDatabase.inScope(scope) {
    if (rows.hasNext) { cur = rows.next(); true } else false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = {
    scope.closeAll()
    FileCdcDatabase.closeAllOnThread()
  }
}
