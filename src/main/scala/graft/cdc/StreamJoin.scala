package graft.cdc

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Two-changelog streaming inner join with retraction propagation — the
 * canonical cdc-sql use case (reference docs: joining two CDC tables with
 * `changelog.mode=all`; Flink's dual-sided StreamingJoinOperator keeps both
 * input tables' rows in keyed state and emits retract/accumulate pairs).
 *
 * Re-expressed on Spark as ONE keyed state operator over the union of both
 * changelogs: events route by join-key value, and each group's state holds
 * the current rows of BOTH sides for that key. Every applied change emits
 * the delta of the joined result —
 *   - a new/updated row joins against the other side's current rows
 *     (`+I`/`+U` per match),
 *   - its previous image first retracts the previously-joined rows (`-U`),
 *   - `-U`/`-D` inputs retract their side's row from every current match
 *     (so a key-changing update is a retraction in the old key's group and
 *     an insertion in the new key's — the two halves route independently,
 *     exactly Flink's changelog algebra for key-moved rows).
 *
 * Output is itself a changelog of joined rows identified by (lpk, rpk)
 * versioned by the triple (pair version, removal/addition rank, per-group
 * seq), where the PAIR VERSION is max(event offset, other image's
 * offset) — the offset at which this pair-state became current. That
 * order is GLOBALLY comparable even when the same joined pair is
 * re-formed in a different join-key group and the two sides' streams
 * drain in different batch interleavings: the re-formation emission
 * inherits the newest participating image's offset, so it ties with (and
 * out-ranks, via the addition-beats-removal rank) the old group's
 * retraction instead of being ordered by whichever side's event happened
 * to trigger it. The newest record per joined identity IS its current
 * state, so a max_by over the triple + dropping `-U`/`-D` materializes
 * the join (see [[materializeJoined]]).
 *
 * 100 TB story: state is O(rows of both inputs), sharded across executors
 * by join key and held in the state store (RocksDB in production configs) —
 * the same asymptotics as Flink's join state, with per-event work
 * O(matching rows on the other side). No snapshot rescans, no cross-group
 * traffic; a hot join key costs its own match count only (inherent to any
 * changelog join) and nothing for other keys.
 */
object ChangelogJoin {

  import ChangeRecord._

  /** One routed change: join-key value, side, that side's pk, offset, row
    * kind, payload image (JSON — schema-agnostic through the state
    * machinery, like [[StreamMaterialize.upserts]]). */
  case class JEv(jk: String, isLeft: Boolean, pk: String, off: Long,
      op: String, img: String)
  case class SideRow(off: Long, img: String)
  /** Both sides' current rows for one join key + emission counter. */
  case class JState(l: Map[String, SideRow], r: Map[String, SideRow],
      n: Long)
  /** Joined-changelog record: identity (lpk, rpk), version triple
    * (`off` = pair version: max(event offset, other image's offset),
    * `rk` = removal 0 / addition 1,
    * `seq` = per-group emission counter breaking same-group ties), row
    * kind, both payload images. */
  case class JOut(lpk: String, rpk: String, off: Long, rk: Int, seq: Long,
      op: String, limg: String, rimg: String)

  /** Removals sort before additions at one offset: an update's `-U`
    * precedes its `+U` (the reader emits both at the external event's
    * offset). */
  private def rank(op: String): Int = op match {
    case RowKind.UpdateBefore | RowKind.Delete => 0
    case _ => 1
  }

  /** `left` and `right` are streaming emitted changelogs (`__op` rows).
    * `*Pk` identifies rows within a side; `*JoinKey` is the equi-join
    * column. Update output mode. */
  def join(left: DataFrame, leftPk: String, leftJoinKey: String,
      right: DataFrame, rightPk: String, rightJoinKey: String): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._

    def prep(df: DataFrame, pk: String, jk: String,
        isLeft: Boolean): Dataset[JEv] = {
      val payload = df.schema.fieldNames.filterNot(MetaCols.contains).toSeq
      df.select(
        col(jk).cast(StringType).as("jk"),
        lit(isLeft).as("isLeft"),
        col(pk).cast(StringType).as("pk"),
        col(OffsetCol).as("off"),
        col(OpCol).as("op"),
        to_json(struct(payload.map(col): _*)).as("img")).as[JEv]
    }

    val evs = prep(left, leftPk, leftJoinKey, isLeft = true)
      .unionByName(prep(right, rightPk, rightJoinKey, isLeft = false))

    evs.groupByKey(_.jk)
      .flatMapGroupsWithState[JState, JOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[JEv], state: GroupState[JState]) =>
          val st = state.getOption.getOrElse(JState(Map.empty, Map.empty, 0L))
          var l = st.l
          var r = st.r
          var n = st.n
          val out = ArrayBuffer.empty[JOut]

          def emit(op: String, e: JEv, myImg: String, otherPk: String,
              otherOff: Long, otherImg: String): Unit = {
            n += 1
            // own image's offset never exceeds e.off (stale guard), so the
            // pair version is max over both participating images + event
            val ver = math.max(e.off, otherOff)
            out += (if (e.isLeft)
                      JOut(e.pk, otherPk, ver, rank(op), n, op, myImg,
                        otherImg)
                    else
                      JOut(otherPk, e.pk, ver, rank(op), n, op, otherImg,
                        myImg))
          }

          // deterministic replay: offset order, removals before additions
          // at one offset, then side/pk to fix cross-side ties
          val evs = rows.toArray
            .sortBy(e => (e.off, rank(e.op), e.isLeft, e.pk))
          evs.foreach { e =>
            val mine = if (e.isLeft) l else r
            val other = if (e.isLeft) r else l
            e.op match {
              case RowKind.Insert | RowKind.UpdateAfter =>
                val old = mine.get(e.pk)
                // stale guard: a replayed/older image never regresses state
                if (old.forall(_.off < e.off)) {
                  old.foreach { o =>
                    other.foreach { case (opk, or) =>
                      emit(RowKind.UpdateBefore, e, o.img, opk, or.off,
                        or.img)
                    }
                  }
                  val updated = mine + (e.pk -> SideRow(e.off, e.img))
                  if (e.isLeft) l = updated else r = updated
                  val kind =
                    if (old.isDefined) RowKind.UpdateAfter else RowKind.Insert
                  other.foreach { case (opk, or) =>
                    emit(kind, e, e.img, opk, or.off, or.img)
                  }
                }
              case RowKind.UpdateBefore | RowKind.Delete =>
                mine.get(e.pk).filter(_.off <= e.off).foreach { o =>
                  other.foreach { case (opk, or) =>
                    emit(e.op, e, o.img, opk, or.off, or.img)
                  }
                  val updated = mine - e.pk
                  if (e.isLeft) l = updated else r = updated
                }
              case _ => () // schema-change records: history, not data
            }
          }
          state.update(JState(l, r, n))
          out.iterator
      }
      .toDF()
  }

  /** Collapse a drained joined changelog to its final state: newest record
    * per (lpk, rpk) under the global (off, rk, seq) order — valid across
    * join-key groups, so key-moved pairs resolve to the surviving group's
    * record. Retractions drop out. One aggregate — no window. */
  def materializeJoined(joined: DataFrame): DataFrame =
    joined.groupBy(col("lpk"), col("rpk"))
      .agg(max_by(struct(col("op"), col("limg"), col("rimg")),
        struct(col("off"), col("rk"), col("seq"))).as("v"))
      .filter(col("v.op").isin(RowKind.Insert, RowKind.UpdateAfter))
      .select(col("lpk"), col("rpk"), col("v.limg").as("limg"),
        col("v.rimg").as("rimg"))
}
