package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Bounded-state sketch aggregates. [[KMinimaAgg]] maintains the k smallest
 * DISTINCT values of a LONG column with an O(k) buffer — the mergeable
 * KMV-sketch primitive. The collect_set formulation it replaces buffers
 * every distinct value per group before slicing (O(group-distinct) memory
 * in one aggregation-buffer row — the thing a sketch exists to avoid);
 * this buffer never exceeds k elements at any point of the partial/merge
 * tree, so map-side partial aggregation ships ≤ k longs per group per
 * partition. Result = ascending array of the k minima (exact, order- and
 * partitioning-independent — the same values the DuckDB oracle derives
 * with row_number() ≤ k).
 */
case class KMinimaAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "k_minima"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinimaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinimaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinimaAgg =
    copy(child = newChild)
}

/**
 * Misra–Gries frequent-items summary over a STRING column: at most `k`
 * (item, count) counters. The classic guarantee holds at every point of
 * the partial/merge tree: every item with true frequency > N/(k+1)
 * appears in the summary, REGARDLESS of row order or partitioning — the
 * merge (pointwise count sum, then subtract the (k+1)-th largest and
 * drop non-positives) is the mergeable-summaries construction of
 * Agarwal, Cormode, Huang, Phillips, Wei, Yi (PODS'12). Counter values
 * are order-dependent underestimates, so [[eval]] surfaces only the
 * candidate ITEM SET (sorted for stability); consumers re-count the ≤ k
 * candidates exactly in a second pass — the candidate-then-verify
 * pattern that keeps the output deterministic while the sketch does the
 * unbounded-vocabulary pruning.
 *
 * update() amortization: each decrement cancels one prior increment, so
 * the occasional O(k) decrement sweep costs O(1) amortized per row.
 */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.toString
      val cur = buf.get(w)
      if (cur != null) { buf.put(w, cur + 1L); () }
      else if (buf.size < k) { buf.put(w, 1L); () }
      else {
        // decrement-all sweep (drop zeros); the unmatched item is dropped
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  /** Pointwise sum, then reduce back to ≤ k by subtracting the (k+1)-th
    * largest combined count from every counter (PODS'12 merge). */
  override def merge(buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(
      org.apache.spark.unsafe.types.UTF8String.fromString))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object SketchAggregates {
  /** Column API: k smallest distinct values of a LONG column, ascending. */
  def kMinima(c: Column, k: Int): Column =
    ColumnBridge.column(
      KMinimaAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Column API: Misra–Gries candidate set (≤ k items, sorted) of a
    * STRING column — superset of every item with frequency > N/(k+1). */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
