package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Bloom-filter runtime pruning — the DIY analogue of Spark's injected
 * runtime filters (InjectRuntimeFilter), usable explicitly: build the
 * filter over the small (dim) side's join keys with [[BloomAgg]], ship the
 * bits to the fact scan as a literal, and drop non-candidate rows with
 * [[BloomMightContain]] BEFORE the join's shuffle. False positives are
 * removed by the exact join that follows, so the filter affects cost only —
 * at 100 TB the pruned fact side shrinks the shuffle by the join's
 * selectivity while the filter itself is a few hundred KB of bits built in
 * one small-side aggregate.
 *
 * Hashing is double-hashing over splitmix64 (public-domain finalizer
 * constants): bit_i = (h1 + i·h2) mod numBits — k probes from two hashes,
 * the standard Kirsch–Mitzenmacher construction.
 */
object BloomUtil {

  /** splitmix64 finalizer. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def set(bits: Array[Long], v: Long, numHashes: Int): Unit = {
    val numBits = bits.length.toLong * 64
    val h1 = mix(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((h1 + i * h2) & Long.MaxValue) % numBits
      bits((idx >>> 6).toInt) |= (1L << (idx & 63))
      i += 1
    }
  }

  private def word(b: Array[Byte], w: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(w * 8 + i) & 0xffL); i += 1 }
    v
  }

  /** Membership probe over the serialized (big-endian word) bit array.
    * Referenced from generated code — keep the signature stable. */
  def contains(bytes: Array[Byte], v: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length.toLong * 8
    val h1 = mix(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = ((h1 + i * h2) & Long.MaxValue) % numBits
      if ((word(bytes, (idx >>> 6).toInt) & (1L << (idx & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  def serialize(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * bits.length)
    var i = 0
    while (i < bits.length) { bb.putLong(bits(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }
}

/**
 * Bloom-filter aggregate over a LONG column → BINARY bit array. The buffer
 * is a fixed `numBits`-bit array regardless of input cardinality; merge is
 * bitwise OR, so the partial/merge tree ships a constant-size state per
 * group per partition (map-side combine does the heavy lifting).
 */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64: $numBits")
  require(numHashes > 0, s"numHashes must be positive: $numHashes")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `might_contain(bloomBits, value)` — codegen'd probe; stays inside
  * whole-stage codegen on the fact-scan hot path. */
case class BloomMightContain(left: Expression, right: Expression,
    numHashes: Int)
    extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bloom: Any, value: Any): Any =
    BloomUtil.contains(bloom.asInstanceOf[Array[Byte]],
      value.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.BloomUtil.contains($b, $v, $numHashes)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  /** Column API: bloom bits over a LONG column. */
  def bloomAgg(c: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Column API: membership probe (false ⇒ definitely absent). */
  def bloomMightContain(bloom: Column, value: Column,
      numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(value),
      numHashes))
}
