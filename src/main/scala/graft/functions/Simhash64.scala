package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit Charikar SimHash aggregate: `simhash64(token)` folds a
  * group's tokens into one 64-bit fingerprint — per bit, a frequency-
  * weighted majority vote over the token hashes, bit set iff the vote
  * sum is strictly positive.
  *
  * The token hash matches the engine's declarative formulation (and the
  * DuckDB oracle) exactly: the first sixteen hex chars of `md5(token)`
  * read as two unsigned 32-bit halves, h0 voting bits 0-31 and h1
  * voting bits 32-63 — here computed directly from the first eight
  * digest BYTES, skipping the hex-format → substring → base-16-parse
  * round trip the SQL form pays per token.
  *
  * Why native: the declarative form needs 64 separate
  * `sum(when(shiftright(h, b) & 1 = 1, 1).otherwise(-1))` aggregates —
  * 64 independent agg buffers updated per token row, which doubled the
  * fingerprint-dump cost when SimHash widened from 16 to 64 bits. As a
  * TypedImperativeAggregate the 64 counters live in one int array
  * updated in a single tight loop per token, Spark runs it through
  * ObjectHashAggregate with a PARTIAL pass, and the shuffle carries one
  * 256-byte buffer per (task × doc) instead of 64 long columns.
  */
case class Simhash64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string token, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val tok = child.eval(input)
    if (tok != null) {
      val md = Simhash64Agg.digests.get()
      md.reset()
      val d = md.digest(tok.asInstanceOf[UTF8String].getBytes)
      // first 8 digest bytes, big-endian per 4-byte half — identical to
      // conv(substring(md5(tok), 1, 8), 16, 10) / (…, 9, 8) in SQL
      val h0 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      val h1 = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
      val hash64 = h0 | (h1 << 32)
      var b = 0
      while (b < 64) {
        buf(b) += (if (((hash64 >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    var b = 0
    while (b < 64) { bb.putInt(buf(b)); b += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](64)
    var b = 0
    while (b < 64) { buf(b) = bb.getInt(); b += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Simhash64Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Simhash64Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Simhash64Agg =
    copy(child = newChildren.head)
}

object Simhash64Agg {
  /** Per-thread digest instance: `update` runs once per token row, so a
    * fresh MessageDigest per call would dominate the loop; a shared one
    * would race across tasks in local mode.
    */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
