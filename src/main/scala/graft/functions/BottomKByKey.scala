package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native bounded bottom-k aggregate: `bottom_k_by_key(key, value, k)`
  * keeps the `k` rows with the SMALLEST string keys per group and
  * returns their values ordered by key — the third native-extension
  * tier (TypedImperativeAggregate), alongside the scalar expressions
  * (UpcValid, DotProduct) and the whole-operator plan (AsOfJoin).
  *
  * Why it matters at 100 TB: the declarative formulation of per-group
  * top-k/sampling is `row_number().over(Window.partitionBy(g).orderBy
  * (key)) <= k`, which shuffles EVERY row to its group's partition and
  * sorts there. As an aggregate, Spark runs it through
  * ObjectHashAggregate with a PARTIAL pass before the exchange: each
  * map task reduces its slice to ≤ k rows per group, the shuffle
  * carries O(#groups × k) rows instead of the whole table, and the
  * final pass merges bounded buffers. With `key = md5(id)` it is a
  * deterministic uniform group sample (same rows at any partitioning
  * and any cluster size); with a domain key it is per-group top-k.
  *
  * Ties on key are broken by value, so the result is a total order —
  * bit-stable across runs and engines.
  */
case class BottomKByKey(
    keyChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(UTF8String, Long)]] {

  require(k > 0, "bottom_k_by_key requires k > 0")

  override def children: Seq[Expression] = Seq(keyChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_by_key"

  override def checkInputDataTypes(): TypeCheckResult =
    (keyChild.dataType, valueChild.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bottom_k_by_key requires (string key, bigint value), got " +
          s"${keyChild.dataType.catalogString}, ${valueChild.dataType.catalogString}")
    }

  // max-heap on (key, value): the head is the LARGEST retained entry,
  // evicted as soon as a smaller one arrives and the buffer is full
  private def ord: Ordering[(UTF8String, Long)] = BottomKByKey.EntryOrdering

  override def createAggregationBuffer(): mutable.PriorityQueue[(UTF8String, Long)] =
    mutable.PriorityQueue.empty[(UTF8String, Long)](ord)

  private def insert(
      buf: mutable.PriorityQueue[(UTF8String, Long)],
      key: UTF8String, value: Long): Unit = {
    if (buf.size < k) {
      buf.enqueue((key, value))
    } else if (ord.compare((key, value), buf.head) < 0) {
      buf.dequeue()
      buf.enqueue((key, value))
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(UTF8String, Long)],
      input: InternalRow): mutable.PriorityQueue[(UTF8String, Long)] = {
    val keyVal = keyChild.eval(input)
    val valueVal = valueChild.eval(input)
    if (keyVal != null && valueVal != null) {
      // the evaluated UTF8String may point into a reused row buffer —
      // retained entries must own their bytes
      insert(buf, keyVal.asInstanceOf[UTF8String].clone(),
        valueVal.asInstanceOf[Long])
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(UTF8String, Long)],
      other: mutable.PriorityQueue[(UTF8String, Long)])
      : mutable.PriorityQueue[(UTF8String, Long)] = {
    other.foreach { case (h, v) => insert(buf, h, v) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(UTF8String, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted(ord).map(_._2).toArray)

  override def serialize(
      buf: mutable.PriorityQueue[(UTF8String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) =>
      val b = h.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(UTF8String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.enqueue((UTF8String.fromBytes(b), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByKey =
    copy(keyChild = newChildren(0), valueChild = newChildren(1))
}

object BottomKByKey {
  /** Total order on (key, value) — an explicit serializable object
    * (the expression ships to executors; a lambda-backed Ordering
    * does not serialize).
    */
  object EntryOrdering extends Ordering[(UTF8String, Long)] with Serializable {
    override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
      val c = a._1.compareTo(b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
}
