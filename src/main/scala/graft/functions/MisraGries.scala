package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary over a string column: at most
  * `k − 1` counters, updated with the classic decrement-all rule, merged
  * across partitions with the mergeable-summaries rule (sum counters,
  * then subtract the k-th largest and drop non-positives — Agarwal et
  * al., the property that makes MG a one-pass DISTRIBUTED sketch).
  *
  * Guarantee: every item with true frequency > n/k survives the summary
  * (counts are undercounts by at most n/k). The summary is therefore a
  * candidate SUPERSET of the true heavy hitters — the x23 query verifies
  * candidates exactly with a second filtered pass, so the operator's
  * bounded memory never costs exactness.
  *
  * Returns the surviving items as a sorted array<string> (candidate set;
  * estimated counts are deliberately not exposed — they are
  * undercounts, and the verify pass recomputes exact counts anyway).
  * Null inputs are ignored, matching SQL aggregate null-skipping.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]] {

  require(k >= 2, s"misra_gries needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  private def decrementAll(buf: java.util.HashMap[UTF8String, Long]): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
    }
  }

  override def update(
      buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size() < k - 1) buf.put(s.clone(), 1L)
      else decrementAll(buf)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long])
      : java.util.HashMap[UTF8String, Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = buf.get(e.getKey) // scala unboxing: absent -> 0L
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size() > k - 1) {
      // Subtract the k-th largest count, drop non-positives: the merged
      // summary keeps <= k - 1 counters and the undercount bound adds up.
      val counts = new Array[Long](buf.size())
      var i = 0
      val cit = buf.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      // size > k - 1 implies counts.length >= k, so this index is valid.
      val kth = counts(counts.length - k) // k-th largest boundary
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue - kth <= 0L) it.remove() else e.setValue(e.getValue - kth)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val keys = new Array[UTF8String](buf.size())
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    new GenericArrayData(keys.asInstanceOf[Array[AnyRef]])
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    val sit = buf.entrySet().iterator()
    while (sit.hasNext) { bytes += 4 + sit.next().getKey.numBytes() + 8 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
