package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state per-group bottom-k over (score: long, id: long) pairs
  * with SET semantics: an exact duplicate pair is absorbed, not stored
  * twice. This is the KMV sketch's true state — "the k smallest DISTINCT
  * hash values" — which [[TopKPairs]] deliberately is not: TopKPairs is a
  * multiset top-k over unique-id inputs (ANN candidates, per-group cuts)
  * on an O(log k)-evict heap, and adding an O(k) membership probe there
  * would tax every corpus-sized ANN offer. Here the buffer is a sorted
  * array instead: binary-search membership/insertion O(log k) + an O(k)
  * shift only on accepted inserts — and acceptance is bounded by k per
  * distinct value, so the steady-state offer (a duplicate or a
  * worse-than-root value) stays O(log k)/O(1). The merge of two buffers
  * is the KMV union-then-recut, duplicates collapsing — exactly why the
  * streaming fold ([[graft.streaming.EventStream.kmvDistinctStream]])
  * replays the batch estimator even when the same value recurs across
  * micro-batches.
  *
  * Ordering: (score asc, id asc), best-first in the output array — the
  * same total rule as TopKPairs ascending, so downstream spellings are
  * interchangeable. Null scores/ids are skipped.
  */
case class KmvBottomK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBottomK.Buffer] {

  require(k >= 1, s"kmv_bottom_k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType == LongType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint score, bigint id), got " +
        s"${score.dataType.catalogString} and ${id.dataType.catalogString}")
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "kmv_bottom_k"

  override def createAggregationBuffer(): KmvBottomK.Buffer =
    new KmvBottomK.Buffer(k)

  override def update(buf: KmvBottomK.Buffer, input: InternalRow): KmvBottomK.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBottomK.Buffer, other: KmvBottomK.Buffer): KmvBottomK.Buffer = {
    var j = 0
    while (j < other.size) { buf.offer(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: KmvBottomK.Buffer): Any = {
    val rows = new Array[AnyRef](buf.size)
    var j = 0
    while (j < buf.size) {
      rows(j) = new GenericInternalRow(Array[Any](buf.scores(j), buf.ids(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: KmvBottomK.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putLong(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBottomK.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBottomK.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getLong, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBottomK =
    copy(score = newChildren(0), id = newChildren(1))
}

object KmvBottomK {

  /** Sorted (score asc, id asc) arrays of at most k DISTINCT pairs. */
  final class Buffer(k: Int) {
    val scores = new Array[Long](k)
    val ids = new Array[Long](k)
    var size = 0

    def offer(s: Long, i: Long): Unit = {
      // Binary search for the insertion point of (s, i).
      var lo = 0
      var hi = size
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        val c =
          if (scores(m) != s) java.lang.Long.compare(scores(m), s)
          else java.lang.Long.compare(ids(m), i)
        if (c < 0) lo = m + 1 else hi = m
      }
      if (lo < size && scores(lo) == s && ids(lo) == i) return // duplicate
      if (lo >= k) return // worse than every kept pair, buffer full
      if (size < k) size += 1
      var j = size - 1
      while (j > lo) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(lo) = s
      ids(lo) = i
    }
  }
}
