package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state per-group top-k over (score: long, id: long) pairs — the
  * scale-correct replacement for `row_number() OVER (PARTITION BY g ORDER
  * BY score, id) <= k` when a group's candidate set is corpus-sized (the
  * ANN searches: every query ranks against the whole scanned corpus, so
  * the window shape shuffles |corpus| rows into |queries| partitions and
  * sorts them; this aggregate's partial state is AT MOST k pairs, map-side
  * combine bounds the shuffle to |partitions|·k rows per group, and the
  * final sort is O(k log k)).
  *
  * Ordering is total and engine-exact: by score (ascending when
  * `ascending`, e.g. distances; descending otherwise, e.g. similarities),
  * ties by id ascending — the same (score, id) rule every e-family oracle
  * replays, so swapping the window for this aggregate changes no result.
  *
  * Returns the k best pairs best-first as array<struct<score, id>>;
  * `posexplode` recovers the dense rank. Null scores/ids are skipped
  * (SQL aggregate null semantics).
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs.Buffer] {

  require(k >= 1, s"top_k_pairs needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  // Registered as a public SQL function (GraftExtensions): reject non-long
  // score/id at analysis instead of ClassCastException at execution.
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

  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKPairs.Buffer =
    new TopKPairs.Buffer(k, ascending)

  override def update(buf: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKPairs.Buffer, other: TopKPairs.Buffer): TopKPairs.Buffer = {
    var j = 0
    while (j < other.size) { buf.offer(other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKPairs.Buffer): Any = {
    val rows = buf.sortedBestFirst().map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): AnyRef
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairs.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putLong(buf.scores(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPairs.Buffer(k, ascending)
    var j = 0
    while (j < n) { buf.offer(bb.getLong, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairs {

  /** Binary heap of at most k (score, id) pairs, root = WORST kept pair,
    * so a full buffer evicts in O(log k) and rejects non-improving offers
    * in O(1). Plain long arrays — no boxing on the update path.
    */
  final class Buffer(k: Int, ascending: Boolean) {
    val scores = new Array[Long](k)
    val ids = new Array[Long](k)
    var size = 0

    /** Is (s1, i1) strictly better than (s2, i2)? */
    @inline private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
      if (s1 != s2) { if (ascending) s1 < s2 else s1 > s2 } else i1 < i2

    def offer(s: Long, i: Long): Unit = {
      if (size < k) {
        var j = size
        scores(j) = s; ids(j) = i; size += 1
        // Sift up on "worseness": parent must be worse than (or equal to)
        // children, so the worst pair sits at the root.
        while (j > 0) {
          val p = (j - 1) >> 1
          if (better(scores(p), ids(p), scores(j), ids(j))) {
            val ts = scores(p); val ti = ids(p)
            scores(p) = scores(j); ids(p) = ids(j)
            scores(j) = ts; ids(j) = ti
            j = p
          } else j = 0
        }
      } else if (better(s, i, scores(0), ids(0))) {
        scores(0) = s; ids(0) = i
        // Sift down: push the new root below any worse child.
        var j = 0
        var done = false
        while (!done) {
          val l = 2 * j + 1
          val r = l + 1
          var w = j // index of the worst among j and its children
          if (l < size && better(scores(w), ids(w), scores(l), ids(l))) w = l
          if (r < size && better(scores(w), ids(w), scores(r), ids(r))) w = r
          if (w == j) done = true
          else {
            val ts = scores(w); val ti = ids(w)
            scores(w) = scores(j); ids(w) = ids(j)
            scores(j) = ts; ids(j) = ti
            j = w
          }
        }
      }
    }

    def sortedBestFirst(): Array[(Long, Long)] = {
      val out = Array.tabulate(size)(j => (scores(j), ids(j)))
      out.sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
    }
  }
}
