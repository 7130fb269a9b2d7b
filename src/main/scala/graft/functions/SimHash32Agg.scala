package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash in ONE aggregate over md5-hex token digests: bit plane j
  * votes +1 when hex nibble j of the digest is in [8, f] (its high bit set)
  * and −1 otherwise; the hash sets bit j where the vote sum is positive.
  *
  * Byte-identical to the 32 `sum(CASE WHEN instr('89abcdef',
  * substring(dg, j+1, 1)) > 0 THEN 1 ELSE -1 END)` columns it replaces
  * (instr > 0 ⇔ nibble ≥ 8), but each digest is parsed once — 32 int
  * bumps per row instead of 32 substring+instr evaluations. Null or
  * malformed (≠ 32 chars / non-hex) values are ignored, matching SQL
  * aggregate null-skipping.
  */
case class SimHash32Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](32)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      if (s.numBytes() == 32) {
        val bytes = s.getBytes
        // Parse-and-validate ONCE (a malformed row is skipped whole),
        // then vote from the parsed nibbles.
        val nibbles = new Array[Int](32)
        if (Hex.parse32(bytes, nibbles)) {
          var j = 0
          while (j < 32) {
            if (nibbles(j) >= 8) buf(j) += 1 else buf(j) -= 1
            j += 1
          }
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 32) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var h = 0L
    var j = 0
    while (j < 32) {
      if (buf(j) > 0) h |= 1L << j
      j += 1
    }
    h
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(128)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(32)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHash32Agg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimHash32Agg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHash32Agg =
    copy(child = newChildren.head)
}
