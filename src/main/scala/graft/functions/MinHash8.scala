package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All 8 MinHash signature mins in ONE aggregate over md5-hex digests.
  *
  * Semantics are EXACTLY the 8 string-min columns they replace
  * (`min(substring(concat(dg, dg), 4i + 1, 16))` for i = 0..7, lexicographic
  * min over lowercase hex): a fixed-width lowercase-hex string compares
  * lexicographically iff its value compares as an unsigned integer, so the
  * aggregate parses each 32-char digest ONCE into a 128-bit (hi, lo) pair
  * and takes each rotation as a 64-bit window at bit offset 16·i of the
  * circular value — 8 shifts + 8 unsigned compares per row against 8 long
  * buffer slots, versus 8 UTF8String substring allocations + memcmps. The
  * result renders back to the identical 16-char hex strings, so band
  * buckets and the DuckDB oracle are unchanged.
  *
  * Rows whose value is null or not a 32-char string are ignored (md5 hex
  * never is; defensive only).
  */
case class MinHash8(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "minhash8"

  // Unsigned max: no digest window ever loses to the empty buffer. A
  // group whose inputs are ALL null/malformed therefore renders eight
  // 'ffffffffffffffff' sentinels where SQL min() would return NULL — a
  // deliberate trade: the pipelines can never feed such a group (an md5
  // over a non-null shingle is always 32 hex chars, and a group exists
  // only with ≥ 1 row), and the constant-width signature is what lets
  // nearDupPairs' inert `length(mh) - 16` plan guard work. Filter null
  // digests upstream if reusing this aggregate on nullable input.
  override def createAggregationBuffer(): Array[Long] = Array.fill(8)(-1L)

  private def hexNibble(b: Byte): Int = Hex.nibble(b)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      if (s.numBytes() == 32) {
        val bytes = s.getBytes
        var hi = 0L
        var lo = 0L
        var i = 0
        var ok = true
        while (ok && i < 16) {
          val n = hexNibble(bytes(i))
          if (n < 0) ok = false else hi = (hi << 4) | n
          i += 1
        }
        while (ok && i < 32) {
          val n = hexNibble(bytes(i))
          if (n < 0) ok = false else lo = (lo << 4) | n
          i += 1
        }
        if (ok) {
          var r = 0
          while (r < 8) {
            val off = 16 * r
            val w =
              if (off == 0) hi
              else if (off < 64) (hi << off) | (lo >>> (64 - off))
              else if (off == 64) lo
              else (lo << (off - 64)) | (hi >>> (128 - off))
            if (java.lang.Long.compareUnsigned(w, buf(r)) < 0) buf(r) = w
            r += 1
          }
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var r = 0
    while (r < 8) {
      if (java.lang.Long.compareUnsigned(other(r), buf(r)) < 0) buf(r) = other(r)
      r += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.toSeq.map(v => UTF8String.fromString(f"$v%016x")))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHash8 =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHash8 =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHash8 =
    copy(child = newChildren.head)
}
