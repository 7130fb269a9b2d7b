package graft.functions

/** Shared md5-hex parsing for the custom Tungsten aggregates (MinHash8,
  * SimHash32Agg) — one definition so the accepted alphabet can never
  * silently diverge between them.
  */
private[functions] object Hex {

  /** Value of one hex digit byte, or -1 when not a hex digit. */
  def nibble(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  /** Parse exactly 32 hex bytes into `out` (length ≥ 32); returns false —
    * leaving `out` unspecified — if any byte is not a hex digit.
    */
  def parse32(bytes: Array[Byte], out: Array[Int]): Boolean = {
    var j = 0
    while (j < 32) {
      val n = nibble(bytes(j))
      if (n < 0) return false
      out(j) = n
      j += 1
    }
    true
  }
}
