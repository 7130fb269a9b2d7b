package graft.functions

/** DGIM sliding-window count sketch (Datar–Gionis–Indyk–Motwani '02) —
  * the WINDOWED counting family the whole-stream sketches (a17 HLL, a22
  * CM, a25 KLL) don't cover: "how many events in the last W time units"
  * with O(log² n) state and a provable ≤ half-oldest-bucket additive
  * error, the question every rate monitor and freshness gate asks.
  *
  * Determinism and the closed form the a26 relational entry exploits:
  * DGIM keeps buckets of power-of-two sizes, 1-or-2 per size, merging
  * the OLDEST two when a third appears — which is exactly a lazy binary
  * counter over digits {1, 2}. Every n ≥ 1 has a UNIQUE representation
  * n = Σ dᵢ·2ⁱ with dᵢ ∈ {1, 2} over i < k (k digits exist iff
  * 2^k − 1 ≤ n ≤ 2^{k+1} − 2, so k = ⌊log₂(n+1)⌋ and the +1 digits are
  * the binary bits of m = n + 1 − 2^k), and the carry cascade lands on
  * it — so the batch state is pure integer arithmetic on n: digit dᵢ =
  * 1 + bitᵢ(m), prefix of ranks covered by classes < i is
  * Pᵢ = 2ⁱ − 1 + (m mod 2ⁱ). The estimate for a window holding the
  * c most recent events: the containing class i* = max{i : Pᵢ < c},
  * newer buckets contribute fully (B ranks, B = Pᵢ* or Pᵢ* + 2ⁱ*
  * depending on which of the ≤ 2 same-size buckets holds rank c), the
  * oldest contributes ⌈size/2⌉ — error ≤ size div 2, EXACT for the
  * size-1 class. This object is the streaming twin's real fold
  * (timestamped buckets, expiry by right edge); the spec pins its
  * sizes to the canonical digits and its estimate to the closed form.
  */
object DgimSketch {

  /** Buckets newest-first: sizes(i) events whose most recent timestamp
    * is rights(i) (µs). rights is strictly decreasing; sizes
    * non-decreasing, each a power of two appearing once or twice.
    */
  final case class Dgim(sizes: Vector[Long], rights: Vector[Long],
      n: Long, maxTs: Long)

  val empty: Dgim = Dgim(Vector.empty, Vector.empty, 0L, Long.MinValue)

  /** Process one event at timestamp `ts` (µs). Arrivals must be fed in
    * event-time order (the stream sorts within each micro-batch — the
    * runsStream discipline).
    */
  def add(d: Dgim, ts: Long): Dgim = {
    var sizes = 1L +: d.sizes
    var rights = ts +: d.rights
    // Carry cascade: only the class just incremented can hold 3; its
    // three buckets are contiguous (sizes sorted). Merge the OLDEST two
    // (keep the newer one's right edge — the merged bucket's most
    // recent event).
    var j = 0
    while (j + 2 < sizes.length && sizes(j) == sizes(j + 2)) {
      // Three buckets of size s start at j (sizes sorted, so the middle
      // equals too). The merged 2s bucket is newer than any existing 2s
      // bucket (it holds the newest events of its class), so it slots at
      // j + 1 — which may overflow the 2s class next: advance j by one.
      sizes = (sizes.take(j + 1) :+ (2 * sizes(j))) ++ sizes.drop(j + 3)
      rights = (rights.take(j + 1) :+ rights(j + 1)) ++ rights.drop(j + 3)
      j += 1
    }
    Dgim(sizes, rights, d.n + 1, math.max(d.maxTs, ts))
  }

  /** DGIM window estimate at `cutoff` (µs, inclusive): buckets whose
    * right edge is ≥ cutoff overlap the window; all but the oldest
    * contribute fully, the oldest ⌈size/2⌉. Returns
    * (est, errBound = oldest size div 2, oldestSize); (0, 0, 0) when
    * nothing overlaps. Expired buckets are merely skipped — dropping
    * them (the space reclaim) never changes an estimate.
    */
  def estimate(d: Dgim, cutoff: Long): (Long, Long, Long) = {
    val k = d.rights.count(_ >= cutoff) // hits are a prefix: rights sorted desc
    if (k == 0) (0L, 0L, 0L)
    else {
      val oldest = d.sizes(k - 1)
      (d.sizes.take(k - 1).sum + (oldest + 1) / 2, oldest / 2, oldest)
    }
  }

  /** Canonical {1,2}-digit decomposition of n — what the cascade must
    * land on (the a26 closed form): digits least-significant first.
    */
  def canonicalDigits(n: Long): Vector[Long] = {
    require(n >= 1)
    var k = 0
    while ((1L << (k + 1)) <= n + 1) k += 1
    val m = n + 1 - (1L << k)
    (0 until k).map(i => 1L + ((m >> i) & 1L)).toVector
  }
}
