package graft.functions

/** Deterministic KLL/MRL-class rank sketch (r13 verdict #6) — the
  * sketch-sized-error companion to a18's bottom-k SAMPLE: a18 answers
  * quantiles from a uniform k-sample (error ~ n/sqrt(k), a property of
  * sampling), while this compactor cascade carries a DETERMINISTIC
  * additive rank-error bound that the sketch itself reports and that
  * tests assert against true ranks (the Manku–Rajagopalan–Lindsay '98 /
  * Karnin–Lang–Liberty '16 compactor family, derandomized).
  *
  * Design for oracle-exactness: the classic KLL coin flip is replaced by
  * the engine's shared [[graft.operators.Relational.fmix32]] mix — the
  * compaction at level l keeps the items at 0-based positions ≡
  * fmix32(l) mod 2 of the sorted level. A BATCH build then has a closed
  * form: compacting the full sorted input L times keeps exactly the
  * 0-based ranks r with r ≡ R (mod 2^L), where bit l of R is the level-l
  * coin — so the relational a25 entry selects survivors with one
  * row_number and a modulus, DuckDB replays it verbatim, and this JVM
  * kernel (the streaming twin's state algebra) produces the identical
  * item set, pinned by test. Items carry a fingerprint tiebreak so the
  * sort (value, fp) is total and engine-exact.
  *
  * Error accounting (the MRL telescope): one full-level compaction at
  * level l perturbs any rank query by at most 2^l, so the closed-form
  * build is within 2^L − 1 and every later merge ADDS the levels it
  * compacts — the sketch tracks `errBound` through build/promote/merge
  * and tests assert |estRank − trueRank| ≤ errBound on planted unions.
  * Where a18 remains preferable: under k distinct survivors a bottom-k
  * sample of an n ≤ k group is the EXACT multiset (zero error), and the
  * KMV hash doubles as a distinct-count estimator (a19) — the compactor
  * buys its guaranteed bound only once n outgrows k.
  *
  * State is level + at most k (value, fp) pairs + two longs — bounded by
  * the SKETCH size regardless of stream length, the invariant every
  * streaming twin in this engine holds.
  */
object KllSketch {

  /** JVM twin of the Column-side fmix32 (Relational.fmix32) — BigInt
    * arithmetic so the 0x9E3779B1 product cannot overflow; equality with
    * the Column form across the 32-bit domain is pinned in
    * RelationalPlanSpec's ANSI-strict fmix32 test (same reference body).
    */
  def fmix32Jvm(x: Long): Long = {
    val M = BigInt(1) << 32
    def mix(v: BigInt, mult: Long, sh: Int): BigInt = {
      val m = (v * mult) mod M
      m ^ (m >> sh)
    }
    mix(mix(mix(BigInt(x) mod M, 2654435761L, 16),
      1540483477L, 13), 1033321189L, 16).toLong
  }

  /** Derandomized compaction coin for level l: bit 0 of fmix32(l).
    * Identical spelling in the a25 relational entry and its DuckDB
    * oracle (fmix32 over the level series, % 2).
    */
  def coin(l: Int): Int = (fmix32Jvm(l.toLong) & 1L).toInt

  /** Sketch: `items` sorted ascending by (value, fp), each of weight
    * 2^level; `n` exact input count; `errBound` the accumulated additive
    * rank-error bound (0 for an exact, uncompacted sketch).
    */
  final case class Sketch(level: Int, items: Vector[(Long, Long)],
      n: Long, errBound: Long) {
    def weight: Long = 1L << level

    /** Estimated rank of q (count of inputs strictly below q):
      * Σ weights of survivors with value < q.
      */
    def estRank(q: Long): Long = weight * items.count(_._1 < q)

    /** Value estimate for the 1-based target rank t (1 ≤ t ≤ n): the
      * survivor whose estimated rank interval covers t — index
      * ceil(t / 2^level) − 1, clamped into the survivor list. Integer
      * arithmetic only.
      */
    def valueAtRank(t: Long): Long = {
      require(items.nonEmpty, "empty sketch")
      val i = ((t + weight - 1) / weight - 1).max(0L)
        .min(items.size - 1L).toInt
      items(i)._1
    }
  }

  val empty: Sketch = Sketch(0, Vector.empty, 0L, 0L)

  /** Smallest L with ceil(n/k) ≤ 2^L — the cascade depth that bounds
    * survivors at k. Integer-exact (the relational entry spells the same
    * predicate as a sum over shiftleft(1, l) < ceil-div(n, k)).
    */
  def levelsFor(n: Long, k: Int): Int = {
    val m = (n + k - 1) / k
    var l = 0
    while ((1L << l) < m) l += 1
    l
  }

  /** The residue R selected by coins c(0..L-1): bit l of R = coin(l). */
  def residue(levels: Int): Long =
    (0 until levels).foldLeft(0L)((r, l) => r | (coin(l).toLong << l))

  /** Closed-form batch build: sort by (value, fp), keep 0-based ranks
    * ≡ residue(L) mod 2^L with L = levelsFor(n, k); errBound = 2^L − 1
    * (the telescoped sum of the L full-level compactions). Equals the
    * iterated compaction by the bit argument in the scaladoc; equals the
    * a25 relational survivor set by test.
    */
  def build(values: Seq[(Long, Long)], k: Int): Sketch = {
    if (values.isEmpty) return empty
    val sorted = values.sortBy(identity).toVector
    val n = sorted.size.toLong
    val lv = levelsFor(n, k)
    val w = 1L << lv
    val r = residue(lv)
    val kept = sorted.zipWithIndex
      .collect { case (it, i) if (i.toLong % w) == r => it }
    Sketch(lv, kept, n, w - 1)
  }

  /** One full-level compaction at `s.level`: keep local 0-based
    * positions ≡ coin(level) mod 2; adds 2^level to the bound.
    */
  private def compactOnce(s: Sketch): Sketch = {
    val c = coin(s.level)
    val kept = s.items.zipWithIndex
      .collect { case (it, i) if i % 2 == c => it }
    Sketch(s.level + 1, kept, s.n, s.errBound + (1L << s.level))
  }

  /** Promote a sketch to a higher level by repeated compaction (the
    * merge pre-step when the two sides sit at different levels).
    */
  private def promote(s: Sketch, toLevel: Int): Sketch = {
    var cur = s
    while (cur.level < toLevel) cur = compactOnce(cur)
    cur
  }

  /** Mergeable-law merge: equalize levels, merge the sorted lists, then
    * compact while over capacity. Bounds ADD (each side keeps its own
    * accumulated error; the union introduces none) plus 2^l per
    * overflow compaction. Deterministic: same inputs → same sketch,
    * independent of which side is which only up to the shared sorted
    * union (commutative by construction — the merged list is the sorted
    * multiset union and coins depend only on level).
    */
  def merge(a: Sketch, b: Sketch, k: Int): Sketch = {
    if (a.items.isEmpty && a.n == 0) return b
    if (b.items.isEmpty && b.n == 0) return a
    val lv = math.max(a.level, b.level)
    val (pa, pb) = (promote(a, lv), promote(b, lv))
    var cur = Sketch(lv, (pa.items ++ pb.items).sorted,
      a.n + b.n, pa.errBound + pb.errBound)
    while (cur.items.size > k) cur = compactOnce(cur)
    cur
  }

  /** Binary-counter micro-batch fold (the Bentley–Saxe logarithmic
    * method — the same lazy-binary-counter shape DgimSketch proves for
    * its bucket cascade). Slot i holds the merge of exactly 2^i
    * micro-batch sketches; a new batch enters at slot 0 and CARRIES
    * upward on collision, exactly like binary addition.
    *
    * Why not merge every batch straight into one running sketch: that
    * promotes the small batch up to the state's level each time, adding
    * ~2^level ≈ n/k to the bound PER BATCH — after ~2k micro-batches the
    * reported bound exceeds n and the quantiles are vacuous (honest but
    * useless). With the counter fold each item participates in at most
    * ⌈log₂ B⌉ merges, so the union bound grows ~O(n·log₂B/k) instead of
    * ~O(n·B/2k), and state stays ≤ k·⌈log₂(B+1)⌉ pairs per key —
    * logarithmic in stream length, never linear.
    */
  def foldStep(slots: Vector[Option[Sketch]], batch: Sketch, k: Int)
      : Vector[Option[Sketch]] = {
    if (batch.n == 0) return slots
    var carry = batch
    var v = slots
    var i = 0
    while (i < v.size && v(i).isDefined) {
      carry = merge(v(i).get, carry, k)
      v = v.updated(i, None)
      i += 1
    }
    if (i < v.size) v.updated(i, Some(carry)) else v :+ Some(carry)
  }

  /** Query-time union of the counter slots, low slot first (a fixed,
    * deterministic order — replay tests fold the same way). The union is
    * EPHEMERAL: it is emitted, never stored, so its compaction costs are
    * paid once per emission and do not compound across batches.
    */
  def union(slots: Vector[Option[Sketch]], k: Int): Sketch =
    slots.flatten.foldLeft(empty)((acc, s) => merge(acc, s, k))
}
