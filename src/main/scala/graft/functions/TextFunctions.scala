package graft.functions

/** Task-local text/binary kernels used by the pipeline operators —
  * deterministic, dependency-free, unit-tested in PipelineSpec.
  */
object TextFunctions {

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003): hash every
    * k-gram with a polynomial rolling hash, slide a window of `window`
    * consecutive hashes, keep each window's minimum (rightmost-min rule so
    * runs of equal minima add one fingerprint), dedupe consecutive picks.
    * Guarantees every match of length ≥ window+k−1 shares a fingerprint.
    */
  def winnow(text: String, k: Int, window: Int): Array[Long] = {
    if (text.length < k) return Array.empty
    val base = 1000003L
    // Modulus small enough that char·pow (≤ ~2^17 · mod) stays inside a
    // Long: a larger modulus silently overflows and the hash stops being a
    // pure function of its k characters (breaking the winnowing guarantee).
    val mod = 1000000007L
    // Rolling hashes of all k-grams.
    var pow = 1L
    for (_ <- 1 until k) pow = pow * base % mod
    val n = text.length - k + 1
    val hs = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * base + text.charAt(i)) % mod; i += 1 }
    hs(0) = h
    i = 1
    while (i < n) {
      h = ((h - text.charAt(i - 1) * pow % mod + mod * 2) % mod * base +
        text.charAt(i + k - 1)) % mod
      hs(i) = h
      i += 1
    }
    if (n <= window) return Array(hs.min)
    val out = Array.newBuilder[Long]
    var lastPick = -1
    var w = 0
    while (w <= n - window) {
      // Rightmost minimal hash in the window.
      var minIdx = w
      var j = w + 1
      while (j < w + window) {
        if (hs(j) <= hs(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != lastPick) { out += hs(minIdx); lastPick = minIdx }
      w += 1
    }
    out.result()
  }

  /** STUB multimodal decoder (see mm1_multimodal_stub): stands in for an
    * image/audio codec, returning (mean byte value, frame count) for a
    * payload split into `frameSize` frames. Deterministic by construction.
    */
  def fakeDecode(bytes: Array[Byte], frameSize: Int): (Double, Long) = {
    if (bytes.isEmpty) return (0.0, 0L)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    (sum.toDouble / bytes.length,
      ((bytes.length + frameSize - 1) / frameSize).toLong)
  }

  /** STUB perceptual hash (see mm6_perceptual_hash): average-hash (aHash)
    * over 64 payload samples at positions ⌊i·len/64⌋ — bit i set iff the
    * sample exceeds the 64-sample mean, packed as two unsigned 32-bit
    * halves (a single 64-bit pack would put bit 63 in int64's sign,
    * which parquet/DuckDB comparisons then order differently). The
    * threshold is the INTEGER test 64·b > Σb — no division, no double.
    * Stands in for thumbnail-decode + downsample; swapping the byte
    * sampler for a real 8×8 grayscale decoder changes no plumbing.
    */
  def perceptualHash(bytes: Array[Byte]): (Long, Long, Long) = {
    if (bytes.isEmpty) return (0L, 0L, 0L)
    val n = bytes.length
    val samp = Array.tabulate(64)(i => (bytes((i * n) / 64) & 0xff).toLong)
    val ssum = samp.sum
    var hi = 0L; var lo = 0L; var bits = 0L
    var i = 0
    while (i < 64) {
      if (64L * samp(i) > ssum) {
        bits += 1
        if (i < 32) lo += 1L << i else hi += 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo, bits)
  }

  /** STUB frame sampler (see mm2_frame_sample): every `stride`-th
    * frameSize-byte frame of the payload with its length and byte-sum
    * checksum — stands in for codec frame extraction (video frame
    * sampling / audio windowing). Deterministic by construction, so the
    * Spark-side batching and explode plumbing is oracle-checkable;
    * swapping the byte-sum for a real frame decode changes no plumbing.
    */
  def sampleFrames(
      bytes: Array[Byte],
      frameSize: Int,
      stride: Int): Seq[(Long, Long, Long)] = {
    val nFrames = (bytes.length + frameSize - 1) / frameSize
    (0 until nFrames by stride).map { fi =>
      val start = fi * frameSize
      val end = math.min(bytes.length, start + frameSize)
      var sum = 0L
      var i = start
      while (i < end) { sum += bytes(i) & 0xff; i += 1 }
      (fi.toLong, (end - start).toLong, sum)
    }
  }

  /** STUB feature extractor (see mm3_feature_extract): `bands` pooled
    * features per payload, feature j = mean of the bytes at positions
    * ≡ j (mod bands) — stands in for a codec + pooling pipeline (image
    * channel stats, audio band energies) producing the fixed-width
    * vector the embedding/ANN surface consumes. Deterministic integer
    * ratios, so the extract is oracle-checkable bit-for-bit; an empty
    * payload yields all-zero features (total, like fakeDecode).
    */
  def byteBandMeans(bytes: Array[Byte], bands: Int): Array[Double] = {
    val sums = new Array[Long](bands)
    val counts = new Array[Long](bands)
    var i = 0
    while (i < bytes.length) {
      val b = i % bands
      sums(b) += bytes(i) & 0xff
      counts(b) += 1
      i += 1
    }
    Array.tabulate(bands)(j =>
      if (counts(j) == 0) 0.0 else sums(j).toDouble / counts(j))
  }

  /** STUB resizer (see mm5_resize): box-downsample the payload by
    * `factor` — output byte j is the truncating mean of input block
    * [j·factor, (j+1)·factor) — standing in for an image resize /
    * audio resample kernel. Truncating (floor) mean on 0-255 values
    * keeps every output byte an exact integer both engines recompute;
    * a real resampler swaps the block mean for its filter, plumbing
    * unchanged. The trailing partial block averages over its actual
    * length, as a real resampler's edge handling would.
    */
  def resizeBytes(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val n = (bytes.length + factor - 1) / factor
    Array.tabulate(n) { j =>
      val start = j * factor
      val end = math.min(bytes.length, start + factor)
      var sum = 0L
      var i = start
      while (i < end) { sum += bytes(i) & 0xff; i += 1 }
      (sum / (end - start)).toByte
    }
  }

  /** 32-bit SimHash of a token set using the same md5-nibble bit planes as
    * the d4_simhash query (kept in sync for cross-checking in tests).
    */
  def simhash32(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](32)
    val md = java.security.MessageDigest.getInstance("MD5")
    for (t <- tokens) {
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      var j = 0
      while (j < 32) {
        if ("89abcdef".indexOf(hex.charAt(j)) >= 0) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** Hamming distance between two simhashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
