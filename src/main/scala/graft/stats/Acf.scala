package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector, sum}

/** Auto-/cross-correlation with exact R `acf` semantics — SURVEY §2.5 W5;
  * consumed by the ACF-based variable selections (M11/M12,
  * enetVAR.R:646-701).
  *
  * R's estimator (type = "correlation", demean = TRUE):
  *
  *   c_ij(k) = (1/T) · Σ_{t=1}^{T−k} (y[t+k, i] − ȳ_i)(y[t, j] − ȳ_j)
  *   r_ij(k) = c_ij(k) / sqrt(c_ii(0) · c_jj(0))
  *
  * — series demeaned ONCE with the full-sample mean, covariances always
  * normalized by T (not T−k), correlations scaled by the lag-0 variances.
  * `cross(y, lagMax)(k)(i)(j)` = r_ij(k) = corr(series i at t+k, series j
  * at t), matching R's `acf(y)$acf[k+1, i, j]`; the reference reads row
  * `[k, 1, ]` — each series' correlation with lagged GDP.
  *
  * Scale: the panel collapses to a (lag × K × K) array of aggregates; the
  * distributed form of the same numbers is `corr(x, lag(x, k))` DataFrame
  * aggregation (Relational w5_lag_corr); this exact-R version is the
  * driver/task-local form selection loops consume.
  */
object Acf {

  /** Univariate ACF r_1..r_lagMax (r_0 = 1 omitted). */
  def univariate(y: DenseVector[Double], lagMax: Int): DenseVector[Double] = {
    val t = y.length
    val m = sum(y) / t.toDouble
    val c = y - m
    val c0 = (c dot c) / t.toDouble
    DenseVector.tabulate(lagMax) { i =>
      val k = i + 1
      var s = 0.0
      var tt = 0
      while (tt < t - k) { s += c(tt + k) * c(tt); tt += 1 }
      (s / t.toDouble) / c0
    }
  }

  /** Full cross-correlation array: result(k−1)(i)(j) = r_ij(k) for lags
    * 1..lagMax (lag 0 omitted — it is 1 on the diagonal by construction).
    */
  def cross(y: DenseMatrix[Double], lagMax: Int): IndexedSeq[DenseMatrix[Double]] = {
    val t = y.rows
    val kk = y.cols
    val centered = y.copy
    val sd0 = DenseVector.zeros[Double](kk)
    var j = 0
    while (j < kk) {
      val cj = centered(::, j)
      val m = sum(cj) / t.toDouble
      cj :-= m
      sd0(j) = math.sqrt((cj dot cj) / t.toDouble)
      j += 1
    }
    (1 to lagMax).map { k =>
      DenseMatrix.tabulate(kk, kk) { (i, jj) =>
        var s = 0.0
        var tt = 0
        while (tt < t - k) { s += centered(tt + k, i) * centered(tt, jj); tt += 1 }
        (s / t.toDouble) / (sd0(i) * sd0(jj))
      }
    }
  }

  /** The reference's selection input (enetVAR.R:649-653): for each series j,
    * the squared correlations with LAGGED target (series 0) at lags
    * 1..lag — `acf$acf[2:(lag+1), 1, ]^2` — as a (lag × K) matrix.
    */
  def squaredVsLaggedTarget(y: DenseMatrix[Double], lag: Int): DenseMatrix[Double] = {
    // Only the target ROW of the cross-correlation array is consumed, so
    // correlate series 0 at t+k with each series j at t directly — the
    // same arithmetic as cross(y, lag)(k−1)(0, j) entry for entry, at
    // O(lag·K·T) instead of the full O(lag·K²·T) array (a K-fold saving
    // inside the selection loops; K = 146 on the reference panel).
    val t = y.rows
    val kk = y.cols
    val centered = y.copy
    val sd0 = DenseVector.zeros[Double](kk)
    var j = 0
    while (j < kk) {
      val cj = centered(::, j)
      val m = sum(cj) / t.toDouble
      cj :-= m
      sd0(j) = math.sqrt((cj dot cj) / t.toDouble)
      j += 1
    }
    DenseMatrix.tabulate(lag, kk) { (ki, j2) =>
      val k = ki + 1
      var s = 0.0
      var tt = 0
      while (tt < t - k) { s += centered(tt + k, 0) * centered(tt, j2); tt += 1 }
      val r = (s / t.toDouble) / (sd0(0) * sd0(j2))
      r * r
    }
  }

  /** Univariate PACF via the Durbin–Levinson recursion on the exact-R ACF —
    * SURVEY §2.5 W6 (the reference's blocks-of-4 stitching,
    * enetVAR.R:704-756, is an R `pacf` API limitation; the recursion itself
    * needs no blocking).
    */
  def pacfUnivariate(y: DenseVector[Double], lagMax: Int): DenseVector[Double] = {
    val r = univariate(y, lagMax)
    val phi = DenseMatrix.zeros[Double](lagMax + 1, lagMax + 1)
    val out = DenseVector.zeros[Double](lagMax)
    var k = 1
    while (k <= lagMax) {
      if (k == 1) phi(1, 1) = r(0)
      else {
        var num = r(k - 1)
        var den = 1.0
        var j = 1
        while (j < k) {
          num -= phi(k - 1, j) * r(k - 1 - j)
          den -= phi(k - 1, j) * r(j - 1)
          j += 1
        }
        phi(k, k) = num / den
        j = 1
        while (j < k) {
          phi(k, j) = phi(k - 1, j) - phi(k, k) * phi(k - 1, k - j)
          j += 1
        }
      }
      out(k - 1) = phi(k, k)
      k += 1
    }
    out
  }
}
