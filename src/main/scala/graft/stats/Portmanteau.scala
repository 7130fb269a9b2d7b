package graft.stats

import breeze.linalg.{inv, trace, DenseMatrix}
import org.apache.commons.math3.distribution.ChiSquaredDistribution

/** Multivariate portmanteau residual-autocorrelation tests — SURVEY §2.7
  * T6; reference call sites Main.R:304 (`portes::Hosking(resids, order=3)`)
  * and Testing.R:385-390 (`LjungBox`, `Box.test`).
  *
  * For a K-variate residual matrix U (T×K) with lag-j autocovariance
  * Γⱼ = (1/T)·Σ_t u_{t+j} u_tᵀ (A5), the Hosking (1980) / multivariate
  * Ljung–Box statistic at lag m is
  *
  *   Q(m) = T² · Σ_{j=1}^{m} (T−j)⁻¹ · tr(Γⱼᵀ Γ₀⁻¹ Γⱼ Γ₀⁻¹)
  *
  * asymptotically χ² with K²·(m − order) dof when the residuals come from a
  * fitted VAR(order). Default lag set matches portes: 5,10,…,30.
  */
object Portmanteau {

  final case class Row(lag: Int, statistic: Double, df: Double, pValue: Double)

  /** Lag-j autocovariance Γⱼ of centered residuals, normalized by T (A5). */
  def autoCovariance(u: DenseMatrix[Double], j: Int): DenseMatrix[Double] = {
    val t = u.rows
    val k = u.cols
    val g = DenseMatrix.zeros[Double](k, k)
    var tt = 0
    while (tt < t - j) {
      val a = u(tt + j, ::).t
      val b = u(tt, ::).t
      g += a * b.t
      tt += 1
    }
    g / t.toDouble
  }

  def hosking(
      u: DenseMatrix[Double],
      lags: Seq[Int] = Seq(5, 10, 15, 20, 25, 30),
      order: Int = 0): Seq[Row] = {
    val t = u.rows
    val k = u.cols
    // Center each column (residuals should be near-zero-mean already).
    val c = u.copy
    var j = 0
    while (j < k) {
      val m = breeze.linalg.sum(c(::, j)) / t.toDouble
      c(::, j) :-= m
      j += 1
    }
    val g0inv = inv(autoCovariance(c, 0))
    val terms = (1 to lags.max).map { jj =>
      val gj = autoCovariance(c, jj)
      trace(gj.t * g0inv * gj * g0inv) / (t - jj).toDouble
    }
    lags.map { m =>
      val q = t.toDouble * t.toDouble * terms.take(m).sum
      val df = k.toDouble * k * (m - order)
      val pv =
        if (df <= 0) Double.NaN
        else 1.0 - new ChiSquaredDistribution(df).cumulativeProbability(q)
      Row(m, q, df, pv)
    }
  }

  /** Univariate Ljung–Box (R `Box.test(..., type="Lj")`):
    * Q = T(T+2)·Σ_{j=1}^m r_j²/(T−j), χ²(m − order).
    */
  def ljungBoxUnivariate(
      y: breeze.linalg.DenseVector[Double],
      m: Int,
      order: Int = 0): Row = {
    val t = y.length
    val r = Acf.univariate(y, m)
    var q = 0.0
    var j = 1
    while (j <= m) { q += r(j - 1) * r(j - 1) / (t - j).toDouble; j += 1 }
    q *= t.toDouble * (t + 2.0)
    val df = (m - order).toDouble
    val pv =
      if (df <= 0) Double.NaN
      else 1.0 - new ChiSquaredDistribution(df).cumulativeProbability(q)
    Row(m, q, df, pv)
  }
}
