package graft.stats

import breeze.linalg.{inv, DenseMatrix, DenseVector}

/** Augmented Dickey–Fuller test — SURVEY §2.7 T1; reference
  * `aug_dick_fuller` (enetVAR.R:761-772), which delegates to R
  * `tseries::adf.test`. This reproduces that test's exact construction:
  *
  * regression (with constant AND linear trend, always):
  *
  *   Δx_t = μ + β·t + ρ·x_{t−1} + Σ_{i=1}^{k} φ_i·Δx_{t−i} + ε_t,
  *   k = ⌊(N−1)^(1/3)⌋ by default,
  *
  * statistic = t-ratio of ρ̂; p-value by two-stage linear interpolation of
  * the Dickey–Fuller trend-case critical-value table (Banerjee, Dolado,
  * Galbraith & Hendry 1993, Table 4.2c — the table tseries embeds): first
  * interpolate each column over sample size, then the statistic over the
  * interpolated row, clamping outside the table range (R `approx` rule=2) —
  * so p-values saturate at [0.01, 0.99] exactly like tseries (which warns
  * "p-value smaller/greater than printed p-value").
  *
  * Scale: one test is O(T·k²) task-local math; the batch form fans one task
  * per series (146-way parallel in the reference pipeline, SURVEY §3.1-4).
  */
object Adf {

  final case class Result(statistic: Double, pValue: Double, lagOrder: Int)

  // Banerjee et al. (1993) Table 4.2c, negated (trend case): rows = sample
  // sizes (25, 50, 100, 250, 500, ∞), cols = p ∈ (.01,.025,.05,.10,.90,.95,.975,.99).
  private val TableT = Array(25.0, 50.0, 100.0, 250.0, 500.0, 1e5)
  private val TableP = Array(0.01, 0.025, 0.05, 0.10, 0.90, 0.95, 0.975, 0.99)
  private val Table: Array[Array[Double]] = Array(
    Array(-4.38, -3.95, -3.60, -3.24, -1.14, -0.80, -0.50, -0.15),
    Array(-4.15, -3.80, -3.50, -3.18, -1.19, -0.87, -0.58, -0.24),
    Array(-4.04, -3.73, -3.45, -3.15, -1.22, -0.90, -0.62, -0.28),
    Array(-3.99, -3.69, -3.43, -3.13, -1.23, -0.92, -0.64, -0.31),
    Array(-3.98, -3.68, -3.42, -3.13, -1.24, -0.93, -0.65, -0.32),
    Array(-3.96, -3.66, -3.41, -3.12, -1.25, -0.94, -0.66, -0.33))

  /** R `approx(..., rule = 2)`: linear interpolation, clamped at the ends. */
  private def interp(xs: Array[Double], ys: Array[Double], x: Double): Double = {
    if (x <= xs.head) ys.head
    else if (x >= xs.last) ys.last
    else {
      val hi = xs.indexWhere(_ >= x)
      val lo = hi - 1
      val w = (x - xs(lo)) / (xs(hi) - xs(lo))
      ys(lo) + w * (ys(hi) - ys(lo))
    }
  }

  /** ADF test with tseries defaults (trend regression, k = ⌊(N−1)^⅓⌋). */
  def test(x: DenseVector[Double], k: Int = -1): Result = {
    val bigN = x.length
    val kLag = if (k >= 0) k else math.cbrt((bigN - 1).toDouble).toInt
    val y = DenseVector.tabulate(bigN - 1)(i => x(i + 1) - x(i)) // Δx
    val n = y.length
    val kk = kLag + 1
    val rows = n - kk + 1
    require(rows > kk + 2, s"series too short (N=$bigN) for k=$kLag")

    // Columns: [x_{t−1}, 1, trend, Δx_{t−1} … Δx_{t−k}] for t = kk..n
    // (1-based), mirroring tseries' embed() construction.
    val p = 3 + kLag
    val xm = DenseMatrix.zeros[Double](rows, p)
    val yt = DenseVector.zeros[Double](rows)
    var r = 0
    while (r < rows) {
      val t1 = kk + r          // 1-based index into y
      yt(r) = y(t1 - 1)
      xm(r, 0) = x(t1 - 1)     // x_{t} level paired with Δx at t1 (x[k:n] in R)
      xm(r, 1) = 1.0
      xm(r, 2) = t1.toDouble   // trend tt = k:n
      var i = 1
      while (i <= kLag) {
        xm(r, 2 + i) = y(t1 - 1 - i)
        i += 1
      }
      r += 1
    }
    val xtx = xm.t * xm
    val beta = xtx \ (xm.t * yt)
    val resid = yt - xm * beta
    val sigma2 = (resid dot resid) / (rows - p).toDouble
    val xtxInv: DenseMatrix[Double] = inv(xtx)
    val seRho = math.sqrt(xtxInv(0, 0) * sigma2)
    val stat = beta(0) / seRho

    val rowAtN = Array.tabulate(TableP.length) { c =>
      interp(TableT, Table.map(_(c)), n.toDouble)
    }
    val pv = interp(rowAtN, TableP, stat)
    Result(stat, pv, kLag)
  }

  /** Batch form of the reference's `aug_dick_fuller`: names of the series
    * whose p-value exceeds `crit` (non-stationary), preserving input order.
    * The reference carries TWO versions of this function and the golden
    * runs use the second:
    *  - enetVAR.R:761-772: adf.test default lag k = ⌊(N−1)^⅓⌋, strict
    *    `p > crit`, default crit 0.01 (the Main.R pipeline);
    *  - Testing.R:43-52: FIXED lag k = 7, inclusive `p >= crit`, crit 0.05
    *    (the prep feeding every recorded golden MSFE, Testing.R:214-243).
    * `k` (−1 = default rule) and `gteCrit` select between them.
    */
  def nonStationary(
      series: Seq[(String, DenseVector[Double])],
      crit: Double = 0.01,
      k: Int = -1,
      gteCrit: Boolean = false): Seq[String] =
    series.collect {
      case (name, x) if {
        val pv = test(x, k).pValue
        if (gteCrit) pv >= crit else pv > crit
      } => name
    }
}
