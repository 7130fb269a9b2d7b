package graft.stats

import breeze.linalg.{sum, DenseVector}
import org.apache.commons.math3.distribution.{NormalDistribution, TDistribution}

/** Forecast-comparison tests and the Newey–West HAC variance — SURVEY §2.7
  * T3 (Clark–West), T4 (Diebold–Mariano), T5 (NW); reference
  * enetVAR.R:775-843 (MatLab ports, readme.txt:76-84).
  *
  * For qn ≥ 2 the formulas reproduce the reference's code EXACTLY,
  * including its two idiosyncrasies, because the golden values are defined
  * by that code:
  *  - `nw` normalizes Γ₀ by T but the lagged Γⱼ by (T−1) (enetVAR.R:799),
  *  - `nw` weights lag j by (1 − |j/qn|) and loops j = 1..qn−1.
  * Both differ slightly from textbook NW; preserved, documented here.
  * KNOWN DEVIATION at qn = 1: R's `for (j in 1:(qn-1))` evaluates `1:0`
  * and iterates j = 1 then j = 0, adding an extra Γ₀/(T−1)-style term,
  * while the loop below runs zero iterations (plain Γ₀). No reference
  * call site uses nwlag = 1, so no golden depends on the quirk; callers
  * who need it (e.g. CW at h = 1) should be aware the results differ.
  */
object HacTests {

  final case class TestResult(statistic: Double, pValue: Double)

  /** Newey–West HAC variance of a scalar series (reference `nw`,
    * enetVAR.R:794-806, univariate case): Γ₀ + Σ_{j=1}^{qn−1}
    * (1 − j/qn)·2Γⱼ with the reference's mixed normalizations.
    */
  def nw(y: DenseVector[Double], qn: Int): Double = {
    val t = y.length
    val ybar = sum(y) / t.toDouble
    val dy = y - ybar
    var g0 = (dy dot dy) / t.toDouble
    var j = 1
    while (j <= qn - 1) {
      var gamma = 0.0
      var i = 0
      while (i < t - j) { gamma += dy(i + j) * dy(i); i += 1 }
      gamma /= (t - 1).toDouble
      g0 += 2.0 * gamma * (1.0 - math.abs(j.toDouble / qn))
      j += 1
    }
    g0
  }

  /** Clark–West MSPE-adjusted test (reference `CW_test`, enetVAR.R:775-792).
    * e1/yf1 = parsimonious model's errors/forecasts, e2/yf2 = larger
    * model's; H1: the larger model has smaller MSPE. Statistic ~ t(nwlag);
    * p-value is the upper tail at |stat| like the reference's
    * `pt(abs(CWstat), df = nwlag, lower.tail = FALSE)`.
    */
  def clarkWest(
      e1: DenseVector[Double],
      e2: DenseVector[Double],
      yf1: DenseVector[Double],
      yf2: DenseVector[Double],
      nwlag: Int): TestResult = {
    val p = e1.length
    val frollAdj = DenseVector.tabulate(p) { i =>
      val d = yf1(i) - yf2(i)
      e1(i) * e1(i) - (e2(i) * e2(i) - d * d)
    }
    val v = nw(frollAdj, nwlag)
    val stat = math.sqrt(p.toDouble) * (sum(frollAdj) / p.toDouble) / math.sqrt(v)
    val pv = 1.0 - new TDistribution(nwlag.toDouble).cumulativeProbability(math.abs(stat))
    TestResult(stat, pv)
  }

  /** Diebold–Mariano test (reference `DMtest`, enetVAR.R:811-843): d is the
    * loss differential (e1² − e2²), l the lag window (forecast horizon);
    * Bartlett-kernel variance over lags −l..l with weights 1 − |lag|/(l+1),
    * statistic ~ N(0,1), upper-tail p at |stat|.
    */
  def dieboldMariano(d: DenseVector[Double], l: Int): TestResult = {
    val t = d.length
    val m = sum(d) / t.toDouble
    val e = d - m
    var s2 = 0.0
    var li = -l
    while (li <= l) {
      val aj = math.abs(li)
      var gamma = 0.0
      var i = 0
      while (i < t - aj) { gamma += e(i + aj) * e(i); i += 1 }
      gamma /= t.toDouble
      s2 += gamma * (1.0 - aj.toDouble / (l + 1))
      li += 1
    }
    s2 /= t.toDouble
    val stat = m / math.sqrt(s2)
    val pv = 1.0 - new NormalDistribution(0, 1).cumulativeProbability(math.abs(stat))
    TestResult(stat, pv)
  }

  /** Theil's U vs a benchmark error sum: sqrt(Σe_model² / Σe_bench²)
    * (T7, enetVAR.R:475-480).
    */
  def theilsU(modelSqErrSum: Double, benchSqErrSum: Double): Double =
    math.sqrt(modelSqErrSum / benchSqErrSum)
}
