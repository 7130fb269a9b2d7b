package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.stats.{Acf, Adf, HacTests, Portmanteau}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the stats layer (SURVEY §5.2-2, FIXTURES.md `ar1_sim`,
  * `unit_root_sim`, `fixed_errors` families). Golden values were computed
  * by an independent NumPy implementation of the same published formulas
  * (R acf/Durbin–Levinson/tseries-ADF/reference NW-CW-DM) on byte-identical
  * LCG fixtures.
  */
class StatsSpec extends AnyFunSuite {

  private val ar1 = TestData.ar1Series(200, 0.7, seed = 123L)
  private val walk = TestData.randomWalk(200, seed = 99L)

  test("fixture generators are byte-stable (LCG parity with the golden script)") {
    assert(math.abs(ar1(0) - 9.67188393e-04) < 1e-10)
    assert(math.abs(ar1(2) - 1.85705599e+00) < 1e-7)
    assert(math.abs(walk(0) - -1.66480209) < 1e-7)
  }

  test("exact-R ACF on AR(0.7): golden lags 1..5") {
    val golden = Seq(0.68670023, 0.45086858, 0.3036836, 0.19698232, 0.20289726)
    val r = Acf.univariate(ar1, 5)
    golden.zipWithIndex.foreach { case (g, i) =>
      assert(math.abs(r(i) - g) < 1e-7, s"lag ${i + 1}")
    }
  }

  test("PACF via Durbin–Levinson on AR(0.7): lag 1 = ACF(1), higher lags ~ 0") {
    val golden = Seq(0.68670023, -0.03915016, 0.01674483, -0.01588757, 0.14442099)
    val p = Acf.pacfUnivariate(ar1, 5)
    golden.zipWithIndex.foreach { case (g, i) =>
      assert(math.abs(p(i) - g) < 1e-7, s"lag ${i + 1}")
    }
  }

  test("cross-ACF: diagonal of lag-k matrix equals univariate ACF") {
    val y = DenseMatrix.horzcat(
      ar1.toDenseMatrix.t, TestData.ar1Series(200, 0.3, seed = 321L).toDenseMatrix.t)
    val cc = Acf.cross(y, 3)
    val u0 = Acf.univariate(ar1, 3)
    for (k <- 1 to 3)
      assert(math.abs(cc(k - 1)(0, 0) - u0(k - 1)) < 1e-12)
    // Squared-vs-lagged-target matrix has the right shape + values.
    val sq = Acf.squaredVsLaggedTarget(y, 3)
    assert(sq.rows == 3 && sq.cols == 2)
    assert(math.abs(sq(0, 0) - u0(0) * u0(0)) < 1e-12)
  }

  test("ADF golden statistics: tseries construction on AR(0.7) and a random walk") {
    val rStat = Adf.test(ar1)
    assert(math.abs(rStat.statistic - -3.9031894377357323) < 1e-8)
    assert(rStat.lagOrder == 5) // trunc(199^(1/3))
    // Stationary: p interpolates between table points 0.01 and 0.025.
    assert(rStat.pValue > 0.01 && rStat.pValue < 0.025)

    val wStat = Adf.test(walk)
    assert(math.abs(wStat.statistic - -2.086583016805937) < 1e-8)
    assert(wStat.pValue > 0.1) // unit root not rejected
  }

  test("ADF batch: flags the walk, passes the stationary series (crit=0.05)") {
    val names = Adf.nonStationary(
      Seq("stationary" -> ar1, "unit_root" -> walk), crit = 0.05)
    assert(names == Seq("unit_root"))
  }

  test("Newey-West variance matches the reference formula (golden)") {
    val e1 = TestData.vector(40, seed = 55L)
    assert(math.abs(HacTests.nw(e1, 4) - 1.1032803374645717) < 1e-10)
  }

  test("Clark-West golden statistic and t-distributed p-value") {
    val e1 = TestData.vector(40, seed = 55L)
    val e2 = TestData.vector(40, seed = 56L) * 0.8
    val yf1 = TestData.vector(40, seed = 57L)
    val yf2 = TestData.vector(40, seed = 58L)
    val res = HacTests.clarkWest(e1, e2, yf1, yf2, nwlag = 4)
    assert(math.abs(res.statistic - 4.42267199784357) < 1e-9)
    assert(res.pValue > 0 && res.pValue < 0.01) // strong rejection at t(4)
  }

  test("Diebold-Mariano golden statistic and normal p-value") {
    val e1 = TestData.vector(40, seed = 55L)
    val e2 = TestData.vector(40, seed = 56L) * 0.8
    val d = DenseVector.tabulate(40)(i => e1(i) * e1(i) - e2(i) * e2(i))
    val res = HacTests.dieboldMariano(d, l = 3)
    assert(math.abs(res.statistic - 1.2089962427228635) < 1e-9)
    // Upper tail at |1.209| ≈ 0.1133.
    assert(res.pValue > 0.10 && res.pValue < 0.13)
  }

  test("Theil's U: identical errors give exactly 1") {
    assert(HacTests.theilsU(3.7, 3.7) == 1.0)
    assert(HacTests.theilsU(1.0, 4.0) == 0.5)
  }

  test("portmanteau: white noise is not rejected, an AR(1) series is") {
    val wn = DenseMatrix.horzcat(
      TestData.vector(300, seed = 1L).toDenseMatrix.t,
      TestData.vector(300, seed = 2L).toDenseMatrix.t)
    val rowsWn = Portmanteau.hosking(wn, lags = Seq(5, 10))
    assert(rowsWn.forall(_.pValue > 0.05))

    val corr = DenseMatrix.horzcat(
      TestData.ar1Series(300, 0.6, seed = 3L).toDenseMatrix.t,
      TestData.ar1Series(300, 0.6, seed = 4L).toDenseMatrix.t)
    val rowsAr = Portmanteau.hosking(corr, lags = Seq(5, 10))
    assert(rowsAr.forall(_.pValue < 1e-6))

    val lb = Portmanteau.ljungBoxUnivariate(TestData.ar1Series(300, 0.6, seed = 5L), 10)
    assert(lb.pValue < 1e-6)
    val lbWn = Portmanteau.ljungBoxUnivariate(TestData.vector(300, seed = 6L), 10)
    assert(lbWn.pValue > 0.01)
  }
}
