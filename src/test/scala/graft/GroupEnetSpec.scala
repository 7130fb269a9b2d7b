package graft

import breeze.linalg.{diag, norm, DenseMatrix, DenseVector}
import graft.linalg.GroupElasticNet
import graft.varmodel.GroupEnetVar
import org.scalatest.funsuite.AnyFunSuite

/** Golden/property tests for the multiresponse group elastic net (M7):
  * ridge closed form at α=0, group-KKT at interior points, joint row
  * sparsity at α=1, and the VAR wrapper.
  */
class GroupEnetSpec extends AnyFunSuite {

  private val x = TestData.matrix(60, 4, seed = 61L)
  private val y = {
    val b = DenseMatrix((1.0, -0.5), (0.0, 0.0), (2.0, 1.0), (0.0, 0.0))
    val noise = TestData.matrix(60, 2, seed = 62L) * 0.05
    x * b + noise
  }
  private val n = x.rows.toDouble

  test("alpha=0, unstandardized: each response column matches the ridge closed form") {
    val lambda = 0.2
    val fit = GroupElasticNet.fitPath(x, y, alpha = 0.0, Seq(lambda),
      standardize = false, standardizeResponse = false).fits.head
    val ridge = (x.t * x + diag(DenseVector.fill(4)(n * lambda))) \ (x.t * y)
    assert(breeze.linalg.max(breeze.numerics.abs(fit.b - ridge)) < 1e-6)
  }

  test("lambda=0 reproduces multiresponse OLS regardless of response standardization") {
    val ols = (x.t * x) \ (x.t * y)
    for (stdR <- Seq(true, false)) {
      val fit = GroupElasticNet.fitPath(x, y, alpha = 0.5, Seq(0.0),
        standardizeResponse = stdR).fits.head
      assert(breeze.linalg.max(breeze.numerics.abs(fit.b - ols)) < 1e-5, s"stdR=$stdR")
    }
  }

  test("group-KKT at an interior point (alpha=0.7, unstandardized)") {
    val alpha = 0.7
    val lambda = 0.15
    val fit = GroupElasticNet.fitPath(x, y, alpha, Seq(lambda),
      standardize = false, standardizeResponse = false).fits.head
    val r = y - x * fit.b
    for (j <- 0 until 4) {
      val u = DenseVector.tabulate(2)(c => (x(::, j) dot r(::, c)) / n)
      val bj = fit.b(j, ::).t
      if (norm(bj) == 0.0)
        assert(norm(u) <= lambda * alpha + 1e-8, s"inactive row $j")
      else {
        // u = λα·β_j/‖β_j‖ + λ(1−α)·β_j at the optimum.
        val expect = bj * (lambda * alpha / norm(bj) + lambda * (1 - alpha))
        assert(norm(u - expect) < 1e-6, s"active row $j")
      }
    }
  }

  test("alpha=1: joint row sparsity — a predictor is zero for all responses or none") {
    val fit = GroupElasticNet.fitPath(x, y, alpha = 1.0, Seq(0.3),
      standardize = false, standardizeResponse = false).fits.head
    for (j <- 0 until 4) {
      val rowNorms = (0 until 2).map(c => math.abs(fit.b(j, c)))
      assert(rowNorms.forall(_ == 0.0) || rowNorms.forall(_ > 0.0), s"row $j")
    }
    // The two true null predictors (rows 1 and 3) drop out jointly.
    assert(fit.b(1, 0) == 0.0 && fit.b(1, 1) == 0.0)
    assert(fit.b(3, 0) == 0.0 && fit.b(3, 1) == 0.0)
  }

  test("M7 VAR wrapper: CV selects a lambda, forecasts run, residuals bounded") {
    val g = new TestData.Lcg(63L)
    val a = DenseMatrix((0.5, 0.1), (-0.2, 0.3))
    val t = 70
    val y = DenseMatrix.zeros[Double](t, 2)
    y(0, ::) := DenseVector(0.4, -0.3).t
    for (i <- 1 until t) {
      val base = a * y(i - 1, ::).t
      y(i, ::) := DenseVector(base(0) + 0.05 * g.gaussian(), base(1) + 0.05 * g.gaussian()).t
    }
    val model = GroupEnetVar.fit(y, p = 1, IndexedSeq("u", "v"), alpha = 0.4)
    assert(model.lambdaMin > 0)
    val fc = model.forecast(4)
    assert(fc.rows == 4 && fc.cols == 2)
    assert(!fc.toArray.exists(_.isNaN))
    // Residual scale ~ noise scale (loose bound: CV shrinkage adds bias).
    val rmse = math.sqrt(breeze.linalg.sum(model.residuals *:* model.residuals) /
      (model.residuals.rows * 2.0))
    assert(rmse < 0.2)
  }
}
