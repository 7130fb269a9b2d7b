package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.experiment.{Ar1Train, ModelTrain, OosAlign, Stationarity}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap

/** Tests for the OOS experiment layer (M16/M17/T2): AR(1) recovery,
  * modeltrain bookkeeping invariants (horizon windows, shared divisor,
  * RW-quirk), and the stationarity-repair loop with its transform ledger.
  */
class ExperimentSpec extends AnyFunSuite {

  test("OosAlign.predInd reproduces c(1,2,4,8) for h=8 and c(1,2) for h=2") {
    assert(OosAlign.predInd(8) == IndexedSeq(1, 2, 4, 8))
    assert(OosAlign.predInd(2) == IndexedSeq(1, 2))
  }

  test("CSS AR(1) recovers phi=0.7 within 0.05 (FIXTURES ar1_sim bound)") {
    val y = TestData.ar1Series(200, 0.7, seed = 123L)
    val (mu0, phi0) = Ar1Train.fitAr1(y, const = false)
    assert(mu0 == 0.0 && math.abs(phi0 - 0.7) < 0.05)
    val (_, phiC) = Ar1Train.fitAr1(y + 5.0, const = true)
    assert(math.abs(phiC - 0.7) < 0.05)
  }

  test("AR(1) forecast decays geometrically toward the mean") {
    val fc = Ar1Train.forecastAr1(mean = 2.0, phi = 0.5, last = 10.0, h = 3)
    assert(math.abs(fc(0) - 6.0) < 1e-12)  // 2 + .5·8
    assert(math.abs(fc(1) - 4.0) < 1e-12)
    assert(math.abs(fc(2) - 3.0) < 1e-12)
  }

  test("ar1_train OOS bookkeeping: window lengths share the h1 target range") {
    val y = TestData.ar1Series(120, 0.6, seed = 9L)
    val res = Ar1Train.run(y, startPredIdx = 80, h = 8)
    val lens = Seq(1, 2, 4, 8).map(res.byHorizon(_).errors.length).distinct
    assert(lens == Seq(120 - 1 - 80 + 8 - 8 + 1)) // n−1−windowSize+1 − h + 1
    assert(Seq(1, 2, 4, 8).forall(h => res.byHorizon(h).msfe > 0))
  }

  private def var1Panel(t: Int, noise: Double, seed: Long): DenseMatrix[Double] = {
    val a = DenseMatrix((0.5, 0.1), (-0.2, 0.3))
    val g = new TestData.Lcg(seed)
    val y = DenseMatrix.zeros[Double](t, 2)
    y(0, ::) := DenseVector(0.3, -0.2).t
    for (i <- 1 until t) {
      val base = a * y(i - 1, ::).t
      y(i, ::) := DenseVector(base(0) + noise * g.gaussian(), base(1) + noise * g.gaussian()).t
    }
    y
  }

  test("modeltrain: near-noiseless VAR(1) at lambda=0 forecasts almost perfectly at h=1") {
    val panel = var1Panel(80, noise = 1e-4, seed = 31L)
    val res = ModelTrain.run(panel, IndexedSeq("gdp", "x"), startPredIdx = 60,
      h = 8, alphas = Seq(0.4), lambdas = Seq(0.0), lag = 1)
    assert(res.byHorizon(1).msfe < 1e-6)
    // Theil's-U-vs-AR(1) identity: U_h = rmse_model,h / rmse_ar1,h with the
    // AR(1) benchmark run on the full first column (enetVAR.R:847-855).
    val ar1 = Ar1Train.run(panel(::, 0), startPredIdx = 60, h = 8, const = false)
    for (h <- Seq(1, 2, 4, 8))
      assert(math.abs(res.byHorizon(h).theilsUAr1 -
        math.sqrt(res.byHorizon(h).msfe) / math.sqrt(ar1.byHorizon(h).msfe)) < 1e-12)
    // Residuals of the last refit are near zero.
    assert(breeze.linalg.max(breeze.numerics.abs(res.residuals)) < 1e-2)
  }

  test("modeltrain residuals close the loop through the Hosking portmanteau (Main.R:304)") {
    // The reference ends its experiment with Hosking(resids, order = lag);
    // the statistic must be non-degenerate on real modeltrain residuals —
    // positive, finite, p in [0, 1] — and near-white VAR(1) residuals
    // should not be overwhelmingly rejected at small lags.
    val panel = var1Panel(90, noise = 0.3, seed = 35L)
    val res = ModelTrain.run(panel, IndexedSeq("a", "b"), startPredIdx = 70,
      lambdas = Seq(0.0), lag = 1)
    val rows = graft.stats.Portmanteau.hosking(res.residuals, lags = Seq(5, 10),
      order = 1)
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.statistic > 0 && java.lang.Double.isFinite(r.statistic))
      assert(r.df > 0)
      assert(r.pValue >= 0 && r.pValue <= 1)
    }
    assert(rows.head.pValue > 0.01, "white-ish VAR(1) residuals rejected at m=5")
  }

  test("modeltrain: RW quirk shifts Theil's U but leaves MSFE untouched") {
    val panel = var1Panel(90, noise = 0.3, seed = 33L)
    val qOn = ModelTrain.run(panel, IndexedSeq("a", "b"), startPredIdx = 70,
      lambdas = Seq(0.0), rwQuirkOffByOne = true)
    val qOff = ModelTrain.run(panel, IndexedSeq("a", "b"), startPredIdx = 70,
      lambdas = Seq(0.0), rwQuirkOffByOne = false)
    for (h <- Seq(1, 2, 4, 8)) {
      assert(qOn.byHorizon(h).msfe == qOff.byHorizon(h).msfe)
      assert(qOn.byHorizon(h).errors == qOff.byHorizon(h).errors)
    }
    assert(Seq(1, 2, 4, 8).exists(h =>
      qOn.byHorizon(h).theilsURw != qOff.byHorizon(h).theilsURw))
  }

  test("stationarity repair: diff2 route fixes a random walk, ledger records it") {
    val rw = TestData.randomWalk(180, seed = 77L)
    val ok = TestData.ar1Series(180, 0.5, seed = 78L)
    val cols = ListMap("walk" -> rw, "calm" -> ok)
    val res = Stationarity.repair(cols, _ => None, currencyNames = Set.empty, crit = 0.05)
    assert(res.converged)
    assert(res.ledger.nonEmpty && res.ledger.forall(_.column == "walk"))
    assert(res.ledger.head.transform == "diff2")
    // Repaired column keeps row alignment via a leading NaN per pass.
    assert(res.columns("walk")(0).isNaN)
    assert(res.columns("calm") == ok) // untouched
  }

  test("stationarity repair: currency route replaces with provided log-diff series") {
    val rw = TestData.randomWalk(180, seed = 79L)
    val replacement = TestData.ar1Series(180, 0.4, seed = 80L)
    val res = Stationarity.repair(
      ListMap("M1" -> rw),
      name => if (name == "M1") Some(replacement) else None,
      currencyNames = Set("M1"), crit = 0.05)
    assert(res.converged)
    assert(res.ledger == Seq(Stationarity.LedgerEntry("M1", "logdiff", 1)))
    assert(res.columns("M1") == replacement)
  }

  test("stationarity repair: currency name is consumed once, then falls back to diff2") {
    // Replacement is itself non-stationary → second pass must diff2 it.
    val rw = TestData.randomWalk(180, seed = 81L)
    val rw2 = TestData.randomWalk(180, seed = 82L)
    val res = Stationarity.repair(
      ListMap("M2" -> rw),
      name => Some(rw2),
      currencyNames = Set("M2"), crit = 0.05, maxIter = 6)
    assert(res.ledger.head == Stationarity.LedgerEntry("M2", "logdiff", 1))
    assert(res.ledger.exists(e => e.transform == "diff2" && e.iteration >= 2))
  }
}
