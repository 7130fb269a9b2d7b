package graft.experiment

import breeze.linalg.{DenseMatrix, DenseVector}

/** AR(1) benchmark over the expanding-window OOS loop — SURVEY §2.6 M16;
  * reference `ar1_train` (enetVAR.R:568-609).
  *
  * Estimation note (SURVEY §7 hard-part 5): the reference calls R
  * `arima(order=c(1,0,0), method="CSS-ML")`; this implementation uses the
  * conditional-least-squares AR(1) — OLS of y_t on y_{t−1} (plus mean when
  * `const`) — which differs from exact ML by O(1/T). Golden tolerances at
  * the experiment level absorb the difference; the OOS bookkeeping
  * (origins, horizon alignment, zero-padding) is ported exactly.
  */
object Ar1Train {

  final case class HorizonMetrics(
      forecasts: DenseVector[Double],
      errors: DenseVector[Double],
      msfe: Double)

  final case class Result(byHorizon: Map[Int, HorizonMetrics])

  /** CSS AR(1): returns (mean, phi). const=false pins the mean at 0. */
  def fitAr1(y: DenseVector[Double], const: Boolean): (Double, Double) = {
    val t = y.length
    val y0 = y(0 until t - 1)
    val y1 = y(1 until t)
    if (const) {
      val n = (t - 1).toDouble
      val mx = breeze.linalg.sum(y0) / n
      val my = breeze.linalg.sum(y1) / n
      val cov = (y0 dot y1) / n - mx * my
      val v = (y0 dot y0) / n - mx * mx
      val phi = cov / v
      // Intercept c with y_t = c + phi y_{t−1}; stationary mean = c/(1−phi).
      val c = my - phi * mx
      (c / (1 - phi), phi)
    } else {
      (0.0, (y0 dot y1) / (y0 dot y0))
    }
  }

  /** h-step forecasts from the last observation: μ + φ^k (y_T − μ). */
  def forecastAr1(mean: Double, phi: Double, last: Double, h: Int): DenseVector[Double] =
    DenseVector.tabulate(h)(k => mean + math.pow(phi, k + 1) * (last - mean))

  /** The reference's OOS loop for the AR(1) benchmark.
    *
    * @param y            full univariate series (reference passes
    *                     `na.omit(data[,1])`)
    * @param startPredIdx 0-based index of the first prediction-period date
    *                     (R's `which(dates==start.pred)` − 1)
    */
  def run(
      y: DenseVector[Double],
      startPredIdx: Int,
      step: Int = 1,
      h: Int = 8,
      const: Boolean = false): Result = {
    val n = y.length
    val windowSize = startPredIdx + 1 - h // R 1-based window.size
    require(windowSize >= 3, s"start.pred index too early: $startPredIdx")
    val predInd = OosAlign.predInd(h)
    val origins = windowSize to (n - 1) by step // prefix lengths (R's i)

    val errCols = Array.newBuilder[Array[Double]]
    val fcCols = Array.newBuilder[Array[Double]]
    for (i <- origins) {
      val train = y(0 until i)
      val (mu, phi) = fitAr1(train, const)
      val fc = forecastAr1(mu, phi, train(i - 1), h)
      val pred = predInd.map(pi => fc(pi - 1))
      val trueVals = OosAlign.zeroPadded(y, i, predInd)
      fcCols += pred.toArray
      errCols += predInd.indices.map(r => pred(r) - trueVals(r)).toArray
    }
    Result(OosAlign.horizonMetrics(h, predInd, fcCols.result(), errCols.result()))
  }
}
