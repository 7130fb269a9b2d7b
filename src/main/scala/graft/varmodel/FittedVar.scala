package graft.varmodel

import breeze.linalg.DenseMatrix

/** Common surface of a fitted VAR — what the experiment layer consumes
  * regardless of estimator (per-equation elastic net M3 vs joint group
  * mgaussian M7): the k×K coefficient matrix in the reference layout, the
  * recursive n-ahead forecast (M5), and the in-sample residuals (M6).
  */
trait FittedVar {
  def coefMatrix: DenseMatrix[Double]
  def forecast(nAhead: Int): DenseMatrix[Double]
  def residuals: DenseMatrix[Double]
}
