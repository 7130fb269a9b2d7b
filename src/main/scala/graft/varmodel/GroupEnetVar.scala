package graft.varmodel

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.linalg.GroupElasticNet

/** Group (multiresponse) elastic-net VAR — SURVEY §2.6 M7; reference
  * `GroupEnetVAR`/coef/predict (enetVAR.R:344-421): one joint mgaussian
  * fit with blocked-fold CV instead of K per-equation fits, giving joint
  * row sparsity (a lag-variable is kept or dropped for ALL equations).
  * The coefficient layout and recursive forecast mirror EnetVarModel.
  */
final case class GroupEnetVarModel(
    design: VarDesign,
    alpha: Double,
    lambdaMin: Double,
    fit: GroupElasticNet.GroupFit) extends FittedVar {

  /** k×K coefficient matrix in the EnetVar layout (intercept row first
    * when present, carrying the fitted intercepts).
    */
  lazy val coefMatrix: DenseMatrix[Double] = {
    val b = DenseMatrix.zeros[Double](design.k, design.n)
    if (design.intercept) {
      b(0, ::) := fit.intercepts.t
      b(1 until design.k, ::) := fit.b(1 until design.k, ::)
    } else {
      b := fit.b
    }
    b
  }

  /** Recursive n-ahead forecast — same recursion as EnetVarModel (M5). */
  def forecast(nAhead: Int): DenseMatrix[Double] = {
    val p = design.p
    val n = design.n
    var history = design.yOrig
    val out = DenseMatrix.zeros[Double](nAhead, n)
    var step = 0
    while (step < nAhead) {
      val t = history.rows
      val zAhead = DenseVector.zeros[Double](design.k)
      var pos = 0
      if (design.intercept) { zAhead(0) = 1.0; pos = 1 }
      var i = 0
      while (i < p) {
        val row = history(t - 1 - i, ::).t
        var c = 0
        while (c < n) { zAhead(pos) = row(c); pos += 1; c += 1 }
        i += 1
      }
      val yAhead: DenseVector[Double] = coefMatrix.t * zAhead
      out(step, ::) := yAhead.t
      step += 1
      if (step < nAhead) history = DenseMatrix.vertcat(history, yAhead.toDenseMatrix)
    }
    out
  }

  lazy val residuals: DenseMatrix[Double] = design.yP - design.z * coefMatrix
}

object GroupEnetVar {

  /** Fit with blocked-fold CV λ selection (the reference's only mode —
    * enetVAR.R:353-362 always runs cv.glmnet).
    */
  def fit(
      y: DenseMatrix[Double],
      p: Int,
      names: IndexedSeq[String] = IndexedSeq.empty,
      alpha: Double = 0.4,
      intercept: Boolean = false,
      solverTol: Double = 1e-9): GroupEnetVarModel = {
    val design = VarDesign.build(y, p, names, intercept)
    val cv = GroupElasticNet.cvFitBlocked(design.z, design.yP, alpha, intercept,
      tol = solverTol)
    GroupEnetVarModel(design, alpha, cv.lambdaMin, cv.path.at(cv.lambdaMin))
  }
}
