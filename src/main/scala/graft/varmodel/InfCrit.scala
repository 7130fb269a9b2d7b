package graft.varmodel

import breeze.linalg.{det, diag, trace, DenseMatrix, DenseVector}

/** Information criteria with elastic-net degrees of freedom — SURVEY §2.6
  * M8; reference `infCrit` (enetVAR.R:177-202).
  *
  * Σ̂ = U·Uᵀ/T from the model residuals; negative determinant (ill-
  * conditioned model) is clamped to 1000 exactly like the reference
  * (enetVAR.R:185-186). The effective dof follows Tibshirani–Taylor (2011):
  * with X = Z ⊗ I_K and active set A = support(vec of coefficients),
  *
  *   dof = tr( X_A (X_AᵀX_A + λ·(1−α)/2·I)⁻¹ X_Aᵀ )
  *       = tr( (G + λ·(1−α)/2·I)⁻¹ G ),  G = X_AᵀX_Aᵀ's gram —
  *
  * the trace-cycling form avoids materializing the (T·K)×(T·K) hat matrix.
  * λ is the mean per-equation selected λ (enetVAR.R:181).
  *
  * Vectorization order matches the reference exactly: coefficients are
  * grouped predictor-major (for Z column j: equations 1..K), the same order
  * kron(Z, I_K) produces — so the active-column subset lines up.
  *
  * Scale: everything here is driver/task-local small algebra (|A| ≤ k·K for
  * the reference's k ≤ ~750); it runs inside the per-(origin, lag) tasks of
  * the selection loops.
  */
object InfCrit {

  final case class Criteria(fpe: Double, aic: Double, hq: Double, sc: Double, dof: Double) {
    def toSeq: IndexedSeq[Double] = IndexedSeq(fpe, aic, hq, sc)
  }

  def apply(model: EnetVarModel): Criteria = {
    val design = model.design
    val t = design.tReduced.toDouble
    val kEq = design.n
    val lambda = model.meanLambda
    val alpha = model.alpha

    val u = model.residuals // (T−p)×K
    val sigma = (u.t * u) / t
    var detSigma = det(sigma)
    if (detSigma < 0) detSigma = 1000.0

    // Active set in predictor-major order: for Z col j, equations 1..K —
    // matching as.vector(t(coef)ᵀ layout) and kron(Z, I_K) columns.
    val b = model.coefMatrix // k×K
    val active = for {
      j <- 0 until design.k
      l <- 0 until kEq
      if b(j, l) != 0.0
    } yield j * kEq + l

    val dof =
      if (active.isEmpty) 0.0
      else {
        // G = X_AᵀX_A from ZᵀZ alone: column (j, l) of X = kron(Z, I_K)
        // is Z(:,j) ⊗ e_l, so G[(j,l),(j',l')] = (ZᵀZ)(j,j')·[l = l'] —
        // the explicit kron ((T−p)K × kK, ~1.3 GB of doubles at the
        // reference's 30-series lag-30 point, allocated once PER LAG in
        // the selection loop) is never needed; ZᵀZ is k×k.
        val ztz = design.z.t * design.z
        val m = active.length
        val g = DenseMatrix.tabulate(m, m) { (a, c) =>
          val ja = active(a) / kEq; val la = active(a) % kEq
          val jc = active(c) / kEq; val lc = active(c) % kEq
          if (la == lc) ztz(ja, jc) else 0.0
        }
        val ridge = g + diag(DenseVector.fill(m)(lambda * 0.5 * (1 - alpha)))
        trace(ridge \ g)
      }

    val fpe = (1 + dof / t) / (1 - dof / t) * detSigma
    val aic = math.log(detSigma) + 2.0 / t * dof
    val hq = math.log(detSigma) + 2.0 * math.log(math.log(t)) / t * dof
    val sc = math.log(detSigma) + math.log(t) / t * dof
    Criteria(fpe, aic, hq, sc, dof)
  }
}
