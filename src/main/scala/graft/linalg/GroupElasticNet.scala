package graft.linalg

import breeze.linalg.{norm, DenseMatrix, DenseVector, sum}

/** Multiresponse ("mgaussian") group elastic net — SURVEY §2.6 M7;
  * reference `GroupEnetVAR` (enetVAR.R:344-366), which delegates to
  * `cv.glmnet(family = "mgaussian", standardize.response = TRUE)`.
  *
  * Objective (glmnet's mgaussian parameterization): with B ∈ R^{p×K} and
  * β_j = row j (predictor j's coefficients across all K responses),
  *
  *   min  (1/2N)·‖Y − X·B‖²_F + λ·Σ_j [ α·‖β_j‖₂ + ((1−α)/2)·‖β_j‖₂² ]
  *
  * — the α part is a GROUP penalty: predictor j is in or out for all K
  * responses jointly (joint sparsity), which is what distinguishes M7 from
  * K independent M1 fits. No MLlib equivalent exists (SURVEY §7 hard-part
  * 1); solved here by block coordinate descent over predictor rows with
  * the group soft-threshold
  *
  *   β_j ← S_grp(u_j, λα) / (z_j + λ(1−α)),  S_grp(u, γ) = max(0, 1 − γ/‖u‖₂)·u,
  *   u_j = (1/N)·x_jᵀ·R_j (partial-residual correlation K-vector).
  *
  * `standardizeResponse` scales each response column by its population sd
  * before fitting and unscales the coefficients after (glmnet's
  * standardize.response) — the group norm then weighs responses equally.
  *
  * Scale posture: like M1, a task-local solver over broadcast designs; the
  * distributed axis is origins × grid, never the matrix.
  */
object GroupElasticNet {

  final case class GroupFit(lambda: Double, intercepts: DenseVector[Double], b: DenseMatrix[Double])

  final case class GroupPath(alpha: Double, fits: IndexedSeq[GroupFit]) {
    def lambdas: IndexedSeq[Double] = fits.map(_.lambda)
    def at(s: Double): GroupFit =
      fits.find(_.lambda == s).getOrElse {
        val ls = lambdas
        if (s >= ls.head) fits.head
        else if (s <= ls.last) fits.last
        else {
          val hi = ls.lastIndexWhere(_ >= s)
          val lo = hi + 1
          val w = (s - ls(lo)) / (ls(hi) - ls(lo))
          GroupFit(s,
            fits(hi).intercepts * w + fits(lo).intercepts * (1 - w),
            fits(hi).b * w + fits(lo).b * (1 - w))
        }
      }
  }

  private def colMoments(x: DenseVector[Double]): (Double, Double) = {
    val n = x.length.toDouble
    val m = sum(x) / n
    val v = (x dot x) / n - m * m
    (m, math.sqrt(math.max(v, 0.0)))
  }

  def fitPath(
      x: DenseMatrix[Double],
      y: DenseMatrix[Double],
      alpha: Double,
      lambdas: Seq[Double],
      intercept: Boolean = false,
      standardize: Boolean = true,
      standardizeResponse: Boolean = true,
      maxIter: Int = 2000,
      tol: Double = 1e-9): GroupPath = {
    val nRows = x.rows
    val p = x.cols
    val kk = y.cols
    val n = nRows.toDouble
    require(y.rows == nRows)

    val xw = x.copy
    val centers = DenseVector.zeros[Double](p)
    val scales = DenseVector.ones[Double](p)
    var j = 0
    while (j < p) {
      val cj = xw(::, j)
      val (m, sd) = colMoments(cj)
      if (intercept) { centers(j) = m; cj :-= m }
      if (standardize && sd > 0) { scales(j) = sd; cj :/= sd }
      j += 1
    }
    val yw = y.copy
    val yMeans = DenseVector.zeros[Double](kk)
    val yScales = DenseVector.ones[Double](kk)
    var c = 0
    while (c < kk) {
      val yc = yw(::, c)
      val (m, sd) = colMoments(yc)
      if (intercept) { yMeans(c) = m; yc :-= m }
      if (standardizeResponse && sd > 0) { yScales(c) = sd; yc :/= sd }
      c += 1
    }

    val z = DenseVector.tabulate(p)(j => (xw(::, j) dot xw(::, j)) / n)
    val ySdAvg = {
      var s = 0.0
      var c = 0
      while (c < kk) { val (_, sd) = colMoments(yw(::, c)); s += sd; c += 1 }
      math.max(s / kk, 1e-12)
    }
    val effTol = tol * ySdAvg

    // Hot loop on primitive arrays (same rationale as ElasticNet: Breeze
    // view/UFunc overhead dominates path fits). Column-major slices:
    // xw col j = xArr[j·nRows ..), resid col c = rArr[c·nRows ..).
    require(xw.offset == 0 && xw.majorStride == nRows, "xw must be dense col-major")
    val xArr = xw.data
    val rArr = yw.copy.data
    val zArr = z.data
    val b = DenseMatrix.zeros[Double](p, kk) // warm-started, scaled space
    val u = new Array[Double](kk)
    val fits = IndexedSeq.newBuilder[GroupFit]

    for (lambda <- lambdas) {
      val l1 = lambda * alpha
      val l2 = lambda * (1.0 - alpha)
      var iter = 0
      var delta = Double.MaxValue
      while (iter < maxIter && delta > effTol) {
        delta = 0.0
        var j = 0
        while (j < p) {
          val zj = zArr(j)
          if (zj > 0) {
            val base = j * nRows
            // u = (1/N)·xjᵀ(R + xj·bOldᵀ); ‖u‖ decides the group.
            var un2 = 0.0
            var c = 0
            while (c < kk) {
              var dotv = 0.0
              var i = 0
              val rBase = c * nRows
              while (i < nRows) { dotv += xArr(base + i) * rArr(rBase + i); i += 1 }
              u(c) = dotv / n + zj * b(j, c)
              un2 += u(c) * u(c)
              c += 1
            }
            val un = math.sqrt(un2)
            val shrink = if (un <= l1) 0.0 else (1.0 - l1 / un) / (zj + l2)
            var dn2 = 0.0
            c = 0
            while (c < kk) {
              val bNew = u(c) * shrink
              val diff = bNew - b(j, c)
              if (diff != 0.0) {
                var i = 0
                val rBase = c * nRows
                while (i < nRows) { rArr(rBase + i) -= xArr(base + i) * diff; i += 1 }
                b(j, c) = bNew
              }
              dn2 += diff * diff
              c += 1
            }
            val d = math.sqrt(dn2) * math.sqrt(zj)
            if (d > delta) delta = d
          }
          j += 1
        }
        iter += 1
      }
      // Unscale: β_orig(j,c) = β(j,c) · ysd_c / xsd_j.
      val bOrig = DenseMatrix.tabulate(p, kk)((j, c) => b(j, c) * yScales(c) / scales(j))
      val b0 = DenseVector.tabulate(kk)(c =>
        if (intercept) yMeans(c) - (centers dot bOrig(::, c)) else 0.0)
      fits += GroupFit(lambda, b0, bOrig)
    }
    GroupPath(alpha, fits.result())
  }

  /** λmax for the group problem: max_j ‖(1/N)·x̃_jᵀ·Ỹ‖₂ / max(α, 0.001). */
  def autoLambdaSequence(
      x: DenseMatrix[Double],
      y: DenseMatrix[Double],
      alpha: Double,
      nLambda: Int = 100): IndexedSeq[Double] = {
    val n = x.rows.toDouble
    val a = math.max(alpha, 0.001)
    var lmax = 0.0
    var j = 0
    while (j < x.cols) {
      val (m, sd) = colMoments(x(::, j))
      val xs = if (sd > 0) (x(::, j) - m) / sd else x(::, j) - m
      val u = DenseVector.tabulate(y.cols) { c =>
        val (mc, sdc) = colMoments(y(::, c))
        val ys = if (sdc > 0) (y(::, c) - mc) / sdc else y(::, c) - mc
        (xs dot ys) / n
      }
      val g = norm(u)
      if (g > lmax) lmax = g
      j += 1
    }
    lmax /= a
    if (lmax <= 0) lmax = 1e-3
    val eps = if (n > x.cols) 1e-4 else 1e-2
    (0 until nLambda).map(i =>
      math.exp(math.log(lmax) + (math.log(lmax * eps) - math.log(lmax)) * i / (nLambda - 1)))
  }

  final case class GroupCvResult(
      lambdas: IndexedSeq[Double],
      cvm: IndexedSeq[Double],
      lambdaMin: Double,
      path: GroupPath)

  /** Blocked-fold CV (M2 fold layout) for the group fit: pooled
    * multiresponse squared error per λ, argmin → lambda.min.
    */
  def cvFitBlocked(
      x: DenseMatrix[Double],
      y: DenseMatrix[Double],
      alpha: Double,
      intercept: Boolean = false,
      nLambda: Int = 100,
      tol: Double = 1e-9): GroupCvResult = {
    val n = x.rows
    val foldid = BlockedCv.foldIds(n)
    val lambdas = autoLambdaSequence(x, y, alpha, nLambda)
    val sqErr = Array.fill(lambdas.length)(0.0)
    for (f <- foldid.distinct.sorted) {
      val trainIdx = (0 until n).filter(foldid(_) != f)
      val testIdx = (0 until n).filter(foldid(_) == f)
      if (trainIdx.nonEmpty && testIdx.nonEmpty) {
        val path = fitPath(x(trainIdx, ::).toDenseMatrix, y(trainIdx, ::).toDenseMatrix,
          alpha, lambdas, intercept, tol = tol)
        var li = 0
        while (li < lambdas.length) {
          val fit = path.fits(li)
          for (i <- testIdx; c <- 0 until y.cols) {
            val pred = fit.intercepts(c) + (x(i, ::).t dot fit.b(::, c))
            val e = y(i, c) - pred
            sqErr(li) += e * e
          }
          li += 1
        }
      }
    }
    val cvm = sqErr.map(_ / (n * y.cols)).toIndexedSeq
    val best = cvm.zipWithIndex.minBy(_._1)._2
    GroupCvResult(lambdas, cvm, lambdas(best),
      fitPath(x, y, alpha, lambdas, intercept, tol = tol))
  }
}
