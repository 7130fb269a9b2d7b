package graft.tune

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.linalg.ElasticNet
import graft.varmodel.VarDesign
import org.apache.spark.sql.SparkSession

/** Rolling-origin hyperparameter tuning — SURVEY §2.6 M15; reference
  * `enetVARtune` (enetVAR.R:538-565), caret `trainControl(method =
  * "timeSlice", initialWindow, horizon, fixedWindow = FALSE)`.
  *
  * Resampling semantics ported exactly: the design matrix is built ONCE on
  * the full series (enetVAR.R:542-544); resample t ∈ {initWindow .. T−h}
  * trains on design rows 1..t and scores rows t+1..t+h; a grid point's
  * score is the MEAN over resamples of the per-resample RMSE (caret's
  * "best" selection on RMSE); per equation, the winner is the (α, λ) with
  * the lowest mean RMSE.
  *
  * This is the engine's flagship distributed workload (SURVEY §3.3): the
  * reference burns hours fitting grid × origins × equations sequentially
  * (readme.txt:31,39). Here a TASK is one ORIGIN: it builds the origin's
  * prefix CovDesign (standardization + lazily-cached Gram rows) ONCE and
  * fits all K·19 warm-started λ paths on it, each path scoring ALL λs in a
  * single pass (glmnet's trick) — so the heavy per-fit work is shared
  * K·19-fold within a task, and tasks are farmed with `spark.parallelize`
  * over a broadcast design. Per-origin RMSE arrays return to the driver
  * (tasks × |λ| doubles, ~11 MB at the full 19×200 grid) and are folded
  * there in origin order — deliberately NOT reduceByKey, which would sum
  * doubles in shuffle-arrival order and drift a ulp from the sequential
  * path (SparkParitySpec pins exact distributed==sequential parity).
  */
object RollingOriginTuner {

  final case class Best(equation: Int, alpha: Double, lambda: Double, meanRmse: Double)

  final case class Grid(alphas: Seq[Double], lambdas: Seq[Double])

  /** The reference's caret grid: α ∈ .05..(.95) step .05, λ = 10^seq(1, −4,
    * length 200) (enetVAR.R:556-557). Descending λ for warm starts.
    */
  def referenceGrid(nLambda: Int = 200): Grid = Grid(
    (1 to 19).map(_ * 0.05),
    (0 until nLambda).map(i => math.pow(10.0, 1.0 - 5.0 * i / (nLambda - 1))))

  /** @param tol solver stopping level per λ step — the tight default suits
    *             parity tests; pass [[graft.linalg.BlockedCv.GlmnetEquivTol]]
    *             for reference-grid runs (caret's glmnet fits run at
    *             thresh 1e-7, and the 200-λ grid reaches λ=1e-4 where
    *             tighter tolerances grind on collinear designs).
    */
  def tune(
      y: DenseMatrix[Double],
      p: Int,
      initWindow: Int,
      horizon: Int,
      grid: Grid,
      names: IndexedSeq[String] = IndexedSeq.empty,
      spark: Option[SparkSession] = None,
      tol: Double = 1e-9): IndexedSeq[Best] = {
    val design = VarDesign.build(y, p, names, intercept = false)
    val t = design.tReduced
    require(initWindow < t - horizon + 1, s"initWindow=$initWindow too large for T=$t")
    val origins = (initWindow to (t - horizon)).toIndexedSeq
    val lambdas = grid.lambdas.sortBy(-_).toIndexedSeq

    // One task = one ORIGIN: build the prefix CovDesign once, fit all
    // (equation, α) λ paths on it (Gram rows and standardization shared
    // K·|α|-fold), score the horizon block, emit per-λ RMSE per key.
    def runOrigin(z: DenseMatrix[Double], yp: DenseMatrix[Double])(
        o: Int): Seq[((Int, Double, Int), Array[Double])] = {
      val cov = new graft.linalg.CovDesign(
        z(0 until o, ::).toDenseMatrix, intercept = false, standardize = true)
      for {
        j <- 0 until design.n
        a <- grid.alphas
      } yield {
        val yTrain = yp(0 until o, j).toDenseVector
        val path = ElasticNet.fitPathCov(cov, yTrain, a, lambdas, tol = tol)
        val rmse = path.fits.map { fit =>
          var sse = 0.0
          var r = o
          while (r < o + horizon) {
            val e = yp(r, j) - (z(r, ::).t dot fit.beta)
            sse += e * e
            r += 1
          }
          math.sqrt(sse / horizon)
        }.toArray
        ((j, a, o), rmse)
      }
    }

    // Per-origin results come back keyed and are folded in ORIGIN ORDER on
    // the driver: a reduceByKey would sum doubles in shuffle-arrival order
    // and the distributed result would drift a ulp from the sequential one
    // (SparkParitySpec pins exact parity). The driver-side payload is
    // tasks × |λ| doubles — ~11 MB even at the reference's full 19×200
    // grid — while the heavy path fits stay on the executors.
    val taskResults: Seq[((Int, Double, Int), Array[Double])] = spark match {
      case Some(s) =>
        val bc = s.sparkContext.broadcast(
          (design.z.toArray, design.z.rows, design.z.cols,
            design.yP.toArray, design.yP.rows, design.yP.cols))
        val slices = math.min(origins.length, s.sparkContext.defaultParallelism * 4)
        val collected = s.sparkContext.parallelize(origins, slices)
          .flatMap { o =>
            val (za, zr, zc, ya, yr, yc) = bc.value
            runOrigin(new DenseMatrix(zr, zc, za), new DenseMatrix(yr, yc, ya))(o)
          }
          .collect().toSeq
        bc.destroy()
        collected
      case None =>
        origins.flatMap(runOrigin(design.z, design.yP))
    }
    val perAlpha: Map[(Int, Double), Array[Double]] = taskResults
      .groupBy { case ((j, a, _), _) => (j, a) }
      .view.mapValues { group =>
        group.sortBy(_._1._3).map(_._2).reduce { (x, y) =>
          x.zip(y).map { case (u, v) => u + v }
        }
      }.toMap

    val nOrigins = origins.length.toDouble
    (0 until design.n).map { j =>
      val candidates = for {
        a <- grid.alphas
        sums = perAlpha((j, a))
        li <- lambdas.indices
      } yield (a, lambdas(li), sums(li) / nOrigins)
      val (a, l, r) = candidates.minBy(_._3)
      Best(j, a, l, r)
    }
  }
}
