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
  * (readme.txt:31,39). Here a TASK is (equation, origin, α) — one
  * warm-started λ-path fit scoring ALL λs in a single pass (glmnet's
  * trick), so the task count is 19·origins·K instead of 3800·origins·K —
  * and tasks are farmed with `spark.parallelize` over a broadcast design.
  * Per-(α, λ) RMSE sums are reduced on the executors (reduceByKey — only
  * K·19·|λ| aggregates reach the driver, never per-origin rows).
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

  def tune(
      y: DenseMatrix[Double],
      p: Int,
      initWindow: Int,
      horizon: Int,
      grid: Grid,
      names: IndexedSeq[String] = IndexedSeq.empty,
      spark: Option[SparkSession] = None): IndexedSeq[Best] = {
    val design = VarDesign.build(y, p, names, intercept = false)
    val t = design.tReduced
    require(initWindow < t - horizon + 1, s"initWindow=$initWindow too large for T=$t")
    val origins = (initWindow to (t - horizon)).toIndexedSeq
    val lambdas = grid.lambdas.sortBy(-_).toIndexedSeq

    // One task = (equation, origin, alpha): fit the whole λ path on the
    // prefix, score the horizon block, emit per-λ RMSE.
    val tasks = for {
      j <- 0 until design.n
      o <- origins
      a <- grid.alphas
    } yield (j, o, a)

    def runTask(z: DenseMatrix[Double], yp: DenseMatrix[Double])(
        task: (Int, Int, Double)): ((Int, Double, Int), Array[Double]) = {
      val (j, o, a) = task
      val zTrain = z(0 until o, ::).toDenseMatrix
      val yTrain = yp(0 until o, j).toDenseVector
      val path = ElasticNet.fitPath(zTrain, yTrain, a, lambdas,
        intercept = false, standardize = true)
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
        val slices = math.min(tasks.length, s.sparkContext.defaultParallelism * 4)
        val collected = s.sparkContext.parallelize(tasks, slices)
          .map { task =>
            val (za, zr, zc, ya, yr, yc) = bc.value
            runTask(new DenseMatrix(zr, zc, za), new DenseMatrix(yr, yc, ya))(task)
          }
          .collect().toSeq
        bc.destroy()
        collected
      case None =>
        tasks.map(runTask(design.z, design.yP))
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
