package graft

import breeze.linalg.DenseMatrix
import graft.experiment.ModelTrain
import graft.tune.{RollingOriginTuner, Selection}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-vs-local parity: the Spark-distributed fan-outs (per-origin
  * refits, grid tasks, candidate sweeps) must produce byte-identical
  * results to the sequential path — broadcast reconstruction and
  * reduce ordering must not change the numbers.
  */
class SparkParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def panel(t: Int, seed: Long): DenseMatrix[Double] = {
    val g = new TestData.Lcg(seed)
    val y = DenseMatrix.zeros[Double](t, 2)
    var a = 0.0
    var b = 0.0
    for (i <- 0 until t) {
      a = 0.5 * a + 0.1 * b + 0.3 * g.gaussian()
      b = 0.3 * b - 0.2 * a + 0.3 * g.gaussian()
      y(i, 0) = a
      y(i, 1) = b
    }
    y
  }

  test("M17 modeltrain: Spark-distributed origins == sequential loop, exactly") {
    val y = panel(80, seed = 41L)
    val names = IndexedSeq("a", "b")
    val local = ModelTrain.run(y, names, startPredIdx = 60, lambdas = Seq(0.0))
    val dist = ModelTrain.run(y, names, startPredIdx = 60, lambdas = Seq(0.0),
      spark = Some(spark))
    for (h <- Seq(1, 2, 4, 8)) {
      assert(local.byHorizon(h).msfe == dist.byHorizon(h).msfe, s"h=$h msfe")
      assert(local.byHorizon(h).errors == dist.byHorizon(h).errors, s"h=$h errors")
      assert(local.byHorizon(h).theilsURw == dist.byHorizon(h).theilsURw)
      assert(local.byHorizon(h).theilsUAr1 == dist.byHorizon(h).theilsUAr1)
    }
  }

  test("M15 tuner: Spark-distributed grid == sequential, exactly") {
    val y = panel(60, seed = 43L)
    val grid = RollingOriginTuner.Grid(
      Seq(0.2, 0.8), (0 until 10).map(i => math.pow(10.0, -4.0 * i / 9)))
    val local = RollingOriginTuner.tune(y, p = 1, initWindow = 30, horizon = 4,
      grid, IndexedSeq("a", "b"))
    val dist = RollingOriginTuner.tune(y, p = 1, initWindow = 30, horizon = 4,
      grid, IndexedSeq("a", "b"), spark = Some(spark))
    assert(local == dist)
    // The historical driver-side fold must stay bit-identical too: both
    // distributed paths sum in origin order, they just fold on different
    // hosts.
    val distDriverFold = RollingOriginTuner.tune(y, p = 1, initWindow = 30,
      horizon = 4, grid, IndexedSeq("a", "b"), spark = Some(spark),
      driverFold = true)
    assert(local == distDriverFold)
  }

  test("M3 EnetVar: Spark per-equation fits == sequential, exactly") {
    val y = panel(60, seed = 43L)
    for (lambdas <- Seq(Seq.empty[Double], Seq(0.05))) {
      val local = graft.varmodel.EnetVar.fit(y, p = 2,
        IndexedSeq("a", "b"), Seq(0.4), lambdas)
      val dist = graft.varmodel.EnetVar.fit(y, p = 2,
        IndexedSeq("a", "b"), Seq(0.4), lambdas, spark = Some(spark))
      assert(local.equations == dist.equations, s"lambdas=$lambdas")
    }
  }

  test("M10 preselection: Spark candidate sweep == sequential") {
    val g = new TestData.Lcg(45L)
    val base = panel(70, seed = 47L)
    val y = DenseMatrix.horzcat(base,
      DenseMatrix.tabulate(70, 1)((_, _) => g.gaussian()))
    val names = IndexedSeq("a", "b", "noise")
    val local = Selection.greedyIcPreselection(y, names, maxNrVar = 2)
    val dist = Selection.greedyIcPreselection(y, names, maxNrVar = 2,
      spark = Some(spark))
    assert(local == dist)
  }
}
