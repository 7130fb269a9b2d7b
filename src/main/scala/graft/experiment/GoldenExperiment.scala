package graft.experiment

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.ingest.PanelIngest
import graft.stats.Adf
import org.apache.spark.sql.SparkSession
import scala.collection.immutable.ListMap

/** End-to-end reproduction of the reference's OOS experiment on the REAL
  * dataset (Main.R data prep + Testing.R:214-243 golden runs): ingest →
  * quarterly diffs → iterative stationarity repair → end_var merge →
  * hardcoded 30-variable ezlasso set (Testing.R:215-218) → na.omit →
  * `modeltrain(lag, alpha, const=TRUE)` with per-equation blocked-CV λ,
  * per-origin refits distributed over Spark.
  *
  * Prints the per-horizon MSFEs and their sum next to the recorded golden
  * values (BASELINE.md): lag=5/α=0.4 → 0.00907175092168175, lag=1 →
  * 0.0107635485836803, lag=5/α=0.5 → 0.009076151. Exact agreement is not
  * expected — the reference's numbers come from glmnet's Fortran solver
  * and R's ADF borderline calls — but the figure should land in the same
  * neighborhood; the gap is reported, not hidden.
  *
  * Usage: runMain graft.experiment.GoldenExperiment [lag] [alpha]
  */
object GoldenExperiment {

  /** Testing.R:215-218 — the hardcoded 30-var ezlasso preselection. */
  val EzlassoAll: Seq[String] = Seq(
    "GDP", "DDURRG3M086SBEA", "DPCERA3M086SBEA", "W875RX1", "INDPRO",
    "IPFINAL", "IPCONGD", "IPDCONGD", "IPNCONGD", "IPBUSEQ", "IPMAT",
    "IPDMAT", "IPNMAT", "IPFPNSS", "IPFUELN", "TCU", "MCUMFN", "CLF16OV",
    "CE16OV", "UNRATE", "UEMPMEAN", "UEMPLT5", "UEMP5TO14", "UEMP15OV",
    "UEMP15T26", "UEMP27OV", "PAYEMS", "USPRIV", "CES1021000001", "FEDFUNDS")

  /** Diagnostic access for CvProbe. */
  def quarterSumsForProbe(diffs: Array[Double]): DenseVector[Double] = quarterSums(diffs)

  /** Quarter sum of a monthly diff series with R NA semantics (A1): the
    * first quarter is dropped, a quarter with any NaN diff is NaN.
    */
  private def quarterSums(diffs: Array[Double]): DenseVector[Double] = {
    // diffs(i) = value for month i (i=0 is 1959-01, diff = NaN).
    val nQ = diffs.length / 3
    val out = DenseVector.zeros[Double](nQ - 1)
    var q = 1
    while (q < nQ) {
      var s = 0.0
      var ok = true
      var m = 3 * q
      while (m < 3 * q + 3) {
        if (diffs(m).isNaN) ok = false else s += diffs(m)
        m += 1
      }
      out(q - 1) = if (ok) s else Double.NaN
      q += 1
    }
    out
  }

  /** The prepared golden panel: the 230×30 na.omit'ed ezlasso design and
    * the start.pred row (2000 Q1).
    */
  final case class Panel(y: DenseMatrix[Double], startPredIdx: Int)

  def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Repaired columns + GDP log-diffs — the prep state that does NOT
    * depend on the model's column set, so multi-model workloads run it
    * once.
    */
  final case class Prepared(
      gdpLd: DenseVector[Double],
      repaired: ListMap[String, DenseVector[Double]],
      ledger: Seq[Stationarity.LedgerEntry])

  /** na.omit over `panelCols` of the prepared frame → the model panel and
    * its start.pred row.
    */
  def assemble(prep: Prepared, panelCols: Seq[String]): Panel = {
    // Column 0 is REPLACED by the GDP log-diff series (the reference's
    // end_var layout): the caller must actually mean that.
    require(panelCols.headOption.contains("GDP"),
      s"panelCols must start with GDP (column 0 carries the GDP log-diffs), got ${panelCols.headOption}")
    val cols: IndexedSeq[DenseVector[Double]] =
      prep.gdpLd +: panelCols.drop(1).map(prep.repaired(_)).toIndexedSeq
    val tQ = prep.gdpLd.length
    require(cols.forall(_.length == tQ), "quarter alignment broke")
    val keep = (0 until tQ).filter(r => cols.forall(c => !c(r).isNaN))
    val y = DenseMatrix.tabulate(keep.length, cols.length)((r, c) => cols(c)(keep(r)))
    val startUnfiltered = (2000 - 1959) * 4 + 0 - 1 // 1959Q2-based offset of 2000Q1
    val startPredIdx = keep.indexWhere(_ >= startUnfiltered)
    Panel(y, startPredIdx)
  }

  /** Testing.R's data prep on the real converted dataset, through repair
    * and the na.omit over `cols` — shared by the golden experiment, the
    * tuned run, and the econ.vars variants (Testing.R:214-243 all start
    * from this frame with different column sets).
    */
  def buildPanel(spark: SparkSession, panelCols: Seq[String] = EzlassoAll): Panel = {
    val prep = prepare(spark)
    val ez = panelCols.toSet
    val ezLedger = prep.ledger.filter(e => ez.contains(e.column))
    println(s"[golden]   panel-relevant transforms: " +
      (if (ezLedger.isEmpty) "none"
       else ezLedger.map(e => s"${e.column}:${e.transform}@${e.iteration}").mkString(", ")))
    val panel = assemble(prep, panelCols)
    println(s"[golden] panel after na.omit: ${panel.y.rows}×${panel.y.cols}, " +
      s"start.pred row=${panel.startPredIdx} (golden layout: 163 of 231)")
    panel
  }

  /** Column-set-independent half of buildPanel: ingest, quarterly diffs,
    * Testing.R-variant repair, GDP log-diffs — run ONCE per session for
    * multi-model workloads.
    *
    * @param exclude series dropped from the working set BEFORE repair —
    *                Main.R:93's own "NONBORRES should probably be exluded"
    *                note; exclusion can change OTHER columns' transforms
    *                because the repair loop's iteration count and stuck
    *                condition depend on the whole non-stationary set.
    */
  def prepare(spark: SparkSession, exclude: Set[String] = Set.empty): Prepared = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PANEL_DIR", "data/panel")
    // Collect the monthly panel column-wise (696×146 — P9 dematerialize).
    val monthlyDf = PanelIngest.loadMonthly(spark, s"$dir/monthly_panel.parquet")
      .orderBy("date")
    val mRows = monthlyDf.collect()
    val monthly: Map[String, Array[Double]] = PanelIngest.seriesNames.zipWithIndex
      .collect { case (n, j) if !exclude.contains(n) =>
        n -> mRows.map(r => if (r.isNullAt(j + 1)) Double.NaN else r.getDouble(j + 1))
      }.toMap
    val names = PanelIngest.seriesNames.filterNot(exclude.contains)

    // W1+A1: quarterly sums of monthly first differences.
    def diffs(xs: Array[Double]): Array[Double] =
      Array.tabulate(xs.length)(i => if (i == 0) Double.NaN else xs(i) - xs(i - 1))
    val quarterly = ListMap.from(names.map { n =>
      n -> quarterSums(diffs(monthly(n)))
    })

    // T2 repair: currency + all-positive columns replace with quarterly
    // log-diffs; others second-difference (Main.R:64-92).
    def logDiffQuarterly(name: String): Option[DenseVector[Double]] = {
      val lv = monthly(name)
      if (lv.filterNot(_.isNaN).forall(_ > 0.0))
        Some(quarterSums(Array.tabulate(lv.length)(i =>
          if (i == 0) Double.NaN else math.log(lv(i)) - math.log(lv(i - 1)))))
      else None
    }
    // TESTING.R's repair variant, not Main.R's — the recorded goldens come
    // from Testing.R:43-96: adf lag fixed at 7, crit 0.05 inclusive, the
    // two-range currency pool, currency names never consumed (its pool-
    // depletion line is a no-op), loop breaks when stuck.
    val t0 = System.nanoTime()
    val repaired = Stationarity.repair(
      quarterly, logDiffQuarterly, PanelIngest.currencyNamesTesting.toSet,
      crit = 0.05, adfK = 7, gteCrit = true, consumeCurrency = false)
    println(f"[golden] repair: converged=${repaired.converged} " +
      f"transforms=${repaired.ledger.size} (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    repaired.ledger.groupBy(_.transform).foreach { case (t, es) =>
      println(s"[golden]   $t: ${es.map(_.column).distinct.size} columns")
    }

    // GDP log-diffs (232 → 231 quarters, aligned 1959Q2..2016Q4).
    val gdpLevels = PanelIngest.loadGdp(spark, s"$dir/gdp_quarterly.parquet")
      .orderBy("date").collect().map(_.getDouble(1))
    val gdpLd = DenseVector.tabulate(gdpLevels.length - 1)(i =>
      math.log(gdpLevels(i + 1)) - math.log(gdpLevels(i)))
    Prepared(gdpLd, repaired.columns, repaired.ledger)
  }

  /** Testing.R:254 — the 3-variable econ.vars.2 set of the 0.01482406
    * golden (`modeltrain(testing1.sample, alpha=0.95, lag=4, const=TRUE)`).
    */
  val EconVars2: Seq[String] = Seq("GDP", "FEDFUNDS", "CPIAUCSL")

  /** Usage: runMain graft.experiment.GoldenExperiment [lag] [alpha] [tol] [colset] [method] [cvmode]
    * colset ∈ {ezlasso, econ2}; method ∈ {enet, genet}; cvmode ∈ {master
    * (one λ grid for all folds), index, lambda (per-fold glmnet auto paths,
    * aligned by path position / by λ value — see BlockedCv.cvFitDesigns)}.
    */
  def main(args: Array[String]): Unit = {
    val lag = if (args.nonEmpty) args(0).toInt else 5
    val alpha = if (args.length > 1) args(1).toDouble else 0.4
    val tol = if (args.length > 2) args(2).toDouble
              else graft.linalg.BlockedCv.GlmnetEquivTol
    val panelCols = if (args.length > 3 && args(3) == "econ2") EconVars2 else EzlassoAll
    val method = if (args.length > 4) args(4) else "enet"
    val cvFoldPaths = if (args.length > 5 && args(5) != "master") Some(args(5)) else None
    val spark = buildSession()
    val panel = buildPanel(spark, panelCols)
    val y = panel.y
    val startPredIdx = panel.startPredIdx

    val t1 = System.nanoTime()
    val res = ModelTrain.run(y, panelCols.toIndexedSeq, startPredIdx,
      h = 8, alphas = Seq(alpha), lambdas = Seq.empty, lag = lag,
      const = true, spark = Some(spark), solverTol = tol, method = method,
      cvFoldPaths = cvFoldPaths)
    val wall = (System.nanoTime() - t1) / 1e9
    val msfes = Seq(1, 2, 4, 8).map(h => h -> res.byHorizon(h).msfe)
    val total = msfes.map(_._2).sum
    msfes.foreach { case (h, m) => println(f"[golden] msfe h$h%d = $m%.12f") }
    println(f"[golden] MSFE SUM = $total%.12f  (lag=$lag alpha=$alpha, $wall%.0f s)")
    // The reference's recorded "mse sum" comments are the RAW squared-error
    // sums u_1 (Σ_h Σ_origins e², enetVAR.R:475-478) — i.e. msfe × h.ind.len
    // summed over horizons; report both normalizations.
    val hLen = res.byHorizon(1).errors.length
    println(f"[golden] RAW ERR SUM (msfe × $hLen, summed) = ${total * hLen}%.12f")
    println("[golden] reference goldens: lag5/a0.4 CV = 0.00907175092168175 | " +
      "lag1 = 0.0107635485836803 | lag5/a0.5 = 0.009076151")
    Seq(1, 2, 4, 8).foreach { h =>
      println(f"[golden] theils_u_rw h$h = ${res.byHorizon(h).theilsURw}%.6f " +
        f"theils_u_ar1 h$h = ${res.byHorizon(h).theilsUAr1}%.6f")
    }
    // The reference's final self-check (Main.R:304): Hosking portmanteau on
    // the last fitted model's residuals, order = the VAR lag order.
    graft.stats.Portmanteau.hosking(res.residuals, order = lag).foreach { r =>
      println(f"[golden] hosking m=${r.lag}%2d Q=${r.statistic}%.2f " +
        f"df=${r.df}%.0f p=${r.pValue}%.4f")
    }
    spark.stop()
  }
}
