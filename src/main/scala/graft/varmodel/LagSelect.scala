package graft.varmodel

import breeze.linalg.DenseMatrix

/** Lag-order selection via information criteria — SURVEY §2.6 M9; reference
  * `enetVARselect` (enetVAR.R:204-232).
  *
  * Sequential driver loop over p = 1..maxLag (sequential BY DESIGN: the
  * early-stop rule depends on the running IC history, enetVAR.R:213-221):
  *  - stop when the current column has ≥3 `-Inf` criteria, or
  *  - when, for all four criteria, the last four values all exceed the
  *    running minimum (four consecutive non-improving lags).
  * Returns the per-criterion argmin lag (first index on ties, like R's
  * `which(min)`), plus the full IC table.
  *
  * Each iteration's fit is itself a K-equation CV fit that the experiment
  * layer can run as one Spark task; the loop stays on the driver because
  * its trip count is data-dependent and tiny (≤30).
  */
object LagSelect {

  final case class Selection(
      icLag: Map[String, Int],                     // criterion → chosen lag (1-based)
      icTable: IndexedSeq[InfCrit.Criteria]) {     // per-lag criteria, index 0 = lag 1
    def lags: IndexedSeq[Int] = icTable.indices.map(_ + 1)
  }

  private val CritNames = IndexedSeq("FPE", "AIC", "HQ", "SC")

  def select(
      y: DenseMatrix[Double],
      maxLag: Int = 30,
      alpha: Double = 0.25,
      intercept: Boolean = false,
      names: IndexedSeq[String] = IndexedSeq.empty,
      solverTol: Double = 1e-9,
      spark: Option[org.apache.spark.sql.SparkSession] = None): Selection = {
    val table = IndexedSeq.newBuilder[InfCrit.Criteria]
    var history = Vector.empty[InfCrit.Criteria]
    var p = 1
    var stop = false
    while (p <= maxLag && !stop) {
      // The p-loop stays sequential (the early-stop rule reads the IC
      // history) but each lag's K equation CVs fan out as Spark tasks.
      val model = EnetVar.fit(y, p, names, Seq(alpha), Seq.empty, intercept,
        solverTol, spark = spark)
      val ic = InfCrit(model)
      history :+= ic
      table += ic
      if (history.length > 3) {
        val cur = ic.toSeq
        if (cur.count(_.isNegInfinity) > 2) stop = true
        else {
          // Per criterion: last 4 values all strictly above the running min.
          val nonImproving = (0 until 4).count { i =>
            val series = history.map(_.toSeq(i))
            val minV = series.min
            series.takeRight(4).count(_ > minV) > 3
          }
          if (nonImproving == 4) stop = true
        }
      }
      p += 1
    }
    val tbl = table.result()
    val chosen = CritNames.zipWithIndex.map { case (name, i) =>
      val series = tbl.map(_.toSeq(i))
      name -> (series.indexOf(series.min) + 1)
    }.toMap
    Selection(chosen, tbl)
  }
}
