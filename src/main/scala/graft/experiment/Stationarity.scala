package graft.experiment

import breeze.linalg.DenseVector
import graft.stats.Adf
import scala.collection.immutable.ListMap

/** Iterative stationarity repair — SURVEY §2.7 T2; reference Main.R:64-92.
  *
  * Loop: ADF-test every working column; for each non-stationary one,
  *  - if it is a currency-unit series (name in `currencyNames`, consumed
  *    once like the reference's shrinking `curr_var_names_all`) AND its
  *    monthly levels are strictly positive → replace the column with the
  *    quarterly aggregation of monthly LOG-differences;
  *  - otherwise → second-difference the working column in place (na.pad:
  *    a leading NaN keeps row alignment);
  * then re-test, until no column fails or `maxIter` is hit (the reference
  * loops unboundedly; Testing.R:87-91 adds the convergence break this
  * implementation always has).
  *
  * Emits the transform LEDGER the reference only keeps in ad-hoc vectors
  * (`curr_var_names_inf` / `non_stat_diff_inf`): one row per applied
  * transform, (column, transform, iteration) — the auditable artifact a
  * pipeline at scale needs to replay ingest deterministically.
  *
  * NaN is the NA marker: ADF runs on the NaN-stripped prefix exactly like
  * the reference's `na.omit`.
  */
object Stationarity {

  final case class LedgerEntry(column: String, transform: String, iteration: Int)

  final case class Repaired(
      columns: ListMap[String, DenseVector[Double]],
      ledger: Seq[LedgerEntry],
      converged: Boolean)

  private def dropNaN(v: DenseVector[Double]): DenseVector[Double] =
    DenseVector(v.toArray.filter(!_.isNaN))

  /** Second difference with na.pad semantics: out(0) = NaN. */
  private def diffPadded(v: DenseVector[Double]): DenseVector[Double] =
    DenseVector.tabulate(v.length)(i => if (i == 0) Double.NaN else v(i) - v(i - 1))

  /** @param quarterly        working quarterly columns (diffed panel)
    * @param logDiffQuarterly provider of the log-diff replacement for a
    *                         column: Some(quarterly aggregation of monthly
    *                         log-diffs) when the monthly levels are all
    *                         positive, None otherwise (reference's
    *                         `all(na.omit(x)>0)` gate, Main.R:72)
    * @param currencyNames    currency-unit series (FIXTURES.md §1.3)
    */
  def repair(
      quarterly: ListMap[String, DenseVector[Double]],
      logDiffQuarterly: String => Option[DenseVector[Double]],
      currencyNames: Set[String],
      crit: Double = 0.01,
      maxIter: Int = 10): Repaired = {
    var work = quarterly
    var currencyPool = currencyNames
    val ledger = Seq.newBuilder[LedgerEntry]
    var iter = 0
    var nonStat = Adf.nonStationary(
      work.toSeq.map { case (n, v) => n -> dropNaN(v) }, crit)

    while (nonStat.nonEmpty && iter < maxIter) {
      iter += 1
      for (name <- nonStat) {
        val asLogDiff =
          if (currencyPool.contains(name)) {
            currencyPool -= name // consumed once, like the reference
            logDiffQuarterly(name)
          } else None
        asLogDiff match {
          case Some(replacement) =>
            work = work.updated(name, replacement)
            ledger += LedgerEntry(name, "logdiff", iter)
          case None =>
            work = work.updated(name, diffPadded(work(name)))
            ledger += LedgerEntry(name, "diff2", iter)
        }
      }
      nonStat = Adf.nonStationary(
        work.toSeq.map { case (n, v) => n -> dropNaN(v) }, crit)
    }
    Repaired(work, ledger.result(), converged = nonStat.isEmpty)
  }
}
