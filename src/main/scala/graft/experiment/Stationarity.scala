package graft.experiment

import breeze.linalg.DenseVector
import graft.stats.Adf
import scala.collection.immutable.ListMap

/** Iterative stationarity repair — SURVEY §2.7 T2; reference Main.R:64-92
  * and Testing.R:56-96 (two DIFFERENT variants — see below).
  *
  * Loop: ADF-test every working column; for each non-stationary one,
  *  - if it is a currency-unit series AND its monthly levels are strictly
  *    positive → replace the column with the quarterly aggregation of
  *    monthly LOG-differences;
  *  - otherwise → second-difference the working column in place (na.pad:
  *    a leading NaN keeps row alignment);
  * then re-test, until no column fails, the loop is STUCK, or `maxIter`.
  *
  * Variant knobs (the reference scripts disagree, and the recorded golden
  * MSFEs come from the Testing.R side):
  *  - Main.R:64-92 / enetVAR.R:761: adf default lag, crit 0.01 strict `>`,
  *    currency pool = three excel ranges, each currency name CONSUMED on
  *    first use (`curr_var_names_all[curr_var_names_all != i]`) so a
  *    still-non-stationary currency column falls to diff2 next round;
  *  - Testing.R:43-96: adf lag FIXED at 7, crit 0.05 inclusive `>=`,
  *    currency pool = two ranges only, and the pool-depletion line is a
  *    no-op (it filters the freshly-emptied local `curr_var_names`), so a
  *    stuck currency column is re-log-diffed (idempotently) forever and the
  *    loop BREAKS when the non-stationary set stops changing with no diff2
  *    applied (Testing.R:87-92) — i.e. it can exit UNCONVERGED.
  * `consumeCurrency = true` gives Main.R, `false` gives Testing.R; pass the
  * matching (crit, adfK, gteCrit, currency set) alongside.
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
      maxIter: Int = 10,
      adfK: Int = -1,
      gteCrit: Boolean = false,
      consumeCurrency: Boolean = true): Repaired = {
    var work = quarterly
    var currencyPool = currencyNames
    val ledger = Seq.newBuilder[LedgerEntry]
    var iter = 0
    def scan() = Adf.nonStationary(
      work.toSeq.map { case (n, v) => n -> dropNaN(v) }, crit, adfK, gteCrit)
    var nonStat = scan()
    var stuck = false

    while (nonStat.nonEmpty && !stuck && iter < maxIter) {
      iter += 1
      var diff2Applied = false
      for (name <- nonStat) {
        val asLogDiff =
          if (currencyPool.contains(name)) {
            if (consumeCurrency) currencyPool -= name
            logDiffQuarterly(name)
          } else None
        asLogDiff match {
          case Some(replacement) =>
            work = work.updated(name, replacement)
            ledger += LedgerEntry(name, "logdiff", iter)
          case None =>
            work = work.updated(name, diffPadded(work(name)))
            ledger += LedgerEntry(name, "diff2", iter)
            diff2Applied = true
        }
      }
      val next = scan()
      // Testing.R:87-92's escape: the non-stationary set did not change and
      // nothing was differenced this round — further rounds would only
      // re-apply idempotent log-diffs, so exit (possibly unconverged).
      stuck = !consumeCurrency && next == nonStat && !diff2Applied
      nonStat = next
    }
    Repaired(work, ledger.result(), converged = nonStat.isEmpty)
  }
}
