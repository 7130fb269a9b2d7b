package graft.experiment

import breeze.linalg.DenseVector
import graft.experiment.Ar1Train.HorizonMetrics

/** Shared OOS bookkeeping for the expanding-window experiments (M16/M17):
  * the reference's horizon-index alignment (W9, enetVAR.R:466-474) and its
  * zero-padding of short true-value windows (enetVAR.R:455-457) — the
  * padded entries never enter a selected metric window, but the padding is
  * preserved so intermediate matrices match the reference exactly.
  */
object OosAlign {

  /** pred.ind = c(1, 2, 4, 8, …): horizons recorded per origin
    * (enetVAR.R:437: `c(1, 2, 2*seq(2, h/2, by=2))`).
    */
  def predInd(h: Int): IndexedSeq[Int] =
    IndexedSeq(1, 2) ++ (2 to h / 2 by 2).map(_ * 2)

  /** true values at origin i (prefix length, R's `i`) for each horizon in
    * predInd, zero-padded to predInd.length past the end of the series.
    */
  def zeroPadded(y: DenseVector[Double], i: Int, predInd: IndexedSeq[Int]): IndexedSeq[Double] =
    predInd.map { pi =>
      val idx = i + pi - 1 // 0-based target index (R: dates[i + pred.ind])
      if (idx < y.length) y(idx) else 0.0
    }

  /** Horizon-aligned column windows (reference h1.ind..h8.ind): for horizon
    * hh over nCols origin columns, 0-based columns (h−hh)..(nCols−hh) — R's
    * 1-based (h−hh+1)..(n−hh+1) — so every horizon's metric covers the same
    * target-date range.
    */
  def horizonWindow(h: Int, hh: Int, nCols: Int): Range =
    (h - hh) to (nCols - hh)

  /** Assemble per-horizon forecast/error/MSFE records from the per-origin
    * column arrays (rows = predInd order).
    */
  def horizonMetrics(
      h: Int,
      predInd: IndexedSeq[Int],
      fcCols: Array[Array[Double]],
      errCols: Array[Array[Double]]): Map[Int, HorizonMetrics] = {
    val n = errCols.length
    val hLen = horizonWindow(h, 1, n).length.toDouble // h.ind.len: shared divisor
    predInd.zipWithIndex.map { case (hh, row) =>
      val win = horizonWindow(h, hh, n)
      val errs = DenseVector(win.map(c => errCols(c)(row)).toArray)
      val fcs = DenseVector(win.map(c => fcCols(c)(row)).toArray)
      hh -> HorizonMetrics(fcs, errs, (errs dot errs) / hLen)
    }.toMap
  }
}
