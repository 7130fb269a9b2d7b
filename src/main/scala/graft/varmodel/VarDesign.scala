package graft.varmodel

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VAR design-matrix builder — SURVEY §2.5 W4; reference `VAR.Z`
  * (enetVAR.R:277-319).
  *
  * Local (Breeze) form: given the T×n panel matrix y and lag order p,
  *  - response `yP` = rows p+1..T (T−p rows);
  *  - design `z` = [lag-1 block | lag-2 block | … | lag-p block], where the
  *    lag-i block's row t is y at time (p+t)−i — i.e. most-recent lag
  *    first, matching the reference's cbind order (enetVAR.R:292-295);
  *  - column names `<series>.l<i>`; optional leading "intercept" column of
  *    ones (enetVAR.R:303-306);
  *  - bookkeeping n, T (reduced), k = n·p (+1), dof = T_orig − p − k
  *    (enetVAR.R:286-290).
  *
  * The local form is the estimation-path view (matrices ≤ a few hundred
  * rows collect to tasks; SURVEY §2.2 P9); [[VarDesign.frame]] is the same
  * layout as a distributed DataFrame projection for panel-scale use —
  * one shared Window spec, so Catalyst plans a single sort for all n·p lag
  * expressions.
  */
final case class VarDesign(
    names: IndexedSeq[String],
    yP: DenseMatrix[Double],
    z: DenseMatrix[Double],
    zNames: IndexedSeq[String],
    yOrig: DenseMatrix[Double],
    p: Int,
    intercept: Boolean) {
  val n: Int = yOrig.cols
  val tReduced: Int = yP.rows
  val k: Int = n * p + (if (intercept) 1 else 0)
  val dof: Int = yOrig.rows - p - k

  def response(j: Int): DenseVector[Double] = yP(::, j).copy
}

object VarDesign {

  /** Build the local design (reference VAR.Z). */
  def build(
      y: DenseMatrix[Double],
      p: Int,
      names: IndexedSeq[String],
      intercept: Boolean = false): VarDesign = {
    require(p >= 1, "p must be a positive integer")
    val t = y.rows
    val n = y.cols
    require(t > p, s"need more than p=$p rows, got $t")
    val colNames =
      if (names.nonEmpty) names else IndexedSeq.tabulate(n)(j => s"y${j + 1}")

    val yP = y((p until t), ::).toDenseMatrix
    val base = if (intercept) 1 else 0
    val z = DenseMatrix.zeros[Double](t - p, n * p + base)
    if (intercept) z(::, 0) := 1.0
    var lag = 1
    while (lag <= p) {
      // lag-i block: rows (p−i+1)..(T−i) of y, 1-indexed — here 0-indexed.
      val block = y((p - lag) until (t - lag), ::)
      z(::, (base + (lag - 1) * n) until (base + lag * n)) := block
      lag += 1
    }
    val zNames =
      (if (intercept) IndexedSeq("intercept") else IndexedSeq.empty) ++
        (1 to p).flatMap(i => colNames.map(c => s"$c.l$i"))
    VarDesign(colNames, yP, z, zNames, y, p, intercept)
  }

  /** The same lag-embedding as a distributed projection: for each series
    * column and lag i ≤ p, adds `<series>_l<i>` via `lag(...)` over ONE
    * shared date-ordered window (single sort in the physical plan), then
    * drops the first p rows (the leading-NULL frame rows, reference
    * `na.omit` of the design).
    *
    * The frame this runs on is a post-aggregation calendar-bounded panel
    * (one row per period), so the unpartitioned window is bounded by
    * calendar size at any data scale (SURVEY §4.2).
    */
  def frame(
      panel: DataFrame,
      dateCol: String,
      seriesCols: Seq[String],
      p: Int): DataFrame = {
    require(p >= 1, "p must be a positive integer")
    val w = Window.orderBy(col(dateCol))
    val lagCols: Seq[Column] = for {
      i <- 1 to p
      c <- seriesCols
    } yield lag(col(c), i).over(w).as(s"${c}_l$i")
    val projected = panel.select(
      (col(dateCol) +: seriesCols.map(col)) ++ lagCols: _*)
    // Leading p rows have at least one NULL lag: drop any-null rows —
    // exactly the reference's na.omit on the embedded design.
    projected.na.drop("any")
  }
}
