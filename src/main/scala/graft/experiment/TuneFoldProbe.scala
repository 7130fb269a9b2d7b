package graft.experiment

import graft.tune.RollingOriginTuner

/** Scratch A/B: executor-side segment fold vs historical driver fold on a
  * representative ~12 h-workload tune (econ.vars.5 shape).
  */
object TuneFoldProbe {
  def main(args: Array[String]): Unit = {
    val spark = GoldenExperiment.buildSession()
    val prep = GoldenExperiment.prepare(spark)
    val cols = ReferenceWorkloadLarge.EconVars.find(_._1 == "econ.vars.5").get._2
    val panel = GoldenExperiment.assemble(prep, cols)
    val trainY = panel.y(0 until panel.startPredIdx, ::).toDenseMatrix
    val tol = graft.linalg.BlockedCv.GlmnetEquivTol
    for (warm <- Seq(true, false); driverFold <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val best = RollingOriginTuner.tune(trainY, 3, initWindow = 40,
        horizon = 8, RollingOriginTuner.referenceGrid(),
        cols.toIndexedSeq, spark = Some(spark), tol = tol,
        driverFold = driverFold)
      println(f"[foldprobe] warm=$warm driverFold=$driverFold " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s best0=${best.head}")
    }
    spark.stop()
  }
}
