package graft.experiment

/** Diagnostic: print the Testing.R-variant stationarity-repair ledger on
  * the real panel (the rows t2_stationarity_ledger emits), with the wall
  * time of the repair — the basis of that query's VALUES oracle.
  */
object T2Probe {
  def main(args: Array[String]): Unit = {
    val spark = GoldenExperiment.buildSession()
    val t0 = System.nanoTime()
    val prep = GoldenExperiment.prepare(spark)
    println(f"[t2probe] prepare wall: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    prep.ledger.sortBy(e => (e.column, e.iteration)).foreach { e =>
      println(s"[t2probe] ('${e.column}', '${e.transform}', ${e.iteration})")
    }
    println(s"[t2probe] n_entries=${prep.ledger.size}")
    spark.stop()
  }
}
