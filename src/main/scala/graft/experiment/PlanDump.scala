package graft.experiment

import org.apache.spark.sql.SparkSession

/** Print the final executed plan of a named SparkEntry query — the
  * .explain feedback loop as a runnable: every Exchange / Join /
  * Aggregate / Scan line, after AQE finalizes.
  * Run: runMain graft.experiment.PlanDump <query> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, d)
    df.write.mode("overwrite").format("noop").save()
    println(s"[plan] $name:")
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator
      .filter(l => Seq("Exchange", "Join", "HashAggregate", "FileScan",
        "Window", "Sort", "Generate").exists(l.contains))
      .foreach(l => println("[plan] " + l.replaceAll("#\\d+[L]?", "")))
    spark.stop()
  }
}
