package graft.experiment

import org.apache.spark.sql.SparkSession

/** Scratch profiler for d5_neardup_pipeline at a given SF dir: times the
  * full query cold/warm and prints the exchange/join structure of its
  * plan. (Stage-level timings during the round-6 optimization were taken
  * with inline copies of the then-current stages; those copies are not
  * kept here — they drift from the real pipeline as it evolves.)
  */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d5] $tag%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val q = graft.operators.TextPipeline.queries("d5_neardup_pipeline")
    time("full d5 (cold)")(q(spark, dir).count())
    time("full d5 (warm)")(q(spark, dir).count())
    // Keep ONE DataFrame for the plan dump and execute ITS OWN
    // QueryExecution (collect, not count — count wraps the df in a new
    // plan): with AQE the pre-execution string is the unoptimized skeleton
    // with no runtime exchange reuse visible.
    val df = q(spark, dir)
    time("full d5 (warm)")(df.collect())
    val plan = df.queryExecution.executedPlan.toString
    // Word-boundary match so overlapping keys don't double-count (plain
    // `contains` counted ReusedExchange/BroadcastExchange lines under
    // "Exchange" and WindowExec lines under "Window").
    val counts = Seq("Exchange", "BroadcastExchange", "ReusedExchange",
      "HashAggregate", "BroadcastHashJoin", "SortMergeJoin", "Window")
      .map(k => s"$k=${plan.linesIterator.count(_.matches(s".*\\b$k\\b.*"))}").mkString(" ")
    println(s"[d5] plan ops: $counts")
    spark.stop()
  }
}
