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
    time("full d5 (warm)")(q(spark, dir).count())
    val plan = q(spark, dir).queryExecution.executedPlan.toString
    val counts = Seq("Exchange", "ReusedExchange", "HashAggregate", "BroadcastHashJoin",
      "SortMergeJoin", "WindowExec", "Window")
      .map(k => s"$k=${plan.linesIterator.count(_.contains(k))}").mkString(" ")
    println(s"[d5] plan ops: $counts")
    spark.stop()
  }
}
