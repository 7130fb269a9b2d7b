package graft.experiment

import org.apache.spark.sql.SparkSession

/** Scratch profiler for d5_neardup_pipeline at a given SF dir: times the
  * full query and prints the exchange/reuse structure of its plan.
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

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables.documents(spark, dir)
    val sh0 = docs.select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(char_length(text) - 4, 1))")).as("i"))
      .select(col("doc_id"), expr("md5(substring(text, i, 5))").as("dg"))
    val mhCols = (0 to 7).map(i =>
      min(expr(s"substring(concat(dg, dg), ${i * 4 + 1}, 16)")).as(s"mh$i"))
    val sigs = sh0.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*)
    val bands = (0 to 3).map(b =>
      s"$b, md5(concat(least(mh${2 * b}, mh${2 * b + 1}), greatest(mh${2 * b}, mh${2 * b + 1})))")
      .mkString(", ")
    val buckets = sigs.select(col("doc_id"), expr(s"stack(4, $bands) AS (band, bucket)"))
    val bk = buckets
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("sz") <= 128).drop("sz")
    val cand = bk.as("x").join(bk.as("y"), Seq("band", "bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val docSh = docs.select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(char_length(text) - 4, 1))")).as("i"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(substring(text, i, 5)), 1, 15), 16, 10) as bigint)").as("dgl"))
      .groupBy(col("doc_id")).agg(collect_set(col("dgl")).as("sset"))
    time("sigs")(sigs.count())
    time("buckets+window")(bk.count())
    time("cand")(cand.count())
    time("cand (2nd)")(cand.count())
    time("docSh")(docSh.count())

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
