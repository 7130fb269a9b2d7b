package graft.experiment

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for x7 (bigram typicality): explode-only vs
  * train-counts vs full score, 3 passes each, noop sink — the D5Stage
  * pattern. Run: runMain graft.experiment.X7Probe <sfDir>
  */
object X7Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[x7] $tag%-18s pass$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    val docs = graft.sources.Tables.documents(spark, d)
    def bg = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"""
          .stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    time("explode-only") {
      bg.write.mode("overwrite").format("noop").save()
    }
    time("train-counts") {
      bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .write.mode("overwrite").format("noop").save()
    }
    time("full-score") {
      graft.operators.TextPipeline.bigramTypicality(docs)
        .write.mode("overwrite").format("noop").save()
    }
    println("[x7] final plan:")
    val df = graft.operators.TextPipeline.bigramTypicality(docs)
    df.write.mode("overwrite").format("noop").save()
    println(df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate"))
      .mkString("\n"))
    spark.stop()
  }
}
