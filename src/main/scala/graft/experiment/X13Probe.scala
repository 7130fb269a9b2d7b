package graft.experiment

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head for x13's two shapes at a given SF: the map-only
  * array-fold (current repetitionSignals) vs the two-hash-aggregate
  * draft it replaced, 5 passes each, noop sink.
  * Run: runMain graft.experiment.X13Probe <sfDir>
  */
object X13Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit =
      for (i <- 1 to 5) {
        val t0 = System.nanoTime()
        f
        println(f"[x13] $tag%-14s pass$i ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    val docs = graft.sources.Tables.documents(spark, d)
    import org.apache.spark.sql.GraftExpressionBridge
    def stats = GraftExpressionBridge.column(
      graft.functions.TokenRepetitionStats(
        GraftExpressionBridge.expression(col("t"))))
    time("kernel-only") {
      docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        .repartition(32, col("doc_id"))
        .select(col("doc_id"), stats.as("rs"))
        .write.mode("overwrite").format("noop").save()
    }
    time("kernel+fields") {
      docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        .repartition(32, col("doc_id"))
        .select(col("doc_id"), stats.as("rs"))
        .select(col("doc_id"), col("rs.n_distinct"), col("rs.top_token_c"),
          col("rs.top_bigram_c"))
        .write.mode("overwrite").format("noop").save()
    }
    time("split-only") {
      docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        .repartition(32, col("doc_id"))
        .write.mode("overwrite").format("noop").save()
    }
    time("map-only") {
      graft.operators.TextPipeline.queries("x13_repetition_filter")(spark, d)
        .write.mode("overwrite").format("noop").save()
    }
    // The replaced draft, inline for comparison.
    def aggDraft = {
      val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        .repartition(32, col("doc_id"))
      val tok = toks.select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_token_c"))
      val bg = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(t) - 1),
            |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"""
            .stripMargin)).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_bigram_c"))
      tok.join(bg, Seq("doc_id"), "left")
    }
    time("two-agg") {
      aggDraft.write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
