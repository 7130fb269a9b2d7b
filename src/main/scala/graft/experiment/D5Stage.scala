package graft.experiment
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of the d3/d5 shingle pipeline at sf0.1
  * (explode only → +md5 → +MinHash8 → +combined aggregate, each behind the
  * same pre-explode repartition the real pipeline uses), three warm
  * passes each. This probe found the single-file parallelism ceiling: the
  * explode-only stage alone took 1.5 s because the one-file corpus scan
  * gave the 1000×-fanout one partition — fixed by the pre-explode
  * repartition in TextPipeline.shingleDigests (d3 2.5 → 0.7 s,
  * d5 5.7 → 3.0 s).
  */
object D5Stage {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): Unit = {
      for (i <- 1 to 3) { val t0 = System.nanoTime(); f
        println(f"[st] $tag%-26s pass$i ${(System.nanoTime() - t0) / 1e9}%6.2f s") }
    }
    val docs = graft.sources.Tables.documents(spark, d)
    // The shared pre-explode prefix of every stage (the inline copies the
    // probe header warns about, factored): repartition BEFORE the fanout,
    // then one shingle position per row.
    def exploded = docs.select(col("doc_id"), col("text"))
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, greatest(char_length(text) - 4, 1))")).as("i"))
    // stage 1: explode only
    time("explode-only") {
      exploded
        .select(col("doc_id"), expr("substring(text, i, 5)").as("s"))
        .write.mode("overwrite").format("noop").save()
    }
    // stage 2: + md5
    time("explode+md5") {
      exploded
        .select(col("doc_id"), expr("md5(substring(text, i, 5))").as("dg"))
        .write.mode("overwrite").format("noop").save()
    }
    // stage 3: + minhash agg only
    time("minhash-agg") {
      import org.apache.spark.sql.GraftExpressionBridge
      exploded
        .select(col("doc_id"), expr("md5(substring(text, i, 5))").as("dg"))
        .groupBy(col("doc_id"))
        .agg(GraftExpressionBridge.column(
          graft.functions.MinHash8(GraftExpressionBridge.expression(col("dg"))).toAggregateExpression()).as("mhs"))
        .write.mode("overwrite").format("noop").save()
    }
    // stage 4: + collect_set of 60-bit longs (the d5 combined agg)
    time("combined-agg") {
      import org.apache.spark.sql.GraftExpressionBridge
      exploded
        .select(col("doc_id"), expr("md5(substring(text, i, 5))").as("dg"))
        .groupBy(col("doc_id"))
        .agg(GraftExpressionBridge.column(
          graft.functions.MinHash8(GraftExpressionBridge.expression(col("dg"))).toAggregateExpression()).as("mhs"),
          sort_array(collect_set(expr("cast(conv(substring(dg, 1, 15), 16, 10) as bigint)"))).as("sset"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
