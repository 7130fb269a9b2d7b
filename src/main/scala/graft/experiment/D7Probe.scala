package graft.experiment

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for d7_dup_clusters: times the pair generation and
  * each propagation round separately so loop overhead (per-round Spark
  * jobs over a tiny cached pair table) is visible apart from the d5
  * pipeline cost feeding it.
  */
object D7Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[d7] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.sources.Tables.documents(spark, dir)
    val pairs = time("nearDupPairs count") {
      val p = graft.operators.TextPipeline
        .nearDupPairs(docs, minJaccard = 0.5)
        .select(col("doc_a"), col("doc_b")).persist()
      p.count()
      p
    }
    // Unrolled copy of the dupClusters loop with per-round timing.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var cur = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).persist()
    def lblSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).first().getDecimal(0)
    var curSum = time("init sum")(lblSum(cur))
    var converged = curSum == null
    var round = 0
    while (!converged) {
      round += 1
      val nbMin = edges.join(cur, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nb"))
      val stepped = cur.as("o")
        .join(nbMin, col("o.node") === col("dst"), "left")
        .select(col("o.node").as("node"),
          least(col("o.lbl"), coalesce(col("nb"), col("o.lbl"))).as("m"))
      val next = stepped
        .join(cur.select(col("node").as("jn"), col("lbl").as("jl")),
          col("m") === col("jn"), "left")
        .select(col("node"),
          least(col("m"), coalesce(col("jl"), col("m"))).as("lbl"))
        .persist()
      val nextSum = time(s"round $round")(lblSum(next))
      converged = nextSum.compareTo(curSum) == 0
      curSum = nextSum
      cur.unpersist()
      cur = next
    }
    val labels = cur
    time("sizes + output") {
      val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n"))
      labels.join(sizes, "lbl").orderBy("node").collect()
    }
    val q = graft.operators.TextPipeline.queries("d7_dup_clusters")
    time("full query (cold)")(q(spark, dir).collect())
    time("full query (warm)")(q(spark, dir).collect())
    spark.stop()
  }
}
