package graft.experiment

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AnnIndex
import graft.sources.Tables

/** Timing probe for the ANN index surface: trains the shared IVF index
  * once, then times repeated executions of the search and recall shapes to
  * separate index-build cost from steady-state search cost.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val e = Tables.embeddings(spark, d)
    val idx = time("trainIvf") { AnnIndex.trainIvf(e, nlist = 16, iters = 2) }
    time("lists.count (materialize)") { idx.lists.count() }
    for (i <- 1 to 3) time(s"ivfSearch pass $i") {
      AnnIndex.ivfSearch(idx, col("vec_id") < 3, k = 3, nprobe = 4)
        .write.mode("overwrite").format("noop").save()
    }
    val lsh = time("buildLsh") { AnnIndex.buildLsh(e, tables = 4) }
    time("lsh.count (materialize)") { lsh.count() }
    for (i <- 1 to 3) time(s"lshSearch pass $i") {
      AnnIndex.lshSearch(lsh, col("vec_id") < 3, k = 3)
        .write.mode("overwrite").format("noop").save()
    }
    AnnIndex.ivfSearch(idx, col("vec_id") < 3, k = 3, nprobe = 4)
      .explain("formatted")
    spark.stop()
  }
}
