package graft.experiment

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VOCABULARY-scaling probe for the BPE trainer — closes the caveat the
  * on-disk probe carries in-file: DiskScaleProbe inflates by replicating
  * TEXT, so its x28 shape holds the vocabulary fixed and its flat α is a
  * statement about round structure only. This probe scales the thing the
  * trainer's per-round shuffle is actually sized by — the DISTINCT WORD
  * TABLE — by synthesizing Zipf-weighted vocabularies of V, 4V, 16V, 64V
  * words (pseudo-words = 8-hex-char md5 slices keyed by id — ~uniform
  * pair structure; counts = ⌊10⁶/(id+1)⌋ + 1, the Zipf head every real
  * corpus has) and timing `bpeMerges(words, 6)` — the same uncached
  * kernel DiskScaleProbe times, per round one vocab-sized pair-count
  * shuffle + one scalar argmax collect.
  *
  * Output: one JSON line per V with the fitted exponent α in
  * t ∝ vocab^α between the first and last point, same schema as the
  * other probes ({"shape","t...","alpha","cores","source":"vocab"}).
  */
object VocabScaleProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.get("SPARK_GRAFT_CORES").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def vocabOf(v: Long) = spark.range(v)
      .select(substring(md5(col("id").cast("string")), 1, 8).as("word"),
        (lit(1000000L) / (col("id") + 1) + 1).as("cnt"))
      // md5-slice collisions collapse to one row — counts summed so the
      // table is a genuine distinct-word relation at every V.
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))

    def timeMin(f: => Unit): Double = {
      def once: Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      once // warm the plan shape
      math.min(once, once)
    }

    val vs = Seq(1L << 14, 1L << 16, 1L << 18, 1L << 20)
    val ts = vs.map { v =>
      val words = vocabOf(v)
      timeMin {
        graft.operators.TextPipeline.bpeMerges(words, 6).collect()
        ()
      }
    }
    val alpha = math.log(ts.last / ts.head) /
      math.log(vs.last.toDouble / vs.head)
    val fields = vs.zip(ts).map { case (v, t) =>
      f""""t$v":$t%.3f""" }.mkString(",")
    println(f"""{"shape":"x28_vocab",$fields,"alpha":$alpha%.3f,"cores":$cores,"source":"vocab"}""")
    spark.stop()
  }
}
