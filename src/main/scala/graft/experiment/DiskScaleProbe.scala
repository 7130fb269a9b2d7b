package graft.experiment

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** ON-DISK scale-up probe — the load-bearing version of [[ScaleProbe]]
  * (r12 verdict, Next round #2): ScaleProbe inflates the inputs in memory
  * by unionAll, which skips exactly the things a real 100× run stresses —
  * partitioned parquet reads with real file/partition counts,
  * `maxPartitionBytes` splitting, AQE coalescing and runtime re-planning,
  * scan-level pushdown. This probe MATERIALIZES the key-shifted ×k
  * corpora as partitioned parquet under a scratch root (default
  * `target/scale`; the driver testdata is never touched), then times the
  * heavy shapes reading them THROUGH the parquet scan like any production
  * query, reporting the same fitted exponent α in t ∝ volume^α.
  *
  * Two shape classes:
  *  - the five ScaleProbe shapes re-run from disk at k ∈ {4, 16, 64}
  *    (agg / join / window / shingle_band / superstep) so the on-disk α
  *    column sits directly beside the in-memory one;
  *  - the heavy REAL operators the r12/r13 verdicts named — j14's
  *    interval-overlap grid join, d14's decontamination semi-join, x28's
  *    uncached BPE merge kernel and g8's seed-distance fixpoint — run as
  *    their actual `queries()` entries (x28: kernel) against the inflated
  *    dirs (each ×k dir carries ALL tables: the big ones key-shifted ×k,
  *    the dimension tables copied through) at k ∈ {4, 16, 64} — the r13
  *    verdict's #1 ask closed: the real-operator lane now reads the same
  *    ×64 column as the synthetic one. `SPARK_GRAFT_REAL_KS` / \
  *    `SPARK_GRAFT_PROBE_KS` (comma-separated) restrict either lane for
  *    a cheap re-run; lanes with an empty list are skipped.
  *
  * Inflation semantics match ScaleProbe exactly (k key-shifted copies,
  * offset 2⁴⁰ — volume ×k AND key cardinality ×k); the known caveat
  * carries over: replicated TEXT means shingle/band dictionaries don't
  * scale with k, only their bucket depths do. File counts scale with k
  * (min(256, 4k) output files per big table) so the scan's split count
  * grows like a real corpus would.
  *
  * Output: one JSON line per shape {"shape","t4","t16"[,"t64"],"alpha",
  * "cores","source":"disk"}; α fitted between the first and last k.
  */
object DiskScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/root/repo/target/scale")
    val cores = sys.env.get("SPARK_GRAFT_CORES").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val offset = 1L << 40
    def shifted(df: DataFrame, keys: Seq[String], k: Int): DataFrame =
      (0 until k).map { i =>
        keys.foldLeft(df)((f, c) => f.withColumn(c, col(c) + lit(i * offset)))
      }.reduce(_ unionAll _)

    // Materialize each ×k dir once (skip when present — the probe is
    // re-runnable without re-paying the writes). Big tables key-shifted,
    // the rest copied through so the dir satisfies any `queries()` entry.
    val bigKeys: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    def kdir(k: Int): String = s"$root/k$k"
    def materialize(k: Int): Unit = {
      val done = new java.io.File(s"${kdir(k)}/_DONE")
      if (done.exists()) return
      for (t <- Tables.all) {
        val base =
          if (t == "events") Tables.events(spark, src) else Tables.load(spark, src, t)
        val out = bigKeys.get(t) match {
          case Some(keys) =>
            shifted(base, keys, k).repartition(math.min(256, 4 * k))
          case None => base
        }
        out.write.mode("overwrite").parquet(s"${kdir(k)}/$t.parquet")
      }
      done.createNewFile()
      ()
    }

    def noop(f: DataFrame): Unit =
      f.write.mode("overwrite").format("noop").save()
    def timeMin(f: => Unit): Double = {
      def once: Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      once // warm this plan shape (codegen + file listing)
      math.min(once, once)
    }

    // ScaleProbe's five shapes, reading from disk through Tables.
    val probeShapes: Seq[(String, String => Unit)] = Seq(
      ("agg", d => noop(
        Tables.lineitem(spark, d)
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity")), count(lit(1))))),
      ("join", d => noop(
        Tables.lineitem(spark, d)
          .join(Tables.orders(spark, d),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("l_quantity"))))),
      ("window", d => noop(
        Tables.events(spark, d)
          .withColumn("rs", sum(col("value")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id")).orderBy(col("ts"))))
          .groupBy(col("event_type")).agg(sum(col("rs"))))),
      ("shingle_band", d => noop(
        Tables.documents(spark, d)
          .select(col("doc_id"),
            explode(expr("transform(sequence(1, greatest(char_length(text) - 4, 1), 7), i -> substring(text, i, 5))")).as("s"))
          .groupBy(substring(md5(col("s")), 1, 4).as("band"))
          .agg(count(lit(1))))),
      ("superstep", d => noop {
        val e = Tables.lineitem(spark, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val edges = e.as("a").join(e.as("b"), "ok")
          .filter(col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        edges.groupBy(col("dst")).agg(count(lit(1)))
      }))
    // The heavy real operators, run as their shipped queries(). g8 rides
    // on the per-(session, dir) strong-graph cache, so its timed passes
    // measure the per-round fixpoint work (the repeated cost at scale)
    // after the one-time cache build lands in the warm pass; x28 is the
    // iterative BPE trainer — per round one vocab-sized shuffle + one
    // scalar collect.
    val realShapes: Seq[(String, String => Unit)] = Seq(
      ("j14_grid", d =>
        noop(graft.operators.Relational.queries("j14_interval_overlap_join")(spark, d))),
      ("d14_decon", d =>
        noop(graft.operators.TextPipeline.queries("d14_decontaminate")(spark, d))),
      // x28's TRAINING is session-cached per (dir, k) — timing the query
      // would read the cache after the warm pass and report a constant.
      // Time the uncached kernel directly: the per-round pair-count
      // shuffle + greedy rewrite over the corpus word table (6 rounds,
      // the query's own k).
      ("x28_bpe", { d =>
        val words = graft.operators.TextPipeline
          .corpusWords(Tables.documents(spark, d))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        noop(graft.operators.TextPipeline.bpeMerges(words, 6))
      }),
      ("g8_rounds", d =>
        noop(graft.operators.GraphOps.queries("g8_seed_distance")(spark, d))),
      // j17 (r15): the interpolating as-of — two union+window sorted
      // passes plus a probe-id join; user keys shift with k, so both
      // volume AND key cardinality scale (the keyed-window class whose
      // α should sit near 1 like j8's).
      ("j17_interp", d =>
        noop(graft.operators.Relational.queries("j17_interp_asof")(spark, d))),
      // mm lane (r15 verdict #4): the binary-decode class finally gets a
      // measured exponent. Asset COUNT scales with k by construction —
      // the ×k documents table renders ×k real WAV/Y4M assets through
      // the shipped generators — so the timed cost covers binaryFile
      // listing + scan, the per-file O(samples | frames·pixels) decode
      // kernels, and the banded candidate join. Asset rendering is
      // per-JVM cached (wavNearDupAssetDir/y4mNearDupAssetDir); the warm
      // pass pays that one-time write, timed passes measure the serving
      // path a re-ingest at scale would pay.
      ("mm10_decode", d =>
        noop(graft.operators.TextPipeline.queries("mm10_audio_neardup")(spark, d))),
      ("mm11_decode", d =>
        noop(graft.operators.TextPipeline.queries("mm11_video_neardup")(spark, d))))

    // e lane (r16 verdict #4): the NSW graph family — the suite's newest
    // heavy by-construction class — gets measured exponents at corpus ×16
    // (vec_id-shifted embeddings; queries stay the fixed vec_id < 3 set,
    // so search cost isolates CORPUS growth). Three shapes:
    //  - e26_build: trainNsw UNCACHED (banded pair scoring + top-m cut +
    //    symmetrize), the one-time build cost. The 4-plane banding is
    //    held fixed, so Σocc² grows ~k² per bucket — this lane MEASURES
    //    the docstring's "planes must scale with the corpus" caveat
    //    instead of asserting it (expect α > 1 at fixed planes).
    //  - e26_search: the shipped query on the session-cached graph (the
    //    g8 convention — warm pass pays the build, timed passes measure
    //    the serving walk a 100 TB reader repeats).
    //  - e28_insert: the shipped search-then-connect insert, whose
    //    arrival set scales with k (insert THROUGHPUT at corpus scale).
    val eShapes: Seq[(String, String => Unit)] = Seq(
      ("e26_build", { d =>
        val e = Tables.embeddings(spark, d)
        noop(graft.operators.AnnIndex.trainNsw(
          e, graft.operators.AnnIndex.buildLsh(e, 4, persist = false),
          m = 16, persistEdges = false).edges)
      }),
      ("e26_search", d =>
        noop(graft.operators.TextPipeline.queries("e26_nsw_search")(spark, d))),
      ("e28_insert", d =>
        noop(graft.operators.TextPipeline.queries("e28_nsw_insert")(spark, d))),
      // r17 verdict #5: the HIERARCHY's exponents beside the flat
      // family's. e30_build = trainHnsw uncached (the banded base
      // scoring shares e26_build's fixed-plane Σocc² caveat, plus the
      // geometric level loop — each upper level is deg²-bounded over a
      // 4×-smaller node set, so the build α should track e26_build's);
      // e30_search = the shipped query on the session-cached hierarchy
      // (expect near-flat, like e26_search's 0.094 — the descent adds
      // log-depth constant work); e30_insert = hnswIngest with the
      // arrival set scaling with the corpus (ids offset 2^50, disjoint
      // from every ×k shift — the ingest contract).
      ("e30_build", { d =>
        val e = Tables.embeddings(spark, d)
        val b = graft.operators.AnnIndex.buildLsh(e, 4)
        try noop(graft.operators.AnnIndex.trainHnsw(e, b).edges(0))
        finally { b.unpersist(); () }
      }),
      ("e30_search", d =>
        noop(graft.operators.TextPipeline.queries("e30_hnsw_search")(spark, d))),
      ("e30_insert", { d =>
        val e = Tables.embeddings(spark, d)
        val idx = graft.operators.AnnIndex.hnswFor(spark, d, e)
        val arr = e.filter(col("vec_id") % 97 === 3)
          .select((col("vec_id") + (1L << 50)).as("vec_id"),
            col("embedding"))
        noop(graft.streaming.EventStream.hnswIngest(idx, e, arr))
      }))

    def ksEnv(name: String, dflt: Seq[Int]): Seq[Int] =
      sys.env.get(name).map(_.split(",").filter(_.nonEmpty).map(_.trim.toInt).toSeq)
        .getOrElse(dflt)
    val probeKs = ksEnv("SPARK_GRAFT_PROBE_KS", Seq(4, 16, 64))
    val realKs = ksEnv("SPARK_GRAFT_REAL_KS", Seq(4, 16, 64))
    // ×16 cap for the e lane: at FIXED 4-plane banding the build's
    // Σocc² term grows ~k² — ×64 would spend the probe's whole budget
    // demonstrating a blow-up the ×16 fit already quantifies.
    val eKs = ksEnv("SPARK_GRAFT_E_KS", Seq(4, 16))
    (probeKs ++ realKs ++ eKs).distinct.sorted.foreach(materialize)

    def report(name: String, ks: Seq[Int], run: String => Unit): Unit = {
      if (ks.isEmpty) return
      val ts = ks.map(k => timeMin(run(kdir(k))))
      // alpha needs two distinct k points; a single-k restricted re-run
      // (SPARK_GRAFT_PROBE_KS=64) would otherwise print log(1)/log(1) =
      // NaN and break JSON parsing — emit null for timing-only rows.
      val alpha =
        if (ks.distinct.size < 2) "null"
        else f"${math.log(ts.last / ts.head) /
          math.log(ks.last.toDouble / ks.head)}%.3f"
      val fields = ks.zip(ts).map { case (k, t) => f""""t$k":$t%.3f""" }
        .mkString(",")
      println(s"""{"shape":"$name",$fields,"alpha":$alpha,"cores":$cores,"source":"disk"}""")
    }
    // SPARK_GRAFT_SHAPES: comma-separated shape-name filter for isolated
    // re-measurement (a shared session lets one shape's storage pressure
    // color the next shape's timed passes — the r14 g8 lesson).
    val only = sys.env.get("SPARK_GRAFT_SHAPES")
      .map(_.split(",").map(_.trim).toSet)
    def wanted(n: String): Boolean = only.forall(_.contains(n))
    probeShapes.filter(p => wanted(p._1))
      .foreach { case (n, r) => report(n, probeKs, r) }
    realShapes.filter(p => wanted(p._1))
      .foreach { case (n, r) => report(n, realKs, r) }
    eShapes.filter(p => wanted(p._1))
      .foreach { case (n, r) => report(n, eKs, r) }
    spark.stop()
  }
}
