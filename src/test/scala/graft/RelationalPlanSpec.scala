package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape checks for the relational corpus: the oracle harness
  * proves WHAT these queries compute; these tests pin HOW — the at-scale
  * plan properties the queries' Scaladoc claims (a regression here would
  * still be hash-green but quietly wrong at 100 TB).
  */
class RelationalPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("j7: the salted join keeps the shuffled-hash shape and salts the key") {
    // The salting exemplar only demonstrates anything if the join really
    // is shuffled on (event_type, salt): a lost hint would let Catalyst
    // broadcast the dim and the query would silently stop exercising the
    // technique it documents.
    val df = Relational.queries("j7_salted_skew_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"salted join not shuffled:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"broadcast leaked into the salted join:\n$plan")
    assert(plan.contains("salt"), s"salt key missing from the join:\n$plan")
  }

  test("asOfJoin: at-or-before semantics, equal-ts inclusion, left nulls") {
    // The three edges the oracle data can't force deterministically: a
    // quote EXACTLY at the probe's timestamp must match (at-or-before is
    // inclusive), the latest of several prior quotes wins, and a probe
    // with no prior quote survives with a NULL match.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val probe = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "p")
    val quote = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 6L, 60.0))
      .toDF("k", "t", "v")
    val got = Relational.asOfJoin(probe, quote, keys = Seq("k"), tsCol = "t")
      .select(col("p"), col("asof.v"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map("a" -> Some(100.0), "b" -> Some(150.0), "c" -> None))
  }

  test("j9: the bucketized range join keeps an equi key — no nested loop") {
    // The bucketization exists to give the interval predicate an equi
    // key; if the bin column ever fell out of the join condition,
    // Catalyst would silently fall back to BroadcastNestedLoopJoin —
    // correct output, corpus² work.
    val df = Relational.queries("j9_range_bucket_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join fell back to nested loop:\n$plan")
  }

  test("s7: the date-range filter prunes partitions, not just row groups") {
    // The partitioned layout only earns its keep if the scan's
    // PartitionFilters actually restrict the partition directories read:
    // 5 of the 30 event days must survive pruning.
    // sparkPlan, not executedPlan: AQE wraps executed leaves in query
    // stages that a plain collect cannot descend into.
    val df = Relational.queries("s7_partitioned_scan")(spark, sfDir)
    val scan = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.headOption
      .getOrElse(fail("no FileSourceScanExec in the s7 plan"))
    assert(scan.partitionFilters.nonEmpty, "no partition filters on the scan")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 5, s"expected 5 pruned partitions, read $selected")
  }

  test("j12: the dim-attribute filter dynamically prunes the partitioned scan") {
    // No static predicate exists on the fact's partition column — the
    // filter lives on the date dim's day-of-week — so the only way the
    // fact scan reads the Sundays' 4 of ~30 partition directories is
    // Catalyst's dynamic partition pruning reusing the dim's broadcast. A
    // lost DPP filter keeps the query hash-green while silently
    // re-reading the whole archive at 100 TB.
    val df = Relational.queries("j12_dynamic_partition_prune")(spark, sfDir)
    val scan = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
      }.headOption
      .getOrElse(fail("no partition-filtered FileSourceScanExec in the j12 plan"))
    assert(scan.partitionFilters.mkString.contains("dynamicpruning"),
      s"partition filter is not dynamic: ${scan.partitionFilters.mkString}")
  }

  test("j10: bucketed layout makes the aggregate and join shuffle-free") {
    // The bucketed table exists so that neither the per-user aggregate
    // nor the join back to the rows re-partitions the data: the only
    // acceptable exchange is the final presentation sort (range
    // partitioning). A hash-partitioning Exchange appearing here means
    // the bucket spec stopped satisfying the join's distribution — the
    // layout's entire value at scale, gone silently.
    val df = Relational.queries("j10_bucketed_colocated_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"bucketed join not sort-merge:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join re-shuffled:\n$plan")
  }

  test("asOfJoin agrees with a brute-force reference on randomized data") {
    // 200 probes / 120 quotes over 7 keys with deliberate ts collisions
    // between the sides (quote ts unique per key so the winner is well
    // defined). Reference: per probe, the max-ts quote at or before it.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260812L)
    val quotes = Seq.tabulate(120) { i =>
      (rnd.nextInt(7).toLong, i * 7L + rnd.nextInt(7), i.toDouble)
    }.groupBy(q => (q._1, q._2)).map(_._2.head).toSeq // unique (k, ts)
    val probes = Seq.tabulate(200) { i =>
      val base = quotes(rnd.nextInt(quotes.size))
      // half the probes land EXACTLY on a quote ts (inclusive boundary)
      if (i % 2 == 0) (rnd.nextInt(7).toLong, base._2, i.toLong)
      else (rnd.nextInt(7).toLong, rnd.nextInt(900).toLong, i.toLong)
    }
    val qDf = quotes.toDF("k", "t", "v")
    val pDf = probes.toDF("k", "t", "pid")
    val got = Relational.asOfJoin(pDf, qDf, keys = Seq("k"), tsCol = "t")
      .select(col("pid"), col("asof.v"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val byKey = quotes.groupBy(_._1)
    for ((k, t, pid) <- probes) {
      val expect = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t)
        .sortBy(_._2)
        .lastOption.map(_._3)
      assert(got(pid) == expect, s"probe $pid (k=$k, t=$t): got ${got(pid)}, want $expect")
    }
    assert(got.size == probes.size)
  }

  test("x9: sequence packing partitions its window by source — no global sort") {
    // The packing manifest's scale claim is that the cumsum window
    // parallelizes across sources; a careless Window.orderBy without the
    // partitionBy would still be hash-green (same rows) but serialize the
    // whole corpus through one partition at 100 TB.
    val df = graft.operators.TextPipeline.queries("x9_sequence_packing")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"),
      s"packing window not partitioned by source:\n$plan")
    // The only SinglePartition exchange allowed is the final display sort's
    // range partitioning; the WINDOW must not run on a single partition.
    val windowLine = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(!windowLine.contains("SinglePartition"),
      s"packing window runs on one partition:\n$plan")
    df.collect() // the shape must also execute
  }

  test("x10: the composed curation pipeline costs exactly two hash shuffles") {
    // Five composed operators (gate -> dedup -> split -> mix -> pack) must
    // stay map-side except the dedup window (content_hash) and the packing
    // window (source, split): an accidental extra exchange — e.g. a lost
    // column pruning splitting the plan, or a repartition creeping in —
    // would multiply 100 TB shuffle volume while staying hash-green.
    val df = graft.operators.TextPipeline.queries("x10_curation_pipeline")(spark, sfDir)
    df.collect() // materialize so AQE finalizes the executed plan
    // AdaptiveSparkPlan.toString prints BOTH the final and the initial
    // plan — count exchanges in the final section only.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 2,
      s"expected exactly 2 hash exchanges (dedup + packing windows), got $hashExchanges:\n$plan")
  }

  test("x11: the test-gram probe is a broadcast semi-join — train never shuffles on grams") {
    // Decontamination's scale claim: the corpus-sized train gram stream
    // is probed against the SMALL test-split gram set via broadcast. A
    // lost hint would shuffle the train side on the gram key — the exact
    // 100 TB shuffle the operator exists to avoid — while staying
    // hash-green on testdata.
    val df = graft.operators.TextPipeline.queries("x11_decontamination")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val gramJoin = plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("gram"))
    assert(gramJoin, s"test-gram probe is not a broadcast join:\n$plan")
    // Exactly ONE exchange may key on gram: the TEST split's distinct —
    // the tiny side being built for broadcast. A second one means the
    // corpus-sized train stream started shuffling on grams (the doc_id
    // partitioning from the pre-explode repartition must keep serving
    // its per-doc aggregates).
    val gramExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .count(_.contains("gram"))
    assert(gramExchanges <= 1,
      s"train side shuffled on the gram key ($gramExchanges gram exchanges):\n$plan")
  }

  test("x13: the repetition gate is map-only — only the parallelism fix may exchange") {
    // All three signals fold per-row over the token array
    // (TokenRepetitionStats); the single allowed exchange is the
    // explicit REPARTITION_BY_NUM that spreads the one-file testdata
    // scan across cores. An ENSURE_REQUIREMENTS hash exchange appearing
    // means per-doc state started crossing the wire again (the
    // two-aggregate draft this operator replaced).
    val df = graft.operators.TextPipeline.queries("x13_repetition_filter")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val required = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("REPARTITION_BY_NUM"))
    assert(required == 0,
      s"repetition gate stopped being map-only ($required required exchanges):\n$plan")
  }

  test("x15: the vocab top-k is a TakeOrdered merge — never a global sort") {
    // The top-100 claim only scales because orderBy+limit compiles to
    // TakeOrderedAndProject (per-partition heaps, k-row driver merge). A
    // refactor that materializes the ordering first — e.g. a window rank
    // or an orderBy that loses its limit — would globally sort the
    // Zipf-bounded but still large token table while staying hash-green.
    val df = graft.operators.TextPipeline.queries("x15_vocab_topk")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-k is not a TakeOrdered:\n$plan")
    assert(!plan.linesIterator.exists(l =>
        l.contains("Sort ") && l.contains("global=true")),
      s"global sort leaked into the vocab top-k:\n$plan")
  }

  test("x16: the budget window partitions by source — no global sort") {
    // Same scale claim as x9's packing window: the budget cumsum must
    // parallelize across sources; losing the partitionBy serializes the
    // corpus through one partition at 100 TB while staying hash-green.
    val df = graft.operators.TextPipeline.queries("x16_token_budget")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"),
      s"budget window not partitioned by source:\n$plan")
    val windowLine = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(!windowLine.contains("SinglePartition"),
      s"budget window runs on one partition:\n$plan")
    df.collect()
  }

  test("x17: the source-stats join is broadcast — the corpus probes map-side") {
    // The adaptive gate's scale shape: per-source stats (|sources| rows)
    // broadcast back onto the corpus. A lost hint would shuffle the
    // corpus on source for a sort-merge join against a 20-row table.
    val df = graft.operators.TextPipeline.queries("x17_adaptive_gate")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"source-stats join is not broadcast:\n$plan")
    // The only exchange keyed on source is the stats aggregate's own
    // shuffle (tiny, post-partial-agg); the corpus side must not add one.
    val srcExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .count(_.contains("source"))
    assert(srcExchanges <= 1,
      s"corpus shuffled on source for the stats join ($srcExchanges exchanges):\n$plan")
  }

  test("x18: the global-order rank window partitions by bucket — only the 256-row offset cumsum is single-partition") {
    // The operator's whole point is a global row number with no
    // corpus-sized single-partition stage: the rank window must hash by
    // bucket, and the only SinglePartition window allowed is the offset
    // cumsum over the ≤256 bucket counts. If the rank window ever loses
    // its partitionBy the query stays hash-green while serializing the
    // corpus through one task.
    val df = graft.operators.TextPipeline.queries("x18_global_order")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val rankLine = plan.linesIterator
      .find(l => l.contains("Window ") && l.contains("bucket_rank"))
      .getOrElse(fail(s"rank window missing:\n$plan"))
    assert(!rankLine.contains("SinglePartition") && plan.contains("hashpartitioning(bucket"),
      s"rank window not partitioned by bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets not broadcast back:\n$plan")
  }

  test("x19: chunking is map-only — only the parallelism fix may exchange") {
    // The doc->chunks explode must stay a pure map stage (the embedding
    // feed): the single allowed exchange is the explicit pre-fanout
    // REPARTITION_BY_NUM. Any ENSURE_REQUIREMENTS hash exchange means
    // chunk state started crossing the wire.
    val df = graft.operators.TextPipeline.queries("x19_doc_chunks")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val required = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("REPARTITION_BY_NUM"))
    assert(required == 0,
      s"chunking stopped being map-only ($required required exchanges):\n$plan")
  }

  test("x20: the df table broadcasts and the top-5 window keeps doc_id partitioning") {
    // tf-idf's scale shape: the corpus-sized (doc, token) side keeps its
    // pre-fanout doc_id partitioning through the broadcast df join into
    // the per-doc ranking window; only the Zipf-bounded df aggregate may
    // exchange on token. A lost broadcast would shuffle the corpus on
    // token; a lost window partitioning would serialize it entirely.
    val df = graft.operators.TextPipeline.queries("x20_tfidf_terms")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"df table not broadcast:\n$plan")
    val windowLine = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(!windowLine.contains("SinglePartition"),
      s"top-5 window runs on one partition:\n$plan")
    val tokenExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .count(_.contains("token"))
    assert(tokenExchanges <= 1,
      s"corpus shuffled on token beyond the df aggregate ($tokenExchanges):\n$plan")
  }

  test("x21: the composed chunk pipeline costs exactly one hash shuffle") {
    // gate -> dedup -> chunk must stay map work around the single dedup
    // window exchange on content_hash; a second hash exchange means a
    // stage stopped collapsing (x10's discipline for the RAG path).
    val df = graft.operators.TextPipeline.queries("x21_chunk_pipeline")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange (dedup window), got $hashExchanges:\n$plan")
  }

  test("x22: sparse retrieval broadcasts df and cuts top-k with TakeOrdered") {
    // The retrieval shape's two scale claims: the idf table broadcasts
    // back onto the posting stream (a lost hint shuffles the postings on
    // token for a 3-row dim), and the final cut is a per-partition-heap
    // TakeOrdered merge, never a global sort of the scored docs.
    val df = graft.operators.TextPipeline.queries("x22_sparse_retrieval")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"df/idf table not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k is not a TakeOrdered:\n$plan")
    assert(!plan.linesIterator.exists(l =>
        l.contains("Sort ") && l.contains("global=true")),
      s"global sort leaked into the retrieval cut:\n$plan")
  }

  test("w12: the trailing-hour window partitions by event_type") {
    // The RANGE-frame query's scale story is per-key linear frame
    // maintenance; an unpartitioned event-time window would push the
    // whole event stream through one partition.
    val df = Relational.queries("w12_rolling_time_window")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(event_type"),
      s"trailing window not partitioned by event_type:\n$plan")
    val windowLine = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(!windowLine.contains("SinglePartition"),
      s"trailing window runs on one partition:\n$plan")
    df.collect()
  }

  test("a13: the explicit-values pivot keeps its two post-partial-agg exchanges") {
    // Giving pivot its value list avoids the values-discovery pass (an
    // extra full scan + job); what remains is Catalyst's two-phase
    // PivotFirst — agg on (user, type), PivotFirst on user — and BOTH
    // exchanges must sit above a partial HashAggregate so wire volume is
    // |users|x|types|, never the event count. A third hash exchange (or a
    // separate values job) means the explicit list was lost.
    val df = Relational.queries("a13_pivot")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 2,
      s"expected the 2 PivotFirst exchanges, got $hashExchanges:\n$plan")
    assert(plan.contains("pivot"), s"PivotFirst shape missing:\n$plan")
  }

  test("a14: the unpivot is a map-side Expand after the monthly aggregate") {
    // Native unpivot must compile to Expand (each row emits one row per
    // metric, no wire crossing); the only hash exchange is the monthly
    // aggregate's own. A UNION-ALL rewrite would re-scan the aggregate
    // per metric while staying hash-green.
    val df = Relational.queries("a14_unpivot")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), s"unpivot did not compile to Expand:\n$plan")
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected exactly 1 hash exchange (monthly agg), got $hashExchanges:\n$plan")
  }

  test("j11: length banding gives the similarity join an equi key — no nested loop") {
    // The edit-distance join is only scalable because the length band is
    // an equi key; if the band fell out of the condition Catalyst would
    // run the vocabulary cross product as a nested loop — same 24 rows on
    // testdata, corpus-squared work at scale.
    val df = Relational.queries("j11_edit_distance_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"similarity join lost its equi key:\n$plan")
  }

  test("w13: the decile window partitions by source") {
    // ntile's scale story is per-source linear rank maintenance; an
    // unpartitioned window would serialize the corpus through one task.
    val df = Relational.queries("w13_ntile_binning")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"),
      s"decile window not partitioned by source:\n$plan")
    val windowLine = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
    assert(!windowLine.contains("SinglePartition"),
      s"decile window runs on one partition:\n$plan")
  }

  test("a15: the correlation matrix is one aggregate pass — no hash exchange") {
    // All six co-moment sets must ride the same partial+final aggregate:
    // the only exchange is the constant-size SinglePartition merge. A
    // hash exchange (or a second scan) means the pairs stopped fusing.
    val df = Relational.queries("a15_corr_matrix")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 0,
      s"correlation matrix stopped being a single pass ($hashExchanges hash exchanges):\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one lineitem scan, got $scans:\n$plan")
  }

  test("a16: grouping sets expand to 3 projections, not a cube lattice") {
    // The point of explicit sets is paying for exactly the groupings
    // asked for: the Expand must carry 3 projections ((p,s),(p),()) —
    // a 4-projection Expand means the query silently regressed to cube.
    val df = Relational.queries("a16_grouping_sets")(spark, sfDir)
    val expand = df.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e
      }.headOption.getOrElse(fail("no ExpandExec in the grouping-sets plan"))
    assert(expand.projections.length == 3,
      s"expected 3 grouping projections, got ${expand.projections.length}")
  }

  test("w14/w15: the rank and value windows partition by their keys") {
    // Same scale claim as w12/w13: per-key linear window maintenance; an
    // unpartitioned window serializes the corpus through one task.
    for ((name, key) <- Seq("w14_rank_family" -> "source",
                            "w15_value_windows" -> "event_type")) {
      val df = Relational.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(s"hashpartitioning($key"),
        s"$name window not partitioned by $key:\n$plan")
      val windowLine = plan.linesIterator.find(_.contains("Window ")).getOrElse("")
      assert(!windowLine.contains("SinglePartition"),
        s"$name window runs on one partition:\n$plan")
    }
  }

  test("e3: the ANN top-k cut is a bounded-state aggregate, not a rank window") {
    // The scored set is |queries| x corpus rows; a row_number window
    // partitioned by q_id would shuffle ALL of them into |queries|
    // partitions and sort (the 100 TB failure mode the r9 topKCut
    // replaced). The plan must carry the top_k_pairs ObjectHashAggregate
    // with a partial (map-side) phase and no Window over the scored set.
    val df = graft.operators.TextPipeline.queries("e3_ann_topk")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("top_k_pairs"),
      s"e3 lost the bounded top-k aggregate:\n$plan")
    assert(plan.contains("ObjectHashAggregate") &&
      plan.contains("partial_top_k_pairs"),
      s"e3 top-k has no map-side partial phase:\n$plan")
    assert(!plan.contains("Window "),
      s"a rank window crept back into e3:\n$plan")
  }

  test("a18/x24: the sketch cuts are the bounded aggregate with a partial phase") {
    // Both sketches claim bounded per-group state: the bottom-k sample
    // (a18) and the weighted reservoir (x24) must cut with top_k_pairs
    // carrying a map-side partial phase — a rank window would shuffle the
    // corpus into |groups| partitions, exactly what the sketch family
    // exists to avoid. a18's only window runs over the k-row samples
    // (post-cut), so the pre-cut plan region must be window-free.
    for (name <- Seq("a18_bottomk_quantiles", "x24_weighted_sample")) {
      val df =
        if (name.startsWith("a18")) Relational.queries(name)(spark, sfDir)
        else graft.operators.TextPipeline.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_top_k_pairs"),
        s"$name cut has no map-side partial phase:\n$plan")
    }
  }

  test("d12: the duplicated-span membership probe is a broadcast join") {
    // The span stream is 2x corpus chars; probing it against the small
    // duplicated-span set must broadcast WHILE the corpus fits the size
    // gate — a lost hint would shuffle the whole span stream on the
    // 64-char span key while staying hash-green on testdata.
    val df = graft.operators.TextPipeline.queries("d12_span_dedup")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("span")),
      s"d12 span probe is not a broadcast join:\n$plan")
  }

  test("d12: past the size budget the span probe falls back off-broadcast") {
    // The dup-span set is corpus-derived and unbounded (r10 finding #1):
    // a zero byte budget must force the pinned sort-merge shape — no
    // broadcast anywhere on the span key — and the rows must be
    // IDENTICAL to the broadcast path (the fallback is a plan change,
    // never a semantics change).
    import graft.operators.TextPipeline
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val fb = TextPipeline.spanDedup(docs, broadcastSpanBytes = 0L)
    val plan = fb.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("span")),
      s"d12 fallback still broadcasts the dup-span set:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"d12 fallback lost the pinned merge join:\n$plan")
    val bc = TextPipeline.spanDedup(docs).orderBy(col("doc_id")).collect().toSeq
    assert(fb.orderBy(col("doc_id")).collect().toSeq == bc,
      "d12 fallback rows differ from the broadcast path")
  }

  test("d8: past the size budget the corpus index probes via Bloom + merge anti-join") {
    // r10 finding #2: the corpus hash index scales with the corpus, so
    // past the budget the broadcast anti-join must become the x11 shape —
    // a bounded Bloom sketch rejects definitely-fresh rows, and only the
    // might-contain remainder anti-joins the index through a pinned
    // sort-merge join. Rows identical to the broadcast path.
    import graft.operators.TextPipeline
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val fb = TextPipeline.incrementalDedup(docs, broadcastIndexBytes = 0L)
    val plan = fb.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastHashJoin"),
      s"d8 fallback still broadcasts the corpus index:\n$plan")
    assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"),
      s"d8 fallback lost the merge anti-join:\n$plan")
    assert(plan.contains("might_contain"),
      s"d8 fallback lost the Bloom prefilter:\n$plan")
    val bc = TextPipeline.incrementalDedup(docs).orderBy(col("doc_id")).collect().toSeq
    assert(fb.orderBy(col("doc_id")).collect().toSeq == bc,
      "d8 fallback rows differ from the broadcast path")
  }

  test("w10: the per-group top-k cut is the bounded aggregate, one scan, no window") {
    // Five market segments means a rank window would funnel corpus/5 rows
    // per partition; the r9 shape is top_k_pairs (partial map-side phase)
    // with the balance reconstructed exactly from the e2 score — no
    // second customer scan, no join-back.
    val df = Relational.queries("w10_topk_per_group")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_pairs"),
      s"w10 top-k has no map-side partial phase:\n$plan")
    assert(!plan.contains("Window "),
      s"a rank window crept back into w10:\n$plan")
    assert(!plan.contains("Join"),
      s"w10 re-grew a join it does not need:\n$plan")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"w10 scans customer more than once:\n$plan")
  }

  test("e9: the ADC scan cuts with the bounded aggregate and re-ranks via broadcast") {
    // The PQ search's corpus-sized stage is the ADC code-table scan; its
    // candidate cut must be the bounded top_k_pairs aggregate (partial
    // map-side phase), and the surviving <= k*rerank candidates re-rank
    // through broadcast join-backs — never a corpus-wide rank window.
    val df = graft.operators.TextPipeline.queries("e9_pq_search")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_pairs"),
      s"e9 ADC cut lost its map-side partial phase:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"e9 candidate join-back is not broadcast:\n$plan")
  }

  test("e12: the SQ8 scan cuts with the bounded aggregate and re-ranks via broadcast") {
    // The scalar-quantization scan is corpus-sized: its cut must be the
    // bounded top_k_pairs aggregate (map-side partial phase) and the
    // survivors re-rank through broadcast join-backs — never a
    // corpus-wide rank window. The quantizer bounds travel as kernel
    // constants, so no extra join or broadcast may appear for them.
    val df = graft.operators.TextPipeline.queries("e12_sq8_search")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_pairs"),
      s"e12 SQ8 cut lost its map-side partial phase:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"e12 candidate join-back is not broadcast:\n$plan")
    assert(plan.contains("sq8_dist"),
      s"e12 scan does not evaluate the sq8_dist kernel:\n$plan")
  }

  test("e11: the composed IVF+PQ ADC scan touches only probed lists via a cid hash join") {
    // The composition's whole point at 100 TB: the code-table scan must be
    // a hash join keyed on the list id against the broadcast probe set —
    // touching nprobe/nlist of the corpus — never pqSearch's full-corpus
    // crossJoin. The only nested-loop joins allowed are the two
    // centroid-bounded crosses (rows × nlist broadcast centroids: the
    // probe stage and the IVF assignment scan), never a corpus × corpus
    // shape, and the cut stays the bounded top_k_pairs aggregate.
    val df = graft.operators.TextPipeline.queries("e11_ivfpq_search")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin \\[cid".r.findFirstIn(plan).isDefined,
      s"e11 ADC scan is not a cid-keyed hash join against the probe set:\n$plan")
    assert(plan.contains("partial_top_k_pairs"),
      s"e11 ADC cut lost its map-side partial phase:\n$plan")
    // Count LIVE nested-loop joins by tree traversal, not by string: the
    // executedPlan STRING also dumps every cached InMemoryRelation's build
    // lineage (whose corpus × nlist assignment cross is fine — it ran once
    // at index build), and AQE prints each such subtree twice
    // (initial + final), so a line count sees phantom crosses. sparkPlan
    // traversal stops at InMemoryTableScan leaves: only joins this query
    // will actually execute are counted.
    val bnlj = df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.size
    assert(bnlj <= 2,
      s"e11 grew a cross join beyond the two centroid-bounded ones (found $bnlj):\n$plan")
  }

  test("s1: filter and projection reach the parquet scan") {
    // Pushdown evidence for the scan path: the parquet scan must carry
    // pushed filters and a pruned read schema, not read-everything-filter-
    // later.
    val df = Relational.queries("s1_scan_prune")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Scan parquet")).mkString("\n")
    assert(scan.contains("PushedFilters: [") && !scan.contains("PushedFilters: []"),
      s"no pushed filters on the scan:\n$scan")
  }

  test("calendar windows: every unpartitioned window runs on post-aggregation input") {
    // The W-family time-series queries use Window.orderBy with no
    // partition key — defensible ONLY because their input is a per-day /
    // per-month aggregate whose cardinality is calendar-bounded (at 100×
    // the data the day count is unchanged). This guard pins that defense:
    // if an edit ever slides a raw-corpus frame under one of these specs,
    // the unpartitioned window would sit directly on a scan and this
    // fails — before the single-partition stage ships to a cluster.
    // This is a guard over EVERY query, not a fixed-name list: any query
    // whose optimized plan contains an unpartitioned Window must either
    // (a) feed it from an Aggregate (per-day/per-month series), or
    // (b) scan only the repo-local converted-reference panel fixture
    //     (data/panel — the reference's own Excel-derived dataset, a few
    //     hundred rows by construction, independent of sfDir).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, Window => LWindow}
    var found = 0
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      val unpartitioned = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      for (w <- unpartitioned) {
        found += 1
        val aggBelow = w.child.collectFirst { case a: Aggregate => a }.isDefined
        val fixtureOnly = {
          val leaves = w.child.collect { case l: LeafNode => l }
          leaves.nonEmpty && leaves.forall {
            case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
              lr.relation match {
                case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                  fs.location.rootPaths.forall(_.toString.contains("data/panel"))
                case _ => false
              }
            case _ => false
          }
        }
        assert(aggBelow || fixtureOnly,
          s"$name: unpartitioned window over NON-aggregated, non-fixture " +
            s"input — this ships the raw corpus into one partition at scale:\n$w")
      }
    }
    // The time-series family guarantees some hits; zero means the plan
    // walk itself broke (wrong node class after a Spark upgrade, say).
    assert(found >= 5, s"expected calendar windows in the corpus, found $found")
  }

  test("s13: the asset directory is written once and re-scanned on later calls") {
    // s13's write-once-per-sfDir cache (the ingest-pays-once shape): a
    // second call must scan the SAME asset files — not rewrite a fresh
    // directory — and return identical rows. inputFiles identity is the
    // observable: a broken cache yields a fresh UUID directory whose
    // paths differ even though the rows still hash green.
    val first = Relational.queries("s13_binary_ingest")(spark, sfDir)
    val second = Relational.queries("s13_binary_ingest")(spark, sfDir)
    assert(first.inputFiles.nonEmpty, "s13 scan reports no input files")
    assert(first.inputFiles.toSet == second.inputFiles.toSet,
      "second s13 call re-wrote the asset directory instead of re-scanning")
    assert(first.collect().toSeq == second.collect().toSeq)
  }

  test("a9 vs a17: the two HLL estimates agree within combined error bounds") {
    // a9 (engine-native HLL++, rsd 1%) is rows-only at the driver — its
    // xxHash64/bias-table internals can't be replayed in DuckDB — so this
    // is its audit: on the SAME column and grouping, a9's estimate and
    // a17's relational m=256 sketch (se ~ 1.04/sqrt(256) = 6.5%) must
    // land within z=3 of each other relative to the exact count a17
    // carries. A drift in either implementation (a Spark upgrade moving
    // HLL++ internals, a broken a17 register law) breaks the agreement
    // long before it breaks rows-only.
    val s = spark
    import org.apache.spark.sql.functions.col
    val a9 = Relational.queries("a9_approx_distinct")(s, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a17 = Relational.queries("a17_hll_sketch")(s, sfDir)
      .select(col("l_returnflag"), col("est_e6"), col("n_exact"))
      .collect().map(r => r.getString(0) -> (r.getLong(1) / 1e6, r.getLong(2))).toMap
    assert(a9.keySet == a17.keySet)
    val bound = 3.0 * math.sqrt(0.065 * 0.065 + 0.01 * 0.01)
    a17.foreach { case (flag, (est17, exact)) =>
      val diff = math.abs(a9(flag) - est17) / exact.toDouble
      assert(diff <= bound,
        s"flag $flag: |a9=${a9(flag)} - a17=$est17| / exact=$exact = $diff > $bound")
    }
  }

  test("a22 count-min: every probe's estimate is >= the exact count (one-sided error law)") {
    // Count-Min's DETERMINISTIC half: collisions only ADD, so the min
    // across rows can never fall below the true frequency — an
    // underestimate means a register was dropped or a probe hashed to a
    // bucket its increments didn't, i.e. the build and probe sides of
    // fmix32(4u + r) % w drifted apart. (The <= eps*N half is
    // probabilistic and belongs to the oracle's fixed dataset, not here.)
    val out = Relational.queries("a22_countmin")(spark, sfDir)
      .collect()
    assert(out.length == 10, s"expected the exact top-10 probes, got ${out.length}")
    out.foreach { r =>
      val (exact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("cm_est"))
      assert(est >= exact,
        s"user ${r.get(0)}: cm_est=$est underestimates n_exact=$exact")
      assert(r.getAs[Long]("overestimate") == est - exact)
    }
  }

  test("a19 kmv: a group under k distinct values reports the exact count; estimate lands in bounds") {
    // The n_sample < k branch no driver group exercises (all driver
    // groups hold 200+ distinct partkeys): 10 distinct values in one
    // group and 70 in another through the same kernel — the small group
    // must report exactly 10 at e6 scale, the large one the formula
    // estimate within the KMV z=3 relative bound ~3/sqrt(k-2).
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1 to 40).map(i => ("small", (i % 10) + 1L)) ++
      (1 to 210).map(i => ("large", (i % 70) * 9973L + 17L))
    val df = rows.toDF("g", "v")
    val out = Relational.kmvDistinct(df, "g", "v", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("small") == ((10L, 10000000L, 10L)),
      s"small group not exact: ${out("small")}")
    val (ns, est, exact) = out("large")
    assert(ns == 64L && exact == 70L)
    val rel = math.abs(est / 1e6 - exact) / exact
    assert(rel <= 3.0 / math.sqrt(62.0),
      s"large-group estimate ${est / 1e6} vs exact $exact: rel err $rel")
  }

  test("g8 seedDistance: exact hops on a hand graph, identical under both join strategies") {
    // A path 1→2→3→4 plus isolated 5 (self-loop-free, symmetric by
    // listing both directions), seed {1}: distances must be 0,1,2 and
    // then the sentinel — node 4 is 3 hops away but rounds=2 can only
    // certify ≤ 2, so it must stay 999 (the bounded-rounds contract),
    // and 5 never receives mail. Zero broadcast budget must produce
    // the SAME rows through the shuffle fallback.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val seeds = Seq(1L).toDF("node")
    val got = GraphOps.seedDistance(edges, nodes, seeds, rounds = 2)
      .orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 999L,
      5L -> 999L), s"hand-graph distances wrong: $got")
    val fb = GraphOps.seedDistance(edges, nodes, seeds, rounds = 2,
        bcastNodeBudget = 0L)
      .orderBy(col("node")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fb == got, "seedDistance rows differ between join strategies")
  }

  test("g12 weightedSeedDistance: weight-shortest beats hop-shortest on the planted graph") {
    // The judge-prescribed planted case: seed 1 reaches node 4 directly
    // (1 hop, cost 10) or via 2→3 (3 hops, cost 1+1+1 = 3). Hop-BFS
    // (g8's kernel) certifies the 1-hop route; the min-plus fold must
    // pick the CHEAPER 3-edge route — but only once rounds ≥ 3, so the
    // bounded-rounds contract is visible too: at rounds=2 node 4 holds
    // the direct cost 10 (best ≤2-edge path), at rounds=3 it relaxes to
    // 3. Node 5 is isolated and keeps the sentinel; zero broadcast
    // budget must reproduce the same rows through the shuffle fallback.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val ew = Seq((1L, 4L, 10L), (4L, 1L, 10L),
      (1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L),
      (3L, 4L, 1L), (4L, 3L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val seeds = Seq(1L).toDF("node")
    def run(rounds: Int, budget: Long = 4L * 1000 * 1000) =
      GraphOps.weightedSeedDistance(ew, nodes, seeds, rounds, budget)
        .orderBy(col("node")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(2) == Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 10L,
      5L -> 999999999L), s"rounds=2 must hold the best <=2-edge cost: ${run(2)}")
    val at3 = run(3)
    assert(at3 == Seq(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 999999999L), s"rounds=3 must relax to the cheap 3-edge route: $at3")
    assert(run(3, budget = 0L) == at3,
      "weightedSeedDistance rows differ between join strategies")
  }

  test("g13 seedBetweenness: chain dependencies and diamond sigma-splits on hand graphs") {
    // Two hand graphs pin the two Brandes mechanics:
    //  - CHAIN 1–2–3–4–5, seed {1}, rounds=3: σ ≡ 1, so dependencies
    //    telescope — δ(4) = 0 (frontier edge), δ(3) = 1·(1+0) = 1e12,
    //    δ(2) = 1·(1+δ3) = 2e12; node 5 is beyond the round bound and
    //    absorbs nothing.
    //  - DIAMOND 1–2–4, 1–3–4, seed {1}: σ(4) = 2 (two shortest paths),
    //    so each middle node carries HALF the unit: δ(2) = δ(3) =
    //    ⌊1·1e12/2⌋ = 5e11, δ(4) = 0 — the σ-ratio split a chain can't
    //    exercise.
    // Both identical under the broadcast and shuffle join paths.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    def sym(es: Seq[(Long, Long)]) = (es ++ es.map(_.swap)).toDF("src", "dst")
    def run(edges: org.apache.spark.sql.DataFrame, nodes: Seq[Long],
        budget: Long = 4L * 1000 * 1000) =
      GraphOps.seedBetweenness(edges, nodes.toDF("node"), Seq(1L).toDF("node"),
          rounds = 3, budget)
        .orderBy(col("node")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val chain = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val got = run(chain, Seq(1L, 2L, 3L, 4L, 5L))
    assert(got == Seq(2L -> 2000000000000L, 3L -> 1000000000000L, 4L -> 0L),
      s"chain dependencies wrong: $got")
    assert(run(chain, Seq(1L, 2L, 3L, 4L, 5L), budget = 0L) == got,
      "seedBetweenness rows differ between join strategies")
    val diamond = sym(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)))
    val gd = run(diamond, Seq(1L, 2L, 3L, 4L))
    assert(gd == Seq(2L -> 500000000000L, 3L -> 500000000000L, 4L -> 0L),
      s"diamond sigma-split wrong: $gd")
  }

  test("g14 ktruss: K4 survives 4-truss peeling, the pendant triangle and chain peel off") {
    // Hand graph = K4 on {1,2,3,4} + a triangle {4,5,6} sharing node 4
    // + a pendant chain 6-7-8. Round 0: 9 undirected edges, 8 nodes.
    // 4-truss (support ≥ 2): every K4 edge sits in exactly 2 triangles
    // whose edges are all K4-internal → survives every round; each
    // {4,5,6} triangle edge sits in exactly 1 triangle → peels in
    // round 1; chain edges have support 0 → peel too. Fixpoint after
    // round 1 = the K4: (6 edges, 4 nodes), unchanged in rounds 2-3 —
    // the "dense bundle survives, hub-glued appendages don't"
    // behavior that distinguishes a truss from g4's raw counts.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L), (7L, 8L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.ktruss(sym, rounds = 3, minSupport = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0, 11L, 8L), (1, 6L, 4L), (2, 6L, 4L), (3, 6L, 4L)),
      s"ktruss peeling trajectory wrong: $got")
  }

  test("g1 pageRank: rank joins broadcast under the node budget, shuffle past it, same rows") {
    // The superstep join's size gate: while the node count fits the
    // budget the rank vector broadcasts (the measured-faster shape —
    // one shuffle per superstep); a zero budget must force the shuffle
    // fallback with NO broadcast of the rank vector, and the final
    // ranks must be IDENTICAL — the integer fixpoint cannot depend on
    // the join strategy.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    // A small cyclic graph with an isolated node (5 has no edges).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val bc = GraphOps.pageRank(edges, nodes, iters = 3)
    val fb = GraphOps.pageRank(edges, nodes, iters = 3, bcastNodeBudget = 0L)
    val bcPlan = bc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val fbPlan = fb.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(bcPlan.contains("BroadcastHashJoin"),
      s"g1 under-budget run lost the broadcast rank join:\n$bcPlan")
    assert(!bcPlan.contains("SortMergeJoin"),
      s"g1 under-budget run shuffles a rank join:\n$bcPlan")
    // The fallback pins hint("shuffle_hash") on BOTH joins of every
    // superstep (auto-broadcast would otherwise kick in on tiny test
    // frames and the gate would test nothing): 2 × iters shuffled hash
    // joins, and NO per-round sort-merge (the r14 A/B: SMJ's per-round
    // sorts cost 2× at the ×64 graph).
    val shj = "ShuffledHashJoin".r.findAllIn(fbPlan).size
    assert(shj >= 6, s"g1 zero-budget run has $shj shuffled-hash joins, want 6:\n$fbPlan")
    assert(!fbPlan.contains("SortMergeJoin"),
      s"g1 zero-budget run fell back to sort-merge:\n$fbPlan")
    val a = bc.orderBy(col("node")).collect().toSeq
    val b = fb.orderBy(col("node")).collect().toSeq
    assert(a == b, "pageRank rows differ between join strategies")
    // Connectivity sanity: node 1 (most in-edges) outranks the isolated
    // node 5, which holds exactly the base mass.
    val rank = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rank(1L) > rank(5L))
    assert(rank(5L) == 150000000000L / 5)
  }

  test("g2 personalized: mass reaches only the seed component; unreachable nodes stay zero") {
    // The property separating personalization from uniform PageRank:
    // teleport mass lands only on seeds, so a component with no path
    // from any seed holds EXACTLY zero rank after any number of
    // supersteps — while in g1's uniform variant every node holds at
    // least the base mass.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val seeds = Seq(1L).toDF("node")
    val rank = GraphOps.personalizedPageRank(edges, nodes, seeds, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rank(3L) == 0L && rank(4L) == 0L,
      s"unreachable component earned rank: $rank")
    assert(rank(1L) > rank(2L) && rank(2L) > 0L,
      s"seed component mass distribution wrong: $rank")
  }

  test("supersteps checkpointEvery: deep iteration cuts lineage, ranks bit-identical to the pure plan") {
    // VERDICT r11 #4 — the deep-iteration contract made real: without
    // cuts the unrolled plan grows 2 joins per superstep without bound;
    // with checkpointEvery the plan above the last cut is bounded, and
    // the all-integer fixpoint must make the result BIT-identical to the
    // pure plan (a checkpoint can't change arithmetic).
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    // Agreement where both spellings are tractable: iters=6.
    val pure6 = GraphOps.pageRank(edges, nodes, iters = 6)
      .orderBy(col("node")).collect().toSeq
    val ck6 = GraphOps.pageRank(edges, nodes, iters = 6, checkpointEvery = 2)
      .orderBy(col("node")).collect().toSeq
    assert(ck6 == pure6,
      s"checkpointed ranks diverge from the pure plan at iters=6:\n$ck6\n$pure6")
    // Depth: iters=20, cut every 3 — at most 2 supersteps can sit above
    // the last checkpoint: 2 rank joins each, plus the ew degree
    // derivation (uncached here; the driver queries persist it) = 6
    // joins max, where the pure plan would carry 60.
    val deep = GraphOps.pageRank(edges, nodes, iters = 20, checkpointEvery = 3)
    val plan = deep.queryExecution.optimizedPlan.toString
    val joins = "Join".r.findAllIn(plan).size
    assert(joins <= 6, s"deep run's plan kept $joins joins above the cut:\n$plan")
    assert(plan.contains("LogicalRDD"),
      s"deep run's plan shows no checkpoint scan:\n$plan")
    val deepRanks = deep.orderBy(col("node")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // The isolated node's rank is exactly the base mass at ANY depth,
    // and a second independent deep run replays bit-exactly.
    assert(deepRanks(5L) == 150000000000L / 5)
    val deep2 = GraphOps.pageRank(edges, nodes, iters = 20, checkpointEvery = 3)
      .orderBy(col("node")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deep2 == deepRanks, "deep checkpointed run is not deterministic")
  }

  test("g4 triangleParticipation: K4 corners sit in 3 triangles each; the pendant path in none") {
    // Planted graph: a 4-clique on {1,2,3,4} (4 triangles, each corner
    // in C(3,2) = 3 of them) plus a pendant path 4-5-6 that closes
    // nothing. The count must be identical under the broadcast dim and
    // the merge-hint fallback — triangle counting cannot depend on the
    // join strategy.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.{broadcast, col}
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    def run(dim: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      GraphOps.triangleParticipation(edges, dim)
        .orderBy(col("node")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val bc = run(d => broadcast(d))
    assert(bc == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 participation wrong: $bc")
    assert(run(d => d.hint("merge")) == bc,
      "triangle counts differ between join strategies")
  }

  test("g5 commonNeighbors: star leaves pair through the hub; adjacent pairs are excluded") {
    // Planted graph: hub 1 linked to leaves {10, 11, 12} — every leaf
    // pair shares exactly the hub and is NOT adjacent, so all three
    // pairs score cn = 1 — plus a triangle {20, 21, 22} whose pairs all
    // share a neighbor but ARE adjacent, so the anti-join must drop
    // them. Hub-leaf pairs are adjacent too; cross-component pairs
    // share nothing.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.{broadcast, col}
    val s = spark
    import s.implicits._
    val und = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (20L, 21L), (20L, 22L), (21L, 22L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = GraphOps.commonNeighbors(edges, d => broadcast(d))
      .orderBy(col("u"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((10L, 11L, 1L), (10L, 12L, 1L), (11L, 12L, 1L)),
      s"star link-prediction candidates wrong: $out")
  }

  test("g6 kcore: the pendant path peels over cascading rounds; the K4 core survives") {
    // Planted graph: K4 on {1,2,3,4} plus a pendant path 4-5-6-7. Under
    // k = 2 the path must peel one node per SYNCHRONOUS round from the
    // tail in (7, then 6, then 5) — so rounds = 2 still shows node 5 at
    // residual degree 1 (pinning the fixed-unroll contract: the readout
    // is the state after exactly `rounds` peels), while rounds = 4
    // reaches the fixpoint: the K4 alone, every corner at in-core
    // degree 3. Identical under broadcast and merge-hint keep-set joins.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.{broadcast, col}
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    def run(rounds: Int,
        dim: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      GraphOps.kcore(edges, k = 2, rounds = rounds, dim)
        .orderBy(col("node")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val converged = run(4, d => broadcast(d))
    assert(converged == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"k=2 core of K4+path wrong: $converged")
    assert(run(4, d => d.hint("merge")) == converged,
      "kcore differs between join strategies")
    val mid = run(2, d => broadcast(d))
    assert(mid == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L),
      s"2-round partial peel wrong: $mid")
  }

  test("e19 range search: the threshold is the cut — no top-k state, only the probe window") {
    // Range search's defining plan property: the radius predicate
    // replaces ALL rank machinery. The executed plan must carry no
    // top_k_pairs aggregate and no window over the corpus-sized scored
    // set — the only window allowed is the probe-selection crank, which
    // ranks the nlist-bounded (query × centroid) frame, never
    // candidates. A regression that reintroduces a per-query cut would
    // stay hash-green (the filter subsumes it) while re-adding the
    // shuffle-and-sort this operator exists to avoid.
    val df = graft.operators.TextPipeline.queries("e19_range_search")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("top_k_pairs"),
      s"e19 grew a top-k aggregate:\n$plan")
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows <= 1, s"e19 has $windows windows, want only the probe crank:\n$plan")
    // And the rows really are variable-cardinality per query (the
    // behavior that distinguishes range from top-k on this data).
    val counts = df.groupBy(org.apache.spark.sql.functions.col("q_id"))
      .count().collect()
      .map(r => r.getLong(1)).toSet
    assert(counts.size > 1, s"range search returned fixed-size sets: $counts")
  }

  test("g7 minLabelComponents: the min floods one hop per round; components get their min id") {
    // Planted graph: triangle {5,6,7} and path 10-11-12-13. The flood
    // is synchronous — label 10 reaches node 13 only at round 3 — so
    // iters = 2 must show node 13 still holding 11 (pinning the
    // fixed-unroll contract), while iters = 3 reaches the fixpoint:
    // every node labeled by its component's minimum id. Identical under
    // both join strategies.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.{broadcast, col}
    val s = spark
    import s.implicits._
    val und = Seq((5L, 6L), (5L, 7L), (6L, 7L),
      (10L, 11L), (11L, 12L), (12L, 13L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = edges.select(col("src").as("node")).distinct()
    def run(iters: Int, budget: Long) =
      GraphOps.minLabelComponents(edges, nodes, iters, budget)
        .orderBy(col("node")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val fix = run(3, 4L * 1000 * 1000)
    assert(fix == Seq(5L -> 5L, 6L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L),
      s"component fixpoint wrong: $fix")
    assert(run(3, 0L) == fix, "components differ between join strategies")
    val partial = run(2, 4L * 1000 * 1000)
    assert(partial.toMap.apply(13L) == 11L,
      s"synchronous flood semantics broken (13 should still hold 11): $partial")
  }

  test("a21 neymanSample: a zero-variance stratum gets nothing; a volatile one caps at its size") {
    // Two strata: "flat" (100 rows, constant 5.00 → sigma = 0 → weight 0
    // → allocation 0, rate 0, nothing sampled — and the greatest()
    // guard must keep the FP-cancelled variance from going sqrt(NaN))
    // and "wild" (50 rows alternating 0.00/100.00 → sigma = 5000 cents
    // exactly). Wild carries ALL the weight, so its Neyman share is the
    // whole 10000 budget — which the least() cap must clamp to its 50
    // rows, giving rate 1e6 ppm and a fully-realized sample of 50.
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val flat = (0 until 100).map(i => ("flat", i.toLong, 5.00))
    val wild = (0 until 50).map(i =>
      ("wild", 1000L + i, if (i % 2 == 0) 0.00 else 100.00))
    val out = graft.operators.Relational
      .neymanSample((flat ++ wild).toDF("event_type", "event_id", "value"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq
    assert(out == Seq(
      ("flat", 100L, 0L, 0L, 0L, 0L),
      ("wild", 50L, 5000000L, 50L, 1000000L, 50L)),
      s"Neyman allocation wrong: $out")
  }

  test("w20: one hash exchange — the daily agg and per-key window both ride the key repartition") {
    // The single-shuffle claim: after the up-front repartition on the
    // key, the (key, day) aggregation (subset rule) and the per-key
    // running-sum window need no further exchange. A regression to the
    // naive plan re-adds a second hash exchange — hash-green, ~15%
    // slower at sf0.1, and 2× the shuffled bytes at 100 TB.
    val plan = Relational.queries("w20_interval_sweep")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 1, s"w20 has $hashEx hash exchanges, want 1:\n$plan")
  }

  test("j14: the interval overlap join is an equi-join on (key, cell), never a nested loop") {
    // The at-scale claim: the bare overlap predicate has no equi key
    // and Catalyst would nested-loop it (corpus²). The cell explode
    // must give the planner a hash-joinable key — a regression to
    // BroadcastNestedLoopJoin/CartesianProduct stays hash-green on
    // testdata while being quadratic at 100 TB.
    val plan = Relational.queries("j14_interval_overlap_join")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"j14 fell back to a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"j14 shows no hash-keyed join:\n$plan")
  }

  test("m25: the horizon lead join is hash-keyed on date_add, only the 9-row fanout nested-loops") {
    // The at-scale claim on the entry: `b.d1 = date_add(a.d0, h)` must
    // reach the planner as an extractable equi-key (hash/SMJ), not a
    // calendar² nested loop. The ONE allowed nested-loop is the
    // intentional bounded ×9 horizons crossJoin (broadcast of a 9-row
    // range) — more than one, or any CartesianProduct, means the lead
    // join regressed to quadratic.
    val plan = graft.operators.Estimation
      .queries("m25_local_projection")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"m25 shows a CartesianProduct:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      s"m25 shows more than the one bounded horizons nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"m25's lead join is not hash-keyed:\n$plan")
  }

  test("x29 vocab gate: broadcast under the budget, pinned sort-merge past it, same rows") {
    // The encode join's size gate (the d12 convention): under-budget
    // runs broadcast the vocab lookup; a zero budget must pin the
    // sort-merge fallback with NO broadcast of the vocab side — and the
    // per-doc counts must be identical, because a gate that changes
    // results is worse than no gate.
    import graft.operators.TextPipeline
    import graft.sources.Tables
    import org.apache.spark.sql.functions.col
    val (_, vocab) = TextPipeline.bpeTrainedFor(spark, sfDir, 6)
    val docs = Tables.documents(spark, sfDir)
    val bc = TextPipeline.bpeDocTokenCounts(docs, vocab)
    val fb = TextPipeline.bpeDocTokenCounts(docs, vocab,
      broadcastVocabBytes = 0L)
    val bcPlan = bc.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(bcPlan.contains("BroadcastHashJoin"),
      s"under-budget encode join lost the broadcast:\n$bcPlan")
    val fbPlan = fb.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(fbPlan.contains("SortMergeJoin"),
      s"zero-budget encode join did not pin sort-merge:\n$fbPlan")
    val a = bc.orderBy(col("doc_id")).collect().toSeq
    val b = fb.orderBy(col("doc_id")).collect().toSeq
    assert(a == b, "encode join rows differ between gate paths")
    assert(a.nonEmpty && a.exists(_.getLong(3) > 0),
      "encode produced no BPE tokens — the gate test would be vacuous")
  }

  test("g1/g3 off the cached graph: per-superstep aggregations are exchange-free") {
    // The r12 A/B win, pinned: the co-purchase edge cache is
    // repartitioned on dst at build time, so every superstep's
    // aggregation (rank inflow by dst; LPA counts by (dst, lbl) — a
    // superset of the partition key — and the per-dst argmax) is
    // satisfied by the cached partitioning and inserts NO exchange.
    // Only the bounded readout (one-group top-20 cut + display sort)
    // may shuffle. A regression re-adds one exchange per superstep —
    // still hash-green, ~25% slower at sf0.1.
    // The precise invariant: NO exchange hash-partitions on dst — the
    // per-superstep aggregation keys are served by the cache. The
    // remaining exchanges are the bounded readout (rank sort, one-group
    // cut, |nodes|-sized community sizes) and the one-time cache build
    // printed inside the InMemoryRelation subtree.
    // The invariant is on PLANNER-INSERTED exchanges
    // (ENSURE_REQUIREMENTS): a regression makes the planner shuffle a
    // superstep aggregation on dst. The cache build's own explicit
    // repartition prints as REPARTITION_BY_COL — and since the r13
    // per-round localCheckpoint materializes the cache eagerly during
    // query construction, the InMemoryRelation subtree (cache build
    // included) is now visible in the final plan string, so the checks
    // key on the exchange ORIGIN tag rather than bare substrings.
    import graft.operators.GraphOps
    for (q <- Seq("g1_copurchase_pagerank", "g3_label_propagation")) {
      val plan = GraphOps.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val planned = plan.linesIterator
        .filter(_.contains("ENSURE_REQUIREMENTS")).toSeq
      // The sharp invariant: no planner-inserted exchange keyed on dst
      // (the superstep aggregation keys are dst and (dst, lbl) — a
      // regression shuffles one per superstep). The visible cache-build
      // interior legitimately shuffles on (src, dst)/src once.
      assert(!planned.exists(_.contains("hashpartitioning(dst")),
        s"$q re-shuffles a superstep aggregation on dst:\n$plan")
      assert(planned.size <= 7,
        s"$q plan has ${planned.size} planner-inserted exchanges " +
          s"(readout ≤ 4 + the one-time cache-build interior ≤ 3):\n$plan")
    }
  }

  test("g3 labelPropagation: planted communities converge to their min label; isolated node keeps its own") {
    // Two disjoint triangles must each converge to ONE label (their
    // minimum node id, by the deterministic tie-break) and stay
    // distinct from each other; a node with no edges keeps the identity
    // label at any depth. Also pins broadcast-vs-shuffle row equality —
    // the same gate contract as g1.
    import graft.operators.GraphOps
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    def tri(a: Long, b: Long, c: Long) =
      Seq((a, b), (b, a), (b, c), (c, b), (a, c), (c, a))
    val edges = (tri(1L, 2L, 3L) ++ tri(10L, 11L, 12L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L).toDF("node")
    val lbl = GraphOps.labelPropagation(edges, nodes, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(lbl(1L), lbl(2L), lbl(3L)).size == 1,
      s"triangle A did not converge: $lbl")
    assert(Set(lbl(10L), lbl(11L), lbl(12L)).size == 1,
      s"triangle B did not converge: $lbl")
    assert(lbl(1L) != lbl(10L), s"disjoint communities merged: $lbl")
    assert(lbl(1L) == 1L && lbl(10L) == 10L,
      s"communities did not settle on their min label: $lbl")
    assert(lbl(99L) == 99L, s"isolated node lost its label: $lbl")
    val fb = GraphOps.labelPropagation(edges, nodes, iters = 4,
        bcastNodeBudget = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fb == lbl, "LPA rows differ between join strategies")
  }

  test("e18: compaction physically applies tombstones — same answers, no runtime filter") {
    // The delete half of the index lifecycle (VERDICT r11 #5): serving
    // the compacted lists must (a) answer exactly what tombstone-
    // FILTERED serving on the full lists answers, and (b) carry no
    // runtime trace of the kill set — no anti-join, no tombstone scan,
    // reading only the compacted generation. A regression to filtering
    // at query time would still be hash-green but pay the anti-join on
    // every search at 100 TB.
    import graft.operators.AnnIndex
    import graft.sources.Tables
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sfDir)
    val dead = emb.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
    val nDead = dead.count()
    assert(nDead > 0, "kill set empty — the test would be vacuous")
    val cdir = AnnIndex.compactedIvfFor(spark, sfDir, emb,
      nlist = 16, iters = 2, dead = dead, tag = "mod7eq3")
    val srcDir = AnnIndex.savedIvfFor(spark, sfDir, emb,
      nlist = 16, iters = 2)
    val surviving = emb.filter(col("vec_id") % 7 =!= 3).select(col("vec_id"))
    val tomb = AnnIndex.ivfSearch(AnnIndex.loadIvf(spark, srcDir),
        col("vec_id") < 3, k = 3, nprobe = 4, candidates = Some(surviving))
      .orderBy(col("q_id"), col("rank")).collect().toSeq
    assert(tomb.nonEmpty, "tombstone-filtered serving returned nothing")
    val comp = AnnIndex.ivfSearch(AnnIndex.loadIvf(spark, cdir),
      col("vec_id") < 3, k = 3, nprobe = 4)
    val plan = comp.queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"),
      s"compacted serving still anti-joins a kill set:\n$plan")
    assert(!plan.contains("tombstones"),
      s"compacted serving still scans the tombstone table:\n$plan")
    // r16: compacted artifacts live under the managed ann scratch root
    // as ivf_compact_<uuid> (the ADVICE r15 cleanup), not a bare
    // graft_ivf_compact_ system tempdir.
    assert(plan.contains("ivf_compact_"),
      s"compacted serving does not read the compacted generation:\n$plan")
    assert(comp.orderBy(col("q_id"), col("rank")).collect().toSeq == tomb,
      "compacted index diverges from tombstone-filtered serving")
    // The rewrite really dropped the dead rows — and nothing else.
    val nAll = spark.read.parquet(s"$srcDir/lists").count()
    val nComp = spark.read.parquet(s"$cdir/lists").count()
    assert(nComp == nAll - nDead,
      s"compacted lists have $nComp rows, want $nAll - $nDead")
    assert(spark.read.parquet(s"$cdir/lists")
      .filter(col("vec_id") % 7 === 3).count() == 0,
      "a tombstoned vector survived compaction")
  }

  test("r11 plan shapes: j13 joins nothing, x25 broadcasts its cuts, m19 broadcasts the errors") {
    // The at-scale claims the new queries' docs make, pinned:
    //  - j13's forward as-of is the union+window kernel — NO join
    //    operator anywhere (a regression to a range self-join would
    //    still be hash-green on testdata while scaling as corpus^2);
    //  - x25's octile cut tables broadcast back to both window scans
    //    (losing the hint would shuffle the corpus on event_type);
    //  - m19's calendar-bounded error series broadcasts into the
    //    replicate grid (the fan-out side must never shuffle the grid
    //    on idx).
    val j13 = Relational.queries("j13_asof_forward")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!j13.contains("Join"), s"j13 grew a join:\n$j13")
    assert(j13.contains("RunningWindowFunction") || j13.contains("Window"),
      s"j13 lost the running-window kernel:\n$j13")
    val x25 = graft.operators.TextPipeline.queries("x25_drift_psi")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(x25).size >= 2,
      s"x25 lost the broadcast cut joins:\n$x25")
    val m19 = graft.operators.Estimation.queries("m19_bootstrap_ci")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(m19.contains("BroadcastHashJoin"),
      s"m19 lost the broadcast error join:\n$m19")
  }

  test("e17: recall is monotone nondecreasing in nprobe (probe sets nest)") {
    // The sweep's structural law: the probe set at p is a subset of the
    // set at p' > p, so recall can only grow — a violation means the
    // probe ranking or the candidate join broke, regardless of the
    // hashes staying green at any single p.
    val rows = graft.operators.TextPipeline
      .queries("e17_nprobe_sweep")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(4)).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    rows.sliding(2).foreach { case Array((pa, ra), (pb, rb)) =>
      assert(ra <= rb, s"recall fell from $ra at nprobe=$pa to $rb at nprobe=$pb")
    }
  }

  test("e25: both lifecycle curves are monotone in nprobe; the composed artifact is honest") {
    // Two laws. (1) e17's nesting argument holds per-index: each curve
    // (lifecycle-composed AND fresh-retrained) is monotone nondecreasing
    // in nprobe. (2) The composed artifact really went through all three
    // stages: its lists contain arrival rows (vec_id % 5 = 4 — the
    // append happened), contain NO dead rows (vec_id % 7 = 3 — the
    // compaction happened), and count exactly |corpus| − |dead| (nothing
    // else was dropped — base persist/load lost no rows).
    import graft.operators.AnnIndex
    import graft.sources.Tables
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.TextPipeline
      .queries("e25_lifecycle_recall")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    rows.sliding(2).foreach { case Array((pa, la, fa), (pb, lb, fb)) =>
      assert(la <= lb, s"lifecycle recall fell $la → $lb at nprobe $pa → $pb")
      assert(fa <= fb, s"fresh recall fell $fa → $fb at nprobe $pa → $pb")
    }
    val emb = Tables.embeddings(spark, sfDir)
    val lcDir = AnnIndex.lifecycleIvfFor(spark, sfDir,
      base = emb.filter(col("vec_id") % 5 =!= 4),
      arrivals = emb.filter(col("vec_id") % 5 === 4),
      dead = emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")),
      nlist = 16, iters = 2, tag = "e25")
    val lists = spark.read.parquet(s"$lcDir/lists")
    assert(lists.filter(col("vec_id") % 5 === 4).count() > 0,
      "no arrival rows in the composed lists — the append stage was skipped")
    assert(lists.filter(col("vec_id") % 7 === 3).count() == 0,
      "a tombstoned vector survived the composed compaction")
    val want = emb.count() - emb.filter(col("vec_id") % 7 === 3).count()
    assert(lists.count() == want,
      s"composed lists have ${lists.count()} rows, want $want")
  }

  test("d17: the test-split rows replay d14 exactly; both eval splits are covered") {
    // d17 is d14's law swept over both held-out splits — so its
    // split='test' slice must equal d14's output row-for-row (same
    // shingle law, same train set, same quantized rate), and the valid
    // split must actually appear (the r14 gap was precisely that no
    // query covered valid←train).
    import org.apache.spark.sql.functions.col
    val d17 = graft.operators.TextPipeline
      .queries("d17_split_contamination")(spark, sfDir)
    val splits = d17.select(col("split")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits == Set("valid", "test"),
      s"d17 covers splits $splits, want valid+test")
    val testSlice = d17.filter(col("split") === "test")
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        col("contamination_e6"), col("flagged"))
      .orderBy(col("doc_id")).collect().toSeq
    val d14 = graft.operators.TextPipeline
      .queries("d14_decontaminate")(spark, sfDir)
      .orderBy(col("doc_id")).collect().toSeq
    assert(testSlice == d14,
      "d17's test slice diverges from d14 — the shared law drifted")
  }

  test("j17: all five interpolation branches fire on planted brackets") {
    // sf0.01 exercises interp/hold_back/hold_fwd naturally but never an
    // equal-micros hit or a bracketless probe — plant all five:
    //   t=10 between quotes (0, v=1.0) and (20, v=3.0) → interp 2.0
    //   t=20 exactly on a quote → 'exact', value held (no 0/0)
    //   t=30 after the last quote → 'hold_back'
    //   key B, t=5 before its only quote (10, v=7.0) → 'hold_fwd'
    //   key C with no quotes at all → NULL method, NULL value
    //   null-key probe → NULL (kernel law: null keys match nothing)
    // Plus the tie rule: two quotes at key A t=0 (ids 100, 101) — the
    // larger quote_id must win both directions.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val probe = Seq(
      (Some(1L), 10L, 1L, "click"), (Some(1L), 20L, 2L, "view"),
      (Some(1L), 30L, 3L, "click"), (Some(2L), 5L, 4L, "click"),
      (Some(3L), 7L, 5L, "click"), (None: Option[Long], 9L, 6L, "click"))
      .toDF("k", "t", "probe_id", "event_type")
    val quote = Seq(
      (1L, 0L, 100L, 0.5), (1L, 0L, 101L, 1.0), (1L, 20L, 102L, 3.0),
      (2L, 10L, 200L, 7.0))
      .toDF("k", "t", "quote_id", "v")
    val got = Relational.interpAsOf(probe, quote)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
          Option(r.get(6)))).toMap
    assert(got(1L) == ((Some(101L), Some(102L), Some(2000000L),
      Some("interp"))), s"mid-bracket: ${got(1L)}")
    assert(got(2L) == ((Some(102L), Some(102L), Some(3000000L),
      Some("exact"))), s"exact hit: ${got(2L)}")
    assert(got(3L) == ((Some(102L), None, Some(3000000L),
      Some("hold_back"))), s"past-only: ${got(3L)}")
    assert(got(4L) == ((None, Some(200L), Some(7000000L),
      Some("hold_fwd"))), s"future-only: ${got(4L)}")
    assert(got(5L) == ((None, None, None, None)), s"no quotes: ${got(5L)}")
    assert(got(6L) == ((None, None, None, None)), s"null key: ${got(6L)}")
  }

  test("a28 plan: the global cut is TakeOrderedAndProject, never a one-partition window") {
    // The at-scale claim a28's doc makes, pinned: the top-20 cut must
    // plan as TakeOrderedAndProject (bounded per-partition state; the
    // rank window runs AFTER the cut, on 20 rows). A regression to
    // ranking before the cut would put the whole per-user aggregate
    // through a single-partition global window — hash-green on
    // testdata, a straggler at 100 TB.
    val plan = Relational.queries("a28_decayed_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"a28 lost the bounded global cut:\n$plan")
  }

  test("fmix32: overflow-safe across the full 32-bit domain, ANSI-strict") {
    // The r10 advice finding: the first multiplier 0x9E3779B1 exceeds 2^31,
    // so the unsplit x*2654435761 overflows int64 from x ~ 3.47e9 — inside
    // the documented [0, 2^32) domain that a18's full 32-bit fingerprint
    // actually reaches (around orderkey ~1.1e8, i.e. SF ~20). The split
    // form must (a) survive ANSI mode, where a silent wrap becomes a hard
    // ARITHMETIC_OVERFLOW, and (b) equal the exact BigInt reference for
    // inputs spanning both sides of the old failure threshold, plus
    // inputs ABOVE 2^32 (the mod-reduce-first contract).
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val xs: Seq[Long] = Seq(0L, 1L, 12345L, (1L << 31) - 1, 3470000001L,
      (1L << 32) - 1, (1L << 32), 999999999999L, Long.MaxValue / 2)
    def ref(x: Long): Long = {
      val M = BigInt(1) << 32
      def mix(v: BigInt, mult: Long, sh: Int): BigInt = {
        val m = (v * mult) mod M
        m ^ (m >> sh)
      }
      mix(mix(mix(BigInt(x) mod M, 2654435761L, 16),
        1540483477L, 13), 1033321189L, 16).toLong
    }
    val prev = s.conf.get("spark.sql.ansi.enabled", "false")
    s.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val got = xs.toDF("x").select(col("x"),
        Relational.fmix32(col("x")).as("h")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      xs.foreach { x =>
        assert(got(x) == ref(x), s"fmix32($x): got ${got(x)}, want ${ref(x)}")
      }
    } finally s.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("s14/s15: MERGE semantics — cross-op ordering, upsert payloads, SCD2 identity") {
    // Planted micro-MERGE pinning the semantics the query comments
    // claim: k=1 single update, k=2 update-then-delete (delete seq is
    // later — must WIN), k=3 untouched, k=4 insert on a fresh key, k=5
    // two updates (keep-latest must take seq 2).
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val base = Seq((1L, 100L, "p1"), (2L, 200L, "p2"), (3L, 300L, "p3"),
      (5L, 500L, "p5")).toDF("k", "price_e4", "prio")
    val cdc = Seq(
      ("U", 1L, 1L, Some(110L), None: Option[String]),
      ("U", 2L, 1L, Some(220L), None: Option[String]),
      ("D", 2L, 3L, None: Option[Long], None: Option[String]),
      ("I", 4L, 1L, Some(440L), Some("p4")),
      ("U", 5L, 1L, Some(510L), None: Option[String]),
      ("U", 5L, 2L, Some(520L), None: Option[String]))
      .toDF("op", "k", "seq", "price_e4", "prio")
    val applied = Relational.mergeApply(base, Relational.cdcLatest(cdc))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(applied(1L) == ((110L, "p1", "U")),
      s"partial-payload update must keep the base prio: ${applied(1L)}")
    assert(!applied.contains(2L),
      "update-then-delete must resolve to the LATER delete")
    assert(applied(3L) == ((300L, "p3", "N")))
    assert(applied(4L) == ((440L, "p4", "I")))
    assert(applied(5L) == ((520L, "p5", "U")),
      s"keep-latest must take seq 2: ${applied(5L)}")
    // SCD2 identity on the real corpus: every CDC-touched key ends
    // either open (one current version) or deleted — n_open +
    // n_deleted ≡ distinct keys, and the counts come from two
    // different window paths (lead intervals vs event ranks).
    val scd = Relational.queries("s15_scd2")(spark, sfDir)
    val row = scd.limit(1).collect()(0)
    val nOpen = row.getLong(row.fieldIndex("n_open"))
    val nDel = row.getLong(row.fieldIndex("n_deleted"))
    val nKeys = scd.select(col("k")).distinct().count()
    assert(nOpen + nDel == nKeys,
      s"SCD2 identity broken: n_open=$nOpen + n_deleted=$nDel != $nKeys keys")
  }

  test("a25: the JVM compactor kernel reproduces the relational closed form") {
    // The a25 entry claims the relational survivor set (ranks ≡ R mod 2^L
    // after one rank window) IS the closed form of KllSketch.build's
    // compaction cascade — the streaming twin folds that kernel, so the
    // equality is what ties kllStream's state algebra to the hash-exact
    // batch entry. Pin it per group on the real corpus: same level, same
    // (value, fp) survivor vector, bound = 2^level − 1.
    import graft.functions.KllSketch
    import org.apache.spark.sql.functions.{col, round}
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rows = li.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("v"),
        ((col("l_orderkey") * 31 + col("l_linenumber") * 7 +
          round(col("l_extendedprice") * 100).cast("long")).cast("long")
          % 4294967296L).as("fp"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (g, a) => g -> a.map(_._2).toSeq }
    val rel = Relational.queries("a25_kll_rank_sketch")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == rel.keySet)
    rows.foreach { case (g, vs) =>
      val sk = KllSketch.build(vs, 64)
      val row = rel(g)
      assert(row.getLong(row.fieldIndex("level")) == sk.level.toLong,
        s"$g level")
      assert(row.getLong(row.fieldIndex("n_kept")) == sk.items.size.toLong,
        s"$g n_kept")
      assert(row.getLong(row.fieldIndex("rank_err_bound")) == sk.errBound,
        s"$g bound")
      // The relational chosen-rank quantiles are kernel SURVIVOR values
      // at the offset-corrected index: the closed form knows each
      // survivor's exact rank R + i·2^L, so the entry's chosen rank for
      // 0-based target t maps to item index (t − R) div 2^L (clamped at
      // 0) — a vector-level pin of the relational survivors to
      // build()'s items. (valueAtRank is the GENERAL estimator — a
      // merged sketch tracks no rank offset — so it is bound-checked in
      // the merge-law test, not equality-pinned here.)
      val n = sk.n
      val r0 = KllSketch.residue(sk.level)
      val w = sk.weight
      def at(p: Int): Long = {
        val t = (p * n + 99) / 100 - 1
        sk.items((((t - r0).max(0L)) / w).toInt)._1
      }
      assert(row.getLong(row.fieldIndex("q25_c")) == at(25), s"$g q25")
      assert(row.getLong(row.fieldIndex("q50_c")) == at(50), s"$g q50")
      assert(row.getLong(row.fieldIndex("q75_c")) == at(75), s"$g q75")
      assert(row.getLong(row.fieldIndex("q90_c")) == at(90), s"$g q90")
    }
  }

  test("a25: merge law — bounds compose additively and hold on planted unions") {
    // The planted rank-error bound test the r13 verdict asked for: two
    // deterministic multisets with DISALIGNED sizes (different cascade
    // depths force the promote path), merged under the derandomized
    // coins; every rank query must sit within the sketch's own reported
    // errBound of the TRUE union rank. Also: commutativity (the merged
    // sorted union and level-keyed coins admit no order), and the bound
    // telescope (merge bound ≥ the sides' — errors never silently reset).
    import graft.functions.KllSketch
    val a = (0 until 977).map(i => ((i * 37L) % 9973L, i.toLong))
    val b = (0 until 313).map(i => ((i * 101L + 3L) % 9973L, 100000L + i))
    val (sa, sb) = (KllSketch.build(a, 64), KllSketch.build(b, 64))
    assert(sa.level != sb.level, "planted sizes must force promotion")
    val m = KllSketch.merge(sa, sb, 64)
    val m2 = KllSketch.merge(sb, sa, 64)
    assert(m == m2, "merge must be commutative")
    assert(m.n == 1290L && m.items.size <= 64)
    assert(m.errBound >= math.max(sa.errBound, sb.errBound))
    val union = (a ++ b).map(_._1).sorted
    (0L to 10000L by 250L).foreach { q =>
      val trueRank = union.count(_ < q).toLong
      val err = math.abs(m.estRank(q) - trueRank)
      assert(err <= m.errBound,
        s"estRank($q): |${m.estRank(q)} - $trueRank| = $err > ${m.errBound}")
    }
    // valueAtRank honors the same bound: the returned value's true rank
    // interval [count(<v), count(<=v)] must come within errBound of t.
    Seq(1L, 323L, 645L, 1161L, 1290L).foreach { t =>
      val v = m.valueAtRank(t)
      val lo = union.count(_ < v).toLong
      val hi = union.count(_ <= v).toLong
      assert(t >= lo - m.errBound && t <= hi + m.errBound,
        s"valueAtRank($t) = $v with true interval [$lo, $hi], bound ${m.errBound}")
    }
    // Sanity on the bound itself: sketch-sized, not sample-sized — for
    // n = 1290 at k = 64 the cascade bound stays well under n/4.
    assert(m.errBound < 1290L / 4, s"bound ${m.errBound} degenerate")
  }

  test("a25: binary-counter fold keeps the long-stream bound logarithmic") {
    // The r14 ADVICE degradation, pinned shut: a naive merge-every-batch
    // fold promotes each small batch up to the state's level, so its
    // bound grows ~O(n·B/2k) and goes VACUOUS (> n) on long streams; the
    // foldStep binary counter caps both state (≤ k·⌈log₂(B+1)⌉ pairs)
    // and the union bound (~O(n·log₂B/k)). 200 batches × 100 items —
    // long enough that the naive bound visibly diverges — and the union
    // must still honor its own bound against TRUE ranks.
    import graft.functions.KllSketch
    val batches = (0 until 200).map(b =>
      (0 until 100).map(i =>
        (((b * 100 + i) * 7919L) % 999983L, (b * 1000L + i))))
    val naive = batches.foldLeft(KllSketch.empty)((acc, p) =>
      KllSketch.merge(acc, KllSketch.build(p, 64), 64))
    val slots = batches.foldLeft(
        Vector.empty[Option[KllSketch.Sketch]])((acc, p) =>
      KllSketch.foldStep(acc, KllSketch.build(p, 64), 64))
    val u = KllSketch.union(slots, 64)
    val n = 20000L
    assert(u.n == n && naive.n == n)
    assert(slots.size <= 9, s"slot vector ${slots.size} not logarithmic")
    val statePairs = slots.flatten.map(_.items.size).sum
    assert(statePairs <= 64 * 9, s"state $statePairs pairs exceeds k·log₂B")
    assert(naive.errBound > n / 2,
      s"naive fold bound ${naive.errBound} unexpectedly tight — test stale")
    assert(u.errBound * 4 < naive.errBound,
      s"counter bound ${u.errBound} not ≪ naive ${naive.errBound}")
    assert(u.errBound < n / 4, s"counter bound ${u.errBound} still vacuous")
    val union = batches.flatten.map(_._1).sorted
    (0L to 999983L by 37_037L).foreach { q =>
      val err = math.abs(u.estRank(q) - union.count(_ < q).toLong)
      assert(err <= u.errBound, s"estRank($q) err $err > ${u.errBound}")
    }
  }

  test("e34: loadHnsw level graphs read as partition-pruned scans") {
    // saveHnsw partitions the edge table BY LEVEL so a loaded index's
    // per-level reads touch one directory each — at 100 TB the upper
    // levels are 4^-L of the corpus and must not pay a full-table scan.
    // The pin: edges(0)'s scan carries a partition filter and reads
    // exactly one of the top+1 level directories.
    val s = spark
    val e = graft.sources.Tables.embeddings(s, sfDir)
    val dir = graft.operators.AnnIndex.savedHnswFor(s, sfDir, e)
    val idx = graft.operators.AnnIndex.loadHnsw(s, dir)
    val scan = idx.edges(0).queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.headOption
      .getOrElse(fail("no FileSourceScanExec under loaded edges(0)"))
    assert(scan.partitionFilters.nonEmpty,
      "level filter did not reach PartitionFilters")
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == 1,
      s"edges(0) reads $selected level directories, want 1")
  }
}
