package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph propagation — the operator family the d7 pointer-jump
  * fixpoint opened and nothing else in the corpus exercised: rank/mass
  * flowing along edges for a FIXED number of supersteps, the Pregel shape
  * every large-scale graph signal (PageRank quality weighting, label
  * propagation, harmonic centrality) reduces to. Training-data pipelines
  * use exactly this as a corpus quality signal: CommonCrawl-scale
  * curation weights documents by the link graph's centrality before
  * sampling (the reference for the idea is the original PageRank use in
  * web corpus ranking; modern LLM pipelines keep it as a source prior).
  *
  * Scale posture: one superstep = one join (edges ⋈ the node-sized rank
  * vector — broadcast while the node count fits the budget, shuffled on
  * the node key past it) + one aggregation (inflow by dst, map-side
  * combined down to |nodes| rows). State per superstep is one rank row
  * per node — never edge-sized. A production run at 100 TB with deep
  * iteration counts would checkpoint the rank frame every few
  * supersteps to cut lineage; at 5 supersteps the pure plan is kept so
  * the whole fixpoint stays oracle-replayable.
  *
  * Determinism: ranks are e12-quantized INTEGERS end to end — each
  * node's outflow is `rank div outdeg` (integral division, remainder
  * deliberately dropped: deterministic in both engines), inflow is an
  * integer sum (order-free), and the damping update is integer
  * `(85 * inflow) div 100` plus an integer base. Doubles never appear,
  * so 5 chained supersteps replay bit-exactly in DuckDB's unrolled CTEs
  * — the same all-integer-fixpoint trick as e6's quantized Lloyd
  * training.
  */
object GraphOps {

  /** PageRank over an edge list with integer e12 arithmetic: nodes =
    * every distinct value in `nodes` (isolated nodes keep the base
    * mass), damping 0.85, dangling mass dropped (a node with no
    * out-edges contributes nothing — the convention both engines
    * replicate exactly), `iters` supersteps.
    * Output: node, rank_e12.
    */
  private[graft] def pageRank(
      edges: DataFrame, nodes: DataFrame, iters: Int = 5,
      bcastNodeBudget: Long = 4L * 1000 * 1000): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    // The edge subplan is loop-invariant and left LAZY on purpose: it
    // appears once per superstep in the final plan, but its exchanges
    // are byte-identical so ReuseExchange collapses them to one physical
    // derivation. A/B at sf0.1 (5 passes each): lazy+broadcast 4.97 s,
    // lazy+shuffle 5.77 s, eager localCheckpoint variants 5.9-6.9 s —
    // materialization pays its write cost without saving repeated work
    // here, and its retained blocks inflate GC (the run canary rises
    // with it). A cluster run with MORE supersteps would checkpoint
    // every few steps to cut lineage depth, not for re-use.
    val ew = edges.join(outdeg, "src")
    val n = nodes.count()
    val base = 150000000000L / n // 0.15 * 1e12, pre-divided by N
    val r0 = 1000000000000L / n
    // The rank vector is NODE-sized — one long per node — so while it
    // fits the broadcast budget each superstep's two joins go map-side
    // and the only shuffle left per superstep is the inflow aggregation
    // (map-side combined down to |nodes| rows). Past the budget (the
    // x7 dim() convention, gated on the known node count) both joins
    // fall back to shuffles on the node key, which consecutive
    // supersteps then share.
    val bcastRanks = n <= bcastNodeBudget
    // Past the budget the fallback PINS sort-merge (x7's dim()
    // convention) — just dropping the hint would let Catalyst
    // auto-broadcast by its own threshold and the gate would test
    // nothing.
    def dim(d: DataFrame): DataFrame =
      if (bcastRanks) broadcast(d) else d.hint("merge")
    var ranks = nodes.select(col("node"), lit(r0).as("rank_e12"))
    for (_ <- 1 to iters) {
      val inflow = ew
        .join(dim(ranks.withColumnRenamed("node", "src")), "src")
        .select(col("dst"), expr("rank_e12 div odeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      ranks = nodes
        .join(dim(inflow.withColumnRenamed("dst", "node")), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("85 * coalesce(inflow, 0L) div 100"))
            .as("rank_e12"))
    }
    ranks
  }

  /** One unrolled PageRank superstep as a DuckDB CTE pair — kept next to
    * the Scala superstep so the two spellings evolve together.
    */
  private def sqlStep(i: Int, base: String): String =
    s"""fl$i AS (
          SELECT e.dst, sum(r.rank_e12 // e.odeg) AS inflow
          FROM ew e JOIN r${i - 1} r ON r.node = e.src
          GROUP BY 1),
        r$i AS (
          SELECT n.node,
                 $base + (85 * coalesce(f.inflow, 0)) // 100 AS rank_e12
          FROM nodes n LEFT JOIN fl$i f ON f.dst = n.node)"""

  type Q = (SparkSession, String) => DataFrame

  /** name -> (spark query, optional duckdb oracle sql) */
  val entries: Seq[(String, Q, Option[String])] = Seq(

    ("g1_copurchase_pagerank", (s: SparkSession, d: String) => {
      // Co-purchase centrality: parts sharing an order link both ways
      // (the market-basket graph — its self-join is quadratic only
      // within an order, whose size the schema bounds at 7 lineitems:
      // the d5 size-capped-bucket argument), then 5 integer-PageRank
      // supersteps, then the bounded top_k_pairs cut for the top 20 —
      // no corpus-sized rank window. The graph has cycles by
      // construction (every edge is bidirectional), so rank genuinely
      // circulates; isolated parts (single-item orders only) hold the
      // base mass and rank below every connected part.
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val e = li.as("a").join(li.as("b"), "ok")
        .filter(col("a.pk") =!= col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
      val nodes = li.select(col("pk").as("node")).distinct()
      val ranks = pageRank(e, nodes, iters = 5)
      AnnIndex.topKCut(ranks.select(lit(1).as("g"), col("node"),
          col("rank_e12")), "g", "rank_e12", "node",
          k = 20, ascending = false, scoreName = "rank_e12",
          idName = "node")
        .select(col("node"), col("rank_e12"), col("rank"))
        .orderBy(col("rank"))
    }, {
      val base = "(150000000000 // (SELECT c FROM n))"
      Some(
        s"""WITH li AS (
              SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            e AS (
              SELECT DISTINCT a.pk AS src, b.pk AS dst
              FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
            nodes AS (SELECT DISTINCT pk AS node FROM li),
            n AS (SELECT count(*) AS c FROM nodes),
            outdeg AS (SELECT src, count(*) AS odeg FROM e GROUP BY 1),
            ew AS (SELECT e.src, e.dst, o.odeg
                   FROM e JOIN outdeg o ON o.src = e.src),
            r0 AS (SELECT node, 1000000000000 // (SELECT c FROM n)
                     AS rank_e12 FROM nodes),
            ${(1 to 5).map(sqlStep(_, base)).mkString(",\n")},
            ranked AS (
              SELECT node, rank_e12, row_number() OVER (
                ORDER BY rank_e12 DESC, node) AS rank
              FROM r5)
            SELECT node, cast(rank_e12 AS bigint) AS rank_e12,
                   cast(rank AS int) AS rank
            FROM ranked WHERE rank <= 20 ORDER BY rank""")
    }))

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap

  def oracle: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) =>
      n -> sql.replaceAll("\\s+", " ").trim
    }.toMap
}
