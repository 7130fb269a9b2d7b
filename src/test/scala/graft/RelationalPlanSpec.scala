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
}
