package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ graft.operators.Estimation.queries ++
      graft.operators.TextPipeline.queries ++ graft.operators.GraphOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ graft.operators.Estimation.oracle ++
      graft.operators.TextPipeline.oracle ++ graft.operators.GraphOps.oracle
}
