package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * Scale posture: the engine never assumes a table fits on the driver.
  * Parquet scans keep Catalyst pushdown/pruning intact — callers project
  * and filter on the returned DataFrame and the scan narrows accordingly.
  * The dimension tables (`region`, `nation`, `supplier`) are small at any
  * scale factor and are safe to `broadcast(...)` at join sites.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Pin the session timezone in the query path itself: timestamp literals
    // (p5_time_range, q1_agg) parse in the session tz, and the DuckDB
    // oracles use naive timestamps — a driver-provided session with a
    // non-UTC tz would silently shift results (ADVICE r1).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright.
    * Read nanos as long (legacy conf) and truncate to microsecond precision
    * with integer division — double division would lose precision above
    * 2^53 ns (~mid-1970s epoch). DuckDB oracles must compare on
    * `cast(ts AS timestamp)` (ns → µs truncation) for parity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
