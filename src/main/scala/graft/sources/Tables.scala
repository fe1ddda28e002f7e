package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-typed loaders for the driver's test tables.
  *
  * All reads are plain parquet scans — column pruning and predicate
  * pushdown are left to Catalyst (verified in specs via
  * `PushedFilters` / `ReadSchema` in the formatted plan). At 100 TB
  * these become partitioned-table scans; nothing here assumes the data
  * fits anywhere.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** events.ts arrives in two driver vintages: parquet TIMESTAMP(NANOS)
    * (Spark 4 rejects it as a timestamp type — read raw nanos via the
    * legacy conf and convert) or TIMESTAMP(MICROS, not UTC-adjusted).
    * For the MICROS vintage, disabling NTZ inference makes the scan
    * surface the column directly as the session-UTC TimestampType the
    * operators expect — no per-row cast projection over the corpus
    * scan (the session timezone is pinned UTC, so the reinterpretation
    * is value-preserving and matches DuckDB's naive-timestamp view).
    * Detect per-read from the footer schema so either vintage loads.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(
          "ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
