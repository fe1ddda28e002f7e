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

  /** The driver regenerates testdata between rounds and has already
    * switched timestamp vintages once (events NANOS → MICROS). Guard
    * every timestamp-bearing table the same way events is guarded: a
    * column that surfaces as raw nanos (LongType under the legacy
    * conf) is converted; the timestamp vintages are no-ops. */
  private def adaptTs(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema.find(_.name == c).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.LongType) =>
          d.withColumn(c,
            org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
        case _ => d
      }
    }

  private def tts(spark: SparkSession, dir: String, name: String,
      tsCols: String*): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    adaptTs(t(spark, dir, name), tsCols: _*)
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = tts(s, d, "orders", "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame   = tts(s, d, "lineitem", "l_shipdate")
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
  def events(s: SparkSession, d: String): DataFrame = tts(s, d, "events", "ts")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
