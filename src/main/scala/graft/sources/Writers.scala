package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side surface: bucketed and partitioned parquet sinks, each
  * proven by reading its own output back through a query whose result
  * is oracle-checked against the ORIGINAL tables (the sink must be
  * lossless) and whose plan is shape-asserted in WritersSpec.
  *
  * - Bucketed tables are the co-located-join answer at 100 TB: both
  *   fact tables pre-hashed into the same bucket count on the join key
  *   → SortMergeJoin with ZERO Exchange (no shuffle at query time, for
  *   every future join on that key).
  * - Partitioned layout is the scan-pruning answer: a date filter
  *   touches only matching directories (`PartitionFilters` in the
  *   plan), the 100-TB equivalent of not reading 99 of 100 days.
  */
object Writers {

  type Q = (SparkSession, String) => DataFrame

  val Buckets = 8

  private def sfx(d: String): String =
    java.lang.Integer.toHexString(d.hashCode).takeRight(6)

  /** Idempotent re-create: drop the catalog entry AND its location —
    * a fresh session's in-memory catalog forgets the table while the
    * warehouse directory survives, which makes a bare overwrite fail
    * with LOCATION_ALREADY_EXISTS. */
  private def dropTable(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val dir = new java.io.File(wh, name)
    if (dir.exists()) {
      // recursive: a leftover _temporary subdir from a crashed write
      // would make a flat delete() silently fail → LOCATION_ALREADY_EXISTS
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
      require(!dir.exists(), s"failed to clean table location $dir")
    }
  }

  /** Bucketed sink + co-located join: orders and lineitem bucketed by
    * order key into the session warehouse, joined back bucket-to-bucket
    * (merge hint → SMJ; no Exchange: asserted in WritersSpec). Result
    * is checked against the unbucketed originals by the oracle. */
  def bucketedJoin: Q = (s, d) => {
    val ot = s"graft_ord_${sfx(d)}"
    val lt = s"graft_li_${sfx(d)}"
    dropTable(s, ot)
    dropTable(s, lt)
    Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite")
      .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(ot)
    Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice")
      .write.mode("overwrite")
      .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(lt)
    s.table(lt).hint("merge")
      .join(s.table(ot).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"), round(sum(col("l_extendedprice")), 2).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  val bucketedJoinSql: String =
    """SELECT o_orderstatus, count(*) AS n_lines,
              round(sum(l_extendedprice), 2) AS total_price
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Partitioned sink + pruned scan: events written partitionBy(date),
    * read back with a one-month filter that prunes to matching
    * directories (PartitionFilters: asserted in WritersSpec). */
  def partitionedScan: Q = (s, d) => {
    val path = s"/tmp/graft_events_part_${sfx(d)}"
    Tables.events(s, d)
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)
    s.read.parquet(path)
      .filter(col("event_date") >= lit("2024-01-08") && col("event_date") < lit("2024-01-15"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
      .orderBy(col("event_type"))
  }

  val partitionedScanSql: String =
    """SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS value_sum
       FROM events
       WHERE CAST(ts AS DATE) >= DATE '2024-01-08' AND CAST(ts AS DATE) < DATE '2024-01-15'
       GROUP BY event_type ORDER BY event_type"""

  /** CSV sink round-trip: customer written as headered CSV, read back
    * with an explicit schema, aggregated — oracle runs the same query
    * on the parquet original, so the sink must be lossless (doubles
    * survive via round-trip-exact formatting). */
  def csvRoundtrip: Q = (s, d) => {
    val path = s"/tmp/graft_cust_csv_${sfx(d)}"
    val src = Tables.customer(s, d)
    src.write.mode("overwrite").option("header", "true").csv(path)
    s.read.option("header", "true").schema(src.schema).csv(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("bal_sum"))
      .orderBy(col("c_mktsegment"))
  }

  val csvRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal_sum
       FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** JSON-lines sink round-trip: same contract for the json format. */
  def jsonRoundtrip: Q = (s, d) => {
    val path = s"/tmp/graft_supp_json_${sfx(d)}"
    val src = Tables.supplier(s, d)
    src.write.mode("overwrite").json(path)
    s.read.schema(src.schema).json(path)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"), round(sum(col("s_acctbal")), 2).as("bal_sum"))
      .orderBy(col("s_nationkey"))
  }

  val jsonRoundtripSql: String =
    """SELECT s_nationkey, count(*) AS n_supp, round(sum(s_acctbal), 2) AS bal_sum
       FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("sink_bucketed_join", bucketedJoin, Some(bucketedJoinSql)),
    ("sink_partitioned_scan", partitionedScan, Some(partitionedScanSql)),
    ("sink_csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql)),
    ("sink_json_roundtrip", jsonRoundtrip, Some(jsonRoundtripSql)))
}
