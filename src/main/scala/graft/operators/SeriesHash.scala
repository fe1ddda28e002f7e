package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE series-identity + shard-hash derivation, defined once: the
  * label-set key (job = event_type, instance = u‹user mod 10›) and the
  * md5-idiom shard assignment shared by the query-frontend sharder
  * (`prom_query_sharding`), the remote-write queue sharder
  * (`prom_queue_shards`), and their specs. Spark `conv(substr(md5))`
  * == DuckDB `('0x'||substr(md5))::BIGINT` — the suite's established
  * engine-portable hash contract (Tpch3.scala:16). */
object SeriesHash {

  /** series key over (event_type, user_id) columns. */
  val keyExpr: Column =
    concat(col("event_type"), lit("|u"), (col("user_id") % 10).cast("string"))
  val keySql: String =
    "event_type || '|u' || CAST(user_id % 10 AS VARCHAR)"

  /** shard of a key column, n fixed shards. */
  def shardExpr(keyCol: String, n: Int): String =
    s"cast(conv(substr(md5($keyCol), 1, 4), 16, 10) as bigint) % $n"
  def shardSql(keyExprSql: String, n: Int): String =
    s"('0x' || substr(md5($keyExprSql), 1, 4))::BIGINT % $n"
}
