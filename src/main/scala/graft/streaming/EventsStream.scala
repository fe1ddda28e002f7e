package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the reference's collectors run on a
  * cron/lambda loop (cmd/collector/database-collector.go:262-281) —
  * the streaming-native equivalent is a watermarked windowed
  * aggregation plus stateful sessionization.
  *
  * State is keyed by (window, type) / user and bounded by the
  * watermark — horizontal scale = shuffle partitions, no unbounded
  * driver state.
  */
object EventsStream {

  type Q = (SparkSession, String) => DataFrame

  /** Batch-parity query for the streaming windowed aggregation:
    * hourly tumbling counts/sums per event_type (entry
    * `stream_events_window`; the streaming path below produces the
    * same rows, asserted in StreamingSpec). */
  def eventsWindowBatch: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val eventsWindowSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
              count(*) AS n_events, round(sum(value), 2) AS value_sum
       FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""

  /** The events schema as the streaming reader needs it (ts already
    * converted from nanos by the batch loader; streaming reads the
    * same parquet so it uses nanosAsLong + conversion too). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos (nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a parquet directory. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Watermarked hourly windowed aggregation — the streaming twin of
    * `eventsWindowBatch`. */
  def eventsWindowStream(events: DataFrame): DataFrame = {
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))
  }

  case class Event(user_id: Long, event_id: Long, tsSec: Long, value: Double)
  case class Session(user_id: Long, session_idx: Long, session_start: String,
      session_end: String, duration_sec: Long, n_events: Long, value_sum: Double)

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  val GapSeconds = 1800L

  /** The shared sessionization core: fold one user's time-sorted events
    * into gap-separated sessions. Used by both the batch entry and the
    * streaming flatMapGroupsWithState wrapper. */
  def foldSessions(userId: Long, sorted: Seq[Event]): Seq[Session] = {
    if (sorted.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var idx = 0L
    var start = sorted.head.tsSec
    var end = start
    var n = 0L
    var v = 0.0
    def emit(): Unit = out += Session(userId, idx,
      fmt.format(java.time.Instant.ofEpochSecond(start)),
      fmt.format(java.time.Instant.ofEpochSecond(end)),
      end - start, n,
      // same HALF_UP-on-decimal-repr rounding as Spark's round()
      java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP).doubleValue())
    sorted.foreach { e =>
      if (n > 0 && e.tsSec - end > GapSeconds) {
        emit(); idx += 1; start = e.tsSec; n = 0; v = 0.0
      }
      end = e.tsSec; n += 1; v += e.value
    }
    emit()
    out.toSeq
  }

  /** Batch entry `stream_sessionize_state`: same core as the streaming
    * state operator, run per user group. NOTE: gap is measured to the
    * previous event (same as the window-lag variant), so this equals
    * the `sessionize` entry's sessions — cross-checked in its oracle. */
  def sessionizeBatch: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("tsSec"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        foldSessions(uid, it.toSeq.sortBy(e => (e.tsSec, e.event_id))).iterator
      }
      .toDF()
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Streaming stateful sessionization: buffer per-user events in
    * state, emit closed sessions on watermark-driven timeout. */
  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[List[Event]]) =>
          if (state.hasTimedOut) {
            val all = state.get
            state.remove()
            foldSessions(uid, all.sortBy(e => (e.tsSec, e.event_id))).iterator
          } else {
            val buffered = state.getOption.getOrElse(Nil) ++ batch.toList
            state.update(buffered)
            state.setTimeoutDuration("2 seconds")
            Iterator.empty
          }
      }
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("stream_events_window", eventsWindowBatch, Some(eventsWindowSql)),
    ("stream_sessionize_state", sessionizeBatch, Some(AsOfSessionizeOracle.sql)))

  /** The stateful batch entry reuses the window-based sessionize oracle
    * — both must produce identical sessions. */
  private object AsOfSessionizeOracle {
    val sql: String = graft.operators.AsOf.sessionizeSql
  }
}
