package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class Ev(ts: java.sql.Timestamp, event_type: String, value: Double)

/** Structured Streaming parity: the streaming operators must emit
  * exactly the rows their batch twins compute over the same events. */
class StreamingSpec extends SparkTestBase {

  test("watermarked windowed agg emits batch-identical rows in append mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchRows = graft.sources.Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value")).as[Ev].collect()

    val input = MemoryStream[Ev]
    val q = EventsStream.eventsWindowStream(input.toDF())
      .writeStream.format("memory").queryName("win_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batchRows.toSeq)
      q.processAllAvailable()
      // a late lone event pushes the watermark past every real window →
      // append mode finalizes and emits them all
      val maxTs = batchRows.map(_.ts.getTime).max
      input.addData(Ev(new java.sql.Timestamp(maxTs + 10L * 3600 * 1000), "__wm__", 0.0))
      q.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) = (r.getTimestamp(0), r.getString(1))
      val got = spark.table("win_sink")
        .filter(col("event_type") =!= "__wm__")
        .select("window_start", "event_type", "n_events", "value_sum")
        .collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
      val want = EventsStream.eventsWindowBatch(spark, sf)
        .collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet == want.keySet,
        s"windows differ: missing=${(want.keySet diff got.keySet).take(3)} extra=${(got.keySet diff want.keySet).take(3)}")
      want.foreach { case (k, (n, s)) =>
        val (gn, gs) = got(k)
        assert(gn == n && math.abs(gs - s) < 1e-6, s"mismatch at $k: ($gn,$gs) vs ($n,$s)")
      }
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization matches the batch fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("tsSec"), col("value"))
      .as[EventsStream.Event].collect()

    val input = MemoryStream[EventsStream.Event]
    val q = EventsStream.sessionizeStream(input.toDS())
      .writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events.toSeq)
      q.processAllAvailable()
      // a sentinel far in the future advances the watermark past every
      // open session's (end + gap) → event-time timeouts emit them all
      val maxSec = events.map(_.tsSec).max
      input.addData(EventsStream.Event(-1L, 0L, maxSec + 36000L, 0.0))
      q.processAllAvailable()

      val got = spark.table("sess_sink").filter(col("user_id") =!= -1L)
        .collect().map(_.toSeq).toSet
      val want = EventsStream.sessionizeBatch(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(got == want,
        s"streaming=${got.size} batch=${want.size} diff=${(want diff got).take(2)}")
    } finally q.stop()
  }
}
