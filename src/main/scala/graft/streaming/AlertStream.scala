package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE Alertmanager notification grouping — the timer-driven flush
  * whose after-the-fact audit is `alert_group_wait` (AlertRoute.scala):
  * the first alert of a group opens it at t0, a notification fires at
  * t0+group_wait with everything that arrived before the timer, and
  * later arrivals flush on the group_interval grid. The streaming shape
  * is `flatMapGroupsWithState` with EVENT-TIME TIMERS: a batch (group,
  * slot) is emitted exactly when the watermark passes its flush
  * timestamp — the state is t0 plus one (count, critical-count) pair
  * per OPEN slot, bounded by the interval grid, never by alert volume.
  *
  * Ordering contract (stricter than it looks, stated exactly): t0 PINS
  * at the group's first-ARRIVING alert and never moves — re-anchoring
  * on a later, earlier-timestamped straggler would shift the slot grid
  * under already-accumulated slots and fork from the batch twin (whose
  * t0 is the global min) in a way no re-bucketing of aggregated counts
  * can repair. The stream therefore equals the batch audit exactly
  * when each group's first alert arrives before its others (any
  * in-order feed; AlertStreamSpec's chunked ordered feed); a straggler
  * that precedes the PINNED t0 lands in slot 0 — the twin agrees only
  * under that same contract. Real Alertmanager sidesteps the question
  * by running on ARRIVAL time; this entry keeps event time and states
  * the contract instead — and DETECTS violations: pre-t0 stragglers
  * are counted in state and surfaced on every emitted batch
  * (`n_pre_t0`), so a violating feed is observable, not silent
  * (AlertStreamSpec asserts 0 on its contract-conforming feed). */
object AlertStream {

  type Q = (SparkSession, String) => DataFrame

  val GroupWaitSec = 30L
  val GroupIntervalSec = 300L

  case class AlertSample(alertname: String, es: Long, critical: Boolean)
  /** `stragglers` counts alerts that arrived with es < the PINNED t0 —
    * under the ordering contract it stays 0; a non-zero value means the
    * feed violated the contract and the slot grid is shifted relative
    * to the batch twin, made OBSERVABLE here instead of silent. */
  case class GwState(t0: Long, open: Map[Long, (Long, Long)],
      stragglers: Long = 0L)
  case class GwBatch(alertname: String, batch: Long, n_alerts: Long,
      n_critical: Long, flush_es: Long, n_pre_t0: Long = 0L)

  private def flushEs(t0: Long, batch: Long): Long =
    t0 + GroupWaitSec + batch * GroupIntervalSec

  def groupWaitStream(samples: Dataset[AlertSample]): Dataset[GwBatch] = {
    import samples.sparkSession.implicits._
    samples
      .withColumn("ts", timestamp_seconds(col("es")))
      .withWatermark("ts", "1 hour")
      .as[AlertSample]
      .groupByKey(_.alertname)
      .flatMapGroupsWithState[GwState, GwBatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (name: String, chunk: Iterator[AlertSample], state: GroupState[GwState]) =>
          val incoming = chunk.toSeq
          var st = state.getOption.getOrElse(GwState(Long.MaxValue, Map.empty))
          if (incoming.nonEmpty) {
            // t0 pins at the first-arriving alert (see the ordering
            // contract above) — NEVER re-anchored by a straggler
            val t0 =
              if (st.t0 == Long.MaxValue) incoming.map(_.es).min else st.t0
            var open = st.open
            var stragglers = st.stragglers
            incoming.foreach { a =>
              // contract violation detector: a straggler earlier than
              // the pinned anchor lands in slot 0 under a SHIFTED grid
              // — count it so the fork from the batch twin is visible
              if (a.es < t0) stragglers += 1
              val batch =
                if (a.es < t0 + GroupWaitSec) 0L
                else (a.es - t0 - GroupWaitSec) / GroupIntervalSec + 1L
              val (n, c) = open.getOrElse(batch, (0L, 0L))
              open = open.updated(batch, (n + 1, c + (if (a.critical) 1L else 0L)))
            }
            st = GwState(t0, open, stragglers)
          }
          // flush every slot the watermark has passed
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          val (due, still) = st.open.partition {
            case (b, _) => flushEs(st.t0, b) <= wmSec
          }
          st = GwState(st.t0, still, st.stragglers)
          // t0 is the GROUP-LIFETIME anchor (the batch twin's global
          // min): the state is never removed, or a later alert would
          // re-pin t0 and re-emit slot 0 under a shifted grid. Cost is
          // one (t0, empty-map) row per group — |groups|-bounded.
          state.update(st)
          // arm the timer for the earliest unflushed slot
          still.keys.toSeq.sorted.headOption
            .map(b => flushEs(st.t0, b) * 1000L)
            .filter(_ > state.getCurrentWatermarkMs())
            .foreach(state.setTimeoutTimestamp)
          due.toSeq.sortBy(_._1).iterator.map { case (b, (n, c)) =>
            GwBatch(name, b, n, c, flushEs(st.t0, b), st.stragglers)
          }
      }
  }

  /** Driver-contract entry: the batch twin (same frame, same oracle). */
  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("stream_group_wait", graft.operators.AlertRoute.groupWait,
      Some(graft.operators.AlertRoute.groupWaitSql)))
}
