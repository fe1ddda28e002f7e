package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE out-of-order admission — the stateful ingest decision whose
  * after-the-fact audit is `tsdb_ooo_ingest` (TsdbLifecycle.scala): a
  * streaming TSDB head keeps ONE value of state per series (the head
  * timestamp plus three counters) and admits each arriving sample iff
  * it is within the OOO window (1h) of that head. This is the
  * `flatMapGroupsWithState` shape: per-series state is O(1) — four
  * longs — regardless of sample volume, the property that lets a
  * 1000-executor ingest tier hold millions of series.
  *
  * Determinism contract: within a micro-batch the group iterator's
  * order is not guaranteed, so the processor sorts each chunk by the
  * arrival sequence before folding — cross-batch order is the feed
  * order, in-batch order is restored, and the decision sequence equals
  * the batch audit's (OooStreamSpec proves it on a real MemoryStream
  * run). The head-only state is exactly the batch twin's running max:
  * a rejected sample can never advance the head, so fold-over-all ==
  * fold-over-accepted (same argument as the batch window form). */
object OooStream {

  type Q = (SparkSession, String) => DataFrame

  case class OooSample(series: String, es: Long, arrival: Long)
  case class OooState(head: Long, nSamples: Long, nAccepted: Long,
      nRejected: Long, worstBackward: Long)
  case class OooVerdict(series: String, n_samples: Long, n_accepted: Long,
      n_rejected: Long, worst_backward_s: Long)

  /** One snapshot row per (series, micro-batch); the LAST row per
    * series is the final admission tally. */
  def oooIngestStream(samples: Dataset[OooSample]): Dataset[OooVerdict] = {
    import samples.sparkSession.implicits._
    samples.groupByKey(_.series)
      .flatMapGroupsWithState[OooState, OooVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (series: String, chunk: Iterator[OooSample], state: GroupState[OooState]) =>
          var st = state.getOption.getOrElse(OooState(Long.MinValue, 0L, 0L, 0L, 0L))
          chunk.toSeq.sortBy(_.arrival).foreach { s =>
            st =
              if (st.head == Long.MinValue || s.es >= st.head - 3600L)
                OooState(math.max(st.head, s.es), st.nSamples + 1,
                  st.nAccepted + 1, st.nRejected, st.worstBackward)
              else
                OooState(st.head, st.nSamples + 1, st.nAccepted,
                  st.nRejected + 1, math.max(st.worstBackward, st.head - s.es))
          }
          state.update(st)
          Iterator(OooVerdict(series, st.nSamples, st.nAccepted, st.nRejected,
            st.worstBackward))
      }
  }

  /** Driver-contract entry: the batch twin (same frame, same oracle) —
    * the stream's final state per series equals this row for row. */
  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("stream_ooo_ingest", graft.operators.TsdbLifecycle.oooIngest,
      Some(graft.operators.TsdbLifecycle.oooIngestSql)))
}
