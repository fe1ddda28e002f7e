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
  /** `maxArrival`/`nDisorder` make the cross-batch ordering contract
    * OBSERVABLE: in-batch order is restored by the sort, but a feed
    * that delivers a LOWER arrival sequence in a LATER micro-batch
    * would silently fold in a different order than the batch audit —
    * such samples are counted instead of ignored. Under a contract-
    * conforming feed (push pipelines deliver in arrival order across
    * batches) nDisorder stays 0; OooStreamSpec asserts it. */
  case class OooState(head: Long, nSamples: Long, nAccepted: Long,
      nRejected: Long, worstBackward: Long, maxArrival: Long = Long.MinValue,
      nDisorder: Long = 0L)
  case class OooVerdict(series: String, n_samples: Long, n_accepted: Long,
      n_rejected: Long, worst_backward_s: Long, n_disorder: Long = 0L)

  /** One snapshot row per (series, micro-batch); the LAST row per
    * series is the final admission tally. */
  def oooIngestStream(samples: Dataset[OooSample]): Dataset[OooVerdict] = {
    import samples.sparkSession.implicits._
    samples.groupByKey(_.series)
      .flatMapGroupsWithState[OooState, OooVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (series: String, chunk: Iterator[OooSample], state: GroupState[OooState]) =>
          var st = state.getOption.getOrElse(OooState(Long.MinValue, 0L, 0L, 0L, 0L))
          val batchMaxArrival = st.maxArrival
          chunk.toSeq.sortBy(_.arrival).foreach { s =>
            // cross-batch disorder: this batch delivered an arrival
            // sequence BELOW a prior batch's max — the fold order no
            // longer matches the audit's; count it, don't hide it
            val dis = st.nDisorder + (if (s.arrival <= batchMaxArrival) 1L else 0L)
            val arr = math.max(st.maxArrival, s.arrival)
            st =
              if (st.head == Long.MinValue || s.es >= st.head - 3600L)
                OooState(math.max(st.head, s.es), st.nSamples + 1,
                  st.nAccepted + 1, st.nRejected, st.worstBackward, arr, dis)
              else
                OooState(st.head, st.nSamples + 1, st.nAccepted,
                  st.nRejected + 1, math.max(st.worstBackward, st.head - s.es),
                  arr, dis)
          }
          state.update(st)
          Iterator(OooVerdict(series, st.nSamples, st.nAccepted, st.nRejected,
            st.worstBackward, st.nDisorder))
      }
  }

  /** Driver-contract entry: the batch twin (same frame, same oracle) —
    * the stream's final state per series equals this row for row. */
  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("stream_ooo_ingest", graft.operators.TsdbLifecycle.oooIngest,
      Some(graft.operators.TsdbLifecycle.oooIngestSql)))
}
