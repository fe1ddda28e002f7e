package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE delta-of-delta timestamp encoding — the chunk-append-time
  * accounting whose after-the-fact audit is `tsdb_dod_timestamps`
  * (TsdbLifecycle.scala): a streaming TSDB head appends each sample to
  * its series' open chunk and pays the varbit class cost at THAT
  * moment, from exactly two longs of state (the previous timestamp and
  * the previous delta) plus seven counters — O(1) per series, the
  * property that lets an ingest tier account compression for millions
  * of series as it writes them.
  *
  * Ordering contract (the chunk-append contract): a chunk appends in
  * timestamp order, so the stream equals the batch audit when samples
  * arrive per series in (es, arrival) order across micro-batches;
  * within a batch the processor restores (es, arrival) order by
  * sorting the chunk (the OooStream discipline). DodStreamSpec proves
  * a real three-chunk MemoryStream run ends at the batch audit's
  * ledger row for row. */
object DodStream {

  type Q = (SparkSession, String) => DataFrame

  case class DodSample(series: String, es: Long, arrival: Long)
  case class DodState(prevEs: Long, prevDelta: Long, n: Long, nDod0: Long,
      nB14: Long, nB17: Long, nB20: Long, nB64: Long, totalBits: Long)
  case class DodLedger(series: String, n_samples: Long, n_dod0: Long,
      n_bits14: Long, n_bits17: Long, n_bits20: Long, n_bits64: Long,
      total_bits: Long, bits_per_sample_x100: Long, compression_x100: Long)

  def dodEncodingStream(samples: Dataset[DodSample]): Dataset[DodLedger] = {
    import samples.sparkSession.implicits._
    samples.groupByKey(_.series)
      .flatMapGroupsWithState[DodState, DodLedger](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (series: String, chunk: Iterator[DodSample], state: GroupState[DodState]) =>
          var st = state.getOption.getOrElse(
            DodState(Long.MinValue, Long.MinValue, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          chunk.toSeq.sortBy(s => (s.es, s.arrival)).foreach { s =>
            if (st.n == 0L)
              st = st.copy(prevEs = s.es, n = 1L, totalBits = st.totalBits + 64L)
            else if (st.n == 1L)
              st = st.copy(prevEs = s.es, prevDelta = s.es - st.prevEs,
                n = 2L, totalBits = st.totalBits + 64L)
            else {
              val delta = s.es - st.prevEs
              val dod = delta - st.prevDelta
              val bits =
                if (dod == 0L) 1L
                else if (dod >= -8191L && dod <= 8192L) 16L
                else if (dod >= -65535L && dod <= 65536L) 20L
                else if (dod >= -524287L && dod <= 524288L) 24L
                else 68L
              st = st.copy(prevEs = s.es, prevDelta = delta, n = st.n + 1,
                nDod0 = st.nDod0 + (if (bits == 1L) 1L else 0L),
                nB14 = st.nB14 + (if (bits == 16L) 1L else 0L),
                nB17 = st.nB17 + (if (bits == 20L) 1L else 0L),
                nB20 = st.nB20 + (if (bits == 24L) 1L else 0L),
                nB64 = st.nB64 + (if (bits == 68L) 1L else 0L),
                totalBits = st.totalBits + bits)
            }
          }
          state.update(st)
          Iterator(DodLedger(series, st.n, st.nDod0, st.nB14, st.nB17,
            st.nB20, st.nB64, st.totalBits,
            st.totalBits * 100L / st.n, st.n * 64L * 100L / st.totalBits))
      }
  }

  /** Driver-contract entry: the batch twin (same frame, same oracle) —
    * the stream's final per-series ledger equals this row for row. */
  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("stream_dod_encoding", graft.operators.TsdbLifecycle.dodTimestamps,
      Some(graft.operators.TsdbLifecycle.dodTimestampsSql)))
}
