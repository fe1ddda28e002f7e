package graft

import graft.operators.PromQl

/** Round-10 PromQL-read widening: vector matching, range-query step
  * resolution with the staleness lookback, and Prometheus' exact
  * boundary-extrapolated rate(). Every test checks SEMANTICS against an
  * independent driver-side brute force over synthetic series built to
  * hit each branch of the algorithm (the DuckDB gate separately checks
  * engine parity on the real tables). */
class Round10cSpec extends SparkTestBase {

  private case class Pt(tsSec: Long, id: Long, v: Double)

  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r10c").toString
    rows.map { case (id, tsSec, et, v) =>
      (id, new java.sql.Timestamp(tsSec * 1000L), id, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ------------------------------------------- extrapolated rate()

  /** Driver-side replay of Prometheus' extrapolatedRate with the
    * IDENTICAL op order as the shared staged expressions. */
  private def extrapolate(points: Seq[Pt], bucketStart: Long)
      : Option[(Long, Double, Double, Double)] = {
    val ps = points.sortBy(p => (p.tsSec, p.id))
    if (ps.size < 2 || ps.last.tsSec == ps.head.tsSec) None
    else {
      val incs = ps.zip(ps.tail).map { case (a, b) =>
        val delta = b.v - a.v
        if (delta < 0) b.v else delta
      }
      val sumInc = math.round(incs.sum * 100.0) / 100.0
      val n = ps.size
      val samp = (ps.last.tsSec - ps.head.tsSec).toDouble
      val avgDur = samp / (n - 1).toDouble
      // ≥v2.44 staging: threshold reduction FIRST, then the zero clamp
      val dts0 = (ps.head.tsSec - bucketStart).toDouble
      val dtsThr = if (dts0 >= avgDur * 1.1) avgDur / 2 else dts0
      val dts =
        if (sumInc > 0 && ps.head.v >= 0) math.min(samp * (ps.head.v / sumInc), dtsThr)
        else dtsThr
      val dte0 = (bucketStart + PromQl.RateWindowSec - ps.last.tsSec).toDouble
      val dte = if (dte0 >= avgDur * 1.1) avgDur / 2 else dte0
      val ext = samp + dts + dte
      val incE = math.floor(sumInc * (ext / samp) * 1e6) / 1e6
      val rate = math.floor(sumInc * (ext / samp) / PromQl.RateWindowSec * 1e6) / 1e6
      Some((n.toLong, sumInc, incE, rate))
    }
  }

  test("metrics_rate_extrapolated replays Prometheus' algorithm branch by branch") {
    // a: both edges within 1.1×avg → extrapolate to the boundaries
    // b: counter-zero clamp (firstV/inc tiny, first sample 10 ks into the window)
    // c: both edges beyond 1.1×avg → extend by avg/2 each; reset inside
    // d: single sample → no rate defined
    // e: the ≥v2.44 staging order case — zero crossing lands BETWEEN
    //    avg/2 and the 1.1×avg threshold, so the threshold reduction
    //    (→ avg/2) must win over the (larger) zero clamp
    // a2: second window for series a
    val rows = Seq(
      (1L, 100L, "a", 10.0), (2L, 5000L, "a", 11.0),
      (3L, 10000L, "a", 12.0), (4L, 21000L, "a", 13.0),
      (10L, 10000L, "b", 1.0), (11L, 15000L, "b", 500.0), (12L, 20000L, "b", 999.0),
      (20L, 10000L, "c", 5.0), (21L, 11000L, "c", 3.0),
      (30L, 500L, "d", 42.0),
      (40L, 10000L, "e", 400.0), (41L, 15000L, "e", 900.0), (42L, 20000L, "e", 1400.0),
      (5L, 21700L, "a", 14.0), (6L, 21800L, "a", 15.5))
    val dir = writeEvents(rows)
    val got = PromQl.rateExtrapolated(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val expected = rows.groupBy { case (_, ts, et, _) => (et, ts / PromQl.RateWindowSec * PromQl.RateWindowSec) }
      .flatMap { case ((et, b), rs) =>
        extrapolate(rs.map { case (id, ts, _, v) => Pt(ts, id, v) }, b)
          .map(x => (et, b) -> x)
      }
    assert(got == expected, s"got $got\nexpected $expected")
    // branch sanity: the clamp actually fired for b (dzero < durationToStart)
    val b = got(("b", 0L))
    assert(b._2 == 998.0, "b's reset-free increase")
    // with the clamp, start extension is ~10.02 s instead of 10000 s
    assert(b._3 < 998.0 * (11600.0 + 10000.0) / 10000.0,
      "b extrapolated increase shows the zero-crossing clamp, not full start extension")
    // c: reset handling (delta −2 → inc = fallen-to value 3)
    assert(got(("c", 0L))._2 == 3.0)
    assert(!got.contains(("d", 0L)), "single-sample window emits no rate")
    // e: samp=10000, avg=5000 → threshold 5500, avg/2=2500; zero crossing
    // at 10000·400/1000 = 4000 ∈ (2500, 5500). Current Prometheus takes
    // min(4000, 2500) = 2500 (pre-2.44 would have taken 4000 → 1560.0)
    assert(got(("e", 0L))._3 == 1410.0,
      "threshold reduction must precede the zero-crossing clamp")
  }

  // ---------------------------------------------------- query_range

  test("prom_query_range picks the latest sample within the lookback, else stale") {
    val step = PromQl.StepSec.toLong
    val rows = Seq(
      (1L, step, "x", 1.0),                 // exactly on the boundary: distance 0
      (2L, step - 1799L, "y", 2.0),         // one inside the lookback: kept
      (3L, step - 1800L, "z", 3.0),         // exactly lookback old: STALE (3.x left-open)
      (4L, 2 * step - 700L, "x", 4.0),      // two in one window:
      (5L, 2 * step - 200L, "x", 5.0),      //   the later one wins
      (6L, 3 * step - 100L, "x", 6.0),      // same second, higher id wins
      (7L, 3 * step - 100L, "x", 7.0))
    val dir = writeEvents(rows)
    val got = PromQl.queryRange(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val expected = rows
      .map { case (id, ts, et, v) => (et, (ts + step - 1) / step * step, ts, id, v) }
      .filter { case (_, k, ts, _, _) => k - ts < PromQl.LookbackSec }
      .groupBy { case (et, k, _, _, _) => (et, k) }
      .map { case (key, g) =>
        val (_, _, ts, _, v) = g.maxBy { case (_, _, ts, id, _) => (ts, id) }
        key -> (ts * 1000000L, v)
      }
    assert(got == expected, s"got $got\nexpected $expected")
    assert(!got.keySet.exists(_._1 == "z"),
      "a sample exactly lookback seconds before the step is stale (left-open window)")
    assert(got.keySet.exists(_._1 == "y"), "1799 s before the step is still live")
    assert(got(("x", 2 * step)) == ((2 * step - 200L) * 1000000L, 5.0))
    assert(got(("x", 3 * step))._2 == 7.0, "ties on the second break by event_id")
  }

  // ------------------------------------------------ vector matching

  test("prom_vector_matching: one-to-one avg and group_left share-of-total") {
    val rows = Seq(
      (1L, 3600L, "a", 10.0), (2L, 7200L, "a", 20.0),
      (3L, 3600L, "b", 30.0),
      (4L, 90000L, "a", 5.0), (5L, 93600L, "b", 15.0))
    val dir = writeEvents(rows)
    val got = PromQl.vectorMatching(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    def q6(x: Double) = math.floor(x * 1e6) / 1e6
    assert(got(("a", "1970-01-01")) == ((30.0, 2L, q6(30.0 / 2), 60.0, q6(30.0 / 60.0))))
    assert(got(("b", "1970-01-01")) == ((30.0, 1L, 30.0, 60.0, q6(30.0 / 60.0))))
    assert(got(("a", "1970-01-02")) == ((5.0, 1L, 5.0, 20.0, q6(5.0 / 20.0))))
    assert(got(("b", "1970-01-02")) == ((15.0, 1L, 15.0, 20.0, q6(15.0 / 20.0))))
    // group_left conservation: shares of a day sum to 1 within quantization
    got.keys.map(_._2).toSeq.distinct.foreach { day =>
      val shares = got.collect { case ((_, d), t) if d == day => t._5 }
      assert(shares.sum <= 1.0 + 1e-9 && shares.sum > 1.0 - 5e-6 * shares.size, s"$day shares: $shares")
    }
  }

  test("prom_vector_matching re-aggregates the family, not the corpus: one events scan") {
    // the sum-by(day) operand is a window over the aggregated family
    // frame — adding it must not re-scan or re-aggregate the corpus
    val p = plan("prom_vector_matching")
    assert(countScans(p) == 1,
      "sum by(day)(fam) operand re-scanned the corpus instead of windowing the family")
  }

  test("promql entries on the real tables: staleness and window-count invariants") {
    // query_range: every emitted sample really is within the lookback of its step
    val qr = PromQl.queryRange(spark, sf).collect()
    assert(qr.nonEmpty)
    qr.foreach { r =>
      val dist = r.getLong(1) - r.getLong(2) / 1000000L
      assert(dist >= 0 && dist < PromQl.LookbackSec, s"stale sample emitted: $r")
    }
    // rate: extrapolated increase is bounded by the raw increase × window/sampled
    PromQl.rateExtrapolated(spark, sf).collect().foreach { r =>
      val raw = r.getDouble(3); val ext = r.getDouble(4)
      assert(ext >= 0 && ext <= raw * PromQl.RateWindowSec + 1e-6, s"unbounded extrapolation: $r")
      assert(r.getLong(2) >= 2)
    }
  }
}
