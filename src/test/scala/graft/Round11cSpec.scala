package graft

/** Round-11 widening, part 3: Matryoshka truncation QA, packed-window
  * boundary offsets, and labeler-agreement κ — semantic invariants
  * beyond the DuckDB hash gate. */
class Round11cSpec extends SparkTestBase {

  test("emb_matryoshka_truncate: full dim recalls itself, prefixes bounded") {
    val rows = SparkEntry.queries("emb_matryoshka_truncate")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(8, 16, 32, 64))
    val (nq, _, r64) = rows(64)
    assert(r64 == 1.0, "the full-dimension top-k must recall itself exactly")
    rows.foreach { case (p, (q, m, rec)) =>
      assert(q == nq)
      assert(m >= 0 && m <= q * graft.operators.Similarity.TopK)
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range at prefix $p")
    }
    assert(rows(8)._3 <= rows(64)._3, "prefix-8 recall cannot beat full dim")
  }

  test("pack_boundary_offsets agrees with pack_token_budget and starts at 0") {
    val packs = SparkEntry.queries("pack_token_budget")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val bounds = SparkEntry.queries("pack_boundary_offsets")(spark, sf).collect()
    assert(bounds.nonEmpty)
    bounds.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val (nDocs, packTokens) = (r.getLong(2), r.getLong(3))
      assert(packs(key) == ((nDocs, packTokens)),
        s"boundary pack $key disagrees with the packer")
      val offs = r.getString(4).split(",").map(_.toLong)
      assert(offs.length == nDocs, s"one boundary per doc at $key")
      assert(offs.head == 0, s"first doc starts the window at $key")
      assert(offs.zip(offs.tail).forall { case (a, b) => a < b },
        s"offsets strictly increase at $key")
      assert(offs.last < packTokens, s"last boundary inside the window at $key")
    }
  }

  test("prom_native_histogram_rate_quantile: estimates live inside their buckets") {
    val perWin = SparkEntry.queries("prom_native_histogram_rate_quantile")(spark, sf)
      .collect()
    assert(perWin.nonEmpty)
    val values = graft.sources.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr(
          s"(floor(unix_timestamp(ts) / ${graft.operators.NativeHistogram.RateWinSec}) " +
            s"* ${graft.operators.NativeHistogram.RateWinSec})").cast("long").as("w"),
        org.apache.spark.sql.functions.col("value"))
      .collect().groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.map(_.getDouble(2))).toMap
    perWin.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val vs = values(key)
      assert(r.getLong(2) == vs.length, s"window count mismatch at $key")
      val p90 = r.getDouble(3)
      // the interpolated estimate sits within the window's value hull
      // stretched by one bucket width (base 2^1/4 → ≤ ~19% per side)
      assert(p90 >= vs.min / 1.2 - 1e-9 && p90 <= vs.max * 1.2 + 1e-9,
        s"p90 $p90 outside the window hull [${vs.min}, ${vs.max}] at $key")
      // and at/above the exact median — it is a p90
      val sorted = vs.sorted
      assert(p90 >= sorted((vs.length - 1) / 2) / 1.2,
        s"p90 below the window median at $key")
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("text_annotation_agreement: confusion matrix partitions and κ replays") {
    val rows = SparkEntry.queries("text_annotation_agreement")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, both, aOnly, bOnly, neither) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both + aOnly + bOnly + neither == n, "confusion cells partition the docs")
      val po = (both + neither).toDouble / n.toDouble
      val pe = ((both + aOnly).toDouble * (both + bOnly).toDouble
        + (bOnly + neither).toDouble * (aOnly + neither).toDouble) / (n.toDouble * n.toDouble)
      assert(r.getDouble(6) == math.floor(po * 1e4) / 1e4)
      if (pe != 1.0) {
        val kappa = math.floor((po - pe) / (1.0 - pe) * 1e4) / 1e4
        assert(r.getDouble(7) == kappa, s"κ mismatch for ${r.getString(0)}")
        assert(kappa >= -1.0 && kappa <= 1.0)
      } else assert(r.isNullAt(7), "degenerate marginals must yield NULL κ")
    }
  }
}
