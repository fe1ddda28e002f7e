package graft

import org.apache.spark.sql.functions._

/** Invariants of the unified remote-write sample stream
  * (prom_remote_write_all): all four MetricFamily types present, the
  * histogram's cumulative buckets are monotone, and the COUNTER /
  * HISTOGRAM `_count` / SUMMARY `_count` samples agree — the
  * cross-family consistency the reference's converter guarantees by
  * construction (it reads one MetricFamily per scrape).
  */
class ScrapersSpec extends SparkTestBase {

  private lazy val all = operators.Scrapers.remoteWriteAll(spark, sf).cache()

  test("all four family types emit samples") {
    val fams = all.select("family_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(fams == Set("COUNTER", "GAUGE", "HISTOGRAM", "SUMMARY"))
  }

  test("histogram buckets are cumulative per series") {
    val buckets = all
      .filter(col("metric_name") === "events_value_bucket" && col("label") =!= "+Inf")
      .select(col("event_type"), col("label").cast("int").as("le"), col("value"))
      .collect().groupBy(_.getString(0))
    assert(buckets.nonEmpty)
    buckets.foreach { case (et, rows) =>
      val byLe = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byLe.zip(byLe.tail).forall { case (a, b) => a <= b },
        s"non-monotone buckets for $et: ${byLe.mkString(",")}")
    }
  }

  test("counter, histogram _count, summary _count agree per series") {
    val pivots = all
      .filter(col("metric_name").isin("events_total", "events_value_hist_count", "events_value_count"))
      .groupBy(col("event_type"))
      .pivot("metric_name")
      .agg(first(col("value")))
      .collect()
    assert(pivots.nonEmpty)
    pivots.foreach { r =>
      val vals = (1 to 3).map(r.getDouble)
      assert(vals.distinct.size == 1, s"count mismatch for ${r.getString(0)}: $vals")
    }
  }

  test("+Inf bucket equals total count per series") {
    val rows = all
      .filter((col("metric_name") === "events_value_bucket" && col("label") === "+Inf") ||
        col("metric_name") === "events_total")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("value")).as("k"))
      .collect()
    assert(rows.forall(_.getLong(1) == 1L))
  }

  test("relabel pipeline: only shard 1 survives and the dropped type never appears") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Scrapers.relabel(spark, sf).cache()
    assert(df.filter(col("shard") =!= 1).count() == 0)
    assert(df.filter(col("service") === "svc_signup").count() == 0,
      "keep-regex must drop the signup series")
    assert(df.count() > 0)
    df.unpersist()
  }
  test("exposition parse: render -> parse round-trips the remote-write rows") {
    import org.apache.spark.sql.functions._
    val parsed = graft.operators.Scrapers.expositionParse(spark, sf).cache()
    val rw = graft.operators.Scrapers.remoteWrite(spark, sf)
      .select(col("metric_name"), col("engine"), col("identifier"), col("job"),
        // the wire carries the renderer's binary half-up 2 dp snap
        // (MetricsModel.snappedValue), so compare at exactly that grid
        (floor(col("value") * 100 + 0.5) / 100).as("value"))
      .collect().map(_.toSeq).toSet
    assert(parsed.collect().map(_.toSeq).toSet == rw,
      "parsing our own exposition must recover the source rows")
    assert(parsed.filter(col("metric_name") === "").count() == 0)
    parsed.unpersist()
  }

  test("histogram rebucket: deltas sum to the +Inf cumulative, monotone in le") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Scrapers.histogramRebucket(spark, sf).cache()
    // per (series, day): sum of bin deltas == total count
    val bad = df.groupBy("event_type", "day")
      .agg(sum(col("bin_count")).as("s"),
        max(when(col("le") === "+Inf", col("cum_count"))).as("tot"))
      .filter(col("s") =!= col("tot"))
    assert(bad.count() == 0)
    assert(df.filter(col("bin_count") < 0).count() == 0, "cumulative counts are monotone")
    df.unpersist()
  }

  test("series cardinality: series >= max(dimension), every family covered") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Scrapers.seriesCardinality(spark, sf).cache()
    assert(df.select("family_type").distinct().count() == 4, "all four MetricFamily types")
    assert(df.filter(col("n_series") < greatest(col("n_targets"), col("n_label_values")))
      .count() == 0, "the key space is at least its largest dimension")
    assert(df.filter(col("n_series") > col("n_targets") * col("n_label_values")).count() == 0)
    df.unpersist()
  }

}
