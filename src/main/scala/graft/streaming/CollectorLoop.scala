package graft.streaming

import graft.sources.SourceRegistry
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** The reference's continuously-running service shape, re-expressed as
  * a Structured-Streaming-driven micro-batch loop (the collector
  * daemon: refresh secrets every interval, scrape each enrolled
  * database, encode, push — database-collector.go:82-150, 262-281).
  *
  * Each tick of the trigger stream runs one collection round:
  *
  *   1. ENUMERATE — parse the secret payloads, keep sources carrying
  *      the enrollment tag key, build DSNs (`source_tag_filter` /
  *      `source_config_dsn` semantics).
  *   2. DIFF — full-outer the enrolled registry against the previous
  *      round's snapshot → added/kept/removed (`source_refresh_diff`
  *      semantics; the reference re-lists secrets every 15 min).
  *   3. SCRAPE, INCREMENTALLY — read each enrolled source through
  *      [[SourceRegistry.read]] (JDBC/file alike) and keep only rows
  *      past the source's stored watermark (`source_incremental_read`
  *      semantics; the `ts_sec > wm` predicate pushes into the scan —
  *      on JDBC it becomes a WHERE on the remote query). The scrape
  *      target is the fixed `metrics(name, val, ts_sec)` table — the
  *      reference exporters likewise hardcode their per-engine queries.
  *   4. ENCODE — every scraped sample becomes a Prometheus
  *      remote-write frame ([[graft.operators.PromWire.encodeSamples]],
  *      the source id as the series label), grouped into one
  *      snappy-compressed WriteRequest body per (source, metric) —
  *      the reference's `proto.Marshal` + `snappy.Encode` push path.
  *      The sigv4-signed HTTP POST stays out of scope (AWS infra); the
  *      bodies parquet is the push boundary.
  *
  * Round state (registry snapshot, per-source watermarks) and outputs
  * (manifest, bodies) live under a work directory as parquet — tiny
  * |sources|-bounded tables, re-readable on restart, so the loop is a
  * restartable foreachBatch pipeline rather than driver-memory state.
  * At scale each source's scrape is a distributed read; nothing here
  * collects data rows to the driver (the registry collect is config
  * rows — the reference holds the same list in memory).
  */
object CollectorLoop {

  /** Fixed scrape target, mirroring the reference's per-engine
    * hardcoded queries (SHOW GLOBAL STATUS etc.). */
  val ScrapeTable = "metrics"

  private def exists(spark: SparkSession, path: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    } catch { case _: Throwable => false }

  /** Enrolled registry for one round: id, engine, dsn + the config
    * fields [[SourceRegistry.read]] needs. */
  def enumerate(spark: SparkSession, secrets: Seq[String]): DataFrame =
    SourceRegistry.withDsn(SourceRegistry.parseSecrets(spark, secrets)
      .filter(col("tags").getItem(SourceRegistry.EnabledTagKey).isNotNull))
      .withColumn("source_id", concat(col("host"), lit(":"), col("port")))

  /** One collection round. Returns the round's manifest (one row per
    * enrolled-or-removed source: status, watermark movement, rows
    * scraped) after appending bodies + manifest parquet and advancing
    * the state snapshots under `workDir`. */
  def runRound(spark: SparkSession, secrets: Seq[String], workDir: String,
      round: Long): DataFrame = {
    import spark.implicits._

    // 1. enumerate
    val enrolled = enumerate(spark, secrets)
      .select("source_id", "engine", "format", "path", "host", "port",
        "username", "password", "dbname")
      .collect()

    // 2. diff against the previous registry snapshot
    val regPath = s"$workDir/registry"
    val prevIds: Set[String] =
      if (exists(spark, regPath))
        spark.read.parquet(regPath).select("source_id").as[String].collect().toSet
      else Set.empty
    val curIds = enrolled.map(_.getAs[String]("source_id")).toSet
    val status: Map[String, String] =
      (curIds.map(id => id -> (if (prevIds(id)) "kept" else "added")) ++
        (prevIds -- curIds).map(_ -> "removed")).toMap

    // 3. per-source incremental scrape
    val wmPath = s"$workDir/watermarks"
    val storedWm: Map[String, Long] =
      if (exists(spark, wmPath))
        spark.read.parquet(wmPath).as[(String, Long)].collect().toMap
      else Map.empty
    val scraped: Seq[(String, Long, DataFrame)] = enrolled.toSeq.map { r =>
      val id = r.getAs[String]("source_id")
      val conf = Seq("engine", "format", "path", "host", "port", "username",
        "password", "dbname")
        .flatMap(k => Option(r.getAs[String](k)).map(k -> _)).toMap +
        ("dbtable" -> ScrapeTable)
      val wm = storedWm.getOrElse(id, Long.MinValue)
      val rows = SourceRegistry.read(spark, conf)
        .filter(col("ts_sec") > wm) // pushes into the JDBC WHERE / scan
      (id, wm, rows)
    }

    // union every source's scrape into ONE plan: the reference scrapes
    // its databases concurrently (sync.WaitGroup) — here concurrency
    // is Spark's own scheduling of the union's leaves, and both the
    // manifest stats and the bodies are single jobs regardless of how
    // many sources are enrolled (no per-source driver round-trips)
    val scrapedRows = scraped
      .map { case (id, _, rows) =>
        rows.select(lit(id).as("source_id"), col("name").cast("string").as("name"),
          col("val").cast("double").as("val"), col("ts_sec").cast("long").as("ts_sec"))
      }
      .reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(String, String, Double, Long)]
        .toDF("source_id", "name", "val", "ts_sec"))

    val samples = scrapedRows.select(col("name").as("metric_name"),
      col("source_id").as("event_type"), col("val").as("value"),
      (col("ts_sec") * 1000L).as("ts_ms"))
    val bodies = graft.operators.PromWire.encodeSamples(samples)
      .groupBy(col("event_type").as("source_id"), col("metric_name"))
      .agg(count(lit(1)).as("n_series"),
        expr("""array_join(transform(
                  array_sort(collect_list(struct(ts_ms, wire_hex))),
                  x -> x.wire_hex), '')""").as("body_hex"))
      .selectExpr("source_id", "metric_name", "n_series",
        "length(body_hex) div 2 AS body_len",
        "graft_snappy(unhex(body_hex)) AS body_snappy")
      .withColumn("round", lit(round))
    bodies.write.mode("append").parquet(s"$workDir/bodies")

    // manifest + advanced state (all |sources|-bounded): one grouped
    // aggregation over the union — a source with no new rows simply
    // has no group and keeps its stored watermark
    val counts: Map[String, (Long, Long)] = scrapedRows
      .groupBy(col("source_id"))
      .agg(count(lit(1)).as("n"), max(col("ts_sec")).as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val manifest = status.toSeq.sortBy(_._1).map { case (id, st) =>
      val wm = storedWm.getOrElse(id, Long.MinValue)
      val (n, newWm) = counts.getOrElse(id, (0L, wm))
      (round, id, st, wm, n, newWm)
    }.toDF("round", "source_id", "status", "old_watermark", "n_new", "new_watermark")
    manifest.write.mode("append").parquet(s"$workDir/manifest")

    // advance snapshots AFTER outputs so a failed round replays cleanly
    enrolled.map(_.getAs[String]("source_id")).toSeq.toDF("source_id")
      .write.mode("overwrite").parquet(regPath)
    val newWms = (storedWm ++ counts.map { case (id, (_, w)) => id -> w })
      .filter { case (id, _) => curIds(id) || storedWm.contains(id) }
    newWms.toSeq.toDF("source_id", "watermark")
      .write.mode("overwrite").parquet(wmPath)

    manifest
  }

  /** Wire the loop onto a trigger stream: each tick value is a round
    * number; `secrets` is re-evaluated per round (the reference's
    * RefreshSecrets goroutine). Production: `spark.readStream
    * .format("rate")` with a processing-time trigger; specs: a
    * MemoryStream of round numbers. */
  def stream(ticks: Dataset[Long], secrets: () => Seq[String],
      workDir: String, trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[Long] =
    ticks.writeStream
      .trigger(trigger)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Long], _: Long) =>
        val spark = batch.sparkSession
        batch.collect().sorted.foreach(r => runRound(spark, secrets(), workDir, r))
      }
}
