package graft

/** Round-15 closures of the r14 verdict/advice findings:
  *   - the api/v1 metadata + buildinfo envelopes must parse as JSON
  *     with the published struct field order, metadata names must be
  *     DERIVED from the engine's own exposition surface, and the
  *     reference-pinned rds_service_events declaration must survive;
  *   - the empty-vector label bodies must be `data:[]`, never an
  *     invalid one-empty-string array (the r14 ADVICE engine fork);
  *   - the doc-sample pair budget must stay exhaustive at gate scale
  *     with `sample_ppm` the square of the doc rate on the ppm grid.
  */
class Round15Spec extends SparkTestBase {

  test("api/v1 metadata: derived names, reference-pinned events metric, Go key order") {
    import org.json4s._
    val body = SparkEntry.queries("prom_api_metadata_json")(spark, sf)
      .head().getString(0)
    val j = jackson.JsonMethods.parse(body).asInstanceOf[JObject]
    assert(j.obj.map(_._1) == List("status", "data"))
    val data = (j \ "data").asInstanceOf[JObject]
    val names = data.obj.map(_._1)
    assert(names == names.sorted, s"map keys must be alphabetical: $names")
    // names derive from the remote-write stream: every metric the
    // converter emits must appear, plus the events counter
    val streamNames = graft.operators.Scrapers.remoteWrite(spark, sf)
      .select("metric_name").distinct().collect().map(_.getString(0)).toSet
    assert(streamNames.subsetOf(names.toSet), s"missing: ${streamNames -- names.toSet}")
    assert(names.contains("rds_service_events"))
    data.obj.foreach { case (name, arr) =>
      val m = arr.asInstanceOf[JArray].arr.head.asInstanceOf[JObject]
      assert(m.obj.map(_._1) == List("type", "help", "unit"),
        s"$name metadata field order")
      val mtype = (m \ "type").asInstanceOf[JString].s
      if (name == "rds_service_events") {
        assert(mtype == "counter")
        assert((m \ "help").asInstanceOf[JString].s.startsWith("This metric indicates"))
      } else {
        val conv = if (name.endsWith("_total") || name.endsWith("_count"))
          "counter" else "gauge"
        assert(mtype == conv, s"$name: $mtype != $conv")
      }
    }
  }

  test("api/v1 buildinfo: Go struct field order, computed revision + buildDate") {
    import org.json4s._
    val body = SparkEntry.queries("prom_api_buildinfo_json")(spark, sf)
      .head().getString(0)
    val j = jackson.JsonMethods.parse(body).asInstanceOf[JObject]
    assert(j.obj.map(_._1) == List("status", "data"))
    val data = (j \ "data").asInstanceOf[JObject]
    assert(data.obj.map(_._1) ==
      List("version", "revision", "branch", "buildUser", "buildDate", "goVersion"))
    val rev = (data \ "revision").asInstanceOf[JString].s
    assert(rev.matches("[0-9a-f]{7}"), s"revision must be a 7-hex fingerprint: $rev")
    val bd = (data \ "buildDate").asInstanceOf[JString].s
    assert(bd.matches("\\d{8}-\\d{2}:\\d{2}:\\d{2}"), s"buildDate layout: $bd")
  }

  test("api/v1 label listings emit data:[] on an empty vector (no engine fork)") {
    // both label entries aggregate the instant vector; an empty corpus
    // slice must yield the valid empty array, not [""] (Spark concat
    // over an empty collect_list) or a NULL body (DuckDB string_agg)
    import org.apache.spark.sql.functions._
    // the exact agg shape both label entries use, over a 0-row frame
    val empty = spark.range(0).select(lit("j").as("job"))
      .select(col("job")).distinct()
      .agg(
        when(count(col("job")) > 0,
          concat(lit("{\"status\":\"success\",\"data\":[\""),
            array_join(sort_array(collect_list(col("job"))), "\",\""),
            lit("\"]}")))
          .otherwise(lit("{\"status\":\"success\",\"data\":[]}")).as("body"))
      .head().getString(0)
    assert(empty == "{\"status\":\"success\",\"data\":[]}")
    // and the real entries still produce non-empty sorted arrays
    val body = SparkEntry.queries("prom_api_labels_json")(spark, sf).head().getString(0)
    assert(body.contains("\"data\":[\""))
  }

  test("bucket clustering coarsens verified-pair clustering (no component splits)") {
    import org.apache.spark.sql.functions._
    // every verified near-dup pair shares a band bucket by construction,
    // so the bucket components may MERGE verified components but can
    // never split one: both endpoints of every verified pair must land
    // in the same bucket cluster
    val bc = SparkEntry.queries("dedup_cluster_buckets")(spark, sf)
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
    val split = pairs
      .join(bc.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), "doc_a")
      .join(bc.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), "doc_b")
      .filter(col("ca") =!= col("cb"))
      .count()
    assert(split == 0L, s"$split verified pairs split across bucket clusters")
    // and it is a genuine coarsening target: every verified-cluster doc
    // appears in the bucket clustering too
    val vc = SparkEntry.queries("dedup_cluster")(spark, sf)
    val missing = vc.select("doc_id").exceptAll(bc.select("doc_id")).count()
    assert(missing == 0L, s"$missing verified-cluster docs missing from bucket clusters")
  }

  test("doc-sample budget: gate scale exhaustive, sample_ppm = doc rate squared") {
    val audit = SparkEntry.queries("dedup_pair_budget_audit")(spark, sf).head()
    val docPpm = audit.getLong(1)
    val samplePpm = audit.getLong(2)
    assert(samplePpm == docPpm * docPpm / 1000000L,
      s"sample_ppm ($samplePpm) must be dq^2/1e6 of doc rate ($docPpm)")
    assert(docPpm == 1000000L && samplePpm == 1000000L,
      "gate scale must be exhaustive")
  }
}
