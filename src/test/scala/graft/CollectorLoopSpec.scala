package graft

import graft.streaming.CollectorLoop
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end collector service loop on a REAL database (embedded
  * Derby): enumerate → diff → incremental scrape → encode → push,
  * two rounds. Proves the chain the reference daemon runs — round
  * N+1 processes ONLY rows inserted after round N, a source added
  * between rounds is picked up as `added`, and every pushed body is a
  * decodable snappy'd WriteRequest. */
class CollectorLoopSpec extends SparkTestBase {

  // minimal independent protobuf wire decoder (same approach as
  // PromWireSpec: written against the public encoding spec)
  private def readVarint(b: Array[Byte], p: Int): (Long, Int) = {
    var x = 0L; var shift = 0; var i = p
    while ({ val c = b(i); x |= (c & 0x7fL) << shift; shift += 7; i += 1; (c & 0x80) != 0 }) ()
    (x, i)
  }
  private def lenFields(b: Array[Byte], num: Int): Seq[Array[Byte]] = {
    var p = 0; val out = Seq.newBuilder[Array[Byte]]
    while (p < b.length) {
      val (tag, p1) = readVarint(b, p)
      (tag & 7).toInt match {
        case 0 => p = readVarint(b, p1)._2
        case 1 => p = p1 + 8
        case 2 =>
          val (len, p2) = readVarint(b, p1)
          if ((tag >> 3).toInt == num) out += b.slice(p2, p2 + len.toInt)
          p = p2 + len.toInt
      }
    }
    out.result()
  }

  private def secret(host: String, path: String): String =
    s"""{"engine":"derby","host":"$host","port":"1527","username":"u","password":"p",
        "dbname":"d","format":"jdbc","path":"$path",
        "tags":{"${graft.sources.SourceRegistry.EnabledTagKey}":"true"}}"""
      .replaceAll("\n\\s*", "")

  test("two rounds on Derby: only new rows, added source detected, bodies decode") {
    val base = java.nio.file.Files.createTempDirectory("graft_loop").toString
    val db1 = s"$base/src1"
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db1;create=true", "u", "p")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        s"CREATE TABLE ${CollectorLoop.ScrapeTable} (name VARCHAR(64), val DOUBLE, ts_sec BIGINT)")
      st.executeUpdate(s"INSERT INTO ${CollectorLoop.ScrapeTable} VALUES " +
        "('up', 1.0, 100), ('threads_running', 7.0, 100), ('up', 1.0, 160)")
      st.close()
    } finally conn.close()

    val work = s"$base/work"
    @volatile var secrets = Seq(secret("db1.example.com", db1))

    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ticks = MemoryStream[Long]
    val q = CollectorLoop.stream(ticks.toDS(), () => secrets, work)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      // ---- round 1: fresh registry, full scrape
      ticks.addData(1L); q.processAllAvailable()
      val m1 = spark.read.parquet(s"$work/manifest").filter(col("round") === 1)
      assert(m1.count() == 1)
      val r1 = m1.head()
      assert(r1.getAs[String]("status") == "added")
      assert(r1.getAs[Long]("n_new") == 3)
      assert(r1.getAs[Long]("new_watermark") == 160)

      // ---- between rounds: source grows; a second source enrolls
      val c2 = java.sql.DriverManager.getConnection(s"jdbc:derby:$db1", "u", "p")
      try {
        val st = c2.createStatement()
        st.executeUpdate(s"INSERT INTO ${CollectorLoop.ScrapeTable} VALUES " +
          "('up', 1.0, 220), ('threads_running', 9.0, 220)")
        st.close()
      } finally c2.close()
      val db2 = s"$base/src2"
      val cn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "u", "p")
      try {
        val st = cn.createStatement()
        st.executeUpdate(
          s"CREATE TABLE ${CollectorLoop.ScrapeTable} (name VARCHAR(64), val DOUBLE, ts_sec BIGINT)")
        st.executeUpdate(s"INSERT INTO ${CollectorLoop.ScrapeTable} VALUES ('up', 1.0, 150)")
        st.close()
      } finally cn.close()
      secrets = Seq(secret("db1.example.com", db1), secret("db2.example.com", db2))

      // ---- round 2: incremental on db1, full on the new db2
      ticks.addData(2L); q.processAllAvailable()
      val m2 = spark.read.parquet(s"$work/manifest").filter(col("round") === 2)
        .collect().map(r => r.getAs[String]("source_id") -> r).toMap
      assert(m2.size == 2)
      val d1 = m2("db1.example.com:1527")
      assert(d1.getAs[String]("status") == "kept")
      assert(d1.getAs[Long]("old_watermark") == 160, "round 2 starts at round 1's watermark")
      assert(d1.getAs[Long]("n_new") == 2, "round 2 scrapes ONLY the rows inserted after round 1")
      assert(d1.getAs[Long]("new_watermark") == 220)
      val d2 = m2("db2.example.com:1527")
      assert(d2.getAs[String]("status") == "added")
      assert(d2.getAs[Long]("n_new") == 1)

      // ---- every pushed body decodes: snappy → WriteRequest with
      // n_series field-1 TimeSeries, source id recoverable as a label
      val bodies = spark.read.parquet(s"$work/bodies")
        .selectExpr("round", "source_id", "metric_name", "n_series",
          "graft_unsnappy(body_snappy) AS body")
        .collect()
      assert(bodies.nonEmpty)
      bodies.foreach { b =>
        val series = lenFields(b.getAs[Array[Byte]]("body"), 1)
        assert(series.size == b.getAs[Long]("n_series"))
        series.foreach { ts =>
          val labels = lenFields(ts, 1).map { kv =>
            val k = lenFields(kv, 1).head
            val v = lenFields(kv, 2).headOption.getOrElse(Array.empty[Byte])
            new String(k, "UTF-8") -> new String(v, "UTF-8")
          }.toMap
          assert(labels("__name__") == b.getAs[String]("metric_name"))
          assert(labels("event_type") == b.getAs[String]("source_id"))
          assert(lenFields(ts, 2).size == 1, "exactly one sample per frame")
        }
      }
      // round-2 bodies carry only the incremental sample count for db1
      val r2up = spark.read.parquet(s"$work/bodies")
        .filter(col("round") === 2 && col("source_id") === "db1.example.com:1527" &&
          col("metric_name") === "up")
        .head().getAs[Long]("n_series")
      assert(r2up == 1, "only the post-round-1 'up' sample ships in round 2")

      // ---- round 3 with nothing new: watermark holds, zero rows
      ticks.addData(3L); q.processAllAvailable()
      val m3 = spark.read.parquet(s"$work/manifest").filter(col("round") === 3)
        .collect().map(r => r.getAs[String]("source_id") -> r).toMap
      assert(m3("db1.example.com:1527").getAs[Long]("n_new") == 0)
      assert(m3("db1.example.com:1527").getAs[Long]("new_watermark") == 220)
    } finally q.stop()
  }

  test("loop state survives a process restart: a NEW query resumes from the stored watermark") {
    val base = java.nio.file.Files.createTempDirectory("graft_loop_rs").toString
    val db = s"$base/src"
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db;create=true", "u", "p")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        s"CREATE TABLE ${CollectorLoop.ScrapeTable} (name VARCHAR(64), val DOUBLE, ts_sec BIGINT)")
      st.executeUpdate(s"INSERT INTO ${CollectorLoop.ScrapeTable} VALUES ('up', 1.0, 50)")
      st.close()
    } finally conn.close()
    val secrets = Seq(secret("dbr.example.com", db))
    val work = s"$base/work"

    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val t1 = MemoryStream[Long]
    val q1 = CollectorLoop.stream(t1.toDS(), () => secrets, work)
      .option("checkpointLocation", s"$base/ckpt1").start()
    try { t1.addData(1L); q1.processAllAvailable() } finally q1.stop()

    // "restart": a brand-new query, fresh checkpoint — only the
    // workDir parquet state carries over, as after a driver crash
    val c2 = java.sql.DriverManager.getConnection(s"jdbc:derby:$db", "u", "p")
    try {
      val st = c2.createStatement()
      st.executeUpdate(s"INSERT INTO ${CollectorLoop.ScrapeTable} VALUES ('up', 2.0, 90)")
      st.close()
    } finally c2.close()
    val t2 = MemoryStream[Long]
    val q2 = CollectorLoop.stream(t2.toDS(), () => secrets, work)
      .option("checkpointLocation", s"$base/ckpt2").start()
    try { t2.addData(2L); q2.processAllAvailable() } finally q2.stop()

    val m = spark.read.parquet(s"$work/manifest").collect()
      .map(r => r.getAs[Long]("round") -> r).toMap
    assert(m(1L).getAs[Long]("n_new") == 1 && m(1L).getAs[Long]("new_watermark") == 50)
    assert(m(2L).getAs[String]("status") == "kept",
      "registry snapshot survived the restart")
    assert(m(2L).getAs[Long]("old_watermark") == 50 && m(2L).getAs[Long]("n_new") == 1,
      "restarted loop resumed from the stored watermark, not a rescan")
  }
}
