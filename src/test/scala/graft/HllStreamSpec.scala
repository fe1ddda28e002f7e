package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** MemoryStream parity for the live HLL: a real three-chunk run's
  * final sketch per series must equal `sketch_hll_distinct`'s ledger
  * row for row — same registers hit, same estimate (the exact-integer
  * harmonic scaling makes merge order irrelevant), same measured
  * error. Also pins the Scala-side md5 hash against Spark's
  * conv(substring(md5(...))) derivation. */
class HllStreamSpec extends SparkTestBase {

  test("hash60 matches Spark's conv(substring(md5(...), 1, 15), 16, 10)") {
    import graft.streaming.HllStream
    val ids = Seq(0L, 1L, 42L, 999999L)
    val sparkSide = spark.sql(
      s"SELECT cast(id as bigint), cast(conv(substring(md5(concat('hll:', cast(id as string))), 1, 15), 16, 10) as bigint) " +
        s"FROM (SELECT explode(array(${ids.mkString(",")})) AS id)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(HllStream.hash60(id) == sparkSide(id), s"hash mismatch for $id")
    }
  }

  test("stream_hll_distinct: a real MemoryStream run ends at the batch sketch exactly") {
    import graft.streaming.HllStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val samples = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type AS series", "user_id")
      .as[HllStream.HllInput].collect()

    val input = MemoryStream[HllStream.HllInput]
    val q = HllStream.hllStream(input.toDS(), auditExact = true)
      .writeStream.format("memory").queryName("hll_sink")
      .outputMode(OutputMode.Update).start()
    try {
      val third = samples.length / 3
      Seq(samples.take(third), samples.slice(third, 2 * third),
        samples.drop(2 * third)).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("hll_sink").collect()
        .groupBy(_.getString(0))
        .map { case (k, rows) =>
          // last snapshot = the one with the most exact-distinct users
          val last = rows.maxBy(_.getLong(4))
          k -> (1 to 5).map(last.getLong).toList
        }
      val want = SparkEntry.queries("sketch_hll_distinct")(spark, sf).collect()
        .map(r => r.getString(0) -> (1 to 5).map(r.getLong).toList).toMap
      assert(got == want, s"stream/batch fork: got=$got want=$want")
    } finally q.stop()
  }
}
