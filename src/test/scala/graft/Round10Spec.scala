package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Round-10 additions: the fuzzy-edit block cap, the corpus-scaled
  * SemDeDup quantizer, the graft_pairs overflow guard, and the native
  * histogram overflow-bucket fail-loud contract. */
class Round10Spec extends SparkTestBase {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("fuzzy-edit cap: an oversize block shards deterministically and NN is exact within each shard") {
    import spark.implicits._
    // ONE (lang, band) block of 300 docs — far past FuzzyCap, so the
    // entry must shard it into ceil(300/FuzzyCap) content pieces
    // (cap-derived below, so a retuned cap can't strand this test)
    val n = 300
    val rows = (0 until n).map { i =>
      val txt = f"doc$i%03d opening words diverge here ${"abcdefg".drop(i % 5)} then a shared tail $i"
      (i.toLong, txt, "xx", "syn", 400L + i % 5) // n_chars 400..404 → band 10
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzycap").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.fuzzyEdit(spark, dir)
      .select("doc_id", "nn_doc_id", "edit_distance")
      .as[(Long, Long, Int)].collect()

    // replicate the entry's shard rule on the driver: md5 of the
    // prefix's 12-char head, first 15 hex digits as int, mod ceil(n/cap)
    val nsh = math.ceil(n / Dedup.FuzzyCap.toDouble).toLong
    assert(nsh > 1, s"FuzzyCap=${Dedup.FuzzyCap} must shard a 300-doc block")
    def shard(prefix: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(prefix.take(12).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16) % nsh
    }
    val byShard = rows.map(r => (r._1, r._2.take(Dedup.FuzzyPrefix)))
      .groupBy(r => shard(r._2))
    assert(byShard.size > 1, "the hash must actually spread the block over shards")
    val want = byShard.values.flatMap { sh =>
      if (sh.length < 2) Nil
      else sh.map { a =>
        val best = sh.filter(_._1 != a._1).map(b => (lev(a._2, b._2), b._1)).min
        (a._1, best._2, best._1)
      }
    }.toSet
    assert(out.toSet == want,
      s"got=${out.length} want=${want.size} diff=${(want diff out.toSet).take(3)}")
  }

  test("graft_pairs: a block past 65536 ids fails loudly instead of mis-sizing") {
    val big = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate(65537)(_.toLong.asInstanceOf[Any]))
    val e = intercept[IllegalArgumentException] {
      graft.functions.TextKernels.pairCombos(big)
    }
    assert(e.getMessage.contains("cap the block"))
    // and the boundary below still sizes exactly
    val ok = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate(200)(_.toLong.asInstanceOf[Any]))
    assert(graft.functions.TextKernels.pairCombos(ok).numElements() == 200 * 199 / 2)
  }

  test("semCellCount: NumCells floor at gate scale, K ∝ corpus past it") {
    assert(Similarity.semCellCount(500) == Similarity.NumCells)
    assert(Similarity.semCellCount(2000) == Similarity.NumCells)
    assert(Similarity.semCellCount(20000) == 160)
    assert(Similarity.semCellCount(200000) == 1600)
    // E|cell| stays ~SemTargetCell at any corpus size
    assert(200000 / Similarity.semCellCount(200000) == Similarity.SemTargetCell)
  }

  test("corpus-scaled quantizer: a >2000-vector corpus trains K>16 cells and every cell id is in range") {
    import spark.implicits._
    val dim = 8
    val nv = 2600 // → K = ceil(2600/125) = 21
    val rows = (0 until nv).map { i =>
      (i.toLong, s"l${i % 4}",
        Array.tabulate(dim)(j => (math.sin(i * 13 + j * 7) * 100).floor.toFloat / 100f))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_semk").toString
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val k = Similarity.semCellCount(nv.toLong)
    assert(k == 21)
    val asg = Similarity.semAssign(spark, dir)
      .select("vec_id", "cell").as[(Long, Long)].collect()
    assert(asg.length == nv, "every vector assigned exactly once")
    val cells = asg.map(_._2).distinct
    assert(cells.forall(c => c >= 1 && c <= k), s"cell ids within 1..$k")
    assert(cells.length > Similarity.NumCells,
      s"scaled corpus must actually use more than ${Similarity.NumCells} cells, got ${cells.length}")
    // and dedup_semantic runs end-to-end on the scaled codebook
    val dd = Similarity.semanticDedup(spark, dir)
    assert(dd.count() == nv)
  }

  test("native histogram wire: decoding spans+deltas reconstructs the exact sparse buckets") {
    // independent protobuf decoder (public encoding spec, the
    // CollectorLoopSpec/PromWireSpec approach)
    def readVarint(b: Array[Byte], p: Int): (Long, Int) = {
      var x = 0L; var shift = 0; var i = p
      while ({ val c = b(i); x |= (c & 0x7fL) << shift; shift += 7; i += 1; (c & 0x80) != 0 }) ()
      (x, i)
    }
    def unzig(x: Long): Long = (x >>> 1) ^ -(x & 1)
    val rows = graft.operators.PromWire.nativeHistogramWire(spark, sf).collect()
    assert(rows.nonEmpty)
    // expected sparse buckets straight from the shared ladder
    val expected = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", s"${graft.operators.NativeHistogram.idxLadder} AS idx")
      .groupBy("event_type", "idx").count().collect()
      .groupBy(_.getString(0))
      .map { case (et, rs) => et -> rs.map(r => r.getInt(1) -> r.getLong(2)).toMap }
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val b = r.getAs[String]("hist_hex").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      var p = 0
      var total = -1L; var schema = -1L; var sum = 0.0
      val spans = Seq.newBuilder[(Long, Long)]
      var deltas: Seq[Long] = Nil
      while (p < b.length) {
        val (tag, p1) = readVarint(b, p)
        ((tag >> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => val (v, p2) = readVarint(b, p1); total = v; p = p2
          case (3, 1) =>
            val bits = (0 until 8).map(i => (b(p1 + i) & 0xffL) << (8 * i)).reduce(_ | _)
            sum = java.lang.Double.longBitsToDouble(bits); p = p1 + 8
          case (4, 0) => val (v, p2) = readVarint(b, p1); schema = unzig(v); p = p2
          case (11, 2) =>
            val (len, p2) = readVarint(b, p1)
            var q = p2
            val (ot, q1) = readVarint(b, q); assert((ot >> 3) == 1); // offset
            val (ov, q2) = readVarint(b, q1)
            val (lt, q3) = readVarint(b, q2); assert((lt >> 3) == 2); // length
            val (lv, q4) = readVarint(b, q3)
            assert(q4 - p2 == len)
            spans += ((unzig(ov), lv)); p = q4
          case (12, 2) =>
            val (len, p2) = readVarint(b, p1)
            var q = p2
            val out = Seq.newBuilder[Long]
            while (q < p2 + len) { val (v, q2) = readVarint(b, q); out += unzig(v); q = q2 }
            deltas = out.result(); p = p2 + len.toInt
          case (_, 2) => val (len, p2) = readVarint(b, p1); p = p2 + len.toInt
          case (_, 0) => p = readVarint(b, p1)._2
          case (_, 1) => p = p1 + 8
        }
      }
      assert(schema == 2, "standard schema 2")
      // spans → absolute indices; deltas → counts
      val indices = {
        var cur = 0L; val out = Seq.newBuilder[Long]
        var first = true
        spans.result().foreach { case (off, len) =>
          cur = (if (first) off else cur + off); first = false
          (0L until len).foreach { i => out += cur + i }
          cur = cur + len
        }
        out.result()
      }
      val counts = deltas.scanLeft(0L)(_ + _).drop(1)
      assert(indices.length == counts.length)
      val got = indices.zip(counts).map { case (i, c) => i.toInt -> c }.toMap
      assert(got == expected(et), s"$et: wire buckets $got != ladder ${expected(et)}")
      assert(total == counts.sum, "count_int equals the bucket mass")
      assert(math.abs(sum) > 0, "sum field carried")
    }
  }

  test("native histogram: a quantile covered by the overflow bucket raises, not NULL") {
    import spark.implicits._
    // every value far past bound(IdxHi)=1024 → all mass in the
    // overflow bucket → p50's covering bucket is the overflow bucket
    val dir = java.nio.file.Files.createTempDirectory("graft_nhof").toString
    (1 to 50).map(i => (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d"),
      i.toLong, "t", 5000.0 + i, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[Exception] {
      graft.operators.NativeHistogram.nativeQuantile(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("overflow bucket")),
      s"expected the overflow-bucket raise, got: ${messages(e).mkString(" | ")}")
  }
}
