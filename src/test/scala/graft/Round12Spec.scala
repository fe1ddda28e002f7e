package graft

import graft.operators.PromWire

/** Round-12 pins: the UTF-8 byte-length fix in the protobuf length
  * prefixes. Both engines previously computed `length()` — a CHARACTER
  * count — for the label/symbol length prefixes while the payload hex
  * was UTF-8 bytes, so any non-ASCII event_type produced an invalid
  * wire body that the DuckDB oracle (computing the same wrong bytes)
  * could never catch. The encoder now derives every data-string prefix
  * from `length(hex(col)) div 2` (hex is bytewise and pure ASCII in
  * both engines); this spec feeds multi-byte label values through the
  * REAL v1 encode path and round-trips them with the independent
  * protobuf decoder from PromWireSpec. */
class Round12Spec extends SparkTestBase {

  // minimal independent decoder (same as PromWireSpec's — duplicated on
  // purpose: each wire spec must stand alone against the public format)
  private case class Field(num: Int, wireType: Int, varint: Long, bytes: Array[Byte])
  private def readVarint(b: Array[Byte], p: Int): (Long, Int) = {
    var x = 0L; var shift = 0; var i = p
    while ({ val c = b(i); x |= (c & 0x7fL) << shift; shift += 7; i += 1; (c & 0x80) != 0 }) ()
    (x, i)
  }
  private def fields(b: Array[Byte]): Seq[Field] = {
    var p = 0; val out = Seq.newBuilder[Field]
    while (p < b.length) {
      val (tag, p1) = readVarint(b, p)
      val num = (tag >> 3).toInt; val wt = (tag & 7).toInt
      wt match {
        case 0 => val (v, p2) = readVarint(b, p1); out += Field(num, wt, v, Array.empty); p = p2
        case 1 =>
          var v = 0L
          for (i <- 0 until 8) v |= (b(p1 + i) & 0xffL) << (8 * i)
          out += Field(num, wt, v, b.slice(p1, p1 + 8)); p = p1 + 8
        case 2 => val (len, p2) = readVarint(b, p1)
          out += Field(num, wt, len, b.slice(p2, p2 + len.toInt)); p = p2 + len.toInt
        case other => fail(s"unexpected wire type $other at offset $p")
      }
    }
    out.result()
  }
  private def unhex(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("non-ASCII label values frame with UTF-8 BYTE length prefixes") {
    import spark.implicits._
    // 2-, 3- and 4-byte UTF-8 code points; char count << byte count
    val evil = Seq("café", "покупка", "支付_完了", "emoji_😀_done")
    val df = evil.zipWithIndex
      .map { case (et, i) => (et, 1700000000000L + i, "events_total", 1.0 + i) }
      .toDF("event_type", "ts_ms", "metric_name", "value")
    val rows = PromWire.encodeSamples(df)
      .selectExpr("event_type", "value", "ts_ms", "wire_hex").collect()
    assert(rows.length == evil.size)
    rows.foreach { r =>
      val et = r.getString(0)
      val wire = unhex(r.getString(3))
      val wr = fields(wire)
      assert(wr.map(f => (f.num, f.wireType)) == Seq((1, 2)),
        s"$et: frame must be one length-delimited TimeSeries")
      val ts = fields(wr.head.bytes)
      val labels = ts.filter(_.num == 1).map { lf =>
        val kv = fields(lf.bytes)
        (new String(kv.find(_.num == 1).get.bytes, "UTF-8"),
          kv.find(_.num == 2).map(f => new String(f.bytes, "UTF-8")).getOrElse(""))
      }
      // the event_type label must round-trip BYTE-exactly — under the
      // old character-count prefix the decoder would mis-frame here
      assert(labels.contains(("event_type", et)), s"decoded labels: $labels")
      val sample = fields(ts.filter(_.num == 2).head.bytes)
      assert(java.lang.Double.longBitsToDouble(sample.find(_.num == 1).get.varint)
        == r.getDouble(1))
      assert(sample.find(_.num == 2).get.varint == r.getLong(2))
    }
  }

  test("ann_knn_graph cap: shipped SFs stay single-shard, and a sampled brute force confirms exactness") {
    import graft.operators.Similarity
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    // claim pinned in the scaladoc: every shipped SF's label blocks fit
    // under KnnGraphCap, so shard = x % 1 = 0 and the capped graph IS
    // the uncapped exact in-block kNN (the truth Round11bSpec's IVF
    // recall is measured against). If a testdata vintage ever exceeds
    // the cap, this fails and the exactness claims must be revisited.
    val maxBlock = raw.groupBy("label").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxBlock <= Similarity.KnnGraphCap,
      s"label block $maxBlock exceeds KnnGraphCap ${Similarity.KnnGraphCap}")

    // sampled brute-force verifier: for 5 vectors, every reported
    // neighbor's cosine recomputes to the reported value and no
    // in-block vector beats the reported k-th neighbor
    val vecs = raw.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val byLabel = vecs.groupBy(_._2)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val graph = SparkEntry.queries("ann_knn_graph")(spark, sf)
      .collect().groupBy(_.getLong(0))
    val sample = vecs.sortBy(_._1).take(5)
    sample.foreach { case (id, label, v) =>
      val reported = graph(id).sortBy(_.getInt(4)) // by rank
      assert(reported.length == Similarity.KnnGraphK)
      val block = byLabel(label).filter(_._1 != id)
      val exact = block.map { case (nid, _, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
      reported.zip(exact).foreach { case (rep, (eid, ecos)) =>
        val repCos = rep.getDouble(3) // trunc4'd
        assert(math.abs(math.floor(ecos * 1e4) / 1e4 - repCos) <= 1e-4 + 1e-9,
          s"vec $id: reported ${rep.getLong(2)}@$repCos vs exact $eid@$ecos")
      }
      // no in-block vector beats the k-th reported neighbor materially
      val kth = reported.last.getDouble(3)
      val beat = exact.drop(Similarity.KnnGraphK).headOption.map(_._2).getOrElse(-2.0)
      assert(beat <= kth + 1e-3, s"vec $id: unreported neighbor at $beat beats k-th $kth")
    }
  }

  test("v2 symbol entries carry byte-length prefixes for non-ASCII symbols") {
    // drive the generated SQL fragment directly: the same strByteLen
    // arithmetic the v2 symbol table uses, over a literal row
    val hex = spark.sql(
      "SELECT lower(hex('покупка')) AS h, (length(lower(hex('покупка'))) div 2) AS blen")
      .collect().head
    assert(hex.getString(0).length / 2 == 14) // 7 Cyrillic chars × 2 bytes
    assert(hex.getLong(1) == 14L)             // the prefix the encoder now emits
  }
}
