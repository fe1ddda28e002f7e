package graft

import graft.operators.PromWire

/** The wire framing must be REAL protobuf — so the spec carries an
  * independent minimal wire-format decoder (written against the public
  * protobuf encoding spec, not against the SQL generator) and parses
  * every emitted frame back into labels + sample, asserting the decoded
  * content equals the source sample stream bit-for-bit. */
class PromWireSpec extends SparkTestBase {

  // ---- independent minimal protobuf wire decoder -------------------
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

  test("every frame decodes to the reference's label block and single sample") {
    val rows = PromWire.wireFrame(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val metricName = r.getString(1); val et = r.getString(2)
      val tsMs = r.getLong(3); val value = r.getDouble(4)
      val wire = unhex(r.getString(6))
      assert(wire.length == r.getLong(5))
      // WriteRequest frame: exactly one field-1 length-delimited entry
      val wr = fields(wire)
      assert(wr.map(f => (f.num, f.wireType)) == Seq((1, 2)))
      val ts = fields(wr.head.bytes)
      // TimeSeries: 7 labels then 1 sample, in the reference's order
      val labels = ts.filter(_.num == 1).map { lf =>
        val kv = fields(lf.bytes)
        val name = new String(kv.find(_.num == 1).get.bytes, "UTF-8")
        val v = kv.find(_.num == 2).map(f => new String(f.bytes, "UTF-8")).getOrElse("")
        name -> v
      }
      assert(labels == Seq(
        "__name__" -> metricName, "event_type" -> et, "identifier" -> "graft",
        "job" -> "database-collector", "region" -> "", "accountId" -> "",
        "engine" -> "events"))
      // proto3 zero-value rule: empty label values carry NO field 2
      assert(fields(ts.filter(_.num == 1).apply(4).bytes).map(_.num) == Seq(1))
      val samples = ts.filter(_.num == 2)
      assert(samples.size == 1)
      val sf2 = fields(samples.head.bytes)
      val decodedValue = java.lang.Double.longBitsToDouble(sf2.find(_.num == 1).get.varint)
      assert(decodedValue == value, s"$metricName/$et IEEE bits mismatch")
      assert(sf2.find(_.num == 2).get.varint == tsMs)
    }
  }

  test("known-vector: the decoder round-trips a hand-marshalled TimeSeries") {
    // Label{__name__, up}, Sample{1.5, 300000} marshalled BY HAND from
    // the protobuf encoding spec — pins the decoder itself so the
    // round-trip test above can't pass via a mirrored bug.
    val label = "0a" + "0e" + "0a" + "08" + hex("__name__") + "12" + "02" + hex("up")
    assert(label == "0a0e0a085f5f6e616d655f5f12027570")
    // 1.5 bits = 3ff8000000000000 (LE on the wire); varint(300000) = e0 a7 12
    val sample = "12" + "0d" + "09" + "000000000000f83f" + "10" + "e0a712"
    val ts = fields(unhex(label + sample))
    val kv = fields(ts.head.bytes)
    assert(new String(kv.find(_.num == 1).get.bytes, "UTF-8") == "__name__")
    assert(new String(kv.find(_.num == 2).get.bytes, "UTF-8") == "up")
    val sf2 = fields(ts(1).bytes)
    assert(java.lang.Double.longBitsToDouble(sf2.find(_.num == 1).get.varint) == 1.5)
    assert(sf2.find(_.num == 2).get.varint == 300000L)
  }

  private def hex(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString

  test("prom_wire_snappy: every body round-trips and the compressed form is receiver-decodable") {
    val rows = PromWire.wireSnappy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(r.getBoolean(5), s"roundtrip_ok false for ${r.getString(1)}") }
    // independently rebuild each family body, push it through the same
    // codec library a receiver would use, and parse the decompressed
    // bytes as a WriteRequest — the full reference encode path
    val frames = PromWire.wireFrame(spark, sf).collect()
    val byFamily = frames.groupBy(r => (r.getString(0), r.getString(1)))
    rows.foreach { r =>
      val body = byFamily((r.getString(0), r.getString(1)))
        .sortBy(_.getString(2)).flatMap(f => unhex(f.getString(6)))
      assert(body.length == r.getLong(3))
      val compressed = org.xerial.snappy.Snappy.compress(body)
      // the wire bodies are label-heavy and must compress smaller
      assert(compressed.length < body.length,
        s"${r.getString(1)}: ${compressed.length} !< ${body.length}")
      val decoded = fields(org.xerial.snappy.Snappy.uncompress(compressed))
      assert(decoded.size == r.getLong(2))
      assert(decoded.forall(f => f.num == 1 && f.wireType == 2))
    }
  }

  test("graft_snappy codec edge cases round-trip: empty, 1-byte, incompressible, repetitive") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](7),
      Array.fill(10000)(rnd.nextInt().toByte), // incompressible
      Array.fill(100000)('a'.toByte))          // maximally repetitive
    val out = cases.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "b")
      .selectExpr("i", "length(b) AS raw_len", "length(graft_snappy(b)) AS comp_len",
        "graft_unsnappy(graft_snappy(b)) <=> b AS ok")
      .collect().sortBy(_.getInt(0))
    out.foreach(r => assert(r.getBoolean(3), s"case ${r.getInt(0)} failed round-trip"))
    // snappy may expand incompressible input (bounded overhead), but the
    // repetitive block must shrink dramatically
    assert(out(3).getInt(2) < out(3).getInt(1) / 10)
  }

  test("prom_remote_read_frame: independently rebuilt ReadResponse matches, and decodes") {
    def writeVarint(x: Long): String = {
      val out = new StringBuilder; var v = x
      while ({ val b = (v & 0x7f) | (if ((v >> 7) != 0) 0x80 else 0)
        out.append(f"$b%02x"); v >>= 7; v != 0 }) ()
      out.toString
    }
    // rebuild each family's body from the WRITE-side frames: QueryResult
    // = ordered TimeSeries frames, ReadResponse = one more 0a-len wrap
    val frames = PromWire.wireFrame(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(6))) // metric, et, wire_hex
      .groupBy(_._1)
    val got = PromWire.remoteReadFrame(spark, sf).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got.keySet == frames.keySet)
    frames.foreach { case (metric, fs) =>
      val qr = fs.sortBy(_._2).map(_._3).mkString
      val rr = "0a" + writeVarint(qr.length / 2) + qr
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(rr.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val (nSeries, bodyLen, bodyMd5, headHex) = got(metric)
      assert(nSeries == fs.length.toLong, s"$metric series count")
      assert(bodyLen == rr.length / 2, s"$metric body length")
      assert(bodyMd5 == md5, s"$metric body md5 differs from independent rebuild")
      assert(rr.startsWith(headHex), s"$metric head bytes")
      // structural decode: one results field wrapping n_series timeseries
      val outer = fields(unhex(rr))
      assert(outer.size == 1 && outer.head.num == 1 && outer.head.wireType == 2,
        s"$metric: ReadResponse must be one len-delimited results field")
      val inner = fields(outer.head.bytes)
      assert(inner.size == nSeries && inner.forall(f => f.num == 1 && f.wireType == 2),
        s"$metric: QueryResult must hold exactly the series frames")
    }
  }

  test("frames concatenate into one WriteRequest regardless of row order") {
    val rows = PromWire.wireFrame(spark, sf).collect()
    val body = rows.reverse.flatMap(r => unhex(r.getString(6)))
    val series = fields(body)
    assert(series.size == rows.length)
    assert(series.forall(f => f.num == 1 && f.wireType == 2))
  }
}
