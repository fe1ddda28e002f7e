package graft

import scala.collection.mutable.ArrayBuffer

/** `prom_wire_frame_v2` — independent structural decode of the
  * Remote-Write 2.0 Request body: parse the protobuf by hand (no
  * generated code), resolve every label ref through the symbols
  * table, and check the reconstructed series against the v1 frames'
  * sample stream. */
class Round11dSpec extends SparkTestBase {

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private case class Reader(b: Array[Byte], var i: Int = 0) {
    def hasNext: Boolean = i < b.length
    def varint(): Long = {
      var x = 0L; var sh = 0
      while ({ val v = b(i) & 0xff; i += 1; x |= (v & 0x7fL) << sh; sh += 7; (v & 0x80) != 0 }) ()
      x
    }
    def bytes(n: Int): Array[Byte] = { val r = b.slice(i, i + n); i += n; r }
    def fixed64(): Long =
      (0 to 7).map(k => (b(i + k) & 0xffL) << (8 * k)).reduce(_ | _) match {
        case v => i += 8; v
      }
  }

  test("v2 request decodes: symbols, packed refs, sorted labels, v1-equal samples") {
    val row = SparkEntry.queries("prom_wire_frame_v2")(spark, sf).collect().head
    val (nSymbols, nSeries, bodyLen, bodyHex) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getString(3))
    assert(bodyLen * 2 == bodyHex.length)

    val r = Reader(unhex(bodyHex))
    val symbols = ArrayBuffer[String]()
    val series = ArrayBuffer[(Seq[Long], Option[Double], Long)]()
    while (r.hasNext) {
      val tag = r.varint()
      tag match {
        case 0x22 => // Request.symbols (field 4, len)
          val n = r.varint().toInt
          symbols += new String(r.bytes(n), "UTF-8")
        case 0x2a => // Request.timeseries (field 5, len)
          val end = r.varint().toInt + r.i
          var refs = Seq.empty[Long]; var value: Option[Double] = None; var ts = -1L
          while (r.i < end) {
            r.varint() match {
              case 0x0a => // packed labels_refs
                val e2 = r.varint().toInt + r.i
                val acc = ArrayBuffer[Long]()
                while (r.i < e2) acc += r.varint()
                refs = acc.toSeq
              case 0x12 => // Sample
                val e3 = r.varint().toInt + r.i
                while (r.i < e3) {
                  r.varint() match {
                    case 0x09 => value = Some(java.lang.Double.longBitsToDouble(r.fixed64()))
                    case 0x10 => ts = r.varint()
                    case t => fail(s"unexpected Sample tag $t")
                  }
                }
              case t => fail(s"unexpected TimeSeries tag $t")
            }
          }
          series += ((refs, value, ts))
        case t => fail(s"unexpected Request tag $t")
      }
    }
    assert(symbols.length.toLong == nSymbols && symbols.head == "",
      "symbols[0] must be the mandated empty string")
    assert(symbols.distinct.length == symbols.length, "symbols are interned once")
    assert(series.length.toLong == nSeries)

    // v1 frames carry the identical sample stream — compare (metric,
    // event_type) -> (value, ts)
    val v1 = SparkEntry.queries("prom_wire_frame")(spark, sf).collect()
      .map(rr => (rr.getString(1), rr.getString(2)) ->
        (rr.getDouble(4), rr.getLong(3))).toMap
    val names = Seq("__name__", "accountId", "engine", "event_type",
      "identifier", "job", "region")
    series.foreach { case (refs, value, ts) =>
      assert(refs.length == 14, "7 sorted label pairs")
      val labels = refs.grouped(2).map { case Seq(n, v) =>
        symbols(n.toInt) -> symbols(v.toInt)
      }.toSeq
      assert(labels.map(_._1) == names, s"labels sorted by name: ${labels.map(_._1)}")
      val m = labels.toMap
      assert(m("identifier") == "graft" && m("job") == "database-collector"
        && m("engine") == "events" && m("accountId") == "" && m("region") == "")
      val key = (m("__name__"), m("event_type"))
      val (wantV, wantTs) = v1(key)
      assert(ts == wantTs, s"timestamp differs from v1 at $key")
      assert(value.getOrElse(0.0) == wantV, s"value differs from v1 at $key")
    }
    assert(series.map { case (refs, _, _) =>
      (symbols(refs(1).toInt), symbols(refs(7).toInt))
    }.toSet == v1.keySet, "every v1 series appears exactly once in v2")
  }
}
