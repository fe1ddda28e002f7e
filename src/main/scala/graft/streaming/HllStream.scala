package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE HyperLogLog maintenance — the streaming form of
  * `sketch_hll_distinct` (Sketch.scala): per series the state is the
  * 256-register array and NOTHING else, the property that makes HLL
  * the distinct sketch streaming systems actually deploy (merge =
  * register-wise max, O(m) state at any cardinality). Every arithmetic
  * decision matches the batch entry bit for bit:
  *
  *   - the 60-bit content hash is the SAME md5-prefix integer Spark's
  *     `conv(substring(md5(...), 1, 15), 16, 10)` computes (hex parse
  *     of the first 15 nibbles), reproduced here via MessageDigest;
  *   - ranks come from the identical binary-length formula;
  *   - the harmonic sum uses the batch entry's EXACT 2⁵³ integer
  *     scaling, so register-merge order (here: arrival order) cannot
  *     perturb it;
  *   - the small-range branch uses `java.lang.Math.log` — the same
  *     libm call Spark's `ln` makes — so the linear-counting estimate
  *     is the identical double.
  *
  * HllStreamSpec proves a real three-chunk MemoryStream run ends at
  * the batch entry's ledger (registers, estimate, error) row for row. */
object HllStream {

  type Q = (SparkSession, String) => DataFrame

  val M = graft.operators.Sketch.HllM
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  case class HllInput(series: String, user_id: Long)
  case class HllState(regs: Array[Int], exact: Set[Long])
  case class HllSnapshot(series: String, n_registers_hit: Long,
      n_registers_empty: Long, est: Long, exact_distinct: Long, err_x1e4: Long)

  /** The batch entry's hash: first 15 hex chars of md5("hll:"+id). */
  def hash60(userId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hll:$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  def rank(rest: Long): Int =
    if (rest == 0L) 53 else 53 - java.lang.Long.toBinaryString(rest).length

  /** Estimate from the register array — the batch entry's arithmetic,
    * op for op (exact integer harmonic sum, then one double division;
    * linear counting with Math.log on the published small-range
    * branch). */
  def estimate(regs: Array[Int]): Long = {
    var sScaled = 0L
    var zeros = 0L
    var i = 0
    while (i < M) {
      if (regs(i) == 0) { zeros += 1; sScaled += 1L << 53 }
      else sScaled += 1L << (53 - regs(i))
      i += 1
    }
    val raw = Alpha * (M.toLong * M) * (1L << 53).toDouble / sScaled.toDouble
    if (raw <= 2.5 * M && zeros > 0)
      math.floor(M * java.lang.Math.log(M.toDouble / zeros.toDouble)).toLong
    else math.floor(raw).toLong
  }

  /** Hard ceiling on the audit-mode exact set: a per-series truth set
    * past this size means someone turned the audit flag on against
    * production cardinalities — fail loudly instead of OOMing the
    * state store row by row. */
  val AuditExactCap = 2000000

  /** One ledger snapshot per (series, micro-batch); the last row per
    * series is the final sketch state. The exact-distinct set exists
    * ONLY under `auditExact = true` (default OFF): the audit ledger
    * needs truth for its error column, but carrying the full
    * Set[Long] makes state O(distinct users) — the opposite of the
    * O(m)-registers property that is HLL's whole point — so production
    * reuse must opt in explicitly, is capped at [[AuditExactCap]]
    * (loud failure, not a silent OOM), and the default path keeps the
    * advertised O(m) state with `exact_distinct`/`err_x1e4` = -1. */
  def hllStream(samples: Dataset[HllInput],
      auditExact: Boolean = false): Dataset[HllSnapshot] = {
    import samples.sparkSession.implicits._
    samples.groupByKey(_.series)
      .flatMapGroupsWithState[HllState, HllSnapshot](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (series: String, chunk: Iterator[HllInput], state: GroupState[HllState]) =>
          val st = state.getOption.getOrElse(
            HllState(Array.fill(M)(0), Set.empty))
          var exact = st.exact
          val regs = st.regs.clone()
          chunk.foreach { s =>
            val h = hash60(s.user_id)
            val reg = (h / 4503599627370496L).toInt // 2^52
            val r = rank(h % 4503599627370496L)
            if (r > regs(reg)) regs(reg) = r
            if (auditExact) {
              exact += s.user_id
              require(exact.size <= AuditExactCap,
                s"hllStream auditExact truth set for series '$series' " +
                  s"exceeded $AuditExactCap distinct ids — the audit mode " +
                  "is for bounded test feeds; run with auditExact=false")
            }
          }
          state.update(HllState(regs, exact))
          val hit = regs.count(_ > 0).toLong
          val est = estimate(regs)
          val ex = exact.size.toLong
          Iterator(HllSnapshot(series, hit, M - hit, est,
            if (auditExact) ex else -1L,
            if (auditExact && ex > 0) math.abs(est - ex) * 10000L / ex else -1L))
      }
  }

  /** Driver-contract entry: the batch twin (same frame, same oracle). */
  val entries: Seq[(String, Q, Option[String])] = Seq(
    ("stream_hll_distinct", graft.operators.Sketch.hllDistinct,
      Some(graft.operators.Sketch.hllDistinctSql)))
}
