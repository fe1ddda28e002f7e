package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled LTTB (largest-triangle-three-buckets) selection kernel.
  *
  * LTTB is inherently SEQUENTIAL per series — each bucket's pick
  * anchors on the previous bucket's pick — so the SQL formulation had
  * to fold with a growing array accumulator, and Spark's higher-order
  * `aggregate` copies the whole accumulator on every `concat`:
  * O(buckets²) element copies per series. The sf1 scale probe caught
  * exactly that (22× time at 10× data). This kernel is the same exact
  * integer arithmetic — area = |(n1·prevSec − Σsec)(v − prevV) −
  * (prevSec − sec)(Σv − n1·prevV)| in Long, ties to the smaller sec
  * then larger value, matching the oracle's (area, −sec, sec, v_c)
  * struct-sort — as ONE compiled O(n) pass. The DuckDB oracle replays
  * the identical selection with its recursive CTE; hashes are
  * unchanged from the fold formulation.
  *
  * Input: `array<struct<sec:bigint, event_id:bigint, v_c:bigint>>`
  * sorted ascending (the operator sorts via `sort_array`), and the
  * bucket size k. Output: `array<struct<sec:bigint, v_c:bigint>>` —
  * first point, one pick per interior bucket, last point. Series with
  * n < 3 are filtered by the operator before the kernel runs.
  */
object LttbKernel {

  def select(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    def sec(i: Int): Long = arr.getStruct(i, 3).getLong(0)
    def vc(i: Int): Long = arr.getStruct(i, 3).getLong(2)
    def row(s: Long, v: Long) = new GenericInternalRow(Array[Any](s, v))
    val nb = (n - 2 + k - 1) / k
    val out = new Array[Any](nb + 2)
    out(0) = row(sec(0), vc(0))
    var prevS = sec(0)
    var prevV = vc(0)
    var i = 0
    while (i < nb) {
      val start = 1 + i * k
      val len = math.min(k, n - 2 - i * k)
      // anchor centroid: the NEXT bucket's sums, or the final point
      var sx = 0L; var sy = 0L; var n1 = 0L
      if (i < nb - 1) {
        val s2 = 1 + (i + 1) * k
        val l2 = math.min(k, n - 2 - (i + 1) * k)
        var j = 0
        while (j < l2) { sx += sec(s2 + j); sy += vc(s2 + j); n1 += 1; j += 1 }
      } else { sx = sec(n - 1); sy = vc(n - 1); n1 = 1L }
      // argmax area; ties → smaller sec, then larger value (the
      // oracle's ascending (area, −sec, sec, v_c) sort, last element)
      var bestA = -1L; var bestS = 0L; var bestV = 0L
      var j = 0
      while (j < len) {
        val ps = sec(start + j)
        val pv = vc(start + j)
        val a = math.abs((n1 * prevS - sx) * (pv - prevV) - (prevS - ps) * (sy - n1 * prevV))
        if (a > bestA || (a == bestA && (ps < bestS || (ps == bestS && pv > bestV)))) {
          bestA = a; bestS = ps; bestV = pv
        }
        j += 1
      }
      out(i + 1) = row(bestS, bestV)
      prevS = bestS
      prevV = bestV
      i += 1
    }
    out(nb + 1) = row(sec(n - 1), vc(n - 1))
    new GenericArrayData(out)
  }
}

/** `graft_lttb(pts, k) -> array<struct<sec, v_c>>` — see [[LttbKernel]]. */
case class LttbSelect(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sec", LongType, nullable = false),
    StructField("v_c", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_lttb"

  override def nullSafeEval(a: Any, k: Any): Any =
    LttbKernel.select(a.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) =>
      s"${ev.value} = graft.functions.LttbKernel.select($a, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
