package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-document kernels for the dedup family — native Catalyst
  * `Expression`s (with `doGenCode`), not Scala UDFs.
  *
  * SQL higher-order functions (`transform`/`aggregate` lambdas) are
  * interpreted — no whole-stage codegen — measured at ~30µs per array
  * element, the dominant cost of the whole dedup family at sf0.1. The
  * previous rung of the ladder (Scala UDFs) compiled the loop but still
  * paid per-row Scala converters (Seq boxing, String decode) and hid the
  * expression from the optimizer (no codegen fusion, no null info).
  * These expressions work directly on `ArrayData`/`UTF8String` inside
  * whole-stage codegen: zero conversion on the hot path.
  *
  * Tokenization stays in SQL (`TextAnalysis.toksExpr`) so the DuckDB
  * oracle can reproduce it exactly; these kernels only derive
  * arrays/integers from already-tokenized input with engine-neutral
  * semantics (plain string concat, exact integer math) — hashes are
  * identical to the former UDFs, which were identical to the original
  * higher-order-function formulations.
  */
object TextKernels {

  private val Space = UTF8String.fromString(" ")

  /** word 3-shingles, first-occurrence-distinct — identical to
    * array_distinct(transform(sequence(0, n-3), i -> concat_ws(' ', ...))).
    * null input → empty array (mirrors the historical UDF; callers explode
    * or size() the result, so never-null keeps downstream codegen branch-free). */
  def shingle3(arr: ArrayData): ArrayData = {
    val n = if (arr == null) 0 else arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](n - 2)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i + 2 < n) {
      val sh = UTF8String.concat(arr.getUTF8String(i), Space,
        arr.getUTF8String(i + 1), Space, arr.getUTF8String(i + 2))
      if (seen.add(sh)) out.add(sh)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** All unordered (a < b) pairs of a sorted id list — compiled combo
    * generation for the shared-shingle candidate step. Callers are
    * expected to df-cap hot keys BEFORE expanding pairs; if one slips
    * through, fail loudly rather than mis-size: n ≥ 65,537 overflows
    * n*(n-1)/2 in Int (the old UDF clamped an ArrayBuffer hint and
    * silently kept going — a behavior hole, not a contract). */
  def pairCombos(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > Int.MaxValue - 8)
      throw new IllegalArgumentException(
        s"graft_pairs: $n ids share one key -> $nPairs pairs overflows a single " +
          "array; cap the block (document-frequency cap) before pair expansion")
    val out = new Array[Any](nPairs.toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash from per-token hashes: bit k set iff more than half
    * the hashes have bit k set (majority vote, ties → 0). */
  def packSimhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < 64) { ones(k) += ((h >>> k) & 1L).toInt; k += 1 }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) { if (ones(k) * 2 > n) sig |= (1L << k); k += 1 }
    sig
  }
}

/** `graft_shingle3(array<string>) -> array<string>` — see
  * [[TextKernels.shingle3]]. Never null: null/short input yields an
  * empty array, matching the historical UDF contract. */
case class Shingle3(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingle3"

  override def eval(input: InternalRow): Any =
    TextKernels.shingle3(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.functions.TextKernels.shingle3(${c.isNull} ? null : ${c.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_pairs(array<bigint>) -> array<struct<_1,_2>>` — see
  * [[TextKernels.pairCombos]]. */
case class PairCombos(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", LongType, nullable = false),
    StructField("_2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_pairs"

  override def nullSafeEval(a: Any): Any =
    TextKernels.pairCombos(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.pairCombos($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash(array<bigint>) -> bigint` — see
  * [[TextKernels.packSimhash]]. */
case class PackSimhash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any =
    TextKernels.packSimhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.packSimhash($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API front for the dedup kernels (name kept from the UDF era so
  * call sites read unchanged; the implementation is now pure Catalyst,
  * resolved through the `graft_*` names [[Vectors.install]] registers on
  * every Engine session). */
object TextUdfs {
  import org.apache.spark.sql.functions.call_function
  def shingle3(c: Column): Column = call_function("graft_shingle3", c)
  def pairCombos(c: Column): Column = call_function("graft_pairs", c)
  def packSimhash(c: Column): Column = call_function("graft_simhash", c)
}
