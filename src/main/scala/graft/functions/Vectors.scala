package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators.
  *
  * These are Catalyst `Expression`s with `doGenCode` — not UDFs — so
  * they stay inside whole-stage codegen with no boxing or
  * Scala-converter overhead on the per-pair hot path (the dominant cost
  * of brute-force ANN at corpus scale). Accumulation is sequential
  * left-to-right, matching both the previous `aggregate(zip_with(...))`
  * formulation and DuckDB's `list_cosine_similarity` oracle.
  *
  * Registered as SQL functions `graft_dot` / `graft_norm2` through
  * `SparkSessionExtensions.injectFunction` (see [[Engine]]), the public
  * extension point — usable from `expr()` and plain SQL alike.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double[] $y = $b.toDoubleArray();
         |int $n = Math.min($x.length, $y.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $x[$i] * $y[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm of a double array (sum of squares). */
case class Norm2(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    var acc = 0.0
    var i = 0
    while (i < x.length) { acc += x(i) * x(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double[] $x = $a.toDoubleArray();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $x.length; $i++) { $acc += $x[$i] * $x[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Vectors {

  private def fn(name: String, clazz: Class[_], builder: FunctionBuilder) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getCanonicalName, name), builder)

  /** Install graft's native functions into a session (Engine calls this
    * via `SparkSession.builder().withExtensions`). */
  def install(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("graft_dot", classOf[DotProduct],
      args => DotProduct(args(0), args(1))))
    e.injectFunction(fn("graft_norm2", classOf[Norm2],
      args => Norm2(args.head)))
    e.injectFunction(fn("graft_topk", classOf[TopKByScore],
      args => TopKByScore(args(0), args(1), args(2)).toAggregateExpression()))
    e.injectFunction(fn("graft_theta", classOf[ThetaKmv],
      args => ThetaKmv(args(0), args(1)).toAggregateExpression()))
    e.injectFunction(fn("graft_sample", classOf[SampleKmv],
      args => SampleKmv(args(0), args(1), args(2)).toAggregateExpression()))
    e.injectFunction(fn("graft_mg", classOf[MisraGries],
      args => MisraGries(args(0), args(1)).toAggregateExpression()))
    e.injectFunction(fn("graft_shingle3", classOf[Shingle3],
      args => Shingle3(args.head)))
    e.injectFunction(fn("graft_pairs", classOf[PairCombos],
      args => PairCombos(args.head)))
    e.injectFunction(fn("graft_simhash", classOf[PackSimhash],
      args => PackSimhash(args.head)))
    e.injectFunction(fn("graft_lttb", classOf[LttbSelect],
      args => LttbSelect(args(0), args(1))))
    e.injectFunction(fn("graft_snappy", classOf[SnappyCompress],
      args => SnappyCompress(args.head)))
    e.injectFunction(fn("graft_unsnappy", classOf[SnappyDecompress],
      args => SnappyDecompress(args.head)))
    // Spark's own runtime-filter pair (codegen'd, deserialize-once),
    // which the builtin FunctionRegistry does not expose as SQL — both
    // live in the internal registry and are only ever built by
    // InjectRuntimeFilter. Exposing them lets operators place an
    // explicit build-and-probe semi-join reduction (probe's filter side
    // must be foldable or a scalar subquery); values are xxhash64'd on
    // both sides, matching the upstream runtime-filter convention.
    e.injectFunction(fn("graft_bloom_agg", classOf[BloomFilterAggregate],
      args => new BloomFilterAggregate(args(0), args(1), args(2)).toAggregateExpression()))
    e.injectFunction(fn("graft_might_contain", classOf[BloomFilterMightContain],
      args => BloomFilterMightContain(args(0), args(1))))
  }
}
