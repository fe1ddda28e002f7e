package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Snappy block-format codec over binary columns.
  *
  * The reference's remote-write encode step is protobuf AND snappy
  * (`encodeWriteRequestIntoProtoAndSnappy`,
  * `collector/internal/utils/prometheus.go:122-127`: `proto.Marshal`
  * then `snappy.Encode`). `prom_wire_frame` produces the byte-exact
  * protobuf body; these expressions close the remaining codec step
  * using the snappy-java library that ships inside Spark's own
  * dependency tree (no new dependency).
  *
  * Both Go's `snappy.Encode` and snappy-java implement the raw BLOCK
  * format (not the framed streaming format), which is what Prometheus
  * remote-write requires on the wire. Different encoders may emit
  * different (all valid) byte streams for the same input, so the
  * cross-engine deterministic contract is decompress∘compress =
  * identity plus receiver decodability — not encoder byte equality.
  * The round-trip is asserted per-row in the `prom_wire_snappy` entry
  * and the codec edge cases in PromWireSpec.
  *
  * Catalyst `Expression`s with `doGenCode` (not UDFs): the codec call
  * stays inside whole-stage codegen with zero boxing — at 100 TB each
  * executor compresses its own partition's request bodies in the same
  * generated loop that framed them.
  */
case class SnappyCompress(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_snappy"

  override def nullSafeEval(a: Any): Any =
    org.xerial.snappy.Snappy.compress(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |try {
         |  ${ev.value} = org.xerial.snappy.Snappy.compress($c);
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException("graft_snappy", e);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[SnappyCompress]]: raw-block snappy decompression. */
case class SnappyDecompress(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_unsnappy"

  override def nullSafeEval(a: Any): Any =
    org.xerial.snappy.Snappy.uncompress(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |try {
         |  ${ev.value} = org.xerial.snappy.Snappy.uncompress($c);
         |} catch (java.io.IOException e) {
         |  throw new RuntimeException("graft_unsnappy", e);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
