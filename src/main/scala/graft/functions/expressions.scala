package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot codec-derived scalar
  * functions (SURVEY.md §2.9 E26: "promote hot ones to custom
  * Expression"). Unlike Scala UDFs these stay inside whole-stage
  * codegen — no encoder boundary, no row-at-a-time closure dispatch —
  * which matters when classifying 177M scripts.
  */

/** scriptPubKey classifier (C5 family): BINARY → STRING
  * (p2pkh|p2sh|p2pk|p2wpkh|p2wsh|p2tr|op_return|other).
  */
case class ScriptTypeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.codec.ScriptCodec.scriptType(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.codec.ScriptCodec.scriptType($c))")
  override protected def withNewChildInternal(newChild: Expression): ScriptTypeExpr =
    copy(child = newChild)
  override def prettyName: String = "script_type"
}

/** Bitcoin Core amount decompression (C3): BIGINT → BIGINT. */
case class DecompressAmountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.codec.AmountCodec.decompress(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.codec.AmountCodec.decompress($c)")
  override protected def withNewChildInternal(newChild: Expression): DecompressAmountExpr =
    copy(child = newChild)
  override def prettyName: String = "decompress_amount"
}
