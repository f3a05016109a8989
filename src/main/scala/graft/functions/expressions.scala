package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
// Cast: used by ZOrder2Expr.widened to accept INT args from SQL callers
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

/** Bit-interleave helpers for Z-order (Morton) clustering keys — the
  * multi-dimension data-clustering layout: sorting by the interleaved
  * code gives row groups that are axis-aligned rectangles in key space,
  * so min/max stats skip on EVERY interleaved dimension, not just the
  * leading sort key.
  */
object Morton {
  /** Spread the low 32 bits of x so original bit i lands at position 2i
    * (the standard O(log w) mask-shift bit twiddle).
    */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code of (x, y): x's bits on even positions, y's on odd. */
  def interleave2(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}

/** Z-order curve key (E26/E35): (BIGINT, BIGINT) → BIGINT Morton code
  * over the low 32 bits of each input. Codegen'd two-instruction call —
  * cheap enough to sort 100 TB by.
  */
case class ZOrder2Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    Morton.interleave2(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Morton.interleave2($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2Expr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder2"
}

object ZOrder2Expr {
  /** Builder for the function registries: widens INT/SMALLINT args to
    * BIGINT (the expression itself is monomorphic on LongType).
    */
  def widened(exprs: Seq[Expression]): ZOrder2Expr =
    ZOrder2Expr(Cast(exprs.head, LongType), Cast(exprs(1), LongType))
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
