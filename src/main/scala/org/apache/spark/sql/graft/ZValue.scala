package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Native Catalyst Morton (Z-order) interleave of two non-negative LONG
  * keys — the multi-dimensional clustering key behind 2-D data skipping:
  * sorting rows by `z = interleave(bits(a), bits(b))` makes every
  * key-range-contiguous file cover a small RECTANGLE in (a, b) space, so
  * the per-file min/max statistics of BOTH columns become selective for
  * box predicates — where one-column clustering leaves the second
  * column's stats spanning the whole domain (no file ever skips).
  *
  * Bits are spread with the classic mask ladder (no loop, no branch) so
  * the expression stays a straight-line codegen kernel inside whole-stage
  * codegen. The low 31 bits of each input participate (62-bit z-value):
  * a deployment with wider keys rank-compresses first — clustering only
  * needs order, not the exact values. Negative inputs fold to their
  * absolute low bits; callers cluster on non-negative surrogate keys.
  */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_zvalue"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ZValue.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Spread the low 31 bits of x to even bit positions (Morton ladder). */
  def spread(x: Long): Long = {
    var v = x & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 62-bit Morton code: a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column-API bridge. */
  def zvalue(a: Column, b: Column): Column =
    ExpressionUtils.column(ZValue(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
