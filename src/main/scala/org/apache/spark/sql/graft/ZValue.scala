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

  /** n-dimensional Morton code: bit j of dimension i lands at position
    * j·n + i — each of the n dimensions contributes its low ⌊63/n⌋ bits
    * (n = 2 reproduces [[interleave]] bit-for-bit, which the spec pins).
    * A loop, not a mask ladder: n is data-independent and tiny, and the
    * JIT unrolls it — still one straight-line kernel per row. */
  def interleaveN(vs: Array[Long]): Long = {
    val n = vs.length
    val bitsPer = 63 / n
    var out = 0L
    var i = 0
    while (i < n) {
      val v = vs(i) & ((1L << bitsPer) - 1L)
      var j = 0
      while (j < bitsPer) {
        out |= ((v >> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Column-API bridge. */
  def zvalue(a: Column, b: Column): Column =
    ExpressionUtils.column(ZValue(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-API bridge, n dimensions (2 ≡ [[zvalue]] bit-for-bit). */
  def zvalueN(cols: Seq[Column]): Column =
    ExpressionUtils.column(ZValueN(cols.map(ExpressionUtils.expression)))
}

/** n-ary Morton interleave — [[ZValue]] generalized to any number of
  * dimensions (Delta's `OPTIMIZE … ZORDER BY (c1, …, cn)` shape). Same
  * codegen discipline: children evaluate inline, the interleave is one
  * static straight-line call. */
case class ZValueN(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(LongType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = children.exists(_.nullable)

  override def prettyName: String = "graft_zvalue_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < arr.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZValue.interleaveN(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val fills = gens.zipWithIndex
      .map { case (g, i) => s"$arr[$i] = ${g.value};" }.mkString("\n")
    val childCode = gens.map(_.code).reduce(_ + _)
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${children.size}];
        $fills
        ${ev.value} = org.apache.spark.sql.graft.ZValue.interleaveN($arr);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
