package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** n-dimensional HILBERT curve index — the locality-preserving sibling of
  * the Morton interleave ([[ZValueN]]): consecutive Hilbert indices are
  * ALWAYS unit-adjacent in coordinate space (Morton's bit-interleave
  * jumps across the domain at power-of-two boundaries), so key-range-
  * contiguous files cover tighter, squarer boxes and per-file min/max
  * bounds prune box predicates at least as well — the gap grows with
  * dimension count, which is why Delta added `OPTIMIZE … ZORDER` first
  * and Hilbert clustering after.
  *
  * Encoding is Skilling's transpose algorithm ("Programming the Hilbert
  * curve", AIP Conf. Proc. 707, 2004 — the standard public formulation):
  * an inverse-undo sweep plus a Gray-code pass turn the coordinate array
  * into the TRANSPOSED index, whose bit-interleave (most-significant
  * axis first within each level) is the Hilbert index. Each of the n
  * dimensions contributes its low ⌊63/n⌋ bits, like [[ZValue.interleaveN]];
  * wider keys rank-compress first (clustering needs order, not values).
  * The kernel is a short data-independent loop — one straight-line call
  * per row inside whole-stage codegen. */
case class HilbertN(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(children.size)(LongType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = children.exists(_.nullable)

  override def prettyName: String = "graft_hilbert_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Long](children.size)
    var i = 0
    while (i < arr.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    Hilbert.hilbertN(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val arr = ctx.freshName("hvals")
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
        ${ev.value} = org.apache.spark.sql.graft.Hilbert.hilbertN($arr);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object Hilbert {

  /** Coordinate array → Hilbert index, n = vs.length dimensions, each
    * contributing its low ⌊63/n⌋ bits. Pure function of the input —
    * `vs` is copied, never mutated. */
  def hilbertN(vs: Array[Long]): Long = {
    val n = vs.length
    if (n == 1) return vs(0) // 1-D Hilbert is the identity
    val bitsPer = 63 / n
    val mask = (1L << bitsPer) - 1L
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = vs(i) & mask; i += 1 }
    axesToTranspose(x, bitsPer)
    // pack the transposed index: at each bit level j (high to low), the
    // axes contribute most-significant-axis-first — bit j of x(i) lands
    // at output position j·n + (n − 1 − i)
    var out = 0L
    i = 0
    while (i < n) {
      var j = 0
      while (j < bitsPer) {
        out |= ((x(i) >> j) & 1L) << (j * n + (n - 1 - i))
        j += 1
      }
      i += 1
    }
    out
  }

  /** Skilling's AxesToTranspose: inverse-undo sweep + Gray encode, in
    * place over `x`, `b` bits per axis. */
  private def axesToTranspose(x: Array[Long], b: Int): Unit = {
    val n = x.length
    val m = 1L << (b - 1)
    // inverse undo
    var q = m
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p // invert low bits of axis 0
        else { // exchange low bits of axes 0 and i
          val t = (x(0) ^ x(i)) & p
          x(0) ^= t
          x(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1L) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
  }

  /** Column-API bridge. */
  def hilbert(cols: Seq[Column]): Column =
    ExpressionUtils.column(HilbertN(cols.map(ExpressionUtils.expression)))
}
