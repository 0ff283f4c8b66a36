package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two ARRAY<DOUBLE> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, *), 0d,
  * +)`) is interpreted and materializes an intermediate array per row; this
  * expression participates in whole-stage codegen with a primitive double
  * loop and zero allocation — the hot inner kernel of the pairwise cosine
  * queries (O(|pairs|·dim) evaluations).
  *
  * Summation is left-to-right, bit-identical to the HOF version. Lengths may
  * differ; the shorter length bounds the loop. Null elements are not
  * expected (vectors come from parquet FLOAT[] cast to double) and are read
  * as primitive slots.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API bridge for the native expressions (lives in the spark.sql
  * namespace to reach the private[sql] Column/Expression converters). */
object GraftExpressions {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductDouble(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hash60(s: Column): Column =
    ExpressionUtils.column(Md5Hash60(ExpressionUtils.expression(s)))

  def deflateLen(s: Column): Column =
    ExpressionUtils.column(DeflateLength(ExpressionUtils.expression(s)))
}
