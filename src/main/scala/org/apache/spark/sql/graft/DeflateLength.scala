package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string's UTF-8 bytes — the
  * compression-ratio quality signal of web-corpus curation (CCNet/Gopher
  * style): near-random or heavily boilerplate text separates from prose by
  * `deflate_len / raw_len` alone, with no tokenizer or model in the loop.
  *
  * Stateless per-row map work (the 100 TB shape: no shuffle, no state); the
  * Deflater is thread-local and reset per row, fixed level 6 so the length
  * is reproducible run-to-run on a given zlib. Not SQL-expressible in the
  * DuckDB oracle — the query using it takes the driver's rows-only check,
  * with cross-engine-checked companions covering the rest of the row.
  */
case class DeflateLength(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(s: Any): Any =
    DeflateLength.deflatedLength(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.DeflateLength.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLength {
  private val localDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }

  /** Length in bytes of deflate(utf8(s)) at level 6, raw stream (no zlib
    * header), counting only — output bytes are discarded buffer-by-buffer. */
  def deflatedLength(s: UTF8String): Int = {
    val d = localDeflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    n
  }
}
