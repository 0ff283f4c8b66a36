package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit portable string hash — the engine-wide shuffle/bucket key
  * (shingles, MinHash input, split/sample assignment, fingerprints).
  *
  * Value contract (unchanged): the first 15 hex digits of md5 as a long,
  * bit-identical to the composed Catalyst form
  * `conv(substring(md5(s), 1, 15), 16, 10) CAST LONG` and to DuckDB's
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`. The first 15 hex digits are
  * the first 60 bits of the digest, so the hash is the big-endian long of
  * the first 8 digest bytes logically shifted right by 4 — computed here
  * straight from the digest bytes. The composed form materializes a 32-char
  * hex string, a substring copy, and re-parses the hex (`Conv`) per row;
  * this expression does none of that and stays in whole-stage codegen.
  */
case class Md5Hash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(s: Any): Any =
    Md5Hash60.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {
  // One MessageDigest per executor thread — getInstance("MD5") per row is
  // an allocation + provider lookup in the hottest loop of the engine.
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes of s) as a non-negative long. */
  def hash(s: UTF8String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }
}
