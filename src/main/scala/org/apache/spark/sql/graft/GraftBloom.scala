package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column-API bridge to Spark's runtime-filter Bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * Catalyst's own `InjectRuntimeFilter` rule plants under joins).
  *
  * Exposing them directly lets a pipeline build a Bloom filter over a
  * reference key set as ONE distributed aggregation (partial filters merged
  * by OR — commutative, so the bit array is partitioning-independent),
  * ship the ~KB–MB bit array as a literal/broadcast, and pre-filter a huge
  * probe side before any shuffle. No false negatives, so an exact confirm
  * join downstream preserves exact semantics; the Bloom only cuts the
  * shuffle volume to (true hits + fpp × probe rows).
  */
object GraftBloom {

  /** Aggregate a LongType key column into a serialized Bloom filter
    * (BinaryType). `estItems`/`numBits` are fixed literals so the filter
    * geometry — and thus the exact false-positive set — is deterministic
    * across partitionings and rounds. */
  def bloomAgg(key: Column, estItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(key),
        Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a serialized Bloom filter. The filter side
    * must be foldable (pass `lit(bytes)`) — same contract as the runtime
    * filter rule, which keeps the probe inside whole-stage codegen with the
    * bit array bound once per task, not per row. */
  def mightContain(bloomBytes: Column, key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloomBytes), ExpressionUtils.expression(key)))

  /** Seeded XxHash64 as a Column — the double-hashing primitive behind
    * the lake's per-file bloom sidecars ([[graft.sources.LakeBloom]]);
    * bridged here because `ExpressionUtils` is `private[sql]`. */
  def xxhash64Seeded(c: Column, seed: Long): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(ExpressionUtils.expression(c)), seed))
}
