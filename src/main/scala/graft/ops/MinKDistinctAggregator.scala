package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k sketch: the k smallest DISTINCT values of a long column,
  * as a typed Aggregator. The buffer is a sorted array capped at k, so the
  * per-group state is O(k) no matter how many rows a group has — unlike a
  * distinct-then-window plan, which shuffles every distinct value before
  * the limit can bite, or collect_list, which holds the whole group in one
  * buffer. Partial aggregation applies (merge is a bounded sorted union),
  * so each map task sends at most k values per group to the exchange.
  *
  * Used by the winnowing fingerprint (k = 5 over ~|text| gram hashes per
  * doc); also the classic KMV (k-minimum-values) distinct-count sketch
  * shape. */
class MinKDistinctAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], value: Long): Array[Long] = {
    // sorted insert with cap — k is small, the scan is cheaper than a set
    if (buf.length == k && value >= buf(k - 1)) return buf
    if (java.util.Arrays.binarySearch(buf, value) >= 0) return buf
    ((buf :+ value).sorted).take(k)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
