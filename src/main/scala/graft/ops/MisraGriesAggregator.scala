package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed Aggregator: at most k
  * counters per buffer, so per-task state is O(k) regardless of vocabulary
  * size — the frequent-items analog of the KMV bottom-k sketch
  * ([[MinKDistinctAggregator]]).
  *
  * reduce: a present key increments; a new key inserts while capacity
  * remains, else EVERY counter decrements by one (zeros drop) — the
  * classic one-pass rule. merge: counters sum; if the union overflows k,
  * all counters drop by the (k+1)-th largest and non-positives vanish
  * (Agarwal et al.'s mergeable-summaries rule, which preserves the error
  * bound under partial aggregation — exactly what Spark's partial/final
  * split needs).
  *
  * Guarantee: any item with true count > N/(k+1) over N rows SURVIVES in
  * the final summary, and every surviving estimate undercounts by at most
  * N/(k+1). The summary's exact membership depends on merge order, so
  * oracle-gated queries must re-verify candidates against exact counts
  * (the sketch is the screen, never the answer — see
  * TextAnalysis.textHeavyHitters).
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], t: String): Map[String, Long] =
    buf.get(t) match {
      case Some(c) => buf.updated(t, c + 1)
      case None if buf.size < k => buf.updated(t, 1L)
      case None =>
        buf.collect { case (key, c) if c > 1 => key -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    if (m.size <= k) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (key, c) if c > cut => key -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
