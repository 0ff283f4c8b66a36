package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator form of A3 (longest consecutive run; SURVEY.md §4.2
  * names this the fallback if the higher-order-function form ever
  * disappoints) — the engine's user-extensible UDAF surface:
  *
  * {{{
  * spark.udf.register("longest_run", functions.udaf(LongestRunAggregator))
  * spark.sql("SELECT author, longest_run(yr) FROM ay GROUP BY author")
  * }}}
  *
  * Buffer is the distinct value set (duplicates dedupe on arrival, Q3
  * intended semantics); merge is a set union, so the aggregation is
  * partial-aggregation-friendly (map-side combine works). */
object LongestRunAggregator extends Aggregator[Int, Set[Int], Int] {

  override def zero: Set[Int] = Set.empty

  override def reduce(buf: Set[Int], value: Int): Set[Int] = buf + value

  override def merge(a: Set[Int], b: Set[Int]): Set[Int] = a ++ b

  override def finish(values: Set[Int]): Int = {
    if (values.isEmpty) return 0
    val sorted = values.toArray.sorted
    var best = 1
    var cur = 1
    var i = 1
    while (i < sorted.length) {
      cur = if (sorted(i) == sorted(i - 1) + 1) cur + 1 else 1
      if (cur > best) best = cur
      i += 1
    }
    best
  }

  override def bufferEncoder: Encoder[Set[Int]] = Encoders.kryo[Set[Int]]

  override def outputEncoder: Encoder[Int] = Encoders.scalaInt
}
