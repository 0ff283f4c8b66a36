package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot grouping keys. At 100 TB a handful of
  * keys (empty venue, bot user_id, boilerplate shingle) can own gigabytes;
  * AQE's skew-join split handles joins, but single-key aggregation skew
  * needs salting: shard the hot key across `salt` sub-keys, aggregate
  * partially per shard, then merge the shards — two small shuffles instead
  * of one partition-crushing shuffle.
  */
object Skew {

  /** Salted count: groupBy(keys × salt) partial counts → groupBy(keys) sum.
    * Equivalent to df.groupBy(keys).count() for any data; the win appears
    * when one key dominates a partition. The salt column derives from a
    * stable row hash, not rand(), so the result is retry-deterministic. */
  def saltedCount(df: DataFrame, keys: Seq[Column], salt: Int = 16,
                  out: String = "cnt"): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(keys :+ monotonically_increasing_id(): _*), lit(salt)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum("__partial").as(out))
  }

  /** Salted sum over a numeric column, same two-stage shape. */
  def saltedSum(df: DataFrame, keys: Seq[Column], value: Column, salt: Int = 16,
                out: String = "sum"): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(keys :+ monotonically_increasing_id(): _*), lit(salt)))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum("__partial").as(out))
  }
}
