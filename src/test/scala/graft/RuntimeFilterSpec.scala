package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime row-level filtering (Spark's bloom-filter join pruning): when one
  * join side carries a selective filter, the optimizer injects a
  * bloom_filter_agg on that side and a might_contain probe into the OTHER
  * side's scan — at 100 TB this prunes most of the probe side's rows before
  * the shuffle. Locked here under explicit thresholds (local test tables are
  * below the default 10 MB creation threshold). */
class RuntimeFilterSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom filter into the fact scan") {
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      // force the shuffle-join regime (a broadcastable dim is already pruned
      // by the broadcast itself; bloom injection targets big-big joins)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100GB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.lineitem(spark, sf)
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      plan should include ("bloom_filter")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
