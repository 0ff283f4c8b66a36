package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** V1 streaming sources must hand MicroBatchExecution a DataFrame whose
  * `isStreaming` flag is set (the execution asserts it); the door to mint
  * one from a batch plan is `SparkSession.internalCreateDataFrame`, which
  * is `private[sql]` — reachable from this package, the same seam Spark's
  * own file/socket V1 sources use. The RDD is the batch plan's
  * `queryExecution.toRdd`, so nothing materializes at wiring time. */
object StreamBridge {

  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The reverse door, for V1 SINKS: `addBatch` hands a streaming-flagged
    * DataFrame that batch operators (joins, writes) refuse — re-plan the
    * same rows as an ordinary batch DataFrame (the ForeachBatchSink
    * pattern). Nothing materializes at wiring time. */
  def batchDataFrame(data: DataFrame): DataFrame = {
    val spark =
      data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(data.queryExecution.toRdd, data.schema,
      isStreaming = false)
  }
}
