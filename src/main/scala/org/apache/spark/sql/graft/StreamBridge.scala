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

  /** Harness seam for driving a V1 Source WITHOUT the engine: a frame
    * minted by [[streamingDataFrame]] is a streaming-flagged LogicalRDD
    * whose RDD is already compiled — re-wrap that RDD as a batch frame
    * directly (a fresh batch analysis of the streaming plan would refuse
    * with "must be executed with writeStream.start()"). */
  def rewrapSourceBatch(data: DataFrame): DataFrame = {
    val spark =
      data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    data.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        spark.internalCreateDataFrame(l.rdd, data.schema, isStreaming = false)
      case _ => batchDataFrame(data)
    }
  }
}
