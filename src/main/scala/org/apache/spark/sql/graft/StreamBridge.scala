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
}
