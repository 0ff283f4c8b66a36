package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Analysis WITHOUT a Dataset: `Dataset.ofRows` (and `spark.sql`)
  * eagerly EXECUTE plans that analyze to commands — constructing one is
  * therefore never a safe way to merely VALIDATE or RESOLVE user-written
  * SQL. The persisted-view path must do exactly that (validate a body at
  * CREATE, expand it at read) without ever running a side effect, so it
  * analyzes through the session's `executePlan` seam directly — package-
  * private in Spark, reachable from here like [[StreamBridge]]'s seams. */
object AnalysisBridge {

  /** Parse + analyze `sql`; returns the analyzed plan WITHOUT executing
    * anything, plus whether the statement is command-shaped (checked on
    * BOTH the parsed and analyzed trees: `INSERT INTO t SELECT …` parses
    * to a plain statement node but ANALYZES to a write command). */
  def analyzeStatement(spark: SparkSession, sql: String)
      : (LogicalPlan, Boolean) = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val parsed = s.sessionState.sqlParser.parsePlan(sql)
    def commandShaped(p: LogicalPlan): Boolean =
      p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Command] ||
        p.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement]
    if (commandShaped(parsed)) return (parsed, true)
    val qe = s.sessionState.executePlan(parsed)
    qe.assertAnalyzed()
    (qe.analyzed, commandShaped(qe.analyzed))
  }
}
