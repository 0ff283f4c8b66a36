package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-layer entry: registers every star-schema table as a temp view so
  * arbitrary `spark.sql` text runs against a scale dir — the SQL surface
  * the reference lacks entirely (SURVEY.md: "no SQL layer"). Idempotent. */
object Catalog {

  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { name =>
      // events goes through Tables.events for the nanos-timestamp repair
      val df = if (name == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, name)
      df.createOrReplaceTempView(name)
    }

  /** Register the engine's typed UDAFs for SQL use — longest_run (A3) and
    * min_k_distinct(v, k-bound at registration) — alongside the codegen
    * graft_dot injected by GraftSessionExtensions. Idempotent. */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.udf.register("longest_run",
      org.apache.spark.sql.functions.udaf(graft.ops.LongestRunAggregator))
    spark.udf.register("min5_distinct",
      org.apache.spark.sql.functions.udaf(new graft.ops.MinKDistinctAggregator(5)))
  }

  /** Run SQL text against the registered tables of a scale dir. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    registerFunctions(spark)
    spark.sql(query)
  }
}
