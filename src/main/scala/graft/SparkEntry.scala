package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.extensions.{Dedup, Events, Multimodal, Privacy, Quality, Similarity, TextAnalysis}
import graft.queries.{DblpAnalog, Tpch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 inventory +
  * extensions) to a `(spark, sfDir) => DataFrame`; `oracleSql` pairs each
  * with equivalent DuckDB ANSI SQL over the same parquet tables. Column
  * names and types match between both sides, and every result carries a
  * total ordering, so the driver's hash compare is deterministic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    DblpAnalog.t1TopAuthorsPerVenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DblpAnalog.queries ++ Tpch.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Events.queries ++
      Multimodal.queries ++ Privacy.queries ++ Quality.queries ++
      graft.sources.Lake.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    DblpAnalog.oracle ++ Tpch.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ Events.oracle ++
      Multimodal.oracle ++ Privacy.oracle ++ Quality.oracle ++
      graft.sources.Lake.oracle
}
