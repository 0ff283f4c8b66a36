package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink helpers — S4 parity (reference: TextOutputFormat with configurable
  * separator, Homework2.scala:548,553; separators per task :565-:670).
  * Parquet is the engine-native format; CSV matches the reference's output
  * contract. */
object Sinks {

  /** CSV with configurable separator (the reference uses "," for tasks
    * 1,2,3,5,6 and "|" for task 4). */
  def writeCsv(df: DataFrame, path: String, sep: String = ",",
               header: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("sep", sep).option("header", header.toString)
      .csv(path)

  /** Parquet, optionally hive-partitioned by the given columns — the layout
    * that makes downstream partition pruning free. */
  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
