package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** ORC — the second columnar format Spark ships natively; interop surface
    * for Hive-era lakes. Same pushdown/pruning contract as parquet (the
    * reader reports PushedFilters the same way), verified by LayoutSpec's
    * roundtrip. */
  def writeOrc(df: DataFrame, path: String,
               partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Small-files compaction — the table-maintenance pass every streaming /
    * incremental sink eventually needs: rewrite a parquet directory into
    * ceil(totalBytes / targetBytes) evenly-sized files. `repartition` (not
    * `coalesce`): the round-robin exchange costs one shuffle but yields
    * uniform file sizes; coalesce concatenates input partitions and
    * preserves their skew. Returns the output file count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.getContentSummary(path).getLength
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Key-clustered compaction — compaction PLUS data clustering: rows are
    * range-repartitioned on the key before the rewrite, so each output
    * file covers a DISJOINT key range and the format's min/max column
    * statistics (parquet row-group stats / ORC stripe stats) turn key
    * predicates into file-level skips. The single-column version of what
    * Z-ordering does for multi-column predicates; LayoutSpec asserts the
    * disjointness that data skipping rests on. Same shuffle cost as
    * [[compact]] (range instead of round-robin exchange). */
  def compactSorted(spark: SparkSession, inDir: String, outDir: String,
                    sortCol: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.spark.sql.functions.col
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.getContentSummary(path).getLength
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Bucketed (and per-bucket sorted) managed table — the layout that makes
    * every downstream join/window/aggregation ON the bucket key exchange-free:
    * the scan's output partitioning already satisfies the required hash
    * distribution, so Catalyst plans no shuffle. The 100 TB lever for
    * relations re-queried on a stable key (see Tables.materializePubAuthors). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }
}
