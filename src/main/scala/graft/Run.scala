package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Sinks

/** User-facing query runner — S5 parity with the reference's config-driven
  * task selection + CSV output (Homework2.scala:527-543, application.conf:3):
  * pick a query, point it at a table directory, write the result.
  *
  * Usage: runMain graft.Run <query|all|list> <sfDir> <outDir>
  *                          [--sep X] [--format csv|parquet]
  *
  * The reference separates tasks by output separator ("," for tasks
  * 1,2,3,5,6; "|" for task 4) — `--sep` reproduces that per invocation.
  */
object Run {
  def main(args: Array[String]): Unit =
    try run(args)
    catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage); usage(); sys.exit(2)
    }

  /** The CLI body; throws IllegalArgumentException on bad usage so callers
    * (and tests) never hit a sys.exit. */
  def run(args: Array[String]): Unit = {
    if (args.length < 1) throw new IllegalArgumentException("missing query")
    val query = args(0)
    if (query == "list") {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    if (args.length < 3) throw new IllegalArgumentException("missing sfDir/outDir")
    val Array(_, sfDir, outDir) = args.take(3)
    val opts = args.drop(3).sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val sep = opts.getOrElse("sep", ",")
    val format = opts.getOrElse("format", "csv")

    val names =
      if (query == "all") SparkEntry.queries.keys.toSeq.sorted
      else if (SparkEntry.queries.contains(query)) Seq(query)
      else throw new IllegalArgumentException(
        s"unknown query '$query' — run `graft.Run list`")

    val preexisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSessionExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      format match {
        case "parquet" => Sinks.writeParquet(df, s"$outDir/$name")
        case _         => Sinks.writeCsv(df, s"$outDir/$name", sep = sep)
      }
      println(s"[run] $name -> $outDir/$name ($format)")
    } finally if (preexisting.isEmpty) spark.stop()
  }

  private def usage(): Unit =
    System.err.println(
      "usage: graft.Run <query|all|list> <sfDir> <outDir> [--sep X] [--format csv|parquet]")
}
