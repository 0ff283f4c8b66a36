package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named registry lanes into
  * `<outDir>/<lane>_<suffix>.txt` — the round's plan-evidence artifact
  * (run once from the pre-optimization commit with suffix `before` and
  * once at HEAD with suffix `after`).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <lane> [lane …]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val lanes = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftSessionExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    lanes.foreach { lane =>
      val df = SparkEntry.queries(lane)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${lane}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"dumped $lane ($suffix)")
    }
    spark.stop()
  }
}
