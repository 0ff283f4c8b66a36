package graft
import org.apache.spark.sql.SparkSession

/** Scale-growth audit: time each registered query at every scale factor
  * under /root/testdata (sf0.001 / sf0.01 / sf0.1 — two decades of n) and
  * fit the per-query growth exponent α in t ∝ n^α. The point: the 100 TB
  * story otherwise rests on plan reading alone — a pair-generating query
  * whose CONSTANT is wrong (bucket occupancy, band count) looks fine at
  * one scale factor and melts at the next; a measured growth curve
  * falsifies dozens of scale claims at once.
  *
  * Protocol matches [[Bench]] (min-of-2, noop sink, warmup query) so the
  * numbers are comparable with BENCH_FULL.json. Two α estimates per query:
  *   - `alpha`      — least-squares slope of log10 t over log10 sf across
  *                    all three points;
  *   - `alpha_tail` — log10(t_01→t_1) step alone. At sf0.001 most queries
  *                    are dominated by fixed job overhead (~0.1–0.3 s of
  *                    scheduling + codegen), which biases the 3-point fit
  *                    LOW; the tail step is the scale signal.
  * Output: one JSON file {"machine":"builder",...,"queries":{name:
  * {t_001,t_01,t_1,alpha,alpha_tail}}} — the committed SCALE_r{N} artifact.
  *
  * Usage: runMain graft.ScaleAudit <outFile> [queryName...]
  * (no query names = the full registered surface).
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleAudit <outFile> [queryName...]")
    val outFile = args.head
    val names = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSessionExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id % 7)").collect() // session warmup

    // optional 4th decade: a builder-generated sf1 (tools/gen_sf.py) via
    // GRAFT_SF1_DIR — the sub-sf0.1 points are fixed-overhead-dominated,
    // so the top decades carry the real scale signal
    val sfs = Seq(("t_001", 0.001, "/root/testdata/sf0.001"),
                  ("t_01",  0.01,  "/root/testdata/sf0.01"),
                  ("t_1",   0.1,   "/root/testdata/sf0.1")) ++
      sys.env.get("GRAFT_SF1_DIR").map(d => ("t_1x", 1.0, d)).toSeq
    // a typoed query name must fail loudly, not write a silently-thin
    // artifact — this audit exists to falsify claims, not mask gaps
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.isEmpty || names(q._1))

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { // fatal JVM errors must propagate, not read as a benign -1
        case scala.util.control.NonFatal(_) => -1.0
      }
    }

    // ascending sf: the cheap decades first, page cache warm by the big one
    val times: Map[String, Map[String, Double]] = sfs.map { case (key, _, dir) =>
      key -> ordered.map { case (n, f) =>
        val a = once(f, dir)
        n -> (if (a < 0) -1.0 else { val b = once(f, dir); if (b < 0) -1.0 else math.min(a, b) })
      }.toMap
    }.toMap

    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def slope(pts: Seq[(Double, Double)]): Double = {
      val n = pts.size
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val rows = ordered.map { case (name, _) =>
      val t = sfs.map { case (key, sf, _) => (math.log10(sf), times(key)(name)) }
      val ok = t.forall(_._2 > 0)
      val logs = t.map { case (x, v) => (x, math.log10(v)) }
      val alpha = if (ok) Some(slope(logs)) else None
      // the top two decades alone: the sub-sf0.1 points sit on fixed job
      // overhead, which biases the all-points fit LOW
      val alphaTop = if (ok && t.size >= 4) Some(slope(logs.takeRight(3))) else None
      val tail = if (ok) Some(math.log10(t.last._2 / t(t.size - 2)._2)) else None
      val fields = sfs.map { case (key, _, _) => s""""$key":${fmt(times(key)(name))}""" } ++
        Seq(s""""alpha":${alpha.map(a => f"$a%.3f").getOrElse("null")}""",
            s""""alpha_tail":${tail.map(a => f"$a%.3f").getOrElse("null")}""") ++
        alphaTop.map(a => s""""alpha_top2":${f"$a%.3f"}""").toSeq
      s""""$name":{${fields.mkString(",")}}"""
    }
    val dirsJson = sfs.map(s => "\"" + s._3.split('/').last + "\"").mkString(",")
    val json =
      s"""{"machine":"builder","protocol":"min2-noop-${sfs.size}sf","n_queries":${rows.size},"sf_dirs":[$dirsJson],"queries":{${rows.mkString(",")}}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $outFile (${rows.size} queries)")
    spark.stop()
  }
}
