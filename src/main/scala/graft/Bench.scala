package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSessionExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query isn't charged session
    // bring-up (JIT, codegen compiler, shuffle machinery).
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    // Time FULL materialization via the noop sink: under a bare count(),
    // EliminateSorts legally drops every final orderBy, under-charging any
    // query whose cost includes the output sort. Two passes, min per query:
    // the first pass pays codegen compilation and page-cache warmup, the
    // min is the steady-state cost — stable across rounds, so regressions
    // are signal, not scheduler noise.
    // A query that crashes must NOT read as a fast success: record a -1.0
    // sentinel and an errors-map entry instead of swallowing the Throwable.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = (e.getClass.getName + ": " + String.valueOf(e.getMessage))
            .replaceAll("""[\\"\p{Cntrl}]""", " ").take(200)
          -1.0
      }
    }
    // Optional args: query names — time just those (local profiling; the
    // driver always invokes with no args, timing the full surface).
    val ordered0 = SparkEntry.queries.toSeq.sortBy(_._1)
    val ordered = if (args.nonEmpty) ordered0.filter(q => args.contains(q._1)) else ordered0
    val pass1 = ordered.map { case (n, f) => n -> once(n, f) }.toMap
    val pass2 = ordered.map { case (n, f) =>
      val a = pass1(n)
      n -> (if (a < 0) -1.0 else { val b = once(n, f); if (b < 0) -1.0 else math.min(a, b) })
    }.toMap
    // The slowest queries dominate the headline total AND are the most
    // GC/page-cache-sensitive (iterative, checkpoint-heavy) — observed
    // run-to-run swings of ±40% on them while the other 140+ queries sat
    // stable. A third pass over just the top decile tightens the min
    // toward steady state for ~20 s, making cross-round totals comparable.
    // Tiebreak equal times by name so the decile SET is deterministic
    // across runs (an unstable sort could rotate borderline queries in
    // and out of the third pass, shifting totals for no real reason).
    val slowest = pass2.toSeq.filter(_._2 >= 0).sortBy { case (k, v) => (-v, k) }
      .take(math.max(1, ordered.size / 10)).map(_._1).toSet
    val results = ordered.map { case (n, f) =>
      val v = pass2(n)
      n -> (if (v < 0 || !slowest(n)) v
            else { val c = once(n, f); if (c < 0) -1.0 else math.min(v, c) })
    }.toMap
    // A crashed query must never read as a speedup: each error adds a one-
    // hour penalty to the headline total, so ANY comparator (including a
    // naive `total < 2 x baseline`) sees a crash as a hard regression,
    // while per-query -1 sentinels + the errors map identify the culprits.
    val total = results.values.filter(_ >= 0).sum + 3600.0 * errors.size
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    // The harness that runs this keeps only the LAST ~2000 chars of output,
    // and the query surface has grown past 100 entries — a full-precision
    // all-queries map (~4.5 KB) no longer fits, which truncates the line
    // mid-JSON and loses the round's numbers entirely (this happened).
    // So: the complete per-query map goes to BENCH_FULL.json next to the
    // build, and the ONE stdout line stays under ~1700 chars by carrying
    // the total, counts, and the slowest queries that fit (slowest-first —
    // those are the ones a performance read actually needs).
    val fullQs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // methodology: bumped whenever the timing protocol changes, so totals
    // are only compared within the same protocol. v1 = min-of-2 noop-sink;
    // v2 = v1 + third pass over the slowest decile (deterministic set).
    // builder-machine runs tag their artifact so it is never mistaken for
    // the driver's number of record (bench-protocol rule from round 5)
    val machine = sys.env.get("SPARK_GRAFT_MACHINE")
      .map(m => s""""machine":"${m.replaceAll("[^A-Za-z0-9_.-]", "_")}",""")
      .getOrElse("")
    val fullLine =
      s"""{${machine}"metric":"total","value":${fmt(total)},"unit":"sec","methodology":"min2-noop-decile3-v2","n_queries":${results.size},"queries":$fullQs,"errors":$errJson,"sf":"$sfDir"}"""
    if (args.isEmpty) // a filtered profiling run must not clobber the round's full dump
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val budget = 1300 // chars available for the stdout per-query subset
    val bySlow = results.toSeq.sortBy { case (k, v) => (-v, k) }
    val shown = scala.collection.mutable.ListBuffer[String]()
    var used = 0
    bySlow.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + fmt(v)
      if (used + e.length + 1 <= budget) { shown += e; used += e.length + 1 }
    }
    val errShown = errors.take(2)
      .map { case (k, v) => "\"" + k + "\":\"" + v.take(80) + "\"" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","methodology":"min2-noop-decile3-v2","n_queries":${results.size},"n_shown":${shown.size},"n_errors":${errors.size},"full":"BENCH_FULL.json","queries":${shown.mkString("{", ",", "}")},"errors":$errShown,"sf":"$sfDir"}""")
    spark.stop()
  }
}
