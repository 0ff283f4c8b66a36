package graft

import org.apache.spark.sql.SparkSession

/** Gates the serialized task-binary size of every registered query: each
  * scheduler stage's terminal RDD (what `DAGScheduler` broadcasts per
  * stage) must stay under [[TaskBinAudit.LimitKiB]]. The budget exists
  * because plan-embedded state — injected runtime bloom filters over
  * stats-less branches, big literals — is invisible at local[32] but
  * multiplies into scheduler traffic at a 10k-task cluster stage. The
  * engine-standard bloom sizing lives in [[GraftSession]]; this spec
  * proves the whole registry respects the budget under that tuning.
  */
class TaskBinarySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("every registered query's per-stage task binary stays under the budget") {
    // fresh session over the same context: extension-dependent queries
    // (native as-of join) need the planner strategy installed, and the
    // gate must run under the same GraftSession tuning as bench/verify
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = GraftSession.tune(SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new org.apache.spark.sql.graft.GraftSessionExtensions))
        .getOrCreate()
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val (bytes, _) = TaskBinAudit.maxStageBinaryBytes(fn(s2, sf))
          if (bytes > TaskBinAudit.LimitKiB * 1024L)
            Some(f"$name ${bytes / 1024.0}%.0f KiB")
          else None
      }
      offenders shouldBe empty
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
