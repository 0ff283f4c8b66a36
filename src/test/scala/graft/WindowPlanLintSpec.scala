package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Registry-wide lint: NO registered query may plan an un-partitioned
  * window. `Window.orderBy(..)` without a `partitionBy` executes as ONE
  * task holding the entire relation ("Moving all data to a single
  * partition") — a serialization point that per-SF scale sweeps cannot
  * see, because single-task work grows linearly while the task itself
  * melts. The scale-safe alternatives already in the engine:
  * [[graft.ops.Relational.withDistributedNtile]] for global quantile
  * assignment, `TakeOrderedAndProject` (orderBy+limit) for global top-k,
  * and partitioned windows everywhere a grouping key exists.
  *
  * Allowlist (bounded-cardinality lanes only — each entry must argue why
  * the windowed relation CANNOT grow with the corpus):
  *  - `text_vocab_coverage`: the window runs over the distinct-token
  *    vocabulary, which grows ~Heaps' law (sublinearly) and is capped by
  *    the Misra–Gries screen ([[graft.extensions.TextAnalysis.VocabScreenThreshold]])
  *    before the window when it exceeds the screen threshold.
  *  - `text_zipf_slope`: same vocabulary-sized relation, same screen.
  */
class WindowPlanLintSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private val allowlist = Set("text_vocab_coverage", "text_zipf_slope")

  test("no registered query plans an un-partitioned WindowExec") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = GraftSession.tune(SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new org.apache.spark.sql.graft.GraftSessionExtensions))
        .getOrCreate()
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (name, _) => allowlist.contains(name) }
        .flatMap { case (name, fn) =>
          // sparkPlan, not executedPlan: the AQE wrapper is a leaf to collect()
          val plan = fn(s2, sf).queryExecution.sparkPlan
          val bad = plan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty =>
              s"$name: un-partitioned WindowExec(${w.windowExpression.mkString(",").take(80)})"
            case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
              s"$name: un-partitioned WindowGroupLimitExec(limit=${w.limit})"
          }
          bad
        }
      offenders shouldBe empty
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("the allowlisted vocabulary lanes are the ONLY global windows") {
    // The allowlist must not rot: each allowlisted query genuinely plans a
    // global window today (otherwise the entry should be deleted).
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = GraftSession.tune(SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new org.apache.spark.sql.graft.GraftSessionExtensions))
        .getOrCreate()
      allowlist.foreach { name =>
        val plan = SparkEntry.queries(name)(s2, sf).queryExecution.sparkPlan
        val globals = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
        }
        withClue(s"$name should still need its allowlist entry: ") {
          globals should not be empty
        }
      }
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
