package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Registry-wide join lint, the WindowPlanLintSpec pattern applied to the
  * other scale cliff: a `CartesianProductExec` pairs PARTITIONS of both
  * sides — O(n·m) shuffle-read work that no amount of executors absorbs.
  * Every deliberate cross in this engine is a broadcast of a scalar/
  * bounded relation (1-row totals, band domains, codebooks), which plans
  * as `BroadcastNestedLoopJoin` — so the rule is absolute: NO registered
  * query may plan a CartesianProduct, ever. The nested-loop form is
  * additionally gated: its broadcast side must come from a broadcast
  * exchange (always true by construction — Spark only picks it when one
  * side broadcasts), and the count per query is bounded to catch a
  * query accidentally stacking unbounded cross stages. */
class JoinPlanLintSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Max BroadcastNestedLoopJoin operators a single query may plan —
    * generous (the widest current user is the multi-stage text/similarity
    * pipelines); the point is to catch runaway growth, not to count. */
  private val MaxBnljPerQuery = 8

  test("no registered query plans a CartesianProduct; BNLJ stays bounded") {
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
          // sparkPlan, not executedPlan: the AQE wrapper is a leaf to collect()
          val plan = fn(s2, sf).queryExecution.sparkPlan
          val cart = plan.collect { case c: CartesianProductExec => c }
          val bnlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
          val bad =
            (if (cart.nonEmpty) Seq(s"$name: ${cart.size} CartesianProduct") else Nil) ++
            (if (bnlj.size > MaxBnljPerQuery)
              Seq(s"$name: ${bnlj.size} BroadcastNestedLoopJoins (> $MaxBnljPerQuery)")
            else Nil)
          bad
      }
      offenders shouldBe empty
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
