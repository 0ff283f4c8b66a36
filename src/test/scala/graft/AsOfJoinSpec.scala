package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOf

import graft.extensions.Events

/** The native as-of join operator (logical node + strategy + physical
  * merge) against the window-composition formulation: identical results,
  * and the physical plan actually contains the custom operator with its
  * declared distribution satisfied by hash exchanges on the key. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("native as-of join ≡ window formulation on real data") {
    val dir = "/root/testdata/sf0.001"
    val win = rows(Events.eventsAsofAttribution(spark, dir))
    val native = rows(Events.eventsAsofCustom(spark, dir))
    native should not be empty
    native shouldBe win
  }

  test("physical plan uses AsOfJoinExec; both sides hash-partition on the key") {
    val df = Events.eventsAsofCustom(spark, "/root/testdata/sf0.001")
    // the exec sits inside the AdaptiveSparkPlan wrapper — assert on the
    // rendered tree (collect does not descend into AQE's inner plan)
    val p = df.queryExecution.executedPlan.toString
    p should include ("AsOfJoin")
    p should include regex "Exchange hashpartitioning\\(user_id"
  }

  test("left-only filters push below the custom node; payload filters stay above") {
    AsOf.install(spark)
    val left = Seq((1L, 100L, 1L), (2L, 50L, 2L)).toDF("k", "t", "id")
    val right = Seq((1L, 90L, 0L, 111L)).toDF("k", "t", "id", "v")
    val joined = AsOf.joinAsOf(left, right,
      key = "k", time = "t", tiebreak = "id", payload = "v", asofCol = "prev_v")
    val pushed = joined.filter(col("k") === 1 && col("prev_v").isNotNull)
    val opt = pushed.queryExecution.optimizedPlan
    val node = opt.collectFirst {
      case j: org.apache.spark.sql.graft.AsOfJoinPlan => j }.get
    // the k-predicate sits INSIDE the join's left input...
    node.left.toString should include ("= 1")
    // ...while the payload predicate stays above the join
    opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.exists(_.name == "prev_v") => f
    } should not be empty
    rows(pushed.select("k", "t", "id", "prev_v")) shouldBe Seq(Seq(1L, 100L, 1L, 111L))
  }

  test("property: native as-of ≡ per-key linear scan on random duplicate-heavy data") {
    AsOf.install(spark)
    val rnd = new scala.util.Random(42)
    // small key/time domains force duplicate timestamps and empty keys
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(20).toLong, i.toLong))
      .toDF("k", "t", "id")
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(20).toLong, (1000 + i).toLong, rnd.nextInt(100).toLong))
    val rightDf = right.toDF("k", "t", "id", "v")
    val out = AsOf.joinAsOf(left.toDF("k", "t", "id"), rightDf,
        key = "k", time = "t", tiebreak = "id", payload = "v", asofCol = "prev_v")
      .select("k", "t", "id", "prev_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    // reference model: driver-side linear scan
    val expected = left.collect().map { lr =>
      val (k, t, id) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      val prior = right.filter { case (rk, rt, rid, _) =>
        rk == k && (rt < t || (rt == t && rid < id)) }
      val v = if (prior.isEmpty) None
        else Some(prior.maxBy { case (_, rt, rid, _) => (rt, rid) }._4)
      (k, t, id, v)
    }.toSet
    out shouldBe expected
  }

  test("strictly-prior semantics: equal timestamps break on the tiebreak") {
    AsOf.install(spark)
    // right rows at the SAME time as the left probe: only the one with a
    // smaller tiebreak id is 'prior'; later keys never leak across keys
    val left = Seq((1L, 100L, 10L), (1L, 100L, 1L), (2L, 50L, 5L))
      .toDF("k", "t", "id")
    val right = Seq((1L, 100L, 2L, 222L), (1L, 100L, 11L, 333L),
      (1L, 90L, 0L, 111L), (3L, 10L, 0L, 999L))
      .toDF("k", "t", "id", "v")
    val out = AsOf.joinAsOf(left, right,
        key = "k", time = "t", tiebreak = "id", payload = "v", asofCol = "prev_v")
      .orderBy("k", "t", "id")
      .select("k", "t", "id", "prev_v")
    rows(out) shouldBe Seq(
      Seq(1L, 100L, 1L, 111L),  // id 1 < right id 2 at t=100 → only t=90 row prior
      Seq(1L, 100L, 10L, 222L), // id 10 > right id 2 → that row counts, id 11 not
      Seq(2L, 50L, 5L, null))   // key 2 has no right rows; key 1 state must not leak
  }
}
