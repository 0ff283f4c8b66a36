package graft

import org.apache.spark.sql.functions._

import graft.extensions.Quality
import graft.extensions.Quality.{Complete, RowCheck, Unique}

/** Data-quality verification (graft.extensions.Quality): the audit must
  * CATCH violations, not just bless clean testdata — every test injects a
  * defect and asserts the exact count, metric, and verdict; plus the
  * one-scan plan contract. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private val dirty = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), -5.0), // range violation
    (3L, None, 7.0),       // completeness violation
    (3L, Some("c"), 2.0)   // uniqueness violation (dup key 3)
  ).toDF("id", "tag", "x")

  test("audit catches a single violating row per constraint, exactly") {
    val report = Quality.audit(dirty, Seq(
      Complete("complete(tag)", "tag"),
      Unique("unique(id)", "id"),
      RowCheck("range(x>0)", col("x") > 0)))
    val byName = report.collect().map(r =>
      r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    byName("complete(tag)") shouldBe ((0.75, false))
    byName("unique(id)") shouldBe ((0.75, false))
    byName("range(x>0)") shouldBe ((0.75, false))
  }

  test("constraint names containing quotes are escaped, not parsed") {
    val report = Quality.audit(dirty, Seq(
      RowCheck("range(tag>'a')", col("tag") > "a")))
    val r = report.collect()(0)
    r.getString(0) shouldBe "range(tag>'a')"
    r.getDouble(1) shouldBe 0.5 // b and c of 4 rows
  }

  test("a clean table passes every constraint with metric 1.0") {
    val clean = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "tag", "x")
    val report = Quality.audit(clean, Seq(
      Complete("complete(tag)", "tag"),
      Unique("unique(id)", "id"),
      RowCheck("range(x>0)", col("x") > 0)))
    report.collect().foreach { r =>
      r.getDouble(1) shouldBe 1.0
      r.getBoolean(2) shouldBe true
    }
  }

  test("one violation among many rows still fails the verdict (exact counts)") {
    // 100 000 rows, one negative: the rounded metric prints 0.99999 but
    // the verdict must compare counts, not the rounded float
    val big = spark.range(100000L)
      .select(col("id"), when(col("id") === 54321L, -1.0).otherwise(1.0).as("x"))
    val report = Quality.audit(big, Seq(RowCheck("range(x>0)", col("x") > 0)))
    val r = report.collect()(0)
    r.getBoolean(2) shouldBe false
    r.getDouble(1) should be < 1.0
  }

  test("audit is ONE scan: a single aggregate over one relation, no joins") {
    val report = Quality.audit(dirty, Seq(
      Complete("c", "tag"), Unique("u", "id"), RowCheck("r", col("x") > 0)))
    val plan = report.queryExecution.sparkPlan
    plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    } shouldBe empty
  }

  test("referential reports orphans per relationship and passes clean FKs") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 99L), (13L, 99L)).toDF("id", "fk")
    val cleanChild = Seq((20L, 3L)).toDF("id", "fk")
    val report = Quality.referential(Seq(
      ("bad.fk->parent.pk", child, "fk", parent, "pk"),
      ("good.fk->parent.pk", cleanChild, "fk", parent, "pk")))
    rows(report) shouldBe Seq(
      Seq("bad.fk->parent.pk", 4L, 2L, false),
      Seq("good.fk->parent.pk", 1L, 0L, true))
  }

  test("null FKs are excluded from containment (unknown, not orphan)") {
    val parent = Seq(1L).toDF("pk")
    val child = Seq((10L, Some(1L)), (11L, None)).toDF("id", "fk")
    rows(Quality.referential(Seq(("c.fk->p.pk", child, "fk", parent, "pk")))) shouldBe
      Seq(Seq("c.fk->p.pk", 1L, 0L, true))
  }

  test("PSI drift: per-segment values nonnegative, labels consistent") {
    val out = Quality.dqDriftPsi(spark, "/root/testdata/sf0.001").collect()
    out.length shouldBe 5
    out.foreach { r =>
      val psi = r.getDouble(1)
      // every PSI term (p-q)·ln(p/q) is nonnegative, so the sum is too
      psi should be >= 0.0
      r.getString(2) shouldBe (
        if (psi > 0.2) "major" else if (psi > 0.1) "moderate" else "stable")
    }
  }

  test("the gated lanes hold on real testdata: clean star schema verdicts") {
    val sf = "/root/testdata/sf0.001"
    val cons = Quality.dqConstraintsOrders(spark, sf).collect()
    cons.length shouldBe 6
    cons.foreach(_.getBoolean(2) shouldBe true)
    val refs = Quality.dqReferential(spark, sf).collect()
    refs.length shouldBe 6
    refs.foreach { r =>
      r.getLong(2) shouldBe 0L
      r.getBoolean(3) shouldBe true
    }
  }
}
