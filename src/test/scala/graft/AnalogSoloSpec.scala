package graft

import org.apache.spark.sql.functions._

import graft.queries.DblpAnalog

/** Planted micro star schema for the t6 analog twins: supplier S_SOLO supplies
  * only order 1 alone (never co-supplies), S_MIX supplies order 1's sibling
  * order 2 together with S_CO. Verifies the strict never-co-authored predicate
  * (vacuous at sf ≥ 0.01) and the solo-count ranking on the SAME fixture.
  */
class AnalogSoloSpec extends SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("analog-solo").toString
    Seq((1, "UK", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((1, "c1", 1)).toDF("c_custkey", "c_name", "c_nationkey")
      .write.parquet(s"$d/customer.parquet")
    Seq((10, "S_SOLO"), (20, "S_MIX"), (30, "S_CO"))
      .toDF("s_suppkey", "s_name").write.parquet(s"$d/supplier.parquet")
    Seq((1, 1, java.sql.Date.valueOf("1999-01-01")),
        (2, 1, java.sql.Date.valueOf("1999-02-01")),
        (3, 1, java.sql.Date.valueOf("1999-03-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    // order 1: S_SOLO alone; order 2: S_MIX + S_CO; order 3: S_MIX alone.
    Seq((1, 10), (2, 20), (2, 30), (3, 20))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("t6 strict: only the never-co-supplying supplier survives") {
    rows(DblpAnalog.t6StrictNeverCoauthored(spark, dir)) shouldBe
      Seq(Seq("S_SOLO", 1L))
  }

  test("t6 solo-count ranking counts solo pubs, keeps mixed authors") {
    // S_MIX has one solo pub (order 3) despite co-supplying order 2;
    // S_CO has none and is excluded by the solo_cnt >= 1 filter.
    rows(DblpAnalog.t6TopSoloAuthors(spark, dir)) shouldBe
      Seq(Seq("S_MIX", 1L), Seq("S_SOLO", 1L))
  }
}
