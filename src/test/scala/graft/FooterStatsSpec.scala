package graft

import org.apache.spark.sql.functions._

import graft.sources.{Lake, LakeTable}

/** The footer-derived write statistics (r18 optimization: a commit reads
  * file FOOTERS instead of re-scanning every byte it just wrote) must be
  * BIT-IDENTICAL to the scan-based aggregation they replace — file
  * pruning trusts these bounds, so "close" is corrupt. The spec writes
  * the same mixed-type batch through both paths (the scan path forced via
  * the `spark.graft.lake.footerStats=false` kill switch) and compares
  * every manifested stat field by clustered file position. */
class FooterStatsSpec extends SparkTestBase {

  private def entriesOf(root: String) = {
    val t = new LakeTable(spark, root)
    // file NAMES are random UUIDs, so order by content: the stats
    // multiset is what must match between the two paths
    t.manifest(t.latestVersion).files
      .map(f => (f.rows, f.minKey, f.maxKey,
        f.cols.toSeq.sortBy(_._1), f.scols.toSeq.sortBy(_._1),
        f.nulls.toSeq.sortBy(_._1)))
      .sortBy(e => (e._2, e._3, e._1, e._4.toString))
  }

  private def mixedBatch = {
    import spark.implicits._
    spark.range(0, 1000).select(
      col("id").as("k"),
      (col("id") % 7).cast("int").as("small"),
      when(col("id") % 5 === 0, lit(null))
        .otherwise(concat(lit("name-"), lpad(col("id").cast("string"), 6, "0")))
        .as("s"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") % 300).cast("int")).as("d"),
      timestamp_micros(col("id") * 1000000L + 123L).as("ts"),
      when(col("id") % 11 === 0, lit(null)).otherwise(col("id") * 3L)
        .as("n"))
  }

  test("footer stats equal scan stats on a mixed-type keyed table") {
    val rootF = Lake.freshRoot()
    val rootS = Lake.freshRoot()
    val df = mixedBatch
    val stats = Seq("small", "s", "d", "ts", "n")
    Lake.create(spark, rootF, df, "k", 4, statsCols = stats)
    spark.conf.set("spark.graft.lake.footerStats", "false")
    try Lake.create(spark, rootS, df, "k", 4, statsCols = stats)
    finally spark.conf.unset("spark.graft.lake.footerStats")
    entriesOf(rootF) shouldBe entriesOf(rootS)
  }

  test("footer stats equal scan stats on a string-keyed table") {
    val rootF = Lake.freshRoot()
    val rootS = Lake.freshRoot()
    import spark.implicits._
    // keys sharing long prefixes exercise the 8-byte embedding; a few
    // exceed StrBoundLen to exercise the truncated-ceiling convention
    val df = spark.range(0, 500).select(
      concat(lit("tenant-widgets-"), lpad(col("id").cast("string"), 8, "0"))
        .as("k"),
      col("id").as("v"))
    Lake.create(spark, rootF, df, "k", 3, statsCols = Seq("v"))
    spark.conf.set("spark.graft.lake.footerStats", "false")
    try Lake.create(spark, rootS, df, "k", 3, statsCols = Seq("v"))
    finally spark.conf.unset("spark.graft.lake.footerStats")
    entriesOf(rootF) shouldBe entriesOf(rootS)
  }

  test("merge through the footer path folds identically to the scan path") {
    import spark.implicits._
    def build(root: String): Unit = {
      val df = mixedBatch
      Lake.create(spark, root, df, "k", 4, statsCols = Seq("s", "n"))
      val t = new LakeTable(spark, root)
      t.merge(df.filter(col("k") % 10 === 3)
        .withColumn("n", col("n") + 1000L))
      t.deleteWhere(col("k") % 17 === 0)
    }
    val rootF = Lake.freshRoot()
    val rootS = Lake.freshRoot()
    build(rootF)
    spark.conf.set("spark.graft.lake.footerStats", "false")
    try build(rootS)
    finally spark.conf.unset("spark.graft.lake.footerStats")
    entriesOf(rootF) shouldBe entriesOf(rootS)
    val (a, b) = (new LakeTable(spark, rootF).read(),
      new LakeTable(spark, rootS).read())
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }
}
