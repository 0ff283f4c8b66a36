package graft

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Physical-layout levers for 100 TB: bucketed co-located joins (no
  * exchange on the join key) and hive-partitioned pruning (scan touches
  * only matching directories). Asserted on the actual physical plans. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucketing co-locates both sides: the join itself needs no exchange
    // (the only exchange allowed is the final aggregation's, and even that
    // is avoided since grouping matches the bucket key)
    val joinSubtree = plan.split("HashAggregate").head
    joinSubtree should not include "Exchange"
    joined.count() shouldBe lineitem.select("l_orderkey").distinct().count()
  }

  test("pre-bucketed pubAuthors runs t5's window with no exchange below it") {
    val pa = graft.sources.Tables.materializePubAuthors(spark, sf,
      table = "pub_authors_b_test", buckets = 8)
    val t5 = graft.queries.DblpAnalog.t5TopCoauthorAuthorsFrom(pa)
    val plan = t5.queryExecution.executedPlan.toString
    // Printed parent-first: everything after the Window line is its subtree;
    // the bucketed scan must satisfy the window's pub_key distribution
    // directly (only the author-aggregation above it may exchange).
    plan should include ("Window")
    plan.substring(plan.lastIndexOf("Window")) should not include "Exchange"
    // and the bucketed path must be RESULT-identical to the per-query path
    rows(t5) shouldBe rows(graft.queries.DblpAnalog.t5TopCoauthorAuthors(spark, sf))
  }

  test("partitioned parquet scans prune to the filtered partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = graft.sources.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    Sinks.writeParquet(events, s"$out/events", partitionBy = Seq("event_type"))
    val read = spark.read.parquet(s"$out/events")
      .filter(col("event_type") === "click")
    val scan = read.queryExecution.executedPlan.toString
    scan should include ("PartitionFilters")
    scan should include ("event_type")
    read.select("event_type").distinct().as[String].collect().toSeq shouldBe Seq("click")
  }

  test("compact rewrites a many-file directory into evenly-sized few files") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    graft.sources.Tables.documents(spark, sf).repartition(20)
      .write.parquet(s"$base/in")
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    parts(s"$base/in") shouldBe 20
    val n = Sinks.compact(spark, s"$base/in", s"$base/out",
      targetBytes = 512L * 1024)
    parts(s"$base/out") shouldBe n
    n should be < 20
    // content-identical after the rewrite
    spark.read.parquet(s"$base/out").orderBy("doc_id").collect() shouldBe
      spark.read.parquet(s"$base/in").orderBy("doc_id").collect()
  }

  test("compactSorted clusters keys: output files cover disjoint ranges") {
    val base = java.nio.file.Files.createTempDirectory("graft-csort").toString
    graft.sources.Tables.documents(spark, sf).repartition(10)
      .write.parquet(s"$base/in")
    Sinks.compactSorted(spark, s"$base/in", s"$base/out", "doc_id",
      targetBytes = 16L * 1024)
    // per-file [min, max] of the cluster key must not overlap — the
    // property file-level min/max skipping rests on
    val files = new java.io.File(s"$base/out").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    files.length should be > 1
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("doc_id"), max("doc_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => hi should be < lo2
      case _ =>
    }
    // content identical
    spark.read.parquet(s"$base/out").orderBy("doc_id").collect() shouldBe
      spark.read.parquet(s"$base/in").orderBy("doc_id").collect()
  }

  test("AQE re-plans a sort-merge join to broadcast from runtime statistics") {
    // static planning must NOT see the small size (threshold off), the
    // adaptive re-optimization must (adaptive threshold on): the filtered
    // dimension's true size is only known at runtime — exactly the 100 TB
    // case of a selective dim filter the optimizer can't estimate.
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold").getOrElse(""),
      "spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin" ->
        spark.conf.getOption("spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin").getOrElse(""))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "8m")
      // a HANDFUL of rows spread over 32 shuffle partitions trips AQE's
      // empty-partition demotion heuristic and keeps the SMJ; this test
      // asserts the SIZE-based conversion, so pin the ratio gate open
      spark.conf.set("spark.sql.adaptive.nonEmptyPartitionRatioForBroadcastJoin", "0")
      val c = spark.read.parquet(s"$sf/customer.parquet")
        .filter(col("c_custkey") % 50 === 0) // tiny at runtime, opaque statically
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val j = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      j.collect() // run, so AQE finalizes
      val finalPlan = j.queryExecution.executedPlan.toString
      finalPlan should include ("BroadcastHashJoin")
    } finally prev.foreach { case (k, v) =>
      if (v.nonEmpty) spark.conf.set(k, v) else spark.conf.unset(k)
    }
  }

  test("ORC roundtrip preserves content and pushes filters to the scan") {
    val base = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    Sinks.writeOrc(docs, s"$base/docs")
    val back = spark.read.orc(s"$base/docs")
    back.orderBy("doc_id").collect() shouldBe docs.orderBy("doc_id").collect()
    // same pushdown contract as parquet
    val plan = back.filter(col("doc_id") === 7)
      .queryExecution.executedPlan.toString
    plan should include ("PushedFilters")
    plan should include regex "EqualTo\\(doc_id"
  }
}
