package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  // --- topKPerGroup (K1) ----------------------------------------------------

  test("topKPerGroup keeps k rows per group with deterministic tiebreak") {
    val df = Seq(
      ("g1", "a", 5L), ("g1", "b", 5L), ("g1", "c", 4L), ("g1", "d", 3L),
      ("g2", "x", 1L)
    ).toDF("g", "name", "cnt")
    val top2 = Relational.topKPerGroup(
      df, Seq(col("g")), Seq(col("cnt").desc, col("name").asc), 2)
    rows(top2.orderBy("g", "name")) shouldBe Seq(
      Seq("g1", "a", 5L), Seq("g1", "b", 5L), Seq("g2", "x", 1L))
  }

  // --- withDistributedNtile -------------------------------------------------

  test("withDistributedNtile matches the global ntile window bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    // Sizes straddling the bucket-remainder cases: n % b = 0, 1, b-1, and
    // n < b (each row its own bucket). Values deliberately collide so the
    // id tiebreak is load-bearing.
    for (n <- Seq(1, 3, 4, 5, 6, 23, 40, 101); b <- Seq(2, 5, 7)) {
      val df = (0 until n)
        .map(i => (i.toLong, (i * 37 % 11).toLong))
        .toDF("id", "v")
        .repartition(4)
      val order = Seq(col("v").asc, col("id").asc)
      val expected = df
        .withColumn("t", ntile(b).over(Window.orderBy(order: _*)))
        .orderBy("id").select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1)))
      // default path (single-partition fast path at this size) AND the
      // forced multi-partition offsets path must both match the window
      val got = Relational.withDistributedNtile(df, b, "t", order)
        .orderBy("id").select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1)))
      withClue(s"n=$n b=$b: ") { got.toSeq shouldBe expected.toSeq }
      val gotWide = Relational.withDistributedNtileSized(df, b, "t", order, 7L)
        .orderBy("id").select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1)))
      withClue(s"n=$n b=$b (multi-partition): ") { gotWide.toSeq shouldBe expected.toSeq }
    }
  }

  test("withDistributedNtile plan has no un-partitioned WindowExec") {
    val df = (0 until 50).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val out = Relational.withDistributedNtile(df, 5, "t",
      Seq(col("v").desc, col("id").asc))
    val plan = out.queryExecution.executedPlan
    val badWindows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    badWindows shouldBe empty
  }

  test("withDistributedNtile preserves caller columns named like helpers") {
    // freshName must sidestep collisions with the helper column names.
    val df = Seq((1L, 10L, "x"), (2L, 5L, "y"), (3L, 5L, "z"))
      .toDF("id", "nt_rank", "nt_p")
    val out = Relational.withDistributedNtile(df, 2, "bucket",
      Seq(col("nt_rank").asc, col("id").asc))
    out.columns.toSet shouldBe Set("id", "nt_rank", "nt_p", "bucket")
    out.orderBy("id").select("bucket").collect().map(_.getInt(0)).toSeq shouldBe
      Seq(2, 1, 1) // order by nt_rank asc,id: ids 2,3,1 → buckets 1,1,2
  }

  // --- MinKDistinctAggregator ----------------------------------------------

  test("minKDistinct keeps the k smallest distinct values with O(k) state") {
    val minK = udaf(new graft.ops.MinKDistinctAggregator(3))
    val df = Seq(("g", 5L), ("g", 1L), ("g", 5L), ("g", 9L), ("g", 2L),
      ("g", 1L), ("g", 7L), ("h", 4L)).toDF("g", "v")
    val out = df.groupBy("g").agg(minK(col("v")).as("mins")).orderBy("g")
      .collect().map(r => (r.getString(0), r.getSeq[Long](1).toList)).toList
    out shouldBe List(("g", List(1L, 2L, 5L)), ("h", List(4L)))
  }

  test("misra-gries: items above N/(k+1) always survive the sketch, state stays <= k") {
    val agg = new graft.ops.MisraGriesAggregator(3)
    // Adversarial stream: 'hot' has 40 of 100 items (> 100/4 = 25), the
    // rest is 60 distinct singletons that constantly evict counters.
    val stream = scala.util.Random.shuffle(
      (Seq.fill(40)("hot") ++ (1 to 60).map(i => s"cold$i")).toList)
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    buf.size should be <= 3
    buf.keySet should contain ("hot")
    // estimate undercounts by at most N/(k+1)
    buf("hot") should be >= 40L - 25L
    // mergeable form preserves the guarantee across partial aggregation
    val (l, r) = stream.splitAt(stream.length / 2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    merged.size should be <= 3
    merged.keySet should contain ("hot")
  }

  test("heavy-hitters query equals the exact HAVING aggregation") {
    val dir = "/root/testdata/sf0.001"
    val screened = rows(graft.extensions.TextAnalysis.textHeavyHitters(spark, dir))
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(explode(graft.functions.Portable.tokens(col("text"))).as("term"))
    val total = toks.count()
    val exact = rows(
      toks.groupBy("term").agg(count(lit(1)).as("n"))
        .filter(col("n") > total.toDouble / graft.extensions.TextAnalysis.HeavyHitterK)
        .orderBy(col("n").desc, col("term").asc))
    screened shouldBe exact
    screened should not be empty
  }

  // --- upsert / latestByKey -------------------------------------------------

  test("upsert: updates win on collision, unmatched pass through, new keys insert") {
    val target = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 99), (4L, "d", 40)).toDF("k", "name", "v")
    rows(Relational.upsert(target, updates, Seq("k")).orderBy("k")) shouldBe Seq(
      Seq(1L, "a", 10), Seq(2L, "b2", 99), Seq(3L, "c", 30), Seq(4L, "d", 40))
  }

  test("latestByKey keeps the single newest row per key") {
    val df = Seq((1L, 5L, "old"), (1L, 9L, "new"), (2L, 3L, "only"))
      .toDF("k", "t", "tag")
    rows(Relational.latestByKey(df, Seq(col("k")),
      Seq(col("t").desc)).orderBy("k")) shouldBe Seq(
      Seq(1L, 9L, "new"), Seq(2L, 3L, "only"))
  }

  // --- argMaxPerGroup (A5, Q5 fixed) ---------------------------------------

  test("argMaxPerGroup keeps all rows tied for the group max") {
    val df = Seq(
      ("v1", "t1", 3), ("v1", "t2", 3), ("v1", "t3", 2),
      ("v2", "t4", 1)
    ).toDF("v", "t", "n")
    val r = Relational.argMaxPerGroup(df, Seq(col("v")), col("n"))
    rows(r.orderBy("v", "t")) shouldBe Seq(
      Seq("v1", "t1", 3), Seq("v1", "t2", 3), Seq("v2", "t4", 1))
  }

  // --- sortedStringAgg (A4) -------------------------------------------------

  test("sortedStringAgg is order-deterministic") {
    val df = Seq(("v", "b"), ("v", "a"), ("v", "c")).toDF("v", "t")
    rows(df.groupBy("v").agg(Relational.sortedStringAgg(col("t"), "|"))) shouldBe
      Seq(Seq("v", "a|b|c"))
  }

  // --- longestConsecutiveRun (A3, Q3) --------------------------------------

  private def runOf(xs: Seq[Int], strict: Boolean = false): Int =
    Seq(Tuple1(xs)).toDF("ys")
      .select(Relational.longestConsecutiveRun(col("ys"), strict).as("r"))
      .collect()(0).getInt(0)

  test("longestConsecutiveRun: duplicates deduped (intended Q3 semantics)") {
    runOf(Seq(2000, 2001, 2001, 2002)) shouldBe 3
  }

  test("longestConsecutiveRun: strict mode replicates reference's dup-reset bug") {
    runOf(Seq(2000, 2001, 2001, 2002), strict = true) shouldBe 2
  }

  test("longestConsecutiveRun edge cases") {
    runOf(Seq.empty) shouldBe 0
    runOf(Seq(7)) shouldBe 1
    runOf(Seq(1, 3, 5)) shouldBe 1
    runOf(Seq(10, 11, 12, 14, 15)) shouldBe 3
  }

  test("longestConsecutiveRun properties: permutation-invariant, bounded by span, exact on ranges") {
    // Property check batched into one Spark job: 60 random year-lists, each
    // paired with a shuffled copy and (for ranges) a perfect [a, a+n) range.
    val rnd = new scala.util.Random(42)
    val cases = (1 to 60).map { _ =>
      val ys = List.fill(1 + rnd.nextInt(12))(1990 + rnd.nextInt(16))
      val n = 1 + rnd.nextInt(15)
      (ys, rnd.shuffle(ys), ys.max - ys.min + 1, (100 until 100 + n).toList, n)
    }
    val df = cases.toDF("ys", "shuffled", "span", "range", "n")
      .select(
        Relational.longestConsecutiveRun(col("ys")).as("r1"),
        Relational.longestConsecutiveRun(col("shuffled")).as("r2"),
        col("span"),
        Relational.longestConsecutiveRun(col("range")).as("rr"),
        col("n"))
    df.collect().foreach { row =>
      val (r1, r2, span, rr, n) =
        (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4))
      r1 shouldBe r2          // permutation invariance
      r1 should be <= span    // bounded by value span
      r1 should be >= 1
      rr shouldBe n           // exact on a perfect range
    }
  }

  test("topKPerGroup is the k-prefix of the per-group full sort (property)") {
    val rnd = new scala.util.Random(5)
    val data = (1 to 400).map { i =>
      (s"g${rnd.nextInt(6)}", s"n$i", rnd.nextInt(20).toLong)
    }
    val df = data.toDF("g", "name", "cnt")
    val k = 3
    val got = Relational
      .topKPerGroup(df, Seq(col("g")), Seq(col("cnt").desc, col("name").asc), k)
      .as[(String, String, Long)].collect().toSet
    val expected = data.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(k)
    }.toSet
    got shouldBe expected
  }

  test("LongestRunAggregator UDAF agrees with both formulations, incl. from SQL") {
    spark.udf.register("longest_run", udaf(graft.ops.LongestRunAggregator))
    val data = Seq(("a", 2000), ("a", 2001), ("a", 2001), ("a", 2003),
      ("b", 1999), ("c", 1990), ("c", 1991), ("c", 1992))
    data.toDF("k", "v").createOrReplaceTempView("runs_in")
    val viaUdaf = spark.sql(
      "SELECT k, longest_run(v) AS r FROM runs_in GROUP BY k ORDER BY k")
      .as[(String, Int)].collect().toSeq
    viaUdaf shouldBe Seq(("a", 2), ("b", 1), ("c", 3))
    val viaIslands = Relational
      .longestRunPerKey(data.toDF("k", "v"), col("k"), col("v"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    viaIslands shouldBe viaUdaf.map { case (k, r) => (k, r.toLong) }
  }

  test("longestRunPerKey agrees with the array-based formulation") {
    val data = Seq(
      ("a", 2000), ("a", 2001), ("a", 2001), ("a", 2003), ("a", 2004), ("a", 2005),
      ("b", 1999), ("c", 1990), ("c", 1992), ("c", 1993))
    val df = data.toDF("k", "v")
    val viaIslands = Relational.longestRunPerKey(df, col("k"), col("v"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    val viaArray = df.groupBy("k")
      .agg(Relational.longestConsecutiveRun(collect_list(col("v"))).as("r"))
      .orderBy("k").as[(String, Int)].collect().toSeq.map { case (k, r) => (k, r.toLong) }
    viaIslands shouldBe viaArray
    viaIslands shouldBe Seq(("a", 3L), ("b", 1L), ("c", 2L))
  }

  test("longestRunPerKeyStrict ≡ strict array walk on random duplicate-heavy data") {
    // 60 keys × up to 12 values from a narrow range → plenty of duplicates
    // AND phantom-island shapes like [1,2,4,4,5] (where a naive v−row_number
    // island id would fuse two runs across a duplicate).
    val rnd = new scala.util.Random(11)
    val data = (0 until 60).flatMap { k =>
      (0 to rnd.nextInt(12)).map(_ => (s"k$k", 2000 + rnd.nextInt(8)))
    }
    val df = data.toDF("k", "v")
    val viaWindows = Relational.longestRunPerKeyStrict(df, col("k"), col("v"))
      .orderBy("k").as[(String, Long)].collect().toSeq
    val viaArray = df.groupBy("k")
      .agg(Relational.longestConsecutiveRun(collect_list(col("v")),
        strictReference = true).as("r"))
      .orderBy("k").as[(String, Int)].collect().toSeq.map { case (k, r) => (k, r.toLong) }
    viaWindows shouldBe viaArray
  }

  test("topKPerGroup/argMaxPerGroup preserve a caller's own 'rk' column") {
    val df = Seq(("g", "caller-data", 3L), ("g", "other", 1L))
      .toDF("k", "rk", "cnt") // 'rk' is USER data, not ours to clobber
    val top = Relational.topKPerGroup(df, Seq(col("k")),
      Seq(col("cnt").desc, col("rk").asc), 1)
    top.columns.toSeq shouldBe Seq("k", "rk", "cnt")
    rows(top) shouldBe Seq(Seq("g", "caller-data", 3L))
    val am = Relational.argMaxPerGroup(df, Seq(col("k")), col("cnt"))
    am.columns.toSeq shouldBe Seq("k", "rk", "cnt")
    rows(am) shouldBe Seq(Seq("g", "caller-data", 3L))
  }

  test("strict vs intended differ exactly on duplicate-broken streaks") {
    val df = Seq(("a", 2000), ("a", 2000), ("a", 2001), // dup resets: strict 2... intended 2
      ("d", 2000), ("d", 2001), ("d", 2001), ("d", 2002)) // strict 2, intended 3
      .toDF("k", "v")
    Relational.longestRunPerKeyStrict(df, col("k"), col("v"))
      .orderBy("k").as[(String, Long)].collect().toSeq shouldBe
      Seq(("a", 2L), ("d", 2L))
    Relational.longestRunPerKey(df, col("k"), col("v"))
      .orderBy("k").as[(String, Long)].collect().toSeq shouldBe
      Seq(("a", 2L), ("d", 3L))
  }
}
