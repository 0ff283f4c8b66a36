package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Unit-level checks for the text/dedup primitives on hand-built fixtures
  * (the oracle gate covers the full queries; these pin the building blocks). */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens: whitespace split with empty-text guard") {
    val df = Seq("a  b\tc", "  ", "solo").toDF("text")
      .select(Portable.tokens(col("text")).as("t"))
    df.as[Seq[String]].collect().toSeq shouldBe
      Seq(Seq("a", "b", "c"), Seq.empty, Seq("solo"))
  }

  test("stupid-backoff LM: scored set, per-doc arity, and score bounds") {
    import graft.extensions.TextAnalysis
    val sf = "/root/testdata/sf0.001"
    val out = TextAnalysis.textLmStupidBackoff(spark, sf)
      .as[(Long, Long, Double)].collect()
    out should not be empty
    // exactly the score-split docs with >= 3 tokens are scored, and each
    // doc scores every trigram position: n_trigrams = n_tokens - 2
    val expected = graft.sources.Tables.documents(spark, sf)
      .withColumn("toks", Portable.tokens(col("text")))
      .select(col("doc_id"),
        (Portable.hash60(col("doc_id").cast("string")) % 100).as("b"),
        org.apache.spark.sql.functions.size(col("toks")).as("n"))
      .filter(col("b") >= 90 && col("n") >= 3)
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> (r._3.toLong - 2)).toMap
    out.map(r => r._1 -> r._2).toMap shouldBe expected
    // every backoff tier emits a probability <= 1: S3 = c3/c2ctx <= 1
    // (each trigram instance carries its prefix-bigram instance),
    // S2 <= 0.4, floor < 1 — so the mean ln is strictly negative
    for ((doc, _, lp) <- out) withClue(s"$doc: ") { lp should be < 0.0 }
  }

  test("LM builders are lazy: construction runs ZERO jobs, the first action computes") {
    import graft.extensions.TextAnalysis
    val sf = "/root/testdata/sf0.001"
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val bg = TextAnalysis.textBigramLogprob(spark, sf)
      val lm = TextAnalysis.textLmStupidBackoff(spark, sf)
      bg.schema.fieldNames.toSeq shouldBe
        Seq("doc_id", "n_bigrams", "avg_logprob")
      lm.schema.fieldNames.toSeq shouldBe
        Seq("doc_id", "n_trigrams", "avg_logprob")
      Thread.sleep(500) // let any stray job-start event reach the bus
      jobs shouldBe 0 // the size-gate probe did NOT run at construction
      bg.limit(1).collect() // first action: probe + gate + scoring run now
      jobs should be > 0
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("LM broadcast hints are size-gated: over-budget models shuffle, same result") {
    import graft.extensions.TextAnalysis
    val sf = "/root/testdata/sf0.001"
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // under the default budget the model joins broadcast (closed corpus)
    val smallPlan = planOf(TextAnalysis.textLmStupidBackoff(spark, sf))
    smallPlan should include("BroadcastHashJoin")
    val baseline = TextAnalysis.textLmStupidBackoff(spark, sf).collect().toSeq
    // force every model over budget: the hints must be WITHHELD and the
    // scoring joins degrade to shuffle equi-joins — the open-corpus
    // shape — with a bit-identical result. The auto-broadcast threshold
    // goes to -1 too: at sf0.001 Spark's own size estimate would still
    // broadcast the tiny model, masking whether a hint is welded in —
    // with BOTH off, any remaining BroadcastHashJoin IS a welded hint.
    spark.conf.set("spark.graft.lm.broadcastMaxTypes", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = TextAnalysis.textLmStupidBackoff(spark, sf)
      val bigPlan = planOf(big)
      (bigPlan.contains("SortMergeJoin") ||
        bigPlan.contains("ShuffledHashJoin")) shouldBe true
      // the only broadcast left is the two-scalar totals cross join
      bigPlan should not include "BroadcastHashJoin"
      big.collect().toSeq shouldBe baseline
      // the bigram scorer degrades the same way
      val bg = TextAnalysis.textBigramLogprob(spark, sf)
      planOf(bg) should not include "BroadcastHashJoin"
    } finally {
      spark.conf.unset("spark.graft.lm.broadcastMaxTypes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("k-suppression: every RELEASED class reaches k; accounting balances") {
    import graft.extensions.Privacy
    val sf = "/root/testdata/sf0.001"
    val out = Privacy.privacyKSuppression(spark, sf)
      .as[(String, String, Long, String)].collect()
    // the k-anonymity guarantee holds on everything released
    for ((seg, nation, n, status) <- out if status != "suppressed")
      withClue(s"($seg, $nation, $status): ") {
        n should be >= Privacy.KAnonymity.toLong
      }
    // nothing vanishes: ok + generalized + suppressed counts = table rows
    val total = graft.sources.Tables.customer(spark, sf).count()
    out.map(_._3).sum shouldBe total
    // the release acts on exactly the audit's below-k cells
    val audit = Privacy.privacyKAnonymity(spark, sf)
      .select("c_mktsegment", "n_customers", "risk")
      .as[(String, Long, String)].collect()
    val belowK = audit.filter(_._3 != "ok").groupBy(_._1).view.mapValues(_.map(_._2).sum)
    for ((seg, n) <- belowK) {
      val row = out.find(r => r._1 == seg && (r._4 == "generalized" || r._4 == "suppressed"))
      withClue(s"segment $seg below-k remainder: ") {
        row.map(_._3) shouldBe Some(n)
      }
    }
  }

  test("shingles3: distinct sliding 3-grams, short docs yield none") {
    val df = Seq("a b c d", "a b", "x x x x x").toDF("text")
      .select(Portable.tokens(col("text")).as("tk"))
      .select(Portable.shingles3(col("tk")).as("s"))
    df.as[Seq[String]].collect().toSeq shouldBe Seq(
      Seq("a b c", "b c d"), Seq.empty, Seq("x x x")) // distinct dedupes repeats
  }

  test("hash60 matches the DuckDB formulation on a known value") {
    // duckdb: SELECT ('0x'||substr(md5('hello'),1,15))::BIGINT -> 419982666956583591
    Seq("hello").toDF("s").select(Portable.hash60(col("s")))
      .as[Long].collect()(0) shouldBe 419982666956583591L
  }

  test("cosine6 on orthogonal and identical vectors") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0))
    ).toDF("a", "b")
      .select(Portable.cosine6(col("a"), col("b"),
        Portable.l2norm(col("a")), Portable.l2norm(col("b"))).as("c"))
    df.as[Double].collect().toSeq shouldBe Seq(0.0, 1.0)
  }

  test("batch sessionization groups events by 30-minute gaps") {
    // Build a tiny events table through the same operator as the oracle query.
    import graft.extensions.Events
    val base = 1700000000000000L // epoch micros
    val evs = Seq(
      // user 1: events at 0, 10, 20 min (one session), then 120 min (second)
      (1L, base, 1L), (2L, base + 10L * 60000000L, 1L),
      (3L, base + 20L * 60000000L, 1L), (4L, base + 120L * 60000000L, 1L),
      // user 2: single event
      (5L, base, 2L))
      .toDF("event_id", "us", "user_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft-events").toString
    // events table layout: ts arrives as int64 nanos (Tables.events divides
    // back to micros); emulate by writing micros*1000 as a long column.
    evs.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        lit("click").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Events.eventsSessions(spark, tmp)
      .as[(Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq((1L, 2L, 3L, 4L), (2L, 1L, 1L, 1L))
  }

  test("range frame: the change-log form equals the sliding-frame form exactly") {
    // same relation from two plans: the O(n x frame) sliding RANGE window
    // and its linear arrive/expire change-log twin — including timestamp
    // peers, which RANGE semantics admit as a group on both paths
    import graft.extensions.Events
    val sf = "/root/testdata/sf0.001"
    val slide = Events.eventsRangeFrame(spark, sf).collect().toSeq
    val chlog = Events.eventsRangeFrameScalable(spark, sf).collect().toSeq
    chlog.size shouldBe slide.size
    chlog shouldBe slide
  }

  test("EWMA: constant series stays constant; warm-up renormalizes exactly") {
    import graft.extensions.Events
    val base = 1700000000000000L
    val evs =
      // user 1: values 1, 2, 4 a minute apart → hand-computed EWMA
      Seq((1L, base, 1L, 1.0), (2L, base + 60000000L, 1L, 2.0),
        (3L, base + 120000000L, 1L, 4.0)) ++
      // user 2: constant 5.0 → EWMA must be exactly 5.0 at every row
      (0 until 10).map(i => (10L + i, base + i * 60000000L, 2L, 5.0))
    val tmp = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    evs.toDF("event_id", "us", "user_id", "value")
      .select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        lit("click").as("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Events.eventsEwma(spark, tmp)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    out(1L) shouldBe 1.0
    out(2L) shouldBe 1.666667 // (2 + 0.5·1) / 1.5
    out(3L) shouldBe 3.0      // (4 + 0.5·2 + 0.25·1) / 1.75
    for (i <- 0 until 10) out(10L + i) shouldBe 5.0
  }

  test("transitions: per-user consecutive bigrams, counted globally") {
    import graft.extensions.Events
    val base = 1700000000000000L
    val evs = Seq(
      (1L, base, 1L, "view"), (2L, base + 1L, 1L, "click"),
      (3L, base + 2L, 1L, "purchase"), (4L, base + 3L, 1L, "click"),
      (5L, base, 2L, "view"), (6L, base + 1L, 2L, "click"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-trans").toString
    evs.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Events.eventsTransitions(spark, tmp)
      .as[(String, String, Long)].collect().toSeq
    out shouldBe Seq(
      ("view", "click", 2L), ("click", "purchase", 1L), ("purchase", "click", 1L))
  }

  test("native session_window: per-session rows; exact-gap merges, over-gap splits") {
    import graft.extensions.Events
    val base = 1700000000000000L // epoch micros
    val min = 60000000L
    val evs = Seq(
      // user 1: 0, +10 min, then EXACTLY 30 min after the last event —
      // sessions merge while next_ts <= window end, so this still MERGES;
      // then +31 min after that, which splits.
      (1L, base, 1L), (2L, base + 10 * min, 1L), (3L, base + 40 * min, 1L),
      (6L, base + 71 * min, 1L),
      // user 2: 29-minute gap stays one session
      (4L, base, 2L), (5L, base + 29 * min, 2L))
      .toDF("event_id", "us", "user_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft-sesswin").toString
    evs.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        lit("click").as("event_type"), lit(2.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Events.eventsSessionWindow(spark, tmp)
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      (1L, base, base + 70 * min, 3L),                     // exact-gap merged
      (1L, base + 71 * min, base + 101 * min, 1L),         // 31-min gap split
      (2L, base, base + 59 * min, 2L))                     // 29-min gap merged
  }

  test("funnel stages require the view→click→purchase ORDER, not mere presence") {
    import graft.extensions.Events
    val base = 1700000000000000L // epoch micros (before the funnel's cutoff)
    def m(min: Long) = base + min * 60000000L
    val evs = Seq(
      // user 1: click BEFORE any view must not count; the later click does
      (1L, m(0), 1L, "click"), (2L, m(10), 1L, "view"),
      (3L, m(20), 1L, "click"), (4L, m(30), 1L, "purchase"),
      // user 2: purchase precedes the view → no ordered click/purchase
      (5L, m(0), 2L, "purchase"), (6L, m(10), 2L, "view"),
      // user 3: never views
      (7L, m(0), 3L, "error"))
      .toDF("event_id", "us", "user_id", "event_type")
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    evs.select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Events.eventsFunnel(spark, tmp)
      .select("user_id", "stage").as[(Long, String)].collect().toSeq
    out shouldBe Seq((1L, "purchase"), (2L, "view"), (3L, "none"))
    // and the ordered first_click is the click AFTER the view, not the first
    val fc = Events.eventsFunnel(spark, tmp)
      .where("user_id = 1").select("first_click")
      .collect()(0).getTimestamp(0).getTime
    fc shouldBe m(20) / 1000L
  }

  test("outlier detectors: degenerate groups (sd=0 / mad=0) emit no rows, not NaN/Inf") {
    import graft.extensions.Events
    val base = 1700000000000000L
    // 'flat': all values identical → sd = 0 AND mad = 0.
    // 'halfflat': >50% of values equal the median → mad = 0 but sd > 0.
    // 'varied': normal group with one extreme value.
    val rows =
      (1L to 6L).map(i => (i, "flat", 5.0)) ++
      (11L to 16L).map(i => (i, "halfflat", if (i <= 14) 10.0 else 10.0 + i)) ++
      (21L to 28L).map(i => (i, "varied", if (i == 28) 1e6 else i.toDouble))
    val tmp = java.nio.file.Files.createTempDirectory("graft-outliers").toString
    rows.toDF("event_id", "event_type", "value")
      .select(col("event_id"), (lit(base) * 1000).as("ts"), lit(1L).as("user_id"),
        col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val mad = Events.eventsMadOutliers(spark, tmp)
      .select("event_type", "mz").as[(String, Double)].collect().toSeq
    mad.map(_._1).toSet should not contain "flat"
    mad.map(_._1).toSet should not contain "halfflat" // mad=0 despite sd>0
    all(mad.map(_._2)) should (not be Double.NaN and not be Double.PositiveInfinity)
    val z = Events.eventsZscoreOutliers(spark, tmp)
      .select("event_type", "z").as[(String, Double)].collect().toSeq
    z.map(_._1).toSet should not contain "flat"
    all(z.map(_._2)) should (not be Double.NaN and not be Double.PositiveInfinity)
  }

  test("BPE merges: hand-computed fixture, boundary-exact multi-char merging") {
    // vocab: abab x2, ab x3, ba x1
    // round 1 pairs: (a,b) = 2*2 + 3 = 7, (b,a) = 2 + 1 = 3 -> merge (a,b,7)
    //   abab -> <ab><ab>, ab -> <ab>, ba stays <b><a>
    // round 2 pairs: (ab,ab) = 2, (b,a) = 1 -> merge (ab,ab,2)
    //   NOTE a naive space-separated encoding would also corrupt "ba" here;
    //   the <sym> wrapping keeps (b,a) intact and un-merged.
    val words = Seq(("abab", 2L), ("ab", 3L), ("ba", 1L)).toDF("word", "freq")
    val m = graft.extensions.TextAnalysis.bpeMergesFromWords(words, 2)
      .as[(Int, String, String, Long)].collect().toSeq
    m shouldBe Seq((1, "a", "b", 7L), (2, "ab", "ab", 2L))
  }

  test("as-of tolerance: boundary match kept, one-micro staler dropped") {
    import graft.extensions.Events
    val base = 1700000000000000L
    val tol = Events.AsofToleranceUs
    val evs = Seq(
      // user 1: click exactly `tol` micros before the purchase → fresh
      (1L, base, 1L, "click"), (2L, base + tol, 1L, "purchase"),
      // user 2: click tol+1 micros before → match discarded as stale
      (3L, base, 2L, "click"), (4L, base + tol + 1L, 2L, "purchase"),
      // user 3: purchase with no click at all
      (5L, base, 3L, "purchase"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof-tol").toString
    evs.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Events.eventsAsofTolerance(spark, tmp)
      .select("event_id", "prev_click_ts", "fresh")
      .collect().map(r => (r.getLong(0), r.get(1) == null, r.getBoolean(2))).toSeq
    out shouldBe Seq((2L, false, true), (4L, true, false), (5L, true, false))
  }

  test("vocab coverage: partial top-k share, clamp at the full vocabulary") {
    import graft.extensions.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft-cov").toString
    Seq((0L, "a a a a b b c c d e f"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.textVocabCoverage(spark, tmp)
      .as[(Int, Long, Double)].collect().toSeq
    // counts a4 b2 c2 d1 e1 f1, total 11, 6 types: top-5 covers 10/11
    out shouldBe Seq(
      (5, 5L, 0.909091), (10, 6L, 1.0), (20, 6L, 1.0), (50, 6L, 1.0))
  }

  test("quality classifier: hand-computed logit, keep == rounded score >= 0.5") {
    import graft.extensions.TextAnalysis
    val tmp = java.nio.file.Files.createTempDirectory("graft-clf").toString
    Seq((0L, "a a a a b b c c d e f"), (1L, "!!! ??? ..."))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.textQualityClassifier(spark, tmp)
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq
    // doc 0: stop_ratio 4/11, punct 0, 11 tokens
    val logit0 = BigDecimal(-1.0 + 3.0 * 0.363636 + 2.0 * 0.11)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val score0 = BigDecimal(1.0 / (1.0 + math.exp(-logit0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out(0) shouldBe ((0L, logit0, score0, score0 >= 0.5))
    // doc 1: pure punctuation → punct_ratio ~0.818182, deeply negative logit
    out(1)._4 shouldBe false
    out.foreach { case (_, _, s, keep) => keep shouldBe (s >= 0.5) }
  }

  test("sliding DAU: 7-day trailing distinct users, hand-computed fixture") {
    import graft.extensions.Events
    def day(d: Int): Long = // midnight UTC of 2023-11-<d>, micros
      java.time.LocalDate.of(2023, 11, d).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    // user 1 active on days 1 and 5 (twice on day 1 — distinct collapses);
    // user 2 active on day 5; day 9 has user 1 again (day 1 falls out of
    // the [3..9] trailing window, day 5 stays in).
    val evs = Seq(
      (1L, day(1), 1L), (2L, day(1) + 1L, 1L), (3L, day(5), 1L),
      (4L, day(5), 2L), (5L, day(9), 1L))
    val tmp = java.nio.file.Files.createTempDirectory("graft-dau").toString
    evs.toDF("event_id", "us", "user_id")
      .select(col("event_id"), (col("us") * 1000).as("ts"), col("user_id"),
        lit("click").as("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Events.eventsSlidingDau(spark, tmp)
      .select(col("window_end").cast("string"), col("dau_1d"), col("dau_7d"))
      .as[(String, Long, Long)].collect().toSeq
    out shouldBe Seq(
      ("2023-11-01", 1L, 1L),  // window [Oct26..Nov1]: user 1
      ("2023-11-05", 2L, 2L),  // window [Oct30..Nov5]: users 1, 2
      ("2023-11-09", 1L, 2L))  // window [Nov3..Nov9]: day-5 pair still inside
  }

  test("chunk overlap: window/stride geometry, short docs, empty docs dropped") {
    import graft.extensions.TextAnalysis
    val toks30 = (1 to 30).map(i => s"w$i")
    val docs = Seq(
      (1L, toks30.mkString(" ")), // 30 toks -> starts 0,12,24; sizes 16,16,6
      (2L, "only"),               // 1 tok  -> one chunk of 1
      (3L, "   "))                // empty  -> no chunks
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s").as("source"),
        org.apache.spark.sql.functions.length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.textChunkOverlap(spark, tmp)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        col("chunk_text"))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    out.map(r => (r._1, r._2, r._3, r._4)) shouldBe Seq(
      (1L, 0L, 0L, 16L), (1L, 1L, 12L, 16L), (1L, 2L, 24L, 6L),
      (2L, 0L, 0L, 1L))
    out(1)._5 shouldBe toks30.slice(12, 28).mkString(" ") // overlap window 12..27
    out(3)._5 shouldBe "only"
  }

  test("incremental agg: merge equals full recompute at every split point (monoid law)") {
    import graft.extensions.Events
    val dir = "/root/testdata/sf0.001"
    val full = Events.eventsIncrementalAggAt(spark, dir, Long.MaxValue)
      .collect().map(_.toSeq).toSeq // all-base degenerate = plain recompute
    for (split <- Seq(0L, 1L, 500L, 999999L))
      Events.eventsIncrementalAggAt(spark, dir, split)
        .collect().map(_.toSeq).toSeq shouldBe full
  }

  test("bootstrap CI is ordered and brackets the full mean") {
    val r = graft.queries.Tpch.qBootstrapCi(spark, "/root/testdata/sf0.001")
      .collect()(0)
    val (fullMean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    lo should be <= hi
    fullMean should (be >= lo and be <= hi)
  }

  test("corpus build: kept docs are unique per cluster; bins contiguous from 0") {
    import graft.extensions.TextAnalysis
    val out = TextAnalysis.pipelineCorpusBuild(spark, "/root/testdata/sf0.001")
      .collect()
    // dedup stage: at most one survivor per cluster
    out.groupBy(_.getLong(1)).values.foreach(_.length shouldBe 1)
    // packing stage: within each (split, source), bins start at 0 with no holes
    out.groupBy(r => (r.getString(3), r.getString(2))).values.foreach { g =>
      val bins = g.map(_.getLong(5)).distinct.sorted
      bins shouldBe (0L to bins.max)
    }
  }

  test("incremental corpus build equals the full recompute at EVERY split") {
    import graft.extensions.TextAnalysis
    val dir = "/root/testdata/sf0.001"
    val full = TextAnalysis.pipelineCorpusBuild(spark, dir)
      .collect().map(_.toSeq).toSeq
    // including the near-degenerate boundaries: a tiny base with almost
    // everything arriving, and a full base with a tiny arrival — cluster
    // contraction, relabeling, and the state merge must be exact at all
    // of them (doc_ids run 0..499)
    Seq(5L, 150L, 300L, 490L).foreach { split =>
      withClue(s"split=$split: ") {
        TextAnalysis.pipelineCorpusBuildIncrementalAt(spark, dir, split)
          .collect().map(_.toSeq).toSeq shouldBe full
      }
    }
  }

  test("incremental corpus: keyless feed discovery file-slices under caps") {
    // the corpus table is the KEYLESS append-log kind; an arriving crawl
    // batch is a pure-append commit, which the change-feed source must
    // still split file-wise under admission caps — an oversized crawl
    // drains as bounded micro-batches, never one unbounded batch
    import graft.sources.Lake
    val docsAll = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val t = Lake.createAppendLog(spark, Lake.freshRoot(),
      docsAll.filter(col("doc_id") < 300L), 4, statsCols = Seq("doc_id"))
    spark.conf.set("spark.graft.lake.targetFileRows", "50")
    try t.insertAll(docsAll.filter(col("doc_id") >= 300L))
    finally spark.conf.unset("spark.graft.lake.targetFileRows")
    val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> t.root, "startingVersion" -> "1",
        "maxFilesPerTrigger" -> "1"))
    var seen = Seq.empty[Long]
    var last: Option[org.apache.spark.sql.execution.streaming.Offset] = None
    var offers = 0
    var o = src.getOffset
    while (o.isDefined) {
      val b = org.apache.spark.sql.graft.StreamBridge
        .rewrapSourceBatch(src.getBatch(last, o.get))
      seen ++= b.select("doc_id").collect().map(_.getLong(0))
      last = o; offers += 1
      o = src.getOffset
    }
    offers should be > 1 // the append commit split file-wise
    seen.sorted shouldBe docsAll.filter(col("doc_id") >= 300L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
  }

  test("cluster split: every near-dup cluster lands whole in one split (no leakage)") {
    import graft.extensions.TextAnalysis
    val out = TextAnalysis.textClusterSplit(spark, "/root/testdata/sf0.001")
    // at least one non-singleton cluster, else the property is vacuous
    val multi = out.groupBy("cluster_id").count().filter(col("count") > 1).count()
    assert(multi > 0, "fixture has no near-dup cluster; leakage property vacuous")
    out.groupBy("cluster_id").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count() shouldBe 0L
  }
}
