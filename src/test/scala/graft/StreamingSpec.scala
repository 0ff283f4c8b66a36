package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{Event, StreamingOps}

/** Minimal document row for the streaming contamination screen. */
case class StreamDoc(doc_id: Long, text: String)

/** Drives the streaming operators through MemoryStream micro-batches,
  * including watermark-driven session closure. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("hourlyByType aggregates tumbling windows per event type") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.hourlyByType(ms.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("update").start()
    try {
      ms.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(20), 2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("event_type", "n_events", "sum_value")
        .orderBy("event_type").collect().toSeq.map(_.toSeq)
      rows shouldBe Seq(Seq("click", 2L, 3.0), Seq("view", 1L, 5.0))
    } finally q.stop()
  }

  test("weekdayAnomalyScreen: replayed days match the batch anomaly query") {
    implicit val ctx = spark.sqlContext
    import graft.extensions.Events
    val sf = "/root/testdata/sf0.001"
    val daily = Events.weekdayDaily(spark, sf).localCheckpoint()
    val ms = MemoryStream[(String, java.sql.Date, Double)]
    val q = StreamingOps.weekdayAnomalyScreen(
        ms.toDF().toDF("event_type", "day", "dmean"), Events.weekdayBaseline(daily))
      .writeStream.format("memory").queryName("wkanom").outputMode("append").start()
    try {
      val rows = daily.select("event_type", "day", "dmean")
        .as[(String, java.sql.Date, Double)].collect()
      // replay across a micro-batch boundary: scoring is stateless per row,
      // so the split must not change the output set
      val (a, b) = rows.splitAt(rows.length / 2)
      ms.addData(a.toIndexedSeq: _*); q.processAllAvailable()
      ms.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.table("wkanom")
        .select("event_type", "day", "dmean", "mu", "sd", "z")
        .as[(String, java.sql.Date, Double, Double, Double, Double)].collect().toSet
      val want = Events.eventsWeekdayAnomaly(spark, sf)
        .as[(String, java.sql.Date, Double, Double, Double, Double)].collect().toSet
      want should not be empty
      got shouldBe want
    } finally q.stop()
  }

  test("mediaFingerprintScreen flags perceptual matches of known content") {
    implicit val ctx = spark.sqlContext
    import graft.extensions.{BmpImage, Codecs, MediaRecord, Multimodal}
    // known content: a BMP with +15 brightness headroom everywhere
    val base = BmpImage(6, 5, Array.tabulate(90)(j => 20 + (j * 2) % 200))
    val known = Seq(Multimodal.mediaFingerprint(Codecs.bmpEncode(base)).get).toDF("fp")
    val ms = MemoryStream[MediaRecord]
    val q = StreamingOps.mediaFingerprintScreen(ms.toDS(), known)
      .writeStream.format("memory").queryName("mediascreen").outputMode("append").start()
    try {
      // a brightness-shifted PNG RE-ENCODE: zero bytes in common with the
      // known BMP, but the perceptual fingerprint matches
      val shifted = Codecs.pngEncode(BmpImage(6, 5, base.rgb.map(_ + 15)))
      val other = Codecs.bmpEncode(BmpImage(4, 4,
        Array.tabulate(48)(j => (j * 53 + 7) % 256)))
      // a JPEG re-encode of the SAME known content (flat-chroma pixels
      // survive the lossy round trip within the above-mean pattern):
      // third container, still flags
      val asJpeg = Codecs.jpegEncode(base, Codecs.JpegColor444)
      ms.addData(
        MediaRecord(1L, "image/png", shifted),
        MediaRecord(2L, "image/bmp", other),
        MediaRecord(3L, "text/plain", "no container here".getBytes("UTF-8")),
        MediaRecord(4L, "image/jpeg", asJpeg))
      q.processAllAvailable()
      val rows = spark.table("mediascreen")
        .select("media_id", "flagged").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).toMap
      rows shouldBe Map(1L -> true, 2L -> false, 3L -> false, 4L -> true)
    } finally q.stop()
  }

  test("transitions: bigrams span micro-batch boundaries via per-user state") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.transitions(ms.toDS())
      .writeStream.format("memory").queryName("trans").outputMode("append").start()
    try {
      // batch 1: user 1 view→click; user 2 view (no bigram yet)
      ms.addData(
        Event(1, ts(0), 1, "view", 0), Event(2, ts(1), 1, "click", 0),
        Event(3, ts(0), 2, "view", 0))
      q.processAllAvailable()
      // batch 2: user 1 click→purchase (from state), user 2 view→click;
      // plus an out-of-order straggler behind user 1's state — dropped
      ms.addData(
        Event(4, ts(2), 1, "purchase", 0), Event(5, ts(1), 2, "click", 0),
        Event(0, ts(0), 1, "stale", 0))
      q.processAllAvailable()
      val got = spark.table("trans")
        .as[(Long, String, String)].collect().toSeq.sorted
      got shouldBe Seq(
        (1L, "click", "purchase"), (1L, "view", "click"), (2L, "view", "click"))
      // and the pair counts equal the batch operator's on the same in-order
      // event set (the straggler excluded — it never entered a bigram)
      val counts = spark.table("trans").groupBy("from_type", "to_type").count()
        .as[(String, String, Long)].collect().toSet
      counts shouldBe Set(("view", "click", 2L), ("click", "purchase", 1L))
    } finally q.stop()
  }

  test("dailyOhlc: open/close follow event time even when batches arrive out of order") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    // complete mode: the memory table always holds the CURRENT full state
    // (update mode would retain superseded per-batch rows in the sink)
    val q = StreamingOps.dailyOhlc(ms.toDF())
      .writeStream.format("memory").queryName("ohlc").outputMode("complete").start()
    try {
      // second micro-batch carries the EARLIEST event (the true open) and
      // the latest (the true close) — min_by/max_by state must reconcile;
      // minutes stay < 60 so the fixture never crosses a day boundary
      ms.addData(Event(2, ts(10), 1, "click", 7.0), Event(3, ts(20), 1, "click", 2.0))
      q.processAllAvailable()
      ms.addData(Event(1, ts(0), 1, "click", 4.0), Event(4, ts(30), 1, "click", 9.0))
      q.processAllAvailable()
      val r = spark.table("ohlc")
        .select("open", "high", "low", "close", "n_events", "volume")
        .collect().map(_.toSeq).toSeq
      r shouldBe Seq(Seq(4.0, 9.0, 2.0, 9.0, 4L, 22.0))
    } finally q.stop()
  }

  test("throttleStream keeps the first (user, type) arrival and drops re-fires") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.throttleStream(ms.toDF())
      .writeStream.format("memory").queryName("throttle").outputMode("append").start()
    try {
      ms.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),   // re-fire of (1, click) — dropped
        Event(3, ts(6), 1, "view", 3.0),    // new type — kept
        Event(4, ts(7), 2, "click", 4.0))   // new user — kept
      q.processAllAvailable()
      // cross-batch: state persists, so a later micro-batch re-fire drops too
      ms.addData(Event(5, ts(9), 1, "click", 5.0))
      q.processAllAvailable()
      spark.table("throttle").select("event_id")
        .as[Long].collect().toSeq.sorted shouldBe Seq(1L, 3L, 4L)
    } finally q.stop()
  }

  test("checkpoint recovery: per-user state survives a query restart") {
    implicit val ctx = spark.sqlContext
    // the memory sink refuses checkpoint recovery; the FILE sink is the
    // recovery-capable production shape (exactly-once via the file log)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-recover-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-recover-out").toString
    val ms = MemoryStream[Event]
    def start() = StreamingOps.transitions(ms.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try {
      ms.addData(Event(1, ts(0), 1, "view", 0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the SAME checkpoint: user 1's TransState (last = view)
    // must be restored, so the next event forms the cross-restart bigram
    val q2 = start()
    try {
      ms.addData(Event(2, ts(1), 1, "click", 0))
      q2.processAllAvailable()
      spark.read.parquet(out).as[(Long, String, String)].collect().toSet shouldBe
        Set((1L, "view", "click"))
    } finally q2.stop()
  }

  test("mergeIntoLake: streamed upserts survive a checkpoint restart exactly once") {
    implicit val ctx = spark.sqlContext
    val base = Seq((1L, "v1", "A"), (2L, "v2", "A"), (3L, "v3", "A"))
      .toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lakesink-ckpt").toString
    val ms = MemoryStream[(Long, String, String)]
    def start() = StreamingOps.mergeIntoLake(
      ms.toDF().toDF("k", "payload", "status"), table, ckpt)
    val q1 = start()
    try {
      ms.addData((2L, "UPD2", "U"), (9L, "INS9", "I"))
      q1.processAllAvailable()
    } finally q1.stop()
    table.read().count() shouldBe 4L
    // restart from the same checkpoint: committed epochs must not replay,
    // new data must merge
    val q2 = start()
    try {
      ms.addData((9L, "UPD9", "U"))
      q2.processAllAvailable()
    } finally q2.stop()
    rows(table.read().orderBy("k")) shouldBe Seq(
      Seq(1L, "v1", "A"), Seq(2L, "UPD2", "U"), Seq(3L, "v3", "A"),
      Seq(9L, "UPD9", "U"))
    // every committed epoch is visible in the transaction-log chain
    (0 to table.latestVersion).map(table.manifest(_).operation)
      .count(_.startsWith("merge-epoch-")) shouldBe 2
  }

  test("per-commit change feeds compose: a streamed MV consumer matches recompute") {
    // Downstream incremental-view maintenance driven by the streaming
    // MERGE sink: after each committed epoch, the consumer folds ONLY
    // changes(v-1, v) into its MV — never rescanning the table — and the
    // folded MV must equal a from-scratch aggregate of the final state,
    // including across a checkpoint restart (the replayed epoch commits
    // nothing, so the consumer sees no duplicate delta).
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    val base = Seq((1L, "v1", "A"), (2L, "v2", "A"), (3L, "v3", "B"))
      .toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcmv-ckpt").toString
    val ms = MemoryStream[(Long, String, String)]
    def start() = StreamingOps.mergeIntoLake(
      ms.toDF().toDF("k", "payload", "status"), table, ckpt)

    def mvOf(df: DataFrame): DataFrame =
      df.groupBy("status").agg(count(lit(1)).as("n"), sum("k").as("s"))
    def fold(mv: DataFrame, feed: DataFrame): DataFrame = {
      val delta = feed.withColumn("sgn",
          when(col("_change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L))
        .groupBy("status")
        .agg(sum(col("sgn")).as("dn"), sum(col("sgn") * col("k")).as("ds"))
      mv.join(delta, Seq("status"), "full_outer")
        .select(col("status"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
        .filter(col("n") > 0L)
    }
    var mv = mvOf(table.snapshot(0)).localCheckpoint()
    var seen = 0 // last version folded into mv

    val q1 = start()
    try {
      ms.addData((2L, "UPD2", "B"), (9L, "INS9", "C"))
      q1.processAllAvailable()
    } finally q1.stop()
    // consumer catch-up: one fold per commit since the last seen version
    (seen + 1 to table.latestVersion).foreach { v =>
      mv = fold(mv, table.changes(v - 1, v)).localCheckpoint()
    }
    seen = table.latestVersion
    // restart from the same checkpoint (replay) + one genuinely new epoch
    val q2 = start()
    try {
      ms.addData((1L, "UPD1", "C"))
      q2.processAllAvailable()
    } finally q2.stop()
    (seen + 1 to table.latestVersion).foreach { v =>
      mv = fold(mv, table.changes(v - 1, v)).localCheckpoint()
    }
    rows(mv.orderBy("status")) shouldBe rows(mvOf(table.read()).orderBy("status"))
    // and the composed fold equals the one-shot endpoint feed fold
    rows(fold(mvOf(table.snapshot(0)), table.changes(0, table.latestVersion))
      .orderBy("status")) shouldBe rows(mv.orderBy("status"))
  }

  test("lakeChangesStream: the manifest chain is a streamable CDC log, exactly-once") {
    import org.apache.spark.sql.DataFrame
    val base = Seq((1L, "v1", "A"), (2L, "v2", "A")).toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcstream-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Seq[Seq[Any]])]()
    def start() = StreamingOps.lakeChangesStream(spark, table, ckpt) { (v, feed) =>
      seen.synchronized {
        seen += ((v, rows(feed.orderBy("k", "_change_type"))))
      }
      ()
    }
    // two commits land BEFORE the stream starts: the first batch must
    // deliver both, in version order
    table.merge(Seq((1L, "U1", "U")).toDF("k", "payload", "status"))
    table.merge(Seq((9L, "I9", "I")).toDF("k", "payload", "status"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    seen.map(_._1).toSeq shouldBe Seq(1, 2)
    seen(0)._2 shouldBe Seq(
      Seq(1L, "U1", "U", "update_postimage"),
      Seq(1L, "v1", "A", "update_preimage"))
    seen(1)._2 shouldBe Seq(Seq(9L, "I9", "I", "insert"))
    // restart from the checkpoint, one new commit: ONLY version 3 arrives
    // (the file-source offset log makes each manifest exactly-once)
    table.delete(Seq(2L).toDF("k"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    seen.map(_._1).toSeq shouldBe Seq(1, 2, 3)
    seen(2)._2 shouldBe Seq(Seq(2L, "v2", "A", "delete"))
  }

  test("graft-lake stream FORMAT: per-commit batches, exactly-once restart, MOR delivery") {
    // the change feed as a first-class source — readStream.format, engine-
    // managed offsets (versions), restart from the checkpoint replays
    // nothing and skips nothing
    val base = Seq((1L, "v1", "A"), (2L, "v2", "A"), (3L, "v3", "A"))
      .toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lakefmt-ckpt").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-lakefmt-out").toString
    def start() = spark.readStream.format("graft-lake")
      .option("startingVersion", "1")
      .load(table.root)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    def sunk(): Seq[(Long, String, String, Int)] =
      spark.read.parquet(sinkDir)
        .select("k", "payload", "_change_type", "_commit_version")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getInt(3))).toSeq.sortBy(t => (t._4, t._1, t._3))

    table.merge(Seq((1L, "U1", "U")).toDF("k", "payload", "status")) // v1
    table.merge(Seq((9L, "I9", "I")).toDF("k", "payload", "status")) // v2
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    sunk() shouldBe Seq(
      (1L, "U1", "update_postimage", 1), (1L, "v1", "update_preimage", 1),
      (9L, "I9", "insert", 2))
    // offline commits + restart from the SAME checkpoint: only v3+ arrive
    table.delete(Seq(2L).toDF("k"))                                  // v3
    table.deleteDeferred(Seq(3L).toDF("k"))                          // v4 (MOR)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // the tombstone-aware feed delivers the deferred delete WITH its own
    // commit (per-commit attribution) — no waiting for a compact
    sunk().filter(_._4 >= 3) shouldBe Seq(
      (2L, "v2", "delete", 3), (3L, "v3", "delete", 4))
    // the folding compact changes nothing effective: empty span
    table.compact(1)                                                 // v5
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    sunk().filter(_._4 >= 5) shouldBe Seq.empty
    // nothing ever delivered twice (k, change_type, version) — and the
    // final table state equals base minus the two deletes plus the merges
    sunk().size shouldBe sunk().distinct.size
    rows(table.read().orderBy("k")) shouldBe Seq(
      Seq(1L, "U1", "U"), Seq(9L, "I9", "I"))
  }

  test("maxVersionsPerTrigger: a lagged stream drains in bounded spans") {
    // admission control — a stream starting 6 commits behind must not land
    // its whole lag as one micro-batch; with the cap it drains as spans of
    // ≤ 2 versions, each its own committed offset, and a restart from the
    // checkpoint re-seats the anchor (nothing skipped, nothing re-sent)
    val base = Seq((1L, "v1", "A")).toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    (1 to 6).foreach(i => table.merge(
      Seq((100L + i, s"p$i", "A")).toDF("k", "payload", "status"))) // v1..v6
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mvpt-ckpt").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-mvpt-out").toString
    def start() = spark.readStream.format("graft-lake")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "2")
      .load(table.root)
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def spans(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[(Int, Int)] =
      q.recentProgress.toSeq.flatMap { p =>
        val s = p.sources(0)
        val st = Option(s.startOffset).map(_.trim.toInt).getOrElse(0)
        val en = Option(s.endOffset).map(_.trim.toInt).getOrElse(st)
        if (en > st) Some((st, en)) else None
      }
    def sunkVersions(): Seq[Int] =
      spark.read.parquet(sinkDir).select("_commit_version")
        .collect().map(_.getInt(0)).toSeq.sorted
    val q1 = start()
    try {
      q1.processAllAvailable()
      sunkVersions() shouldBe (1 to 6)
      val sp = spans(q1)
      sp.size should be >= 3 // 6 versions at ≤2 per span
      all(sp.map(s => s._2 - s._1)) should be <= 2
    } finally q1.stop()
    // offline commits + restart from the SAME checkpoint: the recovery
    // re-seat means v1..v6 never re-deliver, and the cap still applies
    (7 to 9).foreach(i => table.merge(
      Seq((100L + i, s"p$i", "A")).toDF("k", "payload", "status"))) // v7..v9
    val q2 = start()
    try {
      q2.processAllAvailable()
      sunkVersions() shouldBe (1 to 9)
      all(spans(q2).map(s => s._2 - s._1)) should be <= 2
    } finally q2.stop()
  }

  test("restart with DEFAULT start: a downtime backlog drains under the caps") {
    // default startingVersion is latest+1 AT CONSTRUCTION — on a restart
    // after downtime that sits ABOVE the checkpoint, and the admission
    // anchor must re-seat to the checkpoint (the recovery getBatch), so
    // the backlog drains as capped spans, not one unbounded batch
    val base = Seq((1L, "v1", "A")).toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dflt-ckpt").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-dflt-out").toString
    def start() = spark.readStream.format("graft-lake")
      .option("maxVersionsPerTrigger", "1") // default startingVersion
      .load(table.root)
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      table.merge(Seq((2L, "p2", "A")).toDF("k", "payload", "status")) // v1
      q1.processAllAvailable()
    } finally q1.stop()
    // downtime: three commits the stream never saw
    (3 to 5).foreach(i => table.merge(
      Seq((i.toLong, s"p$i", "A")).toDF("k", "payload", "status"))) // v2..v4
    val q2 = start()
    try {
      q2.processAllAvailable()
      val sunk = spark.read.parquet(sinkDir).select("_commit_version")
        .collect().map(_.getInt(0)).toSeq.sorted
      sunk shouldBe Seq(1, 2, 3, 4) // exactly once, nothing skipped
      // and the backlog respected the 1-version cap per span
      val spans = q2.recentProgress.toSeq.flatMap { p =>
        val s = p.sources(0)
        for (st <- Option(s.startOffset); en <- Option(s.endOffset)
             if en.trim.toInt > st.trim.toInt)
          yield en.trim.toInt - st.trim.toInt
      }
      spans should not be empty
      all(spans) should be <= 1
    } finally q2.stop()
  }

  test("maxRowsPerTrigger: ONE oversized append commit drains as bounded batches") {
    // admission WITHIN a commit: a 100-row bulk-append version must not
    // land as one batch when the row cap says 25 — it splits at file
    // granularity on (version, fileIdx) offsets. Run with Trigger.Once,
    // restarting the query at EVERY batch boundary (including mid-commit):
    // exactly-once must survive each re-seat.
    val base = Seq((1L, "v1", "A")).toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    spark.conf.set("spark.graft.lake.targetFileRows", "10")
    try table.insertAll((100L to 199L).map(k => (k, s"p$k", "I"))
      .toDF("k", "payload", "status")) // v1: 100 rows as ~10 files
    finally spark.conf.unset("spark.graft.lake.targetFileRows")
    // v1 really landed split: v0's single file + ~10 appended files
    table.manifest(1).files.size should be >= 9
    table.merge(Seq((1L, "u1", "U")).toDF("k", "payload", "status")) // v2: rewrite, atomic
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mrpt-ckpt").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-mrpt-out").toString
    def once() = {
      val q = spark.readStream.format("graft-lake")
        .option("startingVersion", "1")
        .option("maxRowsPerTrigger", "25")
        .load(table.root)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
      q.awaitTermination()
      q.recentProgress.toSeq.map(_.numInputRows).sum
    }
    def sunk() = spark.read.parquet(sinkDir)
    var batches = 0
    var drained = false
    while (!drained && batches < 20) {
      val n = once(); batches += 1
      if (n == 0L && sunk().count() >= 102L) drained = true
      // every batch respects the budget at FILE granularity: ≤ 25 rows
      // of 10-row files = at most 2 files + the guaranteed-progress unit
      n should be <= 30L
    }
    // v1 needs ≥ ceil(100/30) batches — the cap actually split it
    batches should be >= 4
    val rows = sunk().select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    // exactly once: 100 inserts at v1, one update pair at v2, no dupes
    rows.count(_._3 == 1) shouldBe 100
    rows.filter(_._3 == 1).map(_._1).sorted shouldBe (100L to 199L)
    rows.filter(_._3 == 2).map(_._2).sorted shouldBe
      Seq("update_postimage", "update_preimage")
    rows.size shouldBe 102
  }

  test("property: capped admission delivers EXACTLY the uncapped feed") {
    // differential: for a random mix of bulk appends (splittable),
    // merges (atomic rewrites), and deferred predicate deletes, every
    // cap combination must deliver the SAME multiset of change events as
    // the uncapped stream — only the batching may differ. Drives the
    // Source directly (getOffset/getBatch), like the engine does.
    val rnd = new scala.util.Random(13)
    val base = (1L to 40L).map(k => (k, s"v$k", "A"))
      .toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 2) // v0
    spark.conf.set("spark.graft.lake.targetFileRows", "8")
    try {
      var nextKey = 1000L
      // one guaranteed multi-file append so the split path always runs
      table.insertAll((900L to 929L).map(k => (k, s"a$k", "I"))
        .toDF("k", "payload", "status"))
      (1 to 8).foreach { i =>
        rnd.nextInt(3) match {
          case 0 => // bulk append: 20 rows land as ~3 files
            val rows = (nextKey until nextKey + 20).map(k => (k, s"a$k", "I"))
            nextKey += 20
            table.insertAll(rows.toDF("k", "payload", "status"))
          case 1 =>
            val k = (1 + rnd.nextInt(40)).toLong
            table.merge(Seq((k, s"m$i", "U")).toDF("k", "payload", "status"))
          case 2 => // may no-op when the key is already dead
            table.deleteDeferredWhere(col("k") === (1 + rnd.nextInt(40)).toLong)
        }
      }
    } finally spark.conf.unset("spark.graft.lake.targetFileRows")
    def drain(params: Map[String, String]): Seq[(Long, String, Int)] = {
      val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
        params ++ Map("path" -> table.root, "startingVersion" -> "1"))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
      var prev: Option[org.apache.spark.sql.execution.streaming.Offset] = None
      var guard = 0
      var cur = src.getOffset
      while (cur.isDefined && guard < 500) {
        val b = org.apache.spark.sql.graft.StreamBridge
          .rewrapSourceBatch(src.getBatch(prev, cur.get))
        out ++= b.select("k", "_change_type", "_commit_version").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        prev = cur
        cur = src.getOffset
        guard += 1
      }
      out.toSeq.sorted
    }
    val uncapped = drain(Map.empty)
    uncapped should not be empty
    val capCombos = Seq(
      Map("maxRowsPerTrigger" -> "10"),
      Map("maxFilesPerTrigger" -> "2"),
      Map("maxVersionsPerTrigger" -> "1"),
      Map("maxRowsPerTrigger" -> "7", "maxFilesPerTrigger" -> "1",
        "maxVersionsPerTrigger" -> "2"))
    capCombos.foreach { caps =>
      withClue(s"caps=$caps: ") { drain(caps) shouldBe uncapped }
    }
    // and the tightest caps really did split batches: more offers than
    // commits means at least one commit spanned several micro-batches
    val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingVersion" -> "1",
        "maxRowsPerTrigger" -> "7"))
    var offers = 0
    var prev: Option[org.apache.spark.sql.execution.streaming.Offset] = None
    var cur = src.getOffset
    while (cur.isDefined && offers < 500) {
      src.getBatch(prev, cur.get)
      prev = cur; cur = src.getOffset; offers += 1
    }
    offers should be > table.latestVersion
  }

  test("keyless table as insert-mode streaming sink: exactly-once appends") {
    implicit val ctx = spark.sqlContext
    val base = Seq((0L, "seed")).toDF("id", "msg")
    val table = graft.sources.Lake.createAppendLog(spark,
      graft.sources.Lake.freshRoot(), base, 1)
    val ms = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-keyless-sink").toString
    val q = ms.toDF().toDF("id", "msg")
      .writeStream.format("graft-lake")
      .option("path", table.root)
      .option("checkpointLocation", ckpt)
      .option("mode", "insert")
      .outputMode("append").start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((1L, "a")) // an append LOG admits the repeat
      q.processAllAvailable()
    } finally q.stop()
    table.read().count() shouldBe 4L
    table.read().filter(col("id") === 1L).count() shouldBe 2L
    // merge-mode against a keyless table refuses loudly
    val q2 = ms.toDF().toDF("id", "msg")
      .writeStream.format("graft-lake")
      .option("path", table.root)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-keyless-sink2").toString)
      .outputMode("append").start()
    try {
      ms.addData((9L, "x"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      e.getMessage should include("append-log")
    } finally q2.stop()
  }

  test("schema-drift signal: fires on mid-stream evolution, else silent") {
    val base = Seq((1L, "v1")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    val metaDir = java.nio.file.Files
      .createTempDirectory("graft-drift-ckpt").toString
    val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingVersion" -> "1"), Some(metaDir))
    def drainOnce(): Unit = src.getOffset.foreach { o =>
      org.apache.spark.sql.graft.StreamBridge
        .rewrapSourceBatch(src.getBatch(None, o)).collect()
    }
    // ordinary commits: NO signal
    table.merge(Seq((2L, "v2")).toDF("k", "payload")) // v1
    drainOnce()
    src.driftDetected shouldBe empty
    // mid-stream ADD COLUMN: the signal fires once for the span
    table.addColumn("score", "double") // v2
    table.merge(Seq((3L, "v3", 0.5)).toDF("k", "payload", "score")) // v3
    drainOnce()
    src.driftDetected should not be empty
    src.driftDetected.values.foreach(_ should include("score"))
    // the operational surface reports the stream as behind
    val d = graft.sources.Lake.streamDetail(spark, table.root, metaDir)
      .collect()(0)
    d.getAs[Boolean]("stream_schema_behind") shouldBe true
    d.getAs[String]("behind_detail") should include("score")
    // a FRESH stream started after the evolution pins the new shape:
    // no drift, not behind
    val meta2 = java.nio.file.Files
      .createTempDirectory("graft-drift-ckpt2").toString
    val src2 = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingVersion" -> "1"), Some(meta2))
    src2.getOffset.foreach { o =>
      org.apache.spark.sql.graft.StreamBridge
        .rewrapSourceBatch(src2.getBatch(None, o)).collect()
    }
    src2.driftDetected shouldBe empty
    graft.sources.Lake.streamDetail(spark, table.root, meta2)
      .collect()(0).getAs[Boolean]("stream_schema_behind") shouldBe false
    // RESTART ON THE SAME CHECKPOINT adopts the evolution (construction
    // re-pins from the current latest) — the schema marker must move with
    // it, or the detail surface would report "behind" forever after the
    // restart the signal itself asked for
    val srcRestart = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingVersion" -> "1"), Some(metaDir))
    srcRestart.schema.fieldNames should contain("score")
    graft.sources.Lake.streamDetail(spark, table.root, metaDir)
      .collect()(0).getAs[Boolean]("stream_schema_behind") shouldBe false
  }

  test("format surfaces accept catalog names: batch read, stream source, sink") {
    import graft.sources.{Lake, LakeCatalog}
    spark.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
    val src = Lake.create(spark, Lake.freshRoot(),
      Seq((1L, "a"), (2L, "b")).toDF("k", "payload"), "k", 1)
    val dst = Lake.create(spark, Lake.freshRoot(),
      Seq((0L, "seed")).toDF("k", "payload"), "k", 1)
    LakeCatalog.register(spark, "src_t", src.root)
    LakeCatalog.register(spark, "dst_t", dst.root)
    // batch read by name
    spark.read.format("graft-lake").load("src_t").count() shouldBe 2L
    // stream source AND sink by name: pipe src_t's change feed into dst_t
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-name-ckpt").toString
    val q = spark.readStream.format("graft-lake").load("src_t")
      .select("k", "payload")
      .writeStream.format("graft-lake")
      .option("path", "dst_t")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      src.merge(Seq((3L, "c")).toDF("k", "payload"))
      q.processAllAvailable()
    } finally q.stop()
    dst.read().count() shouldBe 2L // the seed row + the streamed k=3
    dst.read().filter(col("k") === 3L).count() shouldBe 1L
    // an UNBOUND bare name stays a path, verbatim — never silently captured
    intercept[Exception] {
      spark.read.format("graft-lake").load("definitely_unbound_name").count()
    }
  }

  test("corpus build standing query: 3 streamed batches == from-scratch, restart exactly-once") {
    import graft.extensions.TextAnalysis
    import graft.sources.Lake
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001").localCheckpoint()
    def slice(lo: Long, hi: Long) =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    // the corpus: a KEYLESS append-log table, crawl batches land as commits
    val corpus = Lake.createAppendLog(spark, Lake.freshRoot(),
      slice(0, 200), 4, statsCols = Seq("doc_id"))
    // bootstrap the three maintained tables from the initial corpus
    val (st1, sh1, bk1) = TextAnalysis.corpusBootstrap(corpus.read())
    val state = Lake.create(spark, Lake.freshRoot(), st1, "doc_id", 4)
    val sh = Lake.createAppendLog(spark, Lake.freshRoot(), sh1, 4)
    val bk = Lake.createAppendLog(spark, Lake.freshRoot(), bk1, 4)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-corpus-stream").toString
    def fromScratch(hi: Long) = TextAnalysis
      .corpusAssembly(TextAnalysis.corpusBootstrap(slice(0, hi))._1)
      .collect().map(_.toSeq).toSeq
    def streamed() = TextAnalysis.corpusAssembly(state.read())
      .collect().map(_.toSeq).toSeq
    def start() = TextAnalysis.corpusBuildStreamStart(spark, corpus.root,
      state.root, sh.root, bk.root, ckpt, "corpus-refresh")
    val q = start()
    try {
      corpus.insertAll(slice(200, 300)) // batch 2
      q.processAllAvailable()
      streamed() shouldBe fromScratch(300)
      corpus.insertAll(slice(300, 400)) // batch 3
      q.processAllAvailable()
      streamed() shouldBe fromScratch(400)
    } finally q.stop()
    // batch 4 lands while the consumer is DOWN; a restart on the same
    // checkpoint drains the backlog exactly once
    corpus.insertAll(slice(400, 500))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    streamed() shouldBe fromScratch(500)
    // exactly-once evidence beyond the equality: one state row per doc
    state.read().count() shouldBe 500L
    state.read().select("doc_id").distinct().count() shouldBe 500L
  }

  test("keyless append-log: change feed streams appends and COW deletes") {
    // the admission machinery is key-agnostic: pure-append commits split
    // file-wise under caps, and a keyless COW delete commit delivers its
    // content-diff delete events with correct attribution
    val base = (1L to 30L).map(i => (i, i % 3)).toDF("id", "shard")
    val table = graft.sources.Lake.createAppendLog(spark,
      graft.sources.Lake.freshRoot(), base, 2) // v0
    spark.conf.set("spark.graft.lake.targetFileRows", "10")
    try {
      table.insertAll((31L to 60L).map(i => (i, i % 3)).toDF("id", "shard")) // v1
    } finally spark.conf.unset("spark.graft.lake.targetFileRows")
    table.deleteWhere(col("shard") === 1L) // v2: rewrite
    def drain(params: Map[String, String]): (Int, Seq[(Long, String, Int)]) = {
      val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
        params ++ Map("path" -> table.root, "startingVersion" -> "1"))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
      var prev: Option[org.apache.spark.sql.execution.streaming.Offset] = None
      var offers = 0
      var cur = src.getOffset
      while (cur.isDefined && offers < 100) {
        val b = org.apache.spark.sql.graft.StreamBridge
          .rewrapSourceBatch(src.getBatch(prev, cur.get))
        out ++= b.select("id", "_change_type", "_commit_version").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        prev = cur
        cur = src.getOffset
        offers += 1
      }
      (offers, out.toSeq.sorted)
    }
    val (_, events) = drain(Map.empty)
    events.filter(_._2 == "insert").map(_._1) shouldBe (31L to 60L)
    events.filter(_._2 == "delete").map(_._1).sorted shouldBe
      (1L to 60L).filter(_ % 3 == 1)
    all(events.filter(_._2 == "delete").map(_._3)) shouldBe 2
    // capped: the v1 bulk append splits file-wise, same total feed
    val (offers, capped) = drain(Map("maxRowsPerTrigger" -> "10"))
    capped shouldBe events
    offers should be >= 3
  }

  test("a stacked deferred-delete backlog drains bounded under the row cap") {
    // delete-only commits add no files, but their feed emits one delete
    // event per tombstoned key — admission must cost them by their
    // tombstone rows, or a run of stacked DELETE DEFERRED commits
    // coalesces into one unbounded batch
    val base = (1L to 60L).map(k => (k, s"v$k")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 2) // v0
    (0 until 4).foreach { i => // v1..v4: ~15 tombstoned keys each
      table.deleteDeferredWhere(col("k") >= i * 15L + 1 && col("k") <= i * 15L + 15)
    }
    def drain(params: Map[String, String]): (Int, Seq[(Long, String, Int)]) = {
      val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
        params ++ Map("path" -> table.root, "startingVersion" -> "1"))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
      var prev: Option[org.apache.spark.sql.execution.streaming.Offset] = None
      var offers = 0
      var cur = src.getOffset
      while (cur.isDefined && offers < 100) {
        val b = org.apache.spark.sql.graft.StreamBridge
          .rewrapSourceBatch(src.getBatch(prev, cur.get))
        out ++= b.select("k", "_change_type", "_commit_version").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        prev = cur
        cur = src.getOffset
        offers += 1
      }
      (offers, out.toSeq.sorted)
    }
    val (_, uncapped) = drain(Map.empty)
    uncapped.size shouldBe 60 // one delete event per erased key
    val (offers, capped) = drain(Map("maxRowsPerTrigger" -> "20"))
    capped shouldBe uncapped // same feed, only batching differs
    offers should be >= 3 // the four ~15-row commits did NOT coalesce
  }

  test("admission high-water mark persists at OFFER time, not commit time") {
    // crash window: the engine's commit log is durable but the source's
    // commit() callback never ran. The marker written at getOffset must
    // already cover the offer, so a restarted source never offers below
    // the engine's committed offset (which the engine would treat as a
    // NEW batch end and re-deliver later spans)
    val base = Seq((1L, "v1")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    (2 to 5).foreach(i => table.merge(
      Seq((i.toLong, s"v$i")).toDF("k", "payload"))) // v1..v4
    val metaDir = java.nio.file.Files
      .createTempDirectory("graft-marker-ckpt").toString
    val params = Map("path" -> table.root, "startingVersion" -> "1",
      "maxVersionsPerTrigger" -> "2")
    val s1 = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      params, Some(metaDir))
    val o1 = s1.getOffset.get // offers v1..v2; marker persists HERE
    s1.getBatch(None, o1)
    // CRASH before s1 ever saw commit(): restart on the same metadataPath
    val s2 = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      params, Some(metaDir))
    val o2 = s2.getOffset.get
    o2.json.trim.toInt should be > o1.json.trim.toInt // never re-offers v1..v2
    val b2 = org.apache.spark.sql.graft.StreamBridge
      .rewrapSourceBatch(s2.getBatch(Some(o1), o2))
    val versions = b2.select("_commit_version").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    versions shouldBe Seq(3, 4) // strictly the undelivered spans
  }

  test("marker above committed (crash before engine log): stream self-heals") {
    // offer-time marker persistence can leave the marker ABOVE the
    // engine's committed offset (crash between persistHighWater and the
    // engine's WAL append, so there is no uncommitted batch to re-hand).
    // The first getOffset after restart must re-offer the marker position
    // so the gap delivers instead of stalling until some future commit
    val base = Seq((1L, "v1")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    (2 to 5).foreach(i => table.merge(
      Seq((i.toLong, s"v$i")).toDF("k", "payload"))) // v1..v4
    val metaDir = java.nio.file.Files
      .createTempDirectory("graft-heal-ckpt").toString
    val params = Map("path" -> table.root, "startingVersion" -> "1",
      "maxVersionsPerTrigger" -> "2")
    val s1 = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      params, Some(metaDir))
    val o1 = s1.getOffset.get // v1..v2 — engine logs AND commits this
    s1.getBatch(None, o1)
    val o2 = s1.getOffset.get // v3..v4 — marker=4, engine NEVER logs it
    o2.json.trim.toInt shouldBe 4
    // CRASH. Restart: the engine has nothing uncommitted to re-hand, so
    // it goes straight to getOffset with its committed offset at v2
    val s2 = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      params, Some(metaDir))
    val healed = s2.getOffset
    healed shouldBe defined
    healed.get.json.trim.toInt shouldBe 4 // the marker position
    // the engine compares 4 != 2 and runs the gap as one batch
    val b = org.apache.spark.sql.graft.StreamBridge
      .rewrapSourceBatch(s2.getBatch(Some(o1), healed.get))
    b.select("_commit_version").distinct().collect()
      .map(_.getInt(0)).toSeq.sorted shouldBe Seq(3, 4)
    s2.getOffset shouldBe empty // one-shot heal; nothing else outstanding
    // fully-committed restart: the heal offer equals the engine's
    // committed offset, which the engine ignores (offset equality)
    val s3 = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      params, Some(metaDir))
    val o3 = s3.getOffset
    o3.map(_.json.trim.toInt) shouldBe Some(4) // equal to committed: inert
    s3.getOffset shouldBe empty
  }

  test("a regressed batch end (stale pre-fix marker) delivers nothing") {
    // checkpoints written by older builds could seed admission below the
    // engine's committed offset; if the engine then logs a LOW offer as a
    // new batch end, getBatch must emit nothing rather than re-deliver
    val base = Seq((1L, "v1")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    (2 to 4).foreach(i => table.merge(
      Seq((i.toLong, s"v$i")).toDF("k", "payload"))) // v1..v3
    val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingVersion" -> "1"))
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val regressed = org.apache.spark.sql.graft.StreamBridge
      .rewrapSourceBatch(src.getBatch(Some(LongOffset(3L)), LongOffset(1L)))
    regressed.count() shouldBe 0L
    // and admission re-seated AT the committed offset: the next offer
    // covers exactly the outstanding tail, nothing below it
    val next = src.getOffset
    next shouldBe empty // nothing above v3 exists yet
    table.merge(Seq((9L, "v9")).toDF("k", "payload")) // v4
    val o = src.getOffset.get
    // the engine LOGGED the regressed end, so its NEXT batch starts from
    // that low end (v1), not from the previously-committed v3 — without
    // the delivery floor this span would re-emit (v1, v3], duplicating
    // rows the stream already delivered in an exactly-once feed
    val b = org.apache.spark.sql.graft.StreamBridge
      .rewrapSourceBatch(src.getBatch(Some(LongOffset(1L)), o))
    b.select("_commit_version").distinct().collect()
      .map(_.getInt(0)).toSeq shouldBe Seq(4)
    b.count() shouldBe 1L // only v9's insert, nothing re-delivered
  }

  test("mid-stream rename normalizes spans to the start-of-stream names") {
    // the stream's schema is FIXED at start; a rename mid-stream must not
    // null out (or drop) the renamed column's post-rename events — spans
    // match columns by PHYSICAL identity back to the starting names
    val base = Seq((1L, "v1", "A"), (2L, "v2", "A"))
      .toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ren-ckpt").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-ren-out").toString
    def start() = spark.readStream.format("graft-lake")
      .load(table.root) // default: only what happens after the start
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = start()
    try {
      table.merge(Seq((1L, "pre", "B")).toDF("k", "payload", "status")) // v1
      table.renameColumn("payload", "note") // v2 (empty span)
      table.merge(Seq((2L, "post", "C")).toDF("k", "note", "status")) // v3
      // drop + re-add 'status': the re-added column lives on FRESH
      // physical storage the stream's start never saw — its values must
      // NOT leak into the fixed 'status' field (strict physical-identity
      // binding); the field feeds null until restart
      table.dropColumn("status") // v4 (empty span)
      table.merge(Seq((1L, "post2", "S2")).toDF("k", "note", "status")) // v5
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(sinkDir)
    // the feed kept the starting name…
    out.columns should contain("payload")
    out.columns should not contain "note"
    // …and the post-rename span's values arrived UNDER it (not null)
    val post = out.filter(col("_commit_version") === 3 &&
      col("_change_type") === "update_postimage").collect()
    post.map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"))).toSeq shouldBe
      Seq((2L, "post"))
    val readd = out.filter(col("_commit_version") === 5 &&
      col("_change_type") === "update_postimage").collect()
    readd.map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"),
      r.getAs[String]("status"))).toSeq shouldBe Seq((1L, "post2", null))
    // a FRESH stream adopts the new name (restart-to-adopt contract)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ren-ckpt2").toString
    val sink2 = java.nio.file.Files.createTempDirectory("graft-ren-out2").toString
    val q2 = spark.readStream.format("graft-lake")
      .option("startingVersion", "3").load(table.root)
      .writeStream.format("parquet").option("path", sink2)
      .option("checkpointLocation", ckpt2).outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val out2 = spark.read.parquet(sink2)
    out2.columns should contain("note")
    // and the re-added 'status' is a first-class column here: the fresh
    // stream's fixed schema binds its NEW physical storage
    out2.filter(col("_change_type") === "update_postimage")
      .select("note", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted shouldBe
      Seq(("post", null), ("post2", "S2"))
  }

  test("mid-stream type widening: out-of-range values feed null, never wrap") {
    // the stream's fixed schema keeps the narrow type; a span written
    // after an INT→LONG widening may carry values the fixed type cannot
    // hold — they must arrive as NULL (restart to adopt the wide type),
    // not as a silently wrapped number
    val base = Seq((1L, 1), (2L, 2)).toDF("k", "n")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1) // v0: n is INT
    val ckpt = java.nio.file.Files.createTempDirectory("graft-widen-ckpt").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-widen-out").toString
    val q = spark.readStream.format("graft-lake").load(table.root)
      .writeStream.format("parquet")
      .option("path", sinkDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // widening merge: one in-range value, one that overflows INT
      table.merge(Seq((1L, 7L), (2L, 5000000000L)).toDF("k", "n")) // v1
      q.processAllAvailable()
    } finally q.stop()
    val post = spark.read.parquet(sinkDir)
      .filter(col("_change_type") === "update_postimage")
      .select("k", "n").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getInt(1))).toSeq.sortBy(_._1)
    post shouldBe Seq((1L, 7), (2L, null))
    // a fresh stream adopts the widened type and sees the real value
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-widen-ckpt2").toString
    val sink2 = java.nio.file.Files.createTempDirectory("graft-widen-out2").toString
    val q2 = spark.readStream.format("graft-lake")
      .option("startingVersion", "1").load(table.root)
      .writeStream.format("parquet").option("path", sink2)
      .option("checkpointLocation", ckpt2).outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    spark.read.parquet(sink2)
      .filter(col("_change_type") === "update_postimage" && col("k") === 2L)
      .select("n").collect()(0).getLong(0) shouldBe 5000000000L
  }

  test("graft-lake stream delivers a deferred delete with its OWN commit") {
    // per-commit attribution: a deferred-delete commit serves its delete
    // events itself (the tombstone-aware feed), and a startingVersion
    // ABOVE it correctly excludes them — the commit happened before the
    // requested range, exactly like any other excluded commit
    val base = Seq((1L, "v1"), (2L, "v2"), (3L, "v3")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    table.deleteDeferred(Seq(2L).toDF("k")) // v1 (MOR) — latest at start
    val ckpt = java.nio.file.Files.createTempDirectory("graft-morstart-ckpt").toString
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-morstart-out").toString
    def start(fromV: String, cp: String, out: String) =
      spark.readStream.format("graft-lake")
        .option("startingVersion", fromV).load(table.root)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", cp).outputMode("append").start()
    // replaying from v1 delivers the delete AT v1
    val q1 = start("1", ckpt, sinkDir)
    try q1.processAllAvailable() finally q1.stop()
    def got(dir: String) = spark.read.parquet(dir)
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    got(sinkDir) shouldBe Seq((2L, "delete", 1))
    // the folding compact (v2) changes nothing effective: empty span
    table.compact(1)
    val q2 = start("1", ckpt, sinkDir)
    try q2.processAllAvailable() finally q2.stop()
    got(sinkDir) shouldBe Seq((2L, "delete", 1))
    // a fresh stream from v2 sees only the (empty) compact span — v1's
    // delete predates the requested range
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-morstart-ckpt2").toString
    val sink2 = java.nio.file.Files.createTempDirectory("graft-morstart-out2").toString
    val q3 = start("2", ckpt2, sink2)
    try q3.processAllAvailable() finally q3.stop()
    got(sink2) shouldBe Seq.empty
  }

  test("readEventsStream repairs the nanos timestamp and feeds the window agg") {
    // file streams tail a directory; stage the single driver file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-000.parquet"))
    val q = StreamingOps.hourlyByType(
        StreamingOps.readEventsStream(spark, dir.toString))
      .writeStream.format("memory").queryName("filestream").outputMode("update").start()
    try {
      q.processAllAvailable()
      val agg = spark.table("filestream")
      agg.count() should be > 0L
      // repaired domain: driver events are all in Jan 2024
      import org.apache.spark.sql.functions.{min, max, year}
      val yrs = agg.select(year(min("hour")), year(max("hour"))).collect()(0)
      yrs.getInt(0) shouldBe 2024
      yrs.getInt(1) shouldBe 2024
    } finally q.stop()
  }

  test("archiveIngestStream extracts arriving bundles; corrupt ones quarantine") {
    import graft.extensions.Codecs
    val dir = java.nio.file.Files.createTempDirectory("graft-arcstream")
    val m1 = Seq(("a.txt", "first doc".getBytes("UTF-8")),
                 ("b.txt", "second doc".getBytes("UTF-8")))
    val m2 = Seq(("c.txt", "third doc, zipped".getBytes("UTF-8")))
    java.nio.file.Files.write(dir.resolve("b1.tar"), Codecs.tarEncode(m1))
    java.nio.file.Files.write(dir.resolve("b2.zip"),
      Codecs.zipEncode(m2, deflated = true))
    java.nio.file.Files.write(dir.resolve("b3.tar.gz"),
      Codecs.gzipEncode(Codecs.tarEncode(m2)))
    java.nio.file.Files.write(dir.resolve("junk.tar"),
      "this is not a tar at all".getBytes("UTF-8"))
    val q = StreamingOps.archiveIngestStream(spark, dir.toString)
      .writeStream.format("memory").queryName("arcstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("arcstream").collect()
        .map(r => (Option(r.getString(1)), r.getLong(2))).toSeq
      // every member of every well-formed bundle, content-addressed
      rows.count(_._1.isDefined) shouldBe m1.size + m2.size + m2.size
      rows.collect { case (Some(n), len) => (n, len) }.sorted shouldBe
        (m1 ++ m2 ++ m2).map { case (n, d) => (n, d.length.toLong) }.sorted
      // the corrupt bundle is ONE quarantine row, not a dead query
      rows.filter(_._1.isEmpty) shouldBe Seq((None, -1L))
    } finally q.stop()
  }

  test("archiveIngestStream: checkpoint restart loses no members, duplicates none") {
    import graft.extensions.Codecs
    // the restart contract for the bundle-ingest stream: bundles processed
    // before the stop must NOT re-emit their members, bundles that arrived
    // while the query was down must all surface — exactly-once at member
    // granularity via the file-source offset log + parquet sink file log
    val dir = java.nio.file.Files.createTempDirectory("graft-arcrestart")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-arcrestart-ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft-arcrestart-out").toString
    def start() = StreamingOps.archiveIngestStream(spark, dir.toString)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    java.nio.file.Files.write(dir.resolve("b1.tar"), Codecs.tarEncode(Seq(
      ("a.txt", "alpha".getBytes("UTF-8")), ("b.txt", "beta".getBytes("UTF-8")))))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // while the query is DOWN, a second bundle arrives — nested, so the
    // composite-name path is also proven across a restart boundary
    val inner = Codecs.zipEncode(Seq(("c.txt", "gamma".getBytes("UTF-8"))),
      deflated = true)
    java.nio.file.Files.write(dir.resolve("b2.tar"), Codecs.tarEncode(Seq(
      ("d.txt", "delta".getBytes("UTF-8")), ("inner.zip", inner))))
    val q2 = start()
    try {
      q2.processAllAvailable()
      spark.read.parquet(out).collect().map(_.getString(1)).toSeq.sorted shouldBe
        Seq("a.txt", "b.txt", "d.txt", "inner.zip!c.txt")
    } finally q2.stop()
  }

  test("foreachBatch epoch sink writes each micro-batch to its own overwritable dir") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-epoch").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-epoch-ckpt").toString
    val ms = MemoryStream[Event]
    val q = StreamingOps.writeEpochPartitioned(ms.toDF(), out, ckpt)
    try {
      ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      ms.addData(Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      val all = spark.read.option("basePath", out).parquet(s"$out/epoch=*")
      all.count() shouldBe 3L
      // distinct epoch dirs exist — a replayed epoch would overwrite its own
      all.select("epoch").distinct().count() should be >= 2L
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from the dimension") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val ms = MemoryStream[Event]
    val q = StreamingOps.enrichWithDim(ms.toDF(), dim, "user_id")
      .select("event_id", "segment")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      ms.addData(
        Event(10, ts(0), 1, "click", 1.0),
        Event(11, ts(1), 2, "view", 2.0),
        Event(12, ts(2), 99, "view", 3.0)) // no dim row -> left join keeps it
      q.processAllAvailable()
      val rows = spark.table("enriched").orderBy("event_id").collect()
        .toSeq.map(_.toSeq)
      rows shouldBe Seq(Seq(10L, "gold"), Seq(11L, "basic"), Seq(12L, null))
    } finally q.stop()
  }

  test("dedupStream drops re-delivered ids within the watermark") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.dedupStream(ms.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      // re-delivery with jittered event time is still the same id
      ms.addData(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(1), 1, "click", 1.0))
      q.processAllAvailable()
      spark.table("dedup").count() shouldBe 2L
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with prior views across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.clickViewAttribution(ms.toDF())
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      // batch 1: two views for user 1, one stale view (2h before the click)
      ms.addData(
        Event(10, ts(0), 1, "view", 1.0),
        Event(11, ts(30), 1, "view", 1.0),
        Event(12, ts(-120), 1, "view", 1.0),
        Event(13, ts(20), 2, "view", 1.0))
      q.processAllAvailable()
      // batch 2: the click arrives later — the join state must still hold
      // the earlier views (cross-micro-batch match)
      ms.addData(Event(20, ts(45), 1, "click", 2.0))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "click_id", "view_id").collect().toSeq.map(_.toSeq)
      // user 1's click joins views 10 and 11 (within the hour); the stale
      // view 12 and user 2's view 13 do not qualify
      got.toSet shouldBe Set(Seq(1L, 20L, 10L), Seq(1L, 20L, 11L))
    } finally q.stop()
  }

  test("sessionize closes a session on gap and on watermark timeout") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingOps.sessionize(ms.toDS(), gapMinutes = 30, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // session 1: user 1, events at minute 0 and 10 (same session)
      ms.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 1.0))
      q.processAllAvailable()
      // event far past the gap: closes session 1 in-function, starts session 2
      ms.addData(Event(3, ts(120), 1, "click", 1.0))
      q.processAllAvailable()
      val closedByGap = spark.table("sessions").as[(Long, Long, Long, Int)].collect().toSeq
      closedByGap should contain ((1L, ts(0).getTime, ts(10).getTime, 2))
      // advance watermark far enough that session 2 times out
      ms.addData(Event(4, ts(600), 2, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Event(5, ts(1200), 2, "click", 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions").as[(Long, Long, Long, Int)].collect().toSeq
      all should contain ((1L, ts(120).getTime, ts(120).getTime, 1))
    } finally q.stop()
  }

  test("contaminationScreen is a sound superset of the exact batch contamination") {
    implicit val ctx = spark.sqlContext
    import graft.extensions.Dedup
    import graft.functions.Portable
    import graft.sources.Tables
    import org.apache.spark.sql.graft.GraftBloom
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    // benchmark Bloom built the same way as the batch bloom path
    val bloomBytes = docs.filter(col("doc_id") < Dedup.ContaminationBenchDocs)
      .select(Portable.tokens(col("text")).as("toks"))
      .select(explode(transform(Portable.shingles3(col("toks")),
        s => Portable.hash60(s))).as("s"))
      .distinct()
      .agg(GraftBloom.bloomAgg(col("s"), 100000L, 1L << 21))
      .head().getAs[Array[Byte]](0)
    val corpus = docs.filter(col("doc_id") >= Dedup.ContaminationBenchDocs)
      .select("doc_id", "text").as[StreamDoc].collect()
    val ms = MemoryStream[StreamDoc]
    val q = StreamingOps.contaminationScreen(ms.toDF(), bloomBytes)
      .writeStream.format("memory").queryName("contam").outputMode("append").start()
    try {
      // two micro-batches — the screen is stateless, so split arrival is fine
      ms.addData(corpus.take(20).toIndexedSeq)
      q.processAllAvailable()
      ms.addData(corpus.drop(20).toIndexedSeq)
      q.processAllAvailable()
      val screened = spark.table("contam")
        .select("doc_id", "n_shingles", "n_maybe", "flagged")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      val batch = Dedup.dedupContamination(spark, dir)
        .select("doc_id", "n_shingles", "n_overlap", "flagged")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      screened.keySet shouldBe batch.keySet
      batch.foreach { case (id, (nSh, nOv, flag)) =>
        val (sSh, sMaybe, sFlag) = screened(id)
        sSh shouldBe nSh              // same in-row shingle space
        sMaybe should be >= nOv       // no false negatives, ever
        if (flag) sFlag shouldBe true // a contaminated doc cannot pass unflagged
      }
    } finally q.stop()
  }
  test("lakeChangesStream delivers deferred-delete (MOR) commits losslessly") {
    val base = Seq((1L, "v1", "A"), (2L, "v2", "A"), (3L, "v3", "A"))
      .toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-morbridge-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Seq[Seq[Any]])]()
    def start() = StreamingOps.lakeChangesStream(spark, table, ckpt) { (v, feed) =>
      seen.synchronized {
        seen += ((v, rows(feed.orderBy("k", "_change_type"))))
      }
      ()
    }
    // v1 clean merge; v2 deferred delete (tombstone-only — zero data
    // files change); v3 folding compact. The tombstone-aware feed
    // delivers the delete WITH the deferred-delete commit (per-commit
    // attribution), and the compact — whose fold changes nothing
    // effective — delivers an empty span. The bug class where the
    // delete's events never arrive at all (both v2 and v3 skipped as MOR
    // spans) silently diverged any replica maintained via applyFeed.
    table.merge(Seq((1L, "U1", "U")).toDF("k", "payload", "status"))
    table.deleteDeferred(Seq(2L).toDF("k"))
    table.compact(1)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    seen.map(_._1).toSeq shouldBe Seq(1, 2, 3)
    seen(0)._2 shouldBe Seq(
      Seq(1L, "U1", "U", "update_postimage"),
      Seq(1L, "v1", "A", "update_preimage"))
    seen(1)._2 shouldBe Seq(Seq(2L, "v2", "A", "delete"))
    seen(2)._2 shouldBe Seq.empty
    // a replica folded from the feed now equals the table — the
    // applyFeed-divergence scenario, closed
    table.read().count() shouldBe 2L
  }
  test("graft-lake streaming SINK: writeStream merges each batch exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq((1L, "v1", "A"), (2L, "v2", "A"), (3L, "v3", "A"))
      .toDF("k", "payload", "status")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sinkfmt-ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    def start() = in.toDF().toDF("k", "payload", "status")
      .writeStream.format("graft-lake")
      .option("path", table.root)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    in.addData((1L, "U1", "U"), (9L, "I9", "I"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    rows(table.read().orderBy("k")) shouldBe Seq(
      Seq(1L, "U1", "U"), Seq(2L, "v2", "A"), Seq(3L, "v3", "A"),
      Seq(9L, "I9", "I"))
    // the commit is epoch-tagged under the checkpoint-derived app id: a
    // REPLAY of the same batch is a no-op, not a duplicate snapshot
    val appId = java.lang.Long.toHexString(
      new org.apache.hadoop.fs.Path(ckpt).toString.hashCode & 0xffffffffL)
    table.hasEpoch(0L, appId) shouldBe true
    val vBefore = table.latestVersion
    table.mergeEpoch(Seq((1L, "DUP", "X")).toDF("k", "payload", "status"),
      0L, appId) shouldBe None
    table.latestVersion shouldBe vBefore
    // second batch through a restarted query continues the epoch chain
    in.addData((2L, "U2", "U"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    rows(table.read().filter(col("k") === 2L).select("payload")) shouldBe
      Seq(Seq("U2"))
    // refusal: complete output mode with an explicit non-aggregate mode
    intercept[Exception] {
      in.toDF().toDF("k", "payload", "status")
        .groupBy("k").count()
        .writeStream.format("graft-lake")
        .option("path", table.root)
        .option("mode", "insert")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("x").toString)
        .outputMode("complete").start()
    }.getMessage should include("complete")
  }
  test("graft-lake sink complete mode: each batch replaces the table content") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // seed the result table with a STALE group the aggregation no longer
    // produces — the complete-mode fold must delete it
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(),
      Seq((99L, 1L)).toDF("k", "cnt"), "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-aggsink-ckpt").toString
    val in = MemoryStream[Long]
    def start() = in.toDF().toDF("v")
      .groupBy((col("v") % 3).as("k")).agg(count(lit(1)).as("cnt"))
      .writeStream.format("graft-lake")
      .option("path", table.root)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    in.addData(0L, 1L, 2L, 3L)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // table == the complete aggregate; the stale group 99 is GONE
    rows(table.read().orderBy("k")) shouldBe Seq(
      Seq(0L, 2L), Seq(1L, 1L), Seq(2L, 1L))
    // restart + more data: counts grow (complete mode re-emits all), the
    // fold stays exactly the aggregate — restart exactness
    in.addData(0L, 1L)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    rows(table.read().orderBy("k")) shouldBe Seq(
      Seq(0L, 3L), Seq(1L, 2L), Seq(2L, 1L))
    // a replayed epoch is a no-op (epoch-tagged under the checkpoint id)
    val appId = java.lang.Long.toHexString(
      new org.apache.hadoop.fs.Path(ckpt).toString.hashCode & 0xffffffffL)
    val vBefore = table.latestVersion
    table.replaceAllEpoch(Seq((0L, 777L)).toDF("k", "cnt"), 0L, appId) shouldBe None
    table.latestVersion shouldBe vBefore
  }
  test("graft-lake sink mode=insert: adds-only batches, exactly-once, conflicts fail") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq((1L, "v1"), (2L, "v2")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val v0Files = table.manifest(0).files.map(_.path).toSet
    val ckpt = java.nio.file.Files.createTempDirectory("graft-inssink-ckpt").toString
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("k", "payload")
      .writeStream.format("graft-lake")
      .option("path", table.root)
      .option("checkpointLocation", ckpt)
      .option("mode", "insert")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    // keys INSIDE the existing range: merge mode would rewrite the file,
    // insert mode must append only
    in.addData((10L, "a10"), (11L, "a11"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    table.read().count() shouldBe 4L
    v0Files.subsetOf(
      table.manifest(table.latestVersion).files.map(_.path).toSet) shouldBe true
    // replay is a no-op (epoch-tagged under the checkpoint app id)
    val appId = java.lang.Long.toHexString(
      new org.apache.hadoop.fs.Path(ckpt).toString.hashCode & 0xffffffffL)
    table.hasEpoch(0L, appId) shouldBe true
    // a batch colliding with an existing key fails the QUERY (PK
    // violation — append streams must be genuinely append-only)
    in.addData((1L, "dup"))
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    e.getMessage should include("duplicate existing keys")
    q2.stop()
  }
  test("graft-lake sink auto-binpack folds streaming small files") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = (1L to 60L).map(k => (k, s"v$k")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-abp-ckpt").toString
    val in = MemoryStream[(Long, String)]
    spark.conf.set("spark.graft.lake.autoBinpack.minRows", "10")
    spark.conf.set("spark.graft.lake.autoBinpack.minFiles", "3")
    try {
      def start() = in.toDF().toDF("k", "payload")
        .writeStream.format("graft-lake")
        .option("path", table.root)
        .option("checkpointLocation", ckpt)
        .option("mode", "insert")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      // four single-row appends: after the threshold, the sink folds the
      // slivers into one right-sized file as its own commit
      (1 to 4).foreach { i =>
        in.addData((1000L + i, s"s$i"))
        val q = start()
        try q.processAllAvailable() finally q.stop()
      }
      // the threshold fired mid-stream: slivers folded (the fold itself
      // may still be sub-threshold — it re-packs on the NEXT trigger),
      // so the sliver count stays bounded instead of growing per batch
      val m = table.manifest(table.latestVersion)
      m.files.count(_.rows < 10L) should be <= 2
      table.history().filter(col("operation") === "optimize-binpack")
        .count() should be >= 1L
      table.read().count() shouldBe 64L
      table.read().agg(max("k")).collect()(0).getLong(0) shouldBe 1004L
    } finally {
      spark.conf.unset("spark.graft.lake.autoBinpack.minRows")
      spark.conf.unset("spark.graft.lake.autoBinpack.minFiles")
    }
  }

  test("graft-lake sink refuses a session-conf-only checkpoint (shared appId)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Seq((1L, "v1")).toDF("k", "payload")
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(), base, "k", 1)
    val in = MemoryStream[(Long, String)]
    in.addData((2L, "v2"))
    // only the SESSION-level checkpoint conf: the sink cannot see it, and
    // a root-derived fallback identity would be shared by every query
    // writing this table — epochs of a second writer would read as
    // replays. The sink must refuse to start.
    spark.conf.set("spark.sql.streaming.checkpointLocation",
      java.nio.file.Files.createTempDirectory("graft-conf-ckpt").toString)
    try {
      val e = intercept[Exception] {
        val q = in.toDF().toDF("k", "payload")
          .writeStream.format("graft-lake")
          .option("path", table.root)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      e.getMessage should include("txnAppId")
      // an explicit txnAppId (no writer checkpointLocation) is accepted
      val q2 = in.toDF().toDF("k", "payload")
        .writeStream.format("graft-lake")
        .option("path", table.root)
        .option("txnAppId", "writer-a")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      try q2.processAllAvailable() finally q2.stop()
      table.hasEpoch(0L, "writer-a") shouldBe true
      rows(table.read().orderBy("k")) shouldBe
        Seq(Seq(1L, "v1"), Seq(2L, "v2"))
    } finally spark.conf.unset("spark.sql.streaming.checkpointLocation")
  }
  test("change feed startingTimestamp: everything after a wall-clock moment") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(),
      Seq((1L, "v1")).toDF("k", "payload"), "k", 1)
    table.merge(Seq((2L, "v2")).toDF("k", "payload")) // v1
    val tsAfterV1 = table.history().filter(col("version") === 1)
      .select("commit_ts").collect()(0).getLong(0)
    table.merge(Seq((3L, "v3")).toDF("k", "payload")) // v2
    // a moment at v1's commit: only v2 onward streams
    val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingTimestamp" -> tsAfterV1.toString))
    src.getOffset shouldBe Some(LongOffset(2L))
    val batch = src.getBatch(None, LongOffset(2L))
    batch.columns should contain("_commit_version")
    // a moment BEFORE the table existed replays all history
    val srcAll = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingTimestamp" -> "0"))
    srcAll.getOffset shouldBe Some(LongOffset(2L))
    // both options together refuse
    intercept[IllegalArgumentException] {
      new graft.sources.LakeChangeFeedSource(spark.sqlContext,
        Map("path" -> table.root, "startingVersion" -> "1",
          "startingTimestamp" -> "0"))
    }.getMessage should include("mutually exclusive")
  }

  test("change feed fails loudly when the committed offset was vacuumed") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val table = graft.sources.Lake.create(spark,
      graft.sources.Lake.freshRoot(),
      Seq((1L, "v1")).toDF("k", "payload"), "k", 1)
    (2L to 6L).foreach(k =>
      table.merge(Seq((k, s"v$k")).toDF("k", "payload"))) // v1..v5
    table.vacuum(2) // retains v4, v5 — v0..v3 gone
    val src = new graft.sources.LakeChangeFeedSource(spark.sqlContext,
      Map("path" -> table.root, "startingVersion" -> "1"))
    // a committed offset BELOW the horizon: re-anchoring at an older
    // retained version would re-deliver rows the stream already emitted —
    // the source must refuse instead
    val e = intercept[IllegalStateException] {
      src.getBatch(Some(LongOffset(2L)), LongOffset(5L))
    }
    e.getMessage should include("vacuumed")
    // a RETAINED committed offset still plans AND DELIVERS the tail span:
    // the failed call above delivered nothing, so it must not have raised
    // the delivery floor — v5's rows stream, not an empty batch
    val batch = org.apache.spark.sql.graft.StreamBridge
      .rewrapSourceBatch(src.getBatch(Some(LongOffset(4L)), LongOffset(5L)))
    batch.select("_commit_version").distinct().collect()
      .map(_.getInt(0)).toSeq shouldBe Seq(5)
  }

  test("standing MV refresh composes with min/max: streamed extremum deletes rescan") {
    import graft.sources.{Lake, LakeCatalog, LakeMv}
    spark.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
    val root = Lake.freshRoot()
    val t = Lake.create(spark, root,
      (1L to 40L).map(k => (k, s"g${k % 3}", k.toDouble))
        .toDF("k", "grp", "v"), "k", 2)
    LakeCatalog.register(spark, "smm_base", root)
    LakeMv.create(spark, "smm", "smm_base",
      Seq(LakeMv.GroupItem("grp"),
        LakeMv.AggItem("count_star", "n", ""),
        LakeMv.AggItem("min", "lo", "v"),
        LakeMv.AggItem("max", "hi", "v")),
      None, "CREATE MATERIALIZED VIEW smm AS …")
    val d = LakeMv.parseDef(LakeCatalog.lookupMv(spark, "smm").get)
    def mv() = LakeMv.readDf(spark, d).orderBy("grp").collect().toSeq
    def scratch() = t.read().groupBy("grp")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("grp").collect().toSeq
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-smm-ckpt").toString
    val q = StreamingOps.standingMvRefresh(spark, "smm", ckpt)
    try {
      // new maxima: the standing fold takes the pure greatest path
      t.merge((41L to 46L).map(k => (k, s"g${k % 3}", 1000.0 + k))
        .toDF("k", "grp", "v"))
      q.processAllAvailable()
      mv() shouldBe scratch()
      // delete every group's maximum: the group-scoped rescan must fire
      // INSIDE the standing query's refresh and land the survivor maxima
      t.delete((41L to 46L).map(Tuple1(_)).toDF("k"))
      q.processAllAvailable()
      mv() shouldBe scratch()
      graft.sources.LakeMv.lastRescanGroups should be > 0L
    } finally q.stop()
  }

  test("standing MV refresh drives the FULL r16 grammar: expr key + min/max + count distinct") {
    import graft.sources.{Lake, LakeCatalog, LakeMv}
    spark.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
    val root = Lake.freshRoot()
    val t = Lake.create(spark, root,
      (1L to 60L).map(k => (k, k % 4, s"u${k % 7}", k.toDouble))
        .toDF("k", "b", "u", "v"), "k", 2)
    LakeCatalog.register(spark, "sfull_base", root)
    LakeMv.create(spark, "sfull", "sfull_base",
      Seq(LakeMv.GroupItem("kb", "b % 2"),
        LakeMv.AggItem("count_star", "n", ""),
        LakeMv.AggItem("count_distinct", "nu", "u"),
        LakeMv.AggItem("max", "hi", "v"),
        LakeMv.AggItem("avg", "av", "v")),
      Some("k <= 58"), "CREATE MATERIALIZED VIEW sfull AS …",
      havingSql = Some("n >= 2"))
    val d = LakeMv.parseDef(LakeCatalog.lookupMv(spark, "sfull").get)
    def mv() = LakeMv.readDf(spark, d)
      .select(col("kb"), col("n"), col("nu"), col("hi"),
        round(col("av"), 6).as("av")).orderBy("kb").collect().toSeq
    def scratch() = t.read().filter(col("k") <= 58)
      .withColumn("kb", expr("b % 2")).groupBy("kb")
      .agg(count(lit(1)).as("n"), countDistinct("u").as("nu"),
        max("v").as("hi"),
        round(sum(col("v").cast("decimal(28,10)")).cast("double") /
          count(col("v")), 6).as("av"))
      .filter(col("n") >= 2).orderBy("kb").collect().toSeq
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sfull-ckpt").toString
    val q = StreamingOps.standingMvRefresh(spark, "sfull", ckpt)
    try {
      mv() shouldBe scratch()
      // one interval that exercises EVERYTHING at once: new maxima into
      // one expr-group, a value death, an extremum delete, a NULL-ish…
      t.merge((61L to 66L).map(k => (k, k % 4, "unew", 500.0 + k))
        .toDF("k", "b", "u", "v")) // births 'unew' + new maxima, pure fold
      q.processAllAvailable()
      mv() shouldBe scratch()
      t.delete((61L to 66L).map(Tuple1(_)).toDF("k")) // kills the maxima
      q.processAllAvailable()                          // AND 'unew' dies
      mv() shouldBe scratch()
    } finally q.stop()
  }

  test("standing MV refresh fires on DIM-ONLY commits: the star stays fresh without a fact commit") {
    import graft.sources.{Lake, LakeCatalog, LakeMv}
    spark.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
    val fact = Lake.create(spark, Lake.freshRoot(),
      (1L to 40L).map(k => (k, 1L + k % 4, k.toDouble))
        .toDF("k", "ck", "v"), "k", 2)
    val dim = Lake.create(spark, Lake.freshRoot(),
      (1L to 4L).map(c => (c, s"seg${c % 2}")).toDF("c_id", "seg"),
      "c_id", 1)
    LakeCatalog.register(spark, "sdim_fact", fact.root)
    LakeCatalog.register(spark, "sdim_c", dim.root)
    LakeMv.create(spark, "sdim", "sdim_fact",
      Seq(LakeMv.GroupItem("seg"),
        LakeMv.AggItem("count_star", "n", ""),
        LakeMv.AggItem("sum", "sv", "v")),
      None, "CREATE MATERIALIZED VIEW sdim AS …",
      dimsIn = Seq(("sdim_c", "ck = c_id")))
    val d = LakeMv.parseDef(LakeCatalog.lookupMv(spark, "sdim").get)
    def mv() = LakeMv.readDf(spark, d)
      .select(col("seg"), col("n"), col("sv").cast("decimal(28,10)"))
      .orderBy("seg").collect().toSeq
    def scratch() = fact.read().join(dim.read(), col("ck") === col("c_id"))
      .groupBy("seg").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,10)")).cast("decimal(28,10)").as("sv"))
      .orderBy("seg").collect().toSeq
    def dimsStale() = LakeMv.detailDf(spark, "sdim")
      .select("n_dims_stale").collect()(0).getAs[Int](0)
    val factVersionBefore = fact.latestVersion
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sdim-ckpt").toString
    val q = StreamingOps.standingMvRefresh(spark, "sdim", ckpt)
    try {
      q.processAllAvailable()
      mv() shouldBe scratch()
      // a DIM-ONLY commit — no fact write anywhere — must trigger the
      // refresh by itself: the standing query tails every relation's
      // manifest dir, so the dim phase folds and staleness returns to 0
      dim.merge(Seq((3L, "segX")).toDF("c_id", "seg"))
      q.processAllAvailable()
      dimsStale() shouldBe 0
      mv() shouldBe scratch()
      mv().map(_.getString(0)) should contain("segX")
      fact.latestVersion shouldBe factVersionBefore // truly dim-only
      // and a fact commit still triggers as before
      fact.merge(Seq((41L, 3L, 500.0)).toDF("k", "ck", "v"))
      q.processAllAvailable()
      mv() shouldBe scratch()
    } finally q.stop()
  }

  test("standing refresh composes with CASCADING MVs: upstream refreshes trigger the downstream") {
    import graft.sources.{Lake, LakeCatalog, LakeMv}
    spark.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
    val base = Lake.create(spark, Lake.freshRoot(),
      (1L to 40L).map(k => (k, s"g${k % 4}", 1L + k % 5, k.toDouble))
        .toDF("k", "grp", "ck", "v"), "k", 2)
    LakeCatalog.register(spark, "scc_base", base.root)
    LakeMv.create(spark, "scc_1", "scc_base",
      Seq(LakeMv.GroupItem("grp"), LakeMv.GroupItem("ck"),
        LakeMv.AggItem("count_star", "n1", ""),
        LakeMv.AggItem("sum", "rev", "v")),
      None, "CREATE MATERIALIZED VIEW scc_1 AS …")
    LakeMv.create(spark, "scc_2", "scc_1",
      Seq(LakeMv.GroupItem("grp"),
        LakeMv.AggItem("count_star", "ng", ""),
        LakeMv.AggItem("sum", "total", "rev")),
      None, "CREATE MATERIALIZED VIEW scc_2 AS …")
    val d2 = LakeMv.parseDef(LakeCatalog.lookupMv(spark, "scc_2").get)
    def mv2() = LakeMv.readDf(spark, d2)
      .select(col("grp"), col("ng"), col("total").cast("decimal(28,10)"))
      .orderBy("grp").collect().toSeq
    def scratch() = base.read()
      .groupBy("grp", "ck")
      .agg(sum(col("v").cast("decimal(28,10)")).as("rev"))
      .groupBy("grp")
      .agg(count(lit(1)).as("ng"),
        sum(col("rev").cast("decimal(28,10)")).cast("decimal(28,10)")
          .as("total"))
      .orderBy("grp").collect().toSeq
    // the DOWNSTREAM's standing query tails the UPSTREAM's state root's
    // manifest dir (its base), so an upstream refresh — manual or its
    // own standing query — triggers the downstream fold with no wiring
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-scc-ckpt").toString
    val q = StreamingOps.standingMvRefresh(spark, "scc_2", ckpt)
    try {
      q.processAllAvailable()
      mv2() shouldBe scratch()
      base.merge((41L to 52L).map(k => (k, "g9", 2L, 100.0 + k))
        .toDF("k", "grp", "ck", "v"))
      LakeMv.refresh(spark, "scc_1") // upstream advances → state commit
      q.processAllAvailable()        // → downstream standing fold fires
      mv2() shouldBe scratch()
      mv2().map(_.getString(0)) should contain("g9")
      base.delete((41L to 52L).map(Tuple1(_)).toDF("k")) // g9 dies
      LakeMv.refresh(spark, "scc_1")
      q.processAllAvailable()
      mv2() shouldBe scratch()
      mv2().map(_.getString(0)) should not contain "g9"
    } finally q.stop()
  }

  test("standing MV refresh: base commits advance the MV; restart resumes") {
    import graft.sources.{Lake, LakeCatalog, LakeMv, LakeTable}
    spark.conf.set("spark.graft.catalog.dir", Lake.freshRoot() + "/cat")
    val root = Lake.freshRoot()
    val t = Lake.create(spark, root,
      (1L to 40L).map(k => (k, s"g${k % 3}", k.toDouble))
        .toDF("k", "grp", "v"), "k", 2)
    LakeCatalog.register(spark, "smv_base", root)
    LakeMv.create(spark, "smv", "smv_base",
      Seq(LakeMv.GroupItem("grp"),
        LakeMv.AggItem("count_star", "n", ""),
        LakeMv.AggItem("sum", "sv", "v")),
      None, "CREATE MATERIALIZED VIEW smv AS …")
    val d = LakeMv.parseDef(LakeCatalog.lookupMv(spark, "smv").get)
    def mv() = LakeMv.readDf(spark, d)
      .select(col("grp"), col("n"), col("sv").cast("decimal(28,10)"))
      .orderBy("grp").collect().toSeq
    def scratch() = t.read().groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,10)")).cast("decimal(28,10)").as("sv"))
      .orderBy("grp").collect().toSeq
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-smv-ckpt").toString
    val q = StreamingOps.standingMvRefresh(spark, "smv", ckpt)
    try {
      // two base commits, NO manual REFRESH anywhere in this test
      t.merge((41L to 50L).map(k => (k, "g9", 1.0)).toDF("k", "grp", "v"))
      q.processAllAvailable()
      mv() shouldBe scratch()
      t.delete((41L to 50L).map(Tuple1(_)).toDF("k")) // g9 dies entirely
      q.processAllAvailable()
      mv() shouldBe scratch()
      mv().map(_.getString(0)) should not contain "g9"
    } finally q.stop()
    // restart from the SAME checkpoint: only the new commit triggers, and
    // the refresh picks up exactly where the manifest chain says it is
    t.merge(Seq((7L, "g0", 100.0)).toDF("k", "grp", "v"))
    val q2 = StreamingOps.standingMvRefresh(spark, "smv", ckpt)
    try {
      q2.processAllAvailable()
      mv() shouldBe scratch()
    } finally q2.stop()
  }
}
