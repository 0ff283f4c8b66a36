package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** `spark.readStream.format("graft-lake").load(root)` — the lake's change
  * feed as a REAL structured-streaming source: one micro-batch per span of
  * newly committed versions, offsets ARE version numbers (plus a file
  * index inside a split append commit), so the engine's offset log gives
  * exactly-once delivery across restarts with zero extra bookkeeping (no
  * version replayed, none skipped — the manifest chain is the only log).
  *
  * Options (PINNED AT FIRST START in the checkpoint's source-metadata
  * dir, like the Kafka source's starting offsets — a restart keeps the
  * original start and drains any downtime backlog immediately; changed
  * starting options on an existing checkpoint are ignored):
  *  - `startingVersion` (int): first commit to deliver; default is
  *    `latest + 1` AT FIRST START — stream only what happens after the
  *    stream starts, like every CDC tail. `1` replays all history after
  *    the create.
  *  - `startingTimestamp` (epoch millis or ISO-8601): deliver every
  *    commit AFTER that wall-clock moment (resolved against in-commit
  *    timestamps, like `timestampAsOf`); a moment before the table
  *    existed replays all history. Mutually exclusive with
  *    `startingVersion`.
  *  - `maxVersionsPerTrigger` (int > 0): ADMISSION CONTROL — cap each
  *    micro-batch at that many commits. A stream that starts far behind
  *    a busy table (a `startingVersion 1` backfill, a consumer restarted
  *    after a long outage) otherwise lands its whole lag as ONE batch —
  *    at 100 TB that is an unbounded shuffle and a checkpoint the sink
  *    must swallow whole. Capped, the backfill drains as a sequence of
  *    bounded batches, each its own committed offset: progress is
  *    incremental, restart loses at most one span, and sink pressure is
  *    constant.
  *  - `maxRowsPerTrigger` (long > 0) / `maxFilesPerTrigger` (int > 0):
  *    admission WITHIN a commit. A version cap bounds commits, but one
  *    huge commit (a bulk backfill append) still lands as a single
  *    batch. For PURE-APPEND commits (adds only — no removes, no
  *    tombstone changes: the only shape whose feed decomposes by file)
  *    these caps split the commit's add-files across micro-batches,
  *    decided from the manifest's per-file row counts alone; offsets
  *    extend to `(version, fileIndex)` so exactly-once survives
  *    restarts mid-commit. Rewriting commits (merge, delete, compact)
  *    stay atomic — their pre/post diff is not file-separable — so a
  *    batch is bounded by max(caps, largest single rewrite); an atomic
  *    commit's cost against the budget is the upper bound of its FEED
  *    (adds + tombstone adds + removed-file rows), so delete-heavy
  *    backlogs (whose commits add nothing) drain bounded too. Every
  *    batch admits at least one file or one commit: progress is
  *    guaranteed even when a single unit exceeds the budget.
  *
  * All three caps COMPOSE; a batch closes at the first exhausted budget.
  * Restart-safe by the engine's own contract — on recovery the last
  * batch is re-handed to `getBatch` BEFORE new offsets are requested,
  * which re-seats the admission anchor above everything the checkpoint
  * already committed (no unit skipped, none re-delivered).
  *
  * Output schema: the table's data schema + `_change_type` (the standard
  * CDF vocabulary) + `_commit_version` (which commit produced the row).
  *
  * RENAMES MID-STREAM are normalized: the stream's schema is fixed at
  * start (the Delta CDF contract — restart to adopt new names), and each
  * span's columns are matched to it by PHYSICAL identity through that
  * version's column map. A column renamed after the stream started keeps
  * feeding under its start-of-stream name; columns added later are not
  * emitted until restart; columns dropped later feed null.
  *
  * Merge-on-read versions (outstanding `deleteDeferred` tombstones) are
  * first-class: `LakeTable.changes` diffs the EFFECTIVE (tombstone-
  * applied) endpoint relations, so a deferred delete's events arrive
  * with the deferred-delete commit itself — correct per-commit
  * attribution, no waiting for the folding compact (the deletion-vector
  * CDF shape). Vacuumed stretches are bridged: the next retained
  * version's span diffs across them.
  *
  * Scale shape: per micro-batch, the plan reads only files added/removed
  * by the covered commits (the manifest diff, plus tombstone-range-
  * intersecting carried files when a deferred delete landed), so a quiet
  * 100 TB table streams for free and a busy one pays
  * proportional-to-change — and with the row/file caps, never more than
  * the configured batch budget at once. */
class LakeChangeFeedSource(sqlContext: SQLContext,
                           parameters: Map[String, String],
                           metadataPath: Option[String] = None)
    extends Source with org.apache.spark.internal.Logging {

  private val spark: SparkSession = sqlContext.sparkSession
  private val root = parameters.getOrElse("path",
    throw new IllegalArgumentException(
      "graft-lake stream requires a path: readStream.format(\"graft-lake\").load(<root>)"))
  private val table = new LakeTable(spark, root)
  require(!(parameters.contains("startingVersion") &&
      parameters.contains("startingTimestamp")),
    "startingVersion and startingTimestamp are mutually exclusive")

  private def metaFs = metadataPath.map(p =>
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration))
  private def markerPath(name: String) = metadataPath.map(p =>
    new org.apache.hadoop.fs.Path(p, name))
  private def readMarker(name: String): Option[String] =
    (metaFs, markerPath(name)) match {
      case (Some(fs), Some(p)) => Lake.readMarkerFile(fs, p)
      case _ => None
    }
  /** Marker writes are LOUD, not best-effort: both markers are
    * load-bearing for exactly-once. A silently-lost `graft-start` lets a
    * restart re-pin `latest + 1` ABOVE a backlog (skipping versions the
    * engine's re-handed batch expects this source to serve); a
    * silently-lost high-water mark lets admission seed BELOW the
    * engine's committed offset after a crash, and MicroBatchExecution
    * compares offsets only for inequality — a low offer becomes a new
    * batch end and later spans re-deliver. Failing the query is the
    * honest answer when the checkpoint dir can't persist state. */
  private def writeMarker(name: String, v: String, overwrite: Boolean): Unit =
    (metaFs, markerPath(name)) match {
      case (Some(fs), Some(p)) =>
        fs.mkdirs(p.getParent)
        val out = fs.create(p, overwrite)
        try out.write(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      case _ => ()
    }

  /** The first version to deliver — PINNED AT FIRST START in the
    * checkpoint's source-metadata dir (the V1 `metadataPath` contract,
    * same as the Kafka source's starting offsets): the "everything after
    * the stream starts" default must not re-resolve to a NEW latest on
    * restart, or the downtime backlog between checkpoint and restart
    * would wait for the next commit instead of draining immediately.
    * Changed starting options on an existing checkpoint are ignored, by
    * design. */
  private val startingVersion: Int =
    readMarker("graft-start").map(_.toInt).getOrElse {
      val v = parameters.get("startingVersion").map(_.toInt)
        .orElse(parameters.get("startingTimestamp").map { ts =>
          // everything AFTER the moment: the version current AT ts is the
          // last one already visible then — start one past it. A moment
          // before the first retained commit replays all history.
          val millis = Lake.parseTsMillis(ts)
          try table.versionAt(millis) + 1
          catch { case _: IllegalArgumentException => 1 }
        })
        .getOrElse(table.latestVersion + 1)
      writeMarker("graft-start", v.toString, overwrite = false)
      v
    }
  private val maxVersionsPerTrigger: Option[Int] =
    parameters.get("maxVersionsPerTrigger").map(_.toInt)
  require(maxVersionsPerTrigger.forall(_ > 0),
    "maxVersionsPerTrigger must be a positive integer")
  private val maxRowsPerTrigger: Option[Long] =
    parameters.get("maxRowsPerTrigger").map(_.toLong)
  require(maxRowsPerTrigger.forall(_ > 0),
    "maxRowsPerTrigger must be a positive integer")
  private val maxFilesPerTrigger: Option[Int] =
    parameters.get("maxFilesPerTrigger").map(_.toInt)
  require(maxFilesPerTrigger.forall(_ > 0),
    "maxFilesPerTrigger must be a positive integer")
  /** Whether commits may split at file granularity at all. */
  private val splitCaps = maxRowsPerTrigger.isDefined ||
    maxFilesPerTrigger.isDefined

  /** Stream position: `file == COMPLETE` ⇒ every unit of `version` (and
    * everything before it) delivered; otherwise versions < `version`
    * delivered plus add-files `0..file` of `version`. */
  private val COMPLETE = Int.MaxValue
  private case class Pos(version: Int, file: Int) {
    def lt(o: Pos): Boolean =
      version < o.version || (version == o.version && file < o.file)
    def max(o: Pos): Pos = if (lt(o)) o else this
  }

  private def decodeStr(s: String): Pos = {
    val cut = s.indexOf(':')
    if (cut < 0) Pos(s.toInt, COMPLETE)
    else Pos(s.substring(0, cut).toInt, s.substring(cut + 1).toInt)
  }

  /** Highest position this source has offered (getOffset) or seen
    * processed (getBatch — the engine re-hands the recovered batch's
    * offsets here on restart, before asking for new ones). Admission
    * extends from this anchor, so a capped stream never re-offers below
    * what the checkpoint committed. On RESTART it seeds from the
    * high-water marker this source maintains in `metadataPath` —
    * persisted AT OFFER TIME in [[getOffset]], before the offer is
    * returned, so the marker is always ≥ anything the engine could have
    * committed (the engine only commits offered ends). A marker ABOVE
    * the engine's committed offset is safe: it only sizes admission
    * (one span may exceed the caps — the pre-existing unbounded-drain
    * shape), while delivery stays engine-authoritative. A marker BELOW
    * committed would NOT be safe — MicroBatchExecution compares offsets
    * only for inequality, so a low offer would become a new batch end
    * and later spans would re-deliver — which is why the marker write
    * happens before the offer and loudly ([[writeMarker]]), never
    * after-the-fact in [[commit]]. */
  private var admitted: Pos =
    readMarker("graft-committed").map(decodeStr)
      .getOrElse(Pos(startingVersion - 1, COMPLETE))

  /** Whether [[admitted]] was seeded from the persisted marker. The
    * marker is written at OFFER time, so after a crash BETWEEN the offer
    * and the engine logging it, it sits ABOVE the engine's committed
    * offset with no uncommitted batch to re-hand — safe for exactly-once
    * but a LIVENESS hole: nothing below the marker would ever be offered
    * again, stalling delivery of the gap until some future table commit.
    * The heal: the FIRST getOffset after a marker-seeded start re-offers
    * the marker position itself when it has nothing new — an offer equal
    * to the engine's committed offset is ignored (the engine compares
    * offsets for inequality), and an offer above it runs exactly the
    * undelivered gap as one batch. */
  private var healMarkerOffer: Boolean =
    readMarker("graft-committed").isDefined

  /** Whether the engine has asked for an offset yet. A getBatch BEFORE
    * any getOffset is the RESTART re-hand — there the checkpoint's end,
    * not the construction-time default anchor (latest+1, which may sit
    * ABOVE a backlog accumulated while the stream was down), is the true
    * position: re-seat admission exactly, so the post-restart backlog
    * drains under the caps instead of as one unbounded batch. (The
    * anchor can never cause a skip either way — the engine's own start
    * offset is authoritative for delivery; this only sizes admission.) */
  private var offsetAsked = false

  override val schema: StructType =
    LakeChangeFeedSource.feedSchema(spark, root)

  /** The stream's fixed logical names keyed by PHYSICAL identity, taken
    * at stream start — the rename-normalization table (see class doc). */
  private val fixedByPhysical: Map[String, String] = {
    val m = table.manifest(table.latestVersion)
    schema.fields.iterator
      .map(_.name)
      .filterNot(n => n == "_change_type" || n == "_commit_version")
      .map(n => m.columnMap.getOrElse(n, n) -> n)
      .toMap
  }

  // pin the stream's DATA schema next to the starting options: the
  // operational surface (graft_lake_stream_detail / Lake.streamDetail)
  // compares it against the table's CURRENT schema to answer "is this
  // stream's pinned shape behind the table?" without touching the source.
  // REWRITTEN on every construction, not only when absent: construction
  // IS the re-pin point (feedSchema resolves the table's current latest),
  // so a restart that adopts a mid-stream evolution must move the marker
  // with it — a stale first-start DDL would report stream_schema_behind
  // forever, contradicting the "restart to adopt" contract.
  locally {
    val dataDdl = StructType(schema.fields.filterNot(f =>
      f.name == "_change_type" || f.name == "_commit_version")).toDDL
    writeMarker("graft-schema", dataDdl, overwrite = true)
  }

  /** Versions whose span revealed SCHEMA DRIFT beyond the pinned stream
    * schema, with a description — populated by [[aligned]], logged
    * loudly ONCE per version, and exposed for specs/operators. The feed
    * itself stays on the pinned shape by contract (restart to adopt);
    * this is the operational signal that a restart is due. */
  @volatile private[graft] var driftDetected: Map[Int, String] = Map.empty

  /** The table version the stream's schema was pinned AT (this
    * construction — a restart re-pins from the then-current latest).
    * Spans at or below it are history replaying under an evolved pin,
    * not drift. */
  private val pinVersion = table.latestVersion

  private def noteDrift(v: Int, mv: Lake.Manifest): Unit = {
    if (v <= pinVersion || driftDetected.contains(v)) return
    val spanFields = mv.schemaDdl
      .map(d => StructType.fromDDL(d).fields.toSeq).getOrElse(Nil)
    val fixedTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val rev = mv.columnMap.map(_.swap)
    val added = spanFields.filterNot(f => fixedByPhysical.contains(f.name))
      .map(f => rev.getOrElse(f.name, f.name))
    val spanByPhys = spanFields.map(f => f.name -> f.dataType).toMap
    val dropped = fixedByPhysical.collect {
      case (p, n) if !spanByPhys.contains(p) => n }.toSeq
    val widened = fixedByPhysical.collect {
      case (p, n) if spanByPhys.get(p).exists(dt =>
        fixedTypes.get(n).exists(_ != dt)) => n }.toSeq
    if (added.nonEmpty || dropped.nonEmpty || widened.nonEmpty) {
      val parts = Seq(
        if (added.nonEmpty)
          Some(s"columns added after stream start (not emitted): " +
            added.mkString(", "))
        else None,
        if (dropped.nonEmpty)
          Some(s"columns dropped after stream start (feeding null): " +
            dropped.mkString(", "))
        else None,
        if (widened.nonEmpty)
          Some(s"columns type-widened after stream start (out-of-range " +
            s"values feed null): " + widened.mkString(", "))
        else None).flatten
      val msg = parts.mkString("; ")
      driftDetected += v -> msg
      logWarning(s"graft-lake stream at $root: pinned schema is BEHIND " +
        s"the table schema from version $v — $msg. Restart the stream " +
        "on the same checkpoint to adopt the evolved shape.")
    }
  }

  private def decode(o: Offset): Pos = o match {
    case LongOffset(v) => Pos(v.toInt, COMPLETE)
    case other => decodeStr(other.json.trim)
  }

  private case class FilePosOffset(version: Int, file: Int) extends Offset {
    override def json: String = s"$version:$file"
  }

  private def encode(p: Pos): Offset =
    if (p.file == COMPLETE) LongOffset(p.version.toLong)
    else FilePosOffset(p.version, p.file)

  /** Pure-append commits are the only file-separable feed shape. */
  private def pureAppend(d: Lake.Delta): Boolean =
    !d.full && d.removes.isEmpty && d.tombstoneAdds.isEmpty &&
      d.tombstoneRemoves.isEmpty && d.adds.nonEmpty

  /** Upper bound on the rows an ATOMIC commit's feed can emit, for the
    * row budget. Adds alone undercount: a deferred-delete commit
    * (tombstoneAdds only) emits one delete event per tombstone row, and
    * a rewriting commit emits update/delete events for rows in its
    * REMOVED files — counting only adds would let a run of stacked
    * delete commits coalesce into one unbounded batch. Removed-file row
    * counts come from the parent manifest (cached, metadata-only); a
    * vacuumed parent falls back to adds+tombstones (that commit then
    * admits alone via the progress guarantee — bounded by one commit,
    * never by a run of them). Pure compactions overcount (their feed is
    * empty) — harmless: admission caps may under-fill a batch, never
    * overflow it. */
  private def commitCost(d: Lake.Delta): Long = {
    val addRows = d.adds.map(_.rows).sum
    val tombRows = d.tombstoneAdds.map(_.rows).sum
    val removeRows =
      if (d.parentVersion < 0 || !table.hasVersion(d.parentVersion)) 0L
      else if (d.full) table.manifest(d.parentVersion).files.map(_.rows).sum
      else if (d.removes.nonEmpty) {
        val byPath = table.manifest(d.parentVersion).files
          .map(f => f.path -> f.rows).toMap
        d.removes.map(p => byPath.getOrElse(p, 0L)).sum
      } else 0L
    addRows + tombRows + removeRows
  }

  override def getOffset: Option[Offset] = {
    val o = computeOffset()
    // first ask after a marker-seeded start: heal a possible
    // offered-but-never-logged gap (see [[healMarkerOffer]])
    val healed =
      if (o.isDefined || !healMarkerOffer) o
      else if (admitted.version >= startingVersion) Some(encode(admitted))
      else None
    healMarkerOffer = false
    healed
  }

  private def computeOffset(): Option[Offset] = {
    offsetAsked = true
    val latest = table.latestVersion
    // no caps: offer everything outstanding in O(1) — no delta reads
    if (!splitCaps && maxVersionsPerTrigger.isEmpty) {
      val target = Pos(latest, COMPLETE)
      return if (admitted.lt(target) && latest >= startingVersion) {
        admitted = admitted.max(target)
        persistHighWater(admitted)
        Some(encode(target))
      } else None
    }
    var cur = admitted
    var rowsBudget = maxRowsPerTrigger.getOrElse(Long.MaxValue)
    var filesBudget = maxFilesPerTrigger.getOrElse(Int.MaxValue)
    var versionsBudget = maxVersionsPerTrigger.getOrElse(Int.MaxValue)
    var progressed = false
    var stop = false
    while (!stop) {
      if (cur.file != COMPLETE) {
        // inside a split commit: admit its next add-file
        val adds = table.commitDeltaOf(cur.version).adds
        if (cur.file >= adds.size - 1) cur = Pos(cur.version, COMPLETE)
        else {
          val fe = adds(cur.file + 1)
          if (progressed && (fe.rows > rowsBudget || filesBudget < 1))
            stop = true
          else {
            cur = Pos(cur.version, cur.file + 1)
            rowsBudget -= fe.rows; filesBudget -= 1; progressed = true
          }
        }
      } else if (cur.version >= latest || versionsBudget < 1) stop = true
      else {
        val nv = cur.version + 1
        if (!table.hasVersion(nv)) cur = Pos(nv, COMPLETE) // vacuumed: free
        else {
          val d = table.commitDeltaOf(nv)
          if (splitCaps && pureAppend(d)) {
            // enter a splittable commit only if its first file admits
            // (or nothing admitted yet — the progress guarantee)
            if (progressed &&
                (d.adds.head.rows > rowsBudget || filesBudget < 1))
              stop = true
            else { cur = Pos(nv, -1); versionsBudget -= 1 }
          } else {
            val cost = commitCost(d)
            val fileCost = d.adds.size + d.tombstoneAdds.size
            if (progressed &&
                (cost > rowsBudget || fileCost > filesBudget))
              stop = true
            else {
              cur = Pos(nv, COMPLETE)
              rowsBudget -= cost; filesBudget -= fileCost
              versionsBudget -= 1; progressed = true
            }
          }
        }
      }
    }
    if (!progressed) None
    else {
      admitted = admitted.max(cur)
      persistHighWater(admitted)
      Some(encode(cur))
    }
  }

  /** Durably record the admission high-water mark BEFORE the offer is
    * returned (see [[admitted]] for why offer-time, not commit-time). */
  private def persistHighWater(p: Pos): Unit =
    writeMarker("graft-committed",
      if (p.file == COMPLETE) p.version.toString else s"${p.version}:${p.file}",
      overwrite = true)

  /** Normalize one span's frame to the stream's FIXED schema: match
    * columns by physical identity through `v`'s column map (rename
    * normalization), stamp `_commit_version`, null-fill columns this
    * span doesn't know. Binding is STRICTLY by physical identity: a
    * span column whose physical storage the stream's start never saw
    * (added — or dropped-and-re-added onto fresh storage — after the
    * start) must NOT leak into a fixed field that merely shares its
    * name; it stays unbound until restart, and the fixed field feeds
    * null, exactly as the class doc promises. */
  private def aligned(f: DataFrame, v: Int): DataFrame = {
    val mv = table.manifest(v)
    noteDrift(v, mv)
    val byFixedName: Map[String, String] = f.columns.iterator.flatMap { c =>
      if (c == "_change_type") Some(c -> c)
      else fixedByPhysical.get(mv.columnMap.getOrElse(c, c)).map(_ -> c)
    }.toMap
    val cols = schema.fields.map { fld =>
      if (fld.name == "_commit_version")
        lit(v).cast(fld.dataType).as(fld.name)
      else byFixedName.get(fld.name) match {
        // try_cast, not cast: a mid-stream TYPE WIDENING (merge or ALTER
        // COLUMN) makes later spans carry values the stream's fixed
        // narrower type cannot hold — a plain cast silently WRAPS them;
        // null is the honest answer, same as every other
        // "restart to adopt the evolution" case
        case Some(c) => col(c).try_cast(fld.dataType).as(fld.name)
        case None => lit(null).cast(fld.dataType).as(fld.name)
      }
    }
    f.select(cols.toSeq: _*)
  }

  /** Streaming-safe empty micro-batch in the feed schema. */
  private def emptyBatch(): DataFrame =
    org.apache.spark.sql.graft.StreamBridge.streamingDataFrame(
      spark,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .queryExecution.toRdd,
      schema)

  /** Highest position this instance has DELIVERED (handed to the engine
    * as a batch end, or seen already-delivered as a regressed batch
    * start). Distinct from [[admitted]], which sizes admission: the floor
    * guards DELIVERY. After the engine logs a regressed end (see below),
    * its NEXT batch starts from that low end — serving that span verbatim
    * would re-emit everything between the low end and what this source
    * already delivered. Every batch start clamps up to the floor instead.
    * In-memory only by design: a fresh instance's floor starts below the
    * checkpoint, so the restart re-hand of the last uncommitted batch
    * (which the engine owns and MUST be served) passes unclamped. */
  private var deliveryFloor: Pos = Pos(startingVersion - 1, COMPLETE)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val rawFrom = start.map(decode).getOrElse(Pos(startingVersion - 1, COMPLETE))
    val to = decode(end)
    // A regressed end (to < from) can only come from a checkpoint whose
    // high-water marker lagged the engine's commit log (markers written
    // by a pre-offer-time-persistence version of this source). Everything
    // at or below `from` was already delivered: raise the delivery floor
    // to `from`, re-seat admission, and emit nothing — the floor is what
    // keeps the FOLLOW-UP batch (whose start the engine takes from the
    // regressed end it just logged) from re-delivering the gap.
    if (to.lt(rawFrom)) {
      admitted = admitted.max(rawFrom)
      deliveryFloor = deliveryFloor.max(rawFrom)
      return emptyBatch()
    }
    admitted =
      if (!offsetAsked && start.isDefined) to // restart re-hand: exact re-seat
      else admitted.max(to)
    // clamp the span's start up to the floor: positions at or below it
    // were already delivered by THIS instance and must not re-emit
    val from = rawFrom.max(deliveryFloor)
    if (!from.lt(to)) // the whole span is at or below the floor (≤ to)
      return emptyBatch()
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // per-commit micro-spans over the RETAINED versions in (from, to] —
    // tombstoned (merge-on-read) versions serve their own feed (changes
    // is tombstone-aware); vacuumed stretches INSIDE the span are bridged
    // by the next retained version (the anchor carries across them). The
    // INITIAL from being vacuumed is different: everything at or below it
    // was already DELIVERED (the offset log committed it), so re-diffing
    // from an older retained version would re-emit (olderAnchor, from] —
    // duplicate rows in an exactly-once feed. Fail loudly instead, like
    // the no-anchor case.
    var anchor =
      if (from.version < 0 || table.hasVersion(from.version)) from.version
      else throw new IllegalStateException(
        s"lake stream at $root: committed offset v${from.version} was " +
          "vacuumed — re-anchoring below it would re-deliver changes this " +
          "stream already emitted; keep vacuum retention above the " +
          "stream's lag, or restart on a fresh checkpoint with a " +
          "startingVersion inside retained history")
    // 1) the REMAINDER of a commit split across batches: files
    //    (from.file, hi] of from.version as insert slices
    if (from.file != COMPLETE) {
      val adds = table.commitDeltaOf(from.version).adds
      val hi =
        if (to.version == from.version && to.file != COMPLETE) to.file
        else adds.size - 1
      if (hi > from.file)
        parts += aligned(table.insertSliceFeed(from.version,
          adds.slice(from.file + 1, hi + 1)), from.version)
      // after draining its tail, from.version anchors the next span
    }
    // 2) fully-covered versions: per-commit manifest diffs
    val lastFull = if (to.file == COMPLETE) to.version else to.version - 1
    ((from.version + 1) to lastFull).foreach { v =>
      if (table.hasVersion(v)) {
        val d = table.commitDeltaOf(v)
        // v0 (create) has no parent: diff against itself emits nothing,
        // matching "the create commit emits nothing" — unless the caller
        // asked to replay from v0, where changes(0, v) IS the history.
        // Pure-append commits skip the diff join entirely (same rows).
        val f =
          if (pureAppend(d) && anchor == v - 1)
            table.insertSliceFeed(v, d.adds)
          else table.changes(math.max(anchor, 0), v)
        parts += aligned(f, v)
        anchor = v
      }
    }
    // 3) the admitted HEAD of a commit still mid-split: files [0, to.file]
    if (to.file != COMPLETE && to.version > from.version) {
      val adds = table.commitDeltaOf(to.version).adds
      parts += aligned(table.insertSliceFeed(to.version,
        adds.slice(0, to.file + 1)), to.version)
    }
    val batch =
      if (parts.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else parts.reduce(_ unionByName _)
    // the floor advances only AFTER the span is successfully planned: a
    // getBatch that throws mid-construction (vacuumed anchor) delivered
    // nothing, and marking its positions delivered would silently empty
    // every later span at or below them
    deliveryFloor = deliveryFloor.max(to)
    org.apache.spark.sql.graft.StreamBridge.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema)
  }

  /** Nothing to do: the admission high-water mark is persisted at OFFER
    * time ([[persistHighWater]]) — writing the committed position here
    * would be at best redundant and at worst (a failed write after the
    * engine's commit log is already durable) the seed of a
    * below-committed admission anchor on restart. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

object LakeChangeFeedSource {
  /** The stream's fixed schema, derived from the table's CURRENT snapshot
    * at stream (or schema-inquiry) time. A table that widens or renames
    * mid-stream keeps feeding the shape the stream started with (renamed
    * columns normalize back by physical identity); restart to pick up
    * new columns or names — the same contract as Delta's CDF stream. */
  def feedSchema(spark: SparkSession, root: String): StructType = {
    val t = new LakeTable(spark, root)
    val m = t.manifest(t.latestVersion)
    require(m.files.nonEmpty || m.schemaDdl.nonEmpty,
      "cannot stream an empty lake table with no recorded schema " +
        "(commit data first, then start the stream)")
    StructType(t.snapshot(t.latestVersion).schema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", IntegerType, nullable = false)))
  }
}
