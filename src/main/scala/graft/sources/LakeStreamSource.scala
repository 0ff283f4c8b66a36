package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** `spark.readStream.format("graft-lake").load(root)` — the lake's change
  * feed as a REAL structured-streaming source: one micro-batch per span of
  * newly committed versions, offsets ARE version numbers, so the engine's
  * offset log gives exactly-once delivery across restarts with zero extra
  * bookkeeping (no version replayed, none skipped — the manifest chain is
  * the only log).
  *
  * Options:
  *  - `startingVersion` (int): first commit to deliver; default is
  *    `latest + 1` — stream only what happens AFTER the stream starts,
  *    like every CDC tail. `1` replays all history after the create.
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
  *    constant. Restart-safe by the engine's own contract — on recovery
  *    the last batch is re-handed to `getBatch` BEFORE new offsets are
  *    requested, which re-seats the admission anchor above everything
  *    the checkpoint already committed (no version skipped, none
  *    re-delivered).
  *
  * Output schema: the table's data schema + `_change_type` (the standard
  * CDF vocabulary) + `_commit_version` (which commit produced the row).
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
  * proportional-to-change. */
class LakeChangeFeedSource(sqlContext: SQLContext,
                           parameters: Map[String, String]) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession
  private val root = parameters.getOrElse("path",
    throw new IllegalArgumentException(
      "graft-lake stream requires a path: readStream.format(\"graft-lake\").load(<root>)"))
  private val table = new LakeTable(spark, root)
  require(!(parameters.contains("startingVersion") &&
      parameters.contains("startingTimestamp")),
    "startingVersion and startingTimestamp are mutually exclusive")
  private val startingVersion: Int =
    parameters.get("startingVersion").map(_.toInt)
      .orElse(parameters.get("startingTimestamp").map { ts =>
        // everything AFTER the moment: the version current AT ts is the
        // last one already visible then — start one past it. A moment
        // before the first retained commit replays all history.
        val millis = Lake.parseTsMillis(ts)
        try table.versionAt(millis) + 1
        catch { case _: IllegalArgumentException => 1 }
      })
      .getOrElse(table.latestVersion + 1)
  private val maxVersionsPerTrigger: Option[Int] =
    parameters.get("maxVersionsPerTrigger").map(_.toInt)
  require(maxVersionsPerTrigger.forall(_ > 0),
    "maxVersionsPerTrigger must be a positive integer")

  /** Highest version this source has offered (getOffset) or seen
    * processed (getBatch — the engine re-hands the recovered batch's
    * offsets here on restart, before asking for new ones). The admission
    * cap extends from this anchor, so a capped stream never re-offers
    * below what the checkpoint committed. */
  private var admitted: Int = startingVersion - 1

  override val schema: StructType =
    LakeChangeFeedSource.feedSchema(spark, root)

  private def ver(o: Offset): Int = o match {
    case LongOffset(v) => v.toInt
    case other => other.json.trim.toInt
  }

  override def getOffset: Option[Offset] = {
    val latest = table.latestVersion
    val capped =
      maxVersionsPerTrigger.fold(latest)(m => math.min(latest, admitted + m))
    if (capped >= startingVersion) {
      admitted = math.max(admitted, capped)
      Some(LongOffset(capped.toLong))
    } else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion - 1)
    admitted = math.max(admitted, ver(end))
    val to = ver(end)
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
      if (from < 0 || table.hasVersion(from)) from
      else throw new IllegalStateException(
        s"lake stream at $root: committed offset v$from was vacuumed — " +
          "re-anchoring below it would re-deliver changes this stream " +
          "already emitted; keep vacuum retention above the stream's lag, " +
          "or restart on a fresh checkpoint with a startingVersion inside " +
          "retained history")
    ((from + 1) to to).foreach { v =>
      if (table.hasVersion(v)) {
        val f = table.changes(math.max(anchor, 0), v)
        // v0 (create) has no parent: diff against itself emits nothing,
        // matching "the create commit emits nothing" — unless the caller
        // asked to replay from v0, where changes(0, v) IS the history
        // align to the FIXED stream schema: columns this span's files
        // don't know yet (pre-evolution intervals) become typed nulls
        val aligned = schema.fields.map { fld =>
          if (fld.name == "_commit_version")
            lit(v).cast(fld.dataType).as(fld.name)
          else if (f.columns.contains(fld.name))
            col(fld.name).cast(fld.dataType).as(fld.name)
          else lit(null).cast(fld.dataType).as(fld.name)
        }
        parts += f.select(aligned.toSeq: _*)
        anchor = v
      }
    }
    val batch =
      if (parts.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else parts.reduce(_ unionByName _)
    org.apache.spark.sql.graft.StreamBridge.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object LakeChangeFeedSource {
  /** The stream's fixed schema, derived from the table's CURRENT snapshot
    * at stream (or schema-inquiry) time. A table that widens mid-stream
    * keeps feeding the shape the stream started with; restart to pick up
    * new columns — the same contract as Delta's CDF stream. */
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
