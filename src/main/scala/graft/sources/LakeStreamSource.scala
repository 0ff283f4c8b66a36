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
  *
  * Output schema: the table's data schema + `_change_type` (the standard
  * CDF vocabulary) + `_commit_version` (which commit produced the row).
  *
  * Merge-on-read versions (outstanding `deleteDeferred` tombstones) are
  * BRIDGED, not fatal and not lossy: a file-diff feed cannot see through
  * read-time tombstones, so the offset simply waits at the last clean
  * version and the folding compact's span diffs ACROSS the tombstone
  * commits — the deferred delete's net effect arrives exactly once, with
  * the compact. (`LakeTable.changes` refuses the same endpoints loudly;
  * a streaming query must instead survive a deferred delete landing on
  * the table it tails.) Vacuumed stretches skip until both endpoints
  * exist again.
  *
  * Scale shape: per micro-batch, the plan reads only files added/removed
  * by the covered commits (the manifest diff), so a quiet 100 TB table
  * streams for free and a busy one pays proportional-to-change. */
class LakeChangeFeedSource(sqlContext: SQLContext,
                           parameters: Map[String, String]) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession
  private val root = parameters.getOrElse("path",
    throw new IllegalArgumentException(
      "graft-lake stream requires a path: readStream.format(\"graft-lake\").load(<root>)"))
  private val table = new LakeTable(spark, root)
  private val startingVersion: Int =
    parameters.get("startingVersion").map(_.toInt)
      .getOrElse(table.latestVersion + 1)

  override val schema: StructType =
    LakeChangeFeedSource.feedSchema(spark, root)

  private def ver(o: Offset): Int = o match {
    case LongOffset(v) => v.toInt
    case other => other.json.trim.toInt
  }

  private def isClean(v: Int): Boolean =
    table.hasVersion(v) && table.manifest(v).tombstones.isEmpty

  /** Offsets only ever land on CLEAN (tombstone-free) versions: a span
    * ending in a merge-on-read version cannot serve a file-diff feed, so
    * the offset waits there and the folding compact advances it — the
    * deferred delete's net effect arrives with the compact's span instead
    * of being silently dropped between two skipped hops. */
  override def getOffset: Option[Offset] = {
    val latest = table.latestVersion
    (latest to startingVersion by -1).find(isClean)
      .map(v => LongOffset(v.toLong))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion - 1)
    val to = ver(end)
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // per-commit micro-spans over the clean versions in (from, to]; MOR
    // versions in between are BRIDGED (the next clean span diffs across
    // them), vacuumed stretches skip until both endpoints exist again.
    // COMMITTED offsets are always clean (getOffset's contract), but the
    // INITIAL from can land on a tombstoned version (default
    // startingVersion−1 when the table's latest commit is a deferred
    // delete): anchor at the nearest clean version at or below it, so the
    // folding compact's first span still delivers those deletes instead
    // of silently dropping them
    var lastClean =
      if (from < 0 || isClean(from)) from
      else (from to 0 by -1).find(isClean).getOrElse(
        // no clean version at or below the anchor exists (vacuum took the
        // history): anchoring AT `from` would silently drop every change
        // up to the first clean version — fail loudly instead; restart
        // with a startingVersion inside retained history
        throw new IllegalStateException(
          s"lake stream at $root: no clean (tombstone-free) version exists " +
            s"at or below offset $from — history below it was vacuumed; " +
            "restart the stream with a startingVersion inside retained " +
            "history (a silent anchor here would drop the span up to the " +
            "first clean version)"))
    ((from + 1) to to).foreach { v =>
      if (isClean(v)) {
        if (lastClean < 0 || isClean(lastClean)) {
          val f = table.changes(math.max(lastClean, 0), v)
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
        }
        lastClean = v
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
    require(m.files.nonEmpty,
      "cannot stream an empty lake table: no data schema to derive " +
        "(commit data first, then start the stream)")
    StructType(t.snapshot(t.latestVersion).schema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", IntegerType, nullable = false)))
  }
}
