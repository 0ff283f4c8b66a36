package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft-lake")` — the lake as a first-class Spark
  * data source, so SQL/DataFrame users read snapshots without touching
  * the [[LakeTable]] API:
  *
  * {{{
  * spark.read.format("graft-lake").load(root)                    // latest
  * spark.read.format("graft-lake")
  *      .option("versionAsOf", 3).load(root)                     // time travel
  * }}}
  *
  * Implemented as a V1 `RelationProvider` that resolves the snapshot's
  * manifest and hands back the underlying multi-file parquet relation —
  * deliberately, because that plans as an ordinary `LogicalRelation` over
  * `HadoopFsRelation`, which is exactly the shape [[LakeManifestPrune]]
  * matches: format reads get manifest data skipping, parquet pushdown,
  * and vectorized scanning for free. (A DSv2 Table would need its own
  * scan builder and would bypass the prune rule.)
  *
  * Tombstoned snapshots (outstanding [[LakeTable.deleteDeferred]]) refuse
  * loudly — a V1 BaseRelation is just a file relation and cannot carry
  * the read-time anti-join, and silently resurrecting deleted rows is
  * worse than refusing. (The API read, the table functions, and the
  * change feed all apply tombstones; this is the one surface that
  * structurally cannot.) Compact first.
  *
  * The STREAMING half (`spark.readStream.format("graft-lake")`) serves the
  * change feed with per-commit micro-batches — see
  * [[LakeChangeFeedSource]]. */
class LakeSource extends RelationProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft-lake"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), LakeChangeFeedSource.feedSchema(sqlContext.sparkSession,
      parameters.getOrElse("path", throw new IllegalArgumentException(
        "graft-lake stream requires a path"))))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new LakeChangeFeedSource(sqlContext, parameters)

  /** `df.writeStream.format("graft-lake").option("path", root)` — the
    * lake as a first-class streaming SINK: every micro-batch MERGEs by
    * key as one COW commit, and the epoch tag (qualified by the
    * checkpoint identity, or an explicit `txnAppId` option) makes a
    * replayed batch a no-op — exactly-once table content with engine-
    * managed offsets, the symmetric twin of the change-feed source. The
    * table must exist (`Lake.create` fixes key and layout); partitionBy
    * on the writer refuses (layout is a table property). Append and
    * update output modes are per-batch upserts (the table is keyed);
    * COMPLETE mode folds each batch as the table's whole intended
    * content — upsert everything, delete keys the batch dropped
    * ([[LakeTable.replaceAllEpoch]]) — the streaming-aggregation
    * materialization mode. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake sink requires a path: writeStream.format(\"graft-lake\")" +
        ".option(\"path\", <root>)"))
    require(partitionColumns.isEmpty,
      "graft-lake sink: partition layout is fixed at table create — drop " +
        "the writer's partitionBy")
    // epoch tags qualify per CHECKPOINT (the txnAppId pattern): a fresh
    // checkpoint restarts epochs at 0 and must not collide with or
    // early-exit the old run's chain. A writer identity derived from the
    // TABLE ROOT would be shared by every query writing the table (two
    // writers, one epoch sequence — the second query's batches silently
    // skipped as replays), so a query whose checkpoint came from the
    // session conf (absent here) must refuse rather than fall back.
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation").map(cp =>
        java.lang.Long.toHexString(new Path(cp).toString.hashCode & 0xffffffffL)))
      .getOrElse(throw new IllegalArgumentException(
        "graft-lake sink requires an explicit writer identity: set " +
          ".option(\"checkpointLocation\", …) on the writer (not only the " +
          "session-level checkpoint conf) or pass .option(\"txnAppId\", …) — " +
          "a shared root-derived identity would make concurrent writers " +
          "skip each other's epochs as replays"))
    // complete mode IS the mode: each batch replaces the table content
    if (outputMode == OutputMode.Complete()) {
      require(!parameters.contains("mode") || parameters("mode") == "aggregate",
        "graft-lake sink: complete output mode folds each batch as the " +
          "whole table (drop the 'mode' option, or set mode=aggregate)")
      return new LakeMergeSink(root, appId, replaceAll = true)
    }
    // mode=merge (default): per-batch keyed upsert. mode=insert: the
    // append fast path — adds-only commits with a PK conflict check,
    // zero rewrite risk for randomly-keyed append-only streams (a keyed
    // merge would rewrite every range-covering file).
    val mode = parameters.getOrElse("mode", "merge")
    require(mode == "merge" || mode == "insert",
      s"graft-lake sink: unknown mode '$mode' (merge | insert — " +
        "mode=aggregate requires complete output mode)")
    new LakeMergeSink(root, appId, insertOnly = mode == "insert")
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake requires a path: spark.read.format(\"graft-lake\").load(<root>)"))
    val spark = sqlContext.sparkSession
    val table = new LakeTable(spark, root)
    require(!(parameters.contains("versionAsOf") &&
        parameters.contains("timestampAsOf")),
      "versionAsOf and timestampAsOf are mutually exclusive")
    val version = parameters.get("versionAsOf").map(_.toInt)
      .orElse(parameters.get("timestampAsOf")
        .map(t => table.versionAt(Lake.parseTsMillis(t))))
      .getOrElse(table.latestVersion)
    val m = table.manifest(version)
    require(m.tombstones.isEmpty,
      s"snapshot v$version carries deferred-delete tombstones: compact() " +
        "before reading through the graft-lake format (a relation cannot " +
        "carry the read-time anti-join)")
    require(m.columnMap.isEmpty,
      s"snapshot v$version has renamed columns (column mapping): a V1 " +
        "file relation cannot carry the physical->logical projection — " +
        "read via LakeTable.read() or SQL graft_lake('<root>') instead")
    require(m.files.nonEmpty,
      s"snapshot v$version is empty — an empty table exposes no schema " +
        "through the format; use LakeTable.read()")
    val paths = m.files.map(f => new Path(root, f.path).toString)
    // the stored schema (when present) replaces footer merging and reads
    // pre-widening files promoted in place — same contract as the API read
    val reader = m.schemaDdl match {
      case Some(ddl) => spark.read.schema(StructType.fromDDL(ddl))
      case None => spark.read.option("mergeSchema", "true")
    }
    // hive-partitioned tables: recover directory values as real columns
    if (m.partitionCols.nonEmpty)
      reader.option("basePath", new Path(root, "data").toString)
    reader.parquet(paths: _*)
      .queryExecution.analyzed.collectFirst {
        case l: LogicalRelation => l.relation
      }.getOrElse(throw new IllegalStateException(
        "parquet read did not resolve to a file relation"))
  }
}

/** The V1 sink behind `writeStream.format("graft-lake")` — one
  * [[LakeTable.mergeEpoch]] per micro-batch. The incoming DataFrame is
  * the streaming plan; it re-plans as a batch frame and MATERIALIZES
  * once (localCheckpoint) because the merge consumes its source from
  * several operators and a streaming batch must not re-execute. */
private[sources] class LakeMergeSink(root: String, appId: String,
                                      insertOnly: Boolean = false,
                                      replaceAll: Boolean = false)
    extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val batch = org.apache.spark.sql.graft.StreamBridge
      .batchDataFrame(data).localCheckpoint()
    val t = new LakeTable(spark, root)
    if (replaceAll) t.replaceAllEpoch(batch, batchId, appId)
    else if (insertOnly) t.insertEpoch(batch, batchId, appId)
    else t.mergeEpoch(batch, batchId, appId)
    // AUTO-BINPACK (off by default): streaming micro-batches are what
    // fragment a table — with spark.graft.lake.autoBinpack.minRows set,
    // the sink folds accumulated sub-threshold files back to ~2x-target
    // files once enough pile up, as its own ordinary commit (an
    // incremental O(small files) sweep, never a full compact). A lost
    // race or concurrent sweep is harmless: binpack is idempotent and
    // no-ops when nothing is small.
    val minRows = spark.conf
      .get("spark.graft.lake.autoBinpack.minRows", "0").toLong
    if (minRows > 0) {
      val minFiles = spark.conf
        .get("spark.graft.lake.autoBinpack.minFiles", "4").toInt
      val m = t.manifest(t.latestVersion)
      if (m.files.count(_.rows < minRows) >= minFiles)
        t.compactBinPackWithRetry(minRows)
    }
    ()
  }
}
