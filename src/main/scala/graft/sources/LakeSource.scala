package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
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
    with StreamSourceProvider {

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
    require(m.files.nonEmpty,
      s"snapshot v$version is empty — an empty table exposes no schema " +
        "through the format; use LakeTable.read()")
    val paths = m.files.map(f => new Path(root, f.path).toString)
    val reader = spark.read.option("mergeSchema", "true")
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
