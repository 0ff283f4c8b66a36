package graft.sources

import java.util.UUID

import scala.collection.immutable.ListMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot/manifest lakehouse on plain parquet — the storage half of
  * MERGE that [[graft.ops.Relational.upsert]] (the dataflow half) leaves
  * open. The shape every open table format shares, built from public
  * primitives only:
  *
  *  - DATA FILES are immutable parquet under `data/`, each clustered to a
  *    disjoint merge-key range (`repartitionByRange` at write), with
  *    per-file (rows, minKey, maxKey) stats in the manifest — so a MERGE
  *    prunes to the files whose key range the updates actually touch,
  *    exactly how Delta/Iceberg data skipping works;
  *  - a MANIFEST per snapshot (`_manifests/v%05d.json`) lists the files
  *    that ARE that version. Manifests are metadata-sized (one entry per
  *    file), written to a dot-temp name and RENAMED into place: readers
  *    never observe a partial manifest, and the rename refuses an
  *    existing destination, which is the optimistic-concurrency commit —
  *    two writers racing to version N+1 produce one winner and one clean
  *    failure (HDFS rename is atomic; S3 deployments put a lock service
  *    or conditional-put behind this same seam);
  *  - MERGE is copy-on-write: unhit files carry over into the new
  *    manifest BY REFERENCE (never copied, never touched — time travel to
  *    the previous snapshot stays free), hit files are rewritten as
  *    survivors (anti-join against updates) plus the update rows.
  *
  * Scale posture: the shuffled volume of a merge is |updates| + |rows in
  * hit files| — for key-local updates that is a tiny slice of the table;
  * the manifest list and file-stats join are metadata-sized and
  * broadcast. Reads of a snapshot are a plain multi-file parquet scan, so
  * all pushdown/pruning applies unchanged.
  */
object Lake {

  /** One data file's manifest entry. minKey/maxKey are inclusive bounds of
    * the (numeric) merge key — the pruning stats. `cols` optionally carries
    * the same [min,max] bounds for EXTRA numeric columns (declared at
    * [[create]]) — the Delta-style per-column file statistics that let
    * [[LakeManifestPrune]] skip files on predicates over non-key columns.
    * Whether a second column actually prunes depends on layout: a column
    * correlated with the clustering key gets tight disjoint ranges; an
    * uncorrelated one spans every file and prunes nothing (that interleaved
    * case is what the Z-order lane exists for). */
  case class FileEntry(path: String, rows: Long, minKey: Long, maxKey: Long,
                       cols: Map[String, (Long, Long)] = Map.empty)

  /** Fresh lake root under the JVM tempdir, registered for recursive
    * cleanup at JVM exit — every query invocation builds its own lake, so
    * a regenerated corpus can never serve stale table state (the staged-
    * media-cache lesson). */
  private[graft] def freshRoot(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lake")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))
    dir.toString
  }

  /** Gated lane: storage-level COW MERGE whose post-merge relation must
    * equal the in-memory upsert oracle. Build a lake from `orders`
    * (8 key-range-clustered files), MERGE updates (every key ≡ 0 mod 100
    * gets priority '0-UPDATED') plus inserts (the same rows re-keyed
    * +100 000 000 as '9-INSERTED'), then aggregate the NEW snapshot by
    * priority. The DuckDB oracle states the same relation over the raw
    * table — if any COW step dropped, duplicated, or failed to replace a
    * row, the counts diverge. Time travel, pruning, and commit atomicity
    * are spec-gated (`LakeSpec` — a stream can't exercise them from SQL). */
  def lakeMergeCow(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val t = create(spark, freshRoot(), o, "o_orderkey", 8)
    val hits = o.filter(col("o_orderkey") % 100 === 0)
    val updates = hits.withColumn("o_orderpriority", lit("0-UPDATED"))
      .unionByName(hits
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("o_orderpriority", lit("9-INSERTED")))
    t.merge(updates)
    t.read().groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Gated lane: storage-level COW DELETE (the erasure-cascade shape at
    * the table layer — GDPR delete as a committed snapshot, not a view).
    * Delete every key ≡ 0 mod 100 from an orders lake, then aggregate the
    * post-delete snapshot; the oracle filters the raw table the same way.
    * A file whose rows are all deleted must vanish from the manifest; a
    * partially-hit file must rewrite to exactly its survivors. */
  def lakeDeleteErasure(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val t = create(spark, freshRoot(), o, "o_orderkey", 8)
    t.delete(o.filter(col("o_orderkey") % 100 === 0).select("o_orderkey"))
    t.read().groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** The shared MERGE-then-DELETE scenario of the CDC lanes: update every
    * key ≡ 0 (mod 100) to priority '0-UPDATED', insert the same rows
    * re-keyed +100 000 000 as '9-INSERTED', then erase every key ≡ 7
    * (mod 100). Returns the table after both commits.
    *
    * Its three consumers (`lake_cdc_changes`, `lake_mv_incremental`,
    * `lake_time_travel`) only READ the table after construction, so the
    * built scenario is shared per (corpus dir, corpus GENERATION) within
    * a JVM — the staged-media-cache pattern: the generation marker
    * (mtime+size of the orders parquet) means a regenerated corpus
    * rebuilds instead of serving stale table state. Lanes that MUTATE
    * their table differently (merge_cow, delete_erasure, schema, mor,
    * range_slice) keep building fresh. */
  private val scenarioCache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, LakeTable)]()

  private def ordersGeneration(spark: SparkSession, dir: String): String = {
    val p = new Path(s"$dir/orders.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"${st.getModificationTime}-${st.getLen}"
  }

  private def mergedThenDeleted(spark: SparkSession, dir: String): LakeTable = {
    // a cached table is bound to the session that built it (its reads plan
    // there), so a hit must be the SAME live session — verified by
    // reference, never by a hash (identity hashes collide); a different or
    // stopped session REPLACES the entry, so dead sessions never pile up
    val key = s"$dir@${ordersGeneration(spark, dir)}"
    val cached = scenarioCache.get(key)
    if (cached != null && (cached._1 eq spark) &&
        !cached._1.sparkContext.isStopped) cached._2
    else {
      val o = Tables.orders(spark, dir)
      val t = create(spark, freshRoot(), o, "o_orderkey", 8)
      val hits = o.filter(col("o_orderkey") % 100 === 0)
      val updates = hits.withColumn("o_orderpriority", lit("0-UPDATED"))
        .unionByName(hits
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
          .withColumn("o_orderpriority", lit("9-INSERTED")))
      t.merge(updates)
      t.delete(o.filter(col("o_orderkey") % 100 === 7).select("o_orderkey"))
      scenarioCache.put(key, (spark, t))
      t
    }
  }

  /** Gated lane: the change feed across a MERGE and a DELETE commit,
    * summarized per (change type, priority). The oracle states the same
    * feed from the raw table — updated keys contribute a preimage (their
    * original priority) and a postimage ('0-UPDATED'), inserted keys an
    * insert, erased keys a delete. Any row the manifest diff dropped,
    * duplicated, or mis-classified diverges the counts; any
    * rewritten-but-unchanged row leaking into the feed inflates them. */
  def lakeCdcChanges(spark: SparkSession, dir: String): DataFrame = {
    val t = mergedThenDeleted(spark, dir)
    t.changes(0, t.latestVersion)
      .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("change_type", "o_orderpriority")
  }

  /** Gated lane: incremental materialized-view maintenance from the
    * change feed. The per-priority (count, revenue) MV built at snapshot
    * 0 is advanced to the latest snapshot by FOLDING THE FEED — postimage
    * and insert rows add, preimage and delete rows subtract — never
    * rescanning the table. Money stays exact DECIMAL until the final
    * round, so the incremental fold is bit-equal to a from-scratch
    * aggregate (the oracle states the post-state aggregate directly).
    * At 100 TB this is the difference between touching the changed files
    * and re-aggregating the fact table per refresh. */
  def lakeMvIncremental(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(28, 10)
    val t = mergedThenDeleted(spark, dir)
    val mv0 = t.snapshot(0).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n0"),
        sum(col("o_totalprice").cast(dec)).as("p0"))
    val feed = t.changes(0, t.latestVersion)
    val delta = feed
      .withColumn("sgn",
        when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
          .otherwise(lit(-1L)))
      .groupBy("o_orderpriority")
      .agg(sum(col("sgn")).as("dn"),
        sum(when(col("sgn") === 1L, col("o_totalprice").cast(dec))
          .otherwise(-col("o_totalprice").cast(dec))).as("dp"))
    mv0.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("p0"), lit(0).cast(dec)) +
          coalesce(col("dp"), lit(0).cast(dec))).as("p"))
      .filter(col("n_orders") > 0L)
      .select(col("o_orderpriority"), col("n_orders"),
        round(col("p"), 2).cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Gated lane: merge-on-read delete through the SQL gate. A deferred
    * delete (tombstone write, zero data files rewritten) must read
    * exactly like the COW delete, and compaction must fold the
    * tombstones into a clean snapshot that still reads the same — both
    * phases aggregated under one oracle. The no-rewrite property itself
    * is spec-pinned (`LakeSpec`). */
  def lakeMorDelete(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val t = create(spark, freshRoot(), o, "o_orderkey", 8)
    t.deleteDeferred(o.filter(col("o_orderkey") % 100 === 0).select("o_orderkey"))
    val deferred = t.read().groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders")).withColumn("phase", lit("deferred"))
    t.compact(8)
    val compacted = t.read().groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders")).withColumn("phase", lit("compacted"))
    deferred.unionByName(compacted)
      .select("phase", "o_orderpriority", "n_orders")
      .orderBy("phase", "o_orderpriority")
  }

  /** Gated lane: time travel through the SQL gate. After a MERGE that
    * rewrites priorities and a DELETE that erases keys, reading snapshot
    * 0 must still aggregate exactly like the raw table — the COW
    * contract (old files never touched, only de-referenced) stated as a
    * query the oracle can falsify. Any merge/delete that mutated a
    * version-0 file in place diverges the counts. */
  def lakeTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val t = mergedThenDeleted(spark, dir)
    t.snapshot(0).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Gated lane: the key-range slice query every serving layer runs,
    * through the AUTOMATIC pruning path — a plain `filter` over `read()`,
    * no `readRange` cooperation; the injected [[LakeManifestPrune]] rule
    * drops manifest-disjoint files at planning time (PlanAssertionsSpec
    * pins the scan to fewer files than the table holds). The oracle
    * states the same slice over the raw table. */
  def lakeRangeSlice(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val t = create(spark, freshRoot(), o, "o_orderkey", 8)
    t.read()
      .filter(col("o_orderkey") >= 1000L && col("o_orderkey") <= 2000L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey")).as("sum_keys"))
      .orderBy("o_orderpriority")
  }

  /** Gated lane: schema evolution through MERGE. The update batch carries
    * a column the table never had (`o_channel`); the COW commit widens the
    * schema — survivors of rewritten files and every carried-over file
    * read back null through the merged-schema scan, update rows carry the
    * backfill value. The aggregate distinguishes the two populations, so
    * a dropped widening (or a null leak into updated rows) diverges. */
  def lakeSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val t = create(spark, freshRoot(), o, "o_orderkey", 8)
    val updates = o.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderpriority", lit("0-UPDATED"))
      .withColumn("o_channel", lit("BACKFILL"))
    t.merge(updates)
    t.read()
      .groupBy(coalesce(col("o_channel"), lit("LEGACY")).as("channel"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("channel", "o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_merge_cow" -> (lakeMergeCow _),
    "lake_delete_erasure" -> (lakeDeleteErasure _),
    "lake_cdc_changes" -> (lakeCdcChanges _),
    "lake_mv_incremental" -> (lakeMvIncremental _),
    "lake_schema_evolution" -> (lakeSchemaEvolution _),
    "lake_time_travel" -> (lakeTimeTravel _),
    "lake_range_slice" -> (lakeRangeSlice _),
    "lake_mor_delete" -> (lakeMorDelete _))

  val oracle: Map[String, String] = Map(
    "lake_mor_delete" ->
      """WITH agg AS (
        |  SELECT o_orderpriority, count(*) AS n_orders
        |  FROM orders WHERE o_orderkey % 100 <> 0 GROUP BY 1)
        |SELECT 'compacted' AS phase, o_orderpriority, n_orders FROM agg
        |UNION ALL
        |SELECT 'deferred', o_orderpriority, n_orders FROM agg
        |ORDER BY phase, o_orderpriority""".stripMargin,

    "lake_range_slice" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_time_travel" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_schema_evolution" ->
      """WITH m AS (
        |  SELECT CASE WHEN o_orderkey % 100 = 0 THEN '0-UPDATED'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |         CASE WHEN o_orderkey % 100 = 0 THEN 'BACKFILL'
        |              ELSE 'LEGACY' END AS channel
        |  FROM orders)
        |SELECT channel, o_orderpriority, count(*) AS n_rows
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "lake_cdc_changes" ->
      """WITH ch AS (
        |  SELECT 'insert' AS change_type, '9-INSERTED' AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT 'update_preimage', o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT 'update_postimage', '0-UPDATED'
        |  FROM orders WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT 'delete', o_orderpriority
        |  FROM orders WHERE o_orderkey % 100 = 7
        |)
        |SELECT change_type, o_orderpriority, count(*) AS n_rows
        |FROM ch GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "lake_mv_incremental" ->
      """WITH merged AS (
        |  SELECT CASE WHEN o_orderkey % 100 = 0 THEN '0-UPDATED'
        |              ELSE o_orderpriority END AS o_orderpriority,
        |         o_totalprice, o_orderkey
        |  FROM orders
        |  UNION ALL
        |  SELECT '9-INSERTED', o_totalprice, o_orderkey + 100000000
        |  FROM orders WHERE o_orderkey % 100 = 0
        |)
        |SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2)
        |            AS DOUBLE) AS sum_price
        |FROM merged WHERE o_orderkey % 100 <> 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_delete_erasure" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders WHERE o_orderkey % 100 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_merge_cow" ->
      """WITH merged AS (
        |  SELECT CASE WHEN o_orderkey % 100 = 0 THEN '0-UPDATED'
        |              ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders
        |  UNION ALL
        |  SELECT '9-INSERTED' FROM orders WHERE o_orderkey % 100 = 0
        |)
        |SELECT o_orderpriority, count(*) AS n_orders
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)

  /** One snapshot. `operation` records provenance (create/merge) the way
    * table formats keep a commit history. `statsCols` lists the extra
    * columns every file entry carries bounds for — fixed at [[create]],
    * threaded through every rewrite. `tombstones` are MERGE-ON-READ
    * key-delete files ([[LakeTable.deleteDeferred]]) applied as an
    * anti-join at read time until a [[LakeTable.compact]] folds them. */
  case class Manifest(version: Int, parentVersion: Int, operation: String,
                      keyCol: String, files: Seq[FileEntry],
                      statsCols: Seq[String] = Nil,
                      tombstones: Seq[FileEntry] = Nil)

  /** Result of a [[LakeTable.merge]] — what a COW commit did. */
  case class MergeStats(version: Int, keptFiles: Int, rewrittenFiles: Int,
                        addedFiles: Int, updateRows: Long)

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  /** Create version 0 from `df`, clustered on `keyCol` into `numFiles`
    * disjoint-range files, and return the table handle. `statsCols` names
    * extra numeric columns to keep per-file [min,max] bounds for (beyond
    * the key) — they ride every manifest from then on and feed
    * [[LakeManifestPrune]]'s non-key data skipping. */
  def create(spark: SparkSession, root: String, df: DataFrame, keyCol: String,
             numFiles: Int, statsCols: Seq[String] = Nil): LakeTable = {
    val t = new LakeTable(spark, root)
    t.init(df, keyCol, numFiles, statsCols)
    t
  }

  private def fileJson(m: Manifest)(f: FileEntry): ListMap[String, Any] =
    ListMap(
      "path" -> f.path, "rows" -> f.rows,
      "minKey" -> f.minKey, "maxKey" -> f.maxKey,
      "cols" -> m.statsCols.flatMap(c => f.cols.get(c).map(b =>
        c -> Seq(b._1, b._2))).to(ListMap))

  private[graft] def toJson(m: Manifest): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(ListMap(
      "version" -> m.version, "parentVersion" -> m.parentVersion,
      "operation" -> m.operation, "keyCol" -> m.keyCol,
      "statsCols" -> m.statsCols,
      "files" -> m.files.map(fileJson(m)),
      "tombstones" -> m.tombstones.map(fileJson(m))))

  private[graft] def fromJson(s: String): Manifest = {
    val n = mapper.readTree(s)
    import scala.jdk.CollectionConverters._
    // statsCols/cols are absent in pre-evolution manifests — read optional
    val statsCols =
      if (n.has("statsCols"))
        n.get("statsCols").elements().asScala.map(_.asText()).toSeq
      else Nil
    def entries(field: String): Seq[FileEntry] =
      if (!n.has(field)) Nil
      else n.get(field).elements().asScala.map { f =>
        val cols =
          if (f.has("cols"))
            f.get("cols").fields().asScala.map { e =>
              val b = e.getValue
              e.getKey -> ((b.get(0).asLong(), b.get(1).asLong()))
            }.toMap
          else Map.empty[String, (Long, Long)]
        FileEntry(
          f.get("path").asText(), f.get("rows").asLong(),
          f.get("minKey").asLong(), f.get("maxKey").asLong(), cols)
      }.toSeq
    Manifest(
      n.get("version").asInt(), n.get("parentVersion").asInt(),
      n.get("operation").asText(), n.get("keyCol").asText(),
      entries("files"), statsCols, entries("tombstones"))
  }
}

/** Handle to a [[Lake]] table rooted at `root`. See object doc for the
  * format contract. */
class LakeTable(spark: SparkSession, val root: String) {
  import Lake._

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manifestDir = new Path(rootPath, "_manifests")
  private def dataDir = new Path(rootPath, "data")

  private def manifestPath(v: Int) = new Path(manifestDir, f"v$v%05d.json")

  /** Highest committed snapshot version (manifests are rename-committed,
    * so every listed file is complete). */
  def latestVersion: Int = {
    val st = fs.listStatus(manifestDir)
    st.iterator.map(_.getPath.getName)
      .collect { case s if s.matches("v\\d{5}\\.json") => s.substring(1, 6).toInt }
      .max
  }

  /** True iff `version`'s manifest is still on disk (vacuum removes
    * expired ones — history walks should skip, not crash). */
  def hasVersion(version: Int): Boolean = fs.exists(manifestPath(version))

  def manifest(version: Int): Manifest = {
    val in = fs.open(manifestPath(version))
    try fromJson(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Time travel: the relation AS OF `version` — a plain multi-file
    * parquet scan over that manifest's files (COW keeps old files live
    * until a retention vacuum, which this format leaves to the caller).
    * `mergeSchema` serves schema evolution: pre-evolution files read null
    * for later-added columns. At 100 TB footer-merging every file is the
    * wrong cost model — record the table schema in the manifest at commit
    * and pass it to `read.schema(...)` instead; the manifest already
    * carries per-file metadata, this is one more field. */
  def snapshot(version: Int): DataFrame = {
    val m = manifest(version)
    if (m.files.isEmpty) spark.emptyDataFrame
    else applyTombstones(m,
      spark.read.option("mergeSchema", "true")
        .parquet(m.files.map(f => new Path(rootPath, f.path).toString): _*))
  }

  /** Merge-on-read: anti-join the snapshot's key tombstones (if any) —
    * the read half of [[deleteDeferred]]. Tombstone relations are
    * key-column-only and metadata-small next to the table, so the
    * anti-join broadcasts under AQE. */
  private def applyTombstones(m: Manifest, base: DataFrame): DataFrame =
    if (m.tombstones.isEmpty) base
    else base.join(
      spark.read.parquet(
          m.tombstones.map(f => new Path(rootPath, f.path).toString): _*)
        .select(col(m.keyCol)).distinct(),
      Seq(m.keyCol), "left_anti")

  /** Latest snapshot. */
  def read(): DataFrame = snapshot(latestVersion)

  /** Manifest-pruned key-range read of the latest snapshot: only files
    * whose [min,max] intersects [lo,hi] enter the scan AT PLANNING TIME
    * (the others never appear in the relation — no I/O, no tasks), then
    * the row-level predicate still applies inside the scan via ordinary
    * parquet pushdown. This is the read half of the min/max stats the
    * manifest keeps for MERGE/DELETE: a key-range query over a 100 TB
    * table touches the files covering the range, not the table.
    *
    * In sessions built with `GraftSessionExtensions`, the SAME pruning
    * fires automatically on plain `read().filter(key …)` queries via the
    * injected [[LakeManifestPrune]] optimizer rule — this explicit form
    * remains for extension-less sessions. */
  def readRange(lo: Long, hi: Long): DataFrame = {
    val m = manifest(latestVersion)
    val hit = m.files.filter(f => f.maxKey >= lo && f.minKey <= hi)
    if (hit.isEmpty) read().filter(col(m.keyCol).isNull && col(m.keyCol).isNotNull)
    else applyTombstones(m,
      spark.read.option("mergeSchema", "true")
        .parquet(hit.map(f => new Path(rootPath, f.path).toString): _*))
      .filter(col(m.keyCol).cast("long").between(lo, hi))
  }

  /** Change-data-feed between two committed snapshots: the net row-level
    * delta from `fromVersion` to `toVersion`, derived from the MANIFEST
    * diff. Only files added or removed across the interval are scanned —
    * files carried between the endpoint manifests BY REFERENCE (the
    * untouched bulk of a 100 TB table) never enter the plan, so the cost
    * is proportional to what changed, not to the table. This is exactly
    * how open table formats serve a change feed from their add/remove
    * file actions.
    *
    * Output is the data schema plus `_change_type` ∈ {insert, delete,
    * update_preimage, update_postimage} (the standard CDF vocabulary).
    * COW rewrites whole files, so a rewritten-but-identical row is
    * recognized (null-safe full-row compare per key) and emits nothing;
    * likewise a key updated and then reverted inside the interval
    * compares equal at the endpoints — the feed is the NET change.
    *
    * Scale shape: one shuffle, hash-partitioned on the merge key, over
    * only the rows living in changed files; the manifest diff itself is
    * metadata-sized driver work. */
  def changes(fromVersion: Int, toVersion: Int): DataFrame = {
    val mFrom = manifest(fromVersion)
    val mTo = manifest(toVersion)
    require(mFrom.keyCol == mTo.keyCol,
      s"key column changed between snapshots: ${mFrom.keyCol} vs ${mTo.keyCol}")
    require(mFrom.tombstones.isEmpty && mTo.tombstones.isEmpty,
      "change feed endpoints carry deferred deletes: compact() first — the " +
        "manifest file diff cannot see through read-time tombstones")
    val keyCol = mTo.keyCol
    val fromPaths = mFrom.files.map(_.path).toSet
    val toPaths = mTo.files.map(_.path).toSet
    val removed = mFrom.files.filterNot(f => toPaths.contains(f.path))
    val added = mTo.files.filterNot(f => fromPaths.contains(f.path))
    // merged-schema template over the CHANGED files (planning-time footer
    // reads only) — an interval that widened the schema feeds the widened
    // shape, with pre-evolution rows null in the new columns. An empty
    // diff types its empty feed from ONE file, not the whole table: the
    // feed's cost contract is proportional-to-change, footers included
    val templateFiles =
      if (added.nonEmpty || removed.nonEmpty) added ++ removed
      else (mTo.files ++ mFrom.files).take(1)
    templateFiles.headOption match {
      case None => // table never held data: empty, minimally-typed feed
        spark.range(0).select(col("id").as(keyCol),
          lit("").as("_change_type")).filter(lit(false))
      case Some(_) =>
        val schema = spark.read.option("mergeSchema", "true")
          .parquet(templateFiles.map(f => new Path(rootPath, f.path).toString): _*)
          .schema
        def load(fsq: Seq[FileEntry]): DataFrame =
          if (fsq.nonEmpty) spark.read.schema(schema).parquet(
            fsq.map(f => new Path(rootPath, f.path).toString): _*)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        val dataCols = schema.fieldNames.toSeq
        val pre = load(removed).select(col(keyCol).as("_k"),
          struct(dataCols.map(col): _*).as("_pre"))
        val post = load(added).select(col(keyCol).as("_k"),
          struct(dataCols.map(col): _*).as("_post"))
        val j = pre.join(post, Seq("_k"), "full_outer")
          // rewritten-but-identical rows are not changes
          .filter(!(col("_pre") <=> col("_post")))
        j.select(explode(
            when(col("_pre").isNull,
              array(struct(col("_post").as("row"), lit("insert").as("ct"))))
            .when(col("_post").isNull,
              array(struct(col("_pre").as("row"), lit("delete").as("ct"))))
            .otherwise(array(
              struct(col("_pre").as("row"), lit("update_preimage").as("ct")),
              struct(col("_post").as("row"), lit("update_postimage").as("ct"))))
          ).as("c"))
          .select(col("c.row.*"), col("c.ct").as("_change_type"))
    }
  }

  /** The commit: write the manifest under a dot-temp name, then rename to
    * `v%05d.json` — refusing an existing destination, so concurrent
    * committers of the same version get one winner. */
  private[graft] def commit(m: Manifest): Unit = {
    fs.mkdirs(manifestDir)
    val tmp = new Path(manifestDir, s".tmp-${UUID.randomUUID()}.json")
    val out = fs.create(tmp, false)
    try out.write(toJson(m).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = manifestPath(m.version)
    if (fs.exists(dest) || !fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"lake commit lost the race for version ${m.version} at $dest")
    }
  }

  /** Write `df` as fresh data files clustered on `keyCol` and return their
    * manifest entries. Files land in a scratch dir first, are renamed into
    * `data/` under fresh UUID names, and their (rows, min, max) stats come
    * from ONE metadata-cheap scan of just the new files. */
  private def writeDataFiles(df: DataFrame, keyCol: String, numFiles: Int,
                             statsCols: Seq[String] = Nil,
                             clusterBy: Option[org.apache.spark.sql.Column] = None)
      : Seq[FileEntry] = {
    val scratch = new Path(rootPath, s"_scratch-${UUID.randomUUID()}")
    val clustered = clusterBy match {
      case None =>
        df.repartitionByRange(math.max(1, numFiles), col(keyCol))
          .sortWithinPartitions(keyCol)
      case Some(c) => // alternative layout (e.g. Morton order) — stats
        // still computed on keyCol + statsCols below, layout-independent
        df.withColumn("__cluster", c)
          .repartitionByRange(math.max(1, numFiles), col("__cluster"))
          .sortWithinPartitions("__cluster")
          .drop("__cluster")
    }
    clustered.write.mode("overwrite").parquet(scratch.toString)
    fs.mkdirs(dataDir)
    val moved = fs.listStatus(scratch).toSeq
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val dest = new Path(dataDir, s"part-${UUID.randomUUID()}.parquet")
        require(fs.rename(s.getPath, dest), s"rename ${s.getPath} -> $dest failed")
        dest
      }
    fs.delete(scratch, true)
    if (moved.isEmpty) Seq.empty
    else {
      // key bounds + every extra stats column, ONE metadata-cheap pass
      val extraAggs = statsCols.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"mn_$c"),
        max(col(c).cast("long")).as(s"mx_$c")))
      val aggs = Seq(count(lit(1)).as("rows"),
        min(col(keyCol).cast("long")).as("mn"),
        max(col(keyCol).cast("long")).as("mx")) ++ extraAggs
      val stats = spark.read.parquet(moved.map(_.toString): _*)
        .groupBy(input_file_name().as("f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val cols = statsCols.zipWithIndex.flatMap { case (c, i) =>
            val (mnI, mxI) = (4 + 2 * i, 5 + 2 * i)
            if (r.isNullAt(mnI) || r.isNullAt(mxI)) None
            else Some(c -> ((r.getLong(mnI), r.getLong(mxI))))
          }.toMap
          (new Path(r.getString(0)).getName,
            (r.getLong(1), r.getLong(2), r.getLong(3), cols))
        }.toMap
      // a zero-row part file (e.g. a fully-erased rewrite) has no stats
      // row: drop it from disk rather than manifest an empty file
      moved.flatMap { p =>
        stats.get(p.getName) match {
          case Some((rows, mn, mx, cols)) =>
            Some(FileEntry(s"data/${p.getName}", rows, mn, mx, cols))
          case None => fs.delete(p, false); None
        }
      }
    }
  }

  private[sources] def init(df: DataFrame, keyCol: String, numFiles: Int,
                            statsCols: Seq[String] = Nil): Unit = {
    val files = writeDataFiles(df, keyCol, numFiles, statsCols)
    commit(Manifest(0, -1, "create", keyCol, files, statsCols))
  }

  /** Copy-on-write MERGE of `updates` (same schema as the table) on the
    * table's key: rows matching an existing key replace it, new keys
    * insert — [[graft.ops.Relational.upsert]] semantics at the storage
    * level. Only files whose [min,max] key range intersects an update key
    * are rewritten; everything else carries into the new snapshot by
    * reference. The previous snapshot remains readable (time travel). */
  /** File pruning shared by MERGE and DELETE: a key hits a file iff it
    * falls in the file's [min,max] — ranges are metadata-sized and
    * broadcast, so the probe shuffles only the distinct key column. */
  private def hitFileIndexes(m: Manifest, keys: DataFrame): Set[Int] = {
    val ranges = m.files.zipWithIndex.map { case (f, i) => (i, f.minKey, f.maxKey) }
    val rangesDf = spark.createDataFrame(ranges).toDF("fidx", "mn", "mx")
    keys.select(col(keys.columns.head).cast("long").as("k")).distinct()
      .join(broadcast(rangesDf),
        col("k") >= col("mn") && col("k") <= col("mx"))
      .select("fidx").distinct().collect().map(_.getInt(0)).toSet
  }

  def merge(updates: DataFrame, newFileCountHint: Int = 0): MergeStats =
    mergeTagged(updates, "merge", newFileCountHint)

  /** Test-only interleaving seam: runs after a merge has decided its
    * target version but before it commits — lets a spec plant a racing
    * committer deterministically. No-op in production. */
  private[graft] var onBeforeMergeCommit: () => Unit = () => ()

  /** The optimistic-concurrency commit loop around [[merge]]: an attempt
    * that loses the version race re-reads the NEW latest snapshot and
    * REPLAYS the merge against it — the standard lakehouse retry. Safe
    * because a merge is expressed against table state (anti-join +
    * union), not a pinned version; replaying over the winner's snapshot
    * preserves upsert semantics. Data files written by a lost attempt are
    * unreferenced orphans (never manifested) — harmless until a cleanup
    * sweep, exactly like aborted-commit files in any COW format. */
  def mergeWithRetry(updates: DataFrame, maxAttempts: Int = 3): MergeStats = {
    var attempt = 1
    while (true) {
      try return merge(updates)
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def mergeTagged(updates: DataFrame, operation: String,
                          newFileCountHint: Int = 0): MergeStats = {
    val v = latestVersion
    val m = manifest(v)
    require(m.tombstones.isEmpty,
      "table carries deferred deletes (merge-on-read tombstones): compact() " +
        "before merging — a rewrite cannot re-insert a tombstoned key, the " +
        "read-time anti-join would erase it again")
    val keyCol = m.keyCol
    val hitIdx = hitFileIndexes(m, updates.select(col(keyCol)))
    val (hit, kept) = m.files.zipWithIndex.partition { case (_, i) => hitIdx(i) }
    val updateRows = updates.count()
    val rewritten =
      if (hit.isEmpty) updates
      else {
        // mergeSchema + allowMissingColumns: a merge may WIDEN the schema
        // (schema evolution) — survivors of rewritten files carry null for
        // columns only the updates have; carried-over files stay untouched
        // and read back null through the merged-schema scan
        val hitDf = spark.read.option("mergeSchema", "true").parquet(
          hit.map { case (f, _) => new Path(rootPath, f.path).toString }: _*)
        // widen, never narrow: updates missing table columns would silently
        // null them on every updated row (allowMissingColumns fills both
        // directions) — reject instead, loudly
        val narrowed = hitDf.columns.toSet -- updates.columns.toSet
        require(narrowed.isEmpty,
          s"merge updates are missing table columns ${narrowed.mkString(", ")}: " +
            "a merge may widen the schema, never narrow it")
        hitDf.join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
          .unionByName(updates, allowMissingColumns = true)
      }
    val hint = if (newFileCountHint > 0) newFileCountHint else math.max(1, hit.size)
    val newFiles = writeDataFiles(rewritten, keyCol, hint, m.statsCols)
    onBeforeMergeCommit()
    commit(Manifest(v + 1, v, operation, keyCol,
      kept.map(_._1) ++ newFiles, m.statsCols))
    MergeStats(v + 1, kept.size, hit.size, newFiles.size, updateRows)
  }

  /** True iff a streaming epoch already committed — the manifest chain IS
    * the transaction log (the txnAppId/txnVersion idempotent-sink pattern:
    * a replayed micro-batch finds its own commit and skips). The walk is
    * over metadata-sized manifests; a production table would keep the
    * last-committed epoch in the latest manifest alone — same seam, one
    * read. */
  def hasEpoch(epochId: Long): Boolean = {
    val tag = s"merge-epoch-$epochId"
    (0 to latestVersion).exists { v =>
      fs.exists(manifestPath(v)) && manifest(v).operation == tag
    }
  }

  /** [[merge]] tagged with a streaming epoch — committed at most once per
    * epoch id; a replay after a restart-between-write-and-offset-commit
    * becomes a no-op instead of a duplicate snapshot. */
  def mergeEpoch(updates: DataFrame, epochId: Long): Option[MergeStats] =
    if (hasEpoch(epochId)) None
    else Some(mergeTagged(updates, s"merge-epoch-$epochId"))

  /** Copy-on-write DELETE by key: files whose range intersects a delete
    * key rewrite to their surviving rows (a fully-erased file simply
    * leaves no successor); unhit files carry over by reference. The
    * pre-delete snapshot stays readable until [[vacuum]] — the committed
    * half of an erasure cascade. `keys` is a one-column relation of the
    * table's merge key. */
  def delete(keys: DataFrame): MergeStats = {
    val v = latestVersion
    val m = manifest(v)
    require(m.tombstones.isEmpty,
      "table carries deferred deletes: compact() before a COW delete, or " +
        "keep using deleteDeferred until the next compaction")
    val keyCol = m.keyCol
    val hitIdx = hitFileIndexes(m, keys)
    val (hit, kept) = m.files.zipWithIndex.partition { case (_, i) => hitIdx(i) }
    val newFiles =
      if (hit.isEmpty) Seq.empty
      else {
        val hitDf = spark.read.option("mergeSchema", "true").parquet(
          hit.map { case (f, _) => new Path(rootPath, f.path).toString }: _*)
        val survivors = hitDf.join(
          keys.select(col(keys.columns.head).as(keyCol)), Seq(keyCol), "left_anti")
        writeDataFiles(survivors, keyCol, math.max(1, hit.size), m.statsCols)
      }
    commit(Manifest(v + 1, v, "delete", keyCol, kept.map(_._1) ++ newFiles,
      m.statsCols))
    MergeStats(v + 1, kept.size, hit.size, newFiles.size, 0L)
  }

  /** MERGE-ON-READ delete — the write-cheap twin of [[delete]]: the keys
    * land as a tombstone file (key column only, clustered + min/max
    * manifested like any data file) and EVERY data file carries over by
    * reference; readers apply the tombstones as an anti-join until
    * [[compact]] folds them into a clean COW snapshot. At 100 TB this is
    * the difference between writing |keys| rows and rewriting every file
    * an erasure request touches — the GDPR fast path every table format
    * grew deletion vectors for. Contract: while tombstones are
    * outstanding, [[merge]]/[[delete]]/[[changes]] refuse loudly (a
    * rewrite cannot re-insert a tombstoned key); compaction restores full
    * function. Repeated deferred deletes stack — each commit appends its
    * tombstone file. */
  def deleteDeferred(keys: DataFrame): MergeStats = {
    val v = latestVersion
    val m = manifest(v)
    val tomb = writeDataFiles(
      keys.select(col(keys.columns.head).cast("long").as(m.keyCol)).distinct(),
      m.keyCol, 1)
    commit(Manifest(v + 1, v, "delete-deferred", m.keyCol, m.files,
      m.statsCols, m.tombstones ++ tomb))
    MergeStats(v + 1, m.files.size, 0, tomb.size, 0L)
  }

  /** RESTORE — roll the table back to `version`'s content AS A NEW
    * COMMIT (never by deleting history): the new manifest re-references
    * the old version's files and tombstones byte-for-byte, so the bad
    * commits stay inspectable, the restore itself is time-travelable,
    * and no data moves — the undo verb every table format grew. Fails
    * cleanly if `version` was vacuumed away. */
  def restore(version: Int): MergeStats = {
    val v = latestVersion
    require(hasVersion(version), s"cannot restore: v$version was vacuumed")
    val m = manifest(version)
    commit(Manifest(v + 1, v, s"restore-v$version", m.keyCol, m.files,
      m.statsCols, m.tombstones))
    MergeStats(v + 1, m.files.size, 0, 0, 0L)
  }

  /** Shallow CLONE — a new, independently-committing table whose v0
    * manifest references THIS table's current data files by ABSOLUTE
    * path (zero bytes copied; reads resolve absolute entries as-is).
    * Writes to the clone are ordinary COW commits landing under the
    * clone's own root — the source never sees them. Standard caveat,
    * shared with every shallow-clone implementation: a `vacuum` on the
    * SOURCE can delete files the clone still references; deep-copy (a
    * plain `create` from `read()`) when lifetimes must decouple. */
  def cloneShallow(newRoot: String): LakeTable = {
    val m = manifest(latestVersion)
    def absolute(fs0: Seq[FileEntry]): Seq[FileEntry] = fs0.map(f =>
      f.copy(path = new Path(rootPath, f.path).toString))
    val t = new LakeTable(spark, newRoot)
    t.commit(Manifest(0, -1, s"clone-of-$rootPath@v$latestVersion", m.keyCol,
      absolute(m.files), m.statsCols, absolute(m.tombstones)))
    t
  }

  /** Table-maintenance compaction: rewrite the LATEST snapshot into
    * `numFiles` key-range-clustered files as a new snapshot (operation
    * "compact"). Pure COW — the fragmented version stays readable until
    * [[vacuum]]. The small-files answer for a table fed by many
    * incremental merges. */
  def compact(numFiles: Int): MergeStats = {
    val v = latestVersion
    val m = manifest(v)
    val newFiles = writeDataFiles(read(), m.keyCol, numFiles, m.statsCols)
    commit(Manifest(v + 1, v, "compact", m.keyCol, newFiles, m.statsCols))
    MergeStats(v + 1, 0, m.files.size, newFiles.size, 0L)
  }

  /** OPTIMIZE ZORDER — rewrite the latest snapshot clustered on the
    * Morton z-value of two numeric columns (the Delta `OPTIMIZE ... ZORDER
    * BY` shape, on the engine's own codegen `ZValue` expression). Both
    * columns join the table's stats set, so every file carries tight
    * [min,max] on BOTH dimensions and [[LakeManifestPrune]] skips files
    * for 2-D box/strip predicates. The standard trade applies and is
    * deliberate: the merge KEY's per-file ranges widen (keys interleave
    * across z-blocks), so key-range pruning and merge file-hit ratios
    * degrade — z-order a table that is read by (c1, c2) far more often
    * than it is merged by key. Folds any outstanding tombstones, like
    * [[compact]]. */
  def compactZOrder(numFiles: Int, c1: String, c2: String): MergeStats = {
    val v = latestVersion
    val m = manifest(v)
    val statsCols = (m.statsCols ++ Seq(c1, c2)).distinct
    val z = org.apache.spark.sql.graft.ZValue.zvalue(
      col(c1).cast("long"), col(c2).cast("long"))
    val newFiles = writeDataFiles(read(), m.keyCol, numFiles, statsCols, Some(z))
    commit(Manifest(v + 1, v, "optimize-zorder", m.keyCol, newFiles, statsCols))
    MergeStats(v + 1, 0, m.files.size, newFiles.size, 0L)
  }

  /** Retention vacuum: drop all but the newest `retainVersions` manifests
    * and physically delete every data file referenced ONLY by the dropped
    * ones. Time travel beyond the horizon becomes a clean failure; the
    * retained snapshots are untouched. Returns (manifests removed, data
    * files removed). */
  def vacuum(retainVersions: Int): (Int, Int) = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val latest = latestVersion
    val horizon = math.max(0, latest - retainVersions + 1)
    if (horizon == 0) return (0, 0)
    val keepRefs = (horizon to latest).flatMap { v =>
      val m = manifest(v)
      (m.files ++ m.tombstones).map(_.path)
    }.toSet
    var droppedManifests = 0
    var droppedFiles = 0
    (0 until horizon).foreach { v =>
      val mp = manifestPath(v)
      if (fs.exists(mp)) {
        { val mv = manifest(v); mv.files ++ mv.tombstones }.foreach { f =>
          if (!keepRefs.contains(f.path)) {
            if (fs.delete(new Path(rootPath, f.path), false)) droppedFiles += 1
          }
        }
        fs.delete(mp, false)
        droppedManifests += 1
      }
    }
    (droppedManifests, droppedFiles)
  }
}
