package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions installer: registers the graft native expressions
  * as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")` and
  * `expr("graft_dot(...)")` work in any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSessionExtensions")
  * }}}
  *
  * (the canonical extension mechanism — no fork of the function registry,
  * composes with other extension jars).
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {

  // table-function arguments resolve at analysis time, so they must be
  // literals — the same restriction range()/explode-over-literal have
  private def strArg(fn: String)(e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn: argument must be a STRING literal, got $e")
  }

  /** A ROOT argument: a bare catalog-bound name resolves to its root,
    * anything else is a path verbatim — every table function accepts
    * names the same way the format surfaces do. */
  private def rootArg(fn: String)(e: Expression): String =
    graft.sources.LakeCatalog.resolvePathOrName(SparkSession.active,
      strArg(fn)(e))
  private def intArg(fn: String)(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    // a BIGINT literal must fit — silent truncation would time-travel to
    // the wrong snapshot instead of erroring
    case Literal(v: Long, LongType) if v.isValidInt => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: argument must be an INT literal, got $e")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // SQL-callable table functions over graft.sources.Lake tables: time
    // travel and the CDC feed reachable from PURE SQL (the DataFrame API
    // and the graft-lake format already are). Each builder resolves the
    // manifest at analysis time and returns the snapshot/feed's analyzed
    // plan — an ordinary parquet LogicalRelation (+ the feed's diff
    // operators), so manifest pruning and parquet pushdown keep applying.
    //
    // The WRITE path is SQL too: the injected parser intercepts
    // MERGE INTO / UPDATE / DELETE FROM / OPTIMIZE / VACUUM statements
    // targeting graft_lake('<root>') and routes them to the LakeTable
    // verbs, delegating every other statement to the default parser —
    // see GraftSqlParser for the exact grammar. (Spark's own MERGE
    // grammar routes to DSv2 tables only, hence the parser seam.)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // Named-table READ resolution: single-part relation names bound in
    // the graft catalog (CREATE TABLE sales KEY … / USING graft_lake
    // LOCATION …) resolve to their lake snapshot — incl. Spark's native
    // VERSION/TIMESTAMP AS OF suffix. Runs after Spark's own relation
    // resolution in the same batch, so temp views and session-catalog
    // tables keep shadowing.
    ext.injectResolutionRule(session =>
      new graft.sources.LakeNameResolution(session))
    // the catalog's SHOW TABLES: every (name, root) binding as rows
    ext.injectTableFunction((
      new FunctionIdentifier("graft_catalog"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_catalog"),
      (children: Seq[Expression]) => {
        require(children.isEmpty, "graft_catalog takes no arguments")
        graft.sources.LakeCatalog.listDf(SparkSession.active)
          .queryExecution.analyzed
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_lake_at"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_lake_at"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "graft_lake_at takes (rootPath), (rootPath, version), or " +
            "(rootPath, timestampString)")
        val spark = SparkSession.active
        val t = new graft.sources.LakeTable(spark,
          rootArg("graft_lake_at")(children.head))
        // an INT second argument is a version; a STRING one is a
        // timestamp (epoch millis or ISO-8601 instant) — time travel by
        // wall clock from pure SQL
        val v = children.lift(1) match {
          case Some(Literal(s: UTF8String, StringType)) if s != null =>
            t.versionAt(graft.sources.Lake.parseTsMillis(s.toString))
          case Some(e) => intArg("graft_lake_at")(e)
          case None => t.latestVersion
        }
        t.snapshot(v).queryExecution.analyzed
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_lake_changes"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_lake_changes"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_lake_changes takes (rootPath, fromVersion, toVersion)")
        val spark = SparkSession.active
        val t = new graft.sources.LakeTable(spark,
          rootArg("graft_lake_changes")(children.head))
        t.changes(intArg("graft_lake_changes")(children(1)),
          intArg("graft_lake_changes")(children(2)))
          .queryExecution.analyzed
      }))
    // metadata introspection from SQL: DESCRIBE HISTORY / DETAIL as table
    // functions — one row per retained commit / per manifest file entry,
    // metadata-only (no data I/O)
    ext.injectTableFunction((
      new FunctionIdentifier("graft_lake_history"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_lake_history"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_lake_history takes (rootPath)")
        val spark = SparkSession.active
        new graft.sources.LakeTable(spark,
          rootArg("graft_lake_history")(children.head))
          .history().queryExecution.analyzed
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_lake_files"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_lake_files"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "graft_lake_files takes (rootPath) or (rootPath, version)")
        val spark = SparkSession.active
        val t = new graft.sources.LakeTable(spark,
          rootArg("graft_lake_files")(children.head))
        val v = children.lift(1).map(intArg("graft_lake_files"))
          .getOrElse(t.latestVersion)
        t.filesDf(v).queryExecution.analyzed
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_lake_detail"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_lake_detail"),
      (children: Seq[Expression]) => {
        require(children.length == 1 || children.length == 2,
          "graft_lake_detail takes (rootPath) or (rootPath, version)")
        val spark = SparkSession.active
        val t = new graft.sources.LakeTable(spark,
          rootArg("graft_lake_detail")(children.head))
        val v = children.lift(1).map(intArg("graft_lake_detail"))
          .getOrElse(t.latestVersion)
        t.detailDf(v).queryExecution.analyzed
      }))
    // MV staleness introspection: one row per call — the base version
    // the state reflects vs the base's current version (behind_by = 0
    // means REFRESH would no-op), plus the roots for forensics
    ext.injectTableFunction((
      new FunctionIdentifier("graft_mv_detail"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_mv_detail"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_mv_detail takes (mvName)")
        graft.sources.LakeMv.detailDf(SparkSession.active,
          strArg("graft_mv_detail")(children.head))
          .queryExecution.analyzed
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("graft_lake_stream_detail"),
      new ExpressionInfo(classOf[graft.sources.LakeTable].getName, null,
        "graft_lake_stream_detail"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_lake_stream_detail takes (rootPath, sourceMetadataPath)")
        val spark = SparkSession.active
        graft.sources.Lake.streamDetail(spark,
          rootArg("graft_lake_stream_detail")(children.head),
          strArg("graft_lake_stream_detail")(children(1)))
          .queryExecution.analyzed
      }))
    // Whole-operator extension tier: the native AS-OF join's planner
    // strategy (logical node AsOfJoinPlan → physical AsOfJoinExec) and the
    // optimizer rule restoring predicate pushdown through the custom node.
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    // Planning-time data skipping for graft.sources.Lake tables: filters
    // on the merge key drop manifest-disjoint files from the scan relation
    // before any task is planned (see LakeManifestPrune).
    ext.injectOptimizerRule(session => new graft.sources.LakeManifestPrune(session))
    // Metadata-only aggregates: a bare count(*)/min/max over a lake scan
    // answers from the manifest stats with zero file I/O.
    ext.injectOptimizerRule(session => new graft.sources.LakeMetadataAggregate(session))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductDouble].getName, null, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes exactly 2 arguments")
        DotProductDouble(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, null, "graft_hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_hash60 takes exactly 1 argument")
        Md5Hash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLength].getName, null, "graft_deflate_len"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_deflate_len takes exactly 1 argument")
        DeflateLength(children.head)
      }))
    // Spark's runtime-filter Bloom expressions, exposed for explicit staged
    // semi-join prefilters (see GraftBloom): bloom build as an aggregate,
    // membership probe as a predicate (filter side must be foldable or a
    // scalar subquery — same contract as InjectRuntimeFilter).
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        null, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_bloom_agg takes (key, estItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        null, "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_might_contain takes (bloom, key)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
  }
}
