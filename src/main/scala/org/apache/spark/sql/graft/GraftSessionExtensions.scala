package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension tier: the native AS-OF join's planner
    // strategy (logical node AsOfJoinPlan → physical AsOfJoinExec) and the
    // optimizer rule restoring predicate pushdown through the custom node.
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    // Planning-time data skipping for graft.sources.Lake tables: filters
    // on the merge key drop manifest-disjoint files from the scan relation
    // before any task is planned (see LakeManifestPrune).
    ext.injectOptimizerRule(session => new graft.sources.LakeManifestPrune(session))
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
