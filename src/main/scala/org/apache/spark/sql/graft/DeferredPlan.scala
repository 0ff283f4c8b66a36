package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.types.StructType

/** A DataFrame whose BODY is built at first action — the lazy-relation
  * seam for query builders that must run driver-side probes (size-gate
  * counts, collected scalars) before they can even shape their plan.
  *
  * Plain Dataset construction is eager through analysis, so a builder
  * that collects a scalar to pick a broadcast hint runs a Spark JOB at
  * DataFrame-CONSTRUCTION time — a side effect callers composing plans
  * they may never execute should not pay. [[Deferred.df]] returns a
  * Dataset over a [[DeferredPlanHolder]] leaf instead: analysis sees
  * only the declared schema (zero jobs), and the injected
  * [[ExpandDeferredPlans]] optimizer rule — optimization is LAZY, it
  * runs at the first action — fires the thunk then, splices the built
  * body's optimized plan in its place, and re-aliases the body's output
  * onto the holder's attribute ids so references above stay bound. AQE
  * and physical planning see an ordinary plan. The thunk fires at most
  * once per HOLDER (memoized below) — derived Datasets (filter, orderBy,
  * join over the same frame) share the holder instance inside their
  * plans, so re-composition never re-pays the probe or the body's
  * localCheckpoints.
  *
  * The declared schema must match the thunk's output positionally (name
  * and type per column) — checked loudly at expansion. */
case class DeferredPlanHolder(output: Seq[Attribute],
                              thunk: () => DataFrame)
    extends LeafNode
    with org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation {
  // unknown until expanded: never let a size estimate of the
  // still-unbuilt body justify broadcasting it
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(Long.MaxValue))
  // self-join/self-union legs get fresh attribute ids (the analyzer's
  // DeduplicateRelations calls this); the memo is shared via `thunk`'s
  // closure only when instances share a body — each new instance
  // carries its own expansion memo keyed off this holder
  override def newInstance(): DeferredPlanHolder =
    copy(output = output.map(_.newInstance()))
  /** The body, built ONCE per holder at first request. */
  @transient lazy val expanded: LogicalPlan =
    thunk().queryExecution.optimizedPlan
}

/** Expansion rule — self-installed by [[Deferred.df]] through
  * `spark.experimental.extraOptimizations` (idempotent), so deferred
  * frames work in any session, extensions-built or not. */
object ExpandDeferredPlans extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case d: DeferredPlanHolder =>
      val inner = d.expanded
      require(inner.output.length == d.output.length &&
          d.output.zip(inner.output).forall { case (o, i) =>
            o.name == i.name && o.dataType == i.dataType },
        s"deferred plan's declared schema ${d.output.map(a =>
          s"${a.name}:${a.dataType.simpleString}")} does not match its " +
          s"body's ${inner.output.map(a =>
            s"${a.name}:${a.dataType.simpleString}")}")
      Project(d.output.zip(inner.output).map { case (o, i) =>
        Alias(i, o.name)(exprId = o.exprId) }, inner)
  }
}

object Deferred {
  /** A DataFrame with `schema` whose body `thunk` is constructed at the
    * FIRST ACTION (see [[DeferredPlanHolder]]). */
  def df(spark: SparkSession, schema: StructType)
        (thunk: => DataFrame): DataFrame = {
    val s = spark.asInstanceOf[ClassicSparkSession]
    if (!s.experimental.extraOptimizations.contains(ExpandDeferredPlans))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ ExpandDeferredPlans
    ClassicDataset.ofRows(s,
      DeferredPlanHolder(DataTypeUtils.toAttributes(schema), () => thunk))
  }
}
