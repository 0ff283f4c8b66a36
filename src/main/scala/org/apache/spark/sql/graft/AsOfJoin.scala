package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator AS-OF join as a first-class Catalyst citizen — the
  * custom-operator tier (c) of the engine: a logical node
  * ([[AsOfJoinPlan]]), a planner strategy ([[AsOfJoinStrategy]], injected
  * via [[GraftSessionExtensions]]), and a physical operator
  * ([[AsOfJoinExec]]) that declares its distribution/ordering requirements
  * and merges per partition.
  *
  * Semantics (fixed, matching the window formulation in
  * graft.extensions.Events.eventsAsofAttribution): for every left row,
  * attach the payload of the LAST right row with the same key whose
  * (time, tiebreak) vector is STRICTLY before the left row's — the
  * "most recent prior observation" join of event attribution, sensor
  * alignment, and trade/quote matching.
  *
  * Why a custom operator instead of the window composition: the window
  * form unions both streams through one exchange and sorts the union;
  * this operator shuffles each side on its own key, sorts each side
  * independently (map-side spillable sorts of the SMALLER relations), and
  * then streams BOTH sides through a two-pointer merge with O(1) state —
  * one payload value per key — per partition. EnsureRequirements
  * satisfies the declared [[ClusteredDistribution]]s and per-partition
  * [[SortOrder]]s exactly as it does for SortMergeJoin, so AQE, reused
  * exchanges, and bucketed inputs (which can satisfy the distribution
  * with NO exchange) all compose for free.
  */
object AsOf {

  /** Left rows + `asofCol` = payload of the last strictly-prior right row
    * with the same key. `tiebreak` breaks equal timestamps on both sides
    * (total order — the determinism contract every graft operator keeps). */
  def joinAsOf(left: DataFrame, right: DataFrame,
               key: String, time: String, tiebreak: String,
               payload: String, asofCol: String): DataFrame = {
    val spark = left.sparkSession
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // Self-join hygiene: the analyzer's DeduplicateRelations never sees this
    // node (it is built post-analysis), so when both inputs derive from the
    // same base relation their attributes share exprIds — and the optimizer
    // would then misattribute the right side's references (pruning it to
    // nothing). Re-alias the right side to fresh exprIds whenever outputs
    // overlap.
    val rp: LogicalPlan =
      if (rp0.outputSet.intersect(lp.outputSet).nonEmpty)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          rp0.output.map(a =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
      else rp0
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val payloadAttr = attr(rp, payload)
    val out = AttributeReference(asofCol, payloadAttr.dataType, nullable = true)()
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], AsOfJoinPlan(lp, rp,
      attr(lp, key), attr(rp, key), attr(lp, time), attr(rp, time),
      attr(lp, tiebreak), attr(rp, tiebreak), payloadAttr, out))
  }

  /** Install [[AsOfJoinStrategy]] once per session (idempotent); also done
    * by the GraftSessionExtensions config route. */
  def install(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[ClassicSparkSession]
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!s.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
  }
}

/** Logical AS-OF join node: output = left.output + the payload-carrying
  * [[outAttr]]. Attributes are resolved at construction (the public API
  * builds it from analyzed child plans), so the node never blocks
  * analysis. */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        leftTie: Attribute, rightTie: Attribute,
                        payload: Attribute, outAttr: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule completing the extension tier: Catalyst's own
  * PushDownPredicates cannot see through an unknown node, so a Filter
  * sitting above [[AsOfJoinPlan]] would keep the join processing rows the
  * query immediately discards. This rule moves any conjunct that
  * references ONLY left-side attributes below the join (left rows map 1:1
  * to output rows, so left-only predicates commute with the join);
  * conjuncts touching the as-of payload stay above. Injected via
  * `injectOptimizerRule` in [[GraftSessionExtensions]]. */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression => CExpr}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  private def conjuncts(e: CExpr): Seq[CExpr] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) =
        conjuncts(cond).partition(c => c.references.subsetOf(AttributeSet(j.left.output)))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, ltb, rtb, payload, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ltb, rtb,
        payload, out) :: Nil
    case _ => Nil
  }
}

/** Physical AS-OF join: requires both children clustered on their key and
  * sorted by (key, time, tiebreak); merges each co-partition with a
  * two-pointer scan keeping ONE payload value of state. Never buffers a
  * key group, never re-sorts the union — cost is the two key-shuffles
  * (or zero, when bucketed layouts already satisfy the distribution)
  * plus a linear merge. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        leftTie: Attribute, rightTie: Attribute,
                        payload: Attribute, outAttr: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lKey = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTime = BindReferences.bindReference(leftTime: Expression, left.output)
    val lTie = BindReferences.bindReference(leftTie: Expression, left.output)
    val rKey = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTime = BindReferences.bindReference(rightTime: Expression, right.output)
    val rTie = BindReferences.bindReference(rightTie: Expression, right.output)
    val rPay = BindReferences.bindReference(payload: Expression, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val tieOrd = TypeUtils.getInterpretedOrdering(leftTie.dataType)
    val leftOut = left.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, leftOut :+ outAttr)
      val payloadRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) merge state: the payload of the newest consumed right row,
      // valid only while its key equals the current left key.
      var lastKey: Any = null
      var lastPayload: Any = null
      var haveLast = false

      // (rk, rt, rtb) strictly before (k, t, tb), same-key rows first by key
      def rightIsPrior(rRow: InternalRow, k: Any, t: Any, tb: Any): Boolean = {
        val rk = rKey.eval(rRow)
        if (rk == null) return true // null-key right rows: consume and ignore
        val c = keyOrd.compare(rk.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
        if (c != 0) return c < 0
        val rt = rTime.eval(rRow)
        val ct = timeOrd.compare(rt.asInstanceOf[AnyRef], t.asInstanceOf[AnyRef])
        if (ct != 0) return ct < 0
        tieOrd.compare(rTie.eval(rRow).asInstanceOf[AnyRef], tb.asInstanceOf[AnyRef]) < 0
      }

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        if (k == null) {
          payloadRow.update(0, null)
        } else {
          val t = lTime.eval(lRow); val tb = lTie.eval(lRow)
          while (rBuf.hasNext && rightIsPrior(rBuf.head, k, t, tb)) {
            val rRow = rBuf.next()
            val rk = rKey.eval(rRow)
            if (rk != null) {
              // copy retained values — UTF8String/array results point into
              // the iterator's reused row buffer
              lastKey = InternalRow.copyValue(rk)
              lastPayload = InternalRow.copyValue(rPay.eval(rRow))
              haveLast = true
            }
          }
          val hit = haveLast &&
            keyOrd.compare(lastKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
          payloadRow.update(0, if (hit) lastPayload else null)
        }
        proj(joined(lRow, payloadRow))
      }
    }
  }
}
