package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, ShortType, StringType, StructType, TimestampNTZType, TimestampType}

/** Planning-time data skipping for [[Lake]] tables as an injected Catalyst
  * optimizer rule — the automatic form of [[LakeTable.readRange]]: a plain
  *
  * {{{ table.read().filter($"k".between(lo, hi)) }}}
  *
  * (or the equivalent `spark.sql`) drops every data file whose manifest
  * [minKey, maxKey] range misses the predicate's bounds BEFORE the scan is
  * planned — no tasks, no footer reads, no I/O for pruned files. This is
  * the role delta/iceberg stats skipping plays behind their DataSource
  * implementations, expressed through the public extension seam
  * (`SparkSessionExtensions.injectOptimizerRule`) over plain parquet.
  *
  * Mechanics: when a Filter sits directly on a parquet LogicalRelation
  * whose files live under a lake root (`<root>/data/part-*.parquet` with a
  * `_manifests` sibling — only such paths are ever considered), the rule
  * reads the metadata-sized manifests ONCE (cached per root until a new
  * commit appears), extracts per-column constraints from the filter's
  * conjuncts — range bounds (`=`, `<`, `>`, BETWEEN), IN-lists (`In` and
  * the optimizer's `InSet` form; a file survives iff every IN conjunct
  * has a member inside its [min,max]), and `IS NULL` / `IS NOT NULL`
  * (answered from per-file null counts) — and rewraps the relation's
  * FileIndex so provably-disjoint files vanish from the relation. The
  * row-level Filter stays on top — pruning is file-granular, parquet
  * pushdown still applies inside surviving files. Files the manifests don't know (foreign files
  * in a mixed scan) are always retained; no bounds extracted → no change;
  * nothing pruned → no change (the fixed-point batch converges because
  * the file set only ever shrinks).
  *
  * Runs in every session built with `GraftSessionExtensions` — the same
  * registration path as the AS-OF join strategy. */
class LakeManifestPrune(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, l: LogicalRelation)
        if l.relation.isInstanceOf[HadoopFsRelation] =>
      val hfs = l.relation.asInstanceOf[HadoopFsRelation]
      prune(cond, l, hfs).getOrElse(f)
  }

  private def prune(cond: Expression, l: LogicalRelation,
                    hfs: HadoopFsRelation): Option[LogicalPlan] = {
    val files = hfs.location.inputFiles
    if (files.isEmpty) return None
    // lake roots among the scanned files' parents (…/data/part-x.parquet,
    // possibly under nested hive <col>=<value>/ levels)
    val roots = files.iterator.map { f =>
      var p = new Path(f).getParent
      while (p != null && p.getName.contains("=")) p = p.getParent
      p
    }.filter(p => p != null && p.getName == "data")
      .map(_.getParent).filter(_ != null).distinct.toSeq
    if (roots.isEmpty) return None
    val stats: Map[String, LakeManifestPrune.FileStat] =
      roots.flatMap(r => LakeManifestPrune.statsFor(spark, r)).toMap
    if (stats.isEmpty) return None
    val statCols = stats.valuesIterator.flatMap(_.num.keysIterator).toSet
    val bounds = statCols.iterator
      .map(c => c -> boundsFor(cond, c))
      .filter { case (_, (lo, hi)) => lo != Long.MinValue || hi != Long.MaxValue }
      .toMap
    val strCols = stats.valuesIterator.flatMap(_.str.keysIterator).toSet
    val strBounds = strCols.iterator
      .map(c => c -> strBoundsFor(cond, c))
      .filter { case (_, (lo, hi)) => lo.isDefined || hi.isDefined }
      .toMap
    val inLists = statCols.iterator
      .map(c => c -> inListsFor(cond, c))
      .filter(_._2.nonEmpty).toMap
    val strInLists = strCols.iterator
      .map(c => c -> strInListsFor(cond, c))
      .filter(_._2.nonEmpty).toMap
    val nullCols = stats.valuesIterator.flatMap(_.nulls.keysIterator).toSet
    val (needNull, needNonNull) = nullConstraints(cond, nullCols)
    // BLOOM phase: point conjuncts (`=`, IN) on declared bloom-index
    // columns probe the per-file sidecar filters ([[LakeBloom]]) — the
    // skipping path for exactly the columns range stats cannot help with
    // (unsorted high-cardinality lookups). Sound by construction: only
    // files WITH coverage whose filters prove every-member-absent for
    // some conjunct land in the fail set.
    val bloomFail: Set[String] = bloomFailures(cond, roots)
    if (bounds.isEmpty && strBounds.isEmpty && inLists.isEmpty &&
        strInLists.isEmpty && needNull.isEmpty && needNonNull.isEmpty &&
        bloomFail.isEmpty)
      return None
    // a file survives iff EVERY constrained column it has stats for
    // intersects the predicate's bounds; columns without stats in that
    // file cannot prune it. String uppers are CEILINGS (truncate +
    // increment), so `ceiling >= lo` never wrongly drops a file
    def keep(name: String): Boolean = stats.get(name) match {
      case Some(fileCols) =>
        bounds.forall { case (c, (lo, hi)) =>
          fileCols.num.get(c) match {
            case Some((mn, mx)) => mx >= lo && mn <= hi
            case None => true
          }
        } && strBounds.forall { case (c, (lo, hi)) =>
          fileCols.str.get(c) match {
            case Some((mn, mx)) =>
              lo.forall(l => mx >= l) && hi.forall(h => mn <= h)
            case None => true
          }
        } && inLists.forall { case (c, conjuncts) =>
          // every IN conjunct must have at least one member the file's
          // range could hold (members outside [min,max] cannot match)
          fileCols.num.get(c) match {
            case Some((mn, mx)) =>
              conjuncts.forall(_.exists(v => v >= mn && v <= mx))
            case None => true
          }
        } && strInLists.forall { case (c, conjuncts) =>
          fileCols.str.get(c) match {
            case Some((mn, mx)) =>
              conjuncts.forall(_.exists(v => v >= mn && v <= mx))
            case None => true
          }
        } && needNull.forall(c =>
          // IS NULL can only match in files that HOLD nulls
          fileCols.nulls.get(c).forall(_ > 0L)
        ) && needNonNull.forall(c =>
          // IS NOT NULL can only match where some value is non-null
          fileCols.nulls.get(c).forall(n =>
            fileCols.rows < 0L || n < fileCols.rows))
      case None => true // not a lake-manifested file: never prune
    }
    def keepAll(name: String): Boolean = keep(name) && !bloomFail(name)
    val kept = files.count(p => keepAll(new Path(p).getName))
    if (kept == files.length) return None // nothing to do; converge
    val pruned = new LakePrunedFileIndex(hfs.location, keepAll)
    Some(Filter(cond,
      l.copy(relation = hfs.copy(location = pruned)(hfs.sparkSession))))
  }

  /** Basenames a bloom sidecar probe proves CANNOT satisfy the point
    * conjuncts of `cond` — empty when no root declares bloom columns or
    * no point conjunct targets one. One cached distributed probe per
    * (root, column, value-set). */
  private def bloomFailures(cond: Expression, roots: Seq[Path]): Set[String] = {
    var fail = Set.empty[String]
    roots.foreach { r =>
      val fs = r.getFileSystem(spark.sparkContext.hadoopConfiguration)
      try LakeBloom.readConfig(fs, r).foreach { cfg =>
        cfg.cols.foreach { c =>
          val conj = bloomConjuncts(cond, c)
          if (conj.nonEmpty)
            LakeBloom.probe(spark, r, c, conj).foreach { case (n, pass) =>
              if (!pass) fail += n
            }
        }
      } catch { case scala.util.control.NonFatal(e) => logWarning("bloom probe failed", e) }
    }
    fail
  }

  /** Hashed point conjuncts on `key`: each inner seq is one conjunct's
    * members as (h1, h2) pairs. Numeric/date/timestamp members hash in
    * STAT UNITS (mirroring the build side's `Lake.statLong` input),
    * strings hash raw — no ASCII restriction, hashes need no order. */
  private def bloomConjuncts(cond: Expression,
                             key: String): Seq[Seq[(Long, Long)]] = {
    def strAttrIs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == key && a.dataType == StringType
      case _ => false
    }
    def strLit(e: Expression): Option[String] = e match {
      case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType)
          if u != null => Some(u.toString)
      case _ => None
    }
    def strOf(v: Any): Option[String] = v match {
      case u: org.apache.spark.unsafe.types.UTF8String if u != null =>
        Some(u.toString)
      case _ => None
    }
    // dispatch by the ATTRIBUTE's type, not by which pattern happens to
    // match first — a string equality must reach the string hasher, not
    // die in a numeric literal extractor
    def one(a: Expression, v: Expression): Option[Seq[(Long, Long)]] =
      if (strAttrIs(a)) strLit(v).map(s => Seq(LakeBloom.hashString(s)))
      else if (numAttrIs(key)(a)) numLit(v).map(x => Seq(LakeBloom.hashLong(x)))
      else None
    def all[A](vs: Seq[Option[A]]): Option[Seq[A]] =
      if (vs.nonEmpty && vs.forall(_.isDefined)) Some(vs.flatten) else None
    def many(a: Expression, list: Seq[Expression]): Option[Seq[(Long, Long)]] =
      if (strAttrIs(a)) all(list.map(strLit)).map(_.map(LakeBloom.hashString))
      else if (numAttrIs(key)(a))
        all(list.map(numLit)).map(_.map(LakeBloom.hashLong))
      else None
    def manySet(a: Expression, hset: Set[Any]): Option[Seq[(Long, Long)]] =
      if (strAttrIs(a))
        all(hset.toSeq.map(strOf)).map(_.map(LakeBloom.hashString))
      else if (numAttrIs(key)(a))
        all(hset.toSeq.map(internalToLong)).map(_.map(LakeBloom.hashLong))
      else None
    splitConjunctivePredicates(cond).flatMap {
      case EqualTo(a, v) if strAttrIs(a) || numAttrIs(key)(a) => one(a, v)
      case EqualTo(v, a) if strAttrIs(a) || numAttrIs(key)(a) => one(a, v)
      case In(a, list) if strAttrIs(a) || numAttrIs(key)(a) => many(a, list)
      case InSet(a, hset) if strAttrIs(a) || numAttrIs(key)(a) =>
        manySet(a, hset)
      case _ => None
    }
  }

  /** Conservative [lo, hi] bounds on integral column `key` implied by the
    * conjuncts of `cond`; untouched sentinels mean unconstrained. */
  private def boundsFor(cond: Expression, key: String): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    // attr side: the column or a WIDENING cast of it (numAttrIs); literal
    // side: DATE/TIMESTAMP literals carry the SAME units the manifest
    // stats use (Lake.statLong) — days/micros — so a
    // $"d" >= date'1995-01-01' conjunct prunes directly (numLit)
    val attrIs = numAttrIs(key) _
    val litVal = numLit _
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(a, v) if attrIs(a) =>
        litVal(v).foreach(x => lo = math.max(lo, x))
      case GreaterThan(a, v) if attrIs(a) =>
        litVal(v).filter(_ < Long.MaxValue).foreach(x => lo = math.max(lo, x + 1))
      case LessThanOrEqual(a, v) if attrIs(a) =>
        litVal(v).foreach(x => hi = math.min(hi, x))
      case LessThan(a, v) if attrIs(a) =>
        litVal(v).filter(_ > Long.MinValue).foreach(x => hi = math.min(hi, x - 1))
      case EqualTo(a, v) if attrIs(a) =>
        litVal(v).foreach { x => lo = math.max(lo, x); hi = math.min(hi, x) }
      case GreaterThanOrEqual(v, a) if attrIs(a) => // literal op attr, flipped
        litVal(v).foreach(x => hi = math.min(hi, x))
      case GreaterThan(v, a) if attrIs(a) =>
        litVal(v).filter(_ > Long.MinValue).foreach(x => hi = math.min(hi, x - 1))
      case LessThanOrEqual(v, a) if attrIs(a) =>
        litVal(v).foreach(x => lo = math.max(lo, x))
      case LessThan(v, a) if attrIs(a) =>
        litVal(v).filter(_ < Long.MaxValue).foreach(x => lo = math.max(lo, x + 1))
      case EqualTo(v, a) if attrIs(a) =>
        litVal(v).foreach { x => lo = math.max(lo, x); hi = math.min(hi, x) }
      case _ => ()
    }
    (lo, hi)
  }

  /** Shared attr matcher: the column itself, or a WIDENING cast of it
    * (narrowing casts wrap — bounds on the cast say nothing about the
    * column). */
  private def numAttrIs(key: String)(e: Expression): Boolean = {
    def widens(from: org.apache.spark.sql.types.DataType,
               to: org.apache.spark.sql.types.DataType): Boolean = (from, to) match {
      case (ShortType | IntegerType | LongType, LongType) => true
      case (ShortType | IntegerType, IntegerType) => true
      case (ShortType, ShortType) => true
      case _ => false
    }
    e match {
      case a: AttributeReference => a.name == key
      case Cast(a: AttributeReference, dt, _, _) if widens(a.dataType, dt) =>
        a.name == key
      case _ => false
    }
  }

  /** Literal in the column's STAT UNITS (raw integral / days / micros). */
  private def numLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Int, DateType) => Some(v.toLong)
    case Literal(v: Long, TimestampType) => Some(v)
    case Literal(v: Long, TimestampNTZType) => Some(v)
    case _ => None
  }

  private def internalToLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case sh: Short => Some(sh.toLong)
    case _ => None
  }

  /** Member lists of `key IN (…)` conjuncts (one per conjunct — a file
    * must intersect EVERY conjunct's member set). A list with any
    * non-literal member contributes nothing. */
  private def inListsFor(cond: Expression, key: String): Seq[Seq[Long]] =
    splitConjunctivePredicates(cond).flatMap {
      case In(a, list) if numAttrIs(key)(a) =>
        val vs = list.map(numLit)
        if (vs.nonEmpty && vs.forall(_.isDefined)) Some(vs.flatten) else None
      case InSet(a, hset) if numAttrIs(key)(a) =>
        val vs = hset.toSeq.map(internalToLong)
        if (vs.nonEmpty && vs.forall(_.isDefined)) Some(vs.flatten) else None
      case _ => None
    }

  /** String IN conjuncts — ASCII members only (see strBoundsFor). */
  private def strInListsFor(cond: Expression, key: String): Seq[Seq[String]] = {
    def attrIs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == key && a.dataType == StringType
      case _ => false
    }
    def strOf(v: Any): Option[String] = v match {
      case u: org.apache.spark.unsafe.types.UTF8String if u != null =>
        Some(u.toString).filter(Lake.isAscii)
      case _ => None
    }
    splitConjunctivePredicates(cond).flatMap {
      case In(a, list) if attrIs(a) =>
        val vs = list.map {
          case Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            strOf(u)
          case _ => None
        }
        if (vs.nonEmpty && vs.forall(_.isDefined)) Some(vs.flatten) else None
      case InSet(a, hset) if attrIs(a) =>
        val vs = hset.toSeq.map(strOf)
        if (vs.nonEmpty && vs.forall(_.isDefined)) Some(vs.flatten) else None
      case _ => None
    }
  }

  /** Columns (among those with per-file null counts) required NULL /
    * NOT NULL by top-level conjuncts. */
  private def nullConstraints(cond: Expression,
                              nullCols: Set[String]): (Set[String], Set[String]) = {
    var isNull = Set.empty[String]
    var notNull = Set.empty[String]
    splitConjunctivePredicates(cond).foreach {
      case IsNull(a: AttributeReference) if nullCols.contains(a.name) =>
        isNull += a.name
      case IsNotNull(a: AttributeReference) if nullCols.contains(a.name) =>
        notNull += a.name
      case _ => ()
    }
    (isNull, notNull)
  }

  /** Conservative string bounds on column `key` from the conjuncts of
    * `cond`. Strict inequalities relax to inclusive ones (no string
    * successor/predecessor), non-ASCII literals are ignored (java String
    * order and UTF8String byte order agree only there — see
    * Lake.strUpper's doc), and None means unconstrained on that side. */
  private def strBoundsFor(cond: Expression,
                           key: String): (Option[String], Option[String]) = {
    var lo: Option[String] = None
    var hi: Option[String] = None
    def tLo(x: String): Unit = lo = Some(lo.fold(x)(l => if (x > l) x else l))
    def tHi(x: String): Unit = hi = Some(hi.fold(x)(h => if (x < h) x else h))
    def attrIs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == key && a.dataType == StringType
      case _ => false
    }
    def litStr(e: Expression): Option[String] = e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
          if s != null =>
        Some(s.toString).filter(graft.sources.Lake.isAscii)
      case _ => None
    }
    splitConjunctivePredicates(cond).foreach {
      case GreaterThanOrEqual(a, v) if attrIs(a) => litStr(v).foreach(tLo)
      case GreaterThan(a, v) if attrIs(a) => litStr(v).foreach(tLo)
      case LessThanOrEqual(a, v) if attrIs(a) => litStr(v).foreach(tHi)
      case LessThan(a, v) if attrIs(a) => litStr(v).foreach(tHi)
      case EqualTo(a, v) if attrIs(a) =>
        litStr(v).foreach { x => tLo(x); tHi(x) }
      case GreaterThanOrEqual(v, a) if attrIs(a) => litStr(v).foreach(tHi)
      case GreaterThan(v, a) if attrIs(a) => litStr(v).foreach(tHi)
      case LessThanOrEqual(v, a) if attrIs(a) => litStr(v).foreach(tLo)
      case LessThan(v, a) if attrIs(a) => litStr(v).foreach(tLo)
      case EqualTo(v, a) if attrIs(a) =>
        litStr(v).foreach { x => tLo(x); tHi(x) }
      case _ => ()
    }
    (lo, hi)
  }
}

/** Metadata-only aggregates for [[Lake]] tables — the sibling rule to
  * [[LakeManifestPrune]]: an aggregate of `count(*)` / `count(col)` /
  * `min(col)` / `max(col)` over a lake relation is answered from the
  * manifests' per-file statistics and replaced by a [[LocalRelation]] —
  * zero tasks, zero file I/O, the `SELECT count(*) FROM t` every
  * dashboard fires answered from hundreds of bytes of metadata (Delta
  * and Iceberg do the same from their stats). Three shapes answer:
  *
  *  - GLOBAL over the bare relation — the original rule;
  *  - GROUPED by a single exact-stat column whose per-file bounds are
  *    degenerate (min = max, no nulls) — in practice a hive PARTITION
  *    column, where every file holds exactly one value: per-group
  *    counts/min/max are per-file-group sums;
  *  - FILTERED (global), when every top-level conjunct is a recognized
  *    stats constraint and every file is provably WHOLLY inside or
  *    WHOLLY outside the predicate (null counts close the min/max-
  *    ignore-nulls hole; string uppers are ceilings, so whole-file
  *    string implication uses the ceiling on the high side and the
  *    truncated prefix on the low side, both conservative). One
  *    partially-covered file bails the whole node — a wrong fast answer
  *    is worse than a scan.
  *
  * Strictly conservative everywhere: every file of the relation must be
  * known to a manifest; a join or tombstone anti-join above the relation
  * changes the plan shape and the rule never matches (outstanding
  * deferred deletes therefore disable it automatically); `min`/`max`
  * answer only for integral/date/timestamp columns whose stat units are
  * EXACT (never doubles — their Long stats truncate — and never strings
  * — their bounds are truncated prefixes/ceilings); `count(col)` needs
  * per-file null counts for every file. One unanswerable aggregate
  * bails the whole node. */
class LakeMetadataAggregate(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, Project}
  import LakeManifestPrune.FileStat

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) =>
      answer(None, exprs, child).getOrElse(agg)
    case agg @ Aggregate(Seq(g: AttributeReference), exprs, child, _) =>
      answer(Some(g), exprs, child).getOrElse(agg)
  }

  /** Peel attribute-only Projects and at most one Filter off the
    * relation. */
  private def unwrap(p: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression])] = p match {
    case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
      Some((l, None))
    case Project(projList, inner)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(inner)
    case Filter(cond, inner) =>
      unwrap(inner) match {
        case Some((l, None)) => Some((l, Some(cond)))
        case _ => None
      }
    case _ => None
  }

  private def exactStatType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case ShortType | IntegerType | LongType | DateType | TimestampType |
           TimestampNTZType => true
      case _ => false
    }

  /** Stat-unit Long back to the attribute's INTERNAL value. */
  private def internalOf(v: Long,
                         dt: org.apache.spark.sql.types.DataType): Any = dt match {
    case ShortType => v.toShort
    case IntegerType | DateType => v.toInt
    case _ => v
  }

  /** How much of a file a predicate covers, decided from stats alone. */
  private sealed trait Cover
  private case object Whole extends Cover
  private case object Empty extends Cover
  private case object Partial extends Cover

  private def nullFree(st: FileStat, c: String): Boolean =
    st.nulls.get(c).contains(0L)

  /** Classify every top-level conjunct into a per-file cover test, or
    * None when ANY conjunct is not a recognized stats constraint (an
    * unknown conjunct could filter rows the stats can't see). */
  private def classify(cond: Expression): Option[Seq[FileStat => Cover]] = {
    def numLit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case Literal(v: Int, DateType) => Some(v.toLong)
      case Literal(v: Long, TimestampType) => Some(v)
      case Literal(v: Long, TimestampNTZType) => Some(v)
      case _ => None
    }
    def strLit(e: Expression): Option[String] = e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
          if s != null => Some(s.toString).filter(Lake.isAscii)
      case _ => None
    }
    def numAttr(e: Expression): Option[String] = e match {
      case a: AttributeReference if exactStatType(a.dataType) => Some(a.name)
      case _ => None
    }
    def strAttr(e: Expression): Option[String] = e match {
      case a: AttributeReference if a.dataType == StringType => Some(a.name)
      case _ => None
    }
    /** [lo, hi] range test on a numeric column (inclusive, stat units). */
    def numRange(c: String, lo: Long, hi: Long)(st: FileStat): Cover =
      st.num.get(c) match {
        case Some((mn, mx)) =>
          if (mx < lo || mn > hi) Empty
          else if (mn >= lo && mx <= hi && nullFree(st, c)) Whole
          else Partial
        case None => Partial
      }
    /** Operator-aware string test — stored bounds are (truncated-prefix
      * lower, incremented-ceiling upper): prefix <= true-min,
      * ceiling >= true-max, so each implication below is conservative. */
    def strTest(c: String, isWhole: (String, String) => Boolean,
                isEmpty: (String, String) => Boolean)(st: FileStat): Cover =
      st.str.get(c) match {
        case Some((mn, mx)) =>
          if (isEmpty(mn, mx)) Empty
          else if (isWhole(mn, mx) && nullFree(st, c)) Whole
          else Partial
        case None => Partial
      }
    val tests = splitConjunctivePredicates(cond).map {
      // numeric comparisons, both orientations
      case GreaterThanOrEqual(a, v) if numAttr(a).isDefined =>
        numLit(v).map(x => numRange(numAttr(a).get, x, Long.MaxValue) _)
      case GreaterThan(a, v) if numAttr(a).isDefined =>
        numLit(v).filter(_ < Long.MaxValue)
          .map(x => numRange(numAttr(a).get, x + 1, Long.MaxValue) _)
      case LessThanOrEqual(a, v) if numAttr(a).isDefined =>
        numLit(v).map(x => numRange(numAttr(a).get, Long.MinValue, x) _)
      case LessThan(a, v) if numAttr(a).isDefined =>
        numLit(v).filter(_ > Long.MinValue)
          .map(x => numRange(numAttr(a).get, Long.MinValue, x - 1) _)
      case EqualTo(a, v) if numAttr(a).isDefined =>
        numLit(v).map(x => numRange(numAttr(a).get, x, x) _)
      case GreaterThanOrEqual(v, a) if numAttr(a).isDefined =>
        numLit(v).map(x => numRange(numAttr(a).get, Long.MinValue, x) _)
      case GreaterThan(v, a) if numAttr(a).isDefined =>
        numLit(v).filter(_ > Long.MinValue)
          .map(x => numRange(numAttr(a).get, Long.MinValue, x - 1) _)
      case LessThanOrEqual(v, a) if numAttr(a).isDefined =>
        numLit(v).map(x => numRange(numAttr(a).get, x, Long.MaxValue) _)
      case LessThan(v, a) if numAttr(a).isDefined =>
        numLit(v).filter(_ < Long.MaxValue)
          .map(x => numRange(numAttr(a).get, x + 1, Long.MaxValue) _)
      case EqualTo(v, a) if numAttr(a).isDefined =>
        numLit(v).map(x => numRange(numAttr(a).get, x, x) _)
      // string comparisons (attr-side only; literal-side flips are rare
      // on strings and simply bail)
      case GreaterThanOrEqual(a, v) if strAttr(a).isDefined =>
        strLit(v).map(x => strTest(strAttr(a).get,
          (mn, _) => mn >= x, (_, mx) => mx < x) _)
      case GreaterThan(a, v) if strAttr(a).isDefined =>
        strLit(v).map(x => strTest(strAttr(a).get,
          (mn, _) => mn > x, (_, mx) => mx <= x) _)
      case LessThanOrEqual(a, v) if strAttr(a).isDefined =>
        strLit(v).map(x => strTest(strAttr(a).get,
          (_, mx) => mx <= x, (mn, _) => mn > x) _)
      case LessThan(a, v) if strAttr(a).isDefined =>
        strLit(v).map(x => strTest(strAttr(a).get,
          (_, mx) => mx < x, (mn, _) => mn >= x) _)
      case EqualTo(a, v) if strAttr(a).isDefined =>
        strLit(v).map(x => strTest(strAttr(a).get,
          (mn, mx) => mn == x && mx == x,
          (mn, mx) => mx < x || mn > x) _)
      // null tests (need per-file null counts)
      case IsNotNull(a: AttributeReference) =>
        Some((st: FileStat) => st.nulls.get(a.name) match {
          case Some(n) =>
            if (n == 0L) Whole
            else if (st.rows >= 0 && n == st.rows) Empty
            else Partial
          case None => Partial
        })
      case IsNull(a: AttributeReference) =>
        Some((st: FileStat) => st.nulls.get(a.name) match {
          case Some(n) =>
            if (st.rows >= 0 && n == st.rows) Whole
            else if (n == 0L) Empty
            else Partial
          case None => Partial
        })
      // IN lists on exact numeric columns
      case In(a, list) if numAttr(a).isDefined =>
        val vs = list.map(numLit)
        if (vs.nonEmpty && vs.forall(_.isDefined)) {
          val members = vs.flatten
          val c = numAttr(a).get
          Some((st: FileStat) => st.num.get(c) match {
            case Some((mn, mx)) =>
              if (!members.exists(v => v >= mn && v <= mx)) Empty
              else if (mn == mx && members.contains(mn) && nullFree(st, c)) Whole
              else Partial
            case None => Partial
          })
        } else None
      case InSet(a, hset) if numAttr(a).isDefined =>
        val vs = hset.toSeq.map {
          case l: Long => Some(l)
          case i: Int => Some(i.toLong)
          case sh: Short => Some(sh.toLong)
          case _ => None
        }
        if (vs.nonEmpty && vs.forall(_.isDefined)) {
          val members = vs.flatten
          val c = numAttr(a).get
          Some((st: FileStat) => st.num.get(c) match {
            case Some((mn, mx)) =>
              if (!members.exists(v => v >= mn && v <= mx)) Empty
              else if (mn == mx && members.contains(mn) && nullFree(st, c)) Whole
              else Partial
            case None => Partial
          })
        } else None
      case _ => None
    }
    if (tests.forall(_.isDefined)) Some(tests.flatten) else None
  }

  private def answer(group: Option[AttributeReference],
                     exprs: Seq[NamedExpression],
                     child: LogicalPlan): Option[LogicalPlan] = {
    val (l, condOpt) = unwrap(child).getOrElse(return None)
    // grouped + filtered COMPOSE: the whole-file cover test first prunes
    // the file set (bailing on any partial cover), then the survivors
    // group by their degenerate value — each step is sound alone and
    // they commute (per-file stats are immutable)
    val hfs = l.relation.asInstanceOf[HadoopFsRelation]
    val files = hfs.location.inputFiles
    if (files.isEmpty) return None
    val roots = files.iterator.map { f =>
      var p = new Path(f).getParent
      while (p != null && p.getName.contains("=")) p = p.getParent
      p
    }.filter(p => p != null && p.getName == "data")
      .map(_.getParent).filter(_ != null).distinct.toSeq
    if (roots.isEmpty) return None
    val stats = roots.flatMap(r => LakeManifestPrune.statsFor(spark, r)).toMap
    val allStats = files.toSeq.map(f => stats.get(new Path(f).getName) match {
      case Some(st) if st.rows >= 0 => st
      case _ => return None // a file the manifests don't know: bail
    })
    // filtered: every file must be WHOLLY in or WHOLLY out
    val fileStats = condOpt match {
      case None => allStats
      case Some(cond) =>
        val tests = classify(cond).getOrElse(return None)
        allStats.flatMap { st =>
          val covers = tests.map(_(st))
          if (covers.contains(Empty)) None
          else if (covers.forall(_ == Whole)) Some(st)
          else return None // partially covered: a scan must decide
        }
    }
    // grouped: the group column must be degenerate per file (one exact
    // value, no nulls) — true by construction for hive partition columns
    val groups: Seq[(Option[Long], Seq[FileStat])] = group match {
      case None => Seq((None, fileStats))
      case Some(g) =>
        if (!exactStatType(g.dataType)) return None
        val keyed = fileStats.map { st =>
          st.num.get(g.name) match {
            case Some((mn, mx)) if mn == mx && nullFree(st, g.name) =>
              (mn, st)
            case _ => return None
          }
        }
        keyed.groupBy(_._1).toSeq.map { case (v, sts) =>
          (Some(v), sts.map(_._2)) }
    }
    val rows = groups.map { case (gv, sts) =>
      val totalRows = sts.map(_.rows).sum
      val values = exprs.map {
        case a: AttributeReference if group.exists(_.exprId == a.exprId) =>
          internalOf(gv.get, a.dataType)
        case Alias(a: AttributeReference, _)
            if group.exists(_.exprId == a.exprId) =>
          internalOf(gv.get, a.dataType)
        case Alias(ae: AggregateExpression, _)
            if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Count(Seq(Literal(_, _))) => totalRows
            case Count(Seq(a: AttributeReference)) =>
              // non-null count: needs per-file null counts everywhere
              if (sts.forall(_.nulls.contains(a.name)))
                totalRows - sts.map(_.nulls(a.name)).sum
              else return None
            case Min(a: AttributeReference) if exactStatType(a.dataType) =>
              val bounds = sts.map(_.num.get(a.name))
              if (bounds.forall(_.isDefined) && bounds.nonEmpty)
                internalOf(bounds.flatten.map(_._1).min, a.dataType)
              else if (bounds.isEmpty) null
              else return None
            case Max(a: AttributeReference) if exactStatType(a.dataType) =>
              val bounds = sts.map(_.num.get(a.name))
              if (bounds.forall(_.isDefined) && bounds.nonEmpty)
                internalOf(bounds.flatten.map(_._2).max, a.dataType)
              else if (bounds.isEmpty) null
              else return None
            case _ => return None
          }
        case _ => return None
      }
      InternalRow.fromSeq(values)
    }
    // a filtered-empty GLOBAL aggregate folds over zero files and yields
    // one row (count 0, null min/max); a grouped-empty one yields no
    // rows — both exactly what the real aggregate would produce
    Some(LocalRelation(exprs.map(_.toAttribute), rows))
  }
}

object LakeManifestPrune {
  /** One file's prunable statistics: `num` carries [min,max] in
    * [[Lake.statLong]] units (integral / days / micros) for the merge key
    * plus numeric stats columns; `str` carries truncated-lower /
    * incremented-ceiling STRING bounds for string stats columns. */
  private[graft] case class FileStat(num: Map[String, (Long, Long)],
                                     str: Map[String, (String, String)],
                                     rows: Long = -1L,
                                     nulls: Map[String, Long] = Map.empty)

  /** Per-root stats cache entry: the newest delta-manifest name seen (the
    * invalidation key — names are fixed-width, so string order is version
    * order; a vacuum that drops OLD manifests leaves `newest` unchanged,
    * correctly, because per-file stats are immutable) plus the fileName →
    * FileStat map covering every file any manifest ever added. */
  private case class Entry(newest: String, stats: Map[String, FileStat])

  /** Bounded LRU — every gated lake lane builds a fresh tempdir root per
    * invocation, so an unbounded per-root map would grow for the life of
    * a bench/test JVM. */
  private val cache = Lake.lruMap[String, Entry](64)

  private[sources] def clearCache(): Unit = cache.clear()

  private[graft] def statsFor(
      spark: SparkSession,
      root: Path): Map[String, FileStat] =
    try {
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mdir = new Path(root, "_manifests")
      if (!fs.exists(mdir)) return Map.empty
      val listing = fs.listStatus(mdir).map(_.getPath.getName)
      val deltaNames = listing.filter(_.matches("v\\d{5}\\.json")).sorted
      if (deltaNames.isEmpty) return Map.empty
      val newest = deltaNames.last
      val cached = cache.get(root.toString)
      if (cached != null && cached.newest == newest) return cached.stats
      def readDelta(name: String): Lake.Delta = {
        val in = fs.open(new Path(mdir, name))
        try Lake.fromJson(new String(in.readAllBytes(), StandardCharsets.UTF_8))
        finally in.close()
      }
      def statOf(keyCol: String, f: Lake.FileEntry): FileStat =
        // keyless (append-log) tables carry sentinel key bounds — no
        // column named after them must ever enter the stats map
        FileStat(
          if (keyCol.isEmpty) f.cols
          else f.cols + (keyCol -> ((f.minKey, f.maxKey))),
          f.scols, f.rows, f.nulls)
      // warm path: a known root only folds the deltas NEWER than last time
      // (stats are per-file immutable; removals never need processing and
      // stale entries for vacuumed files are unreachable by any scan)
      var m: Map[String, FileStat] =
        if (cached != null) cached.stats else Map.empty
      // cold start: anchor on the NEWEST checkpoint and fold only the
      // delta suffix after it. A checkpoint is the full resolved snapshot,
      // so it already carries every live file older checkpoints and
      // pre-checkpoint deltas list; what the skip loses — stats of files
      // REMOVED before the checkpoint — only served time travel into
      // vacuum-aged history, and a stats miss is conservative (the scan
      // keeps the file). Folding everything instead made cold planning on
      // a 1M-file table pay an O(all history) JSON parse — measured 22 s
      // at LakeScale's 1M point vs seconds for checkpoint + suffix.
      val anchorCkpt: Option[String] =
        if (cached != null) None
        else listing.filter(_.matches("v\\d{5}\\.ckpt\\.parquet"))
          .sorted.lastOption
      val anchorName = anchorCkpt.map(_.replace(".ckpt.parquet", ".json"))
      val toRead =
        if (cached != null) deltaNames.filter(_ > cached.newest).toSeq
        else anchorName.fold(deltaNames.toSeq)(a =>
          deltaNames.filter(_ > a).toSeq)
      val deltas = toRead.map(n => n -> readDelta(n)).toMap
      anchorCkpt.foreach { c =>
        val keyCol = readDelta(anchorName.get).keyCol
        spark.read.parquet(new Path(mdir, c).toString).collect().foreach { r =>
          Lake.ckptEntry(r) match {
            case ("data", f) =>
              m += new Path(f.path).getName -> statOf(keyCol, f)
            case _ => () // tombstone files are never filter-pruned
          }
        }
      }
      toRead.foreach { n =>
        val d = deltas(n)
        m ++= d.adds.map(f => new Path(f.path).getName -> statOf(d.keyCol, f))
      }
      cache.put(root.toString, Entry(newest, m))
      m
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
}

/** A [[FileIndex]] view that hides files rejected by `keep` — the pruned
  * relation delegates listing/refresh to the underlying index, so file
  * statuses are never re-fetched. */
private[sources] class LakePrunedFileIndex(underlying: FileIndex,
                                           keep: String => Boolean)
    extends FileIndex {
  override def rootPaths: Seq[Path] = underlying.rootPaths
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => keep(f.getPath.getName))))
      .filter(_.files.nonEmpty)
  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(p => keep(new Path(p).getName))
  override def refresh(): Unit = underlying.refresh()
  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).iterator.flatMap(_.files).map(_.getLen).sum
  override def partitionSchema: StructType = underlying.partitionSchema
}
