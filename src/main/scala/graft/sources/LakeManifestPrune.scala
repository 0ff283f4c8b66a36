package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StructType}

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
  * commit appears), extracts integral bounds on the table's merge key from
  * the filter's conjuncts, and rewraps the relation's FileIndex so files
  * with disjoint key ranges vanish from the relation. The row-level Filter
  * stays on top — pruning is file-granular, parquet pushdown still applies
  * inside surviving files. Files the manifests don't know (foreign files
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
    // lake roots among the scanned files' parents (…/data/part-x.parquet)
    val roots = files.iterator.map(p => new Path(p).getParent)
      .filter(p => p != null && p.getName == "data")
      .map(_.getParent).filter(_ != null).distinct.toSeq
    if (roots.isEmpty) return None
    val stats: Map[String, Map[String, (Long, Long)]] =
      roots.flatMap(r => LakeManifestPrune.statsFor(spark, r)).toMap
    if (stats.isEmpty) return None
    val statCols = stats.valuesIterator.flatMap(_.keysIterator).toSet
    val bounds = statCols.iterator
      .map(c => c -> boundsFor(cond, c))
      .filter { case (_, (lo, hi)) => lo != Long.MinValue || hi != Long.MaxValue }
      .toMap
    if (bounds.isEmpty) return None
    // a file survives iff EVERY constrained column it has stats for
    // intersects the predicate's bounds; columns without stats in that
    // file cannot prune it
    def keep(name: String): Boolean = stats.get(name) match {
      case Some(fileCols) => bounds.forall { case (c, (lo, hi)) =>
        fileCols.get(c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
      case None => true // not a lake-manifested file: never prune
    }
    val kept = files.count(p => keep(new Path(p).getName))
    if (kept == files.length) return None // nothing to do; converge
    val pruned = new LakePrunedFileIndex(hfs.location, keep)
    Some(Filter(cond,
      l.copy(relation = hfs.copy(location = pruned)(hfs.sparkSession))))
  }

  /** Conservative [lo, hi] bounds on integral column `key` implied by the
    * conjuncts of `cond`; untouched sentinels mean unconstrained. */
  private def boundsFor(cond: Expression, key: String): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    // only WIDENING casts are transparent: a narrowing cast (long→int)
    // wraps, so bounds on the cast value say nothing about the column —
    // seeing through one would prune files that hold matching rows
    def widens(from: org.apache.spark.sql.types.DataType,
               to: org.apache.spark.sql.types.DataType): Boolean = (from, to) match {
      case (ShortType | IntegerType | LongType, LongType) => true
      case (ShortType | IntegerType, IntegerType) => true
      case (ShortType, ShortType) => true
      case _ => false
    }
    def attrIs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == key
      case Cast(a: AttributeReference, dt, _, _) if widens(a.dataType, dt) =>
        a.name == key
      case _ => false
    }
    def litVal(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Short, ShortType) => Some(v.toLong)
      case _ => None
    }
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
}

object LakeManifestPrune {
  /** Per-root manifest stats cache: fileName → (column → [min, max]) —
    * the key column plus any declared stats columns — keyed by root and
    * invalidated when the manifest COUNT changes (a new commit adds a
    * manifest; per-file stats are immutable — files are content-addressed
    * UUID names written once). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, (Int, Map[String, Map[String, (Long, Long)]])]()

  private[sources] def statsFor(
      spark: SparkSession,
      root: Path): Map[String, Map[String, (Long, Long)]] =
    try {
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mdir = new Path(root, "_manifests")
      if (!fs.exists(mdir)) return Map.empty
      val manifests = fs.listStatus(mdir).map(_.getPath)
        .filter(_.getName.matches("v\\d{5}\\.json"))
      val cached = cache.get(root.toString)
      if (cached != null && cached._1 == manifests.length) return cached._2
      val m = manifests.iterator.flatMap { p =>
        val in = fs.open(p)
        val s = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
                finally in.close()
        val man = Lake.fromJson(s)
        man.files.map(f => new Path(f.path).getName ->
          (f.cols + (man.keyCol -> ((f.minKey, f.maxKey)))))
      }.toMap
      cache.put(root.toString, (manifests.length, m))
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
