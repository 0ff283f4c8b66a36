package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Name → root binding layer for [[Lake]] tables — the piece that lets a
  * SQL user say `CREATE TABLE sales KEY o_orderkey AS …; SELECT * FROM
  * sales; MERGE INTO sales …` without ever spelling `graft_lake('<root>')`.
  *
  * The catalog is a DIRECTORY of one-entry files (`<dir>/<name>.tbl`,
  * content = the table's root path), not a database: the content is
  * written to a dot-temp first and the name CLAIMED atomically
  * ([[Lake.publishAtomic]] — hard link on `file://`, rename elsewhere),
  * so two racing `CREATE TABLE sales` get one winner and one clean
  * refusal, and a concurrent lookup never sees a half-written entry —
  * the same optimistic-concurrency primitive the lake's own manifest
  * commit uses. Entries are tiny and
  * read per statement (a single namenode stat + short read — parse/
  * analysis-time metadata, never per-row work), so there is nothing to
  * cache or invalidate across sessions: any engine sharing the catalog
  * dir sees a registration the moment it lands.
  *
  * Resolution surfaces:
  *  - WRITE path: [[org.apache.spark.sql.graft.GraftSqlParser]] resolves a
  *    bare single-part identifier after its verbs (MERGE INTO / INSERT
  *    INTO / UPDATE / DELETE FROM / OPTIMIZE / VACUUM / ALTER / ANALYZE /
  *    RESTORE / CREATE … SHALLOW CLONE) through [[lookup]]; unknown names
  *    delegate untouched, so DML on ordinary tables is never captured.
  *  - READ path: [[LakeNameResolution]] (an injected analyzer rule)
  *    rewrites a still-unresolved single-part [[UnresolvedRelation]] whose
  *    name the catalog knows into the lake snapshot relation — `SELECT …
  *    FROM sales [VERSION AS OF n | TIMESTAMP AS OF '<ts>']` and
  *    `spark.read.table("sales")` both work. Spark's own resolution runs
  *    FIRST in the same analyzer batch, so temp views and session-catalog
  *    tables keep shadowing; the rule only sees names Spark could not
  *    resolve, which would otherwise fail analysis.
  *
  * The catalog directory comes from `spark.graft.catalog.dir` (default:
  * `<spark.sql.warehouse.dir>/_graft_catalog`). Managed tables (CREATE
  * without LOCATION) live under `<dir>/tables/<name>`; DROP TABLE only
  * unbinds the NAME — data stays at the root (every binding is external
  * in spirit: the root remains addressable as `graft_lake('<root>')`). */
object LakeCatalog {

  private val Suffix = ".tbl"

  /** Names are plain SQL identifiers (letter/underscore head, then
    * letters/digits/underscores), compared case-insensitively — stored
    * lowercase, like Spark's default session catalog. */
  def isValidName(name: String): Boolean =
    name.nonEmpty && (name.head.isLetter || name.head == '_') &&
      name.forall(c => c.isLetterOrDigit || c == '_')

  def catalogDir(spark: SparkSession): Path = new Path(
    spark.conf.get("spark.graft.catalog.dir",
      spark.conf.get("spark.sql.warehouse.dir") + "/_graft_catalog"))

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def entryPath(spark: SparkSession, name: String): Path =
    new Path(catalogDir(spark), name.toLowerCase + Suffix)

  /** A fresh root for a MANAGED table (CREATE without LOCATION) named
    * `name` — UNIQUE per call (`<name>-<suffix>`), because the binding is
    * the pointer and DROP only unbinds: re-CREATE after DROP must land a
    * fresh directory, never collide with the dropped table's data (which
    * stays addressable as `graft_lake('<old root>')` or re-bindable). */
  def managedRoot(spark: SparkSession, name: String): String =
    new Path(new Path(catalogDir(spark), "tables"),
      name.toLowerCase + "-" +
        java.util.UUID.randomUUID().toString.take(8)).toString

  /** Atomically claim `name` → `root`. Refuses an already-bound name
    * loudly (the CREATE TABLE duplicate-name contract); the refusal
    * message carries the existing binding so the caller can decide
    * between DROP + re-create and picking another name.
    *
    * Write-the-content-first, then CLAIM atomically: the entry becomes
    * visible fully written or not at all, so a concurrent engine's
    * lookup can never resolve the name to a half-written (empty) root,
    * and two racing claims of one name get exactly one winner. The claim
    * primitive is scheme-aware: HDFS/object-store rename refuses an
    * existing destination, but POSIX rename REPLACES one — on `file://`
    * the hard link is the atomic fail-if-exists operation (race-proven
    * in `LakeSqlDmlSpec`). Genuine filesystem failures propagate as
    * themselves — only the lost race reports "already bound". */
  def register(spark: SparkSession, name: String, root: String): Unit = {
    require(isValidName(name),
      s"'$name' is not a valid table name (letters, digits, underscores; " +
        "must not start with a digit)")
    val p = entryPath(spark, name)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    def alreadyBound(): Nothing = throw new IllegalArgumentException(
      s"table name '$name' is already bound to " +
        s"'${lookup(spark, name).getOrElse("?")}' in the graft catalog " +
        s"at ${catalogDir(spark)} — DROP TABLE $name first, or pick " +
        "another name")
    if (f.exists(p)) alreadyBound() // fast path; the claim below is the gate
    val tmp = new Path(p.getParent,
      s".tmp-${java.util.UUID.randomUUID()}$Suffix")
    val out = f.create(tmp, false)
    try out.write(root.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // the atomic claim — the same scheme-aware publish primitive as the
    // manifest commit (see [[Lake.publishAtomic]])
    if (!Lake.publishAtomic(f, tmp, p)) alreadyBound()
  }

  /** Resolve a format `path` parameter: a bare identifier (no path
    * separator) bound in the catalog resolves to its root; anything else
    * — including an unbound bare name — passes through verbatim as a
    * filesystem path. Lets every format surface accept a table NAME:
    * `spark.read.format("graft-lake").load("sales")`,
    * `readStream.load("sales")`, `writeStream.option("path", "sales")`.
    * A relative directory that shadows a bound name loses to the name —
    * the same precedence as the SQL surfaces, and spelled paths are
    * always available to disambiguate. */
  def resolvePathOrName(spark: SparkSession, p: String): String =
    if (!p.contains('/') && !p.contains('\\') && isValidName(p))
      lookup(spark, p).getOrElse(p)
    else p

  /** The root bound to `name`, if any. Cheap by design — one stat + one
    * short read of a one-line file; called at parse/analysis time only. */
  def lookup(spark: SparkSession, name: String): Option[String] = {
    if (!isValidName(name)) return None
    val p = entryPath(spark, name)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else Lake.readMarkerFile(f, p)
  }

  /** Unbind `name`; returns whether it was bound. The table's data and
    * manifests stay at the root — a binding is a pointer, never
    * ownership, so DROP is metadata-only and trivially undoable by
    * re-registering. */
  def unregister(spark: SparkSession, name: String): Boolean = {
    val p = entryPath(spark, name)
    fs(spark, p).delete(p, false)
  }

  /** Every (name, root) binding — the `graft_catalog()` table function. */
  def list(spark: SparkSession): Seq[(String, String)] = {
    val dir = catalogDir(spark)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(Suffix) &&
        !s.getPath.getName.startsWith(".")) // dot-tmps are never bindings
      .map { s =>
        val name = s.getPath.getName.dropRight(Suffix.length)
        name -> Lake.readMarkerFile(f, s.getPath).getOrElse("")
      }
      .sortBy(_._1)
  }

  def listDf(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    list(spark).toDF("name", "root")
  }
}

/** Analyzer rule: resolve single-part relation names through the
  * [[LakeCatalog]] — the READ half of named-table support. Runs in the
  * analyzer's extended-resolution slot, i.e. AFTER Spark's own relation
  * resolution inside the same fixed-point batch, so it only ever sees
  * names the session catalog and temp views could not claim. Produces the
  * same analyzed snapshot plan as the `graft_lake_at` table function (an
  * ordinary parquet LogicalRelation), so manifest pruning and parquet
  * pushdown apply unchanged. Time travel rides Spark's native
  * `VERSION AS OF n` / `TIMESTAMP AS OF '<ts>'` grammar
  * ([[RelationTimeTravel]]); the pin must be a literal, like every
  * snapshot pin in the engine. */
class LakeNameResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // one catalog lookup per distinct name per rule application — the
    // guard and the rewrite body share the memo, so a resolved relation
    // costs one stat+read and an unresolvable name one stat, per pass
    val memo = scala.collection.mutable.HashMap.empty[String, Option[String]]
    def rootOf(p: LogicalPlan): Option[String] = p match {
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 1 && !u.isStreaming =>
        val n = u.multipartIdentifier.head
        memo.getOrElseUpdate(n.toLowerCase, LakeCatalog.lookup(spark, n))
      case _ => None
    }
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(rel, ts, ver) if rootOf(rel).isDefined =>
        val t = new LakeTable(spark, rootOf(rel).get)
        val v = ver match {
          case Some(s) => s.toIntOption.getOrElse(throw new
              IllegalArgumentException(
                "VERSION AS OF on a graft catalog table needs an integer " +
                  s"version, got: $s"))
          case None => ts match {
            case Some(Literal(u: UTF8String, StringType)) =>
              t.versionAt(Lake.parseTsMillis(u.toString))
            case Some(e) if e.foldable =>
              t.versionAt(Lake.parseTsMillis(String.valueOf(e.eval())))
            case other => throw new IllegalArgumentException(
              "TIMESTAMP AS OF needs a literal timestamp, got: " + other)
          }
        }
        t.snapshot(v).queryExecution.analyzed
      case u: UnresolvedRelation if rootOf(u).isDefined =>
        new LakeTable(spark, rootOf(u).get).read().queryExecution.analyzed
    }
  }
}
