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

  /** Views share the TABLE namespace — one entry file per name, whatever
    * the kind, so the single atomic claim serializes racing CREATE TABLE
    * and CREATE VIEW of one name with no cross-file check-then-act race.
    * A view entry's content is this marker line followed by the view's
    * SELECT text; a table entry's content is its root path (paths never
    * start with a `graft-view:` scheme, so the kinds cannot alias). */
  private val ViewMarker = "graft-view:\n"

  /** Materialized views share the same single namespace. An MV entry's
    * content is this marker followed by [[LakeMv]]'s serialized
    * definition (base root, pinned init version, state-table root, item
    * list, predicate, original query text). */
  private val MvMarker = "graft-mv:\n"

  /** Name PARTS are plain SQL identifiers (letter/underscore head, then
    * letters/digits/underscores), compared case-insensitively — stored
    * lowercase, like Spark's default session catalog. */
  def isValidName(name: String): Boolean =
    name.nonEmpty && (name.head.isLetter || name.head == '_') &&
      name.forall(c => c.isLetterOrDigit || c == '_')

  /** A catalog-addressable name: one part (`sales`) or two
    * (`ns.sales` — the namespaced form real deployments use). The
    * namespace is part of the binding key, encoded straight into the
    * entry-file name (`ns.sales.tbl` — a single-part name can never
    * contain a dot, so the spellings cannot alias); there is no
    * namespace object to create or drop. Three or more parts are never
    * ours (`spark_catalog.db.t` belongs to Spark). */
  def isValidQualified(name: String): Boolean = {
    val parts = name.split("\\.", -1)
    parts.nonEmpty && parts.length <= 2 && parts.forall(isValidName)
  }

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
    require(isValidQualified(name),
      s"'$name' is not a valid table name (one or two dot-separated " +
        "identifier parts: letters, digits, underscores; no part may " +
        "start with a digit)")
    val p = entryPath(spark, name)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    def alreadyBound(): Nothing = throw new IllegalArgumentException(
      kindOf(spark, name) match {
        case "view" =>
          s"name '$name' is already bound to a VIEW in the graft catalog " +
            s"at ${catalogDir(spark)} — DROP VIEW $name first, or pick " +
            "another name"
        case "materialized_view" =>
          s"name '$name' is already bound to a MATERIALIZED VIEW in the " +
            s"graft catalog at ${catalogDir(spark)} — DROP MATERIALIZED " +
            s"VIEW $name first, or pick another name"
        case _ =>
          s"table name '$name' is already bound to " +
            s"'${lookup(spark, name).getOrElse("?")}' in the graft catalog " +
            s"at ${catalogDir(spark)} — DROP TABLE $name first, or pick " +
            "another name"
      })
    if (f.exists(p)) alreadyBound() // fast path; the claim below is the gate
    if (!claim(f, p, root)) alreadyBound()
  }

  /** Write `content` to a dot-temp, then CLAIM the entry atomically — the
    * shared tail of [[register]] and [[registerView]] (see [[register]]'s
    * doc for why the claim primitive, not create-if-absent, is the gate). */
  private def claim(f: FileSystem, p: Path, content: String): Boolean = {
    val tmp = new Path(p.getParent,
      s".tmp-${java.util.UUID.randomUUID()}$Suffix")
    val out = f.create(tmp, false)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // the atomic claim — the same scheme-aware publish primitive as the
    // manifest commit (see [[Lake.publishAtomic]])
    Lake.publishAtomic(f, tmp, p)
  }

  /** Atomically bind `name` to a VIEW whose body is the SELECT text
    * `sql`. Views and tables share one namespace (one entry file), so a
    * name bound to a table refuses here and vice versa. `orReplace`
    * replaces an existing VIEW binding in place (one unlink + one claim —
    * a concurrent reader either sees the old definition or the new one,
    * never a half-written entry; it can also see a brief unbound gap,
    * the documented OR REPLACE window) but still refuses to replace a
    * TABLE binding: a view silently swallowing a table's name would
    * orphan the table's data from SQL reach. */
  def registerView(spark: SparkSession, name: String, sql: String,
                   orReplace: Boolean = false): Unit = {
    require(isValidQualified(name),
      s"'$name' is not a valid view name (one or two dot-separated " +
        "identifier parts: letters, digits, underscores; no part may " +
        "start with a digit)")
    require(sql.trim.nonEmpty, s"CREATE VIEW $name: empty view query")
    val p = entryPath(spark, name)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    def refuse(): Nothing = throw new IllegalArgumentException(
      kindOf(spark, name) match {
        case "table" =>
          s"name '$name' is bound to a TABLE in the graft catalog at " +
            s"${catalogDir(spark)} — CREATE OR REPLACE VIEW only " +
            s"replaces views; DROP TABLE $name first, or pick another name"
        case "materialized_view" =>
          s"name '$name' is bound to a MATERIALIZED VIEW in the graft " +
            s"catalog at ${catalogDir(spark)} — CREATE OR REPLACE VIEW " +
            "only replaces plain views; DROP MATERIALIZED VIEW " +
            s"$name first, or pick another name"
        case _ =>
          s"view name '$name' is already bound in the graft catalog at " +
            s"${catalogDir(spark)} — use CREATE OR REPLACE VIEW to " +
            s"replace it, or DROP VIEW $name first"
      })
    if (f.exists(p)) {
      if (!orReplace || lookupView(spark, name).isEmpty) refuse()
      f.delete(p, false) // replace = unlink + fresh claim (see doc above)
    }
    if (!claim(f, p, ViewMarker + sql)) refuse()
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
    if (!p.contains('/') && !p.contains('\\') && isValidQualified(p))
      lookup(spark, p).getOrElse {
        // a view has no storage — "reading the path" of one is always a
        // mistake, and falling through to a file-not-found would bury it
        if (lookupView(spark, p).isDefined) throw new IllegalArgumentException(
          s"'$p' is bound to a VIEW in the graft catalog — views have no " +
            "root path; SELECT from the view, or target its base tables")
        if (lookupMv(spark, p).isDefined) throw new IllegalArgumentException(
          s"'$p' is bound to a MATERIALIZED VIEW in the graft catalog — " +
            "SELECT from it, or address its state table's root path " +
            "explicitly for forensics (graft_catalog() does not expose " +
            s"it; the DROP MATERIALIZED VIEW $p result row does)")
        p
      }
    else p

  /** The raw entry content bound to `name`, if any — a root path for a
    * table, [[ViewMarker]]-prefixed SELECT text for a view. Cheap by
    * design — one stat + one short read of a tiny file; called at parse/
    * analysis time only. */
  private def lookupEntry(spark: SparkSession, name: String): Option[String] = {
    if (!isValidQualified(name)) return None
    val p = entryPath(spark, name)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else Lake.readMarkerFile(f, p)
  }

  /** The TABLE root bound to `name`, if any — a view or materialized-view
    * binding is a miss here (callers that should refuse loudly on those,
    * like the DML verbs, check [[lookupView]]/[[lookupMv]] themselves). */
  def lookup(spark: SparkSession, name: String): Option[String] =
    lookupEntry(spark, name).filterNot(e =>
      e.startsWith(ViewMarker.trim) || e.startsWith(MvMarker.trim))

  /** The VIEW body (SELECT text) bound to `name`, if any — a table
    * binding is a miss here. */
  def lookupView(spark: SparkSession, name: String): Option[String] =
    lookupEntry(spark, name).collect {
      // readMarkerFile trims the whole content, so the marker LINE (not
      // the marker+newline) is the stable prefix to test and strip
      case e if e.startsWith(ViewMarker.trim) =>
        e.stripPrefix(ViewMarker.trim).trim
    }

  /** The MATERIALIZED VIEW definition bound to `name`, if any (raw
    * serialized form — [[LakeMv.parseDef]] decodes it). */
  def lookupMv(spark: SparkSession, name: String): Option[String] =
    lookupEntry(spark, name).collect {
      case e if e.startsWith(MvMarker.trim) =>
        e.stripPrefix(MvMarker.trim).trim
    }

  /** Atomically bind `name` to a MATERIALIZED VIEW definition. Same
    * one-namespace claim as tables and views; no replace form — an MV
    * carries STATE, so redefinition is DROP + CREATE by design. */
  def registerMv(spark: SparkSession, name: String, serialized: String): Unit = {
    require(isValidQualified(name),
      s"'$name' is not a valid materialized view name (one or two " +
        "dot-separated identifier parts: letters, digits, underscores; " +
        "no part may start with a digit)")
    val p = entryPath(spark, name)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    def refuse(): Nothing = throw new IllegalArgumentException(
      s"name '$name' is already bound in the graft catalog at " +
        s"${catalogDir(spark)} (kind: ${kindOf(spark, name)}) — drop it " +
        "first, or pick another name")
    if (f.exists(p)) refuse()
    if (!claim(f, p, MvMarker + serialized)) refuse()
  }

  /** Rename a VIEW or MATERIALIZED VIEW binding: claim `newName` with
    * the old entry's content FIRST (one winner under racing claims of
    * the new name), then unbind the old — the same two-step as table
    * renames; a crash in between leaves both names bound, benign. MV
    * entries get their epoch app id pinned to the pre-rename derivation
    * ([[LakeMv.pinAppId]]) so refresh bookkeeping survives the rename.
    * Refuses cross-kind with the right verb. */
  def renameEntry(spark: SparkSession, name: String, newName: String,
                  wantedKind: String): String = {
    require(isValidQualified(newName),
      s"'$newName' is not a valid name (one or two dot-separated " +
        "identifier parts: letters, digits, underscores; no part may " +
        "start with a digit)")
    val kind = kindOf(spark, name)
    val verb = wantedKind match {
      case "view" => "ALTER VIEW"
      case _ => "ALTER MATERIALIZED VIEW"
    }
    if (kind == "unbound") throw new IllegalArgumentException(
      s"$verb: '$name' is not bound in the graft catalog")
    if (kind != wantedKind) throw new IllegalArgumentException(
      s"$verb: '$name' is bound as a ${kind.replace('_', ' ')} — use " +
        (kind match {
          case "table" => s"ALTER TABLE $name RENAME TO …"
          case "view" => s"ALTER VIEW $name RENAME TO …"
          case _ => s"ALTER MATERIALIZED VIEW $name RENAME TO …"
        }))
    val raw = lookupEntry(spark, name).getOrElse(
      throw new IllegalStateException(s"'$name' vanished from the catalog"))
    val content =
      if (kind == "materialized_view")
        MvMarker + LakeMv.pinAppId(raw.stripPrefix(MvMarker.trim).trim,
          name, newName)
      else raw
    val p = entryPath(spark, newName)
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    if (f.exists(p) || !claim(f, p, content))
      throw new IllegalArgumentException(
        s"$verb: name '$newName' is already bound in the graft catalog " +
          s"(kind: ${kindOf(spark, newName)}) — drop it first, or pick " +
          "another name")
    unregister(spark, name)
    content
  }

  /** The binding kind of `name`: "table", "view", "materialized_view",
    * or "unbound". */
  def kindOf(spark: SparkSession, name: String): String =
    lookupEntry(spark, name) match {
      case None => "unbound"
      case Some(e) if e.startsWith(ViewMarker.trim) => "view"
      case Some(e) if e.startsWith(MvMarker.trim) => "materialized_view"
      case Some(_) => "table"
    }

  /** Unbind `name`; returns whether it was bound. The table's data and
    * manifests stay at the root — a binding is a pointer, never
    * ownership, so DROP is metadata-only and trivially undoable by
    * re-registering. */
  def unregister(spark: SparkSession, name: String): Boolean = {
    val p = entryPath(spark, name)
    fs(spark, p).delete(p, false)
  }

  /** Whether ANY binding lives under namespace `ns` (names spelled
    * `ns.x`): one glob against the catalog directory — no marker-file
    * reads, no full listing — cheap enough for the parser's
    * SHOW TABLES IN capture probe, which runs at parse time for every
    * `SHOW TABLES IN <x>` statement. NOTE the documented shadowing: once
    * any graft `ns.*` binding exists, `SHOW TABLES IN ns` serves the
    * GRAFT listing and a same-named Spark DATABASE's tables are shadowed
    * for that statement form (reach them through
    * `spark.catalog.listTables("ns")` or by dropping the graft
    * namespace's bindings). */
  def namespaceExists(spark: SparkSession, ns: String): Boolean = {
    if (!isValidName(ns)) return false
    val dir = catalogDir(spark)
    try {
      val f = fs(spark, dir)
      f.globStatus(new Path(dir, ns.toLowerCase + ".*" + Suffix)) match {
        case null => false
        case hits => hits.exists(s => s.isFile &&
          !s.getPath.getName.startsWith("."))
      }
    } catch { case _: java.io.FileNotFoundException => false }
  }

  /** Every (name, kind, target) binding — the `graft_catalog()` table
    * function. `target` is the root path for a table, the SELECT text
    * for a view (`SHOW CREATE` for free). */
  def list(spark: SparkSession): Seq[(String, String, String)] = {
    val dir = catalogDir(spark)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(Suffix) &&
        !s.getPath.getName.startsWith(".")) // dot-tmps are never bindings
      .map { s =>
        val name = s.getPath.getName.dropRight(Suffix.length)
        val e = Lake.readMarkerFile(f, s.getPath).getOrElse("")
        if (e.startsWith(ViewMarker.trim))
          (name, "view", e.stripPrefix(ViewMarker.trim).trim)
        else if (e.startsWith(MvMarker.trim))
          (name, "materialized_view",
            LakeMv.queryTextOf(e.stripPrefix(MvMarker.trim).trim))
        else (name, "table", e)
      }
      .sortBy(_._1)
  }

  def listDf(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    list(spark).toDF("name", "kind", "target")
  }

  /** Max view-over-view nesting. Views resolve LATE (at read, against the
    * definitions current then), so a cycle can come into existence after
    * the fact via CREATE OR REPLACE even though each CREATE validated —
    * the cap turns that infinite regress into a loud error. 10 covers any
    * sane composition depth. */
  private val MaxViewDepth = 10
  private val viewDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Expand view `name` (body `sql`) into its ANALYZED plan. Analyzing
    * here re-enters the analyzer, which re-applies [[LakeNameResolution]]
    * to the body — that recursion is exactly what resolves views over
    * views (and views over catalog tables), and the thread-local depth
    * counter around it is what bounds a replace-created cycle. The
    * expansion is ANALYSIS-ONLY ([[AnalysisBridge]] — never a Dataset,
    * which would eagerly EXECUTE a command-shaped body): CREATE refuses
    * command bodies, but an entry written by an older build or by hand
    * must still be unable to run side effects from a SELECT. */
  private[sources] def expandView(spark: SparkSession, name: String,
                                  sql: String): LogicalPlan = {
    val d = viewDepth.get()
    if (d >= MaxViewDepth) throw new IllegalArgumentException(
      s"view '$name' exceeds the maximum view nesting depth " +
        s"($MaxViewDepth) — a CREATE OR REPLACE VIEW cycle, or a " +
        "composition genuinely deeper than the cap")
    viewDepth.set(d + 1)
    try {
      val (analyzed, isCommand) = org.apache.spark.sql.graft.AnalysisBridge
        .analyzeStatement(spark, sql)
      if (isCommand) throw new IllegalArgumentException(
        s"view '$name' has a command-shaped body — refusing to execute " +
          "a side effect from a read; DROP VIEW it and recreate with a " +
          "query body")
      analyzed
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => throw new IllegalArgumentException(
        s"view '$name' failed to resolve against the current catalog — " +
          s"its body is stale or a base table was dropped: ${e.getMessage}",
        e)
    }
    finally viewDepth.set(d)
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
    // one- or TWO-part names resolve (`sales`, `ns.sales` — the
    // namespace is part of the binding key); three or more parts are
    // never ours. Spark's own resolution still runs first, so a real
    // database named `ns` keeps shadowing the graft namespace.
    def nameOf(u: UnresolvedRelation): Option[String] =
      if (u.multipartIdentifier.length <= 2 && !u.isStreaming)
        Some(u.multipartIdentifier.mkString("."))
      else None
    val memo = scala.collection.mutable.HashMap.empty[String, Option[String]]
    def rootOf(p: LogicalPlan): Option[String] = p match {
      case u: UnresolvedRelation => nameOf(u).flatMap(n =>
        memo.getOrElseUpdate(n.toLowerCase, LakeCatalog.lookup(spark, n)))
      case _ => None
    }
    val viewMemo = scala.collection.mutable.HashMap.empty[String, Option[String]]
    def viewOf(p: LogicalPlan): Option[(String, String)] = p match {
      case u: UnresolvedRelation => nameOf(u).flatMap(n =>
        viewMemo.getOrElseUpdate(n.toLowerCase,
          LakeCatalog.lookupView(spark, n)).map(n -> _))
      case _ => None
    }
    val mvMemo = scala.collection.mutable.HashMap.empty[String, Option[String]]
    def mvOf(p: LogicalPlan): Option[(String, String)] = p match {
      case u: UnresolvedRelation => nameOf(u).flatMap(n =>
        mvMemo.getOrElseUpdate(n.toLowerCase,
          LakeCatalog.lookupMv(spark, n)).map(n -> _))
      case _ => None
    }
    // refusal pre-pass, BEFORE the bottom-up rewrite (which would expand
    // the view child first and leave the parent guard nothing to match):
    // write statements must never silently resolve THROUGH a view (the
    // parser already refuses the lake verbs by name; this catches Spark's
    // own INSERT INTO grammar before it fails with a puzzling "not
    // supported" over the spliced plan), and time travel on a view is a
    // category error worth its own message
    plan.foreach {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if viewOf(i.table).isDefined =>
        throw new IllegalArgumentException(
          s"'${viewOf(i.table).get._1}' is a graft catalog VIEW — views " +
            "are read-only; INSERT into its base tables instead")
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if mvOf(i.table).isDefined =>
        throw new IllegalArgumentException(
          s"'${mvOf(i.table).get._1}' is a graft catalog MATERIALIZED " +
            "VIEW — it is read-only; its state advances only through " +
            "REFRESH MATERIALIZED VIEW")
      // Spark's own INSERT grammar reaching a lake TABLE name means a
      // form the graft parser does not serve (INSERT OVERWRITE, by-name
      // column lists): without this guard it dies in a generic
      // not-found, which is baffling when SELECT on the same name works
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if rootOf(i.table).isDefined =>
        throw new IllegalArgumentException(
          s"'${(i.table: @unchecked) match { case u: UnresolvedRelation => u.multipartIdentifier.mkString(".") }}' " +
            "is a graft lake table — this INSERT form is not supported " +
            "on it. Use INSERT INTO <name> <query> (the lake append), " +
            "MERGE INTO for upserts, or DELETE + INSERT / RESTORE in " +
            "place of INSERT OVERWRITE")
      case RelationTimeTravel(rel, _, _) if viewOf(rel).isDefined =>
        throw new IllegalArgumentException(
          s"'${viewOf(rel).get._1}' is a graft catalog VIEW — time travel " +
            "pins a snapshot, and a plain view materializes nothing to " +
            "pin; pin the view's base tables instead")
      case _ =>
    }
    // every resolution wraps in SubqueryAlias(<name>, …): the spliced
    // body's attributes are unqualified (parquet scans), and without the
    // alias `SELECT sales.k FROM sales` / `… ON v.k = t.k` would fail to
    // resolve — the same wrapping Spark's own view/table resolution does
    // a two-part name aliases as its LAST part, like Spark's own
    // db.table resolution (`SELECT t.c FROM ns.t` resolves)
    def aliased(name: String, p: LogicalPlan): LogicalPlan =
      org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(
        name.toLowerCase.split("\\.").last, p)
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if viewOf(u).isDefined =>
        val (name, sql) = viewOf(u).get
        aliased(name, LakeCatalog.expandView(spark, name, sql))
      case u: UnresolvedRelation if mvOf(u).isDefined =>
        val (name, raw) = mvOf(u).get
        aliased(name,
          LakeMv.readDf(spark, LakeMv.parseDef(raw)).queryExecution.analyzed)
      // MV pinned reads: VERSION AS OF pins a BASE version (the newest
      // refresh folded to ≤ it — what readers saw while the base stood
      // there); TIMESTAMP AS OF pins the state chain's wall clock
      case RelationTimeTravel(rel, ts, ver) if mvOf(rel).isDefined =>
        val (name, raw) = mvOf(rel).get
        val d = LakeMv.parseDef(raw)
        val df = ver match {
          case Some(s) => LakeMv.readAtDf(spark, name, d,
            s.toIntOption.getOrElse(throw new IllegalArgumentException(
              "VERSION AS OF on a materialized view pins a BASE table " +
                s"version and needs an integer, got: $s")))
          case None => ts match {
            case Some(Literal(u: UTF8String, StringType)) =>
              LakeMv.readAtTsDf(spark, name, d,
                Lake.parseTsMillis(u.toString))
            case Some(e) if e.foldable =>
              LakeMv.readAtTsDf(spark, name, d,
                Lake.parseTsMillis(String.valueOf(e.eval())))
            case other => throw new IllegalArgumentException(
              "TIMESTAMP AS OF needs a literal timestamp, got: " + other)
          }
        }
        aliased(name, df.queryExecution.analyzed)
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
        aliased(rel.asInstanceOf[UnresolvedRelation]
            .multipartIdentifier.mkString("."),
          t.snapshot(v).queryExecution.analyzed)
      case u: UnresolvedRelation if rootOf(u).isDefined =>
        aliased(u.multipartIdentifier.mkString("."),
          new LakeTable(spark, rootOf(u).get).read().queryExecution.analyzed)
    }
  }
}
