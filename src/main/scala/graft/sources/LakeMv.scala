package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** MATERIALIZED views over lake tables: `CREATE MATERIALIZED VIEW <name>
  * AS SELECT <groups…, count(*), count(c), sum(e), avg(e)…> FROM <lake table>
  * [WHERE <pred>] GROUP BY <groups…>`, advanced INCREMENTALLY by
  * `REFRESH MATERIALIZED VIEW <name>` folding the base table's change
  * feed — never rescanning the base. The 100 TB shape: a refresh costs
  * O(changed rows) feed work + O(changed groups) state work, and the
  * state table is aggregate-sized however large the base grows.
  *
  * Self-maintainability is what restricts the grammar: count(*)/count(c)
  * /sum(e) fold exactly under inserts AND deletes from the signed feed
  * (postimage/insert = +1, preimage/delete = −1), and avg(e) rides as
  * DERIVED state (exact sum + non-null count, mean reconstructed at
  * read); min/max do not (a deleted extremum needs a rescan), so they
  * refuse at CREATE with that explanation. `count(*)` is REQUIRED — it is the group-liveness
  * witness: a group folding to zero rows deletes its state row, and
  * without the count the fold cannot know. Sums fold in DECIMAL(28,10)
  * (exact, associative — the incremental fold is bit-equal to a
  * from-scratch aggregate, which is what the oracle pins; fractional
  * inputs are cast once at both build and fold, so the two paths round
  * identically). Each sum carries a hidden non-null counter so an
  * all-null group reads back as SQL's NULL, not 0.
  *
  * Transactional bookkeeping rides the state table's OWN manifest chain:
  * every refresh commits through [[LakeTable.mergeIntoEpoch]] with
  * epoch id = the base version folded TO (app id `mv-<name>`), so
  * "which base snapshot does my state reflect?" is answered by
  * [[LakeTable.latestEpoch]] — no side marker to desync, a crashed
  * refresh retries idempotently, and a racing duplicate refresh is
  * harmless twice over (the epoch check skips it, and the fold writes
  * ABSOLUTE group values, so even a double-commit converges). */
object LakeMv {

  /** One select-list item, in declared order. */
  sealed trait MvItem
  /** A bare GROUP BY column. */
  case class GroupItem(name: String) extends MvItem
  /** An aggregate: kind ∈ count_star | count | sum | avg; `arg` is the
    * raw expression text (empty for count_star). AVG is derived state:
    * it stores an exact decimal sum plus a non-null count and
    * reconstructs the mean at read — that derivation is what makes it
    * self-maintainable where a stored mean would not be. */
  case class AggItem(kind: String, alias: String, arg: String) extends MvItem

  case class MvDef(baseRoot: String, baseName: String, initVersion: Int,
                   stateRoot: String, items: Seq[MvItem],
                   whereSql: Option[String], queryText: String) {
    def groupCols: Seq[String] = items.collect { case GroupItem(g) => g }
    def aggs: Seq[AggItem] = items.collect { case a: AggItem => a }
    def countStarAlias: String = aggs.find(_.kind == "count_star").get.alias
  }

  private val Dec = DecimalType(28, 10)
  private def nnAlias(a: String) = s"_nn_$a"
  private def appIdOf(name: String) = s"mv-${name.toLowerCase}"

  // ---- catalog-entry (de)serialization -------------------------------

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Line-oriented, order-fixed; free-text fields (expressions, the
    * predicate, the original statement) ride base64 so they can hold any
    * character the user wrote. */
  def serialize(d: MvDef): String = {
    val items = d.items.map {
      case GroupItem(g) => s"g:$g"
      case AggItem(k, a, arg) => s"a:$k:$a:${b64(arg)}"
    }.mkString(";")
    Seq(
      s"base=${d.baseRoot}",
      s"name=${d.baseName}",
      s"init=${d.initVersion}",
      s"state=${d.stateRoot}",
      s"items=$items",
      s"where=${d.whereSql.map(b64).getOrElse("-")}",
      s"query=${b64(d.queryText)}").mkString("\n")
  }

  def parseDef(s: String): MvDef = {
    val kv = s.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"malformed materialized-view entry line: $l")
        l.substring(0, i) -> l.substring(i + 1)
      }.toMap
    val items = kv("items").split(";").toSeq.filter(_.nonEmpty).map { it =>
      it.split(":", -1) match {
        case Array("g", g) => GroupItem(g)
        case Array("a", k, a, arg) => AggItem(k, a, unb64(arg))
        case _ => throw new IllegalArgumentException(
          s"malformed materialized-view item: $it")
      }
    }
    MvDef(kv("base"), kv("name"), kv("init").toInt, kv("state"), items,
      Some(kv("where")).filter(_ != "-").map(unb64),
      unb64(kv("query")))
  }

  /** The stored original statement text — `graft_catalog()`'s target
    * column for MV rows (SHOW CREATE for free, like plain views). */
  def queryTextOf(serialized: String): String =
    scala.util.Try(parseDef(serialized).queryText)
      .getOrElse("(unparseable materialized-view entry)")

  // ---- shared column builders ----------------------------------------

  /** The state table's synthetic merge key: the engine-standard 60-bit
    * hash ([[graft.functions.Portable.hash60]]) of the group values
    * joined with a control-char separator (NULL as its own sentinel) —
    * lake merge keys are long-normalized, so the composite must reduce
    * to one LONG. A 60-bit collision would silently MERGE two groups,
    * so the initial build and every refresh carry explicit collision
    * checks that refuse loudly instead (see the call sites); at 2^30 groups
    * the birthday bound is still ~1e-4 per build. */
  private def mvKey(groupCols: Seq[String]): Column =
    graft.functions.Portable.hash60(concat_ws("\u0001",
      groupCols.map(g => coalesce(col(g).cast("string"), lit("\u0000"))): _*))

  /** State-table column order: key, groups, then per agg its stored
    * columns: counts store the alias; sums store the alias plus a hidden
    * non-null counter; avgs store ONLY hidden state (exact sum + non-null
    * count) — the visible value is reconstructed at read. */
  private def sumAlias(a: String) = s"_avg_s_$a"
  private def stateCols(d: MvDef): Seq[String] =
    "_mv_key" +: d.groupCols ++: d.aggs.flatMap {
      case AggItem("sum", a, _) => Seq(a, nnAlias(a))
      case AggItem("avg", a, _) => Seq(sumAlias(a), nnAlias(a))
      case AggItem(_, a, _) => Seq(a)
    }

  // ---- CREATE ---------------------------------------------------------

  /** Validate + build: pins the base's CURRENT version, aggregates that
    * snapshot into a fresh keyed state table (managed under the catalog
    * dir), and binds the name — name claimed FIRST (the atomic create
    * serializes racing CREATEs, same as named tables), unbound again if
    * the build fails. */
  def create(spark: SparkSession, name: String, baseName: String,
             items: Seq[MvItem], whereSql: Option[String],
             queryText: String): (String, String) = {
    val baseRoot = LakeCatalog.lookup(spark, baseName).getOrElse {
      val kind = LakeCatalog.kindOf(spark, baseName)
      throw new IllegalArgumentException(
        if (kind == "unbound")
          s"CREATE MATERIALIZED VIEW $name: base '$baseName' is not a " +
            "lake table in the graft catalog — CREATE TABLE it first " +
            "(the incremental refresh folds a lake change feed; plain " +
            "views and outside tables have none)"
        else
          s"CREATE MATERIALIZED VIEW $name: base '$baseName' is a $kind " +
            "— the base must be a lake TABLE (only tables have the " +
            "change feed the refresh folds)")
    }
    val groups = items.collect { case GroupItem(g) => g }
    val aggs = items.collect { case a: AggItem => a }
    require(groups.nonEmpty,
      s"CREATE MATERIALIZED VIEW $name needs at least one GROUP BY column")
    require(aggs.exists(_.kind == "count_star"),
      s"CREATE MATERIALIZED VIEW $name needs count(*) AS <alias> in its " +
        "select list — it is the group-liveness witness: the refresh " +
        "deletes a group's row when its count folds to zero, and " +
        "without the count the fold cannot know")
    val aliases = aggs.map(_.alias)
    require(aliases.distinct.size == aliases.size,
      s"CREATE MATERIALIZED VIEW $name: duplicate aggregate aliases")
    def reserved(n: String) = n == "_mv_key" ||
      n.startsWith("_nn_") || n.startsWith("_avg_s_")
    require(aliases.forall(a => !reserved(a)),
      s"CREATE MATERIALIZED VIEW $name: aliases must not use the " +
        "reserved _mv_key/_nn_/_avg_s_ names")
    require(groups.forall(g => !reserved(g)),
      s"CREATE MATERIALIZED VIEW $name: a GROUP BY column uses a " +
        "reserved state-table name (_mv_key/_nn_/_avg_s_) — alias it " +
        "in the base table first")
    require(groups.intersect(aliases).isEmpty,
      s"CREATE MATERIALIZED VIEW $name: an alias collides with a GROUP " +
        "BY column")
    aggs.find(a => !Set("count_star", "count", "sum", "avg")(a.kind)).foreach(a =>
      throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW $name: unsupported aggregate " +
          s"'${a.kind}' (alias ${a.alias}) — self-maintainable " +
          "aggregates are count(*), count(col), sum(expr), avg(expr); " +
          "min/max cannot fold under deletes without a rescan"))
    val bt = new LakeTable(spark, baseRoot)
    val initV = bt.latestVersion
    val base = bt.snapshot(initV) // the PINNED snapshot the state reflects
    // fail-fast validation: groups, predicate, and aggregate args must
    // analyze against the base, and must be deterministic (a
    // non-deterministic input folds differently at build and refresh)
    val probe = whereSql.map(w => base.filter(expr(w))).getOrElse(base)
      .select(groups.map(col) ++
        aggs.filter(_.kind != "count_star").map(a => expr(a.arg)): _*)
    probe.queryExecution.assertAnalyzed()
    // the analyzed probe carries the Filter's condition too, so this
    // covers the WHERE predicate as well as the aggregate arguments
    require(probe.queryExecution.analyzed.collect {
        case p => p.expressions
      }.flatten.forall(_.deterministic),
      s"CREATE MATERIALIZED VIEW $name: expressions must be deterministic")
    val stateRoot = LakeCatalog.managedRoot(spark, name + "_state")
    val d = MvDef(baseRoot, baseName, initV, stateRoot, items, whereSql,
      queryText)
    LakeCatalog.registerMv(spark, name, serialize(d)) // claim FIRST
    try {
      val filtered = whereSql.map(w => base.filter(expr(w))).getOrElse(base)
      val aggCols = aggs.flatMap {
        case AggItem("count_star", a, _) =>
          Seq(count(lit(1)).cast(LongType).as(a))
        case AggItem("count", a, arg) =>
          Seq(count(expr(arg)).cast(LongType).as(a))
        case AggItem("sum", a, arg) => Seq(
          coalesce(sum(expr(arg).cast(Dec)), lit(0).cast(Dec)).as(a),
          count(expr(arg)).cast(LongType).as(nnAlias(a)))
        case AggItem("avg", a, arg) => Seq( // exact sum + count; the mean
          // is DERIVED at read, which is what makes avg self-maintainable
          coalesce(sum(expr(arg).cast(Dec)), lit(0).cast(Dec))
            .as(sumAlias(a)),
          count(expr(arg)).cast(LongType).as(nnAlias(a)))
        case AggItem(k, _, _) => throw new IllegalStateException(
          s"unreachable: unsupported aggregate '$k' survived CREATE " +
            "validation")
      }
      val full = filtered.groupBy(groups.map(col): _*).agg(
          aggCols.head, aggCols.tail: _*)
        .select((mvKey(groups).as("_mv_key") +: stateCols(d).tail.map(col)): _*)
        .localCheckpoint() // consumed by the collision check AND the write
      // the 60-bit composite key must be injective over THESE groups —
      // a collision would merge two groups' state, so refuse instead
      val (nGroups, nKeys) = {
        val r = full.agg(count(lit(1)), count_distinct(col("_mv_key")))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      require(nKeys == nGroups,
        s"CREATE MATERIALIZED VIEW $name: the 60-bit group-key hash " +
          s"collided (${nGroups} groups, ${nKeys} distinct keys) — " +
          "reduce the group domain or add a disambiguating group column")
      Lake.create(spark, stateRoot, full, "_mv_key", 4)
      (stateRoot, s"v$initV")
    } catch {
      case e: Throwable =>
        LakeCatalog.unregister(spark, name)
        throw e
    }
  }

  // ---- REFRESH --------------------------------------------------------

  /** Fold the base's change feed (lastFolded, current] into the state
    * table as ONE epoch-tagged conditional merge: changed groups get
    * their new ABSOLUTE values (update or insert), groups whose count
    * folds to zero are deleted, groups the interval never touched are
    * never read or written. Returns (fromVersion, toVersion,
    * groupsTouched). */
  def refresh(spark: SparkSession, name: String): (Int, Int, Long) = {
    val d = parseDef(LakeCatalog.lookupMv(spark, name).getOrElse(
      throw new IllegalArgumentException(
        s"REFRESH MATERIALIZED VIEW: no materialized view '$name' in " +
          s"the graft catalog (kind: ${LakeCatalog.kindOf(spark, name)})")))
    val bt = new LakeTable(spark, d.baseRoot)
    val st = new LakeTable(spark, d.stateRoot)
    val last = st.latestEpoch(appIdOf(name)).map(_.toInt).getOrElse {
      // no epoch tag found: either the MV was genuinely never refreshed
      // (fold from the pinned init version), or refresh history WAS
      // committed but its tagged manifests were vacuumed away (the state
      // root is addressable, so out-of-band OPTIMIZE + VACUUM can do
      // that) — folding from init would then DOUBLE-COUNT every interval
      // already applied. Distinguishable: with no gap in the chain back
      // to v0, the walk provably saw every commit and there truly was no
      // refresh; a gap means the bookkeeping may be gone — refuse.
      val sv = st.latestVersion
      if ((0 to sv).forall(st.hasVersion)) d.initVersion
      else throw new IllegalStateException(
        s"REFRESH MATERIALIZED VIEW $name: the state table's manifest " +
          "chain has vacuumed stretches and no epoch tag survives — the " +
          "refresh bookkeeping is unrecoverable (was the state table " +
          "OPTIMIZEd and VACUUMed out-of-band?); DROP MATERIALIZED VIEW " +
          "and re-CREATE")
    }
    val cur = bt.latestVersion
    if (cur <= last) return (last, cur, 0L)
    val feed0 = bt.changes(last, cur)
    val feed = d.whereSql.map(w => feed0.filter(expr(w))).getOrElse(feed0)
    val sgn = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val csAlias = d.countStarAlias
    val deltaCols = d.aggs.flatMap {
      case AggItem("count_star", a, _) => Seq(sum(sgn).as(s"_d_$a"))
      case AggItem("count", a, arg) => Seq(
        coalesce(sum(when(expr(arg).isNotNull, sgn).otherwise(lit(0L))),
          lit(0L)).as(s"_d_$a"))
      case AggItem("sum", a, arg) => Seq(
        coalesce(sum(when(expr(arg).isNotNull,
            expr(arg).cast(Dec) * sgn).otherwise(lit(0).cast(Dec))),
          lit(0).cast(Dec)).as(s"_d_$a"),
        coalesce(sum(when(expr(arg).isNotNull, sgn).otherwise(lit(0L))),
          lit(0L)).as(s"_d_${nnAlias(a)}"))
      case AggItem("avg", a, arg) => Seq(
        coalesce(sum(when(expr(arg).isNotNull,
            expr(arg).cast(Dec) * sgn).otherwise(lit(0).cast(Dec))),
          lit(0).cast(Dec)).as(s"_d_${sumAlias(a)}"),
        coalesce(sum(when(expr(arg).isNotNull, sgn).otherwise(lit(0L))),
          lit(0L)).as(s"_d_${nnAlias(a)}"))
      case AggItem(k, _, _) => throw new IllegalStateException(
        s"unreachable: unsupported aggregate '$k' survived CREATE")
    }
    val delta = feed.groupBy(d.groupCols.map(col): _*)
      .agg(deltaCols.head, deltaCols.tail: _*)
      .withColumn("_mv_key", mvKey(d.groupCols))
      .localCheckpoint() // three consumers: semi-probe, join, merge source
    // O(changed groups): the state scans ONCE through a broadcast
    // semi-join on the delta's keys; everything after is delta-sized
    val valueCols = stateCols(d).drop(1 + d.groupCols.size)
    val oldSlice = st.read()
      .join(broadcast(delta.select("_mv_key")), Seq("_mv_key"), "left_semi")
      .select(col("_mv_key") +: (
        d.groupCols.map(g => col(g).as(s"_oldg_$g")) ++
          valueCols.map(c => col(c).as(s"_old_$c"))): _*)
    val stateSchema = st.read().schema
    def typed(c: String) = stateSchema(c).dataType
    val newVals = valueCols.map { c =>
      (coalesce(col(s"_old_$c"), lit(0).cast(typed(c))) + col(s"_d_$c"))
        .cast(typed(c)).as(c)
    }
    val joined = delta.join(broadcast(oldSlice), Seq("_mv_key"), "left")
      .withColumn("_had_state", col(s"_old_$csAlias").isNotNull)
      .localCheckpoint() // collision check + merge source, one compute
    // a hash-key hit whose stored GROUP VALUES differ from the delta's
    // is a 60-bit collision (or corrupted state) — merging would mix two
    // groups, so refuse loudly; delta-sized check
    val collisions = joined.filter(col("_had_state") &&
      !d.groupCols.map(g => col(g) <=> col(s"_oldg_$g")).reduce(_ && _))
      .count()
    require(collisions == 0L,
      s"REFRESH MATERIALIZED VIEW $name: the 60-bit group-key hash " +
        s"collided on $collisions group(s) — recreate the MV with a " +
        "disambiguating group column")
    // a group folding below zero rows means the state and the feed have
    // drifted (an impossible fold under correct bookkeeping) — writing
    // the negative row would silently corrupt; refuse with forensics
    val negative = joined.filter(
      (coalesce(col(s"_old_$csAlias"), lit(0L)) + col(s"_d_$csAlias")) < 0L)
      .count()
    require(negative == 0L,
      s"REFRESH MATERIALIZED VIEW $name: $negative group(s) folded to a " +
        "negative row count — state/feed drift (was the state table " +
        "written outside REFRESH?); DROP and re-CREATE the view")
    val src = joined
      .select(Seq(col("_mv_key")) ++ d.groupCols.map(col) ++ newVals :+
        col("_had_state"): _*)
      // a group that appeared and net-vanished inside one interval, with
      // no existing row, is a pure no-op — inserting its zero row would
      // materialize a dead group
      .filter(col(csAlias) > 0L || col("_had_state"))
      .drop("_had_state")
      .select(stateCols(d).map(col): _*) // SET * needs the exact schema
    val srcM = src.localCheckpoint()
    val touched = srcM.count()
    st.mergeIntoEpoch(srcM, cur.toLong, appIdOf(name),
      whenMatchedDeleteIf = Some(col(s"source.$csAlias") === 0L),
      whenMatchedUpdateIf = Some(lit(true)),
      whenNotMatchedInsert = true)
    (last, cur, touched)
  }

  /** Operational introspection — the `graft_mv_detail('<name>')` table
    * function: one row with the MV's roots, the base version its state
    * reflects (recovered from the state table's manifest chain, the same
    * read REFRESH does), the base's current version, and the staleness
    * span. `behind_by = 0` means a refresh right now would no-op. */
  def detailDf(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val d = parseDef(LakeCatalog.lookupMv(spark, name).getOrElse(
      throw new IllegalArgumentException(
        s"graft_mv_detail: no materialized view '$name' in the graft " +
          s"catalog (kind: ${LakeCatalog.kindOf(spark, name)})")))
    val st = new LakeTable(spark, d.stateRoot)
    val last = st.latestEpoch(appIdOf(name)).map(_.toInt)
      .getOrElse(d.initVersion)
    val cur = new LakeTable(spark, d.baseRoot).latestVersion
    val groups = st.manifest(st.latestVersion).files.map(_.rows).sum
    Seq((name.toLowerCase, d.baseName, d.baseRoot, d.stateRoot,
      d.initVersion, last, cur, math.max(0, cur - last), groups))
      .toDF("name", "base_name", "base_root", "state_root", "init_version",
        "folded_to_version", "base_latest_version", "behind_by", "n_groups")
  }

  // ---- READ -----------------------------------------------------------

  /** The MV's read relation: the state table projected back to the
    * declared select shape (sums NULL when their non-null counter is
    * zero — SQL sum semantics — and the synthetic key dropped). Reads
    * serve the LAST REFRESHED state by design; that staleness is the MV
    * contract, and `REFRESH MATERIALIZED VIEW` is the advance. */
  def readDf(spark: SparkSession, d: MvDef): DataFrame =
    new LakeTable(spark, d.stateRoot).read().select(d.items.map {
      case GroupItem(g) => col(g)
      case AggItem("sum", a, _) =>
        when(col(nnAlias(a)) > 0L, col(a)).otherwise(lit(null)).as(a)
      case AggItem("avg", a, _) => // the EXACT decimal dividend casts to
        // double once, then one IEEE division — deterministic and
        // refresh-count-independent, because the stored sum is bit-equal
        // to from-scratch however many folds built it (spec-pinned)
        when(col(nnAlias(a)) > 0L,
            col(sumAlias(a)).cast("double") / col(nnAlias(a)))
          .otherwise(lit(null)).as(a)
      case AggItem(_, a, _) => col(a)
    }: _*)
}
