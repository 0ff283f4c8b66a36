package graft.extensions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declarative data-quality verification — the "expectation suite" a
  * training-data pipeline runs before a corpus snapshot is blessed
  * (the Deequ/Great-Expectations shape, rebuilt on plain aggregates):
  *
  *  - [[audit]] verifies a list of table constraints (completeness,
  *    uniqueness, row-level predicates) in ONE scan of the table: every
  *    constraint contributes one aggregate to a single `agg(...)`, the
  *    single stats row is unpivoted with `stack`, and pass/fail compares
  *    exact counts (no float thresholds). Adding a constraint adds an
  *    aggregate buffer, never a pass over the data — at 100 TB the audit
  *    costs one column-pruned scan regardless of how many checks ride it.
  *  - [[referential]] verifies foreign-key containment child.fk ⊆
  *    parent.pk per relationship as a left join on the key (the parent
  *    side reduced to distinct keys, broadcast by AQE when it fits) +
  *    one count aggregate — the minimal shuffle for an FK check whose
  *    parent is itself table-sized; no row data moves, only keys.
  *
  * Distinct from [[graft.ops.Profile]] (ANALYZE-style stats): Profile
  * describes, Quality judges — named constraints with verdicts.
  */
object Quality {

  /** One table constraint; `name` keys the audit-report row. */
  sealed trait Constraint { def name: String }
  /** Fraction of rows satisfying `pred` must be 1. */
  final case class RowCheck(name: String, pred: Column) extends Constraint
  /** Column must be fully non-null. */
  final case class Complete(name: String, colName: String) extends Constraint
  /** Column values must be globally unique. */
  final case class Unique(name: String, colName: String) extends Constraint

  /** Verify `constraints` over `df` in one scan. Output: one row per
    * constraint — (check_name, metric ∈ [0,1] rounded to 6, pass). The
    * pass verdict compares exact satisfied-vs-total counts, so a single
    * violating row in 10^12 fails even though the rounded metric prints
    * 1.0. Exact `count_distinct` backs Unique (the oracle hash-compares
    * values); at 100 TB swap in approx_count_distinct + a follow-up
    * exact recount of only the flagged columns. */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "audit needs at least one constraint")
    val aggs = constraints.zipWithIndex.map { case (c, i) =>
      (c match {
        case RowCheck(_, p) => count(when(p, lit(1)))
        case Complete(_, cn) => count(col(cn))
        case Unique(_, cn) => count_distinct(col(cn))
      }).cast("double").as(s"m$i")
    } :+ count(lit(1)).cast("double").as("n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // names land inside a SQL string literal: escape, or a quote in a
    // check name breaks (or injects into) the stack expression
    def q(s: String): String =
      s.replace("\\", "\\\\").replace("'", "\\'")
    val stackArgs = constraints.zipWithIndex
      .map { case (c, i) => s"'${q(c.name)}', m$i" }.mkString(", ")
    row.selectExpr("n",
        s"stack(${constraints.length}, $stackArgs) AS (check_name, m)")
      .select(col("check_name"),
        round(col("m") / col("n"), 6).as("metric"),
        (col("m") >= col("n")).as("pass"))
      .orderBy("check_name")
  }

  /** One FK-containment verdict: non-null `fk` values of `child` must
    * all exist in `parent.pk`. Output row: (relationship, n_child,
    * n_orphans, ref_ok). */
  private def referentialRow(name: String, child: DataFrame, fk: String,
                             parent: DataFrame, pk: String): DataFrame = {
    val fkCol = child.select(col(fk).as("fk")).filter(col("fk").isNotNull)
    fkCol.join(
        parent.select(col(pk).as("fk")).distinct().withColumn("hit", lit(1)),
        Seq("fk"), "left")
      .agg(count(lit(1)).as("n_child"),
        count(when(col("hit").isNull, lit(1))).as("n_orphans"))
      .select(lit(name).as("relationship"), col("n_child"),
        col("n_orphans"), (col("n_orphans") === 0L).as("ref_ok"))
  }

  /** Verify a set of FK relationships; one report row each. */
  def referential(rels: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame =
    rels.map { case (nm, ch, fk, par, pk) => referentialRow(nm, ch, fk, par, pk) }
      .reduce(_ unionByName _).orderBy("relationship")

  /** Gated lane: six constraints over `orders` — completeness,
    * key uniqueness, a value range, a format regex, a categorical
    * domain, and a date-window check — verified in one scan. */
  def dqConstraintsOrders(spark: SparkSession, dir: String): DataFrame =
    audit(Tables.orders(spark, dir), Seq(
      Complete("completeness(o_custkey)", "o_custkey"),
      Unique("uniqueness(o_orderkey)", "o_orderkey"),
      RowCheck("range(o_totalprice>0)", col("o_totalprice") > 0),
      RowCheck("pattern(o_orderpriority)",
        col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$")),
      RowCheck("membership(o_orderstatus)",
        col("o_orderstatus").isin("O", "F", "P")),
      RowCheck("bounds(year(o_orderdate))",
        year(col("o_orderdate")).between(1995, 2001))))

  /** Gated lane: the star schema's six FK relationships audited
    * child-by-child. The lineitem→orders/part/supplier checks shuffle
    * keys only (both sides table-sized at scale); the dimension checks
    * broadcast the parent key set. */
  def dqReferential(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ords = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    referential(Seq(
      ("customer.c_nationkey->nation.n_nationkey",
        cust, "c_nationkey", Tables.nation(spark, dir), "n_nationkey"),
      ("lineitem.l_orderkey->orders.o_orderkey",
        li, "l_orderkey", ords, "o_orderkey"),
      ("lineitem.l_partkey->part.p_partkey",
        li, "l_partkey", Tables.part(spark, dir), "p_partkey"),
      ("lineitem.l_suppkey->supplier.s_suppkey",
        li, "l_suppkey", Tables.supplier(spark, dir), "s_suppkey"),
      ("nation.n_regionkey->region.r_regionkey",
        Tables.nation(spark, dir), "n_regionkey",
        Tables.region(spark, dir), "r_regionkey"),
      ("orders.o_custkey->customer.c_custkey",
        ords, "o_custkey", cust, "c_custkey")))
  }

  /** Gated lane: the corpus-release expectation suite over `documents` —
    * what a training-data pipeline verifies before blessing a snapshot:
    * id uniqueness, text completeness, non-empty and bounded lengths, the
    * n_chars derived column consistent with the text it describes, and
    * language-tag domain membership. Same one-scan contract as the orders
    * audit; the length/consistency checks are the ones a corrupted
    * ingest (truncation, encoding damage, stale derived columns) trips. */
  def dqConstraintsDocuments(spark: SparkSession, dir: String): DataFrame =
    audit(Tables.documents(spark, dir), Seq(
      Unique("uniqueness(doc_id)", "doc_id"),
      Complete("completeness(text)", "text"),
      RowCheck("nonempty(text)", length(col("text")) > 0),
      RowCheck("bounds(len<=10000)", length(col("text")) <= 10000),
      RowCheck("consistent(n_chars)", col("n_chars") === length(col("text"))),
      RowCheck("membership(lang)",
        col("lang").isin("de", "en", "es", "fr", "zh"))))

  /** Gated lane: DISTRIBUTION DRIFT between two cohorts of the same
    * table — the population-stability-index screen a training pipeline
    * runs when a new data drop lands, per segment. Cohorts are the
    * ≤1997 / >1997 order years; the feature is o_totalprice under four
    * FIXED bins (literal edges — no quantile estimation, so the binning
    * is scale-free and cross-engine exact); Laplace-smoothed bin shares
    * keep empty bins finite. PSI per priority = Σ_bins
    * (p_a−p_b)·ln(p_a/p_b), with the engine-parity discipline of the
    * text lanes: per-bin terms round at 9, the 4-term sum folds in
    * sorted bin order (deterministic IEEE order on both engines), final
    * round at 6. One scan builds the cohort×bin counts; everything
    * after is segment-cardinality metadata. */
  def dqDriftPsi(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"),
      (year(col("o_orderdate")) <= lit(1997)).as("is_a"),
      when(col("o_totalprice") < 50000, 0)
        .when(col("o_totalprice") < 150000, 1)
        .when(col("o_totalprice") < 300000, 2).otherwise(3).as("bin"))
    val counts = binned.groupBy("prio", "bin")
      .agg(count(when(col("is_a"), lit(1))).as("na"),
        count(when(!col("is_a"), lit(1))).as("nb"))
    // densify to the full prio × bin lattice so absent bins smooth, not
    // drop — the prio domain comes from the aggregated counts (every prio
    // in the table is in counts by construction), so no second table scan
    val lattice = counts.select("prio").distinct()
      .crossJoin(broadcast(
        spark.range(4).select(col("id").cast("int").as("bin"))))
    val full = lattice.join(counts, Seq("prio", "bin"), "left")
      .select(col("prio"), col("bin"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = full.groupBy("prio").agg(sum("na").as("ta"), sum("nb").as("tb"))
    val terms = full.join(tot, "prio")
      .select(col("prio"), col("bin"),
        ((col("na") + 1).cast("double") / (col("ta") + 4)).as("pa"),
        ((col("nb") + 1).cast("double") / (col("tb") + 4)).as("pb"))
      .select(col("prio"), col("bin"),
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 9).as("term"))
    terms.groupBy("prio")
      .agg(round(expr(
        "aggregate(transform(sort_array(collect_list(struct(bin, term))), x -> x.term), 0.0D, (acc, t) -> acc + t)"),
        6).as("psi"))
      .select(col("prio").as("o_orderpriority"), col("psi"),
        when(col("psi") > 0.2, "major")
          .when(col("psi") > 0.1, "moderate")
          .otherwise("stable").as("drift"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_constraints_orders" -> (dqConstraintsOrders _),
    "dq_constraints_documents" -> (dqConstraintsDocuments _),
    "dq_referential" -> (dqReferential _),
    "dq_drift_psi" -> (dqDriftPsi _))

  val oracle: Map[String, String] = Map(
    "dq_constraints_documents" ->
      """WITH a AS (
        |  SELECT count(*)::DOUBLE AS n,
        |         count(DISTINCT doc_id)::DOUBLE AS m0,
        |         count(text)::DOUBLE AS m1,
        |         count(CASE WHEN length(text) > 0 THEN 1 END)::DOUBLE AS m2,
        |         count(CASE WHEN length(text) <= 10000 THEN 1 END)::DOUBLE AS m3,
        |         count(CASE WHEN n_chars = length(text) THEN 1 END)::DOUBLE AS m4,
        |         count(CASE WHEN lang IN ('de','en','es','fr','zh')
        |                 THEN 1 END)::DOUBLE AS m5
        |  FROM documents),
        |u AS (
        |  SELECT 'uniqueness(doc_id)' AS check_name, m0 AS m, n FROM a
        |  UNION ALL SELECT 'completeness(text)', m1, n FROM a
        |  UNION ALL SELECT 'nonempty(text)', m2, n FROM a
        |  UNION ALL SELECT 'bounds(len<=10000)', m3, n FROM a
        |  UNION ALL SELECT 'consistent(n_chars)', m4, n FROM a
        |  UNION ALL SELECT 'membership(lang)', m5, n FROM a)
        |SELECT check_name, round(m / n, 6) AS metric, m >= n AS pass
        |FROM u ORDER BY check_name""".stripMargin,

    "dq_drift_psi" ->
      """WITH b AS (
        |  SELECT o_orderpriority AS prio,
        |         year(o_orderdate) <= 1997 AS is_a,
        |         CASE WHEN o_totalprice < 50000 THEN 0
        |              WHEN o_totalprice < 150000 THEN 1
        |              WHEN o_totalprice < 300000 THEN 2 ELSE 3 END AS bin
        |  FROM orders),
        |c AS (
        |  SELECT prio, bin,
        |         count(CASE WHEN is_a THEN 1 END) AS na,
        |         count(CASE WHEN NOT is_a THEN 1 END) AS nb
        |  FROM b GROUP BY 1, 2),
        |lattice AS (
        |  SELECT p.prio, g.bin,
        |         coalesce(c.na, 0) AS na, coalesce(c.nb, 0) AS nb
        |  FROM (SELECT DISTINCT prio FROM b) p
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bin) g
        |  LEFT JOIN c ON c.prio = p.prio AND c.bin = g.bin),
        |t AS (SELECT prio, sum(na) AS ta, sum(nb) AS tb
        |      FROM lattice GROUP BY 1),
        |terms AS (
        |  SELECT f.prio, f.bin,
        |         round(((f.na + 1)::DOUBLE / (t.ta + 4)
        |                - (f.nb + 1)::DOUBLE / (t.tb + 4))
        |               * ln(((f.na + 1)::DOUBLE / (t.ta + 4))
        |                    / ((f.nb + 1)::DOUBLE / (t.tb + 4))), 9) AS term
        |  FROM lattice f JOIN t USING (prio)),
        |psi AS (SELECT prio, round(sum(term ORDER BY bin), 6) AS psi
        |        FROM terms GROUP BY 1)
        |SELECT prio AS o_orderpriority, psi,
        |       CASE WHEN psi > 0.2 THEN 'major'
        |            WHEN psi > 0.1 THEN 'moderate'
        |            ELSE 'stable' END AS drift
        |FROM psi ORDER BY 1""".stripMargin,

    "dq_constraints_orders" ->
      """WITH a AS (
        |  SELECT count(*)::DOUBLE AS n,
        |         count(o_custkey)::DOUBLE AS m0,
        |         count(DISTINCT o_orderkey)::DOUBLE AS m1,
        |         count(CASE WHEN o_totalprice > 0 THEN 1 END)::DOUBLE AS m2,
        |         count(CASE WHEN regexp_matches(o_orderpriority,
        |                 '^[1-5]-[A-Z ]+$') THEN 1 END)::DOUBLE AS m3,
        |         count(CASE WHEN o_orderstatus IN ('O','F','P')
        |                 THEN 1 END)::DOUBLE AS m4,
        |         count(CASE WHEN year(o_orderdate) BETWEEN 1995 AND 2001
        |                 THEN 1 END)::DOUBLE AS m5
        |  FROM orders),
        |u AS (
        |  SELECT 'completeness(o_custkey)' AS check_name, m0 AS m, n FROM a
        |  UNION ALL SELECT 'uniqueness(o_orderkey)', m1, n FROM a
        |  UNION ALL SELECT 'range(o_totalprice>0)', m2, n FROM a
        |  UNION ALL SELECT 'pattern(o_orderpriority)', m3, n FROM a
        |  UNION ALL SELECT 'membership(o_orderstatus)', m4, n FROM a
        |  UNION ALL SELECT 'bounds(year(o_orderdate))', m5, n FROM a)
        |SELECT check_name, round(m / n, 6) AS metric, m >= n AS pass
        |FROM u ORDER BY check_name""".stripMargin,

    "dq_referential" ->
      """WITH rel AS (
        |  SELECT 'customer.c_nationkey->nation.n_nationkey' AS relationship,
        |         count(*) AS n_child,
        |         count(CASE WHEN p.k IS NULL THEN 1 END) AS n_orphans
        |  FROM customer c LEFT JOIN
        |       (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    ON c.c_nationkey = p.k
        |  WHERE c.c_nationkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders.o_orderkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM lineitem l LEFT JOIN
        |       (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON l.l_orderkey = p.k
        |  WHERE l.l_orderkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part.p_partkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM lineitem l LEFT JOIN
        |       (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON l.l_partkey = p.k
        |  WHERE l.l_partkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier.s_suppkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM lineitem l LEFT JOIN
        |       (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |    ON l.l_suppkey = p.k
        |  WHERE l.l_suppkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'nation.n_regionkey->region.r_regionkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM nation n LEFT JOIN
        |       (SELECT DISTINCT r_regionkey AS k FROM region) p
        |    ON n.n_regionkey = p.k
        |  WHERE n.n_regionkey IS NOT NULL
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer.c_custkey', count(*),
        |         count(CASE WHEN p.k IS NULL THEN 1 END)
        |  FROM orders o LEFT JOIN
        |       (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON o.o_custkey = p.k
        |  WHERE o.o_custkey IS NOT NULL)
        |SELECT relationship, n_child, n_orphans, n_orphans = 0 AS ref_ok
        |FROM rel ORDER BY relationship""".stripMargin)
}
