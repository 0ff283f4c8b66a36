package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Relational
import graft.sources.Tables

/** Classic star-schema analytics over the driver tables — the multi-table
  * join / aggregation / top-k surface the reference lacks entirely
  * (SURVEY.md §2.5: no joins exist in the reference; Spark provides them at
  * zero cost). Modeled on TPC-H Q1/Q3/Q5 shapes.
  *
  * Determinism contract with the DuckDB oracle: money aggregates are summed
  * as DECIMAL (exact, order-independent), rounded, then cast to DOUBLE;
  * averages divide the exact decimal sum by the count in double (IEEE-
  * identical across engines); every result has a total ordering.
  */
object Tpch {

  private def decSum2(c: org.apache.spark.sql.Column) =
    round(sum(c.cast(DecimalType(28, 10))), 2).cast("double")

  /** Q1 shape: scan-heavy single-table aggregation with filter pushdown.
    * The shipdate predicate reaches the parquet scan (PushedFilters). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val disc  = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum2(col("l_quantity")).as("sum_qty"),
        decSum2(col("l_extendedprice")).as("sum_base_price"),
        decSum2(disc).as("sum_disc_price"),
        decSum2(charge).as("sum_charge"),
        round(sum(col("l_quantity").cast(DecimalType(28, 10))).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(col("l_discount").cast(DecimalType(28, 10))).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Q3 shape: 3-way join, grouped revenue, distributed top-k
    * (TakeOrderedAndProject — no global sort materialization). */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(decSum2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Q5 shape: 6-way join with broadcast dimensions (region/nation) and a
    * co-located supplier/customer nation constraint. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    broadcast(r).join(broadcast(n), col("n_regionkey") === col("r_regionkey"))
      .join(c, col("c_nationkey") === col("n_nationkey"))
      .join(o, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
               col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(decSum2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** ROLLUP grouping-sets aggregation (order year × priority with subtotal
    * and grand-total rows) — the distinct/cube/rollup surface the reference
    * lacks (SURVEY.md §2.3). NULL ordering pinned to NULLS FIRST on both
    * engines. */
  def qRollupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast(DecimalType(28, 10))), 2).cast("double").as("sum_price"))
      .orderBy(col("yr").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Anti-join + semi-join surface: per nation, customers with no orders vs
    * customers with at least one 'F' order. LeftAnti/LeftSemi plan shapes —
    * no row multiplication, no wide shuffle of the probe side's payload. */
  def qCustomerActivity(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val n = Tables.nation(spark, dir)
    val inactive = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_inactive"))
    val fulfilled = c.join(
        o.filter(col("o_orderstatus") === "F"),
        c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_with_f_order"))
    broadcast(n)
      .join(inactive, n("n_nationkey") === inactive("c_nationkey"), "left")
      .drop("c_nationkey")
      .join(fulfilled, n("n_nationkey") === fulfilled("c_nationkey"), "left")
      .select(col("n_name"),
        coalesce(col("n_inactive"), lit(0L)).as("n_inactive"),
        coalesce(col("n_with_f_order"), lit(0L)).as("n_with_f_order"))
      .orderBy("n_name")
  }

  /** Distinct aggregation surface: exact count_distinct per order priority
    * (the approx_count_distinct/HLL variant is the same call shape with
    * bounded state — exposed via functions.approx_count_distinct). */
  def qDistinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("o_orderpriority")

  /** Pivot surface: order counts per year pivoted on status. The explicit
    * value list keeps the plan single-pass (no distinct-collect job) and the
    * output schema static — required at scale and for oracle parity. */
  def qPivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy("yr")

  /** UNPIVOT (melt) — the inverse of [[qPivotStatus]]: the wide per-year
    * status counts back to (yr, status, n_orders) rows via the native
    * `Dataset.unpivot` (plans as one Expand pass — no per-column union). */
  def qUnpivotStatus(spark: SparkSession, dir: String): DataFrame =
    qPivotStatus(spark, dir)
      .unpivot(Array(col("yr")), Array(col("F"), col("O"), col("P")),
        "status", "n_orders")
      .orderBy("yr", "status")

  /** FULL OUTER join reconciliation — the two-source audit dataflow: the
    * early-buyer order rollup (orders before 1996) vs the high-balance
    * customer list, keeping rows present on either side with a presence
    * tag (all three classes are non-empty at sf0.01: 954/220/275). Both
    * sides pre-aggregate / pre-filter before the join, so the full-outer
    * exchange carries keys, not facts; money sums are exact decimals
    * ([[decSum2]]). */
  def qFullOuterReconcile(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), decSum2(col("o_totalprice")).as("spend"))
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 1000)
      .select(col("c_custkey"), col("c_acctbal").as("acctbal"))
    oc.join(rich, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        col("n_orders"), col("spend"), col("acctbal"),
        when(col("o_custkey").isNotNull && col("c_custkey").isNotNull, "both")
          .when(col("o_custkey").isNotNull, "orders_only")
          .otherwise("rich_only").as("presence"))
      .orderBy("custkey")
  }

  /** Data-quality audit — the expectations/consistency report a pipeline
    * runs after every load: named checks with violation counts in one
    * relation; non-violated checks report an explicit 0 (the check ran
    * and passed — absence would be silence). Two checks are non-zero on
    * the driver data (orders with no lineitems, post-2001 order dates),
    * so the gate verifies real violation counting, not just zeros.
    *
    * Scale shape: every check is a CONDITIONAL AGGREGATE over two
    * key-only FULL OUTER joins (orders ⋈ lineitem-per-order, customer ⋈
    * orders-per-customer), so lineitem and customer are scanned ONCE and
    * orders twice (slim key projections both times) — the naive
    * one-anti-join-per-check form costs a scan per check (5× orders, 4×
    * lineitem observed in the plan dump) for the same exchanges. Both
    * join sides pre-aggregate to keys before the exchange; the 1-row
    * check vectors cross-join broadcast and unpivot via stack. */
  def qIntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
      when(col("o_orderdate") > lit("2001-01-01").cast("timestamp"), 1L)
        .otherwise(0L).as("future"))
    val lAgg = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("ln"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.3, 1L)
          .otherwise(0L)).as("dv"),
        sum(when(col("l_extendedprice") <= 0 || col("l_quantity") <= 0, 1L)
          .otherwise(0L)).as("pv"))
    val orderSide = o.join(lAgg, col("o_orderkey") === col("l_orderkey"), "full_outer")
      .agg(
        sum(when(col("o_orderkey").isNotNull && col("l_orderkey").isNull, 1L)
          .otherwise(0L)).as("orders_no_lineitems"),
        coalesce(sum(when(col("o_orderkey").isNull, col("ln")).otherwise(0L)), lit(0L))
          .as("lineitem_orphans"),
        coalesce(sum(col("dv")), lit(0L)).as("lineitem_discount_range"),
        coalesce(sum(col("pv")), lit(0L)).as("lineitem_nonpositive_price"),
        coalesce(sum(col("future")), lit(0L)).as("orders_future_dates"))
    val oPerCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    val custSide = Tables.customer(spark, dir).select(col("c_custkey"))
      .join(oPerCust, col("c_custkey") === col("o_custkey"), "full_outer")
      .agg(
        sum(when(col("c_custkey").isNotNull && col("o_custkey").isNull, 1L)
          .otherwise(0L)).as("customers_without_orders"),
        coalesce(sum(when(col("c_custkey").isNull, col("n_orders")).otherwise(0L)),
          lit(0L)).as("orders_orphan_customer"))
    orderSide.crossJoin(broadcast(custSide))
      .select(expr(
        """stack(7,
          |  'customers_without_orders', customers_without_orders,
          |  'lineitem_discount_range', lineitem_discount_range,
          |  'lineitem_nonpositive_price', lineitem_nonpositive_price,
          |  'lineitem_orphans', lineitem_orphans,
          |  'orders_future_dates', orders_future_dates,
          |  'orders_no_lineitems', orders_no_lineitems,
          |  'orders_orphan_customer', orders_orphan_customer
          |) AS (check_name, n_violations)""".stripMargin))
      .orderBy("check_name")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition;
    * rounded to 4 decimals for cross-engine float stability). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Exact equi-depth histogram (quartile bins) of order prices — the
    * column-statistics pass a cost-based layer needs. Deliberately NOT
    * `ntile()`: a global ntile window is a single-task total sort at scale.
    * Instead the three quartile boundaries come from ONE distributed
    * exact-percentile aggregation (cross-engine interpolation parity is
    * already gated by q_percentiles), land as plan literals, and bin
    * assignment is a stateless comparison map feeding a 4-group
    * aggregation — no global sort anywhere. Boundaries are rounded to 4
    * decimals on both engines before the comparisons so last-ulp
    * interpolation drift cannot flip a bin at the edge. */
  def qHistogramEquidepth(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val b = orders.agg(
      round(expr("percentile(o_totalprice, 0.25)"), 4).as("b1"),
      round(expr("percentile(o_totalprice, 0.5)"), 4).as("b2"),
      round(expr("percentile(o_totalprice, 0.75)"), 4).as("b3")).head()
    val (b1, b2, b3) = (b.getDouble(0), b.getDouble(1), b.getDouble(2))
    orders
      .withColumn("bin", (lit(1) +
        (col("o_totalprice") > b1).cast("int") +
        (col("o_totalprice") > b2).cast("int") +
        (col("o_totalprice") > b3).cast("int")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bin")
  }

  /** Set-operation surface (INTERSECT / EXCEPT): customer-retention
    * segments between 1996 and 1997 order cohorts. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    def cohort(yr: Int) = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select("o_custkey").distinct()
    val c96 = cohort(1996)
    val c97 = cohort(1997)
    def seg(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_customers")).select(lit(name).as("segment"), col("n_customers"))
    seg("both", c96.intersect(c97))
      .unionAll(seg("only_1996", c96.except(c97)))
      .unionAll(seg("only_1997", c97.except(c96)))
      .orderBy("segment")
  }

  /** Correlated scalar subquery (TPC-H Q2's shape on the tables we have):
    * each customer's cheapest order(s). ONE SQL string is both the Spark
    * query and the DuckDB oracle — Catalyst decorrelates the subquery into
    * an aggregate + join (no per-row re-execution), which is exactly the
    * rewrite you want at scale. */
  private val correlatedSql =
    """SELECT o.o_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS min_price
      |FROM orders o
      |WHERE o.o_totalprice = (SELECT min(o2.o_totalprice) FROM orders o2
      |                        WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_custkey, o.o_orderkey""".stripMargin

  def qCorrelatedCheapestOrder(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(correlatedSql)
  }

  /** Oracle-gated SKETCH contracts: HLL count-distinct and approximate
    * median are not cross-engine hash-comparable, but their ERROR BOUNDS
    * are. The query emits exact values plus booleans asserting the sketch
    * landed within its documented bound (HLL rsd 0.02 → 5%;
    * percentile_approx accuracy 10000 → ~n/10⁴ rank error → 1% on price);
    * the oracle emits the exacts and literal TRUEs, so a sketch regression
    * fails the hard gate. */
  def qSketchBounds(spark: SparkSession, dir: String): DataFrame = {
    val exactD = countDistinct(col("o_custkey"))
    val hll = approx_count_distinct(col("o_custkey"), 0.02)
    val p50e = expr("percentile(o_totalprice, 0.5)")
    val p50a = expr("percentile_approx(o_totalprice, 0.5, 10000)")
    val o = Tables.orders(spark, dir)
    // Two aggregations joined on the 5-row group key, NOT one: mixing
    // count(DISTINCT) with percentile buffers makes Catalyst route the
    // percentile state through the distinct Expand (2× row copies through
    // a sort-heavy buffer — measured ~5 s extra at sf0.1). Split, each agg
    // keeps its natural shape; the join is a broadcast over 5 rows.
    val distincts = o.groupBy("o_orderpriority")
      .agg(exactD.as("n_cust"),
        (abs(hll - exactD) <= exactD * 0.05).as("hll_within_5pct"))
    val pcts = o.groupBy("o_orderpriority")
      .agg(round(p50e, 4).as("p50_exact"),
        (abs(p50a - p50e) <= p50e * 0.01).as("p50_approx_within_1pct"))
    distincts.join(pcts, "o_orderpriority")
      .select("o_orderpriority", "n_cust", "hll_within_5pct",
        "p50_exact", "p50_approx_within_1pct")
      .orderBy("o_orderpriority")
  }

  /** Ranking-function breadth through the hard gate: dense_rank,
    * percent_rank, cume_dist, ntile, and lag in one pass over a single
    * window definition (thinned to every 50th order to keep the gate
    * artifact small). The order key includes the unique o_orderkey, so
    * every function is total-order deterministic; the rational-valued
    * ranks round to 6 decimals before comparison. */
  def qWindowFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        dense_rank().over(w).cast("long").as("drk"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(col("o_totalprice") - lag("o_totalprice", 1).over(w), 2).as("delta_prev"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** MERGE/upsert surface ([[Relational.upsert]]) through the hard gate:
    * a synthetic update set (every 100th order re-prioritized) merged
    * SCD-1 style into orders, then aggregated — the oracle states the same
    * result as one CASE expression, so a wrong anti-join/union would
    * miscount immediately. */
  def qMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val updates = o.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderpriority", lit("0-UPDATED"))
    Relational.upsert(o, updates, Seq("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Tier boundaries for [[qRangeJoinPriceTiers]] — single source of truth
    * for the Spark dim and the oracle's VALUES literal. */
  private val priceTiers = Seq(
    ("budget", 0.0, 100000.0),
    ("standard", 100000.0, 250000.0),
    ("premium", 250000.0, 1000000000.0))

  /** Non-equi range join: orders banded into irregular literal price tiers.
    * The tier dim is tiny and the predicate is interval containment, so the
    * right 100 TB plan is a BroadcastNestedLoopJoin — every fact row probes
    * the 3 broadcast intervals with NO shuffle of the fact side (an
    * equi-join rewrite exists only for equal-width bands; irregular
    * intervals are the general case). */
  def qRangeJoinPriceTiers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tiers = priceTiers.toDF("tier", "lo", "hi")
    Tables.orders(spark, dir)
      .join(broadcast(tiers),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_orders"), decSum2(col("o_totalprice")).as("revenue"))
      .orderBy("tier")
  }

  /** [[qRangeJoinPriceTiers]] re-planned for a LARGE interval dimension —
    * the generic scale path for interval joins: decompose each [lo, hi)
    * interval into fixed-width bins (the open-ended catch-all tier is
    * clamped to the observed fact max before binning, so a sentinel bound
    * cannot explode the bin count), equi-join fact rows on their single bin
    * id, keep the containment residual. Per-row probe cost drops from
    * O(|intervals|) under the BroadcastNestedLoopJoin to one hash lookup —
    * and with an interval table too big to broadcast, the same plan runs as
    * an ordinary shuffled equi-join, which a nested-loop join can never do.
    * Bins cover each interval exactly and every fact row has exactly one
    * bin, so the result is bit-identical to the BNL formulation and shares
    * its oracle SQL. */
  def qRangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binW = 50000.0
    val orders = Tables.orders(spark, dir)
    val maxPrice = orders.agg(max(col("o_totalprice"))).head().getDouble(0)
    // Tiers entirely above max(o_totalprice)+1 produce hic < lo; drop them
    // before the explode — sequence(hi_bin < lo_bin) would otherwise run
    // DESCENDING and inflate the broadcast side with spurious bins (the
    // residual filter keeps results correct, but the bins are pure waste).
    // The upper bound is also clamped to >= lo so a tier that merely
    // straddles the cutoff never inverts.
    val bins = priceTiers.toDF("tier", "lo", "hi")
      .withColumn("hic", least(col("hi"), lit(maxPrice + 1.0)))
      .filter(col("hic") > col("lo"))
      .select(col("tier"), col("lo"), col("hi"),
        explode(sequence(floor(col("lo") / binW).cast("long"),
          floor(greatest(col("lo"), col("hic") - 1e-9) / binW).cast("long"))).as("bin"))
    orders
      .withColumn("bin", floor(col("o_totalprice") / binW).cast("long"))
      .join(broadcast(bins), Seq("bin"))
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_orders"), decSum2(col("o_totalprice")).as("revenue"))
      .orderBy("tier")
  }

  /** GROUPING SETS over the orders→customer→nation join: per-(nation,
    * priority) detail, per-nation subtotal, and grand total in ONE pass
    * (Catalyst's Expand — each input row fans to its 3 grouping sets before
    * a single hash aggregation; no re-scan per level). One SQL string is
    * both the Spark query and the oracle; NULLS FIRST is spelled explicitly
    * because the engines' defaults differ (Spark: nulls first; DuckDB:
    * nulls last). */
  private val groupingSetsSql =
    """SELECT n.n_name, o.o_orderpriority,
      |       count(*) AS n_orders,
      |       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY GROUPING SETS ((n.n_name, o.o_orderpriority), (n.n_name), ())
      |ORDER BY n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(groupingSetsSql)
  }

  /** TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join: orders in a
    * quarter that have at least one returned lineitem, counted per priority
    * (the slimmed schema has no commitdate/receiptdate, so "late delivery"
    * becomes "has a returned line" — same dataflow). Semi join never
    * multiplies rows and moves no lineitem payload past the join; the date
    * filter is pushed to the orders scan, the returnflag filter to the
    * lineitem scan, so both exchanges carry pre-filtered keys only. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1995-04-01").cast("timestamp"))
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q13 shape — customer order-count distribution over a LEFT OUTER
    * join with a join-side predicate (the non-urgent constraint lives in
    * the ON clause, so customers with only urgent orders still appear with
    * count 0). Both join inputs are projected to keys before the exchange;
    * the second aggregation's input is one row per customer — tiny. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape — large-volume orders: the IN-subquery-with-HAVING
    * form (orderkeys whose total quantity exceeds 250) built as a
    * pre-aggregation joined back to the fact. The HAVING set is orders of
    * magnitude smaller than lineitem, so the join back is effectively a
    * semi-join on a reduced key set; the quantity total rides along from
    * the same aggregation (no second lineitem pass) and the global top-100
    * plans as TakeOrderedAndProject. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_quantity").cast(DecimalType(28, 10))), 2)
        .cast("double").as("total_qty"))
      .filter(col("total_qty") > 250.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q22 shape — lapsed high-balance customers: a scalar AVG
    * subquery (broadcast as a 1-row cross join — never a shuffle) gates
    * the balance filter, and a LEFT ANTI join against recent orders finds
    * customers with no order since 2000-01-01 (the slimmed schema has no
    * phone column, so Q22's country-code prefix becomes the nation key).
    * The anti join probes with pre-filtered keys only; per-nation counts
    * and exact decimal balance totals come out of one final aggregation. */
  def q22LapsedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"), decSum2(col("c_acctbal")).as("total_bal"))
      .orderBy("c_nationkey")
  }

  /** TPC-H Q7 shape — bi-directional nation-pair trade volume. The two
    * nation lookups are pre-filtered to the pair BEFORE joining (so the
    * disjunctive pair predicate never gates the fact scan — each broadcast
    * side carries only 2 rows and the residual OR filters the 2×2 cross of
    * surviving pairs), and revenue is grouped by (supplier nation, customer
    * nation, ship year). lineitem is the only large input; it flows through
    * two broadcast joins (supplier, its nation) and one shuffled join to
    * orders→customer. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_1", "NATION_2")
    val pairNations = Tables.nation(spark, dir)
      .filter(col("n_name").isin(na, nb))
    val suppN = pairNations
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custN = pairNations
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
    l.join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppN), col("s_nationkey") === col("sn_key"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custN), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
              (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(decSum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q14 shape — promo revenue share by month: conditional aggregation
    * (CASE inside SUM) over a lineitem⋈part equi-join; part is projected to
    * (key, type) and broadcast, so the fact side never shuffles before the
    * monthly rollup. The ratio divides the two already-rounded decimal
    * sums in double so both engines evaluate bit-identical arithmetic. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        decSum2(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0))).as("promo_rev"),
        decSum2(disc).as("total_rev"))
      .withColumn("promo_pct", round(lit(100.0) * col("promo_rev") / col("total_rev"), 6))
      .orderBy("ship_month")
  }

  /** TPC-H Q19 shape — disjunctive mixed-side join predicates: three
    * (brand, size range, quantity range) branches OR-ed together inside the
    * join condition. Catalyst's extra-predicate extraction pushes the
    * per-side disjunctions below the join (part keeps only the three
    * brands, lineitem only the union quantity range), so neither scan
    * carries rows no branch can accept; the full OR remains as the join
    * residual. */
  def q19DisjunctiveBranches(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val branches =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey") && branches)
      .groupBy("p_brand")
      .agg(
        decSum2(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  /** TPC-H Q21 shape — suppliers who were the ONLY late shipper on a
    * multi-supplier order (the slimmed schema has no receipt/commit dates,
    * so "late" is shipping > 90 days after the order date). The textbook
    * form is EXISTS (another supplier) AND NOT EXISTS (another late
    * supplier) — the oracle keeps that form verbatim, while the Spark side
    * computes it in ONE pass: per-(order, supplier) late flags, then
    * order-wide supplier/late-supplier counts via a window, so the
    * double-correlated subqueries collapse to a single extra exchange
    * instead of two additional self-joins of the fact. */
  def q21OnlyLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val flags = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1).otherwise(0)).as("late"))
    val w = Window.partitionBy("l_orderkey")
    val qualifying = flags
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
    qualifying
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  /** partsupp analog — the slimmed schema has no partsupp table
    * (TESTDATA.md), so the part-supplier relation is derived from lineitem:
    * one row per distinct (l_partkey, l_suppkey) with the minimum observed
    * unit price as the supply cost. Both engines evaluate the same IEEE
    * double division on the same rows and min is order-independent, so the
    * derived relation is bit-identical across Spark and the oracle WITHOUT
    * any rounding — deliberately none here: a decimal round of the quotient
    * can differ by 1 ulp between engines (Spark rounds the exact binary
    * expansion, DuckDB rounds after a 10^k multiply), and downstream
    * arithmetic (Q9's cost × quantity) would amplify that into the sums.
    * One hash aggregation on the pair key; at scale this is the same
    * shuffle any partsupp-keyed query pays. */
  def partSupp(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))

  /** TPC-H Q2 shape — min-cost supplier per part: the classic correlated-MIN
    * subquery, decorrelated to a per-part window MIN over the region-filtered
    * candidate set (one evaluation of the candidate relation instead of the
    * textbook's re-scan per row). part and the supplier⋈nation⋈region lookup
    * are both broadcast; the only exchange is the window's per-part hash —
    * on the already part-filtered candidates, not the full partsupp. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_size") === 48 && col("p_type") === "LARGE")
      .select("p_partkey", "p_name")
    val eu = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val cand = partSupp(spark, dir)
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(eu), col("ps_suppkey") === col("s_suppkey"))
    val w = Window.partitionBy("ps_partkey")
    cand.withColumn("min_cost", min(col("ps_supplycost")).over(w))
      .filter(col("ps_supplycost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("ps_supplycost").as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q6 shape — the forecasting-revenue-change scan: single-table
    * filter + two-column aggregate, no join, no shuffle beyond the 1-row
    * partial-agg merge. All three predicates reach the parquet scan. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(decSum2(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q8 shape — national market share: one nation's fraction of a
    * region's part-type revenue per order year. The share is a conditional
    * sum over the SAME joined relation (never a self-join); part, both
    * nation lookups, and supplier are broadcast, so lineitem shuffles only
    * for the orders join and the 2-row year rollup. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaCust = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cnk"))
    val suppN = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val p = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD").select("p_partkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaCust), col("c_nationkey") === col("cnk"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppN), col("s_nationkey") === col("snk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        decSum2(when(col("supp_nation") === "NATION_2", vol).otherwise(lit(0.0)))
          .as("nation_rev"),
        decSum2(vol).as("total_rev"))
      .withColumn("mkt_share", round(col("nation_rev") / col("total_rev"), 6))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape — product-type profit by nation and year: profit =
    * revenue − supply cost × quantity, with the cost looked up in the
    * derived partsupp on the composite (part, supplier) key. The partsupp
    * side is semi-join-pruned to the LIKE-matching parts BEFORE its shuffle,
    * so the composite-key exchange moves only matching pairs. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").like("%widget%")).select("p_partkey")
    val ps = partSupp(spark, dir)
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"), "left_semi")
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      col("ps_supplycost") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(ps, col("l_partkey") === col("ps_partkey") &&
                col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(decSum2(profit).as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q10 shape — returned-item reporting: top-20 customers by revenue
    * lost to returns in one quarter. Grouping keys carry the customer
    * attributes through the aggregation (no post-agg join back), and the
    * top-20 plans as TakeOrderedAndProject. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-04-01").cast("timestamp"))
    Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(decSum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q11 shape — important-stock screen: per-part value restricted to
    * one nation's suppliers, kept when above a fraction of the global total.
    * The global total re-aggregates the per-part values (sum of DECIMAL over
    * the already-rounded doubles — exact and order-independent) and joins
    * back as a broadcast scalar, never a shuffle. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val n3 = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val v = partSupp(spark, dir)
      .join(broadcast(n3), col("ps_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("ps_partkey")
      .agg(decSum2(col("ps_supplycost")).as("part_value"))
    val total = v.agg(
      round(sum(col("part_value").cast(DecimalType(28, 10))), 2)
        .cast("double").as("total_value"))
    v.crossJoin(broadcast(total))
      .filter(col("part_value") > lit(0.0005) * col("total_value"))
      .select("ps_partkey", "part_value")
      .orderBy(col("part_value").desc, col("ps_partkey").asc)
  }

  /** TPC-H Q12 shape — shipping-speed priority mix: the slimmed schema has
    * no ship mode, so Q12's mode classes become ship-delay buckets (FAST /
    * MEDIUM / SLOW on days between order and ship date); the high/low
    * priority split is the same CASE-inside-SUM pair over one join. */
  def q12ShipSpeed(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val speed = when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 180 DAYS"), "3-SLOW")
      .when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS"), "2-MEDIUM")
      .otherwise("1-FAST")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(speed.as("ship_speed"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("ship_speed")
  }

  /** TPC-H Q15 shape — top supplier by quarterly revenue: the revenue view
    * aggregated once, its global MAX taken as a 1-row broadcast scalar, and
    * the equality filter applied back on the same view (ties all kept, as
    * the spec requires). Revenue is rounded before the max/compare, so the
    * equality is on bit-identical doubles on both engines. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(decSum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .crossJoin(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .select("s_suppkey", "s_name", "total_rev")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 shape — supplier diversity per part class with a NOT-IN
    * exclusion: count of distinct suppliers per (brand, type, size),
    * excluding flagged (negative-balance) suppliers via LEFT ANTI — the
    * null-free NOT IN plan. part and the exclusion set are broadcast; the
    * only exchange is the distinct-count's. */
  def q16SupplierDiversity(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    partSupp(spark, dir)
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(flagged), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc, col("p_type").asc,
        col("p_size").asc)
  }

  /** TPC-H Q17 shape — small-quantity-order revenue: the correlated
    * per-part AVG subquery decorrelated to ONE pre-aggregation joined back
    * to the brand's lineitems. l_quantity is integer-valued, so the decimal
    * sum ÷ count average is exact and engine-identical; the final division
    * by 7 happens on the already-exact decimal sum. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#5").select("p_partkey")
    val lb = Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val halfAvg = lb.groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(col("l_quantity").cast(DecimalType(28, 10))).cast("double") /
        count(lit(1)) * 0.5).as("half_avg"))
    lb.join(halfAvg, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(
        round(sum(col("l_extendedprice").cast(DecimalType(28, 10)))
          .cast("double") / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q20 shape — excess shippers: suppliers whose one-year shipped
    * quantity of the LIKE-matched parts exceeds a fraction of their
    * all-time total for those parts. The nested aggregate runs once over
    * the part-pruned lineitems (both year totals from the SAME pass via
    * conditional sums), and feeds a LEFT SEMI against supplier. */
  def q20ExcessShippers(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").like("small%")).select("p_partkey")
    val hot = Tables.lineitem(spark, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(
        sum(when(year(col("l_shipdate")) === 1996, col("l_quantity"))
          .otherwise(lit(0.0)).cast(DecimalType(28, 10))).cast("double").as("qty96"),
        sum(col("l_quantity").cast(DecimalType(28, 10))).cast("double").as("qty_all"))
      .filter(col("qty96") > lit(0.2) * col("qty_all"))
      .select("l_suppkey")
    Tables.supplier(spark, dir)
      .join(hot, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "n_name")
      .orderBy("s_name")
  }

  /** Pair-support floor for [[qMarketBasket]] — the Apriori support prune:
    * below it, co-occurrence is one-off noise AND the pair relation explodes
    * (at sf0.01: 112 284 support-1 pairs vs 63 at ≥ 3). */
  val BasketMinSupport = 3

  /** Market-basket association rules bounded to item PAIRS — frequent-
    * itemset mining's workhorse tier (support / confidence both ways /
    * lift). Scale shape: baskets collapse to per-order item sets in ONE
    * aggregation and pairs expand IN-ROW (the co-author edge discipline —
    * never a basket⋈basket self-join); the support floor prunes before the
    * statistics joins, and item supports broadcast. Basket width bounds the
    * per-row expansion (k² in items-per-order, ~4 here); wide baskets at
    * 100 TB get the same df-cap treatment as the shingle pipelines. */
  def qMarketBasket(spark: SparkSession, dir: String): DataFrame = {
    val ba = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val nb = ba.agg(countDistinct(col("o")).as("n"))
    val item = ba.distinct().groupBy("p").agg(count(lit(1)).as("cp"))
    val pairs = ba.groupBy("o").agg(collect_set(col("p")).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, x -> transform(filter(ps, y -> y > x), y -> struct(x AS a, y AS b))))"))
        .as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= BasketMinSupport)
    pairs
      .join(broadcast(item.select(col("p").as("a"), col("cp").as("ca"))), "a")
      .join(broadcast(item.select(col("p").as("b"), col("cp").as("cb"))), "b")
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("c").as("support"),
        round(col("c").cast("double") / col("ca"), 6).as("conf_a_to_b"),
        round(col("c").cast("double") / col("cb"), 6).as("conf_b_to_a"),
        round((col("c") * col("n")).cast("double") / (col("ca") * col("cb")), 6).as("lift"))
      .orderBy(col("lift").desc, col("a").asc, col("b").asc)
  }

  /** Join-key skew diagnosis — the report that decides WHICH mitigation a
    * join gets (plain hash / AQE skew split / salting, [[graft.ops.Skew]]):
    * per candidate key column of the fact table, cardinality, the hottest
    * key's row count, and its share of the table. One pass: the key
    * columns stack into (col_name, key) pairs map-side, then two
    * aggregations — per-key counts (partial+final, the same shuffle a join
    * on that key would pay) and per-column rollups. At 100 TB this runs on
    * a sample partition first; the exact form here IS the oracle-gateable
    * semantics. */
  def qSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val stacked = l.select(explode(map(
        lit("l_orderkey"), col("l_orderkey"),
        lit("l_partkey"), col("l_partkey"),
        lit("l_suppkey"), col("l_suppkey"))).as(Seq("col_name", "key")))
    val perKey = stacked.groupBy("col_name", "key").agg(count(lit(1)).as("c"))
    perKey.groupBy("col_name")
      .agg(sum(col("c")).cast("long").as("n_rows"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_key_rows"))
      .select(col("col_name"), col("n_rows"), col("n_distinct"), col("max_key_rows"),
        round(col("max_key_rows").cast("double") / col("n_rows"), 6).as("top_share"))
      .orderBy("col_name")
  }

  /** Bootstrap replicate count for [[qBootstrapCi]]. */
  val BootstrapReps = 32

  // Fixed affine coefficients deriving every replicate's weight from ONE
  // base hash per order (seeded, so the oracle embeds identical literals)
  // — the MinHash-signature trick applied to bootstrap weights.
  private val (bootA, bootB) = {
    val rnd = new scala.util.Random(23)
    def draw() = Array.fill(BootstrapReps)(
      1L + (rnd.nextLong().abs % (graft.functions.Portable.P31 - 1)))
    (draw(), draw())
  }
  private val bootParamsValues = (0 until BootstrapReps)
    .map(i => s"(${i}, ${bootA(i)}, ${bootB(i)})").mkString(", ")

  /** Bootstrap confidence interval for the mean order price — resampling-
    * based uncertainty quantification, derandomized so both engines build
    * the SAME replicates: each order is hashed ONCE (60-bit md5 reduced
    * mod P31) and replicate b's weight is an affine map of that hash,
    * ((a_b·h + c_b) mod P31) mod 3 ∈ {0,1,2} — the MinHash K-signature
    * derivation applied to bootstrap weights, replacing 32 md5
    * evaluations per row with one md5 plus 32 multiplies (the md5 chain
    * WAS the hot loop: the whole query is one scan). Weights stay mean-1
    * integers (the m-out-of-n multinomial bootstrap shape) and pairwise
    * independent across replicates; replicate means are exact
    * decimal ratios, and the 95% interval is the exact interpolated
    * [2.5, 97.5] percentile over the [[BootstrapReps]] means. Scale shape:
    * every replicate's (weighted sum, weight count) is a PAIR OF AGGREGATE
    * BUFFERS in one single-group aggregation — 2B+2 buffers over ONE scan
    * (the full-population sum/count ride the same aggregation, so orders
    * is read exactly once), NO ×B row explode (measured 4.2 s → explode
    * removed at sf0.1: the explode materialized rows×B through the
    * partial aggregate for no information the buffers don't carry). At
    * fleet scale the weights are computed in the same scan as the sum —
    * no per-replicate pass over the data, which is the whole point of
    * weight-based bootstrap on clusters (vs B shuffled resamples). */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_totalprice"),
      (graft.functions.Portable.hash60(col("o_orderkey").cast("string"))
        % graft.functions.Portable.P31).as("h"))
    def w(b: Int) =
      ((lit(bootA(b)) * col("h") + lit(bootB(b)))
        % graft.functions.Portable.P31) % 3
    val buffers = (0 until BootstrapReps).flatMap { b =>
      Seq(sum((col("o_totalprice") * w(b)).cast(DecimalType(38, 10))).as(s"s$b"),
        sum(w(b)).as(s"c$b"))
    } ++ Seq(
      sum(col("o_totalprice").cast(DecimalType(38, 10))).as("s_full"),
      count(lit(1)).as("c_full"))
    val reps = o.agg(buffers.head, buffers.tail: _*)
    // full_mean fans out with the 32 replicate rows (every copy equal, so
    // the max() below is deterministic) — no second relation, no rescan
    val means = reps.select(
      explode(array((0 until BootstrapReps).map(b =>
        round(col(s"s$b").cast("double") / col(s"c$b"), 6)): _*)).as("m"),
      round(col("s_full").cast("double") / col("c_full"), 6).as("full_mean"))
    means
      .agg(count(lit(1)).as("n_reps"),
        max(col("full_mean")).as("full_mean"),
        round(expr("percentile(m, 0.025)"), 4).as("ci_lo"),
        round(expr("percentile(m, 0.975)"), 4).as("ci_hi"))
      .select("n_reps", "full_mean", "ci_lo", "ci_hi")
  }

  private val partSuppCte =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice / l_quantity) AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2
      |)""".stripMargin

  private val tiersValues = priceTiers
    .map { case (t, lo, hi) => s"('$t', $lo, $hi)" }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "q_market_basket" ->
      s"""WITH ba AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |nb AS (SELECT count(DISTINCT o) AS n FROM ba),
         |item AS (SELECT p, count(*) AS cp FROM ba GROUP BY p),
         |pairs AS (
         |  SELECT x.p AS a, y.p AS b, count(*) AS c
         |  FROM ba x JOIN ba y ON x.o = y.o AND x.p < y.p
         |  GROUP BY x.p, y.p HAVING count(*) >= $BasketMinSupport
         |)
         |SELECT a, b, c AS support,
         |       round(CAST(c AS DOUBLE) / ia.cp, 6) AS conf_a_to_b,
         |       round(CAST(c AS DOUBLE) / ib.cp, 6) AS conf_b_to_a,
         |       round(CAST(c * n AS DOUBLE) / (ia.cp * ib.cp), 6) AS lift
         |FROM pairs JOIN item ia ON a = ia.p JOIN item ib ON b = ib.p, nb
         |ORDER BY lift DESC, a ASC, b ASC""".stripMargin,

    "q_bootstrap_ci" ->
      s"""WITH o AS (
         |  SELECT o_totalprice,
         |         ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 2147483647 AS h
         |  FROM orders
         |), params(b, pa, pc) AS (VALUES $bootParamsValues),
         |rep AS (
         |  SELECT b, o_totalprice, ((pa * h + pc) % 2147483647) % 3 AS w
         |  FROM o CROSS JOIN params
         |), means AS (
         |  SELECT b,
         |         round(CAST(sum(CAST(o_totalprice * w AS DECIMAL(38,10))) AS DOUBLE)
         |               / sum(w), 6) AS m
         |  FROM rep GROUP BY b
         |), fm AS (
         |  SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) AS DOUBLE)
         |               / count(*), 6) AS full_mean
         |  FROM o
         |)
         |SELECT count(*) AS n_reps, full_mean,
         |       round(quantile_cont(m, 0.025), 4) AS ci_lo,
         |       round(quantile_cont(m, 0.975), 4) AS ci_hi
         |FROM means, fm GROUP BY full_mean""".stripMargin,

    "q_skew_report" ->
      """WITH stacked AS (
        |  SELECT 'l_orderkey' AS col_name, l_orderkey AS key FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
        |), perkey AS (
        |  SELECT col_name, key, count(*) AS c FROM stacked GROUP BY col_name, key
        |)
        |SELECT col_name, CAST(sum(c) AS BIGINT) AS n_rows,
        |       count(*) AS n_distinct, max(c) AS max_key_rows,
        |       round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_share
        |FROM perkey GROUP BY col_name ORDER BY col_name""".stripMargin,

    "q_correlated_cheapest_order" -> correlatedSql,

    "q_grouping_sets" -> groupingSetsSql,

    "q_window_functions" ->
      """WITH o AS (SELECT * FROM orders WHERE o_orderkey % 50 = 0)
        |SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drk,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta_prev
        |FROM o
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_merge_upsert" ->
      """SELECT CASE WHEN o_orderkey % 100 = 0 THEN '0-UPDATED'
        |            ELSE o_orderpriority END AS o_orderpriority,
        |       count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_range_join_price_tiers" ->
      s"""WITH tiers(tier, lo, hi) AS (VALUES $tiersValues)
         |SELECT tier, count(*) AS n_orders,
         |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
         |FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY tier ORDER BY tier""".stripMargin,

    // The binned decomposition is result-identical to the containment join
    // (bins tile each interval; one bin per fact row) — shared oracle.
    "q_range_join_binned" ->
      s"""WITH tiers(tier, lo, hi) AS (VALUES $tiersValues)
         |SELECT tier, count(*) AS n_orders,
         |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
         |FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY tier ORDER BY tier""".stripMargin,

    "q_sketch_bounds" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_cust,
        |       TRUE AS hll_within_5pct,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
        |       TRUE AS p50_approx_within_1pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_set_ops" ->
      """WITH c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |     c97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT 'both' AS segment, count(*) AS n_customers FROM (SELECT * FROM c96 INTERSECT SELECT * FROM c97)
        |UNION ALL
        |SELECT 'only_1996', count(*) FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c97)
        |UNION ALL
        |SELECT 'only_1997', count(*) FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c96)
        |ORDER BY segment""".stripMargin,

    "q_histogram_equidepth" ->
      """WITH b AS (
        |  SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS b1,
        |         round(quantile_cont(o_totalprice, 0.5), 4) AS b2,
        |         round(quantile_cont(o_totalprice, 0.75), 4) AS b3
        |  FROM orders
        |)
        |SELECT 1 + (o_totalprice > b1)::INTEGER + (o_totalprice > b2)::INTEGER
        |         + (o_totalprice > b3)::INTEGER AS bin,
        |       count(*) AS n_orders,
        |       min(o_totalprice) AS min_price,
        |       max(o_totalprice) AS max_price
        |FROM orders CROSS JOIN b
        |GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderpriority,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS p50_price,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY yr ORDER BY yr""".stripMargin,

    "q_integrity_audit" ->
      """SELECT * FROM (
        |  SELECT 'customers_without_orders' AS check_name, count(*) AS n_violations
        |  FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT 'lineitem_discount_range', count(*)
        |  FROM lineitem WHERE l_discount < 0 OR l_discount > 0.3
        |  UNION ALL
        |  SELECT 'lineitem_nonpositive_price', count(*)
        |  FROM lineitem WHERE l_extendedprice <= 0 OR l_quantity <= 0
        |  UNION ALL
        |  SELECT 'lineitem_orphans', count(*)
        |  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_future_dates', count(*)
        |  FROM orders WHERE o_orderdate > TIMESTAMP '2001-01-01'
        |  UNION ALL
        |  SELECT 'orders_no_lineitems', count(*)
        |  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |  UNION ALL
        |  SELECT 'orders_orphan_customer', count(*)
        |  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |)
        |ORDER BY check_name""".stripMargin,

    "q_unpivot_status" ->
      """WITH w AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |         count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |         count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |         count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |  FROM orders GROUP BY yr
        |)
        |SELECT yr, status, n_orders
        |FROM (UNPIVOT w ON "F", "O", "P" INTO NAME status VALUE n_orders)
        |ORDER BY yr, status""".stripMargin,

    "q_full_outer_reconcile" ->
      """WITH oc AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS spend
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |  GROUP BY o_custkey
        |), rich AS (
        |  SELECT c_custkey, c_acctbal AS acctbal FROM customer WHERE c_acctbal > 1000
        |)
        |SELECT coalesce(o_custkey, c_custkey) AS custkey, n_orders, spend, acctbal,
        |       CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NOT NULL THEN 'both'
        |            WHEN o_custkey IS NOT NULL THEN 'orders_only'
        |            ELSE 'rich_only' END AS presence
        |FROM oc FULL OUTER JOIN rich ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,

    "q_customer_activity" ->
      """WITH inactive AS (
        |  SELECT c_nationkey, count(*) AS n_inactive
        |  FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  GROUP BY c_nationkey
        |), fulfilled AS (
        |  SELECT c_nationkey, count(*) AS n_with_f_order
        |  FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |  GROUP BY c_nationkey
        |)
        |SELECT n_name,
        |       coalesce(i.n_inactive, 0) AS n_inactive,
        |       coalesce(f.n_with_f_order, 0) AS n_with_f_order
        |FROM nation
        |LEFT JOIN inactive i ON n_nationkey = i.c_nationkey
        |LEFT JOIN fulfilled f ON n_nationkey = f.c_nationkey
        |ORDER BY n_name""".stripMargin,

    "q_distinct_counts" ->
      """SELECT o_orderpriority,
        |       count(DISTINCT o_custkey) AS n_customers,
        |       count(DISTINCT l_suppkey) AS n_suppliers,
        |       count(*) AS n_lineitems
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_rollup_orders" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority,
        |       count(*) AS n_orders,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (CAST(year(o_orderdate) AS INTEGER), o_orderpriority)
        |ORDER BY yr ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT o_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <  TIMESTAMP '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) counts
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) > 250.0
        |)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q22_lapsed_customers" ->
      """WITH avg_bal AS (
        |  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
        |)
        |SELECT c_nationkey, count(*) AS n_cust,
        |       CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_bal
        |FROM customer, avg_bal
        |WHERE c_acctbal > a
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') OR
        |       (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q14_promo_revenue" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
        |    CAST(round(sum(CAST(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE) AS promo_rev,
        |    CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY ship_month
        |)
        |SELECT ship_month, promo_rev, total_rev,
        |       round(100.0 * promo_rev / total_rev, 6) AS promo_pct
        |FROM m ORDER BY ship_month""".stripMargin,

    "q19_disjunctive_branches" ->
      """SELECT p_brand,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q21_only_late_supplier" ->
      """WITH flags AS (
        |  SELECT l_orderkey, l_suppkey,
        |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |             THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY l_orderkey, l_suppkey
        |)
        |SELECT s_name, count(*) AS numwait
        |FROM flags a
        |JOIN supplier ON a.l_suppkey = s_suppkey
        |WHERE a.late = 1
        |  AND EXISTS (SELECT 1 FROM flags b
        |              WHERE b.l_orderkey = a.l_orderkey
        |                AND b.l_suppkey <> a.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM flags c
        |                  WHERE c.l_orderkey = a.l_orderkey
        |                    AND c.l_suppkey <> a.l_suppkey
        |                    AND c.late = 1)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 100""".stripMargin,

    "q2_min_cost_supplier" ->
      s"""WITH $partSuppCte,
         |eu AS (
         |  SELECT s_suppkey, s_name, s_acctbal, n_name
         |  FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'
         |),
         |cand AS (
         |  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         |         ps_partkey, ps_supplycost
         |  FROM partsupp
         |  JOIN part ON ps_partkey = p_partkey
         |  JOIN eu ON ps_suppkey = s_suppkey
         |  WHERE p_size = 48 AND p_type = 'LARGE'
         |)
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         |       ps_supplycost AS cost
         |FROM cand c
         |WHERE ps_supplycost = (SELECT min(ps_supplycost) FROM cand c2
         |                       WHERE c2.ps_partkey = c.ps_partkey)
         |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
         |LIMIT 100""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(round(sum(CAST(CASE WHEN sn.n_name = 'NATION_2'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE) AS nation_rev,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_rev,
        |  round(CAST(round(sum(CAST(CASE WHEN sn.n_name = 'NATION_2'
        |          THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,10))), 2) AS DOUBLE)
        |        / CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE p_type = 'STANDARD'
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      s"""WITH $partSuppCte
         |SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
         |    - ps_supplycost * l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2
         |ORDER BY nation ASC, o_year DESC""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q11_important_parts" ->
      s"""WITH $partSuppCte,
         |v AS (
         |  SELECT ps_partkey,
         |         CAST(round(sum(CAST(ps_supplycost AS DECIMAL(28,10))), 2) AS DOUBLE) AS part_value
         |  FROM partsupp
         |  WHERE ps_suppkey IN (SELECT s_suppkey FROM supplier
         |                       JOIN nation ON s_nationkey = n_nationkey
         |                       WHERE n_name = 'NATION_3')
         |  GROUP BY ps_partkey
         |)
         |SELECT ps_partkey, part_value
         |FROM v,
         |  (SELECT CAST(round(sum(CAST(part_value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value FROM v) t
         |WHERE part_value > 0.0005 * total_value
         |ORDER BY part_value DESC, ps_partkey ASC""".stripMargin,

    "q12_ship_speed" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY THEN '3-SLOW'
        |            WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN '2-MEDIUM'
        |            ELSE '1-FAST' END AS ship_speed,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |GROUP BY ship_speed
        |ORDER BY ship_speed""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_diversity" ->
      s"""WITH $partSuppCte
         |SELECT p_brand, p_type, p_size,
         |       count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey AS a_partkey,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*) * 0.5 AS half_avg
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#5'
        |  GROUP BY l_partkey
        |)
        |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) / 7.0, 2) AS avg_yearly,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pa ON l_partkey = a_partkey
        |WHERE p_brand = 'Brand#5' AND l_quantity < half_avg""".stripMargin,

    "q20_excess_shippers" ->
      """WITH hot AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(CASE WHEN year(l_shipdate) = 1996 THEN l_quantity ELSE 0.0 END AS DECIMAL(28,10))) AS DOUBLE) AS qty96,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS qty_all
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_suppkey
        |  HAVING CAST(sum(CAST(CASE WHEN year(l_shipdate) = 1996 THEN l_quantity ELSE 0.0 END AS DECIMAL(28,10))) AS DOUBLE)
        |         > 0.2 * CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE)
        |)
        |SELECT s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM hot)
        |ORDER BY s_name""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"       -> (q1PricingSummary _),
    "q2_min_cost_supplier"     -> (q2MinCostSupplier _),
    "q6_forecast_revenue"      -> (q6ForecastRevenue _),
    "q8_market_share"          -> (q8MarketShare _),
    "q9_product_profit"        -> (q9ProductProfit _),
    "q10_returned_items"       -> (q10ReturnedItems _),
    "q11_important_parts"      -> (q11ImportantParts _),
    "q12_ship_speed"           -> (q12ShipSpeed _),
    "q15_top_supplier"         -> (q15TopSupplier _),
    "q16_supplier_diversity"   -> (q16SupplierDiversity _),
    "q17_small_qty_revenue"    -> (q17SmallQtyRevenue _),
    "q20_excess_shippers"      -> (q20ExcessShippers _),
    "q3_shipping_priority"     -> (q3ShippingPriority _),
    "q4_order_priority"        -> (q4OrderPriority _),
    "q5_local_supplier_volume" -> (q5LocalSupplierVolume _),
    "q7_nation_volume"         -> (q7NationVolume _),
    "q14_promo_revenue"        -> (q14PromoRevenue _),
    "q19_disjunctive_branches" -> (q19DisjunctiveBranches _),
    "q21_only_late_supplier"   -> (q21OnlyLateSupplier _),
    "q_market_basket"          -> (qMarketBasket _),
    "q_skew_report"            -> (qSkewReport _),
    "q_bootstrap_ci"           -> (qBootstrapCi _),
    "q13_order_distribution"   -> (q13OrderDistribution _),
    "q18_large_orders"         -> (q18LargeOrders _),
    "q22_lapsed_customers"     -> (q22LapsedCustomers _),
    "q_rollup_orders"          -> (qRollupOrders _),
    "q_customer_activity"      -> (qCustomerActivity _),
    "q_distinct_counts"        -> (qDistinctCounts _),
    "q_pivot_status"           -> (qPivotStatus _),
    "q_unpivot_status"         -> (qUnpivotStatus _),
    "q_integrity_audit"        -> (qIntegrityAudit _),
    "q_full_outer_reconcile"   -> (qFullOuterReconcile _),
    "q_percentiles"            -> (qPercentiles _),
    "q_set_ops"                -> (qSetOps _),
    "q_correlated_cheapest_order" -> (qCorrelatedCheapestOrder _),
    "q_sketch_bounds"          -> (qSketchBounds _),
    "q_range_join_price_tiers" -> (qRangeJoinPriceTiers _),
    "q_range_join_binned"      -> (qRangeJoinBinned _),
    "q_histogram_equidepth"    -> (qHistogramEquidepth _),
    "q_grouping_sets"          -> (qGroupingSets _),
    "q_merge_upsert"           -> (qMergeUpsert _),
    "q_window_functions"       -> (qWindowFunctions _),
  )
}
