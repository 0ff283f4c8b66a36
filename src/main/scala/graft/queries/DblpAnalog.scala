package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Relational
import graft.sources.Tables

/** The reference's six end-to-end queries (SURVEY.md §2.6), instantiated over
  * the driver star schema via the structural analog pinned in FIXTURES.md §2:
  * publication = orders row, authors = distinct suppliers of the order's
  * lineitems, venue = customer's nation, year = year(o_orderdate),
  * title = orderkey as string.
  *
  * Every query ends in a TOTAL ordering (explicit tiebreaks) so the DuckDB
  * oracle hash-compare is deterministic. Intended semantics are implemented
  * where the reference has split-local or single-reducer bugs (SURVEY.md
  * Q2–Q5); deviations documented per query.
  */
object DblpAnalog {

  /** t1 (reference: Homework2.scala:30-144): per venue, top-10 authors by
    * publication count desc, author asc tiebreak. */
  def t1TopAuthorsPerVenue(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.pubAuthors(spark, dir)
      .join(Tables.pubs(spark, dir).select("pub_key", "venue"), "pub_key")
      .groupBy("venue", "author").agg(count(lit(1)).as("cnt"))
    Relational
      .topKPerGroup(counts, Seq(col("venue")), Seq(col("cnt").desc, col("author").asc), 10)
      .orderBy(col("venue").asc, col("cnt").desc, col("author").asc)
  }

  /** t2 (reference: Homework2.scala:146-228): authors whose longest run of
    * consecutive publication years ≥ 4 (threshold scaled to the analog's
    * 1995–2001 span; reference uses 10 on DBLP's ~80-year span).
    * Gaps-and-islands formulation — no per-author array state (SURVEY Q3:
    * duplicate years deduped = intended semantics). */
  def t2ConsecutiveYears(spark: SparkSession, dir: String): DataFrame = {
    val ay = Tables.pubAuthors(spark, dir)
      .join(Tables.pubs(spark, dir).select("pub_key", "yr"), "pub_key")
      .select("author", "yr")
    Relational.longestRunPerKey(ay, col("author"), col("yr"))
      .toDF("author", "streak")
      .filter(col("streak") >= 4)
      .orderBy(col("streak").desc, col("author").asc)
  }

  /** t3 (reference: Homework2.scala:230-282): per venue, '|'-joined titles of
    * single-author publications. Titles sorted lexicographically for
    * determinism (reference order = shuffle arrival); no leading '|'
    * (reference emits one — documented deviation). */
  def t3SoloTitlesPerVenue(spark: SparkSession, dir: String): DataFrame = {
    val solo = Tables.pubAuthorCounts(spark, dir).filter(col("na") === 1)
    Tables.pubs(spark, dir).select("pub_key", "venue", "title")
      .join(solo, "pub_key")
      .groupBy("venue")
      .agg(Relational.sortedStringAgg(col("title"), "|").as("titles"))
      .orderBy(col("venue").asc)
  }

  /** t4 (reference: Homework2.scala:283-366): per venue, title(s) tied for the
    * max author count. Global arg-max (the reference's is per-mapper-split —
    * SURVEY Q5; this is the intended semantics). */
  def t4MaxAuthorPubsPerVenue(spark: SparkSession, dir: String): DataFrame = {
    val withNa = Tables.pubs(spark, dir).select("pub_key", "venue", "title")
      .join(Tables.pubAuthorCounts(spark, dir), "pub_key")
    Relational.argMaxPerGroup(withNa, Seq(col("venue")), col("na"))
      .select(col("venue"), col("title"), col("na").as("n_authors"))
      .orderBy(col("venue").asc, col("title").asc)
  }

  /** Per-row author-list size attached by a window — ONE evaluation of the
    * pubAuthors distinct instead of the agg-then-self-join shape, which
    * computes the distinct subtree twice (measured ~2× on t5/t6). When fed
    * the `pub_key`-bucketed materialization (Tables.materializePubAuthors),
    * the window's required distribution is already satisfied by the scan —
    * no exchange (plan-asserted in LayoutSpec). */
  private def withNa(pubAuthors: DataFrame): DataFrame =
    pubAuthors.withColumn("na", count(lit(1)).over(Window.partitionBy("pub_key")))

  private def pubAuthorsWithNa(spark: SparkSession, dir: String): DataFrame =
    withNa(Tables.pubAuthors(spark, dir))

  /** t5 (reference: Homework2.scala:368-445): top-100 authors by Σ over their
    * pubs of the pub's author-list size (self included, SURVEY Q6). The
    * reference's top-100 eviction is dead code and it emits all authors
    * (SURVEY Q4); this implements the *intended* limit(100) with a total
    * ordering. */
  def t5TopCoauthorAuthors(spark: SparkSession, dir: String): DataFrame =
    t5TopCoauthorAuthorsFrom(Tables.pubAuthors(spark, dir))

  /** t5 over a caller-supplied (pub_key, author) relation — pass the
    * bucketed materialization to skip the fact-relation exchange. */
  def t5TopCoauthorAuthorsFrom(pubAuthors: DataFrame): DataFrame =
    withNa(pubAuthors)
      .groupBy("author").agg(sum("na").as("weight"))
      .orderBy(col("weight").desc, col("author").asc)
      .limit(100)

  /** t6 (reference: Homework2.scala:447-519): top-100 authors ranked by SOLO
    * publication count (publications whose author list is exactly them).
    * Documented analog deviation: the reference ranks authors who *never*
    * co-authored, but the supplier analog has no such author at sf ≥ 0.01
    * (every supplier shares some order; min maxco = 10 at sf0.01), which
    * made the oracle row vacuously pass on the empty set. Ranking by solo
    * count keeps the solo-authorship semantics AND exercises the gate on
    * real rows. The strict reference predicate lives in
    * [[t6StrictNeverCoauthored]], unit-tested on a planted fixture. */
  def t6TopSoloAuthors(spark: SparkSession, dir: String): DataFrame =
    t6TopSoloAuthorsFrom(Tables.pubAuthors(spark, dir))

  /** t6 over a caller-supplied (pub_key, author) relation (see t5 twin). */
  def t6TopSoloAuthorsFrom(pubAuthors: DataFrame): DataFrame =
    withNa(pubAuthors)
      .groupBy("author")
      .agg(sum(when(col("na") === 1, 1L).otherwise(0L)).as("solo_cnt"))
      .filter(col("solo_cnt") >= 1)
      .orderBy(col("solo_cnt").desc, col("author").asc)
      .limit(100)

  /** The reference's literal t6 predicate: authors whose EVERY publication is
    * solo (never co-authored), ranked by publication count. Empty on the
    * sf ≥ 0.01 analog (see [[t6TopSoloAuthors]]); kept for bit-parity with
    * Homework2.scala:447-519 and exercised by a planted unit fixture. */
  def t6StrictNeverCoauthored(spark: SparkSession, dir: String): DataFrame =
    pubAuthorsWithNa(spark, dir)
      .groupBy("author")
      .agg(count(lit(1)).as("cnt"), max("na").as("maxco"))
      .filter(col("maxco") === 1)
      .select("author", "cnt")
      .orderBy(col("cnt").desc, col("author").asc)
      .limit(100)

  // ---------------------------------------------------------------------------
  // DuckDB oracle SQL — same semantics over the same parquet tables.
  // ---------------------------------------------------------------------------

  /** Shared analog CTEs (must mirror Tables.pubs / pubAuthors / pubAuthorCounts). */
  private val base: String =
    """WITH pub_venue AS (
      |  SELECT o_orderkey AS pub_key, n_name AS venue,
      |         CAST(year(o_orderdate) AS INTEGER) AS yr,
      |         CAST(o_orderkey AS VARCHAR) AS title
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |), pub_author AS (
      |  SELECT DISTINCT l_orderkey AS pub_key, s_name AS author
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |), pub_na AS (
      |  SELECT pub_key, count(*) AS na FROM pub_author GROUP BY pub_key
      |)""".stripMargin

  /** PageRank iterations for [[coauthorPagerank]] — fixed count, so the
    * oracle unrolls the same number of CTE stages. */
  val PagerankIters = 3

  /** Co-author PageRank — iterative graph analytics with EXACT cross-engine
    * parity: importance over the co-author graph (suppliers sharing an
    * order), damping 0.85, uniform 1.0 start, [[PagerankIters]] fixed
    * iterations. Determinism contract: every iteration's rank is rounded
    * to 9 decimals before it feeds the next (double summation order
    * differs across engines only in the last ulps; rounding stops the
    * drift from compounding), final output rounded to 6. Scale shape: one
    * contribution join + one dst-keyed sum per iteration — the same
    * join/agg loop as [[graft.ops.Graph]], bounded by |edges|, no
    * driver-side graph state. Dangling authors hold the 0.15 base. */
  def coauthorPagerank(spark: SparkSession, dir: String): DataFrame = {
    // No pre-distinct on (pub, author): collect_set dedupes within the
    // same aggregation that builds the per-pub author list, saving a full
    // shuffle of the fact relation (edge identity, not multiplicity, is
    // what PageRank consumes — the pair expansion is distinct'd anyway).
    val pa = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("pub"), col("l_suppkey").as("a"))
    // Edge construction: per-pub author list collected once (bounded by
    // authors-per-pub, a handful), UNDIRECTED pairs (y > x) expanded
    // IN-ROW — one aggregation instead of the pa⋈pa self-join's second
    // shuffle, and half the rows through the distinct that the full
    // ordered-pair expansion would push. The symmetric closure is a narrow
    // 2× explode AFTER the distinct, and each edge picks up its source
    // degree from one count-window over the symmetric relation — so edges
    // + degrees materialize in a SINGLE localCheckpoint job (the former
    // sym-then-join-degrees shape paid a second checkpoint; measured
    // ~0.5 s at sf0.1). The graph relations are static across iterations,
    // so they materialize ONCE (the Graph.scala iteration discipline):
    // lazily each iteration's plan would re-run the whole edge
    // construction per reference (measured 3x the query cost at sf0.1).
    val symDeg = pa.groupBy("pub").agg(collect_set(col("a")).as("as_"))
      .select(explode(expr(
        "flatten(transform(as_, x -> transform(filter(as_, y -> y > x), y -> struct(x AS s, y AS d))))"))
        .as("p"))
      .select(col("p.s").as("s"), col("p.d").as("d")).distinct()
      .select(explode(array(
          struct(col("s").as("x"), col("d").as("y")),
          struct(col("d").as("x"), col("s").as("y")))).as("e"))
      .select(col("e.x").as("s"), col("e.y").as("d"))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("s")))
      .localCheckpoint()
    val nodes = pa.select(col("a").as("v")).distinct().localCheckpoint()
    // Iteration engine (broadcast rank vector, DECIMAL in-sums, 9 dp
    // per-round rounding, driver-checked rounded-delta convergence with
    // the PagerankIters bound) lives in [[graft.ops.Graph.pagerankCounted]]
    // — a pre-converged graph exits after one confirming round with output
    // identical to the oracle's full unroll.
    graft.ops.Graph.pagerank(nodes, symDeg, PagerankIters)
      .select(col("v").as("s_suppkey"), round(col("pr"), 6).as("pagerank"))
      .orderBy("s_suppkey")
  }

  /** Minimum co-publication count for an edge to enter the triangle
    * backbone. Exact triangle enumeration is Θ(n³) on a dense graph no
    * matter how cleverly oriented — on TPC-H-shaped co-occurrence data the
    * raw supplier graph approaches a clique, so cohesion analytics run on
    * the STRONG-collaboration backbone (pairs co-publishing ≥ this many
    * times), the standard weight-threshold backboning move. Density now
    * tracks genuine repeated collaboration, not one-off co-occurrence; for
    * corpora where even the backbone stays dense, the documented fallback
    * is DOULION-style edge sparsification (Tsourakakis et al., KDD'09):
    * keep each edge w.p. p, count exactly on the sample, scale by 1/p³. */
  private val TriangleMinWeight = 5

  /** Per-author triangle count over the strong co-author graph — cohesion
    * analytics via [[graft.ops.Graph.trianglesPerNode]]'s degree-oriented
    * enumeration (wedge work bounded by out-degree ≤ O(√m), never a hub's
    * degree²). Undirected a<b edges come from the same in-row pair
    * expansion as [[coauthorPagerank]] (one aggregation, no pa⋈pa self-join
    * shuffle), weight-thresholded per [[TriangleMinWeight]]; the oracle
    * replays the identical backbone, orientation, and joins. */
  /** Strong co-author undirected edges (a < b, weight-thresholded) — the
    * shared backbone of triangles and clustering coefficient: in-row pair
    * expansion from one aggregation, never a pa⋈pa self-join shuffle. */
  private def strongCoauthorEdges(spark: SparkSession, dir: String,
                                  minWeight: Int = TriangleMinWeight): DataFrame = {
    val pa = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("pub"), col("l_suppkey").as("a")).distinct()
    pa.groupBy("pub").agg(collect_list(col("a")).as("as_"))
      .select(explode(expr(
        "flatten(transform(as_, x -> transform(filter(as_, y -> y > x), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minWeight)
      .select(col("a"), col("b"))
  }

  def coauthorTriangles(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.trianglesPerNode(strongCoauthorEdges(spark, dir))
      .select(col("node").as("s_suppkey"), col("n_triangles"))
      .orderBy("s_suppkey")

  /** Local clustering coefficient per author: cc = 2T / (d·(d−1)) over the
    * strong co-author graph — how close each author's collaborators are to
    * a clique (the cohesion signal community detection thresholds on).
    * Triangle counts come from the degree-oriented enumeration
    * ([[graft.ops.Graph.trianglesPerNode]]); the edge list materializes
    * ONCE (localCheckpoint) and feeds both the degree aggregation and the
    * triangle joins. Nodes without triangles report cc = 0 via the left
    * join (absence would silently drop them); degree-1 nodes have no
    * defined coefficient and report 0 by convention on both engines. */
  def coauthorClusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val und = strongCoauthorEdges(spark, dir).localCheckpoint()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("degree"))
    val tri = graft.ops.Graph.trianglesPerNode(und)
    deg.join(tri, deg("n") === tri("node"), "left")
      .select(col("n").as("s_suppkey"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering_coeff",
        when(col("degree") >= 2,
          round(col("n_triangles") * 2.0 / (col("degree") * (col("degree") - 1)), 6))
          .otherwise(0.0))
      .orderBy("s_suppkey")
  }

  /** k-core peel parameters: edges kept at weight ≥ [[KcoreMinWeight]]
    * (calibrated so the sf0.01 co-author graph is sparse — the ≥5 backbone
    * is complete at that SF, where peeling is vacuous), core threshold
    * [[KcoreK]], and a FIXED [[KcoreRounds]] peel rounds — the same
    * fixed-iteration discipline as [[PagerankIters]], so the oracle can
    * unroll identical rounds instead of chasing a fixpoint it can't
    * express. */
  private val KcoreMinWeight = 32
  private val KcoreK = 4
  private val KcoreRounds = 3

  /** k-core decomposition (bounded peel) over the co-author graph: each
    * round removes every author with fewer than k surviving strong
    * co-author links, together with their edges — the standard graph-mining
    * "dense cohesive subgraph" screen (cores survive even after weak
    * collaborators vanish). Scale shape per round: ONE degree aggregation +
    * two LEFT SEMI joins of the edge list against the survivor set — no
    * driver-side graph state; lineage is truncated per round
    * (localCheckpoint) so the plan stays flat across rounds. Output: the
    * authors still present after [[KcoreRounds]] rounds with their
    * remaining degree. */
  def coauthorKcore(spark: SparkSession, dir: String): DataFrame = {
    val pa = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("pub"), col("l_suppkey").as("a")).distinct()
    val und = pa.groupBy("pub").agg(collect_list(col("a")).as("as_"))
      .select(explode(expr(
        "flatten(transform(as_, x -> transform(filter(as_, y -> y > x), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= KcoreMinWeight)
      .select(col("a"), col("b"))
    graft.ops.Graph.kcorePeel(und, KcoreK, KcoreRounds)
      .select(col("n").as("s_suppkey"), col("dg").as("core_degree"))
      .orderBy("s_suppkey")
  }

  /** Neighborhood-overlap (Jaccard) score per strong co-author edge — the
    * classic link-prediction / tie-strength signal: for collaborators (a,b),
    * |N(a)∩N(b)| / |N(a)∪N(b)| over the strong co-author graph. Common
    * neighbors come from [[graft.ops.Graph.trianglesPerEdge]]'s
    * degree-oriented enumeration (each triangle found once, wedge work
    * bounded by out-degree — never a hub's degree² blowup), so the cost is
    * the triangle count, not an adjacency self-join; degrees and the edge
    * list share one materialized backbone. Edges with no common neighbor
    * report 0 via the left join (absence would silently drop them).
    * |N(a)∪N(b)| = d(a)+d(b)−cn because b∈N(a) and a∈N(b) are each in one
    * set only, and cn is double-counted once.
    *
    * Backbone weight [[JaccardMinWeight]] is HIGHER than the triangle
    * queries' [[TriangleMinWeight]]: at sf0.01 the ≥5 graph is complete
    * (every edge scores the same 0.98 — a vacuous gate), the ≥30 graph is
    * sparse with scores spread over [0, 0.32]. */
  def coauthorNeighborJaccard(spark: SparkSession, dir: String): DataFrame = {
    val und = strongCoauthorEdges(spark, dir, JaccardMinWeight).localCheckpoint()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val cn = graft.ops.Graph.trianglesPerEdge(und)
    und
      .join(deg.select(col("n").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("db")), "b")
      .join(cn, Seq("a", "b"), "left")
      .select(col("a").as("s1"), col("b").as("s2"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)) /
          (col("da") + col("db") - coalesce(col("n_common"), lit(0L))), 6)
          .as("jaccard"))
      .orderBy("s1", "s2")
  }

  /** Local bridges — Granovetter's weak ties: strong co-author edges whose
    * endpoints share NO other collaborator (zero common neighbors ⇔ the
    * edge lies in no triangle ⇔ removing it lengthens the endpoint
    * distance beyond 2). The structurally critical links information
    * actually flows across; reuses [[graft.ops.Graph.trianglesPerEdge]] as
    * an ANTI join (edges absent from the per-edge triangle counts), so the
    * cost is the triangle enumeration already bounded by out-degree.
    * Runs on the sparse [[JaccardMinWeight]] backbone — on the complete
    * weight-5 graph every edge closes a triangle and the result is empty. */
  def coauthorLocalBridges(spark: SparkSession, dir: String): DataFrame = {
    val und = strongCoauthorEdges(spark, dir, JaccardMinWeight).localCheckpoint()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val cn = graft.ops.Graph.trianglesPerEdge(und)
    und.join(cn, Seq("a", "b"), "left_anti")
      .join(deg.select(col("n").as("a"), col("dg").as("deg_a")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("deg_b")), "b")
      .select(col("a").as("s1"), col("b").as("s2"), col("deg_a"), col("deg_b"))
      .orderBy("s1", "s2")
  }

  /** Backbone weight for [[coauthorCommunities]]: at 30 the sf0.01 backbone
    * is one giant component (a vacuous single-label gate); 35 fragments it
    * into 9 communities of varied size — the regime the operator exists
    * for. */
  private val CommunityMinWeight = 35

  /** Collaboration communities — connected components over the SPARSE
    * strong-collaboration backbone ([[CommunityMinWeight]]): each author
    * maps to their community (component min id) with its size. The
    * distributed hash-min propagation of
    * [[graft.ops.Graph.connectedComponents]] (one join + one min-agg per
    * round, label-sum convergence); the same operator family as dedup
    * clustering, applied as GRAPH analytics — "who forms a collaboration
    * circle" rather than "which docs are one document". Authors outside
    * any strong edge are absent (they have no community under this
    * backbone). */
  def coauthorCommunities(spark: SparkSession, dir: String): DataFrame = {
    val und = strongCoauthorEdges(spark, dir, CommunityMinWeight)
    val comp = graft.ops.Graph.connectedComponents(und, "a", "b")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("community_size"))
    comp.join(sizes, "component")
      .select(col("node").as("s_suppkey"), col("component").as("community_id"),
        col("community_size"))
      .orderBy("s_suppkey")
  }

  /** Hop bound / deterministic seed rule for [[coauthorBfsHops]]. */
  private val BfsMaxHops = 4
  private val BfsSeedMod = 25

  /** Collaboration distance — multi-source bounded BFS over the strong
    * backbone ([[JaccardMinWeight]]): every author's min hop count from
    * the seed set (authors with id ≡ 0 mod [[BfsSeedMod]] — the
    * deterministic stand-in for "known-contaminated sources" /
    * "anchor authors"). The [[graft.ops.Graph.bfsHops]] level-synchronous
    * frontier expansion: per round one frontier⋈edges equi-join + one
    * visited anti-join, early exit on an empty frontier, [[BfsMaxHops]]
    * as the bound the recursive-CTE oracle unrolls to. Unreached authors
    * are absent (distance ∞). */
  def coauthorBfsHops(spark: SparkSession, dir: String): DataFrame = {
    val und = strongCoauthorEdges(spark, dir, JaccardMinWeight).localCheckpoint()
    val nodes = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n"))).distinct()
    val seeds = nodes.filter(col("n") % BfsSeedMod === 0)
    graft.ops.Graph.bfsHops(und, seeds, BfsMaxHops)
      .select(col("n").as("s_suppkey"), col("hops").cast("int").as("hops"))
      .orderBy("s_suppkey")
  }

  private def bfsHopsOracle: String =
    s"""${coauthorGraphSqlAt(JaccardMinWeight).replaceFirst("^WITH ", "WITH RECURSIVE ")}
      |, sym AS (SELECT a AS s, b AS d FROM und UNION ALL SELECT b AS s, a AS d FROM und),
      |seeds AS (SELECT DISTINCT n FROM deg WHERE n % $BfsSeedMod = 0),
      |r AS (
      |  SELECT n, 0 AS hops FROM seeds
      |  UNION
      |  SELECT sym.d AS n, r.hops + 1 AS hops
      |  FROM r JOIN sym ON sym.s = r.n
      |  WHERE r.hops < $BfsMaxHops
      |)
      |SELECT n AS s_suppkey, CAST(min(hops) AS INTEGER) AS hops
      |FROM r GROUP BY n ORDER BY s_suppkey""".stripMargin

  private def communitiesOracle: String =
    s"""${coauthorGraphSqlAt(CommunityMinWeight).replaceFirst("^WITH ", "WITH RECURSIVE ")}
      |, gedges AS (
      |  SELECT a AS n, b AS m FROM und
      |  UNION SELECT b, a FROM und
      |), reach AS (
      |  SELECT n AS node, n AS lbl FROM gedges
      |  UNION
      |  SELECT e.m AS node, r.lbl FROM reach r JOIN gedges e ON e.n = r.node
      |), comp AS (SELECT node, min(lbl) AS community_id FROM reach GROUP BY node),
      |sizes AS (SELECT community_id, count(*) AS community_size FROM comp GROUP BY community_id)
      |SELECT node AS s_suppkey, comp.community_id, community_size
      |FROM comp JOIN sizes ON comp.community_id = sizes.community_id
      |ORDER BY s_suppkey""".stripMargin

  private def localBridgesOracle: String =
    s"""${coauthorGraphSqlAt(JaccardMinWeight)}
      |, ecn AS (
      |  SELECT least(x, y) AS a, greatest(x, y) AS b
      |  FROM (
      |    SELECT u AS x, v AS y FROM tri
      |    UNION ALL SELECT u AS x, w AS y FROM tri
      |    UNION ALL SELECT v AS x, w AS y FROM tri
      |  )
      |  GROUP BY least(x, y), greatest(x, y)
      |)
      |SELECT und.a AS s1, und.b AS s2, da.dg AS deg_a, db.dg AS deg_b
      |FROM und
      |JOIN deg da ON und.a = da.n
      |JOIN deg db ON und.b = db.n
      |LEFT JOIN ecn ON und.a = ecn.a AND und.b = ecn.b
      |WHERE ecn.a IS NULL
      |ORDER BY s1, s2""".stripMargin

  private val kcoreOracle: String = {
    val rounds = (1 to KcoreRounds).map { r =>
      s"""d$r AS (
         |  SELECT n, count(*) AS dg
         |  FROM (SELECT a AS n FROM e${r - 1} UNION ALL SELECT b AS n FROM e${r - 1})
         |  GROUP BY n
         |),
         |k$r AS (SELECT n FROM d$r WHERE dg >= $KcoreK),
         |e$r AS (
         |  SELECT a, b FROM e${r - 1}
         |  WHERE a IN (SELECT n FROM k$r) AND b IN (SELECT n FROM k$r)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pa AS (SELECT DISTINCT l_orderkey AS pub, l_suppkey AS a FROM lineitem),
       |e0 AS (
       |  SELECT x.a AS a, y.a AS b
       |  FROM pa x JOIN pa y ON x.pub = y.pub AND x.a < y.a
       |  GROUP BY x.a, y.a HAVING count(*) >= $KcoreMinWeight
       |),
       |$rounds
       |SELECT n AS s_suppkey, count(*) AS core_degree
       |FROM (SELECT a AS n FROM e$KcoreRounds UNION ALL SELECT b AS n FROM e$KcoreRounds)
       |GROUP BY n ORDER BY s_suppkey""".stripMargin
  }

  /** Strong-edge backbone weight for [[coauthorNeighborJaccard]] — see its
    * Scaladoc for why it differs from [[TriangleMinWeight]]. */
  private val JaccardMinWeight = 30

  /** Shared triangle-enumeration SQL (pa → und → deg → oriented → tri) —
    * consumed by the triangles, clustering-coefficient, and neighborhood-
    * Jaccard oracles (the latter at a different backbone weight). */
  private def coauthorGraphSqlAt(minWeight: Int): String =
    s"""WITH pa AS (SELECT DISTINCT l_orderkey AS pub, l_suppkey AS a FROM lineitem),
      |und AS (
      |  SELECT x.a AS a, y.a AS b
      |  FROM pa x JOIN pa y ON x.pub = y.pub AND x.a < y.a
      |  GROUP BY x.a, y.a HAVING count(*) >= $minWeight
      |),
      |deg AS (
      |  SELECT n, count(*) AS dg
      |  FROM (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
      |  GROUP BY n
      |),
      |o AS (
      |  SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b) THEN a ELSE b END AS src,
      |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b) THEN b ELSE a END AS dst,
      |         CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND a < b) THEN db.dg ELSE da.dg END AS dst_dg
      |  FROM und JOIN deg da ON und.a = da.n JOIN deg db ON und.b = db.n
      |),
      |tri AS (
      |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
      |  FROM o e1
      |  JOIN o e2 ON e1.src = e2.src
      |   AND (e1.dst_dg < e2.dst_dg OR (e1.dst_dg = e2.dst_dg AND e1.dst < e2.dst))
      |  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
      |)""".stripMargin

  private val trianglesOracle: String =
    s"""${coauthorGraphSqlAt(TriangleMinWeight)}
      |SELECT n AS s_suppkey, count(*) AS n_triangles
      |FROM (SELECT u AS n FROM tri UNION ALL SELECT v AS n FROM tri
      |      UNION ALL SELECT w AS n FROM tri)
      |GROUP BY n ORDER BY s_suppkey""".stripMargin

  private val clusteringCoeffOracle: String =
    s"""${coauthorGraphSqlAt(TriangleMinWeight)}
      |, tcnt AS (
      |  SELECT n, count(*) AS c
      |  FROM (SELECT u AS n FROM tri UNION ALL SELECT v AS n FROM tri
      |        UNION ALL SELECT w AS n FROM tri)
      |  GROUP BY n
      |)
      |SELECT deg.n AS s_suppkey, deg.dg AS degree,
      |       coalesce(tcnt.c, 0) AS n_triangles,
      |       CASE WHEN deg.dg >= 2
      |            THEN round(coalesce(tcnt.c, 0) * 2.0 / (deg.dg * (deg.dg - 1)), 6)
      |            ELSE 0.0 END AS clustering_coeff
      |FROM deg LEFT JOIN tcnt ON deg.n = tcnt.n
      |ORDER BY s_suppkey""".stripMargin

  private def neighborJaccardOracle: String =
    s"""${coauthorGraphSqlAt(JaccardMinWeight)}
      |, ecn AS (
      |  SELECT least(x, y) AS a, greatest(x, y) AS b, count(*) AS n_common
      |  FROM (
      |    SELECT u AS x, v AS y FROM tri
      |    UNION ALL SELECT u AS x, w AS y FROM tri
      |    UNION ALL SELECT v AS x, w AS y FROM tri
      |  )
      |  GROUP BY least(x, y), greatest(x, y)
      |)
      |SELECT und.a AS s1, und.b AS s2,
      |       coalesce(ecn.n_common, 0) AS n_common,
      |       round(coalesce(ecn.n_common, 0) * 1.0 /
      |             (da.dg + db.dg - coalesce(ecn.n_common, 0)), 6) AS jaccard
      |FROM und
      |JOIN deg da ON und.a = da.n
      |JOIN deg db ON und.b = db.n
      |LEFT JOIN ecn ON und.a = ecn.a AND und.b = ecn.b
      |ORDER BY s1, s2""".stripMargin

  private def pagerankOracle: String = {
    val iters = (1 to PagerankIters).map { k =>
      s"""p$k AS (
         |  SELECT n.v, round(0.15 + 0.85 * coalesce(CAST(
         |           sum(CAST(p.pr / dg.deg AS DECIMAL(38,18))) AS DOUBLE), 0), 9) AS pr
         |  FROM nodes n
         |  LEFT JOIN pairs e ON e.d = n.v
         |  LEFT JOIN p${k - 1} p ON p.v = e.s
         |  LEFT JOIN deg dg ON dg.s = e.s
         |  GROUP BY n.v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pa AS (SELECT DISTINCT l_orderkey AS pub, l_suppkey AS a FROM lineitem),
       |pairs AS (
       |  SELECT DISTINCT x.a AS s, y.a AS d
       |  FROM pa x JOIN pa y ON x.pub = y.pub AND x.a <> y.a
       |),
       |deg AS (SELECT s, count(*) AS deg FROM pairs GROUP BY s),
       |nodes AS (SELECT DISTINCT a AS v FROM pa),
       |p0 AS (SELECT v, CAST(1.0 AS DOUBLE) AS pr FROM nodes),
       |$iters
       |SELECT v AS s_suppkey, round(pr, 6) AS pagerank
       |FROM p$PagerankIters ORDER BY s_suppkey""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "coauthor_pagerank" -> pagerankOracle,
    "coauthor_triangles" -> trianglesOracle,
    "coauthor_kcore" -> kcoreOracle,
    "coauthor_clustering_coeff" -> clusteringCoeffOracle,
    "coauthor_neighbor_jaccard" -> neighborJaccardOracle,
    "coauthor_local_bridges" -> localBridgesOracle,
    "coauthor_communities" -> communitiesOracle,
    "coauthor_bfs_hops" -> bfsHopsOracle,
    "t1_top10_authors_per_venue" ->
      s"""$base
         |, va AS (
         |  SELECT v.venue, a.author, count(*) AS cnt
         |  FROM pub_author a JOIN pub_venue v USING (pub_key)
         |  GROUP BY v.venue, a.author
         |)
         |SELECT venue, author, cnt FROM (
         |  SELECT venue, author, cnt,
         |         row_number() OVER (PARTITION BY venue ORDER BY cnt DESC, author) AS rk
         |  FROM va
         |) WHERE rk <= 10
         |ORDER BY venue ASC, cnt DESC, author ASC""".stripMargin,

    "t2_consecutive_years" ->
      s"""$base
         |, ay AS (
         |  SELECT DISTINCT a.author, v.yr
         |  FROM pub_author a JOIN pub_venue v USING (pub_key)
         |), runs AS (
         |  SELECT author, yr - row_number() OVER (PARTITION BY author ORDER BY yr) AS island
         |  FROM ay
         |), islands AS (
         |  SELECT author, count(*) AS len FROM runs GROUP BY author, island
         |)
         |SELECT author, max(len) AS streak FROM islands GROUP BY author
         |HAVING max(len) >= 4
         |ORDER BY streak DESC, author ASC""".stripMargin,

    "t3_solo_titles_per_venue" ->
      s"""$base
         |SELECT v.venue, string_agg(v.title, '|' ORDER BY v.title) AS titles
         |FROM pub_venue v JOIN pub_na n USING (pub_key)
         |WHERE n.na = 1
         |GROUP BY v.venue
         |ORDER BY v.venue ASC""".stripMargin,

    "t4_max_author_pubs_per_venue" ->
      s"""$base
         |, ranked AS (
         |  SELECT v.venue, v.title, n.na,
         |         rank() OVER (PARTITION BY v.venue ORDER BY n.na DESC) AS rk
         |  FROM pub_venue v JOIN pub_na n USING (pub_key)
         |)
         |SELECT venue, title, na AS n_authors FROM ranked WHERE rk = 1
         |ORDER BY venue ASC, title ASC""".stripMargin,

    "t5_top_coauthor_authors" ->
      s"""$base
         |SELECT a.author, CAST(sum(n.na) AS BIGINT) AS weight
         |FROM pub_author a JOIN pub_na n USING (pub_key)
         |GROUP BY a.author
         |ORDER BY weight DESC, author ASC
         |LIMIT 100""".stripMargin,

    "t6_top100_solo_authors" ->
      s"""$base
         |, stats AS (
         |  SELECT a.author,
         |         CAST(sum(CASE WHEN n.na = 1 THEN 1 ELSE 0 END) AS BIGINT) AS solo_cnt
         |  FROM pub_author a JOIN pub_na n USING (pub_key)
         |  GROUP BY a.author
         |)
         |SELECT author, solo_cnt FROM stats WHERE solo_cnt >= 1
         |ORDER BY solo_cnt DESC, author ASC
         |LIMIT 100""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_top10_authors_per_venue"   -> (t1TopAuthorsPerVenue _),
    "t2_consecutive_years"         -> (t2ConsecutiveYears _),
    "t3_solo_titles_per_venue"     -> (t3SoloTitlesPerVenue _),
    "t4_max_author_pubs_per_venue" -> (t4MaxAuthorPubsPerVenue _),
    "t5_top_coauthor_authors"      -> (t5TopCoauthorAuthors _),
    "t6_top100_solo_authors"       -> (t6TopSoloAuthors _),
    "coauthor_pagerank"            -> (coauthorPagerank _),
    "coauthor_triangles"           -> (coauthorTriangles _),
    "coauthor_clustering_coeff"    -> (coauthorClusteringCoeff _),
    "coauthor_kcore"               -> (coauthorKcore _),
    "coauthor_neighbor_jaccard"    -> (coauthorNeighborJaccard _),
    "coauthor_local_bridges"       -> (coauthorLocalBridges _),
    "coauthor_communities"         -> (coauthorCommunities _),
    "coauthor_bfs_hops"            -> (coauthorBfsHops _),
  )
}
