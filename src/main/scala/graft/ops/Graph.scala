package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph operators needed by the dedup pipeline. A near-dup
  * detector (MinHash/SimHash/embedding LSH) emits PAIRS; turning pairs into
  * deduplicated output requires grouping them into clusters and electing one
  * canonical document per cluster — i.e. connected components over the pair
  * graph. The reference has nothing like this (single-relation MapReduce);
  * this is part of the north-star training-data surface.
  */
object Graph {

  /** Connected components by iterative hash-min label propagation: every
    * node starts labeled with itself; each round every node takes the min
    * label across itself and its neighbors; at the fixpoint each node holds
    * the min node id of its component.
    *
    * Scale shape: each round is one equi-join (edges ⋈ labels, hash
    * exchange on the node id) plus one min-aggregation — no driver-side
    * graph state, no collect. Rounds needed = graph diameter; near-dup
    * clusters are band-bucket cliques with tiny diameter, so 2–3 rounds
    * close in practice (`maxIter` bounds the adversarial case; for
    * planet-scale graphs with long chains the alternating large-star/
    * small-star scheme of Kiveris et al., "Connected Components in
    * MapReduce and Beyond" (SoCC'14), converges in O(log² n) rounds over
    * the same join/agg primitives). Convergence is detected from the SUM of
    * labels: propagation is monotone non-increasing per node, so an
    * unchanged sum ⟺ fixpoint — one scalar aggregate per round instead of
    * a change-detection join. `localCheckpoint` truncates the lineage each
    * round so the plan does not grow with the iteration count.
    *
    * @param edges undirected edge list; each row one edge.
    * @return (`node`, `component`) — component = min node id reachable.
    */
  /** Symmetric, self-loop-free, materialized edge relation (`n`, `m`). */
  private def symmetrize(edges: DataFrame, src: String, dst: String): DataFrame = {
    // Materialize the (possibly expensive) edge pipeline before the
    // both-directions union reads it twice.
    val e0 = edges.select(col(src).as("n"), col(dst).as("m")).localCheckpoint()
    e0.union(e0.select(col("m").as("n"), col("n").as("m")))
      .filter(col("n") =!= col("m")).distinct().localCheckpoint()
  }

  def connectedComponents(edges: DataFrame, src: String = "src",
                          dst: String = "dst", maxIter: Int = 20): DataFrame =
    connectedComponentsWithStrategy(edges, src, dst, maxIter)._1

  /** Hash-min rounds before the frontier probe may fire. */
  private val StarSwitchWarmup = 3
  /** A round whose changed-label count shrinks by less than this factor is
    * a STALLED round — the signature of a chain-shaped graph, where the
    * min label crawls one hop per round and the frontier stays flat
    * instead of collapsing geometrically. */
  private val StarSwitchRatio = 0.7
  /** Consecutive stalled rounds before cutting over to the stars scheme. */
  private val StarSwitchPatience = 2

  /** [[connectedComponents]] plus WHICH strategy produced the labels —
    * `"hashmin"`, `"stars-adaptive"` (the frontier probe fired), or
    * `"stars-budget"` (maxIter exhausted first). The probe makes the
    * hash-min→stars cutover ADAPTIVE, removing the topology judgment call
    * from callers: each round counts how many labels improved (an exact
    * fixpoint test — zero changed IS convergence), and when that frontier
    * stops shrinking geometrically for [[StarSwitchPatience]] consecutive
    * post-warmup rounds, the graph is diameter-bound and the
    * diameter-independent alternating-star scheme takes over immediately
    * instead of burning the remaining budget one hop at a time.
    * `starsFirst` on [[clusterAssign]] survives as an explicit override
    * for KNOWN chain topologies, skipping even the probe rounds.
    * Mid-propagation labels are WRONG (one true component reads as
    * several), so a non-converged label map is never returned — both
    * fallback paths rerun from the symmetric edge set and return the
    * stars fixpoint. */
  private[graft] def connectedComponentsWithStrategy(
      edges: DataFrame, src: String = "src", dst: String = "dst",
      maxIter: Int = 20): (DataFrame, String) = {
    val sym = symmetrize(edges, src, dst)
    var labels = sym.select(col("n").as("node")).distinct()
      .withColumn("component", col("node")).localCheckpoint()
    var it = 0
    var converged = false
    var bail = false
    var stall = 0
    var prevChanged = -1L
    while (!converged && !bail && it < maxIter) {
      val prop = sym.join(labels, sym("n") === labels("node"))
        .select(col("m").as("node"), col("component"))
      // LAZY checkpoint: the frontier count below is the materializing
      // action, so each round costs ONE execution instead of two
      val next = labels.unionByName(prop)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint(false)
      // exact frontier: labels only ever decrease, so "improved this
      // round" counts the active frontier and 0 IS the fixpoint
      val changed = next
        .join(labels.select(col("node"), col("component").as("prev")), "node")
        .filter(col("component") < col("prev")).count()
      converged = changed == 0
      if (!converged) {
        if (prevChanged > 0 && changed.toDouble > StarSwitchRatio * prevChanged)
          stall += 1
        else stall = 0
        bail = it + 1 >= StarSwitchWarmup && stall >= StarSwitchPatience
      }
      prevChanged = changed
      labels = next
      it += 1
    }
    if (converged) (labels, "hashmin")
    else (connectedComponentsStars(sym),
      if (bail) "stars-adaptive" else "stars-budget")
  }

  /** Round budget for [[connectedComponentsStars]]. The alternating
    * algorithm provably converges in O(log² n) rounds and empirically in
    * O(log n); 100 covers any graph that fits on hardware (log₂²(10¹²) has
    * already collapsed every real topology far earlier). */
  private val StarMaxRounds = 100

  /** Connected components by the ALTERNATING LARGE-STAR / SMALL-STAR scheme
    * of Kiveris et al., "Connected Components in MapReduce and Beyond"
    * (SoCC'14) — the diameter-independent fallback [[connectedComponents]]
    * switches to when hash-min exhausts `maxIter`: propagation rounds scale
    * with O(log² n), not graph diameter, so a 10⁹-node chain converges in
    * tens of rounds where hash-min needs 10⁹.
    *
    * Each round is two star operations over the evolving edge set, built
    * from the same join/agg primitives as the rest of the engine (one
    * neighbor aggregation + one equi-join each — no driver-side graph
    * state):
    *  - LARGE-STAR at every node u: link each strictly-larger neighbor to
    *    m = min(Γ(u) ∪ {u});
    *  - SMALL-STAR at every node u: link u and each smaller neighbor to
    *    the minimum of the smaller neighborhood.
    * Both preserve connectivity and never raise a node's reachable min; the
    * fixpoint is one star per component centered at its minimum node, read
    * off directly as the label map. Convergence is detected exactly (count
    * + anti-join emptiness of the canonical edge set — set semantics, no
    * hash-collision risk); a non-converged exit still throws rather than
    * returning partial labels.
    *
    * @param sym symmetric edge list (`n`, `m`), self-loops removed.
    * @return (`node`, `component`) for every node incident to an edge.
    */
  private[graft] def connectedComponentsStars(sym: DataFrame): DataFrame = {
    def neighborhoods(e: DataFrame): DataFrame =
      e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
    // large-star: m = min(Γ(u) ∪ {u}) ≤ u < v, so output stays canonical a<b
    def largeStar(e: DataFrame): DataFrame = {
      val nb = neighborhoods(e)
      val mins = nb.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      nb.join(mins, "u").filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .distinct()
    }
    // small-star: center u links its smaller neighborhood (and itself) to
    // that neighborhood's min; m < every emitted partner, canonical again
    def smallStar(e: DataFrame): DataFrame = {
      val small = neighborhoods(e).filter(col("v") < col("u"))
      val mins = small.groupBy("u").agg(min("v").as("m"))
      small.join(mins, "u").filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(mins.select(col("m").as("a"), col("u").as("b")))
        .distinct()
    }
    var e = sym.filter(col("n") < col("m"))
      .select(col("n").as("a"), col("m").as("b")).distinct().localCheckpoint()
    var eCount = e.count()
    var it = 0
    var converged = false
    while (!converged && it < StarMaxRounds) {
      // LAZY checkpoint fused with the cardinality probe (one execution
      // per round), and the PREVIOUS round's count is remembered instead
      // of recounted — the star rounds only ever rewrite the edge set,
      // so e's count is exactly last round's next.count()
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextCount = next.count()
      // exact set equality: equal cardinality + empty difference
      converged = nextCount == eCount && next.except(e).isEmpty
      e = next
      eCount = nextCount
      it += 1
    }
    if (!converged) throw new IllegalStateException(
      s"alternating-star connected components did not converge within " +
        s"$StarMaxRounds rounds — this exceeds the O(log² n) bound and " +
        "indicates a non-graph input (e.g. unstable ids)")
    // fixpoint: one star per component, centered at the component minimum
    e.select(col("b").as("node"), col("a").as("component"))
      .union(e.select(col("a").as("node"), col("a").as("component")).distinct())
  }

  /** Cluster assignment over a universe of items: every item gets the
    * component id of its pair-graph component (itself when unpaired), the
    * component size, and a canonical flag (the min-id member). One left
    * join + one size aggregation on top of [[connectedComponents]].
    *
    * @param items one row per item; `id` names its key column.
    * @param pairs duplicate pairs over those ids (columns `srcCol`,`dstCol`).
    */
  /** @param starsFirst skip hash-min and run the alternating-star scheme
    *                    directly — the right call when the pair graph is
    *                    KNOWN to carry long chains (e.g. perceptual-hash
    *                    shift chains), where hash-min burns its full
    *                    diameter budget before falling back anyway. */
  def clusterAssign(items: DataFrame, id: String, pairs: DataFrame,
                    srcCol: String, dstCol: String,
                    starsFirst: Boolean = false): DataFrame = {
    val comp =
      if (starsFirst) connectedComponentsStars(symmetrize(pairs, srcCol, dstCol))
      else connectedComponents(pairs, srcCol, dstCol)
    // two lazy consumers (size agg + the final join) — deliberately NOT
    // checkpointed: the size agg groups on the join's own output key, so
    // ReuseExchange serves both consumers from one computation, and an
    // eager checkpoint here measured ~25% SLOWER at sf0.1
    val assigned = items.select(col(id))
      .join(comp.withColumnRenamed("node", id), Seq(id), "left")
      .select(col(id), coalesce(col("component"), col(id)).as("cluster_id"))
    val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id")
      .select(col(id), col("cluster_id"), col("cluster_size"),
        (col(id) === col("cluster_id")).as("is_canonical"))
  }

  /** Bounded k-core peel: `rounds` iterations of "drop every node with
    * fewer than k surviving neighbors, and its edges". A FIXED round count
    * (not a fixpoint chase) keeps the computation oracle-unrollable and the
    * cost predictable; callers needing the true core raise `rounds` until
    * the result is stable (each round strictly shrinks the edge set or the
    * process has converged). Scale shape per round: one degree aggregation
    * + two LEFT SEMI joins of the edge list against the survivor set — no
    * driver-side graph state; localCheckpoint keeps the plan flat across
    * rounds.
    *
    * @param edges undirected edges, one row per edge, columns `a`, `b`.
    * @return (`n`, `dg`) — surviving nodes with their remaining degree.
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame =
    kcorePeelCounted(edges, k, rounds)._1

  /** [[kcorePeel]] with the executed round count, for convergence specs.
    * Early exit: a round can only REMOVE edges, so an unchanged edge count
    * means an unchanged edge SET (subset + equal cardinality), every node
    * already has k surviving neighbors, and all remaining rounds are
    * idempotent — the result is identical to running the full unroll (the
    * oracle's fixed CTE stages), minus the wasted jobs. The per-round
    * driver check is one count() on the already-checkpointed edge list. */
  private[graft] def kcorePeelCounted(edges: DataFrame, k: Int,
                                      rounds: Int): (DataFrame, Int) = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
    var und = edges.select(col("a"), col("b")).localCheckpoint()
    var prevEdges = und.count()
    var it = 0
    var converged = false
    while (it < rounds && !converged) {
      val keep = degrees(und).filter(col("dg") >= k).select("n")
      // lazy: the convergence count below (skipped only on the final
      // round, whose consumer then materializes) is the one execution
      val next = und
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .localCheckpoint(false)
      it += 1
      if (it < rounds) { // final round's fixpoint answer is never consumed
        val cur = next.count()
        converged = cur == prevEdges
        prevEdges = cur
      }
      und = next
    }
    (degrees(und), it)
  }

  /** Damped PageRank over a prepared symmetric edge list — the iteration
    * engine behind `coauthor_pagerank`, with driver-checked convergence:
    * after each round, one short-circuit count compares the ROUNDED (9 dp)
    * rank vector to the previous round's; zero changed rows means the
    * iteration hit a fixpoint of the rounded map, every further round is
    * idempotent, and the loop exits with results identical to the full
    * `maxIters` unroll (what the oracle computes). Rounding BEFORE the
    * comparison keeps the exit decision deterministic and engine-portable
    * — no float last-ulp flapping in the convergence test itself.
    *
    * Scale shape per round: rank state is |nodes| rows against |edges| ≫
    * |nodes|, so the rank vector broadcasts into the static edge relation
    * (map-side join + partial agg) — edges never re-shuffle. In-sums
    * accumulate as DECIMAL(38,18) (exact, order-independent) before the
    * 9 dp round; see `coauthor_pagerank` for why. For graphs whose node
    * state outgrows broadcast, drop the hints and pre-partition edges and
    * ranks on the source key.
    *
    * @param nodes  (`v`) node universe, materialized.
    * @param symDeg (`s`, `d`, `deg`) symmetric edges with source degree,
    *               materialized.
    * @return ((`v`, `pr`), roundsExecuted)
    */
  /** Below this budget the checked loop cannot win: each convergence
    * probe costs a checkpoint + count job, and with ≤ this many rounds
    * the probes can skip at most (budget − 1) iterations — measured at
    * sf0.1 the probed 3-round loop pays ~0.5 s over the lazy unroll
    * (Catalyst fuses the whole unrolled chain into ONE job against the
    * checkpointed edge relation). Larger budgets amortize: one probe can
    * skip many rounds. */
  private val PagerankProbeMinBudget = 4

  private[graft] def pagerankCounted(nodes: DataFrame, symDeg: DataFrame,
                                     maxIters: Int): (DataFrame, Int) = {
    import org.apache.spark.sql.types.DecimalType
    def step(pr: DataFrame): DataFrame = {
      val contrib = symDeg.join(broadcast(pr), col("s") === col("v"))
        .select(col("d"),
          (col("pr") / col("deg")).cast(DecimalType(38, 18)).as("c"))
        .groupBy("d").agg(sum("c").cast("double").as("in"))
      nodes.join(broadcast(contrib), nodes("v") === contrib("d"), "left")
        .select(col("v"),
          round(lit(0.15) + lit(0.85) * coalesce(col("in"), lit(0.0)), 9).as("pr"))
    }
    if (maxIters < PagerankProbeMinBudget) {
      // tiny fixed budget: lazy unroll, zero per-round jobs
      var pr = nodes.withColumn("pr", lit(1.0))
      for (_ <- 1 to maxIters) pr = step(pr)
      (pr, maxIters)
    } else {
      var pr = nodes.withColumn("pr", lit(1.0)).localCheckpoint()
      var it = 0
      var converged = false
      while (it < maxIters && !converged) {
        val next = step(pr).localCheckpoint()
        it += 1
        // The delta check exists only to SKIP later rounds — on the final
        // budgeted round its answer changes nothing, so don't pay the job.
        if (it < maxIters) {
          val changed = next
            .join(pr.withColumnRenamed("pr", "prev"), "v")
            .filter(col("pr") =!= col("prev"))
            .limit(1).count() // short-circuits at the first changed row
          converged = changed == 0L
        }
        pr = next
      }
      (pr, it)
    }
  }

  def pagerank(nodes: DataFrame, symDeg: DataFrame, maxIters: Int): DataFrame =
    pagerankCounted(nodes, symDeg, maxIters)._1

  /** Multi-source BOUNDED BFS — min-hop distance from a seed set (the
    * "collaboration distance" / contamination-blast-radius query): level-
    * synchronous frontier expansion, each round one equi-join of the
    * CURRENT FRONTIER (not the whole distance table) against the static
    * symmetric edge list plus one anti-join to drop already-visited nodes.
    * Work per round is O(frontier × degree) — the textbook distributed BFS
    * shape — and the loop exits EARLY the first time a frontier comes back
    * empty (every reachable node within the bound is final; further rounds
    * are no-ops), with `maxHops` bounding the adversarial long-chain case.
    * The oracle is a recursive CTE with UNION (set) semantics, which
    * collapses walk multiplicity exactly like the `distinct` here.
    *
    * @param und   undirected edges (`a`, `b`).
    * @param seeds (`n`) seed nodes, hop 0.
    * @return (`n`, `hops`) — min hops from any seed, hops ≤ maxHops.
    */
  def bfsHops(und: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame =
    bfsHopsCounted(und, seeds, maxHops)._1

  /** [[bfsHops]] with the executed round count, for convergence specs. */
  private[graft] def bfsHopsCounted(und: DataFrame, seeds: DataFrame,
                                    maxHops: Int): (DataFrame, Int) = {
    val e0 = und.select(col("a").as("s"), col("b").as("d")).localCheckpoint()
    val sym = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      .localCheckpoint()
    var dist = seeds.select(col("n"), lit(0).as("hops")).localCheckpoint()
    var frontier = dist.select("n")
    var hop = 0
    var done = false
    while (hop < maxHops && !done) {
      hop += 1
      val next = frontier.join(sym, frontier("n") === sym("s"))
        .select(col("d").as("n")).distinct()
        .join(dist, Seq("n"), "left_anti")
        .withColumn("hops", lit(hop))
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        dist = dist.unionByName(next).localCheckpoint()
        frontier = next.select("n")
      }
    }
    (dist, hop)
  }

  /** Per-node triangle count by DEGREE-ORIENTED enumeration — the trick
    * that makes triangle counting feasible at scale: every undirected edge
    * is oriented from its lower-(degree, id) endpoint to the higher one, so
    * wedge expansion per node is bounded by OUT-degree — O(√m) on any graph
    * (arboricity bound) — instead of the degree² blowup a hub suffers under
    * naive wedge counting. Each triangle u<v<w (in (deg,id) order) is found
    * exactly once as wedge (u→v, u→w) closed by edge v→w. Three hash joins,
    * no driver state.
    *
    * @param und undirected edges, one row per edge, columns `a` < `b`,
    *            no duplicates. Nodes outside any triangle are absent from
    *            the result.
    */
  def trianglesPerNode(undLazy: DataFrame): DataFrame = {
    // The edge relation feeds the degree union (twice) and the orientation
    // join below — materialize it once so a caller handing us a whole
    // edge-construction pipeline doesn't have it replayed three times.
    val und = undLazy.localCheckpoint()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("n").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("db")), "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dst_dg"))
      .localCheckpoint() // evaluated three times below; edges are static
    val e1 = oriented.as("e1"); val e2 = oriented.as("e2"); val e3 = oriented.as("e3")
    val tri = e1.join(e2, col("e1.src") === col("e2.src") &&
        (col("e1.dst_dg") < col("e2.dst_dg") ||
          (col("e1.dst_dg") === col("e2.dst_dg") && col("e1.dst") < col("e2.dst"))))
      .join(e3, col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-EDGE triangle counts — the common-neighbor count of each edge's
    * endpoints, the core signal of neighborhood-overlap link analysis
    * (Jaccard/Adamic-Adar edge scores). Same degree-oriented enumeration as
    * [[trianglesPerNode]] (each triangle found exactly once, wedge work
    * bounded by out-degree); each triangle (u,v,w) then credits its three
    * edges, re-canonicalized to id order (the orientation is by (degree,id),
    * so u<v<w in that order need not be id-ordered). Edges in no triangle
    * are absent — callers LEFT-join and coalesce to 0.
    *
    * @param und undirected edges, one row per edge, columns `a` < `b`.
    * @return (`a`, `b`, `n_common`) with a < b.
    */
  def trianglesPerEdge(undLazy: DataFrame): DataFrame = {
    val und = undLazy.localCheckpoint()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("n").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("db")), "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dst_dg"))
      .localCheckpoint()
    val e1 = oriented.as("e1"); val e2 = oriented.as("e2"); val e3 = oriented.as("e3")
    val tri = e1.join(e2, col("e1.src") === col("e2.src") &&
        (col("e1.dst_dg") < col("e2.dst_dg") ||
          (col("e1.dst_dg") === col("e2.dst_dg") && col("e1.dst") < col("e2.dst"))))
      .join(e3, col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
    tri.select(explode(array(
        struct(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b")),
        struct(least(col("u"), col("w")).as("a"), greatest(col("u"), col("w")).as("b")),
        struct(least(col("v"), col("w")).as("a"), greatest(col("v"), col("w")).as("b"))))
        .as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("n_common"))
  }
}
