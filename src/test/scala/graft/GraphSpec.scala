package graft

import org.apache.spark.sql.functions.col

import graft.ops.Graph

/** Connected components / cluster assignment (graft.ops.Graph). */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("path graph needs multiple propagation rounds and still converges") {
    // 1-2-3-4-5 has diameter 4: min label must walk the whole chain.
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L)).toDF("src", "dst")
    val comp = Graph.connectedComponents(edges).as[(Long, Long)].collect().sorted
    comp.toSeq shouldBe Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L)
  }

  test("two components keep distinct min labels") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("src", "dst")
    val comp = Graph.connectedComponents(edges).as[(Long, Long)].collect().sorted
    comp.toSeq shouldBe Seq(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
  }

  test("clusterAssign: unpaired items are singleton canonical clusters") {
    val items = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("a", "b")
    val out = Graph.clusterAssign(items, "id", pairs, "a", "b")
      .orderBy("id").as[(Long, Long, Long, Boolean)].collect().toSeq
    out shouldBe Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 2L, true), (5L, 4L, 2L, false), (6L, 6L, 1L, true))
  }

  test("clusterAssign with no pairs: every item its own cluster") {
    val items = Seq(7L, 8L).toDF("id")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    val out = Graph.clusterAssign(items, "id", pairs, "a", "b")
      .orderBy("id").as[(Long, Long, Long, Boolean)].collect().toSeq
    out shouldBe Seq((7L, 7L, 1L, true), (8L, 8L, 1L, true))
  }

  test("diameter past the hash-min budget falls back to stars and still solves") {
    // A 40-node chain has diameter 39: hash-min with maxIter = 3 CANNOT
    // close it (it used to throw); the alternating-star fallback is
    // diameter-independent and must return the exact labels instead.
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = Graph.connectedComponents(edges, maxIter = 3)
      .as[(Long, Long)].collect().toMap
    comp shouldBe (0L to 39L).map(_ -> 0L).toMap
  }

  test("adaptive cutover: a chain fires the frontier probe BEFORE the budget") {
    // 40-node chain, default budget 20: the changed-label frontier shrinks
    // by ~1 per round (never geometrically), so the stall probe must cut
    // over to stars after ~warmup+patience rounds instead of burning all
    // 20 one hop at a time — and the labels are still exact.
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, strategy) = Graph.connectedComponentsWithStrategy(edges)
    strategy shouldBe "stars-adaptive"
    labels.as[(Long, Long)].collect().toMap shouldBe (0L to 39L).map(_ -> 0L).toMap
    // a blobby graph (star topology) collapses geometrically: hash-min
    // finishes on its own and the probe must NOT fire
    val star = (1L to 30L).map(i => (0L, i)).toDF("src", "dst")
    val (sl, ss) = Graph.connectedComponentsWithStrategy(star)
    ss shouldBe "hashmin"
    sl.as[(Long, Long)].collect().toMap shouldBe (0L to 30L).map(_ -> 0L).toMap
  }

  test("alternating stars: chain + separate clique converge to per-component minima") {
    val chain = (100L until 119L).map(i => (i, i + 1))
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val sym0 = (chain ++ clique).toDF("n", "m")
    val sym = sym0.union(sym0.select(col("m").as("n"), col("n").as("m")))
    val got = Graph.connectedComponentsStars(sym).as[(Long, Long)].collect()
    got.length shouldBe got.map(_._1).distinct.length // one label per node
    got.toMap shouldBe ((100L to 119L).map(_ -> 100L) ++ (1L to 4L).map(_ -> 1L)).toMap
  }

  test("property: star-scheme components equal a local union-find on random graphs") {
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 8) {
      val n = 2 + rnd.nextInt(11)
      val es = Seq.fill(1 + rnd.nextInt(18))(
        (rnd.nextInt(n + 1).toLong, rnd.nextInt(n + 1).toLong))
        .filter { case (a, b) => a != b }
      if (es.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(k => k -> find(k)).toMap
        val sym0 = es.toDF("n", "m")
        val sym = sym0.union(sym0.select(col("m").as("n"), col("n").as("m")))
        val got = Graph.connectedComponentsStars(sym).as[(Long, Long)].collect().toMap
        got shouldBe expected
      }
    }
  }

  test("property: components equal a local union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 8) {
      val n = 2 + rnd.nextInt(11)
      val es = Seq.fill(1 + rnd.nextInt(18))(
        (rnd.nextInt(n + 1).toLong, rnd.nextInt(n + 1).toLong))
        .filter { case (a, b) => a != b }
      if (es.nonEmpty) {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(k => k -> find(k)).toMap
        val got = Graph.connectedComponents(es.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        got shouldBe expected
      }
    }
  }

  test("triangles: K4 gives every node 3; square + diagonal gives the split") {
    // K4: 4 triangles, each node in exactly 3
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toDF("a", "b")
    Graph.trianglesPerNode(k4).as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    // square 1-2-3-4 plus diagonal 1-3: two triangles sharing edge 1-3
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("a", "b")
    Graph.trianglesPerNode(sq).as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L)
  }

  test("kcorePeel: planted K4 core survives while the tendril peels") {
    // K4 on {1,2,3,4} plus tail 4-5-6: at k=3 the tail (degrees 2 and 1)
    // peels in round one; the K4 keeps every node at degree 3.
    val edges = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ++
      Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val out = Graph.kcorePeel(edges, k = 3, rounds = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    out shouldBe Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("pre-converged k-core exits after one confirming round") {
    // A triangle IS its own 2-core: round 1 removes nothing, so the loop
    // must stop there instead of burning the full budget.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val (res, rounds) = Graph.kcorePeelCounted(tri, 2, 10)
    rounds shouldBe 1
    res.as[(Long, Long)].collect().sorted.toSeq shouldBe
      Seq(1L -> 2L, 2L -> 2L, 3L -> 2L)
  }

  test("pre-converged pagerank exits early; asymmetric graph uses the bound") {
    // d-regular graph: every node keeps pr = 1.0 exactly, so round 1
    // already reproduces the previous vector and the loop exits at 1.
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val symDeg = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("s", "d").withColumn("deg", org.apache.spark.sql.functions.lit(2L))
    val (pr, rounds) = Graph.pagerankCounted(nodes, symDeg, 5)
    rounds shouldBe 1
    pr.as[(Long, Double)].collect().foreach(_._2 shouldBe 1.0)
    // A path graph keeps moving mass: all 5 budgeted rounds run.
    val pNodes = Seq(1L, 2L, 3L).toDF("v")
    val pSym = Seq((1L, 2L, 1L), (2L, 1L, 2L), (2L, 3L, 2L), (3L, 2L, 1L))
      .toDF("s", "d", "deg")
    Graph.pagerankCounted(pNodes, pSym, 5)._2 shouldBe 5
  }

  test("bfs: min-hop levels, bound respected, empty frontier exits early") {
    // path 1-2-3-4-5-6 seeded at 1: hops = position; bound 3 cuts the tail
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("n")
    val (d, _) = Graph.bfsHopsCounted(path, seeds, 3)
    d.as[(Long, Int)].collect().sorted.toSeq shouldBe
      Seq(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)
    // seeds covering a whole component: round 1 finds nothing new → exit
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val all = Seq(1L, 2L, 3L).toDF("n")
    val (d2, rounds) = Graph.bfsHopsCounted(tri, all, 10)
    rounds shouldBe 1
    d2.as[(Long, Int)].collect().foreach(_._2 shouldBe 0)
  }

  test("property: bounded peel equals a local simulation with the same rounds") {
    val rnd = new scala.util.Random(37)
    for (_ <- 1 to 6) {
      val n = 4 + rnd.nextInt(8)
      val es = (for (a <- 1L to n; b <- (a + 1) to n if rnd.nextBoolean())
        yield (a, b)).distinct
      if (es.nonEmpty) {
        val k = 2 + rnd.nextInt(2)
        val rounds = 1 + rnd.nextInt(4)
        var local = es
        for (_ <- 1 to rounds) {
          val dg = local.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
            .view.mapValues(_.size.toLong).toMap
          val keep = dg.filter(_._2 >= k).keySet
          local = local.filter(e => keep(e._1) && keep(e._2))
        }
        val expect = local.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
        val got = Graph.kcorePeel(es.toDF("a", "b"), k, rounds)
          .as[(Long, Long)].collect().toMap
        withClue(s"n=$n k=$k rounds=$rounds: ") { got shouldBe expect }
      }
    }
  }

  test("property: triangle counts equal brute-force enumeration on random graphs") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 6) {
      val n = 4 + rnd.nextInt(8)
      val es = (for (a <- 1L to n; b <- (a + 1) to n if rnd.nextBoolean())
        yield (a, b)).distinct
      if (es.nonEmpty) {
        val eset = es.toSet
        val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for (u <- 1L to n; v <- (u + 1) to n; w <- (v + 1) to n
             if eset((u, v)) && eset((v, w)) && eset((u, w))) {
          brute(u) += 1; brute(v) += 1; brute(w) += 1
        }
        val got = Graph.trianglesPerNode(es.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        got shouldBe brute.toMap
      }
    }
  }

  test("property: per-edge common neighbors equal brute force on random graphs") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 6) {
      val n = 4 + rnd.nextInt(8)
      val es = (for (a <- 1L to n; b <- (a + 1) to n if rnd.nextBoolean())
        yield (a, b)).distinct
      if (es.nonEmpty) {
        val eset = es.toSet
        def adj(x: Long): Set[Long] =
          es.collect { case (a, b) if a == x => b; case (a, b) if b == x => a }.toSet
        val brute = es.map { case (a, b) => (a, b) -> (adj(a) & adj(b)).size.toLong }
          .filter(_._2 > 0).toMap
        val got = Graph.trianglesPerEdge(es.toDF("a", "b"))
          .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
        got shouldBe brute
        // and every edge key it emits is a real edge, canonically ordered
        got.keys.foreach { case (a, b) => assert(a < b && eset((a, b))) }
      }
    }
  }
}
