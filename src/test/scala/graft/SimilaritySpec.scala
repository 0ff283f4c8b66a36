package graft

import graft.extensions.Similarity

/** Recall contracts of the approximate ANN paths against the exact
  * brute-force baseline at sf0.01 (500 × 64-dim vectors, near-random — a
  * deliberately hard recall regime; clustered corpora only do better). */
class SimilaritySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("driver-side plane matrix is bit-identical to the SQL md5 derivation") {
    import org.apache.spark.sql.functions._
    val sqlPlanes = spark.range(128).select(col("id").cast("int").as("j"))
      .crossJoin(spark.range(1, 65).select(col("id").cast("int").as("i")))
      .select(col("j"), col("i"), Similarity.planeComponent(col("j"), col("i")).as("w"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    for (j <- 0 until 128; i <- 1 to 64)
      assert(Similarity.planeComponentScala(j, i) == sqlPlanes((j, i)),
        s"plane ($j,$i) diverges")
  }

  test("k-means: objective improves with iterations and runs are deterministic") {
    import org.apache.spark.sql.functions.avg
    def objective(iters: Int): Double =
      Similarity.kmeansAssign(spark, sf, iters)
        .agg(avg("cc")).head.getDouble(0)
    // spherical k-means objective (mean assignment cosine) must not get
    // worse with more Lloyd steps (tiny epsilon for the rounded means)
    objective(3) should be >= objective(1) - 1e-6
    // fixed seeds + fixed iteration count → identical assignments
    val a = Similarity.kmeansAssign(spark, sf, 2).collect().map(_.toSeq).toSet
    val b = Similarity.kmeansAssign(spark, sf, 2).collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("PQ: recall@5 against brute force meets a floor; scores bounded by 1") {
    val exact = pairs(Similarity.simTopkBruteforce(spark, sf))
    val pq = Similarity.simTopkPq(spark, sf)
    val recall = (exact & pairs(pq)).size.toDouble / exact.size
    // 4×16 PQ on 500 near-random vectors with 16 stride codewords is a
    // coarse quantizer — the floor documents the fixture's measured regime,
    // not a strong guarantee; reconstructed-cosine must stay in [-1, 1+ε]
    // (quantization can push slightly past 1 only via the 6-dp rounding).
    withClue(s"PQ recall@5: $recall: ") { recall should be >= 0.2 }
    val sims = pq.select("cos_sim").collect().map(_.getDouble(0))
    all(sims.toSeq) should (be >= -1.000001 and be <= 1.000001)
  }

  test("IVF (1 Lloyd step, nprobe=2) recall@5 ≥ 0.4; monotone in nprobe") {
    val exact = pairs(Similarity.simTopkBruteforce(spark, sf))
    val ivf2 = pairs(Similarity.simTopkIvfProbe(spark, sf, 2))
    val ivf1 = pairs(Similarity.simTopkIvfProbe(spark, sf, 1))
    val r2 = (exact & ivf2).size.toDouble / exact.size
    val r1 = (exact & ivf1).size.toDouble / exact.size
    withClue(s"recall nprobe=2: $r2, nprobe=1: $r1: ") {
      r2 should be >= 0.4
      r2 should be >= r1 // probing more lists never loses candidates
    }
  }

  test("ensemble rerank: recall beats each generator alone (superset screen)") {
    val exact = pairs(Similarity.simTopkBruteforce(spark, sf))
    val ens = pairs(Similarity.simRerank(spark, sf))
    val ivf = pairs(Similarity.simTopkIvfProbe(spark, sf, 2))
    val lsh = pairs(Similarity.simTopkLsh(spark, sf))
    def r(s: Set[(Long, Long)]) = (exact & s).size.toDouble / exact.size
    withClue(s"ensemble: ${r(ens)}, ivf: ${r(ivf)}, lsh: ${r(lsh)}: ") {
      // exact re-rank over a candidate SUPERSET is monotone in recall
      r(ens) should be >= r(ivf)
      r(ens) should be >= r(lsh)
      r(ens) should be >= 0.54 // the measured value at sf0.01 IS the floor
      // (re-pinned when seeding went corpus-size-independent: stride 40 →
      // ceil(n/13) picks 13 DIFFERENT seed vectors; 0.56 → 0.54)
    }
  }

  test("recall curve: IVF recall grows monotonically with the candidate pool") {
    // The tuning surface future changes must not silently degrade: as
    // nprobe widens the candidate pool, recall@5 must be non-decreasing
    // (probing more lists never discards a candidate), and each point must
    // hold its measured sf0.01 floor. Measured curve: 0.44 / 0.46 / 0.56 /
    // 0.62 at nprobe 1..4 under the corpus-size-independent seeding — a
    // regression anywhere in the centroid pipeline, ranking, or probe
    // logic shows up as a dropped point.
    val exact = pairs(Similarity.simTopkBruteforce(spark, sf))
    val floors = Map(1 -> 0.44, 2 -> 0.46, 3 -> 0.56, 4 -> 0.62)
    val curve = (1 to 4).map { np =>
      np -> (exact & pairs(Similarity.simTopkIvfProbe(spark, sf, np))).size
        .toDouble / exact.size
    }
    withClue(s"recall curve: $curve: ") {
      curve.sliding(2).foreach { case Seq((_, lo), (_, hi)) => hi should be >= lo }
      curve.foreach { case (np, r) => r should be >= floors(np) }
    }
  }

  test("clusterable fixture: staged q8 holds recall@5 ≥ 0.9 at probed mass ≤ 0.05, both scales") {
    // the PRODUCTION cost-curve point the near-random driver corpus
    // cannot exhibit: on a planted-cluster geometry (25 hash-derived
    // centers, tight per-vector offsets — deterministic, no RNG; the
    // shape real sentence/image embedding spaces have) the SAME staged
    // IVF→int8→exact pipeline probes ONE list of 25 (probed mass
    // 1/25 = 0.04 ≤ 0.05) and still clears recall@5 ≥ 0.9 — i.e. the
    // 62 %-probe cost of the gated hi-res point is a property of the
    // weak fixture, not of the pipeline; a clustered corpus rides the
    // same plan far left on the curve. Both corpus sizes mirror the sf
    // points (500 and 5000 vectors).
    def recallAt(n: Long): Double = {
      val vs = Similarity.clusteredVectors(spark, n, dim = 64,
        clusters = 25, spread = 0.1).localCheckpoint()
      val exact = pairs(Similarity.simTopkBruteforceFrom(vs))
      val staged = pairs(Similarity.simTopkIvfQ8From(vs, centroids = 25,
        lloydSteps = 2, nprobe = 1, screenFrac = Similarity.ScreenFrac))
      (exact & staged).size.toDouble / exact.size
    }
    val (rS, rL) = (recallAt(500L), recallAt(5000L))
    info(f"clustered-fixture staged recall@5 at mass 0.04: " +
      f"n=500 $rS%.3f, n=5000 $rL%.3f")
    withClue(s"n=500: $rS, n=5000: $rL: ") {
      rS should be >= 0.9
      rL should be >= 0.9
    }
  }

  test("high-recall IVF configuration: recall@5 ≥ 0.8 at BOTH scales, measured cost") {
    // the GATED production point (13-list codebook, 2 Lloyd steps,
    // nprobe=8 — tuned over k ∈ {13,32,45} × steps × nprobe; finer
    // codebooks LOST recall-per-probed-row on this weakly-clustered
    // corpus). The measured values ARE the floors — deterministic
    // pipeline, so a drop is a regression, not noise. Cost: 8/13 ≈ 62 %
    // of the corpus probed per query, ~4× the default IVF's probe mass
    // for ~2× its recall; recall stays monotone in nprobe (the curve
    // spec), so this is one point on a knob, not a cliff.
    val sfL = "/root/testdata/sf0.1"
    def recall(dir: String): Double = {
      val exact = pairs(Similarity.simTopkBruteforce(spark, dir))
      (exact & pairs(Similarity.simTopkIvfHighRecall(spark, dir))).size
        .toDouble / exact.size
    }
    val (rS, rL) = (recall(sf), recall(sfL))
    info(f"high-recall IVF recall@5: sf0.01=$rS%.3f sf0.1=$rL%.3f")
    withClue(s"sf0.01=$rS sf0.1=$rL: ") {
      rS should be >= 0.88 // measured at pin time
      rL should be >= 0.90 // measured at pin time; both ≥ the 0.8 target
    }
    // ...and the extra Lloyd step + wider probe genuinely buys quality
    // over the strongest previously-gated retrieval (ensemble ≈ 0.64)
    val exactL = pairs(Similarity.simTopkBruteforce(spark, sfL))
    val ens = (exactL & pairs(Similarity.simRerank(spark, sfL))).size
      .toDouble / exactL.size
    rL should be > ens
  }

  test("staged IVF→int8→exact: sub-linear exact mass (≤ 0.2) at recall@5 ≥ 0.8, both scales") {
    // the SUB-LINEAR high-recall point: the hi-res probe's candidates
    // are scored on int8 codes (integer dot — no float vector touched),
    // and only the quantized top-ScreenFrac survive to the exact
    // rerank — so the float budget per query is ceil(n · 0.15), under
    // the ≤ 0.2 contract BY CONSTRUCTION, while int8's ~1/254-per-dim
    // error keeps the true neighbors inside the screen. (A 4×50 PQ
    // screen was measured at 0.68 here — this corpus's near-random
    // geometry defeats coarse codebooks.) The measured recalls ARE the
    // floors (deterministic pipeline).
    val sfL = "/root/testdata/sf0.1"
    def measure(dir: String): (Double, Double) = {
      val exact = pairs(Similarity.simTopkBruteforce(spark, dir))
      val staged = pairs(Similarity.simTopkIvfQ8(spark, dir))
      val n = graft.sources.Tables.embeddings(spark, dir).count()
      val exactMass = math.ceil(n * Similarity.ScreenFrac) / n
      ((exact & staged).size.toDouble / exact.size, exactMass)
    }
    val (rS, mS) = measure(sf)
    val (rL, mL) = measure(sfL)
    info(f"staged IVF-int8 recall@5: sf0.01=$rS%.3f sf0.1=$rL%.3f; " +
      f"exact mass: $mS%.3f / $mL%.3f")
    withClue(s"recall sf0.01=$rS sf0.1=$rL mass=$mS/$mL: ") {
      mS should be <= 0.2 // the sub-linear contract
      mL should be <= 0.2
      // measured at pin time — matching the hi-res point's recall
      // (0.88/0.90) at ~1/4 of its float-scored mass: the int8 screen
      // loses nothing on this corpus
      rS should be >= 0.88
      rL should be >= 0.90
    }
  }

  test("recall does not decay with corpus growth: sf0.1 within band of sf0.01") {
    // the codebook pipeline (stride seeds + one Lloyd step) is
    // corpus-size-independent by construction; this pins that its QUALITY
    // holds as the corpus grows 4x (500 → 2000 vectors) — recall@5 at
    // sf0.1 must sit within 0.15 absolute of the sf0.01 curve point, and
    // the staged rerank must stay monotone over its generators at scale
    val sfL = "/root/testdata/sf0.1"
    def r(exact: Set[(Long, Long)], s: Set[(Long, Long)]) =
      (exact & s).size.toDouble / exact.size
    val exactS = pairs(Similarity.simTopkBruteforce(spark, sf))
    val exactL = pairs(Similarity.simTopkBruteforce(spark, sfL))
    val ivfS = r(exactS, pairs(Similarity.simTopkIvfProbe(spark, sf, 2)))
    val ivfL = r(exactL, pairs(Similarity.simTopkIvfProbe(spark, sfL, 2)))
    val ensL = r(exactL, pairs(Similarity.simRerank(spark, sfL)))
    info(f"recall@5 ivf(nprobe=2): sf0.01=$ivfS%.3f sf0.1=$ivfL%.3f; ensemble sf0.1=$ensL%.3f")
    withClue(s"ivf sf0.01=$ivfS sf0.1=$ivfL ensemble sf0.1=$ensL: ") {
      ivfL should be >= (ivfS - 0.15) // the stated band
      ensL should be >= ivfL // superset screen stays monotone at scale
      // the measured values ARE the floors (deterministic pipeline:
      // stride seeds, hash planes, rounded-tie ranking): IVF 0.44,
      // ensemble 0.64 at sf0.1 — vs 0.46 at sf0.01, no decay
      ivfL should be >= 0.44
      ensL should be >= 0.64
    }
  }

  test("kNN graph: ≤ k ranked neighbors per node, no self edges, sound vs brute force") {
    val g = Similarity.simKnnGraph(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    g should not be empty
    g.foreach { case (s, n, _, _) => s should not be n }
    val bySrc = g.groupBy(_._1)
    bySrc.foreach { case (src, edges) =>
      val sorted = edges.sortBy(_._4)
      withClue(s"src $src: ") {
        sorted.length should be <= Similarity.KnnK
        sorted.map(_._4).toSeq shouldBe (1 to sorted.length) // consecutive ranks
        // rank order must follow (cos desc, nbr asc)
        sorted.map(e => (-e._3, e._2)).toSeq shouldBe
          sorted.map(e => (-e._3, e._2)).sorted.toSeq
      }
    }
    // Soundness on the strongest signal: any LSH near-dup pair at cos ≥ 0.9
    // must appear in the graph as each side's rank-1 neighbor candidate set
    // (identical-direction vectors collide in every band).
    val strong = Similarity.dedupEmbeddingLsh(spark, sf)
      .filter("cos_sim >= 0.9")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    strong.foreach { case (a, b) =>
      withClue(s"strong pair ($a,$b): ") {
        g.exists(e => e._1 == a && e._2 == b) shouldBe true
        g.exists(e => e._1 == b && e._2 == a) shouldBe true
      }
    }
  }
}
