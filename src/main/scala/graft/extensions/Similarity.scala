package graft.extensions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.ops.Relational
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - [[simTopkBruteforce]]: exact cosine top-k — the correctness baseline.
  *    O(|Q|·|N|) dot products; fine when the query set is small/broadcast.
  *  - [[simTopkLsh]]: random-hyperplane LSH — the scale path. Vectors get an
  *    8-bit sign signature from pseudo-random hyperplanes (derived from the
  *    portable hash, so the DuckDB oracle regenerates identical planes);
  *    search touches only same-bucket candidates. Recall < 1 by design —
  *    the oracle implements the SAME approximation, so results match
  *    exactly.
  *  - [[dedupEmbeddingLsh]]: BANDED hyperplane LSH (OR-amplification, same
  *    banding idea as MinHash-LSH): b independent bands of r planes each;
  *    a pair is a candidate if it agrees on ALL r bits of ANY band. Recall
  *    for a pair at cosine c: p = 1 − acos(c)/π per plane, so
  *    1 − (1 − p^r)^b overall; random-pair candidate rate ≈ b/2^r.
  */
object Similarity {

  val TopK = 5
  val NumQueries = 10 // queries are vec_id < 10
  val NumPlanes = 8

  /** Banded-LSH shape for [[dedupEmbeddingLsh]]: 16 bands × 8 planes.
    * r=8 keeps the random-pair candidate rate ≈ 16/2⁸ ≈ 6% (scale-safe);
    * b=16 buys recall ≈ 0.995 at a realistic near-dup cosine of 0.9
    * (and a measured 10/14 at this fixture's weak τ=0.45). */
  val DedupBands = 16; val DedupPlanesPerBand = 8

  /** Shared vector projection (doubles + norm); also used by Dedup. */
  private[extensions] def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.embeddings(spark, dir))
      .select(col("vec_id"), Portable.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Portable.l2norm(col("v")))

  /** Exact brute-force cosine top-k for each query vector (vec_id < 10),
    * ranked on the ROUNDED similarity with vec_id tiebreak (cross-engine
    * determinism). */
  def simTopkBruteforce(spark: SparkSession, dir: String): DataFrame =
    simTopkBruteforceFrom(vectors(spark, dir))

  /** [[simTopkBruteforce]] over an ARBITRARY (vec_id, v, nrm) relation —
    * the fixture-facing form (see [[clusteredVectors]]). */
  private[graft] def simTopkBruteforceFrom(vs: DataFrame): DataFrame = {
    val q = vs.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = broadcast(q).join(vs, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Portable.cosine6(col("qv"), col("v"), col("qn"), col("nrm")).as("cos_sim"))
    topK(scored)
  }

  /** Deterministic PLANTED-CLUSTER embeddings fixture — the clusterable
    * geometry real embedding spaces (sentence/image encoders over
    * topical corpora) actually have, which the driver's near-random
    * `embeddings` table deliberately lacks. No RNG anywhere: cluster
    * `c`'s center has hash-derived components in [-1, 1)
    * ([[planeComponent]] under a disjoint namespace), and vector `vec_id`
    * = its cluster's center + `spread` × a per-(vector, dim) hash offset
    * — |offset| ≤ spread ≪ inter-center distance, so nearest neighbors
    * are same-cluster BY CONSTRUCTION. Clusters are CONTIGUOUS vec_id
    * blocks (block size n/clusters), so [[strideSeeds]]' stride sampling
    * lands exactly one seed per planted cluster — the fixture measures
    * the retrieval pipeline, not seed luck. Same (vec_id, v, nrm) shape
    * as [[vectors]]. */
  private[graft] def clusteredVectors(spark: SparkSession, n: Long,
                                      dim: Int, clusters: Int,
                                      spread: Double): DataFrame = {
    val block = n / clusters
    val base = spark.range(n).select(col("id").as("vec_id"))
      .withColumn("cl", (col("vec_id") / block).cast("int"))
    val comps = (1 to dim).map { i =>
      planeComponent(col("cl") + lit(1000000), lit(i)) +
        lit(spread) * planeComponent(col("vec_id") + lit(2000000), lit(i))
    }
    base.select(col("vec_id"), array(comps: _*).as("v"))
      .withColumn("nrm", Portable.l2norm(col("v")))
  }

  /** Pseudo-random hyperplane component for (plane j, dim i) in [-1, 1):
    * derived from the portable hash so both engines generate identical
    * planes without shipping 8×64 literals. */
  private[graft] def planeComponent(j: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
    (Portable.hash60(concat_ws("_", lit("plane"), j, i)) % 2001 - 1000).cast("double") / 1000.0

  /** JVM twin of [[planeComponent]] (md5 hex → first 15 digits → BIGINT →
    * affine map to [-1, 1)): materializes the plane matrix on the driver so
    * signature computation is a map-side projection. Differentially tested
    * against the SQL formulation in SimilaritySpec. */
  private[graft] def planeComponentScala(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane_${j}_${i}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000).toDouble / 1000.0
  }

  /** The (nPlanes × 64) hyperplane matrix as a typed literal — a CONSTANT in
    * the plan. Signatures become one narrow projection per vector (native
    * codegen dot per plane): no dim-explode, no plane join, no exchange at
    * all — the previous formulation shuffled n×(planes) partial-sum rows
    * through two aggregations. At 1000 executors this turns the signature
    * stage from a shuffle into pure map work. */
  private def planesLit(nPlanes: Int) =
    typedLit((0 until nPlanes).map(j => (1 to 64).map(i => planeComponentScala(j, i))))

  /** bits(k) for k in [0, nPlanes): 1L iff round(v · plane_k, 9) ≥ 0 —
    * the same rounded sign contract as the oracle (risk note below). */
  private def signBits(v: org.apache.spark.sql.Column, nPlanes: Int) =
    transform(sequence(lit(0), lit(nPlanes - 1)), j =>
      when(round(Portable.dot(v, get(planesLit(nPlanes), j)), 9) >= 0, 1L).otherwise(0L))

  /** Packs a 0/1-bit array into a BIGINT, bit k = bits(k) << k
    * (fold MSB-first: acc·2 + bit — exact integer arithmetic). */
  private def packBits(bits: org.apache.spark.sql.Column) =
    aggregate(reverse(bits), lit(0L), (acc, b) => acc * 2 + b)

  /** LSH-bucketed ANN: 8-bit sign signature; candidates share the bucket.
    * Top-k per query by exact (rounded) cosine within the bucket. */
  def simTopkLsh(spark: SparkSession, dir: String): DataFrame = {
    val withSig = withBuckets(spark, dir)
    val q = withSig.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val scored = broadcast(q)
      .join(withSig, col("bucket") === col("qb") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Portable.cosine6(col("qv"), col("v"), col("qn"), col("nrm")).as("cos_sim"))
    topK(scored)
  }

  /** Int8-quantized cosine top-k: every vector is scaled so max|x| → 127 and
    * rounded to int8 codes; scoring runs on the INTEGER dot product (exact
    * on both engines — no FP summation-order hazard at all) over the
    * reconstructed-norm cosine. The 100 TB point: the candidate-scoring
    * payload drops 4× vs float32 (8× vs this pipeline's doubles) — the
    * classic memory-bandwidth move for billion-vector ANN — and the codes
    * compose with the IVF/LSH candidate generators above (quantized verify
    * over their buckets). Approximate by design (quantization error ~1/254
    * per dim); the oracle implements the SAME quantization, so results
    * match exactly. */
  def simTopkQuantized(spark: SparkSession, dir: String): DataFrame = {
    val qd = vectors(spark, dir)
      .select(col("vec_id"), col("v"),
        expr("array_max(transform(v, x -> abs(x)))").as("m"))
      // x * 127.0 / m written with the oracle's exact association: every
      // step is a single IEEE op on identical inputs, so the rounded code
      // is bit-identical cross-engine (no sum ordering involved).
      .select(col("vec_id"), expr(
        "transform(v, x -> CASE WHEN m = 0.0 THEN 0 ELSE CAST(round(x * 127.0 / m) AS INT) END)")
        .as("qv"))
      .withColumn("qnrm",
        sqrt(expr("aggregate(qv, 0L, (acc, q) -> acc + CAST(q AS BIGINT) * q)").cast("double")))
    val q = qd.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"), col("qnrm").as("qn"))
    val scored = broadcast(q).join(qd, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(
          expr("aggregate(zip_with(qq, qv, (a, b) -> CAST(a AS BIGINT) * b), 0L, (acc, p) -> acc + p)")
            .cast("double") / (col("qn") * col("qnrm")), 6).as("cos_sim"))
    topK(scored)
  }

  /** Per-query top-k on the rounded cosine (shared K1 operator). */
  private def topK(scored: DataFrame): DataFrame =
    Relational
      .topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos_sim").desc, col("neighbor_id").asc), TopK)
      .select("query_id", "neighbor_id", "cos_sim")
      .orderBy(col("query_id").asc, col("cos_sim").desc, col("neighbor_id").asc)

  /** Shared: vectors with their LSH bucket (8-bit hyperplane signature),
    * computed map-side against the [[planesLit]] constant.
    *
    * Sign-bit residual risk (both here and in bandSignatures): the bit is
    * the sign of round(Σ xᵢwᵢ, 9). A projection truly within ~5e-10 of a
    * rounding boundary could round differently across engines (FP sum order
    * differs: native dot is left-to-right, DuckDB's sum is
    * arrival-ordered), flipping a bucket. Rounding narrows the exposed
    * window to |Σ − boundary| ≲ 1e-15 (cross-engine FP noise), and both
    * sides use the identical rounded comparison — accepted residual risk,
    * since ANY threshold on a continuous projection has such a boundary. */
  private def withBuckets(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .withColumn("bucket", packBits(signBits(col("v"), NumPlanes)))

  /** Per-vector banded signatures: (vec_id, band, bkt) with one r-bit bucket
    * per band, planes shared with [[simTopkLsh]] (band 0 = its 8 planes).
    *
    * All 128 sign bits are computed in ONE map-side projection against the
    * [[planesLit]] constant, then sliced into per-band buckets — the band
    * explode is the only row expansion (n×b tiny rows), and nothing
    * shuffles until the bucket self-join. */
  private def bandSignatures(spark: SparkSession, dir: String): DataFrame = {
    val nPlanes = DedupBands * DedupPlanesPerBand
    vectors(spark, dir)
      .withColumn("bits", signBits(col("v"), nPlanes))
      .select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(DedupBands - 1)), b =>
          struct(b.as("band"),
            packBits(slice(col("bits"), b * DedupPlanesPerBand + 1, lit(DedupPlanesPerBand)))
              .as("bkt")))).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkt").as("bkt"))
  }

  /** Embedding near-dup at scale: banded-LSH candidate pairs (same-bucket in
    * ANY of the [[DedupBands]] bands — OR-amplification), then the exact
    * (rounded) cosine threshold. Band-bucket self-joins bound pair
    * generation by bucket size instead of O(n²); the distinct collapses a
    * pair that collides in several bands to one verification. Recall < 1 by
    * design; the oracle implements the same approximation. */
  def dedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame = {
    // Both materialized once: the bucket self-join would re-project all
    // 128 sign bits per side, and the verify join reads the vectors twice.
    val vs = vectors(spark, dir).localCheckpoint()
    val sig = bandSignatures(spark, dir).localCheckpoint()
    val cand = sig.as("x")
      .join(sig.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(vs.as("a"), col("vec_a") === col("a.vec_id"))
      .join(vs.as("b"), col("vec_b") === col("b.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        Portable.cosine6(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= 0.45)
      .orderBy("vec_a", "vec_b")
  }

  /** Neighbors kept per node in the kNN graph. */
  val KnnK = 3

  /** Approximate kNN GRAPH construction — top-[[KnnK]] cosine neighbors for
    * EVERY corpus vector (not just a query set), neighbors drawn from the
    * banded-LSH candidates of [[bandSignatures]]. The curation primitive
    * behind SemDeDup-style clustering, graph-based diversity sampling, and
    * label propagation over embedding space.
    *
    * Scale shape: candidate generation is the banded bucket self-join
    * (pair work bounded by bucket size, never O(n²)); scoring joins
    * candidates to vectors by id (8-byte keys); ranking is one window over
    * the candidate relation partitioned by source — `WindowGroupLimit`
    * evicts past rank [[KnnK]] map-side before the exchange. A node whose
    * buckets are all singletons has no candidates and is absent — the
    * documented recall<1 trade every LSH stage here makes; the oracle
    * replays the identical approximation. */
  def simKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    // Both materialized once: sig feeds both sides of the bucket self-join,
    // vs both sides of the scoring join.
    val vs = vectors(spark, dir).localCheckpoint()
    val sig = bandSignatures(spark, dir).localCheckpoint()
    val cand = sig.as("x")
      .join(sig.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src_id"), col("y.vec_id").as("nbr_id"))
      .distinct()
    cand
      .join(vs.as("a"), col("src_id") === col("a.vec_id"))
      .join(vs.as("b"), col("nbr_id") === col("b.vec_id"))
      .select(col("src_id"), col("nbr_id"),
        Portable.cosine6(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src_id")).orderBy(col("cos_sim").desc, col("nbr_id").asc)))
      .filter(col("rk") <= KnnK)
      .orderBy("src_id", "rk")
  }

  /** Target IVF centroid count — CORPUS-SIZE-INDEPENDENT. The seed stride
    * derives as ceil(n / k), so the codebook stays ~k vectors at any
    * scale. The former FIXED stride made k grow with the corpus, turning
    * the O(n·k) broadcast assignment quadratic — the builder sf1 audit
    * measured alpha_tail 1.21 on the PQ lane before the change (20k
    * vectors → 2000 codewords); production IVF/PQ trains a constant-size
    * codebook for exactly this reason. Seeding stays deterministic (every
    * stride-th vec_id; one Lloyd refinement, means rounded to 6 decimals)
    * so cross-engine FP noise cannot leak into assignments. */
  val IvfCentroids = 13 // ≈ the former sf0.01 codebook (stride 40)

  /** Queries probe their NProbe nearest centroids' inverted lists (lists are
    * disjoint, so probed candidates need no dedup). */
  val NProbe = 2

  /** Rank vectors' centroids by rounded cosine: (vec_id, cent_id, rk). */
  private def rankCentroids(vs: DataFrame, cents: DataFrame): DataFrame =
    vs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"), col("v"), col("nrm"),
        Portable.cosine6(col("v"), col("cv"), col("nrm"), col("cn")).as("cc"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cc").desc, col("cent_id").asc)))

  /** One Lloyd step: per-dimension mean of each centroid's assigned vectors,
    * rounded, with recomputed norms. All DataFrame aggregations — the
    * assignment is a broadcast nested product over k centroids (O(n·k)), the
    * mean one exchange of n×dim (cent_id, i, x) triples with map-side
    * partial avg. A seed that attracts no vectors vanishes (both engines). */
  private def refineCentroids(vs: DataFrame, seeds: DataFrame): DataFrame =
    rankCentroids(vs, seeds)
      .filter(col("rk") === 1)
      .select(col("cent_id"), posexplode(col("v")).as(Seq("i", "x")))
      // exact decimal sum / double divide: an order-dependent float AVG
      // could flip the 6-dp rounding — and a flipped centroid coordinate
      // cascades into every downstream assignment
      .groupBy("cent_id", "i").agg(
        round(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1)), 6).as("cx"))
      .groupBy("cent_id")
      .agg(expr("transform(array_sort(collect_list(struct(i, cx))), s -> s.cx)").as("cv"))
      .withColumn("cn", Portable.l2norm(col("cv")))

  /** Spherical k-means, the general multi-iteration form of the IVF list
    * refinement: deterministic stride seeds, `iters` Lloyd steps (assign to
    * max-cosine centroid → per-dimension mean), final assignment returned
    * as (vec_id, cent_id, cc). Deterministic: fixed seeds and iteration
    * count, means rounded to 6 before re-use. Each step is one broadcast
    * assignment (O(n·k)) + one (cent,dim) mean exchange; localCheckpoint
    * truncates lineage so the plan stays iteration-count-independent —
    * the [[graft.ops.Graph]] iteration discipline. Spec-bound (objective
    * monotonicity + determinism) rather than oracle-gated: the fixpoint
    * is float-iterative, not SQL-expressible. */
  private[graft] def kmeansAssign(spark: SparkSession, dir: String,
                                  iters: Int = 3): DataFrame = {
    val vs = vectors(spark, dir)
    var cents = strideSeeds(vs)
    for (_ <- 1 to iters)
      cents = refineCentroids(vs, cents).localCheckpoint()
    rankCentroids(vs, cents).filter(col("rk") === 1)
      .select(col("vec_id"), col("cent_id"), col("cc"))
  }

  /** The 1-row corpus-derived seed stride, ceil(n / targetK), as a
    * DataFrame — joined in broadcast so the plan stays fully declarative
    * (no driver-side count action) and the oracle can replay the same
    * scalar subquery. */
  private def strideOf(vs: DataFrame, targetK: Int): DataFrame =
    vs.agg(ceil(count(lit(1)).cast("double") / targetK).cast("long").as("stride"))

  /** Deterministic stride seeds — the shared centroid initialization for
    * IVF and k-means (one definition: diverging seeding schemes would train
    * the two from different centroids). ~[[IvfCentroids]] seeds at ANY
    * corpus size. */
  private def strideSeeds(vs: DataFrame, k: Int = IvfCentroids): DataFrame =
    vs.crossJoin(broadcast(strideOf(vs, k)))
      .filter(col("vec_id") % col("stride") === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))

  /** Per-label centroids as a vector AGGREGATION: posexplode to
    * (label, dim, component), mean per (label, dim), long-format output
    * (1-based dim for DuckDB subscript parity, mean rounded to 6 — double
    * summation order differs across engines only in the last ulp). This is
    * the k-means/class-prototype building block; state per group is one
    * (sum, count) pair per dimension — never a collected vector list, so a
    * label with a billion members costs the same memory as one with ten. */
  def simLabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(Portable.asDouble(col("embedding"))))
      .select(col("label"), (col("pos") + 1).as("dim"), col("col").as("x"))
      .groupBy("label", "dim")
      .agg(
        round(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1)), 6).as("centroid"),
        count(lit(1)).as("n_vectors"))
      .orderBy("label", "dim")

  /** Cosine threshold above which two same-cluster vectors are semantic
    * duplicates ([[dedupSemantic]]). */
  val SemDedupTau = 0.45

  /** Per-member pair budget for [[dedupSemantic]]: each vector is compared
    * to at most this many lower-id cluster-mates (the df-cap discipline of
    * the n-gram posting lists, applied to clusters). Clusters no larger
    * than the window behave exactly like unbounded all-pairs; a
    * pathological giant cluster costs m·window pairs instead of m²/2. */
  val SemDedupPairWindow = 256

  /** The BOUNDED within-cluster pair relation: members ranked by vec_id
    * inside their cluster, each probing its up-to-`window` immediate
    * predecessors through a pure (cent_id, rank) EQUI-join — the m² pairs
    * of a naive `a.cent < b.cent` self-join are never even enumerated.
    * Output columns: cluster_id, va/(v,nrm of a), vb/(v,nrm of b). */
  private[graft] def semanticPairs(members: DataFrame, window: Int): DataFrame = {
    val rked = members.withColumn("srk", row_number().over(
      Window.partitionBy("cent_id").orderBy("vec_id")))
    val probes = rked.filter(col("srk") >= 2)
      .select(col("cent_id"), col("vec_id").as("vb"), col("v").as("bv"),
        col("nrm").as("bn"),
        explode(expr(s"sequence(greatest(1, srk - $window), srk - 1)")).as("ark"))
    probes.join(rked.select(col("cent_id"), col("srk").as("ark"),
        col("vec_id").as("va"), col("v").as("av"), col("nrm").as("an")),
      Seq("cent_id", "ark"))
      .select(col("cent_id").as("cluster_id"), col("va"), col("av"), col("an"),
        col("vb"), col("bv"), col("bn"))
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then compare
    * pairs only WITHIN each cluster and drop every vector that lies within
    * cosine ≥ τ of a lower-id cluster-mate (the kept representative is the
    * lowest id of each semantic group — deterministic, no training-order
    * dependence). Output: one row per dropped vector with its cluster and
    * its max similarity to a kept/lower neighbor.
    *
    * Scale shape: clustering makes the pair work n²/k instead of n² — the
    * published algorithm's core trick — and because the stride seeding
    * grows k WITH n, mean cluster size is a constant. Skew is the residual
    * risk (one attractor centroid swallowing a corpus share), so the pair
    * expansion itself is bounded: [[semanticPairs]] compares each member
    * to at most [[SemDedupPairWindow]] immediate lower-id cluster-mates
    * via a (cent_id, rank) equi-join — worst-case m·window pairs per
    * cluster, enforced by construction (`DedupSkewSpec` plants a one-giant-
    * cluster fixture and counts). Clusters within the window are bit-
    * identical to unbounded all-pairs, and the oracle applies the SAME
    * window, so both engines agree on any input. Reuses the SAME
    * deterministic centroid pipeline as [[simTopkIvf]] (stride seeds + one
    * rounded Lloyd step), so the oracle replays it in SQL verbatim. */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    // Same materialization discipline as simTopkIvfProbe; members is
    // additionally checkpointed because the within-cluster pair join
    // consumes it on BOTH sides (lazily the O(n·k) assignment ran twice).
    val vs = vectors(spark, dir).localCheckpoint()
    val cents = refineCentroids(vs, strideSeeds(vs)).localCheckpoint()
    val members = rankCentroids(vs, cents).filter(col("rk") === 1)
      .select(col("vec_id"), col("cent_id"), col("v"), col("nrm"))
      .localCheckpoint()
    semanticPairs(members, SemDedupPairWindow)
      .select(col("cluster_id"), col("vb").as("drop_id"),
        Portable.cosine6(col("av"), col("bv"), col("an"), col("bn")).as("cos"))
      .groupBy("cluster_id", "drop_id")
      .agg(max(col("cos")).as("dup_score"))
      .filter(col("dup_score") >= SemDedupTau)
      .orderBy("drop_id")
  }

  /** Product-quantization geometry: [[PqSubspaces]] subvectors of
    * [[PqSubDim]] dims each (64 = 4 × 16); the per-subspace codebook is
    * the stride-seeded subvector set at a CONSTANT [[PqCodewords]] target
    * (stride = ceil(n / k), same corpus-size-independence as
    * [[IvfCentroids]]) — the same deterministic stride seeding as IVF (no
    * trained state ships cross-engine). Recall on this near-random
    * fixture is codebook-bound (measured 0.16 / 0.24 / 0.36 at 16 / 64 /
    * 100 codewords); 50 keeps the sf0.01 gate byte-identical to the
    * former stride-10 form. */
  val PqSubspaces = 4
  val PqSubDim = 16
  val PqCodewords = 50

  /** Product-quantized ANN (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): each vector is encoded as M=4 codebook
    * ids (one per subspace, nearest codeword by rounded L2); queries score
    * EVERY code via the asymmetric-distance trick — a per-(query, subspace,
    * codeword) partial-dot TABLE (|Q|·M·K entries, broadcast) joined to the
    * codes, so scoring a vector is M table lookups instead of a 64-dim dot.
    * The 100 TB point: the database payload shrinks to M small ints per
    * vector (16× vs float32) and the scoring join moves codes, not vectors;
    * ranking is on the reconstructed-vector cosine. Approximate by design —
    * the oracle implements the SAME quantization, so results match exactly.
    * Every intra-subspace fold is an ordered in-row reduce and every
    * cross-subspace sum goes through DECIMAL, so no FP-order hazard. */
  /** The PQ index pieces over `vs` — [[simTopkPq]]'s build, factored:
    * `codes` (vec_id, m, code, cn2 — M codebook ids per vector),
    * `rnorm` (vec_id, rn — reconstructed-vector norm), and `qtab`
    * (query_id, m, code, pdot — the broadcast asymmetric-distance
    * table, |Q|·M·K rows). (The staged [[simTopkIvfQ8]] screen uses the
    * int8 codes instead: the 4×50 PQ codebook measured recall 0.68 as a
    * screen on this near-random corpus — too lossy.) */
  private def pqIndex(vs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val subs = vs.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${PqSubspaces - 1}), m -> slice(v, m * $PqSubDim + 1, $PqSubDim))")))
      .select(col("vec_id"), col("pos").as("m"), col("col").as("sub"))
    val cents = subs.crossJoin(broadcast(strideOf(vs, PqCodewords)))
      .filter(col("vec_id") % col("stride") === 0)
      .select(col("vec_id").as("cent_id"), col("m").as("cm"), col("sub").as("csub"))
      .withColumn("cn2",
        expr("aggregate(csub, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))
    val d2 = subs.join(broadcast(cents), col("m") === col("cm"))
      .select(col("vec_id"), col("m"), col("cent_id"), col("cn2"),
        round(expr("aggregate(zip_with(sub, csub, (a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"), 6)
          .as("d2"))
    // the O(n·k·m) assignment + window runs ONCE for its two consumers
    // (reconstructed norms + ADC scoring) — n×m slim rows to hold
    val codes = d2.withColumn("rk", row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(col("d2").asc, col("cent_id").asc)))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("m"), col("cent_id").as("code"), col("cn2"))
      .localCheckpoint()
    val rnorm = codes.groupBy("vec_id")
      .agg(sqrt(sum(col("cn2").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double")).as("rn"))
    val qtab = subs.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("m").as("qm"), col("sub").as("qsub"))
      .join(broadcast(cents), col("qm") === col("cm"))
      .select(col("query_id"), col("qm").as("m"), col("cent_id").as("code"),
        round(expr("aggregate(zip_with(qsub, csub, (a, b) -> a * b), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"), 9)
          .as("pdot"))
    (codes, rnorm, qtab)
  }

  def simTopkPq(spark: SparkSession, dir: String): DataFrame = {
    val vs = vectors(spark, dir)
    val (codes, rnorm, qtab) = pqIndex(vs)
    val qn = vs.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("nrm").as("qn"))
    val scored = codes.join(broadcast(qtab), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("pdot").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double").as("dot"))
      .join(rnorm, "vec_id")
      .join(broadcast(qn), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("dot") / (col("qn") * col("rn")), 6).as("cos_sim"))
    topK(scored)
  }

  /** IVF ANN with k-means-refined lists and multi-probe search: vectors are
    * assigned to their nearest refined centroid (inverted lists); a query
    * probes its NProbe nearest lists. Assignment cost O(n·k) with the
    * centroid set broadcast; search cost bounded by the probed list sizes.
    * Recall < 1 by design; the oracle implements the same approximation,
    * and SimilaritySpec bounds recall@k against brute force from below. */
  def simTopkIvf(spark: SparkSession, dir: String): DataFrame =
    simTopkIvfProbe(spark, dir, NProbe)

  /** [[simTopkIvf]] with an explicit probe width — more probes search a
    * superset of lists, so recall is monotone in `nprobe` (spec-asserted). */
  private[graft] def simTopkIvfProbe(spark: SparkSession, dir: String,
                                     nprobe: Int): DataFrame = {
    // vs feeds seeds, the Lloyd step, AND both assignment passes; cents is
    // k rows — checkpointing both makes the refine chain and the scan run
    // ONCE (lazily the O(n·k) assignment cross executed twice and the
    // refinement three times — measured ~0.7 s extra at sf0.1). The probe
    // side re-ranks only the NumQueries query vectors against the k
    // checkpointed centroids (O(|Q|·k)) instead of filtering the full n·k
    // ranking a second time.
    val vs = vectors(spark, dir).localCheckpoint()
    val cents = refineCentroids(vs, strideSeeds(vs)).localCheckpoint()
    val members = rankCentroids(vs, cents).filter(col("rk") === 1)
      .select("vec_id", "cent_id", "v", "nrm")
    val probes = rankCentroids(vs.filter(col("vec_id") < NumQueries), cents)
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").as("qc"))
    broadcast(probes)
      .join(members, col("cent_id") === col("qc") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Portable.cosine6(col("qv"), col("v"), col("qn"), col("nrm")).as("cos_sim"))
      .transform(topK)
  }

  /** The HIGH-RECALL IVF configuration (see [[simTopkIvfHighRecall]]):
    * the standard codebook, one extra Lloyd refinement, and a wide
    * probe. Tuning measured over k ∈ {13, 32, 45} × steps ∈ {1..3} ×
    * nprobe: finer codebooks LOSE recall-per-probed-row on this corpus
    * (weak cluster structure scatters true neighbors across lists), so
    * the winning high-recall point keeps the 13-list codebook and buys
    * recall with refinement + probe width. */
  val HiResCentroids: Int = IvfCentroids
  val HiResLloydSteps = 2
  val HiResNProbe = 8

  /** [[simTopkIvfProbe]] generalized over the full tuning surface —
    * codebook size, Lloyd refinement count, probe width. Identical
    * determinism discipline (stride seeds, 6-dp rounded means and
    * cosines, id tiebreaks), so every configuration is oracle-replayable
    * by chaining the refine block `steps` times in SQL. */
  private[graft] def simTopkIvfTuned(spark: SparkSession, dir: String,
                                     k: Int, steps: Int, nprobe: Int)
      : DataFrame = {
    val vs = vectors(spark, dir).localCheckpoint()
    var cents = strideSeeds(vs, k)
    for (_ <- 1 to steps) cents = refineCentroids(vs, cents).localCheckpoint()
    val members = rankCentroids(vs, cents).filter(col("rk") === 1)
      .select("vec_id", "cent_id", "v", "nrm")
    val probes = rankCentroids(vs.filter(col("vec_id") < NumQueries), cents)
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cent_id").as("qc"))
    broadcast(probes)
      .join(members, col("cent_id") === col("qc") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Portable.cosine6(col("qv"), col("v"), col("qn"), col("nrm")).as("cos_sim"))
      .transform(topK)
  }

  /** The GATED high-recall ANN configuration — the production semantic-
    * dedup / retrieval point the default IVF ([[NProbe]] = 2 of
    * [[IvfCentroids]] = 13, recall@5 ≈ 0.44–0.46) deliberately is not:
    * the same codebook trained with [[HiResLloydSteps]] Lloyd
    * refinements (the multi-iteration k-means machinery, now
    * oracle-gated), probed [[HiResNProbe]] lists wide. Measured recall@5
    * vs brute force (SimilaritySpec pins the floors): 0.88 at sf0.01,
    * 0.90 at sf0.1 — vs the 0.64 staged-rerank ensemble — at a measured
    * candidate cost of [[HiResNProbe]]/[[HiResCentroids]] ≈ 62 % of the
    * corpus per query (~4× the default probe mass, ~2× its recall; the
    * honest number on THIS corpus, whose weak cluster structure makes
    * every sub-linear candidate generator pay in recall). The cost curve
    * is the knob: recall is monotone in nprobe (spec-pinned), so a
    * deployment picks its point; at 100 TB the plan shape is unchanged
    * (broadcast codebook, equi-join on list id, per-list exact rerank),
    * and a clustered real-world embedding space moves the same
    * configuration far left on the cost curve. */
  def simTopkIvfHighRecall(spark: SparkSession, dir: String): DataFrame =
    simTopkIvfTuned(spark, dir, HiResCentroids, HiResLloydSteps, HiResNProbe)

  /** Per-query EXACT-scoring budget of [[simTopkIvfQ8]], as a corpus
    * fraction: the float stage reranks at most ceil(n · ScreenFrac)
    * survivors — the <20 % contract with headroom. */
  val ScreenFrac = 0.15

  /** The SUB-LINEAR high-recall retrieval point — the staged
    * quantized-screen composition every production vector store ships
    * (coarse lists → quantized scoring → exact rerank; Jégou et al. 2011
    * is the PQ form, int8 is the screen that survives THIS corpus's
    * near-random geometry, where a 4×50 PQ codebook was measured at
    * recall 0.68 — too lossy): the [[simTopkIvfHighRecall]] probe
    * generates candidates (8 of 13 lists ≈ 62 % of this corpus), the
    * int8 codes SCORE those candidates with an exact INTEGER dot
    * product — a 4× memory-bandwidth reduction vs float32 and zero FP
    * hazard, never touching the float vector — and only the quantized
    * top-[[ScreenFrac]] survivors (≤ 15 % of the corpus per query) are
    * reranked with the EXACT cosine. The float stage is the only one
    * touching float vectors, so the exact-scored mass drops from the
    * hi-res point's 62 % to ≤ 15 % while int8's ~1/254-per-dim
    * quantization error keeps the true neighbors inside the screen
    * (measured recall@5 floors pinned in SimilaritySpec at both sf
    * points, alongside the ≤ 0.2 exact-mass ratio). At 100 TB the shape
    * is unchanged: broadcast codebook + broadcast query codes,
    * equi-join on list id, per-query top-C screen, exact rerank over C
    * rows — the corpus's float vectors are read once to build codes,
    * never per candidate. Deterministic end-to-end (stride seeds, 6-dp
    * rounded means/scores, integer dot, id tiebreaks), so the DuckDB
    * oracle replays the identical staged pipeline. */
  def simTopkIvfQ8(spark: SparkSession, dir: String): DataFrame =
    simTopkIvfQ8From(vectors(spark, dir).localCheckpoint(),
      HiResCentroids, HiResLloydSteps, HiResNProbe, ScreenFrac)

  /** [[simTopkIvfQ8]] generalized over the tuning surface AND the input
    * relation — the cost-curve form: the clusterable-fixture spec pins
    * `recall@5 ≥ 0.9 at probed mass ≤ 0.05` (nprobe/centroids ≈ 0.04)
    * on [[clusteredVectors]], the production claim the near-random
    * driver corpus cannot exhibit (its weak structure caps ANY
    * sub-linear candidate generator — `Similarity` doc). `vs` should be
    * materialized by the caller (many consumers). */
  private[graft] def simTopkIvfQ8From(vs: DataFrame, centroids: Int,
                                      lloydSteps: Int, nprobe: Int,
                                      screenFrac: Double): DataFrame = {
    var cents = strideSeeds(vs, centroids)
    for (_ <- 1 to lloydSteps)
      cents = refineCentroids(vs, cents).localCheckpoint()
    val members = rankCentroids(vs, cents).filter(col("rk") === 1)
      .select("vec_id", "cent_id")
    val probes = rankCentroids(vs.filter(col("vec_id") < NumQueries), cents)
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("qc"))
    val cand = broadcast(probes)
      .join(members, col("cent_id") === col("qc") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    // int8 codes — the [[simTopkQuantized]] encoding verbatim (max|x| →
    // 127, rounded), so the screen's quantization is oracle-replayable
    val qd = vs
      .select(col("vec_id"), col("v"),
        expr("array_max(transform(v, x -> abs(x)))").as("m"))
      .select(col("vec_id"), expr(
        "transform(v, x -> CASE WHEN m = 0.0 THEN 0 ELSE CAST(round(x * 127.0 / m) AS INT) END)")
        .as("qv"))
      .withColumn("qnrm",
        sqrt(expr("aggregate(qv, 0L, (acc, q) -> acc + CAST(q AS BIGINT) * q)")
          .cast("double")))
    val q8 = qd.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"),
        col("qnrm").as("qn8"))
    // quantized screen over the probed candidates only: exact integer
    // dot, 6-dp rounded cosine, id tiebreaks
    val screen = cand
      .join(qd.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(q8), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(expr(
            "aggregate(zip_with(qq, qv, (a, b) -> CAST(a AS BIGINT) * b), 0L, (acc, p) -> acc + p)")
          .cast("double") / (col("qn8") * col("qnrm")), 6).as("q_cos"))
    // the per-query float budget, derived as a broadcast scalar (no
    // driver action; the oracle replays the same scalar subquery)
    val cmax = vs.agg(
      ceil(count(lit(1)) * screenFrac).cast("long").as("cmax"))
    val survivors = screen.crossJoin(broadcast(cmax))
      .withColumn("srk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("q_cos").desc, col("neighbor_id").asc)))
      .filter(col("srk") <= col("cmax"))
      .select("query_id", "neighbor_id")
    survivors
      .join(vs.as("a"), col("query_id") === col("a.vec_id"))
      .join(vs.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        Portable.cosine6(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm"))
          .as("cos_sim"))
      .transform(topK)
  }

  /** STAGED retrieval — the production ANN architecture in one query: an
    * ENSEMBLE candidate screen (IVF probe lists ∪ banded-LSH buckets) feeds
    * an exact cosine re-rank of the survivors only. The two generators fail
    * differently — IVF misses neighbors just across a centroid boundary,
    * hyperplane LSH misses moderate-cosine neighbors whose signatures
    * diverge — so the union's recall is ≥ either alone BY CONSTRUCTION
    * (superset screen + exact re-rank is monotone in the candidate set;
    * spec-asserted against the single-generator paths). Measured top-5
    * recall vs brute force at sf0.01: IVF 0.46, banded LSH 0.16,
    * ensemble ≥ IVF. The exact stage touches only screened candidates —
    * never the corpus — and each generator's cost is the already-bounded
    * cost of its standalone query. */
  def simRerank(spark: SparkSession, dir: String): DataFrame = {
    val vs = vectors(spark, dir).localCheckpoint()
    val cents = refineCentroids(vs, strideSeeds(vs)).localCheckpoint()
    val members = rankCentroids(vs, cents).filter(col("rk") === 1)
      .select("vec_id", "cent_id")
    val probes = rankCentroids(vs.filter(col("vec_id") < NumQueries), cents)
      .filter(col("rk") <= NProbe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("qc"))
    val ivfCand = broadcast(probes)
      .join(members, col("cent_id") === col("qc") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val sig = bandSignatures(spark, dir).localCheckpoint()
    val lshCand = sig.filter(col("vec_id") < NumQueries).as("x")
      .join(sig.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("y.vec_id") =!= col("x.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("neighbor_id"))
    val cand = ivfCand.unionByName(lshCand).distinct()
    cand
      .join(vs.as("a"), col("query_id") === col("a.vec_id"))
      .join(vs.as("b"), col("neighbor_id") === col("b.vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        Portable.cosine6(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .transform(topK)
  }

  /** Output dimensionality of [[simRandomProjection]] (64 → 8). */
  val ProjDims = 8

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss
    * style): each 64-dim embedding is projected onto [[ProjDims]] fixed
    * pseudo-random hyperplanes — the same plan-literal matrix the LSH
    * signatures use, so the projection is ONE map-side expression per
    * vector: no explode, no join, no shuffle (the output sort is the only
    * exchange). The compaction step before sketching / coarse clustering /
    * shipping vectors across the wire; sign-of-projection IS the LSH bit,
    * so [[simTopkLsh]] is exactly "this, quantized to 1 bit/dim". Long-form
    * output (vec_id, dim, proj) keeps the oracle's array-free hash compare
    * exact. */
  def simRandomProjection(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(ProjDims - 1)), j =>
          struct(j.cast("int").as("dim"),
            round(Portable.dot(col("v"), get(planesLit(ProjDims), j)), 6).as("proj"))))
          .as("p"))
      .select(col("vec_id"), col("p.dim").as("dim"), col("p.proj").as("proj"))
      .orderBy("vec_id", "dim")

  /** Vector-lake integrity audit — the embedding-side twin of the media
    * manifest check: per label shard, vector count, dimensionality
    * violations (every vector must be 64-dim), zero vectors (un-normalizable
    * — they poison cosine math downstream), norm extremes, and exact
    * duplicate vectors (distinct hashes of the 6-dp-rounded vector vs
    * rows). One pass, one hash aggregation; all metrics integer- or
    * single-op-exact. */
  def simVectorIntegrity(spark: SparkSession, dir: String): DataFrame =
    vectors(spark, dir)
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("label")), "vec_id")
      .select(col("label"), col("vec_id"), col("nrm"),
        size(col("v")).as("dim"),
        // portable content hash: micro-scaled INTEGER codes joined by ','
        // (double→string formatting differs across engines; i64 doesn't)
        md5(concat_ws(",", transform(col("v"),
          x => round(x * 1000000.0).cast("long").cast("string"))).cast("binary"))
          .as("vh"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("dim") =!= 64, 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        round(min("nrm"), 6).as("min_norm"),
        round(max("nrm"), 6).as("max_norm"),
        (count(lit(1)) - countDistinct(col("vh"))).as("n_dup_vectors"))
      .orderBy("label")

  // --- DuckDB oracles -------------------------------------------------------

  private val posAndNorm =
    """WITH pos AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS x
      |  FROM embeddings
      |), nrm AS (
      |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pos GROUP BY vec_id
      |)""".stripMargin

  /** Shared IVF centroid-assignment SQL (mirrors [[strideSeeds]] +
    * [[refineCentroids]] + [[rankCentroids]]): stride seeds → one rounded
    * Lloyd step → `ranked1(vec_id, cent_id, rk)`, the per-vector centroid
    * ranking both sim_topk_ivf and dedup_semantic consume. */
  private val ivfAssignSql =
    s"""$posAndNorm
       |, cdots AS (
       |  SELECT a.vec_id, b.vec_id AS cent_id, sum(a.x * b.x) AS dot
       |  FROM pos a JOIN pos b ON a.i = b.i
       |    AND b.vec_id % (SELECT CAST(ceil(count(*) / $IvfCentroids.0) AS BIGINT)
       |                    FROM embeddings) = 0
       |  GROUP BY a.vec_id, b.vec_id
       |), assign0 AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT c.vec_id, c.cent_id,
       |           row_number() OVER (PARTITION BY c.vec_id
       |             ORDER BY round(c.dot / (na.nrm * nc.nrm), 6) DESC, c.cent_id ASC) AS rk
       |    FROM cdots c
       |    JOIN nrm na ON c.vec_id = na.vec_id
       |    JOIN nrm nc ON c.cent_id = nc.vec_id
       |  ) WHERE rk = 1
       |), cent1 AS (
       |  SELECT a.cent_id, pos.i,
       |         round(CAST(sum(CAST(pos.x AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS cx
       |  FROM assign0 a JOIN pos ON pos.vec_id = a.vec_id
       |  GROUP BY a.cent_id, pos.i
       |), cn1 AS (
       |  SELECT cent_id, sqrt(sum(cx * cx)) AS cn FROM cent1 GROUP BY cent_id
       |), cdots1 AS (
       |  SELECT pos.vec_id, cent1.cent_id, sum(pos.x * cent1.cx) AS dot
       |  FROM pos JOIN cent1 ON pos.i = cent1.i
       |  GROUP BY pos.vec_id, cent1.cent_id
       |), ranked1 AS (
       |  SELECT c.vec_id, c.cent_id,
       |         row_number() OVER (PARTITION BY c.vec_id
       |           ORDER BY round(c.dot / (na.nrm * cn1.cn), 6) DESC, c.cent_id ASC) AS rk
       |  FROM cdots1 c
       |  JOIN nrm na ON c.vec_id = na.vec_id
       |  JOIN cn1 ON c.cent_id = cn1.cent_id
       |)""".stripMargin

  /** Shared planes+signature SQL (mirrors [[withBuckets]]). */
  private val sigSql =
    s""", planes AS (
       |  SELECT j, i,
       |         ((('0x' || substr(md5('plane' || '_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000))::DOUBLE / 1000.0 AS w
       |  FROM (SELECT unnest(generate_series(0, ${NumPlanes - 1})) AS j) js
       |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
       |), sig AS (
       |  SELECT vec_id,
       |         CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM (
       |    SELECT pos.vec_id, planes.j,
       |           round(list_reduce(list(pos.x * planes.w ORDER BY pos.i),
       |                             (x, y) -> x + y), 9) AS s
       |    FROM pos JOIN planes ON pos.i = planes.i
       |    GROUP BY pos.vec_id, planes.j
       |  ) sub
       |  GROUP BY vec_id
       |)""".stripMargin

  /** Banded planes+signature SQL (mirrors [[bandSignatures]]). */
  private val bandSigSql =
    s""", planes AS (
       |  SELECT j, i,
       |         ((('0x' || substr(md5('plane' || '_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000))::DOUBLE / 1000.0 AS w
       |  FROM (SELECT unnest(generate_series(0, ${DedupBands * DedupPlanesPerBand - 1})) AS j) js
       |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
       |), sig AS (
       |  SELECT vec_id, j // $DedupPlanesPerBand AS band,
       |         CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << (j % $DedupPlanesPerBand)) ELSE 0 END) AS BIGINT) AS bkt
       |  FROM (
       |    SELECT pos.vec_id, planes.j,
       |           round(list_reduce(list(pos.x * planes.w ORDER BY pos.i),
       |                             (x, y) -> x + y), 9) AS s
       |    FROM pos JOIN planes ON pos.i = planes.i
       |    GROUP BY pos.vec_id, planes.j
       |  ) sub
       |  GROUP BY vec_id, j // $DedupPlanesPerBand
       |)""".stripMargin

  /** Gated lane: INCREMENTAL ANN-INDEX MAINTENANCE from the lake's change
    * feed — the similarity and lakehouse families composed. The IVF
    * codebook trains ONCE on corpus v0 and freezes (production practice:
    * codebooks are versioned artifacts re-trained on drift, never per
    * commit); the inverted index then advances by assigning ONLY the
    * feed's arrival rows against the broadcast codebook and dropping
    * departed keys — O(|changes|·k) per refresh instead of the O(n·k)
    * full-corpus assignment. Scenario: every 50th vector is NEGATED
    * (its assignment provably moves), its original re-inserted under a
    * new id, every 37th erased. The oracle recomputes the merged
    * corpus's full assignment against the same v0-trained codebook — a
    * dropped, duplicated, or mis-assigned vector diverges the per-cell
    * histogram. */
  def simIndexCdc(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Lake
    val raw = Tables.embeddings(spark, dir)
    val t = Lake.create(spark, Lake.freshRoot(), raw, "vec_id", 4)
    // the one full-corpus pass: frozen codebook + the v0 inverted index
    val vs0 = vectors(spark, dir).localCheckpoint()
    val cents = refineCentroids(vs0, strideSeeds(vs0)).localCheckpoint()
    val index0 = rankCentroids(vs0, cents).filter(col("rk") === 1)
      .select("vec_id", "cent_id")
    val upd = raw.filter(col("vec_id") % 50 === 0)
      .withColumn("embedding", expr("transform(embedding, x -> -x)"))
    val ins = raw.filter(col("vec_id") % 50 === 0)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    t.merge(upd.unionByName(ins))
    t.delete(raw.filter(col("vec_id") % 37 === 0).select("vec_id"))
    // fold the feed: departures leave; arrivals assign against the
    // FROZEN broadcast codebook — the only per-refresh vector work
    // lazy: the final aggregate is the only action — its first branch
    // materializes the feed, the second reads the cached blocks
    val feed = t.changes(0, t.latestVersion).localCheckpoint(false)
    val departed = feed
      .filter(col("_change_type").isin("delete", "update_preimage"))
      .select("vec_id")
    val arrivals = feed
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("vec_id"), Portable.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Portable.l2norm(col("v")))
    val arrivalAssign = rankCentroids(arrivals, cents)
      .filter(col("rk") === 1).select("vec_id", "cent_id")
    index0.join(departed, Seq("vec_id"), "left_anti")
      .unionByName(arrivalAssign)
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vecs"),
        sum("vec_id").cast("long").as("sum_ids"))
      .orderBy("cent_id")
  }

  /** [[ivfAssignSql]] generalized to `steps` chained Lloyd refinements:
    * stride seeds → assign0, then per step s the refine block
    * (cent$s mean → cn$s norm → cdots$s products → ranked$s → assign$s).
    * Step 1's block is textually the [[ivfAssignSql]] block, so the two
    * generators cannot drift; the caller reads the final ranking from
    * `ranked<steps>`. A seed that attracts no vectors vanishes in the
    * GROUP BY, exactly as the engine's refine step drops it. */
  private def ivfAssignSqlSteps(steps: Int): String = {
    val sb = new StringBuilder(
      s"""$posAndNorm
         |, cdots AS (
         |  SELECT a.vec_id, b.vec_id AS cent_id, sum(a.x * b.x) AS dot
         |  FROM pos a JOIN pos b ON a.i = b.i
         |    AND b.vec_id % (SELECT CAST(ceil(count(*) / $IvfCentroids.0) AS BIGINT)
         |                    FROM embeddings) = 0
         |  GROUP BY a.vec_id, b.vec_id
         |), assign0 AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT c.vec_id, c.cent_id,
         |           row_number() OVER (PARTITION BY c.vec_id
         |             ORDER BY round(c.dot / (na.nrm * nc.nrm), 6) DESC, c.cent_id ASC) AS rk
         |    FROM cdots c
         |    JOIN nrm na ON c.vec_id = na.vec_id
         |    JOIN nrm nc ON c.cent_id = nc.vec_id
         |  ) WHERE rk = 1
         |)""".stripMargin)
    for (s <- 1 to steps) sb.append(
      s"""
         |, cent$s AS (
         |  SELECT a.cent_id, pos.i,
         |         round(CAST(sum(CAST(pos.x AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS cx
         |  FROM assign${s - 1} a JOIN pos ON pos.vec_id = a.vec_id
         |  GROUP BY a.cent_id, pos.i
         |), cn$s AS (
         |  SELECT cent_id, sqrt(sum(cx * cx)) AS cn FROM cent$s GROUP BY cent_id
         |), cdots$s AS (
         |  SELECT pos.vec_id, cent$s.cent_id, sum(pos.x * cent$s.cx) AS dot
         |  FROM pos JOIN cent$s ON pos.i = cent$s.i
         |  GROUP BY pos.vec_id, cent$s.cent_id
         |), ranked$s AS (
         |  SELECT c.vec_id, c.cent_id,
         |         row_number() OVER (PARTITION BY c.vec_id
         |           ORDER BY round(c.dot / (na.nrm * cn$s.cn), 6) DESC, c.cent_id ASC) AS rk
         |  FROM cdots$s c
         |  JOIN nrm na ON c.vec_id = na.vec_id
         |  JOIN cn$s ON c.cent_id = cn$s.cent_id
         |), assign$s AS (
         |  SELECT vec_id, cent_id FROM ranked$s WHERE rk = 1
         |)""".stripMargin)
    sb.toString
  }

  val oracle: Map[String, String] = Map(
    "sim_topk_ivf_hires" ->
      s"""${ivfAssignSqlSteps(HiResLloydSteps)}
         |, cand AS (
         |  SELECT q.vec_id AS query_id, m.vec_id AS neighbor_id
         |  FROM ranked$HiResLloydSteps q JOIN ranked$HiResLloydSteps m
         |    ON q.cent_id = m.cent_id AND m.rk = 1 AND m.vec_id <> q.vec_id
         |  WHERE q.rk <= $HiResNProbe AND q.vec_id < $NumQueries
         |), dots AS (
         |  SELECT cand.query_id, cand.neighbor_id, sum(a.x * b.x) AS dot
         |  FROM cand
         |  JOIN pos a ON a.vec_id = cand.query_id
         |  JOIN pos b ON b.vec_id = cand.neighbor_id AND a.i = b.i
         |  GROUP BY cand.query_id, cand.neighbor_id
         |), scored AS (
         |  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cos_sim
         |  FROM dots JOIN nrm nq ON query_id = nq.vec_id JOIN nrm nc ON neighbor_id = nc.vec_id
         |), rankedq AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM rankedq WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,
    "sim_topk_ivf_q8" ->
      s"""${ivfAssignSqlSteps(HiResLloydSteps)}
         |, cand AS (
         |  SELECT q.vec_id AS query_id, m.vec_id AS neighbor_id
         |  FROM ranked$HiResLloydSteps q JOIN ranked$HiResLloydSteps m
         |    ON q.cent_id = m.cent_id AND m.rk = 1 AND m.vec_id <> q.vec_id
         |  WHERE q.rk <= $HiResNProbe AND q.vec_id < $NumQueries
         |), mx8 AS (
         |  SELECT vec_id, max(abs(x)) AS m FROM pos GROUP BY vec_id
         |), qv8 AS (
         |  SELECT pos.vec_id, i,
         |         CASE WHEN m = 0.0 THEN 0 ELSE CAST(round(x * 127.0 / m) AS INTEGER) END AS qx
         |  FROM pos JOIN mx8 ON pos.vec_id = mx8.vec_id
         |), qn8 AS (
         |  SELECT vec_id, sqrt(sum(CAST(qx AS DOUBLE) * qx)) AS nrm
         |  FROM qv8 GROUP BY vec_id
         |), screen AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |         round(CAST(sum(CAST(q.qx AS BIGINT) * c.qx) AS DOUBLE)
         |               / (nq.nrm * nc.nrm), 6) AS q_cos
         |  FROM cand
         |  JOIN qv8 q ON q.vec_id = cand.query_id
         |  JOIN qv8 c ON c.vec_id = cand.neighbor_id AND q.i = c.i
         |  JOIN qn8 nq ON cand.query_id = nq.vec_id
         |  JOIN qn8 nc ON cand.neighbor_id = nc.vec_id
         |  GROUP BY cand.query_id, cand.neighbor_id, nq.nrm, nc.nrm
         |), survivors AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY q_cos DESC, neighbor_id ASC) AS srk
         |    FROM screen
         |  ) WHERE srk <= (SELECT CAST(ceil(count(*) * $ScreenFrac) AS BIGINT)
         |                  FROM embeddings)
         |), d AS (
         |  SELECT s.query_id, s.neighbor_id, sum(a.x * b.x) AS dot
         |  FROM survivors s
         |  JOIN pos a ON a.vec_id = s.query_id
         |  JOIN pos b ON b.vec_id = s.neighbor_id AND a.i = b.i
         |  GROUP BY s.query_id, s.neighbor_id
         |), scored AS (
         |  SELECT query_id, neighbor_id, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
         |  FROM d JOIN nrm na ON query_id = na.vec_id JOIN nrm nb ON neighbor_id = nb.vec_id
         |), rankedq AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM rankedq WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,

    "sim_index_cdc" ->
      s"""$ivfAssignSql
         |, mpos AS (
         |  SELECT vec_id, i,
         |         CASE WHEN vec_id % 50 = 0 THEN -x ELSE x END AS x
         |  FROM pos WHERE vec_id % 37 <> 0
         |  UNION ALL
         |  SELECT vec_id + 1000000, i, x FROM pos WHERE vec_id % 50 = 0
         |), mnrm AS (
         |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM mpos GROUP BY vec_id
         |), mdots AS (
         |  SELECT mpos.vec_id, cent1.cent_id, sum(mpos.x * cent1.cx) AS dot
         |  FROM mpos JOIN cent1 ON mpos.i = cent1.i
         |  GROUP BY mpos.vec_id, cent1.cent_id
         |), mranked AS (
         |  SELECT d.vec_id, d.cent_id,
         |         row_number() OVER (PARTITION BY d.vec_id
         |           ORDER BY round(d.dot / (mn.nrm * cn1.cn), 6) DESC,
         |                    d.cent_id ASC) AS rk
         |  FROM mdots d
         |  JOIN mnrm mn ON d.vec_id = mn.vec_id
         |  JOIN cn1 ON d.cent_id = cn1.cent_id
         |)
         |SELECT cent_id, count(*) AS n_vecs,
         |       CAST(sum(vec_id) AS BIGINT) AS sum_ids
         |FROM mranked WHERE rk = 1
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sim_vector_integrity" ->
      """WITH v AS (
        |  SELECT vec_id, label,
        |         len(embedding) AS dim,
        |         sqrt(list_reduce(list_transform(embedding, x -> x::DOUBLE * x), (a, b) -> a + b)) AS nrm,
        |         md5(array_to_string(list_transform(embedding,
        |               x -> CAST(round(x::DOUBLE * 1000000.0) AS BIGINT)), ',')) AS vh
        |  FROM embeddings
        |)
        |SELECT label, count(*) AS n_vectors,
        |       CAST(count(*) FILTER (WHERE dim <> 64) AS BIGINT) AS n_bad_dim,
        |       CAST(count(*) FILTER (WHERE nrm = 0.0) AS BIGINT) AS n_zero,
        |       round(min(nrm), 6) AS min_norm,
        |       round(max(nrm), 6) AS max_norm,
        |       CAST(count(*) - count(DISTINCT vh) AS BIGINT) AS n_dup_vectors
        |FROM v GROUP BY label ORDER BY label""".stripMargin,

    "sim_rerank" ->
      s"""$ivfAssignSql
         |$bandSigSql
         |, icand AS (
         |  SELECT q.vec_id AS query_id, m.vec_id AS neighbor_id
         |  FROM ranked1 q JOIN ranked1 m
         |    ON q.cent_id = m.cent_id AND m.rk = 1 AND m.vec_id <> q.vec_id
         |  WHERE q.rk <= $NProbe AND q.vec_id < $NumQueries
         |), lcand AS (
         |  SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id
         |  FROM sig x JOIN sig y ON x.band = y.band AND x.bkt = y.bkt
         |  WHERE x.vec_id < $NumQueries AND y.vec_id <> x.vec_id
         |), cand AS (
         |  SELECT query_id, neighbor_id FROM icand
         |  UNION
         |  SELECT query_id, neighbor_id FROM lcand
         |), d AS (
         |  SELECT c.query_id, c.neighbor_id, sum(a.x * b.x) AS dot
         |  FROM cand c
         |  JOIN pos a ON a.vec_id = c.query_id
         |  JOIN pos b ON b.vec_id = c.neighbor_id AND a.i = b.i
         |  GROUP BY c.query_id, c.neighbor_id
         |), scored AS (
         |  SELECT query_id, neighbor_id, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
         |  FROM d
         |  JOIN nrm na ON query_id = na.vec_id
         |  JOIN nrm nb ON neighbor_id = nb.vec_id
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,

    "sim_random_projection" ->
      s"""$posAndNorm
         |, planes AS (
         |  SELECT j, i,
         |         ((('0x' || substr(md5('plane' || '_' || j || '_' || i), 1, 15))::BIGINT % 2001 - 1000))::DOUBLE / 1000.0 AS w
         |  FROM (SELECT unnest(generate_series(0, ${ProjDims - 1})) AS j) js
         |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) dims
         |)
         |SELECT pos.vec_id, CAST(planes.j AS INTEGER) AS dim,
         |       round(list_reduce(list(pos.x * planes.w ORDER BY pos.i),
         |                         (x, y) -> x + y), 6) AS proj
         |FROM pos JOIN planes ON pos.i = planes.i
         |GROUP BY pos.vec_id, planes.j
         |ORDER BY vec_id, dim""".stripMargin,

    "sim_label_centroids" ->
      """SELECT label, CAST(i AS INTEGER) AS dim,
        |       round(CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS centroid,
        |       count(*) AS n_vectors
        |FROM (
        |  SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS x
        |  FROM embeddings
        |)
        |GROUP BY label, i
        |ORDER BY label, dim""".stripMargin,

    "sim_topk_quantized" ->
      s"""WITH pos AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS x
         |  FROM embeddings
         |), mx AS (
         |  SELECT vec_id, max(abs(x)) AS m FROM pos GROUP BY vec_id
         |), qv AS (
         |  SELECT pos.vec_id, i,
         |         CASE WHEN m = 0.0 THEN 0 ELSE CAST(round(x * 127.0 / m) AS INTEGER) END AS qx
         |  FROM pos JOIN mx ON pos.vec_id = mx.vec_id
         |), qn AS (
         |  SELECT vec_id, sqrt(sum(CAST(qx AS DOUBLE) * qx)) AS nrm FROM qv GROUP BY vec_id
         |), d AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         CAST(sum(CAST(q.qx AS BIGINT) * c.qx) AS DOUBLE) AS dot
         |  FROM qv q JOIN qv c ON q.i = c.i AND q.vec_id < $NumQueries AND c.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, c.vec_id
         |), scored AS (
         |  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cos_sim
         |  FROM d JOIN qn nq ON query_id = nq.vec_id JOIN qn nc ON neighbor_id = nc.vec_id
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,

    "sim_topk_bruteforce" ->
      s"""$posAndNorm
         |, d AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.x * c.x) AS dot
         |  FROM pos q JOIN pos c ON q.i = c.i AND q.vec_id < $NumQueries AND c.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, c.vec_id
         |), scored AS (
         |  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cos_sim
         |  FROM d JOIN nrm nq ON query_id = nq.vec_id JOIN nrm nc ON neighbor_id = nc.vec_id
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,

    "sim_topk_lsh" ->
      s"""$posAndNorm$sigSql
         |, d AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM sig q JOIN sig c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NumQueries
         |), dots AS (
         |  SELECT d.query_id, d.neighbor_id, sum(a.x * b.x) AS dot
         |  FROM d JOIN pos a ON a.vec_id = d.query_id JOIN pos b ON b.vec_id = d.neighbor_id AND a.i = b.i
         |  GROUP BY d.query_id, d.neighbor_id
         |), scored AS (
         |  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cos_sim
         |  FROM dots JOIN nrm nq ON query_id = nq.vec_id JOIN nrm nc ON neighbor_id = nc.vec_id
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,

    "sim_topk_ivf" ->
      s"""$ivfAssignSql
         |, cand AS (
         |  SELECT q.vec_id AS query_id, m.vec_id AS neighbor_id
         |  FROM ranked1 q JOIN ranked1 m
         |    ON q.cent_id = m.cent_id AND m.rk = 1 AND m.vec_id <> q.vec_id
         |  WHERE q.rk <= $NProbe AND q.vec_id < $NumQueries
         |), dots AS (
         |  SELECT cand.query_id, cand.neighbor_id, sum(a.x * b.x) AS dot
         |  FROM cand
         |  JOIN pos a ON a.vec_id = cand.query_id
         |  JOIN pos b ON b.vec_id = cand.neighbor_id AND a.i = b.i
         |  GROUP BY cand.query_id, cand.neighbor_id
         |), scored AS (
         |  SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cos_sim
         |  FROM dots JOIN nrm nq ON query_id = nq.vec_id JOIN nrm nc ON neighbor_id = nc.vec_id
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM scored
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,

    "dedup_semantic" ->
      s"""$ivfAssignSql
         |, members AS (
         |  SELECT vec_id, cent_id,
         |         row_number() OVER (PARTITION BY cent_id ORDER BY vec_id) AS srk
         |  FROM ranked1 WHERE rk = 1
         |), pairs AS (
         |  -- same bounded pair window as the Spark side: each member vs its
         |  -- up-to-$SemDedupPairWindow immediate lower-id cluster-mates
         |  SELECT a.cent_id AS cluster_id, a.vec_id AS va, b.vec_id AS vb
         |  FROM members a JOIN members b
         |    ON a.cent_id = b.cent_id AND a.srk < b.srk
         |   AND a.srk >= b.srk - $SemDedupPairWindow
         |), dots AS (
         |  SELECT pairs.cluster_id, pairs.va, pairs.vb, sum(p.x * q.x) AS dot
         |  FROM pairs
         |  JOIN pos p ON p.vec_id = pairs.va
         |  JOIN pos q ON q.vec_id = pairs.vb AND p.i = q.i
         |  GROUP BY pairs.cluster_id, pairs.va, pairs.vb
         |), scored AS (
         |  SELECT cluster_id, vb AS drop_id,
         |         round(dot / (na.nrm * nb.nrm), 6) AS cos
         |  FROM dots JOIN nrm na ON va = na.vec_id JOIN nrm nb ON vb = nb.vec_id
         |)
         |SELECT cluster_id, drop_id, max(cos) AS dup_score
         |FROM scored
         |GROUP BY cluster_id, drop_id
         |HAVING max(cos) >= $SemDedupTau
         |ORDER BY drop_id""".stripMargin,

    "sim_topk_pq" ->
      s"""$posAndNorm
         |, sub AS (
         |  SELECT vec_id, (i - 1) // $PqSubDim AS m,
         |         i - ((i - 1) // $PqSubDim) * $PqSubDim AS il, x
         |  FROM pos
         |), cents AS (
         |  SELECT vec_id AS cent_id, m, il, x AS cx
         |  FROM sub WHERE vec_id % (SELECT CAST(ceil(count(*) / $PqCodewords.0) AS BIGINT)
         |                           FROM embeddings) = 0
         |), cn2 AS (
         |  SELECT cent_id, m,
         |         list_reduce(list(cx * cx ORDER BY il), (a, b) -> a + b) AS cn2
         |  FROM cents GROUP BY cent_id, m
         |), d2 AS (
         |  SELECT s.vec_id, s.m, c.cent_id,
         |         round(list_reduce(list((s.x - c.cx) * (s.x - c.cx) ORDER BY s.il),
         |                           (a, b) -> a + b), 6) AS d2
         |  FROM sub s JOIN cents c ON s.m = c.m AND s.il = c.il
         |  GROUP BY s.vec_id, s.m, c.cent_id
         |), codes AS (
         |  SELECT vec_id, m, cent_id AS code FROM (
         |    SELECT vec_id, m, cent_id,
         |           row_number() OVER (PARTITION BY vec_id, m
         |             ORDER BY d2 ASC, cent_id ASC) AS rk
         |    FROM d2
         |  ) WHERE rk = 1
         |), rnorm AS (
         |  SELECT codes.vec_id,
         |         sqrt(CAST(sum(CAST(cn2.cn2 AS DECIMAL(38,18))) AS DOUBLE)) AS rn
         |  FROM codes JOIN cn2 ON codes.m = cn2.m AND codes.code = cn2.cent_id
         |  GROUP BY codes.vec_id
         |), qtab AS (
         |  SELECT s.vec_id AS query_id, s.m, c.cent_id AS code,
         |         round(list_reduce(list(s.x * c.cx ORDER BY s.il),
         |                           (a, b) -> a + b), 9) AS pdot
         |  FROM sub s JOIN cents c ON s.m = c.m AND s.il = c.il
         |  WHERE s.vec_id < $NumQueries
         |  GROUP BY s.vec_id, s.m, c.cent_id
         |), scored AS (
         |  SELECT q.query_id, codes.vec_id AS neighbor_id,
         |         CAST(sum(CAST(q.pdot AS DECIMAL(38,18))) AS DOUBLE) AS dot
         |  FROM codes JOIN qtab q ON codes.m = q.m AND codes.code = q.code
         |  WHERE codes.vec_id <> q.query_id
         |  GROUP BY q.query_id, codes.vec_id
         |), cossim AS (
         |  SELECT query_id, neighbor_id,
         |         round(dot / (nq.nrm * rnorm.rn), 6) AS cos_sim
         |  FROM scored
         |  JOIN nrm nq ON query_id = nq.vec_id
         |  JOIN rnorm ON neighbor_id = rnorm.vec_id
         |), ranked AS (
         |  SELECT query_id, neighbor_id, cos_sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
         |  FROM cossim
         |)
         |SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rk <= $TopK
         |ORDER BY query_id ASC, cos_sim DESC, neighbor_id ASC""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""$posAndNorm$bandSigSql
         |, cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM sig x JOIN sig y ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id < y.vec_id
         |), dots AS (
         |  SELECT cand.vec_a, cand.vec_b, sum(p.x * q.x) AS dot
         |  FROM cand
         |  JOIN pos p ON p.vec_id = cand.vec_a
         |  JOIN pos q ON q.vec_id = cand.vec_b AND p.i = q.i
         |  GROUP BY cand.vec_a, cand.vec_b
         |)
         |SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
         |FROM dots JOIN nrm na ON vec_a = na.vec_id JOIN nrm nb ON vec_b = nb.vec_id
         |WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,

    "sim_knn_graph" ->
      s"""$posAndNorm$bandSigSql
         |, cand AS (
         |  SELECT DISTINCT x.vec_id AS src_id, y.vec_id AS nbr_id
         |  FROM sig x JOIN sig y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.vec_id <> y.vec_id
         |), dots AS (
         |  SELECT cand.src_id, cand.nbr_id, sum(p.x * q.x) AS dot
         |  FROM cand
         |  JOIN pos p ON p.vec_id = cand.src_id
         |  JOIN pos q ON q.vec_id = cand.nbr_id AND p.i = q.i
         |  GROUP BY cand.src_id, cand.nbr_id
         |), scored AS (
         |  SELECT src_id, nbr_id, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
         |  FROM dots
         |  JOIN nrm na ON src_id = na.vec_id
         |  JOIN nrm nb ON nbr_id = nb.vec_id
         |), ranked AS (
         |  SELECT src_id, nbr_id, cos_sim,
         |         CAST(row_number() OVER (PARTITION BY src_id
         |           ORDER BY cos_sim DESC, nbr_id ASC) AS INTEGER) AS rk
         |  FROM scored
         |)
         |SELECT src_id, nbr_id, cos_sim, rk
         |FROM ranked WHERE rk <= $KnnK ORDER BY src_id, rk""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_index_cdc"       -> (simIndexCdc _),
    "sim_topk_bruteforce" -> (simTopkBruteforce _),
    "sim_topk_lsh"        -> (simTopkLsh _),
    "dedup_embedding_lsh" -> (dedupEmbeddingLsh _),
    "sim_knn_graph"       -> (simKnnGraph _),
    "sim_topk_ivf"        -> (simTopkIvf _),
    "sim_topk_ivf_hires"  -> (simTopkIvfHighRecall _),
    "sim_topk_ivf_q8"     -> (simTopkIvfQ8 _),
    "dedup_semantic"      -> (dedupSemantic _),
    "sim_topk_quantized"  -> (simTopkQuantized _),
    "sim_topk_pq"         -> (simTopkPq _),
    "sim_label_centroids" -> (simLabelCentroids _),
    "sim_rerank"          -> (simRerank _),
    "sim_random_projection" -> (simRandomProjection _),
    "sim_vector_integrity" -> (simVectorIntegrity _),
  )
}
