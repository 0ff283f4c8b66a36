package graft.extensions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Tables

/** Deduplication operators over the `documents` / `embeddings` tables —
  * exact, n-gram-Jaccard, MinHash+LSH banding, and embedding-cosine near-dup.
  * All pure DataFrame dataflow with portable hashing, each with an exact
  * DuckDB oracle generated from the SAME constants (single source of truth).
  *
  * Scale shapes:
  *  - exact: one hash aggregation on md5(text) — the canonical 100 TB dedup.
  *  - ngram-Jaccard: shingle-inverted-index self-join; exact but quadratic in
  *    per-shingle frequency. The scale path is minhash_lsh below, which
  *    bounds candidate generation by band-bucket size.
  *  - minhash_lsh: signatures via ONE hash aggregation with 32 min()
  *    buffers, banding via an in-row band explode, candidates via bucket
  *    self-join — every stage is a bounded hash shuffle.
  */
object Dedup {

  /** Exact duplicate groups by content hash; keep_id = min doc_id. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id")

  /** Prefix length (codepoints) for [[dedupVerbatimPrefix]]. */
  val PrefixLen = 80

  /** Truncation-duplicate detection — the dedup stage exact hashing misses:
    * a document cut off mid-crawl (or re-scraped with a longer tail) hashes
    * differently yet shares a long verbatim PREFIX with its source. Hash
    * the first [[PrefixLen]] codepoints, group, and report every group
    * with more than one member; the `n_lengths` column distinguishes true
    * truncation groups (n_lengths > 1) from same-length groups, which are
    * plain exact-prefix dups (already handled by [[dedupExact]] when the
    * whole text matches). Same one-hash-aggregation scale shape as
    * exact dedup; prefix hashing is stateless map work. Only docs at least
    * [[PrefixLen]] long participate — a short doc equal to another's
    * prefix is containment's job ([[dedupContainment]]), not truncation's. */
  def dedupVerbatimPrefix(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= PrefixLen)
      .select(col("doc_id"), md5(substring(col("text"), 1, PrefixLen)).as("prefix_hash"),
        length(col("text")).cast("long").as("n_chars_actual"))
      .groupBy("prefix_hash")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("n_chars_actual")).as("n_lengths"),
        min(col("doc_id")).as("keep_id"),
        max(col("n_chars_actual")).as("longest"),
        min(col("n_chars_actual")).as("shortest"))
      .filter(col("n_docs") > 1)
      .orderBy("keep_id")

  /** Segment length (tokens) for the line-level global dedup below — the
    * "line"/paragraph unit of CCNet-style cross-corpus dedup. The synthetic
    * corpus has no newlines, so fixed-width non-overlapping token segments
    * stand in for lines; on real text, substitute `split(text, '\n')` for
    * the segmenter and the rest of the dataflow is unchanged. */
  val SegLen = 10

  /** Line-level (segment-level) GLOBAL dedup — the CCNet/RefinedWeb stage
    * that removes a line from every document but its first occurrence
    * corpus-wide (killing boilerplate headers/footers that exact and
    * near-dup doc-level passes both miss). Per doc: segments and tokens
    * before/after the removal.
    *
    * Scale shape: segments are built IN-ROW (one pass, no shuffle), keyed
    * by their 60-bit hash — the only shuffled payload is (hash, doc_id,
    * seg_id, len). First-occurrence election is a hash aggregation
    * (`min(struct(doc_id, seg_id))` — partial aggregation makes a
    * billion-copy boilerplate segment a non-event, where a row_number
    * window over the segment key would sort that key's entire partition),
    * then one join back on the hash and a per-doc re-aggregation. Three
    * bounded shuffles total, each on an 8-byte key. */
  def dedupLinesGlobal(spark: SparkSession, dir: String): DataFrame = {
    // Materialized once: consumed by the first-occurrence agg AND the
    // join-back (lazily the segment build would run twice).
    val segs = Tables.fanOut(Tables.documents(spark, dir).select("doc_id", "text"))
      .select(col("doc_id"), Portable.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), floor((size(col("toks")) + SegLen - 1) / SegLen).cast("int") - 1),
          i => slice(col("toks"), i * SegLen + 1, lit(SegLen)))))
      .select(col("doc_id"), col("pos").cast("long").as("seg_id"),
        Portable.hash60(array_join(col("col"), " ")).as("seg_h"),
        size(col("col")).cast("long").as("seg_n"))
      .localCheckpoint()
    val first = segs.groupBy("seg_h")
      .agg(min(struct(col("doc_id"), col("seg_id"))).as("fo"))
    segs.join(first, "seg_h")
      .withColumn("kept",
        col("doc_id") === col("fo.doc_id") && col("seg_id") === col("fo.seg_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_segs_kept"),
        sum(col("seg_n")).as("n_tokens"),
        sum(when(col("kept"), col("seg_n")).otherwise(0L)).as("n_tokens_kept"))
      .orderBy("doc_id")
  }

  /** (doc_id, 60-bit shingle hash) — the one shingle source, shared by the
    * Jaccard, MinHash, and contamination paths, which all key their
    * shuffles on this 8-byte hash (never the shingle string). Tokens are
    * projected into a column BEFORE the shingle lambda touches them:
    * composing shingles3(tokens(text)) directly would re-inline the regex
    * split into every element_at inside the lambda (~3× per shingle —
    * measured 20× slower). Hashing inside the lambda vs after the explode
    * is plan-equivalent (column pruning drops the string before any
    * exchange either way); the lambda form just keeps one definition. */
  private def docShingleHashes(spark: SparkSession, dir: String): DataFrame =
    docShingleHashesOf(Tables.documents(spark, dir))

  /** [[docShingleHashes]] over an arbitrary document relation — the
    * incremental pipelines shingle only the ARRIVING batch through the
    * exact same formula (shared code, not a mirrored copy: the
    * incremental builds' correctness gate is bit-equality with the
    * batch lanes that use the dir-based form). */
  private[extensions] def docShingleHashesOf(docs: DataFrame): DataFrame =
    Tables.fanOut(docs.select("doc_id", "text"))
      .select(col("doc_id"), Portable.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(transform(Portable.shingles3(col("toks")), s => Portable.hash60(s))).as("h"))

  /** Corpus novelty curve — the redundancy-growth diagnostic a corpus
    * builder watches while ingesting: per document (in doc_id ingestion
    * order), the fraction of its distinct word-3-gram shingles never seen
    * in any EARLIER document. A healthy growing corpus holds novelty high;
    * decay toward 0 means new data is re-crawling what's already there
    * (the signal for stopping or re-weighting a source). First occurrence
    * is one min-aggregation on the 8-byte shingle hash (skew-safe — a
    * boilerplate shingle collapses map-side, same shape as
    * dedup_lines_global's election), joined back to the shingle relation;
    * no pair expansion anywhere. */
  def dedupNoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingleHashes(spark, dir).localCheckpoint()
    val first = sh.groupBy("h").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 6))
      .orderBy("doc_id")
  }

  /** Document-frequency cap for the Jaccard shingle space: shingles present
    * in more than this many documents (boilerplate headers, license blurbs)
    * are excluded from BOTH the intersection and the per-doc set size, so
    * the score stays an exact Jaccard — over the capped feature set. Bounds
    * the inverted-index pair expansion at ≤ cap²/2 per shingle. No shingle
    * reaches the cap at the test SFs (max df = 7 at sf0.01), so results
    * equal the uncapped semantics there. */
  val MaxShingleDf = 50

  /** Near-dup pairs by exact word-3-gram Jaccard ≥ 0.8 (threshold chosen to
    * isolate the planted near-duplicates; rounded before thresholding),
    * computed over the df-capped shingle space ([[MaxShingleDf]]).
    * Shingles are joined on their 60-bit hash, not the string — an 8-byte
    * shuffle key instead of ~20-char strings; the oracle hashes identically,
    * so even a collision (P ≈ n²/2^61) yields the same result both sides. */
  /** Shared core of the exact shingle-overlap detectors: (per-doc capped
    * set sizes `sz(doc_id, n)`, pair intersection counts
    * `inter(doc_a, doc_b, c)`) over the df-capped shingle space. */
  private def cappedPairCounts(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    cappedPairCountsFrom(docShingleHashes(spark, dir), MaxShingleDf)

  /** Same machinery over ANY (doc_id, h) feature relation — shared by the
    * word-shingle detectors above and the character-window substring
    * detector below. */
  private[graft] def cappedPairCountsFrom(sh: DataFrame, cap: Int): (DataFrame, DataFrame) = {
    // Capped posting lists in ONE bounded aggregation: minK(cap+1) keeps at
    // most cap+1 sorted doc_ids per shingle — length cap+1 ⟺ df > cap, so
    // the filter IS the document-frequency cap, exactly, and a boilerplate
    // shingle's aggregation state never exceeds cap+1 entries (the previous
    // formulation needed a df-count pass + broadcast anti-join + re-group,
    // evaluating the shingle scan three times). Surviving lists are the
    // FULL posting lists, already sorted; sizes and pairs both derive from
    // this one small relation with no further scan of the corpus.
    // The posting relation feeds THREE consumers downstream (pair expansion
    // plus both sides of the size join) — left lazy, each consumer replays
    // the full corpus scan + aggregation (the UDAF's ObjectHashAggregate
    // defeats ReuseExchange, measured 3 scans in the plan), so it
    // materializes once here. It is the df-capped index: bounded rows,
    // orders of magnitude smaller than the corpus it indexes.
    val minCap = udaf(new graft.ops.MinKDistinctAggregator(cap + 1))
    val posting = sh.groupBy("h").agg(minCap(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= cap)
      .localCheckpoint()
    val sz = posting.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    // Inverted-index pair expansion: ordered pairs in-task from the sorted
    // list — ≤ cap²/2 pairs per shingle, no skew bomb from boilerplate.
    val inter = posting
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("c"))
    (sz, inter)
  }

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val (sz, inter) = cappedPairCounts(spark, dir)
    inter
      .join(sz.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sz.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("c").cast("double") / (col("na.n") + col("nb.n") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  /** Containment flag threshold for [[dedupContainment]]. */
  val ContainmentTau = 0.9

  /** Asymmetric n-gram CONTAINMENT near-dup: C = |A∩B| / min(|A|, |B|) —
    * the smaller document's fraction inside the larger. Jaccard misses
    * subset copies (a quote or excerpt inside a much longer doc scores
    * |A∩B|/|A∪B| ≈ |A|/|B| → low); containment is the standard complement
    * that catches them. Same df-capped posting relation as
    * [[dedupNgramJaccard]] — one extra division, zero extra scans. */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame = {
    val (sz, inter) = cappedPairCounts(spark, dir)
    inter
      .join(sz.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sz.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("c").cast("double") / least(col("na.n"), col("nb.n")), 6).as("containment"))
      .filter(col("containment") >= ContainmentTau)
      .orderBy("doc_a", "doc_b")
  }

  /** Character-window length for [[dedupSubstring]] — pairs are flagged
    * when they share any exact run of this many characters. */
  val SubstringWindow = 40

  /** EXACT substring duplication (the "deduplicating training data"
    * substring-match pass, Lee et al. 2021, arXiv:2107.06499 — there via
    * suffix arrays): doc pairs sharing at least one exact
    * [[SubstringWindow]]-char run, with the count of distinct shared
    * windows. Every-position character windows guarantee any shared
    * substring of length ≥ window is found (recall 1 at the window
    * length); windows are hashed to 60 bits before any shuffle and pair
    * expansion runs over df-capped posting lists ([[cappedPairCountsFrom]])
    * so boilerplate runs cannot go quadratic.
    *
    * Scale shape: the feature relation is O(total chars) rows — linear,
    * like tokenization, but with a bigger constant. At 100 TB run the
    * winnowed fingerprint ([[graft.extensions.TextAnalysis]] winnow) as
    * the sublinear candidate screen first and this operator as the exact
    * verifier over candidate pairs only; the windows-at-every-position
    * relation here is what makes that verification exact. */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    val k = SubstringWindow
    // No per-doc distinct here: posting lists deduplicate doc_ids anyway
    // (MinKDistinctAggregator keeps distinct values), and shared-window
    // counts read the h-level posting lists, so within-doc repeats of a
    // window cannot affect any output — they only add rare extra rows
    // cheaper than a per-doc hash-set pass over every 260-element array.
    val wins = Tables.fanOut(Tables.documents(spark, dir)
        .filter(length(col("text")) >= k)
        .select("doc_id", "text"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), length(col("text")) - (k - 1)),
          i => Portable.hash60(col("text").substr(i, lit(k))))).as("h"))
    val (_, inter) = cappedPairCountsFrom(wins, MaxShingleDf)
    inter
      .select(col("doc_a"), col("doc_b"), col("c").as("n_shared_windows"))
      .orderBy("doc_a", "doc_b")
  }

  /** Benchmark prefix for [[dedupContamination]]: doc_id < this stands in
    * for the held-out eval corpus a real pipeline decontaminates against. */
  val ContaminationBenchDocs = 50
  private val ContaminationTau = 0.8

  /** Benchmark decontamination (the GPT-3/Llama-style training-data hygiene
    * pass): for every corpus document, the fraction of its distinct word-
    * 3-gram shingles that appear ANYWHERE in the benchmark set, flagged at
    * ≥ 0.8 overlap. Scale shape: the benchmark shingle set is built once
    * and is small relative to the corpus (eval suites vs 100 TB), so the
    * membership probe is a broadcast left join on 60-bit shingle hashes;
    * corpus-side work is one map-side counted aggregation per doc — nothing
    * quadratic, nothing keyed on the (skewed) shingle. */
  def dedupContamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingleHashes(spark, dir)
      .select(col("doc_id"), col("h").as("s"))
    val bench = sh.filter(col("doc_id") < ContaminationBenchDocs)
      .select(col("s"), lit(1).as("hit")).distinct()
    sh.filter(col("doc_id") >= ContaminationBenchDocs)
      .join(broadcast(bench), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_shingles"), 6).as("contamination"))
      .withColumn("flagged", col("contamination") >= ContaminationTau)
      .orderBy("doc_id")
  }

  /** [[dedupContamination]] with a Bloom-filter semi-join prefilter — the
    * scale path for when the reference set is itself large (decontaminating
    * against an existing corpus rather than a small eval suite, where a raw
    * broadcast hash relation would be multi-GB). The benchmark shingle set
    * is aggregated into ONE Bloom filter (distributed partial merge, OR is
    * commutative so the bit array is partitioning-independent); the ~256 KB
    * bit array ships as a literal and corpus shingles are probed in-scan, so
    * only survivors (true hits + fpp × corpus) reach the exact confirm join
    * — shuffle volume stops scaling with the corpus. Bloom filters have no
    * false negatives and the confirm join removes false positives, so the
    * result is bit-identical to [[dedupContamination]] (same oracle SQL).
    * This is Spark's own `InjectRuntimeFilter` pattern, staged explicitly
    * via [[org.apache.spark.sql.graft.GraftBloom]]. */
  def dedupContaminationBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.GraftBloom
    val sh = docShingleHashes(spark, dir).select(col("doc_id"), col("h").as("s"))
    val bench = sh.filter(col("doc_id") < ContaminationBenchDocs)
      .select(col("s")).distinct()
    // Stage 1 — distributed Bloom build; only the bit array reaches the
    // driver. Fixed geometry (estItems, numBits) keeps the false-positive
    // set deterministic across partitionings.
    val bloomBytes = bench
      .agg(GraftBloom.bloomAgg(col("s"), 100000L, 1L << 21).as("bf"))
      .head().getAs[Array[Byte]](0)
    val corpus = sh.filter(col("doc_id") >= ContaminationBenchDocs)
    val totals = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    // Stage 2 — in-scan probe, then exact confirmation of survivors only.
    val hits = corpus
      .filter(GraftBloom.mightContain(lit(bloomBytes), col("s")))
      .join(bench, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contamination",
        round(col("n_overlap").cast("double") / col("n_shingles"), 6))
      .withColumn("flagged", col("contamination") >= ContaminationTau)
      .orderBy("doc_id")
  }

  // MinHash parameters — k hashes in b bands of r rows. The (a_i, b_i) affine
  // coefficients are fixed by seed so the DuckDB oracle embeds identical
  // literals (generated below from the same arrays).
  val K = 32; val Bands = 8; val R = 4
  private val (minhashA, minhashB) = {
    val rnd = new scala.util.Random(7)
    def draw() = Array.fill(K)(1L + (rnd.nextLong().abs % (Portable.P31 - 1)))
    (draw(), draw())
  }

  /** Generic (id, band, bkt) MinHash-LSH banding over any (id, `h`)
    * element relation (`h` already reduced mod P31). The whole signature
    * is ONE hash aggregation with 32 min() buffers over the element
    * hashes (map-side partial min → tiny shuffle), not a crossJoin with
    * the parameter table — the shuffled volume is O(ids × 32),
    * independent of element count. Shared by the text shingle paths here
    * and the frame-set (video) path in [[Multimodal]]. */
  private[extensions] def minhashBandBuckets(hs: DataFrame, id: String): DataFrame = {
    val minCols = (0 until K).map { i =>
      min((lit(minhashA(i)) * col("h") + lit(minhashB(i))) % Portable.P31).as(s"mh$i")
    }
    val sig = hs.groupBy(id).agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until R).map(r => col(s"mh${b * R + r}").cast("string")): _*).as("bkt"))
    }
    sig.select(col(id), explode(array(bandCols: _*)).as("bb"))
      .select(col(id), col("bb.band").as("band"), col("bb.bkt").as("bkt"))
  }

  /** (doc_id, band, bkt) over the document shingle hashes — the relation
    * shared by the pair, verified, and incremental paths. */
  private def minhashBuckets(spark: SparkSession, dir: String): DataFrame =
    minhashBucketsOf(docShingleHashes(spark, dir))

  /** (doc_id, band, bkt) from a shingle-hash relation (raw `h`, as
    * [[docShingleHashesOf]] emits) — the df-parameterized twin. */
  private[extensions] def minhashBucketsOf(sh: DataFrame): DataFrame =
    minhashBandBuckets(
      sh.select(col("doc_id"), (col("h") % Portable.P31).as("h")), "doc_id")

  /** Exact Jaccard (df-uncapped shingle space) on a candidate-pair relation:
    * |candidates| × |shingles-per-doc| work, never a corpus cross product. */
  private def jaccardOnCandidates(spark: SparkSession, dir: String,
                                  cand: DataFrame): DataFrame =
    // Three consumers (size agg + both join probes) — materialize once.
    jaccardOnCandidatesOf(docShingleHashes(spark, dir).localCheckpoint(), cand)

  /** Exact-Jaccard verification against a caller-supplied shingle-hash
    * relation — the df-parameterized twin (caller materializes `sh`). */
  private[extensions] def jaccardOnCandidatesOf(sh: DataFrame,
                                                cand: DataFrame): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    inter
      .join(sz.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sz.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("c").cast("double") / (col("na.n") + col("nb.n") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  /** MinHash-LSH candidate pairs: docs sharing any full band of the 32-hash
    * signature. Candidate generation only (verify with dedupNgramJaccard on
    * candidates in a real pipeline). */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // Materialized once: the self-join below would otherwise run the whole
    // signature computation (shingle scan + 32-way min agg) per side.
    val buckets = minhashBuckets(spark, dir).localCheckpoint()
    buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup banding: 60-bit band split for hamming-≤-3 search. */
  val SimhashBands = 4; val SimhashBandBits = 15
  private val SimhashBandMask = (1 << SimhashBandBits) - 1

  /** SimHash near-dup pairs: hamming distance ≤ 3 over the 60-bit token
    * SimHash ([[TextAnalysis.textSimhash]]). Candidate generation is the
    * classic pigeonhole band split (Manku/Jain/Sarma, WWW'07 §3): with the
    * signature cut into 4 disjoint 15-bit bands, any pair within hamming 3
    * agrees EXACTLY on at least one band, so the band-bucket equi-join has
    * recall 1 — this is an exact algorithm with the all-pairs cross product
    * replaced by a bounded hash join. Verify = bit_count(xor) on candidates.
    * At 100 TB every stage is a hash shuffle bounded by bucket size; the
    * 15-bit bands give 32768 buckets per band (widen bands as the corpus
    * grows to keep buckets small). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // Materialized once: the self-join below would otherwise run the whole
    // SimHash computation (token explode + two aggregations) per side.
    val banded = TextAnalysis.simhashSigs(spark, dir)
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(SimhashBands - 1))).as("band"))
      .select(col("doc_id"), col("simhash"), col("band"),
        expr(s"shiftright(simhash, band * $SimhashBandBits) & $SimhashBandMask").as("bkt"))
      .localCheckpoint()
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("CAST(bit_count(x.simhash ^ y.simhash) AS INT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct() // a pair may agree on more than one band
      .orderBy("doc_a", "doc_b")
  }

  /** The production near-dup PIPELINE as one query: MinHash-LSH candidate
    * generation ([[dedupMinhashLsh]]) followed by exact Jaccard
    * verification on the candidates only — sketch recall, exact precision.
    * At 100 TB the verify join touches |candidates| × |shingles-per-doc|
    * rows (bounded by band-bucket sizes), never the corpus cross product;
    * this is the composition SCALING.md names as the default dedup path. */
  def dedupMinhashVerified(spark: SparkSession, dir: String): DataFrame =
    jaccardOnCandidates(spark, dir,
        dedupMinhashLsh(spark, dir).select("doc_a", "doc_b"))
      .orderBy("doc_a", "doc_b")

  /** Batch boundary for [[dedupIncremental]]: doc_id < this is the already-
    * deduplicated corpus; the rest is the incoming batch. */
  val IncrementalSplit = 200

  /** INCREMENTAL dedup — the steady-state pipeline op: an incoming batch is
    * screened against the existing corpus, and a batch doc is dropped when
    * it is a verified near-dup (LSH band-bucket candidate + exact Jaccard
    * ≥ 0.8) of any existing doc. Output is one row per batch doc with the
    * canonical existing doc it duplicates (min id), or kept = true.
    * Intra-batch duplicates are NOT dropped here — that is the batch-level
    * clustering pass ([[dedupClusters]]); splitting the two keeps the
    * incremental screen a pure existing⋈batch join, which at 100 TB probes
    * only the batch's band-buckets against the corpus index instead of
    * re-pairing the whole corpus. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val b = minhashBuckets(spark, dir)
    val ex = b.filter(col("doc_id") < IncrementalSplit).as("e")
    val nw = b.filter(col("doc_id") >= IncrementalSplit).as("n")
    val cand = ex.join(nw,
        col("e.band") === col("n.band") && col("e.bkt") === col("n.bkt"))
      .select(col("e.doc_id").as("doc_a"), col("n.doc_id").as("doc_b"))
      .distinct()
    val verified = jaccardOnCandidates(spark, dir, cand)
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= IncrementalSplit)
      .select(col("doc_id"))
      .join(verified.select(col("doc_b").as("doc_id"), col("doc_a")), Seq("doc_id"), "left")
      .groupBy("doc_id").agg(min(col("doc_a")).as("dup_of"))
      .select(col("doc_id"), col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy("doc_id")
  }

  /** Duplicate-CLUSTER assignment — the step that turns near-dup PAIRS into
    * deduplicated output. Pair detectors (MinHash, SimHash, embedding LSH)
    * emit edges; transitively-connected docs form one duplicate cluster, and
    * the pipeline keeps one canonical member per cluster. Connected
    * components over the verified pair graph ([[dedupMinhashVerified]]) via
    * distributed hash-min label propagation ([[graft.ops.Graph]]), then
    * every corpus doc gets (cluster_id = component min, cluster_size,
    * is_canonical). Unpaired docs are their own singleton cluster, so the
    * result is a total partition of the corpus — `WHERE is_canonical` IS the
    * deduplicated view. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupMinhashVerified(spark, dir).select("doc_a", "doc_b")
    graft.ops.Graph.clusterAssign(
        Tables.documents(spark, dir), "doc_id", pairs, "doc_a", "doc_b")
      .orderBy("doc_id")
  }

  /** Cross-source duplication matrix — which sources copy which: verified
    * near-dup pairs ([[dedupMinhashVerified]]) joined to each endpoint's
    * source, aggregated per (canonically ordered) source pair. The
    * curation report that re-weights or drops a source whose content is
    * largely mirrored elsewhere; intra-source cells measure internal
    * redundancy. Two id-keyed joins over the (small) verified pair set —
    * the expensive part is the already-bounded LSH+verify pipeline. */
  def dedupSourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    dedupMinhashVerified(spark, dir).select("doc_a", "doc_b")
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .groupBy(least(col("sa"), col("sb")).as("source_x"),
        greatest(col("sa"), col("sb")).as("source_y"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_x", "source_y")
  }

  /** Input fence for [[dedupEmbedding]]: the brute-force pair join runs
    * over at most this many vectors (deterministic `vec_id` prefix),
    * bounding its pair work at Cap²/2 REGARDLESS of corpus size. */
  val DedupEmbeddingBaselineCap = 2048

  /** Embedding-cosine near-dup pairs (τ = 0.45, rounded before threshold).
    * This is the DIFFERENTIAL BASELINE for the bucketed twins
    * ([[Similarity.dedupEmbeddingLsh]] / semantic dedup) — intentionally
    * exact and quadratic, and therefore FENCED IN CODE: only the first
    * [[DedupEmbeddingBaselineCap]] vec_ids enter the self-join (the oracle
    * applies the same predicate), so no input scale can make this query
    * plan an unbounded O(n²) join. Production near-dup at corpus scale is
    * the LSH path; this exists to measure its recall on a fixed slice. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val n = Similarity.vectors(spark, dir)
      .filter(col("vec_id") < DedupEmbeddingBaselineCap)
    // Both predicates written INTO the join condition, cheap leg first:
    // a post-join filter gets pushed in FRONT of the inequality, making the
    // nested-loop evaluate the 64-dim dot for all n² ordered pairs instead
    // of n²/2 (measured 2×).
    val cos = Portable.cosine6(col("x.v"), col("y.v"), col("x.nrm"), col("y.nrm"))
    n.as("x")
      .join(n.as("y"), col("x.vec_id") < col("y.vec_id") && cos >= 0.45)
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        cos.as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Fuzzy name matching: distinct part names within edit distance 2
    * (dedup-by-typo), blocked on a SOUND length-band key: |len(a)−len(b)| ≤ 2
    * is necessary for edit distance ≤ 2, so recall is exactly 1 (a first-char
    * blocker would drop every planted pair here — the typos hit the first
    * word). Each name gets keys len..len+2; requiring the matched key to
    * equal max(len_a, len_b) makes every eligible pair collide on EXACTLY
    * one key, so the join needs no post-dedup. The plan is an equi-join on
    * the band key (hash exchange) — no cross product. At open-vocabulary
    * scale the next refinement is q-gram prefix filtering on top of the same
    * inverted-index machinery as [[dedupNgramJaccard]]. */
  def dedupFuzzyNames(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name")).distinct()
    val keyed = names.select(col("p_name"),
      explode(sequence(length(col("p_name")), length(col("p_name")) + 2)).as("blk"))
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.blk") === col("y.blk") && col("x.p_name") < col("y.p_name") &&
          col("x.blk") === greatest(length(col("x.p_name")), length(col("y.p_name"))))
      .select(col("x.p_name").as("name_a"), col("y.p_name").as("name_b"),
        levenshtein(col("x.p_name"), col("y.p_name")).as("dist"))
      .filter(col("dist") <= 2)
      .orderBy("name_a", "name_b")
  }

  // --- DuckDB oracles -------------------------------------------------------

  private val shinglesSql =
    """WITH t AS (
      |  SELECT doc_id,
      |         CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, unnest(
      |    CASE WHEN len(toks) < 3 THEN []
      |         ELSE list_distinct(list_transform(generate_series(1, len(toks) - 2),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) END) AS s
      |  FROM t
      |)""".stripMargin

  private[extensions] val paramsValues = (0 until K)
    .map(i => s"(${i}, ${minhashA(i)}, ${minhashB(i)})").mkString(", ")

  /** CTE chain ending in `buckets(doc_id, band, bkt)` — the oracle twin of
    * the MinHash signature/banding pipeline, shared by the candidate and
    * candidate+verify queries. */
  private val minhashBucketsCtes =
    s"""$shinglesSql
       |, hs AS (
       |  SELECT doc_id, (('0x' || substr(md5(s), 1, 15))::BIGINT) % 2147483647 AS h FROM sh
       |), params(i, a, b) AS (VALUES $paramsValues),
       |sig AS (
       |  SELECT doc_id, i, min((a * h + b) % 2147483647) AS mh
       |  FROM hs CROSS JOIN params GROUP BY doc_id, i
       |), buckets AS (
       |  SELECT doc_id, i // 4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkt
       |  FROM sig GROUP BY doc_id, i // 4
       |)""".stripMargin

  /** CTE chain `minhashBucketsCtes + cand(candSql) + exact-Jaccard verify`,
    * ending in `vpairs(doc_a, doc_b, jaccard)` — parametrized by the
    * candidate-generation SQL so the all-pairs and incremental
    * (existing⋈batch) paths share the verification oracle. */
  private def verifiedCtesFor(candSql: String) =
    s"""$minhashBucketsCtes
       |, cand AS (
       |$candSql
       |), vshh AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS s FROM sh
       |), vsz AS (SELECT doc_id, count(*) AS n FROM vshh GROUP BY doc_id),
       |vinter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS c
       |  FROM cand c
       |  JOIN vshh a ON a.doc_id = c.doc_a
       |  JOIN vshh b ON b.doc_id = c.doc_b AND b.s = a.s
       |  GROUP BY c.doc_a, c.doc_b
       |), vpairs AS (
       |  SELECT doc_a, doc_b,
       |         round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
       |  FROM vinter
       |  JOIN vsz na ON doc_a = na.doc_id
       |  JOIN vsz nb ON doc_b = nb.doc_id
       |  WHERE round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) >= 0.8
       |)""".stripMargin

  private val allPairsCandSql =
    """  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM buckets x JOIN buckets y
      |    ON x.band = y.band AND x.bkt = y.bkt AND x.doc_id < y.doc_id""".stripMargin

  /** Shared with TextAnalysis' cluster-split oracle. */
  private[extensions] val verifiedPairsCtes = verifiedCtesFor(allPairsCandSql)

  /** Connected components as a recursive CTE over the verified pair graph +
    * total cluster assignment (`assigned`: every doc, its component min) —
    * shared by the dedup_clusters and text_cluster_split oracles. */
  private[extensions] val clusterAssignCtes: String =
    s"""${verifiedPairsCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")}
       |, gedges AS (
       |  SELECT doc_a AS n, doc_b AS m FROM vpairs
       |  UNION SELECT doc_b, doc_a FROM vpairs
       |), reach AS (
       |  SELECT n AS node, n AS lbl FROM gedges
       |  UNION
       |  SELECT e.m AS node, r.lbl FROM reach r JOIN gedges e ON e.n = r.node
       |), comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
       |assigned AS (
       |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
       |)""".stripMargin

  private val incrementalCandSql =
    s"""  SELECT DISTINCT e.doc_id AS doc_a, n.doc_id AS doc_b
       |  FROM buckets e JOIN buckets n ON e.band = n.band AND e.bkt = n.bkt
       |  WHERE e.doc_id < $IncrementalSplit AND n.doc_id >= $IncrementalSplit""".stripMargin

  private val contaminationSql =
    s"""$shinglesSql
       |, shh AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS s FROM sh
       |), bench AS (
       |  SELECT DISTINCT s FROM shh WHERE doc_id < $ContaminationBenchDocs
       |), ov AS (
       |  SELECT c.doc_id, count(*) AS n_shingles, count(b.s) AS n_overlap
       |  FROM shh c LEFT JOIN bench b ON c.s = b.s
       |  WHERE c.doc_id >= $ContaminationBenchDocs
       |  GROUP BY c.doc_id
       |)
       |SELECT doc_id, n_shingles, n_overlap,
       |       round(CAST(n_overlap AS DOUBLE) / n_shingles, 6) AS contamination,
       |       round(CAST(n_overlap AS DOUBLE) / n_shingles, 6) >= $ContaminationTau AS flagged
       |FROM ov ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_lines_global" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CASE WHEN trim(text) = '' THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS toks
         |  FROM documents
         |), segs AS (
         |  SELECT doc_id, g AS seg_id,
         |         ('0x' || substr(md5(array_to_string(toks[g*$SegLen+1 : g*$SegLen+$SegLen], ' ')), 1, 15))::BIGINT AS seg_h,
         |         len(toks[g*$SegLen+1 : g*$SegLen+$SegLen]) AS seg_n
         |  FROM t, (SELECT unnest(generate_series(0, CAST(ceil(len(toks) / $SegLen.0) AS BIGINT) - 1)) AS g) gs
         |  WHERE len(toks) > 0
         |), mk AS (
         |  SELECT doc_id, seg_id, seg_n,
         |         row_number() OVER (PARTITION BY seg_h ORDER BY doc_id, seg_id) AS rn
         |  FROM segs
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
         |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_segs_kept,
         |       CAST(sum(seg_n) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN rn = 1 THEN seg_n ELSE 0 END) AS BIGINT) AS n_tokens_kept
         |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_incremental" ->
      s"""${verifiedCtesFor(incrementalCandSql)}
         |SELECT d.doc_id, min(v.doc_a) AS dup_of,
         |       min(v.doc_a) IS NULL AS kept
         |FROM documents d LEFT JOIN vpairs v ON v.doc_b = d.doc_id
         |WHERE d.doc_id >= $IncrementalSplit
         |GROUP BY d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_fuzzy_names" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |keyed AS (
        |  SELECT p_name, unnest(generate_series(length(p_name), length(p_name) + 2)) AS blk
        |  FROM names
        |)
        |SELECT x.p_name AS name_a, y.p_name AS name_b,
        |       CAST(levenshtein(x.p_name, y.p_name) AS INTEGER) AS dist
        |FROM keyed x JOIN keyed y
        |  ON x.blk = y.blk AND x.p_name < y.p_name
        | AND x.blk = greatest(length(x.p_name), length(y.p_name))
        |WHERE levenshtein(x.p_name, y.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "dedup_source_overlap" ->
      s"""$verifiedPairsCtes
         |, ds AS (SELECT doc_id, source FROM documents)
         |SELECT least(sa.source, sb.source) AS source_x,
         |       greatest(sa.source, sb.source) AS source_y,
         |       count(*) AS n_pairs
         |FROM vpairs
         |JOIN ds sa ON vpairs.doc_a = sa.doc_id
         |JOIN ds sb ON vpairs.doc_b = sb.doc_id
         |GROUP BY least(sa.source, sb.source), greatest(sa.source, sb.source)
         |ORDER BY source_x, source_y""".stripMargin,

    "dedup_novelty_curve" ->
      s"""$shinglesSql
         |, hs AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh
         |), first AS (
         |  SELECT h, min(doc_id) AS first_doc FROM hs GROUP BY h
         |)
         |SELECT hs.doc_id, count(*) AS n_shingles,
         |       CAST(sum(CASE WHEN hs.doc_id = first.first_doc THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_novel,
         |       round(CAST(sum(CASE WHEN hs.doc_id = first.first_doc THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*), 6) AS novelty
         |FROM hs JOIN first ON hs.h = first.h
         |GROUP BY hs.doc_id ORDER BY hs.doc_id""".stripMargin,

    "dedup_verbatim_prefix" ->
      s"""WITH p AS (
         |  SELECT doc_id, md5(substr(text, 1, $PrefixLen)) AS prefix_hash,
         |         CAST(length(text) AS BIGINT) AS n_chars_actual
         |  FROM documents WHERE length(text) >= $PrefixLen
         |)
         |SELECT prefix_hash, count(*) AS n_docs,
         |       count(DISTINCT n_chars_actual) AS n_lengths,
         |       min(doc_id) AS keep_id,
         |       max(n_chars_actual) AS longest,
         |       min(n_chars_actual) AS shortest
         |FROM p GROUP BY prefix_hash HAVING count(*) > 1
         |ORDER BY keep_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""$shinglesSql
         |, shh0 AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS s FROM sh
         |), heavy AS (
         |  SELECT s FROM shh0 GROUP BY s HAVING count(*) > $MaxShingleDf
         |), shh AS (
         |  SELECT * FROM shh0 WHERE s NOT IN (SELECT s FROM heavy)
         |), sz AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
         |  FROM shh x JOIN shh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id
         |)
         |SELECT doc_a, doc_b,
         |       round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
         |FROM inter
         |JOIN sz na ON doc_a = na.doc_id
         |JOIN sz nb ON doc_b = nb.doc_id
         |WHERE round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_substring" ->
      s"""WITH w AS (
         |  SELECT DISTINCT doc_id,
         |         ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), $SubstringWindow)), 1, 15))::BIGINT AS h
         |  FROM documents,
         |       LATERAL unnest(range(1, CAST(length(text) - ${SubstringWindow - 1} AS BIGINT) + 1)) AS t(i)
         |  WHERE length(text) >= $SubstringWindow
         |), heavy AS (
         |  SELECT h FROM w GROUP BY h HAVING count(*) > $MaxShingleDf
         |), wc AS (
         |  SELECT * FROM w WHERE h NOT IN (SELECT h FROM heavy)
         |)
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared_windows
         |FROM wc x JOIN wc y ON x.h = y.h AND x.doc_id < y.doc_id
         |GROUP BY x.doc_id, y.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_containment" ->
      s"""$shinglesSql
         |, shh0 AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS s FROM sh
         |), heavy AS (
         |  SELECT s FROM shh0 GROUP BY s HAVING count(*) > $MaxShingleDf
         |), shh AS (
         |  SELECT * FROM shh0 WHERE s NOT IN (SELECT s FROM heavy)
         |), sz AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         |inter AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS c
         |  FROM shh x JOIN shh y ON x.s = y.s AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id
         |)
         |SELECT doc_a, doc_b,
         |       round(CAST(c AS DOUBLE) / least(na.n, nb.n), 6) AS containment
         |FROM inter
         |JOIN sz na ON doc_a = na.doc_id
         |JOIN sz nb ON doc_b = nb.doc_id
         |WHERE round(CAST(c AS DOUBLE) / least(na.n, nb.n), 6) >= $ContainmentTau
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""$minhashBucketsCtes
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |FROM buckets x JOIN buckets y
         |  ON x.band = y.band AND x.bkt = y.bkt AND x.doc_id < y.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash_verified" ->
      s"""$verifiedPairsCtes
         |SELECT doc_a, doc_b, jaccard FROM vpairs
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Connected components as a recursive CTE: `reach` is the transitive
    // closure of the symmetrized pair graph carrying candidate labels;
    // min(lbl) per node = the component's min doc_id — the same fixpoint the
    // Spark side reaches by distributed label propagation.
    "dedup_clusters" ->
      s"""$clusterAssignCtes
         |SELECT doc_id, cluster_id,
         |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |       doc_id = cluster_id AS is_canonical
         |FROM assigned
         |ORDER BY doc_id""".stripMargin,

    "dedup_contamination" -> contaminationSql,

    // The Bloom prefilter is exact-result-preserving (no false negatives +
    // confirm join), so the bloom variant shares the plain oracle verbatim.
    "dedup_contamination_bloom" -> contaminationSql,

    "dedup_simhash" ->
      s"""${TextAnalysis.simhashCtes}
         |, banded AS (
         |  SELECT doc_id, simhash, band,
         |         (simhash >> (band * $SimhashBandBits)) & $SimhashBandMask AS bkt
         |  FROM sims CROSS JOIN
         |       (SELECT unnest(generate_series(0, ${SimhashBands - 1})) AS band) bs
         |)
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |       CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
         |FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bkt = y.bkt AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embedding" ->
      s"""WITH pos AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS v
        |  FROM embeddings
        |  WHERE vec_id < $DedupEmbeddingBaselineCap  -- same code-enforced fence as the Spark side
        |), n AS (
        |  SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM pos GROUP BY vec_id
        |), d AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot
        |  FROM pos a JOIN pos b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY a.vec_id, b.vec_id
        |)
        |SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        |FROM d JOIN n na ON vec_a = na.vec_id JOIN n nb ON vec_b = nb.vec_id
        |WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> (dedupExact _),
    "dedup_verbatim_prefix" -> (dedupVerbatimPrefix _),
    "dedup_novelty_curve" -> (dedupNoveltyCurve _),
    "dedup_source_overlap" -> (dedupSourceOverlap _),
    "dedup_lines_global"  -> (dedupLinesGlobal _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_containment"   -> (dedupContainment _),
    "dedup_substring"     -> (dedupSubstring _),
    "dedup_minhash_lsh"   -> (dedupMinhashLsh _),
    "dedup_minhash_verified" -> (dedupMinhashVerified _),
    "dedup_clusters"      -> (dedupClusters _),
    "dedup_incremental"   -> (dedupIncremental _),
    "dedup_simhash"       -> (dedupSimhash _),
    "dedup_contamination" -> (dedupContamination _),
    "dedup_contamination_bloom" -> (dedupContaminationBloom _),
    "dedup_embedding"     -> (dedupEmbedding _),
    "dedup_fuzzy_names"   -> (dedupFuzzyNames _),
  )
}
