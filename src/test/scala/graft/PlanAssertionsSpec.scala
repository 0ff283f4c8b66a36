package graft

import graft.queries.{DblpAnalog, Tpch}

/** Locks the physical-plan properties the engine's scale story depends on —
  * pushdown, pruned scans, distributed top-k, broadcast dimensions — so a
  * regression in plan shape fails CI, not a cluster run. */
class PlanAssertionsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate predicate reaches the parquet scan; schema pruned") {
    val p = planOf(Tpch.q1PricingSummary(spark, sf))
    p should include ("PushedFilters")
    p should include regex "LessThanOrEqual\\(l_shipdate"
    // only the 7 needed columns are read, not the 11-column table
    p should not include "l_orderkey"
  }

  test("q3: global top-10 is TakeOrderedAndProject, not sort+limit") {
    val p = planOf(Tpch.q3ShippingPriority(spark, sf))
    p should include ("TakeOrderedAndProject")
  }

  test("q5: constant-size dimensions broadcast") {
    val p = planOf(Tpch.q5LocalSupplierVolume(spark, sf))
    p should include ("BroadcastHashJoin")
  }

  test("t1: per-group top-k limit is pushed below the window (WindowGroupLimit)") {
    // Spark plans partial+final WindowGroupLimit: each map task keeps only
    // its local top-10 per venue BEFORE the exchange — the eviction-map
    // optimization the reference hand-rolled, applied distributedly.
    val p = planOf(DblpAnalog.t1TopAuthorsPerVenue(spark, sf))
    p should include ("WindowGroupLimit")
  }

  test("t2: gaps-and-islands plan carries no array aggregation state") {
    val p = planOf(DblpAnalog.t2ConsecutiveYears(spark, sf))
    p should not include "collect_list"
    p should not include "collect_set"
  }

  test("q1 and text_stats run inside whole-stage codegen") {
    // AQE shows codegen only in the FINAL plan, as "*(id)" stage markers —
    // execute, then require the hot operators inside a codegen stage.
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect(); df.queryExecution.executedPlan.toString
    }
    val q1 = finalPlan(Tpch.q1PricingSummary(spark, sf))
    q1 should include regex """\*\(\d+\) HashAggregate"""
    q1 should include regex """\*\(\d+\) Filter"""
    finalPlan(graft.extensions.TextAnalysis.textStats(spark, sf)) should
      include regex """\*\(\d+\) Project"""
  }

  test("range join: tiny interval dim broadcasts; fact side never shuffles for the join") {
    val p = planOf(Tpch.qRangeJoinPriceTiers(spark, sf))
    p should include ("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
  }

  test("grouping sets: one Expand pass, no per-level re-aggregation unions") {
    val p = planOf(Tpch.qGroupingSets(spark, sf))
    "Expand".r.findAllIn(p).size shouldBe 1
    p should not include "Union"
  }

  test("winnow fingerprint: bottom-5 per doc is one bounded aggregation, no wide arrays") {
    val p = planOf(graft.extensions.TextAnalysis.textWinnowFingerprint(spark, sf))
    // typed min-k aggregator → ObjectHashAggregate with partial merge;
    // no collect_list buffers, no distinct-then-window double exchange
    p should include ("ObjectHashAggregate")
    p should not include "collect_list"
    // fan-out repartition + agg + final orderBy; the fan-out exchange
    // carries the narrow (doc_id, text) projection, never the grams
    "Exchange".r.findAllIn(p).size shouldBe 3
  }

  test("pii_scrub: stateless map work — no join, no aggregation, pruned scan") {
    val p = planOf(graft.extensions.Privacy.piiScrub(spark, sf))
    p should not include "Join"
    p should not include "HashAggregate"
    p should not include "props" // unused JSON column never read
  }

  test("url_domains: one partial+final aggregation pair on the domain key") {
    val p = planOf(graft.extensions.Privacy.urlDomains(spark, sf))
    p should not include "Join"
    p should include ("HashAggregate")
  }

  test("bm25/tfidf: final plan reads the materialized index, not the corpus again") {
    // the per-doc index relation is built in one pass and materialized;
    // a parquet scan in the FINAL plan would mean the corpus is re-read
    // per consumer (the 4-scan shape the one-pass rewrite removed)
    planOf(graft.extensions.TextAnalysis.textBm25(spark, sf)) should
      not include "Scan parquet"
    planOf(graft.extensions.TextAnalysis.textTfidfKeywords(spark, sf)) should
      not include "Scan parquet"
  }

  test("binned range join: hash equi-join on the bin id, never a nested loop") {
    val p = planOf(Tpch.qRangeJoinBinned(spark, sf))
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    p should include ("BroadcastHashJoin") // bins dim broadcast, keyed join
  }

  test("triangles: all three joins are hash joins over the checkpointed edges") {
    val p = planOf(DblpAnalog.coauthorTriangles(spark, sf))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // oriented edges materialize once (localCheckpoint), not re-derived 3x
    p should include ("Scan ExistingRDD")
  }

  test("weighted sample: global top-k plans as TakeOrderedAndProject") {
    val p = planOf(graft.extensions.TextAnalysis.textWeightedSample(spark, sf))
    p should include ("TakeOrderedAndProject")
    p should not include "Join"
  }

  test("q4: EXISTS plans as a semi join — no row multiplication") {
    val p = planOf(Tpch.q4OrderPriority(spark, sf))
    p should include ("LeftSemi")
    // returnflag filter reaches the lineitem scan, not the join
    p should include regex "PushedFilters.*l_returnflag"
  }

  test("q18: HAVING set joins back without a second lineitem pass") {
    val p = planOf(Tpch.q18LargeOrders(spark, sf))
    "Scan parquet.*lineitem".r.findAllIn(p).size shouldBe 1
    p should include ("TakeOrderedAndProject")
  }

  test("q22: scalar avg broadcasts; recent-order screen is an anti join") {
    val p = planOf(Tpch.q22LapsedCustomers(spark, sf))
    p should include ("LeftAnti")
    p should include ("BroadcastExchange") // 1-row scalar side
  }

  test("heavy hitters: sketch is a bounded object agg, screen broadcasts, no vocab join") {
    val p = planOf(graft.extensions.TextAnalysis.textHeavyHitters(spark, sf))
    p should include ("ObjectHashAggregate") // Misra-Gries typed aggregator
    p should include ("BroadcastExchange")   // 1-row candidate/total screen
    p should not include "SortMergeJoin"     // candidates never shuffle-join
  }

  test("daily OHLC: both window directions and the final agg share one exchange") {
    val p = planOf(graft.extensions.Events.eventsDailyOhlc(spark, sf))
    // hash exchange on (type, day) + the final presentation sort — nothing else
    "Exchange".r.findAllIn(p).size shouldBe 2
  }

  test("cohort retention: stream collapses to distinct pairs before any join") {
    val p = planOf(graft.extensions.Events.eventsCohortRetention(spark, sf))
    // the purchase filter reaches the scan; no events-wide join appears
    p should include regex "PushedFilters.*event_type"
  }

  test("clustering coefficient: no cartesian work; edges materialize once") {
    val p = planOf(graft.queries.DblpAnalog.coauthorClusteringCoeff(spark, sf))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include ("Scan ExistingRDD") // localCheckpoint'd edge list
  }

  test("PIT lookup plans through the native as-of operator") {
    val p = planOf(graft.extensions.Events.eventsPitJoin(spark, sf))
    p should include ("AsOfJoin")
  }

  test("market basket: pairs expand in-row — no basket-level self-join") {
    val p = planOf(Tpch.qMarketBasket(spark, sf))
    p should include ("Generate") // the in-row pair explode
    p should not include "CartesianProduct"
    // statistics sides are broadcast, never shuffled joins of the pair rel
    p should include ("BroadcastHashJoin")
    // the only nested-loop is the 1-row total-baskets scalar cross join
    "BroadcastNestedLoopJoin".r.findAllIn(p).size should be <= 1
  }

  test("chunking is shuffle-free map work until the output sort") {
    val p = planOf(graft.extensions.TextAnalysis.textChunkOverlap(spark, sf))
    p should not include "HashAggregate"
    p should not include "Join"
    // exchanges: the opt-in fanOut round-robin + the final range sort only
    "hashpartitioning".r.findAllIn(p).size shouldBe 0
  }

  test("random projection: no join, no aggregation — matrix is a plan literal") {
    val p = planOf(graft.extensions.Similarity.simRandomProjection(spark, sf))
    p should not include "Join"
    p should not include "HashAggregate"
  }

  test("neighborhood Jaccard: hash joins only over checkpointed backbone") {
    val p = planOf(graft.queries.DblpAnalog.coauthorNeighborJaccard(spark, sf))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include ("Scan ExistingRDD")
  }

  test("erasure cascade: key-only semi joins, no row payload movement") {
    val p = planOf(graft.extensions.Privacy.privacyErasure(spark, sf))
    p should include ("LeftSemi")
    // no wide columns cross an exchange: scans read only the key columns
    p should not include "o_totalprice"
    p should not include "l_extendedprice"
  }

  test("media decode: stateless map work — no join, no agg, sort is the only exchange") {
    for (df <- Seq(graft.extensions.Multimodal.multimodalDecodeImage(spark, sf),
      graft.extensions.Multimodal.multimodalDecodeAudio(spark, sf))) {
      val p = planOf(df)
      p should not include "Join"
      p should not include "HashAggregate"
      // exactly the fan-out round-robin (parallelism decoupling) and the
      // output sort's range exchange — never a hash shuffle
      "Exchange".r.findAllIn(p).size shouldBe 2
      p should include ("rangepartitioning")
      p should not include "hashpartitioning"
    }
  }

  test("rolling median: window runs over the reduced daily relation, not raw events") {
    val df = graft.extensions.Events.eventsRollingMedian(spark, sf)
    val p = planOf(df)
    p should include ("Window")
    // the daily aggregation (partial+final) sits BELOW the window — the
    // window's input is types × days, never the event stream. Plans print
    // top-down, so the upstream aggregate appears AFTER the window node.
    p.indexOf("Window") should be < p.indexOf("HashAggregate")
  }

  test("integrity audit: one lineitem/customer scan, two slim orders scans") {
    val p = planOf(Tpch.qIntegrityAudit(spark, sf))
    "lineitem.parquet".r.findAllIn(p).size shouldBe 1
    "customer.parquet".r.findAllIn(p).size shouldBe 1
    "orders.parquet".r.findAllIn(p).size shouldBe 2 // key-only projections
  }

  test("modality routing: one documents scan, no union fan-out") {
    val p = planOf(graft.extensions.Multimodal.multimodalRoute(spark, sf))
    "documents.parquet".r.findAllIn(p).size shouldBe 1
    p should not include "Union"
  }

  test("image near-dup: banded pair generation is an equi-join, never all-pairs") {
    val p = planOf(graft.extensions.Multimodal.multimodalImageNeardup(spark, sf))
    p should not include "NestedLoop"
    p should not include "CartesianProduct"
  }

  test("incremental curation: one index probe join, never corpus×corpus") {
    // the steady-state contract: candidates come from ONE existing⋈batch
    // equi-join (hash exchange), with no nested-loop/cartesian anywhere
    val p = planOf(graft.extensions.Multimodal.multimodalCurationIncremental(spark, sf))
    p should not include "NestedLoop"
    p should not include "CartesianProduct"
    "SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r.findAllIn(p).size should be >= 1
  }

  test("audio shingle near-dup: pair work is posting-list expansion, no pair join at all") {
    // pairs come from in-task expansion of df-capped posting lists — no
    // join of the shingle relation against itself anywhere (the quadratic
    // shape this design avoids). The capped ObjectHashAggregate itself is
    // not visible here: the posting relation localCheckpoints (it feeds
    // three consumers), so the final plan reads the materialized index.
    val p = planOf(graft.extensions.Multimodal.multimodalAudioShingleNeardup(spark, sf))
    p should not include "NestedLoop"
    p should not include "CartesianProduct"
    p should not include "Scan parquet" // everything flows from the checkpointed index
  }

  test("jpeg decode: stateless map lane — no shuffle before the output sort") {
    val p = planOf(graft.extensions.Multimodal.multimodalDecodeJpeg(spark, sf))
    // one exchange total: the final range partitioning for the sort (the
    // fan-out repartition is round-robin inside the same count)
    "Exchange rangepartitioning".r.findAllIn(p).size shouldBe 1
    p should not include "SortMergeJoin"
    p should not include "HashAggregate"
  }

  test("gif/mulaw/av/flac decode lanes: stateless map work — sort is the only exchange") {
    for (df <- Seq(
        graft.extensions.Multimodal.multimodalDecodeGif(spark, sf),
        graft.extensions.Multimodal.multimodalDecodeMulaw(spark, sf),
        graft.extensions.Multimodal.multimodalDecodeAv(spark, sf),
        graft.extensions.Multimodal.multimodalDecodeFlac(spark, sf))) {
      val p = planOf(df)
      "Exchange rangepartitioning".r.findAllIn(p).size shouldBe 1
      p should not include "SortMergeJoin"
      p should not include "HashAggregate"
    }
  }

  test("rfm: three distributed NTILE passes plan ZERO window operators") {
    // the round-9 contract: global quintiles never cross a WindowExec —
    // ranking is the range-sorted exchange + monotonically_increasing_id,
    // so there is no window to fall back to a single partition at ANY size
    val p = planOf(graft.extensions.Events.eventsRfm(spark, sf))
    "Window \\[".r.findAllIn(p).size shouldBe 0
    p should not include "WindowGroupLimit"
    p should include ("monotonically_increasing_id")
  }

  test("ivf: the corpus-derived seed stride joins as a ONE-row broadcast") {
    // stride = ceil(n/k) rides in as a 1-row aggregate broadcast-joined to
    // the vectors (the corpus-size-independent codebook seeding); it must
    // plan as a broadcast of that single row, never a shuffle — the only
    // nested-loop shape here is the deliberate 1-row scalar side
    val p = planOf(graft.extensions.Similarity.simTopkIvf(spark, sf))
    p should include ("BroadcastNestedLoopJoin")
    p should not include "CartesianProduct"
  }

  test("scalable range frame: one window over the change-log, no sliding frame") {
    // the linear form's contract: a single Window over the unioned
    // arrive/expire relation with a GROWING frame (incremental in Spark);
    // the sliding RANGE frame - the O(n x frame) shape - must not appear
    val p = planOf(graft.extensions.Events.eventsRangeFrameScalable(spark, sf))
    "Window \\[".r.findAllIn(p).size shouldBe 1
    p should include ("unboundedpreceding")      // growing = incremental
    p should not include "-3599999999"           // no sliding frame bound
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
  }

  test("media file ingest: the binaryFile scan feeds the decode map; sort is the only exchange") {
    val p = planOf(graft.extensions.Multimodal.multimodalMediaIngestFiles(spark, sf))
    p should include ("binaryFile")
    // file listing → stateless decode map with no shuffle in between;
    // the output sort contributes the single range exchange
    "Exchange rangepartitioning".r.findAllIn(p).size shouldBe 1
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 0
    p should not include "SortMergeJoin"
    p should not include "HashAggregate"
  }

  test("archive ingest: one bundling exchange, no join, no aggregation") {
    val p = planOf(graft.extensions.Multimodal.multimodalArchiveIngest(spark, sf))
    // the groupByKey that forms archives is the single hash exchange;
    // extraction itself adds none (the output sort adds its range one)
    "Exchange hashpartitioning".r.findAllIn(p).size shouldBe 1
    "Exchange rangepartitioning".r.findAllIn(p).size shouldBe 1
    p should not include "SortMergeJoin"
    p should not include "HashAggregate"
  }

  test("bootstrap CI: replicate buffers aggregate in one pass — no replicate fan-out") {
    val p = planOf(Tpch.qBootstrapCi(spark, sf))
    // The retired implementation fanned each order row out ×B via
    // explode(sequence(0, B-1)) BEFORE aggregating; the fixed plan's only
    // generator is the B-wide explode over the single 1-row aggregate
    // result. Plans print generators lowercase, so assert on the exact
    // generator expression, not the node name.
    p should not include "explode(sequence("
    // ... and the single-group aggregate really carries all 2B replicate
    // buffers. Plan STRINGS elide long field lists ("... N more fields"),
    // so count aggregate expressions on the plan tree itself.
    // (sparkPlan, not executedPlan: the AQE wrapper is a leaf to collect())
    val aggWidths = Tpch.qBootstrapCi(spark, sf).queryExecution.sparkPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        a.aggregateExpressions.size
    }
    aggWidths.max should be >= 2 * Tpch.BootstrapReps + 2 // + full sum/count
    "Scan parquet".r.findAllIn(p).size shouldBe 1 // ONE orders scan, total
  }
}
