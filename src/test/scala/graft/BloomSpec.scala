package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBloom

import graft.extensions.Dedup

/** The Bloom-filter semi-join prefilter surface (GraftBloom bridging Spark's
  * runtime-filter expressions) and its contamination scale path. */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered contamination is bit-identical to the broadcast path") {
    val plain = rows(Dedup.dedupContamination(spark, sf))
    val bloom = rows(Dedup.dedupContaminationBloom(spark, sf))
    bloom shouldBe plain
    bloom should not be empty
  }

  test("bloom has no false negatives; geometry is partitioning-independent") {
    val keys = (1L to 5000L).map(_ * 2654435761L)
    val agg = GraftBloom.bloomAgg(col("k"), 10000L, 1L << 18).as("bf")
    val b1 = keys.toDF("k").repartition(1).agg(agg).head().getAs[Array[Byte]](0)
    val b7 = keys.toDF("k").repartition(7).agg(agg).head().getAs[Array[Byte]](0)
    // OR-merge of partials is commutative — the bit array cannot depend on
    // how rows were split across partitions.
    b1.toSeq shouldBe b7.toSeq
    // Every inserted key must probe true (no false negatives, ever).
    val misses = keys.toDF("k")
      .filter(!GraftBloom.mightContain(lit(b1), col("k"))).count()
    misses shouldBe 0L
  }

  test("graft_bloom_agg / graft_might_contain work from SQL via extensions") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new org.apache.spark.sql.graft.GraftSessionExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s2.range(0, 1000).toDF("k").createOrReplaceTempView("bloom_keys")
      // Scalar-subquery filter side — the InjectRuntimeFilter contract.
      val hits = s2.sql(
        """SELECT count(*) AS n FROM (SELECT id AS probe FROM range(0, 2000))
          |WHERE graft_might_contain(
          |  (SELECT graft_bloom_agg(k, 10000L, 262144L) FROM bloom_keys),
          |  probe)""".stripMargin).collect()(0).getLong(0)
      // All 1000 true members must hit; false positives only add.
      hits should be >= 1000L
      hits should be <= 1100L
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
