package graft

import org.apache.spark.sql.functions._

import graft.extensions.TextAnalysis

/** The Misra–Gries vocabulary screen (TextAnalysis.screenedTopTermCounts)
  * behind `text_vocab_coverage` / `text_zipf_slope`: above
  * `VocabScreenThreshold` types the global ranking window is replaced by a
  * certified sketch screen. These specs force the screened path with a
  * 0 threshold and pin it bit-for-bit to the unscreened (oracle-gated)
  * path, plus exercise both exactness certificates and the loud failure. */
class VocabScreenSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("screened textVocabCoverage ≡ unscreened, bit-for-bit") {
    val unscreened = rows(TextAnalysis.textVocabCoverage(spark, sf))
    val screened = rows(TextAnalysis.textVocabCoverageAt(spark, sf, 0L))
    screened shouldBe unscreened
  }

  test("screened textZipfSlope ≡ unscreened, bit-for-bit") {
    val unscreened = rows(TextAnalysis.textZipfSlope(spark, sf))
    val screened = rows(TextAnalysis.textZipfSlopeAt(spark, sf, 0L))
    screened shouldBe unscreened
  }

  test("screen is exact on a skewed corpus whose vocabulary exceeds k") {
    // vocab (42 types) > k (8): the sketch must drop tail terms, and the
    // frequency-floor certificate must still prove the top-2 exact.
    val toks = (Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
      (1 to 40).map(i => f"tail$i%02d")).toDF("term").repartition(4)
    val (top, total) = TextAnalysis.screenedTopTermCounts(spark, toks, 2, 8)
    total shouldBe 190L
    top shouldBe Seq(("alpha", 100L), ("beta", 50L))
  }

  test("screen covers a small vocabulary exactly via the full-coverage certificate") {
    // vocab (5 types) < k: nothing is ever dropped, candidate counts sum
    // to the total, and ties break on the term ordering.
    val toks = Seq("b", "a", "c", "a", "b", "d", "e", "c").toDF("term")
    val (top, total) = TextAnalysis.screenedTopTermCounts(spark, toks, 4, 64)
    total shouldBe 8L
    top shouldBe Seq(("a", 2L), ("b", 2L), ("c", 2L), ("d", 1L))
  }

  test("a too-flat corpus fails the certificate loudly instead of mis-ranking") {
    // 100 singleton terms, k=2: the sketch cannot distinguish the tail and
    // neither certificate can hold — the screen must refuse.
    val toks = (1 to 100).map(i => f"t$i%03d").toDF("term").repartition(4)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.screenedTopTermCounts(spark, toks, 3, 2)
    }
    e.getMessage should include("certificate failed")
  }
}
