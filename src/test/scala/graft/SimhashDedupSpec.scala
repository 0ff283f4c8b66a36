package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.extensions.{Dedup, TextAnalysis}

/** dedup_simhash correctness: the 4×15-bit band split must find EXACTLY the
  * pairs within hamming distance 3 (pigeonhole: ≤3 differing bits leave at
  * least one of 4 bands untouched — recall 1), verified differentially
  * against the all-pairs filter on both a planted fixture and real testdata.
  */
class SimhashDedupSpec extends SparkTestBase {

  /** All-pairs hamming-≤-3 ground truth from the same signatures. */
  private def bruteForce(dir: String): DataFrame = {
    val sigs = TextAnalysis.textSimhash(spark, dir)
    sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("simhash-dedup").toString
    val base = (1 to 40).map(j => s"tok$j").mkString(" ")
    val docs = Seq(
      1L -> base,                                   // identical pair: hamming 0
      2L -> base,
      3L -> (base + " extra1 extra2"),              // near-dup of 1/2
      4L -> (1 to 40).map(j => s"other$j").mkString(" ")) // unrelated
    docs.map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("banded candidates equal all-pairs ground truth on planted fixture") {
    val got = rows(Dedup.dedupSimhash(spark, fixtureDir))
    got shouldBe rows(bruteForce(fixtureDir))
    // the identical pair is found with hamming 0 — assertion is non-vacuous
    got.map(_.take(2)) should contain(Seq(1L, 2L))
    got.collect { case Seq(1L, 2L, h) => h } shouldBe Seq(0)
    // the unrelated doc pairs with nobody
    got.flatMap(_.take(2)) should not contain 4L
  }

  test("banded candidates equal all-pairs ground truth on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    rows(Dedup.dedupSimhash(spark, dir)) shouldBe rows(bruteForce(dir))
  }

  test("textRepetition computes token counts and ratios") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("text-rep").toString
    Seq((1L, "a a a b", "en", "test", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    rows(TextAnalysis.textRepetition(spark, d)) shouldBe
      Seq(Seq(1L, 4L, 2L, 0.5, 0.75))
  }
}
