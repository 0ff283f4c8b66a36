package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.extensions.TextAnalysis

/** BPE TRAINING scale-path contract: the merge loop must cost O(1) Spark
  * jobs regardless of merge count (the vocabulary is collected once and all
  * rounds run driver-local), and the driver-local rounds must be
  * semantically identical to the distributed one-job-per-round fallback.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  /** 300 distinct 10-char words with varied frequencies — enough pair
    * diversity to survive far more than 64 merge rounds. */
  private def fixtureWords() = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe-train").toString
    (0 until 300).map { i =>
      val w = (0 until 10).map(j => ('a' + (i * 7 + j * 3) % 26).toChar).mkString
      (w, (i % 17 + 1).toLong)
    }.toDF("word", "freq")
      .groupBy("word").agg(sum("freq").as("freq")) // generator may repeat words
      .write.mode("overwrite").parquet(s"$tmp/words.parquet")
    spark.read.parquet(s"$tmp/words.parquet")
  }

  test("64-merge train costs O(1) Spark jobs, not O(merges)") {
    val words = fixtureWords()
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = TextAnalysis.bpeMergesFromWords(words, 64).collect()
      org.apache.spark.graft.ListenerSync.waitUntilEmpty(spark.sparkContext)
      merges.length shouldBe 64
      // one real job collects the vocabulary; the local-relation merge table
      // costs at most a couple more on output. The retired per-round shape
      // paid >= 64 (one agg+sort+limit job per merge round).
      jobs.get should be <= 6
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("driver-local rounds == distributed fallback rounds (differential)") {
    val words = fixtureWords()
    val local = TextAnalysis.bpeMergesFromWords(words, 8)
      .as[(Int, String, String, Long)].collect().toSeq
    val dist = TextAnalysis.bpeMergesFromWordsDistributed(words, 8)
      .as[(Int, String, String, Long)].collect().toSeq
    local shouldBe dist
    local.map(_._1) shouldBe (1 to 8)
  }

  test("overlapping pair occurrences count like the distributed enumeration") {
    // "aaa" holds TWO (a,a) occurrences — transform(sequence(0, n-2)) counts
    // both, and so must the driver-local counter; the merge then applies
    // left-to-right non-overlapping: <a><a><a> -> <aa><a>, never <a><aa>.
    val words = Seq(("aaa", 1L)).toDF("word", "freq")
    val local = TextAnalysis.bpeMergesFromWords(words, 2)
      .as[(Int, String, String, Long)].collect().toSeq
    val dist = TextAnalysis.bpeMergesFromWordsDistributed(words, 2)
      .as[(Int, String, String, Long)].collect().toSeq
    local shouldBe Seq((1, "a", "a", 2L), (2, "aa", "a", 1L))
    local shouldBe dist
  }
}
