package graft

import org.apache.spark.sql.functions._

import graft.extensions.{MediaRecord, Multimodal}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val media = Seq(
    MediaRecord(1L, "text/plain", "hello world, this is a payload".getBytes("UTF-8")),
    MediaRecord(2L, "text/plain", "x".getBytes("UTF-8")),
    MediaRecord(3L, "text/plain", Array.emptyByteArray))

  test("extractFeatures hashes payloads and emits stub features per record") {
    val feats = Multimodal.extractFeatures(media.toDS()).collect().sortBy(_.media_id)
    feats.map(_.media_id).toSeq shouldBe Seq(1L, 2L, 3L)
    feats(0).n_bytes shouldBe 30L
    feats(0).content_hash should have length 32
    feats(1).feat.toSeq shouldBe Seq(1.0f, 'x'.toFloat, 0.0f, 1.0f)
    feats(2).n_bytes shouldBe 0L
  }

  test("sampleFrames chunks payloads into fixed-size frames") {
    val frames = Multimodal.sampleFrames(media.toDS())
      .groupBy("media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    frames(1L) shouldBe 2L // 30 chars -> 2 frames of 16
    frames(2L) shouldBe 1L
    frames.get(3L) shouldBe None // empty payload -> no frames
  }
}
