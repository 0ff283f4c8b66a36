package graft

import org.apache.spark.sql.functions._

import graft.extensions.{MediaRecord, Multimodal}

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val media = Seq(
    MediaRecord(1L, "text/plain", "hello world, this is a payload".getBytes("UTF-8")),
    MediaRecord(2L, "text/plain", "x".getBytes("UTF-8")),
    MediaRecord(3L, "text/plain", Array.emptyByteArray))

  test("extractFeatures hashes payloads; unknown containers get length-derived features") {
    val feats = Multimodal.extractFeatures(media.toDS()).collect().sortBy(_.media_id)
    feats.map(_.media_id).toSeq shouldBe Seq(1L, 2L, 3L)
    feats(0).n_bytes shouldBe 30L
    feats(0).content_hash should have length 32
    feats(1).feat.toSeq shouldBe Seq(1.0f, 'x'.toFloat, 0.0f, 1.0f)
    feats(2).n_bytes shouldBe 0L
  }

  test("extractFeatures runs the real decoders for BMP and WAV payloads") {
    import graft.extensions.{BmpImage, Codecs, WavAudio}
    val bmp = Codecs.bmpEncode(BmpImage(2, 1, Array(10, 20, 30, 40, 60, 80)))
    val wav = Codecs.wavEncode(WavAudio(8000, Array[Short](100, -300, 200)))
    val feats = Multimodal.extractFeatures(Seq(
        MediaRecord(1L, "image/bmp", bmp),
        MediaRecord(2L, "audio/wav", wav)).toDS())
      .collect().sortBy(_.media_id)
    // image: w, h, per-channel means of {10,40},{20,60},{30,80}
    feats(0).feat.toSeq shouldBe Seq(2.0f, 1.0f, 25.0f, 40.0f, 55.0f)
    // audio: n, rate, peak |s|, mean |s| = (100+300+200)/3
    feats(1).feat.toSeq shouldBe Seq(3.0f, 8000.0f, 300.0f, 200.0f)
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
