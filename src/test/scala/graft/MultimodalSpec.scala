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

  test("extractFeatures: REAL-but-unsupported variants fall back, not fail") {
    import graft.extensions.{BmpImage, Codecs, WavAudio}
    val img = BmpImage(2, 1, Array(10, 20, 30, 40, 60, 80))
    val bmp32 = Codecs.bmpEncode32(img)          // sniffs as BMP, decoder rejects
    val wav24 = Codecs.wavEncode24(WavAudio(8000, Array[Short](5, -5)))
    val feats = Multimodal.extractFeatures(Seq(
        MediaRecord(1L, "image/bmp", bmp32),
        MediaRecord(2L, "audio/wav", wav24),
        MediaRecord(3L, "image/png", Codecs.pngEncode(img))).toDS())
      .collect().sortBy(_.media_id)
    // fallback shape: (len, byte0, byte1, len % 255) — never a crash
    feats(0).feat.toSeq shouldBe Seq(bmp32.length.toFloat, 'B'.toFloat, 'M'.toFloat,
      (bmp32.length % 255).toFloat)
    feats(1).feat.toSeq shouldBe Seq(wav24.length.toFloat, 'R'.toFloat, 'I'.toFloat,
      (wav24.length % 255).toFloat)
    // PNG goes down the real image branch
    feats(2).feat.toSeq shouldBe Seq(2.0f, 1.0f, 25.0f, 40.0f, 55.0f)
  }

  test("variant lake: decode lanes drop EXACTLY the rejected ids, manifest flags them") {
    val sf = "/root/testdata/sf0.001"
    val ids = Multimodal.mediaLake(spark, sf).collect().map(_.media_id)
    val expectReject = ids.filter(d => d % 12 == 10 || d % 12 == 11).toSet
    expectReject should not be empty // the lake really contains both variants
    val manifest = Multimodal.multimodalFeatures(spark, sf)
      .select("media_id", "decode_ok").as[(Long, Boolean)].collect().toMap
    manifest.filterNot(_._2).keySet shouldBe expectReject
    val imgIds = Multimodal.multimodalDecodeImage(spark, sf)
      .select("media_id").as[Long].collect().toSet
    imgIds shouldBe ids.filter(d => d % 2 == 0 && d % 12 != 10).toSet
    val audIds = Multimodal.multimodalDecodeAudio(spark, sf)
      .select("media_id").as[Long].collect().toSet
    audIds shouldBe ids.filter(d => d % 2 == 1 && d % 12 != 11).toSet
  }

  test("variant lake: every container variant is present and decodes per spec") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    val lake = Multimodal.mediaLake(spark, sf).collect()
    lake.groupBy(_.media_id % 12).keySet shouldBe (0L to 11L).toSet
    for (m <- lake.filter(x => x.media_id % 12 == 2 || x.media_id % 12 == 8)) {
      val spec = Multimodal.imageSpec(m.media_id)
      Codecs.pngDecode(m.payload).rgb.toSeq shouldBe spec.rgb.toSeq
    }
    for (m <- lake.filter(_.media_id % 12 == 4)) {
      val (w, h, g) = Multimodal.graySpec(m.media_id)
      val img = Codecs.bmpDecodeRle8(m.payload)
      (img.width, img.height) shouldBe ((w, h))
      img.rgb.toSeq shouldBe g.toSeq.flatMap(x => Seq(x, x, x))
    }
    for (m <- lake.filter(_.media_id % 12 == 5)) {
      val a = Codecs.wavDecode(m.payload)
      a.channels shouldBe 2
      a.samples.toSeq shouldBe Multimodal.audioSpecStereo(m.media_id).samples.toSeq
    }
    for (m <- lake.filter(_.media_id % 12 == 3)) {
      Codecs.wavDecode(m.payload).samples.toSeq shouldBe
        Multimodal.audioSpec8(m.media_id).samples.toSeq
    }
  }

  test("JPEG lake: every variant present; each payload decodes to its spec exactly") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    val lake = Multimodal.jpegLake(spark, sf).collect()
    lake.groupBy(_.media_id % 3).keySet shouldBe (0L to 2L).toSet
    for (m <- lake) {
      val spec = Multimodal.jpegSpec(m.media_id)
      val img = Codecs.jpegDecode(m.payload)
      (img.width, img.height) shouldBe ((spec.width, spec.height))
      withClue(s"media ${m.media_id} (variant ${m.media_id % 3}): ") {
        img.rgb.toSeq shouldBe spec.rgb.toSeq
      }
    }
    // the decode query reports one row per lake record — nothing rejects
    Multimodal.multimodalDecodeJpeg(spark, sf).count() shouldBe lake.length.toLong
  }

  test("aHash: brightness-shifted re-encode collides; content change does not") {
    import graft.extensions.{BmpImage, Codecs}
    val rnd = new scala.util.Random(7)
    val rgb = Array.fill(10 * 6 * 3)(20 + rnd.nextInt(200)) // headroom for +15
    val base = BmpImage(10, 6, rgb)
    val brighter = BmpImage(10, 6, rgb.map(_ + 15)) // no wraparound
    // the perceptual property: a global brightness shift preserves every
    // above-mean bit, so the fingerprints are EQUAL even though the bytes
    // (and any exact content hash) differ — including across containers
    Multimodal.ahashOf(brighter) shouldBe Multimodal.ahashOf(base)
    Multimodal.ahashOf(Codecs.pngDecode(Codecs.pngEncode(brighter))) shouldBe
      Multimodal.ahashOf(base)
    // a real content change flips bits
    val edited = rgb.clone()
    for (j <- 0 until 30) edited(j) = 255 - edited(j)
    Multimodal.ahashOf(BmpImage(10, 6, edited)) should not be Multimodal.ahashOf(base)
  }

  test("audio fingerprint: loudness-scaled copy collides; content change does not") {
    val rnd = new scala.util.Random(13)
    val samples = Array.fill(64)((rnd.nextInt(8000) - 4000).toShort)
    val (nw, bits) = Multimodal.audioFpOf(samples)
    nw shouldBe 16
    // doubling every sample doubles both sides of the integer
    // cross-multiplication — the envelope pattern is volume-invariant
    Multimodal.audioFpOf(samples.map(s => (s * 2).toShort)) shouldBe ((nw, bits))
    // zeroing a loud stretch flips bits
    val edited = samples.clone()
    for (j <- 0 until 8) edited(j) = 0
    Multimodal.audioFpOf(edited)._2 should not be bits
    // window-count guards: a 7-sample tail is ignored (whole windows only)
    Multimodal.audioFpOf(samples ++ Array[Short](9, 9, 9))._1 shouldBe 16
  }

  test("batch near-dup banding excludes zero fingerprints, like the streaming screen") {
    import graft.extensions.AhashRow
    // two flat images (ahash 0, same bit length) must NOT pair with each
    // other; a genuine near-dup pair in the same relation still surfaces
    val rows = Seq(
      AhashRow(1L, 60L, 0L, 0), AhashRow(2L, 60L, 0L, 0),
      AhashRow(3L, 60L, 0x5aL, 4), AhashRow(4L, 60L, 0x5bL, 5))
    val pairs = Multimodal.imageNeardupPairs(rows.toDF())
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((3L, 4L))
  }

  test("mediaFingerprint: zero-information payloads return None, not Some(0)") {
    import graft.extensions.{BmpImage, Codecs, WavAudio}
    // flat image and silent clip both hash to 0 — matching on 0 would flag
    // every degenerate payload against any degenerate known item
    Multimodal.mediaFingerprint(
      Codecs.bmpEncode(BmpImage(4, 4, Array.fill(48)(77)))) shouldBe None
    Multimodal.mediaFingerprint(
      Codecs.wavEncode(WavAudio(8000, Array.fill(16)(0.toShort)))) shouldBe None
    // a structured payload still fingerprints
    Multimodal.mediaFingerprint(Codecs.bmpEncode(
      BmpImage(4, 4, Array.tabulate(48)(j => (j * 31) % 256)))) should not be None
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
