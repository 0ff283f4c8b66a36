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

  test("extractFeatures runs the real JPEG decoder, all four variants") {
    import graft.extensions.Codecs
    val spec = Multimodal.jpegSpec(29L) // flat-block: decodes bit-exactly
    val n = spec.width * spec.height
    val mean = (0 until n).map { p =>
      val bx = (p % spec.width) / 8; val by = (p / spec.width) / 8
      ((29L * 23 + 31 * bx + 41 * by) % 256).toInt
    }.sum.toFloat / n
    val records = Seq(
      MediaRecord(1L, "image/jpeg", Codecs.jpegEncode(spec, Codecs.JpegColor444)),
      MediaRecord(2L, "image/jpeg",
        Codecs.jpegEncode(spec, Codecs.JpegColor420, restartInterval = 2)),
      MediaRecord(3L, "image/jpeg", Codecs.jpegEncode(spec, Codecs.JpegGray)),
      MediaRecord(4L, "image/jpeg", Codecs.jpegEncode(spec, Codecs.JpegColor422)))
    val feats = Multimodal.extractFeatures(records.toDS()).collect().sortBy(_.media_id)
    for (f <- feats) withClue(s"media ${f.media_id}: ") {
      // real image branch: (w, h, mean_r, mean_g, mean_b) — equal channels
      f.feat.toSeq shouldBe Seq(spec.width.toFloat, spec.height.toFloat,
        mean, mean, mean)
    }
  }

  test("extractFeatures runs the real GIF decoder through the router") {
    import graft.extensions.Codecs
    val (w, h, gray) = Multimodal.gifSpec(29L)
    val mean = gray.sum.toFloat / gray.length
    val records = Seq(
      MediaRecord(1L, "image/gif", Codecs.gifEncode(w, h, gray)),
      MediaRecord(2L, "image/gif", Codecs.gifEncode(w, h, gray, interlaced = true)),
      MediaRecord(3L, "image/gif", Codecs.gifEncode(w, h, gray, gce = true)),
      // animated: well-formed but outside the still envelope → fallback lane
      MediaRecord(4L, "image/gif", Codecs.gifEncodeAnimated(w, h, Seq(gray, gray))))
    val feats = Multimodal.extractFeatures(records.toDS()).collect().sortBy(_.media_id)
    for (f <- feats.take(3)) withClue(s"media ${f.media_id}: ") {
      f.feat.toSeq shouldBe Seq(w.toFloat, h.toFloat, mean, mean, mean)
    }
    // the animated member must NOT decode as an image (length-derived fallback)
    feats(3).feat.length should not be 5
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
    lake.groupBy(_.media_id % 4).keySet shouldBe (0L to 3L).toSet
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

  test("archive lake: tars are deterministic and extract to the exact corpus") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val lake = Multimodal.archiveLake(spark, sf).collect()
    lake.length shouldBe (docs.size + Multimodal.TarGroup - 1) / Multimodal.TarGroup
    // all four container forms are present and magic-consistent
    lake.groupBy(_.media_id % 4).keySet shouldBe (0L to 3L).toSet
    for (a <- lake) {
      val gz = (a.payload(0) & 0xff) == 0x1f && (a.payload(1) & 0xff) == 0x8b
      val pk = a.payload(0) == 'P' && a.payload(1) == 'K'
      gz shouldBe (a.media_id % 4 == 1)
      pk shouldBe (a.media_id % 4 >= 2)
    }
    var seen = 0
    for (a <- lake;
         members = (a.media_id % 4) match {
           case 1 => Codecs.tarExtract(Codecs.gzipDecode(a.payload))
           case 2 | 3 => Codecs.zipExtract(a.payload)
           case _ => Codecs.tarExtract(a.payload)
         };
         (name, data) <- members) {
      val id = name.stripPrefix("doc_").stripSuffix(".txt").toLong
      id / Multimodal.TarGroup shouldBe a.media_id
      new String(data, "UTF-8") shouldBe docs(id)
      seen += 1
    }
    seen shouldBe docs.size
    // determinism: rebuilding the lake produces byte-identical archives
    val again = Multimodal.archiveLake(spark, sf).collect()
      .map(m => m.media_id -> m.payload).toMap
    for (a <- lake) again(a.media_id).toSeq shouldBe a.payload.toSeq
  }

  test("A/V lake: both MJPEG variants demux to spec; PCM-track members reject") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    val lake = Multimodal.avLake(spark, sf).collect()
    lake.groupBy(_.media_id % 3).keySet shouldBe (0L to 2L).toSet
    var rejected = 0
    for (m <- lake) {
      if (m.media_id % 3 == 2) {
        intercept[IllegalArgumentException](Codecs.aviDecodeAv(m.payload))
        rejected += 1
      } else {
        val av = Codecs.aviDecodeAv(m.payload)
        val nf = 2 + (m.media_id % 2).toInt
        av.video.frames.length shouldBe nf
        for ((img, f) <- av.video.frames.zipWithIndex)
          withClue(s"media ${m.media_id} frame $f: ") {
            img.rgb.toSeq shouldBe
              Multimodal.videoFrameSpec(m.media_id, f).rgb.toSeq
          }
        av.audio.get.samples.toSeq shouldBe
          Multimodal.mulawSpec(m.media_id).map(Codecs.mulawExpand).toSeq
      }
    }
    rejected should be > 0
    Multimodal.multimodalDecodeAv(spark, sf).count() shouldBe
      (lake.length - rejected).toLong
  }

  test("µ-law lake: every payload decodes to the closed-form expansion") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    val lake = Multimodal.mulawLake(spark, sf).collect()
    for (m <- lake.take(20)) {
      val a = Codecs.wavDecode(m.payload)
      a.sampleRate shouldBe Multimodal.SampleRate
      withClue(s"media ${m.media_id}: ") {
        a.samples.toSeq shouldBe
          Multimodal.mulawSpec(m.media_id).map(Codecs.mulawExpand).toSeq
      }
    }
    // decode lane keeps every record: µ-law is a SUPPORTED format
    Multimodal.multimodalDecodeMulaw(spark, sf).count() shouldBe lake.length.toLong
  }

  test("GIF lake: still variants decode to spec; animated members reject") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    val lake = Multimodal.gifLake(spark, sf).collect()
    lake.groupBy(_.media_id % 4).keySet shouldBe (0L to 3L).toSet
    var rejected = 0
    for (m <- lake) {
      val (w, h, gray) = Multimodal.gifSpec(m.media_id)
      if (m.media_id % 4 == 3) {
        intercept[IllegalArgumentException](Codecs.imageDecode(m.payload))
        rejected += 1
      } else {
        val img = Codecs.imageDecode(m.payload)
        (img.width, img.height) shouldBe ((w, h))
        withClue(s"media ${m.media_id} (variant ${m.media_id % 4}): ") {
          img.rgb.toSeq shouldBe gray.flatMap(v => Seq(v, v, v)).toSeq
        }
      }
    }
    rejected should be > 0
    // the decode lane reports exactly the still members
    Multimodal.multimodalDecodeGif(spark, sf).count() shouldBe
      (lake.length - rejected).toLong
  }

  test("video lake: every family variant decodes per spec; DIB members reject") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    val lake = Multimodal.videoLake(spark, sf).collect()
    lake.groupBy(_.media_id % 4).keySet shouldBe (0L to 3L).toSet
    val dib = lake.filter(m => m.media_id % 4 == 1 && (m.media_id / 4) % 7 == 5)
    dib should not be empty
    for (m <- dib) {
      // well-formed uncompressed AVI the MJPEG decoder must reject by name
      val e = intercept[IllegalArgumentException](Codecs.aviDecode(m.payload))
      e.getMessage should include("unsupported AVI codec")
    }
    for (m <- lake.filterNot(dib.contains)) {
      val g = m.media_id / 4
      val nf = 3 + (g % 3).toInt
      val v = Codecs.aviDecode(m.payload)
      val shift = if (m.media_id % 4 == 2) 8 else 0
      val from = if (m.media_id % 4 == 3) 1 else 0
      v.usPerFrame shouldBe Multimodal.VideoUsPerFrame
      v.frames.length shouldBe nf - from
      withClue(s"media ${m.media_id} (variant ${m.media_id % 4}): ") {
        v.frames.zipWithIndex.foreach { case (img, i) =>
          img.rgb.toSeq shouldBe
            Multimodal.videoFrameSpec(g, from + i, shift).rgb.toSeq
        }
      }
    }
    // decode manifest: one row per NON-rejected lake record
    Multimodal.multimodalDecodeVideo(spark, sf).count() shouldBe
      (lake.length - dib.length).toLong
  }

  test("sampled video near-dup: re-encode and brightness pairs survive the stride") {
    import graft.extensions.Codecs
    val sf = "/root/testdata/sf0.001"
    // sampled decode really skips: stride-2 over an nf-frame video decodes
    // ceil(nf/2) frames, each identical to its all-frames counterpart
    val m0 = Multimodal.videoLake(spark, sf).collect().find(_.media_id % 4 == 0).get
    val all = Codecs.aviDecode(m0.payload).frames
    val samp = Codecs.aviDecodeSampled(m0.payload, 2).video.frames
    samp.length shouldBe (all.length + 1) / 2
    samp.zipWithIndex.foreach { case (img, i) =>
      img.rgb.toSeq shouldBe all(2 * i).rgb.toSeq
    }
    // recall vs the all-frames form on the PLANTED sibling classes:
    // within a family, re-encode (4g,4g+1) and brightness-shift (·,4g+2)
    // variants sample the SAME container indices with identical decoded
    // content (mod the hash-invariant shift), so every such pair the
    // all-frames form finds must survive the stride EXACTLY; trim
    // siblings (·,4g+3) offset the frame grid by one, so at this
    // fixture's tiny frame counts (3-5) the stride loses them — the
    // documented tradeoff (real videos have thousands of frames per trim
    // offset). Cross-family coincidence pairs (tiny flat-block frames
    // hash coarsely) may legitimately shift either way — the oracle
    // gates their exact sampled-set semantics.
    def pairSet(stride: Int) =
      Multimodal.multimodalVideoNeardupRealStride(spark, sf, stride)
        .select("media_a", "media_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = pairSet(1)
    val sampled = pairSet(2)
    val reencode = allPairs.filter { case (a, b) =>
      a / 4 == b / 4 && a % 4 == 0 && b % 4 == 1
    }
    reencode should not be empty
    (reencode -- sampled) shouldBe empty
    // brightness pairs: the +8 shift WRAPS mod 256 in families whose
    // block values graze 248+, making some frames genuinely divergent —
    // smaller sampled sets are more wrap-sensitive, so recall is < 1 but
    // must stay high (measured 15 of ~180 lost at this sf)
    val bright = allPairs.filter { case (a, b) =>
      a / 4 == b / 4 && b % 4 == 2 && a % 4 != 3
    }
    bright should not be empty
    val keptBright = bright.intersect(sampled).size.toDouble / bright.size
    keptBright should be >= 0.8
  }

  test("file-ingest lane: binaryFile read-back equals the in-row decode lane") {
    // the files-on-disk realism gate: stage → list → read → decode must
    // reproduce the in-row lane row for row (same ids, same pixel sums)
    val sf = "/root/testdata/sf0.001"
    val inRow = Multimodal.multimodalDecodeImage(spark, sf).collect().toSeq
    val fromFiles = Multimodal.multimodalMediaIngestFiles(spark, sf).collect().toSeq
    fromFiles should not be empty
    fromFiles shouldBe inRow
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

  test("pHash: EXACT invariance to brightness shift and pixel-replication upscale") {
    import graft.extensions.{BmpImage, Codecs}
    val rnd = new scala.util.Random(11)
    val rgb = Array.fill(16 * 8 * 3)(20 + rnd.nextInt(200))
    val base = BmpImage(16, 8, rgb)
    val h0 = Multimodal.phashOf(base)
    h0 should be >= 0L // 60-bit discipline
    // brightness: a constant offset lands entirely in the discarded DC
    // coefficient, so the hash is IDENTICAL (not just close) — stronger
    // than aHash, whose mean-threshold only survives until rounding
    Multimodal.phashOf(BmpImage(16, 8, rgb.map(_ + 15))) shouldBe h0
    // 2× pixel replication resamples to the same 8×8 tile → same hash —
    // the scale invariance aHash does not have at all
    val up = new Array[Int](32 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 32; c <- 0 until 3)
      up(3 * (y * 32 + x) + c) = rgb(3 * ((y / 2) * 16 + (x / 2)) + c)
    Multimodal.phashOf(BmpImage(32, 16, up)) shouldBe h0
    // survives a real codec round-trip
    Multimodal.phashOf(Codecs.pngDecode(Codecs.pngEncode(base))) shouldBe h0
    // a real content change flips bits
    val edited = rgb.clone()
    for (j <- 0 until 60) edited(j) = 255 - edited(j)
    Multimodal.phashOf(BmpImage(16, 8, edited)) should not be h0
    // a flat image has zero AC energy everywhere: degenerate hash is 0
    Multimodal.phashOf(BmpImage(9, 5, Array.fill(9 * 5 * 3)(128))) shouldBe 0L
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

  test("audio shingle levels: loudness- and whole-window-trim-invariant") {
    val rnd = new scala.util.Random(19)
    val samples = Array.fill(48)((rnd.nextInt(8000) - 4000).toShort)
    val lv = Multimodal.audioLevelsOf(samples)
    lv.length shouldBe 12
    lv.forall(l => l >= 0 && l <= Multimodal.AudioLevelScale) shouldBe true
    // loudness: double every sample (no clipping) — identical levels
    Multimodal.audioLevelsOf(samples.map(s => (s * 2).toShort)).toSeq shouldBe lv.toSeq
    // whole-window silence pad: original gram CONTENTS survive shifted
    val padded = Multimodal.audioLevelsOf(
      Array.fill[Short](Multimodal.AudioPadValues)(0) ++ samples)
    padded.length shouldBe 14
    padded.take(2).toSeq shouldBe Seq(0, 0)
    padded.drop(2).toSeq shouldBe lv.toSeq
    // silence returns NO levels, not all-zero levels
    Multimodal.audioLevelsOf(Array.fill[Short](32)(0)) shouldBe empty
  }

  test("shingled audio near-dup finds every planted silence-shifted twin") {
    val sf = "/root/testdata/sf0.001"
    val pairs = Multimodal.multimodalAudioShingleNeardup(spark, sf)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    // sequential reference: per-clip shingle sets (originals + padded
    // twins), the global df-cap, sizes, containment — recomputed in plain
    // Scala. Every planted twin the capped fingerprint can resolve must
    // surface at containment 1 (A ⊆ B survives any shared-shingle drop).
    val shingleSets: Map[Long, Set[String]] = Multimodal.mediaLake(spark, sf)
      .collect()
      .filter(m => m.mime == "audio/wav" && m.media_id % 12 != 11)
      .flatMap { m =>
        val s0 = graft.extensions.Codecs.wavDecode(m.payload).samples
        def grams(samples: Array[Short]): Set[String] = {
          val lv = Multimodal.audioLevelsOf(samples)
          (0 to lv.length - Multimodal.AudioShingleLen)
            .map(i => lv.slice(i, i + Multimodal.AudioShingleLen).mkString(","))
            .toSet
        }
        Seq(m.media_id -> grams(s0),
          (m.media_id + Multimodal.AudioPadOffset) ->
            grams(Array.fill[Short](Multimodal.AudioPadValues)(0) ++ s0))
      }.toMap
    val df = shingleSets.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    val capped = shingleSets.view
      .mapValues(_.filter(s => df(s) <= graft.extensions.Dedup.MaxShingleDf)).toMap
    val expected = capped.keys
      .filter(d => d < Multimodal.AudioPadOffset)
      .filter { d =>
        val a = capped(d); val b = capped(d + Multimodal.AudioPadOffset)
        math.min(a.size, b.size) >= Multimodal.AudioMinShingles &&
          (a & b).size >= Multimodal.AudioShingleTau * math.min(a.size, b.size)
      }.toSet
    expected should not be empty
    for (d <- expected)
      withClue(s"clip $d vs its padded twin: ") {
        pairs should contain((d, d + Multimodal.AudioPadOffset))
      }
    // the POSITIONAL envelope fingerprint misses the same twins: the pad
    // shifts every window, so this is exactly the recall the shingle set
    // adds (spot-check one clip's hashes differ)
    val one = Multimodal.mediaLake(spark, sf).collect()
      .find(m => expected.contains(m.media_id)).get
    val s0 = graft.extensions.Codecs.wavDecode(one.payload).samples
    val shifted = Array.fill[Short](Multimodal.AudioPadValues)(0) ++ s0
    Multimodal.audioFpOf(shifted)._2 should not be Multimodal.audioFpOf(s0)._2
  }

  test("incremental curation: batch probes the index, corpus never re-paired") {
    val sf = "/root/testdata/sf0.001"
    val out = Multimodal.multimodalCurationIncremental(spark, sf)
      .select("media_id", "dup_of", "kept")
      .as[(Long, Option[Long], Boolean)].collect()
    // one row per decodable batch image, none below the split
    out.map(_._1).forall(_ >= Multimodal.MediaIncrementalSplit) shouldBe true
    out should not be empty
    // dup_of, when present, is an EXISTING image (below the split), and
    // kept is exactly dup_of's absence
    for ((_, dupOf, kept) <- out) {
      kept shouldBe dupOf.isEmpty
      dupOf.foreach(_ should be < Multimodal.MediaIncrementalSplit)
    }
    // cross-check against the full pair relation: a batch image is dropped
    // iff the full near-dup query pairs it with some existing image
    val full = Multimodal.multimodalImageNeardup(spark, sf)
      .select("media_a", "media_b").as[(Long, Long)].collect()
    val expectDropped = full.collect {
      case (a, b) if a < Multimodal.MediaIncrementalSplit &&
        b >= Multimodal.MediaIncrementalSplit => b
      case (a, b) if b < Multimodal.MediaIncrementalSplit &&
        a >= Multimodal.MediaIncrementalSplit => a
    }.toSet
    out.filterNot(_._3).map(_._1).toSet shouldBe expectDropped
  }

  test("perceptual fingerprint is container-invariant: BMP ≡ PNG ≡ all three JPEGs") {
    import graft.extensions.Codecs
    // flat-block content decodes bit-exactly from every container — so the
    // SAME image carried as BMP, PNG, or any JPEG variant must fingerprint
    // identically, which is what lets the streaming known-content screen
    // flag a JPEG re-encode of known BMP content
    val spec = Multimodal.jpegSpec(17L)
    val viaBmp = Multimodal.mediaFingerprint(Codecs.bmpEncode(spec))
    viaBmp should not be None
    Multimodal.mediaFingerprint(Codecs.pngEncode(spec)) shouldBe viaBmp
    Multimodal.mediaFingerprint(Codecs.jpegEncode(spec, Codecs.JpegColor444)) shouldBe viaBmp
    Multimodal.mediaFingerprint(
      Codecs.jpegEncode(spec, Codecs.JpegColor420, restartInterval = 2)) shouldBe viaBmp
    Multimodal.mediaFingerprint(Codecs.jpegEncode(spec, Codecs.JpegGray)) shouldBe viaBmp
    Multimodal.mediaFingerprint(Codecs.jpegEncode(spec, Codecs.JpegColor422)) shouldBe viaBmp
    // the content is grayscale (equal channels), so the SAME image as a
    // palette GIF — plain or interlaced — must fingerprint identically too
    val gray = Array.tabulate(spec.width * spec.height)(p => spec.rgb(3 * p))
    Multimodal.mediaFingerprint(
      Codecs.gifEncode(spec.width, spec.height, gray)) shouldBe viaBmp
    Multimodal.mediaFingerprint(
      Codecs.gifEncode(spec.width, spec.height, gray, interlaced = true)) shouldBe viaBmp
    // µ-law WAVs flow through the audio kernel of the same screen
    Multimodal.mediaFingerprint(
      Codecs.wavEncodeMulawCodes(8000, Multimodal.mulawSpec(17L))) should not be None
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
