package graft

import graft.extensions.{BmpImage, Codecs, Multimodal, WavAudio}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CodecsSpec extends AnyFunSuite with Matchers {

  test("BMP round-trips every row-padding phase") {
    // w*3 mod 4 cycles 0,3,2,1 over w mod 4 — cover all four pad widths,
    // plus 1-pixel-wide and 1-pixel-tall degenerate geometries.
    for (w <- Seq(1, 2, 3, 4, 5, 7, 16); h <- Seq(1, 2, 3, 9)) {
      val rgb = Array.tabulate(w * h * 3)(j => (j * 17 + w * 5 + h) % 256)
      val out = Codecs.bmpDecode(Codecs.bmpEncode(BmpImage(w, h, rgb)))
      out.width shouldBe w
      out.height shouldBe h
      out.rgb.toSeq shouldBe rgb.toSeq
    }
  }

  test("BMP decoder honors the header's pixel-data offset") {
    // A writer may put an extended header / color profile before the pixel
    // array; the offset field, not a constant 54, locates the data.
    val img = BmpImage(3, 2, Array.tabulate(18)(j => (j * 11) % 256))
    val std = Codecs.bmpEncode(img)
    val gap = 16
    val moved = new Array[Byte](std.length + gap)
    System.arraycopy(std, 0, moved, 0, 54)
    System.arraycopy(std, 54, moved, 54 + gap, std.length - 54)
    val buf = java.nio.ByteBuffer.wrap(moved).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(2, moved.length) // file size
    buf.putInt(10, 54 + gap)    // pixel data offset
    Codecs.bmpDecode(moved).rgb.toSeq shouldBe img.rgb.toSeq
  }

  test("BMP decoder rejects what it cannot decode") {
    an[IllegalArgumentException] should be thrownBy
      Codecs.bmpDecode("not an image".getBytes("UTF-8"))
    val ok = Codecs.bmpEncode(BmpImage(4, 4, Array.fill(48)(7)))
    an[IllegalArgumentException] should be thrownBy
      Codecs.bmpDecode(ok.take(ok.length - 1)) // truncated pixel data
    val badBpp = ok.clone(); badBpp(28) = 8
    an[IllegalArgumentException] should be thrownBy Codecs.bmpDecode(badBpp)
  }

  test("WAV round-trips samples exactly, including extremes") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val out = Codecs.wavDecode(Codecs.wavEncode(WavAudio(44100, samples)))
    out.sampleRate shouldBe 44100
    out.samples.toSeq shouldBe samples.toSeq
  }

  test("WAV decoder walks chunks (LIST before data, odd-size padding)") {
    val std = Codecs.wavEncode(WavAudio(8000, Array[Short](5, -6, 7)))
    // splice an odd-sized junk chunk between fmt and data
    val junkBody = Array[Byte](1, 2, 3) // size 3 -> pads to 4 per RIFF
    val insertAt = 36                   // after the 16-byte fmt chunk
    val chunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ junkBody ++ Array[Byte](0)
    val spliced = std.take(insertAt) ++ chunk ++ std.drop(insertAt)
    val buf = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(4, spliced.length - 8) // RIFF size
    Codecs.wavDecode(spliced).samples.toSeq shouldBe Seq[Short](5, -6, 7)
  }

  test("WAV decoder rejects non-PCM and truncated input") {
    an[IllegalArgumentException] should be thrownBy
      Codecs.wavDecode("RIFFxxxxWAVE".getBytes("US-ASCII"))
    val std = Codecs.wavEncode(WavAudio(8000, Array[Short](1, 2)))
    val nonPcm = std.clone(); nonPcm(20) = 3 // IEEE float format tag
    an[IllegalArgumentException] should be thrownBy Codecs.wavDecode(nonPcm)
  }

  test("PNG round-trips all five filter types across geometries") {
    // the encoder assigns scanline r filter type r % 5, so any h >= 5
    // exercises None/Sub/Up/Average/Paeth on real IDAT bytes; w = 1 covers
    // the left-sample-is-zero boundary of Sub/Average/Paeth.
    for (w <- Seq(1, 2, 5, 16); h <- Seq(1, 5, 7)) {
      val rgb = Array.tabulate(w * h * 3)(j => (j * 29 + w * 3 + h * 11) % 256)
      val out = Codecs.pngDecode(Codecs.pngEncode(BmpImage(w, h, rgb)))
      out.width shouldBe w
      out.height shouldBe h
      out.rgb.toSeq shouldBe rgb.toSeq
    }
  }

  test("PNG size is the stored-block closed form h*(1+3w) + 68") {
    for (w <- Seq(1, 6, 16); h <- Seq(1, 4, 9)) {
      val png = Codecs.pngEncode(BmpImage(w, h, Array.fill(w * h * 3)(3)))
      png.length shouldBe h * (1 + 3 * w) + 68
    }
  }

  test("PNG decoder verifies CRCs and rejects what it cannot decode") {
    val ok = Codecs.pngEncode(BmpImage(4, 4, Array.tabulate(48)(_ % 256)))
    an[IllegalArgumentException] should be thrownBy
      Codecs.pngDecode("not a png at all".getBytes("UTF-8"))
    an[IllegalArgumentException] should be thrownBy
      Codecs.pngDecode(ok.take(ok.length - 6)) // truncated IEND
    val badCrc = ok.clone(); badCrc(20) = (badCrc(20) ^ 0x55).toByte // inside IHDR
    an[IllegalArgumentException] should be thrownBy Codecs.pngDecode(badCrc)
    // interlace flag flipped (CRC fixed up) now parses as Adam7 — and must
    // still reject, because the progressive stream's byte count does not
    // match the Adam7 pass geometry; it must never silently misrender
    val interlaced = ok.clone()
    interlaced(8 + 8 + 12) = 1 // IHDR data byte 12
    val ihdrData = interlaced.slice(16, 29)
    val c = new java.util.zip.CRC32
    c.update("IHDR".getBytes("US-ASCII")); c.update(ihdrData)
    java.nio.ByteBuffer.wrap(interlaced).putInt(29, c.getValue.toInt)
    val e = intercept[IllegalArgumentException](Codecs.pngDecode(interlaced))
    e.getMessage should include ("IDAT")
  }

  test("PNG Adam7 round-trips exactly; ImageIO's reader agrees; streams differ") {
    val rnd = new scala.util.Random(59)
    // geometries below, straddling, and above the 8-pixel pass lattice —
    // small ones leave some of the seven passes EMPTY
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 9), (8, 8), (13, 11), (40, 23))) {
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256))
      val bytes = Codecs.pngEncode(BmpImage(w, h, rgb), interlaced = true)
      val out = Codecs.pngDecode(bytes)
      (out.width, out.height) shouldBe ((w, h))
      withClue(s"${w}x$h: ") { out.rgb.toSeq shouldBe rgb.toSeq }
      // the JDK's independent PNG reader reconstructs the same pixels
      withClue(s"${w}x$h ImageIO: ") {
        imageIoDecode(bytes).rgb.toSeq shouldBe rgb.toSeq
      }
    }
    // the interlaced container genuinely stores a different byte stream
    val flat = BmpImage(9, 9, Array.tabulate(243)(j => (j * 5) % 256))
    Codecs.pngEncode(flat, interlaced = true).toSeq should not be
      Codecs.pngEncode(flat).toSeq
  }

  test("PNG decoder inflates REAL deflate streams, not only stored blocks") {
    val img = BmpImage(7, 6, Array.tabulate(126)(j => (j * 13) % 256))
    val stored = Codecs.pngEncode(img)
    // re-pack the IDAT with an actually-compressed zlib stream
    val raw = {
      val lenIhdr = 25
      val idatLen = java.nio.ByteBuffer.wrap(stored).getInt(8 + lenIhdr)
      val z = stored.slice(8 + lenIhdr + 8, 8 + lenIhdr + 8 + idatLen)
      val inf = new java.util.zip.Inflater()
      inf.setInput(z)
      val out = new Array[Byte](6 * (1 + 3 * 7))
      inf.inflate(out) shouldBe out.length
      inf.end(); out
    }
    val deflater = new java.util.zip.Deflater(9)
    deflater.setInput(raw); deflater.finish()
    val comp = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(comp)
    deflater.end()
    val repacked = new java.io.ByteArrayOutputStream()
    repacked.write(stored, 0, 8 + 25) // signature + IHDR
    val body = comp.take(n)
    val hdr = java.nio.ByteBuffer.allocate(8)
    hdr.putInt(body.length).put("IDAT".getBytes("US-ASCII"))
    repacked.write(hdr.array())
    repacked.write(body)
    val crc = new java.util.zip.CRC32
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(body)
    repacked.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    repacked.write(stored, stored.length - 12, 12) // IEND
    Codecs.pngDecode(repacked.toByteArray).rgb.toSeq shouldBe img.rgb.toSeq
  }

  test("PNG decoder rejects FDICT zlib streams instead of hanging") {
    // A preset-dictionary stream makes inflate() return 0 with neither
    // finished() nor needsInput() — the drain loop must exit and reject
    // via the length check, never spin (review finding, round 7)
    val img = BmpImage(3, 2, Array.fill(18)(9))
    val stored = Codecs.pngEncode(img)
    // zlib header 0x78 0x20: CMF=deflate/32K, FLG has FDICT set and
    // (0x7820 % 31 == 0) so the header checks pass; then a DICTID
    val body = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0, 0, 0)
    val repacked = new java.io.ByteArrayOutputStream()
    repacked.write(stored, 0, 8 + 25) // signature + IHDR
    val hdr = java.nio.ByteBuffer.allocate(8)
    hdr.putInt(body.length).put("IDAT".getBytes("US-ASCII"))
    repacked.write(hdr.array())
    repacked.write(body)
    val crc = new java.util.zip.CRC32
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(body)
    repacked.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    repacked.write(stored, stored.length - 12, 12) // IEND
    an[IllegalArgumentException] should be thrownBy
      Codecs.pngDecode(repacked.toByteArray)
  }

  test("RLE8 BMP round-trips; non-repeating data hits the size closed form") {
    // no two adjacent pixels equal -> every run is length 1
    val w = 6; val h = 4
    val gray = Array.tabulate(w * h)(j => (j * 11 + 5) % 256)
    val bytes = Codecs.bmpEncodeRle8(w, h, gray)
    bytes.length shouldBe 54 + 1024 + 2 * w * h + 2 * h
    val img = Codecs.bmpDecodeRle8(bytes)
    img.width shouldBe w; img.height shouldBe h
    img.rgb.toSeq shouldBe gray.toSeq.flatMap(g => Seq(g, g, g))
    // flat image: maximal runs, much smaller than 2 bytes/pixel
    val flat = Codecs.bmpEncodeRle8(100, 3, Array.fill(300)(42))
    flat.length shouldBe 54 + 1024 + 3 * 2 + 2 * 3
    Codecs.bmpDecodeRle8(flat).rgb.toSeq shouldBe Seq.fill(300)(Seq(42, 42, 42)).flatten
  }

  test("RLE8 decoder handles absolute mode and delta escapes") {
    // hand-built stream for a 5x2 image (rows bottom-up):
    // bottom row: absolute run of 3 (10,20,30) + padding byte, run 2x40, EOL
    // top row: run 1x7, delta +2 right (skipped pixels stay palette 0),
    //          run 2x9, EOL, EOB
    val base = Codecs.bmpEncodeRle8(5, 2, Array.fill(10)(0))
    val header = base.take(54 + 1024)
    val stream = Array[Byte](
      0, 3, 10, 20, 30, 0, // absolute mode, 3 literals + even pad
      2, 40,               // encoded run
      0, 0,                // EOL
      1, 7,                // run
      0, 2, 2, 0,          // delta: dx=2, dy=0
      2, 9,                // run
      0, 0, 0, 1)          // EOL, EOB
    val bytes = header ++ stream
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(2, bytes.length)      // file size
    buf.putInt(34, stream.length)    // biSizeImage
    val img = Codecs.bmpDecodeRle8(bytes)
    def gray(r: Seq[Int]) = r.flatMap(g => Seq(g, g, g))
    // top-down output: top row first
    img.rgb.toSeq shouldBe gray(Seq(7, 0, 0, 9, 9)) ++ gray(Seq(10, 20, 30, 40, 40))
  }

  test("RLE8 decoder rejects deltas that leave the raster") {
    // a delta past the raster must reject with the documented
    // IllegalArgumentException (the fallback-lane contract), never
    // accumulate toward an out-of-bounds write
    val base = Codecs.bmpEncodeRle8(5, 2, Array.fill(10)(0))
    val header = base.take(54 + 1024)
    def withStream(stream: Array[Byte]): Array[Byte] = {
      val bytes = header ++ stream
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(2, bytes.length)
      buf.putInt(34, stream.length)
      bytes
    }
    // dx=200 on a 5-wide raster
    an[IllegalArgumentException] should be thrownBy
      Codecs.bmpDecodeRle8(withStream(Array[Byte](0, 2, 200.toByte, 0, 0, 0, 1)))
    // dy=200 on a 2-tall raster
    an[IllegalArgumentException] should be thrownBy
      Codecs.bmpDecodeRle8(withStream(Array[Byte](0, 2, 0, 200.toByte, 0, 0, 1)))
    // a delta to exactly the raster edge (x == w) stays legal
    Codecs.bmpDecodeRle8(withStream(Array[Byte](0, 2, 5, 0, 0, 0, 2, 9, 0, 0, 0, 1)))
      .rgb.take(6).toSeq shouldBe Seq(9, 9, 9, 9, 9, 9)
  }

  test("imageDecode dispatches by container and rejects real unsupported variants") {
    val rgb = Array.tabulate(4 * 3 * 3)(j => (j * 7) % 256)
    val img = BmpImage(4, 3, rgb)
    Codecs.imageDecode(Codecs.bmpEncode(img)).rgb.toSeq shouldBe rgb.toSeq
    Codecs.imageDecode(Codecs.pngEncode(img)).rgb.toSeq shouldBe rgb.toSeq
    val gray = Array.tabulate(12)(j => (j * 31) % 256)
    Codecs.imageDecode(Codecs.bmpEncodeRle8(4, 3, gray))
      .rgb.toSeq shouldBe gray.toSeq.flatMap(g => Seq(g, g, g))
    // well-formed 32bpp BMP: sniffs as BMP, decoder rejects the variant
    an[IllegalArgumentException] should be thrownBy
      Codecs.imageDecode(Codecs.bmpEncode32(img))
    an[IllegalArgumentException] should be thrownBy
      Codecs.imageDecode("garbage".getBytes("UTF-8"))
  }

  test("stereo WAV round-trips interleaved samples and channel count") {
    val inter = Array[Short](100, -100, 2000, -2000, 32767, -32768)
    val out = Codecs.wavDecode(Codecs.wavEncode(WavAudio(22050, inter, 2)))
    out.channels shouldBe 2
    out.sampleRate shouldBe 22050
    out.samples.toSeq shouldBe inter.toSeq
  }

  test("8-bit WAV round-trips lattice samples; odd data size gets RIFF pad") {
    val samples = Array[Short](0, 256, -256, 32512, -32768, 2560)
    val out = Codecs.wavDecode(Codecs.wavEncode8(WavAudio(8000, samples)))
    out.samples.toSeq shouldBe samples.toSeq
    val odd = Codecs.wavEncode8(WavAudio(8000, Array[Short](0, 256, 512)))
    odd.length shouldBe 44 + 3 + 1 // data chunk padded to even length
    Codecs.wavDecode(odd).samples.toSeq shouldBe Seq[Short](0, 256, 512)
    an[IllegalArgumentException] should be thrownBy
      Codecs.wavEncode8(WavAudio(8000, Array[Short](100))) // off-lattice
  }

  test("24-bit WAV is a real file the decoder rejects (reject->fallback fixture)") {
    val bytes = Codecs.wavEncode24(WavAudio(8000, Array[Short](1, -2, 3)))
    bytes.length shouldBe 44 + 9 + 1
    val e = intercept[IllegalArgumentException](Codecs.wavDecode(bytes))
    e.getMessage should include ("unsupported bits")
  }

  test("decoders reject crafted geometry bombs as IAE, never a wild allocation") {
    // PNG claiming 65536x65536 with a FIXED-UP CRC: the product overflows
    // a naive w*h*3 Int, so the reject must come from the pixel-count cap,
    // not from NegativeArraySizeException downstream.
    val ok = Codecs.pngEncode(BmpImage(4, 4, Array.fill(48)(9)))
    val bomb = ok.clone()
    val bb = java.nio.ByteBuffer.wrap(bomb)
    bb.putInt(16, 65536).putInt(20, 65536) // IHDR w, h
    val c = new java.util.zip.CRC32
    c.update("IHDR".getBytes("US-ASCII")); c.update(bomb, 16, 13)
    bb.putInt(29, c.getValue.toInt)
    val e1 = intercept[IllegalArgumentException](Codecs.pngDecode(bomb))
    e1.getMessage should include ("unsupported dimensions")
    // short IHDR with a valid CRC must reject on length, not index past it
    val short = new java.io.ByteArrayOutputStream()
    short.write(ok, 0, 8)
    val ihdr5 = Array[Byte](0, 0, 0, 5) ++ "IHDR".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5)
    val c2 = new java.util.zip.CRC32
    c2.update("IHDR".getBytes("US-ASCII")); c2.update(Array[Byte](1, 2, 3, 4, 5))
    short.write(ihdr5)
    short.write(java.nio.ByteBuffer.allocate(4).putInt(c2.getValue.toInt).array())
    short.write(ok, 33, ok.length - 33) // original IDAT + IEND
    val e2 = intercept[IllegalArgumentException](Codecs.pngDecode(short.toByteArray))
    e2.getMessage should include ("bad IHDR length")
    // RLE8 with a bomb geometry (no CRC to fix in BMP headers)
    val rle = Codecs.bmpEncodeRle8(4, 3, Array.fill(12)(1))
    val rbomb = rle.clone()
    java.nio.ByteBuffer.wrap(rbomb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 65536).putInt(22, 65536)
    val e3 = intercept[IllegalArgumentException](Codecs.bmpDecodeRle8(rbomb))
    e3.getMessage should include ("unsupported dimensions")
  }

  test("review findings: header arithmetic cannot escape the IAE contract") {
    // negative biSize: palOff would go negative past the Long checks
    val rle = Codecs.bmpEncodeRle8(4, 3, Array.tabulate(12)(_ * 9 % 256))
    val negHdr = rle.clone()
    java.nio.ByteBuffer.wrap(negHdr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(14, 0x88000000)
    val e1 = intercept[IllegalArgumentException](Codecs.bmpDecodeRle8(negHdr))
    e1.getMessage should include ("bad header size")
    // WAV data chunk declaring ~Int.MaxValue: Int sum wraps negative and
    // previously slipped past the bound into a ~2 GiB allocation
    val wav = Codecs.wavEncode(WavAudio(8000, Array[Short](1, 2, 3, 4)))
    val huge = wav.clone()
    java.nio.ByteBuffer.wrap(huge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 0x7ffffff0)
    val e2 = intercept[IllegalArgumentException](Codecs.wavDecode(huge))
    e2.getMessage should include ("truncated chunk")
    // ragged 16-bit data (3 bytes) must reject like the encoder would
    val ragged = wav.clone()
    java.nio.ByteBuffer.wrap(ragged).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 3)
    val e3 = intercept[IllegalArgumentException](Codecs.wavDecode(ragged))
    e3.getMessage should include ("ragged")
    // PNG whose zlib stream holds MORE rows than IHDR declares: the
    // surplus is a geometry mismatch, not data to silently drop
    val threeRows = Codecs.pngEncode(BmpImage(3, 3, Array.tabulate(27)(_ * 7 % 256)))
    val shrunk = threeRows.clone()
    java.nio.ByteBuffer.wrap(shrunk).putInt(20, 2) // IHDR h: 3 -> 2
    val c = new java.util.zip.CRC32
    c.update("IHDR".getBytes("US-ASCII")); c.update(shrunk, 16, 13)
    java.nio.ByteBuffer.wrap(shrunk).putInt(29, c.getValue.toInt)
    val e4 = intercept[IllegalArgumentException](Codecs.pngDecode(shrunk))
    e4.getMessage should include ("past the declared geometry")
  }

  test("mutation fuzz: corrupt containers reject cleanly, never crash wild") {
    // The decoder fence contract: ANY byte corruption either still decodes
    // or throws the documented IllegalArgumentException — no index/alloc/
    // arithmetic crashes leak from header-controlled values.
    val rnd = new scala.util.Random(97)
    val img = BmpImage(7, 5, Array.tabulate(105)(j => (j * 19) % 256))
    val fixtures: Seq[Array[Byte]] = Seq(
      Codecs.bmpEncode(img),
      Codecs.pngEncode(img),
      Codecs.bmpEncodeRle8(7, 5, Array.tabulate(35)(j => (j * 13) % 256)),
      Codecs.bmpEncode32(img),
      Codecs.wavEncode(WavAudio(8000, Array.tabulate(40)(k => (k * 321 - 6000).toShort))),
      Codecs.wavEncode(WavAudio(8000, Array.tabulate(40)(k => (k * 321 - 6000).toShort), 2)),
      Codecs.wavEncode8(WavAudio(8000, Array.tabulate(39)(k => ((k % 200 - 100) * 256).toShort))),
      Codecs.wavEncode24(WavAudio(8000, Array.tabulate(21)(k => (k * 777 - 8000).toShort))),
      Codecs.jpegEncode(img, Codecs.JpegColor444),
      Codecs.jpegEncode(img, Codecs.JpegColor420, restartInterval = 1),
      Codecs.jpegEncode(img, Codecs.JpegColor422),
      Codecs.jpegEncode(img, Codecs.JpegGray))
    for (base <- fixtures; _ <- 1 to 150) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(4)) // 1..4 byte flips, headers included
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try {
        Codecs.imageDecode(mutated); ()
      } catch { case _: IllegalArgumentException => () } // the ONLY legal throw
      try {
        Codecs.wavDecode(mutated); ()
      } catch { case _: IllegalArgumentException => () }
    }
    // truncations at every prefix length of a small file, same contract
    val png = Codecs.pngEncode(BmpImage(3, 2, Array.fill(18)(5)))
    for (n <- 0 until png.length) {
      try { Codecs.imageDecode(png.take(n)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("synthetic media specs match their closed forms") {
    val img = Multimodal.imageSpec(6L)
    img.width shouldBe (5 + 6 % 12)
    img.height shouldBe (3 + 6 % 7)
    img.rgb(10) shouldBe ((6 * 31 + 10 * 7) % 256)
    val aud = Multimodal.audioSpec(7L)
    aud.samples.length shouldBe (16 + 7 % 50)
    aud.samples(3) shouldBe (((7 * 13 + 3 * 29) % 4096) - 2048).toShort
  }

  // --- JPEG ---------------------------------------------------------------

  /** Decode via the JDK's independent ImageIO JPEG reader (its own Huffman
    * + IDCT + color conversion, nothing shared with [[Codecs]]) for
    * differential testing. */
  private def imageIoDecode(bytes: Array[Byte]): BmpImage = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(bi != null, "ImageIO could not decode")
    // raw raster samples, NOT getRGB: getRGB on TYPE_BYTE_GRAY runs the
    // linear-gray→sRGB color-management transform (a gamma curve), which
    // is not part of JPEG decoding
    val raster = bi.getRaster
    val nb = raster.getNumBands
    val rgb = new Array[Int](bi.getWidth * bi.getHeight * 3)
    for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth) {
      val o = (y * bi.getWidth + x) * 3
      if (nb == 1) {
        val v = raster.getSample(x, y, 0)
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
      } else {
        rgb(o) = raster.getSample(x, y, 0)
        rgb(o + 1) = raster.getSample(x, y, 1)
        rgb(o + 2) = raster.getSample(x, y, 2)
      }
    }
    BmpImage(bi.getWidth, bi.getHeight, rgb)
  }

  private def maxChannelDiff(a: BmpImage, b: BmpImage): Int = {
    a.width shouldBe b.width
    a.height shouldBe b.height
    a.rgb.indices.map(i => math.abs(a.rgb(i) - b.rgb(i))).max
  }

  test("JPEG: flat-block spec images round-trip EXACTLY in all three modes") {
    // Flat 8x8 blocks put all signal in the DC coefficient, which unit
    // quantization and the float IDCT reproduce bit-exactly, and equal
    // R=G=B pins chroma at neutral 128 — the property the variant-blind
    // lake oracle rests on. Geometries cross block AND MCU boundaries.
    for (d <- Seq(0L, 1L, 2L, 5L, 17L, 40L, 83L)) {
      val spec = Multimodal.jpegSpec(d)
      for ((mode, ri) <- Seq((Codecs.JpegColor444, 0), (Codecs.JpegColor420, 2),
                             (Codecs.JpegGray, 0), (Codecs.JpegColor422, 0))) {
        val bytes = Codecs.jpegEncode(spec, mode, restartInterval = ri)
        val out = Codecs.jpegDecode(bytes)
        (out.width, out.height) shouldBe ((spec.width, spec.height))
        withClue(s"d=$d mode=$mode: ") { out.rgb.toSeq shouldBe spec.rgb.toSeq }
        // the JDK's independent decoder agrees exactly on DC-only blocks
        withClue(s"d=$d mode=$mode ImageIO: ") {
          imageIoDecode(bytes).rgb.toSeq shouldBe spec.rgb.toSeq
        }
      }
    }
  }

  test("JPEG: general images (nonzero AC) round-trip within DCT rounding") {
    val rnd = new scala.util.Random(31)
    val img = BmpImage(21, 13, Array.fill(21 * 13 * 3)(rnd.nextInt(256)))
    // quant=1: the only loss is coefficient rounding (±0.5 each) plus the
    // integer YCbCr round trip
    val d444 = Codecs.jpegDecode(Codecs.jpegEncode(img, Codecs.JpegColor444))
    maxChannelDiff(d444, img) should be <= 8
    val gray = BmpImage(21, 13, Array.tabulate(21 * 13 * 3)(i => (i / 3 * 37) % 256))
    val dGray = Codecs.jpegDecode(Codecs.jpegEncode(gray, Codecs.JpegGray))
    maxChannelDiff(dGray, gray) should be <= 2
    // coarser quantization loses more but stays bounded by quant * basis sum
    val q8 = Codecs.jpegDecode(Codecs.jpegEncode(img, Codecs.JpegColor444, quant = 8))
    maxChannelDiff(q8, img) should be <= 40
  }

  test("JPEG: degenerate geometries round-trip in every mode") {
    // 1x1 (all padding), sub-block, exact-block, just-over-block, and a
    // wide-flat strip — each through all four component layouts. Equal
    // channels keep chroma neutral so subsampling is exact and the only
    // loss is luma DCT rounding.
    val rnd = new scala.util.Random(71)
    for ((w, h) <- Seq((1, 1), (7, 5), (8, 8), (9, 9), (16, 3));
         mode <- Seq(Codecs.JpegGray, Codecs.JpegColor444,
                     Codecs.JpegColor420, Codecs.JpegColor422)) {
      val img = BmpImage(w, h,
        Array.tabulate(w * h)(_ => rnd.nextInt(256)).flatMap(v => Array(v, v, v)))
      val out = Codecs.jpegDecode(Codecs.jpegEncode(img, mode))
      (out.width, out.height) shouldBe ((w, h))
      withClue(s"${w}x$h mode=$mode: ") {
        maxChannelDiff(out, img) should be <= 8
      }
    }
  }

  test("JPEG: differential vs the JDK decoder on AC-heavy images") {
    // Same FILE, two independent decoders (my float IDCT vs the JDK's
    // libjpeg-style integer IDCT): per-sample agreement within the JPEG
    // conformance-style tolerance, on all modes incl. restart markers.
    val rnd = new scala.util.Random(57)
    val img = BmpImage(24, 16, Array.fill(24 * 16 * 3)(rnd.nextInt(256)))
    // neutral-chroma content for the 4:2:0 case: with varying chroma the
    // JDK's triangular chroma upsampling legitimately diverges from this
    // decoder's replication (both are spec-conformant); flat chroma makes
    // every upsampler agree while the luma path stays AC-heavy
    val lumaOnly = BmpImage(24, 16, Array.tabulate(24 * 16)(_ => rnd.nextInt(256))
      .flatMap(v => Array(v, v, v)))
    for ((label, bytes) <- Seq(
        "444" -> Codecs.jpegEncode(img, Codecs.JpegColor444),
        "444q4" -> Codecs.jpegEncode(img, Codecs.JpegColor444, quant = 4),
        "420rst" -> Codecs.jpegEncode(lumaOnly, Codecs.JpegColor420, restartInterval = 1),
        "422" -> Codecs.jpegEncode(lumaOnly, Codecs.JpegColor422),
        "gray" -> Codecs.jpegEncode(img, Codecs.JpegGray))) {
      withClue(s"$label: ") {
        maxChannelDiff(Codecs.jpegDecode(bytes), imageIoDecode(bytes)) should be <= 3
      }
    }
    // realistic Annex-K quantization (separate luma/chroma tables, zigzag
    // DQT transmission): same file, both decoders, tight agreement — and
    // the coarse tables must actually shrink the file vs near-lossless
    val std = Codecs.jpegEncode(img, Codecs.JpegColor444,
      lumaQuant = Codecs.JpegStdLumaQuant, chromaQuant = Codecs.JpegStdChromaQuant)
    maxChannelDiff(Codecs.jpegDecode(std), imageIoDecode(std)) should be <= 4
    std.length should be < Codecs.jpegEncode(img, Codecs.JpegColor444).length
    val stdGray = Codecs.jpegEncode(img, Codecs.JpegGray,
      lumaQuant = Codecs.JpegStdLumaQuant)
    maxChannelDiff(Codecs.jpegDecode(stdGray), imageIoDecode(stdGray)) should be <= 4
  }

  test("JPEG: FF fill bytes before markers are legal and skipped (T.81 B.1.1.2)") {
    val img = Multimodal.jpegSpec(11L)
    val base = Codecs.jpegEncode(img, Codecs.JpegColor444)
    // insert two fill bytes before SOF0's marker
    val sof = base.indices.dropRight(1)
      .find(i => (base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0).get
    val padded = base.take(sof) ++ Array[Byte](0xff.toByte, 0xff.toByte) ++ base.drop(sof)
    Codecs.jpegDecode(padded).rgb.toSeq shouldBe img.rgb.toSeq
  }

  test("JPEG: non-baseline and bomb variants reject with the documented throw") {
    val img = Multimodal.jpegSpec(7L)
    val base = Codecs.jpegEncode(img, Codecs.JpegColor444)
    def findMarker(bytes: Array[Byte], m: Int): Int = {
      val i = bytes.indices.dropRight(1)
        .find(i => (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == m)
      i.getOrElse(fail(s"marker $m not found"))
    }
    // SOF0 -> SOF2: well-formed-looking progressive tag must reject by NAME
    val prog = base.clone()
    prog(findMarker(prog, 0xc0) + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](Codecs.jpegDecode(prog))
    e.getMessage should include("progressive")
    // geometry bomb: huge declared dims reject before any allocation
    val bomb = base.clone()
    val sof = findMarker(bomb, 0xc0)
    bomb(sof + 5) = 0xff.toByte; bomb(sof + 6) = 0xff.toByte // height 65535
    bomb(sof + 7) = 0xff.toByte; bomb(sof + 8) = 0xff.toByte // width 65535
    an[IllegalArgumentException] should be thrownBy Codecs.jpegDecode(bomb)
    // every truncation prefix rejects cleanly
    for (n <- 0 until base.length) {
      try { Codecs.jpegDecode(base.take(n)); () }
      catch { case _: IllegalArgumentException => () }
    }
    // imageDecode routes JPEG magic to the real decoder
    Codecs.imageDecode(base).rgb.toSeq shouldBe img.rgb.toSeq
  }

  // ---- AVI (motion-JPEG) container ----

  /** Flat-block frames (the family the lossy JPEG path reproduces
    * bit-exactly), one per index so frames are distinguishable. */
  private def aviFrames(d: Long, n: Int): Seq[BmpImage] =
    (0 until n).map(f => Multimodal.videoFrameSpec(d, f))

  test("AVI: MJPEG round-trips frames exactly across JPEG modes") {
    for (d <- Seq(0L, 5L, 11L)) {
      val frames = aviFrames(d, 3)
      val w = frames.head.width; val h = frames.head.height
      for (mode <- Seq(Codecs.JpegColor444, Codecs.JpegColor420, Codecs.JpegGray)) {
        val payloads = frames.map(Codecs.jpegEncode(_, mode))
        val avi = Codecs.aviEncodeMjpeg(w, h, 40000, payloads)
        val out = Codecs.aviDecode(avi)
        out.width shouldBe w
        out.height shouldBe h
        out.usPerFrame shouldBe 40000
        out.frames.length shouldBe 3
        out.frames.zip(frames).foreach { case (got, want) =>
          got.rgb.toSeq shouldBe want.rgb.toSeq
        }
      }
    }
  }

  test("AVI: odd-length frame chunks get the RIFF even pad and still parse") {
    // hunt a frame whose JFIF payload has odd length — entropy size varies
    val odd = (0L until 64L).flatMap { d =>
      val f = Multimodal.videoFrameSpec(d, 1)
      val p = Codecs.jpegEncode(f, Codecs.JpegColor444)
      if (p.length % 2 == 1) Some((f, p)) else None
    }
    odd should not be empty
    val (img, payload) = odd.head
    val avi = Codecs.aviEncodeMjpeg(img.width, img.height, 33333, Seq(payload, payload))
    val out = Codecs.aviDecode(avi)
    out.frames.length shouldBe 2
    out.frames.foreach(_.rgb.toSeq shouldBe img.rgb.toSeq)
  }

  test("AVI: DIB variant is a well-formed file the decoder rejects") {
    val frames = aviFrames(3L, 2)
    val avi = Codecs.aviEncodeDib(40000, frames)
    // well-formed RIFF: starts RIFF/AVI , sizes consistent
    new String(avi.take(4), "US-ASCII") shouldBe "RIFF"
    new String(avi.slice(8, 12), "US-ASCII") shouldBe "AVI "
    val e = intercept[IllegalArgumentException](Codecs.aviDecode(avi))
    e.getMessage should include("unsupported AVI codec")
  }

  test("AVI: header cross-checks reject mismatched frame counts") {
    val frames = aviFrames(7L, 3)
    val w = frames.head.width; val h = frames.head.height
    val avi = Codecs.aviEncodeMjpeg(w, h, 40000,
      frames.map(Codecs.jpegEncode(_, Codecs.JpegColor444)))
    // avih body starts at offset 32 (RIFF 12 + LIST hdr 12 + chunk hdr 8);
    // dwTotalFrames is byte 16 of the body
    val patched = avi.clone()
    patched(48) = (frames.length + 1).toByte
    val e = intercept[IllegalArgumentException](Codecs.aviDecode(patched))
    e.getMessage should include("frame chunks")
  }

  test("AVI: geometry/frame-count bombs reject before allocation") {
    val frames = aviFrames(1L, 2)
    val w = frames.head.width; val h = frames.head.height
    val avi = Codecs.aviEncodeMjpeg(w, h, 40000,
      frames.map(Codecs.jpegEncode(_, Codecs.JpegColor444)))
    // huge dwTotalFrames (avih body+16 → abs 48..51)
    val bomb = avi.clone()
    bomb(48) = 0xff.toByte; bomb(49) = 0xff.toByte
    bomb(50) = 0xff.toByte; bomb(51) = 0x0f.toByte
    an[IllegalArgumentException] should be thrownBy Codecs.aviDecode(bomb)
    // every truncation prefix rejects cleanly (never a wild exception)
    for (n <- 0 until avi.length) {
      try { Codecs.aviDecode(avi.take(n)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("AVI: mutation fuzz rejects cleanly or decodes, never crashes wild") {
    val frames = aviFrames(9L, 2)
    val w = frames.head.width; val h = frames.head.height
    val avi = Codecs.aviEncodeMjpeg(w, h, 40000,
      frames.map(Codecs.jpegEncode(_, Codecs.JpegColor420)))
    // deterministic single-byte corruptions across the whole file
    var i = 0
    while (i < avi.length) {
      val m = avi.clone()
      m(i) = (m(i) ^ ((i * 37 + 11) & 0xff)).toByte
      try { Codecs.aviDecode(m); () }
      catch { case _: IllegalArgumentException => () }
      i += math.max(1, avi.length / 331)
    }
  }

  // --- POSIX ustar ---------------------------------------------------------

  test("tar round-trips members exactly; commons-compress agrees both ways") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
    val rnd = new scala.util.Random(67)
    val members = Seq(
      ("a.txt", "hello tar".getBytes("UTF-8")),
      ("empty.bin", Array.emptyByteArray),
      ("block.bin", Array.fill(512)(rnd.nextInt(256).toByte)), // exact block
      ("odd.bin", Array.fill(700)(rnd.nextInt(256).toByte)),
      ("doc_99.txt", ("x" * 1300).getBytes("UTF-8")))
    val tar = Codecs.tarEncode(members)
    // our reader inverts our writer
    val back = Codecs.tarExtract(tar)
    back.map(_._1) shouldBe members.map(_._1)
    for (((_, want), (_, got)) <- members.zip(back))
      got.toSeq shouldBe want.toSeq
    // commons-compress (independent implementation) reads our archives
    val in = new TarArchiveInputStream(new java.io.ByteArrayInputStream(tar))
    for ((name, want) <- members) {
      val e = in.getNextEntry
      e.getName shouldBe name
      e.getSize shouldBe want.length.toLong
      in.readAllBytes().toSeq shouldBe want.toSeq
    }
    in.getNextEntry shouldBe null
    // ...and we read commons-compress's archives
    val bos = new java.io.ByteArrayOutputStream()
    val tos = new TarArchiveOutputStream(bos)
    for ((name, data) <- members) {
      val e = new TarArchiveEntry(name)
      e.setSize(data.length.toLong)
      tos.putArchiveEntry(e); tos.write(data); tos.closeArchiveEntry()
    }
    tos.close()
    val theirs = Codecs.tarExtract(bos.toByteArray)
    theirs.map(_._1) shouldBe members.map(_._1)
    for (((_, want), (_, got)) <- members.zip(theirs))
      got.toSeq shouldBe want.toSeq
  }

  test("ZIP round-trips stored and deflated; the JDK agrees both ways") {
    import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
    val rnd = new scala.util.Random(73)
    val members = Seq(
      ("a.txt", "hello zip".getBytes("UTF-8")),
      ("empty.bin", Array.emptyByteArray),
      ("noise.bin", Array.fill(700)(rnd.nextInt(256).toByte)),
      ("doc_7.txt", ("y" * 1800).getBytes("UTF-8")))
    for (deflated <- Seq(false, true)) {
      val zip = Codecs.zipEncode(members, deflated)
      val back = Codecs.zipExtract(zip)
      back.map(_._1) shouldBe members.map(_._1)
      for (((_, want), (_, got)) <- members.zip(back))
        got.toSeq shouldBe want.toSeq
      // the JDK's independent reader accepts our archives
      val in = new ZipInputStream(new java.io.ByteArrayInputStream(zip))
      for ((name, want) <- members) {
        val e = in.getNextEntry
        e.getName shouldBe name
        in.readAllBytes().toSeq shouldBe want.toSeq
      }
      in.getNextEntry shouldBe null
    }
    // ...and we read the JDK writer's archives (its own deflate stream)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    for ((name, data) <- members) {
      val e = new ZipEntry(name)
      e.setTime(0L)
      zos.putNextEntry(e); zos.write(data); zos.closeEntry()
    }
    zos.close()
    val theirs = Codecs.zipExtract(bos.toByteArray)
    theirs.map(_._1) shouldBe members.map(_._1)
    for (((_, want), (_, got)) <- members.zip(theirs))
      got.toSeq shouldBe want.toSeq
  }

  test("ZIP: corruption rejects cleanly — CRC catches silent data damage") {
    val members = Seq(
      ("m1.txt", "zip payload one".getBytes("UTF-8")),
      ("m2.bin", Array.tabulate(900)(i => (i % 249).toByte)))
    for (deflated <- Seq(false, true)) {
      val base = Codecs.zipEncode(members, deflated)
      var i = 0
      while (i < base.length) {
        val m = base.clone()
        m(i) = (m(i) ^ ((i * 37 + 13) & 0xff)).toByte
        try {
          // if it extracts, the CRC gate guarantees intact content
          for (((_, want), (_, got)) <- members.zip(Codecs.zipExtract(m)))
            got.toSeq shouldBe want.toSeq
        } catch { case _: IllegalArgumentException => () }
        i += 1
      }
      for (n <- 0 until base.length by 5) {
        try { Codecs.zipExtract(base.take(n)); () }
        catch { case _: IllegalArgumentException => () }
      }
    }
  }

  test("gzip round-trips, is deterministic, and rejects corruption cleanly") {
    val rnd = new scala.util.Random(71)
    for (n <- Seq(0, 1, 100, 9000)) {
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      Codecs.gzipDecode(Codecs.gzipEncode(data)).toSeq shouldBe data.toSeq
    }
    val payload = "determinism check".getBytes("UTF-8")
    Codecs.gzipEncode(payload).toSeq shouldBe Codecs.gzipEncode(payload).toSeq
    val base = Codecs.gzipEncode(Array.tabulate(500)(i => (i % 251).toByte))
    var i = 0
    while (i < base.length) {
      val m = base.clone()
      m(i) = (m(i) ^ ((i * 29 + 3) & 0xff)).toByte
      try { Codecs.gzipDecode(m); () }
      catch { case _: IllegalArgumentException => () }
      i += 1
    }
  }

  test("tar: corrupt headers reject cleanly, never crash wild") {
    val base = Codecs.tarEncode(Seq(
      ("m1.txt", "payload one".getBytes("UTF-8")),
      ("m2.txt", Array.tabulate(600)(i => (i % 251).toByte))))
    // single-byte corruptions across the archive: either still extracts
    // (data-byte flips don't break headers) or rejects as documented
    var i = 0
    while (i < base.length) {
      val m = base.clone()
      m(i) = (m(i) ^ ((i * 31 + 5) & 0xff)).toByte
      try { Codecs.tarExtract(m); () }
      catch { case _: IllegalArgumentException => () }
      i += math.max(1, base.length / 257)
    }
    for (n <- 0 until base.length by 7) {
      try { Codecs.tarExtract(base.take(n)); () }
      catch { case _: IllegalArgumentException => () }
    }
    // a declared size past the archive must reject, not overread
    val lying = base.clone()
    lying(124) = '7' // blow up the first member's octal size
    an[IllegalArgumentException] should be thrownBy Codecs.tarExtract(lying)
    // trailing garbage after the end-of-archive zero block rejects (a
    // second concatenated archive must not silently vanish); zero
    // padding — what block-sized writers append — still passes
    an[IllegalArgumentException] should be thrownBy
      Codecs.tarExtract(base ++ Array[Byte](1, 2, 3))
    Codecs.tarExtract(base ++ new Array[Byte](512)).map(_._1) shouldBe
      Seq("m1.txt", "m2.txt")
  }

  test("ZIP: EOCD signature inside a trailing comment does not misparse") {
    val members = Seq(("c.txt", "comment survivor".getBytes("UTF-8")))
    val zip = Codecs.zipEncode(members)
    // append a legitimate 26-byte comment whose first bytes ARE the EOCD
    // signature: the locator must skip the embedded fake (its comment
    // length is inconsistent with the file tail) and use the real record
    val fake = Array[Byte]('P', 'K', 5, 6) ++ new Array[Byte](22)
    val commented = zip.dropRight(2) ++ Array[Byte](26, 0) ++ fake
    val back = Codecs.zipExtract(commented)
    back.map(_._1) shouldBe Seq("c.txt")
    new String(back.head._2, "UTF-8") shouldBe "comment survivor"
  }

  test("archive nesting: one level extracts composite names; depth 2 stays opaque") {
    val innerZip = Codecs.zipEncode(Seq(("doc_3.txt", "gamma".getBytes("UTF-8"))),
      deflated = true)
    val innerTgz = Codecs.gzipEncode(
      Codecs.tarEncode(Seq(("doc_4.txt", "delta".getBytes("UTF-8")))))
    val deep = Codecs.tarEncode(Seq(("leaf.txt", "epsilon".getBytes("UTF-8"))))
    val holder = Codecs.zipEncode(Seq(("deep.tar", deep)))
    val outer = Codecs.tarEncode(Seq(
      ("doc_1.txt", "alpha".getBytes("UTF-8")),
      ("inner.zip", innerZip),
      ("inner.tgz", innerTgz),
      ("holder.zip", holder)))
    val got = Codecs.archiveExtractNested(outer)
    got.map(_._1) shouldBe Seq("doc_1.txt", "inner.zip!doc_3.txt",
      "inner.tgz!doc_4.txt", "holder.zip!deep.tar")
    new String(got(1)._2, "UTF-8") shouldBe "gamma"
    new String(got(2)._2, "UTF-8") shouldBe "delta"
    // depth 2: the tar inside the inner zip surfaces as OPAQUE bytes
    got(3)._2.toSeq shouldBe deep.toSeq
    // a member that merely LOOKS like an archive stays opaque too
    val falseSniff = Codecs.tarEncode(Seq(
      ("pk.bin", Array[Byte]('P', 'K', 3, 4) ++ "not a real zip".getBytes)))
    Codecs.archiveExtractNested(falseSniff).map(_._1) shouldBe Seq("pk.bin")
    // explicit budgets bind across levels
    an[Codecs.ArchiveBudgetException] should be thrownBy
      Codecs.archiveExtractNested(outer, budget = 4L)
  }

  test("zip bomb: lying declared size rejects at the cap BEFORE allocation") {
    val zip = Codecs.zipEncode(Seq(("a.bin", Array.fill(100)(7.toByte))),
      deflated = true)
    // patch the central directory's uncompressed-size field to 1 GiB
    def u32at(p: Int): Long =
      (zip(p) & 0xffL) | ((zip(p + 1) & 0xffL) << 8) |
        ((zip(p + 2) & 0xffL) << 16) | ((zip(p + 3) & 0xffL) << 24)
    val cd = zip.indices.find(p => p + 4 <= zip.length &&
      u32at(p) == 0x02014b50L).get
    val bomb = zip.clone()
    bomb(cd + 24) = 0; bomb(cd + 25) = 0; bomb(cd + 26) = 0; bomb(cd + 27) = 0x40
    an[Codecs.ArchiveBudgetException] should be thrownBy Codecs.zipExtract(bomb)
  }

  test("gzip bomb: 80 MiB of zeros rejects at the cap and quarantines as a bundle") {
    val bomb = Codecs.gzipEncode(new Array[Byte](80 << 20)) // ~80 KiB packed
    an[Codecs.ArchiveBudgetException] should be thrownBy Codecs.gzipDecode(bomb)
    // nested inside an otherwise-fine tar: the WHOLE bundle rejects (the
    // budget discipline, not the opaque-member fallback) and the shared
    // ingest helper turns it into ONE quarantine row, never an OOM
    val bundle = Codecs.tarEncode(Seq(
      ("ok.txt", "fine".getBytes("UTF-8")), ("bomb.gz", bomb)))
    an[Codecs.ArchiveBudgetException] should be thrownBy
      Codecs.archiveExtractNested(bundle)
    graft.extensions.Multimodal.archiveManifestRows(bundle) shouldBe
      Seq((null, -1L, null))
  }

  // --- AVI A/V demux -------------------------------------------------------

  test("AVI A/V: interleaved µ-law track demuxes exactly; video unchanged") {
    val frames = (0 until 3).map(f => Multimodal.videoFrameSpec(5L, f))
    val w = frames.head.width; val h = frames.head.height
    val codes = Array.tabulate(41)(k => ((k * 13 + 9) % 256).toByte)
    val avi = Codecs.aviEncodeMjpegAv(w, h, 40000,
      frames.map(Codecs.jpegEncode(_, Codecs.JpegColor444)), 8000, codes)
    val av = Codecs.aviDecodeAv(avi)
    av.video.frames.length shouldBe 3
    for ((img, f) <- av.video.frames.zipWithIndex)
      withClue(s"frame $f: ") { img.rgb.toSeq shouldBe frames(f).rgb.toSeq }
    val audio = av.audio.get
    audio.sampleRate shouldBe 8000
    audio.samples.toSeq shouldBe codes.map(Codecs.mulawExpand).toSeq
    // the video-only view drops the track but decodes identically
    Codecs.aviDecode(avi).frames.length shouldBe 3
    // audio-less files still return None
    val plain = Codecs.aviEncodeMjpeg(w, h, 40000,
      frames.map(Codecs.jpegEncode(_, Codecs.JpegColor444)))
    Codecs.aviDecodeAv(plain).audio shouldBe None
  }

  test("AVI A/V: PCM8 audio track is a well-formed reject") {
    val frames = (0 until 2).map(f => Multimodal.videoFrameSpec(8L, f))
    val w = frames.head.width; val h = frames.head.height
    val codes = Array.tabulate(20)(k => ((k * 7) % 256).toByte)
    val avi = Codecs.aviEncodeMjpegAv(w, h, 40000,
      frames.map(Codecs.jpegEncode(_, Codecs.JpegColor444)), 8000, codes,
      fmtTag = 1)
    val e = intercept[IllegalArgumentException](Codecs.aviDecodeAv(avi))
    e.getMessage should include ("unsupported AVI audio codec")
  }

  test("AVI A/V: mutation fuzz rejects cleanly or decodes, never crashes wild") {
    val frames = (0 until 2).map(f => Multimodal.videoFrameSpec(11L, f))
    val w = frames.head.width; val h = frames.head.height
    val codes = Array.tabulate(30)(k => ((k * 19 + 1) % 256).toByte)
    val avi = Codecs.aviEncodeMjpegAv(w, h, 40000,
      frames.map(Codecs.jpegEncode(_, Codecs.JpegColor420, restartInterval = 2)),
      8000, codes)
    var i = 0
    while (i < avi.length) {
      val m = avi.clone()
      m(i) = (m(i) ^ ((i * 41 + 7) & 0xff)).toByte
      try { Codecs.aviDecodeAv(m); () }
      catch { case _: IllegalArgumentException => () }
      i += math.max(1, avi.length / 331)
    }
  }

  // --- G.711 µ-law ---------------------------------------------------------

  test("µ-law: compress∘expand is the identity on every code (except -0)") {
    // the classic involution: each of the 256 code bytes names one
    // quantization level, and re-compressing its expansion returns the
    // same byte — 0x7F is negative zero, which collapses onto +0 (0xFF)
    for (b <- 0 until 256 if b != 0x7f) {
      withClue(f"code 0x$b%02x: ") {
        Codecs.mulawCompress(Codecs.mulawExpand(b.toByte)) shouldBe b.toByte
      }
    }
    Codecs.mulawExpand(0x7f.toByte) shouldBe 0.toShort
    Codecs.mulawExpand(0xff.toByte) shouldBe 0.toShort
  }

  test("µ-law: the JDK's independent ULAW converter agrees on all 256 codes") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val codes = Array.tabulate(256)(_.toByte)
    val ulaw = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val pcm = new AudioFormat(8000f, 16, 1, true, false) // 16-bit LE signed
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes), ulaw, codes.length.toLong)
    val conv = AudioSystem.getAudioInputStream(pcm, in)
    val out = conv.readAllBytes()
    out.length shouldBe 512
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until 256) {
      withClue(f"code 0x$i%02x: ") {
        Codecs.mulawExpand(codes(i)) shouldBe bb.getShort(2 * i)
      }
    }
  }

  test("µ-law WAV round-trips: codes → container → expansion; PCM → quantized") {
    // raw-code path (odd length exercises the RIFF pad byte)
    val codes = Array.tabulate(33)(k => ((k * 13 + 5) % 256).toByte)
    val wav = Codecs.wavEncodeMulawCodes(8000, codes)
    val a = Codecs.wavDecode(wav)
    a.sampleRate shouldBe 8000
    a.channels shouldBe 1
    a.samples.toSeq shouldBe codes.map(Codecs.mulawExpand).toSeq
    // PCM path: decode(encode(x)) is exactly per-sample µ-law quantization
    val pcmIn = WavAudio(8000, Array.tabulate(40)(k => (k * 777 - 12000).toShort))
    val back = Codecs.wavDecode(Codecs.wavEncodeMulaw(pcmIn))
    back.samples.toSeq shouldBe
      pcmIn.samples.map(s => Codecs.mulawExpand(Codecs.mulawCompress(s))).toSeq
  }

  test("µ-law: mutation fuzz rejects cleanly or decodes, never crashes wild") {
    val rnd = new scala.util.Random(103)
    val base = Codecs.wavEncodeMulawCodes(8000,
      Array.tabulate(40)(k => ((k * 29 + 3) % 256).toByte))
    for (_ <- 1 to 300) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { Codecs.wavDecode(mutated); () }
      catch { case _: IllegalArgumentException => () } // the ONLY legal throw
    }
    for (n <- 0 until base.length) {
      try { Codecs.wavDecode(base.take(n)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  // --- GIF ----------------------------------------------------------------

  /** Decode via ImageIO's independent GIF reader. Indexed GIFs come back
    * under an IndexColorModel, where getRGB is a direct palette lookup —
    * none of the gray-to-sRGB color management that makes getRGB wrong on
    * TYPE_BYTE_GRAY JPEG output. */
  private def imageIoDecodeGif(bytes: Array[Byte]): BmpImage = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(bi != null, "ImageIO could not decode")
    val rgb = new Array[Int](bi.getWidth * bi.getHeight * 3)
    for (y <- 0 until bi.getHeight; x <- 0 until bi.getWidth) {
      val argb = bi.getRGB(x, y)
      val o = (y * bi.getWidth + x) * 3
      rgb(o) = (argb >> 16) & 0xff
      rgb(o + 1) = (argb >> 8) & 0xff
      rgb(o + 2) = argb & 0xff
    }
    BmpImage(bi.getWidth, bi.getHeight, rgb)
  }

  test("GIF round-trips exactly across variants; big noise forces table-full resets") {
    val rnd = new scala.util.Random(41)
    // degenerate geometries + the lake's range + 24000 random pixels (noise
    // drives the LZW table past 4096 → the CLEAR/reset path runs)
    val geos = Seq((1, 1), (1, 7), (9, 1), (5, 3), (17, 11), (32, 19), (200, 120))
    for ((w, h) <- geos; interlaced <- Seq(false, true); gce <- Seq(false, true)) {
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      val bytes = Codecs.gifEncode(w, h, gray, interlaced, gce)
      val out = Codecs.gifDecode(bytes)
      (out.width, out.height) shouldBe ((w, h))
      withClue(s"${w}x$h interlaced=$interlaced gce=$gce: ") {
        out.rgb.toSeq shouldBe gray.flatMap(v => Seq(v, v, v)).toSeq
      }
    }
    // the interlaced container really stores rows in a different order
    val flat = Array.tabulate(6 * 9)(j => (j * 7) % 256)
    Codecs.gifEncode(6, 9, flat, interlaced = true).toSeq should not be
      Codecs.gifEncode(6, 9, flat).toSeq
  }

  test("GIF: the JDK's independent ImageIO reader agrees on our encodes") {
    val rnd = new scala.util.Random(42)
    for ((w, h) <- Seq((17, 11), (32, 19), (80, 40));
         interlaced <- Seq(false, true)) {
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      val bytes = Codecs.gifEncode(w, h, gray, interlaced)
      withClue(s"${w}x$h interlaced=$interlaced: ") {
        imageIoDecodeGif(bytes).rgb.toSeq shouldBe
          gray.flatMap(v => Seq(v, v, v)).toSeq
      }
    }
  }

  test("GIF: ImageIO-WRITTEN files (independent LZW compressor) decode exactly") {
    val rnd = new scala.util.Random(43)
    for ((w, h) <- Seq((23, 9), (64, 48))) {
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      val ids = Array.tabulate(256)(_.toByte)
      val cm = new java.awt.image.IndexColorModel(8, 256, ids, ids, ids)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, gray(y * w + x))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "gif", bos) shouldBe true
      val out = Codecs.gifDecode(bos.toByteArray)
      (out.width, out.height) shouldBe ((w, h))
      withClue(s"${w}x$h: ") {
        out.rgb.toSeq shouldBe gray.flatMap(v => Seq(v, v, v)).toSeq
      }
    }
  }

  test("GIF: animated files are well-formed (ImageIO reads them) but reject here") {
    val (w, h, gray) = Multimodal.gifSpec(3L)
    val bytes = Codecs.gifEncodeAnimated(w, h,
      Seq(gray, gray.map(v => (v + 64) % 256)))
    // a REAL animation per an independent reader...
    imageIoDecodeGif(bytes).width shouldBe w
    // ...that the still-image lane rejects into fallback, by routing too
    val e = intercept[IllegalArgumentException](Codecs.imageDecode(bytes))
    e.getMessage should include ("multi-image")
  }

  test("GIF: header geometry bomb rejects before any allocation") {
    val header = "GIF87a".getBytes("US-ASCII") ++ Array[Byte](
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, // 65535 x 65535
      0x00, 0x00, 0x00, 0x3B)
    val e = intercept[IllegalArgumentException](Codecs.gifDecode(header))
    e.getMessage should include ("unsupported dimensions")
  }

  test("GIF: mutation fuzz rejects cleanly or decodes, never crashes wild") {
    val rnd = new scala.util.Random(101)
    val (w, h, gray) = Multimodal.gifSpec(7L)
    val fixtures = Seq(
      Codecs.gifEncode(w, h, gray),
      Codecs.gifEncode(w, h, gray, interlaced = true),
      Codecs.gifEncode(w, h, gray, gce = true),
      Codecs.gifEncodeAnimated(w, h, Seq(gray, gray)))
    for (base <- fixtures; _ <- 1 to 200) {
      val mutated = base.clone()
      for (_ <- 0 to rnd.nextInt(4))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { Codecs.imageDecode(mutated); () }
      catch { case _: IllegalArgumentException => () } // the ONLY legal throw
    }
    // truncations at every prefix length, same contract
    val gif = Codecs.gifEncode(5, 3, Array.tabulate(15)(j => (j * 31) % 256))
    for (n <- 0 until gif.length) {
      try { Codecs.gifDecode(gif.take(n)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  // --- FLAC ----------------------------------------------------------------

  private def flacRoundtrip(rate: Int, samples: Array[Short], channels: Int,
                            blockSize: Int, mode: Int = Codecs.FlacIndependent): Unit = {
    val enc = Codecs.flacEncode(rate, samples, channels, blockSize, mode)
    val dec = Codecs.flacDecode(enc)
    dec.sampleRate shouldBe rate
    dec.channels shouldBe channels
    dec.samples.toSeq shouldBe samples.toSeq
  }

  test("FLAC round-trips losslessly across block phases and signal shapes") {
    val rnd = new scala.util.Random(41)
    // lengths straddling block boundaries (multiple, off-by-one, tiny tail)
    for (n <- Seq(1, 17, 256, 257, 511, 512, 513, 1300)) {
      // smooth ramp (FIXED wins), noise (VERBATIM may win), mixed
      val ramp = Array.tabulate(n)(i => (math.sin(i / 20.0) * 9000).toInt.toShort)
      val noise = Array.fill(n)(rnd.nextInt(65536).toShort)
      flacRoundtrip(8000, ramp, 1, 256)
      flacRoundtrip(44100, noise, 1, 256)
    }
    // constant blocks (CONSTANT subframe) incl. an all-constant stream
    flacRoundtrip(8000, Array.fill(1000)(1234.toShort), 1, 256)
    flacRoundtrip(8000, Array.fill(1000)((-32768).toShort), 1, 512)
    // empty stream: STREAMINFO only, no frames
    flacRoundtrip(8000, Array.empty[Short], 1, 256)
  }

  test("FLAC: stereo round-trips under all four channel assignments") {
    val rnd = new scala.util.Random(42)
    val n = 700
    val inter = new Array[Short](n * 2)
    var i = 0
    while (i < n) {
      val l = (math.sin(i / 9.0) * 12000).toInt
      val r = l + rnd.nextInt(9) - 4 // correlated channels: side is small
      inter(2 * i) = l.toShort
      inter(2 * i + 1) = r.toShort
      i += 1
    }
    for (mode <- Seq(Codecs.FlacIndependent, Codecs.FlacLeftSide,
      Codecs.FlacRightSide, Codecs.FlacMidSide))
      flacRoundtrip(48000, inter, 2, 256, mode)
    // extreme values through the side channel's 17-bit path
    val ext = Array[Short](32767, -32768, -32768, 32767, 0, -1, 1, 0,
      32767, 32767, -32768, -32768, 100, -100, 0, 0,
      5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20)
    for (mode <- Seq(Codecs.FlacLeftSide, Codecs.FlacRightSide, Codecs.FlacMidSide))
      flacRoundtrip(8000, ext, 2, 16, mode)
  }

  test("FLAC: fixed-predictor residuals invert for every order") {
    val rnd = new scala.util.Random(43)
    val s = Array.tabulate(200)(i => (math.sin(i / 7.0) * 20000).toInt)
    for (o <- 0 to 4) {
      val res = Codecs.flacFixedResidual(s, o)
      res.length shouldBe s.length - o
      // re-predict forward and compare
      val rec = s.take(o) ++ Array.fill(s.length - o)(0)
      var j = o
      while (j < s.length) {
        rec(j) = res(j - o) + (o match {
          case 0 => 0
          case 1 => rec(j - 1)
          case 2 => 2 * rec(j - 1) - rec(j - 2)
          case 3 => 3 * rec(j - 1) - 3 * rec(j - 2) + rec(j - 3)
          case 4 => 4 * rec(j - 1) - 6 * rec(j - 2) + 4 * rec(j - 3) - rec(j - 4)
        })
        j += 1
      }
      rec.toSeq shouldBe s.toSeq
      rnd.nextInt() // keep the generator warm across orders
    }
  }

  test("FLAC: compression actually happens on smooth signals") {
    val n = 4000
    val smooth = Array.tabulate(n)(i => (math.sin(i / 40.0) * 15000).toInt.toShort)
    val enc = Codecs.flacEncode(8000, smooth, 1, 1024)
    // raw PCM would be 8000 bytes; the FIXED+Rice path must beat it clearly
    enc.length.toLong should be < (n * 2L * 3 / 4)
    val const = Codecs.flacEncode(8000, Array.fill(n)(77.toShort), 1, 1024)
    // CONSTANT subframes: a handful of bytes per frame
    const.length.toLong should be < 200L
  }

  test("FLAC: header CRC-8, frame CRC-16, and MD5 all catch corruption") {
    val samples = Array.tabulate(600)(i => (i * 37 % 4001 - 2000).toShort)
    val enc = Codecs.flacEncode(8000, samples, 1, 256)
    Codecs.flacDecode(enc).samples.toSeq shouldBe samples.toSeq
    // find the first frame (after 4-byte magic + 4+34 byte STREAMINFO)
    val frameStart = 42
    ((enc(frameStart) & 0xff) == 0xff) shouldBe true
    // corrupt a header byte (blocksize field) → CRC-8
    val h = enc.clone(); h(frameStart + 5) = (h(frameStart + 5) ^ 0x01).toByte
    intercept[IllegalArgumentException] { Codecs.flacDecode(h) }
    // corrupt a payload byte mid-frame → CRC-16 (or a structural reject)
    val p = enc.clone(); p(frameStart + 20) = (p(frameStart + 20) ^ 0x40).toByte
    intercept[IllegalArgumentException] { Codecs.flacDecode(p) }
    // corrupt the STREAMINFO MD5 → decodes frames fine, MD5 gate trips
    val m = enc.clone(); m(30) = (m(30) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] { Codecs.flacDecode(m) }
    e.getMessage should include("MD5")
  }

  test("FLAC: geometry bomb in STREAMINFO rejects before allocation") {
    val enc = Codecs.flacEncode(8000, Array.fill(100)(5.toShort), 1, 256)
    // totalSamples lives in bits 4.. of STREAMINFO bytes 21(offset 8+13):
    // easier: set the whole 36-bit field high by patching bytes 25..29
    // (offset of streaminfo = 8; fields: 16+16+24+24+20+3+5 = 108 bits
    // = 13.5 bytes, so total-samples occupies the low nibble of byte
    // 8+13=21 through byte 25)
    val b = enc.clone()
    for (i <- 21 to 25) b(i) = 0xff.toByte
    val e = intercept[IllegalArgumentException] { Codecs.flacDecode(b) }
    e.getMessage should (include("cap") or include("unsupported stream"))
  }

  test("FLAC: truncation and garbage reject cleanly at every prefix") {
    val samples = Array.tabulate(300)(i => (i * 91 % 2000 - 1000).toShort)
    val enc = Codecs.flacEncode(8000, samples, 1, 128)
    for (n <- 0 until enc.length by 7) {
      intercept[IllegalArgumentException] { Codecs.flacDecode(enc.take(n)) }
    }
    intercept[IllegalArgumentException] { Codecs.flacDecode("OggS0000".getBytes) }
  }

  test("FLAC: LPC models a resonant signal — chosen, smaller, and lossless") {
    // an AR(2) resonance with small excitation: the order-2 LPC filter
    // captures it almost exactly, while FIXED order 2 (2s1 − s2) leaves
    // fat residuals — so the encoder must pick LPC and win on size
    val n = 4096
    val s = new Array[Short](n)
    var a = 100.0; var b = 0.0
    val rnd = new scala.util.Random(45)
    for (i <- 0 until n) {
      val next = 1.94 * a - 0.97 * b + (rnd.nextInt(9) - 4)
      b = a; a = math.max(-30000, math.min(30000, next))
      s(i) = a.toInt.toShort
    }
    val enc = Codecs.flacEncode(8000, s, 1, 1024)
    Codecs.flacDecode(enc).samples.toSeq shouldBe s.toSeq
    // first subframe header byte sits right after the 8-byte frame header
    // (4 fixed + 1 coded frame number + 2 blocksize + 1 CRC-8) at offset
    // 42 (magic + STREAMINFO); bits [6:1] are the subframe type
    val subframeType = (enc(42 + 8) >> 1) & 0x3f
    (subframeType & 0x20) should not be 0 // LPC chosen
    enc.length.toLong should be < (n * 2L / 2) // beats half of raw PCM
  }

  test("FLAC: LPC analysis is sane and the integer filter inverts exactly") {
    val s = Array.tabulate(512)(i => (math.sin(i / 5.0) * 8000).toInt)
    val Some((coefs, shift)) = Codecs.flacLpcAnalyze(s, 4, 12)
    coefs.length shouldBe 4
    shift should be >= 0
    shift should be <= 14
    coefs.foreach(c => math.abs(c) should be < (1 << 11))
    // residual→reconstruction roundtrip at the integer level
    val res = (4 until s.length).map { i =>
      var acc = 0L
      for (j <- 0 until 4) acc += coefs(j).toLong * s(i - 1 - j)
      s(i) - (acc >> shift)
    }
    val rec = s.take(4).toBuffer
    for (i <- 4 until s.length) {
      var acc = 0L
      for (j <- 0 until 4) acc += coefs(j).toLong * rec(i - 1 - j)
      rec += (res(i - 4) + (acc >> shift)).toInt
    }
    rec.toSeq shouldBe s.toSeq
  }

  test("FLAC: mutation fuzz rejects cleanly or decodes, never crashes wild") {
    val samples = Array.tabulate(500)(i => (math.sin(i / 11.0) * 3000).toInt.toShort)
    val enc = Codecs.flacEncode(8000, samples, 1, 256)
    val rnd = new scala.util.Random(44)
    (1 to 300).foreach { _ =>
      val b = enc.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { Codecs.flacDecode(b); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
