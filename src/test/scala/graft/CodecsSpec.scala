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

  test("synthetic media specs match their closed forms") {
    val img = Multimodal.imageSpec(6L)
    img.width shouldBe (5 + 6 % 12)
    img.height shouldBe (3 + 6 % 7)
    img.rgb(10) shouldBe ((6 * 31 + 10 * 7) % 256)
    val aud = Multimodal.audioSpec(7L)
    aud.samples.length shouldBe (16 + 7 % 50)
    aud.samples(3) shouldBe (((7 * 13 + 3 * 29) % 4096) - 2048).toShort
  }
}
