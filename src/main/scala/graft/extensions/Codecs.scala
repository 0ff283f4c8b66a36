package graft.extensions

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded 24-bit image: `rgb` is top-down row-major, 3 ints (0..255) per
  * pixel in R,G,B order — the layout feature extraction wants, independent
  * of the container's bottom-up BGR storage. */
case class BmpImage(width: Int, height: Int, rgb: Array[Int])

/** Decoded PCM audio: mono 16-bit samples at `sampleRate` Hz. */
case class WavAudio(sampleRate: Int, samples: Array[Short])

/** Pure-JVM media codecs for the multimodal pipeline — no native libraries.
  *
  * Two real container formats whose uncompressed variants are fully
  * specified by public file-format docs and need nothing beyond byte
  * arithmetic:
  *
  *  - BMP, 24-bit uncompressed (BITMAPINFOHEADER): 14-byte file header,
  *    40-byte info header, pixel rows stored BOTTOM-UP in B,G,R byte order
  *    with each row zero-padded to a 4-byte boundary. The decoder is a real
  *    header parser — it reads the pixel-data offset, dimensions, bpp and
  *    compression fields and rejects anything it cannot decode — so a
  *    padding or row-order mistake anywhere produces wrong pixel values,
  *    not silently-shifted fakes.
  *  - WAV, PCM mono 16-bit: RIFF container walked chunk-by-chunk (chunks
  *    pad to even length per the RIFF spec), `fmt ` validated
  *    (PCM/mono/16-bit), samples read little-endian from `data`.
  *
  * Both encoders exist so resize can round-trip decode → transform →
  * re-encode → decode, exercising each direction. Everything is per-record
  * CPU work inside a batched `mapPartitions` — stateless map-side compute
  * that scales with partitions, never a shuffle.
  */
object Codecs {

  private val BmpHeaderSize = 54 // 14-byte file header + 40-byte info header

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Encode a top-down row-major RGB pixel array (3 ints per pixel, 0..255)
    * as a 24-bit uncompressed BMP. */
  def bmpEncode(img: BmpImage): Array[Byte] = {
    val w = img.width
    val h = img.height
    require(img.rgb.length == w * h * 3, s"rgb length ${img.rgb.length} != $w*$h*3")
    val rowSize = (w * 3 + 3) / 4 * 4
    val imageSize = rowSize * h
    val buf = le(BmpHeaderSize + imageSize)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(BmpHeaderSize + imageSize) // file size
    buf.putShort(0).putShort(0)           // reserved
    buf.putInt(BmpHeaderSize)             // pixel data offset
    buf.putInt(40)                        // info header size
    buf.putInt(w).putInt(h)               // positive height = bottom-up rows
    buf.putShort(1)                       // planes
    buf.putShort(24)                      // bits per pixel
    buf.putInt(0)                         // BI_RGB, uncompressed
    buf.putInt(imageSize)
    buf.putInt(2835).putInt(2835)         // 72 dpi in pixels/metre
    buf.putInt(0).putInt(0)               // palette size / important colors
    var row = h - 1
    while (row >= 0) { // file stores the bottom row first
      var x = 0
      while (x < w) {
        val p = (row * w + x) * 3
        buf.put(img.rgb(p + 2).toByte) // B
        buf.put(img.rgb(p + 1).toByte) // G
        buf.put(img.rgb(p).toByte)     // R
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BMP back to top-down RGB. Throws
    * IllegalArgumentException on anything that is not one. */
  def bmpDecode(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= BmpHeaderSize &&
      bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "not a BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = buf.getInt(10)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24, s"unsupported bpp $bpp")
    require(compression == 0, s"unsupported compression $compression")
    require(w > 0 && h > 0, s"unsupported dimensions ${w}x$h")
    val rowSize = (w * 3 + 3) / 4 * 4
    require(bytes.length >= offset + rowSize * h, "truncated pixel data")
    val rgb = new Array[Int](w * h * 3)
    var row = 0
    while (row < h) {
      val src = offset + (h - 1 - row) * rowSize // undo bottom-up storage
      var x = 0
      while (x < w) {
        val p = (row * w + x) * 3
        rgb(p) = bytes(src + x * 3 + 2) & 0xff     // R
        rgb(p + 1) = bytes(src + x * 3 + 1) & 0xff // G
        rgb(p + 2) = bytes(src + x * 3) & 0xff     // B
        x += 1
      }
      row += 1
    }
    BmpImage(w, h, rgb)
  }

  /** Encode mono 16-bit PCM as a canonical 44-byte-header WAV. */
  def wavEncode(audio: WavAudio): Array[Byte] = {
    val n = audio.samples.length
    val dataSize = 2 * n
    val buf = le(44 + dataSize)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                         // PCM fmt chunk size
    buf.putShort(1)                        // audio format: PCM
    buf.putShort(1)                        // channels: mono
    buf.putInt(audio.sampleRate)
    buf.putInt(audio.sampleRate * 2)       // byte rate
    buf.putShort(2)                        // block align
    buf.putShort(16)                       // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < n) { buf.putShort(audio.samples(i)); i += 1 }
    buf.array()
  }

  /** Walk the RIFF chunk list (not a fixed-offset read: real WAVs carry
    * LIST/fact chunks before `data`) and return the PCM samples. Throws
    * IllegalArgumentException on non-PCM / non-mono / non-16-bit input. */
  def wavDecode(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(buf.getShort(pos + 8) == 1, "not PCM")
          require(buf.getShort(pos + 10) == 1, "not mono")
          require(buf.getShort(pos + 22) == 16, "not 16-bit")
          rate = buf.getInt(pos + 12)
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(pos + 8 + 2 * i); i += 1 }
          samples = out
        case _ => // skip LIST/fact/etc.
      }
      pos += 8 + size + (size & 1) // RIFF chunks pad to even length
    }
    require(rate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    WavAudio(rate, samples)
  }
}
