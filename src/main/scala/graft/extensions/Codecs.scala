package graft.extensions

import java.nio.{ByteBuffer, ByteOrder}

/** Decoded RGB image: `rgb` is top-down row-major, 3 ints (0..255) per
  * pixel in R,G,B order — the layout feature extraction wants, independent
  * of any container's storage order (BMP stores bottom-up BGR, PNG
  * filtered top-down RGB, RLE8 palette indices). */
case class BmpImage(width: Int, height: Int, rgb: Array[Int])

/** Decoded PCM audio at `sampleRate` Hz: 16-bit-scale samples, channel-
  * interleaved when `channels` > 1 (8-bit containers decode to the 16-bit
  * scale, ×256). */
case class WavAudio(sampleRate: Int, samples: Array[Short], channels: Int = 1)

/** Pure-JVM media codecs for the multimodal pipeline — no native libraries.
  *
  * Real container formats fully specified by public file-format docs,
  * implemented with nothing beyond byte arithmetic and `java.util.zip`:
  *
  *  - BMP, 24-bit uncompressed (BITMAPINFOHEADER): 14-byte file header,
  *    40-byte info header, pixel rows stored BOTTOM-UP in B,G,R byte order
  *    with each row zero-padded to a 4-byte boundary. The decoder is a real
  *    header parser — it reads the pixel-data offset, dimensions, bpp and
  *    compression fields and rejects anything it cannot decode — so a
  *    padding or row-order mistake anywhere produces wrong pixel values,
  *    not silently-shifted fakes.
  *  - BMP, 8-bit RLE8-compressed: BGRA palette + run-length stream
  *    (encoded runs, absolute mode, end-of-line/bitmap, delta escapes).
  *  - PNG, 8-bit RGB: CRC-verified chunk walk, real `Inflater` zlib
  *    decompression, all five scanline filter types reconstructed.
  *  - WAV, PCM: RIFF container walked chunk-by-chunk (chunks pad to even
  *    length per the RIFF spec), `fmt ` validated; mono/stereo, 16-bit and
  *    unsigned 8-bit variants decode, everything else rejects.
  *
  * Real-but-UNSUPPORTED variants ([[bmpEncode32]], [[wavEncode24]]) exist
  * as encoders only: they produce well-formed files the decoders reject,
  * so the pipeline's reject→fallback routing is exercised by authentic
  * payloads rather than garbage bytes.
  *
  * Every encoder has a matching decoder so resize can round-trip decode →
  * transform → re-encode → decode, exercising each direction. Everything
  * is per-record CPU work inside a batched `mapPartitions` — stateless
  * map-side compute that scales with partitions, never a shuffle.
  */
object Codecs {

  private val BmpHeaderSize = 54 // 14-byte file header + 40-byte info header

  /** Dimension sanity cap for decoders: header-declared width/height beyond
    * this are rejected before any size arithmetic. With both ≤ 2^16 every
    * row-size product fits comfortably in Long, and the byte-length check
    * then bounds the pixel allocation by the (≤ 2 GiB) payload itself. */
  private val MaxDim = 1 << 16

  /** Pixel-COUNT cap for the compressed containers (PNG, RLE8): their
    * payload size does not bound the decoded size the way uncompressed
    * BMP's does (a 100-byte file can declare a huge geometry), so the
    * product is capped explicitly before any allocation — w·h beyond this
    * rejects with the documented IllegalArgumentException instead of
    * wrapping Int into a negative allocation. */
  private val MaxPixels = 1 << 24

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
    // Header fields are attacker-controlled bytes: cap dimensions BEFORE
    // any size arithmetic and do the truncation bound in Long — a crafted
    // offset/dimension pair overflows Int, passes a 32-bit check, and then
    // dies in array indexing instead of the documented reject.
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim,
      s"unsupported dimensions ${w}x$h")
    val rowSize = (w * 3 + 3) / 4 * 4
    require(offset >= BmpHeaderSize &&
      offset.toLong + rowSize.toLong * h <= bytes.length, "truncated pixel data")
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

  // --- PNG (8-bit RGB, all five filter types) ------------------------------

  private val PngSignature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc32(chunkType: String, data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32
    c.update(chunkType.getBytes("US-ASCII"))
    c.update(data)
    c.getValue.toInt
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, chunkType: String,
                       data: Array[Byte]): Unit = {
    val b = ByteBuffer.allocate(data.length + 12) // PNG ints are BIG-endian
    b.putInt(data.length)
    b.put(chunkType.getBytes("US-ASCII"))
    b.put(data)
    b.putInt(crc32(chunkType, data))
    out.write(b.array())
  }

  /** PNG Paeth predictor (spec §9, Filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode top-down RGB as an 8-bit truecolor PNG. Two deliberate choices
    * make the payload both REAL and oracle-predictable:
    *
    *  - scanline `r` uses filter type `r % 5`, so every one of the five PNG
    *    filters (None/Sub/Up/Average/Paeth) appears in real IDAT bytes and
    *    a decoder that fumbles any reconstruction rule corrupts pixels;
    *  - the zlib stream is written BY HAND as a single STORED block
    *    (level-0 deflate — legal zlib any inflater must accept), so the
    *    compressed size is a closed form of the geometry alone:
    *    `filesize = h·(1+3w) + 68` (8 signature + 25 IHDR + 12 IDAT
    *    framing + 2 zlib header + 5 stored-block header + raw + 4 adler
    *    + 12 IEND), which the DuckDB oracle recomputes without a codec. */
  def pngEncode(img: BmpImage): Array[Byte] = {
    val w = img.width; val h = img.height
    require(img.rgb.length == w * h * 3, s"rgb length ${img.rgb.length} != $w*$h*3")
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride)) // filter byte + filtered row
    var y = 0
    while (y < h) {
      val t = y % 5
      raw(y * (1 + stride)) = t.toByte
      var i = 0
      while (i < stride) {
        val cur = img.rgb(y * stride + i)
        val left = if (i >= 3) img.rgb(y * stride + i - 3) else 0
        val up = if (y > 0) img.rgb((y - 1) * stride + i) else 0
        val upLeft = if (y > 0 && i >= 3) img.rgb((y - 1) * stride + i - 3) else 0
        val pred = t match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    require(raw.length <= 0xffff,
      s"stored-block encoder caps at 65535 raw bytes, got ${raw.length}")
    // hand-rolled zlib: 0x78 0x01 header, one final stored block, adler32
    val z = ByteBuffer.allocate(raw.length + 11)
    z.put(0x78.toByte).put(0x01.toByte)
    z.put(1.toByte) // BFINAL=1, BTYPE=00 (stored)
    z.put((raw.length & 0xff).toByte).put(((raw.length >> 8) & 0xff).toByte)
    z.put((~raw.length & 0xff).toByte).put(((~raw.length >> 8) & 0xff).toByte)
    z.put(raw)
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    z.putInt(adler.getValue.toInt)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor RGB
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    val out = new java.io.ByteArrayOutputStream(raw.length + 68)
    out.write(PngSignature)
    pngChunk(out, "IHDR", ihdr.array())
    pngChunk(out, "IDAT", z.array())
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor PNG: verify the signature and every chunk
    * CRC, walk the chunk list, INFLATE the concatenated IDAT stream (real
    * `java.util.zip.Inflater` — any conformant zlib, not just our stored
    * blocks), and reconstruct all five filter types. Throws
    * IllegalArgumentException on other bit depths / color types /
    * interlacing, corrupt CRCs, or geometry mismatches. */
  def pngDecode(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= PngSignature.length + 12 &&
      PngSignature.indices.forall(i => bytes(i) == PngSignature(i)), "not a PNG")
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    var pos = PngSignature.length
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 8 <= bytes.length, "truncated chunk header")
      val len = buf.getInt(pos)
      require(len >= 0 && pos + 12 + len.toLong <= bytes.length, "truncated chunk")
      val chunkType = new String(bytes, pos + 4, 4, "US-ASCII")
      val data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
      require(buf.getInt(pos + 8 + len) == crc32(chunkType, data),
        s"bad CRC in $chunkType")
      chunkType match {
        case "IHDR" =>
          // length check BEFORE any data() index: a crafted short IHDR
          // with a valid CRC must reject, not die on array bounds
          require(len == 13, s"bad IHDR length $len")
          w = buf.getInt(pos + 8); h = buf.getInt(pos + 12)
          require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim &&
            w.toLong * h <= MaxPixels, s"unsupported dimensions ${w}x$h")
          require(data(8) == 8, s"unsupported bit depth ${data(8)}")
          require(data(9) == 2, s"unsupported color type ${data(9)}")
          require(data(10) == 0 && data(11) == 0, "unsupported compression/filter method")
          require(data(12) == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => // ancillary chunk (tEXt, pHYs, ...): CRC-checked, skipped
      }
      pos += 12 + len
    }
    require(w > 0, "missing IHDR")
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val (got, ended) = try {
      // inflate() may return partial output per call (JDK contract) —
      // drain until the stream finishes or stops making progress
      var n = 0
      var progressing = true
      while (progressing && !inf.finished() && n < raw.length) {
        val k = inf.inflate(raw, n, raw.length - n)
        if (k == 0 && (inf.finished() || inf.needsInput())) progressing = false
        n += k
      }
      (n, inf.finished())
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt IDAT: ${e.getMessage}")
    } finally inf.end()
    require(got == raw.length, s"IDAT inflated to $got bytes, want ${raw.length}")
    // the stream must END at the declared geometry — surplus rows in the
    // zlib stream are a geometry mismatch, not data to silently drop
    require(ended, "IDAT stream continues past the declared geometry")
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      val t = raw(y * (1 + stride)) & 0xff
      require(t <= 4, s"unknown filter type $t")
      var i = 0
      while (i < stride) {
        val x = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= 3) rgb(y * stride + i - 3) else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) else 0
        val upLeft = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) else 0
        val pred = t match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        rgb(y * stride + i) = (x + pred) & 0xff
        i += 1
      }
      y += 1
    }
    BmpImage(w, h, rgb)
  }

  // --- BMP variants: RLE8 (decoded) and 32bpp (reject fixture) -------------

  /** Encode a grayscale image (one 0..255 value per pixel) as an 8-bit
    * RLE8-compressed BMP with the identity grayscale palette. Rows are
    * stored bottom-up as encoded-mode runs (maximal, capped at 255), each
    * row closed by a 2-byte marker (end-of-line; the last row's marker IS
    * end-of-bitmap) — so for pixel data with no adjacent repeats the
    * compressed size is the closed form `54 + 1024 + 2·w·h + 2·h`. */
  def bmpEncodeRle8(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == width * height, "gray length mismatch")
    val rle = new java.io.ByteArrayOutputStream()
    var row = height - 1
    while (row >= 0) { // bottom-up, like uncompressed BMP
      var x = 0
      while (x < width) {
        val v = gray(row * width + x)
        var run = 1
        while (x + run < width && run < 255 && gray(row * width + x + run) == v) run += 1
        rle.write(run); rle.write(v)
        x += run
      }
      rle.write(0); rle.write(if (row == 0) 1 else 0) // EOL, EOB after last row
      row -= 1
    }
    val data = rle.toByteArray
    val buf = le(54 + 1024 + data.length)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + 1024 + data.length)
    buf.putShort(0).putShort(0)
    buf.putInt(54 + 1024)        // pixel data offset (after palette)
    buf.putInt(40)
    buf.putInt(width).putInt(height)
    buf.putShort(1)
    buf.putShort(8)              // bits per pixel
    buf.putInt(1)                // BI_RLE8
    buf.putInt(data.length)
    buf.putInt(2835).putInt(2835)
    buf.putInt(256).putInt(0)    // palette entries used
    var i = 0
    while (i < 256) { // BGRA palette: identity grayscale
      buf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
    }
    buf.put(data)
    buf.array()
  }

  /** Decode an RLE8 BMP: parse the palette, walk the RLE stream (encoded
    * runs, end-of-line, end-of-bitmap, delta moves, absolute mode with its
    * even-byte padding) bottom-up, and map indices through the palette to
    * top-down RGB. Pixels skipped by delta moves stay palette entry 0. */
  def bmpDecodeRle8(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= BmpHeaderSize &&
      bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte, "not a BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = buf.getInt(10)
    val headerSize = buf.getInt(14)
    // header-controlled: a negative/huge biSize would swing palOff below
    // zero past the Long checks further down — reject before arithmetic
    // (40 = BITMAPINFOHEADER; 124 = BITMAPV5HEADER; 1024 headroom)
    require(headerSize >= 40 && headerSize <= 1024, s"bad header size $headerSize")
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    val clrUsed = buf.getInt(46)
    require(bpp == 8 && compression == 1, s"not RLE8 (bpp=$bpp compression=$compression)")
    require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim &&
      w.toLong * h <= MaxPixels, s"unsupported dimensions ${w}x$h")
    val nColors = if (clrUsed == 0) 256 else clrUsed
    require(nColors > 0 && nColors <= 256, s"bad palette size $nColors")
    val palOff = 14 + headerSize
    require(palOff.toLong + 4L * nColors <= bytes.length, "truncated palette")
    require(offset >= palOff + 4 * nColors && offset <= bytes.length, "bad pixel offset")
    val idx = new Array[Int](w * h) // bottom-up index grid, default palette 0
    var pos = offset
    var x = 0; var row = 0 // row 0 = BOTTOM row in RLE order
    var eob = false
    while (!eob) {
      require(pos + 2 <= bytes.length, "truncated RLE stream")
      val n = bytes(pos) & 0xff; val v = bytes(pos + 1) & 0xff
      pos += 2
      if (n > 0) { // encoded run
        var k = 0
        while (k < n) {
          require(row < h && x < w, "RLE run past row end")
          idx(row * w + x) = v; x += 1; k += 1
        }
      } else v match {
        case 0 => x = 0; row += 1 // end of line
        case 1 => eob = true      // end of bitmap
        case 2 =>                 // delta: skip right/up, pixels stay 0
          require(pos + 2 <= bytes.length, "truncated delta")
          x += bytes(pos) & 0xff; row += bytes(pos + 1) & 0xff; pos += 2
          // unbounded deltas could wrap row*w+x past Int range, turning
          // the write guards into ArrayIndexOutOfBounds — reject here
          require(x <= w && row <= h, "RLE delta past raster")
        case cnt =>               // absolute mode: cnt literal indices, even-padded
          require(pos + cnt + (cnt & 1) <= bytes.length, "truncated absolute run")
          var k = 0
          while (k < cnt) {
            require(row < h && x < w, "absolute run past row end")
            idx(row * w + x) = bytes(pos + k) & 0xff; x += 1; k += 1
          }
          pos += cnt + (cnt & 1)
      }
    }
    val rgb = new Array[Int](w * h * 3)
    var ty = 0
    while (ty < h) {
      var tx = 0
      while (tx < w) {
        val pi = idx((h - 1 - ty) * w + tx) // undo bottom-up
        require(pi < nColors, s"palette index $pi out of range")
        val p = palOff + 4 * pi // BGRA entry
        val o = (ty * w + tx) * 3
        rgb(o) = bytes(p + 2) & 0xff
        rgb(o + 1) = bytes(p + 1) & 0xff
        rgb(o + 2) = bytes(p) & 0xff
        tx += 1
      }
      ty += 1
    }
    BmpImage(w, h, rgb)
  }

  /** Encode as an uncompressed 32bpp BGRA BMP — a REAL variant the image
    * decoders deliberately reject (like [[wavEncode24]] on the audio side):
    * it exists so the reject→fallback path runs on a well-formed file. */
  def bmpEncode32(img: BmpImage): Array[Byte] = {
    val w = img.width; val h = img.height
    require(img.rgb.length == w * h * 3, "rgb length mismatch")
    val buf = le(BmpHeaderSize + 4 * w * h) // 32bpp rows are already 4-aligned
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(BmpHeaderSize + 4 * w * h)
    buf.putShort(0).putShort(0)
    buf.putInt(BmpHeaderSize)
    buf.putInt(40)
    buf.putInt(w).putInt(h)
    buf.putShort(1)
    buf.putShort(32)
    buf.putInt(0) // BI_RGB
    buf.putInt(4 * w * h)
    buf.putInt(2835).putInt(2835)
    buf.putInt(0).putInt(0)
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val p = (row * w + x) * 3
        buf.put(img.rgb(p + 2).toByte).put(img.rgb(p + 1).toByte)
          .put(img.rgb(p).toByte).put(0xff.toByte)
        x += 1
      }
      row -= 1
    }
    buf.array()
  }

  /** Container-agnostic image decode: sniff the magic bytes and dispatch to
    * the matching decoder. Supported: 24-bit uncompressed BMP, RLE8 BMP,
    * 8-bit RGB PNG. Real-but-unsupported variants (32bpp BMP, interlaced
    * PNG, ...) throw the decoder's IllegalArgumentException — callers that
    * must keep rows flowing catch it and fall back. */
  def imageDecode(bytes: Array[Byte]): BmpImage =
    if (bytes.length >= PngSignature.length &&
        PngSignature.indices.forall(i => bytes(i) == PngSignature(i)))
      pngDecode(bytes)
    else if (bytes.length >= BmpHeaderSize &&
        bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (buf.getShort(28) == 8 && buf.getInt(30) == 1) bmpDecodeRle8(bytes)
      else bmpDecode(bytes)
    } else throw new IllegalArgumentException("unsupported image container")

  /** Shared 44-byte-header writer for the PCM encoders. `bytesPerValue` is
    * per SAMPLE VALUE (1 for 8-bit, 2 for 16-bit, 3 for 24-bit); `put`
    * writes one value. Odd data sizes get the RIFF even-pad byte, counted
    * in the parent RIFF size but not the data chunk's. */
  private def wavWrite(audio: WavAudio, bytesPerValue: Int, bits: Int)
                      (put: (ByteBuffer, Short) => Unit): Array[Byte] = {
    val n = audio.samples.length
    require(audio.channels == 1 || audio.channels == 2,
      s"unsupported channels ${audio.channels}")
    require(n % audio.channels == 0, "ragged channel interleave")
    val dataSize = bytesPerValue * n
    val pad = dataSize & 1
    val buf = le(44 + dataSize + pad)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize + pad)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                          // PCM fmt chunk size
    buf.putShort(1)                         // audio format: PCM
    buf.putShort(audio.channels.toShort)
    buf.putInt(audio.sampleRate)
    buf.putInt(audio.sampleRate * audio.channels * bytesPerValue) // byte rate
    buf.putShort((audio.channels * bytesPerValue).toShort)        // block align
    buf.putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < n) { put(buf, audio.samples(i)); i += 1 }
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  /** Encode 16-bit PCM (mono or interleaved stereo) as a canonical
    * 44-byte-header WAV. */
  def wavEncode(audio: WavAudio): Array[Byte] =
    wavWrite(audio, 2, 16)((b, s) => b.putShort(s))

  /** Encode as UNSIGNED 8-bit PCM. Samples must sit on the 8-bit lattice
    * (multiples of 256 on the 16-bit scale) so the container round-trips
    * exactly: stored byte = s/256 + 128. */
  def wavEncode8(audio: WavAudio): Array[Byte] =
    wavWrite(audio, 1, 8) { (b, s) =>
      require(s % 256 == 0, s"sample $s not representable in 8-bit")
      b.put((s / 256 + 128).toByte)
    }

  /** Encode as 24-bit PCM (sample << 8, little-endian 3 bytes) — a REAL
    * variant [[wavDecode]] deliberately does not support; it exists so the
    * pipeline's reject→fallback path is exercised by a well-formed file,
    * not just garbage bytes. */
  def wavEncode24(audio: WavAudio): Array[Byte] =
    wavWrite(audio, 3, 24) { (b, s) =>
      val v = s.toInt << 8
      b.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
        .put(((v >> 16) & 0xff).toByte)
    }

  /** Walk the RIFF chunk list (not a fixed-offset read: real WAVs carry
    * LIST/fact chunks before `data`) and return the PCM samples on the
    * 16-bit scale: mono or stereo (interleaved), 16-bit or unsigned 8-bit
    * (×256). Throws IllegalArgumentException on anything else (ADPCM,
    * float, 24-bit, >2 channels). */
  def wavDecode(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var dataPos = -1
    var dataSize = -1
    while (pos + 8 <= bytes.length && (rate < 0 || dataPos < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      // Long bound: a size near Int.MaxValue wraps an Int sum negative,
      // slips past the check, and turns into a ~2 GiB allocation instead
      // of the documented reject (the bmpDecode overflow fix, here too)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(buf.getShort(pos + 8) == 1, "not PCM")
          channels = buf.getShort(pos + 10)
          require(channels == 1 || channels == 2, s"unsupported channels $channels")
          bits = buf.getShort(pos + 22)
          require(bits == 8 || bits == 16, s"unsupported bits $bits")
          rate = buf.getInt(pos + 12)
        case "data" =>
          dataPos = pos + 8
          dataSize = size
        case _ => // skip LIST/fact/etc.
      }
      pos += 8 + size + (size & 1) // RIFF chunks pad to even length
    }
    require(rate > 0, "missing fmt chunk")
    require(dataPos >= 0, "missing data chunk")
    // fmt is required BEFORE data by the spec, and we only read data here,
    // so bits/channels are known by now. Decode symmetry with the
    // encoder's ragged-interleave reject: the data chunk must hold whole
    // frames (the RIFF pad byte lives OUTSIDE the declared size).
    require(dataSize % (channels * (bits / 8)) == 0,
      s"ragged data chunk ($dataSize bytes, $channels ch × $bits bit)")
    val out =
      if (bits == 16) {
        val n = dataSize / 2
        val a = new Array[Short](n)
        var i = 0
        while (i < n) { a(i) = buf.getShort(dataPos + 2 * i); i += 1 }
        a
      } else {
        val a = new Array[Short](dataSize)
        var i = 0
        while (i < dataSize) {
          a(i) = (((bytes(dataPos + i) & 0xff) - 128) * 256).toShort; i += 1
        }
        a
      }
    WavAudio(rate, out, channels)
  }
}
