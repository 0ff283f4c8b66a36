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

/** Decoded motion-JPEG video: header geometry + frame period (µs) plus
  * every frame fully decoded to top-down RGB. All frames share the
  * container-declared `width`×`height` (the decoder enforces it). */
case class AviVideo(width: Int, height: Int, usPerFrame: Int,
                    frames: Vector[BmpImage])

/** Fully-demuxed AVI: the video stream plus the interleaved audio track
  * (expanded to PCM) when the container carries one. */
case class AviMedia(video: AviVideo, audio: Option[WavAudio])

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
  *    decompression, all five scanline filter types reconstructed,
  *    progressive AND Adam7-interlaced rasters in both directions.
  *  - WAV, PCM + G.711 µ-law: RIFF container walked chunk-by-chunk (chunks
  *    pad to even length per the RIFF spec), `fmt ` validated; mono/stereo
  *    16-bit and unsigned 8-bit PCM plus format-tag-7 µ-law (closed-form
  *    CCITT expansion) decode, everything else rejects.
  *  - GIF, 87a/89a single-frame: logical-screen + color-table parse,
  *    extension-block walk, REAL LZW decompression (variable 3..12-bit
  *    codes, KwKwK, deferred clear), four-pass de-interlace; animated
  *    (multi-image) files are well-formed rejects, like the 32bpp BMPs.
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
    *    + 12 IEND), which the DuckDB oracle recomputes without a codec.
    *
    * `interlaced` stores the seven Adam7 sub-images instead (each
    * independently filtered with the same `r % 5` cycle). */
  def pngEncode(img: BmpImage, interlaced: Boolean = false): Array[Byte] = {
    val w = img.width; val h = img.height
    require(img.rgb.length == w * h * 3, s"rgb length ${img.rgb.length} != $w*$h*3")
    val passes = pngPasses(w, h, interlaced)
    val raw = new Array[Byte](passes.map { case (_, _, _, _, pw, ph) =>
      ph * (1 + 3 * pw)
    }.sum)
    var off = 0
    for ((xs, ys, dx, dy, pw, ph) <- passes) {
      val pstride = 3 * pw
      // gather the pass sub-image; filters predict from PASS neighbors
      val prgb = new Array[Int](pw * ph * 3)
      var j = 0
      while (j < ph) {
        var k = 0
        while (k < pw) {
          val src = ((ys + j * dy) * w + (xs + k * dx)) * 3
          val dst = (j * pw + k) * 3
          prgb(dst) = img.rgb(src); prgb(dst + 1) = img.rgb(src + 1)
          prgb(dst + 2) = img.rgb(src + 2)
          k += 1
        }
        j += 1
      }
      var y = 0
      while (y < ph) {
        val t = y % 5 // cycle the filter types so all five get exercised
        raw(off + y * (1 + pstride)) = t.toByte
        var i = 0
        while (i < pstride) {
          val cur = prgb(y * pstride + i)
          val left = if (i >= 3) prgb(y * pstride + i - 3) else 0
          val up = if (y > 0) prgb((y - 1) * pstride + i) else 0
          val upLeft = if (y > 0 && i >= 3) prgb((y - 1) * pstride + i - 3) else 0
          val pred = t match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, upLeft)
          }
          raw(off + y * (1 + pstride) + 1 + i) = ((cur - pred) & 0xff).toByte
          i += 1
        }
        y += 1
      }
      off += ph * (1 + pstride)
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
    ihdr.put(0.toByte).put(0.toByte) // deflate, adaptive filtering
    ihdr.put(if (interlaced) 1.toByte else 0.toByte)
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
    * blocks), and reconstruct all five filter types — per Adam7 pass when
    * the header declares interlacing. Throws IllegalArgumentException on
    * other bit depths / color types, corrupt CRCs, or geometry
    * mismatches. */
  def pngDecode(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= PngSignature.length + 12 &&
      PngSignature.indices.forall(i => bytes(i) == PngSignature(i)), "not a PNG")
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    var pos = PngSignature.length
    var w = -1; var h = -1
    var interlaced = false
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
          require(data(12) == 0 || data(12) == 1,
            s"unknown interlace method ${data(12)}")
          interlaced = data(12) == 1
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => // ancillary chunk (tEXt, pHYs, ...): CRC-checked, skipped
      }
      pos += 12 + len
    }
    require(w > 0, "missing IHDR")
    // one pass over the full raster, or the seven Adam7 sub-images (each
    // independently filtered); empty passes carry no bytes at all
    val passes = pngPasses(w, h, interlaced)
    val raw = new Array[Byte](passes.map { case (_, _, _, _, pw, ph) =>
      ph * (1 + 3 * pw)
    }.sum)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val (got, ended) = try {
      // inflate() may return partial output per call (JDK contract) —
      // drain until the stream finishes or stops making progress. ANY
      // zero-byte call exits (finished, needs more input, or needs a
      // preset dictionary — FDICT streams must reject via the length
      // check below, never spin here)
      var n = 0
      var k = -1
      while (k != 0 && !inf.finished() && n < raw.length) {
        k = inf.inflate(raw, n, raw.length - n)
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
    var off = 0
    for ((xs, ys, dx, dy, pw, ph) <- passes) {
      val pstride = 3 * pw
      val prgb = new Array[Int](pw * ph * 3) // filters see PASS neighbors
      var y = 0
      while (y < ph) {
        val t = raw(off + y * (1 + pstride)) & 0xff
        require(t <= 4, s"unknown filter type $t")
        var i = 0
        while (i < pstride) {
          val x = raw(off + y * (1 + pstride) + 1 + i) & 0xff
          val left = if (i >= 3) prgb(y * pstride + i - 3) else 0
          val up = if (y > 0) prgb((y - 1) * pstride + i) else 0
          val upLeft = if (y > 0 && i >= 3) prgb((y - 1) * pstride + i - 3) else 0
          val pred = t match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, upLeft)
          }
          prgb(y * pstride + i) = (x + pred) & 0xff
          i += 1
        }
        y += 1
      }
      off += ph * (1 + pstride)
      var j = 0 // scatter the pass into the raster at its lattice sites
      while (j < ph) {
        var k = 0
        while (k < pw) {
          val src = (j * pw + k) * 3
          val dst = ((ys + j * dy) * w + (xs + k * dx)) * 3
          rgb(dst) = prgb(src); rgb(dst + 1) = prgb(src + 1)
          rgb(dst + 2) = prgb(src + 2)
          k += 1
        }
        j += 1
      }
    }
    BmpImage(w, h, rgb)
  }

  /** Adam7 pass lattice: (xStart, yStart, xStep, yStep) per pass. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** The filtered sub-images a PNG stream carries, as
    * (xStart, yStart, xStep, yStep, passWidth, passHeight): one full-
    * raster pass when progressive, the NON-EMPTY Adam7 passes when
    * interlaced (a pass whose lattice misses the image entirely
    * contributes no bytes, per the spec). */
  private def pngPasses(w: Int, h: Int,
                        interlaced: Boolean): Seq[(Int, Int, Int, Int, Int, Int)] =
    if (!interlaced) Seq((0, 0, 1, 1, w, h))
    else Adam7.toSeq.map { case (xs, ys, dx, dy) =>
      (xs, ys, dx, dy, (w - xs + dx - 1) / dx, (h - ys + dy - 1) / dy)
    }.filter { case (_, _, _, _, pw, ph) => pw > 0 && ph > 0 }

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
    * 8-bit RGB PNG (progressive or Adam7), baseline JFIF JPEG,
    * single-frame GIF. Real-but-unsupported variants (32bpp BMP, animated
    * GIF, paletted PNG, ...) throw the decoder's IllegalArgumentException
    * — callers that must keep rows flowing catch it and fall back. */
  def imageDecode(bytes: Array[Byte]): BmpImage =
    if (bytes.length >= PngSignature.length &&
        PngSignature.indices.forall(i => bytes(i) == PngSignature(i)))
      pngDecode(bytes)
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xFF &&
        (bytes(1) & 0xff) == 0xD8 && (bytes(2) & 0xff) == 0xFF)
      jpegDecode(bytes)
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      gifDecode(bytes)
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
    var fmtTag = -1
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
          fmtTag = buf.getShort(pos + 8)
          require(fmtTag == 1 || fmtTag == 7,
            s"unsupported format tag $fmtTag") // PCM or G.711 µ-law
          channels = buf.getShort(pos + 10)
          require(channels == 1 || channels == 2, s"unsupported channels $channels")
          bits = buf.getShort(pos + 22)
          require(if (fmtTag == 7) bits == 8 else bits == 8 || bits == 16,
            s"unsupported bits $bits (format $fmtTag)")
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
      if (fmtTag == 7) { // G.711 µ-law: one code byte per value, expand
        val a = new Array[Short](dataSize)
        var i = 0
        while (i < dataSize) { a(i) = mulawExpand(bytes(dataPos + i)); i += 1 }
        a
      } else if (bits == 16) {
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

  /** G.711 µ-law expansion of one stored (complemented) code byte to the
    * 16-bit sample scale (±32124) — the CCITT closed form, no table. */
  private[graft] def mulawExpand(b: Byte): Short = {
    val u = ~b & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** G.711 µ-law compression of a 16-bit sample to one code byte —
    * segment search on the biased magnitude, complemented on the wire. */
  private[graft] def mulawCompress(s: Short): Byte = {
    val sign = if (s < 0) 0x80 else 0
    val mag = math.min(if (s < 0) -s.toInt else s.toInt, 32635) + 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (mag & mask) == 0) { exp -= 1; mask >>= 1 }
    val man = (mag >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | man)).toByte
  }

  /** Encode PCM audio as a G.711 µ-law WAV (format tag 7). */
  def wavEncodeMulaw(audio: WavAudio): Array[Byte] =
    wavEncodeMulawCodes(audio.sampleRate, audio.samples.map(mulawCompress),
      audio.channels)

  /** µ-law WAV from raw code bytes (already-compressed telephony data):
    * 18-byte fmt chunk (format tag 7, cbSize 0) + the fact chunk non-PCM
    * formats carry, one code byte per sample value, RIFF even-padding —
    * the layout telephony tooling writes. */
  def wavEncodeMulawCodes(sampleRate: Int, codes: Array[Byte],
                          channels: Int = 1): Array[Byte] = {
    require(channels == 1 || channels == 2, s"unsupported channels $channels")
    require(codes.length % channels == 0, "ragged channel interleave")
    val n = codes.length
    val pad = n & 1
    val buf = le(12 + 26 + 12 + 8 + n + pad)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(4 + 26 + 12 + 8 + n + pad)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(18)
    buf.putShort(7)                   // WAVE_FORMAT_MULAW
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels) // byte rate: one byte per value
    buf.putShort(channels.toShort)    // block align
    buf.putShort(8)                   // bits per code
    buf.putShort(0)                   // cbSize
    buf.put("fact".getBytes("US-ASCII"))
    buf.putInt(4)
    buf.putInt(n / channels)          // sample frames
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(n)
    buf.put(codes)
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  // --- JPEG: baseline JFIF (SOF0), pure JVM --------------------------------
  //
  // The full baseline pipeline from the public JPEG spec (ITU T.81) and
  // JFIF container note: canonical Huffman entropy coding with the Annex K
  // table specs, zigzag coefficient order, dequantization, separate-table
  // luma/chroma quantization, 8x8 inverse DCT in doubles, 4:2:0 / 4:4:4 /
  // grayscale component layouts with the general MCU interleave, restart
  // markers (DRI/RSTn), and FF00 byte stuffing. Non-baseline frames
  // (progressive SOF2, arithmetic coding, 12-bit precision, >2x sampling
  // factors) reject with IllegalArgumentException — the fallback-lane
  // contract every other codec here honors.

  /** JPEG encode modes: grayscale (one component), 4:4:4 (three components,
    * no subsampling), 4:2:0 (chroma subsampled 2x2, 16x16 MCUs), 4:2:2
    * (chroma subsampled horizontally only, 16x8 MCUs — the (2,1) sampling
    * shape). */
  val JpegGray = 0
  val JpegColor444 = 1
  val JpegColor420 = 2
  val JpegColor422 = 3

  // Annex K Huffman table specs: (count of codes per length 1..16, symbols).
  private val DcLumaSpec = (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val DcChromaSpec = (Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    (0 to 11).toArray)
  private val AcLumaSpec = (Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val AcChromaSpec = (Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
      0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
      0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
      0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
      0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
      0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  /** Annex K example quantization tables (NATURAL row-major order) — the
    * de-facto "quality 50" tables real encoders scale. The lake keeps
    * uniform quant=1 (flat-block exactness needs it); these exist so the
    * encoder can also produce realistically-quantized files, which the
    * ImageIO differential spec decodes with both decoders. */
  val JpegStdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  val JpegStdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag scan: position `k` in transmission order → natural (row-major)
    * coefficient index. */
  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table: codes assigned in increasing length order per
    * T.81 C.2 — one structure serves the encoder (symbol → code) and the
    * decoder (per-length min/max code + value pointer). */
  private final class HuffTable(counts: Array[Int], symbols: Array[Int]) {
    require(counts.length == 16 && counts.sum == symbols.length, "bad Huffman spec")
    val codeOf = new Array[Int](256)
    val sizeOf = new Array[Int](256)
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        minCode(len) = code
        valPtr(len) = k
        var i = 0
        while (i < counts(len - 1)) {
          val sym = symbols(k)
          codeOf(sym) = code
          sizeOf(sym) = len
          code += 1; k += 1; i += 1
        }
        maxCode(len) = if (counts(len - 1) == 0) -1 else code - 1
        require(code <= (1 << len), "Huffman spec overflows code space")
        code <<= 1
        len += 1
      }
    }
    def value(len: Int, code: Int): Int = symbols(valPtr(len) + code - minCode(len))
  }
  private lazy val DcLuma = new HuffTable(DcLumaSpec._1, DcLumaSpec._2)
  private lazy val DcChroma = new HuffTable(DcChromaSpec._1, DcChromaSpec._2)
  private lazy val AcLuma = new HuffTable(AcLumaSpec._1, AcLumaSpec._2)
  private lazy val AcChroma = new HuffTable(AcChromaSpec._1, AcChromaSpec._2)

  // DCT basis, shared by FDCT and IDCT: JCos(x)(u) = cos((2x+1)uπ/16),
  // JC(u) = 1/√2 for u=0 else 1.
  private val JCos = Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val JC = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Forward DCT of a level-shifted 8x8 block (natural order), quantized by
    * `quant` (natural order), output in natural order. */
  private def fdctQuant(f: Array[Int], quant: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { s += f(y * 8 + x) * JCos(x)(u) * JCos(y)(v); x += 1 }
          y += 1
        }
        val coeff = 0.25 * JC(u) * JC(v) * s
        out(v * 8 + u) = math.round(coeff / quant(v * 8 + u)).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  /** Dequantize + inverse DCT: quantized coefficients (natural order) →
    * level-shifted spatial samples, rounded to nearest int (NOT yet +128). */
  private def idctDequant(coef: Array[Int], quant: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) s += JC(u) * JC(v) * c * quant(v * 8 + u) * JCos(x)(u) * JCos(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = math.round(0.25 * s).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** Entropy-coded-segment bit writer: MSB-first, FF bytes stuffed with 00
    * per T.81 B.1.1.5; flush pads the final partial byte with 1-bits. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  private def bitCategory(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode an image as baseline JFIF. `mode` is [[JpegGray]] /
    * [[JpegColor444]] / [[JpegColor420]]; `quant` fills both quantization
    * tables uniformly (1 = near-lossless: only DCT rounding) unless
    * explicit NATURAL-order `lumaQuant`/`chromaQuant` tables override it
    * (pass [[JpegStdLumaQuant]]/[[JpegStdChromaQuant]] for the realistic
    * Annex-K quantization); a positive `restartInterval` emits DRI + RSTn
    * markers every that many MCUs. */
  def jpegEncode(img: BmpImage, mode: Int = JpegColor444, quant: Int = 1,
                 restartInterval: Int = 0, lumaQuant: Array[Int] = null,
                 chromaQuant: Array[Int] = null): Array[Byte] = {
    val w = img.width; val h = img.height
    require(img.rgb.length == w * h * 3, "rgb length mismatch")
    // SOF0 stores dimensions as two bytes each — reject instead of
    // silently truncating into a corrupt-but-plausible header
    require(w >= 1 && h >= 1 && w <= 65535 && h <= 65535,
      s"JPEG dimensions out of range: ${w}x$h")
    require(quant >= 1 && quant <= 255, s"bad quant $quant")
    require(mode >= JpegGray && mode <= JpegColor422, s"bad mode $mode")
    // defensive copies: the std tables are shared vals, and a caller
    // mutating its own array after the range check must not corrupt the
    // in-flight (or any later) encode
    val qLuma = if (lumaQuant != null) lumaQuant.clone() else Array.fill(64)(quant)
    val qChroma = if (chromaQuant != null) chromaQuant.clone() else qLuma
    require(qLuma.length == 64 && qChroma.length == 64 &&
      qLuma.forall(v => v >= 1 && v <= 255) &&
      qChroma.forall(v => v >= 1 && v <= 255), "bad quantization table")
    // integer YCbCr planes (BT.601 full-range, the JFIF convention)
    val yP = new Array[Int](w * h)
    val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    var j = 0
    while (j < w * h) {
      val r = img.rgb(3 * j); val g = img.rgb(3 * j + 1); val b = img.rgb(3 * j + 2)
      yP(j) = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt.max(0).min(255)
      cbP(j) = math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt.max(0).min(255)
      crP(j) = math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt.max(0).min(255)
      j += 1
    }
    val nComp = if (mode == JpegGray) 1 else 3
    // luma sampling factors: (2,2) for 4:2:0, (2,1) for 4:2:2, else (1,1)
    val maxH = if (mode == JpegColor420 || mode == JpegColor422) 2 else 1
    val maxV = if (mode == JpegColor420) 2 else 1
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    // per-plane sample fetch with edge replication
    def sample(p: Array[Int], px: Int, py: Int, pw: Int, ph: Int): Int =
      p(math.min(py, ph - 1) * pw + math.min(px, pw - 1))
    // chroma planes subsampled by the luma factors (box average, half up)
    val (cw, ch) = ((w + maxH - 1) / maxH, (h + maxV - 1) / maxV)
    def subsampled(p: Array[Int]): Array[Int] =
      if (maxH == 1 && maxV == 1) p
      else Array.tabulate(cw * ch) { i =>
        val cx = i % cw; val cy = i / cw
        var s = 0
        var dy = 0
        while (dy < maxV) {
          var dx = 0
          while (dx < maxH) {
            s += sample(p, maxH * cx + dx, maxV * cy + dy, w, h)
            dx += 1
          }
          dy += 1
        }
        (s + maxH * maxV / 2) / (maxH * maxV)
      }
    val cbS = if (nComp == 3) subsampled(cbP) else null
    val crS = if (nComp == 3) subsampled(crP) else null

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m); out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    // DQT bytes are transmitted in zigzag order (tables held natural)
    seg(0xdb, Array(0x00) ++ Array.tabulate(64)(k => qLuma(Zigzag(k))))   // luma
    if (nComp == 3)
      seg(0xdb, Array(0x01) ++ Array.tabulate(64)(k => qChroma(Zigzag(k))))
    val compSpec = // (id, hSamp, vSamp, quantId)
      if (nComp == 1) Seq((1, 1, 1, 0))
      else Seq((1, maxH, maxV, 0), (2, 1, 1, 1), (3, 1, 1, 1))
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp) ++
      compSpec.flatMap { case (id, sh, sv, q) => Seq(id, (sh << 4) | sv, q) }) // SOF0
    def dhtBody(cls: Int, id: Int, spec: (Array[Int], Array[Int])): Array[Int] =
      Array((cls << 4) | id) ++ spec._1 ++ spec._2
    seg(0xc4, dhtBody(0, 0, DcLumaSpec) ++ dhtBody(1, 0, AcLumaSpec) ++
      (if (nComp == 3) dhtBody(0, 1, DcChromaSpec) ++ dhtBody(1, 1, AcChromaSpec)
       else Array.empty[Int]))
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff)) // DRI
    seg(0xda, Array(nComp) ++
      compSpec.flatMap { case (id, _, _, q) => Seq(id, (q << 4) | q) } ++
      Seq(0, 63, 0)) // SOS: tables 0/0 for luma, 1/1 for chroma

    val bw = new BitWriter(out)
    def encodeBlock(block: Array[Int], pred: Int, dc: HuffTable, ac: HuffTable,
                    qtab: Array[Int]): Int = {
      val coef = fdctQuant(block, qtab)
      val diff = coef(0) - pred
      val s = if (diff == 0) 0 else bitCategory(diff)
      bw.put(dc.codeOf(s), dc.sizeOf(s))
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var k = 1
      var run = 0
      while (k < 64) {
        val v = coef(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { bw.put(ac.codeOf(0xf0), ac.sizeOf(0xf0)); run -= 16 } // ZRL
          val vs = bitCategory(v)
          val rs = (run << 4) | vs
          bw.put(ac.codeOf(rs), ac.sizeOf(rs))
          bw.put(if (v < 0) v + (1 << vs) - 1 else v, vs)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(ac.codeOf(0x00), ac.sizeOf(0x00)) // EOB
      coef(0)
    }
    def blockAt(p: Array[Int], pw: Int, ph: Int, ox: Int, oy: Int): Array[Int] =
      Array.tabulate(64)(i => sample(p, ox + i % 8, oy + i / 8, pw, ph) - 128)
    val pred = new Array[Int](3)
    var rst = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rst % 8); rst += 1
          pred(0) = 0; pred(1) = 0; pred(2) = 0
        }
        // component 0 (luma): maxH x maxV blocks per MCU
        var by = 0
        while (by < maxV) {
          var bx = 0
          while (bx < maxH) {
            pred(0) = encodeBlock(
              blockAt(yP, w, h, (mx * maxH + bx) * 8, (my * maxV + by) * 8),
              pred(0), DcLuma, AcLuma, qLuma)
            bx += 1
          }
          by += 1
        }
        if (nComp == 3) {
          pred(1) = encodeBlock(blockAt(cbS, cw, ch, mx * 8, my * 8),
            pred(1), DcChroma, AcChroma, qChroma)
          pred(2) = encodeBlock(blockAt(crS, cw, ch, mx * 8, my * 8),
            pred(2), DcChroma, AcChroma, qChroma)
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Entropy-coded-segment bit reader: MSB-first, FF00 stuffing removed,
    * restart markers consumed only at [[restart]] calls. Any other marker
    * inside entropy data rejects. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "truncated entropy data")
        var b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated entropy data")
          val m = bytes(pos) & 0xff; pos += 1
          require(m == 0x00, f"unexpected marker FF$m%02X in entropy data")
          b = 0xff
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(idx: Int): Unit = {
      n = 0 // discard pad bits
      require(pos + 2 <= bytes.length, "truncated at restart")
      require((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xff) == 0xd0 + idx % 8,
        "missing restart marker")
      pos += 2
    }
    /** Byte-align; the scan is over (caller then expects EOI). */
    def finish(): Int = { n = 0; pos }
  }

  private def huffDecode(t: HuffTable, br: BitReader): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      code = (code << 1) | br.readBit()
      len += 1
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len) && code >= t.minCode(len))
        return t.value(len, code)
    }
    throw new IllegalArgumentException("invalid Huffman code")
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline JFIF/JPEG stream to top-down RGB. Grayscale decodes
    * with R=G=B=Y. Throws IllegalArgumentException on non-baseline frames
    * (progressive, arithmetic, 12-bit), unsupported sampling factors,
    * geometry bombs, bad markers, or truncated entropy data. */
  def jpegDecode(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG")
    var pos = 2
    def u8(p: Int): Int = { require(p < bytes.length, "truncated JPEG"); bytes(p) & 0xff }
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    val quantTabs = new Array[Array[Int]](4) // zigzag order, as transmitted
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = -1; var h = -1
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    var sosPos = -1
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    while (sosPos < 0) {
      require(u8(pos) == 0xff, f"expected marker, got ${u8(pos)}%02X")
      // T.81 B.1.1.2: markers may be preceded by any number of FF fill
      // bytes — skip to the marker code proper
      while (u8(pos + 1) == 0xff) pos += 1
      val m = u8(pos + 1)
      pos += 2
      // standalone markers (no length field) are all illegal before the scan
      if (m == 0xd8) throw new IllegalArgumentException("unexpected SOI")
      if (m == 0xd9) throw new IllegalArgumentException("EOI before scan data")
      if (m >= 0xd0 && m <= 0xd7)
        throw new IllegalArgumentException("restart marker outside entropy data")
      if (m == 0x01) throw new IllegalArgumentException("unexpected TEM marker")
      val len = u16(pos)
      require(len >= 2 && pos + len <= bytes.length, "truncated segment")
      m match {
        case 0xdb => // DQT: one or more tables
          var p = pos + 2
          while (p < pos + len) {
            val pq = u8(p) >> 4; val tq = u8(p) & 15
            require(pq == 0, "16-bit quantization tables unsupported")
            require(tq < 4, s"bad quant table id $tq")
            require(p + 65 <= pos + len, "truncated DQT")
            quantTabs(tq) = Array.tabulate(64)(i => u8(p + 1 + i))
            require(quantTabs(tq).forall(_ >= 1), "zero quantizer")
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = pos + 2
          while (p < pos + len) {
            val cls = u8(p) >> 4; val id = u8(p) & 15
            require(cls <= 1 && id < 4, s"bad Huffman table class/id $cls/$id")
            val counts = Array.tabulate(16)(i => u8(p + 1 + i))
            val total = counts.sum
            require(total <= 256 && p + 17 + total <= pos + len, "truncated DHT")
            val syms = Array.tabulate(total)(i => u8(p + 17 + i))
            val t = new HuffTable(counts, syms)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
            p += 17 + total
          }
        case 0xc0 => // SOF0: baseline
          require(u8(pos + 2) == 8, "only 8-bit precision supported")
          h = u16(pos + 3); w = u16(pos + 5)
          require(w > 0 && h > 0 && w <= MaxDim && h <= MaxDim &&
            w.toLong * h <= MaxPixels, s"unsupported dimensions ${w}x$h")
          nComp = u8(pos + 7)
          require(nComp == 1 || nComp == 3, s"unsupported component count $nComp")
          require(len == 8 + 3 * nComp, "bad SOF0 length")
          compId = new Array[Int](nComp); compH = new Array[Int](nComp)
          compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = u8(pos + 8 + 3 * c)
            val hv = u8(pos + 9 + 3 * c)
            compH(c) = hv >> 4; compV(c) = hv & 15
            require(compH(c) >= 1 && compH(c) <= 2 && compV(c) >= 1 && compV(c) <= 2,
              s"unsupported sampling ${compH(c)}x${compV(c)}")
            compQ(c) = u8(pos + 10 + 3 * c)
            require(compQ(c) < 4, "bad quant table ref")
            c += 1
          }
        case 0xc2 => throw new IllegalArgumentException("progressive JPEG unsupported")
        case sof if (sof >= 0xc1 && sof <= 0xcf) && sof != 0xc4 && sof != 0xc8 =>
          throw new IllegalArgumentException(f"non-baseline frame SOF${sof - 0xc0}%d unsupported")
        case 0xdd => // DRI
          require(len == 4, "bad DRI length")
          restartInterval = u16(pos + 2)
        case 0xda => // SOS
          require(w > 0, "SOS before SOF")
          val ns = u8(pos + 2)
          require(ns == nComp, "partial scans unsupported")
          require(len == 6 + 2 * ns, "bad SOS length")
          compDc = new Array[Int](nComp); compAc = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val id = u8(pos + 3 + 2 * c)
            val ci = compId.indexOf(id)
            require(ci >= 0, s"scan references unknown component $id")
            compDc(ci) = u8(pos + 4 + 2 * c) >> 4
            compAc(ci) = u8(pos + 4 + 2 * c) & 15
            require(compDc(ci) < 4 && compAc(ci) < 4,
              s"bad entropy table ref ${compDc(ci)}/${compAc(ci)}")
            c += 1
          }
          require(u8(pos + 3 + 2 * ns) == 0 && u8(pos + 4 + 2 * ns) == 63 &&
            u8(pos + 5 + 2 * ns) == 0, "non-baseline scan parameters")
          sosPos = pos + len
        case _ => // APPn / COM / other ancillary: skip
      }
      if (sosPos < 0) pos += len
    }
    val maxH = compH.max; val maxV = compV.max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val planeW = Array.tabulate(nComp)(c => mcusX * 8 * compH(c))
    val planeH = Array.tabulate(nComp)(c => mcusY * 8 * compV(c))
    val planes = Array.tabulate(nComp)(c => new Array[Int](planeW(c) * planeH(c)))
    for (c <- 0 until nComp) {
      require(dcTabs(compDc(c)) != null, s"missing DC table ${compDc(c)}")
      require(acTabs(compAc(c)) != null, s"missing AC table ${compAc(c)}")
      require(quantTabs(compQ(c)) != null, s"missing quant table ${compQ(c)}")
    }
    val br = new BitReader(bytes, sosPos)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val unitQuant = Array.fill(64)(1) // dequant happens at coefficient read
    var rst = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rst); rst += 1
          var c = 0
          while (c < nComp) { pred(c) = 0; c += 1 }
        }
        var c = 0
        while (c < nComp) {
          val qz = quantTabs(compQ(c))
          var by = 0
          while (by < compV(c)) {
            var bx = 0
            while (bx < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val s = huffDecode(dcTabs(compDc(c)), br)
              require(s <= 11, "DC category out of range")
              pred(c) += extend(br.receive(s), s)
              coef(0) = pred(c) * qz(0)
              var k = 1
              var done = false
              while (k < 64 && !done) {
                val rs = huffDecode(acTabs(compAc(c)), br)
                val run = rs >> 4; val sz = rs & 15
                if (sz == 0) {
                  if (run == 15) k += 16 // ZRL
                  else done = true       // EOB
                } else {
                  k += run
                  require(k < 64, "AC coefficient index overflow")
                  coef(Zigzag(k)) = extend(br.receive(sz), sz) * qz(k)
                  k += 1
                }
              }
              val px = idctDequant(coef, unitQuant)
              val ox = (mx * compH(c) + bx) * 8
              val oy = (my * compV(c) + by) * 8
              var i = 0
              while (i < 64) {
                planes(c)((oy + i / 8) * planeW(c) + ox + i % 8) =
                  (px(i) + 128).max(0).min(255)
                i += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    var tail = br.finish()
    // optional fill bytes, then EOI
    while (tail + 1 < bytes.length && (bytes(tail) & 0xff) == 0xff &&
           (bytes(tail + 1) & 0xff) == 0xff) tail += 1
    require(tail + 2 <= bytes.length && (bytes(tail) & 0xff) == 0xff &&
      (bytes(tail + 1) & 0xff) == 0xd9, "missing EOI after scan")
    // upsample + color convert
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val yy = planes(0)((y * compV(0) / maxV) * planeW(0) + x * compH(0) / maxH)
        if (nComp == 1) {
          rgb(o) = yy; rgb(o + 1) = yy; rgb(o + 2) = yy
        } else {
          val cb = planes(1)((y * compV(1) / maxV) * planeW(1) + x * compH(1) / maxH) - 128
          val cr = planes(2)((y * compV(2) / maxV) * planeW(2) + x * compH(2) / maxH) - 128
          rgb(o) = math.round(yy + 1.402 * cr).toInt.max(0).min(255)
          rgb(o + 1) = math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt.max(0).min(255)
          rgb(o + 2) = math.round(yy + 1.772 * cb).toInt.max(0).min(255)
        }
        x += 1
      }
      y += 1
    }
    BmpImage(w, h, rgb)
  }

  // ======================= AVI (RIFF) container =======================
  //
  // Motion-JPEG AVI per the public RIFF/AVI layout (the same chunk
  // discipline as WAV, which shares the RIFF container):
  //
  //   RIFF <size> 'AVI '
  //     LIST 'hdrl'
  //       avih <56>                    main header: µs/frame, total frames,
  //                                    stream count, width, height
  //       LIST 'strl'
  //         strh <56>                  stream header: 'vids' + handler fourcc
  //         strf <40>                  BITMAPINFOHEADER (biCompression fourcc)
  //     LIST 'movi'
  //       00dc <n> <JFIF bytes>        one compressed video chunk per frame
  //       ...                          (chunks pad to even length, RIFF rule)
  //     idx1 <16·frames>               frame index (ckid, flags, offset, size)
  //
  // The MJPEG decoder is a real container parser: it walks the chunk tree,
  // validates the video stream's declared codec, runs the full baseline
  // JPEG decoder on every frame chunk, and cross-checks each decoded
  // frame's geometry and the frame COUNT against the headers. The DIB
  // (uncompressed) encoder produces well-formed files the decoder rejects,
  // so reject→fallback routing is exercised by authentic video payloads.

  /** Frame-count sanity cap: header-declared totals beyond this reject
    * before any allocation (the MaxPixels discipline, per-container). */
  private val MaxAviFrames = 1 << 12

  /** Audio-track byte cap: like [[MaxPixels]], bounds the decoded
    * allocation before trusting header-declared sizes. */
  private val MaxAviAudioBytes = 1 << 24

  private final class RiffWriter {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = { var i = 0; while (i < 4) { out.write(s.charAt(i) & 0xff); i += 1 } }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def result(): Array[Byte] = out.toByteArray
  }

  /** `id` + LE size + body, padded to even length (RIFF rule). */
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val w = new RiffWriter
    w.tag(id); w.u32(body.length); w.bytes(body)
    if (body.length % 2 == 1) w.out.write(0)
    w.result()
  }

  private def riffList(listType: String, body: Array[Byte]): Array[Byte] = {
    val w = new RiffWriter
    w.tag("LIST"); w.u32(body.length + 4); w.tag(listType); w.bytes(body)
    w.result()
  }

  private def aviHeaders(width: Int, height: Int, usPerFrame: Int,
                         nFrames: Int, maxFrameBytes: Int,
                         handler: String, biCompression: String,
                         audio: Option[(Int, Int, Int)] = None): Array[Byte] = {
    val avih = new RiffWriter
    avih.u32(usPerFrame); avih.u32(0); avih.u32(0); avih.u32(0) // µs/frame, maxBps, padding, flags
    avih.u32(nFrames); avih.u32(0); avih.u32(1 + audio.size)    // total frames, initial, streams
    avih.u32(maxFrameBytes); avih.u32(width); avih.u32(height)  // buffer, w, h
    avih.u32(0); avih.u32(0); avih.u32(0); avih.u32(0)          // reserved[4]
    val strh = new RiffWriter
    strh.tag("vids"); strh.tag(handler)
    strh.u32(0); strh.u32(0); strh.u32(0)            // flags, prio+lang, initial
    strh.u32(usPerFrame); strh.u32(1000000)          // scale, rate: fps = rate/scale
    strh.u32(0); strh.u32(nFrames)                   // start, length (frames)
    strh.u32(maxFrameBytes); strh.u32(-1); strh.u32(0) // buffer, quality, sampleSize
    strh.u16(0); strh.u16(0); strh.u16(width); strh.u16(height) // rcFrame
    val strf = new RiffWriter // BITMAPINFOHEADER
    strf.u32(40); strf.u32(width); strf.u32(height)
    strf.u16(1); strf.u16(24)
    if (biCompression.isEmpty) strf.u32(0) else strf.tag(biCompression)
    strf.u32(width * height * 3); strf.u32(2835); strf.u32(2835)
    strf.u32(0); strf.u32(0)
    val audioStrl: Array[Byte] = audio match {
      case None => Array.emptyByteArray
      case Some((sampleRate, nSamples, fmtTag)) =>
        // one-byte-per-sample codings only (µ-law / PCM8): sampleSize 1
        val ash = new RiffWriter
        ash.tag("auds"); ash.u32(0)                    // fccType, no handler
        ash.u32(0); ash.u32(0); ash.u32(0)             // flags, prio+lang, initial
        ash.u32(1); ash.u32(sampleRate)                // scale, rate: samples/s
        ash.u32(0); ash.u32(nSamples)                  // start, length (samples)
        ash.u32(sampleRate); ash.u32(-1); ash.u32(1)   // buffer, quality, sampleSize
        ash.u16(0); ash.u16(0); ash.u16(0); ash.u16(0) // rcFrame (unused)
        val asf = new RiffWriter // WAVEFORMATEX
        asf.u16(fmtTag); asf.u16(1)                    // format, mono
        asf.u32(sampleRate); asf.u32(sampleRate)       // rate, byte rate
        asf.u16(1); asf.u16(8); asf.u16(0)             // block align, bits, cbSize
        riffList("strl", riffChunk("strh", ash.result()) ++
          riffChunk("strf", asf.result()))
    }
    riffList("hdrl", riffChunk("avih", avih.result()) ++
      riffList("strl", riffChunk("strh", strh.result()) ++
        riffChunk("strf", strf.result())) ++ audioStrl)
  }

  private def aviAssemble(headers: Array[Byte],
                          chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val movi = new RiffWriter
    movi.tag("movi")
    // idx1 offsets are measured from the 'movi' fourcc (the common
    // convention): the first chunk sits at offset 4
    val idx = new RiffWriter
    var off = 4
    chunks.foreach { case (id, p) =>
      val chunk = riffChunk(id, p)
      movi.bytes(chunk)
      idx.tag(id); idx.u32(0x10); idx.u32(off); idx.u32(p.length)
      off += chunk.length
    }
    val moviList = {
      val w = new RiffWriter
      w.tag("LIST"); w.u32(movi.out.size()); w.bytes(movi.result())
      w.result()
    }
    val body = headers ++ moviList ++ riffChunk("idx1", idx.result())
    val riff = new RiffWriter
    riff.tag("RIFF"); riff.u32(body.length + 4); riff.tag("AVI ")
    riff.bytes(body)
    riff.result()
  }

  /** Assemble already-JFIF-encoded frames into a motion-JPEG AVI. Every
    * frame must be a baseline JPEG of the SAME `width`×`height` (the
    * decoder enforces the header cross-check; the encoder only sanity-
    * checks the SOI magic so a mis-assembled lake fails loudly here). */
  def aviEncodeMjpeg(width: Int, height: Int, usPerFrame: Int,
                     jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= MaxDim && height <= MaxDim,
      s"bad AVI geometry ${width}x$height")
    require(usPerFrame >= 1, s"bad frame period $usPerFrame")
    require(jpegFrames.nonEmpty && jpegFrames.length <= MaxAviFrames,
      s"bad frame count ${jpegFrames.length}")
    jpegFrames.foreach { f =>
      require(f.length >= 2 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
        "frame is not a JPEG")
    }
    val maxBytes = jpegFrames.map(_.length).max
    aviAssemble(aviHeaders(width, height, usPerFrame, jpegFrames.length,
      maxBytes, "MJPG", "MJPG"), jpegFrames.map(("00dc", _)))
  }

  /** Motion-JPEG AVI with an interleaved mono audio track: the µ-law (or,
    * for the reject fixture, `fmtTag` 1 PCM8) code bytes are split into one
    * `01wb` chunk after each frame's `00dc` — the standard muxer interleave,
    * so a streaming demuxer never seeks. Frame `i` carries codes
    * `[i·n/nf, (i+1)·n/nf)`. */
  def aviEncodeMjpegAv(width: Int, height: Int, usPerFrame: Int,
                       jpegFrames: Seq[Array[Byte]], sampleRate: Int,
                       audioCodes: Array[Byte], fmtTag: Int = 7): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= MaxDim && height <= MaxDim,
      s"bad AVI geometry ${width}x$height")
    require(usPerFrame >= 1, s"bad frame period $usPerFrame")
    require(jpegFrames.nonEmpty && jpegFrames.length <= MaxAviFrames,
      s"bad frame count ${jpegFrames.length}")
    require(audioCodes.nonEmpty, "empty audio track")
    jpegFrames.foreach { f =>
      require(f.length >= 2 && (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
        "frame is not a JPEG")
    }
    val nf = jpegFrames.length
    val n = audioCodes.length
    val chunks = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    while (i < nf) {
      chunks += (("00dc", jpegFrames(i)))
      val from = (i.toLong * n / nf).toInt
      val until = ((i + 1).toLong * n / nf).toInt
      if (until > from)
        chunks += (("01wb", java.util.Arrays.copyOfRange(audioCodes, from, until)))
      i += 1
    }
    val maxBytes = jpegFrames.map(_.length).max
    aviAssemble(aviHeaders(width, height, usPerFrame, nf, maxBytes,
      "MJPG", "MJPG", Some((sampleRate, n, fmtTag))), chunks.result())
  }

  /** Uncompressed (DIB) AVI: frames stored as raw bottom-up BGR rows padded
    * to 4 bytes — the BMP pixel-array layout — in `00db` chunks. Well-formed
    * per the AVI spec, OUTSIDE the MJPEG decoder's envelope: [[aviDecode]]
    * rejects it into the fallback lane (the bmpEncode32/wavEncode24 move
    * in the video domain). */
  def aviEncodeDib(usPerFrame: Int, frames: Seq[BmpImage]): Array[Byte] = {
    require(frames.nonEmpty && frames.length <= MaxAviFrames,
      s"bad frame count ${frames.length}")
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "DIB frames must share one geometry")
    val rowSize = (w * 3 + 3) / 4 * 4
    val payloads = frames.map { f =>
      val b = le(rowSize * h)
      var row = h - 1
      while (row >= 0) { // bottom-up, BGR — the BMP pixel-array layout
        var x = 0
        while (x < w) {
          val p = (row * w + x) * 3
          b.put(f.rgb(p + 2).toByte).put(f.rgb(p + 1).toByte).put(f.rgb(p).toByte)
          x += 1
        }
        var pad = rowSize - w * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        row -= 1
      }
      b.array()
    }
    aviAssemble(aviHeaders(w, h, usPerFrame, frames.length, rowSize * h,
      "DIB ", ""), payloads.map(("00db", _)))
  }

  /** Video-only view of [[aviDecodeAv]]: A/V files decode and drop the
    * audio track; the reject envelope is identical. */
  def aviDecode(bytes: Array[Byte]): AviVideo = aviDecodeAv(bytes).video

  /** Demux + decode an AVI: full RIFF chunk walk, header validation,
    * baseline JPEG decode per `00dc` frame chunk, µ-law expansion of the
    * interleaved `01wb` audio track when one is declared, geometry /
    * frame-count / sample-count cross-checks. Throws
    * IllegalArgumentException on anything that is not an MJPEG video
    * stream plus at most one µ-law audio stream inside the sanity caps —
    * uncompressed (DIB) video or PCM audio tracks are well-formed rejects
    * for the pipeline's fallback lane. */
  def aviDecodeAv(bytes: Array[Byte]): AviMedia = aviDemuxDecode(bytes, 1)

  /** Stride-sampled decode: the FULL container walk and every header /
    * chunk / count cross-check still run (the walk is the cheap part),
    * but only frame chunks at stride-multiple CONTAINER indices pay the
    * JPEG entropy decode — the k-fold cost cut video fingerprinting takes
    * at scale, where decode bytes dominate the lane. Geometry checks
    * apply to the decoded subset only (skipped frames are, by
    * construction, never looked at). */
  def aviDecodeSampled(bytes: Array[Byte], stride: Int): AviMedia = {
    require(stride >= 1, s"bad frame stride $stride")
    aviDemuxDecode(bytes, stride)
  }

  private def aviDemuxDecode(bytes: Array[Byte], frameStride: Int): AviMedia = {
    def tagAt(p: Int): String = {
      require(p >= 0 && p + 4 <= bytes.length, "truncated AVI")
      new String(Array(bytes(p), bytes(p + 1), bytes(p + 2), bytes(p + 3)),
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    def u32(p: Int): Int = {
      require(p >= 0 && p + 4 <= bytes.length, "truncated AVI")
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
    }
    def u16le(p: Int): Int = {
      require(p >= 0 && p + 2 <= bytes.length, "truncated AVI")
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    }
    // chunk sizes are attacker-controlled u32s: validate non-negative and
    // bound in LONG before any pointer moves, or a crafted size wraps the
    // walk pointer negative/past the buffer
    def chunkSize(p: Int, end: Int, id: String): Int = {
      val sz = u32(p + 4)
      require(sz >= 0 && p + 8L + sz <= end, s"truncated $id chunk")
      sz
    }
    require(bytes.length >= 12 && tagAt(0) == "RIFF" && tagAt(8) == "AVI ",
      "not an AVI")
    val riffEnd = {
      val sz = u32(4)
      require(sz >= 4 && 8L + sz <= bytes.length, "truncated RIFF payload")
      8 + sz
    }
    var width = -1; var height = -1; var usPerFrame = -1
    var totalFrames = -1; var streams = -1
    var strhFrames = -1
    var handler: String = null; var biCompression: String = null
    var sawHdrl = false
    val framePayloads = Vector.newBuilder[Array[Byte]]
    var nFrameChunks = 0
    var idxEntries = -1
    var audFmtTag = -1; var audChannels = -1; var audRate = -1
    var audSamples = -1; var audSampleSize = -1
    var sawAudioStrh = false
    val audioBytes = new java.io.ByteArrayOutputStream()
    var nAudioChunks = 0

    // one stream-header pair (strh/strf) inside LIST strl — the strf is
    // typed by ITS OWN strl's strh, never by another stream's
    def parseStrl(from: Int, end: Int): Unit = {
      var p = from
      var curType: String = null
      while (p + 8 <= end) {
        val id = tagAt(p); val sz = chunkSize(p, end, id)
        id match {
          case "strh" =>
            require(sz >= 56, "short strh")
            curType = tagAt(p + 8)
            if (curType == "vids") {
              require(handler == null, "duplicate video stream header")
              handler = tagAt(p + 12)
              strhFrames = u32(p + 8 + 32)
            } else if (curType == "auds") {
              require(!sawAudioStrh, "duplicate audio stream header")
              sawAudioStrh = true
              audSamples = u32(p + 8 + 32)
              audSampleSize = u32(p + 8 + 44)
            }
          case "strf" =>
            if (curType == "vids" && biCompression == null) {
              require(sz >= 40, "short strf")
              val comp = u32(p + 8 + 16)
              biCompression =
                if (comp == 0) "" else tagAt(p + 8 + 16)
            } else if (curType == "auds" && audFmtTag < 0) {
              require(sz >= 16, "short audio strf") // WAVEFORMAT(EX)
              audFmtTag = u16le(p + 8)
              audChannels = u16le(p + 8 + 2)
              audRate = u32(p + 8 + 4)
            }
          case _ => () // JUNK etc.
        }
        p += 8 + sz + (sz & 1)
      }
    }
    def parseHdrl(from: Int, end: Int): Unit = {
      var p = from
      while (p + 8 <= end) {
        val id = tagAt(p); val sz = chunkSize(p, end, id)
        if (id == "avih") {
          require(sz >= 56, "short avih")
          usPerFrame = u32(p + 8)
          totalFrames = u32(p + 8 + 16)
          streams = u32(p + 8 + 24)
          width = u32(p + 8 + 32)
          height = u32(p + 8 + 36)
        } else if (id == "LIST" && tagAt(p + 8) == "strl") {
          parseStrl(p + 12, p + 8 + sz)
        }
        p += 8 + sz + (sz & 1)
      }
      sawHdrl = true
    }
    def parseMovi(from: Int, end: Int): Unit = {
      require(sawHdrl, "movi before hdrl")
      // the declared codec gates the frame walk: a non-MJPEG stream must
      // reject AS an unsupported codec (the fallback-lane contract), not
      // as a malformed frame chunk
      require(handler != null, "no video stream")
      require(handler == "MJPG" && biCompression == "MJPG",
        s"unsupported AVI codec ${if (handler == "MJPG") biCompression else handler}")
      var p = from
      while (p + 8 <= end) {
        val id = tagAt(p); val sz = chunkSize(p, end, id)
        if (id == "00dc" || id == "00db") {
          require(id == "00dc", "uncompressed frame chunk in MJPG stream")
          nFrameChunks += 1
          require(nFrameChunks <= MaxAviFrames, "too many frame chunks")
          framePayloads += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)
        } else if (id == "01wb") {
          require(sawAudioStrh, "audio chunk without audio stream")
          nAudioChunks += 1
          require(audioBytes.size + sz <= MaxAviAudioBytes,
            "audio track over cap")
          audioBytes.write(bytes, p + 8, sz)
        }
        p += 8 + sz + (sz & 1)
      }
    }

    var p = 12
    while (p + 8 <= riffEnd) {
      val id = tagAt(p); val sz = chunkSize(p, riffEnd, id)
      if (id == "LIST") {
        tagAt(p + 8) match {
          case "hdrl" => parseHdrl(p + 12, p + 8 + sz)
          case "movi" => parseMovi(p + 12, p + 8 + sz)
          case _      => () // INFO etc. — skip
        }
      } else if (id == "idx1") {
        require(sz % 16 == 0, "bad idx1 size")
        idxEntries = sz / 16
      }
      p += 8 + sz + (sz & 1)
    }

    require(sawHdrl, "missing hdrl")
    require(streams == 1 + (if (sawAudioStrh) 1 else 0),
      s"stream count $streams does not match the streams present")
    require(handler != null, "no video stream")
    require(handler == "MJPG" && biCompression == "MJPG",
      s"unsupported AVI codec ${if (handler == "MJPG") biCompression else handler}")
    require(width >= 1 && height >= 1 && width <= MaxDim && height <= MaxDim,
      s"bad AVI geometry ${width}x$height")
    require(usPerFrame >= 1, s"bad frame period $usPerFrame")
    require(totalFrames >= 1 && totalFrames <= MaxAviFrames,
      s"bad declared frame count $totalFrames")
    // header-declared decode volume capped BEFORE any frame decode
    require(totalFrames.toLong * width * height <= MaxPixels,
      "AVI decode volume over cap")
    val payloads = framePayloads.result()
    require(payloads.length == totalFrames,
      s"frame chunks ${payloads.length} != declared $totalFrames")
    require(strhFrames == totalFrames,
      s"stream length $strhFrames != declared $totalFrames")
    if (idxEntries >= 0)
      require(idxEntries == totalFrames + nAudioChunks,
        s"idx1 entries $idxEntries != chunks ${totalFrames + nAudioChunks}")
    val audio =
      if (!sawAudioStrh) None
      else {
        require(audFmtTag == 7, // the µ-law envelope; PCM tracks reject
          s"unsupported AVI audio codec tag $audFmtTag")
        require(audChannels == 1, s"unsupported audio channels $audChannels")
        require(audSampleSize == 1,
          s"unsupported audio sample size $audSampleSize")
        require(audRate >= 1, s"bad audio rate $audRate")
        val data = audioBytes.toByteArray
        require(data.length == audSamples,
          s"audio bytes ${data.length} != declared $audSamples")
        val samples = new Array[Short](data.length)
        var i = 0
        while (i < data.length) { samples(i) = mulawExpand(data(i)); i += 1 }
        Some(WavAudio(audRate, samples))
      }
    val frames = payloads.zipWithIndex.collect {
      case (fp, j) if j % frameStride == 0 =>
        val img = jpegDecode(fp)
        require(img.width == width && img.height == height,
          s"frame geometry ${img.width}x${img.height} != header ${width}x$height")
        img
    }
    AviMedia(AviVideo(width, height, usPerFrame, frames), audio)
  }

  // --- POSIX ustar ---------------------------------------------------------

  /** Total-extracted-bytes cap for tar walks: header-declared sizes are
    * attacker-controlled, so bound the sum before allocating members. */
  private val MaxTarBytes = 1L << 26

  /** Cap violations get their own IllegalArgumentException subtype so the
    * nested walk can tell "over budget — reject the whole bundle" (the
    * zip-bomb shape, which must quarantine) from "this member is not
    * really an archive — keep it opaque" (magic bytes occur in ordinary
    * content). Subtyping keeps every existing corrupt-payload catch
    * working unchanged. */
  final class ArchiveBudgetException(msg: String)
    extends IllegalArgumentException(msg)

  private def budgetCheck(ok: Boolean, msg: => String): Unit =
    if (!ok) throw new ArchiveBudgetException(msg)

  /** POSIX ustar writer: one 512-byte header per member (octal size,
    * checksum computed over a space-filled checksum field), data padded to
    * the block size, two zero blocks closing the archive. mtime pinned to
    * 0 so identical content archives identically (the determinism the
    * oracle and dedup passes need). */
  def tarEncode(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((name, data) <- entries) {
      val nb = name.getBytes("US-ASCII")
      require(nb.nonEmpty && nb.length <= 100, s"bad member name '$name'")
      val hdr = new Array[Byte](512)
      System.arraycopy(nb, 0, hdr, 0, nb.length)
      def octal(v: Long, off: Int, len: Int): Unit = {
        require(v >= 0, s"negative field $v")
        val s = java.lang.Long.toOctalString(v)
        require(s.length <= len - 1, s"field $v overflows $len octal bytes")
        val padded = ("0" * (len - 1 - s.length)) + s
        var i = 0
        while (i < len - 1) { hdr(off + i) = padded.charAt(i).toByte; i += 1 }
        hdr(off + len - 1) = 0 // NUL terminator
      }
      octal(420, 100, 8)                 // mode 0644
      octal(0, 108, 8); octal(0, 116, 8) // uid, gid
      octal(data.length.toLong, 124, 12) // size
      octal(0, 136, 12)                  // mtime: pinned
      hdr(156) = '0'                     // typeflag: regular file
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
      hdr(263) = '0'; hdr(264) = '0'     // version "00" (magic ends in NUL)
      java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
      var sum = 0
      var i = 0
      while (i < 512) { sum += hdr(i) & 0xff; i += 1 }
      val cs = Integer.toOctalString(sum)
      val csp = ("0" * (6 - cs.length)) + cs
      i = 0
      while (i < 6) { hdr(148 + i) = csp.charAt(i).toByte; i += 1 }
      hdr(154) = 0; hdr(155) = ' '       // NUL + space, the ustar shape
      out.write(hdr)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive marker
    out.toByteArray
  }

  /** gzip-wrap (RFC 1952) for archive members — deterministic for fixed
    * input: pinned header (no name/mtime), default-level deflate. */
  def gzipEncode(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  /** gunzip with the decoded-size cap the other compressed containers
    * enforce; corrupt streams reject as IllegalArgumentException. */
  def gzipDecode(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b, "not gzip")
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) {
        budgetCheck(out.size.toLong + n <= MaxTarBytes, "gzip output over cap")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(s"corrupt gzip: ${e.getMessage}")
    }
  }

  /** ustar reader: per-header magic + checksum verification, octal size
    * parse, padded-block walk, total-size cap before member allocation.
    * Regular-file members return; directories and other typeflags are
    * walked past. Corrupt headers, bad checksums, and truncated data all
    * reject with the documented IllegalArgumentException. */
  def tarExtract(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var pos = 0
    var total = 0L
    var done = false
    while (!done) {
      if (pos + 512 > bytes.length) {
        // a conformant archive ends with zero blocks, but tolerate a
        // clean end exactly at the last member (common with | tools)
        require(pos == bytes.length, "truncated tar header")
        done = true
      } else if ((0 until 512).forall(i => bytes(pos + i) == 0)) {
        // end-of-archive zero block: everything after it must be zero
        // padding — trailing garbage (or a second concatenated archive)
        // rejects rather than silently dropping
        var t = pos + 512
        while (t < bytes.length) {
          require(bytes(t) == 0, "non-zero bytes after tar end-of-archive")
          t += 1
        }
        done = true
      } else {
        val magic = new String(bytes, pos + 257, 5, "US-ASCII")
        require(magic == "ustar", s"bad tar magic '$magic'")
        def octalAt(off: Int, len: Int): Long = {
          var v = 0L
          var i = 0
          var seen = false
          while (i < len) {
            val c = bytes(pos + off + i)
            if (c == 0 || c == ' ') { if (seen) i = len - 1 } // terminator
            else {
              require(c >= '0' && c <= '7', s"bad octal byte $c in tar header")
              v = v * 8 + (c - '0'); seen = true
              budgetCheck(v <= MaxTarBytes, "tar field over cap")
            }
            i += 1
          }
          v
        }
        // checksum: header bytes with the checksum field read as spaces
        val declared = octalAt(148, 8)
        var sum = 0L
        var i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(pos + i) & 0xff)
          i += 1
        }
        require(sum == declared, s"tar checksum $sum != declared $declared")
        val nameEnd = {
          var e = 0
          while (e < 100 && bytes(pos + e) != 0) e += 1
          e
        }
        val name = new String(bytes, pos, nameEnd, "US-ASCII")
        val size = octalAt(124, 12)
        val typeflag = bytes(pos + 156)
        val padded = (size + 511) / 512 * 512
        require(pos + 512 + padded <= bytes.length, "truncated tar member")
        if (typeflag == '0' || typeflag == 0) {
          total += size
          budgetCheck(total <= MaxTarBytes, "tar archive over extraction cap")
          out += ((name, java.util.Arrays.copyOfRange(
            bytes, pos + 512, pos + 512 + size.toInt)))
        }
        pos += 512 + padded.toInt
      }
    }
    out.result()
  }

  // --- ZIP ------------------------------------------------------------------

  /** ZIP writer (PKWARE APPNOTE layout): local file header + data per
    * member, central directory, end-of-central-directory record. Members
    * store (`method` 0) or raw-deflate (`method` 8, fixed level); CRC32
    * and both sizes always in the local header (no data descriptors), DOS
    * time pinned to 0 — deterministic for fixed input, like [[tarEncode]]. */
  def zipEncode(entries: Seq[(String, Array[Byte])],
                deflated: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dir = new java.io.ByteArrayOutputStream()
    def u16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def u32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
      o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
    }
    var count = 0
    for ((name, data) <- entries) {
      val nb = name.getBytes("US-ASCII")
      require(nb.nonEmpty && nb.length <= 0xffff, s"bad member name '$name'")
      val crc = new java.util.zip.CRC32
      crc.update(data)
      val packed =
        if (!deflated) data
        else {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // raw deflate
          d.setInput(data); d.finish()
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
          d.end()
          buf.toByteArray
        }
      val method = if (deflated) 8 else 0
      val offset = out.size()
      u32(out, 0x04034b50L)            // local file header signature
      u16(out, 20); u16(out, 0)        // version needed, flags (no descriptor)
      u16(out, method)
      u16(out, 0); u16(out, 0)         // DOS time/date pinned
      u32(out, crc.getValue)
      u32(out, packed.length.toLong); u32(out, data.length.toLong)
      u16(out, nb.length); u16(out, 0) // name len, extra len
      out.write(nb); out.write(packed)
      u32(dir, 0x02014b50L)            // central directory signature
      u16(dir, 20); u16(dir, 20); u16(dir, 0)
      u16(dir, method)
      u16(dir, 0); u16(dir, 0)
      u32(dir, crc.getValue)
      u32(dir, packed.length.toLong); u32(dir, data.length.toLong)
      u16(dir, nb.length); u16(dir, 0); u16(dir, 0) // name/extra/comment len
      u16(dir, 0); u16(dir, 0)         // disk start, internal attrs
      u32(dir, 0)                      // external attrs
      u32(dir, offset.toLong)
      dir.write(nb)
      count += 1
    }
    val cdOff = out.size(); val cdBytes = dir.toByteArray
    out.write(cdBytes)
    u32(out, 0x06054b50L)              // end of central directory
    u16(out, 0); u16(out, 0)           // disk numbers
    u16(out, count); u16(out, count)
    u32(out, cdBytes.length.toLong); u32(out, cdOff.toLong)
    u16(out, 0)                        // comment length
    out.toByteArray
  }

  /** ZIP reader: locate the end-of-central-directory record from the
    * tail, walk the central directory (the authoritative index, per the
    * spec), seek each member's local header, inflate method-8 entries
    * (raw `Inflater`), and VERIFY every CRC32 against the directory —
    * a member whose bytes do not match its declared checksum rejects,
    * never flows corrupt. Total output capped like the tar walk. */
  def zipExtract(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    def u16(p: Int): Int = {
      require(p >= 0 && p + 2 <= bytes.length, "truncated ZIP")
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    }
    def u32(p: Int): Long = {
      require(p >= 0 && p + 4 <= bytes.length, "truncated ZIP")
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    }
    // EOCD: fixed 22 bytes + comment; scan back for the signature. The
    // comment length must account for every byte after the record — a
    // signature embedded in a trailing comment otherwise parses from the
    // wrong record (keep scanning backward past such false hits).
    var eocd = bytes.length - 22
    while (eocd >= 0 && !(u32(eocd) == 0x06054b50L &&
        eocd + 22 + u16(eocd + 20) == bytes.length)) eocd -= 1
    require(eocd >= 0, "no ZIP end-of-central-directory")
    val count = u16(eocd + 10)
    val cdSize = u32(eocd + 12)
    val cdOff = u32(eocd + 16)
    require(cdOff + cdSize <= eocd, "central directory past EOCD")
    val out = Seq.newBuilder[(String, Array[Byte])]
    var p = cdOff.toInt
    var total = 0L
    var i = 0
    while (i < count) {
      require(u32(p) == 0x02014b50L, "bad central directory signature")
      val method = u16(p + 10)
      val crcWant = u32(p + 16)
      val csize = u32(p + 20)
      val usize = u32(p + 24)
      val nameLen = u16(p + 28)
      val extraLen = u16(p + 30)
      val commentLen = u16(p + 32)
      val lho = u32(p + 42)
      require(p + 46 + nameLen <= bytes.length, "truncated directory entry")
      val name = new String(bytes, p + 46, nameLen, "US-ASCII")
      require(method == 0 || method == 8, s"unsupported ZIP method $method")
      total += usize
      budgetCheck(total <= MaxTarBytes, "ZIP archive over extraction cap")
      // local header: its own name/extra lengths govern the data offset
      require(u32(lho.toInt) == 0x04034b50L, "bad local header signature")
      val dataOff = lho + 30 + u16(lho.toInt + 26) + u16(lho.toInt + 28)
      require(dataOff + csize <= bytes.length, "truncated member data")
      val packed = java.util.Arrays.copyOfRange(
        bytes, dataOff.toInt, (dataOff + csize).toInt)
      val data =
        if (method == 0) {
          require(csize == usize, "stored entry size mismatch")
          packed
        } else {
          val inf = new java.util.zip.Inflater(true) // raw deflate
          inf.setInput(packed)
          val outBuf = new Array[Byte](usize.toInt)
          try {
            var n = 0
            var k = -1
            while (k != 0 && !inf.finished() && n < outBuf.length) {
              k = inf.inflate(outBuf, n, outBuf.length - n)
              n += k
            }
            if (!inf.finished()) {
              // consume the stream terminator (empty members hit this
              // immediately); any byte beyond the declared size rejects
              val scratch = new Array[Byte](1)
              require(inf.inflate(scratch) == 0 && inf.finished(),
                "deflate stream continues past the declared size")
            }
            require(n == outBuf.length,
              s"deflate stream inflated to $n bytes, want ${outBuf.length}")
          } catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(s"corrupt entry: ${e.getMessage}")
          } finally inf.end()
          outBuf
        }
      val crc = new java.util.zip.CRC32
      crc.update(data)
      require(crc.getValue == crcWant,
        s"ZIP CRC mismatch for '$name'")
      if (!name.endsWith("/")) out += ((name, data)) // directories skipped
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.result()
  }

  // --- archive dispatch ----------------------------------------------------

  /** Magic sniff over the container formats the ingest lanes speak:
    * gzip (1f 8b), ZIP (PK\3\4 local header or PK\5\6 empty archive),
    * POSIX ustar ("ustar" at offset 257). Metadata is never trusted —
    * real corpora mislabel bundles constantly. */
  def sniffArchive(p: Array[Byte]): Option[String] =
    if (p.length >= 2 && (p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b)
      Some("gzip")
    else if (p.length >= 4 && p(0) == 'P' && p(1) == 'K' &&
      ((p(2) == 3 && p(3) == 4) || (p(2) == 5 && p(3) == 6)))
      Some("zip")
    else if (p.length >= 512 && new String(p, 257, 5, "US-ASCII") == "ustar")
      Some("tar")
    else None

  /** Magic-sniffed single-level extraction — the dispatch the batch and
    * streaming ingest lanes share: gzip → gunzip then ustar walk; PK →
    * ZIP walk; ustar magic → ustar walk; anything else rejects. */
  def archiveExtract(p: Array[Byte]): Seq[(String, Array[Byte])] =
    sniffArchive(p) match {
      case Some("gzip") => tarExtract(gzipDecode(p))
      case Some("zip")  => zipExtract(p)
      case Some("tar")  => tarExtract(p)
      case _ => throw new IllegalArgumentException("unrecognized archive magic")
    }

  /** ONE-LEVEL nested extraction under one global byte budget — the real
    * corpus shape where a tar bundles an inner zip of documents. Members
    * that sniff as archives are extracted in place, their members named
    * `<outer>!<inner>`; nesting never recurses past one level (an archive
    * inside the inner archive stays an opaque member). The budget spans
    * ALL extracted bytes across levels, checked as members are charged —
    * a bundle whose recursive expansion exceeds it (the zip-bomb shape)
    * rejects with [[ArchiveBudgetException]] rather than an OOM (each
    * single walk additionally pre-checks DECLARED sizes against its own
    * cap before allocating, so a lying header never allocates at all).
    * A member that sniffs as an archive but fails to parse stays opaque
    * — magic bytes occur in ordinary content — while budget violations
    * reject the whole bundle. */
  def archiveExtractNested(p: Array[Byte],
                           budget: Long = MaxTarBytes): Seq[(String, Array[Byte])] = {
    var used = 0L
    def charge(n: Long): Unit = {
      used += n
      budgetCheck(used <= budget, s"nested extraction over $budget-byte budget")
    }
    val top = archiveExtract(p)
    top.foreach { case (_, d) => charge(d.length.toLong) }
    top.flatMap { case (name, data) =>
      if (sniffArchive(data).isEmpty) Seq((name, data))
      else {
        val inner =
          try Some(archiveExtract(data))
          catch {
            case b: ArchiveBudgetException => throw b
            case _: IllegalArgumentException => None
          }
        inner match {
          case None => Seq((name, data))
          case Some(ms) =>
            ms.foreach { case (_, d) => charge(d.length.toLong) }
            ms.map { case (n2, d2) => (s"$name!$n2", d2) }
        }
      }
    }
  }

  // --- GIF (LZW) -----------------------------------------------------------

  /** GIF four-pass interlace: (first row, row step) per pass. */
  private val GifInterlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  /** The raster-row storage order of a GIF: identity when progressive,
    * the four-pass interleave when interlaced. */
  private def gifRowOrder(h: Int, interlaced: Boolean): Array[Int] =
    if (!interlaced) Array.range(0, h)
    else GifInterlacePasses.flatMap { case (start, step) =>
      Iterator.range(start, h, step)
    }

  /** GIF-LZW compress palette `indices` (0..255) at min code size 8: real
    * dictionary compression — 9-bit codes growing to 12 as the table
    * fills, CLEAR + reset when it reaches 4096 entries (the mainstream
    * encoder discipline), closed by END-OF-INFORMATION, packed LSB-first
    * (GIF89a specification, appendix F). */
  private def gifLzwCompress(indices: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val Clear = 256; val Eoi = 257
    var codeWidth = 9
    var nextCode = 258
    val dict = new java.util.HashMap[Integer, Integer](8192)
    var bitBuf = 0L; var nBits = 0
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << nBits; nBits += codeWidth
      while (nBits >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBits -= 8
      }
    }
    emit(Clear)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val s = indices(i)
      require(s >= 0 && s < 256, s"palette index $s out of range")
      if (prefix < 0) prefix = s
      else {
        val key = Integer.valueOf((prefix << 8) | s)
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue
        else {
          emit(prefix)
          if (nextCode == 4096) { // table full: reset, decoders defer-clear
            emit(Clear)
            dict.clear(); codeWidth = 9; nextCode = 258
          } else {
            dict.put(key, Integer.valueOf(nextCode))
            // the just-assigned code must fit the width of later emits
            if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
            nextCode += 1
          }
          prefix = s
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(Eoi)
    if (nBits > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-LZW decompress the concatenated sub-block payload into exactly
    * `n` palette indices. Real decoder: honors any min code size 2..8 (so
    * third-party writers' small-palette streams decode), grows code width
    * with the table, handles the KwKwK self-reference, defers clearing
    * when the table fills, and bounds output at `n` — every corrupt shape
    * rejects with IllegalArgumentException before any wild write. */
  private def gifLzwDecompress(data: Array[Byte], minCodeSize: Int,
                               n: Int): Array[Int] = {
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"bad LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Int](n)
    var outPos = 0
    val prefixOf = new Array[Int](4096)
    val suffixOf = new Array[Int](4096)
    val stack = new Array[Int](4096)
    var codeWidth = minCodeSize + 1
    var nextCode = eoi + 1
    var prev = -1
    var acc = 0; var accBits = 0; var pos = 0
    def readCode(): Int = {
      while (accBits < codeWidth) {
        require(pos < data.length, "truncated LZW stream")
        acc |= (data(pos) & 0xff) << accBits
        pos += 1; accBits += 8
      }
      val v = acc & ((1 << codeWidth) - 1)
      acc >>>= codeWidth; accBits -= codeWidth
      v
    }
    var code = readCode()
    while (code != eoi) {
      if (code == clear) {
        codeWidth = minCodeSize + 1; nextCode = eoi + 1; prev = -1
      } else if (prev < 0) {
        require(code < clear, s"LZW stream starts with phrase code $code")
        require(outPos < n, "LZW output past raster")
        out(outPos) = code; outPos += 1
        prev = code
      } else {
        val isKwK = code == nextCode && nextCode < 4096
        require(isKwK || (code < nextCode && code != clear && code != eoi),
          s"LZW code $code out of range")
        // expand the phrase (for KwKwK: prev's phrase + its own first char)
        var depth = 0
        var c = if (isKwK) prev else code
        while (c > eoi) { stack(depth) = suffixOf(c); depth += 1; c = prefixOf(c) }
        require(c < clear, "corrupt LZW chain")
        val first = c
        val len = depth + 1 + (if (isKwK) 1 else 0)
        require(outPos + len <= n, "LZW output past raster")
        out(outPos) = first; outPos += 1
        while (depth > 0) { depth -= 1; out(outPos) = stack(depth); outPos += 1 }
        if (isKwK) { out(outPos) = first; outPos += 1 }
        if (nextCode < 4096) { // table full → deferred clear: stop adding
          prefixOf(nextCode) = prev; suffixOf(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
      code = readCode()
    }
    require(outPos == n, s"LZW decoded $outPos of $n pixels")
    out
  }

  /** Encode a grayscale image (one 0..255 value per pixel) as a real
    * single-frame GIF: 256-entry identity grayscale GLOBAL color table and
    * real LZW compression. `interlaced` stores rows in the four-pass
    * order; `gce` writes the GIF89a graphic-control extension most
    * mainstream writers emit (and bumps the version string to 89a). */
  def gifEncode(width: Int, height: Int, gray: Array[Int],
                interlaced: Boolean = false, gce: Boolean = false): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xffff && height <= 0xffff,
      s"unsupported dimensions ${width}x$height")
    require(gray.length == width * height, "gray length mismatch")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write((if (gce) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xF7) // global color table, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // square pixel aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    if (gce) {
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0) // no disposal method, no transparency
      u16(0)       // zero delay
      out.write(0) // transparent index (unused)
      out.write(0) // block terminator
    }
    gifWriteImage(out, width, height, gray, interlaced)
    out.write(0x3B)
    out.toByteArray
  }

  /** Image descriptor + LZW data stream for one full-raster frame. */
  private def gifWriteImage(out: java.io.ByteArrayOutputStream, width: Int,
                            height: Int, gray: Array[Int],
                            interlaced: Boolean): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    val rows = gifRowOrder(height, interlaced)
    val seq = new Array[Int](width * height)
    var o = 0
    for (r <- rows) {
      var x = 0
      while (x < width) { seq(o) = gray(r * width + x); o += 1; x += 1 }
    }
    val lzw = gifLzwCompress(seq)
    out.write(0x2C)
    u16(0); u16(0); u16(width); u16(height)
    out.write(if (interlaced) 0x40 else 0x00) // no local color table
    out.write(8) // LZW min code size
    var off = 0
    while (off < lzw.length) {
      val nb = math.min(255, lzw.length - off)
      out.write(nb); out.write(lzw, off, nb); off += nb
    }
    out.write(0) // data sub-block terminator
  }

  /** Encode a multi-frame (animated) GIF89a — a REAL well-formed variant
    * the still-image decoder deliberately rejects (the [[bmpEncode32]] /
    * [[wavEncode24]] discipline): NETSCAPE2.0 looping application
    * extension, then a graphic-control block + image descriptor + LZW
    * stream per frame. */
  def gifEncodeAnimated(width: Int, height: Int,
                        frames: Seq[Array[Int]]): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xffff && height <= 0xffff,
      s"unsupported dimensions ${width}x$height")
    require(frames.nonEmpty, "no frames")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xF7); out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x21); out.write(0xFF); out.write(11) // application extension
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16(0) // loop forever
    out.write(0)
    for (f <- frames) {
      require(f.length == width * height, "gray length mismatch")
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0); u16(4); out.write(0); out.write(0) // 40 ms delay
      gifWriteImage(out, width, height, f, interlaced = false)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Decode a single-frame GIF87a/89a: logical-screen parse, global or
    * local color table, extension-block walk (skipped, as a still-image
    * pipeline does), LZW decompression, four-pass de-interlace, palette →
    * top-down RGB. Geometry caps apply BEFORE any allocation. Animated
    * (second image descriptor), sub-raster frames, and malformed streams
    * reject with the documented IllegalArgumentException. */
  def gifDecode(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= 14, "truncated GIF header")
    require(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') &&
      bytes(5) == 'a', "not a GIF")
    def u16(p: Int): Int = {
      require(p + 2 <= bytes.length, "truncated GIF")
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    }
    val sw = u16(6); val sh = u16(8)
    val packed = bytes(10) & 0xff
    // dims are u16 so MaxDim holds by construction; pixel COUNT is the cap
    // that matters before the index/rgb allocations (compressed container)
    require(sw >= 1 && sh >= 1 && sw.toLong * sh <= MaxPixels,
      s"unsupported dimensions ${sw}x$sh")
    var pos = 13
    var palOff = -1; var palSize = 0
    if ((packed & 0x80) != 0) {
      palSize = 2 << (packed & 7)
      palOff = pos
      pos += 3 * palSize
      require(pos <= bytes.length, "truncated global color table")
    }
    var idx: Array[Int] = null
    var interlaced = false
    var framePalOff = palOff; var framePalSize = palSize
    var done = false
    while (!done) {
      require(pos < bytes.length, "truncated GIF stream")
      val block = bytes(pos) & 0xff; pos += 1
      block match {
        case 0x3B => done = true
        case 0x21 => // extension: label byte, then length-prefixed sub-blocks
          require(pos < bytes.length, "truncated extension")
          pos += 1
          var l = 0
          while ({
            require(pos < bytes.length, "truncated extension")
            l = bytes(pos) & 0xff; pos += 1
            l != 0
          }) {
            pos += l
            require(pos <= bytes.length, "truncated extension")
          }
        case 0x2C =>
          require(idx == null, "multi-image GIF unsupported")
          val left = u16(pos); val top = u16(pos + 2)
          val iw = u16(pos + 4); val ih = u16(pos + 6)
          require(pos + 9 <= bytes.length, "truncated image descriptor")
          val ip = bytes(pos + 8) & 0xff
          pos += 9
          require(left == 0 && top == 0 && iw == sw && ih == sh,
            s"sub-raster frame ${iw}x$ih@$left,$top unsupported")
          interlaced = (ip & 0x40) != 0
          if ((ip & 0x80) != 0) { // local color table overrides global
            framePalSize = 2 << (ip & 7)
            framePalOff = pos
            pos += 3 * framePalSize
            require(pos <= bytes.length, "truncated local color table")
          } else { framePalOff = palOff; framePalSize = palSize }
          require(framePalOff >= 0, "GIF with no color table")
          require(pos < bytes.length, "truncated LZW header")
          val mcs = bytes(pos) & 0xff; pos += 1
          val dataBuf = new java.io.ByteArrayOutputStream()
          var l = 0
          while ({
            require(pos < bytes.length, "truncated image data")
            l = bytes(pos) & 0xff; pos += 1
            l != 0
          }) {
            require(pos + l <= bytes.length, "truncated image data")
            dataBuf.write(bytes, pos, l); pos += l
          }
          idx = gifLzwDecompress(dataBuf.toByteArray, mcs, sw * sh)
        case other =>
          throw new IllegalArgumentException(s"unknown GIF block $other")
      }
    }
    require(idx != null, "GIF with no image")
    val order = gifRowOrder(sh, interlaced)
    val rgb = new Array[Int](sw * sh * 3)
    var r = 0
    while (r < sh) {
      val destRow = order(r)
      var x = 0
      while (x < sw) {
        val pi = idx(r * sw + x)
        require(pi < framePalSize, s"palette index $pi out of range")
        val p = framePalOff + 3 * pi // GIF palettes are R,G,B
        val o = (destRow * sw + x) * 3
        rgb(o) = bytes(p) & 0xff
        rgb(o + 1) = bytes(p + 1) & 0xff
        rgb(o + 2) = bytes(p + 2) & 0xff
        x += 1
      }
      r += 1
    }
    BmpImage(sw, sh, rgb)
  }

  // --- FLAC (RFC 9639 subset: 16-bit, CONSTANT/VERBATIM/FIXED, Rice) -------

  /** Decoded-sample cap for FLAC: header-declared totals are attacker-
    * controlled, so bound `totalSamples × channels` before any allocation
    * (the MaxPixels discipline for audio). 2^23 samples = 16 MiB PCM. */
  private val MaxFlacSamples = 1L << 23

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — the FLAC frame-header
    * checksum. Bitwise, MSB-first; headers are tens of bytes, so no table. */
  private[graft] def flacCrc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; b += 1 }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — the FLAC whole-
    * frame checksum. */
  private[graft] def flacCrc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff; b += 1 }
      i += 1
    }
    crc
  }

  /** Plain MSB-first bit writer (no byte stuffing — FLAC is not JPEG). */
  private final class FlacBitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(bits: Long, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    /** Unary per FLAC: q zero bits then a one bit. */
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def alignZero(): Unit = if (n > 0) put(0, 8 - n)
    def bytes: Array[Byte] = { alignZero(); out.toByteArray }
  }

  /** Plain MSB-first bit reader with truncation checks. */
  private final class FlacBitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "truncated FLAC bitstream")
        acc = bytes(pos) & 0xff; pos += 1; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def readBits(len: Int): Long = {
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(len: Int): Int = {
      val v = readBits(len)
      (if ((v & (1L << (len - 1))) != 0) v - (1L << len) else v).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) { q += 1; require(q <= (1 << 20), "runaway unary") }
      q
    }
    def align(): Unit = n = 0
  }

  /** Stereo decorrelation modes for [[flacEncode]]. */
  val FlacIndependent = 0
  val FlacLeftSide = 1
  val FlacRightSide = 2
  val FlacMidSide = 3

  /** Encode 16-bit PCM as a FLAC stream: STREAMINFO (with the PCM MD5) +
    * fixed-blocksize frames. Per block and channel the encoder picks the
    * cheapest of CONSTANT, FIXED order 0–2, quantized LPC (orders 2/4/8
    * fit by autocorrelation + Levinson–Durbin, [[flacLpcAnalyze]]) and
    * VERBATIM, with Rice-coded residuals (partition order 0, raw escape
    * when smaller) — a real working set of the public spec that a
    * pure-JVM decoder can check end-to-end (CRC-8, CRC-16, MD5).
    * `stereoMode` exercises the left/side / right/side / mid/side
    * decorrelation paths (2ch only). */
  def flacEncode(sampleRate: Int, samples: Array[Short], channels: Int = 1,
                 blockSize: Int = 4096, stereoMode: Int = FlacIndependent): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"unsupported channels $channels")
    require(samples.length % channels == 0, "ragged channel interleave")
    require(blockSize >= 16 && blockSize <= 65535, s"bad blockSize $blockSize")
    require(stereoMode == FlacIndependent || channels == 2,
      "stereo decorrelation needs exactly 2 channels")
    val nPerCh = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO: last-block flag set (no other metadata), type 0, len 34
    val si = new FlacBitWriter
    si.put(blockSize, 16); si.put(blockSize, 16) // min/max block size
    si.put(0, 24); si.put(0, 24)                 // min/max frame size unknown
    si.put(sampleRate, 20)
    si.put(channels - 1, 3)
    si.put(15, 5)                                // bits per sample − 1
    si.put(nPerCh, 36)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(pcm.putShort)
    md5.update(pcm.array())
    val siBytes = si.bytes ++ md5.digest()
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(siBytes, 0, siBytes.length)
    var frame = 0
    var off = 0
    while (off < nPerCh) { // an empty stream has STREAMINFO and no frames
      val bs = math.min(blockSize, nPerCh - off)
      out.write(flacFrame(frame, bs, sampleRate, channels, stereoMode,
        samples, off))
      off += bs
      frame += 1
    }
    out.toByteArray
  }

  /** One FLAC frame: header (explicit 16-bit blocksize, rate from
    * STREAMINFO, CRC-8) + one subframe per channel + padding + CRC-16. */
  private def flacFrame(frameIdx: Int, bs: Int, rate: Int, channels: Int,
                        stereoMode: Int, samples: Array[Short], off: Int): Array[Byte] = {
    val w = new FlacBitWriter
    w.put(0x3ffe, 14) // sync
    w.put(0, 1)       // reserved
    w.put(0, 1)       // fixed-blocksize stream, frame number coded
    w.put(7, 4)       // blocksize: 16-bit value − 1 follows header
    w.put(0, 4)       // sample rate: from STREAMINFO
    val chanAssign = stereoMode match {
      case FlacIndependent => channels - 1
      case FlacLeftSide => 8
      case FlacRightSide => 9
      case FlacMidSide => 10
    }
    w.put(chanAssign, 4)
    w.put(4, 3)       // sample size: 16-bit
    w.put(0, 1)       // reserved
    // UTF-8-style coded frame number
    flacPutCodedNumber(w, frameIdx.toLong)
    w.put(bs - 1, 16)
    val headBytes = w.bytes // aligned by construction
    val w2 = new FlacBitWriter
    w2.out.write(headBytes, 0, headBytes.length)
    w2.put(flacCrc8(headBytes, 0, headBytes.length), 8)
    // per-channel planes under the chosen decorrelation
    val planes: Seq[(Array[Int], Int)] = stereoMode match {
      case FlacIndependent =>
        (0 until channels).map { c =>
          (Array.tabulate(bs)(i => samples(off * channels + i * channels + c).toInt), 16)
        }
      case _ =>
        val l = Array.tabulate(bs)(i => samples(off * 2 + i * 2).toInt)
        val r = Array.tabulate(bs)(i => samples(off * 2 + i * 2 + 1).toInt)
        val side = Array.tabulate(bs)(i => l(i) - r(i))
        stereoMode match {
          case FlacLeftSide  => Seq((l, 16), (side, 17))
          case FlacRightSide => Seq((side, 17), (r, 16))
          case FlacMidSide   =>
            val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
            Seq((mid, 16), (side, 17))
        }
    }
    planes.foreach { case (plane, bps) => flacSubframe(w2, plane, bps) }
    w2.alignZero()
    val body = w2.out.toByteArray
    val w3 = new java.io.ByteArrayOutputStream()
    w3.write(body, 0, body.length)
    val c16 = flacCrc16(body, 0, body.length)
    w3.write((c16 >> 8) & 0xff); w3.write(c16 & 0xff)
    w3.toByteArray
  }

  /** FLAC UTF-8-style coded number: ≤ 36-bit value in 1–7 bytes. */
  private def flacPutCodedNumber(w: FlacBitWriter, v: Long): Unit = {
    if (v < 0x80) { w.put(v, 8); return }
    var nBytes = 2
    while (nBytes < 7 && v >= (1L << (nBytes match {
      case 2 => 11; case 3 => 16; case 4 => 21; case 5 => 26; case 6 => 31
    }))) nBytes += 1
    val payloadBitsFirst = 8 - nBytes - 1 // 0 when nBytes == 7
    val contBits = 6 * (nBytes - 1)
    // header byte: nBytes ones, a zero, top payload bits
    w.put((0xff << (8 - nBytes)) & 0xff | ((v >> contBits) & ((1 << payloadBitsFirst) - 1)).toInt, 8)
    var i = nBytes - 2
    while (i >= 0) {
      w.put(0x80L | ((v >> (6 * i)) & 0x3f), 8)
      i -= 1
    }
  }

  private def flacReadCodedNumber(br: FlacBitReader): Long = {
    val first = br.readBits(8).toInt
    if ((first & 0x80) == 0) return first.toLong
    var nBytes = 0
    var mask = 0x80
    while (nBytes < 8 && (first & mask) != 0) { nBytes += 1; mask >>= 1 }
    require(nBytes >= 2 && nBytes <= 7, f"bad coded-number lead byte $first%02x")
    var v: Long = first & (0x7f >> nBytes)
    var i = 1
    while (i < nBytes) {
      val c = br.readBits(8).toInt
      require((c & 0xc0) == 0x80, f"bad coded-number continuation $c%02x")
      v = (v << 6) | (c & 0x3f)
      i += 1
    }
    v
  }

  /** Quantized-coefficient precision the encoder's LPC path uses. */
  private val FlacLpcPrec = 12

  /** Rice-or-escape residual body (method 00, partition order 0). */
  private def flacWriteResidual(w: FlacBitWriter, res: Array[Int], k: Int,
                                escape: Int): Unit = {
    w.put(0, 2) // residual method: 4-bit Rice
    w.put(0, 4) // partition order 0
    if (escape >= 0) {
      w.put(0xf, 4)       // escape
      w.put(escape, 5)    // raw bit width
      res.foreach(v => w.put(v.toLong & ((1L << escape) - 1), escape))
    } else {
      w.put(k, 4)
      res.foreach { v =>
        val u = (v << 1) ^ (v >> 31)
        w.putUnary(u >>> k)
        if (k > 0) w.put(u.toLong & ((1L << k) - 1), k)
      }
    }
  }

  /** Encode one subframe: cheapest of CONSTANT / FIXED 0–2 / LPC (orders
    * 2, 4, 8 via Levinson–Durbin) / VERBATIM. */
  private def flacSubframe(w: FlacBitWriter, s: Array[Int], bps: Int): Unit = {
    val bs = s.length
    if (bs > 0 && s.forall(_ == s(0))) {
      w.put(0, 1); w.put(0, 6); w.put(0, 1) // CONSTANT, no wasted bits
      w.put(s(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    case class Cand(tpe: Int, order: Int, res: Array[Int], k: Int, bits: Long,
                    escape: Int, coefs: Array[Int] = null, shift: Int = 0)
    val fixed = (0 to 2).filter(_ <= bs - 1).map { o =>
      val res = flacFixedResidual(s, o)
      val (k, esc, bits) = flacBestRice(res)
      Cand(0, o, res, k, bits + o.toLong * bps, esc)
    }
    val lpc = if (bs < 32) Nil else Seq(2, 4, 8).filter(_ * 2 < bs).flatMap { o =>
      flacLpcAnalyze(s, o, FlacLpcPrec).map { case (coefs, shift) =>
        val res = new Array[Int](bs - o)
        var i = o
        while (i < bs) {
          res(i - o) = (s(i).toLong - flacLpcPredict(s, i, coefs, shift)).toInt
          i += 1
        }
        val (k, esc, bits) = flacBestRice(res)
        Cand(1, o, res, k,
          bits + o.toLong * bps + 4 + 5 + o.toLong * FlacLpcPrec, esc,
          coefs, shift)
      }
    }
    val best = (fixed ++ lpc).minBy(_.bits)
    val verbatimBits = bs.toLong * bps
    if (best.bits >= verbatimBits) {
      w.put(0, 1); w.put(1, 6); w.put(0, 1) // VERBATIM
      s.foreach(v => w.put(v.toLong & ((1L << bps) - 1), bps))
    } else {
      val typeBits = if (best.tpe == 0) 8 | best.order else 0x20 | (best.order - 1)
      w.put(0, 1); w.put(typeBits, 6); w.put(0, 1)
      var i = 0
      while (i < best.order) { w.put(s(i).toLong & ((1L << bps) - 1), bps); i += 1 }
      if (best.tpe == 1) {
        w.put(FlacLpcPrec - 1, 4)
        w.put(best.shift, 5)
        best.coefs.foreach(c =>
          w.put(c.toLong & ((1L << FlacLpcPrec) - 1), FlacLpcPrec))
      }
      flacWriteResidual(w, best.res, best.k, best.escape)
    }
  }

  /** Residual of the order-o fixed predictor (o ∈ 0..4). */
  private[graft] def flacFixedResidual(s: Array[Int], o: Int): Array[Int] = {
    val n = s.length - o
    val res = new Array[Int](n)
    var i = 0
    while (i < n) {
      val j = i + o
      res(i) = o match {
        case 0 => s(j)
        case 1 => s(j) - s(j - 1)
        case 2 => s(j) - 2 * s(j - 1) + s(j - 2)
        case 3 => s(j) - 3 * s(j - 1) + 3 * s(j - 2) - s(j - 3)
        case 4 => s(j) - 4 * s(j - 1) + 6 * s(j - 2) - 4 * s(j - 3) + s(j - 4)
      }
      i += 1
    }
    res
  }

  /** Best 4-bit Rice parameter (or raw escape) for a residual array:
    * returns (k, escapeWidth or −1, totalBits). */
  private def flacBestRice(res: Array[Int]): (Int, Int, Long) = {
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var bits = 0L
      var i = 0
      while (i < res.length) {
        val u = (res(i) << 1) ^ (res(i) >> 31)
        bits += (u >>> k) + 1 + k
        i += 1
      }
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    // raw escape: enough bits for the widest residual, signed
    var width = 1
    res.foreach { v =>
      val need = 33 - Integer.numberOfLeadingZeros(if (v < 0) ~v else v)
      if (need > width) width = need
    }
    // the escape pays 5 extra header bits (raw width) over the Rice branch
    val escBits = res.length.toLong * width + 5
    if (escBits < bestBits) (0, width, escBits) else (bestK, -1, bestBits)
  }

  /** Decode a FLAC stream: CONSTANT / VERBATIM / FIXED 0–4 / LPC (any
    * order 1–32, any precision/shift) subframes, general Rice partitions
    * (methods 00/01, escapes), wasted bits, and all four channel
    * assignments for 16-bit streams. Verifies the frame-header CRC-8,
    * the whole-frame CRC-16, the STREAMINFO sample total, and the PCM
    * MD5 when set. Throws IllegalArgumentException on geometry bombs
    * (before allocation), bad sync, or any checksum mismatch. */
  def flacDecode(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 42 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "not a FLAC stream")
    var pos = 4
    var sampleRate = 0
    var channels = 0
    var totalSamples = 0L
    var md5Expected: Array[Byte] = null
    var minBlock = 0
    var sawStreamInfo = false
    var last = false
    while (!last) {
      require(pos + 4 <= bytes.length, "truncated metadata header")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      pos += 4
      require(pos + len <= bytes.length, "truncated metadata block")
      if (btype == 0) {
        require(!sawStreamInfo, "duplicate STREAMINFO")
        require(len == 34, s"bad STREAMINFO length $len")
        val br = new FlacBitReader(bytes, pos)
        minBlock = br.readBits(16).toInt
        br.readBits(16); br.readBits(24); br.readBits(24)
        sampleRate = br.readBits(20).toInt
        channels = br.readBits(3).toInt + 1
        val bps = br.readBits(5).toInt + 1
        require(bps == 16, s"unsupported bits-per-sample $bps (16-bit subset)")
        totalSamples = br.readBits(36)
        md5Expected = java.util.Arrays.copyOfRange(bytes, pos + 18, pos + 34)
        sawStreamInfo = true
      } else require(sawStreamInfo, "first metadata block must be STREAMINFO")
      pos += len
    }
    require(sawStreamInfo, "missing STREAMINFO")
    require(sampleRate > 0, "bad sample rate")
    require(minBlock >= 16, s"bad block size $minBlock")
    require(totalSamples * channels <= MaxFlacSamples,
      s"unsupported stream: ${totalSamples}×$channels samples")
    val out = new java.util.ArrayList[Array[Int]]()
    var decoded = 0L
    var expectFrame = 0L
    while (pos < bytes.length && (totalSamples == 0 || decoded < totalSamples)) {
      val frameStart = pos
      val br = new FlacBitReader(bytes, pos)
      require(br.readBits(14) == 0x3ffe, "bad frame sync")
      require(br.readBits(1) == 0, "reserved bit set")
      val variable = br.readBits(1) == 1
      val bsCode = br.readBits(4).toInt
      val srCode = br.readBits(4).toInt
      val chanAssign = br.readBits(4).toInt
      val ssCode = br.readBits(3).toInt
      require(br.readBits(1) == 0, "reserved bit set")
      require(ssCode == 0 || ssCode == 4, s"sample-size code $ssCode ≠ 16-bit")
      val coded = flacReadCodedNumber(br)
      if (variable) require(coded == decoded, s"sample number $coded ≠ $decoded")
      else { require(coded == expectFrame, s"frame number $coded ≠ $expectFrame") }
      val bs = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.readBits(8).toInt + 1
        case 7 => br.readBits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException("reserved blocksize code")
      }
      srCode match {
        case 0 => // from STREAMINFO
        case c if c >= 1 && c <= 11 => // table rate; value irrelevant here
        case 12 => br.readBits(8)
        case 13 | 14 => br.readBits(16)
        case _ => throw new IllegalArgumentException("invalid sample-rate code")
      }
      val headerEnd = br.pos // byte-aligned: all header fields are whole bytes
      require(br.readBits(8).toInt == flacCrc8(bytes, frameStart, headerEnd),
        "frame header CRC-8 mismatch")
      require((decoded + bs) * channels <= MaxFlacSamples,
        "stream overruns the decoded-sample cap")
      val nCh = if (chanAssign <= 7) chanAssign + 1 else 2
      require(nCh == channels, s"frame channels $nCh ≠ STREAMINFO $channels")
      val planes = (0 until nCh).map { c =>
        val bps = chanAssign match {
          case 8 => if (c == 1) 17 else 16  // left/side
          case 9 => if (c == 0) 17 else 16  // side/right
          case 10 => if (c == 1) 17 else 16 // mid/side
          case _ => 16
        }
        flacReadSubframe(br, bs, bps)
      }
      br.align()
      val crcEnd = br.pos
      require(crcEnd + 2 <= bytes.length, "truncated at frame CRC-16")
      val c16 = ((bytes(crcEnd) & 0xff) << 8) | (bytes(crcEnd + 1) & 0xff)
      require(c16 == flacCrc16(bytes, frameStart, crcEnd), "frame CRC-16 mismatch")
      pos = crcEnd + 2
      // undo stereo decorrelation
      val chans: Seq[Array[Int]] = chanAssign match {
        case 8 => // left, side → left, left − side
          val l = planes(0); val s = planes(1)
          Seq(l, Array.tabulate(bs)(i => l(i) - s(i)))
        case 9 => // side, right → side + right, right
          val s = planes(0); val r = planes(1)
          Seq(Array.tabulate(bs)(i => s(i) + r(i)), r)
        case 10 => // mid, side
          val m = planes(0); val s = planes(1)
          val l = Array.tabulate(bs) { i =>
            val sum = (m(i) << 1) | (s(i) & 1)
            (sum + s(i)) >> 1
          }
          Seq(l, Array.tabulate(bs)(i => l(i) - s(i)))
        case _ => planes
      }
      val inter = new Array[Int](bs * channels)
      var i = 0
      while (i < bs) {
        var c = 0
        while (c < channels) {
          val v = chans(c)(i)
          require(v >= Short.MinValue && v <= Short.MaxValue, s"sample $v out of 16-bit range")
          inter(i * channels + c) = v
          c += 1
        }
        i += 1
      }
      out.add(inter)
      decoded += bs
      expectFrame += 1
    }
    require(totalSamples == 0 || decoded == totalSamples,
      s"decoded $decoded of $totalSamples samples")
    val all = new Array[Short]((decoded * channels).toInt)
    var w = 0
    out.forEach { fr => fr.foreach { v => all(w) = v.toShort; w += 1 } }
    if (md5Expected != null && md5Expected.exists(_ != 0)) {
      val md5 = java.security.MessageDigest.getInstance("MD5")
      val pcm = java.nio.ByteBuffer.allocate(all.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      all.foreach(pcm.putShort)
      md5.update(pcm.array())
      require(java.util.Arrays.equals(md5.digest(), md5Expected),
        "PCM MD5 mismatch")
    }
    WavAudio(sampleRate, all, channels)
  }

  /** One subframe: CONSTANT / VERBATIM / FIXED 0–4 with general Rice
    * partitions (methods 00/01, any partition order, escapes) and wasted
    * bits. LPC rejects — outside the published subset. */
  private def flacReadSubframe(br: FlacBitReader, bs: Int, bpsIn: Int): Array[Int] = {
    require(br.readBits(1) == 0, "subframe pad bit set")
    val t = br.readBits(6).toInt
    var wasted = 0
    if (br.readBits(1) == 1) {
      wasted = 1
      while (br.readBit() == 0) { wasted += 1; require(wasted < 32, "runaway wasted bits") }
    }
    val bps = bpsIn - wasted
    require(bps >= 1, "wasted bits exceed sample size")
    val s: Array[Int] =
      if (t == 0) { val v = br.readSigned(bps); Array.fill(bs)(v) }
      else if (t == 1) Array.fill(bs)(br.readSigned(bps))
      else if ((t & 0x38) == 0x08 && (t & 0x07) <= 4) {
        val order = t & 0x07
        require(order <= bs, s"FIXED order $order > blocksize $bs")
        val out = new Array[Int](bs)
        var i = 0
        while (i < order) { out(i) = br.readSigned(bps); i += 1 }
        flacReadResidual(br, bs, order, out)
        out
      } else if ((t & 0x20) != 0) {
        val order = (t & 0x1f) + 1
        require(order <= bs, s"LPC order $order > blocksize $bs")
        val out = new Array[Int](bs)
        var i = 0
        while (i < order) { out(i) = br.readSigned(bps); i += 1 }
        val prec = br.readBits(4).toInt + 1
        require(prec <= 15, "invalid LPC precision code (1111)")
        val shift = br.readSigned(5)
        require(shift >= 0, s"negative LPC shift $shift")
        val coefs = Array.fill(order)(br.readSigned(prec))
        flacReadResidualRaw(br, bs, order, out)
        var j = order
        while (j < bs) {
          val v = out(j).toLong + flacLpcPredict(out, j, coefs, shift)
          require(v >= Int.MinValue && v <= Int.MaxValue, "LPC reconstruction overflow")
          out(j) = v.toInt
          j += 1
        }
        out
      } else throw new IllegalArgumentException(f"reserved subframe type $t%02x")
    if (wasted > 0) { var i = 0; while (i < bs) { s(i) <<= wasted; i += 1 } }
    s
  }

  /** Rice residuals into out(order until bs) — reconstruction is the
    * caller's (fixed vs LPC predictor). */
  private def flacReadResidualRaw(br: FlacBitReader, bs: Int, order: Int,
                                  out: Array[Int]): Unit = {
    val method = br.readBits(2).toInt
    require(method <= 1, s"reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val pOrder = br.readBits(4).toInt
    val parts = 1 << pOrder
    require(bs % parts == 0 && bs / parts > order,
      s"bad partition order $pOrder for blocksize $bs, predictor order $order")
    var idx = order
    var p = 0
    while (p < parts) {
      val cnt = (bs >> pOrder) - (if (p == 0) order else 0)
      val param = br.readBits(pBits).toInt
      if (param == escape) {
        val width = br.readBits(5).toInt
        var i = 0
        while (i < cnt) {
          out(idx) = if (width == 0) 0 else br.readSigned(width)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.readUnary()
          val u = (q.toLong << param) | br.readBits(param)
          val v = ((u >>> 1) ^ -(u & 1L)).toInt
          out(idx) = v
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** Residuals + fixed-predictor reconstruction for orders 0–4. */
  private def flacReadResidual(br: FlacBitReader, bs: Int, order: Int,
                               out: Array[Int]): Unit = {
    flacReadResidualRaw(br, bs, order, out)
    var j = order
    while (j < bs) {
      out(j) = order match {
        case 0 => out(j)
        case 1 => out(j) + out(j - 1)
        case 2 => out(j) + 2 * out(j - 1) - out(j - 2)
        case 3 => out(j) + 3 * out(j - 1) - 3 * out(j - 2) + out(j - 3)
        case 4 => out(j) + 4 * out(j - 1) - 6 * out(j - 2) + 4 * out(j - 3) - out(j - 4)
      }
      j += 1
    }
  }

  /** Integer LPC prediction: (Σ coefs(j)·s(i−1−j)) >> shift, 64-bit sum. */
  private def flacLpcPredict(s: Array[Int], i: Int, coefs: Array[Int],
                             shift: Int): Long = {
    var acc = 0L
    var j = 0
    while (j < coefs.length) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
    acc >> shift
  }

  /** Quantized-LPC coefficients for a block via autocorrelation +
    * Levinson–Durbin, quantized to `prec`-bit signed at the largest shift
    * ≤ 14 that fits. None when the signal carries no usable correlation
    * structure (zero energy, unstable recursion, or all-zero quantized
    * coefficients). Public-textbook DSP; the shape every FLAC encoder
    * shares. */
  private[graft] def flacLpcAnalyze(s: Array[Int], order: Int,
                                    prec: Int): Option[(Array[Int], Int)] = {
    val n = s.length
    if (n < order * 2 || order < 1) return None
    val r = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var acc = 0.0
      var i = lag
      while (i < n) { acc += s(i).toDouble * s(i - lag); i += 1 }
      r(lag) = acc
      lag += 1
    }
    if (r(0) <= 0.0) return None
    val a = new Array[Double](order)
    var err = r(0)
    var m = 0
    while (m < order) {
      var acc = r(m + 1)
      var j = 0
      while (j < m) { acc -= a(j) * r(m - j); j += 1 }
      val k = acc / err
      if (k.isNaN || math.abs(k) >= 1.0) return None // unstable
      val old = a.clone()
      a(m) = k
      var i = 0
      while (i < m) { a(i) = old(i) - k * old(m - 1 - i); i += 1 }
      err *= (1 - k * k)
      if (err <= 0.0) return None
      m += 1
    }
    val cmax = a.map(math.abs).max
    if (cmax == 0.0) return None
    var shift = 14
    while (shift > 0 && cmax * (1L << shift) >= (1L << (prec - 1)) - 1) shift -= 1
    val q = a.map(c => math.round(c * (1L << shift)).toInt)
    if (q.forall(_ == 0)) None else Some((q, shift))
  }
}
