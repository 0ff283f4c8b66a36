package graft.extensions

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A media record: opaque binary payload + typed metadata. Real corpora
  * carry image/audio/video bytes here; the demonstration source derives the
  * payload from `documents.text` (UTF-8 bytes) so the DuckDB oracle can
  * verify the plumbing end-to-end. */
case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])

/** Decoded features per media record: payload size, content hash, and a
  * modality-dependent feature vector from the real decoder dispatch
  * (image: w, h, channel means; audio: n, rate, peak, mean |s|; other
  * payloads: length-derived fallback so unknown media still flows). */
case class MediaFeatures(media_id: Long, n_bytes: Long, content_hash: String,
                         feat: Array[Float])

/** Typed decode manifest per media record (gate row of
  * [[Multimodal.multimodalFeatures]]): `decode_ok` is false — and
  * `n_values` 0 — for REAL-but-unsupported container variants that the
  * decoder rejected and the pipeline routed to the fallback lane. */
case class MediaMeta(media_id: Long, mime: String, n_bytes: Long,
                     decode_ok: Boolean, n_values: Long)

/** Real decoded-image statistics — exact integer channel sums. */
case class ImageStats(media_id: Long, width: Int, height: Int, n_pixels: Long,
                      sum_r: Long, sum_g: Long, sum_b: Long)

/** Real decoded-audio statistics — exact integer peak / energy; stereo
  * counts interleaved values in `n_samples`. */
case class AudioStats(media_id: Long, n_samples: Long, sample_rate: Int,
                      channels: Int, peak: Long, energy: Long)

/** Decode → resize → re-encode → decode round-trip statistics. */
case class ResizeStats(media_id: Long, width: Int, height: Int,
                       thumb_w: Int, thumb_h: Int,
                       thumb_sum_r: Long, thumb_sum_g: Long, thumb_sum_b: Long)

/** Average-hash perceptual fingerprint of a decoded image. */
case class AhashRow(media_id: Long, n_pixels: Long, ahash: Long, n_ones: Int)

/** DCT perceptual-hash fingerprint of a decoded image. */
case class PhashRow(media_id: Long, width: Int, height: Int, phash: Long,
                    n_ones: Int)

/** Energy-envelope fingerprint of a decoded audio clip. */
case class AudioFpRow(media_id: Long, n_windows: Int, afp: Long, n_ones: Int)

/** Real decoded-video statistics — exact integer channel sums across all
  * frames; `n_pixels` counts pixels across frames. */
case class VideoStats(media_id: Long, width: Int, height: Int, n_frames: Int,
                      us_per_frame: Int, n_pixels: Long,
                      sum_r: Long, sum_g: Long, sum_b: Long)

/** Joint A/V demux manifest: geometry + exact channel sums for the video
  * stream, sample count + peak + exact integer energy for the audio
  * track of the same container. */
case class AvStats(media_id: Long, width: Int, height: Int, n_frames: Int,
                   n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long,
                   n_samples: Long, sample_rate: Int, peak: Long, energy: Long)

/** Multimodal-column plumbing: binary payloads with typed metadata, a
  * partition-batched feature extractor over REAL pure-JVM codecs
  * ([[Codecs]]: 24-bit + RLE8 BMP, 8-bit RGB PNG, mono/stereo 8/16-bit
  * PCM WAV), reject→fallback routing for well-formed variants outside the
  * decoders' envelope, and deterministic frame sampling.
  *
  * The media lake is synthesized (this container ships no image/audio
  * files): each document row becomes a real BMP/PNG/WAV whose pixel/sample
  * values are a closed-form function of `doc_id` alone — so the DuckDB
  * oracle can recompute every decoded statistic WITHOUT a codec, and any
  * header/padding/row-order/filter-reconstruction bug in a codec breaks
  * the gate instead of hiding. The `mapPartitions` batching (the JVM
  * analog of a Pandas-UDF `mapInPandas` batch shape), per-record hashing,
  * and frame explode are the production dataflow shapes.
  */
object Multimodal {

  val BatchSize = 64
  val FrameChars = 16
  val SampleRate = 8000

  /** Demonstration media source: documents' text bytes as `binary` payload
    * (the frame-sampling / integrity queries run on the text domain so
    * their oracles can recompute chunk hashes). */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload")))

  /** Synthetic-image spec for doc `d`: width varies 5..16 so the BMP row
    * padding (rows pad to 4 bytes) exercises every phase; pixel byte `j`
    * (top-down row-major R,G,B) is `(d*31 + j*7) mod 256`. */
  def imageSpec(d: Long): BmpImage = {
    val w = 5 + (d % 12).toInt
    val h = 3 + (d % 7).toInt
    BmpImage(w, h, Array.tabulate(w * h * 3)(j => ((d * 31 + j.toLong * 7) % 256).toInt))
  }

  /** Synthetic-audio spec for doc `d`: `16 + d mod 50` mono samples,
    * sample `k` = `(d*13 + k*29) mod 4096 - 2048`. */
  def audioSpec(d: Long): WavAudio = {
    val n = 16 + (d % 50).toInt
    WavAudio(SampleRate,
      Array.tabulate(n)(k => (((d * 13 + k.toLong * 29) % 4096) - 2048).toShort))
  }

  /** 8-bit lattice variant of [[audioSpec]] (samples are ×256 so the
    * unsigned-8-bit container round-trips exactly):
    * sample `k` = `((d*13 + k*29) mod 256 - 128) * 256`. */
  def audioSpec8(d: Long): WavAudio = {
    val n = 16 + (d % 50).toInt
    WavAudio(SampleRate,
      Array.tabulate(n)(k => ((((d * 13 + k.toLong * 29) % 256) - 128) * 256).toShort))
  }

  /** Stereo variant of [[audioSpec]]: `2·(16 + d mod 50)` interleaved
    * values, value `j` following the same mono closed form. */
  def audioSpecStereo(d: Long): WavAudio = {
    val n = 2 * (16 + (d % 50).toInt)
    WavAudio(SampleRate,
      Array.tabulate(n)(j => (((d * 13 + j.toLong * 29) % 4096) - 2048).toShort),
      channels = 2)
  }

  /** Grayscale spec for the RLE8 image: same geometry as [[imageSpec]],
    * gray value `j` = `(d*17 + j*11) mod 256` — adjacent pixels always
    * differ, so the RLE8 size stays closed-form. */
  def graySpec(d: Long): (Int, Int, Array[Int]) = {
    val w = 5 + (d % 12).toInt
    val h = 3 + (d % 7).toInt
    (w, h, Array.tabulate(w * h)(j => ((d * 17 + j.toLong * 11) % 256).toInt))
  }

  /** Grayscale spec for the GIF image of doc `d`: geometry large enough
    * (up to 32×19) that the LZW code table passes 512 entries on the
    * bigger members — the 10-bit-code path runs inside the lake, not just
    * in unit tests. Gray value `j` = `(d*29 + j*17) mod 256`. */
  def gifSpec(d: Long): (Int, Int, Array[Int]) = {
    val w = 17 + (d % 16).toInt
    val h = 11 + (d % 9).toInt
    (w, h, Array.tabulate(w * h)(j => ((d * 29 + j.toLong * 17) % 256).toInt))
  }

  /** Synthetic-JPEG spec for doc `d`: geometry crosses both the 8-pixel
    * block and 16-pixel MCU boundaries (w 13..24, h 9..15 — partial edge
    * blocks in every combination), and every 8x8 block is FLAT with value
    * `(d*23 + 31*bx + 41*by) mod 256` on all three channels (bx, by = the
    * block coordinates). Flat blocks are the one family the LOSSY pipeline
    * reproduces bit-exactly — only the DC coefficient is nonzero, which
    * unit quantization and the float IDCT round-trip exactly, and equal
    * R=G=B puts chroma at neutral 128 — so the decoded pixels equal this
    * closed form and the DuckDB oracle can predict REAL entropy-decode +
    * IDCT output. (The AC / quantized path is differentially unit-tested
    * against the JDK's independent ImageIO decoder in CodecsSpec.) */
  def jpegSpec(d: Long): BmpImage = {
    val w = 13 + (d % 12).toInt
    val h = 9 + (d % 7).toInt
    BmpImage(w, h, Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      val bx = (p % w) / 8; val by = (p / w) / 8
      ((d * 23 + 31 * bx + 41 * by) % 256).toInt
    })
  }

  /** The JPEG lake: every doc as a baseline JFIF of [[jpegSpec]], container
    * variant keyed `doc_id mod 4` — 4:4:4, 4:2:0 with restart markers
    * every 2 MCUs, single-component grayscale, and 4:2:2 (the (2,1)
    * sampling shape). All variants decode to the SAME closed-form pixels,
    * so the oracle is variant-blind: agreement proves every encode/decode
    * path (both subsampling geometries + upsampling, DRI/RSTn resync,
    * single-component scan) reconstructs identical content. */
  def jpegLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            val payload = (d % 4) match {
              case 0 => Codecs.jpegEncode(jpegSpec(d), Codecs.JpegColor444)
              case 1 => Codecs.jpegEncode(jpegSpec(d), Codecs.JpegColor420,
                restartInterval = 2)
              case 2 => Codecs.jpegEncode(jpegSpec(d), Codecs.JpegGray)
              case _ => Codecs.jpegEncode(jpegSpec(d), Codecs.JpegColor422)
            }
            MediaRecord(d, "image/jpeg", payload)
          }
        }
      }
  }

  /** µ-law code spec for doc `d`: `16 + d mod 50` stored code bytes, code
    * `k` = `(d*7 + k*13) mod 256`. The codes are the on-the-wire bytes, so
    * the decoded sample is the G.711 closed-form expansion of each — a
    * pure integer function the DuckDB oracle replays without a codec. */
  def mulawSpec(d: Long): Array[Byte] = {
    val n = 16 + (d % 50).toInt
    Array.tabulate(n)(k => ((d * 7 + k.toLong * 13) % 256).toByte)
  }

  /** The µ-law lake: every doc as a real G.711 WAV (format tag 7, fact
    * chunk) of [[mulawSpec]] — the telephony-audio shape of the lake. */
  def mulawLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            MediaRecord(d, "audio/basic",
              Codecs.wavEncodeMulawCodes(SampleRate, mulawSpec(d)))
          }
        }
      }
  }

  /** FLAC sample lattice for doc `d`: `64 + (d mod 5)·192` 16-bit samples
    * in 128-sample blocks. Every third block (block mod 3 = 2) is CONSTANT
    * at `d mod 100`; the rest follow `((d·31 + k·17) mod 4001) − 2000` —
    * a pure integer closed form the DuckDB oracle replays sample-for-
    * sample (FLAC is lossless, so decode ≡ lattice exactly). The mix
    * forces the encoder through CONSTANT and FIXED subframes and a
    * partial final frame on most docs. */
  def flacSpec(d: Long): Array[Short] = {
    val n = 64 + (d % 5).toInt * 192
    Array.tabulate(n) { k =>
      if ((k / FlacLakeBlock) % 3 == 2) (d % 100).toShort
      else ((d * 31 + k.toLong * 17) % 4001 - 2000).toShort
    }
  }

  /** Block size for [[flacLake]] — small enough that every doc spans
    * multiple frames (frame-boundary coverage at lake scale). */
  val FlacLakeBlock = 128

  /** The FLAC lake: every doc as a real FLAC stream of [[flacSpec]] —
    * Rice-coded lossless audio with CRC-8/CRC-16/MD5 integrity, the
    * "modern lossless codec" lane next to the telephony µ-law one. */
  def flacLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            MediaRecord(d, "audio/flac",
              Codecs.flacEncode(SampleRate, flacSpec(d), 1, FlacLakeBlock))
          }
        }
      }
  }

  /** The GIF lake: every doc as a real single-frame GIF of [[gifSpec]],
    * container variant keyed `doc_id mod 4` — plain 87a, 89a with a
    * graphic-control extension (the block-skip path), 87a interlaced (the
    * four-pass row shuffle), and an ANIMATED two-frame 89a that the
    * still-image decoder must REJECT into the fallback lane (a well-formed
    * file outside the envelope, like the 32bpp BMPs). GIF is lossless, so
    * unlike JPEG the oracle needs no flat-block discipline — any pixel
    * function replays exactly. */
  def gifLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            val (w, h, gray) = gifSpec(d)
            val payload = (d % 4) match {
              case 0 => Codecs.gifEncode(w, h, gray)
              case 1 => Codecs.gifEncode(w, h, gray, gce = true)
              case 2 => Codecs.gifEncode(w, h, gray, interlaced = true)
              case _ =>
                val frame1 = gray.map(v => (v + 64) % 256)
                Codecs.gifEncodeAnimated(w, h, Seq(gray, frame1))
            }
            MediaRecord(d, "image/gif", payload)
          }
        }
      }
  }

  /** Video frame period: 25 fps. */
  val VideoUsPerFrame = 40000

  /** Frame `f` of video family `g` (optionally brightness-`shift`ed): the
    * [[jpegSpec]] flat-block discipline at the family's geometry — every
    * 8×8 block flat at
    * `(g·23 + (31 + 16·(g mod 11))·bx + (41 + 32·(g mod 5))·by + 97·f
    *   + shift) mod 256`
    * on all three channels. Flat blocks survive the LOSSY encode→decode
    * bit-exactly (only DC nonzero, chroma neutral), so decoded frames
    * equal this closed form and the DuckDB oracle can predict real
    * container-walk + entropy-decode + IDCT output per (family, frame,
    * block).
    *
    * The block GRADIENT (the bx/by coefficients) is family-keyed, not just
    * the offset: an additive-only family difference would make every
    * same-geometry family a brightness clone of ~60% of the others, and a
    * brightness-INVARIANT perceptual hash would then correctly pair them
    * all — quadratic TRUE near-dup growth planted by the generator
    * (measured: 364k pairs at sf0.1 before the gradient key, ~7k after).
    * Sibling classes are meant to be planted per family (re-encode /
    * brightness / trim variants), not across the whole lake. */
  def videoFrameSpec(g: Long, f: Int, shift: Int = 0): BmpImage = {
    val w = 13 + (g % 12).toInt
    val h = 9 + (g % 7).toInt
    val cx = 31 + 16 * (g % 11); val cy = 41 + 32 * (g % 5)
    BmpImage(w, h, Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      val bx = (p % w) / 8; val by = (p / w) / 8
      ((g * 23 + cx * bx + cy * by + 97 * f + shift) % 256).toInt
    })
  }

  /** The video lake: consecutive docs form FAMILIES of four variants of one
    * underlying clip (family `g = doc_id / 4`, `3 + g mod 3` frames,
    * variant `v = doc_id mod 4`):
    *
    * | v | container                          | relation to v=0      |
    * |---|------------------------------------|----------------------|
    * | 0 | MJPEG AVI, 4:4:4 frames            | the original         |
    * | 1 | MJPEG AVI, 4:2:0 + DRI frames      | re-encode (same content) |
    * | 1 | (families with g mod 7 = 5) DIB AVI| REJECTED → fallback  |
    * | 2 | MJPEG AVI, grayscale, +8 brightness| brightness-shifted   |
    * | 3 | MJPEG AVI, 4:4:4, frame 0 dropped  | trimmed              |
    *
    * The family structure plants exactly the sibling classes a video
    * near-dup stage must catch (re-encodes, brightness shifts, trims) —
    * all deterministic functions of `doc_id`, so oracles replay them. The
    * DIB members are WELL-FORMED uncompressed AVIs outside the MJPEG
    * decoder's envelope: authentic reject→fallback payloads. */
  def videoLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            val g = d / 4
            val nf = 3 + (g % 3).toInt
            val geo = videoFrameSpec(g, 0)
            def mjpeg(frames: Seq[BmpImage], mode: Int, dri: Int = 0) =
              Codecs.aviEncodeMjpeg(geo.width, geo.height, VideoUsPerFrame,
                frames.map(Codecs.jpegEncode(_, mode, restartInterval = dri)))
            val payload = (d % 4) match {
              case 0 => mjpeg((0 until nf).map(videoFrameSpec(g, _)), Codecs.JpegColor444)
              case 1 =>
                if (g % 7 == 5)
                  Codecs.aviEncodeDib(VideoUsPerFrame,
                    (0 until nf).map(videoFrameSpec(g, _)))
                else mjpeg((0 until nf).map(videoFrameSpec(g, _)),
                  Codecs.JpegColor420, dri = 2)
              case 2 => mjpeg((0 until nf).map(videoFrameSpec(g, _, shift = 8)),
                Codecs.JpegGray)
              case _ => mjpeg((1 until nf).map(videoFrameSpec(g, _)), Codecs.JpegColor444)
            }
            MediaRecord(d, "video/avi", payload)
          }
        }
      }
  }

  /** Docs per tar in the archive lake. */
  val TarGroup = 8

  /** The archive lake: consecutive docs bundled [[TarGroup]]-per-tar
    * (member `doc_<id>.txt` carries the UTF-8 text bytes) — the
    * bundle-of-small-files shape large text corpora actually arrive in.
    * The CONTAINER form is keyed `archive_id mod 4` the way real corpora
    * mix bundle formats — plain tar, tar.gz, ZIP with stored entries,
    * ZIP with deflated entries. Deterministic: members sorted by id,
    * times pinned to 0, pinned gzip/deflate settings — the same corpus
    * always produces byte-identical archives. */
  def archiveLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .groupByKey(_._1 / TarGroup)
      .mapGroups { (g, it) =>
        val members = it.toSeq.sortBy(_._1).map { case (id, text) =>
          (s"doc_$id.txt", text.getBytes("UTF-8"))
        }
        (g % 4) match {
          case 0 => MediaRecord(g, "application/x-tar", Codecs.tarEncode(members))
          case 1 => MediaRecord(g, "application/gzip",
            Codecs.gzipEncode(Codecs.tarEncode(members)))
          case 2 => MediaRecord(g, "application/zip", Codecs.zipEncode(members))
          case _ => MediaRecord(g, "application/zip",
            Codecs.zipEncode(members, deflated = true))
        }
      }
  }

  /** Sniff-extract-or-quarantine, shared by the batch and streaming
    * ingest lanes ([[multimodalArchiveIngest]], the nested twin, and
    * `StreamingOps.archiveIngestStream`): manifest triples for every
    * (possibly nested) member, or ONE quarantine triple (`member` null,
    * `n_bytes` -1) when the bundle is corrupt or its recursive expansion
    * blows the extraction budget — the decode-lane fallback discipline,
    * identical in both execution modes. */
  private[graft] def archiveManifestRows(payload: Array[Byte]): Seq[(String, Long, String)] =
    try Codecs.archiveExtractNested(payload)
      .map { case (n, d) => (n, d.length.toLong, md5hex(d)) }
    catch {
      case _: IllegalArgumentException => Seq((null, -1L, null))
    }

  /** TAR ingest manifest: extract every member of every archive — name,
    * size, content hash — the first stage of a bundled-corpus ingest.
    * The oracle recomputes the same triples straight from the documents
    * table (grouping and member naming are closed forms of doc_id), so a
    * header-layout, checksum, octal-parse, or padding bug in the real
    * ustar walk breaks hashes or row counts. Extraction is stateless
    * per-archive map work; at scale the archives are the files on disk
    * and this flatMap IS the scan. */
  def multimodalArchiveIngest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    archiveLake(spark, dir)
      .mapPartitions { it =>
        it.flatMap { m =>
          archiveManifestRows(m.payload).map { case (name, n, h) =>
            (m.media_id, name, n, h)
          }
        }
      }
      .toDF("archive_id", "member", "n_bytes", "content_hash")
      .orderBy("archive_id", "member")
  }

  /** The NESTED archive lake — the zip-inside-tar shape real corpora
    * bundle: each [[TarGroup]]-doc group becomes an outer tar whose first
    * half of members are direct `doc_<id>.txt` files and whose second
    * half ride inside ONE inner archive member (`inner_<g>.zip` deflated
    * for even groups, `inner_<g>.tar.gz` for odd — both compressed forms
    * exercise the budget accounting). Groups with `g % 9 == 5` are
    * corrupt bundles (deterministic garbage that fails every magic
    * sniff) — the quarantine-path fixture. */
  def archiveNestedLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .groupByKey(_._1 / TarGroup)
      .mapGroups { (g, it) =>
        if (g % 9 == 5)
          MediaRecord(g, "application/octet-stream",
            s"corrupt_bundle_$g".getBytes("US-ASCII"))
        else {
          val members = it.toSeq.sortBy(_._1)
          val (direct, nested) = members.partition(_._1 % TarGroup < TarGroup / 2)
          def entries(ms: Seq[(Long, String)]) =
            ms.map { case (id, text) => (s"doc_$id.txt", text.getBytes("UTF-8")) }
          val inner =
            if (g % 2 == 0)
              (s"inner_$g.zip", Codecs.zipEncode(entries(nested), deflated = true))
            else
              (s"inner_$g.tar.gz", Codecs.gzipEncode(Codecs.tarEncode(entries(nested))))
          MediaRecord(g, "application/x-tar",
            Codecs.tarEncode(entries(direct) :+ inner))
        }
      }
  }

  /** Nested-archive ingest manifest over [[archiveNestedLake]]: inner
    * members surface as `inner_<g>.<ext>!doc_<id>.txt` rows (the
    * container member itself is transparent — recursive ingest lists
    * content, not packaging), corrupt bundles surface as ONE quarantine
    * row each. Same stateless flatMap scale shape as the flat lane; the
    * one-level recursion and the global byte budget live in
    * [[Codecs.archiveExtractNested]]. */
  def multimodalArchiveIngestNested(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    archiveNestedLake(spark, dir)
      .mapPartitions { it =>
        it.flatMap { m =>
          archiveManifestRows(m.payload).map { case (name, n, h) =>
            (m.media_id, name, n, h)
          }
        }
      }
      .toDF("archive_id", "member", "n_bytes", "content_hash")
      .orderBy("archive_id", "member")
  }

  /** The A/V lake: every doc as ONE AVI carrying both an MJPEG video
    * stream (`2 + d mod 2` flat-block frames of [[videoFrameSpec]] at
    * family `d`) and an interleaved mono audio track of the [[mulawSpec]]
    * code bytes — the real multimedia-container demux shape. Variants
    * keyed `d mod 3`: 4:4:4 frames + µ-law audio; 4:2:0+DRI re-encode +
    * µ-law audio (same decoded content, so the oracle is variant-blind);
    * and a PCM8 audio track the demuxer REJECTS into the fallback lane
    * (well-formed per the AVI spec, outside the audio envelope). */
  def avLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            val nf = 2 + (d % 2).toInt
            val geo = videoFrameSpec(d, 0)
            val codes = mulawSpec(d)
            def enc(mode: Int, dri: Int, fmtTag: Int) =
              Codecs.aviEncodeMjpegAv(geo.width, geo.height, VideoUsPerFrame,
                (0 until nf).map(f =>
                  Codecs.jpegEncode(videoFrameSpec(d, f), mode,
                    restartInterval = dri)),
                SampleRate, codes, fmtTag)
            val payload = (d % 3) match {
              case 0 => enc(Codecs.JpegColor444, 0, 7)
              case 1 => enc(Codecs.JpegColor420, 2, 7)
              case _ => enc(Codecs.JpegColor444, 0, 1) // PCM8 track: reject
            }
            MediaRecord(d, "video/avi", payload)
          }
        }
      }
  }

  /** The binary media lake — even docs are images, odd docs audio, with
    * the CONTAINER VARIANT keyed by `doc_id mod 12` the way a real lake
    * mixes formats:
    *
    * | d mod 12 | container           | decoder      |
    * |----------|---------------------|--------------|
    * | 0, 6     | BMP 24-bit          | supported    |
    * | 2, 8     | PNG 8-bit RGB       | supported    |
    * | 4        | BMP RLE8 palette    | supported    |
    * | 10       | BMP 32bpp           | REJECTED → fallback lane |
    * | 1, 7     | WAV PCM-16 mono     | supported    |
    * | 3, 9     | WAV PCM-8 mono      | supported    |
    * | 5        | WAV PCM-16 stereo   | supported    |
    * | 11       | WAV PCM-24 mono     | REJECTED → fallback lane |
    *
    * The two rejected variants are WELL-FORMED files (real 32bpp BMP /
    * 24-bit WAV encoders), so the reject→fallback path downstream is
    * exercised by authentic payloads, not garbage bytes. Encoding is
    * stateless map work in the standard batch shape. */
  def mediaLake(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.fanOut(Tables.documents(spark, dir).select(col("doc_id")))
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            (d % 12) match {
              case 0 | 6 => MediaRecord(d, "image/bmp", Codecs.bmpEncode(imageSpec(d)))
              case 2 | 8 => MediaRecord(d, "image/png", Codecs.pngEncode(imageSpec(d)))
              case 4 =>
                val (w, h, g) = graySpec(d)
                MediaRecord(d, "image/bmp", Codecs.bmpEncodeRle8(w, h, g))
              case 10 => MediaRecord(d, "image/bmp", Codecs.bmpEncode32(imageSpec(d)))
              case 1 | 7 => MediaRecord(d, "audio/wav", Codecs.wavEncode(audioSpec(d)))
              case 3 | 9 => MediaRecord(d, "audio/wav", Codecs.wavEncode8(audioSpec8(d)))
              case 5 => MediaRecord(d, "audio/wav", Codecs.wavEncode(audioSpecStereo(d)))
              case _ => MediaRecord(d, "audio/wav", Codecs.wavEncode24(audioSpec(d)))
            }
          }
        }
      }
  }

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def isBmp(p: Array[Byte]) =
    p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte
  private def isPng(p: Array[Byte]) =
    p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte &&
      p(2) == 'N'.toByte && p(3) == 'G'.toByte
  private def isJpeg(p: Array[Byte]) =
    p.length >= 3 && (p(0) & 0xff) == 0xFF && (p(1) & 0xff) == 0xD8 &&
      (p(2) & 0xff) == 0xFF
  private def isGif(p: Array[Byte]) =
    p.length >= 6 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == '8'.toByte &&
      (p(4) == '7'.toByte || p(4) == '9'.toByte) && p(5) == 'a'.toByte
  private def isImage(p: Array[Byte]) =
    isBmp(p) || isPng(p) || isJpeg(p) || isGif(p)
  private def isWav(p: Array[Byte]) =
    p.length >= 12 && p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == 'F'.toByte

  /** Feature extraction over partition-local batches: each executor thread
    * pulls [[BatchSize]] records at a time (amortizing decoder init exactly
    * like a Pandas-UDF batch), hashes the payload, sniffs the container
    * magic, and runs the REAL decoder for the matched modality. A sniff
    * that matches but a decode that REJECTS (well-formed 32bpp BMP, 24-bit
    * WAV — variants outside the decoders' envelope) falls back to
    * length-derived features: unsupported media must degrade, never kill
    * the pipeline. Typed Dataset in/out — no driver round-trip, scales
    * with partitions. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // decoder/codec init would happen once per batch here
        batch.iterator.map { m =>
          def fallback = { // unknown/rejected container: row keeps flowing
            val n = m.payload.length
            Array(n.toFloat,
              (if (n > 0) m.payload(0) & 0xff else 0).toFloat,
              (if (n > 1) m.payload(1) & 0xff else 0).toFloat,
              (n % 255).toFloat)
          }
          val feat =
            try {
              if (isImage(m.payload)) {
                val img = Codecs.imageDecode(m.payload)
                val n = (img.width * img.height).toFloat
                def mean(c: Int) = {
                  var s = 0L; var p = c
                  while (p < img.rgb.length) { s += img.rgb(p); p += 3 }
                  s / n
                }
                Array(img.width.toFloat, img.height.toFloat, mean(0), mean(1), mean(2))
              } else if (isWav(m.payload)) {
                val a = Codecs.wavDecode(m.payload)
                var peak = 0L; var absSum = 0L
                a.samples.foreach { s =>
                  val v = math.abs(s.toLong); if (v > peak) peak = v; absSum += v
                }
                Array(a.samples.length.toFloat, a.sampleRate.toFloat,
                  peak.toFloat, absSum.toFloat / math.max(1, a.samples.length))
              } else fallback
            } catch { case _: IllegalArgumentException => fallback }
          MediaFeatures(m.media_id, m.payload.length.toLong, md5hex(m.payload), feat)
        }
      }
    }
  }

  /** Deterministic frame sampling: fixed-size chunks of the payload (the
    * video-frame / audio-window access pattern), one output row per frame.
    * Chunking is on the text domain so the oracle can recompute it —
    * counted in CODEPOINTS, not UTF-16 units, because DuckDB's
    * length/substr are codepoint-based and a surrogate pair must never be
    * split across a frame boundary. */
  def sampleFrames(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val s = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
      val cps = s.codePoints().toArray
      val nFrames = (cps.length + FrameChars - 1) / FrameChars
      (0 until nFrames).map { i =>
        val from = i * FrameChars
        val len = math.min(FrameChars, cps.length - from)
        val chunk = new String(cps, from, len)
        (m.media_id, i, md5hex(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
    }.toDF("media_id", "frame_idx", "frame_hash")
  }

  /** REAL image resize — the downsampling stage of an image/video
    * pipeline: decode (any supported container), nearest-neighbor
    * half-scale (thumb pixel (x,y) = source pixel (2x,2y)), RE-ENCODE the
    * thumbnail in the SOURCE's container family (PNG→PNG, BMP→24-bit BMP;
    * RLE8 palette sources promote to 24-bit RGB like real thumbnailers),
    * decode THAT, and report the final thumbnail's exact channel sums. The
    * double round trip exercises both codec directions at a second
    * geometry (odd thumb widths hit different row padding / filter
    * phases than their sources). Rejected variants drop, as in
    * [[multimodalDecodeImage]]. Same batched typed-Dataset shape as
    * [[extractFeatures]]. */
  def resizeMedia(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          try {
            val img = Codecs.imageDecode(m.payload)
            val tw = (img.width + 1) / 2
            val th = (img.height + 1) / 2
            val rgb = new Array[Int](tw * th * 3)
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) {
                val src = ((2 * y) * img.width + 2 * x) * 3
                val dst = (y * tw + x) * 3
                rgb(dst) = img.rgb(src)
                rgb(dst + 1) = img.rgb(src + 1)
                rgb(dst + 2) = img.rgb(src + 2)
                x += 1
              }
              y += 1
            }
            val enc =
              if (isPng(m.payload)) Codecs.pngEncode(BmpImage(tw, th, rgb))
              else Codecs.bmpEncode(BmpImage(tw, th, rgb))
            val thumb = Codecs.imageDecode(enc)
            var sr = 0L; var sg = 0L; var sb = 0L
            var p = 0
            while (p < thumb.rgb.length) {
              sr += thumb.rgb(p); sg += thumb.rgb(p + 1); sb += thumb.rgb(p + 2)
              p += 3
            }
            Some(ResizeStats(m.media_id, img.width, img.height,
              thumb.width, thumb.height, sr, sg, sb))
          } catch { case _: IllegalArgumentException => None }
        }
      }
    }.toDF()
  }

  // --- oracle-gated query entry points -------------------------------------

  /** Decode manifest over the binary lake: per record, mime, on-disk size,
    * whether the REAL decoder dispatch accepted the container, and the
    * decoded value count (pixels / interleaved samples; 0 on the fallback
    * lane). Every number passes through the actual encode→decode round
    * trip, and the oracle recomputes each from the doc_id closed form
    * (including the two variants that MUST reject) — a header-layout bug
    * anywhere in [[Codecs]] shifts these and reddens the gate. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { m =>
            val nValues =
              try {
                if (isImage(m.payload)) {
                  val img = Codecs.imageDecode(m.payload)
                  Some(img.width.toLong * img.height)
                } else Some(Codecs.wavDecode(m.payload).samples.length.toLong)
              } catch { case _: IllegalArgumentException => None }
            MediaMeta(m.media_id, m.mime, m.payload.length.toLong,
              nValues.isDefined, nValues.getOrElse(0L))
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real image decode across ALL supported containers (24-bit BMP, RLE8
    * BMP, PNG — the PNG rows' sums come from genuine IDAT inflation and
    * filter reconstruction): dimensions and EXACT per-channel pixel sums
    * from the decoded top-down RGB array. Integer-exact end to end — no
    * float tolerance hides a decoder defect. Records whose REAL container
    * variant the decoder rejects (32bpp BMP) are dropped here — they carry
    * no pixels to report; [[multimodalFeatures]]' manifest accounts for
    * them (`decode_ok = false`), and the oracle excludes the same
    * closed-form id set. Stateless batched map (scales with partitions);
    * the only shuffle is the output sort. */
  def multimodalDecodeImage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaLake(spark, dir)
      .filter(col("mime").startsWith("image/")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val img = Codecs.imageDecode(m.payload)
              var sr = 0L; var sg = 0L; var sb = 0L
              var p = 0
              while (p < img.rgb.length) {
                sr += img.rgb(p); sg += img.rgb(p + 1); sb += img.rgb(p + 2)
                p += 3
              }
              Some(ImageStats(m.media_id, img.width, img.height,
                img.width.toLong * img.height, sr, sg, sb))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** One staged directory per (JVM, corpus dir, corpus GENERATION): the
    * cache key folds in the documents parquet's (mtime, length), so a
    * corpus regenerated in place under a live JVM restages instead of
    * serving files from the previous generation. Every staged dir is
    * registered for recursive deletion at JVM exit. */
  private val stagedMediaDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** (mtime, length) of the corpus parquet the media lake derives from —
    * the generation marker in the staging-cache key. */
  private def corpusGeneration(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, "documents.parquet")
    val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
    s"${st.getModificationTime}-${st.getLen}"
  }

  private def registerStagedCleanup(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(new java.net.URI(path).getPath)
        if (java.nio.file.Files.exists(root))
          java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))

  /** Stage the media lake to REAL files — one `media_<id>.<img|wav>` per
    * record, written through the Hadoop FileSystem API from the executors.
    * The staging root defaults to the driver's tmpdir (correct at
    * local[*]); a MULTI-NODE deployment must point
    * `spark.graft.media.stagingDir` at a shared filesystem (an HDFS/S3
    * URI) — executors resolve the path through the Hadoop FS API, so with
    * a local default they would write to per-machine disks and the
    * binaryFile read-back would miss files. The directory must outlive
    * query CONSTRUCTION (the binaryFile scan reads it at execution);
    * recursive cleanup runs at JVM exit. */
  private def stageMediaFiles(spark: SparkSession, dir: String): String =
    stagedMediaDirs.computeIfAbsent(
      s"$dir@${corpusGeneration(spark, dir)}",
      _ => stageMediaFilesOnce(spark, dir))

  private def stageMediaFilesOnce(spark: SparkSession, dir: String): String = {
    val stagingRoot = spark.conf.getOption("spark.graft.media.stagingDir")
      .getOrElse(sys.props("java.io.tmpdir"))
    val staged = new org.apache.hadoop.fs.Path(
      stagingRoot,
      s"graft-media-files-${java.util.UUID.randomUUID().toString.take(8)}")
    val fsConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val stagedStr = staged.toString
    mediaLake(spark, dir).foreachPartition { (it: Iterator[MediaRecord]) =>
      val fs = new org.apache.hadoop.fs.Path(stagedStr)
        .getFileSystem(fsConf.value)
      it.foreach { m =>
        val ext = if (m.mime.startsWith("image/")) "img" else "wav"
        val out = fs.create(new org.apache.hadoop.fs.Path(
          stagedStr, f"media_${m.media_id}%08d.$ext"), true)
        try out.write(m.payload) finally out.close()
      }
    }
    registerStagedCleanup(stagedStr)
    stagedStr
  }

  /** Batch FILE-BASED media ingest — the files-on-disk twin of
    * [[multimodalDecodeImage]]: the lake's image payloads staged as real
    * files, read back with the `binaryFile` source, decoded through the
    * SAME kernels, same output shape — so the decode_image oracle gates
    * this lane's content equality against the in-row one end to end
    * (`MultimodalSpec` additionally diffs the two DataFrames directly).
    * The media id rides in the file name, the way real lakes key objects.
    * Scale shape: the file scan IS the ingest (listing parallelized by
    * the source, one task per file group), feeding the stateless decode
    * map with no shuffle before the output sort — plan-asserted. The
    * rejected 32bpp variant drops at decode exactly as in-row. */
  def multimodalMediaIngestFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val staged = stageMediaFiles(spark, dir)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img")
      .load(staged)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { case (path, payload) =>
            val base = path.substring(path.lastIndexOf('/') + 1)
            val id = base.stripPrefix("media_").stripSuffix(".img").toLong
            try {
              val img = Codecs.imageDecode(payload)
              var sr = 0L; var sg = 0L; var sb = 0L
              var p = 0
              while (p < img.rgb.length) {
                sr += img.rgb(p); sg += img.rgb(p + 1); sb += img.rgb(p + 2)
                p += 3
              }
              Some(ImageStats(id, img.width, img.height,
                img.width.toLong * img.height, sr, sg, sb))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real JPEG decode over the [[jpegLake]]: dimensions and EXACT
    * per-channel pixel sums from the decoded top-down RGB, same shape as
    * [[multimodalDecodeImage]]. Every row passes through the full baseline
    * pipeline — marker walk, Annex-K Huffman entropy decode, dequant,
    * zigzag, 8x8 IDCT, chroma upsampling (4:2:0 rows), restart-marker
    * resync, YCbCr→RGB — and the oracle predicts the sums from the
    * [[jpegSpec]] closed form with no knowledge of the container, so a
    * defect anywhere in the codec reddens the gate. Stateless batched map;
    * the only shuffle is the output sort. */
  def multimodalDecodeJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jpegLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val img = Codecs.imageDecode(m.payload)
              var sr = 0L; var sg = 0L; var sb = 0L
              var p = 0
              while (p < img.rgb.length) {
                sr += img.rgb(p); sg += img.rgb(p + 1); sb += img.rgb(p + 2)
                p += 3
              }
              Some(ImageStats(m.media_id, img.width, img.height,
                img.width.toLong * img.height, sr, sg, sb))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real GIF decode over the [[gifLake]]: LZW decompression, extension
    * walk, de-interlace, palette mapping — exact channel sums per image.
    * The animated members reject inside [[Codecs.gifDecode]] and drop
    * from this lane (the oracle excludes exactly those ids, so a decoder
    * that silently takes an animation's first frame — or loses one of the
    * three still variants — breaks the row count). Batched stateless map,
    * like every decode lane: no shuffle before the output sort. */
  def multimodalDecodeGif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gifLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val img = Codecs.imageDecode(m.payload)
              var sr = 0L; var sg = 0L; var sb = 0L
              var p = 0
              while (p < img.rgb.length) {
                sr += img.rgb(p); sg += img.rgb(p + 1); sb += img.rgb(p + 2)
                p += 3
              }
              Some(ImageStats(m.media_id, img.width, img.height,
                img.width.toLong * img.height, sr, sg, sb))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real VIDEO decode over the [[videoLake]]: full RIFF/AVI container
    * walk + baseline JPEG entropy decode per frame. Geometry, frame
    * count, frame period, and EXACT channel sums across all frames — the
    * decode manifest of a video ingest stage. The DIB (uncompressed)
    * variants reject inside [[Codecs.aviDecode]] and drop from this lane
    * (the oracle excludes exactly those ids, so a decoder that silently
    * accepts them — or a lost MJPEG member — breaks the row count). Same
    * batched stateless-map shape as every decode query: per-record CPU
    * work, scales with partitions, no shuffle before the output sort. */
  def multimodalDecodeVideo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val v = Codecs.aviDecode(m.payload)
              var sr = 0L; var sg = 0L; var sb = 0L
              v.frames.foreach { img =>
                var p = 0
                while (p < img.rgb.length) {
                  sr += img.rgb(p); sg += img.rgb(p + 1); sb += img.rgb(p + 2)
                  p += 3
                }
              }
              Some(VideoStats(m.media_id, v.width, v.height, v.frames.length,
                v.usPerFrame,
                v.width.toLong * v.height * v.frames.length, sr, sg, sb))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real audio decode across the supported PCM variants (16-bit mono,
    * 8-bit mono on the ×256 lattice, 16-bit stereo): sample count
    * (interleaved for stereo), rate and channel count from the parsed
    * `fmt ` chunk, peak |sample|, and exact energy (sum of squares).
    * 24-bit records reject → dropped here, manifested upstream. */
  def multimodalDecodeAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaLake(spark, dir)
      .filter(col("mime") === "audio/wav").as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val a = Codecs.wavDecode(m.payload)
              var peak = 0L; var energy = 0L
              a.samples.foreach { s =>
                val v = s.toLong
                if (math.abs(v) > peak) peak = math.abs(v)
                energy += v * v
              }
              Some(AudioStats(m.media_id, a.samples.length.toLong, a.sampleRate,
                a.channels, peak, energy))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real FLAC decode over the [[flacLake]]: metadata walk, frame-header
    * CRC-8, Rice/FIXED subframe reconstruction, frame CRC-16, and the
    * STREAMINFO PCM MD5 — every clip fully integrity-checked before its
    * stats count. FLAC is lossless, so the oracle replays the closed-form
    * lattice exactly; any predictor, Rice, CRC, or block-boundary bug in
    * either direction breaks peak AND energy. Batched stateless map like
    * every decode lane — no shuffle before the output sort. */
  def multimodalDecodeFlac(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    flacLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val a = Codecs.flacDecode(m.payload)
              var peak = 0L; var energy = 0L
              a.samples.foreach { s =>
                val v = s.toLong
                if (math.abs(v) > peak) peak = math.abs(v)
                energy += v * v
              }
              Some(AudioStats(m.media_id, a.samples.length.toLong, a.sampleRate,
                a.channels, peak, energy))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real G.711 decode over the [[mulawLake]]: full RIFF walk (18-byte
    * fmt, fact chunk) + closed-form µ-law expansion per code byte — peak
    * and exact integer energy per clip, the telephony-ingest manifest.
    * Batched stateless map like every decode lane. */
  def multimodalDecodeMulaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mulawLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val a = Codecs.wavDecode(m.payload)
              var peak = 0L; var energy = 0L
              a.samples.foreach { s =>
                val v = s.toLong
                if (math.abs(v) > peak) peak = math.abs(v)
                energy += v * v
              }
              Some(AudioStats(m.media_id, a.samples.length.toLong, a.sampleRate,
                a.channels, peak, energy))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  /** Real A/V DEMUX over the [[avLake]]: one container walk yields both
    * the MJPEG frame decode (exact channel sums) and the µ-law audio
    * expansion (peak + exact energy) — the manifest a multimedia ingest
    * stage emits. PCM-track members reject inside [[Codecs.aviDecodeAv]]
    * and drop from the lane (the oracle excludes exactly those ids).
    * Batched stateless map; no shuffle before the output sort. */
  def multimodalDecodeAv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    avLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val av = Codecs.aviDecodeAv(m.payload)
              // audio-less AVIs drop to the fallback lane like any other
              // reject — .get here would kill the task on a video-only file
              av.audio.map { a =>
                var sr = 0L; var sg = 0L; var sb = 0L
                av.video.frames.foreach { img =>
                  var p = 0
                  while (p < img.rgb.length) {
                    sr += img.rgb(p); sg += img.rgb(p + 1); sb += img.rgb(p + 2)
                    p += 3
                  }
                }
                var peak = 0L; var energy = 0L
                a.samples.foreach { s =>
                  val v = s.toLong
                  if (math.abs(v) > peak) peak = math.abs(v)
                  energy += v * v
                }
                AvStats(m.media_id, av.video.width, av.video.height,
                  av.video.frames.length,
                  av.video.width.toLong * av.video.height * av.video.frames.length,
                  sr, sg, sb, a.samples.length.toLong, a.sampleRate, peak, energy)
              }
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
      .toDF()
      .orderBy("media_id")
  }

  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRecord]
    sampleFrames(media)
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"), col("frame_hash"))
      .orderBy("media_id", "frame_idx")
  }

  /** Cross-media frame dedup (the video-dedup move): frames hashing equal
    * across DIFFERENT media are repeated content — intros, watermarks,
    * shared b-roll. One hash aggregation over the frame table; at 100 TB
    * this is the same scale shape as exact text dedup, keyed on the frame
    * hash. */
  def multimodalFrameDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRecord]
    sampleFrames(media)
      .groupBy("frame_hash")
      .agg(countDistinct(col("media_id")).as("n_media"),
        count(lit(1)).as("n_frames"),
        min(col("media_id")).as("first_media"))
      .filter(col("n_media") > 1)
      .orderBy("frame_hash")
  }

  /** Modality routing — the dispatch stage of a mixed-media pipeline: sniff
    * each payload's type (real corpora read magic bytes; here the first
    * payload byte mod 3, deterministic on both engines via ascii()) and
    * send each row down its modality's branch (image → pixel estimate,
    * audio → duration estimate, text → token count). Every row lands in
    * exactly one branch, so the dispatch is ONE projection with per-route
    * CASE arms over ONE scan — the filter-per-branch-then-union form read
    * the corpus three times for the same rows (plan-dump observed). At
    * scale each arm would carry its own decoder (the [[extractFeatures]]
    * batched shape) without ever touching the other modalities' rows; the
    * only shuffle is the output sort. */
  def multimodalRoute(spark: SparkSession, dir: String): DataFrame = {
    val route = ascii(substring(col("text"), 1, 1)) % 3
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        when(route === 0, "image").when(route === 1, "audio")
          .otherwise("text").as("modality"),
        when(route === 0, "n_pixels").when(route === 1, "duration_ms")
          .otherwise("n_tokens").as("metric"),
        when(route === 0, (octet_length(col("text").cast("binary")) * 3).cast("long"))
          .when(route === 1, (octet_length(col("text").cast("binary")) * 8).cast("long"))
          .otherwise(size(graft.functions.Portable.tokens(col("text"))).cast("long"))
          .as("value"))
      .orderBy("media_id")
  }

  /** aHash geometry: up to [[AhashBits]] above-mean bits, banded
    * [[AhashBands]] × [[AhashBandBits]] for the near-dup bucket join —
    * 60 bits keeps every hash positive, so `>>` shift semantics agree
    * across engines (the dedup_simhash discipline). */
  val AhashBits = 60
  val AhashBands = 4
  val AhashBandBits = 15
  val AhashBandMask = (1L << AhashBandBits) - 1
  val AhashMaxHamming = 3

  /** Per-image AVERAGE-HASH (aHash) perceptual fingerprint over the REAL
    * decoded pixels: gray = (r+g+b)/3 per pixel (integer floor), bit j set
    * iff pixel j's gray exceeds the image's floor-mean gray, first
    * [[AhashBits]] pixels. Brightness shifts preserve the above-mean
    * pattern (until wraparound), which is exactly the invariance that
    * makes average-hashing the standard first screen for image near-dup —
    * byte-level hashing sees re-encoded or brightness-shifted copies as
    * distinct. Decode + hash is the usual batched stateless map; rejected
    * variants drop as in [[multimodalDecodeImage]]. */
  /** The hash kernel: gray per pixel (integer floor of the channel mean),
    * floor-mean over the whole image, above-mean bit per pixel for the
    * first [[AhashBits]] pixels. */
  private[graft] def ahashOf(img: BmpImage): Long = {
    val n = img.width * img.height
    val gray = new Array[Int](n)
    var j = 0; var sum = 0L
    while (j < n) {
      val g = (img.rgb(3 * j) + img.rgb(3 * j + 1) + img.rgb(3 * j + 2)) / 3
      gray(j) = g; sum += g; j += 1
    }
    val mean = sum / n
    var bits = 0L
    j = 0
    while (j < math.min(AhashBits, n)) {
      if (gray(j) > mean) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** One-payload perceptual fingerprint for ingest screens: sniff the
    * container, decode, and hash (images → [[ahashOf]], audio →
    * [[audioFpOf]]); None when nothing decodes — the caller's fallback
    * lane. An all-zero fingerprint (flat image, silent/too-short clip) is
    * ALSO None: it carries no perceptual information, and matching on it
    * would flag every degenerate payload against any degenerate known
    * item — a systematic false-positive class a screen must not have.
    * Used by the STREAMING known-content screen
    * ([[graft.streaming.StreamingOps.mediaFingerprintScreen]]). */
  def mediaFingerprint(payload: Array[Byte]): Option[Long] =
    try {
      val fp =
        if (isImage(payload)) Some(ahashOf(Codecs.imageDecode(payload)))
        else if (isWav(payload)) Some(audioFpOf(Codecs.wavDecode(payload).samples)._2)
        else None
      fp.filter(_ != 0L)
    } catch { case _: IllegalArgumentException => None }

  private def imageAhash(spark: SparkSession, dir: String): Dataset[AhashRow] = {
    import spark.implicits._
    mediaLake(spark, dir)
      .filter(col("mime").startsWith("image/")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val img = Codecs.imageDecode(m.payload)
              val bits = ahashOf(img)
              Some(AhashRow(m.media_id, img.width.toLong * img.height, bits,
                java.lang.Long.bitCount(bits)))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
  }

  def multimodalAhash(spark: SparkSession, dir: String): DataFrame =
    imageAhash(spark, dir).toDF().orderBy("media_id")

  /** IMAGE near-duplicate pairs by banded aHash — the image-domain twin of
    * `dedup_simhash`: fingerprints band into [[AhashBands]] ×
    * [[AhashBandBits]]-bit buckets, candidates collide on ≥1 band
    * (pigeonhole among same-bit-length fingerprints: hamming ≤
    * [[AhashMaxHamming]] < [[AhashBands]] forces a clean band — recall 1,
    * no all-pairs join), then exact `bit_count(xor)` verifies.
    *
    * The fingerprint's BIT LENGTH (min(60, n_pixels)) joins the bucket
    * key, for the same reason the audio twin carries its window count:
    * small images cannot populate the high bands, so without the length
    * every small image collides with every other on an all-zero band and
    * candidate generation degenerates toward all-pairs over the small-
    * image population (measured at sf0.01: 8166 → 890 candidate pairs,
    * max bucket 105 → 12). Semantics tighten to same-bit-length pairs —
    * an aligned comparison, which is what a positional hamming distance
    * means anyway. Scale shape: the pair join is an EQUI-join on (band,
    * bucket, bits) — hash exchange, work bounded by bucket occupancy, the
    * same contract every text near-dup query in the engine honors. */
  def multimodalImageNeardup(spark: SparkSession, dir: String): DataFrame =
    imageNeardupPairs(imageAhash(spark, dir).toDF().localCheckpoint())
      .orderBy("media_a", "media_b")

  /** The banded pair join over an already-materialized fingerprint
    * relation — split out so the curation pipeline can feed ONE
    * fingerprint pass to both the pair generation and the cluster
    * universe. `h` must be materialized (both join sides read it). */
  /** Banded-bucket relation for an aHash fingerprint relation `h` —
    * (media_id, ahash, bits, band, bkt). All-zero fingerprints (flat
    * images) carry no perceptual signal and would pair every degenerate
    * image with every other of the same bit length — the same
    * false-positive class the streaming screen drops (mediaFingerprint) —
    * so they never enter the banding. */
  private def ahashBanded(h: DataFrame): DataFrame =
    h.filter(col("ahash") =!= 0L)
      .select(col("media_id"), col("ahash"),
        least(col("n_pixels"), lit(AhashBits.toLong)).as("bits"),
        explode(expr(s"sequence(0, ${AhashBands - 1})")).as("band"))
      .withColumn("bkt",
        expr(s"shiftright(ahash, band * $AhashBandBits) & $AhashBandMask"))

  private[graft] def imageNeardupPairs(h: DataFrame): DataFrame = {
    val banded = ahashBanded(h)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.bits") === col("y.bits") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).as("hamming"))
      .filter(col("hamming") <= AhashMaxHamming)
      .distinct()
  }

  /** pHash geometry: an 8×8 nearest-center gray resample, an 8-point
    * INTEGER DCT-II in both dimensions, and the 60 lowest-frequency AC
    * coefficients (row-major, DC excluded) thresholded at their own
    * median — the classic DCT perceptual hash, integer-exact end to end.
    * The cosine basis is a FIXED table `round(cos(π(2x+1)u/16)·2¹⁴)`
    * computed once here and EMBEDDED as integer literals in the oracle
    * SQL, so both engines run identical integer arithmetic — no libm
    * last-ulp drift can flip a threshold bit (the codec-differential
    * discipline applied to a transform). 60 bits keeps the hash
    * positive (the aHash/simhash shift-semantics contract).
    *
    * What pHash buys over [[ahashOf]]: the fingerprint lives in the
    * FREQUENCY domain of a fixed-size resample, so it is invariant to
    * brightness shifts EXACTLY (a constant offset lands entirely in the
    * discarded DC term) and to integer upscaling (a pixel-replicated
    * enlargement resamples to the same 8×8 tile) — both spec-pinned. */
  val PhashDctScale = 16384L
  private[graft] lazy val phashDctTable: Array[Array[Long]] =
    Array.tabulate(8, 8)((u, x) =>
      Math.round(PhashDctScale * math.cos(math.Pi * (2 * x + 1) * u / 16.0)))
  val PhashBands = 4
  val PhashBandBits = 15
  val PhashBandMask = (1L << PhashBandBits) - 1
  val PhashMaxHamming = 3

  /** The hash kernel. Resample: source pixel for grid (u,v) is the
    * center-mapped nearest `x=(2u+1)w/16, y=(2v+1)h/16` (integer floor) —
    * exact on any geometry ≥1×1, replicating pixels for images smaller
    * than the tile. Terms bound: 255·2¹⁴·2¹⁴·64 < 2⁶³, all long. */
  private[graft] def phashOf(img: BmpImage): Long = {
    val w = img.width; val h = img.height
    val g8 = new Array[Long](64)
    var v = 0
    while (v < 8) {
      val ys = (2 * v + 1) * h / 16
      var u = 0
      while (u < 8) {
        val xs = (2 * u + 1) * w / 16
        val j = ys * w + xs
        g8(v * 8 + u) =
          (img.rgb(3 * j) + img.rgb(3 * j + 1) + img.rgb(3 * j + 2)) / 3
        u += 1
      }
      v += 1
    }
    val f = new Array[Long](64) // F(u,v) at idx v*8+u
    var cv = 0
    while (cv < 8) {
      var cu = 0
      while (cu < 8) {
        var s = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += g8(y * 8 + x) * phashDctTable(cu)(x) * phashDctTable(cv)(y)
            x += 1
          }
          y += 1
        }
        f(cv * 8 + cu) = s
        cu += 1
      }
      cv += 1
    }
    val ac = Array.tabulate(60)(i => f(i + 1)) // row-major AC, DC dropped
    val sorted = ac.sorted
    val thr2 = sorted(29) + sorted(30) // 2× the lower-median midpoint
    var bits = 0L
    var i = 0
    while (i < 60) {
      if (2 * ac(i) > thr2) bits |= 1L << i
      i += 1
    }
    bits
  }

  private def imagePhash(spark: SparkSession, dir: String): Dataset[PhashRow] = {
    import spark.implicits._
    mediaLake(spark, dir)
      .filter(col("mime").startsWith("image/")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val img = Codecs.imageDecode(m.payload)
              val bits = phashOf(img)
              Some(PhashRow(m.media_id, img.width, img.height, bits,
                java.lang.Long.bitCount(bits)))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
  }

  /** Gated lane: per-image DCT perceptual hash over the real decoded
    * pixels — the same batched stateless decode map as every codec lane.
    * The oracle re-derives the hash from the lake's closed-form pixel
    * lattice with the SAME embedded integer cosine table. */
  def multimodalPhash(spark: SparkSession, dir: String): DataFrame =
    imagePhash(spark, dir).toDF().orderBy("media_id")

  /** Gated lane: image near-duplicate pairs by banded pHash — the
    * frequency-domain twin of `multimodal_image_neardup`. Unlike aHash,
    * every fingerprint is exactly 60 bits regardless of geometry (the
    * resample normalizes), so the bucket key is just (band, bucket) —
    * no bit-length column. All-zero hashes (flat images) carry no
    * signal and are excluded, as everywhere. Pair join is an equi-join
    * on band buckets; hamming ≤ [[PhashMaxHamming]] < [[PhashBands]]
    * pigeonholes a clean band — recall 1, never all-pairs. */
  def multimodalPhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val h = imagePhash(spark, dir).toDF().localCheckpoint()
    val banded = h.filter(col("phash") =!= 0L)
      .select(col("media_id"), col("phash"),
        explode(expr(s"sequence(0, ${PhashBands - 1})")).as("band"))
      .withColumn("bkt",
        expr(s"shiftright(phash, band * $PhashBandBits) & $PhashBandMask"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .distinct()
      .orderBy("media_a", "media_b")
  }

  /** Audio-fingerprint geometry: [[AfpWindow]]-sample energy windows over
    * the first [[AfpMaxSamples]] samples, one above-mean bit per window
    * (≤ [[AhashBits]] bits, same positive-value shift discipline). */
  val AfpWindow = 4
  val AfpMaxSamples = 240

  /** The audio hash kernel: |sample| energy per [[AfpWindow]]-wide window
    * over the first [[AfpMaxSamples]] samples (whole windows only), bit k
    * set iff window k's energy exceeds the clip mean. The comparison is
    * the INTEGER cross-multiplication `ws·m > total·W` — no division, so
    * both engines agree exactly. Loudness scaling preserves the
    * above-mean pattern (the aHash brightness property in the audio
    * domain). Stereo fingerprints the interleaved stream as-is — the
    * envelope is channel-agnostic at this granularity. */
  private[graft] def audioFpOf(samples: Array[Short]): (Int, Long) = {
    val capped = math.min(AfpMaxSamples, samples.length)
    val m = capped - capped % AfpWindow
    val nw = m / AfpWindow
    var total = 0L
    var j = 0
    while (j < m) { total += math.abs(samples(j).toLong); j += 1 }
    var bits = 0L
    var k = 0
    while (k < math.min(AhashBits, nw)) {
      var ws = 0L
      var i = 0
      while (i < AfpWindow) { ws += math.abs(samples(k * AfpWindow + i).toLong); i += 1 }
      if (ws * m > total * AfpWindow) bits |= (1L << k)
      k += 1
    }
    (nw, bits)
  }

  private def audioFingerprint(spark: SparkSession, dir: String): Dataset[AudioFpRow] = {
    import spark.implicits._
    mediaLake(spark, dir)
      .filter(col("mime") === "audio/wav").as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val a = Codecs.wavDecode(m.payload)
              val (nw, bits) = audioFpOf(a.samples)
              Some(AudioFpRow(m.media_id, nw, bits, java.lang.Long.bitCount(bits)))
            } catch { case _: IllegalArgumentException => None }
          }
        }
      }
  }

  def multimodalAudioFingerprint(spark: SparkSession, dir: String): DataFrame =
    audioFingerprint(spark, dir).toDF().orderBy("media_id")

  /** AUDIO near-duplicate pairs by banded energy-envelope fingerprints —
    * the audio-domain member of the near-dup family (text simhash, image
    * aHash, this). Short clips cannot fill all bands (few windows ⇒ high
    * bands identically zero), so the WINDOW COUNT joins the bucket key:
    * zero-band collisions between unrelated lengths never become
    * candidates, and near-dup semantics tighten to same-duration clips —
    * which is what an aligned envelope comparison means anyway. Candidate
    * generation stays an equi-join on (band, bucket, n_windows); exact
    * `bit_count(xor)` verifies at hamming ≤ [[AhashMaxHamming]]. */
  def multimodalAudioNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val h = audioFingerprint(spark, dir).toDF().localCheckpoint() // both join sides
    // silent/flat clips hash to all-zero envelopes — no perceptual
    // signal, so (like the image twin and the streaming screen) they are
    // excluded from pair generation rather than paired with each other
    val banded = h.filter(col("afp") =!= 0L)
      .select(col("media_id"), col("afp"), col("n_windows"),
        explode(expr(s"sequence(0, ${AhashBands - 1})")).as("band"))
      .withColumn("bkt",
        expr(s"shiftright(afp, band * $AhashBandBits) & $AhashBandMask"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.n_windows") === col("y.n_windows") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"),
        bit_count(col("x.afp").bitwiseXOR(col("y.afp"))).as("hamming"))
      .filter(col("hamming") <= AhashMaxHamming)
      .distinct()
      .orderBy("media_a", "media_b")
  }

  /** END-TO-END media curation — the multimodal twin of
    * `pipeline_corpus_build`: the decodable-image universe flows through
    * perceptual fingerprinting ([[multimodalAhash]]'s kernel), banded
    * near-dup pair generation ([[multimodalImageNeardup]]'s exact
    * semantics), and duplicate-cluster election
    * ([[graft.ops.Graph.clusterAssign]] — hash-min components with the
    * alternating-star fallback), producing per-image lineage: cluster id,
    * cluster size, and the canonical flag — `WHERE is_canonical` IS the
    * deduplicated media set. Every stage reuses a gated operator's exact
    * semantics; the oracle replays fingerprint → banding → verify →
    * recursive-CTE components end to end. */
  def multimodalMediaCuration(spark: SparkSession, dir: String): DataFrame = {
    // ONE decode+fingerprint pass feeds both the pair join and the
    // cluster universe
    val h = imageAhash(spark, dir).toDF().localCheckpoint()
    val pairs = imageNeardupPairs(h).select("media_a", "media_b")
    // starsFirst: brightness-shift siblings CHAIN (d ~ d+84 ~ d+168 ...),
    // so this pair graph has long diameters — hash-min would burn its
    // whole round budget and fall back to stars anyway (measured 9.6 s
    // hash-min-then-fallback vs 5.6 s stars-first at sf0.1)
    graft.ops.Graph.clusterAssign(h.select("media_id"), "media_id",
        pairs, "media_a", "media_b", starsFirst = true)
      .orderBy("media_id")
  }

  /** Shingled audio-fingerprint geometry: [[AudioShingleLen]] consecutive
    * window LEVELS per shingle, levels quantized 0..[[AudioLevelScale]]
    * against the clip's PEAK window energy (integer floor division — exact
    * under loudness scaling, since c·e·S div c·max ≡ e·S div max). */
  val AudioShingleLen = 4
  val AudioLevelScale = 8
  /** Leading-silence prefix for the shifted-twin lake: two whole
    * [[AfpWindow]]-sample windows. */
  val AudioPadValues = 8
  val AudioPadOffset = 1000000L
  val AudioShingleTau = 0.8
  /** Clips with fewer shingles than this are below the fingerprint's
    * resolution (a single shared 4-gram would read as containment 1). */
  val AudioMinShingles = 4

  /** Per-clip level sequence for the SHINGLED fingerprint: window energies
    * over the full interleaved stream (whole [[AfpWindow]]-wide windows),
    * each quantized against the clip's peak window energy. All-silent
    * clips (peak 0) return no levels — the zero-information discipline.
    * Two exact invariances, both unit-pinned:
    *  - loudness: scaling every sample by c scales e_k and max together,
    *    and floor((c·e·S)/(c·max)) = floor((e·S)/max) exactly;
    *  - whole-window silence trims: zero windows quantize to level 0 and
    *    do not move the peak, so surviving windows keep their levels. */
  private[graft] def audioLevelsOf(samples: Array[Short]): Array[Int] = {
    val m = samples.length - samples.length % AfpWindow
    val nw = m / AfpWindow
    val e = new Array[Long](nw)
    var k = 0
    while (k < nw) {
      var ws = 0L
      var i = 0
      while (i < AfpWindow) { ws += math.abs(samples(k * AfpWindow + i).toLong); i += 1 }
      e(k) = ws
      k += 1
    }
    val maxE = if (nw == 0) 0L else e.max
    if (maxE == 0L) Array.empty
    else e.map(x => (x * AudioLevelScale / maxE).toInt)
  }

  /** SHIFT-ROBUST audio near-dup by shingled window levels — closing the
    * alignment hole in [[multimodalAudioNeardup]]'s envelope fingerprint:
    * that hash compares windows POSITIONALLY, so a leading-silence trim
    * shifts every window and misses, where video near-dup survives trims
    * via set semantics. This operator applies the same set move to audio
    * (the winnowing idea): the fingerprint is the SET of hashed
    * [[AudioShingleLen]]-grams of quantized window levels, and a clip pair
    * matches when the smaller fingerprint is ≥ [[AudioShingleTau]]
    * contained in the larger. A whole-window silence pad shifts gram
    * POSITIONS but not gram CONTENTS, so every original shingle survives
    * in the padded twin — containment 1 — while the positional hash loses
    * every bit past the shift.
    *
    * The lake pairs each decodable clip with a silence-prefixed twin
    * (media_id + [[AudioPadOffset]]) so the property is exercised by
    * construction; the oracle replays levels → shingles → df-capped
    * posting lists → containment in closed form and predicts both the
    * planted twins and any natural matches. Scale shape: identical to the
    * text containment query — hashed shingles, [[Dedup.MaxShingleDf]]-
    * capped posting lists (never all-pairs), pair counts from in-task
    * list expansion. */
  def multimodalAudioShingleNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the twin id space starts at AudioPadOffset, so clips at or above it
    // are FENCED OUT rather than silently aliased with their own twins —
    // the DedupEmbeddingBaselineCap discipline (oracle mirrors the fence)
    val sh = mediaLake(spark, dir)
      .filter(col("mime") === "audio/wav" && col("media_id") < AudioPadOffset)
      .as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val a = Codecs.wavDecode(m.payload)
              def grams(id: Long, samples: Array[Short]): Seq[(Long, String)] = {
                val lv = audioLevelsOf(samples)
                (0 to lv.length - AudioShingleLen).map(i =>
                  (id, lv.slice(i, i + AudioShingleLen).mkString(",")))
              }
              grams(m.media_id, a.samples) ++
                grams(m.media_id + AudioPadOffset,
                  Array.fill[Short](AudioPadValues)(0) ++ a.samples)
            } catch { case _: IllegalArgumentException => Nil }
          }
        }
      }
      .toDF("doc_id", "s")
      .select(col("doc_id"), graft.functions.Portable.hash60(col("s")).as("h"))
      .distinct() // the fingerprint is a SET of shingle hashes
    val (sz, inter) = Dedup.cappedPairCountsFrom(sh, Dedup.MaxShingleDf)
    inter
      .join(sz.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sz.as("nb"), col("doc_b") === col("nb.doc_id"))
      .filter(least(col("na.n"), col("nb.n")) >= AudioMinShingles)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        round(col("c").cast("double") / least(col("na.n"), col("nb.n")), 6)
          .as("containment"))
      .filter(col("containment") >= AudioShingleTau)
      .orderBy("media_a", "media_b")
  }

  /** Batch boundary for [[multimodalCurationIncremental]] — media below
    * are the EXISTING corpus (the fingerprint index), at and above are the
    * arriving batch. Same split discipline as the text side's
    * `Dedup.IncrementalSplit`. */
  val MediaIncrementalSplit = 200L

  /** INCREMENTAL media curation — the steady-state twin of
    * [[multimodalMediaCuration]], mirroring the text side's
    * `dedup_incremental`: an arriving media batch PROBES the existing
    * corpus's banded fingerprint index instead of re-clustering the lake.
    * Candidates come from the existing⋈batch band-bucket equi-join only —
    * the corpus is never re-paired against itself — then exact
    * `bit_count(xor)` verifies at hamming ≤ [[AhashMaxHamming]], and each
    * batch image reports the canonical existing image it duplicates (min
    * id) or `kept = true`. Intra-batch duplicates are the full clustering
    * pass's job, exactly as on the text side.
    *
    * Scale shape: at 100 TB the corpus side is a PRECOMPUTED banded index
    * (media × bands rows, written once); per batch the work is one
    * decode+fingerprint pass over the batch, one equi-join probe into the
    * index, and bucket-bounded verification — batch-sized, not
    * corpus-sized. Here both sides derive from one fingerprint pass so the
    * oracle can replay the whole derivation. */
  def multimodalCurationIncremental(spark: SparkSession, dir: String): DataFrame = {
    val h = imageAhash(spark, dir).toDF().localCheckpoint()
    val banded = ahashBanded(h)
    val ex = banded.filter(col("media_id") < MediaIncrementalSplit).as("e")
    val nw = banded.filter(col("media_id") >= MediaIncrementalSplit).as("n")
    val verified = ex.join(nw,
        col("e.band") === col("n.band") && col("e.bkt") === col("n.bkt") &&
          col("e.bits") === col("n.bits"))
      .filter(bit_count(col("e.ahash").bitwiseXOR(col("n.ahash"))) <= AhashMaxHamming)
      .select(col("e.media_id").as("dup_src"), col("n.media_id").as("media_id"))
      .distinct()
    h.filter(col("media_id") >= MediaIncrementalSplit).select("media_id")
      .join(verified, Seq("media_id"), "left")
      .groupBy("media_id").agg(min(col("dup_src")).as("dup_of"))
      .select(col("media_id"), col("dup_of"), col("dup_of").isNull.as("kept"))
      .orderBy("media_id")
  }

  /** Exact frame-set Jaccard threshold for [[multimodalVideoNeardup]]. */
  val VideoJaccardTau = 0.5

  /** VIDEO-style near-duplicate media by MinHash over FRAME-HASH SETS —
    * the content-level video dedup move: two media whose sampled frame
    * sets largely overlap (re-encodes, trims, shared b-roll) are near-dups
    * even when no single byte sequence matches. Composes two gated
    * machines: the deterministic frame sampler ([[sampleFrames]]) supplies
    * each medium's frame-hash set, and [[Dedup.minhashBandBuckets]] (the
    * text pipeline's 32-hash / 8-band signature, same fixed coefficients)
    * generates candidate pairs from band-bucket collisions; exact set
    * Jaccard on candidates only verifies at τ = [[VideoJaccardTau]].
    * Scale shape identical to text MinHash dedup: one 32-buffer min
    * aggregation per medium (shuffle O(media × 32), independent of frame
    * count), bucket-bounded candidate equi-join, |candidates| ×
    * |frames-per-medium| verify — never media × media. */
  def multimodalVideoNeardup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable
    val media = {
      import spark.implicits._
      mediaFromDocuments(spark, dir).as[MediaRecord]
    }
    // distinct AFTER the mod-P31 reduction, so Spark and the oracle agree
    // on set sizes even if two 60-bit hashes collide in the reduced space
    val fh = sampleFrames(media)
      .select(col("media_id"),
        (Portable.hash60(col("frame_hash")) % Portable.P31).as("h"))
      .distinct()
    frameSetNeardupPairs(fh).orderBy("media_a", "media_b")
  }

  /** MinHash-banded near-dup pairs over a (media_id, h) DISTINCT
    * frame-hash-set relation — the tail shared by the text-frame and
    * REAL-decoded-frame video near-dup queries: 32-hash/8-band signatures
    * ([[Dedup.minhashBandBuckets]], the text pipeline's coefficients),
    * bucket-collision candidates, exact set Jaccard ≥ [[VideoJaccardTau]]
    * on candidates only. */
  private def frameSetNeardupPairs(fhIn: DataFrame): DataFrame = {
    val fh = fhIn.localCheckpoint() // feeds the signature agg and both verify probes
    val buckets = Dedup.minhashBandBuckets(fh, "media_id").localCheckpoint()
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkt") === col("y.bkt") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("y.media_id").as("media_b"))
      .distinct()
    val sz = fh.groupBy("media_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(fh.withColumnRenamed("media_id", "media_a"), "media_a")
      .join(fh.withColumnRenamed("media_id", "media_b"), Seq("media_b", "h"))
      .groupBy("media_a", "media_b").agg(count(lit(1)).as("c"))
    inter
      .join(sz.as("na"), col("media_a") === col("na.media_id"))
      .join(sz.as("nb"), col("media_b") === col("nb.media_id"))
      .select(col("media_a"), col("media_b"),
        round(col("c").cast("double") / (col("na.n") + col("nb.n") - col("c")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= VideoJaccardTau)
  }

  /** Frame-sampling stride for [[multimodalVideoNeardupReal]]: only every
    * k-th container frame pays the JPEG entropy decode — the dominant
    * cost of the lane (it was the registry's highest measured growth
    * tail, and the ONLY lane that decoded every frame of every video).
    * Position-stride sampling is exact for re-encodes and non-wrapping
    * brightness shifts (identical per-index content ⇒ identical sampled
    * sets) and DEGRADES for trims shorter than the stride — the accepted
    * production tradeoff (1-fps-style sampling); `MultimodalSpec`
    * measures exactly which planted sibling classes survive at this
    * fixture's tiny frame counts. The oracle replays the same stride, so
    * the gate stays exact. */
  val VideoNeardupStride = 2

  /** REAL-video near-dup: AVI container walk + JPEG entropy decode on
    * every [[VideoNeardupStride]]-th frame ([[Codecs.aviDecodeSampled]]),
    * per-frame [[ahashOf]] perceptual fingerprint, then the same
    * frame-SET MinHash discipline as [[multimodalVideoNeardup]] — set
    * semantics catch re-encodes (identical decoded frames) and
    * non-wrapping brightness shifts (aHash invariance) exactly, trims at
    * stride-degraded recall, the sibling classes the [[videoLake]]
    * families plant. DIB members reject during decode and never enter
    * the pair space. Scale shape: decode+hash is stateless map work (cut
    * ~stride-fold by sampling); everything after is the bounded bucket
    * join — never media × media. */
  def multimodalVideoNeardupReal(spark: SparkSession, dir: String): DataFrame =
    multimodalVideoNeardupRealStride(spark, dir, VideoNeardupStride)

  /** [[multimodalVideoNeardupReal]] with an explicit stride — stride 1 is
    * the all-frames form, kept callable for the recall-pinning spec. */
  private[graft] def multimodalVideoNeardupRealStride(
      spark: SparkSession, dir: String, stride: Int): DataFrame = {
    import graft.functions.Portable
    import spark.implicits._
    val fh = videoLake(spark, dir)
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { m =>
            try {
              val v = Codecs.aviDecodeSampled(m.payload, stride)
              v.video.frames.map(f => (m.media_id, ahashOf(f) % Portable.P31))
            } catch { case _: IllegalArgumentException => Nil }
          }
        }
      }
      .toDF("media_id", "h")
      .distinct() // frame SET semantics, after the mod-P31 reduction
    frameSetNeardupPairs(fh).orderBy("media_a", "media_b")
  }

  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resizeMedia(mediaLake(spark, dir).filter(col("mime").startsWith("image/"))
        .as[MediaRecord])
      .orderBy("media_id")
  }

  /** Media-ingest integrity audit — the manifest check a multimodal lake
    * runs before anything decodes: per source shard, record count, empty
    * payloads, byte totals/extremes, exact-duplicate payloads (rows minus
    * distinct content hashes — the pre-dedup signal), and declared-vs-
    * actual metadata mismatches (the `n_chars` column against the payload's
    * real length — a corrupt-transfer detector). One hash aggregation per
    * shard; every metric is integer-exact. */
  def multimodalIntegrity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("text"), col("n_chars"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("h"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_media"),
        sum(when(length(trim(col("text"))) === 0, 1L).otherwise(0L)).as("n_empty"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dup_payloads"),
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
          .as("n_meta_mismatch"))
      .orderBy("source")

  /** Cross-modal fusion — the join that pairs a document's TEXT signals
    * with its VECTOR representation (vec_id = doc_id in the driver
    * corpus): per source shard, document count, mean text-quality proxy
    * (distinct-token ratio, rounded before aggregation), and the per-
    * dimension embedding centroid of that shard's documents. The modality
    * join is an 8-byte-key equi-join; centroids are (sum, count) decimal
    * state per (source, dim) — the same exact-mean discipline as
    * sim_label_centroids, now keyed by a TEXT-side attribute. Long-form
    * (source, dim) output keeps the gate array-free. */
  def multimodalFusionCentroids(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.Portable.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        when(size(col("toks")) === 0, 0.0)
          .otherwise(round(size(array_distinct(col("toks"))).cast("double")
            / size(col("toks")), 6)).as("diversity"))
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"),
        posexplode(graft.functions.Portable.asDouble(col("embedding")))
          .as(Seq("i", "x")))
    q.join(vecs, "doc_id")
      .groupBy(col("source"), (col("i") + 1).cast("int").as("dim"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("diversity")), 6).as("min_diversity"),
        round(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .cast("double") / count(lit(1)), 6).as("centroid"))
      .orderBy("source", "dim")
  }

  /** Shared oracle CTE chain ending in `bits(media_id, n, ahash)` — the
    * codec-free closed-form twin of [[imageAhash]]. */
  private val ahashCtes =
    s"""WITH img AS (
       |  SELECT doc_id AS media_id, doc_id % 12 AS v,
       |         5 + doc_id % 12 AS w, 3 + doc_id % 7 AS h
       |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 12 <> 10
       |), g AS (
       |  SELECT media_id, w * h AS n, p.i AS j,
       |         CASE WHEN v = 4 THEN (media_id * 17 + p.i * 11) % 256
       |              ELSE ((media_id * 31 + (3 * p.i) * 7) % 256
       |                  + (media_id * 31 + (3 * p.i + 1) * 7) % 256
       |                  + (media_id * 31 + (3 * p.i + 2) * 7) % 256) // 3 END AS gray
       |  FROM img, LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS i) p
       |), m AS (
       |  SELECT media_id, n, sum(gray) // n AS mean FROM g GROUP BY media_id, n
       |), bits AS (
       |  SELECT g.media_id, m.n,
       |         CAST(coalesce(sum(CASE WHEN g.gray > m.mean AND g.j < $AhashBits
       |              THEN 1::BIGINT << g.j ELSE 0 END), 0) AS BIGINT) AS ahash
       |  FROM g JOIN m USING (media_id) GROUP BY g.media_id, m.n
       |)""".stripMargin

  /** Shared oracle CTE chain ending in `pbits(media_id, phash)` — the
    * codec-free closed-form twin of [[phashOf]]. The 8×8 integer cosine
    * table is EMBEDDED as literals (same longs both engines), the 8×8
    * resample indexes the gray lattice closed form directly, and the
    * median threshold reproduces the sorted-rank midpoint in integers —
    * the whole derivation is integer-exact on both sides. */
  private lazy val phashCtes = {
    val dctValues = (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u, $x, ${phashDctTable(u)(x)})").mkString(", ")
    s"""WITH img AS (
       |  SELECT doc_id AS media_id, doc_id % 12 AS v,
       |         5 + doc_id % 12 AS w, 3 + doc_id % 7 AS h
       |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 12 <> 10
       |), dct(cu, cx, c) AS (
       |  SELECT * FROM (VALUES $dctValues)
       |), px AS (
       |  SELECT i.media_id, i.v, gv.g AS gv, gu.g AS gu,
       |         ((2 * gv.g + 1) * i.h // 16) * i.w
       |           + ((2 * gu.g + 1) * i.w // 16) AS j
       |  FROM img i,
       |       LATERAL (SELECT unnest(generate_series(0, 7)) AS g) gu,
       |       LATERAL (SELECT unnest(generate_series(0, 7)) AS g) gv
       |), pg AS (
       |  SELECT media_id, gv, gu,
       |         CASE WHEN v = 4 THEN (media_id * 17 + j * 11) % 256
       |              ELSE ((media_id * 31 + (3 * j) * 7) % 256
       |                  + (media_id * 31 + (3 * j + 1) * 7) % 256
       |                  + (media_id * 31 + (3 * j + 2) * 7) % 256) // 3
       |         END AS gray
       |  FROM px
       |), coef AS (
       |  SELECT p.media_id, d2.cu AS fv, d1.cu AS fu,
       |         sum(p.gray * d1.c * d2.c) AS f
       |  FROM pg p
       |  JOIN dct d1 ON d1.cx = p.gu
       |  JOIN dct d2 ON d2.cx = p.gv
       |  GROUP BY 1, 2, 3
       |), ac AS (
       |  SELECT media_id, fv * 8 + fu - 1 AS idx, f
       |  FROM coef WHERE fv * 8 + fu BETWEEN 1 AND 60
       |), ranked AS (
       |  SELECT media_id, idx, f,
       |         row_number() OVER (PARTITION BY media_id
       |                            ORDER BY f, idx) AS r
       |  FROM ac
       |), thr AS (
       |  SELECT media_id, sum(CASE WHEN r IN (30, 31) THEN f END) AS s2
       |  FROM ranked GROUP BY media_id
       |), pbits AS (
       |  SELECT a.media_id,
       |         CAST(coalesce(sum(CASE WHEN 2 * a.f > t.s2
       |              THEN 1::BIGINT << CAST(a.idx AS INTEGER)
       |              ELSE 0 END), 0) AS BIGINT) AS phash
       |  FROM ac a JOIN thr t USING (media_id) GROUP BY a.media_id
       |)""".stripMargin
  }

  /** Shared oracle CTE chain ending in `abits(media_id, nw, afp)` — the
    * codec-free closed-form twin of [[audioFpOf]]: per-variant |sample|
    * closed forms, whole [[AfpWindow]]-sample windows over the first
    * [[AfpMaxSamples]], integer cross-multiplied above-mean bits. */
  /** Shared audio-lake CTE: one row per decodable WAV clip with variant
    * key and interleaved value count — the ONE place the lake's variant
    * map lives in oracle SQL (a lake revision edits it once). `extraWhere`
    * appends predicates (the shingle query's pad-offset fence). */
  private def audCte(extraWhere: String = ""): String =
    s"""aud AS (
       |  SELECT doc_id AS media_id, doc_id % 12 AS v,
       |         CASE WHEN doc_id % 12 = 5 THEN 2 * (16 + doc_id % 50)
       |              ELSE 16 + doc_id % 50 END AS len
       |  FROM documents
       |  WHERE doc_id % 2 = 1 AND doc_id % 12 <> 11$extraWhere
       |)""".stripMargin

  /** Shared |sample| closed form (per variant, at value index `k.i`). */
  private def audioAbsSampleExpr: String =
    """abs(CASE WHEN v IN (3, 9)
      |              THEN ((media_id * 13 + k.i * 29) % 256 - 128) * 256
      |              ELSE (media_id * 13 + k.i * 29) % 4096 - 2048 END)""".stripMargin

  private val audioFpCtes =
    s"""WITH ${audCte()}, geo AS (
       |  SELECT media_id, v,
       |         least(len, $AfpMaxSamples) - least(len, $AfpMaxSamples) % $AfpWindow AS m
       |  FROM aud
       |), s AS (
       |  SELECT media_id, m, k.i // $AfpWindow AS k,
       |         $audioAbsSampleExpr AS av
       |  FROM geo, LATERAL (SELECT unnest(generate_series(0, m - 1)) AS i) k
       |), tot AS (
       |  SELECT media_id, m, sum(av) AS total FROM s GROUP BY media_id, m
       |), win AS (
       |  SELECT media_id, m, k, sum(av) AS ws FROM s GROUP BY media_id, m, k
       |), abits AS (
       |  SELECT w.media_id, w.m // $AfpWindow AS nw,
       |         CAST(coalesce(sum(CASE WHEN w.k < $AhashBits AND w.ws * w.m > t.total * $AfpWindow
       |              THEN 1::BIGINT << w.k ELSE 0 END), 0) AS BIGINT) AS afp
       |  FROM win w JOIN tot t USING (media_id, m)
       |  GROUP BY w.media_id, w.m
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Frame hashes are text-domain (md5 of codepoint chunks), so the
    // oracle recomputes the whole MinHash/verify pipeline with the SAME
    // fixed (a, b) coefficients the text dedup oracles embed.
    "multimodal_video_neardup" ->
      s"""WITH fr AS (
         |  SELECT doc_id AS media_id,
         |         ('0x' || substr(md5(md5(substr(text, f.i * $FrameChars + 1, $FrameChars))), 1, 15))::BIGINT
         |           % 2147483647 AS h
         |  FROM documents,
         |       LATERAL (SELECT unnest(generate_series(0, (length(text) - 1) // $FrameChars)) AS i) f
         |  WHERE length(text) > 0
         |), fh AS (
         |  SELECT DISTINCT media_id, h FROM fr
         |), params(i, a, b) AS (VALUES ${Dedup.paramsValues}),
         |sig AS (
         |  SELECT media_id, i, min((a * h + b) % 2147483647) AS mh
         |  FROM fh CROSS JOIN params GROUP BY media_id, i
         |), buckets AS (
         |  SELECT media_id, i // 4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkt
         |  FROM sig GROUP BY media_id, i // 4
         |), cand AS (
         |  SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.media_id < y.media_id
         |), sz AS (
         |  SELECT media_id, count(*) AS n FROM fh GROUP BY media_id
         |), inter AS (
         |  SELECT c.media_a, c.media_b, count(*) AS c
         |  FROM cand c
         |  JOIN fh a ON a.media_id = c.media_a
         |  JOIN fh b ON b.media_id = c.media_b AND b.h = a.h
         |  GROUP BY c.media_a, c.media_b
         |)
         |SELECT media_a, media_b,
         |       round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
         |FROM inter
         |JOIN sz na ON media_a = na.media_id
         |JOIN sz nb ON media_b = nb.media_id
         |WHERE round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) >= $VideoJaccardTau
         |ORDER BY media_a, media_b""".stripMargin,

    // REAL-video near-dup oracle: the whole pipeline replayed codec-free —
    // per-frame aHash from the [[videoFrameSpec]] closed form (flat blocks
    // → gray = block value; floor-mean over the full frame; above-mean bit
    // per pixel, first 60), then the SAME MinHash/band/verify chain as the
    // text-frame video oracle with the same fixed coefficients.
    "multimodal_video_neardup_real" ->
      s"""WITH vid AS (
         |  SELECT doc_id AS media_id, doc_id // 4 AS g, doc_id % 4 AS v,
         |         13 + (doc_id // 4) % 12 AS w, 9 + (doc_id // 4) % 7 AS h,
         |         3 + (doc_id // 4) % 3 AS nf
         |  FROM documents
         |  WHERE NOT (doc_id % 4 = 1 AND (doc_id // 4) % 7 = 5)
         |), fr AS (
         |  SELECT media_id, g, v, w, h, f.i AS f,
         |         CASE WHEN v = 2 THEN 8 ELSE 0 END AS sh
         |  FROM vid, LATERAL (SELECT unnest(generate_series(
         |       CASE WHEN v = 3 THEN 1 ELSE 0 END, nf - 1)) AS i) f
         |  -- stride sampling on the CONTAINER frame index (trim variants
         |  -- start at spec frame 1 = container index 0), same stride as
         |  -- the engine's sampled decode
         |  WHERE (f.i - CASE WHEN v = 3 THEN 1 ELSE 0 END) % $VideoNeardupStride = 0
         |), tot AS (
         |  SELECT media_id, f, w, h,
         |         sum(((g * 23 + (31 + 16 * (g % 11)) * bx.i
         |               + (41 + 32 * (g % 5)) * by.i + 97 * f + sh) % 256)
         |             * least(8, w - 8 * bx.i) * least(8, h - 8 * by.i)) AS total
         |  FROM fr,
         |       LATERAL (SELECT unnest(generate_series(0, (w - 1) // 8)) AS i) bx,
         |       LATERAL (SELECT unnest(generate_series(0, (h - 1) // 8)) AS i) by
         |  GROUP BY media_id, f, w, h
         |), pix AS (
         |  SELECT media_id, f, j.i AS j,
         |         (g * 23 + (31 + 16 * (g % 11)) * ((j.i % w) // 8)
         |          + (41 + 32 * (g % 5)) * ((j.i // w) // 8)
         |          + 97 * f + sh) % 256 AS pv
         |  FROM fr, LATERAL (SELECT unnest(generate_series(0,
         |       least($AhashBits, w * h) - 1)) AS i) j
         |), ah AS (
         |  SELECT p.media_id, p.f,
         |         sum(CASE WHEN p.pv > t.total // (t.w * t.h)
         |             THEN 1::BIGINT << p.j ELSE 0::BIGINT END) AS ahash
         |  FROM pix p JOIN tot t ON p.media_id = t.media_id AND p.f = t.f
         |  GROUP BY p.media_id, p.f
         |), fh AS (
         |  SELECT DISTINCT media_id, ahash % 2147483647 AS h FROM ah
         |), params(i, a, b) AS (VALUES ${Dedup.paramsValues}),
         |sig AS (
         |  SELECT media_id, i, min((a * h + b) % 2147483647) AS mh
         |  FROM fh CROSS JOIN params GROUP BY media_id, i
         |), buckets AS (
         |  SELECT media_id, i // 4 AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkt
         |  FROM sig GROUP BY media_id, i // 4
         |), cand AS (
         |  SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.media_id < y.media_id
         |), sz AS (
         |  SELECT media_id, count(*) AS n FROM fh GROUP BY media_id
         |), inter AS (
         |  SELECT c.media_a, c.media_b, count(*) AS c
         |  FROM cand c
         |  JOIN fh a ON a.media_id = c.media_a
         |  JOIN fh b ON b.media_id = c.media_b AND b.h = a.h
         |  GROUP BY c.media_a, c.media_b
         |)
         |SELECT media_a, media_b,
         |       round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
         |FROM inter
         |JOIN sz na ON media_a = na.media_id
         |JOIN sz nb ON media_b = nb.media_id
         |WHERE round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) >= $VideoJaccardTau
         |ORDER BY media_a, media_b""".stripMargin,

    "multimodal_media_curation" ->
      s"""${ahashCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")}
         |, banded AS (
         |  SELECT media_id, ahash, least(n, $AhashBits) AS nb, band,
         |         (ahash >> (band * $AhashBandBits)) & $AhashBandMask AS bkt
         |  FROM bits CROSS JOIN
         |       (SELECT unnest(generate_series(0, ${AhashBands - 1})) AS band) bs
         |  WHERE ahash <> 0
         |), vpairs AS (
         |  SELECT DISTINCT x.media_id AS a, y.media_id AS b
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.bkt = y.bkt AND x.nb = y.nb
         |       AND x.media_id < y.media_id
         |  WHERE bit_count(xor(x.ahash, y.ahash)) <= $AhashMaxHamming
         |), gedges AS (
         |  SELECT a AS n, b AS m FROM vpairs
         |  UNION SELECT b, a FROM vpairs
         |), reach AS (
         |  SELECT n AS node, n AS lbl FROM gedges
         |  UNION
         |  SELECT e.m AS node, r.lbl FROM reach r JOIN gedges e ON e.n = r.node
         |), comp AS (
         |  SELECT node, min(lbl) AS component FROM reach GROUP BY node
         |), assigned AS (
         |  SELECT b2.media_id, coalesce(c.component, b2.media_id) AS cluster_id
         |  FROM bits b2 LEFT JOIN comp c ON b2.media_id = c.node
         |), sizes AS (
         |  SELECT cluster_id, count(*) AS cluster_size FROM assigned GROUP BY cluster_id
         |)
         |SELECT a.media_id, a.cluster_id, s.cluster_size,
         |       a.media_id = a.cluster_id AS is_canonical
         |FROM assigned a JOIN sizes s USING (cluster_id)
         |ORDER BY a.media_id""".stripMargin,

    // Replays the whole shingled-fingerprint derivation in closed form:
    // |sample| stream → whole-window energies (originals ∪ the +2-window
    // silence-padded twins) → peak-quantized levels → 4-gram shingle
    // hashes (the hash60 convention) → df-capped posting lists →
    // containment. Predicts BOTH the planted shifted twins and any
    // natural matches.
    "multimodal_audio_shingle_neardup" ->
      s"""WITH ${audCte(s" AND doc_id < $AudioPadOffset")}, s AS (
         |  SELECT media_id, len, k.i AS i,
         |         $audioAbsSampleExpr AS av
         |  FROM aud, LATERAL (SELECT unnest(generate_series(0, len - 1)) AS i) k
         |), w0 AS (
         |  SELECT media_id, i // $AfpWindow AS k, sum(av) AS ws
         |  FROM s WHERE i < len - len % $AfpWindow
         |  GROUP BY media_id, i // $AfpWindow
         |), allw AS (
         |  SELECT media_id, k, ws FROM w0
         |  UNION ALL
         |  SELECT media_id + $AudioPadOffset, k + ${AudioPadValues / AfpWindow}, ws FROM w0
         |  UNION ALL
         |  SELECT DISTINCT media_id + $AudioPadOffset, p.i, 0 FROM w0,
         |       LATERAL (SELECT unnest(generate_series(0, ${AudioPadValues / AfpWindow - 1})) AS i) p
         |), lvl AS (
         |  SELECT media_id, k, ws, max(ws) OVER (PARTITION BY media_id) AS mx
         |  FROM allw
         |), lv AS (
         |  SELECT media_id, k, (ws * $AudioLevelScale) // mx AS l
         |  FROM lvl WHERE mx > 0
         |), sh AS (
         |  SELECT DISTINCT a.media_id,
         |         ('0x' || substr(md5(a.l::VARCHAR || ',' || b.l::VARCHAR || ','
         |            || c.l::VARCHAR || ',' || d.l::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM lv a
         |  JOIN lv b ON b.media_id = a.media_id AND b.k = a.k + 1
         |  JOIN lv c ON c.media_id = a.media_id AND c.k = a.k + 2
         |  JOIN lv d ON d.media_id = a.media_id AND d.k = a.k + 3
         |), post AS (
         |  SELECT h, list_sort(list(DISTINCT media_id)) AS ds FROM sh GROUP BY h
         |  HAVING count(DISTINCT media_id) <= ${Dedup.MaxShingleDf}
         |), szs AS (
         |  SELECT u.m AS media_id, count(*) AS n
         |  FROM post, LATERAL (SELECT unnest(ds) AS m) u GROUP BY u.m
         |), pr AS (
         |  SELECT x.m AS media_a, y.m AS media_b, count(*) AS c
         |  FROM post, LATERAL (SELECT unnest(ds) AS m) x,
         |       LATERAL (SELECT unnest(ds) AS m) y
         |  WHERE x.m < y.m
         |  GROUP BY x.m, y.m
         |)
         |SELECT media_a, media_b,
         |       round(CAST(c AS DOUBLE) / least(na.n, nb.n), 6) AS containment
         |FROM pr
         |JOIN szs na ON media_a = na.media_id
         |JOIN szs nb ON media_b = nb.media_id
         |WHERE least(na.n, nb.n) >= $AudioMinShingles
         |  AND round(CAST(c AS DOUBLE) / least(na.n, nb.n), 6) >= $AudioShingleTau
         |ORDER BY media_a, media_b""".stripMargin,

    "multimodal_curation_incremental" ->
      s"""$ahashCtes
         |, banded AS (
         |  SELECT media_id, ahash, least(n, $AhashBits) AS nb, band,
         |         (ahash >> (band * $AhashBandBits)) & $AhashBandMask AS bkt
         |  FROM bits CROSS JOIN
         |       (SELECT unnest(generate_series(0, ${AhashBands - 1})) AS band) bs
         |  WHERE ahash <> 0
         |), vpairs AS (
         |  SELECT DISTINCT e.media_id AS dup_src, n.media_id AS media_id
         |  FROM banded e JOIN banded n
         |    ON e.band = n.band AND e.bkt = n.bkt AND e.nb = n.nb
         |  WHERE e.media_id < $MediaIncrementalSplit
         |    AND n.media_id >= $MediaIncrementalSplit
         |    AND bit_count(xor(e.ahash, n.ahash)) <= $AhashMaxHamming
         |)
         |SELECT b.media_id, min(v.dup_src) AS dup_of,
         |       min(v.dup_src) IS NULL AS kept
         |FROM bits b LEFT JOIN vpairs v ON b.media_id = v.media_id
         |WHERE b.media_id >= $MediaIncrementalSplit
         |GROUP BY b.media_id
         |ORDER BY b.media_id""".stripMargin,

    "multimodal_audio_fingerprint" ->
      s"""$audioFpCtes
         |SELECT media_id, CAST(nw AS INTEGER) AS n_windows,
         |       CAST(afp AS BIGINT) AS afp,
         |       CAST(bit_count(afp) AS INTEGER) AS n_ones
         |FROM abits ORDER BY media_id""".stripMargin,

    "multimodal_audio_neardup" ->
      s"""$audioFpCtes
         |, banded AS (
         |  SELECT media_id, afp, nw, band,
         |         (afp >> (band * $AhashBandBits)) & $AhashBandMask AS bkt
         |  FROM abits CROSS JOIN
         |       (SELECT unnest(generate_series(0, ${AhashBands - 1})) AS band) bs
         |  WHERE afp <> 0
         |)
         |SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
         |       CAST(bit_count(xor(x.afp, y.afp)) AS INTEGER) AS hamming
         |FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bkt = y.bkt AND x.nw = y.nw
         |     AND x.media_id < y.media_id
         |WHERE bit_count(xor(x.afp, y.afp)) <= $AhashMaxHamming
         |ORDER BY media_a, media_b""".stripMargin,

    "multimodal_fusion_centroids" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |         CASE WHEN trim(text) = '' THEN 0.0
         |              ELSE round(CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
         |                   / len(string_split_regex(trim(text), '\\s+')), 6) END AS diversity
         |  FROM documents
         |), v AS (
         |  SELECT vec_id AS doc_id, generate_subscripts(embedding, 1) AS dim,
         |         unnest(embedding)::DOUBLE AS x
         |  FROM embeddings
         |)
         |SELECT source, CAST(dim AS INTEGER) AS dim, count(*) AS n_docs,
         |       round(min(diversity), 6) AS min_diversity,
         |       round(CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*), 6) AS centroid
         |FROM q JOIN v USING (doc_id)
         |GROUP BY source, dim
         |ORDER BY source, dim""".stripMargin,

    "multimodal_integrity" ->
      """SELECT source, count(*) AS n_media,
        |       CAST(count(*) FILTER (WHERE length(trim(text)) = 0) AS BIGINT) AS n_empty,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
        |       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_payloads,
        |       CAST(count(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT) AS n_meta_mismatch
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // The decode oracles know NOTHING about BMP/WAV layout: they recompute
    // the synthetic pixel/sample closed forms ([[imageSpec]]/[[audioSpec]])
    // directly from doc_id. Agreement therefore proves the Spark side's
    // encode→decode round trip reconstructed the exact value sequence.
    // Variant key v = doc_id % 12 (see [[mediaLake]]'s table). The oracles
    // know NOTHING about the containers: they recompute the pixel/sample
    // closed forms per variant and EXCLUDE the two ids the decoders must
    // reject — so a decoder that silently accepts (or a fallback that
    // leaks into the decode lane) breaks row counts, not just values.
    "multimodal_resize" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, doc_id % 12 AS v,
        |         5 + doc_id % 12 AS w, 3 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 12 <> 10
        |), t AS (
        |  SELECT media_id, v, w, h, (w + 1) // 2 AS tw, (h + 1) // 2 AS th FROM img
        |)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(tw AS INTEGER) AS thumb_w, CAST(th AS INTEGER) AS thumb_h,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + (2 * y.i * w + 2 * x.i) * 11) % 256
        |                ELSE (media_id * 31 + (3 * (2 * y.i * w + 2 * x.i)) * 7) % 256 END) AS BIGINT) AS thumb_sum_r,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + (2 * y.i * w + 2 * x.i) * 11) % 256
        |                ELSE (media_id * 31 + (3 * (2 * y.i * w + 2 * x.i) + 1) * 7) % 256 END) AS BIGINT) AS thumb_sum_g,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + (2 * y.i * w + 2 * x.i) * 11) % 256
        |                ELSE (media_id * 31 + (3 * (2 * y.i * w + 2 * x.i) + 2) * 7) % 256 END) AS BIGINT) AS thumb_sum_b
        |FROM t,
        |     LATERAL (SELECT unnest(generate_series(0, th - 1)) AS i) y,
        |     LATERAL (SELECT unnest(generate_series(0, tw - 1)) AS i) x
        |GROUP BY media_id, v, w, h, tw, th
        |ORDER BY media_id""".stripMargin,

    "multimodal_decode_image" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, doc_id % 12 AS v,
        |         5 + doc_id % 12 AS w, 3 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 12 <> 10
        |)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(w * h AS BIGINT) AS n_pixels,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + p.i * 11) % 256
        |                ELSE (media_id * 31 + (3 * p.i) * 7) % 256 END) AS BIGINT) AS sum_r,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + p.i * 11) % 256
        |                ELSE (media_id * 31 + (3 * p.i + 1) * 7) % 256 END) AS BIGINT) AS sum_g,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + p.i * 11) % 256
        |                ELSE (media_id * 31 + (3 * p.i + 2) * 7) % 256 END) AS BIGINT) AS sum_b
        |FROM img, LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS i) p
        |GROUP BY media_id, v, w, h
        |ORDER BY media_id""".stripMargin,

    // File-ingest twin: staged to real files and read back via binaryFile,
    // the lane must reproduce the in-row decode_image lane EXACTLY — same
    // closed-form oracle, so a staging, listing, filename-keying, or
    // file-content defect reddens this row independently.
    "media_ingest_files" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, doc_id % 12 AS v,
        |         5 + doc_id % 12 AS w, 3 + doc_id % 7 AS h
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id % 12 <> 10
        |)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(w * h AS BIGINT) AS n_pixels,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + p.i * 11) % 256
        |                ELSE (media_id * 31 + (3 * p.i) * 7) % 256 END) AS BIGINT) AS sum_r,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + p.i * 11) % 256
        |                ELSE (media_id * 31 + (3 * p.i + 1) * 7) % 256 END) AS BIGINT) AS sum_g,
        |       CAST(sum(CASE WHEN v = 4 THEN (media_id * 17 + p.i * 11) % 256
        |                ELSE (media_id * 31 + (3 * p.i + 2) * 7) % 256 END) AS BIGINT) AS sum_b
        |FROM img, LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS i) p
        |GROUP BY media_id, v, w, h
        |ORDER BY media_id""".stripMargin,

    // Variant-BLIND JPEG oracle: pure [[jpegSpec]] closed form (per-block
    // flat value × covered-pixel count), no container knowledge at all —
    // the four encode variants (4:4:4 / 4:2:0+DRI / grayscale / 4:2:2) must all
    // reconstruct identical content through real entropy decode + IDCT.
    "multimodal_decode_jpeg" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, 13 + doc_id % 12 AS w, 9 + doc_id % 7 AS h
        |  FROM documents
        |), blk AS (
        |  SELECT media_id, w, h,
        |         (media_id * 23 + 31 * bx.i + 41 * by.i) % 256 AS v,
        |         least(8, w - 8 * bx.i) AS nx, least(8, h - 8 * by.i) AS ny
        |  FROM img,
        |       LATERAL (SELECT unnest(generate_series(0, (w - 1) // 8)) AS i) bx,
        |       LATERAL (SELECT unnest(generate_series(0, (h - 1) // 8)) AS i) by
        |)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(w * h AS BIGINT) AS n_pixels,
        |       CAST(sum(v * nx * ny) AS BIGINT) AS sum_r,
        |       CAST(sum(v * nx * ny) AS BIGINT) AS sum_g,
        |       CAST(sum(v * nx * ny) AS BIGINT) AS sum_b
        |FROM blk GROUP BY media_id, w, h
        |ORDER BY media_id""".stripMargin,

    // Variant-blind GIF oracle: GIF is lossless, so the [[gifSpec]] gray
    // closed form replays exactly for all three STILL variants (plain /
    // GCE-extension / interlaced — agreement proves the LZW decode, the
    // extension walk, and the de-interlace all reconstruct identical
    // content); the animated members are EXCLUDED (the still decoder must
    // reject them), so a decoder that takes an animation's first frame
    // breaks the row count.
    "multimodal_decode_gif" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id, 17 + doc_id % 16 AS w, 11 + doc_id % 9 AS h
        |  FROM documents WHERE doc_id % 4 <> 3
        |), px AS (
        |  SELECT media_id, w, h, (media_id * 29 + j.i * 17) % 256 AS v
        |  FROM img,
        |       LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS i) j
        |)
        |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(w * h AS BIGINT) AS n_pixels,
        |       CAST(sum(v) AS BIGINT) AS sum_r,
        |       CAST(sum(v) AS BIGINT) AS sum_g,
        |       CAST(sum(v) AS BIGINT) AS sum_b
        |FROM px GROUP BY media_id, w, h
        |ORDER BY media_id""".stripMargin,

    // Variant-blind VIDEO oracle: the [[videoFrameSpec]] closed form per
    // (family, frame, block) — no container knowledge. The three MJPEG
    // variants (4:4:4 / 4:2:0+DRI re-encode / grayscale brightness-shift)
    // must reconstruct their declared frame content through the real
    // RIFF walk + entropy decode; trimmed members drop frame 0; the DIB
    // families are EXCLUDED (the decoder must reject them), so a decoder
    // that accepts uncompressed frames — or loses an MJPEG member —
    // breaks the row count, not just sums.
    "multimodal_decode_video" ->
      s"""WITH vid AS (
         |  SELECT doc_id AS media_id, doc_id // 4 AS g, doc_id % 4 AS v,
         |         13 + (doc_id // 4) % 12 AS w, 9 + (doc_id // 4) % 7 AS h,
         |         3 + (doc_id // 4) % 3 AS nf
         |  FROM documents
         |  WHERE NOT (doc_id % 4 = 1 AND (doc_id // 4) % 7 = 5)
         |), fr AS (
         |  SELECT media_id, g, v, w, h, nf, f.i AS f
         |  FROM vid, LATERAL (SELECT unnest(generate_series(
         |       CASE WHEN v = 3 THEN 1 ELSE 0 END, nf - 1)) AS i) f
         |), blk AS (
         |  SELECT media_id, w, h, nf, v,
         |         (g * 23 + (31 + 16 * (g % 11)) * bx.i + (41 + 32 * (g % 5)) * by.i
         |          + 97 * f + CASE WHEN v = 2 THEN 8 ELSE 0 END) % 256 AS val,
         |         least(8, w - 8 * bx.i) AS nx, least(8, h - 8 * by.i) AS ny
         |  FROM fr,
         |       LATERAL (SELECT unnest(generate_series(0, (w - 1) // 8)) AS i) bx,
         |       LATERAL (SELECT unnest(generate_series(0, (h - 1) // 8)) AS i) by
         |)
         |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         |       CAST(CASE WHEN v = 3 THEN nf - 1 ELSE nf END AS INTEGER) AS n_frames,
         |       CAST($VideoUsPerFrame AS INTEGER) AS us_per_frame,
         |       CAST(w * h * (CASE WHEN v = 3 THEN nf - 1 ELSE nf END) AS BIGINT) AS n_pixels,
         |       CAST(sum(val * nx * ny) AS BIGINT) AS sum_r,
         |       CAST(sum(val * nx * ny) AS BIGINT) AS sum_g,
         |       CAST(sum(val * nx * ny) AS BIGINT) AS sum_b
         |FROM blk GROUP BY media_id, w, h, nf, v
         |ORDER BY media_id""".stripMargin,

    "multimodal_decode_audio" ->
      """WITH aud AS (
        |  SELECT doc_id AS media_id, doc_id % 12 AS v, 16 + doc_id % 50 AS n
        |  FROM documents WHERE doc_id % 2 = 1 AND doc_id % 12 <> 11
        |), s AS (
        |  SELECT media_id, v, CASE WHEN v = 5 THEN 2 * n ELSE n END AS ns,
        |         CASE WHEN v IN (3, 9)
        |              THEN ((media_id * 13 + k.i * 29) % 256 - 128) * 256
        |              ELSE (media_id * 13 + k.i * 29) % 4096 - 2048 END AS val
        |  FROM aud, LATERAL (SELECT unnest(generate_series(0,
        |       (CASE WHEN v = 5 THEN 2 * n ELSE n END) - 1)) AS i) k
        |)
        |SELECT media_id, CAST(ns AS BIGINT) AS n_samples,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(CASE WHEN v = 5 THEN 2 ELSE 1 END AS INTEGER) AS channels,
        |       CAST(max(abs(val)) AS BIGINT) AS peak,
        |       CAST(sum(val * val) AS BIGINT) AS energy
        |FROM s GROUP BY media_id, v, ns ORDER BY media_id""".stripMargin,

    // FLAC oracle: lossless codec, so the decoded samples ARE the closed-
    // form lattice — the oracle regenerates it in pure integer SQL and
    // aggregates. Any Rice/predictor/CRC/block-boundary bug on the encode
    // OR decode side (or a clip silently dropped by an integrity check)
    // breaks n_samples, peak, or energy.
    "multimodal_decode_flac" ->
      s"""WITH aud AS (
         |  SELECT doc_id AS media_id, 64 + (doc_id % 5) * 192 AS n FROM documents
         |), s AS (
         |  SELECT media_id, n,
         |         CASE WHEN ((k.i // ${FlacLakeBlock}) % 3) = 2 THEN media_id % 100
         |              ELSE ((media_id * 31 + k.i * 17) % 4001) - 2000 END AS val
         |  FROM aud, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) k
         |)
         |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
         |       CAST(8000 AS INTEGER) AS sample_rate,
         |       CAST(1 AS INTEGER) AS channels,
         |       CAST(max(abs(val)) AS BIGINT) AS peak,
         |       CAST(sum(val * val) AS BIGINT) AS energy
         |FROM s GROUP BY media_id, n ORDER BY media_id""".stripMargin,

    // µ-law oracle: the stored code bytes are the closed form, so the
    // decoded sample is the CCITT expansion u = 255 - b; t = ((u mod 16)*8
    // + 132) << ((u div 16) mod 8); sample = ±(t - 132) — pure integer SQL.
    // A decoder that mis-walks the 18-byte fmt / fact chunks, drops the
    // complement, or mis-shifts a segment breaks peak AND energy.
    "multimodal_decode_mulaw" ->
      """WITH aud AS (
        |  SELECT doc_id AS media_id, 16 + doc_id % 50 AS n FROM documents
        |), c AS (
        |  SELECT media_id, n, 255 - (media_id * 7 + k.i * 13) % 256 AS u
        |  FROM aud, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) k
        |), s AS (
        |  SELECT media_id, n,
        |         CASE WHEN u >= 128
        |              THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
        |              ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132
        |         END AS val
        |  FROM c
        |)
        |SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST(max(abs(val)) AS BIGINT) AS peak,
        |       CAST(sum(val * val) AS BIGINT) AS energy
        |FROM s GROUP BY media_id, n ORDER BY media_id""".stripMargin,

    // TAR ingest oracle: grouping and member naming are closed forms of
    // doc_id, and the member CONTENT is the document text itself — so
    // size and md5 recompute straight off the table. Any ustar walk bug
    // (checksum, octal size, 512-padding, name NUL-trim) breaks a hash
    // or the row count.
    "archive_ingest" ->
      s"""SELECT doc_id // ${TarGroup} AS archive_id,
         |       'doc_' || doc_id || '.txt' AS member,
         |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         |       md5(text) AS content_hash
         |FROM documents
         |ORDER BY archive_id, member""".stripMargin,

    // Nested-ingest oracle: grouping, the direct-vs-inner split, the
    // inner container's name, AND the quarantine set are all closed
    // forms of doc_id — a recursion bug (lost inner member, wrong
    // composite name, corrupt bundle flowing through as data) breaks
    // rows or hashes. Inner members carry the `<outer>!<inner>` name.
    "archive_ingest_nested" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, doc_id // $TarGroup AS g,
         |         doc_id % $TarGroup AS r
         |  FROM documents
         |)
         |SELECT g AS archive_id,
         |       CASE WHEN r < ${TarGroup / 2} THEN 'doc_' || doc_id || '.txt'
         |            ELSE (CASE WHEN g % 2 = 0 THEN 'inner_' || g || '.zip'
         |                       ELSE 'inner_' || g || '.tar.gz' END)
         |                 || '!doc_' || doc_id || '.txt' END AS member,
         |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
         |       md5(text) AS content_hash
         |FROM d WHERE g % 9 <> 5
         |UNION ALL
         |SELECT DISTINCT g, CAST(NULL AS VARCHAR), CAST(-1 AS BIGINT),
         |       CAST(NULL AS VARCHAR)
         |FROM d WHERE g % 9 = 5
         |ORDER BY archive_id, member""".stripMargin,

    // Variant-blind A/V oracle: the video side is the [[videoFrameSpec]]
    // flat-block closed form at family = media_id (both MJPEG variants
    // must reconstruct it through the container walk + entropy decode);
    // the audio side is the µ-law expansion closed form over the same
    // container's interleaved track. PCM-track members are EXCLUDED — a
    // demuxer that accepts them (or loses a µ-law member) breaks the row
    // count, and any interleave mistake breaks sample count or energy.
    "multimodal_decode_av" ->
      """WITH av AS (
        |  SELECT doc_id AS media_id,
        |         13 + doc_id % 12 AS w, 9 + doc_id % 7 AS h,
        |         2 + doc_id % 2 AS nf, 16 + doc_id % 50 AS n
        |  FROM documents WHERE doc_id % 3 <> 2
        |), blk AS (
        |  SELECT media_id, w, h, nf,
        |         (media_id * 23 + (31 + 16 * (media_id % 11)) * bx.i
        |          + (41 + 32 * (media_id % 5)) * by.i + 97 * f.i) % 256 AS val,
        |         least(8, w - 8 * bx.i) AS nx, least(8, h - 8 * by.i) AS ny
        |  FROM av,
        |       LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS i) f,
        |       LATERAL (SELECT unnest(generate_series(0, (w - 1) // 8)) AS i) bx,
        |       LATERAL (SELECT unnest(generate_series(0, (h - 1) // 8)) AS i) by
        |), vid AS (
        |  SELECT media_id, sum(val * nx * ny) AS s FROM blk GROUP BY media_id
        |), smp AS (
        |  SELECT media_id,
        |         CASE WHEN u >= 128
        |              THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
        |              ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132
        |         END AS val
        |  FROM (SELECT media_id, 255 - (media_id * 7 + k.i * 13) % 256 AS u
        |        FROM av, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) k)
        |), aud AS (
        |  SELECT media_id, max(abs(val)) AS peak, sum(val * val) AS energy
        |  FROM smp GROUP BY media_id
        |)
        |SELECT av.media_id, CAST(w AS INTEGER) AS width,
        |       CAST(h AS INTEGER) AS height, CAST(nf AS INTEGER) AS n_frames,
        |       CAST(w * h * nf AS BIGINT) AS n_pixels,
        |       CAST(vid.s AS BIGINT) AS sum_r, CAST(vid.s AS BIGINT) AS sum_g,
        |       CAST(vid.s AS BIGINT) AS sum_b,
        |       CAST(av.n AS BIGINT) AS n_samples,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(aud.peak AS BIGINT) AS peak,
        |       CAST(aud.energy AS BIGINT) AS energy
        |FROM av JOIN vid USING (media_id) JOIN aud USING (media_id)
        |ORDER BY media_id""".stripMargin,

    "multimodal_route" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |         ascii(substr(text, 1, 1)) % 3 AS route
        |  FROM documents
        |)
        |SELECT media_id, 'image' AS modality, 'n_pixels' AS metric,
        |       CAST(octet_length(encode(text)) * 3 AS BIGINT) AS value
        |FROM m WHERE route = 0
        |UNION ALL
        |SELECT media_id, 'audio', 'duration_ms',
        |       CAST(octet_length(encode(text)) * 8 AS BIGINT)
        |FROM m WHERE route = 1
        |UNION ALL
        |SELECT media_id, 'text', 'n_tokens',
        |       CAST(CASE WHEN trim(text) = '' THEN 0
        |            ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
        |FROM m WHERE route = 2
        |ORDER BY media_id""".stripMargin,

    // Codec-free aHash twin: gray/mean/bit closed forms per variant. The
    // shared CTE chain ends at per-image (media_id, n, ahash).
    "multimodal_ahash" ->
      s"""$ahashCtes
         |SELECT media_id, CAST(n AS BIGINT) AS n_pixels,
         |       CAST(ahash AS BIGINT) AS ahash,
         |       CAST(bit_count(ahash) AS INTEGER) AS n_ones
         |FROM bits ORDER BY media_id""".stripMargin,

    // Codec-free pHash twin: integer DCT over the 8×8 lattice resample,
    // with the SAME embedded cosine table the kernel uses.
    "multimodal_phash" ->
      s"""$phashCtes
         |SELECT b.media_id, CAST(i.w AS INTEGER) AS width,
         |       CAST(i.h AS INTEGER) AS height, b.phash,
         |       CAST(bit_count(b.phash) AS INTEGER) AS n_ones
         |FROM pbits b JOIN img i USING (media_id)
         |ORDER BY media_id""".stripMargin,

    "multimodal_phash_neardup" ->
      s"""$phashCtes
         |, banded AS (
         |  SELECT media_id, phash, band,
         |         (phash >> (band * $PhashBandBits)) & $PhashBandMask AS bkt
         |  FROM pbits CROSS JOIN
         |       (SELECT unnest(generate_series(0, ${PhashBands - 1})) AS band) bs
         |  WHERE phash <> 0
         |)
         |SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
         |       CAST(bit_count(xor(x.phash, y.phash)) AS INTEGER) AS hamming
         |FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bkt = y.bkt AND x.media_id < y.media_id
         |WHERE bit_count(xor(x.phash, y.phash)) <= $PhashMaxHamming
         |ORDER BY media_a, media_b""".stripMargin,

    "multimodal_image_neardup" ->
      s"""$ahashCtes
         |, banded AS (
         |  SELECT media_id, ahash, least(n, $AhashBits) AS nb, band,
         |         (ahash >> (band * $AhashBandBits)) & $AhashBandMask AS bkt
         |  FROM bits CROSS JOIN
         |       (SELECT unnest(generate_series(0, ${AhashBands - 1})) AS band) bs
         |  WHERE ahash <> 0
         |)
         |SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
         |       CAST(bit_count(xor(x.ahash, y.ahash)) AS INTEGER) AS hamming
         |FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bkt = y.bkt AND x.nb = y.nb
         |     AND x.media_id < y.media_id
         |WHERE bit_count(xor(x.ahash, y.ahash)) <= $AhashMaxHamming
         |ORDER BY media_a, media_b""".stripMargin,

    "multimodal_frame_dedup" ->
      s"""WITH frames AS (
         |  SELECT doc_id AS media_id,
         |         md5(substr(text, f.i * $FrameChars + 1, $FrameChars)) AS frame_hash
         |  FROM documents,
         |       LATERAL (SELECT unnest(generate_series(0, (length(text) - 1) // $FrameChars)) AS i) f
         |  WHERE length(text) > 0
         |)
         |SELECT frame_hash, count(DISTINCT media_id) AS n_media,
         |       count(*) AS n_frames, min(media_id) AS first_media
         |FROM frames GROUP BY frame_hash HAVING count(DISTINCT media_id) > 1
         |ORDER BY frame_hash""".stripMargin,

    // Per-variant container sizes are closed forms of the geometry alone:
    // BMP24 = 54 + paddedrow*h; PNG = h*(1+3w) + 68 (stored-block zlib);
    // RLE8 = 54 + 1024-byte palette + 2wh + 2h (repeat-free runs);
    // BMP32 = 54 + 4wh; WAV = 44 + bytes(+RIFF pad). A one-byte drift in
    // any encoder header/padding path reddens this row set.
    "multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 12 AS v, 5 + doc_id % 12 AS w,
        |         3 + doc_id % 7 AS h, 16 + doc_id % 50 AS n
        |  FROM documents
        |)
        |SELECT doc_id AS media_id,
        |       CASE WHEN v IN (2, 8) THEN 'image/png'
        |            WHEN doc_id % 2 = 0 THEN 'image/bmp'
        |            ELSE 'audio/wav' END AS mime,
        |       CAST(CASE
        |            WHEN v IN (0, 6) THEN 54 + ((3 * w + 3) // 4 * 4) * h
        |            WHEN v IN (2, 8) THEN h * (1 + 3 * w) + 68
        |            WHEN v = 4 THEN 54 + 1024 + 2 * w * h + 2 * h
        |            WHEN v = 10 THEN 54 + 4 * w * h
        |            WHEN v IN (1, 7) THEN 44 + 2 * n
        |            WHEN v IN (3, 9) THEN 44 + n + n % 2
        |            WHEN v = 5 THEN 44 + 4 * n
        |            ELSE 44 + 3 * n + (3 * n) % 2 END AS BIGINT) AS n_bytes,
        |       v NOT IN (10, 11) AS decode_ok,
        |       CAST(CASE
        |            WHEN v IN (10, 11) THEN 0
        |            WHEN doc_id % 2 = 0 THEN w * h
        |            WHEN v = 5 THEN 2 * n
        |            ELSE n END AS BIGINT) AS n_values
        |FROM m ORDER BY media_id""".stripMargin,

    "multimodal_frames" ->
      s"""SELECT doc_id AS media_id, CAST(f.i AS INTEGER) AS frame_idx,
         |       md5(substr(text, f.i * $FrameChars + 1, $FrameChars)) AS frame_hash
         |FROM documents,
         |     LATERAL (SELECT unnest(generate_series(0, (length(text) - 1) // $FrameChars)) AS i) f
         |WHERE length(text) > 0
         |ORDER BY media_id, frame_idx""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features"     -> (multimodalFeatures _),
    "multimodal_decode_image" -> (multimodalDecodeImage _),
    "media_ingest_files" -> (multimodalMediaIngestFiles _),
    "multimodal_decode_jpeg" -> (multimodalDecodeJpeg _),
    "multimodal_decode_gif" -> (multimodalDecodeGif _),
    "multimodal_decode_mulaw" -> (multimodalDecodeMulaw _),
    "multimodal_decode_flac"  -> (multimodalDecodeFlac _),
    "multimodal_decode_av" -> (multimodalDecodeAv _),
    "archive_ingest" -> (multimodalArchiveIngest _),
    "archive_ingest_nested" -> (multimodalArchiveIngestNested _),
    "multimodal_decode_video" -> (multimodalDecodeVideo _),
    "multimodal_decode_audio" -> (multimodalDecodeAudio _),
    "multimodal_frames"      -> (multimodalFrames _),
    "multimodal_frame_dedup" -> (multimodalFrameDedup _),
    "multimodal_route"       -> (multimodalRoute _),
    "multimodal_resize"      -> (multimodalResize _),
    "multimodal_ahash"       -> (multimodalAhash _),
    "multimodal_phash"       -> (multimodalPhash _),
    "multimodal_phash_neardup" -> (multimodalPhashNeardup _),
    "multimodal_image_neardup" -> (multimodalImageNeardup _),
    "multimodal_audio_fingerprint" -> (multimodalAudioFingerprint _),
    "multimodal_audio_neardup" -> (multimodalAudioNeardup _),
    "multimodal_audio_shingle_neardup" -> (multimodalAudioShingleNeardup _),
    "multimodal_video_neardup" -> (multimodalVideoNeardup _),
    "multimodal_video_neardup_real" -> (multimodalVideoNeardupReal _),
    "multimodal_media_curation" -> (multimodalMediaCuration _),
    "multimodal_curation_incremental" -> (multimodalCurationIncremental _),
    "multimodal_integrity"   -> (multimodalIntegrity _),
    "multimodal_fusion_centroids" -> (multimodalFusionCentroids _),
  )
}
