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

/** Decoded features per media record. `feat` is the STUB decoder output. */
case class MediaFeatures(media_id: Long, n_bytes: Long, content_hash: String,
                         feat: Array[Float])

/** Multimodal-column plumbing: binary payloads with typed metadata, a
  * partition-batched feature extractor, and deterministic frame sampling.
  *
  * The DECODE step is a clearly-marked STUB (image/audio codecs are not in
  * this container): [[stubDecode]] derives deterministic fake features from
  * the bytes. Everything around it — the schema, the typed
  * `mapPartitions` with explicit batching (the JVM analog of a Pandas-UDF
  * `mapInPandas` batch shape), the per-record hashing, the frame explode —
  * is real, tested, and oracle-checked.
  */
object Multimodal {

  val BatchSize = 64
  val FrameChars = 16

  /** Demonstration media source: documents' text bytes as `binary` payload. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.fanOut(Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload")))

  /** STUB decoder ??? — replace with a real codec (JPEG/PNG/audio) when the
    * native libs are present. Deterministic fake: 4 floats derived from the
    * payload length and first bytes. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val n = payload.length
    Array(
      n.toFloat,
      (if (n > 0) payload(0) & 0xff else 0).toFloat,
      (if (n > 1) payload(1) & 0xff else 0).toFloat,
      (n % 255).toFloat)
  }

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Feature extraction over partition-local batches: each executor thread
    * pulls [[BatchSize]] records at a time (amortizing decoder init exactly
    * like a Pandas-UDF batch), hashes the payload, and runs the (stub)
    * decoder. Typed Dataset in/out — no driver round-trip, scales with
    * partitions. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // decoder/codec init would happen once per batch here
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.payload.length.toLong,
            md5hex(m.payload), stubDecode(m.payload))
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

  /** Thumbnail size (codepoints kept) for [[resizeMedia]]. */
  val ThumbSize = 32

  /** Deterministic STUB resize — the downsampling stage of an image/video
    * pipeline (a real codec would decode, scale, re-encode; the container
    * has no codecs, so the "resize" keeps every stride-th codepoint up to
    * [[ThumbSize]] — same batched typed-Dataset shape as
    * [[extractFeatures]], and the oracle recomputes the identical
    * sampling). Output: original size, thumbnail size, thumbnail hash —
    * the metadata a curation pass actually joins on. Codepoint-domain
    * sampling for the same surrogate-safety reason as [[sampleFrames]]. */
  def resizeMedia(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val s = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
          val cps = s.codePoints().toArray
          val stride = math.max(1, cps.length / ThumbSize)
          val kept = cps.indices.collect {
            case i if i % stride == 0 && i / stride < ThumbSize => cps(i) }
          val thumb = new String(kept.toArray, 0, kept.length)
          (m.media_id, cps.length.toLong, kept.length.toLong,
            md5hex(thumb.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }
    }.toDF("media_id", "orig_cps", "thumb_cps", "thumb_hash")
  }

  // --- oracle-gated query entry points -------------------------------------

  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, dir).as[MediaRecord]
    extractFeatures(media)
      .select(col("media_id"), col("n_bytes"), col("content_hash"))
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
    * payload byte mod 3, deterministic on both engines via ascii()), send
    * each row down its modality's branch (image → pixel estimate, audio →
    * duration estimate, text → token count), and union the branch outputs
    * back into one typed relation. The branches are independent narrow
    * pipelines over a shared scan — Catalyst collapses the three filters
    * into one pass per branch with no shuffle until the final sort; at
    * scale each branch would carry its own decoder (the [[extractFeatures]]
    * batched shape) without ever touching the other modalities' rows. */
  def multimodalRoute(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"),
        (ascii(substring(col("text"), 1, 1)) % 3).as("route"))
    val img = m.filter(col("route") === 0).select(
      col("media_id"), lit("image").as("modality"), lit("n_pixels").as("metric"),
      (octet_length(col("text").cast("binary")) * 3).cast("long").as("value"))
    val aud = m.filter(col("route") === 1).select(
      col("media_id"), lit("audio").as("modality"), lit("duration_ms").as("metric"),
      (octet_length(col("text").cast("binary")) * 8).cast("long").as("value"))
    val txt = m.filter(col("route") === 2).select(
      col("media_id"), lit("text").as("modality"), lit("n_tokens").as("metric"),
      size(graft.functions.Portable.tokens(col("text"))).cast("long").as("value"))
    img.unionByName(aud).unionByName(txt).orderBy("media_id")
  }

  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resizeMedia(mediaFromDocuments(spark, dir).as[MediaRecord])
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

  val oracle: Map[String, String] = Map(
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

    "multimodal_resize" ->
      s"""WITH p AS (
         |  SELECT doc_id AS media_id, text, length(text) AS n,
         |         greatest(1, length(text) // $ThumbSize) AS stride
         |  FROM documents
         |), k AS (
         |  SELECT media_id, text, n, stride,
         |         least($ThumbSize, (n + stride - 1) // stride) AS n_keep
         |  FROM p
         |)
         |SELECT media_id, CAST(n AS BIGINT) AS orig_cps,
         |       CAST(n_keep AS BIGINT) AS thumb_cps,
         |       md5(list_aggregate(
         |         list_transform(range(0, n_keep),
         |           i -> substr(text, CAST(1 + i * stride AS INTEGER), 1)),
         |         'string_agg', '')) AS thumb_hash
         |FROM k ORDER BY media_id""".stripMargin,

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

    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS content_hash
        |FROM documents ORDER BY media_id""".stripMargin,

    "multimodal_frames" ->
      s"""SELECT doc_id AS media_id, CAST(f.i AS INTEGER) AS frame_idx,
         |       md5(substr(text, f.i * $FrameChars + 1, $FrameChars)) AS frame_hash
         |FROM documents,
         |     LATERAL (SELECT unnest(generate_series(0, (length(text) - 1) // $FrameChars)) AS i) f
         |WHERE length(text) > 0
         |ORDER BY media_id, frame_idx""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features"    -> (multimodalFeatures _),
    "multimodal_frames"      -> (multimodalFrames _),
    "multimodal_frame_dedup" -> (multimodalFrameDedup _),
    "multimodal_route"       -> (multimodalRoute _),
    "multimodal_resize"      -> (multimodalResize _),
    "multimodal_integrity"   -> (multimodalIntegrity _),
    "multimodal_fusion_centroids" -> (multimodalFusionCentroids _),
  )
}
