package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video handled as opaque
  * `binary` content plus typed metadata, with decode / feature-extract /
  * resize / frame-sample staged as distributed transforms.
  *
  * The HEADER decode is real: [[HeaderCodec.decode]] parses PNG IHDR,
  * JPEG SOF0/1/2, WAV fmt/data, and MP4 mvhd/tkhd with pure byte
  * arithmetic — no external codec. The media table is synthesized into
  * genuine containers (valid signatures, chunk CRCs, zlib IDAT, RIFF
  * sizes, ISO-BMFF boxes) because the sandbox has no media files, so
  * the extraction pipeline exercises the same parse a production ingest
  * would run. The one remaining stub is PIXEL/SAMPLE decode
  * ([[resizeStub]] stands in for a pixel-buffer resize): decompressing
  * image pixels or PCM frames needs a real codec library and is the
  * single component swapped for a JNI/FFmpeg/PIL-backed implementation
  * (in PySpark this stage would be `mapInPandas`; the Scala-native
  * equivalent is `mapPartitions` over an Encoder'd case class, used
  * here).
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque bytes + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      container: String, // png | jpeg | wav | mp4 | unknown
      decode_ok: Boolean,
      n_bytes: Int,
      width: Int, // parsed from the real container header
      height: Int,
      duration_ms: Long,
      channels: Int,
      content_hash: String,
      n_frames_sampled: Int)

  /** Parsed container header: the typed metadata a real pipeline
    * extracts before any pixel/sample decode.
    */
  final case class MediaHeader(
      container: String, width: Int, height: Int,
      durationMs: Long, channels: Int)

  /** Deterministic per-doc media geometry (dims/duration/channels are a
    * pure function of doc_id so specs can recompute them exactly).
    */
  private[multimodal] def geom(id: Long): (Int, Int, Long, Int) = {
    val w = 160 + (id % 8).toInt * 80 // 160..720
    val h = 120 + ((id / 8) % 8).toInt * 60 // 120..540
    val durMs = 100L + (id % 50) * 10 // 100..590 (audio), scaled for video
    val ch = 1 + (id % 2).toInt
    (w, h, durMs, ch)
  }

  /** Build a deterministic media table from the documents corpus: text
    * bytes wrapped in REAL containers (PNG for even image ids, JPEG for
    * odd; WAV for audio; MP4 for video) so the downstream header decode
    * parses genuine signatures, chunks, and boxes — the schema,
    * partitioning, and batch shape of a real ingest.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.queries.Queries.t(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        col("source"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val (w, h, durMs, ch) = geom(r.media_id)
        val bytes = r.kind match {
          case "image" if r.media_id % 2 == 0 => HeaderCodec.synthPng(w, h, r.content)
          case "image" => HeaderCodec.synthJpeg(w, h, r.content)
          case "audio" => HeaderCodec.synthWav(ch, 8000, durMs)
          case _ => HeaderCodec.synthMp4(w, h, durMs * 20, r.content)
        }
        r.copy(content = bytes)
      })
      .toDF()
  }

  /** Partition-level decode + feature extraction: the distributed stage.
    * Batch shape: one pass per partition, no driver collection, output
    * columnar-friendly fixed schema. Undecodable content quarantines as
    * `decode_ok = false` with zeroed geometry (a production pipeline
    * routes these rows to a dead-letter table, never throws mid-scan).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, frameEveryMs: Long = 5000L): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions { rows =>
        val md5 = java.security.MessageDigest.getInstance("MD5") // one per partition, not per row
        rows.map { r =>
          val hdr = HeaderCodec.decode(r.content)
          val (w, h, dur, ch) = hdr match {
            case Some(m) => (m.width, m.height, m.durationMs, m.channels)
            case None => (0, 0, 0L, 0)
          }
          val frames = if (dur == 0) 1 else (1 + dur / frameEveryMs).toInt
          md5.reset()
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            container = hdr.map(_.container).getOrElse("unknown"),
            decode_ok = hdr.isDefined,
            n_bytes = r.content.length,
            width = w, height = h, duration_ms = dur, channels = ch,
            content_hash = graft.codec.Hex.encode(md5.digest(r.content)),
            n_frames_sampled = frames)
        }
      }
      .toDF()
  }

  /** "Resize" stage — the one REMAINING stub, and deliberately so:
    * producing resized pixel buffers requires decompressing IDAT/DCT/PCM
    * payloads, which needs a codec library this container lacks. The
    * binary→binary partition transform around it (the Spark shape) is
    * real; a production build swaps the payload function only.
    */
  def resizeStub(spark: SparkSession, media: DataFrame, targetBytes: Int = 256): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val out = java.util.Arrays.copyOf(r.content, targetBytes)
          r.copy(content = out)
        }
      }
      .toDF()
      .withColumnRenamed("content", "content_resized")
  }
}
