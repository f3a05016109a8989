package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video handled as opaque
  * `binary` content plus typed metadata, with decode / feature-extract /
  * resize / frame-sample staged as distributed transforms.
  *
  * The media codecs themselves are NOT available in this container, so
  * the byte-level decode is a clearly-marked deterministic stub
  * ([[stubDecode]]) — everything around it (schema, partition-level
  * batch processing, UDF signatures, output shapes) is the real Spark
  * plumbing a production pipeline would keep, swapping only the stub
  * for a JNI/FFmpeg/PIL-backed implementation (in PySpark this stage
  * would be `mapInPandas`; the Scala-native equivalent is
  * `mapPartitions` over an Encoder'd case class, used here).
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
      n_bytes: Int,
      width: Int, // stub-decoded "header" fields
      height: Int,
      duration_ms: Long,
      channels: Int,
      content_hash: String,
      n_frames_sampled: Int)

  /** STUB: a real implementation would decode the container header
    * (PNG/JPEG/WAV/MP4...). Deterministic fake derived from content
    * bytes so tests are stable and the pipeline shape is honest.
    */
  def stubDecode(content: Array[Byte], kind: String): (Int, Int, Long, Int) = {
    val h = java.util.Arrays.hashCode(content)
    val w = 160 + math.abs(h % 8) * 80 // "width"  160..720
    val ht = 120 + math.abs((h >> 3) % 8) * 60 // "height" 120..540
    val dur = if (kind == "image") 0L else 1000L + math.abs((h >> 6) % 60000)
    val ch = if (kind == "audio") 1 + math.abs(h % 2) else 3
    (w, ht, dur, ch)
  }

  /** Build a deterministic media table from the documents corpus (the
    * container has no real media files): content = utf8 bytes, kind
    * assigned round-robin. Schema/partitioning identical to a real
    * ingest.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    graft.queries.Queries.t(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        col("source"))
  }

  /** Partition-level decode + feature extraction: the distributed stage.
    * Batch shape: one pass per partition, no driver collection, output
    * columnar-friendly fixed schema.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, frameEveryMs: Long = 5000L): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions { rows =>
        val md5 = java.security.MessageDigest.getInstance("MD5") // one per partition, not per row
        rows.map { r =>
          val (w, h, dur, ch) = stubDecode(r.content, r.kind)
          val frames = if (dur == 0) 1 else (1 + dur / frameEveryMs).toInt
          md5.reset()
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            n_bytes = r.content.length,
            width = w, height = h, duration_ms = dur, channels = ch,
            content_hash = graft.codec.Hex.encode(md5.digest(r.content)),
            n_frames_sampled = frames)
        }
      }
      .toDF()
  }

  /** "Resize" stage: demonstrates a binary→binary partition transform
    * (stub: truncating/padding the payload deterministically, standing
    * in for a real pixel-buffer resize).
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
