package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val payload = "the quick brown fox".getBytes("UTF-8")

  test("PNG IHDR decode: synthesized and hand-built headers give exact geometry") {
    assert(HeaderCodec.decode(HeaderCodec.synthPng(640, 480, payload))
      .contains(Multimodal.MediaHeader("png", 640, 480, 0L, 3)))
    // hand-built (independent of the synthesizer): 8-byte signature +
    // IHDR with width 31, height 17, bit depth 8, color type 0 (gray)
    val b = java.nio.ByteBuffer.allocate(8 + 8 + 13 + 4)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(31).putInt(17).put(8.toByte).put(0.toByte)
    b.put(0.toByte).put(0.toByte).put(0.toByte).putInt(0 /* crc unchecked */)
    assert(HeaderCodec.decode(b.array())
      .contains(Multimodal.MediaHeader("png", 31, 17, 0L, 1)))
    // gray+alpha color type 4 → 2 channels
    val ga = b.array().clone(); ga(25) = 4
    assert(HeaderCodec.decode(ga).map(_.channels).contains(2))
  }

  test("JPEG SOF decode: baseline and progressive, segments skipped correctly") {
    assert(HeaderCodec.decode(HeaderCodec.synthJpeg(320, 240, payload))
      .contains(Multimodal.MediaHeader("jpeg", 320, 240, 0L, 3)))
    // hand-built progressive (SOF2) single-component frame
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    out.write(0xff); out.write(0xc2) // SOF2
    val sof = java.nio.ByteBuffer.allocate(11)
    sof.putShort(11.toShort) // segment length
    sof.put(8.toByte).putShort(77.toShort).putShort(55.toShort).put(1.toByte)
    sof.put(1.toByte).put(0x11.toByte).put(0.toByte)
    out.write(sof.array())
    assert(HeaderCodec.decode(out.toByteArray)
      .contains(Multimodal.MediaHeader("jpeg", 55, 77, 0L, 1)))
  }

  test("WAV fmt/data decode: duration is exactly dataSize*1000/byteRate") {
    assert(HeaderCodec.decode(HeaderCodec.synthWav(2, 8000, 1000))
      .contains(Multimodal.MediaHeader("wav", 0, 0, 1000L, 2)))
    assert(HeaderCodec.decode(HeaderCodec.synthWav(1, 44100, 250))
      .map(_.durationMs).contains(250L))
  }

  test("MP4 mvhd/tkhd decode: duration from timescale, dims from 16.16 fixed point") {
    assert(HeaderCodec.decode(HeaderCodec.synthMp4(1280, 720, 30000, payload))
      .contains(Multimodal.MediaHeader("mp4", 1280, 720, 30000L, 0)))
  }

  test("corrupt RIFF chunk sizes quarantine instead of spinning (zero/negative step)") {
    // chunk size 0xFFFFFFF8 makes the word-aligned step 8 + (-8) + 0 == 0:
    // before the guard this walked in place forever
    val wav = HeaderCodec.synthWav(1, 8000, 100)
    val evil = wav.clone()
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, 0xfffffff8) // fmt chunk size field
    assert(HeaderCodec.decode(evil).isEmpty)
    // a merely-too-large size (beyond the buffer) also quarantines
    val evil2 = wav.clone()
    java.nio.ByteBuffer.wrap(evil2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, wav.length + 100)
    assert(HeaderCodec.decode(evil2).isEmpty)
  }

  test("MP4 largesize (size==1) and version-1 mvhd/tkhd boxes parse") {
    // rebuild the synthesized MP4's top-level moov with a 64-bit largesize
    // header and upgrade mvhd/tkhd to version 1 (64-bit times/duration)
    def box64(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16 + payload.length)
      b.putInt(1).put(id.getBytes("US-ASCII")).putLong(16L + payload.length).put(payload)
      b.array()
    }
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(id.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val mvhdV1 = {
      val b = java.nio.ByteBuffer.allocate(112)
      b.putInt(0x01000000) // version 1 + flags
      b.putLong(0L).putLong(0L) // ctime/mtime (64-bit)
      b.putInt(1000) // timescale
      b.putLong(45000L) // duration (BE64)
      b.position(b.capacity()); b.array()
    }
    val tkhdV1 = {
      val b = java.nio.ByteBuffer.allocate(96)
      b.putInt(0x01000007)
      b.putLong(0L).putLong(0L) // ctime/mtime
      b.putInt(1).putInt(0) // track id, reserved
      b.putLong(45000L) // duration (BE64)
      b.putInt(0).putInt(0)
      b.putShort(0).putShort(0).putShort(0).putShort(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(v => b.putInt(v))
      b.putInt(1920 << 16).putInt(1080 << 16)
      b.array()
    }
    val ftyp = box("ftyp", "isomxxxxisommp41".getBytes("US-ASCII"))
    val full = ftyp ++ box64("moov", box("mvhd", mvhdV1) ++ box("trak", box("tkhd", tkhdV1)))
    assert(HeaderCodec.decode(full)
      .contains(Multimodal.MediaHeader("mp4", 1920, 1080, 45000L, 0)))
  }

  test("undecodable content quarantines as None, never throws") {
    assert(HeaderCodec.decode(Array.emptyByteArray).isEmpty)
    assert(HeaderCodec.decode("plain text, no container".getBytes).isEmpty)
    // valid signature, truncated body
    assert(HeaderCodec.decode(HeaderCodec.synthPng(10, 10, payload).take(12)).isEmpty)
    assert(HeaderCodec.decode(HeaderCodec.synthWav(1, 8000, 100).take(20)).isEmpty)
  }

  test("media table has the canonical schema, deterministic kinds, real containers") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "content", "source"))
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
    assert(media.count() > 0)
  }

  test("feature extraction decodes every real header; geometry matches the generator") {
    val media = Multimodal.mediaFromDocuments(spark, dir).repartition(4)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == media.count())
    // every synthesized container parses — no quarantined rows
    assert(feats.filter(col("decode_ok") === false).count() == 0)
    assert(feats.select("container").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("png", "jpeg", "wav", "mp4")))
    // parsed geometry equals the deterministic generator geometry —
    // the features really came from the container headers
    feats.select("media_id", "kind", "container", "width", "height", "duration_ms", "channels")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val (w, h, durMs, ch) = Multimodal.geom(id)
        r.getString(1) match {
          case "image" =>
            assert(r.getInt(3) == w && r.getInt(4) == h && r.getLong(5) == 0L)
            assert(r.getString(2) == (if (id % 2 == 0) "png" else "jpeg"))
          case "audio" =>
            assert(r.getString(2) == "wav")
            assert(r.getLong(5) == durMs && r.getInt(6) == ch)
          case "video" =>
            assert(r.getString(2) == "mp4")
            assert(r.getInt(3) == w && r.getInt(4) == h && r.getLong(5) == durMs * 20)
        }
      }
    // deterministic: re-running yields identical rows
    val again = Multimodal.extractFeatures(spark, media)
    assert(feats.orderBy("media_id").collect().toSeq ==
      again.orderBy("media_id").collect().toSeq)
    // images sample exactly one frame; audio/video sample by duration
    assert(feats.filter(col("kind") === "image" && col("n_frames_sampled") =!= 1).count() == 0)
  }

  test("resize stub preserves ids and produces fixed-size payloads") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val resized = Multimodal.resizeStub(spark, media, targetBytes = 128)
    assert(resized.count() == media.count())
    val lens = resized.select(length(col("content_resized"))).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq == Seq(128))
  }
}
