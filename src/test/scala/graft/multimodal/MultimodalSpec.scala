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

  /** Expected corpus pts of video `id` frame `k`: the 500 ms stts
    * cadence plus the r9 ctts composition offset (0 when the id's clip
    * omits the box) — the same closed form the meta oracle embeds.
    */
  private def corpusPts(id: Long, k: Int): Long = {
    val off = Multimodal.cttsOffsetsMs(id)
    k * 500L + (if (off.isEmpty) 0L else off(k).toLong)
  }

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

  test("undersized/spilling MP4 boxes quarantine instead of reading neighbor bytes") {
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(id.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    // an 8-byte (payload-less) mvhd followed by a plausible sibling box:
    // field reads bounded by the parent would decode the SIBLING's bytes
    // as timescale/duration and report success
    val ftyp = box("ftyp", Array.fill[Byte](8)(0))
    val emptyMvhd = box("mvhd", Array.empty[Byte])
    val sibling = box("free", Array.fill[Byte](32)(0x42))
    val crafted = ftyp ++ box("moov", emptyMvhd ++ sibling)
    assert(HeaderCodec.decodeMp4(crafted).isEmpty,
      "empty mvhd must not read the next box's bytes as its fields")
    // a tkhd whose declared size spills past its enclosing trak
    val spillTkhd = {
      val b = java.nio.ByteBuffer.allocate(8)
      b.putInt(8 + 92).put("tkhd".getBytes("US-ASCII")) // declares 92-byte payload, has none
      b.array()
    }
    val mvhdOk = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0
      b.putInt(0).putInt(0) // ctime/mtime
      b.putInt(1000) // timescale — wait, v0 layout: see decodeMp4
      b.position(b.capacity()); b.array()
    }
    val crafted2 = ftyp ++ box("moov", box("trak", spillTkhd) ++ box("mvhd", mvhdOk))
    // the spilling tkhd must not contribute dimensions read outside the trak
    val got = HeaderCodec.decodeMp4(crafted2)
    assert(got.forall(h => h.width == 0 && h.height == 0),
      s"spilling tkhd produced geometry from neighbor bytes: $got")
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

  test("media frame is built once per (session, corpus) (r11 memo)") {
    // seven registry entries share the frame; a second consumer must
    // ride the cache, never re-pay the container encode (the
    // lshIndexWrites build-once idiom)
    Multimodal.mediaFromDocuments(spark, dir).count() // ensure built
    val before = Multimodal.mediaBuilds.get()
    val again = Multimodal.mediaFromDocuments(spark, dir)
    assert(again.count() > 0)
    assert(Multimodal.mediaBuilds.get() == before,
      "second mediaFromDocuments call re-ran the encode")
  }

  test("headerFeatures equals the extractFeatures geometry projection (r11)") {
    // the oracled geometry entry must never drift from the full
    // feature extractor's header columns: same header walk, same
    // frame-count policy — pinned by exact row equality here
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val cols = Seq("media_id", "kind", "container", "decode_ok", "width",
      "height", "duration_ms", "channels", "n_frames_sampled")
    val full = Multimodal.extractFeatures(spark, media)
      .select(cols.head, cols.tail: _*).orderBy("media_id").collect().toSeq
    val geom = Multimodal.headerFeatures(spark, media)
      .select(cols.head, cols.tail: _*).orderBy("media_id").collect().toSeq
    assert(geom == full)
  }

  test("feature extraction decodes every real header; geometry matches the generator") {
    val media = Multimodal.mediaFromDocuments(spark, dir).repartition(4)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == media.count())
    // every synthesized container parses — no quarantined rows
    assert(feats.filter(col("decode_ok") === false).count() == 0)
    assert(feats.select("container").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("png", "jpeg", "gif", "bmp", "wav", "mp4")))
    // parsed geometry equals the deterministic generator geometry —
    // the features really came from the container headers
    feats.select("media_id", "kind", "container", "width", "height", "duration_ms", "channels")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val (w, h, durMs, ch) = Multimodal.geom(id)
        r.getString(1) match {
          case "image" =>
            // animated GIFs (id%48==36) report their summed
            // graphic-control delays: 3 frames at 100 ms
            val expectDur = if (id % 48 == 36) 300L else 0L
            assert(r.getInt(3) == w && r.getInt(4) == h && r.getLong(5) == expectDur)
            val expectContainer =
              if (id % 24 == 12) "gif"
              else if (id % 96 == 0 || id % 96 == 48) "bmp"
              else if (id % 2 == 0) "png" else "jpeg"
            assert(r.getString(2) == expectContainer)
          case "audio" =>
            assert(r.getString(2) == "wav")
            assert(r.getLong(5) == durMs && r.getInt(6) == ch)
          case "video" =>
            assert(r.getString(2) == "mp4")
            // duration now comes from the REAL sample tables: n frames
            // at 500 ms on a 1000-unit timescale
            assert(r.getInt(3) == w && r.getInt(4) == h &&
              r.getLong(5) == Multimodal.videoFrameSizes(id).length * 500L)
        }
      }
    // deterministic: re-running yields identical rows
    val again = Multimodal.extractFeatures(spark, media)
    assert(feats.orderBy("media_id").collect().toSeq ==
      again.orderBy("media_id").collect().toSeq)
    // images sample exactly one frame — except animated GIFs, whose
    // REAL frame count comes from the block-level walk
    assert(feats.filter(col("kind") === "image" && col("media_id") % 48 =!= 36
      && col("n_frames_sampled") =!= 1).count() == 0)
    assert(feats.filter(col("kind") === "image" && col("media_id") % 48 === 36
      && col("n_frames_sampled") =!= 3).count() == 0)
  }

  test("MP4 sample tables: golden hand-built boxes yield exact offsets/pts/sync") {
    // frame sizes chosen to exercise multi-chunk layout (3-sample
    // chunks + a short trailing chunk) and per-sample stsz
    val sizes = Seq(16, 20, 24, 28, 32)
    val b = HeaderCodec.synthMp4Frames(320, 240, sizes, frameDurMs = 500, syncEvery = 3)
    // header decode still works on the stbl-bearing file
    assert(HeaderCodec.decode(b).contains(
      Multimodal.MediaHeader("mp4", 320, 240, 2500L, 0)))
    val samples = Mp4SampleTables.parse(b).get
    assert(samples.map(_.size) == sizes)
    assert(samples.map(_.ptsMs) == Seq(0L, 500L, 1000L, 1500L, 2000L))
    assert(samples.map(_.sync) == Seq(true, false, false, true, false)) // every 3rd, 1-based 1/4
    // offsets are contiguous within a chunk and every range lands on
    // its frame's wire marker 00 00 00 01 <i>...
    assert(samples(1).offset == samples(0).offset + 16)
    assert(samples(2).offset == samples(1).offset + 20)
    samples.foreach { s =>
      val o = s.offset.toInt
      assert(b(o) == 0 && b(o + 1) == 0 && b(o + 2) == 0 && b(o + 3) == 1,
        s"frame ${s.index} range missed the marker")
      assert(b(o + 4) == s.index.toByte, s"frame ${s.index} range hit another frame")
      assert(o + s.size <= b.length)
    }
    // absent stss: every sample is sync (ISO-BMFF default)
    val allSync = HeaderCodec.synthMp4Frames(64, 64, Seq(8, 8), 100, syncEvery = 1)
    assert(Mp4SampleTables.parse(allSync).get.forall(_.sync))
  }

  test("MP4 sample tables: ctts composition offsets give true pts (v0/v1), inconsistent counts quarantine") {
    // hand-built boxes (the generators never emit ctts — our encoder
    // has no B-frames — so the golden is built from 14496-12 §8.6.1.3
    // directly): 3 samples of 8 bytes, timescale 1000, stts delta 100
    // → dts 0/100/200; ctts then shifts presentation times.
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(id: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ id.getBytes("US-ASCII") ++ payload
    def full(id: String, version: Int, body: Array[Byte]): Array[Byte] =
      box(id, be32(version << 24) ++ body)
    def clip(ctts: Option[Array[Byte]]): Array[Byte] = {
      val stts = full("stts", 0, be32(1) ++ be32(3) ++ be32(100))
      val stsz = full("stsz", 0, be32(8) ++ be32(3)) // uniform 8-byte samples
      val stsc = full("stsc", 0, be32(1) ++ be32(1) ++ be32(3) ++ be32(1))
      val mdhd = full("mdhd", 0, be32(0) ++ be32(0) ++ be32(1000) ++ be32(300))
      // chunk offset = right after the moov tree; compute by building twice
      def tree(stcoOff: Int): Array[Byte] = {
        val stco = full("stco", 0, be32(1) ++ be32(stcoOff))
        val stbl = box("stbl", stts ++ ctts.getOrElse(Array.emptyByteArray) ++
          stsz ++ stsc ++ stco)
        val minf = box("minf", stbl)
        val mdia = box("mdia", mdhd ++ minf)
        box("moov", box("trak", mdia))
      }
      val moov = tree(0)
      val mdat = box("mdat", new Array[Byte](24))
      tree(moov.length + 8) ++ mdat
    }
    // no ctts: pts = dts
    assert(Mp4SampleTables.parse(clip(None)).get.map(_.ptsMs) ==
      Seq(0L, 100L, 200L))
    // v0 (unsigned): runs (1, 50), (2, 0) → pts 50/100/200
    val v0 = full("ctts", 0, be32(2) ++ be32(1) ++ be32(50) ++ be32(2) ++ be32(0))
    assert(Mp4SampleTables.parse(clip(Some(v0))).get.map(_.ptsMs) ==
      Seq(50L, 100L, 200L))
    // v1 (signed): B-frame reorder pushes pts before dts — (1, -50),
    // (1, 100), (1, -100) → pts -50/200/100
    val v1 = full("ctts", 1, be32(3) ++ be32(1) ++ be32(-50) ++
      be32(1) ++ be32(100) ++ be32(1) ++ be32(-100))
    assert(Mp4SampleTables.parse(clip(Some(v1))).get.map(_.ptsMs) ==
      Seq(-50L, 200L, 100L))
    // inconsistent counts quarantine: covering 2 of 3 samples, or 4 > 3
    val short = full("ctts", 0, be32(1) ++ be32(2) ++ be32(0))
    assert(Mp4SampleTables.parse(clip(Some(short))).isEmpty,
      "ctts covering fewer samples than stsz must quarantine")
    val over = full("ctts", 0, be32(1) ++ be32(4) ++ be32(0))
    assert(Mp4SampleTables.parse(clip(Some(over))).isEmpty,
      "ctts covering more samples than stsz must quarantine")
    // truncated run table quarantines (declared 2 runs, one present)
    val trunc = full("ctts", 0, be32(2) ++ be32(3) ++ be32(0))
    assert(Mp4SampleTables.parse(clip(Some(trunc))).isEmpty,
      "ctts run table past its box extent must quarantine")
  }

  test("MP4 sample tables: truncated/inconsistent tables quarantine, never garbage") {
    val good = HeaderCodec.synthMp4Frames(320, 240, Seq(16, 20, 24, 28, 32), 500, 3)
    assert(Mp4SampleTables.parse(good).isDefined)
    // truncate inside the mdat: declared ranges spill past the file
    val cutMdat = java.util.Arrays.copyOf(good, good.length - 24)
    assert(Mp4SampleTables.parse(cutMdat).isEmpty,
      "ranges past EOF must quarantine, not emit short frames")
    // corrupt the stsz sample count upward: stts no longer covers it
    val idx = {
      var i = -1
      var o = 0
      while (i < 0 && o + 4 <= good.length) {
        if (good(o) == 's' && good(o + 1) == 't' && good(o + 2) == 's' && good(o + 3) == 'z') i = o
        else o += 1
      }
      i
    }
    assert(idx > 0)
    val badCount = good.clone()
    badCount(idx + 4 + 4 + 3 + 4) = 99.toByte // sample_count low byte → 99
    assert(Mp4SampleTables.parse(badCount).isEmpty,
      "inconsistent stsz/stts counts must quarantine")
    // header-only MP4s (no stbl) parse as None and the features stage
    // falls back to the duration heuristic instead of failing
    val headerOnly = HeaderCodec.synthMp4(320, 240, 30000, Array[Byte](1, 2, 3))
    assert(Mp4SampleTables.parse(headerOnly).isEmpty)
  }

  test("sampleFrames: keyframe rows carry real byte ranges; non-MP4 dead-letters") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val frames = Multimodal.sampleFrames(spark, media)
    val rows = frames.collect()
    val ok = rows.filter(_.getAs[Boolean]("frame_ok"))
    val dead = rows.filter(!_.getAs[Boolean]("frame_ok"))
    assert(ok.nonEmpty, "no keyframes sampled")
    // every video row yields exactly its sync-sample count, every GIF
    // row its frame count (r7: frame sampling covers GIFs too); every
    // other row yields exactly one dead-letter row
    val videoIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    val gifIds = media.filter(col("kind") === "image" && col("media_id") % 24 === 12)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(dead.map(_.getAs[Long]("media_id")).toSet ==
      media.select("media_id").collect().map(_.getLong(0)).toSet -- videoIds -- gifIds)
    val byId = ok.groupBy(_.getAs[Long]("media_id"))
    assert(byId.keySet == videoIds ++ gifIds)
    byId.filter(kv => videoIds(kv._1)).foreach { case (id, rs) =>
      val n = Multimodal.videoFrameSizes(id).length
      val expectSync = (0 until n).count(_ % 3 == 0)
      assert(rs.length == expectSync, s"media $id: ${rs.length} vs $expectSync keyframes")
      rs.foreach { r =>
        val bytes = r.getAs[Array[Byte]]("frame_bytes")
        val i = r.getAs[Int]("frame_index")
        if (id % 2 == 0) {
          // marker MP4s: sizes and wire markers from the generator rule
          assert(bytes.length == Multimodal.videoFrameSizes(id)(i))
          assert(bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 0 && bytes(3) == 1 &&
            bytes(4) == i.toByte, s"media $id frame $i bytes are not the frame's own")
        } else {
          // AVC MP4s: each sample is a 4-byte length prefix + IDR NAL
          val len = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
          assert(len == bytes.length - 4, s"media $id frame $i NAL length prefix")
          assert((bytes(4) & 0x1f) == 5, s"media $id frame $i is not an IDR NAL")
        }
        assert(r.getAs[Long]("pts_ms") == corpusPts(id, i),
          s"media $id frame $i pts (ctts-aware)")
      }
    }
    // GIF rows: each emitted frame is a STANDALONE single-frame GIF
    // decoding to exactly the generator's quantized pixel field
    // (frame k of an animated id is keyed by id + 7k), pts at the
    // 100 ms graphic-control cadence
    assert(gifIds.exists(_ % 48 == 36), "corpus must carry an animated GIF")
    byId.filter(kv => gifIds(kv._1)).foreach { case (id, rs) =>
      val (w, h, _, _) = Multimodal.geom(id)
      val expectFrames = if (id % 48 == 36) 3 else 1
      assert(rs.length == expectFrames, s"media $id: ${rs.length} vs $expectFrames frames")
      rs.foreach { r =>
        val k = r.getAs[Int]("frame_index")
        assert(r.getAs[Long]("pts_ms") == (if (id % 48 == 36) k * 100L else 0L))
        val standalone = GifCodec.decode(r.getAs[Array[Byte]]("frame_bytes"))
        assert(standalone.isDefined, s"media $id frame $k is not a decodable GIF")
        val src = Multimodal.pixelsFor(if (id % 48 == 36) id + 7 * k else id, w, h, 3)
        val want = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          want(i * 3) = ((((src(i * 3) & 0xff) >> 5) * 255) / 7).toByte
          want(i * 3 + 1) = ((((src(i * 3 + 1) & 0xff) >> 5) * 255) / 7).toByte
          want(i * 3 + 2) = ((((src(i * 3 + 2) & 0xff) >> 6) * 255) / 3).toByte
          i += 1
        }
        assert(standalone.get.width == w && standalone.get.height == h)
        assert(standalone.get.pixels.toSeq == want.toSeq, s"media $id frame $k pixels")
      }
    }
    // the features stage reports the REAL keyframe count for video rows
    val feats = Multimodal.extractFeatures(spark, media)
    feats.filter(col("kind") === "video")
      .select("media_id", "n_frames_sampled").collect().foreach { r =>
        val n = Multimodal.videoFrameSizes(r.getLong(0)).length
        assert(r.getInt(1) == (0 until n).count(_ % 3 == 0))
      }
  }

  test("avcC parse: round-trips the writer's record; malformed records quarantine") {
    val src = H264Codec.Yuv420(32, 32,
      Array.tabulate(1024)(i => (i * 7).toByte),
      Array.fill(256)(100.toByte), Array.fill(256)(150.toByte))
    val enc = H264Codec.encodeYuv(src, qp = 30)
    val mp4 = HeaderCodec.synthMp4Avc(32, 32, enc.spsNal, enc.ppsNal,
      Seq((enc.idrNal, true)), frameDurMs = 500)
    val cfg = Mp4SampleTables.parseAvcc(mp4).get
    assert(cfg.spsNal.toSeq == enc.spsNal.toSeq, "SPS through avcC")
    assert(cfg.ppsNal.toSeq == enc.ppsNal.toSeq, "PPS through avcC")
    assert(cfg.lengthSize == 4)
    // the sample tables coexist with stsd: one sync sample, decodable
    val samples = Mp4SampleTables.parse(mp4).get
    assert(samples.length == 1 && samples.head.sync)
    val s = samples.head
    val frame = H264Codec.decodeAvcSample(cfg.spsNal, cfg.ppsNal,
      java.util.Arrays.copyOfRange(mp4, s.offset.toInt, (s.offset + s.size).toInt))
    assert(frame.isDefined)
    assert(java.util.Arrays.equals(frame.get.y, enc.recon.y), "pixels through the container")
    // marker MP4s have no stsd → no config
    assert(Mp4SampleTables.parseAvcc(
      HeaderCodec.synthMp4Frames(32, 32, Seq(16, 16), 500, 1)).isEmpty)
    // corrupt the configurationVersion byte: quarantine (find it by
    // searching for the avcC box id, version byte follows)
    val avccAt = (0 until mp4.length - 4)
      .find(i => new String(mp4, i, 4, "US-ASCII") == "avcC").get
    val bad = mp4.clone(); bad(avccAt + 4) = 9
    assert(Mp4SampleTables.parseAvcc(bad).isEmpty, "bad configurationVersion")
    // truncate the PPS length out of the record: quarantine
    val cut = java.util.Arrays.copyOf(mp4, avccAt + 10)
    assert(Mp4SampleTables.parseAvcc(cut).isEmpty, "truncated record")
  }

  test("decodeKeyframes: per-frame pixel rows for AVC videos, dead-letters elsewhere") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val rows = Multimodal.decodeKeyframes(spark, media).collect()
    val allIds = media.select("media_id").collect().map(_.getLong(0)).toSet
    val avcIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).filter(_ % 2 == 1).toSet
    val ok = rows.filter(_.getAs[Boolean]("decode_ok"))
    val dead = rows.filter(!_.getAs[Boolean]("decode_ok"))
    // every AVC video decodes all its keyframes; everything else (images,
    // audio, marker MP4s) dead-letters exactly once
    assert(ok.map(_.getAs[Long]("media_id")).toSet == avcIds)
    assert(dead.map(_.getAs[Long]("media_id")).toSet == allIds -- avcIds)
    assert(dead.length == (allIds -- avcIds).size)
    val byId = ok.groupBy(_.getAs[Long]("media_id"))
    byId.foreach { case (id, rs) =>
      val (w, h, _, _) = Multimodal.geom(id)
      val n = Multimodal.videoFrameSizes(id).length
      val syncIdx = (0 until n).filter(_ % 3 == 0)
      assert(rs.map(_.getAs[Int]("frame_index")).sorted.toSeq == syncIdx,
        s"video $id keyframe indexes")
      // the corpus GOPs are deblocked, so the expected recon is the
      // sequence encoder's (the filter rides the reconstruction)
      val seq = H264Codec.encodeSequence(
        Vector.tabulate(n)(k => Multimodal.videoYuv(id, k, w, h)),
        qp = 32, gop = 3, deblock = true)
      rs.foreach { r =>
        assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
        val k = r.getAs[Int]("frame_index")
        assert(r.getAs[Long]("pts_ms") == corpusPts(id, k),
          s"media $id frame $k pts (ctts-aware)")
        // luma stats equal the codec's own deterministic reconstruction
        val recon = seq.frames(k).recon
        var sum = 0L; var sumSq = 0L
        recon.y.foreach { b => val v = b & 0xff; sum += v; sumSq += v.toLong * v }
        val nPix = recon.y.length.toDouble
        assert(r.getAs[Double]("luma_mean") == math.rint(sum / nPix * 10000) / 10000,
          s"video $id frame $k luma_mean")
        assert(r.getAs[Double]("luma_rms") ==
          math.rint(math.sqrt(sumSq / nPix) * 10000) / 10000,
          s"video $id frame $k luma_rms")
      }
    }
    // an AVC MP4 whose sync sample is corrupted entropy dead-letters
    // per-frame (decode_ok=false row, pts preserved)
    val src = H264Codec.Yuv420(32, 32, Array.tabulate(1024)(i => (i * 13).toByte),
      Array.fill(256)(80.toByte), Array.fill(256)(170.toByte))
    val enc = H264Codec.encodeYuv(src, qp = 28)
    val mp4 = HeaderCodec.synthMp4Avc(32, 32, enc.spsNal, enc.ppsNal,
      Seq((enc.idrNal, true)), frameDurMs = 500)
    val s0 = Mp4SampleTables.parse(mp4).get.head
    val corrupt = mp4.clone()
    // zero the IDR NAL payload mid-sample (past prefix + NAL header)
    java.util.Arrays.fill(corrupt, s0.offset.toInt + 8,
      (s0.offset + s0.size).toInt, 0.toByte)
    import spark.implicits._
    val one = Seq(Multimodal.MediaRow(1L, "video", corrupt, "t")).toDF()
    val r = Multimodal.decodeKeyframes(spark, one).collect()
    assert(r.length == 1 && !r.head.getAs[Boolean]("decode_ok") &&
      r.head.getAs[Int]("frame_index") == 0 && r.head.getAs[Long]("pts_ms") == 0L)
  }

  test("decodeFrames: whole-GOP pixel rows (IDR + P); corruption poisons to the next IDR") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val rows = Multimodal.decodeFrames(spark, media).collect()
    val allIds = media.select("media_id").collect().map(_.getLong(0)).toSet
    val avcIds = media.filter(col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).filter(_ % 2 == 1).toSet
    val ok = rows.filter(_.getAs[Boolean]("decode_ok"))
    val dead = rows.filter(!_.getAs[Boolean]("decode_ok"))
    // every AVC clip decodes EVERY sample; everything else dead-letters once
    assert(ok.map(_.getAs[Long]("media_id")).toSet == avcIds)
    assert(dead.map(_.getAs[Long]("media_id")).toSet == allIds -- avcIds)
    assert(dead.length == (allIds -- avcIds).size)
    ok.groupBy(_.getAs[Long]("media_id")).foreach { case (id, rs) =>
      val (w, h, _, _) = Multimodal.geom(id)
      val n = Multimodal.videoFrameSizes(id).length
      assert(rs.map(_.getAs[Int]("frame_index")).sorted.toSeq == (0 until n),
        s"video $id must decode all $n samples")
      // bit-exact oracle: every frame's luma stats equal the encoder's
      // own reconstruction — IDRs AND motion-compensated P frames
      val seq = H264Codec.encodeSequence(
        Vector.tabulate(n)(k => Multimodal.videoYuv(id, k, w, h)), qp = 32, gop = 3,
        deblock = true)
      rs.foreach { r =>
        val k = r.getAs[Int]("frame_index")
        assert(r.getAs[Boolean]("sync") == (k % 3 == 0), s"video $id frame $k sync")
        assert(r.getAs[Long]("pts_ms") == corpusPts(id, k),
          s"media $id frame $k pts (ctts-aware)")
        assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
        val y = seq.frames(k).recon.y
        var sum = 0L; var sumSq = 0L
        y.foreach { b => val v = b & 0xff; sum += v; sumSq += v.toLong * v }
        val nPix = y.length.toDouble
        assert(r.getAs[Double]("luma_mean") == math.rint(sum / nPix * 10000) / 10000,
          s"video $id frame $k luma_mean")
        assert(r.getAs[Double]("luma_rms") ==
          math.rint(math.sqrt(sumSq / nPix) * 10000) / 10000,
          s"video $id frame $k luma_rms")
      }
    }
    // chain poisoning: corrupt P sample 1 of a 6-frame gop-3 clip —
    // frame 0 decodes, frames 1..2 dead-letter (poisoned chain), the
    // IDR at 3 recovers, 4..5 decode
    val frames6 = Vector.tabulate(6)(k => Multimodal.videoYuv(77L, k, 32, 32))
    val seq6 = H264Codec.encodeSequence(frames6, qp = 30, gop = 3)
    val mp4 = HeaderCodec.synthMp4Avc(32, 32, seq6.spsNal, seq6.ppsNal,
      seq6.frames.map(f => (f.nal, f.idr)), frameDurMs = 500)
    val s1 = Mp4SampleTables.parse(mp4).get(1)
    val corrupt = mp4.clone()
    java.util.Arrays.fill(corrupt, s1.offset.toInt + 6,
      (s1.offset + s1.size).toInt, 0.toByte)
    import spark.implicits._
    val one = Seq(Multimodal.MediaRow(5L, "video", corrupt, "t")).toDF()
    val got = Multimodal.decodeFrames(spark, one).collect()
      .map(r => r.getAs[Int]("frame_index") -> r.getAs[Boolean]("decode_ok"))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until 6), "pts accounting survives poisoning")
    val okByFrame = got.toMap
    assert(okByFrame(0), "IDR 0 decodes")
    assert(!okByFrame(1) && !okByFrame(2), "poisoned chain dead-letters per frame")
    assert(okByFrame(3) && okByFrame(4) && okByFrame(5), "IDR 3 recovers the chain")
  }

  test("zero-sync-sample MP4s dead-letter instead of silently vanishing") {
    // patch the stss entry count of a valid marker MP4 to zero: the
    // clip parses but has nothing decodable — both frame stages must
    // emit their dead-letter row, not drop the media_id
    val b = HeaderCodec.synthMp4Frames(32, 24, Seq(16, 16, 16, 16), 500, syncEvery = 3)
    val stssAt = (0 until b.length - 4)
      .find(i => new String(b, i, 4, "US-ASCII") == "stss").get
    val noSync = b.clone()
    // payload: version/flags (4) then entry_count BE32
    noSync(stssAt + 8) = 0; noSync(stssAt + 9) = 0
    noSync(stssAt + 10) = 0; noSync(stssAt + 11) = 0
    assert(Mp4SampleTables.parse(noSync).exists(_.forall(!_.sync)))
    import spark.implicits._
    val one = Seq(Multimodal.MediaRow(9L, "video", noSync, "t")).toDF()
    val fr = Multimodal.sampleFrames(spark, one).collect()
    assert(fr.length == 1 && !fr.head.getAs[Boolean]("frame_ok"),
      "sampleFrames must dead-letter a sync-less clip")
    val kf = Multimodal.decodeKeyframes(spark, one).collect()
    assert(kf.length == 1 && !kf.head.getAs[Boolean]("decode_ok"),
      "decodeKeyframes must dead-letter a sync-less clip")
  }

  // ------------------------------------------------------- pixel codec

  test("PNG pixel decode: hand-filtered scanline vectors (Sub/Up/Average/Paeth)") {
    import PixelCodec._
    // 2×2 gray, pixels [10,20,30,40]; filter bytes computed BY HAND per
    // the PNG spec §9 and pinned here — the decoder must invert them.
    def png(raw: Array[Byte]): Array[Byte] =
      HeaderCodec.buildPng(2, 2, 8, 0, raw)
    val px = Array[Byte](10, 20, 30, 40)
    // row0 Sub: 10-0=10, 20-10=10 · row1 Up: 30-10=20, 40-20=20
    assert(decodePng(png(Array[Byte](1, 10, 10, 2, 20, 20))).map(_.pixels.toSeq)
      .contains(px.toSeq))
    // row0 None · row1 Average: 30-(0+10)/2=25, 40-(30+20)/2=15
    assert(decodePng(png(Array[Byte](0, 10, 20, 3, 25, 15))).map(_.pixels.toSeq)
      .contains(px.toSeq))
    // row0 None · row1 Paeth: paeth(0,10,0)=10 → 30-10=20;
    // paeth(30,20,10): p=40, |p-a|=10 smallest → 40-30=10
    assert(decodePng(png(Array[Byte](0, 10, 20, 4, 20, 10))).map(_.pixels.toSeq)
      .contains(px.toSeq))
    val img = decodePng(png(Array[Byte](1, 10, 10, 2, 20, 20))).get
    assert(img.width == 2 && img.height == 2 && img.channels == 1)
  }

  test("PNG encode/decode roundtrip exercises all five filters; malformed quarantines") {
    import PixelCodec._
    // 7 rows → encoder cycles filters 0,1,2,3,4,0,1
    for (ch <- Seq(1, 2, 3, 4)) {
      val src = PixelImage(5, 7, ch, Multimodal.pixelsFor(ch * 13 + 1, 5, 7, ch))
      val round = decodePng(encodePng(src))
      assert(round.contains(src.copy(pixels = round.get.pixels)) &&
        round.get.pixels.toSeq == src.pixels.toSeq, s"roundtrip failed for channels=$ch")
    }
    // truncation INTO the IDAT (half the container) quarantines, never throws
    val whole = encodePng(PixelImage(4, 4, 3, Multimodal.pixelsFor(9, 4, 4, 3)))
    assert(decodePng(whole.take(whole.length / 2)).isEmpty)
    assert(decodePng("not a png".getBytes).isEmpty)
    // header-only synthetic payload (synthPng) quarantines at pixel level
    assert(decodePng(HeaderCodec.synthPng(10, 10, payload)).isEmpty)
  }

  test("Adam7 interlaced PNG: ImageIO-written files decode byte-exactly (lossless)") {
    import java.awt.image.BufferedImage
    // odd dims force uneven pass geometry (empty trailing columns in
    // several passes); 8x8-multiples exercise the full 7-pass layout
    for ((w, h) <- Seq((23, 13), (32, 16), (7, 3), (1, 1), (2, 9), (40, 25))) {
      val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, ((x * 37 + y * 91) % 256 << 16) |
          ((x * 53 + y * 7) % 256 << 8) | ((x + y * 131) % 256))
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // Adam7
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      ios.close(); writer.dispose()
      val png = bos.toByteArray
      assert(png(8 + 8 + 12) == 1, s"ImageIO did not write interlace=1 for ${w}x$h")
      val got = PixelCodec.decodePng(png)
      assert(got.isDefined, s"interlaced ${w}x$h rejected")
      val img = got.get
      assert(img.width == w && img.height == h && img.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = bi.getRGB(x, y)
        val o = (y * w + x) * 3
        assert((img.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
          (img.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (img.pixels(o + 2) & 0xff) == (rgb & 0xff),
          s"interlaced ${w}x$h pixel ($x,$y)")
      }
      // truncation sweep never throws
      for (cut <- 8 until png.length by 13) PixelCodec.decodePng(png.take(cut))
    }
  }

  test("palette PNG (color type 3): ImageIO-written indexed files decode exactly") {
    import java.awt.image.BufferedImage
    val w = 37; val h = 19
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 41) % 256 << 16) | ((y * 67) % 256 << 8) | ((x * y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", bos))
    val png = bos.toByteArray
    assert(png(25) == 3, "ImageIO did not write color type 3")
    val got = PixelCodec.decodePng(png)
    assert(got.isDefined, "palette PNG rejected")
    val img = got.get
    assert(img.width == w && img.height == h && img.channels == 3)
    // exact: the palette-quantized colors ImageIO itself decodes
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((img.pixels(o) & 0xff) == ((rgb >> 16) & 0xff) &&
        (img.pixels(o + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (img.pixels(o + 2) & 0xff) == (rgb & 0xff), s"palette pixel ($x,$y)")
    }
    for (cut <- 8 until png.length by 17) PixelCodec.decodePng(png.take(cut))
    // hand-built palette PNG whose index stream points past the
    // declared 2-entry PLTE: corrupt media, must quarantine
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12 + payload.length)
      b.putInt(payload.length).put(id.getBytes("US-ASCII")).put(payload)
      val crc = new java.util.zip.CRC32()
      crc.update(b.array(), 4, 4 + payload.length)
      b.putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = {
      val b = java.nio.ByteBuffer.allocate(13)
      b.putInt(2).putInt(1).put(8.toByte).put(3.toByte) // 2x1, depth 8, palette
      b.put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(Array[Byte](0, 0, 5)) // filter 0, indices 0 and 5
    deflater.finish()
    val zbuf = new Array[Byte](64)
    val zn = deflater.deflate(zbuf)
    val bad = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++
      chunk("PLTE", Array[Byte](10, 20, 30, 40, 50, 60)) ++
      chunk("IDAT", zbuf.take(zn)) ++ chunk("IEND", Array.emptyByteArray)
    assert(PixelCodec.decodePng(bad).isEmpty, "out-of-palette index must quarantine")
  }

  test("hostile PNGs quarantine: FDICT zlib stream and giant declared IHDR dims") {
    import PixelCodec._
    // zlib header with the FDICT bit set (0x78 0x20: (120·256+32) % 31
    // == 0, bit 5 on) + a dict id: Inflater.inflate returns 0 with
    // needsDictionary()==true and needsInput()==false — a
    // needsInput-only guard spins forever on this input
    val fdict = Array(0x78, 0x20, 0x00, 0x00, 0x00, 0x01, 0x55).map(_.toByte)
    assert(decodePng(HeaderCodec.synthPng(2, 2, fdict)).isEmpty)
    // a ~100-byte container declaring 20000×20000: the raw-buffer
    // allocation must be rejected by the pre-allocation bound (an
    // OutOfMemoryError is not an Exception and would escape the
    // quarantine catch), not attempted
    assert(decodePng(HeaderCodec.synthPng(20000, 20000, payload)).isEmpty)
    // and dims whose raw length overflows Int must not wrap into a
    // small positive allocation
    assert(decodePng(HeaderCodec.synthPng(60000, 60000, payload)).isEmpty)
    // corrupt deflate AFTER a valid zlib header: DataFormatException
    // path — must quarantine (and the Inflater is released in a finally,
    // not leaked per hostile row)
    val corruptDeflate = Array(0x78, 0x9c, 0xde, 0xad, 0xbe, 0xef, 0x00).map(_.toByte)
    assert(decodePng(HeaderCodec.synthPng(2, 2, corruptDeflate)).isEmpty)
  }

  test("truncated WAV data chunk: duration clamps to the bytes present") {
    val whole = HeaderCodec.synthWav(1, 8000, 1000) // 1s → 16000 data bytes
    val full = HeaderCodec.decodeWav(whole).get
    assert(full.durationMs == 1000)
    // cut half the payload off; the data chunk still DECLARES 16000
    val cut = whole.take(whole.length - 8000)
    val h = HeaderCodec.decodeWav(cut)
    // either quarantine or report the truncated duration — never the
    // declared duration over missing bytes (which would disagree with
    // the PCM decode that computes stats over what exists)
    assert(h.forall(_.durationMs <= 510), s"declared-size duration on truncated file: $h")
  }

  test("box resize: known 4×4 → 2×2 quadrant means, box resample: per-channel frame means") {
    import PixelCodec._
    val img = PixelImage(4, 4, 1, (0 until 16).map(_.toByte).toArray)
    val rz = boxResize(img, 2, 2)
    // quadrant sums 10/18/42/50, rounded means (sum+2)/4
    assert(rz.pixels.map(_ & 0xff).toSeq == Seq(3, 5, 11, 13))
    val audio = PcmAudio(2, 8000, Array[Short](10, -10, 20, -20, 30, -30, 50, -50))
    val rs = boxResample(audio, 2)
    assert(rs.samples.toSeq == Seq[Short](15, -15, 40, -40))
  }

  test("WAV PCM16 decode matches the generator's sample formula; encode roundtrips") {
    import PixelCodec._
    // synthWav writes byte i = (i·31 + channels·7) mod 256 — recompute
    // the LE16 samples independently of the decoder
    val wav = HeaderCodec.synthWav(1, 8000, 1) // 16 data bytes → 8 samples
    val got = decodeWavPcm16(wav).get
    assert(got.channels == 1 && got.sampleRate == 8000)
    val expect = (0 until 8).map { i =>
      val lo = (2 * i * 31 + 7) & 0xff
      val hi = ((2 * i + 1) * 31 + 7) & 0xff
      (lo | (hi << 8)).toShort
    }
    assert(got.samples.toSeq == expect)
    val custom = PcmAudio(2, 44100, Array[Short](100, -200, 300, -400, Short.MaxValue, Short.MinValue))
    assert(decodeWavPcm16(encodeWav(custom)).contains(custom.copy(samples = custom.samples)) ||
      decodeWavPcm16(encodeWav(custom)).get.samples.toSeq == custom.samples.toSeq)
  }

  test("feature extraction computes REAL payload statistics (png pixels, wav samples)") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val feats = Multimodal.extractFeatures(spark, media)
      .select("media_id", "container", "payload_ok", "sample_mean", "sample_rms", "sample_peak")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(feats.nonEmpty)
    feats.values.foreach { r =>
      r.getString(1) match {
        // jpeg joined the decoded set in r6 (JpegCodec); AVC video
        // (odd ids) joined it this round (H264Codec); BMP this round
        // too — marker MP4s model a codec outside the subset and stay
        // quarantined
        case "png" | "wav" | "jpeg" | "gif" | "bmp" =>
          assert(r.getBoolean(2), s"payload not decoded: $r")
        case "mp4" if r.getLong(0) % 2 == 1 =>
          assert(r.getBoolean(2), s"AVC keyframes not decoded: $r")
        case _ => assert(!r.getBoolean(2), s"non-AVC payload claimed decoded: $r")
      }
    }
    // pin one AVC video row's stats against the codec's OWN deterministic
    // reconstruction of the WHOLE GOP (generator → encodeSequence with
    // real P frames → MP4 → avcC/sample-table parse → stateful decode
    // must equal the encoder's recons, bit-exactly, IDR and P alike)
    val vidId = feats.collect {
      case (id, r) if r.getString(1) == "mp4" && id % 2 == 1 => id
    }.min
    val (vw, vh, _, _) = Multimodal.geom(vidId)
    val nFrames = Multimodal.videoFrameSizes(vidId).length
    var sum = 0.0; var sumSq = 0.0; var peak = 0.0; var cnt = 0L
    H264Codec.encodeSequence(
      Vector.tabulate(nFrames)(k => Multimodal.videoYuv(vidId, k, vw, vh)),
      qp = 32, gop = 3, deblock = true).frames.foreach { f =>
      Seq(f.recon.y, f.recon.cb, f.recon.cr).foreach { pl =>
        pl.foreach { b =>
          val v = (b & 0xff).toDouble
          sum += v; sumSq += v * v; if (v > peak) peak = v
        }
        cnt += pl.length
      }
    }
    val vr = feats(vidId)
    assert(math.abs(vr.getDouble(3) - sum / cnt) < 1e-9, "video sample_mean")
    assert(math.abs(vr.getDouble(4) - math.sqrt(sumSq / cnt)) < 1e-9, "video sample_rms")
    assert(vr.getDouble(5) == peak, "video sample_peak")
    // pin one PNG row's stats against the GENERATOR pixels (no decoder in
    // the expected side): decode must have inverted filter+zlib exactly
    val pngId = feats.collect { case (id, r) if r.getString(1) == "png" => id }.min
    val (w, h, _, _) = Multimodal.geom(pngId)
    val px = Multimodal.pixelsFor(pngId, w, h, 3).map(p => (p & 0xff).toDouble)
    val r = feats(pngId)
    assert(math.abs(r.getDouble(3) - px.sum / px.length) < 1e-9)
    assert(math.abs(r.getDouble(4) - math.sqrt(px.map(v => v * v).sum / px.length)) < 1e-9)
    assert(r.getDouble(5) == px.max)
    // BMP is lossless too: one row each from OUR encoder (id%48==0)
    // and the JDK's (id%48==24) must equal the generator pixels
    for (bmpId <- Seq(feats.keys.filter(_ % 96 == 0).min,
      feats.keys.filter(_ % 96 == 48).min)) {
      val (bw, bh, _, _) = Multimodal.geom(bmpId)
      val bp = Multimodal.pixelsFor(bmpId, bw, bh, 3).map(p => (p & 0xff).toDouble)
      val br = feats(bmpId)
      assert(br.getString(1) == "bmp" && br.getBoolean(2), s"bmp $bmpId not decoded")
      assert(math.abs(br.getDouble(3) - bp.sum / bp.length) < 1e-9, s"bmp $bmpId mean")
      assert(br.getDouble(5) == bp.max, s"bmp $bmpId peak")
    }
    // Adam7 PNG population (r7): id%12==6 rows are ImageIO-written
    // interlaced — PNG is lossless, so the pipeline stats must equal
    // the GENERATOR pixels exactly even through the foreign 7-pass
    // layout
    val ilId = feats.keys.filter(i => i % 12 == 6).min
    val (iw, ih, _, _) = Multimodal.geom(ilId)
    val ilBytes = Multimodal.imageBytes(ilId, iw, ih)
    assert(ilBytes(28) == 1, "generator did not produce an interlaced PNG")
    val ilPx = Multimodal.pixelsFor(ilId, iw, ih, 3).map(p => (p & 0xff).toDouble)
    val ir = feats(ilId)
    assert(ir.getString(1) == "png" && ir.getBoolean(2), "interlaced row not decoded")
    assert(math.abs(ir.getDouble(3) - ilPx.sum / ilPx.length) < 1e-9, "adam7 mean")
    assert(math.abs(ir.getDouble(4) -
      math.sqrt(ilPx.map(v => v * v).sum / ilPx.length)) < 1e-9, "adam7 rms")
    assert(ir.getDouble(5) == ilPx.max, "adam7 peak")

    // progressive JPEG (r7): image ids with id%4==3 are written by
    // ImageIO's PROGRESSIVE encoder (a foreign scan script); the
    // pipeline stats must equal our own decoder's output on those
    // foreign bytes, and the decode must agree with ImageIO's reader
    val progId = feats.keys.filter(i => i % 3 == 0 && i % 4 == 3).min
    val (pw, ph, _, _) = Multimodal.geom(progId)
    val progBytes = Multimodal.imageBytes(progId, pw, ph)
    // really progressive: SOF2 marker present
    assert((0 until progBytes.length - 1).exists(i =>
      (progBytes(i) & 0xff) == 0xff && (progBytes(i + 1) & 0xff) == 0xc2),
      "generator did not produce a progressive stream")
    val progImg = JpegCodec.decode(progBytes).get
    val pexp = progImg.pixels.map(p => (p & 0xff).toDouble)
    val pr = feats(progId)
    assert(pr.getString(1) == "jpeg" && pr.getBoolean(2), "progressive row not decoded")
    assert(math.abs(pr.getDouble(3) - pexp.sum / pexp.length) < 1e-9, "prog mean")
    assert(math.abs(pr.getDouble(4) -
      math.sqrt(pexp.map(v => v * v).sum / pexp.length)) < 1e-9, "prog rms")
    // per-pixel interop on SMOOTH imagery is pinned in JpegCodecSpec;
    // the corpus texture is noise-like chroma where two conformant
    // upsampling filters legitimately diverge per pixel — so here the
    // cross-decoder check is at the statistic level (means must agree;
    // upsampling is mean-preserving)
    val refProg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(progBytes))
    var refSum = 0.0
    for (y <- 0 until ph; x <- 0 until pw) {
      val rgb = refProg.getRGB(x, y)
      refSum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    }
    val refMean = refSum / (pw * ph * 3)
    assert(math.abs(refMean - pr.getDouble(3)) <= 2.0,
      s"progressive corpus mean: ours ${pr.getDouble(3)} vs ImageIO $refMean")

    // compressed audio (r7, AudioCodec): pin one mu-law row and one
    // ADPCM row against the codec's own deterministic decode — the
    // stats must come from the COMPANDED samples, not the source tone
    def audioExpect(id: Long): Array[Short] = {
      val (_, _, durMs, ch) = Multimodal.geom(id)
      val src = Multimodal.audioPcm(id, (durMs * 8).toInt, ch)
      (id % 9) match {
        case 4L => src.samples.map(s => AudioCodec.mulawDecode(AudioCodec.mulawEncode(s)))
        case 7L => AudioCodec.encodeWavIma(src)._2
        case _ => fail(s"id $id is not a compressed-audio row")
      }
    }
    for (cls <- Seq(4L, 7L)) {
      val id = feats.keys.filter(i => i % 3 == 1 && i % 9 == cls).min
      val exp = audioExpect(id).map(_.toDouble)
      val ar = feats(id)
      assert(ar.getString(1) == "wav" && ar.getBoolean(2), s"audio $id not decoded")
      assert(math.abs(ar.getDouble(3) - exp.sum / exp.length) < 1e-9, s"audio $id mean")
      assert(math.abs(ar.getDouble(4) -
        math.sqrt(exp.map(v => v * v).sum / exp.length)) < 1e-9, s"audio $id rms")
      assert(ar.getDouble(5) == exp.map(math.abs).max, s"audio $id peak")
    }
  }

  test("resize really resizes: PNG/JPEG decode to target dims, WAV to target frames, mp4 passes through") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val rz = Multimodal.resize(spark, media, targetW = 16, targetH = 12, targetFrames = 100)
    assert(rz.count() == media.count())
    val rows = rz.select("media_id", "kind", "resized_ok", "content_resized").collect()
    rows.foreach { r =>
      val id = r.getLong(0); val bytes = r.getAs[Array[Byte]](3)
      r.getString(1) match {
        case "image" if id % 24 == 12 =>
          // gif rows resize into gif containers at the target dims
          assert(r.getBoolean(2))
          val img = GifCodec.decode(bytes).get
          assert(img.width == 16 && img.height == 12 && img.channels == 3)
        case "image" if id % 96 == 0 || id % 96 == 48 =>
          // bmp rows (ours and the JDK's) resize into bmp containers
          assert(r.getBoolean(2))
          val img = BmpCodec.decode(bytes).get
          assert(img.width == 16 && img.height == 12 && img.channels == 3)
        case "image" if id % 2 == 0 =>
          assert(r.getBoolean(2))
          val img = PixelCodec.decodePng(bytes).get
          assert(img.width == 16 && img.height == 12 && img.channels == 3)
        case "image" => // jpeg (odd ids): real decode→resize→re-encode (r6)
          assert(r.getBoolean(2))
          val img = JpegCodec.decode(bytes).get
          assert(img.width == 16 && img.height == 12 && img.channels == 3)
        case "audio" =>
          assert(r.getBoolean(2))
          val a = PixelCodec.decodeWavPcm16(bytes).get
          assert(a.samples.length == 100 * a.channels)
        case _ if id % 2 == 0 =>
          // marker MP4s (non-AVC codec stand-in): passthrough boundary
          assert(!r.getBoolean(2))
        case _ =>
          // AVC video: FULL-GOP transcode at the target dims (every
          // source frame survives — IDRs and P frames alike — at the
          // source's sync cadence)
          assert(r.getBoolean(2), s"AVC video $id not resized")
          val (cfg, samples) = Mp4SampleTables.parseAvc(bytes).get
          val frames = Multimodal.decodedAllFrames(bytes, cfg, samples).get
          val n = Multimodal.videoFrameSizes(id).length
          assert(frames.length == n, s"video $id full-GOP transcode count")
          assert(samples.count(_.sync) == (0 until n).count(_ % 3 == 0),
            s"video $id sync cadence preserved")
          // the re-encoded timescale is the SOURCE's stts cadence
          // (500 ms) for ctts-carrying and plain clips alike: deriving
          // it from pts(1)-pts(0) read the composition offsets as
          // cadence (300/600 ms) and distorted total duration by up to
          // 40% (r9 advice item 1 — fixed via the dts delta)
          assert(samples(1).dtsMs - samples(0).dtsMs == 500,
            s"video $id resized cadence ${samples(1).dtsMs - samples(0).dtsMs} != 500")
          frames.foreach(f => assert(f.width == 16 && f.height == 12))
      }
    }
    // pinned content checks: resized pixels equal a driver-side
    // boxResize of the generator pixels (whole chain is deterministic)
    // — one PNG row and one BMP row (both containers are lossless)
    def isBmpId(id: Long) = id % 96 == 0 || id % 96 == 48
    val pngRow = rows.filter(r => r.getString(1) == "image" &&
        r.getLong(0) % 2 == 0 && r.getLong(0) % 12 != 6 &&
        r.getLong(0) % 24 != 12 && r.getLong(0) % 48 != 36 &&
        !isBmpId(r.getLong(0)))
      .minBy(_.getLong(0))
    val id = pngRow.getLong(0)
    val (w, h, _, _) = Multimodal.geom(id)
    val expect = PixelCodec.boxResize(
      PixelCodec.PixelImage(w, h, 3, Multimodal.pixelsFor(id, w, h, 3)), 16, 12)
    assert(PixelCodec.decodePng(pngRow.getAs[Array[Byte]](3)).get.pixels.toSeq
      == expect.pixels.toSeq)
    val bmpRow = rows.filter(r => r.getString(1) == "image" && isBmpId(r.getLong(0)))
      .minBy(_.getLong(0))
    val bId = bmpRow.getLong(0)
    val (bw, bh, _, _) = Multimodal.geom(bId)
    val bExpect = PixelCodec.boxResize(
      PixelCodec.PixelImage(bw, bh, 3, Multimodal.pixelsFor(bId, bw, bh, 3)), 16, 12)
    assert(BmpCodec.decode(bmpRow.getAs[Array[Byte]](3)).get.pixels.toSeq
      == bExpect.pixels.toSeq, "bmp resize chain is lossless end to end")
  }
}
