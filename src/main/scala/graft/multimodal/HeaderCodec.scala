package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater}

import Multimodal.MediaHeader

/** Pure-JVM media container header codec: PNG IHDR, JPEG SOF, WAV
  * fmt/data, MP4 (ISO-BMFF) mvhd/tkhd — all plain byte arithmetic, no
  * codec library. `decode` sniffs the container from magic bytes (a real
  * ingest never trusts a `kind` column) and returns the typed geometry;
  * the `synth*` builders emit honest minimal containers (valid
  * signatures, CRC'd chunks, zlib IDAT, correct RIFF sizes, nested
  * boxes) for fixture and pipeline synthesis.
  *
  * Only HEADERS are decoded here; pixel/sample payload decode lives in
  * [[PixelCodec]] (PNG scanlines, WAV PCM16) and [[JpegCodec]]
  * (baseline JPEG, r6); MP4 video payloads are the remaining
  * documented boundary.
  */
object HeaderCodec {

  // ---------- decode ----------

  /** Sniff + parse. None for truncated, unknown, or malformed content —
    * callers quarantine rather than throw (mid-scan failure on one bad
    * object must not kill a 100 TB job).
    */
  def decode(b: Array[Byte]): Option[MediaHeader] =
    try {
      if (isPng(b)) decodePng(b)
      else if (isJpeg(b)) decodeJpeg(b)
      else if (isWav(b)) decodeWav(b)
      else if (isMp4(b)) decodeMp4(b)
      else if (GifCodec.isGif(b)) decodeGif(b)
      else if (BmpCodec.isBmp(b)) decodeBmp(b)
      else None
    } catch { case _: Exception => None }

  /** BMP: geometry from the BITMAPINFOHEADER (channels reported as 3:
    * the decode stage emits interleaved RGB for every subset bpp).
    */
  def decodeBmp(b: Array[Byte]): Option[Multimodal.MediaHeader] =
    BmpCodec.dims(b).map { case (w, h, _) =>
      Multimodal.MediaHeader("bmp", w, h, 0L, 3)
    }

  /** GIF: screen geometry from the logical screen descriptor; duration
    * = summed graphic-control delays (0 for a static image), walked at
    * the block level WITHOUT entropy decode (header stage discipline).
    */
  def decodeGif(b: Array[Byte]): Option[MediaHeader] = {
    val (w, h) = GifCodec.screenDims(b).getOrElse(return None)
    var p = 13
    val packed = b(10) & 0xff
    if ((packed & 0x80) != 0) p += 3 * (2 << (packed & 7))
    var durMs = 0L
    var done = false
    def skipSubs(): Boolean = {
      while (p < b.length) {
        val n = b(p) & 0xff
        p += 1
        if (n == 0) return true
        p += n
      }
      false
    }
    while (!done && p < b.length) {
      (b(p) & 0xff) match {
        case 0x3b => done = true
        case 0x21 =>
          if (p + 2 > b.length) return None
          val label = b(p + 1) & 0xff
          p += 2
          if (label == 0xf9 && p + 4 <= b.length && (b(p) & 0xff) == 4)
            durMs += le16(b, p + 2) * 10L
          if (!skipSubs()) return None
        case 0x2c =>
          if (p + 10 > b.length) return None
          val ipacked = b(p + 9) & 0xff
          p += 10
          if ((ipacked & 0x80) != 0) p += 3 * (2 << (ipacked & 7))
          p += 1 // LZW min code size
          if (!skipSubs()) return None
        case _ => return None
      }
    }
    if (!done) return None
    Some(MediaHeader("gif", w, h, durMs, 3))
  }

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private[multimodal] def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private[multimodal] def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private[multimodal] def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private[multimodal] def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** PNG: the IHDR chunk is REQUIRED to be first (offset 8): 4-byte
    * length, "IHDR", then width/height (BE32), bit depth, color type.
    * Channels derive from color type: 0 gray→1, 2 truecolor→3,
    * 3 palette→1, 4 gray+alpha→2, 6 truecolor+alpha→4.
    */
  def decodePng(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length < 8 + 8 + 13) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val colorType = b(25) & 0xff
    val ch = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0) return None
    Some(MediaHeader("png", w, h, 0L, ch))
  }

  /** JPEG: walk marker segments (FF xx + BE16 length including itself)
    * from SOI until a frame header — SOF0 baseline, SOF1 extended, SOF2
    * progressive — then precision(1), height(BE16), width(BE16),
    * component count(1).
    */
  def decodeJpeg(b: Array[Byte]): Option[MediaHeader] = {
    var o = 2
    while (o + 4 <= b.length) {
      if ((b(o) & 0xff) != 0xff) return None
      val marker = b(o + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { o += 2 } // standalone
      else {
        val len = be16(b, o + 2)
        if (len < 2 || o + 2 + len > b.length) return None
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (len < 8) return None
          val h = be16(b, o + 5)
          val w = be16(b, o + 7)
          val ncomp = b(o + 9) & 0xff
          if (w <= 0 || h <= 0) return None
          return Some(MediaHeader("jpeg", w, h, 0L, ncomp))
        }
        if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before any SOF
        o += 2 + len
      }
    }
    None
  }

  /** WAV: RIFF/WAVE chunk walk. "fmt " gives channels (LE16 at +2),
    * sample rate (LE32 at +4), byte rate (LE32 at +8); "data" gives the
    * payload size, so duration_ms = dataSize * 1000 / byteRate.
    */
  def decodeWav(b: Array[Byte]): Option[MediaHeader] = {
    var o = 12
    var channels = 0
    var byteRate = 0
    var sampleRate = 0
    var audioFormat = 0
    var factSamples = -1L
    var dataSize = -1L
    while (o + 8 <= b.length && (channels == 0 || dataSize < 0)) {
      val id = new String(b, o, 4, "US-ASCII")
      val size = le32(b, o + 4).toLong & 0xffffffffL
      // untrusted ingest: a crafted chunk size near 2^32 would make the
      // word-aligned step wrap to zero (or negative) and spin forever —
      // quarantine instead (sizes beyond the buffer are equally bogus)
      if (size > b.length.toLong) return None
      if (id == "fmt " && size >= 16 && o + 8 + 16 <= b.length) {
        audioFormat = le16(b, o + 8)
        channels = le16(b, o + 10)
        sampleRate = le32(b, o + 12)
        byteRate = le32(b, o + 16)
      } else if (id == "fact" && size >= 4 && o + 12 <= b.length) {
        // non-PCM WAVs carry the true per-channel frame count here —
        // byte-rate division is only exact for constant-bitrate PCM
        factSamples = le32(b, o + 8).toLong & 0xffffffffL
      } else if (id == "data") {
        // clamp to the bytes actually present: a truncated file whose
        // data chunk declares more than remains would otherwise report
        // a duration inconsistent with what PCM decode (which truncates
        // to available bytes) computes stats over
        dataSize = math.min(size, (b.length - o - 8).toLong max 0L)
      }
      val step = 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      if (step <= 0) return None
      o += step
    }
    if (channels <= 0 || byteRate <= 0 || dataSize < 0) return None
    val durMs =
      if (audioFormat != 1 && factSamples >= 0 && sampleRate > 0)
        factSamples * 1000 / sampleRate
      else dataSize * 1000 / byteRate
    Some(MediaHeader("wav", 0, 0, durMs, channels))
  }

  private def be64(b: Array[Byte], o: Int): Long =
    ((be32(b, o).toLong & 0xffffffffL) << 32) | (be32(b, o + 4).toLong & 0xffffffffL)

  /** MP4 (ISO-BMFF): walk top-level boxes to `moov`, then inside it
    * `mvhd` (v0: timescale BE32 at +12, duration BE32 at +16 after the
    * version byte; v1: timescale at +20, duration BE64 at +24) for
    * duration and the first `trak`→`tkhd` (width/height as 16.16 fixed
    * point in the last 8 bytes of either version's payload) for
    * dimensions. `size == 1` boxes carry a BE64 largesize after the
    * type (16-byte header); `size == 0` means "extends to end of
    * enclosing box". Channels: video content reports 0 (audio tracks
    * would carry an stsd entry — out of header-walk scope).
    */
  def decodeMp4(b: Array[Byte]): Option[MediaHeader] = {
    var durMs = -1L
    var w = 0
    var h = 0
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size32 = be32(b, o).toLong & 0xffffffffL
        val id = new String(b, o + 4, 4, "US-ASCII")
        // resolve the three ISO-BMFF size encodings to (header, end)
        val (hdr, size) =
          if (size32 == 1) {
            if (o + 16 > to) return
            (16, be64(b, o + 8))
          } else if (size32 == 0) (8, (to - o).toLong) // to end of parent
          else (8, size32)
        if (size < hdr) return
        // a box whose declared extent spills past its parent is
        // truncated/crafted: stop the walk rather than reading a
        // NEIGHBOR box's bytes as this box's fields (every field read
        // below is bounded by the box's own `end`, not the parent `to`
        // — an 8-byte mvhd must not report the next box's bytes as
        // timescale/duration with decode_ok=true)
        if (o.toLong + size > to) return
        val p = o + hdr // payload start
        val end = (o + size).toInt
        id match {
          case "moov" | "trak" if depth < 4 => walk(p, end, depth + 1)
          case "mvhd" if p + 20 <= end =>
            val version = b(p) & 0xff
            if (version == 0) {
              val timescale = be32(b, p + 12)
              val dur = be32(b, p + 16).toLong & 0xffffffffL
              if (timescale > 0) durMs = dur * 1000 / timescale
            } else if (version == 1 && p + 32 <= end) {
              // v1: ctime/mtime are 64-bit → timescale at +20, dur BE64
              val timescale = be32(b, p + 20)
              val dur = be64(b, p + 24)
              if (timescale > 0 && dur >= 0) durMs = dur * 1000 / timescale
            }
          case "tkhd" if w == 0 && size >= hdr + 84 =>
            // v0 payload is 84 bytes, v1 is 96; width/height are the
            // final 8 bytes of the payload in both versions
            w = be32(b, end - 8) >>> 16
            h = be32(b, end - 4) >>> 16
          case _ => ()
        }
        o = end
      }
    }
    walk(0, b.length, 0)
    if (durMs < 0) None else Some(MediaHeader("mp4", w, h, durMs, 0))
  }

  // ---------- synthesis (honest minimal containers) ----------

  /** Valid PNG: signature, CRC'd IHDR (8-bit truecolor), one zlib
    * IDAT carrying the payload (not w*h pixels — header-complete,
    * payload-synthetic), IEND.
    */
  def synthPng(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte) // bit depth
    ihdr.put(2.toByte) // color type: truecolor (3 channels)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", deflate(payload))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Assemble a PNG container around an already-filtered raw scanline
    * stream: signature, CRC'd IHDR with the given depth/color type, one
    * zlib IDAT, IEND. [[PixelCodec.encodePng]] supplies real filtered
    * scanlines; [[synthPng]] supplies a synthetic payload (header-only
    * fixtures).
    */
  private[multimodal] def buildPng(w: Int, h: Int, depth: Int, colorType: Int,
      rawScanlines: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(depth.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", deflate(rawScanlines))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](math.max(64, data.length + 64))
    val out = new ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Valid JPEG: SOI, APP0 JFIF, COM carrying the payload, SOF0
    * (baseline, 3 components, h/w BE16), EOI.
    */
  def synthJpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    val jfif = "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0)
    writeSegment(out, 0xe0, jfif)
    writeSegment(out, 0xfe, java.util.Arrays.copyOf(payload, math.min(payload.length, 60000)))
    val sof = ByteBuffer.allocate(15)
    sof.put(8.toByte) // precision
    sof.putShort(h.toShort).putShort(w.toShort)
    sof.put(3.toByte) // components
    // (id, sampling, qtable) per component
    Seq(1, 2, 3).foreach { c => sof.put(c.toByte).put(0x11.toByte).put(0.toByte) }
    writeSegment(out, 0xc0, sof.array())
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def writeSegment(out: ByteArrayOutputStream, marker: Int, data: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = data.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(data, 0, data.length)
  }

  /** Valid WAV: RIFF size, PCM16 fmt chunk, data chunk with real
    * deterministic sample bytes sized exactly to `durMs` at the given
    * rate — duration decodes back exactly (dataSize*1000/byteRate).
    */
  def synthWav(channels: Int, sampleRate: Int, durMs: Long): Array[Byte] = {
    val byteRate = sampleRate * channels * 2
    val dataSize = (durMs * byteRate / 1000).toInt
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < dataSize) { buf.put(((i * 31 + channels * 7) & 0xff).toByte); i += 1 }
    buf.array()
  }

  /** Valid minimal MP4: ftyp, moov(mvhd v0 timescale=1000 + trak(tkhd
    * v0 with 16.16 width/height)), mdat carrying the payload.
    */
  def synthMp4(w: Int, h: Int, durMs: Long, payload: Array[Byte]): Array[Byte] = {
    def box(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(id.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(512)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    })
    val mvhd = box("mvhd", {
      val b = ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // ctime/mtime
      b.putInt(1000) // timescale
      b.putInt(durMs.toInt) // duration (timescale=1000 → ms)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate/volume/reserved
      b.position(b.position() + 8) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(v => b.putInt(v))
      b.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // predefined
      b.putInt(2) // next track id
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = ByteBuffer.allocate(84)
      b.putInt(0x00000007) // version 0, flags: enabled|in-movie|in-preview
      b.putInt(0).putInt(0) // ctime/mtime
      b.putInt(1).putInt(0) // track id, reserved
      b.putInt(durMs.toInt) // duration
      b.putInt(0).putInt(0) // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer/altgroup/volume/reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(v => b.putInt(v))
      b.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
      b.array()
    })
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val mdat = box("mdat", java.util.Arrays.copyOf(payload, math.min(payload.length, 1 << 20)))
    ftyp ++ moov ++ mdat
  }

  /** Valid MP4 WITH full sample tables: `moov(mvhd, trak(tkhd,
    * mdia(mdhd, minf(stbl(stts, [stss], stsc, stsz, stco)))))` + an
    * `mdat` whose payload is the concatenated frames — each frame `i`
    * starts with the 4-byte marker `00 00 00 01` then byte `i`
    * repeated, so a consumer can verify an (offset, size) range
    * actually lands on frame `i`'s bytes. Frames are laid out in
    * 3-sample chunks (a trailing short chunk gets its own stsc run) to
    * exercise the stsc/stco composition, timescale is 1000 so stts
    * deltas are milliseconds, and every `syncEvery`-th frame (1-based
    * frame 1, 1+syncEvery, ...) is a sync sample; `syncEvery <= 1`
    * omits stss entirely (ISO-BMFF: absent stss = all sync).
    */
  def synthMp4Frames(w: Int, h: Int, frameSizes: Seq[Int],
      frameDurMs: Int, syncEvery: Int,
      compOffsetsMs: Seq[Int] = Nil): Array[Byte] = {
    require(frameSizes.nonEmpty && frameSizes.forall(_ >= 5), "frames need >= 5 bytes")
    val frames = frameSizes.zipWithIndex.map { case (sz, i) =>
      val f = new Array[Byte](sz)
      f(0) = 0; f(1) = 0; f(2) = 0; f(3) = 1
      java.util.Arrays.fill(f, 4, sz, (i & 0xff).toByte)
      f
    }.toIndexedSeq
    mp4WithTables(w, h, frames,
      sync = i => i % math.max(syncEvery, 1) == 0, omitStss = syncEvery <= 1,
      frameDurMs = frameDurMs, stsd = Array.emptyByteArray,
      compOffsetsMs = compOffsetsMs)
  }

  /** MP4 with REAL AVC framing on top of the same sample tables:
    * `stsd(avc1(avcC))` carries the out-of-band SPS/PPS (14496-15
    * AVCDecoderConfigurationRecord, 4-byte NAL length prefixes) and
    * every sample is its NAL unit length-prefixed — the layout a
    * production camera/transcoder writes, so a decode stage must read
    * the avcC for parameter sets and deframe samples by length field
    * (not start codes). `nals` pairs each frame's NAL bytes with its
    * sync (keyframe) flag.
    */
  def synthMp4Avc(w: Int, h: Int, spsNal: Array[Byte], ppsNal: Array[Byte],
      nals: Seq[(Array[Byte], Boolean)], frameDurMs: Int,
      compOffsetsMs: Seq[Int] = Nil): Array[Byte] = {
    require(nals.nonEmpty, "need at least one sample")
    require(spsNal.length >= 4 && ppsNal.length >= 1, "parameter sets")
    val avcC = {
      val b = ByteBuffer.allocate(7 + 2 + spsNal.length + 3 + ppsNal.length)
      b.put(1.toByte) // configurationVersion
      b.put(spsNal(1)).put(spsNal(2)).put(spsNal(3)) // profile/compat/level
      b.put(0xff.toByte) // reserved + lengthSizeMinusOne = 3
      b.put(0xe1.toByte) // reserved + numOfSequenceParameterSets = 1
      b.putShort(spsNal.length.toShort).put(spsNal)
      b.put(1.toByte) // numOfPictureParameterSets
      b.putShort(ppsNal.length.toShort).put(ppsNal)
      box("avcC", b.array())
    }
    val avc1 = box("avc1", {
      val b = ByteBuffer.allocate(78 + avcC.length)
      b.position(6) // reserved
      b.putShort(1) // data_reference_index
      b.position(b.position() + 16) // pre_defined/reserved
      b.putShort(w.toShort).putShort(h.toShort)
      b.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      b.putInt(0) // reserved
      b.putShort(1) // frame_count
      b.position(b.position() + 32) // compressorname (zeroed)
      b.putShort(24) // depth
      b.putShort(-1) // pre_defined
      b.put(avcC)
      b.array()
    })
    val stsd = {
      val b = ByteBuffer.allocate(8 + avc1.length)
      b.putInt(0) // version + flags
      b.putInt(1) // entry_count
      b.put(avc1)
      box("stsd", b.array())
    }
    val frames = nals.map { case (nal, _) =>
      val b = ByteBuffer.allocate(4 + nal.length)
      b.putInt(nal.length).put(nal)
      b.array()
    }.toIndexedSeq
    val syncs = nals.map(_._2)
    mp4WithTables(w, h, frames, sync = syncs, omitStss = syncs.forall(identity),
      frameDurMs = frameDurMs, stsd = stsd, compOffsetsMs = compOffsetsMs)
  }

  private def box(id: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(id.getBytes("US-ASCII")).put(payload)
    b.array()
  }

  /** Shared moov/mdat layout for the two frame-table synthesizers:
    * explicit per-frame payloads, 3-sample chunking, optional stss,
    * optional stsd prepended to the stbl children.
    */
  private def mp4WithTables(w: Int, h: Int, frames: IndexedSeq[Array[Byte]],
      sync: Int => Boolean, omitStss: Boolean, frameDurMs: Int,
      stsd: Array[Byte], compOffsetsMs: Seq[Int] = Nil): Array[Byte] = {
    val frameSizes = frames.map(_.length)
    val n = frameSizes.length
    require(compOffsetsMs.isEmpty || compOffsetsMs.length == n,
      "ctts offsets must cover every sample or be absent")
    def fullBox(id: String, body: ByteBuffer => Unit, size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + size)
      b.putInt(0) // version 0 + flags
      body(b)
      box(id, b.array())
    }
    val durMs = n.toLong * frameDurMs
    val ftyp = box("ftyp", {
      val b = ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(512)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    })
    val mvhd = fullBox("mvhd", { b =>
      b.putInt(0).putInt(0) // ctime/mtime
      b.putInt(1000).putInt(durMs.toInt) // timescale, duration
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.position(b.position() + 8)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(v => b.putInt(v))
      (0 until 6).foreach(_ => b.putInt(0))
      b.putInt(2)
    }, 96)
    val tkhd = fullBox("tkhd", { b =>
      b.putInt(0).putInt(0) // ctime/mtime
      b.putInt(1).putInt(0) // track id, reserved
      b.putInt(durMs.toInt)
      b.putInt(0).putInt(0)
      b.putShort(0).putShort(0).putShort(0).putShort(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(v => b.putInt(v))
      b.putInt(w << 16).putInt(h << 16)
    }, 80)
    val mdhd = fullBox("mdhd", { b =>
      b.putInt(0).putInt(0) // ctime/mtime
      b.putInt(1000).putInt(durMs.toInt) // timescale (ms), duration
      b.putShort(0x55c4.toShort).putShort(0) // language "und", predefined
    }, 20)
    val stts = fullBox("stts", { b =>
      b.putInt(1).putInt(n).putInt(frameDurMs)
    }, 12)
    // ctts v0 (14496-12 §8.6.1.3): per-sample composition offsets in
    // media-timescale ticks (= ms here) — written run-length-merged so
    // equal consecutive offsets share an entry, exercising the parser's
    // run expansion, not just the 1-entry-per-sample degenerate shape
    val cttsOpt =
      if (compOffsetsMs.isEmpty) Array.emptyByteArray
      else {
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        compOffsetsMs.foreach { off =>
          if (runs.nonEmpty && runs.last._2 == off)
            runs(runs.length - 1) = (runs.last._1 + 1, off)
          else runs += ((1, off))
        }
        fullBox("ctts", { b =>
          b.putInt(runs.length)
          runs.foreach { case (count, off) => b.putInt(count).putInt(off) }
        }, 4 + 8 * runs.length)
      }
    val stssOpt =
      if (omitStss) Array.emptyByteArray
      else {
        val syncs = (0 until n).filter(sync)
        fullBox("stss", { b =>
          b.putInt(syncs.length)
          syncs.foreach(i => b.putInt(i + 1)) // 1-based sample numbers
        }, 4 + 4 * syncs.length)
      }
    val chunkSize = 3
    val nChunks = (n + chunkSize - 1) / chunkSize
    val lastChunkSamples = n - (nChunks - 1) * chunkSize
    val stsc = fullBox("stsc", { b =>
      val runs =
        if (nChunks > 1 && lastChunkSamples != chunkSize)
          Seq((1, chunkSize), (nChunks, lastChunkSamples))
        else Seq((1, math.min(chunkSize, n)))
      b.putInt(runs.length)
      runs.foreach { case (first, spc) => b.putInt(first).putInt(spc).putInt(1) }
    }, 4 + 12 * (if (nChunks > 1 && lastChunkSamples != chunkSize) 2 else 1))
    val stsz = fullBox("stsz", { b =>
      b.putInt(0).putInt(n) // per-sample sizes
      frameSizes.foreach(v => b.putInt(v))
    }, 8 + 4 * n)
    // stco needs absolute file offsets: moov size is fixed once the
    // table sizes are known, so lay it out with a placeholder first
    def moovOf(stco: Array[Byte]): Array[Byte] =
      box("moov", mvhd ++ box("trak", tkhd ++ box("mdia",
        mdhd ++ box("minf", box("stbl",
          stsd ++ stts ++ cttsOpt ++ stssOpt ++ stsc ++ stsz ++ stco)))))
    val stcoSize = 4 + 4 + 4 * nChunks
    val placeholder = fullBox("stco", { b =>
      b.putInt(nChunks); (0 until nChunks).foreach(_ => b.putInt(0))
    }, stcoSize - 4)
    val mdatPayloadStart = ftyp.length + moovOf(placeholder).length + 8
    val chunkOffsets = new Array[Int](nChunks)
    var off = mdatPayloadStart
    var s = 0
    (0 until nChunks).foreach { c =>
      chunkOffsets(c) = off
      val inChunk = math.min(chunkSize, n - s)
      (0 until inChunk).foreach { i => off += frameSizes(s + i) }
      s += inChunk
    }
    val stco = fullBox("stco", { b =>
      b.putInt(nChunks); chunkOffsets.foreach(v => b.putInt(v))
    }, stcoSize - 4)
    val mdat = box("mdat", frames.reduce(_ ++ _))
    ftyp ++ moovOf(stco) ++ mdat
  }
}
