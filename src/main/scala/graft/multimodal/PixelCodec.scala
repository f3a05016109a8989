package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater

/** Pure-JVM pixel/sample payload codec — the stage that used to sit
  * behind the declared `resizeStub` boundary. PNG pixel decode is the
  * full real pipeline: chunk walk → concatenated-IDAT zlib inflate →
  * scanline unfiltering (all five filter types 0 None / 1 Sub / 2 Up /
  * 3 Average / 4 Paeth, per the PNG specification §9) for 8-bit
  * gray / gray+alpha / truecolor / truecolor+alpha. WAV sample decode
  * is PCM16 little-endian byte arithmetic. The matching encoders write
  * genuinely filtered scanlines (cycling every filter type) and real
  * RIFF sample payloads, so decode round-trips are honest.
  *
  * JPEG payload decode lives in [[JpegCodec]] (pure-JVM baseline
  * Huffman+DCT, r6). The remaining documented boundary is MP4 video
  * (H.264 et al. need a full motion-compensation codec); those
  * containers pass through the pipeline with `payload_ok = false`.
  *
  * All decoders quarantine malformed content as None, never throw: a
  * bad object must not kill a 100 TB scan.
  */
object PixelCodec {

  /** 8-bit interleaved pixel buffer (row-major, `channels` bytes/px). */
  final case class PixelImage(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Interleaved PCM16 frames. */
  final case class PcmAudio(channels: Int, sampleRate: Int, samples: Array[Short])

  // endian decode shared with HeaderCodec (one copy per package)
  import HeaderCodec.{be32, le16, le32}

  // ------------------------------------------------------------- PNG

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
  }

  /** Full PNG pixel decode: IHDR geometry, every IDAT chunk inflated as
    * one zlib stream, scanlines unfiltered per pass. Supports the 8-bit
    * color types 0/2/4/6, both non-interlaced and Adam7-INTERLACED
    * (since r7: seven sub-images, each independently filtered, pixels
    * scattered to the pass grid — pinned byte-exactly against
    * ImageIO-written interlaced files, PNG being lossless), and
    * 8-bit PALETTE images (color type 3, since r7: PLTE lookup to
    * 3-channel RGB; an index past the declared palette quarantines).
    * Sub-8-bit and 16-bit depths quarantine — they need bit-unpacking
    * a training-data ingest would normalize upstream anyway.
    */
  def decodePng(b: Array[Byte]): Option[PixelImage] =
    try {
      if (!HeaderCodec.isPng(b)) return None
      var o = 8
      var w = 0; var h = 0; var ch = -1
      var interlaced = false
      var indexed = false
      var palette: Array[Byte] = null
      val idat = new ByteArrayOutputStream()
      var done = false
      while (!done && o + 8 <= b.length) {
        val len = be32(b, o)
        if (len < 0 || o.toLong + 12 + len > b.length) return None
        val typ = new String(b, o + 4, 4, "US-ASCII")
        typ match {
          case "IHDR" =>
            if (len < 13) return None
            w = be32(b, o + 8); h = be32(b, o + 12)
            val depth = b(o + 16) & 0xff
            val colorType = b(o + 17) & 0xff
            indexed = colorType == 3 // palette: 1 index byte/pixel on the wire
            ch = if (indexed) 1 else channelsOf(colorType)
            interlaced = (b(o + 20) & 0xff) == 1
            if (depth != 8 || ch < 0 || (b(o + 20) & 0xff) > 1) return None
          case "PLTE" =>
            if (len % 3 != 0 || len == 0 || len > 768) return None
            palette = java.util.Arrays.copyOfRange(b, o + 8, o + 8 + len)
          case "IDAT" => idat.write(b, o + 8, len)
          case "IEND" => done = true
          case _ => ()
        }
        o += 12 + len
      }
      if (w <= 0 || h <= 0 || ch < 0 || idat.size() == 0) return None
      // allocation bound BEFORE trusting IHDR dimensions: a ~100-byte
      // PNG declaring 20000×20000×4 would otherwise allocate ~1.6 GB
      // and die with an OutOfMemoryError — an Error, not an Exception,
      // so it would escape the quarantine catch and kill the task. Cap
      // the raw buffer at 64 MB and at deflate's theoretical maximum
      // expansion (~1032:1) of the IDAT actually present.
      // Adam7 (interlace 1) is seven sub-images, each with its own
      // filtered scanlines, concatenated in one zlib stream; the
      // non-interlaced case is the single full-geometry "pass"
      val passes: Seq[(Int, Int, Int, Int)] =
        if (!interlaced) Seq((0, 0, 1, 1))
        else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      val passDims = passes.map { case (x0, y0, dx, dy) =>
        (if (w > x0) (w - x0 + dx - 1) / dx else 0,
          if (h > y0) (h - y0 + dy - 1) / dy else 0)
      }
      val rawLenL = passDims.map { case (pw, ph) =>
        if (pw == 0 || ph == 0) 0L else ph.toLong * (pw.toLong * ch + 1)
      }.sum
      if (rawLenL <= 0 || rawLenL > (64L << 20) ||
        rawLenL > idat.size().toLong * 1032L + 64L) return None
      val rawLen = rawLenL.toInt
      val raw = inflate(idat.toByteArray, rawLen)
      if (raw == null || raw.length != rawLen) return None
      val out = new Array[Byte](h * w * ch)
      var rawOff = 0
      passes.zip(passDims).foreach { case ((x0, y0, dx, dy), (pw, ph)) =>
        if (pw > 0 && ph > 0) {
          val pix = unfilterScanlines(raw, rawOff, pw, ph, ch)
          if (pix == null) return None
          var py = 0
          while (py < ph) {
            val oy = y0 + py * dy
            var px = 0
            while (px < pw) {
              System.arraycopy(pix, (py * pw + px) * ch, out,
                (oy * w + x0 + px * dx) * ch, ch)
              px += 1
            }
            py += 1
          }
          rawOff += ph * (pw * ch + 1)
        }
      }
      if (!indexed) Some(PixelImage(w, h, ch, out))
      else {
        // expand palette indices to RGB; an index past the declared
        // PLTE is corrupt media, not a default color
        if (palette == null) return None
        val nColors = palette.length / 3
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val ix = out(i) & 0xff
          if (ix >= nColors) return None
          rgb(i * 3) = palette(ix * 3)
          rgb(i * 3 + 1) = palette(ix * 3 + 1)
          rgb(i * 3 + 2) = palette(ix * 3 + 2)
          i += 1
        }
        Some(PixelImage(w, h, 3, rgb))
      }
    } catch { case _: Exception => None }

  /** Unfilter `h` scanlines of `w`×`ch` pixels starting at `raw(off)`
    * (each prefixed by its filter byte) into a contiguous pixel
    * buffer; null on an invalid filter type.
    */
  private def unfilterScanlines(raw: Array[Byte], off: Int,
      w: Int, h: Int, ch: Int): Array[Byte] = {
    val stride = w * ch
    val out = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      val base = off + r * (stride + 1)
      val filter = raw(base) & 0xff
      if (filter > 4) return null
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= ch) out(r * stride + i - ch) & 0xff else 0
        val u = if (r > 0) out((r - 1) * stride + i) & 0xff else 0
        val c = if (r > 0 && i >= ch) out((r - 1) * stride + i - ch) & 0xff else 0
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + u
          case 3 => x + (a + u) / 2
          case 4 => x + paeth(a, u, c)
        }
        out(r * stride + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    * the initial estimate a + b − c, ties broken a, then b, then c.
    */
  private[multimodal] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(z: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    // try/finally: DataFormatException on a corrupt deflate block must
    // not leak the Inflater's native zlib buffers — on an executor
    // scanning many hostile PNGs (exactly this file's threat model)
    // un-ended inflaters accumulate off-heap until GC finalization
    try {
      inf.setInput(z)
      val out = new Array[Byte](expect)
      var off = 0
      while (off < expect && !inf.finished()) {
        val n = inf.inflate(out, off, expect - off)
        // truncated stream, or a preset-dictionary (FDICT) stream we
        // don't supply — needsDictionary() makes inflate() return 0 with
        // needsInput() still false, so checking needsInput alone would
        // spin this loop forever on a crafted header
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        off += n
      }
      if (off == expect) out else null
    } finally inf.end()
  }

  /** Encode an 8-bit image as a real PNG: CRC'd IHDR, scanlines
    * FILTERED (cycling type = row mod 5 so every decoder path is
    * exercised by every nontrivial image), one zlib IDAT, IEND.
    */
  def encodePng(img: PixelImage): Array[Byte] = {
    val colorType = img.channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case n => throw new IllegalArgumentException(s"channels=$n")
    }
    val ch = img.channels
    val stride = img.width * ch
    val raw = new Array[Byte](img.height * (stride + 1))
    var r = 0
    while (r < img.height) {
      val filter = r % 5
      raw(r * (stride + 1)) = filter.toByte
      var i = 0
      while (i < stride) {
        val x = img.pixels(r * stride + i) & 0xff
        val a = if (i >= ch) img.pixels(r * stride + i - ch) & 0xff else 0
        val u = if (r > 0) img.pixels((r - 1) * stride + i) & 0xff else 0
        val c = if (r > 0 && i >= ch) img.pixels((r - 1) * stride + i - ch) & 0xff else 0
        val f = filter match {
          case 0 => x
          case 1 => x - a
          case 2 => x - u
          case 3 => x - (a + u) / 2
          case 4 => x - paeth(a, u, c)
        }
        raw(r * (stride + 1) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      r += 1
    }
    HeaderCodec.buildPng(img.width, img.height, 8, colorType, raw)
  }

  /** Box-filter resize: each target pixel is the rounded mean of its
    * source rectangle [tx·w/tw, (tx+1)·w/tw) × [ty·h/th, (ty+1)·h/th)
    * (never empty — bounds are clamped to at least one source pixel).
    * Integer arithmetic throughout → bit-deterministic everywhere.
    */
  def boxResize(img: PixelImage, tw: Int, th: Int): PixelImage = {
    require(tw > 0 && th > 0)
    val ch = img.channels
    val out = new Array[Byte](tw * th * ch)
    var ty = 0
    while (ty < th) {
      val y0 = (ty.toLong * img.height / th).toInt
      val y1 = math.max(y0 + 1, ((ty + 1).toLong * img.height / th).toInt)
      var tx = 0
      while (tx < tw) {
        val x0 = (tx.toLong * img.width / tw).toInt
        val x1 = math.max(x0 + 1, ((tx + 1).toLong * img.width / tw).toInt)
        val cnt = (y1 - y0) * (x1 - x0)
        var k = 0
        while (k < ch) {
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += img.pixels((y * img.width + x) * ch + k) & 0xff
              x += 1
            }
            y += 1
          }
          out((ty * tw + tx) * ch + k) = (((sum + cnt / 2) / cnt) & 0xff).toByte
          k += 1
        }
        tx += 1
      }
      ty += 1
    }
    PixelImage(tw, th, ch, out)
  }

  // ------------------------------------------------------------- WAV

  /** PCM16 sample decode: fmt must declare audioFormat=1 (PCM) and 16
    * bits/sample; the data chunk is interleaved LE16 frames. Same
    * hardened chunk walk as the header decode (no zero-progress spin).
    */
  def decodeWavPcm16(b: Array[Byte]): Option[PcmAudio] =
    try {
      if (!HeaderCodec.isWav(b)) return None
      var o = 12
      var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (o + 8 <= b.length && (channels == 0 || dataOff < 0)) {
        val id = new String(b, o, 4, "US-ASCII")
        val size = le32(b, o + 4).toLong & 0xffffffffL
        if (size > b.length.toLong) return None
        if (id == "fmt " && size >= 16 && o + 8 + 16 <= b.length) {
          if (le16(b, o + 8) != 1) return None // PCM only
          channels = le16(b, o + 10)
          sampleRate = le32(b, o + 12)
          bits = le16(b, o + 22)
        } else if (id == "data") {
          dataOff = o + 8
          dataLen = math.min(size, (b.length - dataOff).toLong).toInt
        }
        val step = 8 + size.toInt + (size.toInt & 1)
        if (step <= 0) return None
        o += step
      }
      if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0) return None
      val n = dataLen / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) { samples(i) = le16(b, dataOff + 2 * i).toShort; i += 1 }
      Some(PcmAudio(channels, sampleRate, samples))
    } catch { case _: Exception => None }

  /** Encode interleaved PCM16 frames as a canonical 44-byte-header WAV. */
  def encodeWav(a: PcmAudio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(a.channels.toShort)
      .putInt(a.sampleRate).putInt(a.sampleRate * a.channels * 2)
      .putShort((a.channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < a.samples.length) { buf.putShort(a.samples(i)); i += 1 }
    buf.array()
  }

  /** Box resample to exactly `targetFrames` interleaved frames: each
    * output frame is the per-channel rounded mean of its source frame
    * range — the audio analogue of [[boxResize]].
    */
  def boxResample(a: PcmAudio, targetFrames: Int): PcmAudio = {
    require(targetFrames > 0)
    val frames = a.samples.length / a.channels
    if (frames == 0) return a.copy(samples = new Array[Short](0))
    val out = new Array[Short](targetFrames * a.channels)
    var tf = 0
    while (tf < targetFrames) {
      val f0 = (tf.toLong * frames / targetFrames).toInt
      val f1 = math.max(f0 + 1, ((tf + 1).toLong * frames / targetFrames).toInt)
      var k = 0
      while (k < a.channels) {
        var sum = 0L
        var f = f0
        while (f < f1) { sum += a.samples(f * a.channels + k); f += 1 }
        val cnt = f1 - f0
        // symmetric rounding for signed sums
        val m = if (sum >= 0) (sum + cnt / 2) / cnt else -((-sum + cnt / 2) / cnt)
        out(tf * a.channels + k) = m.toShort
        k += 1
      }
      tf += 1
    }
    PcmAudio(a.channels, a.sampleRate, out)
  }
}
