package graft.multimodal

import scala.util.control.NonFatal

/** Pure-JVM GIF codec (GIF87a/89a): the last everyday image container
  * in the X33 matrix after PNG/JPEG. Decoder implements the full
  * static format from the public specification — logical screen
  * descriptor, global/local color tables, graphic control extensions
  * (frame delays, transparency index), four-pass row interlacing, and
  * variable-width LSB-first LZW with CLEAR/EOI handling and the 4096-
  * entry dictionary cap. [[decode]] returns the first frame composited
  * on the logical screen; [[frames]] enumerates every frame's rect,
  * delay, and RGB pixels (animation DISPOSAL composition between
  * frames is out of scope — frames decode independently, which is
  * what a frame-sampling training pipeline consumes; transparency is
  * reported, not applied).
  *
  * The encoder writes valid single- or multi-frame GIF89a with a
  * fixed 3:3:2 global palette and literal-code LZW (CLEAR emitted
  * before the dictionary would grow the code width — the classic
  * "uncompressed GIF" construction, decodable by any conformant
  * reader), giving round-trip and animation tests that do not depend
  * on a foreign writer. Hostile input quarantines to None: every read
  * is bounds-checked, sub-block walks are bounded, and LZW code
  * streams that reference undefined dictionary entries fail the
  * decode rather than emitting garbage.
  */
object GifCodec {

  import PixelCodec.PixelImage

  final case class GifFrame(
      left: Int, top: Int, width: Int, height: Int,
      delayMs: Int,
      transparentIndex: Int, // -1 = opaque
      pixels: Array[Byte]) // RGB, width*height*3

  private val MaxPixels = 1 << 24

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Logical screen geometry (for the header-decode stage). */
  def screenDims(b: Array[Byte]): Option[(Int, Int)] =
    if (!isGif(b) || b.length < 13) None
    else {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w <= 0 || h <= 0) None else Some((w, h))
    }

  /** All frames, decoded independently. */
  def frames(b: Array[Byte]): Option[Vector[GifFrame]] =
    try framesOrNull(b) catch { case NonFatal(_) => None }

  /** First frame composited on the logical screen (background = the
    * background-color palette entry, black without a global table).
    */
  def decode(b: Array[Byte]): Option[PixelImage] =
    try {
      val fs = framesOrNull(b).getOrElse(return None)
      if (fs.isEmpty) return None
      val (w, h) = screenDims(b).getOrElse(return None)
      if (w.toLong * h > MaxPixels) return None
      val out = new Array[Byte](w * h * 3)
      // background fill
      val gct = globalTable(b)
      val bgIdx = if (b.length > 11) b(11) & 0xff else 0
      if (gct != null && bgIdx * 3 + 2 < gct.length) {
        var i = 0
        while (i < w * h) {
          out(i * 3) = gct(bgIdx * 3); out(i * 3 + 1) = gct(bgIdx * 3 + 1)
          out(i * 3 + 2) = gct(bgIdx * 3 + 2)
          i += 1
        }
      }
      val f = fs.head
      var y = 0
      while (y < f.height) {
        val oy = f.top + y
        if (oy >= 0 && oy < h) {
          var x = 0
          while (x < f.width) {
            val ox = f.left + x
            if (ox >= 0 && ox < w)
              System.arraycopy(f.pixels, (y * f.width + x) * 3, out, (oy * w + ox) * 3, 3)
            x += 1
          }
        }
        y += 1
      }
      Some(PixelImage(w, h, 3, out))
    } catch { case NonFatal(_) => None }

  private def globalTable(b: Array[Byte]): Array[Byte] = {
    if (b.length < 13) return null
    val packed = b(10) & 0xff
    if ((packed & 0x80) == 0) null
    else {
      val n = 2 << (packed & 7)
      if (13 + 3 * n > b.length) null
      else java.util.Arrays.copyOfRange(b, 13, 13 + 3 * n)
    }
  }

  private def framesOrNull(b: Array[Byte]): Option[Vector[GifFrame]] = {
    if (!isGif(b) || b.length < 14) return None
    val (sw, sh) = screenDims(b).getOrElse(return None)
    if (sw.toLong * sh > MaxPixels) return None
    val gct = globalTable(b)
    var p = 13 + (if (gct != null) gct.length else 0)
    val out = Vector.newBuilder[GifFrame]
    var delayMs = 0
    var transparent = -1
    var done = false
    while (!done) {
      if (p >= b.length) return None // missing trailer
      (b(p) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          if (p + 2 > b.length) return None
          val label = b(p + 1) & 0xff
          p += 2
          if (label == 0xf9 && p + 6 <= b.length && (b(p) & 0xff) == 4) {
            // graphic control: packed, delay (1/100 s), transparent idx
            delayMs = le16(b, p + 2) * 10
            transparent = if ((b(p + 1) & 1) != 0) b(p + 4) & 0xff else -1
          }
          p = skipSubBlocks(b, p).getOrElse(return None)
        case 0x2c => // image descriptor
          if (p + 10 > b.length) return None
          val left = le16(b, p + 1); val top = le16(b, p + 3)
          val fw = le16(b, p + 5); val fh = le16(b, p + 7)
          val packed = b(p + 9) & 0xff
          val interlaced = (packed & 0x40) != 0
          p += 10
          val table =
            if ((packed & 0x80) != 0) {
              val n = 2 << (packed & 7)
              if (p + 3 * n > b.length) return None
              val t = java.util.Arrays.copyOfRange(b, p, p + 3 * n)
              p += 3 * n
              t
            } else gct
          if (table == null) return None
          if (fw <= 0 || fh <= 0 || fw.toLong * fh > MaxPixels) return None
          if (p >= b.length) return None
          val minCode = b(p) & 0xff
          if (minCode < 2 || minCode > 11) return None
          p += 1
          // gather the LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var q = p
          var blockDone = false
          while (!blockDone) {
            if (q >= b.length) return None
            val n = b(q) & 0xff
            q += 1
            if (n == 0) blockDone = true
            else {
              if (q + n > b.length) return None
              data.write(b, q, n)
              q += n
            }
          }
          p = q
          val idx = lzwDecode(data.toByteArray, minCode, fw * fh)
            .getOrElse(return None)
          // de-interlace + palette expansion
          val nColors = table.length / 3
          val px = new Array[Byte](fw * fh * 3)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(fh)(identity)
            else {
              val rows = new Array[Int](fh)
              var k = 0
              for (start <- Seq(0, 4, 2, 1); step = if (start == 0) 8 else start * 2;
                  r <- start until fh by (if (start == 0) 8 else start * 2)) {
                rows(k) = r; k += 1
              }
              rows
            }
          var srcRow = 0
          while (srcRow < fh) {
            val dstRow = rowOrder(srcRow)
            var x = 0
            while (x < fw) {
              val ix = idx(srcRow * fw + x) & 0xff
              if (ix >= nColors) return None
              val o = (dstRow * fw + x) * 3
              px(o) = table(ix * 3); px(o + 1) = table(ix * 3 + 1)
              px(o + 2) = table(ix * 3 + 2)
              x += 1
            }
            srcRow += 1
          }
          out += GifFrame(left, top, fw, fh, delayMs, transparent, px)
          delayMs = 0
          transparent = -1
        case _ => return None // unknown block type: corrupt
      }
    }
    Some(out.result())
  }

  /** One frame's byte extents in a GIF stream: `[start, end)` spans the
    * image descriptor through its data terminator; `[gceStart, gceEnd)`
    * the preceding graphic-control extension (-1/-1 if absent).
    * `ptsMs` is the display start (cumulative prior delays), `delayMs`
    * the frame's own display duration.
    */
  final case class GifFrameRange(
      index: Int, ptsMs: Long, delayMs: Int,
      gceStart: Int, gceEnd: Int,
      start: Int, end: Int)

  /** Frame byte ranges + timestamps from a BLOCK-LEVEL walk — no LZW
    * decode, the frame-sampling discipline (the MP4 path's sample-table
    * enumeration, in GIF's sub-block framing). Structural damage
    * (missing trailer, truncated sub-blocks, out-of-range code size)
    * quarantines to None.
    */
  def frameRanges(b: Array[Byte]): Option[Vector[GifFrameRange]] =
    try {
      if (!isGif(b) || b.length < 14) return None
      if (screenDims(b).isEmpty) return None
      var p = 13 + gctLength(b)
      if (p > b.length) return None
      val out = Vector.newBuilder[GifFrameRange]
      var idx = 0
      var pts = 0L
      var delay = 0
      var gceS = -1; var gceE = -1
      var done = false
      while (!done) {
        if (p >= b.length) return None
        (b(p) & 0xff) match {
          case 0x3b => done = true
          case 0x21 =>
            if (p + 2 > b.length) return None
            val label = b(p + 1) & 0xff
            val extStart = p
            p += 2
            if (label == 0xf9 && p + 6 <= b.length && (b(p) & 0xff) == 4)
              delay = le16(b, p + 2) * 10
            p = skipSubBlocks(b, p).getOrElse(return None)
            if (label == 0xf9) { gceS = extStart; gceE = p }
          case 0x2c =>
            val start = p
            if (p + 10 > b.length) return None
            val packed = b(p + 9) & 0xff
            p += 10
            if ((packed & 0x80) != 0) {
              p += 3 * (2 << (packed & 7))
              if (p > b.length) return None
            }
            if (p >= b.length) return None
            val minCode = b(p) & 0xff
            if (minCode < 2 || minCode > 11) return None
            p += 1
            p = skipSubBlocks(b, p).getOrElse(return None)
            out += GifFrameRange(idx, pts, delay, gceS, gceE, start, p)
            pts += delay
            idx += 1; delay = 0; gceS = -1; gceE = -1
          case _ => return None
        }
      }
      Some(out.result())
    } catch { case NonFatal(_) => None }

  private def gctLength(b: Array[Byte]): Int = {
    val packed = b(10) & 0xff
    if ((packed & 0x80) != 0) 3 * (2 << (packed & 7)) else 0
  }

  /** Re-wrap one frame of `b` as a STANDALONE single-frame GIF: the
    * source's header + logical screen descriptor + global color table,
    * the frame's own graphic-control extension (if any), the frame
    * bytes verbatim, and a trailer — pure byte slices, no entropy
    * work, and decodable by any conformant reader because the source
    * was. `f` must come from [[frameRanges]] of the same bytes.
    */
  def extractFrame(b: Array[Byte], f: GifFrameRange): Array[Byte] = {
    val headerEnd = 13 + gctLength(b)
    val out = new java.io.ByteArrayOutputStream()
    out.write(b, 0, headerEnd)
    if (f.gceStart >= 0) out.write(b, f.gceStart, f.gceEnd - f.gceStart)
    out.write(b, f.start, f.end - f.start)
    out.write(0x3b)
    out.toByteArray
  }

  private def skipSubBlocks(b: Array[Byte], from: Int): Option[Int] = {
    var p = from
    while (p < b.length) {
      val n = b(p) & 0xff
      p += 1
      if (n == 0) return Some(p)
      p += n
      if (p > b.length) return None
    }
    None
  }

  /** Variable-width LSB-first LZW decode of exactly `need` indices. */
  private def lzwDecode(data: Array[Byte], minCode: Int, need: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](need)
    var outN = 0
    var next = eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0
    var nBits = 0
    var p = 0
    while (outN < need) {
      while (nBits < width) {
        if (p >= data.length) return None // entropy exhausted early
        acc |= (data(p) & 0xff) << nBits
        nBits += 8
        p += 1
      }
      val code = acc & ((1 << width) - 1)
      acc >>>= width
      nBits -= width
      if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        return if (outN == need) Some(out) else None
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        out(outN) = code.toByte
        outN += 1
        prev = code
      } else {
        // clear/eoi were intercepted above, so a valid code is a
        // literal, a defined dictionary entry, or exactly `next`
        // (the KwKwK case); anything beyond references an entry the
        // encoder could not have defined yet
        if (code > next) return None
        // first index of the sequence this code expands to — for the
        // KwKwK case the code is not in the dictionary yet, and its
        // sequence is seq(prev) + first(prev)
        val first = firstOf(prefix, suffix, if (code == next) prev else code, clear)
        var sp = 0
        var cur =
          if (code == next) { stack(sp) = first; sp += 1; prev } else code
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur)
          sp += 1
          if (sp > 4096) return None
          cur = prefix(cur)
        }
        stack(sp) = cur.toByte
        sp += 1
        // emit reversed
        while (sp > 0) {
          sp -= 1
          if (outN < need) { out(outN) = stack(sp); outN += 1 }
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** First index of the sequence a dictionary code expands to. */
  private def firstOf(prefix: Array[Int], suffix: Array[Byte], code: Int, clear: Int): Byte = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c.toByte
  }

  // ---------------------------------------------------------------
  // Encoder: fixed 3:3:2 palette, literal-code LZW
  // ---------------------------------------------------------------

  /** 3:3:2 quantization of an RGB (or gray) pixel to the fixed
    * palette index — the lossy step GIF's 256-color limit forces.
    */
  private def quant332(r: Int, g: Int, bch: Int): Int =
    (r & 0xe0) | ((g & 0xe0) >> 3) | ((bch & 0xc0) >> 6)

  private def palette332: Array[Byte] = {
    val t = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      val r = (i >> 5) & 7; val g = (i >> 2) & 7; val bb = i & 3
      t(i * 3) = ((r * 255) / 7).toByte
      t(i * 3 + 1) = ((g * 255) / 7).toByte
      t(i * 3 + 2) = ((bb * 255) / 3).toByte
      i += 1
    }
    t
  }

  /** Single-frame convenience encode. */
  def encode(img: PixelImage): Array[Byte] = encodeFrames(Seq((img, 0)))

  /** Multi-frame GIF89a: every frame full-screen at the shared 3:3:2
    * global palette, per-frame delays via graphic control extensions.
    */
  def encodeFrames(framesIn: Seq[(PixelImage, Int)]): Array[Byte] = {
    require(framesIn.nonEmpty, "need at least one frame")
    val w = framesIn.head._1.width
    val h = framesIn.head._1.height
    require(framesIn.forall(f => f._1.width == w && f._1.height == h),
      "all frames must share the screen geometry")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | 7) // GCT present, 256 entries
    out.write(0) // background index
    out.write(0) // aspect
    out.write(palette332, 0, 768)
    framesIn.foreach { case (img, delayMs) =>
      // graphic control extension (delay in 1/100 s)
      val d = delayMs / 10
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(d & 0xff); out.write(d >> 8); out.write(0); out.write(0)
      // image descriptor: full screen, no LCT, not interlaced
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(w & 0xff); out.write(w >> 8)
      out.write(h & 0xff); out.write(h >> 8)
      out.write(0)
      // LZW: literal codes at fixed width 9, CLEAR before the
      // decoder's dictionary would widen the code size
      out.write(8) // min code size
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nBits = 0
      def put(code: Int): Unit = {
        acc |= code.toLong << nBits
        nBits += 9
        while (nBits >= 8) {
          bits.write((acc & 0xff).toInt)
          acc >>>= 8
          nBits -= 8
        }
      }
      put(256) // initial CLEAR
      var sinceClear = 0
      var i = 0
      val n = w * h
      while (i < n) {
        val (r, g, bch) = img.channels match {
          case 1 =>
            val v = img.pixels(i) & 0xff; (v, v, v)
          case 3 =>
            (img.pixels(i * 3) & 0xff, img.pixels(i * 3 + 1) & 0xff,
              img.pixels(i * 3 + 2) & 0xff)
          case _ => throw new IllegalArgumentException("1- or 3-channel input")
        }
        put(quant332(r, g, bch))
        sinceClear += 1
        // dict: 258 + sinceClear entries pending; widen at 512
        if (sinceClear >= 253) { put(256); sinceClear = 0 }
        i += 1
      }
      put(257) // EOI
      if (nBits > 0) bits.write((acc & 0xff).toInt)
      val payload = bits.toByteArray
      var off = 0
      while (off < payload.length) {
        val len = math.min(255, payload.length - off)
        out.write(len)
        out.write(payload, off, len)
        off += len
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }
}
