package graft.multimodal

import scala.util.control.NonFatal

/** Pure-JVM BMP (Windows DIB) codec, written from the public format
  * specification — the fourth everyday image container after
  * PNG/JPEG/GIF in the decode matrix. Decodes BITMAPINFOHEADER (and
  * larger V4/V5 headers, whose extra fields are size-skipped) files:
  * 24-bit BI_RGB (bottom-up and top-down), 8-bit palette BI_RGB, and
  * 8-bit BI_RLE8 (end-of-line/bitmap, delta and absolute runs, all
  * bounds-checked) into interleaved RGB. Encodes 24-bit BI_RGB
  * bottom-up with word-aligned rows — the layout every reader
  * (including the JDK's) accepts.
  *
  * Correctness: BMP is lossless, so decode(encode(x)) == x exactly,
  * and the spec pins two-way ImageIO interop (the JDK reads our files
  * pixel-for-pixel; its own 24-bit and 8-bit-indexed files read
  * pixel-for-pixel by us) plus hand-built RLE8 vectors. Structural
  * damage (truncated pixel data, out-of-palette indices, runs past
  * the row, spilling offsets) quarantines to None — the dead-letter
  * discipline of the other codecs.
  */
object BmpCodec {

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M'

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Header-stage view: (width, height, bits per pixel). */
  def dims(b: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      if (!isBmp(b)) return None
      val hdrSize = i32(b, 14)
      if (hdrSize < 40) return None // BITMAPCOREHEADER out of subset
      val w = i32(b, 18); val h = math.abs(i32(b, 22))
      val bpp = u16(b, 28)
      if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15)) None
      else Some((w, h, bpp))
    } catch { case NonFatal(_) => None }

  /** Decode to interleaved RGB. */
  def decode(b: Array[Byte]): Option[PixelCodec.PixelImage] =
    try {
      if (!isBmp(b)) return None
      val hdrSize = i32(b, 14)
      require(hdrSize >= 40 && hdrSize <= 256, "info header size")
      val dataOff = i32(b, 10)
      val w = i32(b, 18)
      val hRaw = i32(b, 22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      require(w > 0 && h > 0 && w <= (1 << 15) && h <= (1 << 15), "dims")
      require(u16(b, 26) == 1, "planes")
      val bpp = u16(b, 28)
      val comp = i32(b, 30)
      require(dataOff >= 14 + hdrSize && dataOff <= b.length, "data offset")
      val out = new Array[Byte](w * h * 3)
      @inline def rowOf(stored: Int): Int = if (topDown) stored else h - 1 - stored

      if (bpp == 24 && comp == 0) {
        val rowBytes = (w * 3 + 3) & ~3
        require(dataOff.toLong + rowBytes.toLong * h <= b.length, "pixel data truncated")
        var sy = 0
        while (sy < h) {
          val src = dataOff + sy * rowBytes
          val dst = rowOf(sy) * w * 3
          var x = 0
          while (x < w) {
            out(dst + x * 3) = b(src + x * 3 + 2) // R (stored BGR)
            out(dst + x * 3 + 1) = b(src + x * 3 + 1)
            out(dst + x * 3 + 2) = b(src + x * 3)
            x += 1
          }
          sy += 1
        }
      } else if (bpp == 8 && (comp == 0 || comp == 1)) {
        val clrUsed = i32(b, 46)
        val nColors = if (clrUsed == 0) 256 else clrUsed
        require(nColors > 0 && nColors <= 256, "palette size")
        val palOff = 14 + hdrSize
        require(palOff + 4 * nColors <= dataOff, "palette spills into pixel data")
        // indexed output written via the palette (BGRA quads)
        @inline def putIdx(x: Int, row: Int, idx: Int): Unit = {
          require(idx < nColors, "palette index out of range")
          val p = palOff + idx * 4
          val d = (row * w + x) * 3
          out(d) = b(p + 2); out(d + 1) = b(p + 1); out(d + 2) = b(p)
        }
        if (comp == 0) {
          val rowBytes = (w + 3) & ~3
          require(dataOff.toLong + rowBytes.toLong * h <= b.length, "pixel data truncated")
          var sy = 0
          while (sy < h) {
            val src = dataOff + sy * rowBytes
            val row = rowOf(sy)
            var x = 0
            while (x < w) { putIdx(x, row, b(src + x) & 0xff); x += 1 }
            sy += 1
          }
        } else { // BI_RLE8: always bottom-up
          require(!topDown, "top-down RLE8 is invalid")
          // unwritten pixels default to palette entry 0
          var i0 = 0
          while (i0 < h) { var x0 = 0; while (x0 < w) { putIdx(x0, rowOf(i0), 0); x0 += 1 }; i0 += 1 }
          var p = dataOff
          var x = 0
          var sy = 0 // stored row (bottom-up)
          var done = false
          while (!done) {
            require(p + 2 <= b.length, "RLE truncated")
            val n = b(p) & 0xff; val v = b(p + 1) & 0xff
            p += 2
            if (n > 0) { // encoded run
              require(x + n <= w && sy < h, "RLE run past the row")
              var k = 0
              while (k < n) { putIdx(x + k, rowOf(sy), v); k += 1 }
              x += n
            } else v match {
              case 0 => x = 0; sy += 1 // end of line
              case 1 => done = true // end of bitmap
              case 2 => // delta
                require(p + 2 <= b.length, "RLE delta truncated")
                x += b(p) & 0xff; sy += b(p + 1) & 0xff
                require(x <= w && sy <= h, "RLE delta out of bounds")
                p += 2
              case cnt => // absolute run, word-aligned
                require(x + cnt <= w && sy < h, "RLE absolute past the row")
                require(p + cnt <= b.length, "RLE absolute truncated")
                var k = 0
                while (k < cnt) { putIdx(x + k, rowOf(sy), b(p + k) & 0xff); k += 1 }
                x += cnt
                p += cnt + (cnt & 1) // pad to 16-bit boundary
            }
          }
        }
      } else throw new IllegalStateException(s"bpp $bpp / compression $comp out of subset")
      Some(PixelCodec.PixelImage(w, h, 3, out))
    } catch { case NonFatal(_) => None }

  /** Encode interleaved RGB as 24-bit BI_RGB, bottom-up. */
  def encode(img: PixelCodec.PixelImage): Array[Byte] = {
    require(img.channels == 3, "BMP encode expects RGB")
    val rowBytes = (img.width * 3 + 3) & ~3
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(out.length)
    bb.putInt(0).putInt(54) // reserved, data offset
    bb.putInt(40).putInt(img.width).putInt(img.height) // bottom-up
    bb.putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
    bb.putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi
    var sy = 0
    while (sy < img.height) {
      val srcRow = (img.height - 1 - sy) * img.width * 3
      val dst = 54 + sy * rowBytes
      var x = 0
      while (x < img.width) {
        out(dst + x * 3) = img.pixels(srcRow + x * 3 + 2) // B
        out(dst + x * 3 + 1) = img.pixels(srcRow + x * 3 + 1)
        out(dst + x * 3 + 2) = img.pixels(srcRow + x * 3) // R
        x += 1
      }
      sy += 1
    }
    out
  }
}
