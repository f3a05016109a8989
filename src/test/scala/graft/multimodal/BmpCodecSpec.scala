package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[BmpCodec]] (pure-JVM Windows DIB codec, r7). BMP is
  * lossless, so encode→decode round-trips must be exact, and both
  * interop directions run against the JDK: ImageIO reads our files
  * pixel-for-pixel, and its own 24-bit and 8-bit-indexed files read
  * pixel-for-pixel by us. RLE8 (which the JDK writer cannot emit) is
  * pinned with hand-built byte vectors covering every escape.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def px(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 17 + 7) & 0xff).toByte)

  test("encode -> decode round-trips exactly over odd and padded widths") {
    for ((w, h) <- Seq((1, 1), (3, 2), (16, 16), (33, 7), (144, 108))) {
      val img = PixelCodec.PixelImage(w, h, 3, px(w, h, w + h))
      val enc = BmpCodec.encode(img)
      assert(BmpCodec.dims(enc).contains((w, h, 24)))
      val dec = BmpCodec.decode(enc)
      assert(dec.isDefined, s"${w}x$h")
      assert(dec.get.width == w && dec.get.height == h && dec.get.channels == 3)
      assert(dec.get.pixels.toSeq == img.pixels.toSeq, s"${w}x$h lossless")
    }
  }

  test("ImageIO reads our files; we read ImageIO's 24-bit and 8-bit-indexed files") {
    val w = 31; val h = 14
    val img = PixelCodec.PixelImage(w, h, 3, px(w, h, 5))
    // ours -> JDK
    val jdk = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(BmpCodec.encode(img)))
    assert(jdk != null && jdk.getWidth == w && jdk.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val want = ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff)
      assert((jdk.getRGB(x, y) & 0xffffff) == want, s"jdk read ($x,$y)")
    }
    // JDK 24-bit -> ours
    def imageioBmp(bi: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "bmp", bos)
      bos.toByteArray
    }
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      bi.setRGB(x, y, ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff))
    }
    val ours = BmpCodec.decode(imageioBmp(bi))
    assert(ours.isDefined, "JDK 24-bit file must decode")
    assert(ours.get.pixels.toSeq == img.pixels.toSeq, "JDK 24-bit pixels")
    // JDK 8-bit indexed -> ours (palette path against a foreign writer)
    val pal = Array.tabulate(256)(i => (i * 0x010203) | 0xff000000)
    val icm = new java.awt.image.IndexColorModel(8, 256,
      pal.map(v => ((v >> 16) & 0xff).toByte),
      pal.map(v => ((v >> 8) & 0xff).toByte),
      pal.map(v => (v & 0xff).toByte))
    val idx = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      idx.getRaster.setSample(x, y, 0, (x * 7 + y * 13) & 0xff)
    val decIdx = BmpCodec.decode(imageioBmp(idx))
    assert(decIdx.isDefined, "JDK indexed file must decode")
    for (y <- 0 until h; x <- 0 until w) {
      val want = pal((x * 7 + y * 13) & 0xff)
      val o = (y * w + x) * 3
      assert((decIdx.get.pixels(o) & 0xff) == ((want >> 16) & 0xff) &&
        (decIdx.get.pixels(o + 1) & 0xff) == ((want >> 8) & 0xff) &&
        (decIdx.get.pixels(o + 2) & 0xff) == (want & 0xff), s"palette ($x,$y)")
    }
  }

  test("top-down 24-bit files (negative height) decode in raster order") {
    val w = 4; val h = 3
    val img = PixelCodec.PixelImage(w, h, 3, px(w, h, 9))
    val enc = BmpCodec.encode(img)
    // convert to top-down: negate the height and reverse the stored rows
    val td = enc.clone()
    java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -h)
    val rowBytes = (w * 3 + 3) & ~3
    for (r <- 0 until h)
      System.arraycopy(enc, 54 + (h - 1 - r) * rowBytes, td, 54 + r * rowBytes, rowBytes)
    val dec = BmpCodec.decode(td)
    assert(dec.isDefined && dec.get.pixels.toSeq == img.pixels.toSeq, "top-down")
  }

  /** Hand-built 8-bit BMP skeleton with the given compression and
    * pixel payload; a 4-entry grayscale-ish palette at indices 0..3.
    */
  private def bmp8(w: Int, h: Int, comp: Int, data: Array[Byte]): Array[Byte] = {
    val palette = Array(0, 60, 120, 250) // palette entry i -> gray level
    val out = new Array[Byte](54 + 16 + data.length)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(out.length)
    bb.putInt(0).putInt(54 + 16)
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1).putShort(8).putInt(comp)
    bb.putInt(data.length).putInt(0).putInt(0).putInt(4).putInt(0) // 4 colors
    palette.foreach(g => bb.put(g.toByte).put(g.toByte).put(g.toByte).put(0.toByte))
    bb.put(data)
    out
  }

  test("RLE8: encoded runs, absolute runs, deltas and end escapes, hand-computed") {
    // 6x2 image (stored bottom-up). Bottom row: run of 4 x idx1, then
    // two single-pixel runs (counts < 3 are not expressible as
    // absolute runs — (0,2) is the delta escape). Top row: delta
    // (+2,0) leaving two defaulted idx-0 pixels, then run 4 x idx3.
    val rle = Array[Int](
      4, 1, // run: 4 pixels of palette 1 (gray 60)
      1, 2, 1, 3, // two 1-pixel runs: idx 2 then idx 3
      0, 0, // end of line -> next stored row (image top row)
      0, 2, 2, 0, // delta: skip 2 right
      4, 3, // run: 4 pixels of palette 3 (gray 250)
      0, 1 // end of bitmap
    ).map(_.toByte)
    val dec = BmpCodec.decode(bmp8(6, 2, 1, rle))
    assert(dec.isDefined, "RLE8 must decode")
    def gray(x: Int, y: Int): Int = dec.get.pixels((y * 6 + x) * 3) & 0xff
    // image row 1 (stored first, bottom-up): 60,60,60,60,120,250
    assert((0 until 6).map(gray(_, 1)) == Seq(60, 60, 60, 60, 120, 250))
    // image row 0: delta leaves defaults (palette 0), then 250s
    assert((0 until 6).map(gray(_, 0)) == Seq(0, 0, 250, 250, 250, 250))
    // absolute-run padding: odd-count absolute runs carry a pad byte
    val oddAbs = Array[Int](0, 3, 1, 2, 3, 0 /*pad*/, 3, 0, 0, 1).map(_.toByte)
    val dec2 = BmpCodec.decode(bmp8(6, 1, 1, oddAbs))
    assert(dec2.isDefined, "odd absolute run with pad byte")
    assert((0 until 6).map(x => dec2.get.pixels(x * 3) & 0xff) ==
      Seq(60, 120, 250, 0, 0, 0))
  }

  test("structural damage quarantines: truncation, bad indices, runs past the row") {
    val good = BmpCodec.encode(PixelCodec.PixelImage(8, 8, 3, px(8, 8, 3)))
    assert(BmpCodec.decode(good.dropRight(10)).isEmpty, "truncated pixels")
    // 8-bit with an out-of-palette index (palette has 4 entries)
    assert(BmpCodec.decode(bmp8(2, 1, 0, Array[Byte](0, 9, 0, 0))).isEmpty,
      "palette index out of range")
    // RLE run spilling past the row
    assert(BmpCodec.decode(bmp8(2, 1, 1, Array[Byte](5, 1, 0, 1))).isEmpty,
      "RLE run past the row")
    // top-down RLE is invalid
    val rle = bmp8(2, 1, 1, Array[Byte](2, 1, 0, 1))
    assert(BmpCodec.decode(rle).isDefined, "sanity: the base RLE decodes")
    val tdRle = rle.clone()
    java.nio.ByteBuffer.wrap(tdRle).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -1)
    assert(BmpCodec.decode(tdRle).isEmpty, "top-down RLE8 quarantines")
    // 16-bpp / BI_BITFIELDS are out of subset
    val bf = good.clone()
    java.nio.ByteBuffer.wrap(bf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 3)
    assert(BmpCodec.decode(bf).isEmpty, "BI_BITFIELDS quarantines")
    // fuzz: mutations never throw
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 300) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      BmpCodec.decode(m).foreach(i => assert(i.pixels.length == i.width * i.height * 3))
    }
    for (cut <- 1 until good.length by 5) BmpCodec.decode(good.take(cut))
  }

  test("header decode reports BMP geometry through HeaderCodec") {
    val enc = BmpCodec.encode(PixelCodec.PixelImage(40, 20, 3, px(40, 20, 2)))
    assert(HeaderCodec.decode(enc)
      .contains(Multimodal.MediaHeader("bmp", 40, 20, 0L, 3)))
  }
}
