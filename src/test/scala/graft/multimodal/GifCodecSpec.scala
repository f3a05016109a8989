package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[GifCodec]] (r7). Oracles: our own encoder (3:3:2 palette is
  * deterministic, so decode(encode(x)) must equal the quantized
  * pixels EXACTLY), the JDK's ImageIO codec in both directions
  * (lossless palette formats compare byte-exactly), and hostile-input
  * quarantine.
  */
class GifCodecSpec extends AnyFunSuite {

  import GifCodec._
  import PixelCodec.PixelImage

  private def rgb(w: Int, h: Int, seed: Int): PixelImage = {
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) { px(i) = ((i * 31 + seed * 17 + 7) & 0xff).toByte; i += 1 }
    PixelImage(w, h, 3, px)
  }

  private def quant332Ref(img: PixelImage): Array[Byte] = {
    val out = new Array[Byte](img.width * img.height * 3)
    var i = 0
    while (i < img.width * img.height) {
      val (r, g, b) = (img.pixels(i * 3) & 0xff, img.pixels(i * 3 + 1) & 0xff,
        img.pixels(i * 3 + 2) & 0xff)
      out(i * 3) = (((r >> 5) * 255) / 7).toByte
      out(i * 3 + 1) = (((g >> 5) * 255) / 7).toByte
      out(i * 3 + 2) = (((b >> 6) * 255) / 3).toByte
      i += 1
    }
    out
  }

  test("encode→decode round-trip: exact 3:3:2-quantized pixels over sizes") {
    for ((w, h) <- Seq((1, 1), (7, 3), (32, 24), (61, 47), (256, 2))) {
      val img = rgb(w, h, w + h)
      val gif = encode(img)
      assert(isGif(gif))
      val dec = decode(gif)
      assert(dec.isDefined, s"${w}x$h rejected")
      assert(dec.get.width == w && dec.get.height == h && dec.get.channels == 3)
      assert(dec.get.pixels.toSeq == quant332Ref(img).toSeq, s"${w}x$h pixels")
    }
  }

  test("animated GIF: frames() returns every frame with delays, exact pixels") {
    val fs = (0 until 4).map(k => (rgb(24, 16, 100 + k), k * 40))
    val gif = encodeFrames(fs)
    val got = frames(gif)
    assert(got.isDefined)
    assert(got.get.length == 4)
    got.get.zipWithIndex.foreach { case (f, k) =>
      assert(f.left == 0 && f.top == 0 && f.width == 24 && f.height == 16)
      assert(f.delayMs == k * 40, s"frame $k delay")
      assert(f.transparentIndex == -1)
      assert(f.pixels.toSeq == quant332Ref(fs(k)._1).toSeq, s"frame $k pixels")
    }
    // decode() composites the FIRST frame
    assert(decode(gif).get.pixels.toSeq == quant332Ref(fs.head._1).toSeq)
  }

  test("interop: ImageIO reads our GIFs exactly; we read ImageIO's exactly") {
    val img = rgb(40, 28, 5)
    val ours = encode(img)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(bi != null, "ImageIO rejected our GIF")
    assert(bi.getWidth == 40 && bi.getHeight == 28)
    val q = quant332Ref(img)
    for (y <- 0 until 28; x <- 0 until 40) {
      val v = bi.getRGB(x, y)
      val o = (y * 40 + x) * 3
      assert(((v >> 16) & 0xff) == (q(o) & 0xff) && ((v >> 8) & 0xff) == (q(o + 1) & 0xff)
        && (v & 0xff) == (q(o + 2) & 0xff), s"ImageIO disagrees at ($x,$y)")
    }
    // the other direction: ImageIO writes an indexed GIF (its own
    // palette + real LZW compression), we must decode it exactly
    val src = new java.awt.image.BufferedImage(33, 21,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 21; x <- 0 until 33)
      src.setRGB(x, y, ((x * 37) % 256 << 16) | ((y * 91) % 256 << 8) | ((x + y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos))
    val foreign = bos.toByteArray
    val dec = decode(foreign)
    assert(dec.isDefined, "foreign GIF rejected")
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(foreign))
    for (y <- 0 until 21; x <- 0 until 33) {
      val v = ref.getRGB(x, y)
      val o = (y * 33 + x) * 3
      assert(((v >> 16) & 0xff) == (dec.get.pixels(o) & 0xff) &&
        ((v >> 8) & 0xff) == (dec.get.pixels(o + 1) & 0xff) &&
        (v & 0xff) == (dec.get.pixels(o + 2) & 0xff), s"foreign pixel ($x,$y)")
    }
  }

  test("frameRanges + extractFrame: block walk matches the full parse; standalone frames decode") {
    val fs = (0 until 4).map(k => (rgb(24, 16, 100 + k), k * 40))
    val gif = encodeFrames(fs)
    val ranges = frameRanges(gif)
    assert(ranges.isDefined && ranges.get.length == 4)
    val full = frames(gif).get
    var pts = 0L
    ranges.get.zipWithIndex.foreach { case (fr, k) =>
      assert(fr.index == k && fr.delayMs == k * 40 && fr.ptsMs == pts, s"frame $k timing")
      pts += fr.delayMs
      assert(fr.gceStart >= 0 && fr.gceEnd > fr.gceStart, "encoder writes a GCE per frame")
      // re-wrapped standalone single-frame GIF: decodes to the same
      // pixels the full parse produced for that frame, keeps the delay
      val standalone = extractFrame(gif, fr)
      assert(isGif(standalone))
      assert(decode(standalone).get.pixels.toSeq == full(k).pixels.toSeq, s"frame $k pixels")
      val solo = frames(standalone).get
      assert(solo.length == 1 && solo.head.delayMs == k * 40)
    }
    // foreign stream: ImageIO's writer (its own palette, real LZW, no
    // GCE on a plain single-frame write) must walk and re-wrap too
    val src = new java.awt.image.BufferedImage(29, 17,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 17; x <- 0 until 29)
      src.setRGB(x, y, ((x * 53) % 256 << 16) | ((y * 29) % 256 << 8) | ((x ^ y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos))
    val foreign = bos.toByteArray
    val fr2 = frameRanges(foreign)
    assert(fr2.isDefined && fr2.get.length == 1)
    val rewrapped = extractFrame(foreign, fr2.get.head)
    assert(decode(rewrapped).get.pixels.toSeq == decode(foreign).get.pixels.toSeq)
    // structural damage: dropped trailer quarantines; truncation sweep
    // never throws
    assert(frameRanges(gif.dropRight(1)).isEmpty)
    for (cut <- 1 until gif.length by 7) frameRanges(gif.take(cut))
  }

  test("header geometry and hostile inputs") {
    val gif = encode(rgb(19, 11, 1))
    assert(screenDims(gif).contains((19, 11)))
    assert(decode(Array.emptyByteArray).isEmpty)
    assert(decode("GIF89a".getBytes("US-ASCII")).isEmpty)
    // truncation sweep: None or a valid first frame, never a throw
    for (cut <- 1 until gif.length by 3) {
      decode(gif.take(cut)).foreach(img => assert(img.width == 19 && img.height == 11))
      frames(gif.take(cut))
    }
    // mutations
    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 500) {
      val m = gif.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decode(m); frames(m)
    }
    // LZW stream referencing an undefined dictionary entry: patch a
    // high code into the entropy data of a tiny hand-checked stream
    val tiny = encode(rgb(4, 4, 2))
    // find the image data: after descriptor + min code size, first
    // sub-block; corrupt its middle bytes to all-ones (codes beyond
    // `next`) — must quarantine or decode, never throw
    val at = tiny.indexOfSlice(Seq[Byte](0x2c))
    assert(at > 0)
    val bad = tiny.clone()
    for (i <- at + 13 until math.min(at + 18, bad.length)) bad(i) = 0xff.toByte
    decode(bad) // no throw; usually None
  }
}
