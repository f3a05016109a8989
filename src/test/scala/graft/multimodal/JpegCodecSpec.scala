package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** JpegCodec correctness: IDCT golden vectors, encode/decode roundtrip
  * fidelity, hostile input, and — the strongest evidence the wire
  * format is REAL JPEG — interop with the JDK's own ImageIO codec in
  * BOTH directions (our bytes through their decoder, their bytes
  * through ours). Two conformant JPEG decoders may legitimately differ
  * by a couple of code values per sample (T.81 puts accuracy bounds on
  * the IDCT, it does not pin bit-exact output), so the cross-decoder
  * comparisons use small per-sample tolerances instead of equality.
  */
class JpegCodecSpec extends AnyFunSuite {
  import PixelCodec.PixelImage

  // deterministic smooth test image: luma gradient, constant-ish color
  // (smooth chroma keeps legitimate upsampling-filter differences tiny)
  private def gradient(w: Int, h: Int): PixelImage = {
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 255) / math.max(1, w - 1) + (y * 255) / math.max(1, h - 1)) / 2
        val o = (y * w + x) * 3
        px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = (255 - v).toByte
        x += 1
      }
      y += 1
    }
    PixelImage(w, h, 3, px)
  }

  private def grayRamp(w: Int, h: Int): PixelImage = {
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < px.length) { px(i) = ((i * 7) % 256).toByte; i += 1 }
    PixelImage(w, h, 1, px)
  }

  private def maxAbsDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"${a.length} vs ${b.length}")
    var m = 0
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > m) m = d
      i += 1
    }
    m
  }

  test("IDCT golden vectors: DC-only is flat, single AC is the cosine basis") {
    // DC-only block: F(0,0)=c → every output sample = c/8
    val dc = new Array[Double](64)
    dc(0) = 240.0
    val flat = JpegCodec.idct(dc)
    flat.foreach(v => assert(math.abs(v - 30.0) < 1e-9))
    // single AC coefficient F(u=1,v=0)=16: out(x,y) =
    // (1/4)·C(u=1)·C(v=0)·16·cos((2x+1)π/16) — C(0)=1/√2 from the
    // constant vertical basis — constant down each column
    val ac = new Array[Double](64)
    ac(1) = 16.0
    val got = JpegCodec.idct(ac)
    for (y <- 0 until 8; x <- 0 until 8) {
      val expect = 0.25 * (1.0 / math.sqrt(2.0)) * 16.0 *
        math.cos((2 * x + 1) * math.Pi / 16.0)
      assert(math.abs(got(y * 8 + x) - expect) < 1e-9, s"($x,$y)")
    }
    // FDCT inverts IDCT (orthonormal pair): random-ish block roundtrips
    val block = Array.tabulate(64)(i => ((i * 37) % 256 - 128).toDouble)
    val rt = JpegCodec.idct(JpegCodec.fdct(block))
    for (i <- 0 until 64) assert(math.abs(rt(i) - block(i)) < 1e-9)
  }

  test("encode→decode roundtrip: smooth images reconstruct within quantization error") {
    val img = gradient(64, 48)
    val jpg = JpegCodec.encode(img)
    // real JFIF wire format: SOI..EOI, header decoder agrees on geometry
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
    assert(HeaderCodec.decode(jpg).contains(Multimodal.MediaHeader("jpeg", 64, 48, 0L, 3)))
    val back = JpegCodec.decode(jpg).get
    assert(back.width == 64 && back.height == 48 && back.channels == 3)
    // smooth content at quality 88: per-sample error stays single/low
    // double digits (lossy by design — this bounds the quantization,
    // it does not assert exactness)
    assert(maxAbsDiff(back.pixels, img.pixels) <= 10,
      s"max err ${maxAbsDiff(back.pixels, img.pixels)}")
    val meanErr = back.pixels.zip(img.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble /
      back.pixels.length
    assert(meanErr <= 3.0, s"mean err $meanErr")

    val gray = grayRamp(40, 24)
    val gjpg = JpegCodec.encode(gray)
    val gback = JpegCodec.decode(gjpg).get
    assert(gback.channels == 1 && gback.width == 40 && gback.height == 24)

    // non-multiple-of-8 dims: edge-replicated padding must not shift pixels
    val odd = gradient(13, 11)
    val oback = JpegCodec.decode(JpegCodec.encode(odd)).get
    assert(oback.width == 13 && oback.height == 11)
    assert(maxAbsDiff(oback.pixels, odd.pixels) <= 24)
  }

  test("4:2:0 encode: true interleaved MCUs roundtrip and interop with ImageIO") {
    val img = gradient(52, 36) // non-multiples of 16: partial edge MCUs
    val jpg = JpegCodec.encode(img, chroma420 = true)
    // the stream is meaningfully smaller than 4:4:4 (half the chroma blocks)
    val full = JpegCodec.encode(img)
    assert(jpg.length < full.length, s"420 ${jpg.length} !< 444 ${full.length}")
    // our own decoder handles our subsampled MCUs
    val back = JpegCodec.decode(jpg).get
    assert(back.width == 52 && back.height == 36 && back.channels == 3)
    // smooth chroma by construction → subsampling costs little fidelity
    assert(maxAbsDiff(back.pixels, img.pixels) <= 16,
      s"max err ${maxAbsDiff(back.pixels, img.pixels)}")
    // ImageIO agrees with our decoder on the same subsampled bytes
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(bi != null && bi.getWidth == 52 && bi.getHeight == 36)
    var worst = 0
    for (y <- 0 until 36; x <- 0 until 52) {
      val rgb = bi.getRGB(x, y)
      val o = (y * 52 + x) * 3
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (back.pixels(o) & 0xff)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (back.pixels(o + 1) & 0xff)))
      worst = math.max(worst, math.abs((rgb & 0xff) - (back.pixels(o + 2) & 0xff)))
    }
    assert(worst <= 12, s"decoder disagreement on our 4:2:0 bytes: $worst")
    // grayscale ignores the flag (no chroma to subsample)
    val g = grayRamp(24, 24)
    assert(JpegCodec.decode(JpegCodec.encode(g, chroma420 = true)).get.channels == 1)
  }

  test("interop: ImageIO decodes our bytes (agreeing with our decoder sample-for-sample)") {
    val img = gradient(48, 32)
    val jpg = JpegCodec.encode(img)
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(bi != null, "ImageIO rejected our JPEG")
    assert(bi.getWidth == 48 && bi.getHeight == 32)
    val ours = JpegCodec.decode(jpg).get
    var worst = 0
    for (y <- 0 until 32; x <- 0 until 48) {
      val rgb = bi.getRGB(x, y)
      val o = (y * 48 + x) * 3
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (ours.pixels(o) & 0xff)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)))
      worst = math.max(worst, math.abs((rgb & 0xff) - (ours.pixels(o + 2) & 0xff)))
    }
    // two conformant decoders of the SAME baseline 4:4:4 stream: only
    // IDCT precision + YCbCr rounding may differ
    assert(worst <= 3, s"decoder disagreement: $worst")
  }

  test("interop: our decoder reads ImageIO's bytes (standard tables, subsampled chroma)") {
    // ImageIO's writer emits the Annex-K-style default tables and 4:2:0
    // chroma — the real-world shape our MCU/sampling/upsampling path
    // must handle
    val w = 56; val h = 40
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 255) / (w - 1) + (y * 255) / (h - 1)) / 2
      bi.setRGB(x, y, (v << 16) | (v << 8) | (255 - v))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpeg", bos))
    val jpg = bos.toByteArray
    val ours = JpegCodec.decode(jpg)
    assert(ours.isDefined, "our decoder rejected ImageIO's JPEG")
    val got = ours.get
    assert(got.width == w && got.height == h && got.channels == 3)
    // reference: ImageIO's own re-decode of the same bytes; chroma is
    // smooth by construction so upsampling-filter differences (their
    // interpolating filter vs our nearest-sample) stay within roughly
    // one chroma step — the legitimate divergence budget between two
    // conformant decoders using different upsampling filters
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (got.pixels(o) & 0xff)))
      worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (got.pixels(o + 1) & 0xff)))
      worst = math.max(worst, math.abs((rgb & 0xff) - (got.pixels(o + 2) & 0xff)))
    }
    assert(worst <= 12, s"decoder disagreement on subsampled stream: $worst")
  }

  test("progressive JPEG (SOF2): ImageIO-written streams decode, agreeing with ImageIO") {
    import java.awt.image.BufferedImage
    for ((w, h, gray) <- Seq((56, 40, false), (33, 21, false), (64, 48, false),
        (40, 24, true))) {
      val bi = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // smooth per-channel gradients + a SHARED texture term: adding
        // the same offset to all three channels perturbs only luma
        // (the RGB→YCbCr chroma differences cancel it), so every scan
        // — DC, low AC, both refinements — carries real information
        // while chroma stays smooth enough that the two decoders'
        // different upsampling filters cannot dominate the comparison
        val tex = (x * 31 + y * 17) % 32
        val g1 = (x * 160) / math.max(w - 1, 1) + 32
        val g2 = (y * 160) / math.max(h - 1, 1) + 32
        val v = (g1 + g2) / 2 + tex
        bi.setRGB(x, y, if (gray) (v << 16) | (v << 8) | v
          else ((g1 + tex) << 16) | ((g2 + tex) << 8) | ((g1 + g2) / 2 + tex))
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      ios.close(); writer.dispose()
      val jpg = bos.toByteArray
      // the writer really emitted a progressive frame (SOF2)
      assert((0 until jpg.length - 1).exists(i =>
        (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc2),
        s"ImageIO did not write SOF2 for ${w}x$h")
      val ours = JpegCodec.decode(jpg)
      assert(ours.isDefined, s"progressive ${w}x$h gray=$gray rejected")
      val got = ours.get
      assert(got.width == w && got.height == h)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      var worst = 0
      for (y <- 0 until h; x <- 0 until w) {
        if (got.channels == 1) {
          // raster samples, NOT getRGB: TYPE_BYTE_GRAY getRGB passes
          // through linear-gray↔sRGB color management, which would
          // compare color-converted values against the raw luma
          // samples both codecs actually decode
          val rv = ref.getRaster.getSample(x, y, 0)
          worst = math.max(worst, math.abs(rv - (got.pixels(y * w + x) & 0xff)))
        } else {
          val rgb = ref.getRGB(x, y)
          val o = (y * w + x) * 3
          worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (got.pixels(o) & 0xff)))
          worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (got.pixels(o + 1) & 0xff)))
          worst = math.max(worst, math.abs((rgb & 0xff) - (got.pixels(o + 2) & 0xff)))
        }
      }
      // two conformant decoders of the same stream: IDCT precision +
      // upsampling-filter differences only (same budget as the
      // sequential ImageIO interop test)
      assert(worst <= 12, s"progressive decoder disagreement ${w}x$h gray=$gray: $worst")
    }
  }

  test("progressive hostile inputs: truncated scans and mutations quarantine, never throw") {
    val bi = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 48)
      bi.setRGB(x, y, (x * 5 << 16) | (y * 7 << 8) | ((x + y) * 3 % 256))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val jpg = bos.toByteArray
    // truncation sweep: every prefix is None or a full image, no throw
    for (cut <- 4 until jpg.length by 11) {
      JpegCodec.decode(jpg.take(cut)).foreach(img =>
        assert(img.width == 48 && img.height == 32))
    }
    // single-byte mutations
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 400) {
      val m = jpg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      JpegCodec.decode(m)
    }
  }

  test("single-component scan ignores declared sampling factors (T.81 A.2)") {
    // libjpeg converting color→gray often keeps the 2×2 luma sampling
    // declaration; per T.81 a one-component scan is non-interleaved
    // (one block per MCU in raster order) regardless of SOF factors.
    // Build the shape from our own wire bytes: encode grayscale (1×1),
    // then patch ONLY the SOF sampling byte to 2×2 — a conformant
    // decoder must produce identical pixels for both streams.
    val gray = grayRamp(52, 36) // non-multiple-of-16: the interleaved
                                // misread would also change the grid
    val jpg = JpegCodec.encode(gray)
    val expected = JpegCodec.decode(jpg).get
    val patched = jpg.clone()
    var sof = -1
    var i = 2
    while (sof < 0) {
      assert((patched(i) & 0xff) == 0xff, "lost marker sync walking segments")
      val m = patched(i + 1) & 0xff
      if (m == 0xc0) sof = i
      else i += 2 + (((patched(i + 2) & 0xff) << 8) | (patched(i + 3) & 0xff))
    }
    // SOF0 body: prec(1) h(2) w(2) nc(1) [id, hv, tq] — hv at body+7
    assert((patched(sof + 4 + 7) & 0xff) == 0x11, "fixture drift: expected 1x1 gray")
    patched(sof + 4 + 7) = 0x22.toByte
    val got = JpegCodec.decode(patched)
    assert(got.isDefined, "2x2-declared grayscale quarantined instead of decoded")
    assert(got.get.width == 52 && got.get.height == 36 && got.get.channels == 1)
    assert(maxAbsDiff(got.get.pixels, expected.pixels) == 0,
      "sampling declaration changed single-component pixels")
    // ImageIO agrees the patched stream is valid and identical
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(patched))
    assert(bi != null && bi.getWidth == 52 && bi.getHeight == 36,
      "ImageIO rejected the 2x2-declared grayscale stream")
  }

  test("hostile input quarantines: truncation, absurd dims, unsupported modes") {
    val jpg = JpegCodec.encode(gradient(32, 32))
    // truncations decode to None, never throw (cutting only the EOI
    // marker is excluded: the entropy data is complete there and a
    // decoder may legitimately finish)
    for (cut <- Seq(1, 2, 3, 10, 20, 100, jpg.length / 2))
      assert(JpegCodec.decode(jpg.take(cut)).isEmpty, s"cut=$cut")
    // flip SOF0 (FFC0) to SOF2 progressive (FFC2) → unsupported → None
    val prog = jpg.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // absurd declared dims: cap rejects before allocation
    val big = jpg.clone()
    big(sof + 5) = 0x7f; big(sof + 6) = 0xff.toByte // height ~32K
    big(sof + 7) = 0x7f; big(sof + 8) = 0xff.toByte // width ~32K → 1G pixels
    assert(JpegCodec.decode(big).isEmpty)
    // garbage entropy data: valid headers, shredded scan → None
    val shred = jpg.clone()
    for (i <- jpg.length - 40 until jpg.length - 2) shred(i) = 0x55
    assert(JpegCodec.decode(shred).isEmpty || JpegCodec.decode(shred).isDefined)
    // (shredded Huffman data either errors → None or decodes to junk
    // pixels — both acceptable; the assertion is it never THROWS)
  }

  test("fuzz: random bytes and mutated-valid streams never throw") {
    val rnd = new scala.util.Random(20260814L)
    // pure noise (with and without a valid SOI prefix)
    for (_ <- 1 to 300) {
      val n = 2 + rnd.nextInt(400)
      val buf = new Array[Byte](n)
      rnd.nextBytes(buf)
      JpegCodec.decode(buf) // must not throw
      buf(0) = 0xff.toByte; buf(1) = 0xd8.toByte
      JpegCodec.decode(buf)
    }
    // single-byte mutations of a VALID stream: the adversarial shape —
    // every header field, table entry, and entropy byte gets corrupted
    // somewhere across the runs
    val jpg = JpegCodec.encode(gradient(24, 16))
    for (_ <- 1 to 500) {
      val m = jpg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      JpegCodec.decode(m) // None or junk pixels, never a throw
    }
    // truncation sweep over the whole length
    for (cut <- 1 until jpg.length by 7)
      JpegCodec.decode(jpg.take(cut))
  }
}
