package graft.multimodal

/** Baseline JPEG codec, pure JVM — closes the r5 boundary where
  * entropy-coded image payloads flowed through with `payload_ok=false`.
  * Implemented from the public JPEG specification (ITU-T T.81):
  *
  *  - [[decode]]: baseline + extended sequential DCT (SOF0/SOF1),
  *    8-bit, grayscale or 3-component YCbCr, ANY Huffman tables from
  *    the stream's DHT segments (not just the Annex K defaults),
  *    arbitrary sampling factors 1..2 per axis (4:4:4, 4:2:2, 4:2:0),
  *    restart intervals (DRI/RSTn), byte-stuffed entropy data. Returns
  *    interleaved 8-bit pixels ([[PixelCodec.PixelImage]], channels 1
  *    or 3, RGB via the JFIF YCbCr transform). PROGRESSIVE (SOF2)
  *    decodes too since r7: the full T.81 G.2 multi-scan model —
  *    spectral selection, successive approximation (DC and AC first +
  *    refinement passes with G.1.2.3 correction-bit semantics and
  *    EOBRUN), interleaved DC scans over the MCU grid, per-component
  *    AC scans over the ceil(dim/8) grid, coefficients accumulated to
  *    EOI then dequantized/IDCT'd once; spec-pinned against
  *    ImageIO-WRITTEN progressive streams both ways. Arithmetic
  *    coding, hierarchical/lossless modes, and 12-bit precision are
  *    out of scope → `None` (quarantine, never throw — the
  *    dead-letter discipline of the decode stage).
  *  - [[encode]]: baseline 4:4:4 (or single-component grayscale),
  *    Annex K quantization matrices, and deliberately SIMPLE custom
  *    Huffman tables (all 12 DC categories at 4 bits, all 162 AC
  *    run/size symbols at 8 bits — valid canonical codes with the
  *    all-ones code unused, declared in the DHT segments like any
  *    optimized encoder's tables would be). Compression is a few
  *    percent worse than the Annex K defaults; in exchange the decoder
  *    interop test exercises the GENERAL table path on both sides.
  *    MultimodalSpec cross-checks both directions against the JDK's
  *    ImageIO codec: our decoder on ImageIO's output (standard tables,
  *    4:2:0) and ImageIO's decoder on our output, within the
  *    per-sample tolerance two conformant IDCTs may differ by.
  *
  * Same hostile-input rules as [[PixelCodec]]: every segment read is
  * bounds-checked, declared dimensions are capped before any
  * allocation, and truncated entropy data decodes to `None`.
  */
object JpegCodec {
  import PixelCodec.PixelImage

  /** Max pixels we will allocate for (same cap philosophy as PNG). */
  private val MaxPixels = 1 << 24

  // ---------------------------------------------------------- tables

  /** Annex K luminance quantization matrix (row-major). */
  private[multimodal] val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K chrominance quantization matrix (row-major). */
  private[multimodal] val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag order: zigzag index → row-major index. */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // precomputed IDCT/FDCT cosine basis: c(u)·cos((2x+1)uπ/16)
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** 8×8 inverse DCT: coefficient block (row-major) → spatial doubles.
    * Separable two-pass; exposed for the golden-vector spec.
    */
  private[multimodal] def idct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: over u
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cos(x)(u) * block(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = acc * 0.5
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // cols: over v
      var y2 = 0
      while (y2 < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += Cos(y2)(v) * tmp(v * 8 + x); v += 1 }
        out(y2 * 8 + x) = acc * 0.5
        y2 += 1
      }
      x += 1
    }
    out
  }

  /** 8×8 forward DCT (encoder side). */
  private[multimodal] def fdct(block: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += Cos(x)(u) * block(y * 8 + x); x += 1 }
        tmp(y * 8 + u) = acc * 0.5
        u += 1
      }
      y += 1
    }
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y2 = 0
        while (y2 < 8) { acc += Cos(y2)(v) * tmp(y2 * 8 + u); y2 += 1 }
        out(v * 8 + u) = acc * 0.5
        v += 1
      }
      u += 1
    }
    out
  }

  // ---------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical decode per T.81 F.2.2.3: mincode/maxcode/valptr per length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false

    /** Next entropy bit; -1 on exhaustion/marker (T.81 byte stuffing:
      * FF 00 is a literal FF; FF D0-D7 handled by [[syncRestart]]; any
      * other FF xx terminates the scan).
      */
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) return -1
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else { pos -= 1; hitMarker = true; return -1 }
          v = 0xff
        }
        acc = v
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }

    /** Byte-align and consume an RSTn marker; false if absent. */
    def syncRestart(): Boolean = {
      nBits = 0
      hitMarker = false
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  private def huffDecode(r: BitReader, t: HuffTable): Int = {
    var code = r.bit()
    if (code < 0) return -1
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.value(l, code)
      val nb = r.bit()
      if (nb < 0) return -1
      code = (code << 1) | nb
      l += 1
    }
    -1
  }

  /** T.81 F.2.2.1 EXTEND: low `s` bits `v` → signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private case class Comp(id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  def decode(bytes: Array[Byte]): Option[PixelImage] =
    // NonFatal only: an OutOfMemoryError/StackOverflowError is a
    // degraded executor, not corrupt media — quarantining it would
    // mask resource exhaustion as an undecodable row
    try decodeOrNull(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def decodeOrNull(b: Array[Byte]): Option[PixelImage] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val qt = new Array[Array[Int]](4) // natural (row-major) order
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2
    var scanStart = -1
    while (scanStart < 0) {
      if (i + 4 > b.length) return None
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      // EOI before any scan = no image; 0x01 (TEM) and RSTn are
      // standalone (no length field) — reading a length from their
      // following bytes would walk the stream out of frame
      if (marker == 0xd9) return None
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) { i += 2 }
      else {
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) >> 4) & 0x0f
              val tq = b(p) & 0x0f
              if (tq > 3) return None
              p += 1
              // a table truncated by its own segment length must not
              // silently continue into the next segment's bytes
              if (p + (if (pq == 0) 64 else 128) > segEnd) return None
              val t = new Array[Int](64)
              var z = 0
              while (z < 64) {
                val v = if (pq == 0) b(p) & 0xff else { val x = u16(b, p); p += 1; x }
                p += 1
                t(Zigzag(z)) = v
                z += 1
              }
              qt(tq) = t
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) >> 4) & 0x0f
              val th = b(p) & 0x0f
              if (th > 3) return None
              p += 1
              if (p + 16 > segEnd) return None
              val bits = Array.tabulate(16)(k => b(p + k) & 0xff)
              p += 16
              val n = bits.sum
              if (n > 256 || p + n > segEnd) return None
              val vals = Array.tabulate(n)(k => b(p + k) & 0xff)
              p += n
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcT(th) = t else acT(th) = t
            }
          case 0xc0 | 0xc1 => // SOF0/1 baseline/extended sequential
            val prec = b(seg) & 0xff
            if (prec != 8) return None
            h = u16(b, seg + 1); w = u16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h > MaxPixels) return None
            if (seg + 6 + 3 * nc > segEnd) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + c * 3
              val hv = b(o + 1) & 0xff
              val comp = Comp(b(o) & 0xff, (hv >> 4) & 0x0f, hv & 0x0f, b(o + 2) & 0x0f)
              if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4) return None
              comp
            }
          case 0xc2 => // progressive: its own multi-scan path (since r7)
            return decodeProgressiveOrNull(b)
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless/differential/arithmetic: out of scope
          case 0xdd => // DRI
            restartInterval = u16(b, seg)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = b(seg) & 0xff
            if (ns != comps.length) return None
            if (seg + 1 + 2 * ns + 3 != segEnd) return None // exact SOS length
            var p = seg + 1
            var c = 0
            while (c < ns) {
              val cid = b(p) & 0xff
              val tt = b(p + 1) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.td = (tt >> 4) & 0x0f
              comp.ta = tt & 0x0f
              p += 2
              c += 1
            }
            // baseline scan header: full spectral band, no successive
            // approximation — anything else (a corrupted header, or a
            // progressive scan smuggled under an SOF0) must quarantine,
            // not decode to garbage
            if ((b(segEnd - 3) & 0xff) != 0 || (b(segEnd - 2) & 0xff) != 63 ||
                (b(segEnd - 1) & 0xff) != 0) return None
            scanStart = segEnd
          case _ => () // APPn/COM/etc: skip
        }
        if (scanStart < 0) i = segEnd
      }
    }

    // T.81 A.2: a single-component scan is NON-interleaved — one 8×8
    // block per MCU over a ceil(w/8)×ceil(h/8) raster grid, whatever
    // sampling factors the SOF declared (grayscale files converted
    // from color by libjpeg commonly declare 2×2); honoring the
    // declared factors here would desync the entropy stream
    if (comps.length == 1) comps = Array(comps(0).copy(h = 1, v = 1))
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component padded plane
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    if (planeW.zip(planeH).exists { case (pw, ph) => pw.toLong * ph > 4L * MaxPixels })
      return None
    val planes = comps.indices.map(c => new Array[Byte](planeW(c) * planeH(c))).toArray
    comps.foreach { c =>
      if (qt(c.tq) == null || dcT(c.td) == null || acT(c.ta) == null) return None
    }

    val r = new BitReader(b, scanStart)
    val pred = new Array[Int](comps.length)
    val coeff = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.syncRestart()) return None
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // one 8×8 block
            java.util.Arrays.fill(coeff, 0.0)
            val s = huffDecode(r, dcT(c.td))
            if (s < 0 || s > 15) return None
            val diffBits = if (s == 0) 0 else r.bits(s)
            if (diffBits < 0) return None
            pred(ci) += extend(diffBits, s)
            coeff(0) = pred(ci).toDouble * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = huffDecode(r, acT(c.ta))
              if (rs < 0) return None
              val run = (rs >> 4) & 0x0f
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 else eob = true
              } else {
                k += run
                if (k > 63) return None
                val vb = r.bits(size)
                if (vb < 0) return None
                coeff(Zigzag(k)) = extend(vb, size).toDouble * q(Zigzag(k))
                k += 1
              }
            }
            val px = idct(coeff)
            val baseX = (mx * c.h + bx) * 8
            val baseY = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(px(yy * 8 + xx) + 128.0).toInt
                planes(ci)((baseY + yy) * pw + baseX + xx) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    Some(assemble(comps, planes, planeW, w, h, hMax, vMax))
  }

  /** Progressive (SOF2) decode — T.81 G.2: coefficients accumulate
    * across scans (spectral selection × successive approximation) in
    * per-component integer buffers; dequantization + IDCT happen once
    * at EOI. DC scans may interleave any component subset; AC scans
    * are single-component over the component's own ceil(dim/8) block
    * grid (G.1.1.1.1). Refinement correction-bit semantics follow
    * G.1.2.3 (the same structure libjpeg's jdphuff implements: a
    * correction bit for every nonzero-history coefficient crossed,
    * EOBRUN consuming whole blocks of correction bits). Any structural
    * inconsistency — bad scan header, table missing at first use,
    * entropy exhaustion, missing EOI — quarantines to None.
    */
  private def decodeProgressiveOrNull(b: Array[Byte]): Option[PixelImage] = {
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var mcusX = 0; var mcusY = 0; var hMax = 0; var vMax = 0
    var blocksW: Array[Int] = null // padded MCU-grid blocks per row
    var blocksH: Array[Int] = null
    var nbW: Array[Int] = null // non-interleaved (ceil) grid
    var nbH: Array[Int] = null
    var coefs: Array[Array[Int]] = null
    var sawScan = false
    var i = 2
    var done = false
    while (!done) {
      if (i + 2 > b.length) return None
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9) { // EOI: coefficients are final
        if (comps == null || !sawScan) return None
        done = true
      } else if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) { i += 2 }
      else {
        if (i + 4 > b.length) return None
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        marker match {
          case 0xdb =>
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) >> 4) & 0x0f
              val tq = b(p) & 0x0f
              if (tq > 3) return None
              p += 1
              if (p + (if (pq == 0) 64 else 128) > segEnd) return None
              val t = new Array[Int](64)
              var z = 0
              while (z < 64) {
                val v = if (pq == 0) b(p) & 0xff else { val x = u16(b, p); p += 1; x }
                p += 1
                t(Zigzag(z)) = v
                z += 1
              }
              qt(tq) = t
            }
          case 0xc4 =>
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) >> 4) & 0x0f
              val th = b(p) & 0x0f
              if (th > 3) return None
              p += 1
              if (p + 16 > segEnd) return None
              val bits = Array.tabulate(16)(k => b(p + k) & 0xff)
              p += 16
              val n = bits.sum
              if (n > 256 || p + n > segEnd) return None
              val vals = Array.tabulate(n)(k => b(p + k) & 0xff)
              p += n
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcT(th) = t else acT(th) = t
            }
          case 0xc2 =>
            if (comps != null) return None // one frame header only
            val prec = b(seg) & 0xff
            if (prec != 8) return None
            h = u16(b, seg + 1); w = u16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (w.toLong * h > MaxPixels) return None
            if (seg + 6 + 3 * nc > segEnd) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + c * 3
              val hv = b(o + 1) & 0xff
              val comp = Comp(b(o) & 0xff, (hv >> 4) & 0x0f, hv & 0x0f, b(o + 2) & 0x0f)
              if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4) return None
              comp
            }
            // T.81 A.2 single-component rule, as in the baseline path
            if (comps.length == 1) comps = Array(comps(0).copy(h = 1, v = 1))
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            blocksW = comps.map(c => mcusX * c.h)
            blocksH = comps.map(c => mcusY * c.v)
            nbW = comps.map(c => ((w * c.h + hMax - 1) / hMax + 7) / 8)
            nbH = comps.map(c => ((h * c.v + vMax - 1) / vMax + 7) / 8)
            if (comps.indices.exists(ci =>
              blocksW(ci).toLong * blocksH(ci) * 64 > 4L * MaxPixels)) return None
            coefs = comps.indices.map(ci =>
              new Array[Int](blocksW(ci) * blocksH(ci) * 64)).toArray
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd |
              0xce | 0xcf =>
            return None // second frame header of any kind
          case 0xdd =>
            restartInterval = u16(b, seg)
          case 0xda =>
            if (comps == null) return None
            val next = progressiveScan(b, seg, segEnd, comps, qt, dcT, acT,
              restartInterval, mcusX, mcusY, blocksW, nbW, nbH, coefs)
            if (next < 0) return None
            sawScan = true
            i = next
          case _ => () // APPn/COM
        }
        if (marker != 0xda) i = segEnd
      }
    }

    // dequantize + IDCT the full padded grid, then shared assembly
    val planeW = comps.indices.map(ci => blocksW(ci) * 8).toArray
    val planes = comps.indices.map(ci =>
      new Array[Byte](planeW(ci) * blocksH(ci) * 8)).toArray
    val blk = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val q = qt(comps(ci).tq)
      if (q == null) return None
      val co = coefs(ci)
      val pw = planeW(ci)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          val off = (by * blocksW(ci) + bx) * 64
          var z = 0
          while (z < 64) { blk(z) = co(off + z).toDouble * q(z); z += 1 }
          val px = idct(blk)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val v = math.round(px(yy * 8 + xx) + 128.0).toInt
              planes(ci)((by * 8 + yy) * pw + bx * 8 + xx) =
                (if (v < 0) 0 else if (v > 255) 255 else v).toByte
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    Some(assemble(comps, planes, planeW, w, h, hMax, vMax))
  }

  /** Decode one progressive scan's entropy data; returns the byte
    * offset of the next marker, or -1 on any inconsistency.
    */
  private def progressiveScan(b: Array[Byte], seg: Int, segEnd: Int,
      comps: Array[Comp], qt: Array[Array[Int]],
      dcT: Array[HuffTable], acT: Array[HuffTable],
      restartInterval: Int, mcusX: Int, mcusY: Int,
      blocksW: Array[Int], nbW: Array[Int], nbH: Array[Int],
      coefs: Array[Array[Int]]): Int = {
    val ns = b(seg) & 0xff
    if (ns < 1 || ns > comps.length || seg + 1 + 2 * ns + 3 != segEnd) return -1
    val scanIdx = new Array[Int](ns)
    var p = seg + 1
    var c = 0
    while (c < ns) {
      val cid = b(p) & 0xff
      val tt = b(p + 1) & 0xff
      val ci = comps.indexWhere(_.id == cid)
      if (ci < 0) return -1
      scanIdx(c) = ci
      comps(ci).td = (tt >> 4) & 0x0f
      comps(ci).ta = tt & 0x0f
      p += 2
      c += 1
    }
    val ss = b(segEnd - 3) & 0xff
    val se = b(segEnd - 2) & 0xff
    val ah = (b(segEnd - 1) >> 4) & 0x0f
    val al = b(segEnd - 1) & 0x0f
    // scan-header constraints (G.1.1.1.1): DC scans cover exactly the
    // DC band; AC scans are single-component; refinement steps one bit
    if (ss > 63 || se > 63 || se < ss || al > 13) return -1
    if (ss == 0 && se != 0) return -1
    if (ss > 0 && ns != 1) return -1
    if (ah != 0 && ah != al + 1) return -1

    val r = new BitReader(b, segEnd)
    var eobrun = 0
    val pred = new Array[Int](comps.length)
    val p1 = 1 << al

    def maybeRestart(unit: Int): Boolean =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        if (!r.syncRestart()) false
        else { java.util.Arrays.fill(pred, 0); eobrun = 0; true }
      } else true

    def dcBlock(ci: Int, off: Int): Boolean = {
      val co = coefs(ci)
      if (ah == 0) {
        val t = dcT(comps(ci).td)
        if (t == null) return false
        val s = huffDecode(r, t)
        if (s < 0 || s > 15) return false
        val diffBits = if (s == 0) 0 else r.bits(s)
        if (diffBits < 0) return false
        pred(ci) += extend(diffBits, s)
        co(off) = pred(ci) << al
      } else {
        val bit = r.bit()
        if (bit < 0) return false
        if (bit != 0) co(off) |= p1
      }
      true
    }

    def acFirstBlock(ci: Int, off: Int): Boolean = {
      val co = coefs(ci)
      if (eobrun > 0) { eobrun -= 1; return true }
      val t = acT(comps(ci).ta)
      if (t == null) return false
      var k = ss
      while (k <= se) {
        val rs = huffDecode(r, t)
        if (rs < 0) return false
        val run = (rs >> 4) & 0x0f
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16
          else {
            eobrun = (1 << run) - 1
            if (run > 0) {
              val eb = r.bits(run)
              if (eb < 0) return false
              eobrun += eb
            }
            return true
          }
        } else {
          k += run
          if (k > se) return false
          val vb = r.bits(size)
          if (vb < 0) return false
          co(off + Zigzag(k)) = extend(vb, size) << al
          k += 1
        }
      }
      true
    }

    def correct(co: Array[Int], at: Int): Boolean = {
      val cb = r.bit()
      if (cb < 0) return false
      if (cb != 0 && (co(at) & p1) == 0)
        co(at) += (if (co(at) >= 0) p1 else -p1)
      true
    }

    def acRefineBlock(ci: Int, off: Int): Boolean = {
      val co = coefs(ci)
      val t = acT(comps(ci).ta)
      if (t == null) return false
      var k = ss
      if (eobrun == 0) {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = huffDecode(r, t)
          if (rs < 0) return false
          var run = (rs >> 4) & 0x0f
          val size = rs & 0x0f
          var newval = 0
          if (size == 0) {
            if (run < 15) {
              eobrun = 1 << run
              if (run > 0) {
                val eb = r.bits(run)
                if (eb < 0) return false
                eobrun += eb
              }
              atEob = true
            } // run == 15: skip 16 zero-history coefficients
          } else {
            if (size != 1) return false
            val sb = r.bit()
            if (sb < 0) return false
            newval = if (sb != 0) p1 else -p1
          }
          if (!atEob) {
            var placed = false
            while (k <= se && !placed) {
              val at = off + Zigzag(k)
              if (co(at) != 0) {
                if (!correct(co, at)) return false
                k += 1
              } else if (run == 0) {
                if (newval != 0) co(at) = newval
                k += 1
                placed = true
              } else { run -= 1; k += 1 }
            }
            if (!placed && newval != 0) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val at = off + Zigzag(k)
          if (co(at) != 0 && !correct(co, at)) return false
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    // drive the scan's block order
    if (ss == 0 && ns > 1) {
      // interleaved DC scan over the full MCU grid
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (!maybeRestart(mcu)) return -1
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var s = 0
        while (s < ns) {
          val ci = scanIdx(s)
          val cc = comps(ci)
          var by = 0
          while (by < cc.v) {
            var bx = 0
            while (bx < cc.h) {
              val off = ((my * cc.v + by) * blocksW(ci) + mx * cc.h + bx) * 64
              if (!dcBlock(ci, off)) return -1
              bx += 1
            }
            by += 1
          }
          s += 1
        }
        mcu += 1
      }
    } else {
      // non-interleaved: one block per MCU over the component's grid
      val ci = scanIdx(0)
      val nBlocks = nbW(ci) * nbH(ci)
      var blkIdx = 0
      while (blkIdx < nBlocks) {
        if (!maybeRestart(blkIdx)) return -1
        val bx = blkIdx % nbW(ci)
        val by = blkIdx / nbW(ci)
        val off = (by * blocksW(ci) + bx) * 64
        val ok =
          if (ss == 0) dcBlock(ci, off)
          else if (ah == 0) acFirstBlock(ci, off)
          else acRefineBlock(ci, off)
        if (!ok) return -1
        blkIdx += 1
      }
    }

    // resync: the next true marker (skipping any trailing RSTs and
    // stuffed bytes) ends this scan's entropy segment
    var q2 = r.pos
    while (q2 + 1 < b.length) {
      val isMarker = (b(q2) & 0xff) == 0xff && {
        val m = b(q2 + 1) & 0xff
        m != 0x00 && !(m >= 0xd0 && m <= 0xd7)
      }
      if (isMarker) return q2
      q2 += 1
    }
    -1 // entropy data ran to EOF without a terminating marker
  }

  /** Assemble per-component padded planes into the interleaved output
    * (nearest-sample chroma upscale) — shared by the baseline and
    * progressive paths.
    */
  private def assemble(comps: Array[Comp], planes: Array[Array[Byte]],
      planeW: Array[Int], w: Int, h: Int, hMax: Int, vMax: Int): PixelImage = {
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      val pw = planeW(0)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * pw, out, y * w, w)
        y += 1
      }
      PixelImage(w, h, 1, out)
    } else {
      val out = new Array[Byte](w * h * 3)
      val y0 = planes(0); val cb0 = planes(1); val cr0 = planes(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = (y0((y * comps(0).v / vMax) * planeW(0) + x * comps(0).h / hMax) & 0xff).toDouble
          val cb = (cb0((y * comps(1).v / vMax) * planeW(1) + x * comps(1).h / hMax) & 0xff) - 128.0
          val cr = (cr0((y * comps(2).v / vMax) * planeW(2) + x * comps(2).h / hMax) & 0xff) - 128.0
          val rr = math.round(yv + 1.402 * cr).toInt
          val gg = math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt
          val bb = math.round(yv + 1.772 * cb).toInt
          val o = (y * w + x) * 3
          out(o) = (if (rr < 0) 0 else if (rr > 255) 255 else rr).toByte
          out(o + 1) = (if (gg < 0) 0 else if (gg > 255) 255 else gg).toByte
          out(o + 2) = (if (bb < 0) 0 else if (bb > 255) 255 else bb).toByte
          x += 1
        }
        y += 1
      }
      PixelImage(w, h, 3, out)
    }
  }

  // ---------------------------------------------------------- encode

  /** Encoder Huffman tables: every DC category (0..11) gets a 4-bit
    * code, every AC run/size symbol a fixed 8-bit code — canonical,
    * all-ones unused, declared in DHT. See the object doc for why
    * simple beats Annex K here.
    */
  private val EncDcBits: Array[Int] = { val a = new Array[Int](16); a(3) = 12; a }
  private val EncDcVals: Array[Int] = (0 until 12).toArray
  private val EncAcVals: Array[Int] = {
    val syms = scala.collection.mutable.ArrayBuffer[Int](0x00, 0xf0)
    for (r <- 0 to 15; s <- 1 to 10) syms += ((r << 4) | s)
    syms.sorted.toArray // 162 symbols
  }
  private val EncAcBits: Array[Int] = { val a = new Array[Int](16); a(7) = EncAcVals.length; a }

  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var idx = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var k = 0
      while (k < bits(l - 1)) {
        out(vals(idx)) = (code, l)
        code += 1; idx += 1; k += 1
      }
      code <<= 1
      l += 1
    }
    out.toMap
  }
  private val EncDcCodes = canonicalCodes(EncDcBits, EncDcVals)
  private val EncAcCodes = canonicalCodes(EncAcBits, EncAcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per spec
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; n = 0
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** IJG-style quality scaling of a base quantization matrix: the same
    * linear scaling every libjpeg-derived encoder applies before
    * writing its DQT segments (Q ≥ 50 → scale = 200 − 2Q percent).
    */
  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  /** Encode 1- or 3-channel 8-bit pixels as a baseline JFIF JPEG
    * (quality-scaled Annex K quantization, custom declared Huffman
    * tables). Default quality 88 — fixture fidelity in the single
    * digits per sample on smooth content, matching what a production
    * ingest's source files look like. `chroma420 = true` writes the
    * dominant real-world shape — 2×2-subsampled chroma in true
    * 16×16-pixel interleaved MCUs (4 Y + 1 Cb + 1 Cr blocks, box-
    * downsampled chroma planes) — exercising the decoder's
    * multi-block-per-MCU path from our own wire bytes; the default
    * 4:4:4 is the same loop with every sampling factor 1.
    */
  def encode(img: PixelImage, quality: Int = 88,
      chroma420: Boolean = false): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"jpeg encode: ${img.channels} channels unsupported")
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val QL = scaleQ(QLuma, quality)
    val QC = scaleQ(QChroma, quality)
    val w = img.width; val h = img.height
    val nc = img.channels
    val sub = chroma420 && nc == 3
    // per-component sampling factors + plane dims
    val sampH = if (sub) Array(2, 1, 1) else Array.fill(nc)(1)
    val sampV = if (sub) Array(2, 1, 1) else Array.fill(nc)(1)
    val hMax = sampH.max; val vMax = sampV.max
    val compW = Array.tabulate(nc)(c => (w * sampH(c) + hMax - 1) / hMax)
    val compH = Array.tabulate(nc)(c => (h * sampV(c) + vMax - 1) / vMax)
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def seg(marker: Int, body: Array[Int]): Unit = {
      m(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(v => out.write(v & 0xff))
    }
    m(0xd8) // SOI
    seg(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // JFIF APP0
    // DQT: table 0 luma (+ table 1 chroma for color)
    def dqt(id: Int, q: Array[Int]): Unit =
      seg(0xdb, Array(id) ++ (0 until 64).map(z => q(Zigzag(z))))
    dqt(0, QL)
    if (nc == 3) dqt(1, QC)
    // SOF0 with per-component sampling factors
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, nc) ++
      (0 until nc).flatMap(c => Seq(c + 1, (sampH(c) << 4) | sampV(c),
        if (c == 0) 0 else 1)))
    // DHT: DC table 0, AC table 0 (shared by all components)
    seg(0xc4, Array(0x00) ++ EncDcBits ++ EncDcVals)
    seg(0xc4, Array(0x10) ++ EncAcBits ++ EncAcVals)
    // SOS
    seg(0xda, Array(nc) ++ (1 to nc).flatMap(c => Seq(c, 0x00)) ++ Seq(0, 63, 0))

    // color transform to full-res planes (doubles, level-shifted)
    val fullPlanes = Array.fill(nc)(new Array[Double](w * h))
    var p = 0
    while (p < w * h) {
      if (nc == 1) fullPlanes(0)(p) = (img.pixels(p) & 0xff) - 128.0
      else {
        val r = (img.pixels(p * 3) & 0xff).toDouble
        val g = (img.pixels(p * 3 + 1) & 0xff).toDouble
        val b = (img.pixels(p * 3 + 2) & 0xff).toDouble
        fullPlanes(0)(p) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        fullPlanes(1)(p) = -0.168736 * r - 0.331264 * g + 0.5 * b
        fullPlanes(2)(p) = 0.5 * r - 0.418688 * g - 0.081312 * b
      }
      p += 1
    }
    // component planes: full-res luma; 2×2 box-downsampled chroma when
    // subsampling (edge-replicated at odd dims)
    val planes = Array.tabulate(nc) { c =>
      if (compW(c) == w && compH(c) == h) fullPlanes(c)
      else {
        val dst = new Array[Double](compW(c) * compH(c))
        var cy = 0
        while (cy < compH(c)) {
          var cx = 0
          while (cx < compW(c)) {
            var acc = 0.0
            var k = 0
            while (k < 4) {
              val sx = math.min(cx * 2 + (k & 1), w - 1)
              val sy = math.min(cy * 2 + (k >> 1), h - 1)
              acc += fullPlanes(c)(sy * w + sx)
              k += 1
            }
            dst(cy * compW(c) + cx) = acc / 4.0
            cx += 1
          }
          cy += 1
        }
        dst
      }
    }

    val bw = new BitWriter(out)
    val pred = new Array[Int](nc)
    val block = new Array[Double](64)
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var ci = 0
        while (ci < nc) {
          val q = if (ci == 0) QL else QC
          val plane = planes(ci)
          val cw = compW(ci); val ch = compH(ci)
          var by = 0
          while (by < sampV(ci)) {
            var bx = 0
            while (bx < sampH(ci)) {
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  // edge-replicate padding in the COMPONENT plane
                  val sx = math.min((mx * sampH(ci) + bx) * 8 + xx, cw - 1)
                  val sy = math.min((my * sampV(ci) + by) * 8 + yy, ch - 1)
                  block(yy * 8 + xx) = plane(sy * cw + sx)
                  xx += 1
                }
                yy += 1
              }
              encodeBlock(bw, block, q, pred, ci)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    m(0xd9) // EOI
    out.toByteArray
  }

  /** FDCT → quantize → Huffman-encode one 8×8 block (DC diff chained
    * through `pred(ci)`).
    */
  private def encodeBlock(bw: BitWriter, block: Array[Double],
      q: Array[Int], pred: Array[Int], ci: Int): Unit = {
    val f = fdct(block)
          // quantize in zigzag order
          val zz = new Array[Int](64)
          var z = 0
          while (z < 64) {
            val nat = Zigzag(z)
            zz(z) = math.round(f(nat) / q(nat)).toInt
            z += 1
          }
          val diff = zz(0) - pred(ci)
          pred(ci) = zz(0)
          val s = category(diff)
          val (dcCode, dcLen) = EncDcCodes(s)
          bw.put(dcCode, dcLen)
          if (s > 0) {
            val v = if (diff < 0) diff + (1 << s) - 1 else diff
            bw.put(v, s)
          }
          var k = 1
          var run = 0
          while (k < 64) {
            if (zz(k) == 0) run += 1
            else {
              while (run > 15) { val (c0, l0) = EncAcCodes(0xf0); bw.put(c0, l0); run -= 16 }
              val sz = category(zz(k))
              val (c1, l1) = EncAcCodes((run << 4) | sz)
              bw.put(c1, l1)
              val v = if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k)
              bw.put(v, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (c2, l2) = EncAcCodes(0x00); bw.put(c2, l2) }
  }
}
