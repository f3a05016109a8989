package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[H264Codec]] (pure-JVM H.264 baseline-intra codec, r7).
  *
  * The correctness oracle is the codec's own contract: the encoder
  * reconstructs every macroblock through the decoder's shared integer
  * pipeline, so `decodeYuv(encodeYuv(x).annexB)` must equal the
  * encoder's reported reconstruction BIT-EXACTLY (any prediction /
  * transform / entropy desync breaks equality loudly). I_PCM is
  * lossless, so there the round-trip must equal the SOURCE. The
  * container has no external H.264 decoder (documented in the codec
  * scaladoc), so the VLC tables are pinned structurally instead:
  * prefix-freeness and full domain coverage per table.
  */
class H264CodecSpec extends AnyFunSuite {

  import H264Codec._

  /** Deterministic source frame: same pixel field family the media
    * generators use (Multimodal.pixelsFor discipline).
    */
  private def frame(w: Int, h: Int, seed: Long): Yuv420 = {
    def plane(n: Int, k: Long): Array[Byte] = {
      val a = new Array[Byte](n)
      var i = 0
      while (i < n) { a(i) = ((i * 31 + seed * 17 + k * 101 + 7) & 0xff).toByte; i += 1 }
      a
    }
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    Yuv420(w, h, plane(w * h, 0), plane(cw * ch, 1), plane(cw * ch, 2))
  }

  private def flat(w: Int, h: Int, y: Int, cb: Int, cr: Int): Yuv420 = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    Yuv420(w, h,
      Array.fill(w * h)(y.toByte),
      Array.fill(cw * ch)(cb.toByte),
      Array.fill(cw * ch)(cr.toByte))
  }

  private def assertSame(a: Yuv420, b: Yuv420, tag: String): Unit = {
    assert(a.width == b.width && a.height == b.height, s"$tag geometry")
    assert(java.util.Arrays.equals(a.y, b.y), s"$tag luma")
    assert(java.util.Arrays.equals(a.cb, b.cb), s"$tag cb")
    assert(java.util.Arrays.equals(a.cr, b.cr), s"$tag cr")
  }

  test("I_PCM: lossless round-trip, decoder output == source exactly") {
    for ((w, h) <- Seq((16, 16), (32, 16), (48, 32))) {
      val src = frame(w, h, seed = w * 7 + h)
      val enc = encodeYuv(src, forcePcm = true)
      assertSame(enc.recon, src, s"pcm recon ${w}x$h") // PCM recon is the source
      val dec = decodeYuv(enc.annexB)
      assert(dec.isDefined, s"pcm decode ${w}x$h")
      assertSame(dec.get, src, s"pcm ${w}x$h")
    }
  }

  test("flat frame round-trips bit-exactly at every QP tier") {
    for (qp <- Seq(0, 10, 20, 28, 36, 44, 51)) {
      val src = flat(32, 32, 128, 64, 192)
      val enc = encodeYuv(src, qp)
      val dec = decodeYuv(enc.annexB)
      assert(dec.isDefined, s"qp $qp decode")
      assertSame(dec.get, enc.recon, s"qp $qp")
    }
  }

  test("textured frames: decode == encoder reconstruction over sizes and QPs") {
    for {
      (w, h) <- Seq((16, 16), (32, 24), (48, 48), (64, 32), (144, 108), (34, 18))
      qp <- Seq(10, 28, 40)
    } {
      val src = frame(w, h, seed = w + h * 1000 + qp)
      val enc = encodeYuv(src, qp)
      val dec = decodeYuv(enc.annexB)
      assert(dec.isDefined, s"decode ${w}x$h qp$qp")
      assertSame(dec.get, enc.recon, s"${w}x$h qp$qp")
    }
  }

  test("low QP on a smooth gradient is near-lossless; QP 51 still bit-exact to recon") {
    val w = 48; val h = 32
    val grad = {
      val y = new Array[Byte](w * h)
      var i = 0
      while (i < w * h) { y(i) = (((i % w) * 2 + (i / w)) & 0xff).toByte; i += 1 }
      Yuv420(w, h, y, Array.fill(w * h / 4)(120.toByte), Array.fill(w * h / 4)(130.toByte))
    }
    val lo = encodeYuv(grad, qp = 4)
    var err = 0L; var i = 0
    while (i < grad.y.length) {
      err = math.max(err, math.abs((grad.y(i) & 0xff) - (lo.recon.y(i) & 0xff))); i += 1
    }
    assert(err <= 4, s"qp4 max luma error $err")
    val hi = encodeYuv(grad, qp = 51)
    assertSame(decodeYuv(hi.annexB).get, hi.recon, "qp51")
    assert(hi.annexB.length < lo.annexB.length, "qp51 must compress harder than qp4")
  }

  test("decodeAvcSample: length-prefixed sample with out-of-band SPS/PPS") {
    val src = frame(32, 32, 5)
    val enc = encodeYuv(src, qp = 30)
    val sample = {
      val b = java.nio.ByteBuffer.allocate(4 + enc.idrNal.length)
      b.putInt(enc.idrNal.length).put(enc.idrNal)
      b.array()
    }
    val dec = decodeAvcSample(enc.spsNal, enc.ppsNal, sample)
    assert(dec.isDefined)
    assertSame(dec.get, enc.recon, "avc sample")
    // non-IDR NAL first (length-prefixed SEI), IDR second — still found
    val sei = Array[Byte](0x06, 0x01, 0x01, 0x00, 0x80.toByte)
    val b2 = java.nio.ByteBuffer.allocate(4 + sei.length + 4 + enc.idrNal.length)
    b2.putInt(sei.length).put(sei).putInt(enc.idrNal.length).put(enc.idrNal)
    assert(decodeAvcSample(enc.spsNal, enc.ppsNal, b2.array()).isDefined)
    // 2-byte length prefixes
    val b3 = java.nio.ByteBuffer.allocate(2 + enc.idrNal.length)
    b3.putShort(enc.idrNal.length.toShort).put(enc.idrNal)
    assertSame(decodeAvcSample(enc.spsNal, enc.ppsNal, b3.array(), lengthSize = 2).get,
      enc.recon, "len2")
  }

  // ---------------------------------------------------------------
  // Structural pins for the transcribed VLC tables (the container has
  // no external H.264 decoder, so these are the stated substitute for
  // conformance-stream checks)
  // ---------------------------------------------------------------

  private def codesOf(v: Vlc): Seq[(Int, Int)] = v.codes.zip(v.lens).toSeq

  private def assertPrefixFree(v: Vlc, tag: String): Unit = {
    val cs = codesOf(v)
    assert(cs.distinct.size == cs.size, s"$tag duplicate codes")
    for {
      (a, la) <- cs; (b, lb) <- cs
      if la < lb
    } assert((b >>> (lb - la)) != a, s"$tag: ${a.toBinaryString}/$la prefixes ${b.toBinaryString}/$lb")
  }

  test("coeff_token tables (9-5): prefix-free, exact (TrailingOnes, TotalCoeff) domain") {
    val full = (for { tc <- 0 to 16; t1 <- 0 to math.min(tc, 3) } yield tc * 4 + t1).sorted
    for ((v, tag) <- Seq((CoeffTokenNc0, "nC<2"), (CoeffTokenNc2, "2<=nC<4"),
        (CoeffTokenNc4, "4<=nC<8"))) {
      assertPrefixFree(v, tag)
      assert(v.syms.sorted.toSeq == full, s"$tag domain")
    }
    assertPrefixFree(CoeffTokenChromaDc, "chromaDC")
    val chroma = (for { tc <- 0 to 4; t1 <- 0 to math.min(tc, 3) } yield tc * 4 + t1).sorted
    assert(CoeffTokenChromaDc.syms.sorted.toSeq == chroma, "chromaDC domain")
  }

  test("total_zeros and run_before tables: prefix-free, contiguous symbol ranges") {
    for (tc <- 1 to 15) {
      val v = TotalZeros4x4(tc)
      assertPrefixFree(v, s"tz4x4[$tc]")
      assert(v.syms.sorted.toSeq == (0 to 16 - tc), s"tz4x4[$tc] domain")
    }
    for (tc <- 1 to 3) {
      val v = TotalZerosChromaDc(tc)
      assertPrefixFree(v, s"tzDC[$tc]")
      assert(v.syms.sorted.toSeq == (0 to 4 - tc), s"tzDC[$tc] domain")
    }
    for (zl <- 1 to 7) {
      val v = RunBefore(zl)
      assertPrefixFree(v, s"run[$zl]")
      val hi = if (zl < 7) zl else 14 // zl>6 shares one open-ended table
      assert(v.syms.sorted.toSeq == (0 to hi), s"run[$zl] domain")
    }
  }

  test("coded_block_pattern Table 9-4 (intra) is a permutation of 0..47") {
    assert(CbpIntra.sorted.toSeq == (0 until 48))
    // the standard's low codeNums: cbp 47,31,15,0 map to codeNum 0..3
    assert(CbpIntra.take(4).toSeq == Seq(47, 31, 15, 0))
  }

  test("4x4 zigzag scan matches the standard's Figure 8-8 order") {
    assert(Zig4.toSeq == Seq(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15))
    assert(Zig4.sorted.toSeq == (0 until 16))
  }

  // ---------------------------------------------------------------
  // Byte-level goldens: SPS/PPS/slice-header/I_PCM are fully
  // hand-checkable syntax, computed bit by bit from the standard
  // ---------------------------------------------------------------

  test("golden SPS/PPS bytes for a 32x32 frame at pic_init_qp=26") {
    val enc = encodeYuv(flat(32, 32, 100, 110, 120), qp = 26)
    // SPS: 66, c0, 1e, then ue(0) ue(0) ue(2) ue(0) 0 ue(1) ue(1) 1 1 0 0 + rbsp_stop
    //  = 1 1 011 1 0 010 010 1 1 0 0 1 + pad -> dc 96 40
    assert(enc.spsNal.toSeq == Seq(0x67, 0x42, 0xc0, 0x1e, 0xdc, 0x96, 0x40).map(_.toByte))
    // PPS: ue0 ue0 0 0 ue0 ue0 ue0 0 00 se0 se0 se0 1 0 0 + stop
    //  = 1 1 0 0 1 1 1 0 00 1 1 1 1 0 0 1 + pad -> ce 3c 80
    assert(enc.ppsNal.toSeq == Seq(0x68, 0xce, 0x3c, 0x80).map(_.toByte))
  }

  test("golden I_PCM bitstream: hand-computed header bytes + raw planes") {
    // luma/chroma values chosen nonzero so no emulation-prevention
    // bytes appear and the NAL is byte-addressable by hand
    val y = Array.tabulate(256)(i => (1 + (i % 250)).toByte)
    val cb = Array.tabulate(64)(i => (5 + i).toByte)
    val cr = Array.tabulate(64)(i => (130 + (i % 100)).toByte)
    val enc = encodeYuv(Yuv420(16, 16, y, cb, cr), forcePcm = true)
    // slice header ue(0) ue(7) ue(0) u4(frame_num) ue(0) 1bx2 se(0) ue(1)
    // + mb_type ue(25) + pcm alignment:
    //  1 0001000 1 0000 1 0 0 1 010 000011010 + 3 align zeros
    //  = 88 84 a0 d0
    assert(enc.idrNal.take(5).toSeq ==
      Seq(0x65, 0x88, 0x84, 0xa0, 0xd0).map(_.toByte))
    assert(enc.idrNal.slice(5, 5 + 256).toSeq == y.toSeq, "raw luma bytes")
    assert(enc.idrNal.slice(5 + 256, 5 + 320).toSeq == cb.toSeq, "raw cb bytes")
    assert(enc.idrNal.slice(5 + 320, 5 + 384).toSeq == cr.toSeq, "raw cr bytes")
    // rbsp_slice_trailing_bits: aligned stop bit
    assert(enc.idrNal.last == 0x80.toByte)
    assert(enc.idrNal.length == 5 + 384 + 1)
  }

  test("emulation prevention: PCM zero runs are escaped on the wire and restored") {
    val y = new Array[Byte](256) // all zeros: maximal 00-run stress
    val enc = encodeYuv(Yuv420(16, 16, y, new Array[Byte](64), new Array[Byte](64)),
      forcePcm = true)
    // the escaped NAL must contain 00 00 03 and no 00 00 0x (x<=3) runs
    val n = enc.idrNal
    var sawEp = false
    for (i <- 2 until n.length) {
      val guarded = n(i - 2) == 0 && n(i - 1) == 0
      if (guarded) {
        assert((n(i) & 0xff) >= 3, s"unescaped 00 00 ${n(i)} at $i")
        if (n(i) == 3) sawEp = true
      }
    }
    assert(sawEp, "expected emulation-prevention bytes")
    assertSame(decodeYuv(enc.annexB).get, enc.recon, "escaped pcm")
  }

  test("noise frames: worst-case entropy stress, QP sweep, decode == recon") {
    val rnd = new java.util.Random(20260814L)
    for (qp <- 0 to 51 by 3; trial <- 0 until 2) {
      val w = 16 + 16 * rnd.nextInt(3); val h = 16 + 16 * rnd.nextInt(3)
      val y = new Array[Byte](w * h); rnd.nextBytes(y)
      val cb = new Array[Byte](w * h / 4); rnd.nextBytes(cb)
      val cr = new Array[Byte](w * h / 4); rnd.nextBytes(cr)
      val src = Yuv420(w, h, y, cb, cr)
      val enc = encodeYuv(src, qp)
      val dec = decodeYuv(enc.annexB)
      assert(dec.isDefined, s"noise ${w}x$h qp$qp t$trial")
      assertSame(dec.get, enc.recon, s"noise ${w}x$h qp$qp t$trial")
    }
  }

  /** Spec-local bit writer: an independent implementation of the NAL
    * syntax layer so decode-only paths (fields our encoder never
    * emits) can be pinned from hand-built streams.
    */
  private final class Bits {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def put(b: Int): this.type = {
      acc = (acc << 1) | (b & 1); n += 1
      if (n == 8) { out.write(acc); acc = 0; n = 0 }
      this
    }
    def bits(v: Int, len: Int): this.type = {
      var i = len - 1
      while (i >= 0) { put((v >> i) & 1); i -= 1 }
      this
    }
    def ue(v: Int): this.type = {
      val c = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(c)
      bits(0, len - 1); bits(c, len)
    }
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def stop(): Array[Byte] = {
      put(1); while (n != 0) put(0)
      out.toByteArray
    }
  }

  test("decode-only syntax: nonzero slice_qp_delta and mb_qp_delta, hand-built I_16x16 DC") {
    // SPS/PPS from the encoder (pic_init_qp = 30), slice hand-built:
    // slice_qp_delta = -4, one I_16x16 mb_type 3 (DC, cbp = 0) with
    // mb_qp_delta = +6. QP arithmetic must land at 32 and the MB must
    // decode to the neighborless DC prediction: every plane all-128.
    val ref = encodeYuv(flat(16, 16, 1, 2, 3), qp = 30)
    val slice = new Bits
    slice.ue(0) // first_mb_in_slice
    slice.ue(7) // slice_type I
    slice.ue(0) // pps_id
    slice.bits(0, 4) // frame_num
    slice.ue(0) // idr_pic_id
    slice.put(0).put(0) // dec_ref_pic_marking
    slice.se(-4) // slice_qp_delta (decode-only: encoder always writes 0)
    slice.ue(1) // disable_deblocking_filter_idc
    slice.ue(3) // mb_type I_16x16, DC, cbpChroma 0, cbpLuma 0
    slice.ue(0) // intra_chroma_pred_mode DC
    slice.se(6) // mb_qp_delta (decode-only: encoder always writes 0)
    slice.put(1) // luma DC coeff_token nC=0: "1" = TotalCoeff 0
    val idr = Array[Byte](0x65) ++ slice.stop()
    val sc = Array[Byte](0, 0, 0, 1)
    val dec = decodeYuv(sc ++ ref.spsNal ++ sc ++ ref.ppsNal ++ sc ++ idr)
    assert(dec.isDefined, "hand-built slice must decode")
    assert(dec.get.y.forall(_ == 128.toByte), "luma all DC-128")
    assert(dec.get.cb.forall(_ == 128.toByte) && dec.get.cr.forall(_ == 128.toByte),
      "chroma all DC-128")
    // the same stream with a delta that drives QP out of [0,51]
    // quarantines (30 - 4 + 30 = 56)
    val bad = new Bits
    bad.ue(0).ue(7).ue(0).bits(0, 4).ue(0).put(0).put(0)
    bad.se(-4); bad.ue(1)
    bad.ue(3).ue(0); bad.se(30); bad.put(1)
    assert(decodeYuv(sc ++ ref.spsNal ++ sc ++ ref.ppsNal ++
      sc ++ (Array[Byte](0x65) ++ bad.stop())).isEmpty, "qp overflow must quarantine")
  }

  test("decode-only syntax: POC type 0 with bottom-field POC present parses, not desyncs") {
    // foreign-encoder shape our writer never emits: SPS
    // pic_order_cnt_type=0 (log2_max_poc_lsb=4) and a PPS with
    // bottom_field_pic_order_in_frame_present=1, so the slice header
    // carries pic_order_cnt_lsb AND delta_pic_order_cnt_bottom
    val sps = new Bits
    sps.bits(66, 8).bits(0xc0, 8).bits(30, 8) // profile/constraints/level
    sps.ue(0) // sps_id
    sps.ue(0) // log2_max_frame_num_minus4
    sps.ue(0) // pic_order_cnt_type = 0
    sps.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    sps.ue(0) // max_num_ref_frames
    sps.put(0) // gaps allowed
    sps.ue(0).ue(0) // 1x1 MBs
    sps.put(1).put(1) // frame_mbs_only, direct_8x8
    sps.put(0).put(0) // no crop, no vui
    val pps = new Bits
    pps.ue(0).ue(0) // pps_id, sps_id
    pps.put(0) // CAVLC
    pps.put(1) // bottom_field_pic_order_in_frame_present = 1
    pps.ue(0) // slice groups
    pps.ue(0).ue(0) // ref idx counts
    pps.put(0).bits(0, 2) // weighted pred/bipred
    pps.se(30 - 26) // pic_init_qp
    pps.se(0).se(0) // qs, chroma offset
    pps.put(1).put(0).put(0) // deblocking present, constrained intra, redundant
    val slice = new Bits
    slice.ue(0).ue(7).ue(0) // first_mb, type I, pps_id
    slice.bits(0, 4) // frame_num
    slice.ue(0) // idr_pic_id
    slice.bits(9, 4) // pic_order_cnt_lsb (poc type 0)
    slice.se(-2) // delta_pic_order_cnt_bottom (present due to the PPS flag)
    slice.put(0).put(0) // dec_ref_pic_marking
    slice.se(0) // slice_qp_delta
    slice.ue(1) // disable deblocking
    slice.ue(3).ue(0).se(0).put(1) // I_16x16 DC, chroma DC, qp_delta 0, empty luma DC
    val sc = Array[Byte](0, 0, 0, 1)
    val stream = sc ++ (Array[Byte](0x67) ++ sps.stop()) ++
      sc ++ (Array[Byte](0x68) ++ pps.stop()) ++
      sc ++ (Array[Byte](0x65) ++ slice.stop())
    val dec = decodeYuv(stream)
    assert(dec.isDefined, "POC syntax must parse, not desync")
    assert(dec.get.width == 16 && dec.get.y.forall(_ == 128.toByte))
  }

  test("decodeAvcSample handles 1- and 3-byte NAL length prefixes") {
    val enc = encodeYuv(frame(16, 16, 77), qp = 30)
    for (ls <- Seq(1, 3) if enc.idrNal.length < (1 << (8 * ls))) {
      val b = java.nio.ByteBuffer.allocate(ls + enc.idrNal.length)
      var i = ls - 1
      while (i >= 0) { b.put(((enc.idrNal.length >> (8 * i)) & 0xff).toByte); i -= 1 }
      b.put(enc.idrNal)
      val dec = decodeAvcSample(enc.spsNal, enc.ppsNal, b.array(), lengthSize = ls)
      assert(dec.isDefined, s"lengthSize $ls")
      assertSame(dec.get, enc.recon, s"len$ls")
    }
  }

  test("fuzz: random bytes, mutated-valid streams, and truncations never throw") {
    val rnd = new scala.util.Random(20260814L)
    // pure noise, with and without a start-code prefix
    for (_ <- 1 to 300) {
      val buf = new Array[Byte](2 + rnd.nextInt(400))
      rnd.nextBytes(buf)
      assert(decodeYuv(buf).forall(f => f.width > 0)) // must not throw
      if (buf.length >= 5) {
        buf(0) = 0; buf(1) = 0; buf(2) = 1; buf(3) = 0x67
        decodeYuv(buf)
      }
    }
    // single-byte mutations of a valid stream: every header field,
    // parameter-set bit, and entropy byte gets corrupted across runs
    val good = encodeYuv(frame(32, 32, 3), qp = 24).annexB
    for (_ <- 1 to 500) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decodeYuv(m) match { // None or a full frame, never a throw
        case Some(f) => assert(f.y.length == f.width * f.height)
        case None => ()
      }
    }
    // truncation sweep + mutated AVC samples through the length-prefix path
    for (cut <- 1 until good.length by 5) decodeYuv(good.take(cut))
    val enc = encodeYuv(frame(16, 16, 4), qp = 30)
    val sample = {
      val b = java.nio.ByteBuffer.allocate(4 + enc.idrNal.length)
      b.putInt(enc.idrNal.length).put(enc.idrNal).array()
    }
    for (_ <- 1 to 300) {
      val m = sample.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decodeAvcSample(enc.spsNal, enc.ppsNal, m) // must not throw
    }
  }

  // ---------------------------------------------------------------
  // P slices (inter prediction, r7)
  // ---------------------------------------------------------------

  /** A camera-pan sequence: every frame samples one fixed textured
    * field at a per-frame offset (quarter-smooth content with real
    * structure), so motion search has a true answer to find.
    */
  private def panSeq(w: Int, h: Int, n: Int, stepX: Int, stepY: Int): Vector[Yuv420] = {
    def field(x: Int, y: Int, c: Int): Int =
      ((x * 3 + y * 5 + (x / 7) * (y / 5) * 11 + c * 101 + 31) & 0xff)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    Vector.tabulate(n) { k =>
      val ox = k * stepX; val oy = k * stepY
      Yuv420(w, h,
        Array.tabulate(w * h)(i => field(i % w + ox, i / w + oy, 0).toByte),
        Array.tabulate(cw * ch)(i => field(i % cw + ox / 2, i / cw + oy / 2, 1).toByte),
        Array.tabulate(cw * ch)(i => field(i % cw + ox / 2, i / cw + oy / 2, 2).toByte))
    }
  }

  /** Literal per-sample transcription of the fractional luma
    * interpolation (8.4.2.2.1/.2, Table 8-12 letters), written
    * independently of mcLuma's patch machinery — and with the centre
    * sample j computed in the OPPOSITE separability order (vertical
    * raw sums, then the horizontal 6-tap), which the standard defines
    * to be identical.
    */
  private def lumaSampleQ(ref: Array[Byte], rw: Int, rh: Int, qx: Int, qy: Int): Int = {
    def at(x: Int, y: Int): Int =
      ref(math.max(0, math.min(rh - 1, y)) * rw + math.max(0, math.min(rw - 1, x))) & 0xff
    def clip(v: Int) = math.max(0, math.min(255, v))
    val xI = Math.floorDiv(qx, 4); val yI = Math.floorDiv(qy, 4)
    val fx = qx - 4 * xI; val fy = qy - 4 * yI
    def bRaw(x: Int, y: Int) =
      at(x - 2, y) - 5 * at(x - 1, y) + 20 * at(x, y) + 20 * at(x + 1, y) -
        5 * at(x + 2, y) + at(x + 3, y)
    def hRaw(x: Int, y: Int) =
      at(x, y - 2) - 5 * at(x, y - 1) + 20 * at(x, y) + 20 * at(x, y + 1) -
        5 * at(x, y + 2) + at(x, y + 3)
    def b(x: Int, y: Int) = clip((bRaw(x, y) + 16) >> 5)
    def h(x: Int, y: Int) = clip((hRaw(x, y) + 16) >> 5)
    def j(x: Int, y: Int) = clip((hRaw(x - 2, y) - 5 * hRaw(x - 1, y) +
      20 * hRaw(x, y) + 20 * hRaw(x + 1, y) - 5 * hRaw(x + 2, y) +
      hRaw(x + 3, y) + 512) >> 10)
    def avg(u: Int, v: Int) = (u + v + 1) >> 1
    val G = at(xI, yI)
    (fx, fy) match {
      case (0, 0) => G
      case (1, 0) => avg(G, b(xI, yI)) // a
      case (2, 0) => b(xI, yI)
      case (3, 0) => avg(b(xI, yI), at(xI + 1, yI)) // c
      case (0, 1) => avg(G, h(xI, yI)) // d
      case (0, 2) => h(xI, yI)
      case (0, 3) => avg(h(xI, yI), at(xI, yI + 1)) // n
      case (1, 1) => avg(b(xI, yI), h(xI, yI)) // e
      case (2, 1) => avg(b(xI, yI), j(xI, yI)) // f
      case (3, 1) => avg(b(xI, yI), h(xI + 1, yI)) // g
      case (1, 2) => avg(h(xI, yI), j(xI, yI)) // i
      case (2, 2) => j(xI, yI)
      case (3, 2) => avg(j(xI, yI), h(xI + 1, yI)) // k
      case (1, 3) => avg(h(xI, yI), b(xI, yI + 1)) // p
      case (2, 3) => avg(j(xI, yI), b(xI, yI + 1)) // q
      case _ => avg(h(xI + 1, yI), b(xI, yI + 1)) // r
    }
  }

  test("quarter-pel luma interpolator == independent 8.4.2.2.1 transcription") {
    val rnd = new java.util.Random(7L)
    val rw = 40; val rh = 28
    val ref = new Array[Byte](rw * rh); rnd.nextBytes(ref)
    val pred = new Array[Int](16 * 16)
    for (_ <- 1 to 200) {
      val bw = Seq(4, 8, 16)(rnd.nextInt(3)); val bh = Seq(4, 8, 16)(rnd.nextInt(3))
      val px = rnd.nextInt(rw - bw + 1); val py = rnd.nextInt(rh - bh + 1)
      val mvx = rnd.nextInt(81) - 40; val mvy = rnd.nextInt(81) - 40
      H264Codec.mcLuma(ref, rw, rh, px, py, mvx, mvy, bw, bh, pred, 0, bw)
      for (y <- 0 until bh; x <- 0 until bw) {
        val want = lumaSampleQ(ref, rw, rh, (px + x) * 4 + mvx, (py + y) * 4 + mvy)
        assert(pred(y * bw + x) == want,
          s"($x,$y) mv($mvx,$mvy) at ($px,$py) ${bw}x$bh: got ${pred(y * bw + x)}, want $want")
      }
    }
  }

  test("eighth-pel chroma interpolator == independent 8.4.2.2.2 bilinear") {
    val rnd = new java.util.Random(8L)
    val rw = 20; val rh = 14
    val ref = new Array[Byte](rw * rh); rnd.nextBytes(ref)
    def at(x: Int, y: Int): Int =
      ref(math.max(0, math.min(rh - 1, y)) * rw + math.max(0, math.min(rw - 1, x))) & 0xff
    val pred = new Array[Int](64)
    for (_ <- 1 to 200) {
      val bw = Seq(2, 4, 8)(rnd.nextInt(3)); val bh = Seq(2, 4, 8)(rnd.nextInt(3))
      val px = rnd.nextInt(rw - bw + 1); val py = rnd.nextInt(rh - bh + 1)
      val mvx = rnd.nextInt(121) - 60; val mvy = rnd.nextInt(121) - 60
      H264Codec.mcChroma(ref, rw, rh, px, py, mvx, mvy, bw, bh, pred, 0, bw)
      val fx = Math.floorMod(mvx, 8); val fy = Math.floorMod(mvy, 8)
      for (y <- 0 until bh; x <- 0 until bw) {
        val ax = px + x + Math.floorDiv(mvx, 8); val ay = py + y + Math.floorDiv(mvy, 8)
        val want = ((8 - fx) * (8 - fy) * at(ax, ay) + fx * (8 - fy) * at(ax + 1, ay) +
          (8 - fx) * fy * at(ax, ay + 1) + fx * fy * at(ax + 1, ay + 1) + 32) >> 6
        assert(pred(y * bw + x) == want, s"($x,$y) mv($mvx,$mvy) at ($px,$py)")
      }
    }
  }

  test("P sequence: pans at full/half/quarter-pel speeds decode bit-exactly to recon") {
    for {
      (sx, sy) <- Seq((4, 0), (2, 1), (1, 3), (-3, 2)) // quarter-pel steps/frame... full=4
      qp <- Seq(22, 34)
    } {
      // sub-pel pans: shift the FIELD by k*s quarter-pels means the
      // best MV is exactly (-k*s); integer fields shift by whole
      // pixels, so model sub-pel by small per-frame pixel shifts
      // alternated with static frames (motion search still exercises
      // sub-pel refinement around the optimum).
      val frames = panSeq(48, 32, 5, sx, sy)
      val seq = H264Codec.encodeSequence(frames, qp = qp, gop = 100)
      assert(seq.frames.head.idr && seq.frames.tail.forall(!_.idr))
      val dec = H264Codec.decodeYuvFrames(seq.annexB)
      assert(dec.isDefined, s"pan ($sx,$sy) qp$qp must decode")
      assert(dec.get.length == 5)
      for (k <- 0 until 5)
        assertSame(dec.get(k), seq.frames(k).recon, s"pan ($sx,$sy) qp$qp frame$k")
      val pModes = seq.frames.tail.flatMap(_.mbModes.keys).toSet
      assert(pModes.exists(Set("P_16x16", "P_16x8", "P_8x16", "P_8x8", "P_Skip")),
        s"inter modes must appear, got $pModes")
    }
  }

  test("static scene: P frame is all P_Skip, a few bytes, recon == previous frame") {
    // all-128 flat intra-codes losslessly (DC prediction exact), so
    // the P frames' references EQUAL their sources and every MB must
    // quantize to an exact skip — {P_Skip: all} is structural, not a
    // tuning accident (a lossy still would legitimately code P_16x16)
    val still = flat(48, 48, 128, 128, 128)
    val seq = H264Codec.encodeSequence(Vector(still, still, still), qp = 28, gop = 100)
    assertSame(seq.frames.head.recon, still, "flat-128 intra is lossless")
    val p = seq.frames(1)
    assert(p.mbModes == Map("P_Skip" -> 9), s"got ${p.mbModes}")
    assert(p.nal.length <= 8, s"all-skip P frame should be tiny, got ${p.nal.length}B")
    assertSame(p.recon, seq.frames.head.recon, "skip recon == ref")
    val dec = H264Codec.decodeYuvFrames(seq.annexB).get
    for (k <- 0 until 3) assertSame(dec(k), seq.frames(k).recon, s"static frame$k")
  }

  test("split motion selects split shapes; a bright flat burst falls back to intra-in-P") {
    // top half pans right, bottom half pans left: 16x8 partitions (or
    // finer) must beat 16x16 somewhere. The last frame grows a flat
    // 250-luma square over range-limited texture (max 167): no inter
    // candidate can approximate it (per-sample error >= 83) while its
    // interior MBs intra-predict near-exactly — intra must win there.
    val w = 64; val h = 64
    def field(x: Int, y: Int): Int = 40 + ((x * 3 + y * 7 + (x / 6) * (y / 4) * 5) & 0x7f)
    val frames = Vector.tabulate(4) { k =>
      val y = Array.tabulate(w * h) { i =>
        val (xx, yy) = (i % w, i / w)
        if (yy < h / 2) field(xx + 3 * k, yy).toByte else field(xx - 3 * k, yy).toByte
      }
      if (k == 3) { // flat bright burst over the top-left 32x32
        for (yy <- 0 until 32; xx <- 0 until 32) y(yy * w + xx) = 250.toByte
      }
      Yuv420(w, h, y, Array.fill(w * h / 4)(100.toByte), Array.fill(w * h / 4)(140.toByte))
    }
    val seq = H264Codec.encodeSequence(frames, qp = 26, gop = 100)
    val dec = H264Codec.decodeYuvFrames(seq.annexB)
    assert(dec.isDefined, "split-motion stream must decode")
    for (k <- frames.indices) assertSame(dec.get(k), seq.frames(k).recon, s"frame$k")
    val all = seq.frames.tail.flatMap(_.mbModes.toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(Set("P_16x8", "P_8x16", "P_8x8").exists(all.getOrElse(_, 0) > 0),
      s"split shapes must win somewhere on split motion, got $all")
    assert(all.getOrElse("I_in_P", 0) > 0, s"flat burst must go intra, got $all")
  }

  test("sub-8x8 partitions: quadrant-opposed motion uses P_8x8, decodes bit-exactly") {
    val w = 32; val h = 32
    def field(x: Int, y: Int): Int = ((x * 5 + y * 3 + (x / 4) * (y / 7) * 13) & 0xff)
    val frames = Vector.tabulate(4) { k =>
      val y = Array.tabulate(w * h) { i =>
        val (xx, yy) = (i % w, i / w)
        val dx = (if (xx < w / 2) 2 else -2) * k + (if (yy < h / 2) k else -k)
        val dy = (if (yy < h / 2) 1 else -2) * k
        field(xx + dx, yy + dy).toByte
      }
      Yuv420(w, h, y, Array.fill(w * h / 4)(90.toByte), Array.fill(w * h / 4)(150.toByte))
    }
    val seq = H264Codec.encodeSequence(frames, qp = 24, gop = 100)
    val dec = H264Codec.decodeYuvFrames(seq.annexB)
    assert(dec.isDefined)
    for (k <- frames.indices) assertSame(dec.get(k), seq.frames(k).recon, s"quad frame$k")
    val all = seq.frames.tail.flatMap(_.mbModes.toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
    assert(all.getOrElse("P_8x8", 0) > 0, s"quadrant motion should pick P_8x8, got $all")
  }

  test("GOP structure: IDR refresh mid-sequence, sync flags and frame count") {
    val frames = panSeq(32, 32, 7, 2, 1)
    val seq = H264Codec.encodeSequence(frames, qp = 30, gop = 3)
    assert(seq.frames.map(_.idr) == Vector(true, false, false, true, false, false, true))
    val dec = H264Codec.decodeYuvFrames(seq.annexB)
    assert(dec.isDefined && dec.get.length == 7)
    for (k <- 0 until 7) assertSame(dec.get(k), seq.frames(k).recon, s"gop frame$k")
    // decodeYuv (first frame only) still works on a multi-frame stream
    assertSame(H264Codec.decodeYuv(seq.annexB).get, seq.frames.head.recon, "first")
  }

  test("AvcDecoder: sample-wise GOP decode; P-before-IDR and corruption poison the chain") {
    val frames = panSeq(32, 32, 6, 3, 2)
    val seq = H264Codec.encodeSequence(frames, qp = 28, gop = 3)
    def sample(nal: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + nal.length)
      b.putInt(nal.length).put(nal).array()
    }
    val d = new H264Codec.AvcDecoder(seq.spsNal, seq.ppsNal)
    for ((f, k) <- seq.frames.zipWithIndex) {
      val out = d.decodeSample(sample(f.nal))
      assert(out.isDefined, s"sample $k")
      assertSame(out.get, f.recon, s"avc sample $k")
    }
    // a fresh decoder fed a P sample first must refuse (no reference)
    val d2 = new H264Codec.AvcDecoder(seq.spsNal, seq.ppsNal)
    assert(d2.decodeSample(sample(seq.frames(1).nal)).isEmpty, "P before IDR")
    // corruption mid-GOP poisons every following P until the next IDR
    val d3 = new H264Codec.AvcDecoder(seq.spsNal, seq.ppsNal)
    assert(d3.decodeSample(sample(seq.frames(0).nal)).isDefined)
    val bad = sample(seq.frames(1).nal)
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    d3.decodeSample(bad) // None or a full frame — but if None, the chain is broken
    val after = d3.decodeSample(sample(seq.frames(2).nal))
    // frame 2 predicted against frame 1; with frame 1 corrupted either the
    // corrupt decode survived (rare) or frame 2 must be refused
    val idr = d3.decodeSample(sample(seq.frames(3).nal))
    assert(idr.isDefined, "IDR must always recover the chain")
    assertSame(idr.get, seq.frames(3).recon, "post-IDR recovery")
    assert(d3.decodeSample(sample(seq.frames(4).nal)).isDefined, "P after recovery IDR")
  }

  test("P-stream fuzz: mutations and truncations of inter NALs never throw") {
    val rnd = new scala.util.Random(20260815L)
    val streams = Seq(
      H264Codec.encodeSequence(panSeq(32, 32, 4, 3, 1), qp = 26, gop = 100).annexB,
      // multi-slice + deblock + weighting: the full header/filter surface
      H264Codec.encodeSequence(panSeq(32, 32, 4, 3, 1), qp = 26, gop = 100,
        deblock = true, weighted = true, slices = 2).annexB)
    for (good <- streams) {
      for (_ <- 1 to 400) {
        val m = good.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        H264Codec.decodeYuvFrames(m) match {
          case Some(fs) => fs.foreach(f => assert(f.y.length == f.width * f.height))
          case None => ()
        }
      }
      for (cut <- 1 until good.length by 7) H264Codec.decodeYuvFrames(good.take(cut))
    }
  }

  // ---------------------------------------------------------------
  // In-loop deblocking filter (8.7)
  // ---------------------------------------------------------------

  test("deblocking threshold tables: zeros below 16, goldens, monotone") {
    import H264Codec.{AlphaTab, BetaTab, Tc0Tab}
    assert(AlphaTab.length == 52 && BetaTab.length == 52 && Tc0Tab.length == 52)
    assert(AlphaTab.take(16).forall(_ == 0) && BetaTab.take(16).forall(_ == 0))
    assert(Tc0Tab.take(17).forall(_.forall(_ == 0))) // first nonzero at 17
    // golden endpoints from Tables 8-16/8-17
    assert(AlphaTab(16) == 4 && AlphaTab(26) == 15 && AlphaTab(36) == 50 &&
      AlphaTab(51) == 255)
    assert(BetaTab(16) == 2 && BetaTab(26) == 6 && BetaTab(36) == 11 &&
      BetaTab(51) == 18)
    assert(Tc0Tab(17).toSeq == Seq(0, 0, 1) && Tc0Tab(40).toSeq == Seq(4, 5, 7) &&
      Tc0Tab(51).toSeq == Seq(14, 19, 25))
    (17 until 52).foreach { i =>
      assert(AlphaTab(i) >= AlphaTab(i - 1) && BetaTab(i) >= BetaTab(i - 1))
      (0 until 3).foreach(b => assert(Tc0Tab(i)(b) >= Tc0Tab(i - 1)(b)))
    }
    (16 until 52).foreach(i =>
      assert(Tc0Tab(i)(0) <= Tc0Tab(i)(1) && Tc0Tab(i)(1) <= Tc0Tab(i)(2)))
  }

  test("filterEdge: hand-computed 8.7.2.3/.4 vectors for every bS family") {
    // one line across an edge: p3 p2 p1 p0 | q0 q1 q2 q3, base at q0
    def run(vals: Seq[Int], bS: Int, iA: Int, iB: Int, chroma: Boolean): Seq[Int] = {
      val a = vals.map(_.toByte).toArray
      H264Codec.filterEdge(a, 4, 1, 8, 1, bS, iA, iB, chroma)
      a.map(_ & 0xff).toSeq
    }
    val ramp = Seq(86, 88, 90, 92, 100, 102, 104, 106) // p3..p0, q0..q3
    // bS=4 luma strong both sides at indexA=40 (alpha 80, beta 13):
    // p0'=(p2+2p1+2p0+2q0+q1+4)>>3=94, p1'=(p2+p1+p0+q0+2)>>2=93,
    // p2'=(2p3+3p2+p1+p0+q0+4)>>3=90; q0'=98, q1'=100, q2'=102
    assert(run(ramp, 4, 40, 40, chroma = false) ==
      Seq(86, 90, 93, 94, 98, 100, 102, 106))
    // bS=2 luma at indexA=40: tc0=5, ap&aq -> tc=7,
    // delta=((8<<2)+(90-102)+4)>>3=3 -> p0'=95 q0'=97;
    // p1'=90+clip(+-5,(88+96-180)>>1)=92, q1'=102+((104+96-204)>>1)=100
    assert(run(ramp, 2, 40, 40, chroma = false) ==
      Seq(86, 88, 92, 95, 97, 100, 104, 106))
    // chroma bS=2: tc=tc0+1=6, delta=3, p1/q1 untouched
    assert(run(ramp, 2, 40, 40, chroma = true) ==
      Seq(86, 88, 90, 95, 97, 102, 104, 106))
    // chroma bS=4: p0'=(2p1+p0+q1+2)>>2=94, q0'=(2q1+q0+p1+2)>>2=99
    assert(run(ramp, 4, 40, 40, chroma = true) ==
      Seq(86, 88, 90, 94, 99, 102, 104, 106))
    // below index 16 alpha=0: identity at any bS
    assert(run(ramp, 4, 15, 15, chroma = false) == ramp)
    // a hard step (|p0-q0| >= alpha) is a REAL edge: left untouched
    val step = Seq(30, 30, 30, 30, 200, 200, 200, 200)
    assert(run(step, 3, 30, 30, chroma = false) == step)
    // uniform content: all deltas/averages are identity
    val flatLine = Seq.fill(8)(128)
    for (bs <- 1 to 4; ch <- Seq(true, false))
      assert(run(flatLine, bs, 51, 51, ch) == flatLine, s"flat bs$bs ch$ch")
  }

  test("deblocked streams: decode == encoder recon over QPs; the filter really fires") {
    for (qp <- Seq(22, 34, 44)) {
      val frames = panSeq(48, 32, 4, 3, 1)
      val on = H264Codec.encodeSequence(frames, qp = qp, gop = 100, deblock = true)
      val off = H264Codec.encodeSequence(frames, qp = qp, gop = 100)
      val dec = H264Codec.decodeYuvFrames(on.annexB)
      assert(dec.isDefined, s"deblocked qp$qp must decode")
      for (k <- frames.indices)
        assertSame(dec.get(k), on.frames(k).recon, s"deblock qp$qp frame$k")
      // at blocky QPs the filter must actually change pixels
      if (qp >= 34)
        assert(!java.util.Arrays.equals(on.frames.head.recon.y, off.frames.head.recon.y),
          s"qp$qp filter should alter the recon")
    }
    // flat content: the filter is the identity (all deltas zero), so
    // deblocked and unfiltered recons agree exactly
    val still = Vector.fill(2)(flat(32, 32, 128, 128, 128))
    val on = H264Codec.encodeSequence(still, qp = 30, gop = 100, deblock = true)
    val off = H264Codec.encodeSequence(still, qp = 30, gop = 100)
    for (k <- 0 until 2) assertSame(on.frames(k).recon, off.frames(k).recon, s"flat $k")
  }

  test("foreign deblocking syntax: idc 0/2 with offsets parse; absent control means filter on") {
    // hand-built flat I_16x16 DC stream with idc=0 and nonzero offsets:
    // uniform 128 output is filter-invariant, so the pixels pin the
    // PARSE (a desync would shift everything after the offsets)
    val ref = encodeYuv(flat(16, 16, 1, 2, 3), qp = 30)
    val sc = Array[Byte](0, 0, 0, 1)
    for (idc <- Seq(0, 2)) {
      val slice = new Bits
      slice.ue(0).ue(7).ue(0) // first_mb, I, pps
      slice.bits(0, 4) // frame_num
      slice.ue(0) // idr_pic_id
      slice.put(0).put(0) // dec_ref_pic_marking
      slice.se(0) // slice_qp_delta
      slice.ue(idc) // disable_deblocking_filter_idc
      slice.se(-2) // slice_alpha_c0_offset_div2
      slice.se(3) // slice_beta_offset_div2
      slice.ue(3).ue(0).se(0).put(1) // I_16x16 DC, chroma DC, qp_delta, empty DC
      val dec = decodeYuv(sc ++ ref.spsNal ++ sc ++ ref.ppsNal ++
        sc ++ (Array[Byte](0x65) ++ slice.stop()))
      assert(dec.isDefined, s"idc $idc with offsets must parse")
      assert(dec.get.y.forall(_ == 128.toByte), s"idc $idc flat DC output")
    }
    // PPS without deblocking_filter_control_present: the filter
    // defaults ON (idc 0, zero offsets) — previously out of subset
    val pps = new Bits
    pps.ue(0).ue(0) // pps_id, sps_id
    pps.put(0) // CAVLC
    pps.put(0) // no bottom-field POC
    pps.ue(0) // slice groups
    pps.ue(0).ue(0) // ref idx counts
    pps.put(0).bits(0, 2) // weighted pred/bipred
    pps.se(30 - 26) // pic_init_qp
    pps.se(0).se(0) // qs, chroma offset
    pps.put(0).put(0).put(0) // NO deblocking control, constrained, redundant
    val slice = new Bits
    slice.ue(0).ue(7).ue(0)
    slice.bits(0, 4)
    slice.ue(0)
    slice.put(0).put(0)
    slice.se(0) // slice_qp_delta — and NO deblocking syntax follows
    slice.ue(3).ue(0).se(0).put(1)
    val dec = decodeYuv(sc ++ ref.spsNal ++
      sc ++ (Array[Byte](0x68) ++ pps.stop()) ++
      sc ++ (Array[Byte](0x65) ++ slice.stop()))
    assert(dec.isDefined, "absent deblocking control must decode (filter on)")
    assert(dec.get.y.forall(_ == 128.toByte))
  }

  // ---------------------------------------------------------------
  // Weighted prediction (8.4.2.3, P slices)
  // ---------------------------------------------------------------

  test("weighted prediction: fades decode bit-exactly and the detector fires") {
    // multiplicative luma fade over a textured field — the x264-weightp
    // shape: each frame is the same scene at a lower gain
    val w = 48; val h = 32
    def field(x: Int, y: Int): Int = 60 + ((x * 3 + y * 7 + (x / 6) * (y / 5) * 5) & 0x7f)
    val gains = Seq(1.0, 0.82, 0.67, 0.55)
    val frames = gains.map { g =>
      val y = Array.tabulate(w * h)(i => math.round(field(i % w, i / w) * g).toByte)
      Yuv420(w, h, y, Array.fill(w * h / 4)(110.toByte), Array.fill(w * h / 4)(130.toByte))
    }.toVector
    for (qp <- Seq(24, 34)) {
      val on = H264Codec.encodeSequence(frames, qp = qp, gop = 100, weighted = true)
      val dec = H264Codec.decodeYuvFrames(on.annexB)
      assert(dec.isDefined, s"weighted fade qp$qp must decode")
      for (k <- frames.indices)
        assertSame(dec.get(k), on.frames(k).recon, s"wp qp$qp frame$k")
      // the fade detector must fire with a sub-unit gain (w < 64)
      val fired = on.frames.tail.filter(_.mbModes.contains("WP"))
      assert(fired.nonEmpty, "fade frames must carry real luma weights")
      fired.foreach(f => assert(f.mbModes("WP_w") < 64,
        s"fade gain should be < 1: ${f.mbModes}"))
      // and weighting must pay: fewer bits than the unweighted encode
      val off = H264Codec.encodeSequence(frames, qp = qp, gop = 100)
      assert(on.annexB.length < off.annexB.length,
        s"qp$qp weighted ${on.annexB.length}B !< unweighted ${off.annexB.length}B")
    }
    // steady content through the weighted path: detector stays identity,
    // stream still round-trips (the table is written with flags 0)
    val steady = panSeq(32, 32, 3, 2, 1)
    val id = H264Codec.encodeSequence(steady, qp = 28, gop = 100, weighted = true)
    assert(id.frames.tail.forall(!_.mbModes.contains("WP")), "no fade, no weights")
    val dec2 = H264Codec.decodeYuvFrames(id.annexB)
    assert(dec2.isDefined)
    for (k <- steady.indices) assertSame(dec2.get(k), id.frames(k).recon, s"id $k")
  }

  test("weighted prediction golden: hand-built all-skip P slice applies w=40 o=10") {
    // IDR from the encoder, then a hand-built P slice under a WP PPS:
    // pred_weight_table lwd=5 / w=40 / o=10, chroma identity, every MB
    // skipped -> the second frame must be exactly
    // clip(((y*40+16)>>5)+10) of the first, chroma untouched
    val src = frame(32, 32, seed = 21)
    val enc = encodeYuv(src, qp = 30)
    val pps = new Bits
    pps.ue(0).ue(0) // pps_id, sps_id
    pps.put(0) // CAVLC
    pps.put(0) // no bottom-field POC
    pps.ue(0) // slice groups
    pps.ue(0).ue(0) // num_ref_idx_active_minus1
    pps.put(1) // weighted_pred = 1
    pps.bits(0, 2) // weighted_bipred_idc
    pps.se(30 - 26) // pic_init_qp = 30 (matches the IDR slice)
    pps.se(0).se(0) // qs, chroma offset
    pps.put(1).put(0).put(0) // deblocking control present, CI, redundant
    val p = new Bits
    p.ue(0) // first_mb_in_slice
    p.ue(5) // slice_type P (all)
    p.ue(0) // pps_id
    p.bits(1, 4) // frame_num = 1
    p.put(0) // num_ref_idx_active_override
    p.put(0) // ref_pic_list_modification_flag_l0
    p.ue(5).ue(5) // luma/chroma log2 weight denom
    p.put(1).se(40).se(10) // luma_weight_l0_flag, w=40, o=10
    p.put(0) // chroma_weight_l0_flag (identity at 1<<5)
    p.put(0) // adaptive_ref_pic_marking_mode_flag
    p.se(0) // slice_qp_delta
    p.ue(1) // disable_deblocking_filter_idc
    p.ue(4) // mb_skip_run = 4 (32x32 -> 4 MBs, all skipped)
    val sc = Array[Byte](0, 0, 0, 1)
    val stream = sc ++ enc.spsNal ++ sc ++ (Array[Byte](0x68) ++ pps.stop()) ++
      sc ++ enc.idrNal ++ sc ++ (Array[Byte](0x41) ++ p.stop())
    val dec = H264Codec.decodeYuvFrames(stream)
    assert(dec.isDefined && dec.get.length == 2, "IDR + weighted-skip P")
    assertSame(dec.get.head, enc.recon, "frame 0")
    val got = dec.get(1)
    val want = enc.recon.y.map { b =>
      math.max(0, math.min(255, (((b & 0xff) * 40 + 16) >> 5) + 10)).toByte
    }
    assert(java.util.Arrays.equals(got.y, want), "weighted luma copy")
    assert(java.util.Arrays.equals(got.cb, enc.recon.cb) &&
      java.util.Arrays.equals(got.cr, enc.recon.cr), "chroma identity")
  }

  // ---------------------------------------------------------------
  // Multi-slice pictures
  // ---------------------------------------------------------------

  test("multi-slice pictures: I and P GOPs round-trip bit-exactly at every split") {
    val frames = panSeq(48, 48, 5, 3, 1) // 9 MBs per picture
    for {
      slices <- Seq(2, 3, 5)
      deblock <- Seq(false, true)
    } {
      val seq = H264Codec.encodeSequence(frames, qp = 30, gop = 3,
        deblock = deblock, slices = slices)
      seq.frames.foreach(f => assert(f.nals.length == slices,
        s"expected $slices slice NALs, got ${f.nals.length}"))
      val dec = H264Codec.decodeYuvFrames(seq.annexB)
      assert(dec.isDefined, s"slices=$slices deblock=$deblock must decode")
      for (k <- frames.indices)
        assertSame(dec.get(k), seq.frames(k).recon,
          s"slices=$slices deblock=$deblock frame$k")
    }
    // more slices than MBs: capped to one MB per slice, still exact
    val tiny = panSeq(32, 32, 2, 2, 1) // 4 MBs
    val seq = H264Codec.encodeSequence(tiny, qp = 28, gop = 100, slices = 99)
    assert(seq.frames.head.nals.length == 4)
    val dec = H264Codec.decodeYuvFrames(seq.annexB)
    assert(dec.isDefined)
    for (k <- tiny.indices) assertSame(dec.get(k), seq.frames(k).recon, s"tiny $k")
  }

  test("slice-boundary semantics: idc 2 leaves cross-slice edges unfiltered; slices change prediction") {
    val frames = panSeq(48, 48, 3, 3, 2)
    val across = H264Codec.encodeSequence(frames, qp = 40, gop = 100,
      deblock = true, slices = 3)
    val notAcross = H264Codec.encodeSequence(frames, qp = 40, gop = 100,
      deblock = true, slices = 3, deblockAcrossSlices = false)
    // idc 0 vs idc 2 must differ exactly at slice-boundary filtering
    assert(!java.util.Arrays.equals(across.frames.head.recon.y,
      notAcross.frames.head.recon.y),
      "cross-slice filtering must be observable at a blocky QP")
    for (seq <- Seq(across, notAcross); k <- frames.indices)
      assertSame(H264Codec.decodeYuvFrames(seq.annexB).get(k),
        seq.frames(k).recon, s"idc frame$k")
    // slice isolation is real: the same picture coded with slice splits
    // differs from the single-slice coding (prediction cannot cross)
    val one = H264Codec.encodeSequence(frames, qp = 40, gop = 100, deblock = true)
    assert(one.frames.head.nals.head.length < across.frames.head.nals.map(_.length).sum +
      across.frames.head.nals.length * 4, "sanity: slices cost header bits")
  }

  test("a picture missing its later slices quarantines; so does a truncated sample") {
    val frames = panSeq(32, 32, 2, 2, 1)
    val seq = H264Codec.encodeSequence(frames, qp = 28, gop = 100, slices = 2)
    // drop the LAST slice NAL of the last picture from the Annex-B stream
    val sc = Array[Byte](0, 0, 0, 1)
    val allButLast = {
      val b = Array.newBuilder[Byte]
      b ++= sc; b ++= seq.spsNal; b ++= sc; b ++= seq.ppsNal
      val nals = seq.frames.flatMap(_.nals)
      nals.dropRight(1).foreach { n => b ++= sc; b ++= n }
      b.result()
    }
    assert(H264Codec.decodeYuvFrames(allButLast).isEmpty,
      "incomplete picture must quarantine the stream")
    // AvcDecoder: a multi-slice picture decodes from one sample; a
    // sample missing a slice is refused
    val d = new H264Codec.AvcDecoder(seq.spsNal, seq.ppsNal)
    def sample(nals: Seq[Array[Byte]]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(nals.map(_.length + 4).sum)
      nals.foreach(n => b.putInt(n.length).put(n))
      b.array()
    }
    val f0 = d.decodeSample(sample(seq.frames.head.nals))
    assert(f0.isDefined, "two-slice sample must decode")
    assertSame(f0.get, seq.frames.head.recon, "two-slice sample recon")
    val d2 = new H264Codec.AvcDecoder(seq.spsNal, seq.ppsNal)
    assert(d2.decodeSample(sample(seq.frames.head.nals.take(1))).isEmpty,
      "half a picture must be refused")
  }

  // ---------------------------------------------------------------
  // Reference management: list modification, MMCO, parameter sets
  // ---------------------------------------------------------------

  /** Hand-built fixtures over a 16x16 (one-MB) picture: an SPS with
    * max_num_ref_frames=2, a plain PPS 0 and a WEIGHTED PPS 1, a flat
    * IDR (I_16x16 DC -> all-128), and all-skip P slices whose output
    * is a (possibly weighted) copy of whatever reference heads list 0
    * — so reference-selection semantics become directly visible in
    * the pixels: 128 = the IDR, 64 = the half-gain weighted copy.
    */
  private object RefStream {
    val sps: Array[Byte] = {
      val b = new Bits
      b.bits(66, 8).bits(0xc0, 8).bits(30, 8) // profile/constraints/level
      b.ue(0) // sps_id
      b.ue(0) // log2_max_frame_num_minus4 (=> 4 bits, max 16)
      b.ue(2) // poc type 2
      b.ue(2) // max_num_ref_frames = 2
      b.put(0) // gaps
      b.ue(0).ue(0) // 1x1 MBs
      b.put(1).put(1) // frame_mbs_only, direct_8x8
      b.put(0).put(0) // no crop, no vui
      Array[Byte](0x67) ++ b.stop()
    }
    private def ppsBits(id: Int, weighted: Boolean): Array[Byte] = {
      val b = new Bits
      b.ue(id).ue(0) // pps_id, sps_id
      b.put(0) // CAVLC
      b.put(0) // no bottom-field POC
      b.ue(0) // slice groups
      b.ue(0).ue(0) // num_ref_idx_active_minus1
      b.put(if (weighted) 1 else 0)
      b.bits(0, 2) // weighted_bipred_idc
      b.se(30 - 26) // pic_init_qp
      b.se(0).se(0) // qs, chroma offset
      b.put(1).put(0).put(0) // deblocking control, CI, redundant
      Array[Byte](0x68) ++ b.stop()
    }
    val pps0: Array[Byte] = ppsBits(0, weighted = false)
    val pps1: Array[Byte] = ppsBits(1, weighted = true)
    def idrSlice(longTerm: Boolean): Array[Byte] = {
      val b = new Bits
      b.ue(0).ue(7).ue(0) // first_mb, I, pps 0
      b.bits(0, 4) // frame_num
      b.ue(0) // idr_pic_id
      b.put(0).put(if (longTerm) 1 else 0) // marking: long_term_reference_flag
      b.se(0) // slice_qp_delta
      b.ue(1) // deblocking off
      b.ue(3).ue(0).se(0).put(1) // I_16x16 DC, chroma DC, qp 0, empty DC
      Array[Byte](0x65) ++ b.stop()
    }
    val idr: Array[Byte] = idrSlice(longTerm = false)
    /** All-skip P slice: refIdc, frame_num, pps choice, optional luma
      * weight (w at denom 64 on the weighted PPS), one idc-0 list
      * modification (abs_diff_pic_num_minus1), and MMCO ops.
      */
    def pSkip(frameNum: Int, ppsId: Int, refIdc: Int,
        weight: Option[Int] = None,
        listMod: Option[Int] = None,
        listModLt: Option[Int] = None,
        mmco: Seq[Seq[Int]] = Nil): Array[Byte] = {
      val b = new Bits
      b.ue(0).ue(5).ue(ppsId) // first_mb, P, pps
      b.bits(frameNum & 15, 4)
      b.put(0) // num_ref_idx_active_override
      if (listMod.isDefined || listModLt.isDefined) {
        b.put(1)
        listMod.foreach(absM1 => { b.ue(0); b.ue(absM1) })
        listModLt.foreach(n => { b.ue(2); b.ue(n) })
        b.ue(3)
      } else b.put(0)
      if (ppsId == 1) { // weighted PPS: the table is mandatory
        b.ue(6).ue(6) // luma/chroma log2 denom
        weight match {
          case Some(w) => b.put(1); b.se(w); b.se(0)
          case None => b.put(0)
        }
        b.put(0) // chroma identity
      }
      if (refIdc != 0) {
        if (mmco.isEmpty) b.put(0)
        else {
          b.put(1)
          mmco.foreach(cmd => cmd.foreach(b.ue))
          b.ue(0)
        }
      }
      b.se(0) // slice_qp_delta
      b.ue(1) // deblocking off
      b.ue(1) // mb_skip_run covers the single MB
      Array[Byte]((0x01 | (refIdc << 5)).toByte) ++ b.stop()
    }
    def stream(slices: Array[Byte]*): Array[Byte] = {
      val sc = Array[Byte](0, 0, 0, 1)
      val b = Array.newBuilder[Byte]
      (Seq(sps, pps0, pps1) ++ slices).foreach { n => b ++= sc; b ++= n }
      b.result()
    }
    def lumas(s: Array[Byte]): Option[Vector[Int]] =
      H264Codec.decodeYuvFrames(s).map(_.map(_.y.head & 0xff))
  }

  test("ref_pic_list_modification selects an older reference (and two PPSes coexist)") {
    import RefStream._
    // A: IDR all-128. B: weighted skip at w=32 -> all-64 (PPS 1: the
    // second parameter set in the same stream). C default: copies the
    // highest-PicNum reference B (64); with an idc-0 modification of
    // abs_diff=2 it must copy the IDR A (128) instead.
    val base = Seq(idr, pSkip(1, 1, 2, weight = Some(32)))
    assert(lumas(stream(base :+ pSkip(2, 0, 2): _*)).contains(Vector(128, 64, 64)),
      "default list 0 heads at the newest reference")
    assert(lumas(stream(base :+ pSkip(2, 0, 2, listMod = Some(1)): _*))
      .contains(Vector(128, 64, 128)),
      "modification must re-head list 0 at the IDR")
    // modification to an absent picNum quarantines the stream
    assert(lumas(stream(base :+ pSkip(2, 0, 2, listMod = Some(5)): _*)).isEmpty)
  }

  test("MMCO 1 unmarks a short-term reference; without it the window evicts differently") {
    import RefStream._
    // A(128), B(64). C copies B and carries MMCO-1 unmarking B
    // (diff_minus1=0 -> picNum 1): the DPB keeps [C, A], so D can still
    // select A (picNum 0) by modification -> 128. The twin WITHOUT the
    // MMCO slides A out (max 2 refs: [C, B]) and the same D must
    // quarantine on the absent picNum.
    val ab = Seq(idr, pSkip(1, 1, 2, weight = Some(32)))
    val withMmco = stream(ab ++ Seq(
      pSkip(2, 0, 2, mmco = Seq(Seq(1, 0))),
      pSkip(3, 0, 2, listMod = Some(2))): _*)
    assert(lumas(withMmco).contains(Vector(128, 64, 64, 128)),
      "MMCO-1 must keep the IDR reachable")
    val without = stream(ab ++ Seq(
      pSkip(2, 0, 2),
      pSkip(3, 0, 2, listMod = Some(2))): _*)
    assert(lumas(without).isEmpty,
      "without MMCO the sliding window evicts the IDR; selecting it must quarantine")
  }

  test("MMCO 5 clears the DPB and the current picture takes frame_num 0") {
    import RefStream._
    // C carries MMCO-5: everything is unmarked, C is stored as
    // frame_num 0. D (frame_num 1) selecting picNum 0 must therefore
    // find C (64) — if the frame_num-0 rule were skipped, picNum 0
    // would match nothing and the stream would quarantine.
    val s = stream(idr, pSkip(1, 1, 2, weight = Some(32)),
      pSkip(2, 0, 2, mmco = Seq(Seq(5))),
      pSkip(1, 0, 2, listMod = Some(0)))
    assert(lumas(s).contains(Vector(128, 64, 64, 64)), "post-MMCO5 picNum 0 is the clearer")
    // long-term MMCO ops stay out of subset: quarantine, never garbage
    // MMCO-3 against an unset MaxLongTermFrameIdx quarantines (8.2.5.4.4)
    val lt = stream(idr, pSkip(1, 1, 2, weight = Some(32)),
      pSkip(2, 0, 2, mmco = Seq(Seq(3, 0, 0))))
    assert(lumas(lt).isEmpty, "MMCO-3 without MMCO-4 must quarantine")
  }

  test("long-term references: MMCO-3/4 pin a picture past the sliding window") {
    import RefStream._
    // A(128) IDR, B(64) weighted. C copies A (short-term modification)
    // and moves B long-term (MMCO-4 sets MaxLongTermFrameIdx=0, MMCO-3
    // assigns B to index 0). With max 2 refs and one long-term slot
    // used, the short window keeps only C — A is gone — yet D can still
    // reach B through the long-term list modification (idc 2).
    val abc = Seq(idr, pSkip(1, 1, 2, weight = Some(32)),
      pSkip(2, 0, 2, listMod = Some(1), mmco = Seq(Seq(4, 1), Seq(3, 0, 0))))
    assert(lumas(stream(abc :+ pSkip(3, 0, 2, listModLt = Some(0)): _*))
      .contains(Vector(128, 64, 128, 64)),
      "long-term B must stay reachable after the window evicts A")
    // default list heads at the short-term C (128), long-term last
    assert(lumas(stream(abc :+ pSkip(3, 0, 2): _*))
      .contains(Vector(128, 64, 128, 128)))
    // MMCO-2 unmarks the long-term picture: selecting it afterwards
    // quarantines; without the unmark the same selection decodes
    val d = pSkip(3, 0, 2, mmco = Seq(Seq(2, 0)))
    val e = pSkip(4, 0, 2, listModLt = Some(0))
    assert(lumas(stream(abc ++ Seq(d, e): _*)).isEmpty,
      "MMCO-2 must make the long-term picture unreachable")
    val dKeep = pSkip(3, 0, 2)
    assert(lumas(stream(abc ++ Seq(dKeep, e): _*)).contains(Vector(128, 64, 128, 128, 64)))
    // MMCO-4 truncation: shrinking MaxLongTermFrameIdx below an
    // assigned index drops that picture too
    val dTrunc = pSkip(3, 0, 2, mmco = Seq(Seq(4, 0)))
    assert(lumas(stream(abc ++ Seq(dTrunc, e): _*)).isEmpty,
      "MMCO-4 truncation must drop long-term pictures above the new max")
  }

  test("long-term references: MMCO-6 stores the current picture; IDR long_term_reference_flag") {
    import RefStream._
    // C copies A and stores ITSELF long-term (MMCO-6 after MMCO-4):
    // the default list heads at short-term B (64) while idc-2 reaches
    // the long-term C (128)
    val abc6 = Seq(idr, pSkip(1, 1, 2, weight = Some(32)),
      pSkip(2, 0, 2, listMod = Some(1), mmco = Seq(Seq(4, 1), Seq(6, 0))))
    assert(lumas(stream(abc6 :+ pSkip(3, 0, 2): _*))
      .contains(Vector(128, 64, 128, 64)),
      "after MMCO-6 the newest SHORT-term picture is B")
    assert(lumas(stream(abc6 :+ pSkip(3, 0, 2, listModLt = Some(0)): _*))
      .contains(Vector(128, 64, 128, 128)),
      "idc-2 must reach the MMCO-6 picture")
    // an IDR stored long-term (long_term_reference_flag=1) survives
    // the whole GOP's sliding window
    val ltIdr = Seq(idrSlice(longTerm = true),
      pSkip(1, 1, 2, weight = Some(32)), // B = 64 (predicts the long A)
      pSkip(2, 0, 2)) // C = copy of B
    assert(lumas(stream(ltIdr :+ pSkip(3, 0, 2, listModLt = Some(0)): _*))
      .contains(Vector(128, 64, 64, 128)),
      "the long-term IDR must stay reachable")
    // the twin with a plain IDR: after B and C the window (2 refs) has
    // evicted nothing long-term — idc 2 must quarantine
    val plainIdr = Seq(idr,
      pSkip(1, 1, 2, weight = Some(32)), pSkip(2, 0, 2))
    assert(lumas(stream(plainIdr :+ pSkip(3, 0, 2, listModLt = Some(0)): _*)).isEmpty,
      "no long-term picture: idc-2 selection must quarantine")
  }

  test("CbpInter table (9-4 inter column) is a permutation of 0..47") {
    assert(H264Codec.CbpInter.sorted.toSeq == (0 until 48))
    // golden spot values from the standard's table
    assert(H264Codec.CbpInter(0) == 0 && H264Codec.CbpInter(1) == 16 &&
      H264Codec.CbpInter(12) == 47 && H264Codec.CbpInter(47) == 41)
  }

  test("hostile inputs quarantine to None, never throw or partial-decode") {
    val good = encodeYuv(frame(32, 32, 9), qp = 28).annexB
    assert(decodeYuv(Array.emptyByteArray).isEmpty)
    assert(decodeYuv(Array.fill[Byte](64)(0x42)).isEmpty)
    assert(decodeYuv(good.dropRight(good.length / 2)).isEmpty, "truncated stream")
    // flip bits through the stream: every corruption either still decodes
    // to a full frame or quarantines — no exception may escape
    var survived = 0
    for (pos <- good.indices by 7) {
      val bad = good.clone(); bad(pos) = (bad(pos) ^ 0x24).toByte
      decodeYuv(bad) match {
        case Some(f) =>
          assert(f.width == 32 && f.height == 32); survived += 1
        case None => ()
      }
    }
    assert(survived < good.length, "sanity") // some corruption must matter
  }
}
