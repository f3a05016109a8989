package graft.multimodal

import scala.util.control.NonFatal

/** Pure-JVM H.264/AVC codec (ITU-T H.264, constrained baseline
  * subset): CAVLC entropy coding, 4:2:0 8-bit, I and P slices — the
  * decoder handles I_PCM, I_4x4 (all nine prediction modes), I_16x16
  * (all four modes, including Plane), and since r7 the full P-slice
  * inter layer: P_Skip with the 8.4.1.1 skip-vector rule, all
  * partition shapes (16x16/16x8/8x16 and 8x8 with 8x8/8x4/4x8/4x4
  * sub-partitions), median MV prediction with the 16x8/8x16
  * directional shortcuts (8.4.1.3), multi-reference lists in default
  * decode-recency order, quarter-pel luma (6-tap half + averaged
  * quarters) and eighth-pel bilinear chroma interpolation (8.4.2.2),
  * and intra MBs inside P slices. The encoder emits real compressed
  * IDR frames (prediction → integer transform → quantization → CAVLC),
  * an I_PCM path whose bitstream is hand-verifiable byte by byte, and
  * — via [[encodeSequence]] — real P frames: SAD+lambda·bits motion
  * search over every partition shape with exact mvp chaining, P_Skip
  * emission when the residual quantizes away, and an intra fallback.
  *
  * Like [[JpegCodec]] (r6), this closes a documented capability
  * boundary with an original implementation written from the public
  * standard: reference utxo-to-parquet has no media code at all
  * (/root/reference is 288 lines of Rust ETL). Keyframe pixels closed
  * the first half of the video boundary; the P-slice layer closes the
  * inter half — a VLM pipeline that samples beyond sync points needs
  * every frame of the GOP, not just the IDRs.
  *
  * Correctness contract: the encoder reconstructs every macroblock
  * through the *decoder's own* integer pipeline (shared prediction /
  * MC interpolation / dequant / inverse-transform code), so
  * `decodeYuv(encodeYuv(x))` — and per-frame
  * `decodeYuvFrames(encodeSequence(xs).annexB)` — must equal the
  * encoder's reconstruction BIT-EXACTLY; that equality, over QPs,
  * geometries, prediction modes and motion shapes, is the spec's
  * oracle. Conformance caveat, stated honestly: this container has no
  * reference H.264 decoder (no ffmpeg, no JDK codec — unlike JPEG's
  * two-way ImageIO interop), so the VLC tables transcribed from the
  * standard (coeff_token Table 9-5, total_zeros 9-7/9-9a, run_before
  * 9-10, the CBP mappings of Table 9-4) are pinned by structural
  * checks (prefix-freeness, domain coverage, permutation) and
  * exhaustive encode↔decode round-trips rather than by an external
  * codec; the quarter-pel interpolator is additionally pinned against
  * an independent literal transcription of 8.4.2.2.1 in the spec.
  * The fully hand-checkable surfaces — Exp-Golomb, emulation
  * prevention, SPS/PPS/slice-header syntax, I_PCM — have byte-level
  * golden tests.
  *
  * Also in the subset since the inter layer: the full in-loop
  * deblocking filter (8.7 — idc 0/2 streams with alpha/beta offsets,
  * thresholds from Tables 8-16/8-17, boundary strengths from the
  * motion grid, shared by encoder reconstruction via
  * `encodeSequence(deblock = true)`), and explicit weighted
  * prediction for P slices (pred_weight_table parse + 8.4.2.3
  * application; the encoder detects fades x264-weightp-style and
  * emits real luma weights via `encodeSequence(weighted = true)`).
  *
  * Multi-slice pictures are in the subset: consecutive slice NALs in
  * raster MB order assemble one picture (constrained baseline forbids
  * FMO/ASO), with slice-boundary availability enforced everywhere the
  * standard does (intra prediction and its mode contexts, CAVLC nC,
  * MV prediction, the P_Skip rule) and per-slice deblocking
  * parameters (idc 2 leaves cross-slice edges unfiltered). The
  * encoder emits them via `encodeSequence(slices = k)`. So is the
  * FULL reference-management layer: multiple SPS/PPS ids in one
  * stream, default list-0 ordering (short-term by PicNum with
  * frame_num wrap, then long-term by index), all of
  * `ref_pic_list_modification` (idc 0/1/2), every MMCO op (1..6:
  * short/long unmark, short-to-long assignment, MaxLongTermFrameIdx
  * truncation, unmark-all with the frame_num-0 rule,
  * current-to-long) and the IDR long_term_reference_flag — each
  * pinned by hand-built streams whose all-skip P slices make the
  * selected reference directly visible in the pixels. The decoder
  * therefore handles any conformant CONSTRAINED BASELINE stream.
  *
  * Deliberately out of scope (documented boundary, quarantined to
  * None, never mis-decoded): CABAC (entropy_coding_mode_flag = 1),
  * B/SP/SI slices (and with them weighted bi-prediction),
  * fields/MBAFF, redundant slices, and high-profile 8x8 transforms
  * and scaling lists.
  */
object H264Codec {

  /** Planar 4:2:0 frame: full-res luma, half-res (ceil) chroma. */
  final case class Yuv420(width: Int, height: Int,
      y: Array[Byte], cb: Array[Byte], cr: Array[Byte]) {
    def chromaW: Int = (width + 1) / 2
    def chromaH: Int = (height + 1) / 2
  }

  // ---------------------------------------------------------------
  // Bit I/O over RBSP bytes
  // ---------------------------------------------------------------

  private final class BitReader(val b: Array[Byte]) {
    var pos = 0 // bit position
    def bitsLeft: Int = b.length * 8 - pos
    def u1(): Int = {
      if (pos >= b.length * 8) throw new IllegalStateException("eof")
      val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    /** ue(v): Exp-Golomb. Bounded at 31 leading zeros — longer is a
      * corrupt stream, not a plausible syntax element here.
      */
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        if (zeros > 31) throw new IllegalStateException("ue overflow")
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAlign(): Unit = while ((pos & 7) != 0) pos += 1
    /** more_rbsp_data(): true while bits beyond the final stop-bit
      * pattern remain.
      */
    def moreRbsp(): Boolean = {
      if (bitsLeft <= 0) return false
      // find last set bit in the stream = rbsp_stop_one_bit
      var last = b.length * 8 - 1
      while (last >= 0 && ((b(last >> 3) >> (7 - (last & 7))) & 1) == 0) last -= 1
      pos < last
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var cur = 0
    private var nbits = 0
    def put(bit: Int): Unit = {
      cur = (cur << 1) | (bit & 1)
      nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { put((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      require(v >= 0, s"ue($v)")
      val code = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(code)
      putBits(0, len - 1)
      putBits(code, len)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAligned: Boolean = nbits == 0
    def align(): Unit = while (nbits != 0) put(0)
    /** rbsp_trailing_bits: stop bit + zero-pad to byte. */
    def trailing(): Unit = { put(1); align() }
    def bytes: Array[Byte] = { require(nbits == 0, "unaligned"); out.toByteArray }
  }

  /** RBSP → EBSP: insert emulation_prevention_three_byte before any
    * would-be 0x000000/01/02/03 sequence.
    */
  private def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val v = rbsp(i) & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** EBSP → RBSP: drop 0x03 after 0x0000 when it guards a byte ≤ 3. */
  private def unescapeRbsp(ebsp: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(to - from)
    var zeros = 0
    var i = from
    while (i < to) {
      val v = ebsp(i) & 0xff
      if (zeros >= 2 && v == 3 && i + 1 < to && (ebsp(i + 1) & 0xff) <= 3) {
        zeros = 0 // emulation prevention byte: skip
      } else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Parameter sets
  // ---------------------------------------------------------------

  /** The SPS fields this profile subset needs (parsed fields beyond
    * the subset are validated and then ignored).
    */
  final case class Sps(
      profileIdc: Int, levelIdc: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      mbWidth: Int, mbHeight: Int,
      cropLeft: Int, cropRight: Int, cropTop: Int, cropBottom: Int,
      deltaPocAlwaysZero: Boolean = false, maxNumRefFrames: Int = 1,
      id: Int = 0) {
    def width: Int = mbWidth * 16 - 2 * (cropLeft + cropRight)
    def height: Int = mbHeight * 16 - 2 * (cropTop + cropBottom)
  }

  final case class Pps(
      entropyCabac: Boolean, picInitQp: Int, chromaQpOffset: Int,
      deblockingControlPresent: Boolean, constrainedIntra: Boolean,
      bottomFieldPoc: Boolean, numRefIdxL0: Int = 1,
      weightedPred: Boolean = false, id: Int = 0, spsId: Int = 0)

  private def parseSps(r: BitReader): Sps = {
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    val spsId = r.ue()
    require(spsId <= 31, "sps_id")
    require(profile != 100 && profile != 110 && profile != 122 && profile != 244 &&
      profile != 44 && profile != 83 && profile != 86 && profile != 118 && profile != 128,
      s"high profile $profile (chroma_format/scaling lists) unsupported")
    val log2MaxFrameNum = r.ue() + 4
    require(log2MaxFrameNum <= 16, "log2_max_frame_num")
    val pocType = r.ue()
    var log2MaxPocLsb = 0
    var deltaPocAlwaysZero = false
    if (pocType == 0) log2MaxPocLsb = r.ue() + 4
    else if (pocType == 1) {
      deltaPocAlwaysZero = r.u1() == 1
      r.se(); r.se()
      val n = r.ue()
      var i = 0
      while (i < n) { r.se(); i += 1 }
    }
    val maxNumRefFrames = r.ue()
    r.u1() // gaps_in_frame_num_value_allowed
    val mbW = r.ue() + 1
    val mbH = r.ue() + 1
    val frameMbsOnly = r.u1()
    require(frameMbsOnly == 1, "interlace (fields/MBAFF) unsupported")
    r.u1() // direct_8x8_inference
    var (cl, cr2, ct, cb) = (0, 0, 0, 0)
    if (r.u1() == 1) { cl = r.ue(); cr2 = r.ue(); ct = r.ue(); cb = r.ue() }
    // vui_parameters ignored (we stop parsing here; callers never read
    // past the fields above)
    val sps = Sps(profile, level, log2MaxFrameNum, pocType, log2MaxPocLsb,
      mbW, mbH, cl, cr2, ct, cb, deltaPocAlwaysZero,
      math.max(1, math.min(16, maxNumRefFrames)), spsId)
    require(sps.width > 0 && sps.height > 0, "cropping exceeds frame")
    require(mbW * mbH <= (1 << 18), "frame too large") // hostile-count guard
    sps
  }

  private def writeSps(w: BitWriter, mbW: Int, mbH: Int,
      cropRight: Int, cropBottom: Int, numRefFrames: Int = 0): Unit = {
    w.putBits(66, 8) // baseline
    w.putBits(0xc0, 8) // constraint_set0/1, reserved zero
    w.putBits(30, 8) // level 3.0
    w.ue(0) // sps_id
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(2) // pic_order_cnt_type 2: no POC syntax in slice headers
    w.ue(numRefFrames) // max_num_ref_frames
    w.put(0) // gaps_in_frame_num_value_allowed
    w.ue(mbW - 1)
    w.ue(mbH - 1)
    w.put(1) // frame_mbs_only
    w.put(1) // direct_8x8_inference
    if (cropRight > 0 || cropBottom > 0) {
      w.put(1)
      w.ue(0); w.ue(cropRight); w.ue(0); w.ue(cropBottom)
    } else w.put(0)
    w.put(0) // vui_parameters_present
    w.trailing()
  }

  private def parsePps(r: BitReader): Pps = {
    val ppsId = r.ue()
    val spsId = r.ue()
    require(ppsId <= 255 && spsId <= 31, "parameter-set id")
    val cabac = r.u1() == 1
    val bottomFieldPoc = r.u1() == 1 // adds POC syntax to slice headers
    require(r.ue() == 0, "slice groups (FMO) unsupported")
    val numRefL0 = r.ue() + 1 // num_ref_idx_l0_active_minus1
    r.ue() // num_ref_idx_l1_active_minus1
    val wp = r.u1() == 1 // weighted_pred
    r.u(2) // weighted_bipred_idc
    val qp = r.se() + 26
    r.se() // pic_init_qs
    val cqo = r.se()
    val dbc = r.u1() == 1
    val cip = r.u1() == 1
    // a set flag would put redundant_pic_cnt in every slice header
    // (excluded from constrained baseline): quarantine, never desync
    require(r.u1() == 0, "redundant slices unsupported")
    require(qp >= 0 && qp <= 51, "pic_init_qp")
    require(cqo >= -12 && cqo <= 12, "chroma_qp_index_offset")
    require(numRefL0 <= 16, "num_ref_idx_l0_active")
    Pps(cabac, qp, cqo, dbc, cip, bottomFieldPoc, numRefL0, wp, ppsId, spsId)
  }

  private def writePps(w: BitWriter, qp: Int,
      weightedPred: Boolean = false): Unit = {
    w.ue(0); w.ue(0) // pps_id, sps_id
    w.put(0) // CAVLC
    w.put(0) // bottom_field_pic_order_in_frame_present
    w.ue(0) // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_active
    w.put(if (weightedPred) 1 else 0) // weighted_pred
    w.putBits(0, 2) // weighted_bipred_idc
    w.se(qp - 26) // pic_init_qp_minus26
    w.se(0) // pic_init_qs_minus26
    w.se(0) // chroma_qp_index_offset
    w.put(1) // deblocking_filter_control_present
    w.put(0) // constrained_intra_pred
    w.put(0) // redundant_pic_cnt_present
    w.trailing()
  }

  // ---------------------------------------------------------------
  // Static tables (transcribed from the standard; see object doc for
  // the validation story)
  // ---------------------------------------------------------------

  /** 4x4 zigzag scan: scan index → raster position. */
  private[multimodal] val Zig4 = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Quant position class: 0 for (even,even), 1 for (odd,odd), 2 mixed. */
  private val PosClass = Array.tabulate(16) { p =>
    val (x, y) = (p & 3, p >> 2)
    if (x % 2 == 0 && y % 2 == 0) 0 else if (x % 2 == 1 && y % 2 == 1) 1 else 2
  }
  /** Encoder multipliers MF(QP%6)(class) and decoder scales V(QP%6)(class). */
  private val MF = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490), Array(10082, 4194, 6554),
    Array(9362, 3647, 5825), Array(8192, 3355, 5243), Array(7282, 2893, 4559))
  private val VS = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  /** QPc from clipped qPI (Table 8-15): identity below 30. */
  private val ChromaQp = Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
    36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
  private def chromaQp(qpY: Int, offset: Int): Int = {
    val q = math.max(0, math.min(51, qpY + offset))
    if (q < 30) q else ChromaQp(q - 30)
  }

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Deblocking thresholds alpha/beta by index (Table 8-16) and the
    * clipping values t'C0 by (indexA, bS-1) (Table 8-17) — all zero
    * below index 16, so low-QP smooth content passes untouched.
    */
  private[multimodal] val AlphaTab: Array[Int] =
    Array.fill(16)(0) ++ Array(4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17,
      20, 22, 25, 28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
      127, 144, 162, 182, 203, 226, 255, 255)
  private[multimodal] val BetaTab: Array[Int] =
    Array.fill(16)(0) ++ Array(2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7,
      8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
      17, 17, 18, 18)
  private[multimodal] val Tc0Tab: Array[Array[Int]] =
    Array.fill(16)(Array(0, 0, 0)) ++ Array(
      Array(0, 0, 0), Array(0, 0, 1), Array(0, 0, 1), Array(0, 0, 1),
      Array(0, 0, 1), Array(0, 1, 1), Array(0, 1, 1), Array(1, 1, 1),
      Array(1, 1, 1), Array(1, 1, 1), Array(1, 1, 1), Array(1, 1, 2),
      Array(1, 1, 2), Array(1, 1, 2), Array(1, 1, 2), Array(1, 2, 3),
      Array(1, 2, 3), Array(2, 2, 3), Array(2, 2, 4), Array(2, 3, 4),
      Array(2, 3, 4), Array(3, 3, 5), Array(3, 4, 6), Array(3, 4, 6),
      Array(4, 5, 7), Array(4, 5, 8), Array(5, 6, 9), Array(6, 7, 10),
      Array(6, 8, 11), Array(7, 9, 13), Array(8, 10, 14), Array(9, 12, 16),
      Array(10, 13, 18), Array(11, 15, 20), Array(13, 17, 23), Array(14, 19, 25))

  /** coded_block_pattern me(v) mapping for intra MBs (Table 9-4):
    * codeNum → cbp. Structural pin: a permutation of 0..47.
    */
  private[multimodal] val CbpIntra = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private val CbpIntraInv: Array[Int] = {
    val inv = new Array[Int](48)
    var i = 0
    while (i < 48) { inv(CbpIntra(i)) = i; i += 1 }
    inv
  }

  /** coded_block_pattern me(v) mapping for inter MBs (Table 9-4, the
    * Inter column): codeNum → cbp. Structural pin: a permutation of
    * 0..47, like [[CbpIntra]].
    */
  private[multimodal] val CbpInter = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
  private val CbpInterInv: Array[Int] = {
    val inv = new Array[Int](48)
    var i = 0
    while (i < 48) { inv(CbpInter(i)) = i; i += 1 }
    inv
  }

  /** A VLC table: parallel arrays of (code value, code length, symbol).
    * Decode = longest-match peek (the tables are prefix-free, pinned
    * by spec); encode = direct lookup by symbol.
    */
  private[multimodal] final class Vlc(entries: Seq[(String, Int)]) {
    val codes: Array[Int] = entries.map(e => Integer.parseInt(e._1, 2)).toArray
    val lens: Array[Int] = entries.map(_._1.length).toArray
    val syms: Array[Int] = entries.map(_._2).toArray
    private val bySym = syms.zipWithIndex.toMap
    // decode index: per accumulated length, code → symbol+1 (0 = no
    // code of that length) — one map probe per peeked bit instead of a
    // scan of the whole table inside the residual hot loop
    private val byLen: Array[scala.collection.immutable.IntMap[Int]] = {
      val maps = Array.fill(lens.max + 1)(scala.collection.immutable.IntMap.empty[Int])
      var i = 0
      while (i < codes.length) {
        maps(lens(i)) = maps(lens(i)).updated(codes(i), syms(i) + 1)
        i += 1
      }
      maps
    }
    def write(w: BitWriter, sym: Int): Unit = {
      val i = bySym(sym)
      w.putBits(codes(i), lens(i))
    }
    def read(r: BitReader): Int = {
      var acc = 0
      var len = 0
      while (len < byLen.length - 1) {
        acc = (acc << 1) | r.u1()
        len += 1
        val s = byLen(len).getOrElse(acc, 0)
        if (s != 0) return s - 1
      }
      throw new IllegalStateException("vlc: no code")
    }
  }

  /** coeff_token: symbol = TotalCoeff * 4 + TrailingOnes. Four
    * context tables by nC plus the chroma-DC table (Table 9-5).
    */
  private def ct(entries: (String, (Int, Int))*): Vlc =
    new Vlc(entries.map { case (c, (t1, tc)) => (c, tc * 4 + t1) })

  private[multimodal] val CoeffTokenNc0: Vlc = ct(
    "1" -> (0, 0),
    "000101" -> (0, 1), "01" -> (1, 1),
    "00000111" -> (0, 2), "000100" -> (1, 2), "001" -> (2, 2),
    "000000111" -> (0, 3), "00000110" -> (1, 3), "0000101" -> (2, 3), "00011" -> (3, 3),
    "0000000111" -> (0, 4), "000000110" -> (1, 4), "00000101" -> (2, 4), "000011" -> (3, 4),
    "00000000111" -> (0, 5), "0000000110" -> (1, 5), "000000101" -> (2, 5), "0000100" -> (3, 5),
    "0000000001111" -> (0, 6), "00000000110" -> (1, 6), "0000000101" -> (2, 6), "00000100" -> (3, 6),
    "0000000001011" -> (0, 7), "0000000001110" -> (1, 7), "00000000101" -> (2, 7), "000000100" -> (3, 7),
    "0000000001000" -> (0, 8), "0000000001010" -> (1, 8), "0000000001101" -> (2, 8), "0000000100" -> (3, 8),
    "00000000001111" -> (0, 9), "00000000001110" -> (1, 9), "0000000001001" -> (2, 9), "00000000100" -> (3, 9),
    "00000000001011" -> (0, 10), "00000000001010" -> (1, 10), "00000000001101" -> (2, 10), "0000000001100" -> (3, 10),
    "000000000001111" -> (0, 11), "000000000001110" -> (1, 11), "00000000001001" -> (2, 11), "00000000001100" -> (3, 11),
    "000000000001011" -> (0, 12), "000000000001010" -> (1, 12), "000000000001101" -> (2, 12), "00000000001000" -> (3, 12),
    "0000000000001111" -> (0, 13), "000000000000001" -> (1, 13), "000000000001001" -> (2, 13), "000000000001100" -> (3, 13),
    "0000000000001011" -> (0, 14), "0000000000001110" -> (1, 14), "0000000000001101" -> (2, 14), "000000000001000" -> (3, 14),
    "0000000000000111" -> (0, 15), "0000000000001010" -> (1, 15), "0000000000001001" -> (2, 15), "0000000000001100" -> (3, 15),
    "0000000000000100" -> (0, 16), "0000000000000110" -> (1, 16), "0000000000000101" -> (2, 16), "0000000000001000" -> (3, 16))

  private[multimodal] val CoeffTokenNc2: Vlc = ct(
    "11" -> (0, 0),
    "001011" -> (0, 1), "10" -> (1, 1),
    "000111" -> (0, 2), "00111" -> (1, 2), "011" -> (2, 2),
    "0000111" -> (0, 3), "001010" -> (1, 3), "001001" -> (2, 3), "0101" -> (3, 3),
    "00000111" -> (0, 4), "000110" -> (1, 4), "000101" -> (2, 4), "0100" -> (3, 4),
    "00000100" -> (0, 5), "0000110" -> (1, 5), "0000101" -> (2, 5), "00110" -> (3, 5),
    "000000111" -> (0, 6), "00000110" -> (1, 6), "00000101" -> (2, 6), "001000" -> (3, 6),
    "00000001111" -> (0, 7), "000000110" -> (1, 7), "000000101" -> (2, 7), "000100" -> (3, 7),
    "00000001011" -> (0, 8), "00000001110" -> (1, 8), "00000001101" -> (2, 8), "0000100" -> (3, 8),
    "000000001111" -> (0, 9), "00000001010" -> (1, 9), "00000001001" -> (2, 9), "000000100" -> (3, 9),
    "000000001011" -> (0, 10), "000000001110" -> (1, 10), "000000001101" -> (2, 10), "00000001100" -> (3, 10),
    "000000001000" -> (0, 11), "000000001010" -> (1, 11), "000000001001" -> (2, 11), "00000001000" -> (3, 11),
    "0000000001111" -> (0, 12), "0000000001110" -> (1, 12), "0000000001101" -> (2, 12), "000000001100" -> (3, 12),
    "0000000001011" -> (0, 13), "0000000001010" -> (1, 13), "0000000001001" -> (2, 13), "0000000001100" -> (3, 13),
    "0000000000111" -> (0, 14), "00000000001011" -> (1, 14), "0000000000110" -> (2, 14), "0000000001000" -> (3, 14),
    "00000000001001" -> (0, 15), "00000000001000" -> (1, 15), "00000000001010" -> (2, 15), "0000000000001" -> (3, 15),
    "00000000000111" -> (0, 16), "00000000000110" -> (1, 16), "00000000000101" -> (2, 16), "00000000000100" -> (3, 16))

  private[multimodal] val CoeffTokenNc4: Vlc = ct(
    "1111" -> (0, 0),
    "001111" -> (0, 1), "1110" -> (1, 1),
    "001011" -> (0, 2), "01111" -> (1, 2), "1101" -> (2, 2),
    "001000" -> (0, 3), "01100" -> (1, 3), "01110" -> (2, 3), "1100" -> (3, 3),
    "0001111" -> (0, 4), "01010" -> (1, 4), "01011" -> (2, 4), "1011" -> (3, 4),
    "0001011" -> (0, 5), "01000" -> (1, 5), "01001" -> (2, 5), "1010" -> (3, 5),
    "0001001" -> (0, 6), "001110" -> (1, 6), "001101" -> (2, 6), "1001" -> (3, 6),
    "0001000" -> (0, 7), "001010" -> (1, 7), "001001" -> (2, 7), "1000" -> (3, 7),
    "00001111" -> (0, 8), "0001110" -> (1, 8), "0001101" -> (2, 8), "01101" -> (3, 8),
    "00001011" -> (0, 9), "00001110" -> (1, 9), "0001010" -> (2, 9), "001100" -> (3, 9),
    "000001111" -> (0, 10), "00001010" -> (1, 10), "00001101" -> (2, 10), "0001100" -> (3, 10),
    "000001011" -> (0, 11), "000001110" -> (1, 11), "00001001" -> (2, 11), "00001100" -> (3, 11),
    "000001000" -> (0, 12), "000001010" -> (1, 12), "000001101" -> (2, 12), "00001000" -> (3, 12),
    "0000001101" -> (0, 13), "000000111" -> (1, 13), "000001001" -> (2, 13), "000001100" -> (3, 13),
    "0000001001" -> (0, 14), "0000001100" -> (1, 14), "0000001011" -> (2, 14), "0000001010" -> (3, 14),
    "0000000101" -> (0, 15), "0000001000" -> (1, 15), "0000000111" -> (2, 15), "0000000110" -> (3, 15),
    "0000000001" -> (0, 16), "0000000100" -> (1, 16), "0000000011" -> (2, 16), "0000000010" -> (3, 16))

  private[multimodal] val CoeffTokenChromaDc: Vlc = ct(
    "01" -> (0, 0),
    "000111" -> (0, 1), "1" -> (1, 1),
    "000100" -> (0, 2), "000110" -> (1, 2), "001" -> (2, 2),
    "000011" -> (0, 3), "0000011" -> (1, 3), "0000010" -> (2, 3), "000101" -> (3, 3),
    "000010" -> (0, 4), "00000011" -> (1, 4), "00000010" -> (2, 4), "0000000" -> (3, 4))

  /** total_zeros for 4x4 blocks (Tables 9-7/9-8), indexed by
    * TotalCoeff 1..15; symbol = total_zeros.
    */
  private def tz(codes: String*): Vlc = new Vlc(codes.zipWithIndex)
  private[multimodal] val TotalZeros4x4: Array[Vlc] = Array(
    null, // TotalCoeff 0 never reads total_zeros
    tz("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
      "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
      "000000010", "000000001"),
    tz("111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
      "00011", "00010", "000011", "000010", "000001", "000000"),
    tz("0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
      "00011", "00010", "000001", "00001", "000000"),
    tz("00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
      "0010", "00010", "00001", "00000"),
    tz("0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
      "00001", "0001", "00000"),
    tz("000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
      "001", "000000"),
    tz("000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
      "000000"),
    tz("000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"),
    tz("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
    tz("00001", "00000", "001", "11", "10", "01", "0001"),
    tz("0000", "0001", "001", "010", "1", "011"),
    tz("0000", "0001", "01", "1", "001"),
    tz("000", "001", "1", "01"),
    tz("00", "01", "1"),
    tz("0", "1"))

  /** total_zeros for chroma DC 2x2 (Table 9-9a), TotalCoeff 1..3. */
  private[multimodal] val TotalZerosChromaDc: Array[Vlc] = Array(
    null,
    tz("1", "01", "001", "000"),
    tz("1", "01", "00"),
    tz("1", "0"))

  /** run_before (Table 9-10), indexed by min(zerosLeft, 7); symbol = run. */
  private[multimodal] val RunBefore: Array[Vlc] = Array(
    null,
    tz("1", "0"),
    tz("1", "01", "00"),
    tz("11", "10", "01", "00"),
    tz("11", "10", "01", "001", "000"),
    tz("11", "10", "011", "010", "001", "000"),
    tz("11", "000", "001", "011", "010", "101", "100"),
    tz("111", "110", "101", "100", "011", "010", "001", "0001", "00001",
      "000001", "0000001", "00000001", "000000001", "0000000001",
      "00000000001"))

  // ---------------------------------------------------------------
  // Transforms & (de)quantization — 8.5; encoder and decoder share
  // the inverse path so reconstruction is identical by construction
  // ---------------------------------------------------------------

  /** Forward 4x4 core transform, in place (raster order). */
  private def fdct4(b: Array[Int]): Unit = {
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val s0 = b(o) + b(o + 3); val s1 = b(o + 1) + b(o + 2)
      val d0 = b(o) - b(o + 3); val d1 = b(o + 1) - b(o + 2)
      b(o) = s0 + s1; b(o + 2) = s0 - s1
      b(o + 1) = 2 * d0 + d1; b(o + 3) = d0 - 2 * d1
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val s0 = b(i) + b(i + 12); val s1 = b(i + 4) + b(i + 8)
      val d0 = b(i) - b(i + 12); val d1 = b(i + 4) - b(i + 8)
      b(i) = s0 + s1; b(i + 8) = s0 - s1
      b(i + 4) = 2 * d0 + d1; b(i + 12) = d0 - 2 * d1
      i += 1
    }
  }

  /** Inverse 4x4 core transform with the final (x+32)>>6, in place. */
  private def idct4(b: Array[Int]): Unit = {
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val e0 = b(o) + b(o + 2); val e1 = b(o) - b(o + 2)
      val e2 = (b(o + 1) >> 1) - b(o + 3); val e3 = b(o + 1) + (b(o + 3) >> 1)
      b(o) = e0 + e3; b(o + 1) = e1 + e2; b(o + 2) = e1 - e2; b(o + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val e0 = b(i) + b(i + 8); val e1 = b(i) - b(i + 8)
      val e2 = (b(i + 4) >> 1) - b(i + 12); val e3 = b(i + 4) + (b(i + 12) >> 1)
      b(i) = (e0 + e3 + 32) >> 6; b(i + 4) = (e1 + e2 + 32) >> 6
      b(i + 8) = (e1 - e2 + 32) >> 6; b(i + 12) = (e0 - e3 + 32) >> 6
      i += 1
    }
  }

  /** 4x4 Hadamard (same matrix both directions), in place, no scaling. */
  private def hadamard4(b: Array[Int]): Unit = {
    var i = 0
    while (i < 4) {
      val o = i * 4
      val s0 = b(o) + b(o + 3); val s1 = b(o + 1) + b(o + 2)
      val d0 = b(o) - b(o + 3); val d1 = b(o + 1) - b(o + 2)
      b(o) = s0 + s1; b(o + 1) = d0 + d1; b(o + 2) = s0 - s1; b(o + 3) = d0 - d1
      i += 1
    }
    i = 0
    while (i < 4) {
      val s0 = b(i) + b(i + 12); val s1 = b(i + 4) + b(i + 8)
      val d0 = b(i) - b(i + 12); val d1 = b(i + 4) - b(i + 8)
      b(i) = s0 + s1; b(i + 4) = d0 + d1; b(i + 8) = s0 - s1; b(i + 12) = d0 - d1
      i += 1
    }
  }

  /** 2x2 Hadamard for chroma DC (same both directions). */
  private def hadamard2(b: Array[Int]): Unit = {
    val a = b(0); val c = b(1); val d = b(2); val e = b(3)
    b(0) = a + c + d + e; b(1) = a - c + d - e
    b(2) = a + c - d - e; b(3) = a - c - d - e
  }

  /** Quantize one AC/full coefficient at raster position `pos`. */
  private def quant(w: Int, pos: Int, qp: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3 // intra rounding
    val mf = MF(qp % 6)(PosClass(pos))
    val lv = ((math.abs(w).toLong * mf + f) >> qbits).toInt
    if (w < 0) -lv else lv
  }

  /** Dequantize one AC/full coefficient at raster position `pos`. */
  private def dequant(c: Int, pos: Int, qp: Int): Int =
    c * VS(qp % 6)(PosClass(pos)) << (qp / 6)

  /** Quantize a DC-transform coefficient (luma 4x4 or chroma 2x2 DC). */
  private def quantDc(w: Int, qp: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val lv = ((math.abs(w).toLong * MF(qp % 6)(0) + 2L * f) >> (qbits + 1)).toInt
    if (w < 0) -lv else lv
  }

  /** Scale an inverse-Hadamard'd luma DC value (8.5.10). */
  private def dequantLumaDc(g: Int, qp: Int): Int =
    if (qp >= 12) (g * VS(qp % 6)(0)) << (qp / 6 - 2)
    else (g * VS(qp % 6)(0) + (1 << (1 - qp / 6))) >> (2 - qp / 6)

  /** Scale an inverse-Hadamard'd chroma DC value (8.5.11, 4:2:0). */
  private def dequantChromaDc(g: Int, qpc: Int): Int =
    ((g * VS(qpc % 6)(0)) << (qpc / 6)) >> 1

  // ---------------------------------------------------------------
  // CAVLC residual block coding — 9.2. `coeff` is in scan order
  // (zigzag applied by the caller); maxCoeff ∈ {16, 15, 4}.
  // ---------------------------------------------------------------

  private def coeffTokenTable(nC: Int): Vlc =
    if (nC == -1) CoeffTokenChromaDc
    else if (nC < 2) CoeffTokenNc0
    else if (nC < 4) CoeffTokenNc2
    else if (nC < 8) CoeffTokenNc4
    else null // FLC

  /** Decode one residual block into `coeff` (zeroed scan-order array
    * of length maxCoeff); returns TotalCoeff.
    */
  private def readResidual(r: BitReader, nC: Int, maxCoeff: Int,
      coeff: Array[Int]): Int = {
    java.util.Arrays.fill(coeff, 0)
    val tbl = coeffTokenTable(nC)
    val (totalCoeff, t1s) =
      if (tbl != null) { val s = tbl.read(r); (s >> 2, s & 3) }
      else {
        val v = r.u(6)
        if (v == 3) (0, 0) else ((v >> 2) + 1, v & 3)
      }
    if (totalCoeff == 0) return 0
    if (totalCoeff > maxCoeff) throw new IllegalStateException("TotalCoeff")
    val level = new Array[Int](totalCoeff)
    var i = 0
    while (i < t1s) { level(i) = if (r.u1() == 1) -1 else 1; i += 1 }
    var suffixLength = if (totalCoeff > 10 && t1s < 3) 1 else 0
    while (i < totalCoeff) {
      var prefix = 0
      while (r.u1() == 0) {
        prefix += 1
        if (prefix > 28) throw new IllegalStateException("level_prefix")
      }
      val suffixSize =
        if (prefix >= 15) prefix - 3
        else if (prefix == 14 && suffixLength == 0) 4
        else suffixLength
      var levelCode = math.min(15, prefix) << suffixLength
      if (suffixSize > 0) levelCode += r.u(suffixSize)
      if (prefix >= 15 && suffixLength == 0) levelCode += 15
      if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
      if (i == t1s && t1s < 3) levelCode += 2
      level(i) = if (levelCode % 2 == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    var zerosLeft =
      if (totalCoeff < maxCoeff) {
        val t = if (nC == -1) TotalZerosChromaDc(totalCoeff)
          else TotalZeros4x4(totalCoeff)
        t.read(r)
      } else 0
    val run = new Array[Int](totalCoeff)
    i = 0
    while (i < totalCoeff - 1) {
      run(i) = if (zerosLeft > 0) RunBefore(math.min(zerosLeft, 7)).read(r) else 0
      if (run(i) > zerosLeft) throw new IllegalStateException("run_before")
      zerosLeft -= run(i)
      i += 1
    }
    run(totalCoeff - 1) = zerosLeft
    var coeffNum = -1
    i = totalCoeff - 1
    while (i >= 0) {
      coeffNum += run(i) + 1
      if (coeffNum >= maxCoeff) throw new IllegalStateException("coeffNum")
      coeff(coeffNum) = level(i)
      i -= 1
    }
    totalCoeff
  }

  // ---------------------------------------------------------------
  // Intra prediction — 8.3. Shared verbatim by decoder and encoder
  // (the encoder predicts from ITS reconstruction with these same
  // functions, which is what makes round-trip equality structural).
  // ---------------------------------------------------------------

  /** z-scan rank of the 4x4 luma block at in-MB position (x,y). */
  private val ZRank: Array[Int] = {
    val order = Array((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
      (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))
    val rank = new Array[Int](16)
    order.zipWithIndex.foreach { case ((x, y), i) => rank(y * 4 + x) = i }
    rank
  }
  /** in-MB (x,y) of z-scan index 0..15. */
  private val ZPos: Array[(Int, Int)] = {
    val pos = new Array[(Int, Int)](16)
    var p = 0
    while (p < 16) { pos(ZRank(p)) = (p & 3, p >> 2); p += 1 }
    pos
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** 4x4 intra prediction, writing 16 values into `pred`. Neighbor
    * samples are read from `plane` at (px,py) relative offsets; the
    * caller guarantees the availability flags match decode order.
    * Top-right samples fall back to p[3,-1] when unavailable (8.3.1.2).
    */
  private def predict4(plane: Array[Byte], stride: Int, px: Int, py: Int,
      mode: Int, aL: Boolean, aT: Boolean, aTL: Boolean, aTR: Boolean,
      pred: Array[Int]): Unit = {
    @inline def s(x: Int, y: Int): Int = plane((py + y) * stride + (px + x)) & 0xff
    // p[x,-1] for x = 0..7 (top-right replicated when unavailable)
    val top = new Array[Int](8)
    if (aT) {
      var x = 0
      while (x < 4) { top(x) = s(x, -1); x += 1 }
      while (x < 8) { top(x) = if (aTR) s(x, -1) else top(3); x += 1 }
    }
    val left = new Array[Int](4)
    if (aL) { var y = 0; while (y < 4) { left(y) = s(-1, y); y += 1 } }
    val tl = if (aTL) s(-1, -1) else 0
    @inline def need(ok: Boolean): Unit =
      if (!ok) throw new IllegalStateException(s"intra4x4 mode $mode: samples unavailable")
    var i = 0
    mode match {
      case 0 => // Vertical
        need(aT)
        while (i < 16) { pred(i) = top(i & 3); i += 1 }
      case 1 => // Horizontal
        need(aL)
        while (i < 16) { pred(i) = left(i >> 2); i += 1 }
      case 2 => // DC
        val v =
          if (aT && aL) (top(0) + top(1) + top(2) + top(3) +
            left(0) + left(1) + left(2) + left(3) + 4) >> 3
          else if (aT) (top(0) + top(1) + top(2) + top(3) + 2) >> 2
          else if (aL) (left(0) + left(1) + left(2) + left(3) + 2) >> 2
          else 128
        while (i < 16) { pred(i) = v; i += 1 }
      case 3 => // Diagonal-Down-Left
        need(aT)
        while (i < 16) {
          val x = i & 3; val y = i >> 2
          pred(i) =
            if (x == 3 && y == 3) (top(6) + 3 * top(7) + 2) >> 2
            else (top(x + y) + 2 * top(x + y + 1) + top(x + y + 2) + 2) >> 2
          i += 1
        }
      case 4 => // Diagonal-Down-Right
        need(aT && aL && aTL)
        // index -1 on either axis is the shared corner p[-1,-1]
        @inline def atT(j: Int): Int = if (j == -1) tl else top(j)
        @inline def atL(j: Int): Int = if (j == -1) tl else left(j)
        while (i < 16) {
          val x = i & 3; val y = i >> 2
          pred(i) =
            if (x > y) (atT(x - y - 2) + 2 * atT(x - y - 1) + atT(x - y) + 2) >> 2
            else if (x < y) (atL(y - x - 2) + 2 * atL(y - x - 1) + atL(y - x) + 2) >> 2
            else (top(0) + 2 * tl + left(0) + 2) >> 2
          i += 1
        }
      case 5 => // Vertical-Right
        need(aT && aL && aTL)
        while (i < 16) {
          val x = i & 3; val y = i >> 2
          val z = 2 * x - y
          pred(i) =
            if (z >= 0 && z % 2 == 0) {
              val t = x - (y >> 1)
              ((if (t == 0) tl else top(t - 1)) + (if (t == 0) top(0) else top(t)) + 1) >> 1
            } else if (z >= 0) {
              val t = x - (y >> 1)
              @inline def at(j: Int): Int = if (j == -1) tl else top(j)
              (at(t - 2) + 2 * at(t - 1) + at(t) + 2) >> 2
            } else if (z == -1) (left(0) + 2 * tl + top(0) + 2) >> 2
            else (left(y - 2 * x - 1) + 2 * left(y - 2 * x - 2) +
              (if (y - 2 * x - 3 == -1) tl else left(y - 2 * x - 3)) + 2) >> 2
          i += 1
        }
      case 6 => // Horizontal-Down
        need(aT && aL && aTL)
        while (i < 16) {
          val x = i & 3; val y = i >> 2
          val z = 2 * y - x
          pred(i) =
            if (z >= 0 && z % 2 == 0) {
              val t = y - (x >> 1)
              ((if (t == 0) tl else left(t - 1)) + (if (t == 0) left(0) else left(t)) + 1) >> 1
            } else if (z >= 0) {
              val t = y - (x >> 1)
              @inline def at(j: Int): Int = if (j == -1) tl else left(j)
              (at(t - 2) + 2 * at(t - 1) + at(t) + 2) >> 2
            } else if (z == -1) (top(0) + 2 * tl + left(0) + 2) >> 2
            else (top(x - 2 * y - 1) + 2 * top(x - 2 * y - 2) +
              (if (x - 2 * y - 3 == -1) tl else top(x - 2 * y - 3)) + 2) >> 2
          i += 1
        }
      case 7 => // Vertical-Left
        need(aT)
        while (i < 16) {
          val x = i & 3; val y = i >> 2
          pred(i) =
            if (y % 2 == 0) (top(x + (y >> 1)) + top(x + (y >> 1) + 1) + 1) >> 1
            else (top(x + (y >> 1)) + 2 * top(x + (y >> 1) + 1) + top(x + (y >> 1) + 2) + 2) >> 2
          i += 1
        }
      case 8 => // Horizontal-Up
        need(aL)
        while (i < 16) {
          val x = i & 3; val y = i >> 2
          val z = x + 2 * y
          pred(i) =
            if (z > 5) left(3)
            else if (z == 5) (left(2) + 3 * left(3) + 2) >> 2
            else if (z % 2 == 0) (left(y + (x >> 1)) + left(y + (x >> 1) + 1) + 1) >> 1
            else (left(y + (x >> 1)) + 2 * left(y + (x >> 1) + 1) + left(y + (x >> 1) + 2) + 2) >> 2
          i += 1
        }
      case _ => throw new IllegalStateException(s"intra4x4 mode $mode")
    }
  }

  /** NxN full-block intra prediction (N = 16 luma, N = 8 chroma-style
    * plane/V/H/DC is handled separately for chroma). Writes N*N values.
    */
  private def predict16(plane: Array[Byte], stride: Int, px: Int, py: Int,
      mode: Int, aL: Boolean, aT: Boolean, pred: Array[Int]): Unit = {
    @inline def s(x: Int, y: Int): Int = plane((py + y) * stride + (px + x)) & 0xff
    @inline def need(ok: Boolean): Unit =
      if (!ok) throw new IllegalStateException(s"intra16 mode $mode: samples unavailable")
    var i = 0
    mode match {
      case 0 =>
        need(aT)
        while (i < 256) { pred(i) = s(i & 15, -1); i += 1 }
      case 1 =>
        need(aL)
        while (i < 256) { pred(i) = s(-1, i >> 4); i += 1 }
      case 2 =>
        var sum = 0
        if (aT) { var x = 0; while (x < 16) { sum += s(x, -1); x += 1 } }
        if (aL) { var y = 0; while (y < 16) { sum += s(-1, y); y += 1 } }
        val v =
          if (aT && aL) (sum + 16) >> 5
          else if (aT || aL) (sum + 8) >> 4
          else 128
        while (i < 256) { pred(i) = v; i += 1 }
      case 3 =>
        need(aT && aL)
        var hsum = 0; var vsum = 0
        var x = 1
        while (x <= 8) {
          hsum += x * (s(7 + x, -1) - s(7 - x, -1))
          vsum += x * (s(-1, 7 + x) - s(-1, 7 - x))
          x += 1
        }
        val bSlope = (5 * hsum + 32) >> 6
        val cSlope = (5 * vsum + 32) >> 6
        val a = 16 * (s(15, -1) + s(-1, 15))
        while (i < 256) {
          pred(i) = clip255((a + bSlope * ((i & 15) - 7) + cSlope * ((i >> 4) - 7) + 16) >> 5)
          i += 1
        }
      case _ => throw new IllegalStateException(s"intra16 mode $mode")
    }
  }

  /** 8x8 chroma intra prediction (8.3.4): DC is quadrant-wise. */
  private def predictChroma8(plane: Array[Byte], stride: Int, px: Int, py: Int,
      mode: Int, aL: Boolean, aT: Boolean, pred: Array[Int]): Unit = {
    @inline def s(x: Int, y: Int): Int = plane((py + y) * stride + (px + x)) & 0xff
    @inline def need(ok: Boolean): Unit =
      if (!ok) throw new IllegalStateException(s"chroma mode $mode: samples unavailable")
    var i = 0
    mode match {
      case 0 => // DC, per 4x4 quadrant
        @inline def sum4t(x0: Int): Int = s(x0, -1) + s(x0 + 1, -1) + s(x0 + 2, -1) + s(x0 + 3, -1)
        @inline def sum4l(y0: Int): Int = s(-1, y0) + s(-1, y0 + 1) + s(-1, y0 + 2) + s(-1, y0 + 3)
        val dc = new Array[Int](4) // quadrant (qx, qy) → dc(qy*2+qx)
        var q = 0
        while (q < 4) {
          val qx = q & 1; val qy = q >> 1
          dc(q) =
            if (qx == qy) { // (0,0) and (1,1): both neighbours when available
              val useT = aT; val useL = aL
              if (useT && useL) (sum4t(qx * 4) + sum4l(qy * 4) + 4) >> 3
              else if (useT) (sum4t(qx * 4) + 2) >> 2
              else if (useL) (sum4l(qy * 4) + 2) >> 2
              else 128
            } else if (qx == 1) { // (1,0): top half preferred
              if (aT) (sum4t(4) + 2) >> 2
              else if (aL) (sum4l(0) + 2) >> 2
              else 128
            } else { // (0,1): left half preferred
              if (aL) (sum4l(4) + 2) >> 2
              else if (aT) (sum4t(0) + 2) >> 2
              else 128
            }
          q += 1
        }
        while (i < 64) {
          pred(i) = dc((((i >> 3) >> 2) << 1) | ((i & 7) >> 2))
          i += 1
        }
      case 1 => // Horizontal
        need(aL)
        while (i < 64) { pred(i) = s(-1, i >> 3); i += 1 }
      case 2 => // Vertical
        need(aT)
        while (i < 64) { pred(i) = s(i & 7, -1); i += 1 }
      case 3 => // Plane
        need(aT && aL)
        var hsum = 0; var vsum = 0
        var x = 1
        while (x <= 4) {
          hsum += x * (s(3 + x, -1) - s(3 - x, -1))
          vsum += x * (s(-1, 3 + x) - s(-1, 3 - x))
          x += 1
        }
        val bSlope = (17 * hsum + 16) >> 5
        val cSlope = (17 * vsum + 16) >> 5
        val a = 16 * (s(7, -1) + s(-1, 7))
        while (i < 64) {
          pred(i) = clip255((a + bSlope * ((i & 7) - 3) + cSlope * ((i >> 3) - 3) + 16) >> 5)
          i += 1
        }
      case _ => throw new IllegalStateException(s"chroma mode $mode")
    }
  }

  /** Encode one residual block from `coeff` (scan order, length
    * maxCoeff); returns TotalCoeff (the caller records it for nC).
    */
  private def writeResidual(w: BitWriter, nC: Int, maxCoeff: Int,
      coeff: Array[Int]): Int = {
    // nonzero coefficients, highest scan position first
    var totalCoeff = 0
    var highest = -1
    var i = 0
    while (i < maxCoeff) {
      if (coeff(i) != 0) { totalCoeff += 1; highest = i }
      i += 1
    }
    val tbl = coeffTokenTable(nC)
    if (totalCoeff == 0) {
      if (tbl != null) tbl.write(w, 0) else w.putBits(3, 6)
      return 0
    }
    // trailing ones: up to 3 consecutive |1| from the highest position
    val level = new Array[Int](totalCoeff)
    var k = 0
    i = highest
    while (i >= 0) {
      if (coeff(i) != 0) { level(k) = coeff(i); k += 1 }
      i -= 1
    }
    var t1s = 0
    while (t1s < 3 && t1s < totalCoeff && math.abs(level(t1s)) == 1) t1s += 1
    if (tbl != null) tbl.write(w, totalCoeff * 4 + t1s)
    else w.putBits(((totalCoeff - 1) << 2) | t1s, 6)
    i = 0
    while (i < t1s) { w.put(if (level(i) < 0) 1 else 0); i += 1 }
    var suffixLength = if (totalCoeff > 10 && t1s < 3) 1 else 0
    i = t1s
    while (i < totalCoeff) {
      val v = level(i)
      var levelCode = if (v > 0) 2 * v - 2 else -2 * v - 1
      if (i == t1s && t1s < 3) levelCode -= 2
      // emit (prefix, suffix) matching the decoder's reconstruction
      if (suffixLength == 0 && levelCode < 14) {
        w.putBits(0, levelCode); w.put(1)
      } else if (suffixLength == 0 && levelCode < 30) {
        w.putBits(0, 14); w.put(1); w.putBits(levelCode - 14, 4)
      } else if (suffixLength > 0 && levelCode < (15 << suffixLength)) {
        val prefix = levelCode >> suffixLength
        w.putBits(0, prefix); w.put(1)
        w.putBits(levelCode & ((1 << suffixLength) - 1), suffixLength)
      } else {
        // escape: find the prefix ≥ 15 whose suffix window contains it
        var prefix = 15
        var done = false
        while (!done) {
          val size = prefix - 3
          var base = 15 << suffixLength
          if (suffixLength == 0) base += 15
          if (prefix >= 16) base += (1 << size) - 4096
          val suffix = levelCode - base
          if (suffix >= 0 && suffix < (1 << size)) {
            w.putBits(0, prefix); w.put(1); w.putBits(suffix, size)
            done = true
          } else {
            prefix += 1
            if (prefix > 28) throw new IllegalStateException(s"level $v uncodable")
          }
        }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(v) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    if (totalCoeff < maxCoeff) {
      val totalZeros = highest + 1 - totalCoeff
      val t = if (nC == -1) TotalZerosChromaDc(totalCoeff)
        else TotalZeros4x4(totalCoeff)
      t.write(w, totalZeros)
      var zerosLeft = totalZeros
      // run_before per level, highest scan position first
      var idx = highest
      var n = 0
      while (n < totalCoeff - 1 && zerosLeft > 0) {
        var run = 0
        var j = idx - 1
        while (coeff(j) == 0) { run += 1; j -= 1 }
        RunBefore(math.min(zerosLeft, 7)).write(w, run)
        zerosLeft -= run
        idx = j
        n += 1
      }
    } else {
      // maxCoeff coefficients all nonzero ⇒ no total_zeros, no runs
      ()
    }
    totalCoeff
  }

  // ---------------------------------------------------------------
  // Frame state shared by decoder and encoder reconstruction
  // ---------------------------------------------------------------

  private final class FrameState(val mbW: Int, val mbH: Int) {
    val w: Int = mbW * 16; val h: Int = mbH * 16
    val cw: Int = mbW * 8; val ch: Int = mbH * 8
    val y = new Array[Byte](w * h)
    val cb = new Array[Byte](cw * ch)
    val cr = new Array[Byte](cw * ch)
    // per-4x4-block CAVLC TotalCoeff; -1 = not yet decoded (doubles as
    // the decoded-before test for nC contexts and sample availability)
    val bW: Int = mbW * 4; val bH: Int = mbH * 4
    val tcY: Array[Int] = Array.fill(bW * bH)(-1)
    val cbW: Int = mbW * 2; val cbH: Int = mbH * 2
    val tcCb: Array[Int] = Array.fill(cbW * cbH)(-1)
    val tcCr: Array[Int] = Array.fill(cbW * cbH)(-1)
    // per-4x4 intra pred mode; 2 for non-I_4x4 intra MBs, -1 undecoded
    val modeY: Array[Int] = Array.fill(bW * bH)(-1)
    // per-4x4 motion data (P slices): quarter-pel L0 vector and its
    // reference index; -2 = not yet decoded, -1 = intra-coded block
    val mvX: Array[Int] = new Array[Int](bW * bH)
    val mvY: Array[Int] = new Array[Int](bW * bH)
    val refL0: Array[Int] = Array.fill(bW * bH)(-2)
    // per-MB QP_Y as coded (0 for I_PCM) — the deblocking filter's
    // threshold inputs (8.7.2)
    val qpMb: Array[Int] = new Array[Int](mbW * mbH)
    // multi-slice pictures: which slice coded each MB (-1 undecoded),
    // the slice now being decoded, the next expected MB in raster
    // order (constrained baseline forbids FMO/ASO), and each slice's
    // deblocking parameters (idc, offsetA, offsetB)
    val sliceMb: Array[Int] = Array.fill(mbW * mbH)(-1)
    var curSlice: Int = 0
    var mbNext: Int = 0
    val sliceDb = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // reference bookkeeping: this picture's frame_num (PicNum base)
    // and any memory-management control ops its slices carried
    var frameNum: Int = 0
    var idrLongTerm: Boolean = false
    val mmco = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]

    def markMb(mbX: Int, mbY: Int): Unit =
      sliceMb(mbY * mbW + mbX) = curSlice
    /** MB availability (6.4.9): decoded AND in the current slice. */
    @inline def mbUsable(mbX: Int, mbY: Int): Boolean =
      sliceMb(mbY * mbW + mbX) == curSlice
    @inline def cellUsable(bx: Int, by: Int): Boolean =
      sliceMb((by >> 2) * mbW + (bx >> 2)) == curSlice

    /** Record one inter partition's motion over its 4x4 grid cells. */
    def setMotion(bx: Int, by: Int, w4: Int, h4: Int,
        mx: Int, my: Int, ref: Int): Unit = {
      var y = by
      while (y < by + h4) {
        var x = bx
        while (x < bx + w4) {
          val i = y * bW + x
          mvX(i) = mx; mvY(i) = my; refL0(i) = ref
          x += 1
        }
        y += 1
      }
    }

    /** Mark a whole MB's grid cells intra (no inter motion data). */
    def markIntra(mbX: Int, mbY: Int): Unit =
      setMotion(mbX * 4, mbY * 4, 4, 4, 0, 0, -1)

    def lumaNc(bx: Int, by: Int): Int = {
      val nA =
        if (bx > 0 && cellUsable(bx - 1, by)) tcY(by * bW + bx - 1) else -1
      val nB =
        if (by > 0 && cellUsable(bx, by - 1)) tcY((by - 1) * bW + bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }
    def chromaNc(tc: Array[Int], cx: Int, cy: Int): Int = {
      val nA =
        if (cx > 0 && sliceMb((cy >> 1) * mbW + ((cx - 1) >> 1)) == curSlice)
          tc(cy * cbW + cx - 1)
        else -1
      val nB =
        if (cy > 0 && sliceMb(((cy - 1) >> 1) * mbW + (cx >> 1)) == curSlice)
          tc((cy - 1) * cbW + cx)
        else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }
    /** 4x4 block usable as a prediction neighbor: decoded, in picture,
      * AND in the current slice (6.4.9 availability).
      */
    def blockDone(bx: Int, by: Int): Boolean =
      bx >= 0 && by >= 0 && bx < bW && by < bH &&
        tcY(by * bW + bx) >= 0 && cellUsable(bx, by)
  }

  /** Dequantize a full 16-coeff scan-order block into raster `blk`. */
  private def dequantFull(coeff: Array[Int], qp: Int, blk: Array[Int]): Unit = {
    var k = 0
    while (k < 16) {
      val pos = Zig4(k)
      blk(pos) = if (coeff(k) == 0) 0 else dequant(coeff(k), pos, qp)
      k += 1
    }
  }

  /** Dequantize a 15-coeff AC scan-order block + explicit DC into `blk`. */
  private def dequantAcDc(coeff: Array[Int], dc: Int, qp: Int, blk: Array[Int]): Unit = {
    blk(0) = dc
    var k = 0
    while (k < 15) {
      val pos = Zig4(k + 1)
      blk(pos) = if (coeff(k) == 0) 0 else dequant(coeff(k), pos, qp)
      k += 1
    }
  }

  /** recon = clip(pred + residual) written into the plane. `predOff` /
    * `predStride` address the 4x4 window inside the prediction buffer.
    */
  private def reconBlock(plane: Array[Byte], stride: Int, px: Int, py: Int,
      pred: Array[Int], predOff: Int, predStride: Int, blk: Array[Int]): Unit = {
    var yy = 0
    while (yy < 4) {
      var xx = 0
      while (xx < 4) {
        plane((py + yy) * stride + px + xx) =
          clip255(pred(predOff + yy * predStride + xx) + blk(yy * 4 + xx)).toByte
        xx += 1
      }
      yy += 1
    }
  }

  private def writePredBlock(plane: Array[Byte], stride: Int, px: Int, py: Int,
      pred: Array[Int], predOff: Int, predStride: Int): Unit = {
    var yy = 0
    while (yy < 4) {
      var xx = 0
      while (xx < 4) {
        plane((py + yy) * stride + px + xx) =
          pred(predOff + yy * predStride + xx).toByte
        xx += 1
      }
      yy += 1
    }
  }

  // ---------------------------------------------------------------
  // Inter prediction — 8.4 (P slices). MV prediction over the 4x4
  // motion grid; quarter-pel luma / eighth-pel chroma interpolation.
  // Shared verbatim by decoder and encoder reconstruction (the same
  // structural-equality discipline as the intra predictors).
  // ---------------------------------------------------------------

  /** Motion data of grid cell (bx,by): (mvx, mvy, refIdx, available).
    * Out-of-picture or not-yet-decoded cells are unavailable (the
    * decode-order rule of 6.4.11.7 falls out of the grid state);
    * intra cells are available with refIdx -1 / zero mv (8.4.1.3.2).
    */
  private def motionAt(st: FrameState, bx: Int, by: Int): (Int, Int, Int, Boolean) =
    if (bx < 0 || by < 0 || bx >= st.bW || by >= st.bH) (0, 0, -1, false)
    else {
      val i = by * st.bW + bx
      if (st.refL0(i) == -2 ||
        st.sliceMb((by >> 2) * st.mbW + (bx >> 2)) != st.curSlice)
        (0, 0, -1, false) // undecoded or another slice: unavailable
      else if (st.refL0(i) == -1) (0, 0, -1, true)
      else (st.mvX(i), st.mvY(i), st.refL0(i), true)
    }

  /** 8.4.1.3 luma MV predictor for the partition whose top-left 4x4
    * cell is (bx,by), w4 cells wide, predicting against reference
    * `ref`. `shape` selects the 16x8/8x16 directional shortcuts:
    * 0 = median, 1 = 16x8 top, 2 = 16x8 bottom, 3 = 8x16 left,
    * 4 = 8x16 right.
    */
  private def mvPred(st: FrameState, bx: Int, by: Int, w4: Int,
      ref: Int, shape: Int): (Int, Int) = {
    val a = motionAt(st, bx - 1, by)
    val b = motionAt(st, bx, by - 1)
    var c = motionAt(st, bx + w4, by - 1)
    if (!c._4) c = motionAt(st, bx - 1, by - 1) // D fallback (8.4.1.3.2)
    // directional shortcuts (8.4.1.3) use the raw A/B/C neighbours
    shape match {
      case 1 => if (b._3 == ref) return (b._1, b._2)
      case 2 => if (a._3 == ref) return (a._1, a._2)
      case 3 => if (a._3 == ref) return (a._1, a._2)
      case 4 => if (c._3 == ref) return (c._1, c._2)
      case _ => ()
    }
    // median process (8.4.1.3.1): top-row substitution, then the
    // only-one-match rule, then the component-wise median
    val (b2, c2) = if (!b._4 && !c._4 && a._4) (a, a) else (b, c)
    val nA = a._3 == ref; val nB = b2._3 == ref; val nC = c2._3 == ref
    val matches = (if (nA) 1 else 0) + (if (nB) 1 else 0) + (if (nC) 1 else 0)
    if (matches == 1) {
      if (nA) (a._1, a._2) else if (nB) (b2._1, b2._2) else (c2._1, c2._2)
    } else {
      @inline def med(x: Int, y: Int, z: Int) =
        math.max(math.min(x, y), math.min(math.max(x, y), z))
      (med(a._1, b2._1, c2._1), med(a._2, b2._2, c2._2))
    }
  }

  /** P_Skip motion vector (8.4.1.1): the 16x16 median predictor with
    * refIdx 0, zeroed when either top/left MB neighbour is missing or
    * carries a zero vector against reference 0.
    */
  private def skipMv(st: FrameState, mbX: Int, mbY: Int): (Int, Int) = {
    val a = motionAt(st, mbX * 4 - 1, mbY * 4)
    val b = motionAt(st, mbX * 4, mbY * 4 - 1)
    if (!a._4 || !b._4 ||
      (a._3 == 0 && a._1 == 0 && a._2 == 0) ||
      (b._3 == 0 && b._1 == 0 && b._2 == 0)) (0, 0)
    else mvPred(st, mbX * 4, mbY * 4, 4, 0, 0)
  }

  @inline private def clampI(v: Int, max: Int): Int =
    if (v < 0) 0 else if (v > max) max else v

  /** Decoded-picture buffer: short-term references in decode-recency
    * order, long-term references by LongTermFrameIdx, and the current
    * MaxLongTermFrameIdx (-1 = no long-term allowed yet, 8.2.5.4.4).
    */
  private final case class Dpb(short: Vector[FrameState] = Vector.empty,
      long: Map[Int, FrameState] = Map.empty, maxLongIdx: Int = -1)

  /** One reference-list entry during list construction: long-term
    * entries match modification idc 2 by LongTermPicNum (= the frame
    * index for frame coding), short-term by PicNum.
    */
  private final case class RefEntry(st: FrameState, isLong: Boolean, num: Int)

  /** Explicit weighted-prediction factors for one reference list
    * (pred_weight_table, 7.3.3.2): per-refIdx luma and chroma
    * (weight, offset) at the given log2 denominators. Entries with
    * their flag unset carry the identity (w = 1 << denom, o = 0).
    */
  private final case class RefWeights(lwd: Int, cwd: Int,
      wY: Array[Int], oY: Array[Int],
      wCb: Array[Int], oCb: Array[Int],
      wCr: Array[Int], oCr: Array[Int])

  /** Apply 8.4.2.3.2 unidirectional explicit weighting in place over
    * a prediction window: clip(((p·w + 2^(d−1)) >> d) + o), or the
    * unshifted form when d == 0.
    */
  private def applyWeights(pred: Array[Int], off: Int, stride: Int,
      bw: Int, bh: Int, w: Int, o: Int, d: Int): Unit = {
    if (w == (1 << d) && o == 0) return // identity
    val half = if (d > 0) 1 << (d - 1) else 0
    var y = 0
    while (y < bh) {
      var x = 0
      while (x < bw) {
        val i = off + y * stride + x
        pred(i) = clip255((if (d > 0) (pred(i) * w + half) >> d
          else pred(i) * w) + o)
        x += 1
      }
      y += 1
    }
  }

  /** Quarter-pel luma motion compensation (8.4.2.2.1/.2): writes a
    * blkW x blkH prediction into `pred` at predOff/predStride, reading
    * the reference plane with edge clamping (out-of-frame vectors
    * replicate the border, as the standard's coordinate clips do).
    * Half-pel samples are the 6-tap (1,-5,20,20,-5,1) filter; the
    * centre j is the 6-tap over unrounded intermediates; quarter
    * samples average the two nearest integer/half samples.
    */
  private[multimodal] def mcLuma(ref: Array[Byte], rw: Int, rh: Int,
      px: Int, py: Int, mvx: Int, mvy: Int, blkW: Int, blkH: Int,
      pred: Array[Int], predOff: Int, predStride: Int): Unit = {
    val x0 = px + (mvx >> 2); val y0 = py + (mvy >> 2)
    val xf = mvx & 3; val yf = mvy & 3
    // clamped full-pel patch with a 2-left/top, 3-right/bottom apron
    val pw = blkW + 5; val ph = blkH + 5
    val patch = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = clampI(y0 - 2 + y, rh - 1) * rw
      var x = 0
      while (x < pw) {
        patch(y * pw + x) = ref(sy + clampI(x0 - 2 + x, rw - 1)) & 0xff
        x += 1
      }
      y += 1
    }
    @inline def p(x: Int, y: Int): Int = patch((y + 2) * pw + (x + 2))
    // unrounded 6-tap sums; (x,y) address the half sample's left/top
    // full-pel anchor, matching p's coordinates
    @inline def bRaw(x: Int, y: Int): Int =
      p(x - 2, y) - 5 * p(x - 1, y) + 20 * p(x, y) + 20 * p(x + 1, y) -
        5 * p(x + 2, y) + p(x + 3, y)
    @inline def hRaw(x: Int, y: Int): Int =
      p(x, y - 2) - 5 * p(x, y - 1) + 20 * p(x, y) + 20 * p(x, y + 1) -
        5 * p(x, y + 2) + p(x, y + 3)
    @inline def bS(x: Int, y: Int): Int = clip255((bRaw(x, y) + 16) >> 5)
    @inline def hS(x: Int, y: Int): Int = clip255((hRaw(x, y) + 16) >> 5)
    @inline def jS(x: Int, y: Int): Int = {
      val s = bRaw(x, y - 2) - 5 * bRaw(x, y - 1) + 20 * bRaw(x, y) +
        20 * bRaw(x, y + 1) - 5 * bRaw(x, y + 2) + bRaw(x, y + 3)
      clip255((s + 512) >> 10)
    }
    @inline def avg(u: Int, v: Int): Int = (u + v + 1) >> 1
    var oy = 0
    while (oy < blkH) {
      var ox = 0
      while (ox < blkW) {
        val v = (xf, yf) match {
          case (0, 0) => p(ox, oy)
          case (1, 0) => avg(p(ox, oy), bS(ox, oy))
          case (2, 0) => bS(ox, oy)
          case (3, 0) => avg(bS(ox, oy), p(ox + 1, oy))
          case (0, 1) => avg(p(ox, oy), hS(ox, oy))
          case (0, 2) => hS(ox, oy)
          case (0, 3) => avg(hS(ox, oy), p(ox, oy + 1))
          case (2, 2) => jS(ox, oy)
          case (1, 1) => avg(bS(ox, oy), hS(ox, oy))
          case (3, 1) => avg(bS(ox, oy), hS(ox + 1, oy))
          case (1, 3) => avg(bS(ox, oy + 1), hS(ox, oy))
          case (3, 3) => avg(bS(ox, oy + 1), hS(ox + 1, oy))
          case (2, 1) => avg(bS(ox, oy), jS(ox, oy))
          case (2, 3) => avg(jS(ox, oy), bS(ox, oy + 1))
          case (1, 2) => avg(hS(ox, oy), jS(ox, oy))
          case (3, 2) => avg(jS(ox, oy), hS(ox + 1, oy))
          case _ => throw new IllegalStateException("frac")
        }
        pred(predOff + oy * predStride + ox) = v
        ox += 1
      }
      oy += 1
    }
  }

  /** Eighth-pel chroma motion compensation (8.4.2.2.2, 4:2:0):
    * bilinear over the four nearest chroma samples, edge-clamped.
    * The chroma vector is the luma vector (quarter-luma units are
    * eighth-chroma units at half resolution).
    */
  private[multimodal] def mcChroma(ref: Array[Byte], rw: Int, rh: Int,
      cpx: Int, cpy: Int, mvx: Int, mvy: Int, blkW: Int, blkH: Int,
      pred: Array[Int], predOff: Int, predStride: Int): Unit = {
    val x0 = cpx + (mvx >> 3); val y0 = cpy + (mvy >> 3)
    val xf = mvx & 7; val yf = mvy & 7
    @inline def s(x: Int, y: Int): Int =
      ref(clampI(y, rh - 1) * rw + clampI(x, rw - 1)) & 0xff
    var oy = 0
    while (oy < blkH) {
      var ox = 0
      while (ox < blkW) {
        val x = x0 + ox; val y = y0 + oy
        pred(predOff + oy * predStride + ox) =
          ((8 - xf) * (8 - yf) * s(x, y) + xf * (8 - yf) * s(x + 1, y) +
            (8 - xf) * yf * s(x, y + 1) + xf * yf * s(x + 1, y + 1) + 32) >> 6
        ox += 1
      }
      oy += 1
    }
  }

  // ---------------------------------------------------------------
  // In-loop deblocking filter — 8.7. Applied to the fully
  // reconstructed picture in MB raster order (intra prediction reads
  // UNFILTERED samples, so filtering happens after the slice's MB
  // loop); shared verbatim by decoder and encoder reconstruction.
  // ---------------------------------------------------------------

  /** Boundary strength (8.7.2.1, frame MBs): 4 = intra at an MB edge,
    * 3 = intra internal, 2 = residual coefficients on either side,
    * 1 = motion discontinuity (different ref or any mv component
    * differing by >= 4 quarter-pels), 0 = skip filtering.
    */
  private def boundaryStrength(st: FrameState, pbx: Int, pby: Int,
      qbx: Int, qby: Int, mbEdge: Boolean): Int = {
    val pi = pby * st.bW + pbx; val qi = qby * st.bW + qbx
    val pIntra = st.refL0(pi) < 0; val qIntra = st.refL0(qi) < 0
    if (pIntra || qIntra) { if (mbEdge) 4 else 3 }
    else if (st.tcY(pi) > 0 || st.tcY(qi) > 0) 2
    else if (st.refL0(pi) != st.refL0(qi) ||
      math.abs(st.mvX(pi) - st.mvX(qi)) >= 4 ||
      math.abs(st.mvY(pi) - st.mvY(qi)) >= 4) 1
    else 0
  }

  /** Filter `nLines` sample lines across one edge (8.7.2.3/.4).
    * `base` addresses the q0 sample of the first line; `across` steps
    * from q toward q3 (p side at negative multiples), `along` steps
    * between lines. All outputs are computed from the line's input
    * values before any of its writes.
    */
  private[multimodal] def filterEdge(plane: Array[Byte], base: Int,
      across: Int, along: Int, nLines: Int, bS: Int,
      indexA: Int, indexB: Int, chroma: Boolean): Unit = {
    val alpha = AlphaTab(indexA); val beta = BetaTab(indexB)
    if (bS == 0 || alpha == 0) return
    var l = 0
    while (l < nLines) {
      val o = base + l * along
      @inline def s(k: Int): Int = plane(o + k * across) & 0xff
      val p0 = s(-1); val q0 = s(0); val p1 = s(-2); val q1 = s(1)
      if (math.abs(p0 - q0) < alpha &&
        math.abs(p1 - p0) < beta && math.abs(q1 - q0) < beta) {
        if (bS < 4) {
          val tc0 = Tc0Tab(indexA)(bS - 1)
          if (chroma) {
            val tc = tc0 + 1
            val d = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
            plane(o - across) = clip255(p0 + d).toByte
            plane(o) = clip255(q0 - d).toByte
          } else {
            val p2 = s(-3); val q2 = s(2)
            val ap = math.abs(p2 - p0) < beta
            val aq = math.abs(q2 - q0) < beta
            val tc = tc0 + (if (ap) 1 else 0) + (if (aq) 1 else 0)
            val d = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
            if (ap) plane(o - 2 * across) =
              (p1 + clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)).toByte
            if (aq) plane(o + across) =
              (q1 + clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)).toByte
            plane(o - across) = clip255(p0 + d).toByte
            plane(o) = clip255(q0 - d).toByte
          }
        } else { // bS == 4
          if (chroma) {
            plane(o - across) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
            plane(o) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
          } else {
            val p2 = s(-3); val q2 = s(2)
            val strong = math.abs(p0 - q0) < (alpha >> 2) + 2
            if (strong && math.abs(p2 - p0) < beta) {
              val p3 = s(-4)
              plane(o - across) = ((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3).toByte
              plane(o - 2 * across) = ((p2 + p1 + p0 + q0 + 2) >> 2).toByte
              plane(o - 3 * across) = ((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3).toByte
            } else plane(o - across) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
            if (strong && math.abs(q2 - q0) < beta) {
              val q3 = s(3)
              plane(o) = ((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3).toByte
              plane(o + across) = ((q2 + q1 + q0 + p0 + 2) >> 2).toByte
              plane(o + 2 * across) = ((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3).toByte
            } else plane(o) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
          }
        }
      }
      l += 1
    }
  }

  /** Deblock one MB: all vertical edges left→right, then all
    * horizontal edges top→bottom, each reading the progressively
    * filtered sample array (the standard's MB-raster process). The
    * governing idc/offsets are the current (q-side) MB's slice's; for
    * idc 2, MB edges against another slice are left unfiltered.
    */
  private def deblockMb(st: FrameState, cqo: Int, mbX: Int, mbY: Int): Unit = {
    val mySlice = st.sliceMb(mbY * st.mbW + mbX)
    val (idc, offA, offB) = st.sliceDb(mySlice)
    if (idc == 1) return
    val qpQ = st.qpMb(mbY * st.mbW + mbX)
    // one direction for one plane family: dir 0 = vertical edges
    // (filter across x), dir 1 = horizontal (across y)
    def edges(dir: Int): Unit = {
      var e = 0
      while (e < 4) {
        val atMbEdge = e == 0
        val inside = if (dir == 0) mbX > 0 else mbY > 0
        val crossSliceOk = !atMbEdge || !inside || idc != 2 || {
          val nb = if (dir == 0) mbY * st.mbW + mbX - 1
            else (mbY - 1) * st.mbW + mbX
          st.sliceMb(nb) == mySlice
        }
        if ((!atMbEdge || inside) && crossSliceOk) {
          val qpP =
            if (!atMbEdge) qpQ
            else if (dir == 0) st.qpMb(mbY * st.mbW + mbX - 1)
            else st.qpMb((mbY - 1) * st.mbW + mbX)
          val iAY = clip3(0, 51, ((qpP + qpQ + 1) >> 1) + offA)
          val iBY = clip3(0, 51, ((qpP + qpQ + 1) >> 1) + offB)
          val qpcP = chromaQp(qpP, cqo)
          val qpcQ = chromaQp(qpQ, cqo)
          val iAC = clip3(0, 51, ((qpcP + qpcQ + 1) >> 1) + offA)
          val iBC = clip3(0, 51, ((qpcP + qpcQ + 1) >> 1) + offB)
          var seg = 0
          while (seg < 4) {
            // adjacent 4x4 luma blocks for this 4-line segment
            val (pbx, pby, qbx, qby, base, along) =
              if (dir == 0) {
                val qbx = mbX * 4 + e; val by = mbY * 4 + seg
                (qbx - 1, by, qbx, by,
                  (mbY * 16 + seg * 4) * st.w + mbX * 16 + e * 4, st.w)
              } else {
                val qby = mbY * 4 + e; val bx = mbX * 4 + seg
                (bx, qby - 1, bx, qby,
                  (mbY * 16 + e * 4) * st.w + mbX * 16 + seg * 4, 1)
              }
            val bS = boundaryStrength(st, pbx, pby, qbx, qby, atMbEdge)
            if (bS > 0) {
              filterEdge(st.y, base, if (dir == 0) 1 else st.w, along, 4,
                bS, iAY, iBY, chroma = false)
              if ((e & 1) == 0) {
                // chroma edges exist at luma edges 0 and 8 only
                // (4:2:0); 2 chroma lines per luma 4x4 segment
                val cBase =
                  if (dir == 0)
                    (mbY * 8 + seg * 2) * st.cw + mbX * 8 + e * 2
                  else (mbY * 8 + e * 2) * st.cw + mbX * 8 + seg * 2
                val cAcross = if (dir == 0) 1 else st.cw
                val cAlong = if (dir == 0) st.cw else 1
                filterEdge(st.cb, cBase, cAcross, cAlong, 2, bS, iAC, iBC, chroma = true)
                filterEdge(st.cr, cBase, cAcross, cAlong, 2, bS, iAC, iBC, chroma = true)
              }
            }
            seg += 1
          }
        }
        e += 1
      }
    }
    edges(0)
    edges(1)
  }

  /** Apply the in-loop filter to a completed picture, each MB under
    * its own slice's parameters.
    */
  private def deblockPicture(st: FrameState, cqo: Int): Unit = {
    var mb = 0
    while (mb < st.mbW * st.mbH) {
      deblockMb(st, cqo, mb % st.mbW, mb / st.mbW)
      mb += 1
    }
  }

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  /** Decode the chroma half of any MB (prediction + DC/AC residual).
    * Intra MBs predict with `chromaMode` from reconstructed
    * neighbours; inter MBs pass their motion-compensated predictions
    * via `interPred` (cb then cr, 64 samples each) and chromaMode is
    * ignored. Shared by the I_4x4, I_16x16 and P paths.
    */
  private def decodeMbChroma(r: BitReader, st: FrameState, pps: Pps,
      mbX: Int, mbY: Int, cbpChroma: Int, chromaMode: Int, qp: Int,
      interPred: Array[Array[Int]] = null): Unit = {
    val qpc = chromaQp(qp, pps.chromaQpOffset)
    val cpx0 = mbX * 8; val cpy0 = mbY * 8
    val aL = mbX > 0 && st.mbUsable(mbX - 1, mbY)
    val aT = mbY > 0 && st.mbUsable(mbX, mbY - 1)
    val dcCb = new Array[Int](4); val dcCr = new Array[Int](4)
    if (cbpChroma != 0) {
      readResidual(r, -1, 4, dcCb)
      readResidual(r, -1, 4, dcCr)
    }
    val predBuf = new Array[Int](64)
    val coeff = new Array[Int](15)
    val blk = new Array[Int](16)
    var pi = 0
    while (pi < 2) {
      val (plane, tcArr, dcRaw) =
        if (pi == 0) (st.cb, st.tcCb, dcCb) else (st.cr, st.tcCr, dcCr)
      val pred =
        if (interPred != null) interPred(pi)
        else {
          predictChroma8(plane, st.cw, cpx0, cpy0, chromaMode, aL, aT, predBuf)
          predBuf
        }
      // inverse 2x2 Hadamard + DC scaling
      val dc = dcRaw.clone()
      hadamard2(dc)
      var i = 0
      while (i < 4) { dc(i) = dequantChromaDc(dc(i), qpc); i += 1 }
      var b = 0
      while (b < 4) {
        val cx = mbX * 2 + (b & 1); val cy = mbY * 2 + (b >> 1)
        val tc =
          if (cbpChroma == 2) readResidual(r, st.chromaNc(tcArr, cx, cy), 15, coeff)
          else { java.util.Arrays.fill(coeff, 0); 0 }
        tcArr(cy * st.cbW + cx) = tc
        dequantAcDc(coeff, dc(b), qpc, blk)
        idct4(blk)
        reconBlock(plane, st.cw, cpx0 + (b & 1) * 4, cpy0 + (b >> 1) * 4,
          pred, (b >> 1) * 4 * 8 + (b & 1) * 4, 8, blk)
        b += 1
      }
      pi += 1
    }
  }

  /** Decode one intra macroblock (mb_type already read — P slices
    * offset theirs by 5); returns the updated slice QP.
    */
  private def decodeMb(r: BitReader, st: FrameState, pps: Pps,
      mbX: Int, mbY: Int, qpIn: Int, mbType: Int): Int = {
    var qp = qpIn
    val bx0 = mbX * 4; val by0 = mbY * 4
    val px0 = mbX * 16; val py0 = mbY * 16
    require(mbType >= 0 && mbType <= 25, s"mb_type $mbType invalid in I slice")
    st.markIntra(mbX, mbY)
    st.markMb(mbX, mbY)

    if (mbType == 25) { // I_PCM
      r.byteAlign()
      var i = 0
      while (i < 256) {
        st.y((py0 + (i >> 4)) * st.w + px0 + (i & 15)) = r.u(8).toByte
        i += 1
      }
      var pi = 0
      while (pi < 2) {
        val plane = if (pi == 0) st.cb else st.cr
        i = 0
        while (i < 64) {
          plane((mbY * 8 + (i >> 3)) * st.cw + mbX * 8 + (i & 7)) = r.u(8).toByte
          i += 1
        }
        pi += 1
      }
      var k = 0
      while (k < 16) {
        val (zx, zy) = ZPos(k)
        st.tcY((by0 + zy) * st.bW + bx0 + zx) = 16
        st.modeY((by0 + zy) * st.bW + bx0 + zx) = 2
        k += 1
      }
      k = 0
      while (k < 4) {
        st.tcCb((mbY * 2 + (k >> 1)) * st.cbW + mbX * 2 + (k & 1)) = 16
        st.tcCr((mbY * 2 + (k >> 1)) * st.cbW + mbX * 2 + (k & 1)) = 16
        k += 1
      }
      st.qpMb(mbY * st.mbW + mbX) = 0 // I_PCM deblocks at QP 0 (8.7.2)
      return qp
    }

    val coeff = new Array[Int](16)
    val blk = new Array[Int](16)

    if (mbType == 0) { // I_4x4
      val modes = new Array[Int](16)
      var k = 0
      while (k < 16) {
        val (zx, zy) = ZPos(k)
        val bx = bx0 + zx; val by = by0 + zy
        val availA = bx > 0 && st.cellUsable(bx - 1, by) &&
          st.modeY(by * st.bW + bx - 1) >= 0
        val availB = by > 0 && st.cellUsable(bx, by - 1) &&
          st.modeY((by - 1) * st.bW + bx) >= 0
        val predMode =
          if (!availA || !availB) 2
          else math.min(st.modeY(by * st.bW + bx - 1), st.modeY((by - 1) * st.bW + bx))
        val mode =
          if (r.u1() == 1) predMode
          else { val rem = r.u(3); if (rem < predMode) rem else rem + 1 }
        modes(k) = mode
        st.modeY(by * st.bW + bx) = mode
        k += 1
      }
      val chromaMode = r.ue()
      require(chromaMode <= 3, "chroma mode")
      val cbpCode = r.ue()
      require(cbpCode < 48, "cbp")
      val cbp = CbpIntra(cbpCode)
      if (cbp != 0) { qp += r.se(); require(qp >= 0 && qp <= 51, "qp") }
      val pred4 = new Array[Int](16)
      k = 0
      while (k < 16) {
        val (zx, zy) = ZPos(k)
        val bx = bx0 + zx; val by = by0 + zy
        val px = px0 + zx * 4; val py = py0 + zy * 4
        val b8 = (zy >> 1) * 2 + (zx >> 1)
        val tc =
          if ((cbp & (1 << b8)) != 0) readResidual(r, st.lumaNc(bx, by), 16, coeff)
          else { java.util.Arrays.fill(coeff, 0); 0 }
        st.tcY(by * st.bW + bx) = tc
        predict4(st.y, st.w, px, py, modes(k),
          st.blockDone(bx - 1, by), st.blockDone(bx, by - 1),
          st.blockDone(bx - 1, by - 1), st.blockDone(bx + 1, by - 1), pred4)
        if (tc > 0) {
          dequantFull(coeff, qp, blk)
          idct4(blk)
          reconBlock(st.y, st.w, px, py, pred4, 0, 4, blk)
        } else writePredBlock(st.y, st.w, px, py, pred4, 0, 4)
        k += 1
      }
      decodeMbChroma(r, st, pps, mbX, mbY, cbp >> 4, chromaMode, qp)
    } else { // I_16x16
      val m = mbType - 1
      val predMode16 = m % 4
      val cbpChroma = (m / 4) % 3
      val cbpLuma = if (m >= 12) 15 else 0
      val chromaMode = r.ue()
      require(chromaMode <= 3, "chroma mode")
      qp += r.se()
      require(qp >= 0 && qp <= 51, "qp")
      // luma DC: context of block 0, scan over the 4x4 DC array
      val dcCoeff = new Array[Int](16)
      readResidual(r, st.lumaNc(bx0, by0), 16, dcCoeff)
      val dcArr = new Array[Int](16)
      var k = 0
      while (k < 16) { dcArr(Zig4(k)) = dcCoeff(k); k += 1 }
      hadamard4(dcArr)
      k = 0
      while (k < 16) { dcArr(k) = dequantLumaDc(dcArr(k), qp); k += 1 }
      val pred256 = new Array[Int](256)
      predict16(st.y, st.w, px0, py0, predMode16,
        mbX > 0 && st.mbUsable(mbX - 1, mbY),
        mbY > 0 && st.mbUsable(mbX, mbY - 1), pred256)
      val acCoeff = new Array[Int](15)
      k = 0
      while (k < 16) {
        val (zx, zy) = ZPos(k)
        val bx = bx0 + zx; val by = by0 + zy
        val tc =
          if (cbpLuma != 0) readResidual(r, st.lumaNc(bx, by), 15, acCoeff)
          else { java.util.Arrays.fill(acCoeff, 0); 0 }
        st.tcY(by * st.bW + bx) = tc
        st.modeY(by * st.bW + bx) = 2
        dequantAcDc(acCoeff, dcArr(zy * 4 + zx), qp, blk)
        idct4(blk)
        reconBlock(st.y, st.w, px0 + zx * 4, py0 + zy * 4,
          pred256, zy * 4 * 16 + zx * 4, 16, blk)
        k += 1
      }
      decodeMbChroma(r, st, pps, mbX, mbY, cbpChroma, chromaMode, qp)
    }
    st.qpMb(mbY * st.mbW + mbX) = qp
    qp
  }

  /** Decode one P macroblock (mb_type 0..4, already read): partition
    * ref indices and mvds, motion compensation against `refs`, then
    * the inter residual; returns the updated slice QP.
    */
  private def decodeMbP(r: BitReader, st: FrameState, pps: Pps,
      refs: IndexedSeq[FrameState], numRefActive: Int,
      mbX: Int, mbY: Int, mbTypeP: Int, qpIn: Int,
      wp: RefWeights = null): Int = {
    st.markMb(mbX, mbY)
    var qp = qpIn
    val bx0 = mbX * 4; val by0 = mbY * 4
    val px0 = mbX * 16; val py0 = mbY * 16
    val predY = new Array[Int](256)
    val predC = Array.ofDim[Int](2, 64)

    def readRefIdx(): Int = {
      val v =
        if (numRefActive == 1) 0
        else if (numRefActive == 2) 1 - r.u1() // te(v) with range 1
        else r.ue()
      require(v >= 0 && v < refs.length, "ref_idx_l0 out of range")
      v
    }
    def readMvd(): Int = {
      val v = r.se()
      require(math.abs(v) < (1 << 14), "mvd out of range")
      v
    }
    def mcPart(dx: Int, dy: Int, w4: Int, h4: Int,
        mx: Int, my: Int, ref: Int): Unit = {
      val rf = refs(ref)
      mcLuma(rf.y, st.w, st.h, px0 + dx * 4, py0 + dy * 4, mx, my,
        w4 * 4, h4 * 4, predY, dy * 4 * 16 + dx * 4, 16)
      mcChroma(rf.cb, st.cw, st.ch, mbX * 8 + dx * 2, mbY * 8 + dy * 2,
        mx, my, w4 * 2, h4 * 2, predC(0), dy * 2 * 8 + dx * 2, 8)
      mcChroma(rf.cr, st.cw, st.ch, mbX * 8 + dx * 2, mbY * 8 + dy * 2,
        mx, my, w4 * 2, h4 * 2, predC(1), dy * 2 * 8 + dx * 2, 8)
      if (wp != null) {
        applyWeights(predY, dy * 4 * 16 + dx * 4, 16, w4 * 4, h4 * 4,
          wp.wY(ref), wp.oY(ref), wp.lwd)
        applyWeights(predC(0), dy * 2 * 8 + dx * 2, 8, w4 * 2, h4 * 2,
          wp.wCb(ref), wp.oCb(ref), wp.cwd)
        applyWeights(predC(1), dy * 2 * 8 + dx * 2, 8, w4 * 2, h4 * 2,
          wp.wCr(ref), wp.oCr(ref), wp.cwd)
      }
    }

    if (mbTypeP <= 2) { // 16x16 / 16x8 / 8x16: (dx, dy, w4, h4, shape)
      val parts: Array[Array[Int]] = mbTypeP match {
        case 0 => Array(Array(0, 0, 4, 4, 0))
        case 1 => Array(Array(0, 0, 4, 2, 1), Array(0, 2, 4, 2, 2))
        case _ => Array(Array(0, 0, 2, 4, 3), Array(2, 0, 2, 4, 4))
      }
      val refIdxs = parts.map(_ => readRefIdx())
      var p = 0
      while (p < parts.length) {
        val Array(dx, dy, w4, h4, shape) = parts(p)
        val mvdX = readMvd(); val mvdY = readMvd()
        val (mpx, mpy) = mvPred(st, bx0 + dx, by0 + dy, w4, refIdxs(p), shape)
        val mx = mpx + mvdX; val my = mpy + mvdY
        st.setMotion(bx0 + dx, by0 + dy, w4, h4, mx, my, refIdxs(p))
        mcPart(dx, dy, w4, h4, mx, my, refIdxs(p))
        p += 1
      }
    } else { // P_8x8 (3) / P_8x8ref0 (4)
      val subTypes = new Array[Int](4)
      var i = 0
      while (i < 4) {
        subTypes(i) = r.ue()
        require(subTypes(i) <= 3, s"sub_mb_type ${subTypes(i)}")
        i += 1
      }
      val refIdxs = new Array[Int](4)
      i = 0
      while (i < 4) {
        refIdxs(i) = if (mbTypeP == 4) 0 else readRefIdx()
        require(refIdxs(i) < refs.length, "ref_idx_l0")
        i += 1
      }
      i = 0
      while (i < 4) {
        val ox = (i & 1) * 2; val oy = (i >> 1) * 2
        val subParts: Array[Array[Int]] = subTypes(i) match { // (dx, dy, w4, h4)
          case 0 => Array(Array(0, 0, 2, 2))
          case 1 => Array(Array(0, 0, 2, 1), Array(0, 1, 2, 1))
          case 2 => Array(Array(0, 0, 1, 2), Array(1, 0, 1, 2))
          case _ => Array(Array(0, 0, 1, 1), Array(1, 0, 1, 1),
            Array(0, 1, 1, 1), Array(1, 1, 1, 1))
        }
        var j = 0
        while (j < subParts.length) {
          val Array(sdx, sdy, w4, h4) = subParts(j)
          val mvdX = readMvd(); val mvdY = readMvd()
          val (mpx, mpy) = mvPred(st, bx0 + ox + sdx, by0 + oy + sdy, w4, refIdxs(i), 0)
          val mx = mpx + mvdX; val my = mpy + mvdY
          st.setMotion(bx0 + ox + sdx, by0 + oy + sdy, w4, h4, mx, my, refIdxs(i))
          mcPart(ox + sdx, oy + sdy, w4, h4, mx, my, refIdxs(i))
          j += 1
        }
        i += 1
      }
    }

    val cbpCode = r.ue()
    require(cbpCode < 48, "cbp")
    val cbp = CbpInter(cbpCode)
    if (cbp != 0) { qp += r.se(); require(qp >= 0 && qp <= 51, "qp") }
    val coeff = new Array[Int](16)
    val blk = new Array[Int](16)
    var k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      val bx = bx0 + zx; val by = by0 + zy
      val b8 = (zy >> 1) * 2 + (zx >> 1)
      val tc =
        if ((cbp & (1 << b8)) != 0) readResidual(r, st.lumaNc(bx, by), 16, coeff)
        else { java.util.Arrays.fill(coeff, 0); 0 }
      st.tcY(by * st.bW + bx) = tc
      st.modeY(by * st.bW + bx) = 2 // inter block: DC for intra contexts
      if (tc > 0) {
        dequantFull(coeff, qp, blk)
        idct4(blk)
        reconBlock(st.y, st.w, px0 + zx * 4, py0 + zy * 4,
          predY, zy * 4 * 16 + zx * 4, 16, blk)
      } else writePredBlock(st.y, st.w, px0 + zx * 4, py0 + zy * 4,
        predY, zy * 4 * 16 + zx * 4, 16)
      k += 1
    }
    decodeMbChroma(r, st, pps, mbX, mbY, cbp >> 4, 0, qp, predC)
    st.qpMb(mbY * st.mbW + mbX) = qp
    qp
  }

  /** Reconstruct one P_Skip macroblock: motion-compensated copy at
    * the skip vector, zero residual everywhere.
    */
  private def decodeMbSkip(st: FrameState, refs: IndexedSeq[FrameState],
      mbX: Int, mbY: Int, qp: Int, wp: RefWeights = null): Unit = {
    st.markMb(mbX, mbY)
    st.qpMb(mbY * st.mbW + mbX) = qp
    val (mx, my) = skipMv(st, mbX, mbY)
    st.setMotion(mbX * 4, mbY * 4, 4, 4, mx, my, 0)
    val rf = refs(0)
    val predY = new Array[Int](256)
    val predC = Array.ofDim[Int](2, 64)
    mcLuma(rf.y, st.w, st.h, mbX * 16, mbY * 16, mx, my, 16, 16, predY, 0, 16)
    mcChroma(rf.cb, st.cw, st.ch, mbX * 8, mbY * 8, mx, my, 8, 8, predC(0), 0, 8)
    mcChroma(rf.cr, st.cw, st.ch, mbX * 8, mbY * 8, mx, my, 8, 8, predC(1), 0, 8)
    if (wp != null) {
      applyWeights(predY, 0, 16, 16, 16, wp.wY(0), wp.oY(0), wp.lwd)
      applyWeights(predC(0), 0, 8, 8, 8, wp.wCb(0), wp.oCb(0), wp.cwd)
      applyWeights(predC(1), 0, 8, 8, 8, wp.wCr(0), wp.oCr(0), wp.cwd)
    }
    var i = 0
    while (i < 256) {
      st.y((mbY * 16 + (i >> 4)) * st.w + mbX * 16 + (i & 15)) = predY(i).toByte
      i += 1
    }
    i = 0
    while (i < 64) {
      val o = (mbY * 8 + (i >> 3)) * st.cw + mbX * 8 + (i & 7)
      st.cb(o) = predC(0)(i).toByte
      st.cr(o) = predC(1)(i).toByte
      i += 1
    }
    var k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      st.tcY((mbY * 4 + zy) * st.bW + mbX * 4 + zx) = 0
      st.modeY((mbY * 4 + zy) * st.bW + mbX * 4 + zx) = 2
      k += 1
    }
    k = 0
    while (k < 4) {
      st.tcCb((mbY * 2 + (k >> 1)) * st.cbW + mbX * 2 + (k & 1)) = 0
      st.tcCr((mbY * 2 + (k >> 1)) * st.cbW + mbX * 2 + (k & 1)) = 0
      k += 1
    }
  }

  /** Decode one slice (header + its macroblocks) INTO `st` at the
    * picture's next raster MB (constrained baseline forbids FMO/ASO,
    * so slices cover the picture in order). IDR/I slices need no
    * references; P slices (slice_type 0/5, CAVLC, single-ref list in
    * decode-recency order — list modification and MMCO are out of
    * subset) predict against `refs`, most recent first. Advances
    * `st.mbNext`, records the slice's deblocking parameters; the
    * caller runs [[deblockPicture]] once the picture completes.
    */
  private def decodeSliceInto(stIn: FrameState, rbsp: Array[Byte],
      refIdc: Int, nalType: Int,
      allSps: Map[Int, Sps], allPps: Map[Int, Pps],
      dpb: Dpb = Dpb()): (FrameState, Sps, Pps) = {
    val r = new BitReader(rbsp)
    val firstMb = r.ue()
    val sliceType = r.ue()
    val isP = sliceType == 0 || sliceType == 5
    require(sliceType == 2 || sliceType == 7 || isP,
      s"slice_type $sliceType (B/SP/SI) unsupported")
    require(!isP || nalType != 5, "P slice inside an IDR access unit")
    val ppsId = r.ue()
    val pps = allPps.getOrElse(ppsId,
      throw new IllegalStateException(s"pps $ppsId not seen"))
    val sps = allSps.getOrElse(pps.spsId,
      throw new IllegalStateException(s"sps ${pps.spsId} not seen"))
    require(!pps.entropyCabac, "CABAC unsupported (CAVLC only)")
    require(!pps.constrainedIntra, "constrained_intra_pred unsupported")
    val st = if (stIn != null) stIn else new FrameState(sps.mbWidth, sps.mbHeight)
    require(firstMb == st.mbNext,
      s"slice at MB $firstMb, expected ${st.mbNext} (FMO/ASO unsupported)")
    st.curSlice = st.sliceDb.length
    val frameNum = r.u(sps.log2MaxFrameNum)
    st.frameNum = frameNum
    val maxFn = 1 << sps.log2MaxFrameNum
    if (nalType == 5) r.ue() // idr_pic_id
    if (sps.pocType == 0) {
      r.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
      if (pps.bottomFieldPoc) r.se() // delta_pic_order_cnt_bottom
    } else if (sps.pocType == 1 && !sps.deltaPocAlwaysZero) {
      r.se() // delta_pic_order_cnt[0]
      if (pps.bottomFieldPoc) r.se() // delta_pic_order_cnt[1]
    }
    var numRefActive = pps.numRefIdxL0
    // reference list 0 (8.2.4.2.1): short-term pictures by descending
    // PicNum (frame_num wrap relative to this picture), then long-term
    // pictures by ascending LongTermFrameIdx
    def picNumF(rf: FrameState): Int =
      if (rf.frameNum > frameNum) rf.frameNum - maxFn else rf.frameNum
    var list0: Vector[FrameState] = Vector.empty
    if (isP) {
      if (r.u1() == 1) numRefActive = r.ue() + 1 // override
      require(numRefActive <= 16, "num_ref_idx_l0_active")
      var lst = scala.collection.mutable.ArrayBuffer.empty[RefEntry]
      dpb.short.sortBy(rf => -picNumF(rf))
        .foreach(rf => lst += RefEntry(rf, isLong = false, picNumF(rf)))
      dpb.long.toVector.sortBy(_._1)
        .foreach { case (idx, rf) => lst += RefEntry(rf, isLong = true, idx) }
      if (r.u1() == 1) { // ref_pic_list_modification (8.2.4.3.1)
        var picNumPred = frameNum
        var insertIdx = 0
        var idc = r.ue()
        while (idc != 3) {
          require(idc <= 2, s"modification idc $idc")
          require(insertIdx < 64, "modification loop")
          val target =
            if (idc == 2) { // long-term: match LongTermPicNum
              val n = r.ue()
              lst.indexWhere(e => e.isLong && e.num == n)
            } else {
              val abs = r.ue() + 1
              var noWrap = if (idc == 0) picNumPred - abs else picNumPred + abs
              if (idc == 0 && noWrap < 0) noWrap += maxFn
              if (idc == 1 && noWrap >= maxFn) noWrap -= maxFn
              picNumPred = noWrap
              val picNum = if (noWrap > frameNum) noWrap - maxFn else noWrap
              lst.indexWhere(e => !e.isLong && e.num == picNum)
            }
          require(target >= 0, "modification reference absent")
          require(target >= insertIdx, "duplicate reference entries unsupported")
          val e = lst.remove(target)
          lst.insert(insertIdx, e)
          insertIdx += 1
          idc = r.ue()
        }
      }
      list0 = lst.toVector.map(_.st)
      require(list0.nonEmpty, "P slice without a decoded reference")
    }
    var wp: RefWeights = null
    if (isP && pps.weightedPred) { // pred_weight_table (7.3.3.2)
      val lwd = r.ue(); val cwd = r.ue()
      require(lwd <= 7 && cwd <= 7, "log2 weight denom")
      val n = numRefActive
      val weights = RefWeights(lwd, cwd,
        Array.fill(n)(1 << lwd), new Array[Int](n),
        Array.fill(n)(1 << cwd), new Array[Int](n),
        Array.fill(n)(1 << cwd), new Array[Int](n))
      var i = 0
      while (i < n) {
        if (r.u1() == 1) {
          weights.wY(i) = r.se(); weights.oY(i) = r.se()
          require(weights.wY(i) >= -128 && weights.wY(i) <= 127 &&
            weights.oY(i) >= -128 && weights.oY(i) <= 127, "luma weight")
        }
        if (r.u1() == 1) {
          weights.wCb(i) = r.se(); weights.oCb(i) = r.se()
          weights.wCr(i) = r.se(); weights.oCr(i) = r.se()
          require(Seq(weights.wCb(i), weights.oCb(i), weights.wCr(i),
            weights.oCr(i)).forall(v => v >= -128 && v <= 127), "chroma weight")
        }
        i += 1
      }
      wp = weights
    }
    if (refIdc != 0) {
      if (nalType == 5) { // dec_ref_pic_marking (IDR)
        r.u1() // no_output_of_prior_pics
        st.idrLongTerm = r.u1() == 1 // IDR stored long-term at idx 0
      } else if (r.u1() == 1) { // adaptive marking: MMCO ops (8.2.5.4)
        var op = r.ue()
        while (op != 0) {
          op match {
            case 1 => st.mmco += ((1, r.ue() + 1, 0)) // unmark short-term
            case 2 => st.mmco += ((2, r.ue(), 0)) // unmark long-term
            case 3 => st.mmco += ((3, r.ue() + 1, r.ue())) // short -> long
            case 4 => st.mmco += ((4, r.ue(), 0)) // max long-term idx + 1
            case 5 => st.mmco += ((5, 0, 0)) // unmark everything
            case 6 => st.mmco += ((6, r.ue(), 0)) // current -> long
            case _ => throw new IllegalStateException(s"mmco $op")
          }
          require(st.mmco.length <= 32, "mmco loop")
          op = r.ue()
        }
      }
    }
    var qp = pps.picInitQp + r.se()
    require(qp >= 0 && qp <= 51, "slice qp")
    // in-loop deblocking (8.7): idc 0 filters everything, 2 skips
    // slice edges (== 0 for our single-slice pictures), 1 disables
    var deblockIdc = 0
    var offA = 0
    var offB = 0
    if (pps.deblockingControlPresent) {
      deblockIdc = r.ue()
      require(deblockIdc <= 2, s"disable_deblocking_filter_idc $deblockIdc")
      if (deblockIdc != 1) {
        offA = 2 * r.se(); offB = 2 * r.se()
        require(offA >= -12 && offA <= 12 && offB >= -12 && offB <= 12,
          "deblocking offsets")
      }
    }
    list0.foreach(rf => require(rf.w == st.w && rf.h == st.h, "reference dims"))
    val total = sps.mbWidth * sps.mbHeight
    if (!isP) {
      while (st.mbNext < total && r.moreRbsp()) {
        qp = decodeMb(r, st, pps, st.mbNext % sps.mbWidth,
          st.mbNext / sps.mbWidth, qp, r.ue())
        st.mbNext += 1
      }
    } else {
      while (st.mbNext < total && r.moreRbsp()) {
        var skipRun = r.ue()
        require(st.mbNext + skipRun <= total, "mb_skip_run overflow")
        while (skipRun > 0) {
          decodeMbSkip(st, list0, st.mbNext % sps.mbWidth,
            st.mbNext / sps.mbWidth, qp, wp)
          st.mbNext += 1; skipRun -= 1
        }
        if (st.mbNext < total && r.moreRbsp()) {
          val mbType = r.ue()
          require(mbType <= 30, s"mb_type $mbType invalid in P slice")
          qp =
            if (mbType >= 5)
              decodeMb(r, st, pps, st.mbNext % sps.mbWidth,
                st.mbNext / sps.mbWidth, qp, mbType - 5)
            else decodeMbP(r, st, pps, list0, numRefActive,
              st.mbNext % sps.mbWidth, st.mbNext / sps.mbWidth, mbType, qp, wp)
          st.mbNext += 1
        }
      }
    }
    require(st.mbNext > firstMb, "empty slice")
    if (st.mbNext == total)
      require(!r.moreRbsp(), "trailing data after last MB (desync?)")
    st.sliceDb += ((deblockIdc, offA, offB))
    (st, sps, pps)
  }

  /** Reference marking after a picture decodes (8.2.5): MMCO ops if
    * its slices carried them (short/long unmark, short-to-long
    * assignment, MaxLongTermFrameIdx truncation, unmark-all with the
    * frame_num-0 rule, current-to-long), else the sliding window over
    * the short-term refs. IDRs reset the buffer and may store
    * themselves long-term (long_term_reference_flag).
    */
  private def updateRefs(dpb: Dpb, st: FrameState, sps: Sps,
      idr: Boolean): Dpb = {
    if (idr) {
      return if (st.idrLongTerm) Dpb(Vector.empty, Map(0 -> st), 0)
      else Dpb(Vector(st), Map.empty, -1)
    }
    val maxFn = 1 << sps.log2MaxFrameNum
    def shortIdx(short: Vector[FrameState], picNumX: Int): Int =
      short.indexWhere { rf =>
        (if (rf.frameNum > st.frameNum) rf.frameNum - maxFn
        else rf.frameNum) == picNumX
      }
    var short = dpb.short
    var long = dpb.long
    var maxLongIdx = dpb.maxLongIdx
    var currLongIdx = -1 // MMCO-6: the current picture goes long-term
    st.mmco.foreach {
      case (1, diff, _) =>
        val idx = shortIdx(short, st.frameNum - diff)
        require(idx >= 0, "MMCO-1 target absent")
        short = short.patch(idx, Nil, 1)
      case (2, ltPicNum, _) =>
        require(long.contains(ltPicNum), "MMCO-2 target absent")
        long -= ltPicNum
      case (3, diff, ltIdx) =>
        require(ltIdx <= maxLongIdx, "MMCO-3 index beyond MaxLongTermFrameIdx")
        val idx = shortIdx(short, st.frameNum - diff)
        require(idx >= 0, "MMCO-3 target absent")
        long += ltIdx -> short(idx)
        short = short.patch(idx, Nil, 1)
      case (4, maxPlus1, _) =>
        maxLongIdx = maxPlus1 - 1
        long = long.filter(_._1 <= maxLongIdx)
      case (5, _, _) =>
        short = Vector.empty; long = Map.empty; maxLongIdx = -1
        st.frameNum = 0 // 8.2.5.4.5: the current picture takes 0
      case (6, ltIdx, _) =>
        require(ltIdx <= maxLongIdx, "MMCO-6 index beyond MaxLongTermFrameIdx")
        currLongIdx = ltIdx
      case _ => throw new IllegalStateException("mmco")
    }
    if (currLongIdx >= 0) long += currLongIdx -> st
    else short = st +: short
    // sliding window bounds the short-term refs; long-term pictures
    // count against the same total capacity (8.2.5.3)
    val cap = math.max(1, sps.maxNumRefFrames - long.size)
    Dpb(short.take(cap), long, maxLongIdx)
  }

  /** Split an Annex-B byte stream into (nalType, refIdc, rbsp) units. */
  private def splitAnnexB(b: Array[Byte]): Vector[(Int, Int, Array[Byte])] = {
    val out = Vector.newBuilder[(Int, Int, Array[Byte])]
    var i = 0
    val starts = Vector.newBuilder[Int]
    while (i + 2 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) { starts += (i + 3); i += 3 }
      else i += 1
    }
    val ss = starts.result()
    var k = 0
    while (k < ss.length) {
      val from = ss(k)
      var to = if (k + 1 < ss.length) ss(k + 1) - 3 else b.length
      // a 4-byte start code leaves one extra zero before the next 3-byte match
      while (to > from && b(to - 1) == 0) to -= 1
      if (to > from) {
        val hdr = b(from) & 0xff
        require((hdr & 0x80) == 0, "forbidden_zero_bit")
        out += (((hdr & 0x1f), (hdr >> 5) & 3, unescapeRbsp(b, from + 1, to)))
      }
      k += 1
    }
    out.result()
  }

  private def cropFrame(st: FrameState, sps: Sps): Yuv420 = {
    val w = sps.width; val h = sps.height
    require(sps.cropLeft == 0 && sps.cropTop == 0, "left/top cropping unsupported")
    val cw = w / 2; val ch = h / 2
    val y = new Array[Byte](w * h)
    var r = 0
    while (r < h) { System.arraycopy(st.y, r * st.w, y, r * w, w); r += 1 }
    val cb = new Array[Byte](cw * ch); val cr = new Array[Byte](cw * ch)
    r = 0
    while (r < ch) {
      System.arraycopy(st.cb, r * st.cw, cb, r * cw, cw)
      System.arraycopy(st.cr, r * st.cw, cr, r * cw, cw)
      r += 1
    }
    Yuv420(w, h, y, cb, cr)
  }

  /** Decode the first IDR picture of an Annex-B stream. Corrupt or
    * out-of-subset streams quarantine to None (never a partial frame).
    */
  def decodeYuv(annexB: Array[Byte]): Option[Yuv420] =
    decodeYuvFrames(annexB, maxFrames = 1).flatMap(_.headOption)

  /** Decode an Annex-B stream's pictures in decode order: the first
    * IDR and every following P picture (reference chain maintained by
    * decode recency, sliding window at the SPS's max_num_ref_frames).
    * Any undecodable or out-of-subset NAL quarantines the WHOLE
    * stream to None — never a partial or mis-predicted sequence.
    */
  def decodeYuvFrames(annexB: Array[Byte],
      maxFrames: Int = 4096): Option[Vector[Yuv420]] =
    try {
      var allSps: Map[Int, Sps] = Map.empty
      var allPps: Map[Int, Pps] = Map.empty
      var dpb = Dpb()
      var started = false
      val out = Vector.newBuilder[Yuv420]
      var n = 0
      val nals = splitAnnexB(annexB)
      var idx = 0
      while (idx < nals.length && n < maxFrames) {
        val (nalType, refIdc, rbsp) = nals(idx)
        nalType match {
          case 7 =>
            val sp = parseSps(new BitReader(rbsp)); allSps += sp.id -> sp
          case 8 =>
            val pp = parsePps(new BitReader(rbsp)); allPps += pp.id -> pp
          case 5 | 1 =>
            if (nalType == 5) { dpb = Dpb(); started = true }
            else require(started, "non-IDR slice before the first IDR")
            // a picture = consecutive slice NALs covering all MBs
            val (st, sps, pps) =
              decodeSliceInto(null, rbsp, refIdc, nalType, allSps, allPps, dpb)
            while (st.mbNext < sps.mbWidth * sps.mbHeight) {
              idx += 1
              require(idx < nals.length, "picture truncated: missing slices")
              val (nt2, ri2, rb2) = nals(idx)
              require(nt2 == nalType, "mixed NAL types inside a picture")
              decodeSliceInto(st, rb2, ri2, nt2, allSps, allPps, dpb)
            }
            deblockPicture(st, pps.chromaQpOffset)
            if (refIdc != 0) dpb = updateRefs(dpb, st, sps, idr = nalType == 5)
            out += cropFrame(st, sps)
            n += 1
          case _ => () // SEI / AUD / filler: ignored
        }
        idx += 1
      }
      val frames = out.result()
      if (frames.isEmpty) None else Some(frames)
    } catch { case NonFatal(_) => None }

  /** Decode one MP4/AVC sample (length-prefixed NAL units) using
    * out-of-band SPS/PPS NAL payloads (from an avcC record). Decodes
    * the sample's IDR picture only — mid-stream P samples need the
    * reference chain a stateful [[AvcDecoder]] carries.
    */
  def decodeAvcSample(spsNal: Array[Byte], ppsNal: Array[Byte],
      sample: Array[Byte], lengthSize: Int = 4): Option[Yuv420] =
    try {
      val sps = parseSps(new BitReader(unescapeRbsp(spsNal, 1, spsNal.length)))
      val pps = parsePps(new BitReader(unescapeRbsp(ppsNal, 1, ppsNal.length)))
      val allSps = Map(sps.id -> sps); val allPps = Map(pps.id -> pps)
      var st: FrameState = null
      var i = 0
      while (i + lengthSize <= sample.length) {
        var len = 0
        var k = 0
        while (k < lengthSize) { len = (len << 8) | (sample(i + k) & 0xff); k += 1 }
        i += lengthSize
        require(len > 0 && i + len <= sample.length, "NAL length")
        val hdr = sample(i) & 0xff
        if ((hdr & 0x1f) == 5) {
          val (st2, sps2, pps2) = decodeSliceInto(st,
            unescapeRbsp(sample, i + 1, i + len), (hdr >> 5) & 3, 5,
            allSps, allPps)
          st = st2
          if (st.mbNext == sps2.mbWidth * sps2.mbHeight) {
            deblockPicture(st, pps2.chromaQpOffset)
            return Some(cropFrame(st, sps2))
          }
        }
        i += len
      }
      None
    } catch { case NonFatal(_) => None }

  /** Stateful MP4/AVC sample decoder: feed samples in decode order
    * (one picture per sample); IDR samples reset the reference chain,
    * P samples predict against it. A failed sample returns None and
    * poisons every following sample until the next IDR — a broken
    * reference chain must never be predicted from. Construction
    * throws on a malformed SPS/PPS (callers quarantine).
    */
  final class AvcDecoder(spsNal: Array[Byte], ppsNal: Array[Byte],
      lengthSize: Int = 4) {
    private val sps = parseSps(new BitReader(unescapeRbsp(spsNal, 1, spsNal.length)))
    private val pps = parsePps(new BitReader(unescapeRbsp(ppsNal, 1, ppsNal.length)))
    private val allSps = Map(sps.id -> sps)
    private val allPps = Map(pps.id -> pps)
    private var dpb = Dpb()
    private var broken = true // nothing decodable until the first IDR

    def decodeSample(sample: Array[Byte]): Option[Yuv420] =
      try {
        var st: FrameState = null
        var picType = -1
        var picRefIdc = 0
        var i = 0
        while (i + lengthSize <= sample.length) {
          var len = 0
          var k = 0
          while (k < lengthSize) { len = (len << 8) | (sample(i + k) & 0xff); k += 1 }
          i += lengthSize
          require(len > 0 && i + len <= sample.length, "NAL length")
          val hdr = sample(i) & 0xff
          val nalType = hdr & 0x1f
          if (nalType == 5 || nalType == 1) {
            if (st == null) {
              if (nalType == 5) { dpb = Dpb(); broken = false }
              else require(!broken, "P sample on a broken reference chain")
              picType = nalType
              picRefIdc = (hdr >> 5) & 3
            } else require(nalType == picType, "mixed NAL types inside a picture")
            val (st2, sps2, pps2) = decodeSliceInto(st,
              unescapeRbsp(sample, i + 1, i + len), (hdr >> 5) & 3, nalType,
              allSps, allPps, dpb)
            st = st2
            if (st.mbNext == sps2.mbWidth * sps2.mbHeight) {
              deblockPicture(st, pps2.chromaQpOffset)
              if (picRefIdc != 0)
                dpb = updateRefs(dpb, st, sps2, idr = picType == 5)
              return Some(cropFrame(st, sps2))
            }
          }
          i += len
        }
        require(st == null, "sample ended with an incomplete picture")
        None
      } catch { case NonFatal(_) => broken = true; None }
  }

  // ---------------------------------------------------------------
  // Encoder
  // ---------------------------------------------------------------

  /** Encoded IDR frame: the Annex-B stream, the raw NAL units for MP4
    * framing (SPS/PPS for avcC, the IDR NAL for the sample payload),
    * and the reconstruction the decoder must reproduce bit-exactly.
    */
  final case class Encoded(annexB: Array[Byte], spsNal: Array[Byte],
      ppsNal: Array[Byte], idrNal: Array[Byte], recon: Yuv420)

  private def sad16(pred: Array[Int], src: Array[Byte], stride: Int,
      px: Int, py: Int, n: Int): Int = {
    var s = 0
    var i = 0
    while (i < n * n) {
      s += math.abs(pred(i) - (src((py + i / n) * stride + px + i % n) & 0xff))
      i += 1
    }
    s
  }

  /** Encode one frame as an IDR picture. Even dimensions only (4:2:0
    * cropping is expressed in 2-sample units). `forcePcm` emits every
    * macroblock as I_PCM — a lossless, hand-verifiable stream.
    */
  def encodeYuv(src: Yuv420, qp: Int = 28, forcePcm: Boolean = false): Encoded = {
    require(src.width > 0 && src.height > 0 &&
      src.width % 2 == 0 && src.height % 2 == 0,
      s"dims ${src.width}x${src.height}: 4:2:0 needs even sizes")
    require(qp >= 0 && qp <= 51, s"qp $qp")
    val mbW = (src.width + 15) / 16
    val mbH = (src.height + 15) / 16
    val st = new FrameState(mbW, mbH)
    val srcY = padPlane(src.y, src.width, src.height, st.w, st.h)
    val srcCb = padPlane(src.cb, src.chromaW, src.chromaH, st.cw, st.ch)
    val srcCr = padPlane(src.cr, src.chromaW, src.chromaH, st.cw, st.ch)

    val rbsp = encodeIdrSliceRbsp(st, srcY, srcCb, srcCr, qp, forcePcm)

    val spsW = new BitWriter
    writeSps(spsW, mbW, mbH, (mbW * 16 - src.width) / 2, (mbH * 16 - src.height) / 2)
    val ppsW = new BitWriter
    writePps(ppsW, qp)
    val spsNal = Array[Byte](0x67.toByte) ++ escapeRbsp(spsW.bytes)
    val ppsNal = Array[Byte](0x68.toByte) ++ escapeRbsp(ppsW.bytes)
    val idrNal = Array[Byte](0x65.toByte) ++ escapeRbsp(rbsp)
    val sc = Array[Byte](0, 0, 0, 1)
    val annexB = sc ++ spsNal ++ sc ++ ppsNal ++ sc ++ idrNal
    val sps = Sps(66, 30, 4, 2, 0, mbW, mbH,
      0, (mbW * 16 - src.width) / 2, 0, (mbH * 16 - src.height) / 2)
    Encoded(annexB, spsNal, ppsNal, idrNal, cropFrame(st, sps))
  }

  /** Write one IDR slice (header + `nMbs` MBs from `firstMb`) into
    * `st`; returns the RBSP bytes. Mirrors decodeSliceInto's I path
    * exactly; the caller runs the deblocking filter once the picture
    * is complete.
    */
  private def encodeIdrSliceRbsp(st: FrameState, srcY: Array[Byte],
      srcCb: Array[Byte], srcCr: Array[Byte], qp: Int,
      forcePcm: Boolean, dbIdc: Int = 1,
      firstMb: Int = 0, nMbs: Int = -1): Array[Byte] = {
    val count = if (nMbs < 0) st.mbW * st.mbH - firstMb else nMbs
    st.curSlice = st.sliceDb.length
    val w = new BitWriter
    w.ue(firstMb) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices in picture)
    w.ue(0) // pps_id
    w.putBits(0, 4) // frame_num, log2_max_frame_num = 4
    w.ue(0) // idr_pic_id
    w.put(0); w.put(0) // dec_ref_pic_marking: no_output_of_prior, long_term
    w.se(0) // slice_qp_delta (pic_init_qp carries the QP)
    if (dbIdc != 1) { w.ue(dbIdc); w.se(0); w.se(0) } // filter on, zero offsets
    else w.ue(1) // disable_deblocking_filter_idc = 1
    var mb = firstMb
    while (mb < firstMb + count) {
      val mbX = mb % st.mbW; val mbY = mb / st.mbW
      if (forcePcm) encodeMbPcm(w, st, srcY, srcCb, srcCr, mbX, mbY)
      else encodeMbIntra(w, st, srcY, srcCb, srcCr, mbX, mbY, qp)
      mb += 1
    }
    w.trailing()
    st.mbNext = firstMb + count
    st.sliceDb += ((dbIdc, 0, 0))
    w.bytes
  }

  // ---------------------------------------------------------------
  // P-frame encoder (inter prediction): motion search over all
  // partition shapes, P_Skip, intra fallback — reconstruction through
  // the decoder's own MC + residual pipeline, like the intra paths.
  // ---------------------------------------------------------------

  /** Edge-replicate a plane to the MB-padded size. */
  private def padPlane(p: Array[Byte], w: Int, h: Int, dw: Int, dh: Int): Array[Byte] = {
    val out = new Array[Byte](dw * dh)
    var y = 0
    while (y < dh) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < dw) { out(y * dw + x) = p(sy * w + math.min(x, w - 1)); x += 1 }
      y += 1
    }
    out
  }

  /** Bits of ue(k) / se(v) — for motion-cost estimates only. */
  @inline private def ueBits(k: Int): Int =
    2 * (31 - Integer.numberOfLeadingZeros(k + 1)) + 1
  @inline private def seBits(v: Int): Int =
    ueBits(if (v > 0) 2 * v - 1 else -2 * v)

  /** Full-pel SAD of the bw x bh luma block at (px,py) against the
    * clamped reference at offset (ox,oy).
    */
  private def fullSad(refY: Array[Byte], rw: Int, rh: Int, src: Array[Byte],
      px: Int, py: Int, bw: Int, bh: Int, ox: Int, oy: Int): Int = {
    var s = 0
    var y = 0
    while (y < bh) {
      val sy = clampI(py + oy + y, rh - 1) * rw
      var x = 0
      while (x < bw) {
        s += math.abs((refY(sy + clampI(px + ox + x, rw - 1)) & 0xff) -
          (src((py + y) * rw + px + x) & 0xff))
        x += 1
      }
      y += 1
    }
    s
  }

  /** Motion search for one partition: full-pel exhaustive around the
    * predictor (plus the zero vector), then half- and quarter-pel
    * refinement through the decoder's own interpolator. Returns
    * (mvx, mvy, sad) in quarter-pel units.
    */
  private def searchPart(refY: Array[Byte], searchRefY: Array[Byte],
      st: FrameState, src: Array[Byte],
      px: Int, py: Int, bw: Int, bh: Int, mpx: Int, mpy: Int,
      range: Int, wp: RefWeights): (Int, Int, Int) = {
    val cx = mpx >> 2; val cy = mpy >> 2
    var bestX = 0; var bestY = 0
    var bestS = fullSad(searchRefY, st.w, st.h, src, px, py, bw, bh, 0, 0)
    var dy = -range
    while (dy <= range) {
      var dx = -range
      while (dx <= range) {
        val s = fullSad(searchRefY, st.w, st.h, src, px, py, bw, bh, cx + dx, cy + dy)
        if (s < bestS) { bestS = s; bestX = cx + dx; bestY = cy + dy }
        dx += 1
      }
      dy += 1
    }
    var qx = bestX * 4; var qy = bestY * 4
    val tmp = new Array[Int](bw * bh)
    def sadQ(mx: Int, my: Int): Int = {
      mcLuma(refY, st.w, st.h, px, py, mx, my, bw, bh, tmp, 0, bw)
      if (wp != null) applyWeights(tmp, 0, bw, bw, bh, wp.wY(0), wp.oY(0), wp.lwd)
      var s = 0
      var i = 0
      while (i < bw * bh) {
        s += math.abs(tmp(i) - (src((py + i / bw) * st.w + px + i % bw) & 0xff))
        i += 1
      }
      s
    }
    var step = 2
    while (step >= 1) {
      var bx = 0; var by = 0; var bs = bestS
      var d = 0
      val dirs = Array((step, 0), (-step, 0), (0, step), (0, -step),
        (step, step), (step, -step), (-step, step), (-step, -step))
      while (d < dirs.length) {
        val s = sadQ(qx + dirs(d)._1, qy + dirs(d)._2)
        if (s < bs) { bs = s; bx = dirs(d)._1; by = dirs(d)._2 }
        d += 1
      }
      if (bs < bestS) { bestS = bs; qx += bx; qy += by }
      step -= 1
    }
    @inline def clampMv(v: Int): Int =
      math.max(-(1 << 13), math.min(1 << 13, v))
    (clampMv(qx), clampMv(qy), bestS)
  }

  /** One planned inter partition: grid geometry (4x4 units), the
    * mvPred shape selector, and the chosen quarter-pel vector.
    */
  private final case class PartPlan(dx: Int, dy: Int, w4: Int, h4: Int,
      shape: Int, mx: Int, my: Int)

  /** True iff the MB quantizes to an exact P_Skip at the skip vector
    * (all luma, chroma-DC and chroma-AC levels zero).
    */
  private def trySkip(st: FrameState, ref: FrameState, srcY: Array[Byte],
      srcCb: Array[Byte], srcCr: Array[Byte], mbX: Int, mbY: Int, qp: Int,
      wp: RefWeights): Boolean = {
    val (mx, my) = skipMv(st, mbX, mbY)
    val predY = new Array[Int](256)
    mcLuma(ref.y, st.w, st.h, mbX * 16, mbY * 16, mx, my, 16, 16, predY, 0, 16)
    if (wp != null) applyWeights(predY, 0, 16, 16, 16, wp.wY(0), wp.oY(0), wp.lwd)
    val blk = new Array[Int](16)
    var k = 0
    while (k < 16) {
      val ox = (k & 3) * 4; val oy = (k >> 2) * 4
      var i = 0
      while (i < 16) {
        val x = ox + (i & 3); val y = oy + (i >> 2)
        blk(i) = (srcY((mbY * 16 + y) * st.w + mbX * 16 + x) & 0xff) - predY(y * 16 + x)
        i += 1
      }
      fdct4(blk)
      i = 0
      while (i < 16) {
        val pos = Zig4(i)
        if (quant(blk(pos), pos, qp) != 0) return false
        i += 1
      }
      k += 1
    }
    val qpc = chromaQp(qp, 0)
    val predC = new Array[Int](64)
    var pi = 0
    while (pi < 2) {
      val (sp, rp) = if (pi == 0) (srcCb, ref.cb) else (srcCr, ref.cr)
      mcChroma(rp, st.cw, st.ch, mbX * 8, mbY * 8, mx, my, 8, 8, predC, 0, 8)
      if (wp != null) applyWeights(predC, 0, 8, 8, 8,
        if (pi == 0) wp.wCb(0) else wp.wCr(0),
        if (pi == 0) wp.oCb(0) else wp.oCr(0), wp.cwd)
      val dcRaw = new Array[Int](4)
      var b = 0
      while (b < 4) {
        val ox = (b & 1) * 4; val oy = (b >> 1) * 4
        var i = 0
        while (i < 16) {
          val x = ox + (i & 3); val y = oy + (i >> 2)
          blk(i) = (sp((mbY * 8 + y) * st.cw + mbX * 8 + x) & 0xff) - predC(y * 8 + x)
          i += 1
        }
        fdct4(blk)
        dcRaw(b) = blk(0)
        i = 1
        while (i < 16) {
          val pos = Zig4(i)
          if (quant(blk(pos), pos, qpc) != 0) return false
          i += 1
        }
        b += 1
      }
      hadamard2(dcRaw)
      b = 0
      while (b < 4) { if (quantDc(dcRaw(b), qpc) != 0) return false; b += 1 }
      pi += 1
    }
    true
  }

  /** Choose the best inter shape for one MB by SAD + lambda·mvd-bits.
    * Commits trial motion to the grid (exact mvp chaining between
    * partitions) and fully restores it before returning; the caller's
    * encode pass re-commits the winning plan.
    * Returns (cost, mb_type 0..3, partition plans in decode order).
    */
  private def planInter(st: FrameState, ref: FrameState,
      searchRefY: Array[Byte], srcY: Array[Byte],
      mbX: Int, mbY: Int, qp: Int, searchRange: Int,
      wp: RefWeights): (Int, Int, Vector[PartPlan]) = {
    val bx0 = mbX * 4; val by0 = mbY * 4
    val lambda = 1 << math.max(0, (qp - 12) / 6)
    val savedMx = new Array[Int](16)
    val savedMy = new Array[Int](16)
    val savedRef = new Array[Int](16)
    def snapshot(): Unit = {
      var k = 0
      while (k < 16) {
        val i = (by0 + (k >> 2)) * st.bW + bx0 + (k & 3)
        savedMx(k) = st.mvX(i); savedMy(k) = st.mvY(i); savedRef(k) = st.refL0(i)
        k += 1
      }
    }
    def restore(): Unit = {
      var k = 0
      while (k < 16) {
        val i = (by0 + (k >> 2)) * st.bW + bx0 + (k & 3)
        st.mvX(i) = savedMx(k); st.mvY(i) = savedMy(k); st.refL0(i) = savedRef(k)
        k += 1
      }
    }
    snapshot()
    // search + cost one partition list in order, committing motion
    def planParts(parts: Seq[Array[Int]]): (Int, Vector[PartPlan]) = {
      var cost = 0
      val out = Vector.newBuilder[PartPlan]
      parts.foreach { case Array(dx, dy, w4, h4, shape) =>
        val (mpx, mpy) = mvPred(st, bx0 + dx, by0 + dy, w4, 0, shape)
        val (mx, my, sad) = searchPart(ref.y, searchRefY, st, srcY,
          mbX * 16 + dx * 4, mbY * 16 + dy * 4, w4 * 4, h4 * 4, mpx, mpy,
          searchRange, wp)
        cost += sad + lambda * (seBits(mx - mpx) + seBits(my - mpy))
        st.setMotion(bx0 + dx, by0 + dy, w4, h4, mx, my, 0)
        out += PartPlan(dx, dy, w4, h4, shape, mx, my)
      }
      (cost, out.result())
    }
    var bestCost = Int.MaxValue
    var bestType = 0
    var bestParts = Vector.empty[PartPlan]
    val shapes = Seq(
      (0, Seq(Array(0, 0, 4, 4, 0))),
      (1, Seq(Array(0, 0, 4, 2, 1), Array(0, 2, 4, 2, 2))),
      (2, Seq(Array(0, 0, 2, 4, 3), Array(2, 0, 2, 4, 4))))
    shapes.foreach { case (t, parts) =>
      val (c, pl) = planParts(parts)
      val cT = c + lambda * ueBits(t)
      if (cT < bestCost) { bestCost = cT; bestType = t; bestParts = pl }
      restore()
    }
    // P_8x8: per 8x8 choose the best sub shape; chosen sub-partitions
    // stay committed while planning the next 8x8 (exact mvp chaining)
    locally {
      var cost = lambda * ueBits(3)
      val all = Vector.newBuilder[PartPlan]
      val sub8Mx = new Array[Int](4); val sub8My = new Array[Int](4)
      val sub8Ref = new Array[Int](4)
      var i = 0
      while (i < 4) {
        val ox = (i & 1) * 2; val oy = (i >> 1) * 2
        // snapshot just this 8x8's cells between sub-shape trials
        var k = 0
        while (k < 4) {
          val gi = (by0 + oy + (k >> 1)) * st.bW + bx0 + ox + (k & 1)
          sub8Mx(k) = st.mvX(gi); sub8My(k) = st.mvY(gi); sub8Ref(k) = st.refL0(gi)
          k += 1
        }
        def restore8(): Unit = {
          var k2 = 0
          while (k2 < 4) {
            val gi = (by0 + oy + (k2 >> 1)) * st.bW + bx0 + ox + (k2 & 1)
            st.mvX(gi) = sub8Mx(k2); st.mvY(gi) = sub8My(k2); st.refL0(gi) = sub8Ref(k2)
            k2 += 1
          }
        }
        val subShapes = Seq(
          (0, Seq(Array(ox, oy, 2, 2, 0))),
          (1, Seq(Array(ox, oy, 2, 1, 0), Array(ox, oy + 1, 2, 1, 0))),
          (2, Seq(Array(ox, oy, 1, 2, 0), Array(ox + 1, oy, 1, 2, 0))),
          (3, Seq(Array(ox, oy, 1, 1, 0), Array(ox + 1, oy, 1, 1, 0),
            Array(ox, oy + 1, 1, 1, 0), Array(ox + 1, oy + 1, 1, 1, 0))))
        var bSub = Int.MaxValue
        var bSubParts = Vector.empty[PartPlan]
        subShapes.foreach { case (t, parts) =>
          val (c, pl) = planParts(parts)
          val cT = c + lambda * ueBits(t)
          if (cT < bSub) { bSub = cT; bSubParts = pl }
          restore8()
        }
        // re-commit the winning sub shape for the next 8x8's mvp context
        bSubParts.foreach(p =>
          st.setMotion(bx0 + p.dx, by0 + p.dy, p.w4, p.h4, p.mx, p.my, 0))
        cost += bSub
        all ++= bSubParts
        i += 1
      }
      if (cost < bestCost) { bestCost = cost; bestType = 3; bestParts = all.result() }
      restore()
    }
    (bestCost, bestType, bestParts)
  }

  /** Serialize one inter MB (mb_type, sub types, mvds, residual) and
    * reconstruct it decoder-identically.
    */
  private def encodeMbPInter(w: BitWriter, st: FrameState, ref: FrameState,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      mbX: Int, mbY: Int, qp: Int, mbTypeP: Int, parts: Vector[PartPlan],
      wp: RefWeights): Unit = {
    st.markMb(mbX, mbY)
    st.qpMb(mbY * st.mbW + mbX) = qp
    val bx0 = mbX * 4; val by0 = mbY * 4
    val px0 = mbX * 16; val py0 = mbY * 16
    val predY = new Array[Int](256)
    val predC = Array.ofDim[Int](2, 64)
    w.ue(mbTypeP)
    if (mbTypeP == 3) {
      var i = 0
      while (i < 4) {
        val ox = (i & 1) * 2; val oy = (i >> 1) * 2
        val p0 = parts.find(p => p.dx == ox && p.dy == oy).get
        w.ue((p0.w4, p0.h4) match {
          case (2, 2) => 0
          case (2, 1) => 1
          case (1, 2) => 2
          case _ => 3
        })
        i += 1
      }
    }
    // single-reference stream: no ref_idx_l0 syntax. Derive mvds in
    // partition order, committing motion exactly as the decoder will.
    val mvds = parts.map { p =>
      val (mpx, mpy) = mvPred(st, bx0 + p.dx, by0 + p.dy, p.w4, 0, p.shape)
      st.setMotion(bx0 + p.dx, by0 + p.dy, p.w4, p.h4, p.mx, p.my, 0)
      mcLuma(ref.y, st.w, st.h, px0 + p.dx * 4, py0 + p.dy * 4, p.mx, p.my,
        p.w4 * 4, p.h4 * 4, predY, p.dy * 4 * 16 + p.dx * 4, 16)
      mcChroma(ref.cb, st.cw, st.ch, mbX * 8 + p.dx * 2, mbY * 8 + p.dy * 2,
        p.mx, p.my, p.w4 * 2, p.h4 * 2, predC(0), p.dy * 2 * 8 + p.dx * 2, 8)
      mcChroma(ref.cr, st.cw, st.ch, mbX * 8 + p.dx * 2, mbY * 8 + p.dy * 2,
        p.mx, p.my, p.w4 * 2, p.h4 * 2, predC(1), p.dy * 2 * 8 + p.dx * 2, 8)
      if (wp != null) {
        applyWeights(predY, p.dy * 4 * 16 + p.dx * 4, 16, p.w4 * 4, p.h4 * 4,
          wp.wY(0), wp.oY(0), wp.lwd)
        applyWeights(predC(0), p.dy * 2 * 8 + p.dx * 2, 8, p.w4 * 2, p.h4 * 2,
          wp.wCb(0), wp.oCb(0), wp.cwd)
        applyWeights(predC(1), p.dy * 2 * 8 + p.dx * 2, 8, p.w4 * 2, p.h4 * 2,
          wp.wCr(0), wp.oCr(0), wp.cwd)
      }
      (p.mx - mpx, p.my - mpy)
    }
    mvds.foreach { case (dx, dy) => w.se(dx); w.se(dy) }
    // luma levels + cbp
    val blk = new Array[Int](16)
    val levels = Array.ofDim[Int](16, 16)
    var cbpL = 0
    var k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      var i = 0
      while (i < 16) {
        val x = px0 + zx * 4 + (i & 3); val y = py0 + zy * 4 + (i >> 2)
        blk(i) = (srcY(y * st.w + x) & 0xff) -
          predY((zy * 4 + (i >> 2)) * 16 + zx * 4 + (i & 3))
        i += 1
      }
      fdct4(blk)
      i = 0
      while (i < 16) {
        val pos = Zig4(i)
        levels(k)(i) = quant(blk(pos), pos, qp)
        i += 1
      }
      if (levels(k).exists(_ != 0)) cbpL |= 1 << ((zy >> 1) * 2 + (zx >> 1))
      k += 1
    }
    val (cbpChroma, _, dcCb, dcCr, acCb, acCr) =
      encodeChroma(st, srcCb, srcCr, mbX, mbY, qp, interPred = predC)
    val cbp = cbpL | (cbpChroma << 4)
    w.ue(CbpInterInv(cbp))
    if (cbp != 0) w.se(0) // mb_qp_delta
    k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      val bx = bx0 + zx; val by = by0 + zy
      val b8 = (zy >> 1) * 2 + (zx >> 1)
      val coded = (cbp & (1 << b8)) != 0
      if (coded) writeResidual(w, st.lumaNc(bx, by), 16, levels(k))
      val tc = if (coded) levels(k).count(_ != 0) else 0
      st.tcY(by * st.bW + bx) = tc
      st.modeY(by * st.bW + bx) = 2
      if (tc > 0) {
        dequantFull(levels(k), qp, blk)
        idct4(blk)
        reconBlock(st.y, st.w, px0 + zx * 4, py0 + zy * 4,
          predY, zy * 4 * 16 + zx * 4, 16, blk)
      } else writePredBlock(st.y, st.w, px0 + zx * 4, py0 + zy * 4,
        predY, zy * 4 * 16 + zx * 4, 16)
      k += 1
    }
    writeChromaResidual(w, st, mbX, mbY, cbpChroma, dcCb, dcCr, acCb, acCr)
  }

  /** Write one P slice (header + all MBs) into `st` predicting against
    * `ref`; returns the RBSP bytes. Mirrors decodeSlice's P path.
    */
  private def encodePSliceRbsp(st: FrameState, ref: FrameState,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      qp: Int, frameNum: Int, searchRange: Int,
      modes: scala.collection.mutable.Map[String, Int],
      dbIdc: Int = 1, wp: RefWeights = null,
      firstMb: Int = 0, nMbs: Int = -1): Array[Byte] = {
    val count = if (nMbs < 0) st.mbW * st.mbH - firstMb else nMbs
    st.curSlice = st.sliceDb.length
    val w = new BitWriter
    w.ue(firstMb) // first_mb_in_slice
    w.ue(5) // slice_type: P (all slices in picture)
    w.ue(0) // pps_id
    w.putBits(frameNum & 15, 4)
    w.put(0) // num_ref_idx_active_override_flag
    w.put(0) // ref_pic_list_modification_flag_l0
    if (wp != null) { // pred_weight_table (the PPS declared WP)
      w.ue(wp.lwd); w.ue(wp.cwd)
      if (wp.wY(0) == (1 << wp.lwd) && wp.oY(0) == 0) w.put(0)
      else { w.put(1); w.se(wp.wY(0)); w.se(wp.oY(0)) }
      w.put(0) // chroma_weight_l0_flag: identity (luma-only weighting)
    }
    w.put(0) // adaptive_ref_pic_marking_mode_flag (sliding window)
    w.se(0) // slice_qp_delta
    if (dbIdc != 1) { w.ue(dbIdc); w.se(0); w.se(0) } // filter on, zero offsets
    else w.ue(1) // disable_deblocking_filter_idc = 1
    val refs = IndexedSeq(ref)
    val lambda = 1 << math.max(0, (qp - 12) / 6)
    val pred256 = new Array[Int](256)
    // full-pel search plane: the reference pre-transformed by the luma
    // weights (decision-only approximation; subpel and recon apply the
    // exact post-interpolation weighting)
    val searchRefY =
      if (wp == null || (wp.wY(0) == (1 << wp.lwd) && wp.oY(0) == 0)) ref.y
      else {
        val t = new Array[Byte](ref.y.length)
        val half = if (wp.lwd > 0) 1 << (wp.lwd - 1) else 0
        var i = 0
        while (i < t.length) {
          t(i) = clip255((((ref.y(i) & 0xff) * wp.wY(0) + half) >> wp.lwd) + wp.oY(0)).toByte
          i += 1
        }
        t
      }
    var skipRun = 0
    var mb = firstMb
    while (mb < firstMb + count) {
      val mbX = mb % st.mbW; val mbY = mb / st.mbW
      if (trySkip(st, ref, srcY, srcCb, srcCr, mbX, mbY, qp, wp)) {
        decodeMbSkip(st, refs, mbX, mbY, qp, wp)
        skipRun += 1
        modes("P_Skip") += 1
      } else {
        val (interCost, mbTypeP, parts) =
          planInter(st, ref, searchRefY, srcY, mbX, mbY, qp, searchRange, wp)
        // intra fallback estimate: best whole-MB I_16x16 prediction
        val aL = mbX > 0 && st.mbUsable(mbX - 1, mbY)
        val aT = mbY > 0 && st.mbUsable(mbX, mbY - 1)
        val cand = Seq(2) ++ (if (aT) Seq(0) else Nil) ++
          (if (aL) Seq(1) else Nil) ++ (if (aL && aT) Seq(3) else Nil)
        val intraSad = cand.map { m =>
          predict16(st.y, st.w, mbX * 16, mbY * 16, m, aL, aT, pred256)
          sad16(pred256, srcY, st.w, mbX * 16, mbY * 16, 16)
        }.min
        w.ue(skipRun); skipRun = 0
        if (intraSad + lambda * 48 < interCost) {
          encodeMbIntra(w, st, srcY, srcCb, srcCr, mbX, mbY, qp, typeOffset = 5)
          modes("I_in_P") += 1
        } else {
          encodeMbPInter(w, st, ref, srcY, srcCb, srcCr, mbX, mbY, qp,
            mbTypeP, parts, wp)
          modes(mbTypeP match {
            case 0 => "P_16x16"
            case 1 => "P_16x8"
            case 2 => "P_8x16"
            case _ => "P_8x8"
          }) += 1
          if (mbTypeP == 3) parts.foreach { p =>
            modes((p.w4, p.h4) match {
              case (2, 2) => "sub_8x8"
              case (2, 1) => "sub_8x4"
              case (1, 2) => "sub_4x8"
              case _ => "sub_4x4"
            }) += 1
          }
        }
      }
      mb += 1
    }
    if (skipRun > 0) w.ue(skipRun)
    w.trailing()
    st.mbNext = firstMb + count
    st.sliceDb += ((dbIdc, 0, 0))
    w.bytes
  }

  /** One frame of [[encodeSequence]]: the slice NALs (one per slice,
    * ready for MP4 sample framing — `nal` when single-slice), the sync
    * flag, the decoder-identical reconstruction, and the MB-mode
    * histogram (spec coverage accounting; empty for IDR frames).
    */
  final case class EncodedFrame(nals: Vector[Array[Byte]], idr: Boolean,
      recon: Yuv420, mbModes: Map[String, Int]) {
    /** The frame's single NAL (callers framing one NAL per sample). */
    def nal: Array[Byte] = {
      require(nals.length == 1, s"frame has ${nals.length} slices")
      nals.head
    }
  }

  /** An encoded GOP sequence: shared SPS/PPS (max_num_ref_frames = 1)
    * and the per-frame slice NALs.
    */
  final case class EncodedSeq(spsNal: Array[Byte], ppsNal: Array[Byte],
      frames: Vector[EncodedFrame]) {
    /** The whole sequence as one Annex-B stream. */
    def annexB: Array[Byte] = {
      val sc = Array[Byte](0, 0, 0, 1)
      val b = Array.newBuilder[Byte]
      b ++= sc; b ++= spsNal; b ++= sc; b ++= ppsNal
      frames.foreach(_.nals.foreach { n => b ++= sc; b ++= n })
      b.result()
    }
  }

  /** Encode a GOP sequence: an IDR every `gop` frames, P frames in
    * between predicting the immediately previous reconstruction
    * (single-reference sliding window, the chain [[decodeYuvFrames]]
    * and [[AvcDecoder]] maintain). Same structural oracle as
    * [[encodeYuv]]: every frame's `recon` is produced through the
    * decoder's own prediction/MC/residual pipeline, so decoding the
    * stream must reproduce it bit-exactly.
    */
  def encodeSequence(srcFrames: Seq[Yuv420], qp: Int = 28, gop: Int = 12,
      searchRange: Int = 4, deblock: Boolean = false,
      weighted: Boolean = false, slices: Int = 1,
      deblockAcrossSlices: Boolean = true): EncodedSeq = {
    require(srcFrames.nonEmpty, "empty sequence")
    require(qp >= 0 && qp <= 51, s"qp $qp")
    require(gop >= 1, "gop")
    require(slices >= 1, "slices")
    require(searchRange >= 1 && searchRange <= 16, "searchRange")
    val head = srcFrames.head
    require(head.width > 0 && head.height > 0 &&
      head.width % 2 == 0 && head.height % 2 == 0,
      s"dims ${head.width}x${head.height}: 4:2:0 needs even sizes")
    require(srcFrames.forall(f => f.width == head.width && f.height == head.height),
      "all frames must share dimensions")
    val mbW = (head.width + 15) / 16
    val mbH = (head.height + 15) / 16
    val sps = Sps(66, 30, 4, 2, 0, mbW, mbH,
      0, (mbW * 16 - head.width) / 2, 0, (mbH * 16 - head.height) / 2)
    val spsW = new BitWriter
    writeSps(spsW, mbW, mbH, sps.cropRight, sps.cropBottom, numRefFrames = 1)
    val ppsW = new BitWriter
    writePps(ppsW, qp, weightedPred = weighted)
    val spsNal = Array[Byte](0x67.toByte) ++ escapeRbsp(spsW.bytes)
    val ppsNal = Array[Byte](0x68.toByte) ++ escapeRbsp(ppsW.bytes)
    // fade detector (x264-weightp style): least-squares luma gain+bias
    // of the source against the reference recon; identity when the
    // match is already linear-free
    def lumaWeights(refY: Array[Byte], srcY: Array[Byte]): RefWeights = {
      var sR = 0.0; var sS = 0.0
      var i = 0
      while (i < refY.length) { sR += refY(i) & 0xff; sS += srcY(i) & 0xff; i += 1 }
      val mR = sR / refY.length; val mS = sS / srcY.length
      var vR = 0.0; var vS = 0.0
      i = 0
      while (i < refY.length) {
        val dR = (refY(i) & 0xff) - mR; val dS = (srcY(i) & 0xff) - mS
        vR += dR * dR; vS += dS * dS
        i += 1
      }
      var wY = if (vR < 1e-9) 64 else math.round(64.0 * math.sqrt(vS / vR)).toInt
      wY = clip3(1, 127, wY)
      var oY = clip3(-128, 127, math.round(mS - wY * mR / 64.0).toInt)
      // enable only when the mapping genuinely beats identity: a >=10%
      // global L1 reduction (the x264 cost gate) — statistical drift
      // from panning content must not trigger spurious weights
      if (wY != 64 || oY != 0) {
        var idErr = 0L; var wpErr = 0L
        i = 0
        while (i < refY.length) {
          val r0 = refY(i) & 0xff; val s0 = srcY(i) & 0xff
          idErr += math.abs(s0 - r0)
          wpErr += math.abs(s0 - clip255(((r0 * wY + 32) >> 6) + oY))
          i += 1
        }
        if (wpErr * 10 >= idErr * 9) { wY = 64; oY = 0 }
      }
      RefWeights(6, 6, Array(wY), Array(oY),
        Array(64), Array(0), Array(64), Array(0))
    }
    var prev: FrameState = null
    var frameNum = 0
    val frames = srcFrames.iterator.zipWithIndex.map { case (src, i) =>
      val st = new FrameState(mbW, mbH)
      val srcY = padPlane(src.y, src.width, src.height, st.w, st.h)
      val srcCb = padPlane(src.cb, src.chromaW, src.chromaH, st.cw, st.ch)
      val srcCr = padPlane(src.cr, src.chromaW, src.chromaH, st.cw, st.ch)
      val idr = i % gop == 0
      // contiguous MB-range slices (constrained baseline: raster order)
      val total = mbW * mbH
      val nSlices = math.min(slices, total)
      val dbIdc = if (!deblock) 1 else if (deblockAcrossSlices) 0 else 2
      val bounds = (0 until nSlices).map { k =>
        val a = k * total / nSlices; val b = (k + 1) * total / nSlices
        (a, b - a)
      }
      val (nals, histo) =
        if (idr) {
          frameNum = 0
          val ns = bounds.map { case (a, n0) =>
            Array[Byte](0x65.toByte) ++ escapeRbsp(encodeIdrSliceRbsp(
              st, srcY, srcCb, srcCr, qp, forcePcm = false,
              dbIdc = dbIdc, firstMb = a, nMbs = n0))
          }.toVector
          (ns, Map.empty[String, Int])
        } else {
          val modes = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
          val wp = if (weighted) lumaWeights(prev.y, srcY) else null
          if (wp != null && (wp.wY(0) != 64 || wp.oY(0) != 0)) {
            modes("WP") += 1
            modes("WP_w") = wp.wY(0); modes("WP_o") = wp.oY(0)
          }
          val ns = bounds.map { case (a, n0) =>
            Array[Byte](0x41.toByte) ++ escapeRbsp(encodePSliceRbsp(
              st, prev, srcY, srcCb, srcCr, qp, frameNum, searchRange,
              modes, dbIdc = dbIdc, wp = wp, firstMb = a, nMbs = n0))
          }.toVector
          (ns, modes.toMap)
        }
      if (deblock) deblockPicture(st, 0) // recon = what the decoder shows
      prev = st
      frameNum = (frameNum + 1) & 15
      EncodedFrame(nals, idr, cropFrame(st, sps), histo)
    }.toVector
    EncodedSeq(spsNal, ppsNal, frames)
  }

  private def encodeMbPcm(w: BitWriter, st: FrameState,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      mbX: Int, mbY: Int, typeOffset: Int = 0): Unit = {
    st.markIntra(mbX, mbY)
    st.markMb(mbX, mbY)
    st.qpMb(mbY * st.mbW + mbX) = 0 // I_PCM deblocks at QP 0
    w.ue(25 + typeOffset)
    w.align() // pcm_alignment_zero_bit
    var i = 0
    while (i < 256) {
      val v = srcY((mbY * 16 + (i >> 4)) * st.w + mbX * 16 + (i & 15)) & 0xff
      w.putBits(v, 8)
      st.y((mbY * 16 + (i >> 4)) * st.w + mbX * 16 + (i & 15)) = v.toByte
      i += 1
    }
    var pi = 0
    while (pi < 2) {
      val (sp, dp) = if (pi == 0) (srcCb, st.cb) else (srcCr, st.cr)
      i = 0
      while (i < 64) {
        val o = (mbY * 8 + (i >> 3)) * st.cw + mbX * 8 + (i & 7)
        w.putBits(sp(o) & 0xff, 8)
        dp(o) = sp(o)
        i += 1
      }
      pi += 1
    }
    var k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      st.tcY((mbY * 4 + zy) * st.bW + mbX * 4 + zx) = 16
      st.modeY((mbY * 4 + zy) * st.bW + mbX * 4 + zx) = 2
      k += 1
    }
    k = 0
    while (k < 4) {
      st.tcCb((mbY * 2 + (k >> 1)) * st.cbW + mbX * 2 + (k & 1)) = 16
      st.tcCr((mbY * 2 + (k >> 1)) * st.cbW + mbX * 2 + (k & 1)) = 16
      k += 1
    }
  }

  /** Chroma encode shared by the intra MB paths and the inter path:
    * intra mode selection (or the caller's MC prediction via
    * `interPred`), 2x2-Hadamard DC + AC quantization,
    * decoder-identical recon.
    * Returns (cbpChroma, chromaMode, dcCb, dcCr, acCb, acCr).
    */
  private def encodeChroma(st: FrameState, srcCb: Array[Byte], srcCr: Array[Byte],
      mbX: Int, mbY: Int, qp: Int,
      interPred: Array[Array[Int]] = null): (Int, Int, Array[Int], Array[Int],
      Array[Array[Int]], Array[Array[Int]]) = {
    val qpc = chromaQp(qp, 0)
    val cpx0 = mbX * 8; val cpy0 = mbY * 8
    val aL = mbX > 0 && st.mbUsable(mbX - 1, mbY)
    val aT = mbY > 0 && st.mbUsable(mbX, mbY - 1)
    // mode selection: best summed SAD over both planes among valid modes
    val candidates = Seq(0) ++ (if (aL) Seq(1) else Nil) ++
      (if (aT) Seq(2) else Nil) ++ (if (aL && aT) Seq(3) else Nil)
    val pred = new Array[Int](64)
    val chromaMode = if (interPred != null) 0 else candidates.minBy { m =>
      predictChroma8(st.cb, st.cw, cpx0, cpy0, m, aL, aT, pred)
      val s1 = sad16(pred, srcCb, st.cw, cpx0, cpy0, 8)
      predictChroma8(st.cr, st.cw, cpx0, cpy0, m, aL, aT, pred)
      s1 + sad16(pred, srcCr, st.cw, cpx0, cpy0, 8)
    }
    // per plane: FDCT blocks, split DC (2x2 Hadamard) and AC
    val dcLevels = Array.ofDim[Int](2, 4)
    val acLevels = Array.ofDim[Int](2, 4, 15)
    val predP = Array.ofDim[Int](2, 64)
    val blk = new Array[Int](16)
    var pi = 0
    while (pi < 2) {
      val (sp, plane) = if (pi == 0) (srcCb, st.cb) else (srcCr, st.cr)
      if (interPred != null) System.arraycopy(interPred(pi), 0, predP(pi), 0, 64)
      else predictChroma8(plane, st.cw, cpx0, cpy0, chromaMode, aL, aT, predP(pi))
      val dcRaw = new Array[Int](4)
      var b = 0
      while (b < 4) {
        val ox = (b & 1) * 4; val oy = (b >> 1) * 4
        var i = 0
        while (i < 16) {
          val x = ox + (i & 3); val y = oy + (i >> 2)
          blk(i) = (sp((cpy0 + y) * st.cw + cpx0 + x) & 0xff) - predP(pi)(y * 8 + x)
          i += 1
        }
        fdct4(blk)
        dcRaw(b) = blk(0)
        i = 0
        while (i < 15) {
          val pos = Zig4(i + 1)
          acLevels(pi)(b)(i) = quant(blk(pos), pos, qpc)
          i += 1
        }
        b += 1
      }
      hadamard2(dcRaw)
      b = 0
      while (b < 4) { dcLevels(pi)(b) = quantDc(dcRaw(b), qpc); b += 1 }
      pi += 1
    }
    val anyDc = dcLevels.exists(_.exists(_ != 0))
    val anyAc = acLevels.exists(_.exists(_.exists(_ != 0)))
    val cbpChroma = if (anyAc) 2 else if (anyDc) 1 else 0
    if (cbpChroma < 2) { // dropped AC must not enter the reconstruction
      var p = 0
      while (p < 2) {
        var b = 0
        while (b < 4) { java.util.Arrays.fill(acLevels(p)(b), 0); b += 1 }
        p += 1
      }
    }
    // decoder-identical reconstruction
    pi = 0
    while (pi < 2) {
      val (plane, tcArr) = if (pi == 0) (st.cb, st.tcCb) else (st.cr, st.tcCr)
      val dc = dcLevels(pi).clone()
      hadamard2(dc)
      var i = 0
      while (i < 4) { dc(i) = dequantChromaDc(dc(i), qpc); i += 1 }
      var b = 0
      while (b < 4) {
        val cx = mbX * 2 + (b & 1); val cy = mbY * 2 + (b >> 1)
        tcArr(cy * st.cbW + cx) = acLevels(pi)(b).count(_ != 0)
        dequantAcDc(acLevels(pi)(b), dc(b), qpc, blk)
        idct4(blk)
        reconBlock(plane, st.cw, cpx0 + (b & 1) * 4, cpy0 + (b >> 1) * 4,
          predP(pi), (b >> 1) * 4 * 8 + (b & 1) * 4, 8, blk)
        b += 1
      }
      pi += 1
    }
    (cbpChroma, chromaMode, dcLevels(0), dcLevels(1), acLevels(0), acLevels(1))
  }

  /** Serialize the chroma residual (DC then AC per plane) — contexts
    * read the tc arrays the same way the decoder does.
    */
  private def writeChromaResidual(w: BitWriter, st: FrameState, mbX: Int, mbY: Int,
      cbpChroma: Int, dcCb: Array[Int], dcCr: Array[Int],
      acCb: Array[Array[Int]], acCr: Array[Array[Int]]): Unit = {
    if (cbpChroma != 0) {
      writeResidual(w, -1, 4, dcCb)
      writeResidual(w, -1, 4, dcCr)
    }
    if (cbpChroma == 2) {
      var pi = 0
      while (pi < 2) {
        val (tcArr, ac) = if (pi == 0) (st.tcCb, acCb) else (st.tcCr, acCr)
        var b = 0
        while (b < 4) {
          val cx = mbX * 2 + (b & 1); val cy = mbY * 2 + (b >> 1)
          // context must see the DECODER's state: neighbours only, and
          // the tc array already holds this MB's final values, but nC
          // reads strictly left/top blocks which precede in coding order
          writeResidual(w, st.chromaNc(tcArr, cx, cy), 15, ac(b))
          b += 1
        }
        pi += 1
      }
    }
  }

  private def encodeMbIntra(w: BitWriter, st: FrameState,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      mbX: Int, mbY: Int, qp: Int, typeOffset: Int = 0): Unit = {
    val px0 = mbX * 16; val py0 = mbY * 16
    val aLmb = mbX > 0 && st.mbUsable(mbX - 1, mbY)
    val aTmb = mbY > 0 && st.mbUsable(mbX, mbY - 1)
    // I_16x16 candidate: best full-block prediction SAD
    val mode16Candidates = Seq(2) ++ (if (aTmb) Seq(0) else Nil) ++
      (if (aLmb) Seq(1) else Nil) ++ (if (aLmb && aTmb) Seq(3) else Nil)
    val pred256 = new Array[Int](256)
    val mode16 = mode16Candidates.minBy { m =>
      predict16(st.y, st.w, px0, py0, m, aLmb, aTmb, pred256)
      sad16(pred256, srcY, st.w, px0, py0, 16)
    }
    predict16(st.y, st.w, px0, py0, mode16, aLmb, aTmb, pred256)
    val sad16Best = sad16(pred256, srcY, st.w, px0, py0, 16)
    // crude I_4x4 estimate: per-block best of DC/V/H against the
    // SOURCE as stand-in neighbours (selection only — never affects
    // conformance, both paths reconstruct exactly)
    var sad4Est = 0
    var k = 0
    while (k < 16) {
      val bx = px0 + (k & 3) * 4; val by = py0 + (k >> 2) * 4
      var best = Int.MaxValue
      var m = 0
      while (m < 3) {
        var s = 0
        var i = 0
        while (i < 16) {
          val x = bx + (i & 3); val y = by + (i >> 2)
          val p = m match {
            case 0 => if (by > 0) srcY((by - 1) * st.w + x) & 0xff else 128
            case 1 => if (bx > 0) srcY(y * st.w + bx - 1) & 0xff else 128
            case _ => 128
          }
          s += math.abs((srcY(y * st.w + x) & 0xff) - p)
          i += 1
        }
        if (s < best) best = s
        m += 1
      }
      sad4Est += best
      k += 1
    }
    if (sad16Best <= sad4Est) encodeMbI16(w, st, srcY, srcCb, srcCr, mbX, mbY, qp, mode16, pred256, typeOffset)
    else encodeMbI4(w, st, srcY, srcCb, srcCr, mbX, mbY, qp, typeOffset)
  }

  private def encodeMbI16(w: BitWriter, st: FrameState,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      mbX: Int, mbY: Int, qp: Int, mode16: Int, pred256: Array[Int],
      typeOffset: Int = 0): Unit = {
    st.markIntra(mbX, mbY)
    st.markMb(mbX, mbY)
    st.qpMb(mbY * st.mbW + mbX) = qp
    val px0 = mbX * 16; val py0 = mbY * 16
    val bx0 = mbX * 4; val by0 = mbY * 4
    val blk = new Array[Int](16)
    val dcRaw = new Array[Int](16) // per-block DC transform coeffs, raster
    val acLevels = Array.ofDim[Int](16, 15) // indexed by z-scan k
    var k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      var i = 0
      while (i < 16) {
        val x = px0 + zx * 4 + (i & 3); val y = py0 + zy * 4 + (i >> 2)
        blk(i) = (srcY(y * st.w + x) & 0xff) - pred256((zy * 4 + (i >> 2)) * 16 + zx * 4 + (i & 3))
        i += 1
      }
      fdct4(blk)
      dcRaw(zy * 4 + zx) = blk(0)
      i = 0
      while (i < 15) {
        val pos = Zig4(i + 1)
        acLevels(k)(i) = quant(blk(pos), pos, qp)
        i += 1
      }
      k += 1
    }
    // luma DC: forward Hadamard with >>1, quantized at double step
    hadamard4(dcRaw)
    k = 0
    while (k < 16) { dcRaw(k) = dcRaw(k) >> 1; k += 1 }
    val dcLevels = new Array[Int](16) // scan order
    k = 0
    while (k < 16) { dcLevels(k) = quantDc(dcRaw(Zig4(k)), qp); k += 1 }
    val cbpLuma = if (acLevels.exists(_.exists(_ != 0))) 15 else 0
    if (cbpLuma == 0) { var z = 0; while (z < 16) { java.util.Arrays.fill(acLevels(z), 0); z += 1 } }
    val (cbpChroma, chromaMode, dcCb, dcCr, acCb, acCr) =
      encodeChroma(st, srcCb, srcCr, mbX, mbY, qp)
    // ---- serialize ----
    val mbType = 1 + mode16 + 4 * cbpChroma + (if (cbpLuma == 15) 12 else 0)
    w.ue(mbType + typeOffset)
    w.ue(chromaMode)
    w.se(0) // mb_qp_delta
    // luma DC (context of block 0, before this MB's tc values are set)
    writeResidual(w, st.lumaNc(bx0, by0), 16, dcLevels)
    // ---- reconstruct luma exactly as the decoder ----
    val dcArr = new Array[Int](16)
    k = 0
    while (k < 16) { dcArr(Zig4(k)) = dcLevels(k); k += 1 }
    hadamard4(dcArr)
    k = 0
    while (k < 16) { dcArr(k) = dequantLumaDc(dcArr(k), qp); k += 1 }
    k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      val bx = bx0 + zx; val by = by0 + zy
      if (cbpLuma != 0) writeResidual(w, st.lumaNc(bx, by), 15, acLevels(k))
      st.tcY(by * st.bW + bx) = acLevels(k).count(_ != 0)
      st.modeY(by * st.bW + bx) = 2
      dequantAcDc(acLevels(k), dcArr(zy * 4 + zx), qp, blk)
      idct4(blk)
      reconBlock(st.y, st.w, px0 + zx * 4, py0 + zy * 4,
        pred256, zy * 4 * 16 + zx * 4, 16, blk)
      k += 1
    }
    writeChromaResidual(w, st, mbX, mbY, cbpChroma, dcCb, dcCr, acCb, acCr)
  }

  private def encodeMbI4(w: BitWriter, st: FrameState,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      mbX: Int, mbY: Int, qp: Int, typeOffset: Int = 0): Unit = {
    st.markIntra(mbX, mbY)
    st.markMb(mbX, mbY)
    st.qpMb(mbY * st.mbW + mbX) = qp
    val px0 = mbX * 16; val py0 = mbY * 16
    val bx0 = mbX * 4; val by0 = mbY * 4
    val blk = new Array[Int](16)
    val pred4 = new Array[Int](16)
    val modes = new Array[Int](16)
    val levels = Array.ofDim[Int](16, 16) // z-scan k → scan-order levels
    val preds = Array.ofDim[Int](16, 16) // chosen prediction per block
    // per-block: choose mode on the reconstruction, quantize, recon
    var k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      val bx = bx0 + zx; val by = by0 + zy
      val px = px0 + zx * 4; val py = py0 + zy * 4
      val aL = st.blockDone(bx - 1, by)
      val aT = st.blockDone(bx, by - 1)
      val aTL = st.blockDone(bx - 1, by - 1)
      val aTR = st.blockDone(bx + 1, by - 1)
      val candidates = Seq(2) ++
        (if (aT) Seq(0, 3, 7) else Nil) ++
        (if (aL) Seq(1, 8) else Nil) ++
        (if (aT && aL && aTL) Seq(4, 5, 6) else Nil)
      var bestMode = 2
      var bestSad = Int.MaxValue
      candidates.foreach { m =>
        predict4(st.y, st.w, px, py, m, aL, aT, aTL, aTR, pred4)
        var s = 0
        var i = 0
        while (i < 16) {
          s += math.abs(pred4(i) - (srcY((py + (i >> 2)) * st.w + px + (i & 3)) & 0xff))
          i += 1
        }
        if (s < bestSad) { bestSad = s; bestMode = m }
      }
      modes(k) = bestMode
      st.modeY(by * st.bW + bx) = bestMode
      predict4(st.y, st.w, px, py, bestMode, aL, aT, aTL, aTR, pred4)
      System.arraycopy(pred4, 0, preds(k), 0, 16)
      var i = 0
      while (i < 16) {
        blk(i) = (srcY((py + (i >> 2)) * st.w + px + (i & 3)) & 0xff) - pred4(i)
        i += 1
      }
      fdct4(blk)
      i = 0
      while (i < 16) {
        val pos = Zig4(i)
        levels(k)(i) = quant(blk(pos), pos, qp)
        i += 1
      }
      val tc = levels(k).count(_ != 0)
      st.tcY(by * st.bW + bx) = tc
      if (tc > 0) {
        dequantFull(levels(k), qp, blk)
        idct4(blk)
        reconBlock(st.y, st.w, px, py, preds(k), 0, 4, blk)
      } else writePredBlock(st.y, st.w, px, py, preds(k), 0, 4)
      k += 1
    }
    // cbp from the surviving levels (an 8x8 is coded iff any nonzero)
    var cbpL = 0
    k = 0
    while (k < 16) {
      if (levels(k).exists(_ != 0)) {
        val (zx, zy) = ZPos(k)
        cbpL |= 1 << ((zy >> 1) * 2 + (zx >> 1))
      }
      k += 1
    }
    val (cbpChroma, chromaMode, dcCb, dcCr, acCb, acCr) =
      encodeChroma(st, srcCb, srcCr, mbX, mbY, qp)
    val cbp = cbpL | (cbpChroma << 4)
    // ---- serialize ----
    w.ue(typeOffset) // mb_type I_4x4 (offset 5 inside P slices)
    k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      val bx = bx0 + zx; val by = by0 + zy
      val availA = bx > 0 && st.cellUsable(bx - 1, by) &&
        st.modeY(by * st.bW + bx - 1) >= 0
      val availB = by > 0 && st.cellUsable(bx, by - 1) &&
        st.modeY((by - 1) * st.bW + bx) >= 0
      val predMode =
        if (!availA || !availB) 2
        else math.min(st.modeY(by * st.bW + bx - 1), st.modeY((by - 1) * st.bW + bx))
      if (modes(k) == predMode) w.put(1)
      else {
        w.put(0)
        w.putBits(if (modes(k) < predMode) modes(k) else modes(k) - 1, 3)
      }
      k += 1
    }
    w.ue(chromaMode)
    w.ue(CbpIntraInv(cbp))
    if (cbp != 0) w.se(0) // mb_qp_delta
    k = 0
    while (k < 16) {
      val (zx, zy) = ZPos(k)
      val b8 = ((zy >> 1) * 2 + (zx >> 1))
      if ((cbp & (1 << b8)) != 0)
        writeResidual(w, st.lumaNc(bx0 + zx, by0 + zy), 16, levels(k))
      k += 1
    }
    writeChromaResidual(w, st, mbX, mbY, cbpChroma, dcCb, dcCr, acCb, acCr)
  }
}
