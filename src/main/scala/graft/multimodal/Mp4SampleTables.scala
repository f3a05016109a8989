package graft.multimodal

import scala.util.control.NonFatal

/** ISO-BMFF sample-table parser (ISO/IEC 14496-12 §8.5–8.7): walks
  * `moov → trak → mdia → {mdhd, minf → stbl}` and materializes the
  * per-sample view a frame-sampling pipeline needs — byte range,
  * presentation time, sync (keyframe) flag — WITHOUT any H.264 pixel
  * decode. This is the half of "video support" a VLM training
  * pipeline needs first: enumerate keyframe byte ranges + timestamps,
  * hand the encoded bytes to a downstream decoder.
  *
  * Tables consumed: `stts` (decode deltas), `ctts` (composition
  * offsets → true pts, since r8), `stss` (sync samples; absent =
  * every sample is sync), `stsz` (sizes, uniform or per-sample),
  * `stsc` (sample→chunk runs), `stco`/`co64` (chunk offsets). The
  * first `trak` with a complete set wins. Everything is
  * validated against its own box extent and the file length — a
  * truncated or inconsistent table set quarantines to `None`, never a
  * partial/garbage frame list (same discipline as the JPEG/PNG
  * decoders: corrupt media must not crash an executor or silently
  * yield wrong rows).
  */
object Mp4SampleTables {

  /** One media sample: `offset/size` locate the encoded frame bytes in
    * the file; `ptsMs` is the true PRESENTATION timestamp in ms —
    * decode time from `stts` plus the `ctts` composition offset when
    * the box is present (since r8; v0 unsigned / v1 signed per
    * 14496-12 §8.6.1.3), so foreign B-frame MP4s carry correct pts
    * metadata even while their payloads stay out-of-subset for decode;
    * `sync` marks keyframes (stss membership); `dtsMs` is the raw
    * DECODE timestamp (stts alone), kept alongside pts so a consumer
    * can flag reordered clips (pts ≠ dts) without re-walking the boxes.
    */
  final case class Mp4Sample(index: Int, ptsMs: Long, dtsMs: Long,
      offset: Long, size: Int, sync: Boolean)

  /** Hostile-input guard: more samples than any plausible clip at this
    * pipeline's scale means a crafted count field, not media.
    */
  private val MaxSamples = 1 << 20

  def parse(b: Array[Byte]): Option[Vector[Mp4Sample]] =
    try parseOrNull(b) catch { case NonFatal(_) => None }

  /** AVC decoder configuration from the track's `stsd → avc1 → avcC`
    * (ISO/IEC 14496-15 §5.2.4): the out-of-band SPS/PPS NAL units and
    * the sample NAL length-prefix size. The first video sample entry
    * with a well-formed record wins; anything malformed (short record,
    * truncated parameter-set lengths, zero sets) quarantines to None.
    */
  final case class AvcConfig(spsNal: Array[Byte], ppsNal: Array[Byte], lengthSize: Int)

  def parseAvcc(b: Array[Byte]): Option[AvcConfig] =
    parseAvc(b).map(_._1)

  /** AVC config AND sample tables from the SAME trak — the only safe
    * pairing for decode (a multi-track file may list an audio trak
    * with complete sample tables before the video trak; pairing the
    * video's avcC with that trak's samples would feed audio bytes to
    * the H.264 decoder). The first trak carrying both a well-formed
    * `avc1/avcC` entry and a complete sample-table set wins; one box
    * walk serves both results.
    */
  def parseAvc(b: Array[Byte]): Option[(AvcConfig, Vector[Mp4Sample])] =
    try {
      val moov = child(b, 0, b.length, "moov").getOrElse(return None)
      children(b, moov._1, moov._2).collect { case ("trak", p, e) => (p, e) }
        .iterator.flatMap { case (tp, te) =>
          for {
            cfg <- trakAvcc(b, tp, te)
            samples <- parseTrak(b, tp, te)
          } yield (cfg, samples)
        }.nextOption()
    } catch { case NonFatal(_) => None }

  private def trakAvcc(b: Array[Byte], tp: Int, te: Int): Option[AvcConfig] =
    for {
      (mp, me) <- child(b, tp, te, "mdia")
      (np, ne) <- child(b, mp, me, "minf")
      (sp, se) <- child(b, np, ne, "stbl")
      (dp, de) <- child(b, sp, se, "stsd")
      if dp + 8 <= de // version/flags + entry_count
      cfg <- children(b, dp + 8, de).collectFirst {
        case ("avc1", ep, ee) if ep + 78 <= ee => avccOf(b, ep + 78, ee)
      }.flatten
    } yield cfg

  private def avccOf(b: Array[Byte], from: Int, to: Int): Option[AvcConfig] = {
    val (p, e) = child(b, from, to, "avcC").getOrElse(return None)
    if (p + 7 > e || (b(p) & 0xff) != 1) return None // configurationVersion
    val lengthSize = (b(p + 4) & 3) + 1
    var o = p + 5
    def sets(countMask: Int): Option[Vector[Array[Byte]]] = {
      if (o + 1 > e) return None
      val cnt = b(o) & countMask
      o += 1
      val out = Vector.newBuilder[Array[Byte]]
      var i = 0
      while (i < cnt) {
        if (o + 2 > e) return None
        val len = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        o += 2
        if (len <= 0 || o + len > e) return None
        out += java.util.Arrays.copyOfRange(b, o, o + len)
        o += len
        i += 1
      }
      Some(out.result())
    }
    for {
      sps <- sets(0x1f)
      pps <- sets(0xff)
      s <- sps.headOption
      pp <- pps.headOption
    } yield AvcConfig(s, pp, lengthSize)
  }

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def be64(b: Array[Byte], o: Int): Long =
    ((be32(b, o).toLong & 0xffffffffL) << 32) | (be32(b, o + 4).toLong & 0xffffffffL)

  /** Child boxes of [from, to) as (type, payloadStart, end) — same
    * three size encodings and parent-bound discipline as
    * [[HeaderCodec.decodeMp4]] (a box spilling past its parent ends
    * the walk).
    */
  private def children(b: Array[Byte], from: Int, to: Int): Vector[(String, Int, Int)] = {
    val out = Vector.newBuilder[(String, Int, Int)]
    var o = from
    var ok = true
    while (ok && o + 8 <= to) {
      val size32 = be32(b, o).toLong & 0xffffffffL
      val id = new String(b, o + 4, 4, "US-ASCII")
      val (hdr, size) =
        if (size32 == 1) {
          if (o + 16 > to) return out.result()
          (16, be64(b, o + 8))
        } else if (size32 == 0) (8, (to - o).toLong)
        else (8, size32)
      if (size < hdr || o.toLong + size > to) ok = false
      else {
        out += ((id, o + hdr, (o + size).toInt))
        o = (o + size).toInt
      }
    }
    out.result()
  }

  private def child(b: Array[Byte], from: Int, to: Int, id: String): Option[(Int, Int)] =
    children(b, from, to).collectFirst { case (`id`, p, e) => (p, e) }

  private def parseOrNull(b: Array[Byte]): Option[Vector[Mp4Sample]] = {
    val moov = child(b, 0, b.length, "moov").getOrElse(return None)
    val traks = children(b, moov._1, moov._2).collect { case ("trak", p, e) => (p, e) }
    traks.iterator.flatMap { case (tp, te) => parseTrak(b, tp, te) }
      .nextOption()
  }

  private def parseTrak(b: Array[Byte], tp: Int, te: Int): Option[Vector[Mp4Sample]] = {
    val (mp, me) = child(b, tp, te, "mdia").getOrElse(return None)
    // mdhd: timescale at +12 (v0: 4-byte times) or +20 (v1: 8-byte)
    val timescale = child(b, mp, me, "mdhd") match {
      case Some((p, e)) =>
        val v = b(p) & 0xff
        if (v == 0 && p + 16 <= e) be32(b, p + 12)
        else if (v == 1 && p + 24 <= e) be32(b, p + 20)
        else return None
      case None => return None
    }
    if (timescale <= 0) return None
    val (np, ne) = child(b, mp, me, "minf").getOrElse(return None)
    val (sp, se) = child(b, np, ne, "stbl").getOrElse(return None)

    // full-box payloads start with version+flags (4 bytes)
    def fullBox(id: String): Option[(Int, Int)] =
      child(b, sp, se, id).collect { case (p, e) if p + 4 <= e => (p + 4, e) }

    // stsz: uniform sample_size or a per-sample table
    val (zp, ze) = fullBox("stsz").getOrElse(return None)
    if (zp + 8 > ze) return None
    val uniform = be32(b, zp)
    val n = be32(b, zp + 4)
    if (n <= 0 || n > MaxSamples) return None
    val sizes: Int => Int =
      if (uniform != 0) _ => uniform
      else {
        if (zp + 8 + 4L * n > ze) return None // truncated size table
        i => be32(b, zp + 8 + 4 * i)
      }

    // stts: (count, delta) runs — must cover exactly n samples; ticks
    // accumulate as DECODE timestamps, composition offsets apply below
    val (tp2, te2) = fullBox("stts").getOrElse(return None)
    if (tp2 + 4 > te2) return None
    val nRuns = be32(b, tp2)
    if (nRuns < 0 || tp2 + 4 + 8L * nRuns > te2) return None
    val ticks = new Array[Long](n)
    var s = 0
    var t = 0L
    var run = 0
    while (run < nRuns) {
      val count = be32(b, tp2 + 4 + 8 * run)
      val delta = be32(b, tp2 + 8 + 8 * run).toLong & 0xffffffffL
      if (count < 0 || s + count > n) return None
      var i = 0
      while (i < count) {
        ticks(s) = t
        t += delta
        s += 1; i += 1
      }
      run += 1
    }
    if (s != n) return None // stts does not cover the sample count

    val dtsTicks = ticks.clone() // decode times, before composition offsets

    // ctts: composition offsets, pts = dts + offset (14496-12
    // §8.6.1.3) — v0 offsets unsigned, v1 signed (B-frame reorder can
    // push pts before dts). Absent → pts = dts. Runs must cover
    // EXACTLY n samples; an inconsistent count quarantines the clip —
    // half-applied offsets would silently mis-stamp every later frame.
    child(b, sp, se, "ctts") match {
      case Some((p, e)) =>
        if (p + 8 > e) return None
        val version = b(p) & 0xff
        if (version > 1) return None
        val nc = be32(b, p + 4)
        if (nc < 0 || p + 8 + 8L * nc > e) return None
        var s2 = 0
        var r = 0
        while (r < nc) {
          val count = be32(b, p + 8 + 8 * r)
          val raw = be32(b, p + 12 + 8 * r)
          val off = if (version == 1) raw.toLong else raw.toLong & 0xffffffffL
          if (count < 0 || s2 + count > n) return None
          var i = 0
          while (i < count) { ticks(s2) += off; s2 += 1; i += 1 }
          r += 1
        }
        if (s2 != n) return None // ctts does not cover the sample count
      case None => ()
    }
    val ptsMs = ticks.map(tk => tk * 1000 / timescale)
    val dtsMs = dtsTicks.map(tk => tk * 1000 / timescale)

    // stss: 1-based sync sample numbers; absent → all sync
    val sync = fullBox("stss") match {
      case Some((p, e)) =>
        if (p + 4 > e) return None
        val c = be32(b, p)
        if (c < 0 || p + 4 + 4L * c > e) return None
        val set = new java.util.HashSet[Int](c * 2)
        var i = 0
        while (i < c) { set.add(be32(b, p + 4 + 4 * i)); i += 1 }
        (i: Int) => set.contains(i + 1)
      case None => (_: Int) => true
    }

    // chunk offsets: stco (BE32) or co64 (BE64)
    val offsets: IndexedSeq[Long] = fullBox("stco") match {
      case Some((p, e)) =>
        if (p + 4 > e) return None
        val c = be32(b, p)
        if (c < 0 || p + 4 + 4L * c > e) return None
        (0 until c).map(i => be32(b, p + 4 + 4 * i).toLong & 0xffffffffL)
      case None => fullBox("co64") match {
        case Some((p, e)) =>
          if (p + 4 > e) return None
          val c = be32(b, p)
          if (c < 0 || p + 4 + 8L * c > e) return None
          (0 until c).map(i => be64(b, p + 4 + 8 * i))
        case None => return None
      }
    }

    // stsc: (first_chunk, samples_per_chunk) runs, 1-based first_chunk
    val (cp, ce) = fullBox("stsc").getOrElse(return None)
    if (cp + 4 > ce) return None
    val nScRuns = be32(b, cp)
    if (nScRuns <= 0 || cp + 4 + 12L * nScRuns > ce) return None
    val scFirst = (0 until nScRuns).map(i => be32(b, cp + 4 + 12 * i))
    val scCount = (0 until nScRuns).map(i => be32(b, cp + 8 + 12 * i))
    if (scFirst.head != 1 || scCount.exists(_ < 0)) return None

    // walk chunks in order, laying samples at cumulative offsets
    val out = Vector.newBuilder[Mp4Sample]
    var sample = 0
    var chunk = 0
    var scRun = 0
    while (chunk < offsets.length && sample < n) {
      while (scRun + 1 < nScRuns && scFirst(scRun + 1) <= chunk + 1) scRun += 1
      var off = offsets(chunk)
      var i = 0
      while (i < scCount(scRun) && sample < n) {
        val sz = sizes(sample)
        if (sz < 0 || off < 0 || off + sz > b.length) return None // truncated media
        out += Mp4Sample(sample, ptsMs(sample), dtsMs(sample), off, sz, sync(sample))
        off += sz
        sample += 1; i += 1
      }
      chunk += 1
    }
    if (sample != n) return None // stsc/stco do not cover the samples
    Some(out.result())
  }
}
