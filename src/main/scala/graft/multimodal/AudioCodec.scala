package graft.multimodal

import scala.util.control.NonFatal

/** Pure-JVM compressed-audio codec for the WAV container family:
  * G.711 µ-law (format tag 7) and A-law (tag 6) companding per the
  * ITU-T G.711 segment layout, and IMA/DVI ADPCM (tag 0x11) per the
  * IMA Digital Audio Focus Group algorithm — the three compressed
  * encodings real-world RIFF corpora actually carry below the
  * MP3/AAC licensing line. Closes the "audio = PCM16 only" slice of
  * the X33 boundary the way [[JpegCodec]] (r6) and [[H264Codec]]
  * (r7) closed image/video: original implementations from the public
  * specifications, encode AND decode, hostile input quarantined to
  * None.
  *
  * Correctness contract, same discipline as the other codecs: the
  * ADPCM encoder advances its predictor through the DECODER'S own
  * reconstruction arithmetic, so `decode(encode(x))` equals the
  * encoder's own reconstruction exactly; G.711 is memoryless, so the
  * spec pins the stronger property `encode(decode(b)) == b` for every
  * codeword `b` (exhaustive 256-point check per law) plus bounded
  * round-trip error on linear samples.
  *
  * [[decodeWav]] dispatches on the fmt tag (1 = PCM16, 6 = A-law,
  * 7 = µ-law, 0x11 = IMA ADPCM) and honors the `fact` chunk's
  * per-channel frame count — mandatory for non-PCM WAV, and the only
  * exact duration/length source once bytes stop being proportional
  * to samples. Unknown tags (MP3-in-WAV etc.) quarantine.
  */
object AudioCodec {

  import PixelCodec.PcmAudio

  // ---------------------------------------------------------------
  // G.711 companding (classic public-domain segment construction)
  // ---------------------------------------------------------------

  private val Bias = 0x84
  private val Clip = 32635
  private val SegEnd = Array(0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff, 0x1fff, 0x3fff, 0x7fff)

  private def segOf(v: Int): Int = {
    var s = 0
    while (s < 8 && v > SegEnd(s)) s += 1
    s
  }

  /** Linear PCM16 → µ-law codeword. */
  def mulawEncode(pcm: Short): Byte = {
    var v = pcm.toInt
    var mask = 0xff
    if (v < 0) { v = -v; mask = 0x7f }
    if (v > Clip) v = Clip
    v += Bias
    val seg = segOf(v)
    (((seg << 4) | ((v >> (seg + 3)) & 0xf)) ^ mask).toByte
  }

  /** µ-law codeword → linear PCM16. */
  def mulawDecode(u: Byte): Short = {
    val v = ~u & 0xff
    var t = ((v & 0x0f) << 3) + Bias
    t <<= (v & 0x70) >> 4
    (if ((v & 0x80) != 0) Bias - t else t - Bias).toShort
  }

  /** A-law segment bounds in the 13-bit magnitude domain. */
  private val SegAEnd = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  /** Linear PCM16 → A-law codeword (13-bit domain per G.711). */
  def alawEncode(pcm: Short): Byte = {
    var v = pcm.toInt >> 3
    var mask = 0xd5 // sign bit set = positive, then the 0x55 toggle
    if (v < 0) { v = -v - 1; mask = 0x55 }
    var seg = 0
    while (seg < 8 && v > SegAEnd(seg)) seg += 1
    val aval =
      if (seg >= 8) 0x7f
      else (seg << 4) | ((if (seg < 2) v >> 1 else v >> seg) & 0xf)
    (aval ^ mask).toByte
  }

  /** A-law codeword → linear PCM16. */
  def alawDecode(a: Byte): Short = {
    val v = (a ^ 0x55) & 0xff
    val seg = (v & 0x70) >> 4
    var t = ((v & 0x0f) << 4) | 8
    if (seg > 0) t = (t + 0x100) << (seg - 1)
    (if ((v & 0x80) != 0) t else -t).toShort
  }

  // ---------------------------------------------------------------
  // IMA / DVI ADPCM
  // ---------------------------------------------------------------

  private val StepTable = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IndexTable = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIdx(i: Int): Int = if (i < 0) 0 else if (i > 88) 88 else i
  private def clamp16(v: Int): Int = if (v < -32768) -32768 else if (v > 32767) 32767 else v

  /** One ADPCM step, shared verbatim by encode and decode: apply
    * nibble `n` to (pred, index), returning the reconstruction.
    */
  private def imaStep(n: Int, pred: Int, index: Int): (Int, Int) = {
    val step = StepTable(index)
    var diff = step >> 3
    if ((n & 1) != 0) diff += step >> 2
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 4) != 0) diff += step
    val p = clamp16(if ((n & 8) != 0) pred - diff else pred + diff)
    (p, clampIdx(index + IndexTable(n)))
  }

  /** Quantize `sample - pred` to a nibble at the current step. */
  private def imaNibble(sample: Int, pred: Int, index: Int): Int = {
    var diff = sample - pred
    var n = if (diff < 0) { diff = -diff; 8 } else 0
    var step = StepTable(index)
    if (diff >= step) { n |= 4; diff -= step }
    step >>= 1
    if (diff >= step) { n |= 2; diff -= step }
    step >>= 1
    if (diff >= step) n |= 1
    n
  }

  /** Per-channel block body bytes (excluding the 4-byte header). */
  private def imaBlockDataBytes(blockAlign: Int, channels: Int): Int =
    blockAlign / channels - 4

  /** Samples per channel one block carries: the header's seed sample
    * plus two nibbles per body byte.
    */
  def imaSamplesPerBlock(blockAlign: Int, channels: Int): Int =
    imaBlockDataBytes(blockAlign, channels) * 2 + 1

  /** Encode interleaved PCM16 frames as IMA ADPCM blocks (WAV tag
    * 0x11 layout: per-channel 4-byte headers — seed sample LE16, step
    * index, reserved 0 — then 4-byte-per-channel interleaved nibble
    * words, low nibble first). The final block pads by repeating each
    * channel's last sample; `frames` (per channel) is what a `fact`
    * chunk must carry so decode can drop the padding. Returns the
    * raw block bytes + the encoder's own reconstruction.
    */
  def imaEncode(a: PcmAudio, blockAlign: Int): (Array[Byte], Array[Short]) = {
    val ch = a.channels
    require(ch >= 1 && blockAlign % (4 * ch) == 0 && imaBlockDataBytes(blockAlign, ch) > 0,
      s"blockAlign $blockAlign incompatible with $ch channels")
    val frames = a.samples.length / ch
    require(frames * ch == a.samples.length, "samples not a whole frame multiple")
    require(frames > 0, "empty audio")
    val spb = imaSamplesPerBlock(blockAlign, ch)
    val nBlocks = (frames + spb - 1) / spb
    val out = new Array[Byte](nBlocks * blockAlign)
    val recon = new Array[Short](a.samples.length)
    @inline def src(f: Int, c: Int): Int = a.samples(math.min(f, frames - 1) * ch + c).toInt
    val pred = new Array[Int](ch)
    val idx = new Array[Int](ch)
    var o = 0
    var f0 = 0
    var b = 0
    while (b < nBlocks) {
      var c = 0
      while (c < ch) {
        // seed each block from the actual first sample (stream restart:
        // blocks are independently decodable, the format's whole point)
        pred(c) = src(f0, c)
        if (f0 < frames) recon(f0 * ch + c) = pred(c).toShort
        out(o) = (pred(c) & 0xff).toByte
        out(o + 1) = ((pred(c) >> 8) & 0xff).toByte
        out(o + 2) = idx(c).toByte
        out(o + 3) = 0
        o += 4
        c += 1
      }
      // nibble words: 4 bytes (8 samples) per channel, channels interleaved
      val words = imaBlockDataBytes(blockAlign, ch) / 4
      var w = 0
      while (w < words) {
        var c2 = 0
        while (c2 < ch) {
          var k = 0
          while (k < 4) {
            var byte = 0
            var half = 0
            while (half < 2) {
              val f = f0 + 1 + w * 8 + k * 2 + half
              val n = imaNibble(src(f, c2), pred(c2), idx(c2))
              val (p, i2) = imaStep(n, pred(c2), idx(c2))
              pred(c2) = p; idx(c2) = i2
              if (f < frames) recon(f * ch + c2) = p.toShort
              byte |= n << (4 * half)
              half += 1
            }
            out(o) = byte.toByte
            o += 1
            k += 1
          }
          c2 += 1
        }
        w += 1
      }
      f0 += spb
      b += 1
    }
    (out, recon)
  }

  /** Decode IMA ADPCM block bytes to `frames` interleaved PCM16
    * frames (the `fact` count; padding nibbles beyond it are parsed
    * but dropped). None on any structural inconsistency.
    */
  def imaDecode(data: Array[Byte], channels: Int, blockAlign: Int,
      frames: Int): Option[Array[Short]] = {
    if (channels < 1 || blockAlign % (4 * channels) != 0 ||
      imaBlockDataBytes(blockAlign, channels) <= 0 || frames <= 0) return None
    val spb = imaSamplesPerBlock(blockAlign, channels)
    val nBlocks = (frames + spb - 1) / spb
    if (data.length < nBlocks * blockAlign) return None
    val out = new Array[Short](frames * channels)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var o = 0
    var f0 = 0
    var b = 0
    while (b < nBlocks) {
      var c = 0
      while (c < channels) {
        pred(c) = ((data(o) & 0xff) | (data(o + 1) << 8)).toShort.toInt
        idx(c) = data(o + 2) & 0xff
        if (idx(c) > 88 || data(o + 3) != 0) return None
        if (f0 < frames) out(f0 * channels + c) = pred(c).toShort
        o += 4
        c += 1
      }
      val words = imaBlockDataBytes(blockAlign, channels) / 4
      var w = 0
      while (w < words) {
        var c2 = 0
        while (c2 < channels) {
          var k = 0
          while (k < 4) {
            val byte = data(o) & 0xff
            o += 1
            var half = 0
            while (half < 2) {
              val n = (byte >> (4 * half)) & 0xf
              val (p, i2) = imaStep(n, pred(c2), idx(c2))
              pred(c2) = p; idx(c2) = i2
              val f = f0 + 1 + w * 8 + k * 2 + half
              if (f < frames) out(f * channels + c2) = p.toShort
              half += 1
            }
            k += 1
          }
          c2 += 1
        }
        w += 1
      }
      f0 += spb
      b += 1
    }
    Some(out)
  }

  // ---------------------------------------------------------------
  // WAV container plumbing
  // ---------------------------------------------------------------

  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Decode any WAV in the subset to interleaved PCM16: dispatches on
    * the fmt tag (1 PCM16, 6 A-law, 7 µ-law, 0x11 IMA ADPCM). Unknown
    * codecs and structural damage quarantine to None.
    */
  def decodeWav(b: Array[Byte]): Option[PcmAudio] =
    try {
      if (!HeaderCodec.isWav(b)) return None
      var o = 12
      var tag = 0; var channels = 0; var rate = 0; var bits = 0; var blockAlign = 0
      var fact = -1L
      var dataOff = -1; var dataLen = 0
      while (o + 8 <= b.length && dataOff < 0) {
        val id = new String(b, o, 4, "US-ASCII")
        val size = le32(b, o + 4).toLong & 0xffffffffL
        if (size > b.length.toLong) return None
        if (id == "fmt " && size >= 16 && o + 8 + 16 <= b.length) {
          tag = le16(b, o + 8)
          channels = le16(b, o + 10)
          rate = le32(b, o + 12)
          blockAlign = le16(b, o + 20)
          bits = le16(b, o + 22)
        } else if (id == "fact" && size >= 4 && o + 12 <= b.length) {
          fact = le32(b, o + 8).toLong & 0xffffffffL
        } else if (id == "data") {
          dataOff = o + 8
          dataLen = math.min(size, (b.length - dataOff).toLong).toInt
        }
        val step = 8 + size.toInt + (size.toInt & 1)
        if (step <= 0) return None
        o += step
      }
      if (channels <= 0 || rate <= 0 || dataOff < 0) return None
      tag match {
        case 1 =>
          PixelCodec.decodeWavPcm16(b)
        case 6 | 7 =>
          if (bits != 8) return None
          val n = if (fact >= 0) math.min(fact * channels, dataLen.toLong).toInt else dataLen
          val out = new Array[Short](n)
          var i = 0
          if (tag == 7) while (i < n) { out(i) = mulawDecode(b(dataOff + i)); i += 1 }
          else while (i < n) { out(i) = alawDecode(b(dataOff + i)); i += 1 }
          Some(PcmAudio(channels, rate, out))
        case 0x11 =>
          if (bits != 4 || fact < 0) return None // fact is mandatory for ADPCM
          imaDecode(java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataLen),
              channels, blockAlign, fact.toInt)
            .map(PcmAudio(channels, rate, _))
        case _ => None // out-of-subset codec (MP3-in-WAV etc.)
      }
    } catch { case NonFatal(_) => None }

  /** G.711 WAV container: 18-byte fmt (cbSize 0) + mandatory fact. */
  private def wavShellG711(tag: Int, channels: Int, rate: Int,
      fact: Int, data: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 12 + 8 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + 18 + 12 + 8 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(tag.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels)
      .putShort(channels.toShort).putShort(8.toShort)
      .putShort(0.toShort) // cbSize
    buf.put("fact".getBytes("US-ASCII")).putInt(4).putInt(fact)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array()
  }

  private def wavShellIma(channels: Int, rate: Int, blockAlign: Int,
      fact: Int, data: Array[Byte]): Array[Byte] = {
    val spb = imaSamplesPerBlock(blockAlign, channels)
    val byteRate = (rate.toLong * blockAlign / spb).toInt
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 12 + 8 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + 20 + 12 + 8 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(byteRate)
      .putShort(blockAlign.toShort).putShort(4.toShort)
      .putShort(2.toShort).putShort(spb.toShort)
    buf.put("fact".getBytes("US-ASCII")).putInt(4).putInt(fact)
    buf.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    buf.array()
  }

  /** Encode as a µ-law (tag 7) or A-law (tag 6) WAV. */
  def encodeWavG711(a: PcmAudio, alaw: Boolean): Array[Byte] = {
    val data = new Array[Byte](a.samples.length)
    var i = 0
    if (alaw) while (i < data.length) { data(i) = alawEncode(a.samples(i)); i += 1 }
    else while (i < data.length) { data(i) = mulawEncode(a.samples(i)); i += 1 }
    wavShellG711(if (alaw) 6 else 7, a.channels, a.sampleRate,
      a.samples.length / a.channels, data)
  }

  /** Encode as an IMA ADPCM (tag 0x11) WAV; returns the container and
    * the encoder's reconstruction (the decode-equal contract).
    */
  def encodeWavIma(a: PcmAudio, blockAlign: Int = 0): (Array[Byte], Array[Short]) = {
    val ba = if (blockAlign > 0) blockAlign else 36 * a.channels
    val (data, recon) = imaEncode(a, ba)
    (wavShellIma(a.channels, a.sampleRate, ba, a.samples.length / a.channels, data), recon)
  }
}
