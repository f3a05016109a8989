package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[AudioCodec]] (G.711 µ-law/A-law + IMA ADPCM, r7).
  *
  * G.711 is memoryless, so the strongest available pin is exhaustive:
  * `encode(decode(b)) == b` over all 256 codewords per law (any
  * transcription slip in the segment tables breaks some codeword),
  * plus hand-computed goldens from the G.711 segment layout and a
  * bounded-error/monotonicity sweep over the full 16-bit range. ADPCM
  * is stateful, so its oracle is the shared-reconstruction contract
  * (the [[H264Codec]]/[[JpegCodec]] discipline): the encoder's
  * reconstruction must equal the decoder's output exactly.
  */
class AudioCodecSpec extends AnyFunSuite {

  import AudioCodec._
  import PixelCodec.PcmAudio

  test("G.711: encode(decode(b)) == b for every codeword, both laws") {
    for (b <- 0 until 256) {
      // mu-law's negative zero 0x7F decodes to the same value as 0xFF
      // (the standard's one non-injective pair), so byte idempotence
      // holds everywhere except that alias — which must re-encode to
      // the canonical positive zero
      val mu = mulawEncode(mulawDecode(b.toByte))
      if (b == 0x7f) assert(mu == 0xff.toByte, "negative zero canonicalizes")
      else assert(mu == b.toByte, f"mu-law codeword 0x$b%02x not idempotent")
      assert(alawEncode(alawDecode(b.toByte)) == b.toByte,
        f"a-law codeword 0x$b%02x not idempotent")
    }
  }

  test("G.711 goldens: segment-layout values computed by hand") {
    // mu-law: 0xFF encodes (seg 0, mantissa 0, positive) -> ((0<<3)+0x84)<<0 - 0x84 = 0
    assert(mulawDecode(0xff.toByte) == 0)
    // 0x7F is the negative-zero codeword -> BIAS - BIAS = 0
    assert(mulawDecode(0x7f.toByte) == 0)
    // 0x80 = ~0x7F... complement gives seg 7, mantissa 15, negative:
    // t = ((15<<3)+0x84)<<7 = 0x8200 -> 0x84 - 0x8200 = -33148+264? compute: 132-33280 = -33148? out of 16-bit...
    // pin the extremes numerically instead: full-scale inputs
    assert(mulawDecode(mulawEncode(32767)) == 32124)
    assert(mulawDecode(mulawEncode(-32768)) == -32124)
    assert(mulawEncode(0) == 0xff.toByte)
    // a-law: 0x55 (all toggle bits) -> v=0: seg 0, man 0, negative -> -8
    assert(alawDecode(0x55.toByte) == -8)
    assert(alawDecode(0xd5.toByte) == 8) // positive twin
    assert(alawDecode(alawEncode(32767)) == 32256)
    assert(alawDecode(alawEncode(-32768)) == -32256)
  }

  test("G.711: bounded error and monotone decode over the full range") {
    var prevMu = Int.MinValue
    var prevA = Int.MinValue
    var s = -32768
    while (s <= 32767) {
      val mu = mulawDecode(mulawEncode(s.toShort)).toInt
      val al = alawDecode(alawEncode(s.toShort)).toInt
      // quantization error bounded by the segment's half step:
      // segment 7 steps are 256 (mu) / 512-ish (a); allow the worst
      assert(math.abs(mu - s) <= 1024, s"mu-law error at $s: $mu")
      assert(math.abs(al - s) <= 1024, s"a-law error at $s: $al")
      assert(mu >= prevMu, s"mu-law decode not monotone at $s")
      assert(al >= prevA, s"a-law decode not monotone at $s")
      prevMu = mu; prevA = al
      s += 1
    }
  }

  private def tone(n: Int, ch: Int, seed: Int): PcmAudio = {
    val out = new Array[Short](n * ch)
    var i = 0
    while (i < out.length) {
      out(i) = (((i * 73 + seed * 31) % 4096 - 2048) * 13).toShort
      i += 1
    }
    PcmAudio(ch, 8000, out)
  }

  test("IMA ADPCM: decode equals the encoder's reconstruction exactly (mono + stereo)") {
    for ((ch, frames) <- Seq((1, 65), (1, 130), (1, 100), (2, 65), (2, 333))) {
      val a = tone(frames, ch, seed = ch * 100 + frames)
      val (data, recon) = imaEncode(a, blockAlign = 36 * ch)
      val dec = imaDecode(data, ch, 36 * ch, frames)
      assert(dec.isDefined, s"ch$ch f$frames")
      assert(dec.get.toSeq == recon.toSeq, s"ch$ch f$frames recon contract")
    }
    // tracking sanity on a signal ADPCM is built for (slope within the
    // adapted step): a smooth tone must reconstruct tightly
    val smooth = PcmAudio(1, 8000,
      Array.tabulate(650)(i => (8000 * math.sin(i * 0.05)).toShort))
    val (dataS, reconS) = imaEncode(smooth, blockAlign = 36)
    assert(imaDecode(dataS, 1, 36, 650).get.toSeq == reconS.toSeq)
    val mae = smooth.samples.zip(reconS)
      .map { case (x, y) => math.abs(x - y).toLong }.sum / smooth.samples.length
    assert(mae < 64, s"smooth-tone mae $mae")
  }

  test("IMA ADPCM: blocks are independently seeded (mid-stream decode restart)") {
    val a = tone(195, 1, 7) // 3 blocks at 65 samples/block
    val (data, _) = imaEncode(a, 36)
    // decoding only the LAST block (as its own 65-frame stream) must
    // equal the tail of the full decode: the per-block header reseeds
    val full = imaDecode(data, 1, 36, 195).get
    val lastBlock = java.util.Arrays.copyOfRange(data, 72, 108)
    val tail = imaDecode(lastBlock, 1, 36, 65).get
    assert(tail.toSeq == full.slice(130, 195).toSeq)
  }

  test("WAV dispatch: all three compressed containers decode; PCM still works; unknown tags quarantine") {
    val mono = tone(800, 1, 1)
    val stereo = tone(800, 2, 2)
    // G.711 wavs decode back to the COMPANDED samples
    for ((a, alaw) <- Seq((mono, false), (stereo, false), (mono, true), (stereo, true))) {
      val wav = encodeWavG711(a, alaw)
      val dec = decodeWav(wav)
      assert(dec.isDefined, s"g711 alaw=$alaw ch=${a.channels}")
      assert(dec.get.channels == a.channels && dec.get.sampleRate == 8000)
      val expect = a.samples.map(s =>
        if (alaw) alawDecode(alawEncode(s)) else mulawDecode(mulawEncode(s)))
      assert(dec.get.samples.toSeq == expect.toSeq)
      // the header codec reports the exact fact-chunk duration
      assert(HeaderCodec.decode(wav).get.durationMs == 100L, s"g711 duration")
    }
    // IMA wav decodes to the encoder's reconstruction
    val (wavIma, recon) = encodeWavIma(stereo)
    val decIma = decodeWav(wavIma)
    assert(decIma.isDefined)
    assert(decIma.get.samples.toSeq == recon.toSeq)
    assert(HeaderCodec.decode(wavIma).get.durationMs == 100L, "ima duration from fact")
    // PCM16 still dispatches
    assert(decodeWav(PixelCodec.encodeWav(mono)).get.samples.toSeq == mono.samples.toSeq)
    // out-of-subset codec (MP3-in-WAV, tag 0x55): quarantine
    val mp3ish = encodeWavG711(mono, alaw = false).clone()
    mp3ish(20) = 0x55; mp3ish(21) = 0 // overwrite the fmt tag
    assert(decodeWav(mp3ish).isEmpty, "unknown codec must quarantine")
  }

  test("hostile inputs quarantine: truncation, bad block headers, crafted counts") {
    val (wav, _) = encodeWavIma(tone(130, 1, 3))
    for (cut <- 1 until wav.length by 5) decodeWav(wav.take(cut)) // never throws
    // step index beyond 88 in a block header
    val bad = wav.clone()
    val dataOff = wav.length - 2 * 36 // two 36-byte blocks at the tail
    bad(dataOff + 2) = 120.toByte
    assert(decodeWav(bad).isEmpty, "step index 120 must quarantine")
    // nonzero reserved byte
    val bad2 = wav.clone(); bad2(dataOff + 3) = 1
    assert(decodeWav(bad2).isEmpty, "reserved byte must be zero")
    // fact count larger than the blocks can carry
    val (w2, _) = encodeWavIma(tone(65, 1, 4))
    val factOff = 12 + 8 + 20 + 8
    val b2 = w2.clone(); b2(factOff) = 0xff.toByte; b2(factOff + 1) = 0x7f
    assert(decodeWav(b2).isEmpty, "oversized fact must quarantine")
    // G.711 mutations never throw
    val rnd = new scala.util.Random(7L)
    val g = encodeWavG711(tone(100, 1, 5), alaw = true)
    for (_ <- 1 to 300) {
      val m = g.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      decodeWav(m)
    }
    // a fmt chunk whose DECLARED size is too short to hold the fields
    // must quarantine, not read the next chunk's bytes as blockAlign
    val shortFmt = g.clone()
    shortFmt(16) = 6 // fmt size LE32 := 6 (was 18)
    assert(decodeWav(shortFmt).isEmpty, "short-declared fmt must quarantine")
    assert(HeaderCodec.decode(shortFmt).isEmpty, "header walk must agree")
  }
}
