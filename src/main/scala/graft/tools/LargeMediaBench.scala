package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal scale proof — the codec surface (X33) driven at 100K+
  * rows of REAL containers (PNG with filtered zlib scanlines, baseline
  * JPEG, PCM16 WAV, ISO-BMFF MP4), measuring the three shipped stages:
  *
  *  - generate+encode → parquet (the ingest shape: opaque binary +
  *    typed metadata)
  *  - [[graft.multimodal.Multimodal.extractFeatures]]: header decode +
  *    full payload decode (PNG inflate/unfilter, JPEG Huffman/IDCT,
  *    WAV PCM16) + per-row statistics
  *  - [[graft.multimodal.Multimodal.resize]]: payload decode →
  *    box-filter resize/resample → re-encode into the same container
  *
  * Correctness rides along: every row except the marker-MP4 stand-ins
  * must decode (`payload_ok` — images, audio, AND AVC video since the
  * H.264 codec), every AVC clip's keyframes must CAVLC-decode to the
  * expected per-clip count, geometry must equal the deterministic
  * generator geometry, and resized imagery must re-decode at target
  * dims — counted over the whole corpus, not sampled.
  *
  * {{{ sbt "runMain graft.tools.LargeMediaBench [nRows]" }}}
  */
object LargeMediaBench {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = args.headOption.map(_.toLong).getOrElse(150000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shm = new java.io.File("/dev/shm")
    val scratch = if (shm.isDirectory && shm.canWrite)
      new java.io.File(shm, "graft_lmb") else new java.io.File("/tmp/graft_lmb")
    org.apache.commons.io.FileUtils.deleteQuietly(scratch)
    scratch.mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-large-media")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", new java.io.File(scratch, "spill").getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val mediaDir = new java.io.File(scratch, "media").getAbsolutePath
    val (genSec, _) = time {
      graft.multimodal.Multimodal.syntheticMedia(spark, n, cpus.toInt)
        .write.mode("overwrite").parquet(mediaDir)
    }
    val mediaBytes = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(mediaDir))
    System.err.println(f"[lmb] generated $n rows (${mediaBytes / 1e9}%.2f GB parquet) in $genSec%.1f s")

    val media = spark.read.parquet(mediaDir)
    // features: full payload decode + stats, correctness counted corpus-wide
    val (featSec, featAgg) = time {
      graft.multimodal.Multimodal.extractFeatures(spark, media)
        .agg(
          count(lit(1)).as("rows"),
          sum(when(col("decode_ok"), 1L).otherwise(0L)).as("decoded"),
          sum(when(col("payload_ok"), 1L).otherwise(0L)).as("payload"),
          sum(when(col("container") === "mp4", 1L).otherwise(0L)).as("video"),
          sum(col("n_bytes").cast("long")).as("bytes"),
          // marker MP4s (even ids) model an out-of-subset codec and
          // must stay quarantined; AVC MP4s (odd ids) must decode
          sum(when(col("container") === "mp4" && col("media_id") % 2 === 0, 1L)
            .otherwise(0L)).as("marker_video"))
        .collect()(0)
    }
    val rows = featAgg.getLong(0)
    val payloadOk = featAgg.getLong(2)
    val video = featAgg.getLong(3)
    val markerVideo = featAgg.getLong(5)
    require(rows == n, s"feature rows $rows != $n")
    require(featAgg.getLong(1) == n, "some headers failed to decode")
    require(payloadOk == n - markerVideo,
      s"payload_ok $payloadOk != ${n - markerVideo}: images/audio/AVC video must all decode")
    System.err.println(f"[lmb] features: $featSec%.1f s (${(n / featSec).toLong} rows/s), payload $payloadOk/$n (video $video, marker $markerVideo)")

    // keyframe pixel decode (H264Codec, r7): every AVC video's sync
    // samples must CAVLC-decode; count expected keyframes from the
    // deterministic generator rule (n_i = 4 + id%5 frames, every 3rd
    // sync -> ceil(n_i/3) = (6 + id%5) / 3 keyframes per clip)
    val (kfSec, kfAgg) = time {
      graft.multimodal.Multimodal.decodeKeyframes(spark, media)
        .agg(
          sum(when(col("decode_ok"), 1L).otherwise(0L)).as("frames"),
          countDistinct(when(col("decode_ok"), col("media_id"))).as("clips"))
        .collect()(0)
    }
    val expectKf = media.filter(col("kind") === "video" && col("media_id") % 2 === 1)
      .agg(sum((col("media_id") % 5 + 6) / lit(3) cast "long"),
        count(lit(1)))
      .collect()(0)
    require(kfAgg.getLong(0) == expectKf.getLong(0),
      s"decoded keyframes ${kfAgg.getLong(0)} != expected ${expectKf.getLong(0)}")
    require(kfAgg.getLong(1) == expectKf.getLong(1),
      s"decoded clips ${kfAgg.getLong(1)} != AVC clips ${expectKf.getLong(1)}")
    System.err.println(f"[lmb] keyframes: $kfSec%.1f s (${(kfAgg.getLong(0) / kfSec).toLong} frames/s), ${kfAgg.getLong(0)} frames over ${kfAgg.getLong(1)} clips")

    // whole-GOP pixel decode (P-slice inter layer): EVERY sample of
    // every AVC clip — IDRs and motion-compensated P frames — must
    // decode; expected total = sum of per-clip frame counts (4+id%5)
    val (gopSec, gopAgg) = time {
      graft.multimodal.Multimodal.decodeFrames(spark, media)
        .agg(
          sum(when(col("decode_ok"), 1L).otherwise(0L)).as("frames"),
          sum(when(col("decode_ok") && !col("sync"), 1L).otherwise(0L)).as("inter"),
          countDistinct(when(col("decode_ok"), col("media_id"))).as("clips"))
        .collect()(0)
    }
    val expectGop = media.filter(col("kind") === "video" && col("media_id") % 2 === 1)
      .agg(sum(col("media_id") % 5 + 4).cast("long"), count(lit(1)))
      .collect()(0)
    require(gopAgg.getLong(0) == expectGop.getLong(0),
      s"decoded GOP frames ${gopAgg.getLong(0)} != expected ${expectGop.getLong(0)}")
    require(gopAgg.getLong(2) == expectGop.getLong(1),
      s"decoded clips ${gopAgg.getLong(2)} != AVC clips ${expectGop.getLong(1)}")
    require(gopAgg.getLong(1) == gopAgg.getLong(0) - kfAgg.getLong(0),
      "inter-frame count must be total minus keyframes")
    System.err.println(f"[lmb] gop: $gopSec%.1f s (${(gopAgg.getLong(0) / gopSec).toLong} frames/s), ${gopAgg.getLong(0)} frames (${gopAgg.getLong(1)} inter) over ${gopAgg.getLong(2)} clips")

    // resize: decode → box filter → re-encode, then re-decode the
    // resized containers and verify EVERY image carries the target
    // dims — one fused pass, timed end to end (resize + audit)
    val (rzSec, verify) = time {
      val rz = graft.multimodal.Multimodal.resize(spark, media, targetW = 16,
        targetH = 12, targetFrames = 100)
      graft.multimodal.Multimodal.extractFeatures(spark,
          rz.select(col("media_id"), col("kind"),
            col("content_resized").as("content"), col("source")))
        .agg(
          sum(when(col("container").isin("png", "jpeg", "bmp") &&
            col("width") === 16 && col("height") === 12, 1L).otherwise(0L)).as("img_ok"),
          sum(when(col("container").isin("png", "jpeg", "bmp"), 1L).otherwise(0L)).as("img"))
        .collect()(0)
    }
    require(verify.getLong(0) == verify.getLong(1),
      s"resized imagery not at target dims: ${verify.getLong(0)}/${verify.getLong(1)}")
    System.err.println(f"[lmb] resize: $rzSec%.1f s (${(n / rzSec).toLong} rows/s), ${verify.getLong(1)} images at 16x12")

    println(
      s"""{"metric":"large_media","rows":$n,"parquet_bytes":$mediaBytes,""" +
      f""""generate_sec":$genSec%.1f,"features_sec":$featSec%.1f,""" +
      s""""features_rows_per_s":${(n / featSec).toLong},""" +
      f""""resize_sec":$rzSec%.1f,"resize_rows_per_s":${(n / rzSec).toLong},""" +
      f""""keyframes_sec":$kfSec%.1f,"keyframes_decoded":${kfAgg.getLong(0)},""" +
      s""""keyframes_per_s":${(kfAgg.getLong(0) / kfSec).toLong},""" +
      f""""gop_sec":$gopSec%.1f,"gop_frames":${gopAgg.getLong(0)},""" +
      s""""gop_inter_frames":${gopAgg.getLong(1)},""" +
      s""""gop_frames_per_s":${(gopAgg.getLong(0) / gopSec).toLong},""" +
      s""""payload_ok":$payloadOk,"video_rows":$video,"marker_video_rows":$markerVideo,""" +
      s""""peak_rss_bytes":${LargeConvertBench.peakRssBytes()}}""")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(scratch)
  }
}
