package graft.tools

/** Measures the cost of the footer stamp riding the convert's DFS
  * write path ([[graft.sources.StampingCommitProtocol]]) at probe
  * scale: the same snapshot is converted to a `file://` target
  * (post-write in-place stamp — the local baseline) and to a
  * `graftdfs://` target (RawLocalFileSystem under a DFS scheme, so the
  * whole Hadoop-FS write + commit-protocol stamp machinery runs, with
  * byte counters). Prints one JSON line with both walls, the overhead
  * ratio, and the measured write amplification.
  *
  * The round-6 probe ([[FooterStampProbe]]) showed the OLD post-hoc
  * `stampFs` copy-rewrite at 12× the in-place stamp — a second full
  * pass over the table. The contract here: `dfs_over_local ≤ 1.10` and
  * `write_amplification ≈ 1.0`, i.e. a DFS convert now costs within
  * 10% of a local one and never re-reads its own output.
  *
  * {{{ sbt "runMain graft.tools.StampedConvertProbe [nCoins] [runs]" }}}
  */
object StampedConvertProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nCoins = args.headOption.map(_.toInt).getOrElse(10000000)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stamped-convert-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.graftdfs.impl", classOf[CountingDfs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // shared snapshot cache (same name/seed as LargeConvertBench)
    val snap = new java.io.File(s"/tmp/graft_large_snap_$nCoins.bin")
    if (!snap.exists() || snap.length() == 0) {
      val tmp = new java.io.File(snap.getPath + ".tmp")
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 20)
      try graft.codec.SnapshotGen.writeSynthetic(out, nCoins, seed = 7L)
      finally out.close()
      if (!tmp.renameTo(snap)) throw new java.io.IOException(s"rename $tmp -> $snap failed")
    }

    val shm = new java.io.File("/dev/shm")
    val scratch = if (shm.isDirectory && shm.canWrite)
      new java.io.File(shm, "graft_stamp_probe") else new java.io.File("/tmp/graft_stamp_probe")
    scratch.mkdirs()

    def timeConvert(out: String): Double = {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(new org.apache.hadoop.fs.Path(out).toUri.getPath))
      val t0 = System.nanoTime()
      graft.sources.UtxoConvert.convert(spark, snap.getPath, out,
        partitions = cpus.toInt)
      (System.nanoTime() - t0) / 1e9
    }

    // one untimed warmup per shape (codegen/writer init; Bench policy)
    timeConvert(s"$scratch/warm-local")
    timeConvert(s"graftdfs:$scratch/warm-dfs")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$scratch/warm-local"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$scratch/warm-dfs"))

    val local = (1 to runs).map(_ => timeConvert(s"$scratch/local"))
    CountingDfs.reset()
    val dfs = (1 to runs).map(_ => timeConvert(s"graftdfs:$scratch/dfs"))
    val written = CountingDfs.bytesWritten.sum()
    val read = CountingDfs.bytesRead.sum()
    val outBytes = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new java.io.File(s"$scratch/dfs"))
    // the stamp must actually be present on the DFS output
    val stamped = new java.io.File(s"$scratch/dfs").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .forall { f =>
        val rgs = FooterSort.sortingColumnsOf(f)
        rgs.nonEmpty && rgs.forall(_.nonEmpty)
      }
    org.apache.commons.io.FileUtils.deleteQuietly(scratch)

    def arr(rs: Seq[Double]) = rs.map(r => f"$r%.3f").mkString("[", ",", "]")
    // medians: single-run convert walls wobble with host load
    def med(rs: Seq[Double]) = rs.sorted.apply(rs.size / 2)
    println(
      s"""{"metric":"stamped_convert","coins":$nCoins,"runs":$runs,""" +
      s""""local_sec":${arr(local)},"dfs_sec":${arr(dfs)},""" +
      f""""dfs_over_local":${med(dfs) / med(local)}%.3f,""" +
      f""""write_amplification":${written.toDouble / (runs * outBytes)}%.3f,""" +
      f""""read_bytes_per_output_byte":${read.toDouble / (runs * outBytes)}%.4f,""" +
      s""""stamped":$stamped}""")
    spark.stop()
  }
}
