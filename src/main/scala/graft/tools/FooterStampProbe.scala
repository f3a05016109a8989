package graft.tools

/** Measures the two footer-stamp paths on a real convert output:
  * in-place tail rewrite (local files — metadata-only cost) vs the
  * Hadoop-FileSystem copy-rewrite (the DFS/object-store path, which
  * necessarily streams every data byte once). Prints one JSON line
  * with per-path seconds and effective MB/s, and verifies both outputs
  * carry the stamp.
  *
  * The point of publishing the number: at cluster scale the copy-
  * rewrite is a full read+write of the table — the stamp should ride
  * the convert (which already owns the bytes) or be amortized into an
  * existing compaction pass, not run as a standalone job over 100 TB.
  *
  * {{{ sbt "runMain graft.tools.FooterStampProbe <parquetDir>" }}}
  */
object FooterStampProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val src = args.headOption.getOrElse(
      sys.error("usage: FooterStampProbe <parquetDir>"))
    val conf = new org.apache.hadoop.conf.Configuration()
    def bytesOf(d: java.io.File): Long =
      org.apache.commons.io.FileUtils.sizeOfDirectory(d)
    def copyTo(dst: java.io.File): Unit = {
      org.apache.commons.io.FileUtils.deleteQuietly(dst)
      org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(src), dst)
    }
    def stampedOk(dir: String): Boolean =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .forall { f =>
          val rgs = FooterSort.sortingColumnsOf(f)
          rgs.nonEmpty && rgs.forall(_.nonEmpty)
        }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val work = new java.io.File("/tmp/graft_stamp_probe")
    val inplaceDir = new java.io.File(work, "inplace")
    val fsDir = new java.io.File(work, "fs")
    copyTo(inplaceDir); copyTo(fsDir)
    val total = bytesOf(inplaceDir)
    try Runtime.getRuntime.exec(Array("sync")).waitFor() catch { case _: Throwable => () }

    val inplaceSec = time {
      FooterSort.stamp(inplaceDir.getAbsolutePath, Seq("script"),
        unsigned = Seq("vout", "height", "amount"))
    }
    require(stampedOk(inplaceDir.getAbsolutePath), "in-place stamp missing")
    val fsSec = time {
      FooterSort.stampFs(conf, fsDir.getAbsolutePath, Seq("script"),
        unsigned = Seq("vout", "height", "amount"))
    }
    require(stampedOk(fsDir.getAbsolutePath), "fs stamp missing")

    println(
      s"""{"metric":"footer_stamp","bytes":$total,""" +
      f""""inplace_sec":$inplaceSec%.3f,"fs_copy_sec":$fsSec%.3f,""" +
      f""""fs_copy_mb_per_s":${total / 1e6 / fsSec}%.0f,""" +
      f""""cost_ratio":${fsSec / math.max(inplaceSec, 1e-9)}%.0f}""")
    org.apache.commons.io.FileUtils.deleteQuietly(work)
  }
}
