package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Guard for the file-source watermark hazard found by the r6
  * streaming scale proof (ROUND6_NOTES §4): Spark's file streaming
  * source admits new files to micro-batches in MODIFICATION-TIME
  * order, and parallel part-file writes complete in arbitrary order —
  * so a later-event-time file landing first advances the watermark
  * past straggler files and their rows are silently dropped as late
  * (the proof's first runs lost 57% of dedup's output). The fix is an
  * ingest-order contract: file mtimes must respect event-time order.
  *
  * [[pinMtimesToPathOrder]] enforces that contract for the common case
  * where the writer already NAMES files in event-time order (Spark's
  * `part-00000..N` from an event-time-sorted write, date-partitioned
  * drops, log rotations): one `setTimes` sweep re-stamps mtimes in
  * lexicographic path order before the directory is handed to
  * `readStream`. Works through the Hadoop FileSystem (HDFS supports
  * `setTimes`; object stores generally do not — there, stage files
  * into the watched directory in order, or run a
  * `Trigger.AvailableNow` backfill first (S13), which reads
  * everything before any watermark advances).
  *
  * The alternative when path order does NOT encode event time: widen
  * the watermark to the full ingest out-of-orderness, or pre-sort
  * through a batch bronze table. `FileIngestOrderSpec` reproduces the
  * straggler drop without the guard and proves the guard restores
  * exact results.
  */
object FileIngestOrder {

  /** Re-stamp mtimes of all files matching `suffix` under `dir` so
    * lexicographic path order == mtime order (1 s apart, anchored at
    * the earliest existing mtime). Returns the number of files
    * stamped. Run AFTER the directory is fully written and BEFORE the
    * streaming query (re)starts discovering it.
    */
  def pinMtimesToPathOrder(conf: Configuration, dir: String,
      suffix: String = ".parquet"): Int = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val files = fs.listStatus(d)
      .filter(st => st.isFile && st.getPath.getName.endsWith(suffix))
      .sortBy(_.getPath.getName)
    if (files.isEmpty) return 0
    val base = files.map(_.getModificationTime).min
    files.zipWithIndex.foreach { case (st, i) =>
      fs.setTimes(st.getPath, base + i * 1000L, -1)
    }
    files.length
  }

  /** Object-store-safe ordered stager (r8 — the mechanism behind what
    * was previously advice): object stores reject `setTimes` (S3A
    * throws), so mtimes cannot be re-stamped in place — but an object's
    * "mtime" IS its PUT-completion time, so creation ORDER is the one
    * ordering channel the store itself guarantees. This copies files
    * from `srcDir` into the WATCHED `watchDir` one at a time in
    * lexicographic path (= event-time) order:
    *
    *  - sequential copies mean any listing a running stream takes sees
    *    a PREFIX of the staged sequence — no straggler can land behind
    *    a later-event file;
    *  - each file lands ATOMICALLY under its final name (written to a
    *    dot-prefixed staging name the source's hidden-file filter
    *    ignores, then renamed);
    *  - a clock-tick wait before each copy keeps landed mtimes
    *    STRICTLY increasing even at 1 ms granularity, so a
    *    `maxFilesPerTrigger` split never breaks a tie against path
    *    order.
    *
    * Returns the number of files staged. Unlike
    * [[pinMtimesToPathOrder]] this never calls `setTimes`, so it works
    * on capability-less stores; `FileIngestOrderSpec` proves exact
    * results on a FS double whose `setTimes` throws.
    */
  def stageInPathOrder(conf: Configuration, srcDir: String, watchDir: String,
      suffix: String = ".parquet"): Int = {
    val src = new Path(srcDir)
    val sfs = src.getFileSystem(conf)
    val dst = new Path(watchDir)
    val dfs = dst.getFileSystem(conf)
    dfs.mkdirs(dst)
    val files = sfs.listStatus(src)
      .filter(st => st.isFile && st.getPath.getName.endsWith(suffix))
      .sortBy(_.getPath.getName)
    // never land at-or-before anything already visible in the watch dir
    var prev = dfs.listStatus(dst).iterator
      .filter(_.isFile).map(_.getModificationTime)
      .foldLeft(Long.MinValue)(math.max)
    files.foreach { st =>
      while (System.currentTimeMillis() <= prev) Thread.sleep(1)
      val name = st.getPath.getName
      val staging = new Path(dst, s".$name.staging")
      org.apache.hadoop.fs.FileUtil.copy(sfs, st.getPath, dfs, staging,
        false, true, conf)
      val fin = new Path(dst, name)
      if (!dfs.rename(staging, fin)) {
        dfs.delete(staging, false)
        throw new java.io.IOException(s"stage rename failed: $staging -> $fin")
      }
      prev = dfs.getFileStatus(fin).getModificationTime
    }
    files.length
  }
}
