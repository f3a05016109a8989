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
    * Returns the number of files NEWLY landed (0 on a no-op re-run).
    * Unlike [[pinMtimesToPathOrder]] this never calls `setTimes`, so it
    * works on capability-less stores; `FileIngestOrderSpec` proves
    * exact results on a FS double whose `setTimes` throws.
    *
    * CRASH SAFETY under S3-class rename (r9): on an object store,
    * `rename` is COPY-then-DELETE — the destination appears atomically
    * under its final name, but a crash between the two leaves the
    * staging object lingering beside it (and a crash mid-copy leaves
    * only the staging object). Either way the stream cannot
    * double-read: the staging name is dot-prefixed, which the file
    * source's hidden-file filter never admits. A RE-RUN of the stager
    * is idempotent: a file already visible under its final name is
    * NEVER re-landed (a second PUT would assign it a fresh creation
    * mtime BEHIND files staged after it, breaking the order contract
    * for a restarted stream's initial listing) — its lingering staging
    * object is deleted and the walk continues with the files that
    * never landed. `FileIngestOrderSpec` injects the mid-rename crash
    * on a copy+delete FS double and proves recovery.
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
    var landed = 0
    files.foreach { st =>
      val name = st.getPath.getName
      val staging = new Path(dst, s".$name.staging")
      val fin = new Path(dst, name)
      if (dfs.exists(fin)) {
        // already landed (this run's predecessor, or a crashed run
        // whose rename COPY completed with the source delete lost):
        // keep it untouched, clear the leftover staging object
        dfs.delete(staging, false)
      } else {
        while (System.currentTimeMillis() <= prev) Thread.sleep(1)
        // overwrite=true: a crash mid-copy leaves a partial staging
        // object on posix-like stores; restaging replaces it whole
        org.apache.hadoop.fs.FileUtil.copy(sfs, st.getPath, dfs, staging,
          false, true, conf)
        if (!dfs.rename(staging, fin)) {
          dfs.delete(staging, false)
          throw new java.io.IOException(s"stage rename failed: $staging -> $fin")
        }
        landed += 1
        prev = dfs.getFileStatus(fin).getModificationTime
      }
    }
    landed
  }
}
