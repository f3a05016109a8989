package graft.tools

/** Mechanical host-weather adjudication (r12 verdict item 5): r10–r12
  * each spent judge+builder effort re-litigating whether a wall moved
  * because of CODE or because this shared host was 1.4–2.7× slower
  * that day. Every bench artifact now carries a fixed calibration
  * anchor — one single-thread CPU-bound kernel and one /dev/shm
  * sequential scan, each timed (min of [[Reps]]) BEFORE and AFTER the
  * measured pass — normalized against reference constants pinned on a
  * quiet r13 window. `weather_factor` ≈ 1 ⇒ walls are comparable to
  * the pinned rounds; ≫ 1 ⇒ the host was loaded and regressions must
  * be normalized before adjudicating. The two probes split the blame:
  * the CPU kernel degrades under core contention (what short codegen
  * entries see), the shm scan under memory-bandwidth contention (what
  * shuffle/scan-bound entries see).
  *
  * The kernel is deterministic fixed work (xorshift-star stream +
  * double FMA mix, result folded into the JSON so the JIT cannot
  * dead-code it); the scan reads a fixed 256 MiB tmpfs file through a
  * reused direct buffer (written once per host boot, content
  * irrelevant). Neither touches Spark: the anchor must measure the
  * HOST, not the session's cache or shuffle state.
  */
object Calibration {
  /** min-of-N per probe: defeats scheduler blips without hiding
    * sustained load (a loaded host inflates ALL N runs).
    */
  val Reps = 3

  /** Reference seconds pinned on a quiet window of the r13 host (the
    * same host r6–r12 published on; the r12 verdict measured the r12
    * window itself at 1.4–2.7× above the r6 floor, so ≈1.0 here means
    * "quiet-r13-equivalent", not "best ever seen").
    */
  val CpuRefSec = 0.31
  val ShmRefSec = 0.065

  private val ShmBytes = 256L * 1024 * 1024
  private val ShmFile = "/dev/shm/graft_calibration_256m"

  /** Fixed single-thread work: 200M xorshift64* steps with a double
    * mix folded in. Returns (seconds, checksum) — callers must emit
    * the checksum so the loop is observably live.
    */
  def cpuOnce(): (Double, Long) = {
    var x = 0x9E3779B97F4A7C15L
    var acc = 0.0
    val t0 = System.nanoTime()
    var i = 0
    while (i < 200000000) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      val y = x * 0x2545F4914F6CDD1DL
      if ((y & 0xFFFFFL) == 0L) acc += java.lang.Double.longBitsToDouble(
        (y & 0x000FFFFFFFFFFFFFL) | 0x3FF0000000000000L)
      i += 1
    }
    ((System.nanoTime() - t0) / 1e9, x ^ java.lang.Double.doubleToLongBits(acc))
  }

  private def ensureShmFile(): Boolean = {
    val f = new java.io.File(ShmFile)
    try {
      if (!f.exists() || f.length() != ShmBytes) {
        // write-then-ATOMIC-rename: concurrent bench processes either
        // see the old complete file or the new complete file, never a
        // truncated/partial one (a short read here would fabricate a
        // bogus weather_factor with no error)
        val tmp = java.io.File.createTempFile("graft_calibration_", ".tmp",
          f.getParentFile)
        val ch = java.nio.channels.FileChannel.open(tmp.toPath,
          java.nio.file.StandardOpenOption.WRITE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
        try {
          val buf = java.nio.ByteBuffer.allocateDirect(8 * 1024 * 1024)
          var written = 0L
          while (written < ShmBytes) {
            buf.clear()
            while (buf.hasRemaining) buf.putLong(written + buf.position())
            buf.flip()
            written += ch.write(buf)
          }
        } finally ch.close()
        java.nio.file.Files.move(tmp.toPath, f.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      true
    } catch { case _: Throwable => false } // no tmpfs → cpu-only anchor
  }

  /** One sequential read of the 256 MiB tmpfs file. */
  def shmOnce(): Double = {
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(ShmFile), java.nio.file.StandardOpenOption.READ)
    try {
      val buf = java.nio.ByteBuffer.allocateDirect(8 * 1024 * 1024)
      val t0 = System.nanoTime()
      var read = 0L
      while (read < ShmBytes) {
        buf.clear()
        val n = ch.read(buf, read)
        if (n <= 0) read = ShmBytes else read += n
      }
      (System.nanoTime() - t0) / 1e9
    } finally ch.close()
  }

  /** One calibration sample: min-of-[[Reps]] CPU seconds, min-of-
    * [[Reps]] shm seconds (NaN when no tmpfs), and the live checksum.
    */
  def sample(): (Double, Double, Long) = {
    val cpuRuns = (1 to Reps).map(_ => cpuOnce())
    val shm =
      if (ensureShmFile()) (1 to Reps).map(_ => shmOnce()).min
      else Double.NaN
    (cpuRuns.map(_._1).min, shm, cpuRuns.map(_._2).reduce(_ ^ _))
  }

  /** JSON fragment (no braces) for an artifact line: before/after
    * anchors plus the headline `weather_factor` = the max normalized
    * ratio over both probes and both sides — the number that replaces
    * a round of weather litigation.
    */
  def json(before: (Double, Double, Long), after: (Double, Double, Long)): String = {
    def ratios(s: (Double, Double, Long)): Seq[Double] =
      Seq(s._1 / CpuRefSec) ++
        (if (s._2.isNaN) Seq.empty else Seq(s._2 / ShmRefSec))
    val wf = (ratios(before) ++ ratios(after)).max
    def fmt(d: Double): String = if (d.isNaN) "null" else f"$d%.4f"
    s""""calibration":{"cpu_before_sec":${fmt(before._1)},"shm_before_sec":${fmt(before._2)},""" +
      s""""cpu_after_sec":${fmt(after._1)},"shm_after_sec":${fmt(after._2)},""" +
      s""""cpu_ref_sec":$CpuRefSec,"shm_ref_sec":$ShmRefSec,""" +
      s""""checksum":"${java.lang.Long.toHexString(before._3)}"},""" +
      s""""weather_factor":${f"$wf%.3f"}"""
  }
}
