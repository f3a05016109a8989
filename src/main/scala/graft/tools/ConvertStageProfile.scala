package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of the CLUSTERED 177.5M convert — the r9 verdict's
  * attribution task: the r8 full-scale wall (best 111.0 s, runs
  * [163, 111]) sat ~2.4× above r6's 47.1 s on code unchanged since r6
  * with a flat 2M-scale bench history, and "environment, not
  * regression" was an attribution without a measurement. This tool
  * takes the measurement: min-of-N clustered converts (same snapshot,
  * spill, and output policy as [[LargeConvertBench]]) with a
  * SparkListener recording, per stage and per run — task wall
  * (executorRunTime), task CPU (executorCpuTime), GC, shuffle bytes
  * written/read, shuffle WRITE time and FETCH-WAIT time, and
  * memory/disk spill.
  *
  * Reading the result: the clustered convert is two stages — the
  * decode+shuffle-write map stage and the range-partitioned
  * sort+parquet-write reduce stage. If the wall moved but per-stage
  * CPU matches its r6-implied budget while write/fetch-wait/GC grew,
  * the divergence is host IO/scheduling weather (environment); if CPU
  * itself grew, the regression is real and localized to that stage.
  *
  * {{{ sbt "runMain graft.tools.ConvertStageProfile [nCoins] [runs]" }}}
  */
object ConvertStageProfile {

  final case class StageRow(
      id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long,
      shWriteBytes: Long, shWriteMs: Long,
      shReadBytes: Long, fetchWaitMs: Long,
      memSpill: Long, diskSpill: Long,
      inBytes: Long, outBytes: Long)

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nCoins = args.headOption.map(_.toInt).getOrElse(177500000)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shmSpill = new java.io.File("/dev/shm")
    val localDir = if (shmSpill.isDirectory && shmSpill.canWrite) {
      val d = new java.io.File(shmSpill, "graft_profile_spill")
      d.mkdirs(); d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-convert-stage-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // snapshot: shared with LargeConvertBench (same name → reuse)
    val snap = new java.io.File(s"/tmp/graft_large_snap_$nCoins.bin")
    if (!snap.exists() || snap.length() == 0) {
      val tmp = new java.io.File(snap.getPath + ".tmp")
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 20)
      val t0 = System.nanoTime()
      try graft.codec.SnapshotGen.writeSynthetic(out, nCoins, seed = 7L)
      finally out.close()
      if (!tmp.renameTo(snap)) throw new java.io.IOException(s"rename $tmp -> $snap failed")
      System.err.println(f"[profile] generated ${snap.length() / 1e9}%.2f GB in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val shm = new java.io.File("/dev/shm")
    val scratch = if (shm.isDirectory && shm.canWrite)
      new java.io.File(shm, "graft_profile") else new java.io.File("/tmp/graft_profile_scratch")
    scratch.mkdirs()

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(StageRow(
          si.stageId,
          si.name.takeWhile(_ != '\n').take(60),
          si.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime,
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleWriteMetrics.writeTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleReadMetrics.fetchWaitTime,
          m.memoryBytesSpilled, m.diskBytesSpilled,
          m.inputMetrics.bytesRead, m.outputMetrics.bytesWritten))
      }
    }

    def syncFs(): Unit =
      try Runtime.getRuntime.exec(Array("sync")).waitFor()
      catch { case _: Throwable => () }

    def timeConvert(out: String): Double = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      new java.io.File(out).mkdirs()
      syncFs()
      val t0 = System.nanoTime()
      // partitions = 0 → the convert's row-targeted auto sizing (r10):
      // core-count buckets spilled 23.4 GB mem + 17.0 GB disk against
      // an 18.8 GB shuffle in every r9 run; the profile now measures
      // the production auto path (the stage json's `tasks` field shows
      // the chosen reduce width)
      graft.sources.UtxoConvert.convert(spark, snap.getPath, out,
        partitions = 0, rangePartition = true)
      (System.nanoTime() - t0) / 1e9
    }

    // warm once (codegen/writer init is cold-start, not throughput)
    timeConvert(s"$scratch/warm")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$scratch/warm"))

    spark.sparkContext.addSparkListener(listener)
    def stageJson(r: StageRow): String =
      s"""{"stage":${r.id},"name":"${r.name.replace("\"", "'")}","tasks":${r.tasks},""" +
        s""""run_ms":${r.runMs},"cpu_ms":${r.cpuMs},"gc_ms":${r.gcMs},""" +
        s""""shuffle_write_bytes":${r.shWriteBytes},"shuffle_write_ms":${r.shWriteMs},""" +
        s""""shuffle_read_bytes":${r.shReadBytes},"fetch_wait_ms":${r.fetchWaitMs},""" +
        s""""mem_spill":${r.memSpill},"disk_spill":${r.diskSpill},""" +
        s""""input_bytes":${r.inBytes},"output_bytes":${r.outBytes}}"""

    val walls = (1 to runs).map { i =>
      stages.clear()
      val wall = timeConvert(s"$scratch/clustered")
      // drain listener events before reading the queue (the bus is
      // async and private; poll until the stage count is stable)
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val now = stages.size()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      val rows = {
        val b = Vector.newBuilder[StageRow]
        val it = stages.iterator()
        while (it.hasNext) b += it.next()
        b.result().sortBy(_.id)
      }
      println(f"""{"metric":"clustered_convert_profile","run":$i,"wall_sec":$wall%.3f,""" +
        s""""stages":[${rows.map(stageJson).mkString(",")}]}""")
      wall
    }
    org.apache.commons.io.FileUtils.deleteQuietly(scratch)
    // the r10 verdict's reproducibility lesson: a profile whose numbers
    // depend on the heap MUST carry the heap — record the JVM's real
    // maxMemory, the env override (or its absence), the core count, and
    // the bucket sizing the convert derived from them
    println(f"""{"metric":"clustered_convert_profile_summary","coins":$nCoins,"runs":$runs,""" +
      s""""walls_sec":${walls.map(w => f"$w%.3f").mkString("[", ",", "]")},""" +
      f""""best_sec":${walls.min}%.3f,""" +
      s""""heap_max_bytes":${Runtime.getRuntime.maxMemory},""" +
      s""""driver_mem_env":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "(default 8g)")}",""" +
      s""""cpus":$cpus,""" +
      s""""rows_per_bucket":${graft.sources.UtxoConvert.clusterRowsPerBucket(spark)},""" +
      s""""peak_rss_bytes":${LargeConvertBench.peakRssBytes()}}""")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/dev/shm/graft_profile_spill"))
  }
}
