package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the sustained-convert benchmark: times each
  * phase of the 10M-coin convert separately (index pass, decode-only
  * through the noop sink, full decode+write) so a regression in the
  * recorded `utxo_convert_10m` number can be attributed to decode,
  * write, or host IO rather than guessed at. Run:
  * `sbt "runMain graft.tools.ConvertProbe /tmp/graft_bench_snap10_v2.bin"`.
  */
object ConvertProbe {
  def main(args: Array[String]): Unit = {
    val snap = args.headOption.getOrElse("/tmp/graft_bench_snap10_v2.bin")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-convert-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sync(): Unit =
      try Runtime.getRuntime.exec(Array("sync")).waitFor()
      catch { case _: Throwable => () }
    def time(label: String)(f: => Unit): Double = {
      sync()
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s $s%8.3f s")
      s
    }

    // warmup: JVM + codegen + parquet machinery on the small snapshot
    graft.sources.UtxoConvert.convert(spark, "/tmp/graft_bench_snap_v2.bin",
      "/tmp/probe_warmup", partitions = 32)

    val hconf = spark.sparkContext.hadoopConfiguration
    time("index (cold memo)") {
      graft.codec.SnapshotIndexer.index(snap, conf = hconf)
    }
    time("index (memoized)") {
      graft.codec.SnapshotIndexer.index(snap, conf = hconf)
    }
    (1 to 2).foreach { i =>
      time(s"decode-only noop #$i") {
        spark.read.format("utxo").option("coinsPerSplit", "65536").load(snap)
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      time(s"full convert #$i") {
        graft.sources.UtxoConvert.convert(spark, snap,
          "/tmp/probe_convert10_out", partitions = 32)
      }
    }
    spark.stop()
  }
}
