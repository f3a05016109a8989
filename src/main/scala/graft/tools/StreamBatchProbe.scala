package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-micro-batch attribution for the S17 bench wall (r14): runs the
  * exact `s_eventlog_tumbling` pipeline and prints every micro-batch's
  * `durationMs` breakdown (addBatch / getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets) plus state-operator
  * metrics — the numbers that say whether the 8-batch stream's wall is
  * state-store IO, per-batch planning, shuffle, or source overhead.
  * Optional args switch the suspects one at a time:
  *
  * {{{ sbt "runMain graft.tools.StreamBatchProbe <sfDir> [shufflePartitions] [checkpointBase] [batches] [provider]" }}}
  *
  * r15 knobs: `batches` (default 8) sizes maxRowsPerTrigger = rows /
  * batches — the fixed per-batch trigger overhead is the suspect the
  * r14 verdict left on the table; `provider` = `rocksdb` switches the
  * state store to RocksDB + changelog checkpointing (the event-time
  * dedup entries' r14 win) so the HDFS-backed commit cost can be
  * compared like-for-like.
  */
object StreamBatchProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: StreamBatchProbe <sfDir> [shufflePartitions] [ckBase] [batches] [provider]"))
    val shufflePartitions = args.lift(1).getOrElse("32")
    val ckBase = args.lift(2).filter(_ != "-")
    val batches = args.lift(3).map(_.toInt).getOrElse(8)
    val rocksdb = args.lift(4).contains("rocksdb")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-batch-probe")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (rocksdb) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }

    val path = s"$dir/events.parquet"
    val total = spark.read.format("eventlog").load(path).count()

    def runOnce(label: String): Double = {
      val agg = spark.readStream.format("eventlog")
        .option("partitions", "4")
        .option("maxRowsPerTrigger", math.max(1L, total / batches).toString)
        .load(path)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(unix_millis(col("w.start")).as("hour_start_ms"), col("event_type"),
          col("n"), col("total_value"))
      val name = s"probe_${java.util.UUID.randomUUID().toString.take(8)}"
      val t0 = System.nanoTime()
      val writer = agg.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
        .format("memory")
        .queryName(name)
      ckBase.foreach(b => writer.option("checkpointLocation", s"$b/$name"))
      val q = writer.start()
      try q.processAllAvailable()
      finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[$label] wall ${wall}%6.2f s  (shufflePartitions=$shufflePartitions batches=$batches rocksdb=$rocksdb ck=${ckBase.getOrElse("tmp-default")})")
      q.recentProgress.foreach { p =>
        val dm = p.durationMs
        val so = p.stateOperators.headOption
        System.err.println(
          f"  batch ${p.batchId}%2d rows=${p.numInputRows}%7d " +
          f"trigger=${dm.getOrDefault("triggerExecution", -1L)}%5d " +
          f"addBatch=${dm.getOrDefault("addBatch", -1L)}%5d " +
          f"getBatch=${dm.getOrDefault("getBatch", -1L)}%4d " +
          f"latestOffset=${dm.getOrDefault("latestOffset", -1L)}%4d " +
          f"planning=${dm.getOrDefault("queryPlanning", -1L)}%4d " +
          f"walCommit=${dm.getOrDefault("walCommit", -1L)}%4d " +
          f"commitOffsets=${dm.getOrDefault("commitOffsets", -1L)}%4d " +
          so.map(s => f"stateCommit=${s.allUpdatesTimeMs + s.commitTimeMs}%5d rows=${s.numRowsTotal}%5d").getOrElse(""))
      }
      spark.sql(s"DROP TABLE IF EXISTS $name")
      wall
    }

    runOnce("warm")
    val walls = (1 to 3).map(i => runOnce(s"run$i"))
    System.err.println(f"[probe] min-of-3 ${walls.min}%6.2f s")
    spark.stop()
  }
}
