package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The Kafka-shaped streaming DSv2 source (EventLogSource): batch/stream
  * parity with the native parquet reader, rate-limited multi-batch
  * drains, offset determinism, and the headline claim — offset-range
  * recovery across a kill/restart (exactly-once resume from the
  * committed offset vector in the checkpoint).
  */
class EventLogSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private val events = s"$dir/events.parquet"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("eventlog-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Ground truth: the engine's normal batch read of the same fixture,
    * ts normalized exactly like the source normalizes it.
    */
  private def groundTruth = graft.queries.Queries.t(spark, dir, "events")

  test("batch read through the log source == native parquet read (all columns)") {
    val got = spark.read.format("eventlog").option("partitions", "4").load(events)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val want = groundTruth
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("column pruning reaches the reader: projected + fully-pruned counts") {
    val src = spark.read.format("eventlog").load(events)
    // two-column projection decodes only those pages (reader-level
    // requested schema) and must still match
    assert(sortedRows(src.select("event_id", "event_type")) ==
      sortedRows(groundTruth.select("event_id", "event_type")))
    // count(*) prunes every column: the CountReader path
    assert(src.count() == groundTruth.count())
  }

  test("rate-limited stream drains in multiple micro-batches and equals the batch read") {
    val ckpt = java.nio.file.Files.createTempDirectory("eventlog-ck").toString
    val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("eventlog")
      .option("partitions", "4")
      .option("maxRowsPerTrigger", "300")
      .load(events)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("eventlog_drain")
      .start()
    try q.processAllAvailable() finally q.stop()
    q.recentProgress.foreach(p => if (p.numInputRows > 0) rows += p.numInputRows)
    assert(rows.length >= 3, s"expected a multi-batch drain, got batches of $rows")
    assert(rows.forall(_ <= 300), s"admission limit violated: $rows")
    val got = spark.table("eventlog_drain")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(sortedRows(got) == sortedRows(
      groundTruth.select("event_id", "ts", "user_id", "event_type", "value", "props")))
  }

  test("kill/restart: second incarnation resumes exactly-once from the committed offsets") {
    val ckpt = java.nio.file.Files.createTempDirectory("eventlog-recov-ck").toString
    val out = java.nio.file.Files.createTempDirectory("eventlog-recov-out").toString + "/t"
    def start() = spark.readStream.format("eventlog")
      .option("partitions", "4")
      .option("maxRowsPerTrigger", "100")
      .load(events)
      .select("event_id", "user_id", "event_type")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    // first incarnation: at least one committed batch, then KILL
    val q1 = start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.recentProgress.length < 1 && System.nanoTime() < deadline)
      Thread.sleep(100)
    q1.stop()
    val committedBefore = new java.io.File(ckpt, "commits").listFiles()
      .count(!_.getName.startsWith("."))
    assert(committedBefore >= 1, "first incarnation must commit at least one batch")
    val rowsBefore = spark.read.parquet(out).count()
    assert(rowsBefore < 1000, "the kill must land mid-stream, not after the drain")

    // second incarnation on the SAME checkpoint: resumes from the
    // recorded offset vector — no reprocessing (dup rows), no loss
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).select("event_id", "user_id", "event_type")
    val want = groundTruth.select("event_id", "user_id", "event_type")
    assert(sortedRows(got) == sortedRows(want))
  }

  test("Trigger.AvailableNow drains the log in rate-limited batches, then stops (S13 shape)") {
    val ckpt = java.nio.file.Files.createTempDirectory("eventlog-an-ck").toString
    val q = spark.readStream.format("eventlog")
      .option("partitions", "4")
      .option("maxRowsPerTrigger", "300")
      .load(events)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("eventlog_an")
      .start()
    // AvailableNow TERMINATES on its own once the snapshot is drained —
    // the batch-over-stream backfill mode; no stop() needed
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3,
      s"AvailableNow must honor the admission limit across batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 300))
    val got = spark.table("eventlog_an")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(sortedRows(got) == sortedRows(
      groundTruth.select("event_id", "ts", "user_id", "event_type", "value", "props")))
  }

  test("INT96 timestamp segments (the Spark writer's default layout) read identically") {
    val dir = java.nio.file.Files.createTempDirectory("eventlog-int96").toString + "/t"
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try groundTruth.select("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val got = spark.read.format("eventlog").load(dir)
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(sortedRows(got.select("event_id", "ts", "event_type")) ==
      sortedRows(spark.read.parquet(dir).select("event_id", "ts", "event_type")))
  }

  test("offsets: json roundtrip, determinism, and loud partition-map drift") {
    val o = EventLogOffset(Array(3L, 0L, 250L))
    assert(o.json() == """{"ends":[3,0,250]}""")
    assert(EventLogOffset.parse(o.json(), 3) == o)
    // replay determinism: the same offset pair plans the same rows
    val conf = UtxoTable.hadoopConf()
    val ranges = EventLogTable.planRanges(events, 4, conf)
    assert(ranges.length == 4)
    assert(ranges.map(_.length).sum == groundTruth.count())
    // partition-map drift must fail loudly, never resume misaligned
    val e = intercept[IllegalArgumentException] {
      EventLogOffset.parse(o.json(), 4)
    }
    assert(e.getMessage.contains("partition map must not change"))
  }
}
