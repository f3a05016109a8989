package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The conversion pipeline (SURVEY.md §2.1 R2, §3.1): snapshot →
  * query-optimized Parquet.
  *
  * Layout choices mirror the reference's physical engineering
  * (`/root/reference/src/main.rs:208-216`) re-expressed in Spark terms:
  *  - ZSTD compression;
  *  - `script`-clustered row groups: `sortWithinPartitions("script")`
  *    reproduces the reference's per-batch partial sort (R4) exactly —
  *    sorted within each writer task, unordered across; with
  *    `rangePartition=true` the write instead range-partitions on
  *    `script` first (one extra shuffle) for *global* clustering, which
  *    is what you want at 100 TB: every executor owns a disjoint script
  *    range, so a point query prunes to one file, not one row group per
  *    file;
  *  - small row groups (`parquet.block.size`) for fine-grained skipping,
  *    approximating the reference's 64Ki-row cap (byte-based is the
  *    Spark-exposed knob — declared deviation, SURVEY.md §4);
  *  - page-level column statistics / column index are parquet-mr
  *    defaults, giving the same page-skipping DuckDB exploits.
  *
  * The footer `sortingColumns` field is not writable through Spark's
  * public API; documented omission (readers skip via min/max stats, not
  * that field).
  */
object UtxoConvert {

  def load(spark: SparkSession, input: String): DataFrame =
    spark.read.format("utxo").load(input)

  def convert(spark: SparkSession, input: String, output: String,
      partitions: Int = 0, rangePartition: Boolean = false,
      blockSizeBytes: Long = 16L * 1024 * 1024,
      zstdLevel: Int = 1): Unit = {
    val n = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    // level 1 keeps the convert CPU-bound on decode, not the codec;
    // within a few % of level-3 size on script-sorted data
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.compression.codec.zstd.level", zstdLevel)
    val df = load(spark, input)
    // indexed scans (source default) already plan ~64Ki-coin partitions:
    // write straight from them — zero shuffled bytes. Shuffle only when
    // global script clustering is requested.
    val shaped =
      if (rangePartition) df.repartitionByRange(n, col("script"))
      else df
    shaped
      .sortWithinPartitions("script")
      .write
      .mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("parquet.block.size", blockSizeBytes.toString)
      .option("parquet.page.size", (64 * 1024).toString)
      .parquet(output)
  }

  /** CLI parity with the reference binary (`-i snapshot -o parquet`). */
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val input = opts.getOrElse("-i", sys.error("missing -i <snapshot>"))
    val output = opts.getOrElse("-o", sys.error("missing -o <parquet>"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("utxo-convert")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try convert(spark, input, output)
    finally spark.stop()
  }
}
