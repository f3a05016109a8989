package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style diagnostic for the LSH banding: prints the band-key
  * bucket-size distribution and the est-jaccard histogram of candidate
  * pairs on a corpus dir. Kept in-tree because candidate-volume
  * regressions are exactly the kind of scale bug a one-line histogram
  * catches early.
  *
  * {{{ sbt "runMain graft.tools.DedupProbe <corpusDir>" }}}
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val sigArr = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.minhashSigs(col("text")).as("sigs"))
      .filter(col("sigs").isNotNull)
    val banded = sigArr.select(col("doc_id"),
        explode(sequence(lit(0), lit(7))).as("band"), col("sigs"))
      .withColumn("band_key",
        concat_ws("_", transform(slice(col("sigs"), col("band") * 2 + 1, lit(2)),
          v => v.cast("string"))))
    val buckets = banded.groupBy("band", "band_key").agg(count(lit(1)).as("n"))
    println("=== bucket size histogram (log2 buckets) ===")
    buckets.groupBy(expr("int(floor(log2(n)))").as("log2_size"))
      .agg(count(lit(1)).as("n_buckets"), sum(expr("n*(n-1)/2")).as("pairs"))
      .orderBy("log2_size").show(40, false)
    println("=== top 10 fattest buckets ===")
    buckets.orderBy(desc("n")).limit(10).show(10, false)
    println("=== sample sigs of docs in the fattest bucket ===")
    val top = buckets.orderBy(desc("n")).limit(1).collect()(0)
    banded.filter(col("band") === top.getAs[Int]("band") &&
        col("band_key") === top.getAs[String]("band_key"))
      .select("doc_id", "sigs").show(5, false)
    spark.stop()
  }
}
