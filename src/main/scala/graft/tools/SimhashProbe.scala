package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attribution probe for the banded SimHash near-dup entry: times
  * the fingerprint pass, the band explode, the candidate join, and the
  * full pipeline separately, and prints the band-bucket occupancy
  * histogram (the within-bucket m² pair count is the superlinear
  * term). Kept in-tree for the same reason as [[DedupProbe]]:
  * candidate-volume and bucket-skew regressions are scale bugs a
  * one-line histogram catches early.
  *
  * {{{ sbt "runMain graft.tools.SimhashProbe <corpusDir>" }}}
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[simhash-probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val sig = graft.queries.QueriesLLM.simhashAll(spark, dir)
    // sum of fp%1000, not sum(fp): 2^60-scale fps overflow a LONG sum
    time("fp (cold)")(sig.agg(sum(pmod(col("fp"), lit(1000L)))).collect())
    time("fp (warm)")(sig.agg(sum(pmod(col("fp"), lit(1000L)))).collect())
    val bands = sig.select(col("doc_id"), col("fp"),
      posexplode(graft.queries.QueriesLLM.simhashBandArray(col("fp")))
        .as(Seq("band_idx", "band_bits")))
    time("bands count")(bands.count())
    val a = bands.select(col("band_idx"), col("band_bits"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = bands.select(col("band_idx"), col("band_bits"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    val cand = a.join(b, Seq("band_idx", "band_bits"))
      .filter(col("doc_a") < col("doc_b"))
    val nCand = time("candidate count")(cand.count())
    println(s"[simhash-probe] candidate pairs: $nCand")
    time("cand SMJ (hint)")(a.hint("merge")
      .join(b, Seq("band_idx", "band_bits"))
      .filter(col("doc_a") < col("doc_b")).count())
    time("cand broadcast")(a.hint("broadcast")
      .join(b, Seq("band_idx", "band_bits"))
      .filter(col("doc_a") < col("doc_b")).count())
    time("cand shuffle_hash")(a.hint("shuffle_hash")
      .join(b, Seq("band_idx", "band_bits"))
      .filter(col("doc_a") < col("doc_b")).count())
    val S = 16 // the rejected salt width (see simhashNearDupPairs notes)
    val aS = a.withColumn("salt", pmod(col("doc_a"), lit(S)))
    val bS = b.withColumn("salt", explode(array((0 until S).map(lit(_)): _*)))
    time("cand SHJ + salt")(aS.hint("shuffle_hash")
      .join(bS, Seq("band_idx", "band_bits", "salt"))
      .filter(col("doc_a") < col("doc_b")).count())
    time("cand SHJ (repeat)")(a.hint("shuffle_hash")
      .join(b, Seq("band_idx", "band_bits"))
      .filter(col("doc_a") < col("doc_b")).count())
    println("[simhash-probe] default plan:")
    cand.explain()
    val surv = cand
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= graft.queries.QueriesLLM.SimhashTau)
    val nSurv = time("survivor count")(surv.count())
    println(s"[simhash-probe] surviving pairs: $nSurv")
    time("full entry")(
      graft.queries.QueriesLLM.simhashNearDup(spark, dir).count())
    println("=== band-bucket occupancy (log2 buckets) ===")
    bands.groupBy("band_idx", "band_bits").agg(count(lit(1)).as("n"))
      .groupBy(expr("int(floor(log2(n)))").as("log2_size"))
      .agg(count(lit(1)).as("n_buckets"), sum(expr("n*(n-1)/2")).as("pairs"))
      .orderBy("log2_size").show(40, false)
    println("=== top 10 fattest buckets ===")
    bands.groupBy("band_idx", "band_bits").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(10).show(10, false)
    spark.stop()
  }
}
