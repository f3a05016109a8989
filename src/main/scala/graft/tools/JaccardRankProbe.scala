package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Piecewise attribution for the r15 scalable-dictionary-rank port of
  * `exactJaccardPairsPrefix`: JaccardFixProbe showed shipped-A 162 s vs
  * old-dict-C 18.6 s at sf1 with AQE ruled out, while sf0.1 and the
  * oracle both IMPROVED — so the regression sits somewhere inside the
  * dict build/apply chain, not in the candidate join. One session,
  * RegistryBench conf, times each stage of the new chain and then the
  * old row_number dict's posting join for contrast.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JaccardRankProbe <sfDir>" }}}
  */
object JaccardRankProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: JaccardRankProbe <sfDir>"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jaccard-rank-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.queries.Queries
    import graft.functions.GraftFunctions.shingles

    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[piece] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val p = spark.sparkContext.defaultParallelism
    val d = tm("d checkpoint") {
      Queries.spread(Queries.t(spark, dir, "documents"), Queries.SpreadHeavy)
        .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("sh"))
        .localCheckpoint()
    }
    val post = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val freq = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
    tm("freq noop") { freq.write.format("noop").mode("overwrite").save() }
    val byRange = tm("byRange checkpoint") {
      freq.repartitionByRange(p, col("df"), col("s"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
    }
    val offsets = byRange.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .select(col("pid"), coalesce(
        sum(col("cnt")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
    val dict = byRange
      .withColumn("lrank",
        row_number().over(Window.partitionBy(col("pid")).orderBy(col("df"), col("s"))))
      .join(broadcast(offsets), Seq("pid"))
      .select(col("s"), (col("off") + col("lrank")).cast("int").as("sid"))
    tm("dict noop") { dict.write.format("noop").mode("overwrite").save() }
    val posti = tm("posti checkpoint (new)") {
      post.join(broadcast(dict), Seq("s"))
        .select(col("doc_id"), col("sid")).localCheckpoint()
    }
    val dictOld = freq.select(col("s"),
      row_number().over(Window.orderBy(col("df"), col("s"))).as("sid"))
    val postiOld = tm("posti checkpoint (old)") {
      post.join(broadcast(dictOld), Seq("s"))
        .select(col("doc_id"), col("sid")).localCheckpoint()
    }
    System.err.println(s"[piece] rows new=${posti.count()} old=${postiOld.count()}")
    spark.stop()
  }
}
