package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribution for the `x_knn_classify` sf1 wall (r15): the entry is a
  * brute-force N·Q cosine scorer (declared oracle contract) and its
  * 18-23 s sf1 wall could sit in three different places — the
  * cross-join pair COMPUTE (dot products), the top-5 RANKING (window
  * vs bounded aggregate), or the vote rollup. One session, same conf
  * as RegistryBench, times:
  *
  *  A. pairs+dot only, noop sink (the irreducible kernel floor)
  *  B. the shipped form (bounded top-k aggregate)
  *  C. the r13/r14 row_number window form
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.KnnProbe <sfDir>" }}}
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: KnnProbe <sfDir>"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-knn-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.queries.Queries
    import graft.functions.GraftFunctions.{dot, norm}

    def base(): (DataFrame, DataFrame) = {
      val e = Queries.t(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          norm(col("embedding")).as("qn"), col("label").as("true_label"))
      val c = Queries.spread(e, Queries.SpreadHeavy).filter(col("vec_id") % 20 =!= 0)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
          norm(col("embedding")).as("cn"), col("label").as("cand_label"))
      (q, c)
    }

    def time(label: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        System.err.println(f"[probe] $label run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }

    val (q, c) = base()
    val pairs = q.crossJoin(c)
      .select(col("query_id"), col("true_label"), col("cand_id"), col("cand_label"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))

    time("A pairs+dot only     ")(pairs)
    time("B shipped (topk agg) ")(graft.queries.QueriesLLM.knnClassify(spark, dir))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cand_id"))
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("cand_label"))
    time("C window form (r13)  ")(
      pairs
        .withColumn("rnk", row_number().over(wRank))
        .filter(col("rnk") <= 5)
        .groupBy(col("query_id"), col("true_label"), col("cand_label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(wVote))
        .filter(col("vr") === 1)
        .select(col("query_id"), col("true_label"),
          col("cand_label").as("predicted_label"), col("votes"))
        .orderBy(col("query_id")))
    spark.stop()
  }
}
