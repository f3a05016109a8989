package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Root-cause attribution for the r14 `x_jaccard_pairs_prefix` sf1
  * regression: the dict-encoded rewrite probed at 18 s
  * (JaccardDictProbe variant C) but ran 177-200 s through
  * RegistryBench. ONE session, configured exactly like the registry
  * bench (AQE explicitly on), times three forms:
  *
  *  A. the shipped `exactJaccardPairsPrefix` as-is
  *  B. the shipped form with AQE disabled for the single run
  *  C. JaccardDictProbe's variant C verbatim (row_number dict, no
  *     spread) under the registry conf
  *
  * A slow + B fast  -> AQE plan interaction owns the regression.
  * A slow + C fast  -> a code difference between the shipped port and
  *                     the probed variant owns it.
  * A, C both slow   -> the registry session conf (not the probed
  *                     code) differs from the probe session in some
  *                     third way.
  *
  * {{{ sbt "runMain graft.tools.JaccardFixProbe <sfDir>" }}}
  */
object JaccardFixProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: JaccardFixProbe <sfDir>"))
    val tau = 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jaccard-fix-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Queries.t
    System.err.println(s"[probe] adaptive.enabled default-session value: " +
      spark.conf.get("spark.sql.adaptive.enabled"))

    val eps = 1e-9

    def probeC(): DataFrame = {
      val d = t(spark, dir, "documents")
        .select(col("doc_id"),
          array_distinct(graft.functions.GraftFunctions.shingles(col("text"), 3)).as("sh"))
      val post = d.select(col("doc_id"), explode(col("sh")).as("s"))
      val freq = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val dict = freq.select(col("s"),
        row_number().over(Window.orderBy(col("df"), col("s"))).as("sid"))
      val posti = post.join(broadcast(dict), Seq("s"))
        .select(col("doc_id"), col("sid"))
        .localCheckpoint()
      val w = Window.partitionBy(col("doc_id")).orderBy(col("sid"))
      val prefix = posti
        .withColumn("pos", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .filter(col("pos") <= floor(col("n") * (1.0 - tau)) + 1)
        .select(col("doc_id"), col("sid"), col("pos"), col("n"))
      val reqOverlap = (col("x.n") + col("y.n")) * (tau / (1.0 + tau)) - eps
      val maxOverlap = least(col("x.pos"), col("y.pos")) - 1 + lit(1) +
        least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos"))
      val cand = prefix.as("x").join(prefix.as("y"),
          col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id") &&
            col("x.n") >= col("y.n") * tau - eps &&
            col("y.n") >= col("x.n") * tau - eps &&
            maxOverlap.cast("double") >= reqOverlap)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val ds = posti.groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("sid"))).as("sh"), count(lit(1)).as("n"))
      val need = greatest(lit(0),
        ceil((col("na") + col("nb")) * (tau / (1.0 + tau)) - eps)).cast("int")
      cand
        .join(ds.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
          col("n").as("na")), Seq("doc_a"))
        .join(ds.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
          col("n").as("nb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          graft.functions.GraftFunctions.sortedCommonAtLeast(
            col("sh_a"), col("sh_b"), need).as("i"))
        .filter(col("i").cast("double") / (col("na") + col("nb") - col("i")) >= tau)
        .select(col("doc_a"), col("doc_b"))
        .distinct()
    }

    def time(name: String)(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val rows = mk.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $name%-12s ${sec}%8.2f s  rows=$rows")
      sec
    }

    val tA = time("A_shipped") {
      graft.queries.QueriesLLM.exactJaccardPairsPrefix(spark, dir, tau) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val tB = time("B_aqe_off") {
      graft.queries.QueriesLLM.exactJaccardPairsPrefix(spark, dir, tau) }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val tC = time("C_probe") { probeC() }

    println(s"""{"probe":"jaccard_fix","sf_dir":"$dir",""" +
      s""""a_shipped_sec":$tA,"b_aqe_off_sec":$tB,"c_probe_sec":$tC}""")
    spark.stop()
  }
}
