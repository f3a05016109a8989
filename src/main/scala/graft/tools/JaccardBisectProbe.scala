package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2×2 bisect for the r15 `x_jaccard_pairs_prefix` sf1 regression:
  * JaccardFixProbe read shipped-A 162 s vs old-dict-no-spread-C 18.6 s
  * in one session, while JaccardRankProbe timed every stage of the new
  * dict chain at ~1 s — so the regression must come from the SPREAD,
  * the DICT FORM, or an interaction, somewhere downstream of the
  * posting build. This probe runs the full query body with
  * (spread × dict) toggled independently and prints wall + candidate
  * count (the quantity the prefix order controls).
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JaccardBisectProbe <sfDir>" }}}
  */
object JaccardBisectProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: JaccardBisectProbe <sfDir>"))
    val tau = 0.2
    val eps = 1e-9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jaccard-bisect-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.queries.Queries
    import graft.functions.GraftFunctions.shingles

    def run(label: String, withSpread: Boolean, newDict: Boolean): Unit = {
      val t0 = System.nanoTime()
      val base = Queries.t(spark, dir, "documents")
      val spreadBase =
        if (withSpread) Queries.spread(base, Queries.SpreadHeavy) else base
      val d = spreadBase
        .select(col("doc_id"), array_distinct(shingles(col("text"), 3)).as("sh"))
        .localCheckpoint()
      val post = d.select(col("doc_id"), explode(col("sh")).as("s"))
      val freq = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val dict =
        if (newDict) {
          val p = spark.sparkContext.defaultParallelism
          val byRange = freq.repartitionByRange(p, col("df"), col("s"))
            .withColumn("pid", spark_partition_id())
            .localCheckpoint()
          val offsets = byRange.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
            .select(col("pid"), coalesce(
              sum(col("cnt")).over(Window.orderBy(col("pid"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
          byRange.withColumn("lrank",
              row_number().over(Window.partitionBy(col("pid")).orderBy(col("df"), col("s"))))
            .join(broadcast(offsets), Seq("pid"))
            .select(col("s"), (col("off") + col("lrank")).cast("int").as("sid"))
        } else {
          freq.select(col("s"),
            row_number().over(Window.orderBy(col("df"), col("s"))).as("sid"))
        }
      val posti = post.join(broadcast(dict), Seq("s"))
        .select(col("doc_id"), col("sid"))
        .localCheckpoint()
      val postiP = posti.repartition(
        spark.sparkContext.defaultParallelism, col("doc_id"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("sid"))
      val prefix = postiP
        .withColumn("pos", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .filter(col("pos") <= floor(col("n") * (1.0 - tau)) + 1)
        .select(col("doc_id"), col("sid"), col("pos"), col("n"))
      val reqOverlap = (col("x.n") + col("y.n")) * (tau / (1.0 + tau)) - eps
      val maxOverlap = least(col("x.pos"), col("y.pos")) - 1 + lit(1) +
        least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos"))
      val prefixP = prefix.repartition(
        spark.sparkContext.defaultParallelism, col("sid"))
      val cand = prefixP.as("x").join(prefixP.as("y"),
          col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id") &&
            col("x.n") >= col("y.n") * tau - eps &&
            col("y.n") >= col("x.n") * tau - eps &&
            maxOverlap.cast("double") >= reqOverlap)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val nCand = cand.count()
      val ds = postiP.groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("sid"))).as("sh"),
          count(lit(1)).cast("int").as("n"))
      val need = greatest(lit(0),
        ceil((col("na") + col("nb")) * (tau / (1.0 + tau)) - 1e-9)).cast("int")
      val out = cand
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
      val nOut = out.count()
      System.err.println(f"[bisect] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  cand=$nCand%10d out=$nOut")
    }

    run("warm (spread+newDict)", withSpread = true, newDict = true)
    run("spread=1 dict=new", withSpread = true, newDict = true)
    run("spread=0 dict=new", withSpread = false, newDict = true)
    run("spread=1 dict=old", withSpread = true, newDict = false)
    run("spread=0 dict=old", withSpread = false, newDict = false)
    spark.stop()
  }
}
