package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Executed-plan diff for the r15 jaccard dict regression: the 2×2
  * bisect (JaccardBisectProbe) pinned the 8× sf1 wall on the NEW dict
  * form with IDENTICAL candidate counts and outputs — downstream of an
  * eagerly-checkpointed, value-identical `posti`, only the physical
  * plans can differ. This probe executes the full query for both dict
  * forms and prints the post-AQE executed plan of each, plus per-stage
  * timing via one intermediate action per stage.
  *
  * {{{ SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JaccardPlanProbe <sfDir>" }}}
  */
object JaccardPlanProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: JaccardPlanProbe <sfDir>"))
    val tau = 0.2
    val eps = 1e-9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jaccard-plan-probe")
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
      System.err.println(f"[planprobe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def posting(newDict: Boolean): DataFrame = {
      val d = Queries.spread(Queries.t(spark, dir, "documents"), Queries.SpreadHeavy)
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
      post.join(broadcast(dict), Seq("s"))
        .select(col("doc_id"), col("sid"))
        .localCheckpoint()
    }

    def pieces(label: String, posti: DataFrame): Unit = {
      val p = spark.sparkContext.defaultParallelism
      val postiP = posti.repartition(p, col("doc_id"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("sid"))
      val prefix = postiP
        .withColumn("pos", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .filter(col("pos") <= floor(col("n") * (1.0 - tau)) + 1)
        .select(col("doc_id"), col("sid"), col("pos"), col("n"))
        .localCheckpoint()
      tm(s"$label prefix checkpoint")(prefix.count())
      val reqOverlap = (col("x.n") + col("y.n")) * (tau / (1.0 + tau)) - eps
      val maxOverlap = least(col("x.pos"), col("y.pos")) - 1 + lit(1) +
        least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos"))
      val prefixP = prefix.repartition(p, col("sid"))
      val cand = prefixP.as("x").join(prefixP.as("y"),
          col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id") &&
            col("x.n") >= col("y.n") * tau - eps &&
            col("y.n") >= col("x.n") * tau - eps &&
            maxOverlap.cast("double") >= reqOverlap)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      tm(s"$label cand noop") {
        cand.write.format("noop").mode("overwrite").save()
      }
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
      tm(s"$label verify+distinct noop") {
        out.write.format("noop").mode("overwrite").save()
      }
      System.err.println(s"=== $label executed plan (verify tree) ===")
      System.err.println(out.queryExecution.executedPlan.toString.take(8000))
    }

    val pNew = posting(newDict = true)
    val pOld = posting(newDict = false)
    System.err.println("[planprobe] content hash new=" +
      pNew.agg(sum(hash(col("doc_id"), col("sid")))).collect()(0).getLong(0) +
      " old=" +
      pOld.agg(sum(hash(col("doc_id"), col("sid")))).collect()(0).getLong(0))
    pieces("NEW", pNew)
    pieces("OLD", pOld)
    spark.stop()
  }
}
