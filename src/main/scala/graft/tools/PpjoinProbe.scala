package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Variant attribution for the PPJoin candidate join (r13): times the
  * exact-Jaccard prefix join with (a) no extra filters (the r12 form),
  * (b) + length filter, (c) + length + positional filters (the r13
  * shipped form), on the same corpus in one session — plus the raw
  * candidate-pair count each variant feeds the verify stage, which is
  * the number the filters exist to cut.
  *
  * {{{ sbt "runMain graft.tools.PpjoinProbe <sfDir>" }}}
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: PpjoinProbe <sfDir>"))
    val tau = 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ppjoin-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Queries.t

    val d = t(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(graft.functions.GraftFunctions.shingles(col("text"), 3)).as("sh"))
      .localCheckpoint()
    val post = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val freq = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))
    val prefix = post.join(freq, Seq("s"))
      .withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= floor(col("n") * (1.0 - tau)) + 1)
      .select(col("doc_id"), col("s"), col("pos"), col("n"))
      .localCheckpoint() // shared input: variants time ONLY the join

    val eps = 1e-9
    val lenF = col("x.n") >= col("y.n") * tau - eps &&
      col("y.n") >= col("x.n") * tau - eps
    val posF = (least(col("x.pos"), col("y.pos")) - 1 + lit(1) +
      least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos"))).cast("double") >=
      (col("x.n") + col("y.n")) * (tau / (1.0 + tau)) - eps
    val base = col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id")

    def cand(cond: org.apache.spark.sql.Column): DataFrame =
      prefix.as("x").join(prefix.as("y"), cond)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()

    def run(name: String, cond: org.apache.spark.sql.Column): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val pairs = cand(cond).count()
      val joinSec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ppjoin-probe] $name%-16s join+distinct ${joinSec}%8.3f s  pairs $pairs")
      (joinSec, pairs, 0L)
    }

    val rawRows = prefix.count()
    val variants = Seq(
      "none" -> base,
      "length" -> (base && lenF),
      "length_pos" -> (base && lenF && posF))
    val res = variants.map { case (n, c) => n -> run(n, c) }
    val js = res.map { case (n, (s, p, _)) =>
      s""""$n":{"sec":${f"$s%.3f"},"pairs":$p}""" }.mkString(",")
    // end-to-end: the shipped entry (candidate join + verify), twice,
    // to split verify-stage cost from the join and to see warm walls
    val e2e = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      graft.queries.QueriesLLM.exactJaccardPairsPrefix(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    System.err.println(s"[ppjoin-probe] shipped end-to-end: " +
      e2e.map(t => f"$t%.3f").mkString(" "))
    // verify-stage variant: BROADCAST the per-doc array side instead of
    // shuffling the ~90M-pair candidate table twice against it
    val ds = d.select(col("doc_id"), array_sort(col("sh")).as("sh"),
      size(col("sh")).as("nn"))
    val bq = cand(base && lenF && posF)
      .join(broadcast(ds.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
        col("nn").as("na"))), Seq("doc_a"))
      .join(broadcast(ds.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
        col("nn").as("nb"))), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
        graft.functions.GraftFunctions.sortedCommon(col("sh_a"), col("sh_b")).as("i"))
      .filter(col("i").cast("double") / (col("na") + col("nb") - col("i")) >= tau)
      .select(col("doc_a"), col("doc_b"))
    val bE2e = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      bq.count()
      (System.nanoTime() - t0) / 1e9
    }
    System.err.println(s"[ppjoin-probe] broadcast-verify end-to-end: " +
      bE2e.map(t => f"$t%.3f").mkString(" "))
    println(s"""{"metric":"ppjoin_probe","sf":"$dir","prefix_rows":$rawRows,$js,""" +
      s""""shipped_e2e_runs":${e2e.map(t => f"$t%.3f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
