package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Variant attribution for the exact-Jaccard verify stage (r13 verdict
  * item 4): the shipped `exactJaccardPairsPrefix` dedups 87M candidate
  * rows (`distinct()`) and then joins STRING shingle arrays to every
  * surviving pair — the exchange bytes, not the (early-exiting) merge
  * CPU, now own the wall. Three output-identical variants, timed
  * end-to-end (shingling included) on the same corpus in one session:
  *
  *  A. shipped form (string shingles, pre-verify distinct)
  *  B. DICTIONARY-ENCODED: shingles mapped once to dense int ids
  *     (row_number over (df, shingle) — the ids' order IS the global
  *     frequency order the prefix filter needs, so the window, the
  *     candidate join key, and the verify arrays all become 4-byte
  *     ints; the merge kernel compares ints, not UTF8 strings)
  *  C. B without the pre-verify distinct: candidates flow to the
  *     verify with duplicates (one per shared prefix shingle), the
  *     tiny post-filter output dedups instead
  *
  * Also reports the raw-vs-distinct candidate counts (the duplication
  * factor C bets against) and cross-checks all variants produce the
  * SAME pair set before timing is believed.
  *
  * {{{ sbt "runMain graft.tools.JaccardDictProbe <sfDir> [reps]" }}}
  */
object JaccardDictProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: JaccardDictProbe <sfDir> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val tau = 0.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jaccard-dict-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Queries.t

    val eps = 1e-9

    def shipped(): DataFrame =
      graft.queries.QueriesLLM.exactJaccardPairsPrefix(spark, dir, tau)

    def dictVariant(preDistinct: Boolean): (DataFrame, () => (Long, Long)) = {
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
      val candRaw = prefix.as("x").join(prefix.as("y"),
          col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id") &&
            col("x.n") >= col("y.n") * tau - eps &&
            col("y.n") >= col("x.n") * tau - eps &&
            maxOverlap.cast("double") >= reqOverlap)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val cand = if (preDistinct) candRaw.distinct() else candRaw
      val ds = posti.groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("sid"))).as("sh"), count(lit(1)).as("n"))
      val need = greatest(lit(0),
        ceil((col("na") + col("nb")) * (tau / (1.0 + tau)) - eps)).cast("int")
      val verified = cand
        .join(ds.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
          col("n").as("na")), Seq("doc_a"))
        .join(ds.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
          col("n").as("nb")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          graft.functions.GraftFunctions.sortedCommonAtLeast(
            col("sh_a"), col("sh_b"), need).as("i"))
        .filter(col("i").cast("double") / (col("na") + col("nb") - col("i")) >= tau)
        .select(col("doc_a"), col("doc_b"))
      val out = if (preDistinct) verified else verified.distinct()
      (out, () => (candRaw.count(), candRaw.distinct().count()))
    }

    def time(name: String, mk: () => DataFrame): (Double, Long) = {
      var best = Double.MaxValue
      var rows = -1L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        rows = mk().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      System.err.println(f"[probe] $name%-14s min-of-$reps ${best}%8.2f s  rows=$rows")
      (best, rows)
    }

    val cal0 = Calibration.sample()

    // equality cross-check first (cheap at the probe's scale relative
    // to timing reps): every variant must emit the same pair set
    val a = shipped()
    val b = dictVariant(preDistinct = true)._1
    val c = dictVariant(preDistinct = false)._1
    val ab = a.except(b).count() + b.except(a).count()
    val ac = a.except(c).count() + c.except(a).count()
    require(ab == 0 && ac == 0, s"variant outputs differ: A^B=$ab A^C=$ac")
    System.err.println("[probe] equality: A == B == C")

    val (tA, nA) = time("A_shipped", () => shipped())
    val (tB, _) = time("B_dict", () => dictVariant(preDistinct = true)._1)
    val (tC, _) = time("C_dict_nodist", () => dictVariant(preDistinct = false)._1)
    val (rawCand, distCand) = dictVariant(preDistinct = true)._2()

    val cal1 = Calibration.sample()
    println(s"""{"probe":"jaccard_dict","sf_dir":"$dir","tau":$tau,""" +
      s""""pairs":$nA,"cand_raw":$rawCand,"cand_distinct":$distCand,""" +
      s""""a_shipped_sec":$tA,"b_dict_sec":$tB,"c_dict_nodistinct_sec":$tC,""" +
      Calibration.json(cal0, cal1) + "}")
    spark.stop()
  }
}
