package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage attribution for the two 1M ANN walls the r10 verdict flagged —
  * the SimhashProbe discipline (measure the stages, then argue from the
  * numbers):
  *
  *  1. `ann_ivf_p4` (per-call) swung 12.2–28.5 s across same-day passes
  *     while the served path held 10.3 s. The per-call pipeline is
  *     fit (memoized; first call only) → corpus cell-assignment (per
  *     call) → probed-cell search; this tool times each alone, so the
  *     swing lands on a stage instead of on "host weather".
  *  2. `ann_pq_p4` regressed 11.3 → 12.4 s. The suspect stages are the
  *     ADC LUT aggregate (broadcast cost) and the k=1000 shortlist
  *     join+window. The shortlist join (probes ⋈ codes on `cell`) has
  *     the exact shape the r10 SimhashProbe condemned: Catalyst
  *     broadcasts the small probe side, and every streamed code row
  *     then emits one pair per co-cell probe (~queries·nprobe/k
  *     matches each) through BHJ's slow many-match iteration. The
  *     probe A/Bs the default plan against a `shuffle_hash`-hinted
  *     one on identical output, and checks the answers match.
  *
  * Reports per-rep wall arrays (min is the signal, spread is the
  * weather) plus the JVM heap, so the artifact is self-describing.
  *
  * {{{ SPARK_DRIVER_MEM=16g sbt "runMain graft.tools.AnnProbe [nVecs] [reps]" }}}
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    // same corpus artifact as LargeAnnBench (same name → reuse)
    val dir = s"/tmp/graft_large_vecs_$nVecs"
    val table = new java.io.File(s"$dir/embeddings.parquet")
    if (!table.exists()) {
      spark.range(nVecs).as[Long].map(LargeAnnBench.genVec)
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(table.getAbsolutePath)
      System.err.println(s"[probe] generated $nVecs vecs")
    }
    val ivfK = math.max(16, math.round(math.sqrt(nVecs.toDouble) / 2).toInt)
    val rerank = math.max(256, (nVecs / 1000).toInt)
    val q = graft.queries.QueriesLLM

    def runNoop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def times(body: => Unit): Seq[Double] = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def rec(name: String, arr: Seq[Double]): Unit = {
      out += name -> arr.map(t => f"$t%.2f").mkString("[", ",", "]")
      System.err.println(s"[probe] $name: ${out(name)}")
    }

    // warmup: codegen + parquet footer caches
    runNoop(spark.read.parquet(table.getAbsolutePath)
      .agg(count(lit(1))))

    // ---- IVF stages ----
    val fitT0 = System.nanoTime()
    val mdl = q.ivfModelFor(spark, dir, ivfK)
    rec("ivf_fit_first_call", Seq((System.nanoTime() - fitT0) / 1e9))
    rec("ivf_assign_only", times(runNoop(q.ivfAssign(spark, dir, mdl))))
    rec("ivf_per_call", times(runNoop(q.annIvf(spark, dir, ivfK, 4))))
    val ivfIdx = s"$dir/ivf_index_k$ivfK"
    if (!new java.io.File(s"$ivfIdx/model").exists())
      q.ivfIndexWrite(spark, dir, ivfIdx, ivfK)
    rec("ivf_served", times(runNoop(q.annIvfFrom(spark, dir, ivfIdx, 4))))

    // ---- PQ stages ----
    val pqT0 = System.nanoTime()
    val idx = q.pqIndexFor(spark, dir, ivfK, 8)
    // labeled EXCL_COARSE: pqModelBuild reuses the coarse KMeans the
    // ivf_fit stage above already memoized, so this is the PQ-specific
    // increment (codebook fits + code assignment), NOT a cold PQ-only
    // deployment's build — add ivf_fit_first_call for that number
    rec("pq_build_excl_coarse", Seq((System.nanoTime() - pqT0) / 1e9))
    val codes = spark.createDataFrame(idx.codesRdd, idx.schema)
    def stages(hint: Option[String]) =
      q.pqStagePlans(spark, dir, codes, idx.model, 4, 8, rerank, hint)
    rec("pq_lut_only", times(runNoop(stages(None).lutArr)))
    rec("pq_shortlist_default", times(runNoop(stages(None).shortlist)))
    rec("pq_shortlist_shj",
      times(runNoop(stages(Some("shuffle_hash")).shortlist)))
    rec("pq_full_default", times(runNoop(stages(None).result)))
    rec("pq_full_shj", times(runNoop(stages(Some("shuffle_hash")).result)))
    // the hint must be answer-invariant: same rows both ways
    val a = stages(None).result.localCheckpoint()
    val b = stages(Some("shuffle_hash")).result.localCheckpoint()
    val same = a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty
    out += "shj_answer_identical" -> same.toString

    // emit the artifact BEFORE asserting: a divergent A/B answer is
    // exactly when the timing evidence matters most — failing first
    // would discard the whole run's measurements
    println(
      s"""{"metric":"ann_probe","vecs":$nVecs,"reps":$reps,"ivf_k":$ivfK,""" +
      s""""rerank":$rerank,"heap_max_bytes":${Runtime.getRuntime.maxMemory},""" +
      out.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}")
    require(same, "shuffle_hash shortlist changed the PQ answer")
    spark.stop()
  }
}
