package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-dedup scale proof: run the ACTUAL registry dedup operators
  * (exact, MinHash-LSH, SimHash banding, LSH cluster dedup, keep-list)
  * on a synthetic corpus 1–2 orders of magnitude above the sf0.1 bench
  * table (5 000 docs), with KNOWN injected duplicates, and print one
  * JSON line with per-op seconds, docs/s, the LSH candidate-pair count
  * against the all-pairs count the bucketing avoids, and the measured
  * recall of injected near-dup pairs.
  *
  * The corpus is written in the driver testdata layout
  * (`<dir>/documents.parquet`, same schema), so every operator runs
  * VERBATIM through `SparkEntry.queries` — nothing is re-implemented
  * for the proof, which is the point: the same plan that passes the
  * sf0.01 oracle gate is the one timed at 40×.
  *
  * Corpus shape (seeded, deterministic):
  *  - 85% base docs: 60–140 words, ~30% stopwords from a 100-word
  *    shared vocab + content words from a 1M-word space;
  *  - 10% near-dups: a copy of a base doc with 3 token substitutions
  *    (3-shingle Jaccard ≈ 0.8 — above every banding threshold);
  *  - 5% exact dups: verbatim copies of base docs.
  *
  * {{{ sbt "runMain graft.tools.LargeDedupBench [nDocs] [runs]" }}}
  */
object LargeDedupBench {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  /** Deterministic per-id document; near/exact dup structure derives
    * from id arithmetic only, so the injected pair list is computable
    * without reading the corpus back.
    */
  def genDoc(id: Long, nDocs: Long): Doc = {
    val nBase = (nDocs * 85L) / 100L
    val nNear = (nDocs * 10L) / 100L
    def baseText(baseId: Long): Array[String] = {
      // seed through a split: seeding SplittableRandom with
      // `baseId * GOLDEN_GAMMA` puts every doc on the SAME lattice
      // (doc b's stream == doc a's stream shifted by b−a), which
      // silently generated thousands of genuine near-dup docs — found
      // by DedupProbe when LSH candidate volume wouldn't drop
      val r = new java.util.SplittableRandom(
        new java.util.SplittableRandom(baseId).nextLong() ^ 17L)
      val n = 60 + r.nextInt(81)
      // realistic text shape: ~30% stopwords from a tiny shared vocab,
      // content words from a 1M-word space — random-pair 3-shingle
      // Jaccard ≈ 0 (like real web text), so LSH candidates are the
      // injected dups, not vocabulary noise
      Array.tabulate(n) { _ =>
        if (r.nextDouble() < 0.3) "s" + r.nextInt(100)
        else "w" + r.nextInt(1000000)
      }
    }
    val words: Array[String] =
      if (id < nBase) baseText(id)
      else if (id < nBase + nNear) {
        // near-dup of base doc (id - nBase): 3 seeded substitutions
        val b = baseText(id - nBase)
        val r = new java.util.SplittableRandom(
          new java.util.SplittableRandom(id).nextLong() ^ 29L)
        (0 until 3).foreach { k => b(r.nextInt(b.length)) = s"sub${id}_$k" }
        b
      } else baseText((id - nBase - nNear) % nBase) // exact dup
    val text = words.mkString(" ")
    Doc(id, text, Seq("en", "de", "fr", "zh")((id % 4).toInt),
      "src" + (id % 10), text.length.toLong)
  }

  /** The injected near-dup pairs (canonical doc_a < doc_b). */
  def injectedNearPairs(nDocs: Long): Seq[(Long, Long)] = {
    val nBase = (nDocs * 85L) / 100L
    val nNear = (nDocs * 10L) / 100L
    (nBase until nBase + nNear).map(i => (i - nBase, i))
  }

  /** Deterministic embedding for the X5 embed-dedup scale section:
    * originals are unit-scale 64-dim gaussians (pairwise cos ~N(0,1/8)
    * — random-pair verdicts possible but rare at τ=0.3, like real
    * embedding spaces); every `id % 64 == 63` is a NEAR COPY of its
    * predecessor (base + 0.05·gaussian ⇒ cos ≈ 0.999 — always above
    * τ), so the injected dup-pair list is id arithmetic, same
    * discipline as [[genDoc]].
    */
  def genDedupVec(id: Long): (Long, Array[Float], Int) = {
    val base = if (id % 64 == 63) id - 1 else id
    val r = new java.util.SplittableRandom(
      new java.util.SplittableRandom(base).nextLong() ^ 0x7ec5L)
    val v = Array.fill(64)(r.nextGaussian())
    if (id % 64 == 63) {
      val p = new java.util.SplittableRandom(
        new java.util.SplittableRandom(id).nextLong() ^ 0x0ffe7L)
      var j = 0
      while (j < 64) { v(j) += 0.05 * p.nextGaussian(); j += 1 }
    }
    (id, v.map(_.toFloat), (id % 10).toInt)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // JSON decimals must be dots
    val calBefore = Calibration.sample() // weather anchor (r12 item 5)
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shm = new java.io.File("/dev/shm")
    val localDir = if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft_dedup_spill"); d.mkdirs(); d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-large-dedup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = s"/tmp/graft_large_docs_$nDocs"
    val table = new java.io.File(s"$dir/documents.parquet")
    if (!table.exists()) {
      val t0 = System.nanoTime()
      val n = nDocs
      spark.range(nDocs).as[Long].map(genDoc(_, n))
        .repartition(cpus.toInt) // range() emits ordered slabs; spread dup families
        .write.mode("overwrite").parquet(table.getAbsolutePath)
      System.err.println(f"[dedup] generated $nDocs docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def runNoop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmups, same policy as Bench: codegen/init once, and the shared
    // LSH pair materialization (its consumers time marginal work; the
    // x_minhash_lsh entry itself times the full un-memoized build)
    runNoop(graft.SparkEntry.queries("x_exact_dedup")(spark, dir))
    try graft.queries.QueriesLLM.minhashLshPairs(spark, dir) catch { case _: Throwable => () }

    val ops = Seq("x_exact_dedup", "x_dedup_stats", "x_minhash_lsh",
      "x_simhash_near_dup", "x_dedup_clusters_lsh", "x_near_dedup_keep_lsh")
    val times = ops.map { name =>
      val rs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        runNoop(graft.SparkEntry.queries(name)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      name -> rs.min
    }

    // observables: the engine's claims, checked at scale
    val nBase = (nDocs * 85L) / 100L
    val nNear = (nDocs * 10L) / 100L
    val nExact = nDocs - nBase - nNear
    // exact dedup must find exactly the injected exact-copy groups
    val dupStats = graft.queries.QueriesLLM.dedupStats(spark, dir).collect()(0)
    val nDupsFound = dupStats.getAs[Long]("n_dups")
    // LSH candidate volume vs the all-pairs join the bucketing avoids
    val candPairs = graft.queries.QueriesLLM.minhashLshPairs(spark, dir).count()
    val allPairs = nDocs * (nDocs - 1) / 2
    // recall of injected near-dup pairs in the LSH candidate set
    val injected = injectedNearPairs(nDocs).toDF("doc_a", "doc_b")
    val cand = graft.queries.QueriesLLM.minhashLshPairs(spark, dir)
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
    val hit = injected.join(cand, Seq("doc_a", "doc_b"), "left_semi").count()
    val recall = hit.toDouble / nNear

    // ---- X5 embed-dedup LSH twin at the same scale (r11): the SAME
    // registry function, index params scaled to the corpus exactly
    // like annLsh in LargeAnnBench (~64 vectors per bucket — the
    // sf-scale 4×6 default would put n/64 vectors in each of 64
    // buckets and the co-bucket join would approach all-pairs).
    // Near-copy vectors land at cos ≈ 0.999, so recall of the
    // injected pair list measures the bucket map, not threshold luck.
    // τ = 0.7 here, NOT the oracled 0.3: for isotropic 64-dim
    // gaussians cos σ ≈ 1/√64 = 0.125, so 0.3 is only 2.4σ and ~93%
    // of RANDOM vectors have a lower-id "near-dup" at that cut (a
    // 200K sanity run measured exactly that) — the threshold is a
    // property of the embedding space, and this space needs 5.6σ for
    // "duplicate" to mean anything.
    val vecTable = new java.io.File(s"$dir/embeddings.parquet")
    if (!vecTable.exists()) {
      spark.range(nDocs).as[Long].map(genDedupVec)
        .toDF("vec_id", "embedding", "label")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(vecTable.getAbsolutePath)
      System.err.println(s"[dedup] generated $nDocs vectors")
    }
    val bitsPerTable = math.max(6,
      math.ceil(math.log(nDocs / 64.0) / math.log(2)).toInt)
    runNoop(graft.queries.QueriesLLM.embedDedupLsh(spark, dir, 4, bitsPerTable, tau = 0.7)) // warm (JIT, the AnnProbe lesson)
    val embedT = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      runNoop(graft.queries.QueriesLLM.embedDedupLsh(spark, dir, 4, bitsPerTable, tau = 0.7))
      (System.nanoTime() - t0) / 1e9
    }.min
    val verdicts = graft.queries.QueriesLLM
      .embedDedupLsh(spark, dir, 4, bitsPerTable, tau = 0.7).localCheckpoint()
    val nVerdicts = verdicts.count()
    // an injected near-copy (id%64==63) is recalled iff its OWN base
    // (id-1) is the canonical — at τ=0.7 (5.6σ in this space) noise
    // pairs are effectively impossible, so canonical == id-1 is the
    // honest assert; the old `<= id-1` was tautological (canonical is
    // min(vec_a) with vec_a < dup_id always) and would have counted a
    // noise verdict as a recall hit (r12 advice)
    val injectedVec = nDocs / 64 // ids 63, 127, ... < nDocs
    val vecHit = verdicts
      .filter(pmod(col("dup_id"), lit(64)) === 63 &&
        col("canonical_id") === col("dup_id") - 1)
      .count()
    val vecRecall = vecHit.toDouble / injectedVec

    val qs = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val docsPerS = times.toMap.get("x_minhash_lsh").map(s => (nDocs / s).toLong).getOrElse(0L)
    println(
      s"""{"metric":"large_dedup","docs":$nDocs,"runs":$runs,"queries":$qs,""" +
      s""""minhash_docs_per_s":$docsPerS,""" +
      s""""exact_dups_injected":$nExact,"exact_dups_found":$nDupsFound,""" +
      s""""near_pairs_injected":$nNear,"near_pairs_recalled":$hit,""" +
      f""""lsh_recall":$recall%.4f,""" +
      s""""candidate_pairs":$candPairs,"all_pairs_avoided":$allPairs,""" +
      f""""embed_dedup_lsh_sec":$embedT%.3f,"embed_bits_per_table":$bitsPerTable,""" +
      s""""embed_verdicts":$nVerdicts,"embed_pairs_injected":$injectedVec,""" +
      f""""embed_pairs_recalled":$vecHit,"embed_recall":$vecRecall%.4f,""" +
      s"${Calibration.json(calBefore, Calibration.sample())}}")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("/dev/shm/graft_dedup_spill"))
  }
}
