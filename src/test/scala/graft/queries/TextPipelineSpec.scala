package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics checks for the training-data curation operators added on
  * top of the near-dup family (SURVEY §2.11 X13+): each distributed
  * result is pinned against a plain-Scala recomputation from the raw
  * text, so a plan change that silently altered semantics (e.g. a
  * shuffle dropping per-doc rows, an off-by-one in the bigram window)
  * fails here even though the driver's rows-only check would pass.
  */
class TextPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("text-pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rawDocs(): Array[(Long, String, String)] =
    Queries.t(spark, dir, "documents")
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("BPE merge training matches an exact in-process reference") {
    // reference: textbook BPE on the word-frequency table, greedy
    // left-to-right merge application, tie-break (count desc, pair asc)
    val wf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    rawDocs().foreach(_._3.split(" ", -1).filter(_.nonEmpty).foreach(w => wf(w) += 1))
    def mergeGreedy(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeGreedy(rest, a, b)
      case x :: rest => x :: mergeGreedy(rest, a, b)
      case Nil => Nil
    }
    var vocab = wf.toSeq.map { case (w, c) => (w.map(_.toString).toList, c) }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (r <- 1 to 10) {
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach { p => if (p.length == 2) counts(p.mkString(" ")) += c }
      }
      if (counts.nonEmpty) {
        val best = counts.toSeq.minBy { case (pair, n) => (-n, pair) }
        expect += ((r, best._1, best._2))
        val Array(a, b) = best._1.split(" ", 2)
        vocab = vocab.map { case (syms, c) => (mergeGreedy(syms, a, b), c) }
      }
    }
    val got = QueriesLLM.bpeTrain(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq,
      s"merges diverge:\n got=${got.toSeq}\n want=${expect.toSeq}")
    // merged tokens grow: later merges include earlier merge products
    assert(got.exists(_._2.replace(" ", "").length > 2),
      "10 rounds should produce at least one multi-char merge product")
  }

  test("BPE tokenization totals match the reference tokenizer") {
    // reference merges (same algorithm as the training spec)
    val wf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    rawDocs().foreach(_._3.split(" ", -1).filter(_.nonEmpty).foreach(w => wf(w) += 1))
    def mergeGreedy(syms: List[String], a: String, b: String): List[String] = syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: mergeGreedy(rest, a, b)
      case x :: rest => x :: mergeGreedy(rest, a, b)
      case Nil => Nil
    }
    var vocab = wf.toSeq.map { case (w, c) => (w, w.map(_.toString).toList, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to 10) {
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      vocab.foreach { case (_, syms, c) =>
        syms.sliding(2).foreach(p => if (p.length == 2) counts(p.mkString(" ")) += c)
      }
      if (counts.nonEmpty) {
        val best = counts.toSeq.minBy { case (pair, n) => (-n, pair) }._1
        val Array(a, b) = best.split(" ", 2)
        merges += ((a, b))
        vocab = vocab.map { case (w, syms, c) => (w, mergeGreedy(syms, a, b), c) }
      }
    }
    val tokLen = vocab.map { case (w, syms, _) => w -> syms.length }.toMap
    val want = rawDocs()
      .flatMap { case (_, src, text) => text.split(" ", -1).filter(_.nonEmpty).map(src -> _) }
      .groupBy(_._1).map { case (src, ws) =>
        src -> (ws.length.toLong, ws.map(_._2.length.toLong).sum,
          ws.map(w => tokLen(w._2).toLong).sum)
      }
    val got = QueriesLLM.bpeApply(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"per-source tokenization diverges:\n got=$got\n want=$want")
    // merges must actually compress: fewer BPE tokens than characters
    assert(got.values.forall { case (_, chars, bpe) => bpe < chars })
  }

  test("repetition signals match a plain-Scala recomputation per doc") {
    val expected = rawDocs().map { case (id, _, text) =>
      val words = text.split(" ", -1)
      val bigrams = words.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bigrams.groupBy(identity).map(_._2.size)
      id -> (words.length.toLong, words.distinct.length.toLong,
        counts.max.toLong, bigrams.size.toLong)
    }.toMap

    val got = QueriesLLM.repetition(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nw, nd, top, nb) = expected(r.getLong(0))
      assert(r.getLong(1) == nw, s"n_words doc ${r.getLong(0)}")
      assert(r.getLong(2) == nd, s"n_distinct_words doc ${r.getLong(0)}")
      assert(r.getLong(3) == top, s"top_bigram_n doc ${r.getLong(0)}")
      assert(r.getLong(4) == nb, s"n_bigrams doc ${r.getLong(0)}")
      assert(r.getBoolean(5) == (top * 5 >= nb), s"repetitive doc ${r.getLong(0)}")
    }
  }

  test("domain-mix weights match exact integer arithmetic over raw token counts") {
    val bySource = rawDocs().groupBy(_._2).map { case (src, docs) =>
      src -> (docs.length.toLong, docs.map(_._3.split(" ", -1).length.toLong).sum)
    }
    val total = bySource.values.map(_._2).sum
    val nSources = bySource.size.toLong

    val got = QueriesLLM.domainMix(spark, dir).collect()
    assert(got.length == nSources)
    got.foreach { r =>
      val (nDocs, nTok) = bySource(r.getString(0))
      assert(r.getLong(1) == nDocs)
      assert(r.getLong(2) == nTok)
      assert(r.getLong(3) == (total * 1000000L) / (nSources * nTok),
        s"weight for ${r.getString(0)}")
    }
    // weights avg to ~1e6 by construction: equal-share sources get 1e6
    val wsum = got.map(_.getLong(3)).sum
    assert(math.abs(wsum / nSources - 1000000L) < 100000L)
  }

  test("chunk dedup keeps exactly one owner per distinct chunk, first occurrence wins") {
    val chunks = rawDocs().flatMap { case (id, _, text) =>
      text.split(" ", -1).grouped(8).zipWithIndex
        .map { case (ws, pos) => (id, pos, ws.mkString(" ")) }
    }
    val owner = chunks.groupBy(_._3).map { case (c, occs) =>
      c -> occs.map(o => (o._1, o._2)).min
    }
    val expected = chunks.groupBy(_._1).map { case (id, occs) =>
      id -> (occs.length.toLong,
        occs.count(o => owner(o._3) == ((o._1, o._2))).toLong)
    }

    val got = QueriesLLM.chunkDedup(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nc, nk) = expected(r.getLong(0))
      assert(r.getLong(1) == nc, s"n_chunks doc ${r.getLong(0)}")
      assert(r.getLong(2) == nk, s"n_kept_chunks doc ${r.getLong(0)}")
    }
    // global invariant: survivors across docs == distinct chunks corpus-wide
    assert(got.map(_.getLong(2)).sum == owner.size.toLong)
  }

  test("sequence packing follows the concat-and-chunk rule per source shard") {
    val expected = rawDocs().groupBy(_._2).toSeq.flatMap { case (src, docs) =>
      var off = 0L
      docs.sortBy(_._1).map { case (id, _, text) =>
        val n = text.split(" ", -1).length.toLong
        val row = ((src, id), (n, off, off / 256))
        off += n
        row
      }
    }.toMap
    val got = QueriesLLM.packSequences(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, off, bin) = expected((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == off && r.getLong(4) == bin,
        s"packing row ${r.getString(0)}/${r.getLong(1)}")
    }
    // bins are dense per shard: ids are a prefix of 0..maxBin
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val bins = rows.map(_.getLong(4)).distinct.sorted
      assert(bins.head == 0L && bins.last < rows.map(_.getLong(2)).sum / 256 + 1)
    }
  }

  test("duplicated-span detection matches a sliding-window recomputation") {
    val grams = rawDocs().flatMap { case (id, _, text) =>
      val words = text.split(" ", -1)
      if (words.length < 8) Array.empty[(Long, String)]
      else words.sliding(8).map(g => (id, g.mkString(" "))).toArray
    }
    val counts = grams.groupBy(_._2).map { case (g, occ) => g -> occ.length }
    val expected = grams.groupBy(_._1).map { case (id, gs) =>
      id -> (gs.length.toLong, gs.count(g => counts(g._2) > 1).toLong)
    }
    val got = QueriesLLM.dupNgramSpans(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (ng, nd) = expected(r.getLong(0))
      assert(r.getLong(1) == ng && r.getLong(2) == nd && r.getBoolean(3) == (nd > 0),
        s"dup spans doc ${r.getLong(0)}")
    }
    // the signal actually fires on this corpus
    assert(got.exists(_.getBoolean(3)))
  }

  test("batch sessionization matches a sequential gap scan per user") {
    val ev = Queries.t(spark, dir, "events")
      .filter(col("user_id") % 20 === 0)
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      var seq = 0L; var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
      rows.sortBy(r => (r._3, r._2)).foreach { case (_, _, ms) =>
        if (prev == Long.MinValue || ms - prev > 1800000L) seq += 1
        val (n, lo, hi) = sessions.getOrElse(seq, (0L, Long.MaxValue, Long.MinValue))
        sessions(seq) = (n + 1, math.min(lo, ms), math.max(hi, ms))
        prev = ms
      }
      sessions.map { case (sq, v) => (uid, sq) -> v }
    }.toMap
    val got = QueriesRel.sessionize(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, lo, hi) = expected((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == lo && r.getLong(4) == hi,
        s"session ${r.getLong(0)}/${r.getLong(1)}")
    }
    // multiple sessions per user exist (the operator's reason to exist)
    assert(got.map(_.getLong(0)).distinct.length < got.length)
  }

  test("near-dedup keep-list: one survivor per cluster, unclustered docs all kept") {
    // both variants: (cluster source, keep-list under test)
    val variants = Seq(
      QueriesLLM.dedupClusters(spark, dir) -> QueriesLLM.nearDedupKeep(spark, dir),
      QueriesLLM.dedupClustersLsh(spark, dir) -> QueriesLLM.nearDedupKeepLsh(spark, dir))
    val total = Queries.t(spark, dir, "documents").count()
    for ((clusterDf, keepDf) <- variants) {
      val clusters = clusterDf.collect().map(r => (r.getLong(0), r.getLong(1)))
      val nMembers = clusters.length.toLong
      val nClusters = clusters.map(_._2).distinct.length.toLong
      val kept = keepDf.collect()
      assert(kept.map(_.getLong(1)).sum == total)
      // removed = members minus one canonical survivor per cluster
      assert(kept.map(_.getLong(2)).sum == total - (nMembers - nClusters))
      kept.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    }
  }

  test("percent-of-total shares sum to ~1e6 ppm and match exact arithmetic") {
    val got = QueriesRel.percentOfTotal(spark, dir).collect()
    val revs = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = revs.values.map(BigInt(_)).sum
    got.foreach { r =>
      val want = (BigInt(r.getLong(1)) * 1000000 / total).toLong
      assert(r.getLong(2) == want, s"share for ${r.getString(0)}")
    }
    val s = got.map(_.getLong(2)).sum
    assert(s >= 1000000L - got.length && s <= 1000000L)
  }

  test("blocklist filter: per-row predicate (no joins), counts match a direct scan") {
    val df = QueriesLLM.blocklistFilter(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"blocklist must not join:\n$plan")
    val expected = rawDocs().groupBy(_._2).map { case (src, docs) =>
      src -> (docs.length.toLong,
        docs.count(_._3.split(" ", -1).exists(QueriesLLM.Blocklist.contains)).toLong)
    }
    val got = df.collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, f) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == f, s"source ${r.getString(0)}")
    }
  }

  test("edit distance: matches a driver-side Levenshtein over the same sample") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val sample = rawDocs()
      .filter(d => d._1 % 5 == 0 && d._1 < QueriesLLM.EditSampleCap)
      .map { case (id, src, text) => (id, src, text.take(80)) }
    val expected = (for {
      a <- sample; b <- sample
      if a._2 == b._2 && a._1 < b._1
      d = lev(a._3, b._3) if d <= 50
    } yield (a._1, b._1) -> d.toLong).toMap
    val got = QueriesLLM.editDistance(spark, dir).collect()
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach(r => assert(r.getInt(2).toLong == expected((r.getLong(0), r.getLong(1)))))
  }

  test("normalize dedup: normalized hashing collapses exactly the synthetic variants") {
    val row = QueriesLLM.normalizeDedup(spark, dir).collect().head
    val n = Queries.t(spark, dir, "documents").count()
    val nVariants = rawDocs().count(_._1 % 5 == 0).toLong
    val nRawDistinct = rawDocs().map(_._3).distinct.length.toLong
    assert(row.getLong(0) == n + nVariants)
    // raw hashing sees every variant as new; normalized hashing sees
    // exactly the original distinct texts
    assert(row.getLong(1) == nRawDistinct + nVariants)
    assert(row.getLong(2) == nRawDistinct)
  }

  test("robust stats: median/MAD match an exact sorted-array recomputation") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val expected = rawDocs().groupBy(_._2).map { case (src, docs) =>
      val toks = docs.map(_._3.split(" ", -1).length.toDouble).toSeq
      val med = median(toks)
      val mad = median(toks.map(t => math.abs(t - med)))
      src -> (med, mad, docs.length.toLong,
        toks.map(t => math.abs(t - med) / (1.4826 * mad)).max)
    }
    QueriesLLM.robustStats(spark, dir).collect().foreach { r =>
      val (med, mad, n, maxZ) = expected(r.getString(0))
      assert(r.getDouble(1) == med && r.getDouble(2) == mad && r.getLong(3) == n)
      assert(math.abs(r.getDouble(4) - maxZ) < 5e-5, s"z for ${r.getString(0)}")
    }
  }

  test("heavy hitters: every token above the 2% support threshold is a candidate") {
    val toks = rawDocs().flatMap(_._3.split(" ", -1))
    val n = toks.length.toLong
    // exact frequent set at the same support: occ/n > 0.02 ⟺ 50·occ > n
    val exact = toks.groupBy(identity)
      .collect { case (t, occ) if occ.length.toLong * 50L > n => t }.toSet
    assert(exact.nonEmpty, "corpus has no >2% tokens; superset check would be vacuous")
    val got = QueriesLLM.heavyHitters(spark, dir).collect().map(_.getString(0))
    assert(got.length == got.distinct.length)
    assert(got.sameElements(got.sorted))
    // one-sided sketch guarantee: false positives allowed, false negatives not
    assert(exact.subsetOf(got.toSet),
      s"frequent tokens missing from sketch: ${exact.diff(got.toSet)}")
  }

  test("reservoir sample: exactly the k hash-smallest ids per source, run-stable") {
    def h(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"rs42:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = rawDocs().groupBy(_._2).flatMap { case (src, ds) =>
      ds.toSeq.map(d => (d._1, h(d._1))).sortBy(t => (t._2, t._1)).take(4).zipWithIndex
        .map { case ((id, _), i) => (src, id) -> (i + 1) }
    }
    val got = QueriesLLM.reservoirSample(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach(r =>
      assert(expected((r.getString(0), r.getLong(1))) == r.getInt(2),
        s"rank for ${r.getString(0)}/${r.getLong(1)}"))
    val again = QueriesLLM.reservoirSample(spark, dir).collect()
    assert(got.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("knn classification matches an exact driver-side majority vote") {
    val vecs = Queries.t(spark, dir, "embeddings")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cands = vecs.filter(_._1 % 20 != 0)
    val expected = vecs.filter(_._1 % 20 == 0).map { case (qid, qv, tl) =>
      val top5 = cands.map(c => (cos(qv, c._2), c._1, c._3))
        .sortBy(t => (-t._1, t._2)).take(5)
      val (pred, votes) = top5.groupBy(_._3).map { case (l, v) => (l, v.length) }
        .toSeq.sortBy(t => (-t._2, t._1)).head
      qid -> (tl, pred, votes.toLong)
    }.toMap
    val got = QueriesLLM.knnClassify(spark, dir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (tl, pred, votes) = expected(r.getLong(0))
      assert(r.getInt(1) == tl && r.getInt(2) == pred && r.getLong(3) == votes,
        s"knn mismatch for query ${r.getLong(0)}")
    }
  }
}
