package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical sf1/sf0.1 scaling ratchet (r9, verdict item 5): the r8
  * sf1 registry pass caught a real one-core defect, but its scaling
  * audit lived only in prose. This spec reads the CHECKED-IN registry
  * bench artifacts (`BENCH_sf1_r0N.json` + `BENCH_sf01_registry_r0N
  * .json`, emitted by [[graft.tools.RegistryBench]] at sf1 and sf0.1
  * on the same host) and asserts the superlinear set is EXACTLY a
  * subset of the declared brute-force/exact oracle-contract twins —
  * so a future round that regresses a scale path to superlinear fails
  * a test, not a prose review.
  *
  * Thresholds: 10× rows; an entry is flagged superlinear only when its
  * ratio exceeds [[ScalingSpec.SuperlinearRatio]] AND its sf1 wall
  * exceeds [[ScalingSpec.MinSf1WallSec]] (sub-second entries wobble
  * ±40% on a shared host — a 0.1 s → 1.5 s "ratio" is noise, not a
  * scaling law). The spec cancels (does not pass vacuously) when the
  * artifacts are absent, e.g. on a fresh checkout.
  */
class ScalingSpec extends AnyFunSuite {

  /** Declared quadratic-by-design entries: the trivially-auditable
    * exact/brute-force oracle contracts whose candidate sets grow as
    * n² at fixed parameters. Each has a shipped sub-linear scale twin
    * (LSH / IVF / PQ / banded) measured in the same artifact — that
    * pairing, not this list, is the 100 TB argument.
    */
  val superlinearAllowed: Set[String] = Set(
    // exact pair graph + its consumers. Since r12 the four consumers
    // ride the memoized PREFIX-FILTERED exact join (PPJoin bound
    // Σ|prefix-posting|²), so their artifact minima are memo hits and
    // sit far under the ratio — they stay DECLARED because the
    // underlying edge build (measured raw by x_jaccard_pairs_prefix)
    // is still candidate-quadratic at this corpus's tau=0.2 density,
    // and a future round that drops the memo must not trip the ratchet
    // for honoring the same declared contract
    "x_jaccard_pairs_prefix",
    "x_dedup_clusters", "x_near_dedup_keep",
    "x_pagerank", "x_triangles",
    // brute-force similarity contracts (scale paths: LSH/IVF/PQ)
    "x_cosine_topk", "x_knn_classify", "x_ann_quantized")
    // x_simhash_near_dup LEFT this set in r10: the 60-bit fingerprint's
    // 4×15-bit bands (32,768 buckets/band vs 4,096) un-saturated the
    // only shipped scale path that had ratcheted in (45× at 10× rows).
    // x_edit_distance and x_embed_dedup LEFT in r12, x_ngram_jaccard in
    // r13: their samples got absolute id caps (EditSampleCap/
    // EmbedSampleCap/NgramSampleCap — an audit samples a fixed count,
    // not a fixed fraction), making all three scale-flat (237→2.6 s,
    // 3.9→0.3 s, 13.0→~1 s sf1); the ratchet now guards the caps.
    // PAIR-SCALE RESTRICTION (r12 advice): those removals are sound
    // only for the sf1/sf0.1 pair latestPair() actually selects — the
    // caps (5,000 ids) bind at sf1 and above, so a hypothetical
    // sf0.1/sf0.01 ratchet pair would see the sample grow 10× (pairs
    // ~100×) and trip as a false regression. If latestPair() ever
    // learns smaller scales, re-allow these entries for pairs whose
    // larger side is below sf1.

  private def latestPair(): Option[(java.io.File, java.io.File)] = {
    val root = new java.io.File(".")
    val round = "r(\\d+)".r
    // sort by the ROUND NUMBER, not the filename: lexicographically
    // "r9" > "r10", so a string sort would silently pin the ratchet to
    // a stale pair the first time an unpadded round lands (r9 advice)
    val sf1 = root.listFiles((_, n) => n.matches("BENCH_sf1_r\\d+\\.json"))
      .sortBy(f => round.findFirstMatchIn(f.getName).get.group(1).toInt)
    sf1.reverse.flatMap { f =>
      val twin = new java.io.File(root,
        f.getName.replace("BENCH_sf1_", "BENCH_sf01_registry_"))
      if (twin.exists()) Some((f, twin)) else None
    }.headOption
  }

  /** Per-entry wall MINIMA: r10+ artifacts carry a per-run array
    * (`"runs"`), whose min this prefers; the `"queries"` field (itself
    * the min since r10, a single run before) is the fallback for older
    * artifacts. Minima over repeats are what justify the 3 s floor —
    * host weather inflates single runs up to ~4× but does not survive
    * a min-of-3.
    */
  private def walls(f: java.io.File): Map[String, Double] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    val out = Map.newBuilder[String, Double]
    val runs = node.get("runs")
    if (runs != null) {
      runs.fieldNames().forEachRemaining { n =>
        val arr = runs.get(n)
        out += n -> (0 until arr.size()).map(arr.get(_).asDouble()).min
      }
    } else {
      val qs = node.get("queries")
      qs.fieldNames().forEachRemaining(n => out += n -> qs.get(n).asDouble())
    }
    out.result()
  }

  test("sf1/sf0.1 superlinear entries are exactly the declared brute-force twins") {
    val pair = latestPair()
    assume(pair.isDefined,
      "no BENCH_sf1_r0N.json + BENCH_sf01_registry_r0N.json pair checked in")
    val (sf1File, sf01File) = pair.get
    val w1 = walls(sf1File)
    val w01 = walls(sf01File)
    val common = w1.keySet & w01.keySet
    assert(common.size > 100, s"artifact pair shares only ${common.size} entries")
    val offenders = common.filter { n =>
      val r = w1(n) / math.max(w01(n), 1e-9)
      w1(n) >= ScalingSpec.MinSf1WallSec && r > ScalingSpec.SuperlinearRatio
    }
    val undeclared = offenders -- superlinearAllowed
    assert(undeclared.isEmpty,
      s"UNDECLARED superlinear entries (sf1 wall / sf0.1 wall > " +
        s"${ScalingSpec.SuperlinearRatio} at 10x rows): " +
        undeclared.toSeq.sorted.map(n =>
          f"$n (${w01(n)}%.2f -> ${w1(n)}%.2f s, ${w1(n) / w01(n)}%.1fx)")
          .mkString(", "))
  }
}

object ScalingSpec {
  /** 10× rows: ratios beyond this are superlinear (r8 audit: every
    * scale path landed ≤ 9.6×; the declared twins started at 15×).
    */
  val SuperlinearRatio = 12.0

  /** Ignore entries whose sf1 wall is below this. r9 held a 10 s floor
    * because its artifacts recorded SINGLE-RUN walls and the shared
    * host inflated short entries up to ~4× in a bad window (x_lang_id:
    * 5.88 s single-run vs 1.48 s quiet min-of-3) — masking real
    * regressions on every sub-10 s entry. r10 artifacts carry per-run
    * arrays and [[ScalingSpec.walls]] asserts on MINIMA, which the
    * weather does not survive, so the floor drops to 3 s (verdict
    * item 3). Real scale regressions (the r8 one-core generation was
    * 2,037 s; the r9 one-core z-order build 17.6 s) sit far above it.
    */
  val MinSf1WallSec = 3.0
}
