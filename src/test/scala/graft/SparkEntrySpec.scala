package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Guards on the driver contract itself: entry() smoke, map/oracle key
  * alignment, and per-query determinism (the hash gate assumes a query
  * returns identical values on every run).
  */
class SparkEntrySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("entry-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("declared rows-only queries are the documented set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the MinHash-LSH family (x_minhash_lsh + the four graph consumers)
    // left this set in r6: the kernel's switch to the portable
    // md5-derived shingle hash made the banding join DuckDB-expressible
    val expected = Set("q_agg_approx_distinct", "q_agg_approx_percentile",
      "x_ann_lsh", "x_ann_ivf", "x_multimodal_features",
      // pixel/sample payload transforms (inflate+unfilter+box filter)
      // are not SQL; MultimodalSpec pins decodes on hand-built vectors
      "x_multimodal_resize",
      "x_stratified_sample", "q_table_sample",
      // shard boundaries come from reservoir sampling (engine-specific);
      // QueriesRelSpec pins disjointness + coverage + balance
      "q_range_shard",
      // DataSketches HLL estimates are engine-specific; QueriesRelSpec
      // bounds them against the exact counts carried in the result
      "q_sketch_union",
      // freqItems is a one-sided counter sketch (false positives
      // allowed); TextPipelineSpec pins the superset guarantee
      "x_heavy_hitters",
      // file counts are physical layout, not SQL; QueriesRelSpec pins
      // compaction (fewer files, rows conserved, ranges disjoint)
      "x_compact_files",
      // PQ codebooks come from seeded KMeans (not SQL); LshSpec pins a
      // recall floor vs the oracled brute-force cosine
      "x_ann_pq")
    assert(rowsOnly == expected, s"rows-only drift: $rowsOnly")
  }

  test("registry-wide plan sweep: no CartesianProduct anywhere") {
    // BroadcastNestedLoopJoin against a 1-row totals frame is a
    // deliberate idiom (tfidf/lm_score/collocations); CartesianProduct
    // (non-broadcast cross product) is never acceptable — it means two
    // large sides multiplied. Sweeping every registered query guards
    // future additions structurally.
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      } catch { case _: Throwable => None } // planning failures surface elsewhere
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("oracle'd queries are run-to-run deterministic (hash-gate prerequisite)") {
    val dir = "/root/testdata/sf0.001"
    // representative slice across aggregation/window/float/hash paths
    val names = Seq("q1_agg", "q_window_frame", "x_cosine_topk", "x_minhash_sig",
      "x_quality", "q_udaf_geomean", "s_session")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val a = fn(spark, dir).collect().map(_.toString).toSeq
      val b = fn(spark, dir).collect().map(_.toString).toSeq
      assert(a == b, s"$n not deterministic across runs")
    }
  }
}
