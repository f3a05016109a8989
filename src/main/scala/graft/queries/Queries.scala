package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared query inventory (SURVEY.md §2 rows Q/E/S/X): one named
  * DataFrame program per operator, each paired (in [[oracle]]) with an
  * ANSI-SQL rendering the driver runs in DuckDB over the same parquet
  * tables. Queries without an oracle entry are the declared
  * non-SQL-expressible ops (HLL/freqItems sketches, seeded sampling,
  * KMeans-based ANN, binary payload codecs) — the driver records a
  * rows-only check for those and ScalaTest covers their semantics
  * instead. (The MinHash-LSH banding join left this set in r6: the
  * portable md5 shingle hash made it — and its four graph consumers —
  * fully oracle-expressible.)
  *
  * Oracle-parity discipline (SURVEY.md §5.3):
  *  - every computed column aliased identically on both sides;
  *  - doubles aggregated then rounded (2dp money, 4-6dp unit-scale);
  *  - sums of integers wrapped in CAST(... AS BIGINT) (DuckDB sums
  *    integers into HUGEINT);
  *  - timestamps only ever output as epoch millis or DATE;
  *  - deterministic ORDER BY with unique tie-break, no nullable keys;
  *  - float vectors widened element-wise to double, folded
  *    left-to-right (bitwise-identical in both engines).
  */
object Queries {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Collision-free, staleness-aware tag for /tmp staging dirs (and
    * catalog table names) derived from a fixture dir: hex md5 of the
    * canonical path plus the dir's (name, length, mtime) listing. The
    * old `math.abs(dir.hashCode)` tag could collide across fixture
    * dirs (silently serving one fixture's staged copy for another),
    * is negative for `Int.MinValue`, and never noticed a regenerated
    * fixture behind an existing _SUCCESS marker; fingerprinting the
    * listing rebuilds staged data whenever the source changes.
    */
  def stageTag(dir: String): String = {
    val f = new java.io.File(dir)
    val canon = try f.getCanonicalPath catch { case _: Exception => dir }
    val listing = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .sortBy(_.getName)
      .map(x => s"${x.getName}:${x.length}:${x.lastModified}")
      .mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest((canon + "\n" + listing).getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Exact row count from parquet FOOTER metadata — a driver-side
    * footer read (one block-metadata sum per file), zero Spark jobs,
    * zero data pages touched. The cheap way to size safety valves and
    * spines when no catalog statistic exists for a raw parquet path.
    */
  def parquetRowCount(s: SparkSession, path: String): Long = {
    val conf = s.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      else Array(fs.getFileStatus(p))
    files.map { st =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Read one corpus table. Filters/pruning push into this scan.
    *
    * `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which
    * Spark 4 refuses to map to TimestampType — read as raw nanos via
    * `spark.sql.legacy.parquet.nanosAsLong` and rebuild the µs
    * timestamp) and TIMESTAMP(MICROS) (arrives as NTZ — reinterpret as
    * UTC instant). Normalize on the actual file schema, not an assumed
    * generator layout: either way downstream sees TimestampType in UTC,
    * the value DuckDB computes.
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // oracle parity requires UTC regardless of how the caller built the
    // session (NTZ→LTZ casts and epoch renders are TZ-sensitive)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    // session contract #3 (r10): typed-aggregate buffers stay HASHED up
    // to 64Ki grouping keys per task. Spark's ObjectHashAggregate falls
    // back to SORT-BASED aggregation after 128 distinct keys — which
    // re-sorts every remaining input row by key, exactly the full-
    // candidate-set sort the bounded top-k aggregate (TopKSimAgg)
    // exists to avoid: at the 1M-vector ANN proof (10,000 query keys,
    // ~80M candidate pairs) the fallback measured the LSH path ~4×
    // slower than the rank window it replaced. Safe to raise here
    // because every typed aggregate this engine registers carries a
    // BOUNDED buffer (top-k: ≤ k pairs/key; GeoMean: 2 scalars) — 64Ki
    // keys × the largest k is megabytes per task, not a spill risk.
    // CAVEAT: the conf is session-wide, so it also delays the fallback
    // for Spark's BUILT-IN TypedImperativeAggregates with unbounded
    // buffers — the collect_list sites in QueriesRel (ordered string
    // agg) / QueriesScalar / QueriesLLM. Those groups are bounded by
    // construction today (per-key lists of a handful of rows); any
    // future entry that collect_lists fat groups must re-evaluate this
    // ceiling or set the conf locally around the offending query.
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    // every query builder funnels through here: make the native kernel
    // functions (vec_dot, word_shingles, ...) resolvable everywhere
    graft.functions.GraftFunctions.register(s)
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", normalizeTs("ts", raw.schema("ts").dataType))
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  /** Per-task input-byte targets for [[spread]]: how many COMPRESSED
    * source bytes one task should own, given the kernel the call site
    * feeds. The r14 lesson (verdict: x_repetition 1.06→2.72 s,
    * x_simhash_near_dup 0.72→1.20 s at 32 cores): a round-robin
    * exchange costs a fixed setup + a local sort + a full-row shuffle
    * that SCALES WITH THE SESSION'S CORE COUNT, so "repartition to
    * defaultParallelism whenever the scan is under-parallel" turns
    * pure overhead on kernels whose single-task time is smaller than
    * the exchange. The width must come from the DATA and the KERNEL,
    * not from the core count: width = ceil(inputBytes / target),
    * capped at defaultParallelism. The target is the call site's
    * declaration of kernel weight per compressed input byte —
    * measured, not guessed (RegistryBench min-of-3, sf0.1+sf1):
    *  - [[SpreadHeavy]] (64 KB/task): quadratic or high-fan-out
    *    kernels — pair-join DP (levenshtein), N·Q dot-product cross
    *    joins, the BPE merge-chain regex cascade, AllPairs shingle
    *    posting builds, 128-perm MinHash signatures. Single-task cost
    *    is seconds even on the 584 KB sf0.1 fixture (x_edit_distance:
    *    10.6 s), so near-full width pays at every scale.
    *  - [[SpreadModerate]] (512 KB/task): per-token md5/regex kernels
    *    (simhash60, 8-gram hash64 spans, rlike classifiers) — a few
    *    hundred ms/MB; worth 2-way at sf0.1, ~12-way at sf1.
    *  - [[SpreadLight]] (4 MB/task, the default): split/explode/count
    *    shapes whose kernel is cheaper than any exchange below a few
    *    MB — no-op at sf0.1 (exactly the r13 plan), 2-way at sf1.
    */
  val SpreadHeavy = 64L << 10
  val SpreadModerate = 512L << 10
  val SpreadLight = 4L << 20

  /** Round-robin-spread a deficiently-parallel scan before a CPU-heavy
    * per-row kernel stage (r14, guide §2.5 "input skew"; r15 width cap,
    * guide §1.2 "exchange must cost less than it buys"). A small
    * single-file parquet table is ONE scan task no matter how many
    * cores the session has (byte-range splits cannot cut inside a row
    * group), so the kernel stage of every corpus entry — shingling,
    * hashing, regex chains, vector math — ran single-threaded on the
    * gate fixtures: x_edit_distance measured 10.6 s at sf0.1/local[32]
    * with 31 cores idle. The CONDITION, not the call site, decides
    * WHETHER it fires: only when the scan can reach defaultParallelism
    * tasks neither by file count nor by byte splitting, so a real
    * at-scale corpus (thousands of files) passes through untouched.
    * The call site's `targetBytes` (see [[SpreadHeavy]]) decides the
    * WIDTH: ceil(inputBytes / targetBytes) capped at parallelism, so
    * the exchange is sized to the kernel's work, not the core count —
    * a width of ≤ 1 skips the repartition entirely (no Exchange in
    * the plan at all, spec-pinned). Never applied where partitioning
    * is semantics (seeded sampleBy, spark_partition_id digests).
    */
  def spread(df: DataFrame, targetBytes: Long = SpreadLight): DataFrame = {
    val sess = df.sparkSession
    val p = sess.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= p) return df
    val hconf = sess.sparkContext.hadoopConfiguration
    val total = files.map { f =>
      val path = new org.apache.hadoop.fs.Path(f)
      path.getFileSystem(hconf).getFileStatus(path).getLen
    }.sum
    val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      sess.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    if (total >= p.toLong * maxPart) return df
    val width = math.min(p.toLong, (total + targetBytes - 1) / targetBytes).toInt
    if (width <= 1) df else df.repartition(width)
  }

  /** Normalize an events `ts` column to TimestampType (µs, UTC) from
    * whichever physical layout the file carries: raw nanos LONG
    * (TIMESTAMP(NANOS) under nanosAsLong — integer `div`, a double
    * divide would lose precision above 2⁵³ ns), TIMESTAMP_NTZ (MICROS
    * wall clock — reinterpret as UTC), or already-instant TIMESTAMP.
    */
  def normalizeTs(name: String, dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.LongType =>
      expr(s"timestamp_micros(`$name` div 1000)")
    case org.apache.spark.sql.types.TimestampNTZType =>
      col(name).cast(org.apache.spark.sql.types.TimestampType)
    case _ => col(name)
  }

  /** Determinism helpers. `round()` implementations diverge between
    * engines exactly at .005-grid rationals (systematic for products and
    * averages of 2-decimal money), so:
    *  - [[fround]]: half-up rounding as explicit floor arithmetic —
    *    bitwise-deterministic whenever both engines hold the identical
    *    double (true for any per-row expression and for frame-ordered
    *    window aggregates);
    *  - [[cents]]/[[sumMoney4]]/[[avgMoney]]: sums/averages of
    *    discrete-decimal money go through exact integer units, making
    *    the aggregate order-independent — a plain double sum can differ
    *    by an ulp between engines (different add order) and flip a
    *    rounding boundary.
    * Plain round() stays only where the value grid cannot sit on a
    * rounding boundary (e.g. 2dp-rational sums rounded to 2dp).
    */
  def fround(c: Column, n: Int): Column = {
    val f = math.pow(10, n)
    floor(c * f + lit(0.5)) / f
  }
  def half2(c: Column): Column = fround(c, 2)
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")
  /** Exact sum at 4-decimal resolution (integer ten-thousandths). */
  def sumMoney4(c: Column): Column =
    sum(floor(c * 10000 + lit(0.5)).cast("long")) / 10000.0
  /** Exact 2-decimal average: integer-cent sum, then half-up at cents. */
  def avgMoney(c: Column): Column =
    floor(sum(cents(c)) / count(lit(1)) + lit(0.5)) / 100.0

  /** Register every corpus table as a temp view and run shared SQL text
    * (used for the queries whose Spark and DuckDB form is the same).
    */
  def withViews(s: SparkSession, dir: String)(sql: String): DataFrame = {
    TableNames.foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  private def round2(c: Column): Column = round(c, 2)

  /** Flagship: revenue by nation (E5 joins + E10 broadcast + E11 agg). */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(
        sumMoney4(li("l_extendedprice") * (lit(1.0) - li("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"))
  }

  /** q1_agg — TPC-H Q1 shape: hash aggregate w/ partial+final (E11). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round2(sum(col("l_quantity"))).as("sum_qty"),
        round2(sum(col("l_extendedprice"))).as("sum_base_price"),
        sumMoney4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ------------------------------------------------------------------ map

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q0_flagship" -> (flagship _),
    "q1_agg" -> (q1Agg _),
    "q_topk" -> (QueriesRel.topk _),
    "q_filter_pred" -> (QueriesRel.filterPred _),
    "q_point_lookup" -> (QueriesRel.pointLookup _),
    "q_join_inner" -> (QueriesRel.joinInner _),
    "q_join_left" -> (QueriesRel.joinLeft _),
    "q_join_full" -> (QueriesRel.joinFull _),
    "q_join_semi" -> (QueriesRel.joinSemi _),
    "q_join_anti" -> (QueriesRel.joinAnti _),
    "q_join_theta" -> (QueriesRel.joinTheta _),
    "q_join_range" -> (QueriesRel.joinRange _),
    "q_join_broadcast" -> (QueriesRel.joinBroadcast _),
    "q_join_skew_salted" -> (QueriesRel.joinSkewSalted _),
    "q_join_asof" -> (QueriesRel.joinAsof _),
    "q_join_bucketed" -> (QueriesRel.joinBucketed _),
    "q_join_bloom" -> (QueriesRel.joinBloom _),
    "q_join_range_binned" -> (QueriesRel.joinRangeBinned _),
    "q_partitioned_scan" -> (QueriesRel.partitionedScan _),
    "q_join_dpp" -> (QueriesRel.joinDpp _),
    "q_join_skew_aqe" -> (QueriesRel.joinSkewAqe _),
    "q_agg_distinct" -> (QueriesRel.aggDistinct _),
    "q_agg_approx_distinct" -> (QueriesRel.aggApproxDistinct _),
    "q_agg_approx_percentile" -> (QueriesRel.aggApproxPercentile _),
    "q_rollup" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.rollupSql)),
    "q_cube" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.cubeSql)),
    "q_grouping_sets" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.groupingSetsSql)),
    "q_grouping_flags" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.groupingFlagsSql)),
    "q_udaf_geomean" -> (QueriesRel.udafGeomean _),
    "q_window_rank" -> (QueriesRel.windowRank _),
    "q_window_lag" -> (QueriesRel.windowLag _),
    "q_window_frame" -> (QueriesRel.windowFrame _),
    "q_window_range" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.windowRangeSql)),
    "q_window_ntile" -> (QueriesRel.windowNtile _),
    "q_window_first_last" -> (QueriesRel.windowFirstLast _),
    "q_topk_per_key" -> (QueriesRel.topkPerKey _),
    "q_subquery_corr" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.subqueryCorrSql)),
    "q_join_lateral" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.lateralSql)),
    "q_table_sample" -> (QueriesRel.tableSample _),
    "x_pii_redact" -> (QueriesLLM.piiRedact _),
    "x_collocations" -> (QueriesLLM.collocations _),
    "q_agg_stats" -> (QueriesRel.aggStats _),
    "q_agg_regr" -> (QueriesRel.aggRegr _),
    "q_agg_bitbool" -> (QueriesRel.aggBitBool _),
    "q_string_agg" -> (QueriesRel.stringAgg _),
    "q_gap_fill" -> (QueriesRel.gapFill _),
    "q_window_ignore_nulls" -> (QueriesRel.forwardFill _),
    "q_merge_upsert" -> (QueriesRel.mergeUpsert _),
    "q_histogram" -> (QueriesRel.histogram _),
    "q_try_funcs" -> (QueriesScalar.tryFuncs _),
    "q_explode_outer" -> (QueriesScalar.explodeOuter _),
    "q_range_shard" -> (QueriesRel.rangeShard _),
    "q_sessionize" -> (QueriesRel.sessionize _),
    "q_funnel" -> (QueriesRel.funnel _),
    "q_cohort_retention" -> (QueriesRel.cohortRetention _),
    "x_dup_ngram_spans" -> (QueriesLLM.dupNgramSpans _),
    "x_near_dedup_keep" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.nearDedupKeep(s, dir)),
    "x_near_dedup_keep_lsh" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.nearDedupKeepLsh(s, dir)),
    "x_blocklist_filter" -> (QueriesLLM.blocklistFilter _),
    "x_robust_stats" -> (QueriesLLM.robustStats _),
    "x_heavy_hitters" -> (QueriesLLM.heavyHitters _),
    "x_reservoir_sample" -> (QueriesLLM.reservoirSample _),
    "q_mode" -> (QueriesRel.modePerGroup _),
    "q_dq_audit" -> (QueriesRel.dqAudit _),
    "q_scd2" -> (QueriesRel.scd2 _),
    "q_join_asof_nearest" -> (QueriesRel.joinAsofNearest _),
    "q_recursive" -> ((s: SparkSession, dir: String) => {
      // the chain recursion is ROW-LINEAR (every order row visited
      // exactly once), so Spark's runaway-recursion safety valve must
      // scale with the input — the 1M default tripped at sf1's 1.5M
      // orders (found by the r7 sf1 mirror). Raise it scoped to an
      // EAGER materialization (the output is a tiny depth histogram;
      // localCheckpoint executes under the raised limit and the
      // restored session keeps the safety valve for everything else).
      val key = "spark.sql.cteRecursionRowLimit"
      val prev = s.conf.getOption(key)
      // size the valve from parquet FOOTER metadata, not a count() job:
      // the count was a second full table scan per invocation — at
      // 100 TB it doubled the query's scan cost (r9 verdict item 7)
      val rows = parquetRowCount(s, s"$dir/orders.parquet")
      s.conf.set(key, math.max(1000000L, 2L * rows).toString)
      // shipped form: loop-invariant nxt pre-materialized + broadcast
      // frontier (r13 — 42.7 → 11.9 s sf1, RecursiveProbe); the full
      // recursive text stays the oracle and QueriesRelSpec pins
      // fast == full row-for-row
      try QueriesRel.recursiveChainFast(s, dir).localCheckpoint()
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }),
    "q_variant" -> (QueriesScalar.variantExtract _),
    "x_quality_classify" -> (QueriesLLM.qualityClassify _),
    "x_compact_files" -> (QueriesRel.compactSmallFiles _),
    "s_join_left" -> (QueriesScalar.streamJoinLeft _),
    "x_pagerank" -> (QueriesLLM.pagerank _),
    "x_pagerank_lsh" -> (QueriesLLM.pagerankLsh _),
    "x_jaccard_pairs_prefix" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.exactJaccardPairsPrefix(s, dir)
        .orderBy(col("doc_a"), col("doc_b"))),
    "x_triangles" -> (QueriesLLM.triangleCount _),
    "x_triangles_lsh" -> (QueriesLLM.triangleCountLsh _),
    "q_interpolate" -> (QueriesRel.interpolate _),
    "q_window_distinct" -> (QueriesRel.windowDistinct _),
    "q_null_semantics" -> (QueriesRel.nullSemantics _),
    "q_skew_stats" -> (QueriesRel.skewStats _),
    "x_edit_distance" -> (QueriesLLM.editDistance _),
    "x_normalize_dedup" -> (QueriesLLM.normalizeDedup _),
    "q_percent_of_total" -> (QueriesRel.percentOfTotal _),
    "q_typed_cogroup" -> (QueriesRel.typedCogroup _),
    "q_sketch_union" -> (QueriesRel.sketchUnion _),
    "q_union_by_name" -> (QueriesRel.unionByNameDrift _),
    "q_agg_filter" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.aggFilterSql)),
    "q_cond_funcs" -> (QueriesScalar.condFuncs _),
    "q_union_all" -> (QueriesRel.unionAll _),
    "q_intersect" -> (QueriesRel.intersectKeys _),
    "q_except" -> (QueriesRel.exceptKeys _),
    "q_intersect_all" -> (QueriesRel.intersectAllKeys _),
    "q_except_all" -> (QueriesRel.exceptAllKeys _),
    "q_pivot" -> (QueriesRel.pivotAgg _),
    "q_unpivot" -> (QueriesRel.unpivotMetrics _),
    "q_subquery" -> ((s: SparkSession, dir: String) => withViews(s, dir)(QueriesRel.subquerySql)),
    "q_percentile" -> (QueriesRel.percentiles _),
    "q_string_funcs" -> (QueriesScalar.stringFuncs _),
    "q_hex_funcs" -> (QueriesScalar.hexFuncs _),
    "q_date_funcs" -> (QueriesScalar.dateFuncs _),
    "q_math_funcs" -> (QueriesScalar.mathFuncs _),
    "q_array_funcs" -> (QueriesScalar.arrayFuncs _),
    "q_explode" -> (QueriesScalar.explodeTokens _),
    "q_json_funcs" -> (QueriesScalar.jsonFuncs _),
    "q_map_funcs" -> (QueriesScalar.mapFuncs _),
    "q_zorder" -> (QueriesScalar.zorderKeys _),
    "q_zorder_lookup" -> (QueriesRel.zorderLookup _),
    "q_schema_evolution" -> (QueriesScalar.schemaEvolution _),
    "q_corrupt_csv" -> (QueriesScalar.corruptCsv _),
    "q_csv_json_scan" -> (QueriesScalar.csvJsonScan _),
    "q_orc_scan" -> (QueriesScalar.orcScan _),
    "q_xml_scan" -> (QueriesScalar.xmlScan _),
    "q_jdbc_scan" -> (QueriesScalar.jdbcScan _),
    "q_generator_udtf" -> (QueriesScalar.generatorShingles _),
    "q_binaryfile_scan" -> (QueriesScalar.binaryfileScan _),
    "s_state_reader" -> (QueriesScalar.stateReader _),
    "s_tumbling" -> (QueriesScalar.streamTumbling _),
    "s_chained_windows" -> (QueriesScalar.streamChained _),
    "s_sliding" -> (QueriesScalar.streamSliding _),
    "s_session" -> (QueriesScalar.streamSession _),
    "s_dedup_latest" -> (QueriesScalar.streamDedup _),
    // batch contract of the streaming accreting-index near-dup dedup
    // (StreamingQueries.simhashBandVerdicts); StreamingSpec pins the
    // streaming form equal to this over the same rows in arrival order
    "s_dedup_simhash" -> (QueriesLLM.arrivalDedupSimhash _),
    // retention-bounded twin (r11): dropped iff a match sits within the
    // last 100 arrivals — the bounded-state form an infinite stream
    // runs (StreamingQueries.BandDedupWindowProcessor prunes on touch)
    "s_dedup_simhash_window" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.arrivalDedupSimhashWindow(s, dir)),
    // event-time twin (r12): the one S16 entry that runs the REAL
    // STREAM inside the gate — the corpus staged as shuffled-arrival
    // slices through the buffer-until-watermark processor
    // (StreamingQueries.BandDedupEventTimeProcessor); hash-equality
    // with s_dedup_simhash's oracle CTE proves the verdicts survive
    // out-of-order delivery, the prerequisite the in-order processor
    // outsources to S15 mtime pinning
    "s_dedup_simhash_eventtime" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingQueries.runEventTimeDedup(s, dir)),
    // the full production shape (r12): out-of-order tolerant AND
    // bounded state — the event-time buffer composed with the
    // retention window's prune-on-flush; real stream in the gate,
    // oracled by s_dedup_simhash_window's CTE
    "s_dedup_simhash_eventtime_window" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingQueries.runEventTimeDedup(s, dir,
        QueriesLLM.SimhashWindow)),
    // S17 (r13): a REAL rate-limited stream through the custom
    // Kafka-shaped DSv2 source (EventLogSource — MicroBatchStream +
    // SupportsAdmissionControl, partitioned offsets over the events
    // log); shares s_tumbling's oracle, so a hash match proves the
    // source's offset ranges tile the log exactly across micro-batches
    "s_eventlog_tumbling" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingQueries.runEventLogTumbling(s, dir)),
    // S17 + streaming filter pushdown (r14): the same real stream with
    // a selective predicate pushed into the source as its skipWhere
    // row-group-skip hint AND applied as the query filter; the WHERE'd
    // oracle hash proves skipping drops page IO, never rows
    "s_eventlog_filtered" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingQueries.runEventLogFiltered(s, dir)),
    "s_join" -> (QueriesScalar.streamJoin _),
    "s_upsert" -> (QueriesScalar.streamUpsert _),
    "x_exact_dedup" -> (QueriesLLM.exactDedup _),
    "x_dedup_stats" -> (QueriesLLM.dedupStats _),
    "x_minhash_sig" -> (QueriesLLM.minhashSig _),
    "x_minhash_lsh" -> (QueriesLLM.minhashLshPairsUncached _),
    "x_ngram_jaccard" -> (QueriesLLM.ngramJaccard _),
    "x_simhash" -> (QueriesLLM.simhash _),
    "x_simhash_near_dup" -> (QueriesLLM.simhashNearDup _),
    "x_cosine_topk" -> (QueriesLLM.cosineTopk _),
    "x_ann_lsh" -> ((s: SparkSession, dir: String) => QueriesLLM.annLsh(s, dir)),
    "x_ann_lsh_persisted" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.annLshPersisted(s, dir)),
    "x_ann_quantized" -> (QueriesLLM.annQuantized _),
    "x_ann_ivf" -> ((s: SparkSession, dir: String) => QueriesLLM.annIvf(s, dir)),
    "x_ann_ivf_persisted" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.annIvfPersisted(s, dir)),
    "x_ann_pq" -> ((s: SparkSession, dir: String) => QueriesLLM.annIvfPq(s, dir)),
    "x_ann_pq_persisted" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.annIvfPqPersisted(s, dir)),
    "x_embed_centroid" -> (QueriesLLM.embedCentroid _),
    "x_bpe_train" -> ((s: SparkSession, dir: String) => QueriesLLM.bpeTrain(s, dir)),
    "x_bpe_apply" -> (QueriesLLM.bpeApply _),
    "x_embed_dedup" -> (QueriesLLM.embedDedup _),
    // the LSH-candidate twin (r11): full corpus, X3 bucket candidates,
    // exact cosine verify — the scale path SURVEY X5 promises
    "x_embed_dedup_lsh" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.embedDedupLsh(s, dir)),
    "x_lang_id" -> (QueriesLLM.langIdQuery _),
    "x_quality" -> (QueriesLLM.qualityQuery _),
    "x_token_count" -> (QueriesLLM.tokenCount _),
    "x_fingerprint" -> (QueriesLLM.fingerprint _),
    "x_tfidf" -> (QueriesLLM.tfidf _),
    "x_dedup_clusters" -> (QueriesLLM.dedupClusters _),
    "x_dedup_clusters_lsh" -> ((s: SparkSession, dir: String) =>
      QueriesLLM.dedupClustersLsh(s, dir)),
    "x_repetition" -> (QueriesLLM.repetition _),
    "x_domain_mix" -> (QueriesLLM.domainMix _),
    "x_mix_temperature" -> (QueriesLLM.mixTemperature _),
    "x_chunk_dedup" -> (QueriesLLM.chunkDedup _),
    "x_knn_classify" -> (QueriesLLM.knnClassify _),
    "x_pack_sequences" -> (QueriesLLM.packSequences _),
    "x_stratified_sample" -> (QueriesLLM.stratifiedSample _),
    "x_hash_stratified" -> (QueriesLLM.hashStratifiedSample _),
    "x_decontaminate" -> (QueriesLLM.decontaminate _),
    "x_lm_score" -> (QueriesLLM.lmScore _),
    "x_lm_bigram" -> (QueriesLLM.lmBigram _),
    "x_curation_pipeline" -> (QueriesLLM.curationPipeline _),
    "x_multimodal_meta" -> (QueriesLLM.multimodalMeta _),
    "x_multimodal_frames" -> (QueriesLLM.multimodalFrames _),
    "x_multimodal_frame_index" -> (QueriesLLM.multimodalFrameIndex _),
    "x_multimodal_features" -> ((s: SparkSession, dir: String) =>
      graft.multimodal.Multimodal.extractFeatures(s,
        graft.multimodal.Multimodal.mediaFromDocuments(s, dir)).orderBy("media_id")),
    // header-only geometry (r11): the closed-form typed-metadata subset
    // — fully DuckDB-oracled against the generator rules, proving the
    // engine's real container walks recover exactly what was encoded;
    // pixel statistics stay in the rows-only entries above/below
    "x_multimodal_features_geom" -> ((s: SparkSession, dir: String) =>
      graft.multimodal.Multimodal.headerFeatures(s,
        graft.multimodal.Multimodal.mediaFromDocuments(s, dir)).orderBy("media_id")),
    // keyframe PIXEL decode (H264Codec, r7): rows-only — container
    // synthesis, avcC walking, and H.264 entropy decode are not SQL;
    // MultimodalSpec pins per-frame geometry, luma stats against the
    // generator's own YUV, and the dead-letter accounting
    "x_multimodal_video" -> ((s: SparkSession, dir: String) =>
      graft.multimodal.Multimodal.decodeKeyframes(s,
        graft.multimodal.Multimodal.mediaFromDocuments(s, dir))
        .orderBy("media_id", "frame_index")),
    // full-GOP pixel decode (P-slice inter layer, r7): one row per
    // sample, IDR and motion-compensated P frames alike — rows-only
    // for the same reason as x_multimodal_video; MultimodalSpec pins
    // every frame's luma stats against the encoder's reconstruction
    // and the chain-poisoning dead-letter accounting
    "x_multimodal_gop" -> ((s: SparkSession, dir: String) =>
      graft.multimodal.Multimodal.decodeFrames(s,
        graft.multimodal.Multimodal.mediaFromDocuments(s, dir))
        .orderBy("media_id", "frame_index")),
    "x_multimodal_resize" -> ((s: SparkSession, dir: String) =>
      graft.multimodal.Multimodal.resize(s,
          graft.multimodal.Multimodal.mediaFromDocuments(s, dir))
        .select(col("media_id"), col("kind"), col("resized_ok"),
          length(col("content_resized")).as("n_bytes_out"))
        .orderBy("media_id")),
    "utxo_e2e_point_lookup" -> (QueriesUtxo.e2ePointLookup _),
    "utxo_e2e_script_types" -> (QueriesUtxo.e2eScriptTypes _)
  )

  // --------------------------------------------------------------- oracle

  /** Shared CTE prefix of the SimHash band-join oracles: the full
    * banded pipeline replicated relationally — same portable
    * md5-derived per-token hash as `x_simhash` (and as the simhash60
    * kernel — all 60 bits the hash carries since r10), 4×15-bit band
    * keys via shift/mask, candidate pairs sharing any band. Band
    * membership, not just fingerprints, is cross-checked; both the
    * pair entry (`x_simhash_near_dup`) and the arrival-order dedup
    * (`s_dedup_simhash`) project from the SAME `cand` set, so the two
    * oracles cannot drift.
    */
  private val simhashBandCteSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |             FROM documents),
      |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h64 FROM tok),
      |bits AS (SELECT doc_id, CAST(b AS INTEGER) AS bp,
      |    sum(((h64 >> CAST(b AS INTEGER)) % 2) * 2 - 1) AS bal
      |  FROM h, range(60) t(b) GROUP BY doc_id, b),
      |f AS (SELECT doc_id,
      |        CAST(sum(CASE WHEN bal > 0 THEN 1::BIGINT << bp ELSE 0 END) AS BIGINT) AS fp
      |      FROM bits GROUP BY doc_id),
      |bands AS (SELECT doc_id, fp, CAST(i AS INTEGER) AS band,
      |        (fp >> (15 * CAST(i AS INTEGER))) & 32767 AS key
      |      FROM f, range(4) t(i)),
      |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |                x.fp AS fa, y.fp AS fb
      |         FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
      |           AND x.doc_id < y.doc_id)""".stripMargin

  /** DuckDB mirror of [[QueriesLLM.annLsh]] (r7 oracle promotion): the
    * kernel's integer-quantized plane weights
    * ([[graft.functions.LshSignBits.weights]] — the single source of
    * truth) are embedded as SQL literals, so every sign decision is
    * the same exact BIGINT arithmetic in both engines (no cross-engine
    * `sin` or float-fold parity in any bucket assignment); banding,
    * Hamming-1 probes, pair dedup, and the exact cosine re-rank then
    * replicate the Spark pipeline clause for clause (the scoring
    * idiom is `x_cosine_topk`'s, already hash-proven).
    */
  /** The sign-LSH bucket map as DuckDB CTEs — `vq` (micro-quantized +
    * double views of every embedding), `bits` (the t·b hyperplane sign
    * bits, each plane a literal 64-element vector from the engine's own
    * deterministic [[graft.functions.LshSignBits.weights]]), `bkt` (the
    * per-table numeric buckets). Shared by every consumer of the X3
    * bucket structure: the ANN search oracles ([[annLshOracleSql]]) and
    * the LSH-candidate dedup twin (`x_embed_dedup_lsh`, r11) — one
    * bucket map in SQL, exactly as one [[graft.queries.QueriesLLM
    * .lshCandIndex]] serves both on the Spark side.
    */
  private def lshBucketCtes(tables: Int, bpt: Int): String = {
    val nBits = tables * bpt
    val w = graft.functions.LshSignBits.weights(nBits)
    def planeList(p: Int): String =
      (0 until 64).map(j => w(p * 64 + j)).mkString("[", ", ", "]")
    val bitExprs = (0 until nBits).map { p =>
      "CASE WHEN list_sum(list_transform(range(1, len(q) + 1), " +
        s"i -> q[i] * (${planeList(p)})[i])) >= 0 THEN 1 ELSE 0 END"
    }.mkString(",\n    ")
    def bucketExpr(tb: Int): String =
      (1 to bpt).foldLeft(s"CAST(${tb.toLong * (1L << bpt)} AS BIGINT)") {
        (acc, j) => s"($acc * 2 + b[${tb * bpt + j}])"
      }
    val bucketExprs = (0 until tables).map(bucketExpr).mkString(",\n    ")
    s"""vq AS (SELECT vec_id,
       |    list_transform(embedding, x -> LEAST(GREATEST(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT), -100000000), 100000000)) AS q,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |bits AS (SELECT vec_id, v, [
       |    $bitExprs] AS b FROM vq),
       |bkt AS (SELECT vec_id, v, [
       |    $bucketExprs] AS bk FROM bits)""".stripMargin
  }

  private def annLshOracleSql(tables: Int, bpt: Int): String = {
    val probeExprs = (0 until tables).flatMap { tb =>
      val base = s"bk[${tb + 1}]"
      base +: (0 until bpt).map(i => s"xor($base, ${1L << i})")
    }.mkString(",\n    ")
    s"""WITH ${lshBucketCtes(tables, bpt)},
       |cand AS (SELECT vec_id AS cand_id, v AS cv, unnest(bk) AS bucket FROM bkt),
       |qp AS (SELECT vec_id AS query_id, v AS qv, unnest([
       |    $probeExprs]) AS bucket FROM bkt WHERE vec_id % 100 = 0),
       |sims AS (SELECT query_id, cand_id,
       |    list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) /
       |    (sqrt(list_sum(list_transform(qv, x -> x * x))) *
       |     sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
       |  FROM qp JOIN cand USING (bucket) WHERE query_id <> cand_id),
       |ded AS (SELECT query_id, cand_id, max(sim) AS sim FROM sims GROUP BY 1, 2),
       |ranked AS (SELECT query_id, cand_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
       |  FROM ded)
       |SELECT query_id, cand_id, rnk, floor(sim * 10000 + 0.5) / 10000.0 AS cos_sim
       |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
  }

  /** The `x_embed_dedup_lsh` oracle (r11): the same sign-LSH bucket map
    * as the ANN oracles ([[lshBucketCtes]]), then the co-bucket
    * self-join, the exact cosine verify at τ=0.3, the per-pair dedup
    * (a pair met in several tables counts once), and `x_embed_dedup`'s
    * keep-first aggregation — the SQL statement of the twin's declared
    * contract: the exact entry's answer restricted to co-bucket pairs.
    */
  private def embedDedupLshOracleSql(tables: Int, bpt: Int): String =
    s"""WITH ${lshBucketCtes(tables, bpt)},
       |cand AS (SELECT vec_id, v, unnest(bk) AS bucket FROM bkt),
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) /
       |    (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
       |     sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS c
       |  FROM cand a JOIN cand b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |ded AS (SELECT vec_a, vec_b, max(c) AS c FROM p WHERE c >= 0.3 GROUP BY 1, 2)
       |SELECT vec_b AS dup_id, min(vec_a) AS canonical_id,
       |  max(floor(c * 10000 + 0.5) / 10000.0) AS max_sim,
       |  count(*) AS n_near
       |FROM ded GROUP BY vec_b ORDER BY dup_id""".stripMargin

  /** DuckDB CTE chain replicating BPE training exactly: the word-freq
    * table, then `nMerges` unrolled rounds of (pair count → argmax with
    * the count-desc/pair-asc tie-break → greedy left-to-right merge).
    * The merge uses the double-space trick — pad boundaries to two
    * spaces so each occurrence of ` a  b ` is non-overlapping and plain
    * `replace` merges back-to-back occurrences exactly like the Spark
    * side's lookahead regex — then re-normalizes spacing. CTEs are
    * MATERIALIZED: each round is referenced twice (next round's pair
    * count + merge), and inlining would re-expand the chain 2^rounds
    * times. Same unrolled-rounds discipline as the x_pagerank oracle.
    */
  private def bpeOracleCtes(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      val prev = s"v${i - 1}"
      s"""pc$i AS MATERIALIZED (SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM (
         |    SELECT c, unnest(list_transform(range(len(string_split(sym, ' ')) - 1),
         |      j -> array_to_string((string_split(sym, ' '))[j+1:j+2], ' '))) AS pair
         |    FROM $prev) GROUP BY pair),
         |b$i AS MATERIALIZED (SELECT pair, n FROM pc$i ORDER BY n DESC, pair LIMIT 1),
         |v$i AS MATERIALIZED (SELECT word, c, trim(regexp_replace(
         |      replace(' ' || replace(sym, ' ', '  ') || ' ',
         |        ' ' || replace((SELECT pair FROM b$i), ' ', '  ') || ' ',
         |        ' ' || replace((SELECT pair FROM b$i), ' ', '') || ' '),
         |      ' +', ' ', 'g')) AS sym FROM $prev)""".stripMargin
    }
    s"""WITH w AS MATERIALIZED (SELECT word, count(*) AS c
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE len(word) > 0 GROUP BY word),
       |v0 AS MATERIALIZED (SELECT word, c, array_to_string(string_split(word, ''), ' ') AS sym FROM w),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  private def bpeTrainOracle(nMerges: Int): String =
    bpeOracleCtes(nMerges) + s"""
      |SELECT merge_rank, pair, n_occurrences FROM (
      |${(1 to nMerges).map(i =>
          s"SELECT $i AS merge_rank, pair, n AS n_occurrences FROM b$i")
          .mkString("\n UNION ALL ")}
      |) ORDER BY merge_rank""".stripMargin

  private def bpeApplyOracle(nMerges: Int): String =
    bpeOracleCtes(nMerges) + s""",
      |occ AS (SELECT source, word
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE len(word) > 0),
      |tok AS (SELECT word, len(string_split(sym, ' ')) AS n_bpe FROM v$nMerges),
      |agg AS (SELECT source, count(*) AS n_words,
      |    CAST(sum(length(occ.word)) AS BIGINT) AS n_chars,
      |    CAST(sum(tok.n_bpe) AS BIGINT) AS n_bpe_tokens
      |  FROM occ JOIN tok ON occ.word = tok.word
      |  GROUP BY source)
      |SELECT source, n_words, n_chars, n_bpe_tokens,
      |  CAST(((n_chars - n_bpe_tokens) * 1000000) // n_chars AS BIGINT) AS saved_ppm
      |FROM agg ORDER BY source""".stripMargin

  /** DuckDB CTE chain replicating the MinHash-LSH candidate pipeline
    * (`QueriesLLM.minhashLshPairsUncached`) bit-for-bit: word
    * 3-shingles → portable md5-derived 60-bit hash mod 2³¹-1 → 16
    * permutation minima (the same kernel arithmetic `minhash_sigs`
    * runs) → 8 bands × 2 rows keyed on the stringified slice →
    * band-bucketed self-join → est = agreeing components / 16, max over
    * bands, cut at 0.5. Possible at all because the kernel hashes with
    * the engine's `hash64` twin (`('0x' || substr(md5(s),1,15))::BIGINT`)
    * — the simhash48 discipline applied to MinHash in r6, which
    * promotes the banding join and the four graph consumers below from
    * rows-only to full hash-checked oracles. est_jaccard is k/16.0
    * (exactly representable), so the float compare is exact.
    */
  private val lshCandCtes: String =
    """tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |lsh_sh AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 2),
      |    i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM tk),
      |lsh_h AS (SELECT doc_id,
      |    ('0x' || substr(md5(sh), 1, 15))::BIGINT % 2147483647 AS h FROM lsh_sh),
      |lsh_p AS (SELECT CAST(i AS INTEGER) AS perm_id,
      |    (1103515245 * (CAST(i AS BIGINT) + 1)) % 2147483647 AS a,
      |    (12345 * (CAST(i AS BIGINT) + 7)) % 2147483647 AS b
      |  FROM range(16) t(i)),
      |lsh_sg AS (SELECT doc_id, perm_id, min((a * h + b) % 2147483647) AS sig
      |  FROM lsh_h, lsh_p GROUP BY doc_id, perm_id),
      |lsh_sa AS MATERIALIZED (SELECT doc_id, list(sig ORDER BY perm_id) AS sigs
      |  FROM lsh_sg GROUP BY doc_id),
      |lsh_bd AS (SELECT doc_id, sigs, b AS band,
      |    sigs[2*b+1]::VARCHAR || '_' || sigs[2*b+2]::VARCHAR AS bk
      |  FROM lsh_sa, range(8) t(b)),
      |cand AS MATERIALIZED (SELECT doc_a, doc_b, est_jaccard FROM (
      |    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |      max(len(list_filter(range(16), i -> x.sigs[i+1] = y.sigs[i+1])) / 16.0)
      |        AS est_jaccard
      |    FROM lsh_bd x JOIN lsh_bd y
      |      ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id
      |    GROUP BY 1, 2)
      |  WHERE est_jaccard >= 0.5)""".stripMargin

  /** [[lshCandCtes]] + the exact-Jaccard verification stage at tau=0.5
    * (`QueriesLLM.dedupClustersLsh`): shingle SETS for candidate docs
    * only (the semi-join pushdown the Spark side does), exact
    * intersection/union ratio over just the candidate pairs.
    */
  private val lshVerifiedCtes: String = lshCandCtes +
    """,
      |lsh_ids AS (SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand),
      |lsh_ds AS MATERIALIZED (SELECT tk.doc_id,
      |    list_distinct(list_transform(range(len(tk.toks) - 2),
      |      i -> array_to_string(tk.toks[i+1:i+3], ' '))) AS shs
      |  FROM tk JOIN lsh_ids USING (doc_id)),
      |vp AS MATERIALIZED (SELECT c.doc_a, c.doc_b FROM cand c
      |  JOIN lsh_ds a ON a.doc_id = c.doc_a
      |  JOIN lsh_ds b ON b.doc_id = c.doc_b
      |  WHERE len(list_filter(a.shs, x -> list_contains(b.shs, x))) * 1.0 /
      |        len(list_distinct(list_concat(a.shs, b.shs))) >= 0.5)""".stripMargin

  /** The full oracle map: the static entries plus the two
    * fitted-model ANN oracles, whose SQL is GENERATED with the engine's
    * own quantized centroids/codebooks embedded as literals (the
    * x_ann_lsh discipline of r7, one level up — see [[annIvfOracleSql]]).
    * A `def` because generation needs a live session and the corpus dir.
    */
  def oracle: Map[String, String] = oracleFor(None)

  /** Generated-oracle FAMILIES: each entry is (keys sharing one fitted
    * model, the SQL generator for that model). The key set every
    * consumer sees ([[annOracleKeys]]) is DERIVED from this table, so a
    * new generated key can never silently escape the key-alignment
    * specs by being forgotten in a hand-synced set (r9 advice item 2) —
    * and [[oracleFor]] fits ONLY the families a filtered Verify selects
    * (r9 advice item 4: an x_ann_ivf iteration must not pay the PQ
    * codebook fit, and vice versa; the coarse quantizer both share is
    * memoized, so the overlap costs one fit either way).
    */
  private val annFamilies: Seq[(Set[String], (SparkSession, String) => String)] = Seq(
    (Set("x_ann_ivf", "x_ann_ivf_persisted"),
      (s, dir) => annIvfOracleSql(QueriesLLM.ivfModelFor(s, dir, 16), 4)),
    (Set("x_ann_pq", "x_ann_pq_persisted"),
      (s, dir) => annPqOracleSql(QueriesLLM.pqModelFor(s, dir, 16, 8), 4, 8, 256)))

  /** Keys whose oracle SQL is GENERATED from a fitted model (a KMeans
    * fit + an embeddings-table read at generation time) — derived from
    * [[annFamilies]], never hand-synced. Key-only consumers (the
    * contract specs) and filtered Verify runs that do not select any of
    * these must never trigger the generation — see [[oracleFor]] /
    * [[oracleKeys]].
    */
  val annOracleKeys: Set[String] = annFamilies.flatMap(_._1).toSet

  /** The full oracle KEY set with zero generation cost — what the
    * key-alignment specs inspect (r8 advice: `oracle` is a def with
    * heavy side effects; key consumers must not pay, or fail, for fits).
    */
  def oracleKeys: Set[String] =
    staticOracle.keySet ++ fixtureOracleKeys ++ annOracleKeys

  /** The oracle map restricted to `only` (None = everything), with the
    * fitted-model ANN oracles generated ONLY when selected — a filtered
    * Verify iteration on one non-ANN query pays no KMeans fit and works
    * on corpora without an embeddings table (r8 advice item 1) — and
    * generated PER FAMILY (r9 advice item 4).
    */
  def oracleFor(only: Option[Set[String]]): Map[String, String] = {
    def sel(n: String): Boolean = only.forall(_.contains(n))
    val static = (staticOracle ++ fixtureOracle).filter { case (n, _) => sel(n) }
    val fams = annFamilies.filter { case (keys, _) => keys.exists(sel) }
    if (fams.isEmpty) static
    else {
      val s = annSession()
      val dir = annDir()
      static ++ fams.flatMap { case (keys, gen) =>
        val sql = gen(s, dir)
        keys.toSeq.filter(sel).map(_ -> sql)
      }
    }
  }

  /** sfDir the data-dependent oracles are generated for. Verify pins it
    * to its own sfDir argument so the dumped oracle_sql.json replicates
    * the exact fit the engine parquet was written with (the model memo
    * guarantees both come from one fit). Outside Verify — the
    * key-consistency specs — the smallest test scale is the default.
    */
  @volatile var oracleSfDir: String = "/root/testdata/sf0.001"

  // fail fast, loudly: oracle generation reads the corpus and fits a
  // model — a missing dir or session must not degrade into a silent
  // local[4] session against a nonexistent path (r8 advice item 4)
  private def annSession(): SparkSession =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(sys.error(
        "Queries ANN oracle generation needs an active SparkSession: the " +
          "oracle SQL embeds a fitted model; start a session (Verify does) " +
          "or restrict to non-ANN keys via Queries.oracleFor"))

  private def annDir(): String = {
    val dir = oracleSfDir
    require(new java.io.File(new java.io.File(dir), "embeddings.parquet").exists(),
      s"Queries.oracleSfDir=$dir has no embeddings.parquet — set " +
        "Queries.oracleSfDir to the corpus the engine results were computed on")
    dir
  }

  /** Oracles over CORPUS-TAG-KEYED staged fixtures (r9 verdict item 6):
    * the SQL embeds the staged path, which since r10 carries
    * `stageTag(oracleSfDir)` — so two concurrent Verify/plan-lint runs
    * at different scales stage DISJOINT directories instead of
    * re-staging each other's fixed path mid-compare (the hazard that
    * cost the r9 sf1 mirror two spurious mismatches). Cheap to build
    * (one dir listing, no session), but dir-dependent, hence not in
    * [[staticOracle]].
    */
  private val fixtureOracleKeys = Set("q_corrupt_csv", "q_schema_evolution")

  private def fixtureOracle: Map[String, String] = Map(
    "q_corrupt_csv" ->
      s"""SELECT CAST(n_regionkey AS INTEGER) AS n_regionkey, count(*) AS n,
         |  min(n_name) AS first_name
         |FROM read_csv('${QueriesScalar.corruptCsvPath(oracleSfDir)}/nation.csv',
         |  columns={'n_nationkey':'INTEGER','n_name':'VARCHAR','n_regionkey':'INTEGER'},
         |  ignore_errors=true, header=false)
         |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    // staged by the Spark side before the driver's oracle pass (same
    // contract as the utxo e2e queries); union_by_name mirrors
    // mergeSchema's NULL-fill for the column the old epoch lacks
    "q_schema_evolution" ->
      s"""SELECT o_year, count(*) AS n,
         |  count(o_orderpriority) AS n_with_priority,
         |  CAST(sum(price_cents) AS BIGINT) AS total_cents
         |FROM read_parquet(['${QueriesScalar.schemaEvoPath(oracleSfDir)}/old/*.parquet',
         |                   '${QueriesScalar.schemaEvoPath(oracleSfDir)}/new/*.parquet'],
         |                  union_by_name=true)
         |GROUP BY o_year ORDER BY o_year""".stripMargin)

  private def longList(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")

  /** Shared micro-quantization clause — the SQL text mirror of
    * [[QueriesLLM.quant6]]. */
  private val quantClause =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))"

  /** Pseudo-distance to one quantized centroid: |c|² − 2·q·c — same
    * argmin and ordering as |q−c|² (the q² term is constant per
    * vector) at half the literal footprint; the SQL text mirror of
    * [[QueriesLLM.nd2Col]]'s per-cell lambda.
    */
  private def nd2Sql(qCol: String, cent: Seq[Long], cn2: Long): String =
    s"($cn2 - 2 * CAST(list_sum(list_transform(range(1, len($qCol) + 1), " +
      s"i -> $qCol[i] * (${longList(cent)})[i])) AS BIGINT))"

  /** DuckDB mirror of [[QueriesLLM.annIvf]] (r8 oracle promotion): the
    * engine's fitted coarse centroids, quantized to integer micro-units
    * by the kernel itself, are embedded as literals; cell assignment
    * (argmin via list_position-of-min — first match = lowest cell,
    * exactly array_position's contract), probe selection, and the
    * exact integer-cosine scoring then replicate the Spark pipeline
    * clause for clause. Every decision downstream of the fit is exact
    * BIGINT arithmetic in both engines.
    */
  private def annIvfOracleSql(mdl: QueriesLLM.QuantCents, nprobe: Int): String = {
    // probe enumeration runs over the FITTED center count, not the
    // requested k: KMeans may return fewer centers on a degenerate
    // corpus, and nd2[c] past the list is NULL in DuckDB — a silent
    // divergence where the engine explodes the actual list (r8 advice)
    val k = mdl.cents.length
    val nd2s = mdl.cents.zip(mdl.cn2).map { case (c, n2) => nd2Sql("q", c, n2) }
      .mkString(",\n    ")
    s"""WITH vq AS (SELECT vec_id, $quantClause AS q FROM embeddings),
       |b AS (SELECT vec_id, q,
       |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn2, [
       |    $nd2s] AS nd2 FROM vq),
       |asn AS (SELECT vec_id AS cand_id, q AS cq, qn2 AS cn2,
       |    CAST(list_position(nd2, list_min(nd2)) - 1 AS INTEGER) AS cell FROM b),
       |pq AS (SELECT vec_id AS query_id, q AS qq, qn2 AS qn,
       |    CAST(c - 1 AS INTEGER) AS cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY nd2[CAST(c AS INTEGER)], c) AS pr
       |  FROM b, range(1, ${k + 1}) t(c) WHERE vec_id % 100 = 0),
       |probes AS (SELECT query_id, qq, qn, cell FROM pq WHERE pr <= $nprobe),
       |sims AS (SELECT query_id, cand_id,
       |    CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * cq[i])) AS BIGINT)
       |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS sim
       |  FROM probes JOIN asn USING (cell) WHERE query_id <> cand_id),
       |r AS (SELECT query_id, cand_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
       |  FROM sims)
       |SELECT query_id, cand_id, rnk, floor(sim * 10000 + 0.5) / 10000.0 AS cos_sim
       |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
  }

  /** DuckDB mirror of [[QueriesLLM.annIvfPq]]: coarse centroids AND the
    * m per-subspace codebooks ride in as literals. Code assignment is
    * the per-subspace integer argmin; the ADC score is the exact
    * integer sum of codebook partials (indexed by the candidate's own
    * codes) over sqrt of the PQ-reconstructed norm²; the top-`rerank`
    * shortlist and the exact quantized-cosine refine replicate the
    * engine's window ordering including tie-breaks — identical ints →
    * identical IEEE doubles → identical rows.
    */
  private def annPqOracleSql(mdl: QueriesLLM.PqModel, nprobe: Int, m: Int,
      rerank: Int): String = {
    val k = mdl.coarse.cents.length
    val subDim = 64 / m
    val nd2s = mdl.coarse.cents.zip(mdl.coarse.cn2)
      .map { case (c, n2) => nd2Sql("q", c, n2) }.mkString(",\n    ")
    def subNd(j: Int): String =
      mdl.books(j).zip(mdl.bn2(j)).map { case (c, n2) =>
        s"($n2 - 2 * CAST(list_sum(list_transform(range(1, ${subDim + 1}), " +
          s"i -> q[${j * subDim} + i] * (${longList(c)})[i])) AS BIGINT))"
      }.mkString("[", ",\n      ", "]")
    val ndCols = (0 until m).map(j => s"${subNd(j)} AS nd_$j").mkString(",\n    ")
    val codeCols = (0 until m).map(j =>
      s"CAST(list_position(nd_$j, list_min(nd_$j)) - 1 AS INTEGER) AS code_$j")
      .mkString(",\n    ")
    val an2 = (0 until m).map(j =>
      s"(${longList(mdl.bn2(j))})[code_$j + 1]").mkString(" + ")
    // PQ reconstruction PER CANDIDATE: rq = book_0[code_0] ‖ … ‖
    // book_{m-1}[code_{m-1}] — the ADC score is then one plain dot
    // product qq·rq at the pair stage. Mathematically identical to the
    // r8 per-pair form (Σ_j of exact-integer sub-dots = the one exact-
    // integer full dot), but the 1,024-element codebook literal is now
    // evaluated once per CANDIDATE (corpus-linear) instead of once per
    // (query, candidate) PAIR — the re-evaluation that kept the r8 sf1
    // mirror from finishing (~16G literal constructions at 1M pairs).
    val rq = (0 until m).map { j =>
      val bookLit = mdl.books(j).map(longList).mkString("[", ",\n      ", "]")
      s"($bookLit)[code_$j + 1]"
    }.mkString(" || ")
    s"""WITH vq AS (SELECT vec_id, $quantClause AS q FROM embeddings),
       |b AS (SELECT vec_id, q,
       |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn2, [
       |    $nd2s] AS nd2 FROM vq),
       |cd AS (SELECT vec_id, q, qn2, nd2,
       |    $ndCols FROM b),
       |cc AS (SELECT vec_id, q, qn2, nd2,
       |    $codeCols FROM cd),
       |asn AS (SELECT vec_id AS cand_id, q AS cq, qn2 AS cn2,
       |    CAST(list_position(nd2, list_min(nd2)) - 1 AS INTEGER) AS cell,
       |    $rq AS rq,
       |    CAST($an2 AS BIGINT) AS an2 FROM cc),
       |pq AS (SELECT vec_id AS query_id, q AS qq, qn2 AS qn,
       |    CAST(c - 1 AS INTEGER) AS cell,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY nd2[CAST(c AS INTEGER)], c) AS pr
       |  FROM b, range(1, ${k + 1}) t(c) WHERE vec_id % 100 = 0),
       |probes AS (SELECT query_id, qq, qn, cell FROM pq WHERE pr <= $nprobe),
       |sc AS (SELECT query_id, qq, qn, cand_id, cq, cn2,
       |    CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * rq[i])) AS BIGINT)
       |      / sqrt(CAST(an2 AS DOUBLE)) AS score
       |  FROM probes JOIN asn USING (cell) WHERE query_id <> cand_id),
       |shl AS (SELECT query_id, qq, qn, cand_id, cq, cn2,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS srnk
       |  FROM sc),
       |ref AS (SELECT query_id, cand_id,
       |    CAST(list_sum(list_transform(range(1, len(qq) + 1), i -> qq[i] * cq[i])) AS BIGINT)
       |      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS sim
       |  FROM shl WHERE srnk <= $rerank),
       |r AS (SELECT query_id, cand_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
       |  FROM ref)
       |SELECT query_id, cand_id, rnk, floor(sim * 10000 + 0.5) / 10000.0 AS cos_sim
       |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
  }

  private val staticOracle: Map[String, String] = Map(
    // ---- MinHash-LSH family (promoted from rows-only in r6): the
    // shared candidate CTE replicates sig → band → join → est exactly;
    // consumers reuse the same downstream SQL as their exact-graph
    // twins (x_dedup_clusters / x_near_dedup_keep / x_pagerank /
    // x_triangles), only the edge source differs.
    "x_minhash_lsh" -> ("WITH " + lshCandCtes + """
      |SELECT doc_a, doc_b, est_jaccard FROM cand ORDER BY doc_a, doc_b""".stripMargin),
    "x_dedup_clusters_lsh" -> ("WITH RECURSIVE " + lshVerifiedCtes + """,
      |e AS (SELECT doc_a AS src, doc_b AS dst FROM vp
      |      UNION SELECT doc_b, doc_a FROM vp),
      |n AS (SELECT DISTINCT src AS node FROM e),
      |reach(node, r) AS (SELECT node, node FROM n
      |  UNION
      |  SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src)
      |SELECT node AS doc_id, min(r) AS cluster_id
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin),
    "x_near_dedup_keep_lsh" -> ("WITH RECURSIVE " + lshVerifiedCtes + """,
      |e AS (SELECT doc_a AS src, doc_b AS dst FROM vp
      |      UNION SELECT doc_b, doc_a FROM vp),
      |n AS (SELECT DISTINCT src AS node FROM e),
      |reach(node, r) AS (SELECT node, node FROM n
      |  UNION
      |  SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src),
      |cl AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
      |SELECT doc.source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN cl.cluster_id IS NULL OR cl.cluster_id = doc.doc_id
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM documents doc LEFT JOIN cl ON doc.doc_id = cl.doc_id
      |GROUP BY doc.source ORDER BY doc.source""".stripMargin),
    "x_pagerank_lsh" -> ("WITH " + lshCandCtes + """,
      |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
      |      UNION ALL SELECT doc_b, doc_a FROM cand),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
      |r1 AS (SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
      |       FROM e JOIN deg g USING (src) JOIN r0 r ON r.node = e.src GROUP BY e.dst),
      |r2 AS (SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
      |       FROM e JOIN deg g USING (src) JOIN r1 r ON r.node = e.src GROUP BY e.dst),
      |r3 AS (SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
      |       FROM e JOIN deg g USING (src) JOIN r2 r ON r.node = e.src GROUP BY e.dst),
      |r4 AS (SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
      |       FROM e JOIN deg g USING (src) JOIN r3 r ON r.node = e.src GROUP BY e.dst),
      |r5 AS (SELECT e.dst AS node,
      |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
      |       FROM e JOIN deg g USING (src) JOIN r4 r ON r.node = e.src GROUP BY e.dst)
      |SELECT node AS doc_id, rank AS rank_x1e6
      |FROM r5 ORDER BY rank_x1e6 DESC, doc_id""".stripMargin),
    "x_triangles_lsh" -> ("WITH " + lshCandCtes + """,
      |p AS (SELECT doc_a AS a, doc_b AS b FROM cand),
      |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p)
      |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
      |       (SELECT count(*) FROM p) AS n_edges,
      |       (SELECT count(*) FROM p x JOIN p y ON x.b = y.a
      |          JOIN p z ON z.a = x.a AND z.b = y.b) AS n_triangles""".stripMargin),
    // BPE train/apply replicated round-for-round in SQL (the argmax is
    // a LIMIT-1 scalar per unrolled round, the greedy merge is exact —
    // see bpeOracleCtes); TextPipelineSpec additionally pins both
    // against an in-process reference tokenizer.
    "x_bpe_train" -> bpeTrainOracle(10),
    "x_bpe_apply" -> bpeApplyOracle(10),
    "q0_flagship" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY nation""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
        |  floor(CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) / count(*) + 0.5) / 100.0 AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_filter_pred" ->
      """SELECT p_partkey, p_name, p_size, round(p_retailprice, 2) AS price
        |FROM part
        |WHERE (p_size BETWEEN 10 AND 30 AND p_name LIKE '%er%')
        |   OR (p_retailprice > 1500 AND NOT p_brand LIKE '%3%')
        |ORDER BY p_partkey""".stripMargin,
    "q_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, round(l_extendedprice, 2) AS price
        |FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""".stripMargin,
    "q_join_inner" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(nk_c, nk_s) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |  (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |ON nk_c = nk_s ORDER BY nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_theta" ->
      """SELECT n1.n_regionkey AS regionkey, count(*) AS n_pairs
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
        |GROUP BY 1 ORDER BY regionkey""".stripMargin,
    "q_join_range" ->
      """SELECT tier, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |JOIN (VALUES ('t1_low', 0.0, 50000.0), ('t2_mid', 50000.0, 150000.0),
        |             ('t3_high', 150000.0, 300000.0), ('t4_top', 300000.0, 1000000000.0))
        |  AS tiers(tier, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  floor(CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) / count(*) + 0.5) / 100.0 AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_skew_salted" ->
      """SELECT flag,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) * weight) AS BIGINT) / 100.0 AS weighted_qty,
        |  count(*) AS n
        |FROM lineitem
        |JOIN (VALUES ('A', 5), ('N', 10), ('R', 3)) AS d(flag, weight)
        |  ON l_returnflag = flag
        |GROUP BY flag ORDER BY flag""".stripMargin,
    "q_join_asof" ->
      """SELECT c.event_id, c.user_id,
        |  epoch_ms(c.ts) AS click_ms,
        |  p.event_id AS purch_event_id,
        |  round(p.value, 2) AS purch_value,
        |  epoch_ms(c.ts) - epoch_ms(p.ts) AS gap_ms
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_partitioned_scan" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_dpp" ->
      """SELECT year(o_orderdate) AS o_year, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN (VALUES (1995), (1996)) AS dim(y_year)
        |  ON year(o_orderdate) = y_year
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_skew_aqe" ->
      """SELECT flag,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) * weight) AS BIGINT) / 100.0 AS weighted_qty,
        |  count(*) AS n
        |FROM lineitem
        |JOIN (VALUES ('A', 5), ('N', 10), ('R', 3)) AS d(flag, weight)
        |  ON l_returnflag = flag
        |GROUP BY flag ORDER BY flag""".stripMargin,
    "q_join_bucketed" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_bloom" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x_ann_quantized" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |q8 AS (SELECT vec_id,
        |    list_transform(v, x -> CAST(floor(x * 127.0 /
        |      greatest(list_max(list_transform(v, y -> abs(y))), 0.000000000001)
        |      + 0.5) AS BIGINT)) AS q
        |  FROM v),
        |n8 AS (SELECT vec_id, q,
        |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qn2 FROM q8),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |    CAST(list_sum(list_transform(range(1, len(a.q) + 1), i -> a.q[i] * b.q[i])) AS BIGINT)
        |      / (sqrt(CAST(a.qn2 AS DOUBLE)) * sqrt(CAST(b.qn2 AS DOUBLE))) AS sim
        |  FROM n8 a JOIN n8 b ON a.vec_id % 100 = 0 AND a.vec_id <> b.vec_id),
        |r AS (SELECT query_id, cand_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
        |  FROM p)
        |SELECT query_id, cand_id, rnk, floor(sim * 10000 + 0.5) / 10000.0 AS q_sim
        |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_rollup" -> QueriesRel.rollupSql,
    "q_cube" -> QueriesRel.cubeSql,
    "q_grouping_sets" -> QueriesRel.groupingSetsSql,
    "q_grouping_flags" -> QueriesRel.groupingFlagsSql,
    "q_udaf_geomean" ->
      """SELECT o_orderstatus AS status, round(exp(avg(ln(o_totalprice))), 2) AS geo_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn, rk, drk, round(o_totalprice, 2) AS price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(coalesce(date_diff('day', prev_date, o_orderdate), -1) AS INTEGER) AS gap_days,
        |  next_key
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        lag(o_orderdate) OVER w AS prev_date,
        |        coalesce(lead(o_orderkey) OVER w, -1) AS next_key
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  floor(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100.0 AS moving_avg3
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_range" -> QueriesRel.windowRangeSql,
    "q_window_ntile" ->
      """SELECT o_custkey, o_orderkey, o_orderpriority, nt4,
        |  floor(pr * 1000000 + 0.5) / 1000000.0 AS pct_rank,
        |  floor(cd * 1000000 + 0.5) / 1000000.0 AS cume
        |FROM (SELECT o_custkey, o_orderkey, o_orderpriority,
        |        ntile(4) OVER w AS nt4,
        |        percent_rank() OVER w AS pr,
        |        cume_dist() OVER w AS cd
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_orderpriority
        |        ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey)) t
        |WHERE o_custkey % 200 = 0
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // moments in HUGEINT (the Spark side uses DECIMAL(38,0)) so the
    // closed forms stay exact past the BIGINT wrap point (~sf1 group
    // sizes); the doubles only appear in the final expressions, over
    // identical exact integers
    "q_agg_stats" ->
      """WITH a AS (SELECT l_returnflag,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc
        |  FROM lineitem),
        |m AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(qc) AS BIGINT) AS sum_qc,
        |    CAST(sum(qc * qc) AS HUGEINT) AS sum_qc2,
        |    CAST(sum(dc) AS BIGINT) AS sum_dc,
        |    CAST(sum(dc * dc) AS HUGEINT) AS sum_dc2,
        |    CAST(sum(qc * dc) AS HUGEINT) AS sum_qd
        |  FROM a GROUP BY l_returnflag)
        |SELECT l_returnflag, n, sum_qc,
        |  floor(sqrt(CAST(n * sum_qc2 - CAST(sum_qc AS HUGEINT) * sum_qc AS DOUBLE) / (n * (n - 1.0))) * 1000000 + 0.5) / 1000000.0 AS stddev_qty_cents,
        |  floor(sqrt(CAST(n * sum_dc2 - CAST(sum_dc AS HUGEINT) * sum_dc AS DOUBLE) / (n * (n - 1.0))) * 1000000 + 0.5) / 1000000.0 AS stddev_disc_cents,
        |  floor((CAST(n * sum_qd - CAST(sum_qc AS HUGEINT) * sum_dc AS DOUBLE) /
        |    (sqrt(CAST(n * sum_qc2 - CAST(sum_qc AS HUGEINT) * sum_qc AS DOUBLE)) *
        |     sqrt(CAST(n * sum_dc2 - CAST(sum_dc AS HUGEINT) * sum_dc AS DOUBLE)))) * 1000000 + 0.5) / 1000000.0 AS corr_qd
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_regr" ->
      """WITH a AS (SELECT l_returnflag,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(y * y) AS HUGEINT) AS syy,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM a GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  floor((CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |         CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS slope,
        |  floor(((sy - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |         CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) * sx) / n) * 1000000 + 0.5) / 1000000.0 AS intercept,
        |  floor((CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |         (CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) * CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_bitbool" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  bool_and(o_totalprice > 1000) AS all_over_1k,
        |  bool_or(o_totalprice > 400000) AS any_over_400k,
        |  bit_and(o_custkey) AS custkey_and,
        |  bit_or(o_custkey) AS custkey_or,
        |  bit_xor(o_custkey) AS custkey_xor
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_string_agg" ->
      """SELECT n_regionkey, count(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_gap_fill" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, event_type,
        |         count(*) AS c
        |       FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |        date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT CAST(epoch(spine.h) AS BIGINT) AS hour_epoch, types.event_type,
        |  COALESCE(hourly.c, 0) AS n_events
        |FROM spine CROSS JOIN types
        |LEFT JOIN hourly ON hourly.h = spine.h AND hourly.event_type = types.event_type
        |ORDER BY hour_epoch, types.event_type""".stripMargin,
    "q_window_ignore_nulls" ->
      """SELECT event_id, user_id,
        |  COALESCE(last_value(CASE WHEN event_id % 7 = 0 THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) AS filled
        |FROM events WHERE user_id % 50 = 0 ORDER BY event_id""".stripMargin,
    "q_merge_upsert" ->
      """WITH base AS (SELECT c_custkey AS k,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents FROM customer),
        |chg AS (SELECT CASE WHEN o_custkey % 10 = 7 THEN o_custkey + 1000000
        |               ELSE o_custkey END AS k,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS delta_cents
        |  FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1)
        |SELECT COALESCE(base.k, chg.k) AS k,
        |  COALESCE(bal_cents, 0) + COALESCE(delta_cents, 0) AS new_bal_cents,
        |  CASE WHEN bal_cents IS NULL THEN 'insert'
        |       WHEN delta_cents IS NULL THEN 'keep' ELSE 'update' END AS action
        |FROM base FULL JOIN chg ON base.k = chg.k
        |ORDER BY k""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 30000), 19) AS INTEGER) AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_try_funcs" ->
      """SELECT o_orderkey,
        |  COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER), -1) AS prio_num,
        |  COALESCE(TRY_CAST(o_orderpriority AS INTEGER), -1) AS full_cast,
        |  COALESCE(floor((o_totalprice / NULLIF(o_custkey % 5, 0)) * 100 + 0.5) / 100.0,
        |    -1.0) AS ratio
        |FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey""".stripMargin,
    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS price_cents
        |  FROM orders WHERE year(o_orderdate) <= 1996
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |    AS price_cents, o_orderpriority
        |  FROM orders WHERE year(o_orderdate) >= 1997)
        |SELECT COALESCE(o_orderpriority, '<legacy>') AS prio,
        |  count(*) AS n, CAST(sum(price_cents) AS BIGINT) AS total_cents
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_typed_cogroup" ->
      """SELECT o.o_orderkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS order_cents,
        |  count(l.l_orderkey) AS n_items,
        |  CAST(COALESCE(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)), 0)
        |    AS BIGINT) AS items_cents
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey % 10 = 0
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_percent_of_total" ->
      """WITH rev AS (SELECT l_returnflag,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS HUGEINT)
        |      AS rev_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(rev_cents AS BIGINT) AS rev_cents,
        |  CAST((rev_cents * 1000000) // (sum(rev_cents) OVER ()) AS BIGINT)
        |    AS share_ppm
        |FROM rev ORDER BY l_returnflag""".stripMargin,
    "q_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_ms(ts) AS ms
        |            FROM events WHERE user_id % 20 = 0),
        |f AS (SELECT user_id, event_id, ms, lag(ms) OVER w AS prev_ms
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |g AS (SELECT user_id, event_id, ms,
        |        CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |        THEN 1 ELSE 0 END AS brk
        |      FROM f),
        |h AS (SELECT user_id, ms,
        |        CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS session_seq
        |      FROM g)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ms) AS start_ms, max(ms) AS end_ms
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_dup_ngram_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(words) - 6),
        |          i -> ('0x' || substr(md5(array_to_string(words[i : i+7], ' ')), 1, 15))::BIGINT)) AS gh
        |      FROM w WHERE len(words) >= 8),
        |c AS (SELECT gh, count(*) AS n FROM g GROUP BY gh)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
        |  CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) > 0 AS has_dup_span
        |FROM g JOIN c ON g.gh = c.gh
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q_explode_outer" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x[1:1] = 'q') AS toks
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT w.doc_id, COALESCE(u.tok, '<none>') AS token
        |FROM w LEFT JOIN LATERAL (SELECT unnest(toks) AS tok) u ON TRUE
        |ORDER BY doc_id, token""".stripMargin,
    "q_window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  coalesce(nth_value(o_orderkey, 2) OVER w, -1) AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_subquery_corr" -> QueriesRel.subqueryCorrSql,
    "q_join_lateral" -> QueriesRel.lateralSql,
    "q_topk_per_key" ->
      """SELECT o_custkey, CAST(rnk AS INTEGER) AS rnk, o_orderkey, price_cents
        |FROM (SELECT o_custkey, o_orderkey,
        |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC, o_orderkey) AS rnk
        |      FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "x_collocations" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |uni AS (SELECT w, count(*) AS c_w FROM tok GROUP BY w),
        |bgs AS (SELECT unnest(list_transform(range(len(toks) - 1),
        |          i -> array_to_string(toks[i+1:i+2], ' '))) AS bg
        |        FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
        |bi AS (SELECT bg, count(*) AS c_ab FROM bgs GROUP BY bg),
        |nu AS (SELECT CAST(sum(c_w) AS BIGINT) AS n_uni FROM uni),
        |nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM bi),
        |j AS (SELECT bi.bg, bi.c_ab, a.c_w AS c_a, b.c_w AS c_b, nu.n_uni, nb.n_bi
        |      FROM bi
        |      JOIN uni a ON a.w = string_split(bi.bg, ' ')[1]
        |      JOIN uni b ON b.w = string_split(bi.bg, ' ')[2]
        |      CROSS JOIN nu CROSS JOIN nb
        |      WHERE bi.c_ab >= 30)
        |SELECT bg, c_ab, c_a, c_b,
        |  floor(ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni) /
        |    (CAST(n_bi AS DOUBLE) * c_a * c_b)) * 1000000 + 0.5) / 1000000.0 AS pmi
        |FROM j ORDER BY c_ab DESC, bg LIMIT 40""".stripMargin,
    "x_pii_redact" ->
      """WITH d AS (SELECT doc_id,
        |    concat(text, ' contact: user', CAST(doc_id AS VARCHAR),
        |           '@example.com ph ', CAST(doc_id * 7 AS VARCHAR)) AS raw
        |  FROM documents WHERE doc_id % 25 = 0),
        |r AS (SELECT doc_id, raw,
        |    regexp_replace(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |      ' [0-9]+', ' <NUM>', 'g') AS red
        |  FROM d)
        |SELECT doc_id, md5(red) AS redacted_md5,
        |  CAST(length(raw) AS INTEGER) AS n_chars_raw,
        |  CAST(length(red) AS INTEGER) AS n_chars_redacted
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_agg_filter" -> QueriesRel.aggFilterSql,
    "q_cond_funcs" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid' ELSE 'big' END AS size_class,
        |  coalesce(nullif(p_brand, 'Brand#33'), 'REDACTED') AS brand_masked,
        |  least(p_size, 25) AS size_cap,
        |  greatest(p_size, 5) AS size_floor,
        |  CASE WHEN p_retailprice > 1500 THEN 'Y' ELSE 'N' END AS pricey
        |FROM part WHERE p_partkey % 7 = 0 ORDER BY p_partkey""".stripMargin,
    "q_union_all" ->
      """SELECT src, nationkey, count(*) AS n FROM (
        |  SELECT 'cust' AS src, CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        |  UNION ALL
        |  SELECT 'supp' AS src, CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier) u
        |GROUP BY src, nationkey ORDER BY src, nationkey""".stripMargin,
    "q_intersect" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_except" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        |EXCEPT
        |SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier) t
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q_except_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier) t
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_cents_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS qty_cents_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (SELECT CAST(c_nationkey AS INTEGER) AS nationkey, count(*) AS n_cust,
        |             CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
        |           FROM customer GROUP BY 1)
        |SELECT nationkey, 'n_cust' AS metric, n_cust AS value FROM w
        |UNION ALL
        |SELECT nationkey, 'bal_cents' AS metric, bal_cents AS value FROM w
        |ORDER BY nationkey, metric""".stripMargin,
    "q_subquery" -> QueriesRel.subquerySql,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.50) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 1, 9) AS prefix,
        |  CAST(length(c_name) AS INTEGER) AS name_len,
        |  concat(c_mktsegment, '-', c_name) AS tagged,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  trim(c_name, 'C') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_hex_funcs" ->
      """SELECT c_custkey, md5(c_name) AS name_md5, sha256(c_name) AS name_sha256,
        |  hex(c_custkey) AS key_hex, reverse(c_name) AS rev_name,
        |  CAST(octet_length(unhex(md5(c_name))) AS INTEGER) AS md5_bytes
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', DATE '2024-01-01', o_orderdate) AS INTEGER) AS days_since,
        |  epoch_ms(o_orderdate) AS epoch_ms
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice * l_discount * 100 + 0.5) / 100.0 AS disc_amt,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  abs(l_quantity - 25.0) AS dev,
        |  l_orderkey % 7 AS mod7,
        |  l_orderkey // 4 AS key_shr2,
        |  (l_orderkey % 2) <> 0 AS key_odd
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        |  floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS first_elem,
        |  floor(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS self_dot,
        |  floor(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000 + 0.5) / 1000000.0 AS l2norm,
        |  floor(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) * 1000000 + 0.5) / 1000000.0 AS elem_sum
        |FROM embeddings WHERE vec_id % 10 = 0 ORDER BY vec_id""".stripMargin,
    "q_explode" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 40""".stripMargin,
    // q_corrupt_csv / q_schema_evolution live in [[fixtureOracle]]:
    // their SQL embeds a corpus-tag-keyed staged path (r10)
    "q_zorder" ->
      """WITH k AS (SELECT l_orderkey, l_linenumber,
        |    l_partkey % 1024 AS px, l_suppkey % 1024 AS sy
        |  FROM lineitem WHERE l_orderkey % 50 = 0)
        |SELECT l_orderkey, l_linenumber, px, sy,
        |  CAST(list_sum(list_transform(range(10),
        |    i -> (((px >> i) & 1) << (2 * i)) + (((sy >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
        |FROM k ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // values are layout-independent: the oracle runs the same predicate
    // over the plain table the Z-ordered copy was written from
    "q_zorder_lookup" ->
      """SELECT l_suppkey, count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM lineitem WHERE l_suppkey >= 5 AND l_suppkey < 8
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_csv_json_scan" ->
      """SELECT CAST(n_nationkey AS INTEGER) AS nationkey, n_name,
        |  CAST(n_regionkey AS INTEGER) AS regionkey
        |FROM nation ORDER BY nationkey""".stripMargin,
    "q_orc_scan" ->
      """SELECT CAST(s_nationkey AS INTEGER) AS nationkey, count(*) AS n,
        |  CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM supplier WHERE s_nationkey < 10
        |GROUP BY 1 ORDER BY nationkey""".stripMargin,
    "q_xml_scan" ->
      """SELECT doc_id, lang, source, md5(trim(text)) AS text_md5
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin,
    "q_join_range_binned" ->
      """WITH bands AS (SELECT i AS band, CAST(i * 500 AS DOUBLE) AS lo,
        |                      CAST(i * 500 + 1500 AS DOUBLE) AS hi
        |               FROM range(1200) t(i))
        |SELECT CAST(band % 100 AS BIGINT) AS band_bucket, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_generator_udtf" ->
      """WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |sh AS (SELECT unnest(list_transform(range(len(toks) - 2),
        |         i -> array_to_string(toks[i+1:i+3], ' '))) AS shingle FROM d)
        |SELECT shingle, count(*) AS n FROM sh
        |GROUP BY shingle ORDER BY n DESC, shingle LIMIT 30""".stripMargin,
    "q_jdbc_scan" ->
      """SELECT CAST(s_nationkey AS INTEGER) AS nationkey, count(*) AS n,
        |  CAST(sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM supplier WHERE s_nationkey < 15
        |GROUP BY 1 ORDER BY nationkey""".stripMargin,
    "q_binaryfile_scan" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS length,
        |  md5(text) AS content_md5
        |FROM documents WHERE doc_id % 40 = 0 ORDER BY doc_id""".stripMargin,
    "x_embed_centroid" ->
      """SELECT label, pos, count(*) AS n,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
        |    // count(*) AS BIGINT) AS centroid_micro
        |FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |        unnest(embedding) AS v
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ms END) AS t1
        |       FROM ev GROUP BY user_id
        |       HAVING min(CASE WHEN event_type = 'view' THEN ms END) IS NOT NULL),
        |s2 AS (SELECT ev.user_id, t1,
        |         min(CASE WHEN event_type = 'click' AND ms > t1 THEN ms END) AS t2
        |       FROM ev JOIN s1 USING (user_id) GROUP BY ev.user_id, t1),
        |s3 AS (SELECT ev.user_id, t1, t2,
        |         min(CASE WHEN event_type = 'purchase' AND ms > t2 THEN ms END) AS t3
        |       FROM ev JOIN s2 USING (user_id) GROUP BY ev.user_id, t1, t2)
        |SELECT count(*) AS n_view, count(t2) AS n_view_click,
        |  count(t3) AS n_full_funnel,
        |  CAST(sum(CASE WHEN t3 IS NOT NULL THEN t3 - t1 END) AS BIGINT) AS sum_funnel_ms
        |FROM s3""".stripMargin,
    "q_cohort_retention" ->
      """WITH ev AS (SELECT user_id, (epoch_ms(ts) // 86400000) // 7 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  count(DISTINCT ev.user_id) AS n_active_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s_state_reader" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |  floor(avg(CAST(props->>'$.k' AS BIGINT)) * 100 + 0.5) / 100.0 AS avg_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_map_funcs" ->
      """SELECT user_id,
        |  count(DISTINCT event_type) AS n_types,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_sorted
        |FROM events WHERE user_id % 50 = 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "s_tumbling" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_start_ms, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start_ms, event_type""".stripMargin,
    // S17 reads the SAME rows through the custom log source's
    // offset-ranged micro-batches — identical aggregate, so it shares
    // s_tumbling's oracle verbatim (a hash match proves no row is lost
    // or duplicated across the source's batch boundaries)
    "s_eventlog_tumbling" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_start_ms, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start_ms, event_type""".stripMargin,
    // the filtered S17 twin: same aggregate restricted by the WHERE the
    // stream both applies and pushes down as its skip hint
    "s_eventlog_filtered" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_start_ms, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1, 2 ORDER BY hour_start_ms, event_type""".stripMargin,
    "s_chained_windows" ->
      """WITH b AS (SELECT event_type, (epoch_ms(ts) // 600000) * 600000 AS w10_ms,
        |    count(*) AS n10 FROM events GROUP BY 1, 2)
        |SELECT (w10_ms // 3600000) * 3600000 AS hour_start_ms, event_type,
        |  CAST(sum(n10) AS BIGINT) AS n, count(*) AS n_subwindows
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "s_sliding" ->
      """WITH b AS (SELECT (epoch_ms(ts) // 1800000) * 1800000 AS bucket_ms, event_type
        |           FROM events),
        |w AS (SELECT bucket_ms AS win_start_ms, event_type FROM b
        |      UNION ALL
        |      SELECT bucket_ms - 1800000 AS win_start_ms, event_type FROM b)
        |SELECT win_start_ms, event_type, count(*) AS n
        |FROM w GROUP BY win_start_ms, event_type
        |ORDER BY win_start_ms, event_type""".stripMargin,
    "s_session" ->
      """WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id % 10 = 0),
        |m AS (SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts, value,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM m)
        |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM g GROUP BY user_id, grp ORDER BY user_id, session_start_ms""".stripMargin,
    "s_dedup_latest" ->
      """SELECT user_id, event_type, event_id AS latest_event_id, epoch_ms(ts) AS ts_ms
        |FROM (SELECT user_id, event_type, event_id, ts,
        |        row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "s_upsert" ->
      """SELECT user_id, event_type, event_id AS latest_event_id, epoch_ms(ts) AS ts_ms
        |FROM (SELECT user_id, event_type, event_id, ts,
        |        row_number() OVER (PARTITION BY user_id, event_type
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "s_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purch_id, c.user_id,
        |  epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purch_ms,
        |  round(p.value, 2) AS purch_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purch_id""".stripMargin,
    "q_interpolate" ->
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS h, event_type,
        |         count(*) AS c
        |       FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |        date_trunc('hour', max(ts)) AS hi FROM events),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
        |types AS (SELECT DISTINCT event_type FROM events),
        |g AS (SELECT CAST(epoch(spine.h) AS BIGINT) AS hour_epoch,
        |        types.event_type, hourly.c
        |      FROM spine CROSS JOIN types
        |      LEFT JOIN hourly ON hourly.h = spine.h
        |        AND hourly.event_type = types.event_type),
        |w AS (SELECT hour_epoch, event_type, c,
        |    last_value(c IGNORE NULLS) OVER wb AS prev_c,
        |    last_value(CASE WHEN c IS NOT NULL THEN hour_epoch END IGNORE NULLS)
        |      OVER wb AS prev_h,
        |    first_value(c IGNORE NULLS) OVER wf AS next_c,
        |    first_value(CASE WHEN c IS NOT NULL THEN hour_epoch END IGNORE NULLS)
        |      OVER wf AS next_h
        |  FROM g WINDOW
        |    wb AS (PARTITION BY event_type ORDER BY hour_epoch
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY event_type ORDER BY hour_epoch
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT hour_epoch, event_type,
        |  CASE WHEN c IS NOT NULL THEN CAST(c AS DOUBLE)
        |       WHEN prev_c IS NULL THEN CAST(next_c AS DOUBLE)
        |       WHEN next_c IS NULL THEN CAST(prev_c AS DOUBLE)
        |       ELSE CAST(prev_c AS DOUBLE)
        |         + (CAST(next_c AS DOUBLE) - CAST(prev_c AS DOUBLE))
        |           * (CAST(hour_epoch AS DOUBLE) - CAST(prev_h AS DOUBLE))
        |           / (CAST(next_h AS DOUBLE) - CAST(prev_h AS DOUBLE))
        |  END AS v_interp,
        |  (c IS NULL) AS was_gap
        |FROM w ORDER BY event_type, hour_epoch""".stripMargin,
    "q_window_distinct" ->
      """WITH ev AS (SELECT event_type, user_id, event_id, epoch_ms(ts) AS ms
        |            FROM events),
        |f AS (SELECT event_type, event_id, ms,
        |    CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
        |                                 ORDER BY ms, event_id) = 1
        |         THEN 1 ELSE 0 END AS is_first
        |  FROM ev),
        |r AS (SELECT event_type, event_id, ms,
        |    CAST(sum(is_first) OVER (PARTITION BY event_type
        |                             ORDER BY ms, event_id) AS BIGINT)
        |      AS distinct_users_so_far
        |  FROM f)
        |SELECT event_type, event_id, ms, distinct_users_so_far
        |FROM r WHERE event_id % 100 = 0
        |ORDER BY event_type, event_id""".stripMargin,
    "q_null_semantics" ->
      """WITH o AS (SELECT o_orderstatus,
        |    nullif(o_orderpriority, '3-MEDIUM') AS prio_n FROM orders)
        |SELECT o_orderstatus,
        |  count(*) AS n_rows,
        |  count(prio_n) AS n_nonmedium,
        |  count(*) FILTER (WHERE prio_n IS NULL) AS n_medium,
        |  count(*) FILTER (WHERE prio_n = '1-URGENT') AS n_eq_urgent,
        |  count(*) FILTER (WHERE prio_n IS NOT DISTINCT FROM '1-URGENT')
        |    AS n_nullsafe_urgent,
        |  count(*) FILTER (WHERE NOT (prio_n IS NOT DISTINCT FROM '1-URGENT'))
        |    AS n_nullsafe_not_urgent,
        |  min(coalesce(prio_n, '<none>')) AS min_prio_filled
        |FROM o GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "s_join_left" ->
      """SELECT c.event_id AS click_id, c.user_id,
        |  epoch_ms(c.ts) AS click_ms, p.event_id AS purch_id,
        |  epoch_ms(p.ts) AS purch_ms, round(p.value, 2) AS purch_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purch_id""".stripMargin,
    "x_quality_classify" ->
      """WITH f AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> len(x) <= 2)) AS BIGINT) AS n_short,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> regexp_matches(x, '[0-9]'))) AS BIGINT) AS n_digit,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> list_contains(['the','a','an','of','to','and','in','is','on','for'],
        |        x))) AS BIGINT) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_tok, n_short, n_digit, n_stop,
        |  2*n_tok + 1500*n_stop - 300*n_short - 800*n_digit AS score_x1000,
        |  (2*n_tok + 1500*n_stop - 300*n_short - 800*n_digit) > 5000 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    "x_exact_dedup" ->
      """SELECT md5(text) AS text_md5, count(*) AS n_copies, min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY text_md5""".stripMargin,
    "x_dedup_stats" ->
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique_texts,
        |  count(*) - count(DISTINCT md5(text)) AS n_dups
        |FROM documents""".stripMargin,
    "x_minhash_sig" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id % 50 = 0),
        |sh AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 2),
        |         i -> array_to_string(toks[i+1:i+3], ' '))) AS sh FROM d),
        |h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h64 FROM sh),
        |p AS (SELECT CAST(i AS INTEGER) AS perm_id,
        |        (1103515245 * (CAST(i AS BIGINT) + 1)) % 2147483647 AS a,
        |        (12345 * (CAST(i AS BIGINT) + 7)) % 2147483647 AS b
        |      FROM range(16) t(i))
        |SELECT doc_id, perm_id, min((a * (h64 % 2147483647) + b) % 2147483647) AS sig
        |FROM h, p GROUP BY doc_id, perm_id ORDER BY doc_id, perm_id""".stripMargin,
    "x_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, source,
        |  list_distinct(list_transform(range(len(string_split(text, ' ')) - 2),
        |    i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))) AS sh
        |  FROM documents WHERE doc_id % 10 = 0 AND doc_id < ${QueriesLLM.NgramSampleCap}),
        |pairs AS (SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS n_common,
        |    len(list_distinct(list_concat(a.sh, b.sh))) AS n_union
        |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT source, doc_a, doc_b,
        |  floor(CAST(n_common AS DOUBLE) / n_union * 10000 + 0.5) / 10000.0 AS jaccard
        |FROM pairs
        |WHERE n_common > 0 AND floor(CAST(n_common AS DOUBLE) / n_union * 10000 + 0.5) / 10000.0 >= 0.05
        |ORDER BY doc_a, doc_b""".stripMargin,
    "x_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents WHERE doc_id % 25 = 0),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h64 FROM tok),
        |bits AS (SELECT doc_id, CAST(b AS INTEGER) AS bit_pos,
        |    CAST(sum(((h64 >> CAST(b AS INTEGER)) % 2) * 2 - 1) AS BIGINT) AS balance
        |  FROM h, range(48) t(b) GROUP BY doc_id, b)
        |SELECT doc_id,
        |  string_agg(CASE WHEN balance > 0 THEN '1' ELSE '0' END, '' ORDER BY bit_pos) AS simhash_bits
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the FULL banded near-dup pipeline replicated relationally: same
    // portable md5-derived per-token hash as x_simhash (and as the
    // simhash60 kernel — all 60 bits the hash carries since r10),
    // 4x15-bit band keys via shift/mask, candidate pairs sharing any
    // band, exact hamming via bit_count(xor) <= 6 — band membership,
    // not just fingerprints, is cross-checked.
    "x_simhash_near_dup" ->
      s"""$simhashBandCteSql
        |SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin,
    // arrival-order dedup over the SAME band/hamming pair set: a doc is
    // dropped iff any earlier-id doc matches — GROUP BY the later side
    "s_dedup_simhash" ->
      s"""$simhashBandCteSql
        |SELECT doc_b AS doc_id, CAST(count(*) AS BIGINT) AS n_earlier,
        |  min(doc_a) AS first_dup_of
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 6
        |GROUP BY doc_b ORDER BY doc_id""".stripMargin,
    // the retention-windowed twin: same pair set, one arrival-distance
    // predicate — the two contracts share every CTE (and interpolate
    // the engine's own window constant) so they cannot drift
    "s_dedup_simhash_window" ->
      s"""$simhashBandCteSql
        |SELECT doc_b AS doc_id, CAST(count(*) AS BIGINT) AS n_earlier,
        |  min(doc_a) AS first_dup_of
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 6
        |  AND doc_a >= doc_b - ${QueriesLLM.SimhashWindow}
        |GROUP BY doc_b ORDER BY doc_id""".stripMargin,
    // the event-time streaming twin answers the SAME arrival contract
    // (that is the claim under test: out-of-order delivery must not
    // change verdicts), so it shares s_dedup_simhash's oracle verbatim
    "s_dedup_simhash_eventtime" ->
      s"""$simhashBandCteSql
        |SELECT doc_b AS doc_id, CAST(count(*) AS BIGINT) AS n_earlier,
        |  min(doc_a) AS first_dup_of
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 6
        |GROUP BY doc_b ORDER BY doc_id""".stripMargin,
    // the windowed event-time twin answers the RETENTION contract
    // (s_dedup_simhash_window's CTE) despite out-of-order delivery
    "s_dedup_simhash_eventtime_window" ->
      s"""$simhashBandCteSql
        |SELECT doc_b AS doc_id, CAST(count(*) AS BIGINT) AS n_earlier,
        |  min(doc_a) AS first_dup_of
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 6
        |  AND doc_a >= doc_b - ${QueriesLLM.SimhashWindow}
        |GROUP BY doc_b ORDER BY doc_id""".stripMargin,
    "x_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id % 100 = 0),
        |c AS (SELECT vec_id AS cand_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv FROM embeddings),
        |sims AS (SELECT query_id, cand_id,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) /
        |    (sqrt(list_sum(list_transform(qv, x -> x * x))) *
        |     sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
        |  FROM q, c WHERE query_id <> cand_id),
        |ranked AS (SELECT query_id, cand_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
        |  FROM sims)
        |SELECT query_id, cand_id, rnk, floor(sim * 10000 + 0.5) / 10000.0 AS cos_sim
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin,
    // the annLsh defaults (tables=4, bitsPerTable=6) — r7 promotion
    "x_ann_lsh" -> annLshOracleSql(4, 6),
    // the persisted round-trip (build → write → load → search) must be
    // invisible in the answer: same oracle, checked independently (r10)
    "x_ann_lsh_persisted" -> annLshOracleSql(4, 6),
    // the X5 scale twin (r11): same bucket map as the ANN oracles,
    // co-bucket candidates, exact verify, x_embed_dedup's aggregation
    "x_embed_dedup_lsh" -> embedDedupLshOracleSql(4, 6),
    "x_embed_dedup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings
        |           WHERE vec_id % 5 = 0 AND vec_id < ${QueriesLLM.EmbedSampleCap}),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |        list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) /
        |        (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
        |         sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS c
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT vec_b AS dup_id, min(vec_a) AS canonical_id,
        |  max(floor(c * 10000 + 0.5) / 10000.0) AS max_sim,
        |  count(*) AS n_near
        |FROM p WHERE c >= 0.3
        |GROUP BY vec_b ORDER BY dup_id""".stripMargin,
    "x_lang_id" ->
      """WITH r AS (SELECT lang,
        |    len(list_filter(string_split(text, ' '), tk -> tk = 'the')) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS r_the,
        |    len(list_filter(string_split(text, ' '), tk -> tk = 'a')) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS r_a,
        |    len(list_filter(string_split(text, ' '), tk -> tk = 'data')) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS r_data,
        |    len(list_filter(string_split(text, ' '), tk -> tk = 'query')) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS r_query,
        |    len(list_filter(string_split(text, ' '), tk -> tk = 'table')) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS r_table,
        |    len(list_filter(string_split(text, ' '), tk -> tk = 'row')) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS r_row
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN r_the + r_a > 0.08 THEN 'en'
        |       WHEN r_data + r_query > 0.10 THEN 'es'
        |       WHEN r_table + r_row > 0.10 THEN 'de'
        |       ELSE 'other' END AS predicted,
        |  count(*) AS n
        |FROM r GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    "x_quality" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_actual,
        |  floor((least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
        |    + (1.0 - len(list_filter(string_split(text, ' '),
        |        tk -> tk = 'the' OR tk = 'a' OR tk = 'of' OR tk = 'and'))
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3
        |    + least(((length(text) - (len(string_split(text, ' ')) - 1))
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0) * 0.3) * 10000 + 0.5) / 10000.0 AS quality
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin,
    "x_token_count" ->
      """SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT) AS re_tokens,
        |  count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "x_fingerprint" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id % 20 = 0),
        |sh AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 4),
        |         i -> array_to_string(toks[i+1:i+5], ' '))) AS sh FROM d),
        |h AS (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h64 FROM sh)
        |SELECT doc_id, min(h64) AS fp_min, max(h64) AS fp_max,
        |  count(DISTINCT h64) AS n_shingles
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT tf.doc_id, tf.token,
        |    floor(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) * 1000000 + 0.5) / 1000000.0 AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN n
        |  WHERE tf.doc_id % 25 = 0),
        |ranked AS (SELECT doc_id, token, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
        |  FROM scored)
        |SELECT doc_id, token, rnk, tfidf FROM ranked
        |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    "x_dedup_clusters" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
        |    list_distinct(list_transform(range(len(string_split(text, ' ')) - 2),
        |      i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))) AS sh
        |  FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |      FROM d a JOIN d b ON a.doc_id < b.doc_id
        |      WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
        |            len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |reach(node, r) AS (SELECT node, node FROM n
        |  UNION
        |  SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src)
        |SELECT node AS doc_id, min(r) AS cluster_id
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // keep-list over the SAME exact Jaccard >= 0.2 component map as
    // x_dedup_clusters: keep each cluster's min-doc_id canonical plus
    // every unclustered doc, report per-source retention.
    "x_near_dedup_keep" ->
      """WITH RECURSIVE d AS (SELECT doc_id,
        |    list_distinct(list_transform(range(len(string_split(text, ' ')) - 2),
        |      i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))) AS sh
        |  FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |      FROM d a JOIN d b ON a.doc_id < b.doc_id
        |      WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
        |            len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |reach(node, r) AS (SELECT node, node FROM n
        |  UNION
        |  SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src),
        |cl AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node)
        |SELECT doc.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN cl.cluster_id IS NULL OR cl.cluster_id = doc.doc_id
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents doc LEFT JOIN cl ON doc.doc_id = cl.doc_id
        |GROUP BY doc.source ORDER BY doc.source""".stripMargin,
    // the prefix-filtered set-similarity join must produce EXACTLY the
    // all-pairs Jaccard >= 0.2 pair set (the AllPairs/PPJoin prefix
    // bound is exact, not approximate) — the oracle is the plain
    // all-pairs formulation.
    "x_jaccard_pairs_prefix" ->
      """WITH d AS (SELECT doc_id,
        |    list_distinct(list_transform(range(len(string_split(text, ' ')) - 2),
        |      i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))) AS sh
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
        |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // 5 fixed integer-ppm PageRank iterations as chained CTEs over the
    // SAME exact Jaccard >= 0.2 pair graph as x_dedup_clusters; all
    // arithmetic is integer floor-div, so aggregation order can't move
    // a single ulp on either engine.
    "x_pagerank" ->
      """WITH d AS (SELECT doc_id,
        |    list_distinct(list_transform(range(len(string_split(text, ' ')) - 2),
        |      i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))) AS sh
        |  FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |      FROM d a JOIN d b ON a.doc_id < b.doc_id
        |      WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
        |            len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
        |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
        |      UNION ALL SELECT doc_b, doc_a FROM p),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        |r1 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN deg g USING (src) JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN deg g USING (src) JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN deg g USING (src) JOIN r2 r ON r.node = e.src GROUP BY e.dst),
        |r4 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN deg g USING (src) JOIN r3 r ON r.node = e.src GROUP BY e.dst),
        |r5 AS (SELECT e.dst AS node,
        |         CAST(150000 + (850 * sum(r.rank // g.deg)) // 1000 AS BIGINT) AS rank
        |       FROM e JOIN deg g USING (src) JOIN r4 r ON r.node = e.src GROUP BY e.dst)
        |SELECT node AS doc_id, rank AS rank_x1e6
        |FROM r5 ORDER BY rank_x1e6 DESC, doc_id""".stripMargin,
    // plain canonical (a<b) three-way self-join over the same exact
    // pair graph: hash equality against the Spark side proves the
    // degree-ordered orientation rewrite counts identically.
    "x_triangles" ->
      """WITH d AS (SELECT doc_id,
        |    list_distinct(list_transform(range(len(string_split(text, ' ')) - 2),
        |      i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))) AS sh
        |  FROM documents),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b
        |      FROM d a JOIN d b ON a.doc_id < b.doc_id
        |      WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0 /
        |            len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2),
        |nodes AS (SELECT a AS n FROM p UNION SELECT b FROM p)
        |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
        |       (SELECT count(*) FROM p) AS n_edges,
        |       (SELECT count(*) FROM p x JOIN p y ON x.b = y.a
        |          JOIN p z ON z.a = x.a AND z.b = y.b) AS n_triangles""".stripMargin,
    "x_lm_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tok),
        |uni AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        |sc AS (SELECT t.doc_id,
        |         CAST(floor(ln(uni.tf / tot.n_total) * 1000000) AS BIGINT) AS lp
        |       FROM tok t JOIN uni USING (token) CROSS JOIN tot
        |       WHERE t.doc_id % 20 = 0)
        |SELECT doc_id, count(*) AS n_tokens,
        |  floor((CAST(sum(lp) AS DOUBLE) / -1000000.0 / count(*)) * 1000000 + 0.5) / 1000000.0 AS nll_per_token
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_lm_bigram" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |             FROM documents),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tok),
        |uni AS (SELECT token, count(*) AS c_w FROM tok GROUP BY token),
        |d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(len(toks) - 1),
        |         i -> array_to_string(toks[i+1:i+2], ' '))) AS bg_s FROM d),
        |cb AS (SELECT bg_s, count(*) AS c_ab FROM bg GROUP BY bg_s),
        |sc AS (SELECT b.doc_id,
        |         CAST(floor(ln(0.7 * cb.c_ab / u1.c_w
        |           + 0.3 * u2.c_w / tot.n_total) * 1000000) AS BIGINT) AS lp
        |       FROM bg b
        |       JOIN cb ON b.bg_s = cb.bg_s
        |       JOIN uni u1 ON u1.token = string_split(b.bg_s, ' ')[1]
        |       JOIN uni u2 ON u2.token = string_split(b.bg_s, ' ')[2]
        |       CROSS JOIN tot
        |       WHERE b.doc_id % 20 = 0)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  floor((CAST(sum(lp) AS DOUBLE) / -1000000.0 / count(*)) * 1000000 + 0.5) / 1000000.0 AS nll_per_bigram
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_decontaminate" ->
      s"""WITH d AS (SELECT doc_id, source,
        |    list_distinct(list_transform(range(len(string_split(text, ' ')) - 2),
        |      i -> array_to_string((string_split(text, ' '))[i+1:i+3], ' '))) AS sh
        |  FROM documents),
        |ev AS (SELECT sh AS sh_e FROM d
        |       WHERE source IN ('src0','src1','src2','src3')
        |         AND doc_id < ${QueriesLLM.DecontEvalCap}),
        |tr AS (SELECT doc_id, sh FROM d
        |       WHERE source NOT IN ('src0','src1','src2','src3')
        |         AND doc_id % 10 = 0 AND len(sh) > 0),
        |c AS (SELECT tr.doc_id,
        |        max(len(list_filter(tr.sh, x -> list_contains(sh_e, x))) * 1.0 /
        |            len(tr.sh)) AS maxc
        |      FROM tr CROSS JOIN ev GROUP BY tr.doc_id)
        |SELECT doc_id,
        |  floor(maxc * 10000 + 0.5) / 10000.0 AS max_containment,
        |  floor(maxc * 10000 + 0.5) / 10000.0 >= 0.2 AS contaminated
        |FROM c ORDER BY doc_id""".stripMargin,
    "x_curation_pipeline" ->
      """WITH canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |kept AS (SELECT d.source, d.doc_id, len(string_split(d.text, ' ')) AS n_tokens
        |         FROM documents d JOIN canon ON d.doc_id = canon.doc_id
        |         WHERE d.lang = 'en' AND len(string_split(d.text, ' ')) >= 30)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS first_doc
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    "x_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |b AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(words)),
        |          i -> words[i] || ' ' || words[i+1])) AS bigram
        |      FROM w WHERE len(words) >= 2),
        |c AS (SELECT doc_id, bigram, count(*) AS c FROM b GROUP BY 1, 2),
        |tb AS (SELECT doc_id, max(c) AS top_bigram_n,
        |         CAST(sum(c) AS BIGINT) AS n_bigrams
        |       FROM c GROUP BY doc_id)
        |SELECT w.doc_id, len(words) AS n_words,
        |  len(list_distinct(words)) AS n_distinct_words,
        |  tb.top_bigram_n, tb.n_bigrams,
        |  tb.top_bigram_n * 5 >= tb.n_bigrams AS repetitive
        |FROM w JOIN tb ON w.doc_id = tb.doc_id ORDER BY w.doc_id""".stripMargin,
    "x_domain_mix" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |       FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |          count(*) AS n_sources FROM per)
        |SELECT source, n_docs, n_tokens,
        |  CAST((total_tokens * 1000000) // (n_sources * n_tokens) AS BIGINT)
        |    AS uniform_weight_ppm
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,
    "x_mix_temperature" ->
      """WITH per AS (SELECT source,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |       FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM per),
        |sc AS (SELECT source, n_tokens,
        |         CAST(floor(sqrt(CAST((n_tokens * 1000000) // total_tokens
        |           AS DOUBLE)) * 1000000) AS BIGINT) AS s_micro
        |       FROM per CROSS JOIN tot),
        |nm AS (SELECT CAST(sum(s_micro) AS BIGINT) AS s_total FROM sc)
        |SELECT source, n_tokens,
        |  CAST((s_micro * 1000000) // s_total AS BIGINT) AS sample_ppm
        |FROM sc CROSS JOIN nm ORDER BY source""".stripMargin,
    "x_knn_classify" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS true_label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |c AS (SELECT vec_id AS cand_id, label AS cand_label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        |  FROM embeddings WHERE vec_id % 20 <> 0),
        |sims AS (SELECT query_id, true_label, cand_id, cand_label,
        |    list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) /
        |    (sqrt(list_sum(list_transform(qv, x -> x * x))) *
        |     sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
        |  FROM q, c),
        |top AS (SELECT query_id, true_label, cand_label,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rnk
        |  FROM sims QUALIFY rnk <= 5),
        |votes AS (SELECT query_id, true_label, cand_label, count(*) AS votes,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY count(*) DESC, cand_label) AS vr
        |  FROM top GROUP BY 1, 2, 3)
        |SELECT query_id, true_label, cand_label AS predicted_label, votes
        |FROM votes WHERE vr = 1 ORDER BY query_id""".stripMargin,
    "x_edit_distance" ->
      s"""WITH d AS (SELECT doc_id, source, substr(text, 1, 80) AS prefix
        |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < ${QueriesLLM.EditSampleCap})
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  levenshtein(a.prefix, b.prefix) AS edit_dist
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 50
        |ORDER BY doc_a, doc_b""".stripMargin,
    "x_normalize_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, '  ' || upper(text) || ' '
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_raw_distinct,
        |  count(DISTINCT md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')))
        |    AS n_norm_distinct
        |FROM base""".stripMargin,
    "q_scd2" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |            FROM events WHERE user_id % 50 = 0),
        |f AS (SELECT *, lag(event_type) OVER w AS prev_type
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |c AS (SELECT user_id, event_id, event_type, ms FROM f
        |      WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (SELECT user_id, event_id, event_type, ms AS valid_from_ms,
        |        coalesce(lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id),
        |                 253402300799999) AS valid_to_ms
        |      FROM c)
        |SELECT user_id, event_id, event_type, valid_from_ms, valid_to_ms,
        |  valid_to_ms = 253402300799999 AS is_current
        |FROM v ORDER BY user_id, valid_from_ms, event_id""".stripMargin,
    "q_join_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, epoch_ms(ts) AS ms
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_ms(ts) AS ms
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ms AS click_ms,
        |  min(abs(c.ms - p.ms)) AS nearest_gap_ms
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |GROUP BY c.event_id, c.user_id, c.ms
        |ORDER BY c.event_id""".stripMargin,
    "q_recursive" -> QueriesRel.recursiveChainSql,
    "q_variant" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
        |  count(json_extract(props, '$.absent')) AS n_absent
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // deterministic hash-threshold stratified sample: membership is the
    // same md5-derived 60-bit hash both engines compute bit-for-bit
    "x_hash_stratified" ->
      """WITH s AS (SELECT lang, doc_id,
        |    ('0x' || substr(md5('hs42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 1000 AS r
        |  FROM documents)
        |SELECT lang, count(*) AS n_sampled,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM s
        |WHERE r < (CASE WHEN lang = 'en' THEN 400
        |           WHEN lang IN ('es', 'de', 'fr', 'zh') THEN 800 ELSE 0 END)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "x_reservoir_sample" ->
      """WITH h AS (SELECT source, doc_id,
        |    md5('rs42:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn FROM h)
        |SELECT source, doc_id, rn FROM r WHERE rn <= 4 ORDER BY source, rn""".stripMargin,
    "q_mode" ->
      """WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |    count(*) AS n FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER
        |    (PARTITION BY l_returnflag ORDER BY n DESC, qty) AS rn FROM c)
        |SELECT l_returnflag, qty AS mode_qty, n AS n_mode
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q_dq_audit" ->
      """WITH li AS (SELECT count(*) AS lineitem_rows,
        |    count(*) FILTER (WHERE l_quantity <= 0) AS lineitem_qty_nonpositive,
        |    count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
        |      AS lineitem_discount_range
        |  FROM lineitem),
        |o AS (SELECT count(*) AS orders_rows,
        |    count(*) FILTER (WHERE o_custkey IS NULL) AS orders_null_custkey
        |  FROM orders),
        |pk AS (SELECT count(*) FILTER (WHERE n > 1) AS orders_pk_dup
        |  FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1)),
        |ref AS (SELECT
        |    count(*) FILTER (WHERE o.o_orderkey IS NULL) AS lineitem_fk_orphan,
        |    count(*) FILTER (WHERE l.l_shipdate < o.o_orderdate)
        |      AS lineitem_ship_before_order
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT 'lineitem_rows' AS check_name, lineitem_rows AS n FROM li
        |UNION ALL SELECT 'lineitem_qty_nonpositive', lineitem_qty_nonpositive FROM li
        |UNION ALL SELECT 'lineitem_discount_range', lineitem_discount_range FROM li
        |UNION ALL SELECT 'orders_rows', orders_rows FROM o
        |UNION ALL SELECT 'orders_null_custkey', orders_null_custkey FROM o
        |UNION ALL SELECT 'orders_pk_dup', orders_pk_dup FROM pk
        |UNION ALL SELECT 'lineitem_fk_orphan', lineitem_fk_orphan FROM ref
        |UNION ALL SELECT 'lineitem_ship_before_order', lineitem_ship_before_order FROM ref
        |ORDER BY check_name""".stripMargin,
    "q_skew_stats" ->
      """WITH pk AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
        |  max(n) AS max_key_rows, quantile_cont(n, 0.99) AS p99_key_rows,
        |  CAST((max(n) * 1000 * count(*)) // CAST(sum(n) AS BIGINT) AS BIGINT)
        |    AS skew_x1000
        |FROM pk""".stripMargin,
    "x_robust_stats" ->
      """WITH tk AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |m AS (SELECT source, quantile_cont(n_tok, 0.5) AS med FROM tk GROUP BY 1),
        |d AS (SELECT tk.doc_id, tk.source, tk.n_tok, m.med
        |      FROM tk JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(abs(n_tok - med), 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.source, d.med, md.mad, count(*) AS n_docs,
        |  floor((CASE WHEN md.mad > 0
        |         THEN max(abs(d.n_tok - d.med) / (1.4826 * md.mad))
        |         ELSE 0 END) * 10000 + 0.5)
        |    / 10000.0 AS max_abs_z
        |FROM d JOIN md ON d.source = md.source
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "x_blocklist_filter" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN list_has_any(string_split(text, ' '),
        |    ['hash', 'skew', 'spill']) THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "x_chunk_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |ch AS (SELECT doc_id, g.i AS pos,
        |         array_to_string(words[g.i*8+1 : g.i*8+8], ' ') AS chunk
        |       FROM w, LATERAL (SELECT unnest(range(0,
        |         CAST(ceil(len(words)/8.0) AS BIGINT))) AS i) g),
        |own AS (SELECT chunk, min(doc_id) AS odoc FROM ch GROUP BY chunk),
        |own2 AS (SELECT c.chunk, own.odoc, min(c.pos) AS opos
        |         FROM ch c JOIN own ON c.chunk = own.chunk AND c.doc_id = own.odoc
        |         GROUP BY 1, 2)
        |SELECT c.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN c.doc_id = o.odoc AND c.pos = o.opos
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_chunks
        |FROM ch c JOIN own2 o ON c.chunk = o.chunk
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "x_pack_sequences" ->
      """WITH base AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |off AS (SELECT source, doc_id, n_tok,
        |    CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_off
        |  FROM base)
        |SELECT source, doc_id, n_tok, start_off,
        |  CAST(start_off // 256 AS BIGINT) AS bin_id
        |FROM off ORDER BY source, doc_id""".stripMargin,
    // The pts columns (r9) mirror the engine's REAL container walk
    // closed-form from the generator rules: video docs (doc_id%3=2)
    // have 4 + doc_id%5 frames at a 500 ms stts cadence, and ids with
    // (doc_id//4)%2=1 carry a ctts box shifting frame i's presentation
    // time by ((doc_id+i)%3)*100 ms — the engine derives the same
    // numbers by parsing stts+ctts out of the synthesized MP4, so a
    // composition-offset mis-parse is a hash mismatch here.
    "x_multimodal_meta" ->
      """WITH v AS (SELECT doc_id,
        |    list_transform(range(0, 4 + doc_id % 5), i -> i * 500 +
        |      CASE WHEN (doc_id // 4) % 2 = 1 THEN ((doc_id + i) % 3) * 100 ELSE 0 END) AS p
        |  FROM documents WHERE doc_id % 20 = 0 AND doc_id % 3 = 2),
        |pts AS (SELECT doc_id, list_min(p) AS first_pts_ms,
        |    list_max(p) AS last_pts_ms,
        |    len(list_filter(range(0, 4 + doc_id % 5),
        |      i -> (doc_id // 4) % 2 = 1 AND (doc_id + i) % 3 <> 0)) > 0 AS pts_ne_dts
        |  FROM v)
        |SELECT d.doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  substr(hex(CAST(text AS BLOB)), 1, 16) AS magic_hex,
        |  substr(md5(text), 1, 16) AS content_hash,
        |  pts.first_pts_ms, pts.last_pts_ms, pts.pts_ne_dts
        |FROM documents d LEFT JOIN pts ON d.doc_id = pts.doc_id
        |WHERE d.doc_id % 20 = 0 ORDER BY d.doc_id""".stripMargin,
    // Header-geometry oracle (r11): every column is a stated generator
    // rule (Multimodal.geom / videoFrameSizes / the imageBytes container
    // schedule), recomputed closed-form — the engine side parses the
    // REAL containers (IHDR/SOFn/GIF blocks/DIB/fmt+fact+data/
    // mvhd+tkhd+stss), so any header-walk defect is a hash mismatch.
    // Container schedule: odd image ids JPEG; even: %12=6 png
    // (interlaced), %24=12 gif (%48=36 animated: 3 frames x 100 ms),
    // %96 in (0,48) bmp, else png. Audio (k=1) is wav with the geom
    // duration/channels and no dims; video (k=2) is mp4 with geom dims,
    // (4+id%5)*500 ms mvhd duration, stss sync count 1+(n-1)//3.
    "x_multimodal_features_geom" ->
      """WITH g AS (SELECT doc_id AS media_id, doc_id % 3 AS k,
        |    32 + (doc_id % 8) * 16 AS w,
        |    24 + ((doc_id // 8) % 8) * 12 AS h,
        |    100 + (doc_id % 50) * 10 AS adur,
        |    1 + doc_id % 2 AS ach,
        |    4 + doc_id % 5 AS nv
        |  FROM documents)
        |SELECT media_id,
        |  CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE WHEN k = 1 THEN 'wav' WHEN k = 2 THEN 'mp4'
        |       WHEN media_id % 2 = 1 THEN 'jpeg'
        |       WHEN media_id % 12 = 6 THEN 'png'
        |       WHEN media_id % 24 = 12 THEN 'gif'
        |       WHEN media_id % 96 IN (0, 48) THEN 'bmp'
        |       ELSE 'png' END AS container,
        |  true AS decode_ok,
        |  CAST(CASE WHEN k = 1 THEN 0 ELSE w END AS INTEGER) AS width,
        |  CAST(CASE WHEN k = 1 THEN 0 ELSE h END AS INTEGER) AS height,
        |  CAST(CASE WHEN k = 1 THEN adur WHEN k = 2 THEN nv * 500
        |       WHEN k = 0 AND media_id % 48 = 36 THEN 300 ELSE 0 END AS BIGINT) AS duration_ms,
        |  CAST(CASE k WHEN 0 THEN 3 WHEN 1 THEN ach ELSE 0 END AS INTEGER) AS channels,
        |  CAST(CASE WHEN k = 2 THEN 1 + (nv - 1) // 3
        |       WHEN k = 0 AND media_id % 48 = 36 THEN 3 ELSE 1 END AS INTEGER) AS n_frames_sampled
        |FROM g ORDER BY media_id""".stripMargin,
    // Frame-index projection of the sample walk (r10): WHICH frames the
    // engine samples (MP4 sync samples / GIF frame walks / dead-letter
    // rows) and their stts+ctts presentation times, recomputed from the
    // generator rules — video ids (doc_id%3=2, BOTH container shapes)
    // have 4 + id%5 frames, sync every 3rd, 500 ms cadence, the meta
    // query's ctts policy; animated GIFs (id%48=36) are 3 frames at
    // 100 ms; static GIFs (id%24=12) one frame at 0; everything else is
    // one (-1, -1, false) quarantine row.
    "x_multimodal_frame_index" ->
      """WITH d AS (SELECT doc_id AS media_id, doc_id % 3 AS k FROM documents),
        |vfr AS (SELECT media_id, CAST(i AS INTEGER) AS frame_index,
        |    CAST(i * 500 + CASE WHEN (media_id // 4) % 2 = 1
        |      THEN ((media_id + i) % 3) * 100 ELSE 0 END AS BIGINT) AS pts_ms,
        |    true AS frame_ok
        |  FROM d, range(0, 9, 3) t(i) WHERE k = 2 AND i < 4 + media_id % 5),
        |gfr AS (SELECT media_id, CAST(i AS INTEGER) AS frame_index,
        |    CAST(i * 100 AS BIGINT) AS pts_ms, true AS frame_ok
        |  FROM d, range(3) t(i) WHERE k = 0 AND media_id % 48 = 36),
        |g1 AS (SELECT media_id, 0 AS frame_index, CAST(0 AS BIGINT) AS pts_ms,
        |    true AS frame_ok
        |  FROM d WHERE k = 0 AND media_id % 24 = 12 AND media_id % 48 <> 36),
        |dead AS (SELECT media_id, -1 AS frame_index, CAST(-1 AS BIGINT) AS pts_ms,
        |    false AS frame_ok
        |  FROM d WHERE NOT (k = 2 OR (k = 0 AND media_id % 24 = 12)))
        |SELECT * FROM vfr UNION ALL SELECT * FROM gfr
        |UNION ALL SELECT * FROM g1 UNION ALL SELECT * FROM dead
        |ORDER BY media_id, frame_index""".stripMargin,
    // The e2e UTXO queries run over the engine-converted parquet, which
    // DuckDB reads directly from its /tmp path (Verify materializes it
    // before the driver's oracle pass — ensureConverted is idempotent).
    "utxo_e2e_point_lookup" ->
      s"""SELECT txid, vout, amount, height
         |FROM read_parquet('${QueriesUtxo.ParquetPath}/*.parquet')
         |WHERE script = from_hex('${QueriesUtxo.knownHex}')
         |ORDER BY height""".stripMargin,
    // CASE mirror of ScriptCodec.scriptType over DuckDB's (uppercase)
    // hex rendering of the script BLOB.
    "utxo_e2e_script_types" ->
      s"""WITH u AS (SELECT amount, octet_length(script) AS nb, hex(script) AS h
         |           FROM read_parquet('${QueriesUtxo.ParquetPath}/*.parquet')),
         |c AS (SELECT amount,
         |  CASE
         |    WHEN nb = 25 AND substr(h, 1, 6) = '76A914' AND substr(h, 47, 4) = '88AC' THEN 'p2pkh'
         |    WHEN nb = 23 AND substr(h, 1, 4) = 'A914' AND substr(h, 45, 2) = '87' THEN 'p2sh'
         |    WHEN nb = 35 AND substr(h, 1, 2) = '21' AND substr(h, 3, 2) IN ('02', '03') AND substr(h, 69, 2) = 'AC' THEN 'p2pk'
         |    WHEN nb = 67 AND substr(h, 1, 4) = '4104' AND substr(h, 133, 2) = 'AC' THEN 'p2pk'
         |    WHEN nb = 22 AND substr(h, 1, 4) = '0014' THEN 'p2wpkh'
         |    WHEN nb = 34 AND substr(h, 1, 4) = '0020' THEN 'p2wsh'
         |    WHEN nb = 34 AND substr(h, 1, 4) = '5120' THEN 'p2tr'
         |    WHEN nb >= 1 AND substr(h, 1, 2) = '6A' THEN 'op_return'
         |    ELSE 'other' END AS script_class
         |  FROM u)
         |SELECT script_class, count(*) AS n, CAST(sum(amount) AS BIGINT) AS total_sats
         |FROM c GROUP BY script_class ORDER BY script_class""".stripMargin
  )
}
