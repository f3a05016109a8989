package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalar-function families (SURVEY.md §2.9 E20-E25) and the
  * batch-expressible analogues of the streaming queries (§2.10) whose
  * semantics a SQL oracle can check (the true streaming path is covered
  * by StreamingSpec against these same frames).
  */
object QueriesScalar {
  import Queries.t

  /** E20: string functions. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 9).as("prefix"),
        length(col("c_name")).as("name_len"),
        concat(col("c_mktsegment"), lit("-"), col("c_name")).as("tagged"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        trim(col("c_name"), "C").as("trimmed"))
      .orderBy(col("c_custkey"))

  /** E21: binary/hex functions (covers the README `from_hex` pattern). */
  def hexFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        sha2(col("c_name"), 256).as("name_sha256"),
        hex(col("c_custkey")).as("key_hex"),
        reverse(col("c_name")).as("rev_name"),
        length(unhex(md5(col("c_name")))).as("md5_bytes"))
      .orderBy(col("c_custkey"))

  /** E22: date/time functions — timestamps only ever output as
    * epoch-millis or DATE (oracle-parity discipline).
    */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate"), to_date(lit("2024-01-01"))).as("days_since"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"))
      .orderBy(col("o_orderkey"))

  /** E23: math functions incl. the C2 bit-unpack shape (shiftright). */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Queries.fround(col("l_extendedprice") * col("l_discount"), 2).as("disc_amt"),
        floor(col("l_quantity")).as("qty_floor"),
        ceil(col("l_quantity")).as("qty_ceil"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        abs(col("l_quantity") - 25.0).as("dev"),
        (col("l_orderkey") % 7).as("mod7"),
        shiftright(col("l_orderkey"), 2).as("key_shr2"),
        (col("l_orderkey").bitwiseAND(1) =!= 0).as("key_odd"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** E24: array functions over embeddings (sequential double folds —
    * bitwise-reproducible in the oracle). This query deliberately KEEPS
    * the built-in higher-order-function forms (`aggregate`/`zip_with`)
    * — it is the declared HOF surface; the hot pair loops elsewhere use
    * the bit-identical native vec_dot kernel.
    */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def norm(a: Column): Column = sqrt(dot(a, a))
    t(s, dir, "embeddings")
      .filter(col("vec_id") % 10 === 0)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        Queries.fround(element_at(col("embedding"), 1).cast("double"), 6).as("first_elem"),
        Queries.fround(dot(col("embedding"), col("embedding")), 6).as("self_dot"),
        Queries.fround(norm(col("embedding")), 6).as("l2norm"),
        Queries.fround(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")), 6).as("elem_sum"))
      .orderBy(col("vec_id"))
  }

  /** E24: explode (generator/UDTF surface) — token frequencies. */
  def explodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(40)

  /** E2: CSV + JSON secondary ingest formats — round-trip the nation
    * table through both and join them back; the oracle reads the
    * original parquet (values must survive both formats exactly).
    */
  def csvJsonScan(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "nation")
    // paths keyed by the fixture tag like every sibling stage: fixed
    // names let one session's overwrite delete the directory while a
    // concurrent session's deferred read is still scanning it
    val tag = Queries.stageTag(dir)
    val csvPath = s"/tmp/graft_nation_csv_$tag"
    val jsonPath = s"/tmp/graft_nation_json_$tag"
    base.write.mode("overwrite").option("header", "true").csv(csvPath)
    base.write.mode("overwrite").json(jsonPath)
    val fromCsv = s.read.option("header", "true").option("inferSchema", "true").csv(csvPath)
      .select(col("n_nationkey").cast("int").as("nationkey"), col("n_name").as("name_csv"))
    val fromJson = s.read.json(jsonPath)
      .select(col("n_nationkey").cast("int").as("nationkey"), col("n_name").as("name_json"),
        col("n_regionkey").cast("int").as("regionkey"))
    fromCsv.join(fromJson, "nationkey")
      .select(col("nationkey"), col("name_csv").as("n_name"), col("regionkey"))
      .orderBy(col("nationkey"))
  }

  /** E2b: ORC source/sink roundtrip — supplier written once as ORC
    * (Spark's second first-class columnar format; same pushdown and
    * pruning machinery as parquet), read back with a pushed predicate
    * and aggregated. Oracle runs the same relational query over the
    * original table: equality proves the roundtrip is lossless.
    */
  def orcScan(s: SparkSession, dir: String): DataFrame = {
    val loc = s"/tmp/graft_orc_supplier_${Queries.stageTag(dir)}"
    if (!new java.io.File(loc, "_SUCCESS").exists()) synchronized {
      if (!new java.io.File(loc, "_SUCCESS").exists())
        t(s, dir, "supplier").write.mode("overwrite").orc(loc)
    }
    s.read.orc(loc)
      .filter(col("s_nationkey") < 10)
      .groupBy(col("s_nationkey").cast("int").as("nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(Queries.cents(col("s_acctbal"))).as("bal_cents"))
      .orderBy(col("nationkey"))
  }

  /** E65: native XML ingest (the StAX source that moved into Spark 4
    * core) — a documents sample round-tripped through XML with one row
    * element per `rowTag` and read back with schema inference; the
    * oracle reads the original parquet, so equality (keys, dims, and
    * the md5 of the free text) proves the escape/parse round-trip is
    * lossless, including entity-escaped characters in the body text.
    * XML is the interchange format legacy enterprise feeds still
    * arrive in; the source splits by row element, so a 100 TB drop of
    * XML files scans in parallel like any other file source.
    * `ignoreSurroundingSpaces` (reader default) trims text nodes, so
    * the compared md5 trims on both sides.
    */
  def xmlScan(s: SparkSession, dir: String): DataFrame = {
    val loc = s"/tmp/graft_xml_docs_${Queries.stageTag(dir)}"
    if (!new java.io.File(loc, "_SUCCESS").exists()) synchronized {
      if (!new java.io.File(loc, "_SUCCESS").exists())
        t(s, dir, "documents").filter(col("doc_id") % 20 === 0)
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
          .write.mode("overwrite")
          .option("rowTag", "doc").format("xml").save(loc)
    }
    s.read.format("xml").option("rowTag", "doc").load(loc)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("lang"), col("source"),
        md5(trim(col("text"))).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  /** E66: binaryFile ingestion — the opaque-bytes source a multimodal
    * corpus lands through: each file becomes one row of (path,
    * modificationTime, length, content BINARY) with NO decode on read,
    * so image/audio blobs flow into the engine as columns and the
    * typed metadata joins back by id parsed from the path. The content
    * md5 and byte length are oracled against the same bytes in the
    * documents table (files are staged as the UTF-8 encoding of the
    * text column). Length/modificationTime predicates prune at the
    * file-listing level before any byte is read — the scan discipline
    * that matters when the blobs are 100 TB of media.
    */
  def binaryfileScan(s: SparkSession, dir: String): DataFrame = {
    val loc = stageBinaryDocs(s, dir)
    s.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(loc)
      .select(
        regexp_extract(col("path"), "doc_([0-9]+)\\.bin", 1).cast("long").as("doc_id"),
        col("length"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("doc_id"))
  }

  private def stageBinaryDocs(s: SparkSession, dir: String): String = {
    val loc = s"/tmp/graft_bin_docs_${Queries.stageTag(dir)}"
    val marker = new java.io.File(loc, "_STAGED")
    if (!marker.exists()) synchronized {
      if (!marker.exists()) {
        new java.io.File(loc).mkdirs()
        // bounded driver-side fixture write (the nation-fixture
        // precedent): one file per sampled doc, bytes = UTF-8 text
        t(s, dir, "documents").filter(col("doc_id") % 40 === 0)
          .select(col("doc_id"), col("text")).collect()
          .foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(loc, s"doc_${r.getLong(0)}.bin"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      }
    }
    loc
  }

  /** E70: native generator UDTF — corpus shingle frequencies via the
    * custom [[graft.functions.ShingleGenerator]]: shingles stream out
    * of a lazy per-row iterator under GenerateExec instead of being
    * materialized as a per-document array first (explode's shape) —
    * peak memory per row is ONE shingle regardless of document length,
    * the outlier-document insurance at corpus scale. Output rows are
    * identical to `explode(word_shingles(...))`, so the same SQL
    * oracles it.
    */
  def generatorShingles(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "documents")
      .select(call_function("shingle_gen", col("text"), lit(3)))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("shingle"))
      .limit(30)
  }

  /** E69: JDBC source/sink (embedded Derby) — the operational-database
    * federation surface: dimensions that live in an RDBMS are written
    * once over JDBC and read back with a PARTITIONED parallel read
    * (`partitionColumn`/`numPartitions` splits the key range into
    * per-executor WHERE clauses — the only way a JDBC scan avoids the
    * single-connection bottleneck; the same mechanism fans out against
    * a production Postgres). Identifiers are uppercased before the
    * write: Spark's Derby dialect quotes mixed-case names, and a
    * quoted lowercase column cannot be referenced by the unquoted
    * partition-clause SQL. Oracle reads the original parquet — the
    * JDBC round-trip must be lossless.
    */
  def jdbcScan(s: SparkSession, dir: String): DataFrame = {
    val db = s"/tmp/graft_derby_${Queries.stageTag(dir)}"
    // territory is pinned EXPLICITLY: database creation derives it from
    // the JVM default locale, and every bench main sets Locale.ROOT
    // (empty language — required so f"%.3f" emits dot decimals in the
    // JSON contract), which Derby rejects with "Supplied locale
    // description '' is invalid" (found by the r9 registry pass on a
    // clean staging dir; earlier rounds masked it behind pre-staged dbs)
    val url = s"jdbc:derby:$db;create=true;territory=en_US"
    val marker = new java.io.File(db + "_STAGED")
    if (!marker.exists()) synchronized {
      if (!marker.exists()) {
        // a transient boot failure (observed once in a long bench pass:
        // "Failed to create database" with the cause buried in Derby's
        // chained SQLException) must not poison the staging forever —
        // clear the half-created db dir and retry once; on the second
        // failure surface the CHAIN, not just the outer message
        def stage(): Unit =
          t(s, dir, "supplier")
            .select(col("s_suppkey").as("SUPPKEY"), col("s_name").as("NAME"),
              col("s_nationkey").as("NATIONKEY"), col("s_acctbal").as("ACCTBAL"))
            .write.mode("overwrite")
            .format("jdbc").option("url", url).option("dbtable", "SUPPLIER").save()
        try stage()
        catch {
          case scala.util.control.NonFatal(first) =>
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(db))
            try stage()
            catch {
              case scala.util.control.NonFatal(second) =>
                def chain(t: Throwable): String = {
                  val msgs = Iterator.iterate(t)(x =>
                    x match {
                      case sql: java.sql.SQLException
                        if sql.getNextException != null => sql.getNextException
                      case other => other.getCause
                    }).takeWhile(_ != null).map(_.getMessage).take(5)
                  msgs.mkString(" <- ")
                }
                throw new RuntimeException(
                  s"jdbc staging failed twice: [${chain(first)}] then [${chain(second)}]",
                  second)
            }
        }
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      }
    }
    val hi = t(s, dir, "supplier").agg(max(col("s_suppkey"))).head().getLong(0)
    s.read.format("jdbc")
      .option("url", url).option("dbtable", "SUPPLIER")
      .option("partitionColumn", "SUPPKEY")
      .option("lowerBound", "1").option("upperBound", (hi + 1).toString)
      .option("numPartitions", "4")
      .load()
      .filter(col("NATIONKEY") < 15)
      .groupBy(col("NATIONKEY").cast("int").as("nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(Queries.cents(col("ACCTBAL"))).as("bal_cents"))
      .orderBy(col("nationkey"))
  }

  /** S12 wrapper: run the keyed streaming aggregation to completion on
    * a staged copy of the corpus events, then read the final per-user
    * state DIRECTLY off the checkpoint with the `statestore` batch
    * source — after the finite stream drains, the aggregation state IS
    * the batch group-by, which is exactly what the oracle asserts.
    */
  /** Stage `$dir/events.parquet` into `destDir` exactly once,
    * crash-safe: copy to a dot-prefixed temp name (hidden from Spark's
    * directory-watching sources) and atomically rename — a JVM killed
    * mid-copy must not leave a truncated file that passes the exists
    * check forever — under a double-checked lock so concurrent callers
    * stage once.
    */
  private def stageEventsFile(dir: String, destDir: java.nio.file.Path): Unit = {
    val dest = destDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(dest)) synchronized {
      if (!java.nio.file.Files.exists(dest)) {
        java.nio.file.Files.createDirectories(destDir)
        val tmp = destDir.resolve(".events.parquet.tmp")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"), tmp,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.move(tmp, dest,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
  }

  def stateReader(s: SparkSession, dir: String): DataFrame = {
    val tag = Queries.stageTag(dir)
    val src = java.nio.file.Paths.get(s"/tmp/graft_state_src_$tag")
    stageEventsFile(dir, src)
    graft.streaming.StreamingQueries
      .runStateInspect(s, src.toString, s"/tmp/graft_state_ckpt_$tag")
      .orderBy(col("user_id"))
  }

  /** E25b: map functions — per-user event-type histogram built as a
    * MapType column (`map_from_entries`), then queried with
    * `element_at` / `map_keys` / `size`. The map projections are
    * order-insensitive, so the unordered `collect_list` is safe; the
    * oracle computes the same outputs relationally (FILTER counts,
    * ordered string_agg) without a map type.
    */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("user_id") % 50 === 0)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt")))).as("m"))
      .select(col("user_id"),
        size(col("m")).as("n_types"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("types_sorted"))
      .orderBy(col("user_id"))

  /** E23b: conditional functions — CASE/WHEN chains, coalesce, nullif,
    * least/greatest. All pure row-local projections that stay inside
    * whole-stage codegen; the masking pattern (`nullif` + `coalesce`)
    * is the standard PII-redaction idiom in a curation pipeline.
    */
  def condFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") % 7 === 0)
      .select(col("p_partkey"),
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "mid")
          .otherwise("big").as("size_class"),
        coalesce(expr("nullif(p_brand, 'Brand#33')"), lit("REDACTED")).as("brand_masked"),
        least(col("p_size"), lit(25)).as("size_cap"),
        greatest(col("p_size"), lit(5)).as("size_floor"),
        when(col("p_retailprice") > 1500.0, "Y").otherwise("N").as("pricey"))
      .orderBy(col("p_partkey"))

  /** E23c: error-safe expressions — `try_cast` / `try_divide` return
    * NULL instead of raising, the per-expression analogue of the E39
    * PERMISSIVE ingest: one malformed value must not kill a 100 TB job,
    * and it must not be silently dropped either (NULLs are countable).
    * Nulls coalesce to sentinels so the oracle compare never sorts a
    * nullable key. Pure codegen projections, zero shuffle.
    */
  def tryFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"),
        coalesce(expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)"), lit(-1))
          .as("prio_num"),
        coalesce(expr("try_cast(o_orderpriority AS INT)"), lit(-1)).as("full_cast"),
        coalesce(
          Queries.fround(expr("try_divide(o_totalprice, o_custkey % 5)"), 2),
          lit(-1.0)).as("ratio"))
      .orderBy(col("o_orderkey"))

  /** E24b: null-preserving generator — `explode_outer` keeps the parent
    * row when the array is empty (plain `explode` silently drops it — a
    * quiet data-loss bug when flattening sparse annotations at corpus
    * scale: the docs with zero matches are usually the ones you need to
    * count). Empty-array docs surface with a sentinel token.
    */
  def explodeOuter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => x.startsWith("q")).as("toks"))
      .select(col("doc_id"), explode_outer(col("toks")).as("tok"))
      .select(col("doc_id"), coalesce(col("tok"), lit("<none>")).as("token"))
      .orderBy(col("doc_id"), col("token"))

  /** E39: error-tolerant ingest — CSV with malformed rows read in
    * PERMISSIVE mode: bad rows land in the corrupt-record column
    * instead of failing the job (the only mode that survives a 100 TB
    * ingest of third-party data; FAILFAST dies on row one, DROPMALFORMED
    * loses them silently). The clean-side aggregate is oracled against
    * DuckDB's `ignore_errors` read of the same staged file; the spec
    * pins that exactly the injected bad rows are quarantined.
    */
  def corruptCsv(s: SparkSession, dir: String): DataFrame =
    corruptCsvRaw(s, dir)
      .filter(col("_corrupt").isNull)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), min(col("n_name")).as("first_name"))
      .orderBy(col("n_regionkey"))

  def corruptCsvRaw(s: SparkSession, dir: String): DataFrame = {
    val path = stageCorruptCsv(s, dir)
    s.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
  }

  /** Nation as CSV plus two deliberately malformed lines (wrong type /
    * wrong arity), staged at a CORPUS-TAG-KEYED path (r10): the r9
    * fixed path let a concurrent plan-lint run at another scale
    * re-stage the file between a Verify engine dump and its oracle
    * pass — two spurious sf1 mismatches. The oracle SQL is generated
    * per corpus ([[Queries.oracleFor]]'s fixtureOracle), so the tag
    * rides into the SQL and scales never share a staging dir.
    */
  def corruptCsvPath(dir: String): String =
    s"/tmp/graft_corrupt_csv_${Queries.stageTag(dir)}"
  val CorruptLines: Seq[String] = Seq("notanint,CORRUPT_TYPE,xx", "too,many,fields,here,5")
  private def stageCorruptCsv(s: SparkSession, dir: String): String = {
    val base = corruptCsvPath(dir)
    val marker = java.nio.file.Paths.get(base, "_source_dir")
    def staged = try new String(java.nio.file.Files.readAllBytes(marker)) catch { case _: Throwable => "" }
    // double-checked: re-read the marker INSIDE the lock so two
    // concurrent callers can't both stage (same idiom as
    // QueriesRel.zorderedLineitem)
    if (staged != dir) synchronized { if (staged != dir) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val rows = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
        .collect().sortBy(_.getLong(0))
        .map(r => s"${r.getLong(0)},${r.getString(1)},${r.getLong(2)}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base, "nation.csv"),
        ((rows.toSeq ++ CorruptLines).mkString("\n") + "\n").getBytes)
      java.nio.file.Files.write(marker, dir.getBytes)
    } }
    s"$base/nation.csv"
  }

  /** E38: schema-evolution read — a fact table whose early files lack a
    * column added later (the standard 100 TB reality: years of files,
    * schema drift). `mergeSchema=true` unions the file schemas at scan
    * planning; rows from old files surface NULL for the added column.
    * The two epochs are staged once per source dir; the oracle reads
    * the same two file sets with DuckDB's union_by_name.
    */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val loc = schemaEvolutionDirs(s, dir)
    s.read.option("mergeSchema", "true").parquet(s"$loc/old", s"$loc/new")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_with_priority"),
        sum(col("price_cents")).as("total_cents"))
      .orderBy(col("o_year"))
  }

  /** Two-epoch orders layout: `old/` lacks `o_orderpriority`, `new/`
    * carries it. The path is CORPUS-TAG-KEYED (r10, same hazard and fix
    * as [[corruptCsvPath]]); the marker still records the source dir so
    * a regenerated corpus under the same tag re-stages.
    */
  def schemaEvoPath(dir: String): String =
    s"/tmp/graft_schevo_${Queries.stageTag(dir)}"
  def schemaEvolutionDirs(s: SparkSession, dir: String): String = {
    val loc = schemaEvoPath(dir)
    val marker = java.nio.file.Paths.get(loc, "_source_dir")
    def staged = try new String(java.nio.file.Files.readAllBytes(marker)) catch { case _: Throwable => "" }
    // double-checked (see stageCorruptCsv)
    if (staged != dir) synchronized { if (staged != dir) {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          Queries.cents(col("o_totalprice")).as("price_cents"),
          year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
      o.filter(col("o_year") <= 1996).drop("o_orderpriority")
        .write.mode("overwrite").parquet(s"$loc/old")
      o.filter(col("o_year") > 1996)
        .write.mode("overwrite").parquet(s"$loc/new")
      java.nio.file.Files.write(marker, dir.getBytes)
    } }
    loc
  }

  /** E35: Z-order (Morton) clustering keys via the native codegen
    * `zorder2` expression — the multi-dimension layout key: sort by the
    * interleaved code and row groups become axis-aligned rectangles in
    * (partkey, suppkey) space, so parquet min/max stats skip on BOTH
    * dimensions (the spec measures it on [[QueriesRel.zorderedLineitem]];
    * this query pins the code values against a bit-arithmetic oracle).
    */
  def zorderKeys(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_partkey"), lit(1024L)).as("px"),
        pmod(col("l_suppkey"), lit(1024L)).as("sy"))
      .withColumn("z", graft.functions.GraftFunctions.zorder2(col("px"), col("sy")))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** E25: JSON functions over events.props. */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), Queries.half2(avg(col("k"))).as("avg_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** S8: foreachBatch incremental upsert, run to completion over the
    * finite events source — the final keyed parquet target holds the
    * latest event per (user_id, event_type), which is exactly the
    * `s_dedup_latest` contract, so the same oracle pins it. The file
    * streaming source watches directories: the single corpus file is
    * staged once per source dir.
    */
  def streamUpsert(s: SparkSession, dir: String): DataFrame = {
    val tag = Queries.stageTag(dir)
    val src = java.nio.file.Paths.get(s"/tmp/graft_upsert_src_$tag")
    stageEventsFile(dir, src)
    graft.streaming.StreamingQueries.runUpsert(s, src.toString,
        s"/tmp/graft_upsert_tgt_$tag", s"/tmp/graft_upsert_ckpt_$tag")
      .select(col("user_id"), col("event_type"),
        col("event_id").as("latest_event_id"),
        unix_millis(col("ts")).as("ts_ms"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** S1 batch analogue: tumbling 1-hour windows via `window()` (the same
    * expression the streaming path uses), keyed output as epoch millis.
    */
  /** S9 batch analogue: the chained-window rollup (10-minute counts →
    * hourly totals) via the same two `window()` layers the streaming
    * path uses; oracle reproduces with nested epoch-bucket floors.
    */
  def streamChained(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes").as("w10"), col("event_type"))
      .agg(count(lit(1)).as("n10"))
      .groupBy(window(col("w10"), "1 hour").as("w"), col("event_type"))
      .agg(sum(col("n10")).as("n"), count(lit(1)).as("n_subwindows"))
      .select(unix_millis(col("w.start")).as("hour_start_ms"), col("event_type"),
        col("n"), col("n_subwindows"))
      .orderBy(col("hour_start_ms"), col("event_type"))

  def streamTumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(unix_millis(col("w.start")).as("hour_start_ms"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy(col("hour_start_ms"), col("event_type"))

  /** S1b batch analogue: sliding 1-hour windows every 30 minutes via the
    * same `window()` expression the streaming path uses (each event lands
    * in exactly two windows); oracle reproduces with two shifted
    * 30-minute epoch buckets unioned.
    */
  def streamSliding(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("w.start")).as("win_start_ms"), col("event_type"), col("n"))
      .orderBy(col("win_start_ms"), col("event_type"))

  /** S2 batch analogue: session windows (10-minute gap) per user via
    * `session_window()`; oracle reproduces with gaps-and-islands SQL.
    */
  def streamSession(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("user_id") % 10 === 0)
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start_ms"))

  /** S11 batch analogue: LEFT OUTER version of [[streamJoin]] — every
    * click appears; clicks with no purchase in the 30-minute horizon
    * carry NULL match columns. Identical condition to the watermarked
    * streaming join in StreamingQueries.streamStreamLeftJoin; the
    * streaming side can only emit the null rows after the watermark
    * passes, which StreamingSpec pins.
    */
  def streamJoinLeft(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id").as("p_user"),
        col("value"), col("ts").as("p_ts"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("click_id"), col("user_id"),
        unix_millis(col("c_ts")).as("click_ms"), col("purch_id"),
        unix_millis(col("p_ts")).as("purch_ms"),
        round(col("value"), 2).as("purch_value"))
      .orderBy(col("click_id"), col("purch_id"))
  }

  /** S6 batch analogue: clicks joined to same-user purchases within the
    * following 30 minutes — identical condition to the watermarked
    * stream-stream join in StreamingQueries.streamStreamJoin.
    */
  def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purch_id"), col("user_id").as("p_user"),
        col("value"), col("ts").as("p_ts"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purch_id"), col("user_id"),
        unix_millis(col("c_ts")).as("click_ms"),
        unix_millis(col("p_ts")).as("purch_ms"),
        round(col("value"), 2).as("purch_value"))
      .orderBy(col("click_id"), col("purch_id"))
  }

  /** E62: VARIANT semi-structured ingestion — `parse_json` once into
    * the binary VARIANT encoding, then typed `variant_get` path
    * extraction. Against E25's per-call `get_json_object` string
    * re-parse, VARIANT parses each row once and every extraction reads
    * the binary form — the difference between O(paths) string parses
    * and one, which is what makes wide semi-structured scans viable at
    * corpus scale. Missing paths yield NULL (counted here to pin the
    * no-error contract); aggregation happens on the extracted typed
    * columns so the oracle compares plain BIGINTs.
    */
  def variantExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.absent', 'bigint')").as("absent"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        count(col("absent")).as("n_absent"))
      .orderBy(col("event_type"))

  /** S4 batch analogue: keep latest event per (user, type) — stateful
    * dedup semantics expressed as a ranking window.
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("latest_event_id"),
        unix_millis(col("ts")).as("ts_ms"))
      .orderBy(col("user_id"), col("event_type"))
  }
}
