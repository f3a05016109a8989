package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.BlockMetaData
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type => PType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Broker-free, Kafka-shaped streaming DataSource V2 (SURVEY.md §2.10
  * S17): a custom [[MicroBatchStream]] with [[SupportsAdmissionControl]]
  * over an APPEND-ONLY set of parquet segments — the one Spark extension
  * point the engine had not exercised before r13 (batch DSv2, codegen
  * Expressions, optimizer Rule, commit protocol, UDTF, UDAF,
  * transformWithState all ship already).
  *
  * The log model mirrors Kafka's without a broker:
  *  - **partitions**: a FIXED count N (option `partitions`, default 4),
  *    immutable for the life of a checkpoint, like Kafka's partition
  *    count. Every segment's row space is divided into N contiguous
  *    slices (slice i = rows [rows·i/N, rows·(i+1)/N)); partition i's
  *    row chain is the concatenation of slice i across segments in
  *    name order. The assignment is a pure function of (sorted segment
  *    list, N) — appending a segment extends every chain at the tail
  *    and never remaps a consumed row, which is what makes offsets
  *    stable under growth. Planned driver-side from parquet FOOTERS
  *    only — no data pages are read to plan.
  *  - **growth**: the log is APPEND-ONLY. `latestOffset` re-lists the
  *    segment directory each trigger and admits new segments, provided
  *    they sort strictly after every known segment (Kafka's
  *    base-offset-numbered segment files have the same property) and
  *    no known segment was renamed, removed, or resized. Any violation
  *    fails LOUDLY — a mutated prefix can never silently remap rows.
  *    Segments must be published atomically (write temp + rename), the
  *    standard object-store/log discipline.
  *  - **offsets**: one monotone row position per partition chain, plus
  *    the IDENTITY of the chain prefix it refers to: the offset JSON
  *    carries `(nseg, fp)` — the number of segments known when the
  *    offset was formed and a 64-bit fingerprint of their (name, row
  *    count) list. `deserializeOffset` re-derives the fingerprint of
  *    the current first-`nseg` segments and fails loudly on ANY
  *    mismatch — count drift, a same-count segment swap, a renamed or
  *    regrown file — never resuming row offsets against different rows.
  *  - **rate limit / admission control**: `maxRowsPerTrigger` caps a
  *    micro-batch; the quota spreads across partitions with remaining
  *    rows in deterministic equal shares ([[SupportsAdmissionControl]]
  *    — the same surface Kafka's `maxOffsetsPerTrigger` uses).
  *  - **Trigger.AvailableNow**: the drain target (per-chain lengths AND
  *    the segment count) is SNAPSHOTTED at query start; segments landing
  *    after the snapshot are left for the next incarnation — bounded
  *    batches over a bounded snapshot, Kafka connector semantics.
  *  - **replayability**: a (start, end) offset pair always re-reads the
  *    identical rows — parquet row order inside a segment is immutable,
  *    slices are footer-derived, and the fingerprint pins the segment
  *    prefix. This is what the file-stream source CANNOT give
  *    (mtime-ordered admission, S15): the log source re-plans any
  *    committed batch bit-identically after a crash.
  *
  * Readers scan only the row groups overlapping their range
  * (`readRowGroup(i)` random access — a 100 TB log reads the groups a
  * batch touches, never the segment head), project only the pruned
  * columns (requested-schema pushdown to the parquet page reader), and
  * additionally SKIP whole row groups whose footer min/max statistics
  * prove a pushed predicate can never match ([[SupportsPushDownFilters]];
  * skipped groups' pages are never read). Pushed filters are reported
  * as fully residual — Spark re-applies them — so statistics skipping
  * is a pure page-IO optimization that cannot change results, and row
  * OFFSETS still advance over skipped positions, preserving
  * exactly-once accounting. Within the first overlapping group, rows
  * below the range start are skipped by read-and-discard — bounded by
  * one row group by construction.
  *
  * The source is STREAMING-FIRST: the row decode is parquet-mr record
  * assembly (one heap Group per row), which is the right cost model for
  * admission-controlled micro-batches but roughly an order of magnitude
  * behind Spark's vectorized parquet reader for wide full-table batch
  * scans. `BATCH_READ` is supported for parity/oracle checks and
  * filtered point reads (it gets the same row-group skipping); point
  * heavy analytical batch scans at the native parquet reader instead.
  *
  * Schema: inferred from the first segment's footer (INT64/INT32/
  * DOUBLE/FLOAT/BOOLEAN/BINARY primitives; TIMESTAMP logical units
  * MILLIS/MICROS/NANOS all normalized to Spark's µs TimestampType, the
  * engine's session contract — same semantics as `Queries.normalizeTs`,
  * so the events fixture reads identically through the batch and log
  * paths whichever physical layout the generator shipped).
  */
class EventLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "eventlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("eventlog source requires a path"))
    EventLogTable.sparkSchema(EventLogTable.fileSchema(path, UtxoTable.hadoopConf()))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("eventlog source requires a path"))
    new EventLogTable(path, schema)
  }
  override def supportsExternalMetadata(): Boolean = false
}

/** One log segment: absolute path, byte length at first sighting (the
  * cheap immutability check on every re-list), row count from the
  * footer (read once, cached across triggers).
  */
case class SegMeta(file: String, bytes: Long, rows: Long) {
  def name: String = new Path(file).getName
}

object EventLogTable {
  /** Process-wide reader diagnostics (local-mode observable; at cluster
    * scale the same counters surface per-executor). `rowGroupsSkipped`
    * counts groups whose pages were never read because footer
    * statistics proved a pushed predicate unsatisfiable.
    */
  object Metrics {
    val rowGroupsRead = new java.util.concurrent.atomic.AtomicLong
    val rowGroupsSkipped = new java.util.concurrent.atomic.AtomicLong
  }

  private def isSegment(name: String): Boolean =
    name.endsWith(".parquet") && !name.startsWith(".") && !name.startsWith("_")

  /** Name-sorted (path, bytes) listing of the log's segment files —
    * one parquet file, or a directory of them, resolved through the
    * Hadoop FS (same discipline as [[UtxoTable.expand]] — a
    * distributed store lists identically).
    */
  private def listSegments(path: String, conf: Configuration): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).filter(s => s.isFile && isSegment(s.getPath.getName))
        .map(s => (s.getPath.toString, s.getLen)).sortBy(_._1).toSeq
    else Seq((st.getPath.toString, st.getLen))
  }

  /** Re-list the log and validate the APPEND-ONLY contract against the
    * previously known segments: the known list must be exactly the
    * name-sorted prefix of the new listing (so new segments sort after
    * all existing ones and nothing was renamed or removed), and every
    * known segment's byte length must be unchanged (segments are
    * immutable once published). Footers are opened only for NEW
    * segments — a re-list per trigger costs one directory listing.
    */
  def refreshSegments(path: String, conf: Configuration,
      known: Array[SegMeta]): Array[SegMeta] = {
    val now = listSegments(path, conf)
    if (now.length < known.length)
      throw new IllegalStateException(
        s"eventlog: the log at $path shrank from ${known.length} to " +
          s"${now.length} segments — the log is append-only; segments must " +
          "never be removed under a running query or checkpoint")
    known.indices.foreach { i =>
      val (name, bytes) = now(i)
      if (name != known(i).file)
        throw new IllegalStateException(
          s"eventlog: segment order changed at position $i: was " +
            s"${known(i).file}, now $name — the log is append-only; new " +
            "segments must sort strictly after all existing ones and " +
            "existing segments must not be renamed or removed")
      if (bytes != known(i).bytes)
        throw new IllegalStateException(
          s"eventlog: segment $name changed size (${known(i).bytes} -> " +
            s"$bytes bytes) — segments are immutable once published; " +
            "append a new segment instead (publish atomically via " +
            "write-temp-then-rename)")
    }
    known ++ now.drop(known.length).map { case (name, bytes) =>
      val r = ParquetFileReader.open(conf, new Path(name))
      val rows = try r.getRecordCount finally r.close()
      SegMeta(name, bytes, rows)
    }
  }

  def fileSchema(path: String, conf: Configuration): MessageType = {
    val first = listSegments(path, conf).headOption.getOrElse(
      throw new IllegalArgumentException(s"eventlog: no parquet segments under $path"))
    val r = ParquetFileReader.open(conf, new Path(first._1))
    try r.getFooter.getFileMetaData.getSchema finally r.close()
  }

  /** Footer MessageType → Spark schema. Flat primitive logs only — a
    * log record with nested groups is not this source's shape.
    */
  def sparkSchema(mt: MessageType): StructType = StructType(
    (0 until mt.getFieldCount).map { i =>
      val f = mt.getType(i)
      require(f.isPrimitive, s"eventlog: nested field ${f.getName} unsupported")
      val p = f.asPrimitiveType()
      val dt = p.getPrimitiveTypeName match {
        case PrimitiveType.PrimitiveTypeName.INT64 =>
          p.getLogicalTypeAnnotation match {
            case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => TimestampType
            case _ => LongType
          }
        case PrimitiveType.PrimitiveTypeName.INT32 =>
          p.getLogicalTypeAnnotation match {
            case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => DateType
            case _ => IntegerType
          }
        // legacy Spark/Hive/Impala timestamp layout (Julian day +
        // nanos-of-day): still the Spark writer's DEFAULT output type,
        // so a log of Spark-written segments carries it
        case PrimitiveType.PrimitiveTypeName.INT96 => TimestampType
        case PrimitiveType.PrimitiveTypeName.DOUBLE => DoubleType
        case PrimitiveType.PrimitiveTypeName.FLOAT => FloatType
        case PrimitiveType.PrimitiveTypeName.BOOLEAN => BooleanType
        case PrimitiveType.PrimitiveTypeName.BINARY =>
          p.getLogicalTypeAnnotation match {
            case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => StringType
            case _ => BinaryType
          }
        case other =>
          throw new IllegalArgumentException(s"eventlog: unsupported primitive $other")
      }
      StructField(f.getName, dt,
        nullable = f.getRepetition != PType.Repetition.REQUIRED)
    })

  /** First row (inclusive) of slice `i` of `n` over a `rows`-row
    * segment. Slice i of every segment belongs to partition i.
    */
  def sliceStart(rows: Long, i: Int, n: Int): Long = rows * i / n

  def sliceLen(rows: Long, i: Int, n: Int): Long =
    sliceStart(rows, i + 1, n) - sliceStart(rows, i, n)

  /** Per-partition chain lengths over the segment list. */
  def chainLengths(segs: Array[SegMeta], n: Int): Array[Long] =
    Array.tabulate(n)(i => segs.foldLeft(0L)((acc, s) => acc + sliceLen(s.rows, i, n)))

  /** Map partition `part`'s chain coordinates [a, b) onto absolute
    * per-file row ranges — one (file, lo, hi) per segment the batch
    * touches. The inverse of the slicing that defines the chains.
    */
  def mapChainRange(segs: Array[SegMeta], n: Int, part: Int,
      a: Long, b: Long): Seq[(String, Long, Long)] = {
    val out = Seq.newBuilder[(String, Long, Long)]
    var c = 0L
    var i = 0
    while (i < segs.length && c < b) {
      val s = segs(i)
      val len = sliceLen(s.rows, part, n)
      if (len > 0 && c + len > a) {
        val lo = math.max(a, c) - c
        val hi = math.min(b, c + len) - c
        val base = sliceStart(s.rows, part, n)
        out += ((s.file, base + lo, base + hi))
      }
      c += len
      i += 1
    }
    out.result()
  }

  /** FNV-1a 64 over the (basename, row count) list — the segment-prefix
    * identity carried inside every offset. Path-independent (basenames)
    * so a relocated log with identical segments still validates.
    */
  def fingerprint(segs: Seq[SegMeta]): String = {
    var h = 0xCBF29CE484222325L
    def mix(b: Byte): Unit = { h ^= (b & 0xFFL); h *= 0x100000001B3L }
    segs.foreach { s =>
      s.name.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach(mix)
      mix(0)
      var r = s.rows
      var i = 0
      while (i < 8) { mix((r & 0xFF).toByte); r >>>= 8; i += 1 }
    }
    java.lang.Long.toHexString(h)
  }

  /** Spark types on which min/max statistics skipping is sound and
    * simple: plain ints/longs/doubles/floats and UTF-8 strings.
    * Timestamps/dates are excluded (logical-type unit normalization
    * would have to be replicated against raw stats), booleans and raw
    * binary carry no useful range.
    */
  private[sources] def pushableType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | FloatType | StringType => true
    case _ => false
  }

  private[sources] def pushable(f: Filter, schema: StructType): Boolean = {
    def field(col: String): Option[StructField] = schema.find(_.name == col)
    def ok(col: String, vs: Any*): Boolean =
      field(col).exists(f => pushableType(f.dataType)) && vs.forall(_ != null)
    f match {
      case EqualTo(c, v) => ok(c, v)
      case GreaterThan(c, v) => ok(c, v)
      case GreaterThanOrEqual(c, v) => ok(c, v)
      case LessThan(c, v) => ok(c, v)
      case LessThanOrEqual(c, v) => ok(c, v)
      case In(c, vs) => vs.nonEmpty && ok(c, vs.toIndexedSeq: _*)
      case IsNull(c) => field(c).isDefined
      case IsNotNull(c) => field(c).isDefined
      case _ => false
    }
  }
}

class EventLogTable(path: String, schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"eventlog(`$path`)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventLogScanBuilder(path, schema0,
      options.getInt("partitions", 4),
      options.getLong("maxRowsPerTrigger", Long.MaxValue),
      Option(options.get("skipWhere"))
        .map(EventLogSkipWhere.parse(_, schema0)).getOrElse(Array.empty))
}

/** The `skipWhere` option: a conjunction of simple predicates the
  * reader uses for STATISTICS-ONLY row-group skipping. This is the
  * STREAMING pushdown path — Spark's `MicroBatchExecution` builds a
  * micro-batch scan as `newScanBuilder(options).build()` with no
  * Catalyst pushdown (`V2ScanRelationPushDown` matches batch relations
  * only, verified against Spark 4.1), so a predicate can only reach a
  * streaming scan through the options map. Users can set it by hand;
  * with [[graft.GraftExtensions]] active, the analyzer rule
  * `EventLogStreamPushDown` injects it automatically from the query's
  * own `filter(...)` over the log relation.
  *
  * The option is a SKIP HINT, not a filter: rows in groups that
  * survive skipping are NOT filtered by it (the query's own residual
  * predicate does that), so the option must be IMPLIED by the query's
  * predicates — which the automatic rule guarantees by construction.
  * Grammar: `AND`-joined `col op literal` (`=`, `<`, `<=`, `>`, `>=`,
  * `IN`, `IS NULL`, `IS NOT NULL`) over flat int/long/float/double/
  * string columns; anything else is dropped (never an error — a
  * dropped conjunct only costs skipped IO).
  */
object EventLogSkipWhere {
  import org.apache.spark.sql.catalyst.{expressions => ce}
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

  def render(filters: Seq[Filter]): String = filters.map(one).mkString(" AND ")

  // scientific notation forces the SQL lexer to read the literal back
  // as a DOUBLE (plain decimals become exact DECIMAL literals)
  private def sci(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }
  private def lit(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: java.lang.Double => sci(d)
    case f: java.lang.Float => sci(f.toDouble)
    case n => n.toString
  }
  private def one(f: Filter): String = f match {
    case EqualTo(c, v) => s"`$c` = ${lit(v)}"
    case GreaterThan(c, v) => s"`$c` > ${lit(v)}"
    case GreaterThanOrEqual(c, v) => s"`$c` >= ${lit(v)}"
    case LessThan(c, v) => s"`$c` < ${lit(v)}"
    case LessThanOrEqual(c, v) => s"`$c` <= ${lit(v)}"
    case In(c, vs) => s"`$c` IN (${vs.map(lit).mkString(", ")})"
    case IsNull(c) => s"`$c` IS NULL"
    case IsNotNull(c) => s"`$c` IS NOT NULL"
    case other =>
      throw new IllegalArgumentException(s"eventlog: unrenderable filter $other")
  }

  def parse(sql: String, schema: StructType): Array[Filter] = {
    val e = try CatalystSqlParser.parseExpression(sql) catch {
      case ex: Exception =>
        throw new IllegalArgumentException(s"eventlog: unparseable skipWhere: $sql", ex)
    }
    conjuncts(e).flatMap(toV1(_, schema))
      .filter(EventLogTable.pushable(_, schema)).toArray
  }

  def conjuncts(e: ce.Expression): Seq[ce.Expression] = e match {
    case ce.And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def attrOf(e: ce.Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.name)
    case a: ce.AttributeReference => Some(a.name)
    // the analyzer widens e.g. INT columns compared to LONG literals;
    // all widenings between our numeric pushable types are monotone
    // injections, so comparing the UNDERLYING column against an
    // exactly-convertible literal is equivalent
    case c: ce.Cast => attrOf(c.child)
    case _ => None
  }
  private def litOf(e: ce.Expression): Option[Any] = e match {
    case ce.Literal(v, _) if v != null => Some(v)
    case c: ce.Cast => litOf(c.child)
    case _ => None
  }

  /** Literal → the COLUMN's Scala type, exact or not at all: a lossy
    * conversion here could make a skip hint drop rows the residual
    * predicate wanted, so any inexact value drops the conjunct instead.
    */
  private def cast(raw: Any, target: DataType): Option[Any] = {
    val v = raw match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case x => x
    }
    def exactLong(n: java.lang.Number): Option[Long] = n match {
      case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short |
           _: java.lang.Byte => Some(n.longValue())
      case bd: java.math.BigDecimal =>
        try Some(bd.longValueExact()) catch { case _: ArithmeticException => None }
      case _ => None
    }
    (v, target) match {
      case (s: String, StringType) => Some(s)
      case (n: java.lang.Number, IntegerType) =>
        exactLong(n).filter(l => l >= Int.MinValue && l <= Int.MaxValue).map(_.toInt)
      case (n: java.lang.Number, LongType) => exactLong(n)
      case (n: java.lang.Number, DoubleType) => n match {
        case _: java.lang.Double | _: java.lang.Float => Some(n.doubleValue())
        case _ => exactLong(n).filter(l => l.toDouble.toLong == l).map(_.toDouble)
      }
      case (n: java.lang.Number, FloatType) => n match {
        case d: java.lang.Double =>
          Some(d.floatValue()).filter(_.toDouble == d.doubleValue())
        case f: java.lang.Float => Some(f.floatValue())
        case _ => exactLong(n).filter(l => l.toFloat.toLong == l).map(_.toFloat)
      }
      case _ => None
    }
  }

  /** One conjunct → a v1 skip filter, shared by the option parser
    * (unresolved attributes) and the analyzer rule (resolved ones).
    * Unknown shapes yield None — dropped, never an error.
    */
  def toV1(e: ce.Expression, schema: StructType): Option[Filter] = {
    def col(a: ce.Expression): Option[(String, DataType)] =
      attrOf(a).flatMap(n => schema.find(_.name == n).map(f => (f.name, f.dataType)))
    def cmp(a: ce.Expression, l: ce.Expression)(
        mk: (String, Any) => Filter): Option[Filter] =
      for {
        (n, dt) <- col(a)
        raw <- litOf(l)
        v <- cast(raw, dt)
      } yield mk(n, v)
    e match {
      case ce.EqualTo(a, l) if litOf(l).isDefined => cmp(a, l)(EqualTo(_, _))
      case ce.EqualTo(l, a) if litOf(l).isDefined => cmp(a, l)(EqualTo(_, _))
      case ce.GreaterThan(a, l) if litOf(l).isDefined => cmp(a, l)(GreaterThan(_, _))
      case ce.GreaterThan(l, a) if litOf(l).isDefined => cmp(a, l)(LessThan(_, _))
      case ce.GreaterThanOrEqual(a, l) if litOf(l).isDefined =>
        cmp(a, l)(GreaterThanOrEqual(_, _))
      case ce.GreaterThanOrEqual(l, a) if litOf(l).isDefined =>
        cmp(a, l)(LessThanOrEqual(_, _))
      case ce.LessThan(a, l) if litOf(l).isDefined => cmp(a, l)(LessThan(_, _))
      case ce.LessThan(l, a) if litOf(l).isDefined => cmp(a, l)(GreaterThan(_, _))
      case ce.LessThanOrEqual(a, l) if litOf(l).isDefined =>
        cmp(a, l)(LessThanOrEqual(_, _))
      case ce.LessThanOrEqual(l, a) if litOf(l).isDefined =>
        cmp(a, l)(GreaterThanOrEqual(_, _))
      case ce.In(a, vs) if vs.nonEmpty && vs.forall(litOf(_).isDefined) =>
        col(a).flatMap { case (n, dt) =>
          val conv = vs.map(v => cast(litOf(v).get, dt))
          if (conv.forall(_.isDefined)) Some(In(n, conv.map(_.get).toArray)) else None
        }
      case ce.IsNull(a) => col(a).map(p => IsNull(p._1))
      case ce.IsNotNull(a) => col(a).map(p => IsNotNull(p._1))
      case _ => None
    }
  }
}

class EventLogScanBuilder(path: String, full: StructType, partitions: Int,
    maxRowsPerTrigger: Long, optionFilters: Array[Filter]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var accepted: Array[Filter] = optionFilters
  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }
  /** Accept stats-skippable predicates but return EVERY filter as
    * residual: the reader uses the accepted set only to skip row groups
    * whose footer statistics prove no row can match — Spark re-applies
    * the full predicate, so skipping is sound by construction. The
    * `skipWhere` option's filters (the streaming path — Catalyst never
    * calls this for micro-batch scans) are unioned in.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = (optionFilters ++
      filters.filter(EventLogTable.pushable(_, full))).distinct
    filters
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan =
    new EventLogScan(path, required, partitions, maxRowsPerTrigger, accepted)
}

class EventLogScan(path: String, required: StructType, partitions: Int,
    maxRowsPerTrigger: Long, filters: Array[Filter]) extends Scan with Batch {
  private val conf = new SerializableConfiguration(UtxoTable.hadoopConf())
  private lazy val segs =
    EventLogTable.refreshSegments(path, conf.value, Array.empty)
  override def readSchema(): StructType = required
  override def description(): String =
    s"EventLogScan(path=$path, partitions=$partitions, " +
      s"columns=${required.fieldNames.mkString(",")}" +
      (if (filters.isEmpty) ")" else s", skipFilters=${filters.mkString(",")})")
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    segs.flatMap { s =>
      (0 until partitions).flatMap { i =>
        val lo = EventLogTable.sliceStart(s.rows, i, partitions)
        val hi = EventLogTable.sliceStart(s.rows, i + 1, partitions)
        if (hi > lo)
          Some(EventLogInputPartition(s.file, lo, hi, required, filters): InputPartition)
        else None
      }
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(conf)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventLogMicroBatchStream(path, partitions, required, filters,
      maxRowsPerTrigger, conf)
}

/** Kafka-style offset: the vector of per-partition consumed chain
  * positions, PLUS the identity of the segment prefix those positions
  * refer to — `nseg` segments whose (name, rows) list hashes to `fp`.
  * A restarted query validates the fingerprint before trusting a
  * single row offset (see [[EventLogMicroBatchStream.deserializeOffset]]).
  */
case class EventLogOffset(ends: Array[Long], nseg: Int, fp: String) extends Offset {
  override def json(): String =
    s"""{"v":2,"nseg":$nseg,"fp":"$fp","ends":[${ends.mkString(",")}]}"""
  override def equals(o: Any): Boolean = o match {
    case e: EventLogOffset =>
      nseg == e.nseg && fp == e.fp && java.util.Arrays.equals(ends, e.ends)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(ends) * 31 + nseg * 7 + fp.hashCode
}

object EventLogOffset {
  private val Pat =
    """\{"v":2,"nseg":(\d+),"fp":"([0-9a-f]+)","ends":\[([\-0-9,]*)\]\}""".r

  /** Syntax-only parse; semantic validation (partition count, segment
    * fingerprint) happens in the stream, which knows the live log.
    */
  def parse(json: String): EventLogOffset = json.trim match {
    case Pat(nseg, fp, ends) =>
      EventLogOffset(
        if (ends.isEmpty) Array.empty[Long] else ends.split(',').map(_.toLong),
        nseg.toInt, fp)
    case s if s.startsWith("{\"ends\":") =>
      throw new IllegalArgumentException(
        "eventlog: checkpoint offset is in the pre-growth v1 format " +
          "(no segment fingerprint) — restart the query from a fresh " +
          "checkpoint; v1 offsets cannot be validated against the log")
    case other =>
      throw new IllegalArgumentException(s"eventlog: unparseable offset JSON: $other")
  }
}

class EventLogMicroBatchStream(path: String, nPart: Int, required: StructType,
    filters: Array[Filter], maxRowsPerTrigger: Long, conf: SerializableConfiguration)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Live segment table: refreshed (one FS listing + footers for new
    * files only) at construction, per `latestOffset` trigger, and on
    * demand in `deserializeOffset`. Grows monotonically — the
    * append-only contract is validated on every refresh.
    */
  @volatile private var segs: Array[SegMeta] =
    EventLogTable.refreshSegments(path, conf.value, Array.empty)

  private def refresh(): Unit = synchronized {
    segs = EventLogTable.refreshSegments(path, conf.value, segs)
  }

  /** Trigger.AvailableNow (S13 shape): snapshot the drain target —
    * chain lengths AND segment count — at query start, then keep
    * honoring the per-trigger admission limit until the snapshot is
    * reached. Segments appended after the snapshot are left for the
    * next incarnation; WITHOUT this hook Spark's wrapper drains a
    * non-implementing source in one unbounded batch, which defeats the
    * backfill mode's point (bounded batches over a bounded snapshot).
    */
  @volatile private var availableNow: Option[(Array[SegMeta], Array[Long])] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    refresh()
    val snap = segs
    availableNow = Some((snap, EventLogTable.chainLengths(snap, nPart)))
  }

  private def offsetOver(segSnapshot: Array[SegMeta], ends: Array[Long]): EventLogOffset =
    EventLogOffset(ends, segSnapshot.length,
      EventLogTable.fingerprint(segSnapshot.toIndexedSeq))

  override def initialOffset(): Offset = offsetOver(segs, Array.fill(nPart)(0L))

  /** Validate BEFORE trusting: partition count, then segment-prefix
    * identity. `ends` are positions in per-partition chains over the
    * first `nseg` segments; if that prefix is not bit-identical
    * ((name, rows) fingerprint) to the live log's, resuming would map
    * committed offsets onto different rows — fail loudly instead.
    */
  override def deserializeOffset(json: String): Offset = {
    val o = EventLogOffset.parse(json)
    if (o.ends.length != nPart)
      throw new IllegalStateException(
        s"eventlog checkpoint has ${o.ends.length} partitions but the source " +
          s"is configured with $nPart — the partition map must not change " +
          "under a running checkpoint (`partitions` option changed)")
    if (o.nseg > segs.length) refresh()
    if (o.nseg > segs.length)
      throw new IllegalStateException(
        s"eventlog checkpoint was formed over ${o.nseg} segments but the log " +
          s"now has ${segs.length} — the log is append-only; segments must " +
          "never be removed under a checkpoint")
    val liveFp = EventLogTable.fingerprint(segs.take(o.nseg).toIndexedSeq)
    if (liveFp != o.fp)
      throw new IllegalStateException(
        s"eventlog checkpoint fingerprint ${o.fp} does not match the live " +
          s"log's first ${o.nseg} segments ($liveFp) — the consumed segment " +
          "prefix changed identity (a segment was replaced, renamed, " +
          "reordered, or rewritten); resuming would silently map committed " +
          "row offsets onto different rows, so failing loudly instead")
    o
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxRowsPerTrigger)

  /** Admission control: re-list the log (admitting appended segments),
    * then spread the row quota over partitions with remaining rows in
    * equal deterministic shares (re-leveling until the quota or the
    * log is exhausted — a drained partition's share re-spreads to the
    * others, like Kafka's proportional allocation). Under an
    * AvailableNow snapshot the target is the snapshot, not the live
    * log, and no re-list happens.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val (segSnapshot, lengths) = availableNow match {
      case Some((snapSegs, snapLens)) => (snapSegs, snapLens)
      case None =>
        refresh()
        val s = segs
        (s, EventLogTable.chainLengths(s, nPart))
    }
    val from = start.asInstanceOf[EventLogOffset].ends
    limit match {
      case _: ReadAllAvailable => offsetOver(segSnapshot, lengths.clone())
      case r: ReadMaxRows =>
        val ends = from.clone()
        var left = r.maxRows()
        var active = ends.indices.filter(i => ends(i) < lengths(i))
        while (left > 0 && active.nonEmpty) {
          val share = math.max(1L, left / active.size)
          active.foreach { i =>
            if (left > 0) {
              val take = math.min(share, math.min(left, lengths(i) - ends(i)))
              ends(i) += take
              left -= take
            }
          }
          active = ends.indices.filter(i => ends(i) < lengths(i))
        }
        offsetOver(segSnapshot, ends)
      case other =>
        throw new UnsupportedOperationException(s"eventlog: read limit $other")
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "eventlog implements SupportsAdmissionControl; latestOffset(start, limit) is the path")

  override def reportLatestOffset(): Offset = {
    val s = segs
    offsetOver(s, EventLogTable.chainLengths(s, nPart))
  }

  /** Tile [start, end) into per-file row ranges. The end offset's
    * segment prefix is authoritative (`segs` is always a superset by
    * the append-only invariant; a restart validated the fingerprint in
    * `deserializeOffset`), so a committed batch re-plans bit-identically
    * even when the log has since grown.
    */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[EventLogOffset].ends
    val e = end.asInstanceOf[EventLogOffset]
    if (e.nseg > segs.length) refresh()
    val endSegs = segs.take(e.nseg)
    (0 until nPart).flatMap { i =>
      if (e.ends(i) > a(i))
        EventLogTable.mapChainRange(endSegs, nPart, i, a(i), e.ends(i)).map {
          case (file, lo, hi) =>
            EventLogInputPartition(file, lo, hi, required, filters): InputPartition
        }
      else Nil
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One micro-batch slice of one partition chain: absolute rows [lo, hi)
  * of a segment file, the pruned output schema, and the stats-skippable
  * pushed predicates.
  */
case class EventLogInputPartition(file: String, lo: Long, hi: Long,
    required: StructType, filters: Array[Filter]) extends InputPartition

class EventLogReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventLogInputPartition]
    // the metadata-only count shortcut is sound ONLY with no predicate
    if (p.required.isEmpty && p.filters.isEmpty) new EventLogCountReader(p.hi - p.lo)
    else new EventLogPartitionReader(p.file, p.lo, p.hi, p.required, p.filters, conf.value)
  }
}

/** Fully-pruned projection (e.g. `count(*)`): the row count is footer
  * metadata — emit empty rows without touching a data page.
  */
class EventLogCountReader(n: Long) extends PartitionReader[InternalRow] {
  private var left = n
  private val row = new GenericInternalRow(0)
  override def next(): Boolean = left > 0 && { left -= 1; true }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Range decode of one segment: random-access to the row groups the
  * range overlaps, requested-schema pushdown for the pruned columns,
  * min/max-statistics skipping of groups a pushed predicate proves
  * empty (their pages are never read), parquet-mr record assembly,
  * per-column writers precomputed once.
  */
class EventLogPartitionReader(file: String, lo: Long, hi: Long,
    required: StructType, filters: Array[Filter],
    conf: Configuration) extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
  import org.apache.parquet.io.ColumnIOFactory

  private val reader = ParquetFileReader.open(conf, new Path(file))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  // projected schema in OUTPUT order: group field i == output column i
  private val projected = new MessageType(fileSchema.getName,
    required.fieldNames.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
  reader.setRequestedSchema(projected)

  /** µs normalization factor per column (see class doc): how to turn
    * the raw parquet value into the Spark internal value.
    */
  private val writers: Array[(Group, Int) => Any] =
    required.fieldNames.map { n =>
      val p = projected.getType(projected.getFieldIndex(n)).asPrimitiveType()
      p.getPrimitiveTypeName match {
        case PrimitiveType.PrimitiveTypeName.INT64 =>
          p.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit match {
                case LogicalTypeAnnotation.TimeUnit.MICROS =>
                  (g: Group, i: Int) => g.getLong(i, 0)
                case LogicalTypeAnnotation.TimeUnit.NANOS =>
                  (g: Group, i: Int) => Math.floorDiv(g.getLong(i, 0), 1000L)
                case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                  (g: Group, i: Int) => Math.multiplyExact(g.getLong(i, 0), 1000L)
              }
            case _ => (g: Group, i: Int) => g.getLong(i, 0)
          }
        case PrimitiveType.PrimitiveTypeName.INT32 =>
          (g: Group, i: Int) => g.getInteger(i, 0)
        case PrimitiveType.PrimitiveTypeName.INT96 =>
          // 12 bytes little-endian: nanos-of-day (8) + Julian day (4);
          // epoch 1970-01-01 = Julian day 2,440,588. Modern values only
          // (no pre-Gregorian rebase — same stance as Spark's CORRECTED
          // datetime rebase mode).
          (g: Group, i: Int) => {
            val b = java.nio.ByteBuffer.wrap(g.getInt96(i, 0).getBytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nanosOfDay = b.getLong
            val julianDay = b.getInt
            (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
          }
        case PrimitiveType.PrimitiveTypeName.DOUBLE =>
          (g: Group, i: Int) => g.getDouble(i, 0)
        case PrimitiveType.PrimitiveTypeName.FLOAT =>
          (g: Group, i: Int) => g.getFloat(i, 0)
        case PrimitiveType.PrimitiveTypeName.BOOLEAN =>
          (g: Group, i: Int) => g.getBoolean(i, 0)
        case PrimitiveType.PrimitiveTypeName.BINARY =>
          p.getLogicalTypeAnnotation match {
            case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
              (g: Group, i: Int) => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
            case _ => (g: Group, i: Int) => g.getBinary(i, 0).getBytes
          }
        case other =>
          throw new IllegalArgumentException(s"eventlog: unsupported primitive $other")
      }
    }

  private val blocks = reader.getFooter.getBlocks

  // row groups overlapping [lo, hi), with each group's first global row
  private val groups: Array[(Int, Long, Long)] = {
    var first = 0L
    (0 until blocks.size).flatMap { gi =>
      val n = blocks.get(gi).getRowCount
      val r = if (first + n > lo && first < hi) Some((gi, first, n)) else None
      first += n
      r
    }.toArray
  }

  /** True when footer statistics PROVE no row of the group can satisfy
    * some pushed predicate. Conservative: unknown or absent statistics
    * never skip. Spark re-applies every filter, so a false negative
    * costs IO only and a false positive is impossible by construction
    * (each rule is a necessary condition for a match to exist).
    */
  private def provablyEmpty(block: BlockMetaData): Boolean = {
    import org.apache.parquet.column.statistics._
    filters.exists { f =>
      def chunk(col: String) = {
        val it = block.getColumns.iterator()
        var found: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = null
        while (found == null && it.hasNext) {
          val c = it.next()
          if (c.getPath.toDotString == col) found = c
        }
        Option(found)
      }
      // unsigned-lexicographic byte compare — parquet's BINARY(UTF8)
      // statistics ordering, NOT Java String compareTo (which is UTF-16
      // code-unit order and diverges on supplementary characters)
      def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val d = (a(i) & 0xFF) - (b(i) & 0xFF)
          if (d != 0) return d
          i += 1
        }
        a.length - b.length
      }
      /** (cmp(min, v), cmp(max, v)) when stats carry a usable range. */
      def range(col: String, v: Any): Option[(Int, Int)] =
        chunk(col).flatMap { c =>
          val st = c.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue) None
          else st match {
            case s: IntStatistics =>
              val x = v.asInstanceOf[Number].intValue()
              Some((Integer.compare(s.getMin, x), Integer.compare(s.getMax, x)))
            case s: LongStatistics =>
              val x = v.asInstanceOf[Number].longValue()
              Some((java.lang.Long.compare(s.getMin, x), java.lang.Long.compare(s.getMax, x)))
            case s: DoubleStatistics =>
              val x = v.asInstanceOf[Number].doubleValue()
              if (x.isNaN) None
              else Some((java.lang.Double.compare(s.getMin, x), java.lang.Double.compare(s.getMax, x)))
            case s: FloatStatistics =>
              val x = v.asInstanceOf[Number].floatValue()
              if (x.isNaN) None
              else Some((java.lang.Float.compare(s.getMin, x), java.lang.Float.compare(s.getMax, x)))
            case s: BinaryStatistics =>
              val x = v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
              Some((cmpBytes(s.genericGetMin.getBytes, x),
                cmpBytes(s.genericGetMax.getBytes, x)))
            case _ => None
          }
        }
      def allNull(col: String): Boolean = chunk(col).exists { c =>
        val st = c.getStatistics
        st != null && !st.isEmpty && st.isNumNullsSet &&
          st.getNumNulls == block.getRowCount
      }
      def noNulls(col: String): Boolean = chunk(col).exists { c =>
        val st = c.getStatistics
        st != null && !st.isEmpty && st.isNumNullsSet && st.getNumNulls == 0L
      }
      f match {
        case EqualTo(c, v) =>
          allNull(c) || range(c, v).exists { case (mn, mx) => mn > 0 || mx < 0 }
        case GreaterThan(c, v) =>
          allNull(c) || range(c, v).exists { case (_, mx) => mx <= 0 }
        case GreaterThanOrEqual(c, v) =>
          allNull(c) || range(c, v).exists { case (_, mx) => mx < 0 }
        case LessThan(c, v) =>
          allNull(c) || range(c, v).exists { case (mn, _) => mn >= 0 }
        case LessThanOrEqual(c, v) =>
          allNull(c) || range(c, v).exists { case (mn, _) => mn > 0 }
        case In(c, vs) =>
          allNull(c) || vs.forall(v =>
            range(c, v).exists { case (mn, mx) => mn > 0 || mx < 0 })
        case IsNull(c) => noNulls(c)
        case IsNotNull(c) => allNull(c)
        case _ => false
      }
    }
  }

  private var gIdx = 0
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var groupRowsLeft = 0L
  private var globalRow = 0L
  private val row = new GenericInternalRow(required.length)

  /** Advance to the next readable group overlapping [lo, hi):
    * statistics-skipped groups consume their row POSITIONS (offsets
    * stay exact) without ever reading a page. Returns true with a live
    * record reader positioned inside the range, false when exhausted.
    */
  private def openGroup(): Boolean = {
    while (gIdx < groups.length) {
      val (gi, first, n) = groups(gIdx)
      gIdx += 1
      if (first >= hi) return false
      if (filters.nonEmpty && provablyEmpty(blocks.get(gi))) {
        EventLogTable.Metrics.rowGroupsSkipped.incrementAndGet()
        globalRow = math.min(hi, first + n)
        groupRowsLeft = 0
      } else {
        EventLogTable.Metrics.rowGroupsRead.incrementAndGet()
        val pages = reader.readRowGroup(gi)
        recordReader = new ColumnIOFactory().getColumnIO(projected)
          .getRecordReader(pages, new GroupRecordConverter(projected))
        globalRow = first
        groupRowsLeft = n
        // skip (read-and-discard) the sub-range head — bounded by one group
        while (globalRow < lo && groupRowsLeft > 0) {
          recordReader.read()
          globalRow += 1
          groupRowsLeft -= 1
        }
        if (groupRowsLeft > 0 && globalRow < hi) return true
      }
    }
    false
  }

  override def next(): Boolean = {
    if (globalRow >= hi) return false
    if (recordReader == null || groupRowsLeft == 0) {
      if (!openGroup()) return false
    }
    val g = recordReader.read()
    globalRow += 1
    groupRowsLeft -= 1
    var i = 0
    while (i < writers.length) {
      row.update(i,
        if (g.getFieldRepetitionCount(i) == 0) null else writers(i)(g, i))
      i += 1
    }
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
