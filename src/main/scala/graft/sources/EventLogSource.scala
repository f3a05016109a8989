package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type => PType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Broker-free, Kafka-shaped streaming DataSource V2 (SURVEY.md §2.10
  * engine-inventory closure, r12 verdict item 4): a custom
  * [[MicroBatchStream]] with [[SupportsAdmissionControl]] over an
  * immutable set of parquet segments — the one Spark extension point
  * the engine had not exercised (batch DSv2, codegen Expressions,
  * optimizer Rule, commit protocol, UDTF, UDAF, transformWithState all
  * ship already).
  *
  * The log model mirrors Kafka's without a broker:
  *  - **partitions**: the segment files' row space is split into a
  *    fixed number of contiguous row ranges (option `partitions`,
  *    default 4), planned driver-side from parquet FOOTERS only — no
  *    data pages are read to plan. Like Kafka partitions, the count
  *    must not change under a running checkpoint; [[EventLogOffset]]
  *    deserialization validates it and fails loudly (not silently)
  *    on drift.
  *  - **offsets**: one monotone row position per partition. An offset
  *    is the vector of per-partition row counts consumed — exactly
  *    Kafka's per-partition offset map, JSON-serialized into Spark's
  *    offset log, so a killed query resumes from the committed vector
  *    (proved by EventLogSourceSpec's kill/restart test).
  *  - **rate limit / admission control**: `maxRowsPerTrigger` caps a
  *    micro-batch; the quota spreads across partitions with remaining
  *    rows in deterministic equal shares ([[SupportsAdmissionControl]]
  *    — the same surface Kafka's `maxOffsetsPerTrigger` uses).
  *  - **replayability**: a (start, end) offset pair always re-reads
  *    the identical rows — parquet row order inside a segment is
  *    immutable, ranges are footer-derived and deterministic. This is
  *    what the file-stream source CANNOT give (mtime-ordered admission,
  *    S15): the log source re-plans any committed batch bit-identically
  *    after a crash.
  *
  * Readers scan only the row groups overlapping their range
  * (`readRowGroup(i)` random access — a 100 TB log reads the groups a
  * batch touches, never the segment head), project only the pruned
  * columns (requested-schema pushdown to the parquet page reader), and
  * decode via parquet-mr's record assembly. Within the first
  * overlapping group, rows below the range start are skipped by
  * read-and-discard — bounded by one row group by construction.
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

object EventLogTable {
  /** Segment files of the log: one parquet file, or a directory of
    * them, resolved through the Hadoop FS (same discipline as
    * [[UtxoTable.expand]] — a distributed store lists identically).
    */
  def segments(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    def isSegment(name: String): Boolean =
      name.endsWith(".parquet") && !name.startsWith(".") && !name.startsWith("_")
    if (st.isDirectory)
      fs.listStatus(p).filter(s => s.isFile && isSegment(s.getPath.getName))
        .map(_.getPath.toString).sorted.toSeq
    else Seq(st.getPath.toString)
  }

  def fileSchema(path: String, conf: Configuration): MessageType = {
    val first = segments(path, conf).headOption.getOrElse(
      throw new IllegalArgumentException(s"eventlog: no parquet segments under $path"))
    val r = ParquetFileReader.open(conf, new Path(first))
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

  /** The fixed partition map: contiguous row ranges over the sorted
    * segment list, row counts from footers only. Deterministic for a
    * given (segment set, target) — the property checkpoint recovery
    * rests on.
    */
  def planRanges(path: String, target: Int, conf: Configuration): Array[LogRange] = {
    val files = segments(path, conf)
    val rows = files.map { f =>
      val r = ParquetFileReader.open(conf, new Path(f))
      try r.getRecordCount finally r.close()
    }
    val total = rows.sum
    val out = scala.collection.mutable.ArrayBuffer.empty[LogRange]
    files.zip(rows).foreach { case (f, n) =>
      // per-file share of the target, ≥1; ranges never span files
      val k = math.max(1, math.round(target.toDouble * n / math.max(1L, total)).toInt)
      (0 until k).foreach { i =>
        val lo = n * i / k
        val hi = n * (i + 1) / k
        if (hi > lo) out += LogRange(f, lo, hi)
      }
    }
    out.toArray
  }
}

case class LogRange(file: String, rowStart: Long, rowEnd: Long) {
  def length: Long = rowEnd - rowStart
}

class EventLogTable(path: String, schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"eventlog(`$path`)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventLogScanBuilder(path, schema0,
      options.getInt("partitions", 4),
      options.getLong("maxRowsPerTrigger", Long.MaxValue))
}

class EventLogScanBuilder(path: String, full: StructType, partitions: Int,
    maxRowsPerTrigger: Long) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }
  override def build(): Scan =
    new EventLogScan(path, required, partitions, maxRowsPerTrigger)
}

class EventLogScan(path: String, required: StructType, partitions: Int,
    maxRowsPerTrigger: Long) extends Scan with Batch {
  private val conf = new SerializableConfiguration(UtxoTable.hadoopConf())
  private lazy val ranges = EventLogTable.planRanges(path, partitions, conf.value)
  override def readSchema(): StructType = required
  override def description(): String =
    s"EventLogScan(path=$path, partitions=$partitions, " +
      s"columns=${required.fieldNames.mkString(",")})"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ranges.map(r =>
      EventLogInputPartition(r.file, r.rowStart, r.rowEnd, required): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(conf)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventLogMicroBatchStream(ranges, required, maxRowsPerTrigger, conf)
}

/** Kafka-style offset: the vector of per-partition consumed row counts. */
case class EventLogOffset(ends: Array[Long]) extends Offset {
  override def json(): String = ends.mkString("{\"ends\":[", ",", "]}")
  override def equals(o: Any): Boolean = o match {
    case e: EventLogOffset => java.util.Arrays.equals(ends, e.ends)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(ends)
}

object EventLogOffset {
  def parse(json: String, nPartitions: Int): EventLogOffset = {
    val body = json.trim.stripPrefix("{\"ends\":[").stripSuffix("]}")
    val ends =
      if (body.isEmpty) Array.empty[Long] else body.split(',').map(_.trim.toLong)
    require(ends.length == nPartitions,
      s"eventlog checkpoint has ${ends.length} partitions but the log now plans " +
        s"$nPartitions — the partition map must not change under a running " +
        s"checkpoint (segments added/removed or `partitions` option changed)")
    EventLogOffset(ends)
  }
}

class EventLogMicroBatchStream(ranges: Array[LogRange], required: StructType,
    maxRowsPerTrigger: Long, conf: SerializableConfiguration)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val lengths = ranges.map(_.length)

  /** Trigger.AvailableNow (S13 shape): snapshot the drain target at
    * query start, then keep honoring the per-trigger admission limit
    * until the snapshot is reached — WITHOUT this hook Spark's wrapper
    * drains a non-implementing source in one unbounded batch, which
    * defeats the backfill mode's point (bounded batches over a bounded
    * snapshot). The log is an immutable segment set, so the snapshot
    * is simply every partition's full length.
    */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = EventLogOffset(Array.fill(ranges.length)(0L))

  override def deserializeOffset(json: String): Offset =
    EventLogOffset.parse(json, ranges.length)

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxRowsPerTrigger)

  /** Admission control: spread the row quota over partitions with
    * remaining rows in equal deterministic shares (re-leveling until
    * the quota or the log is exhausted — a drained partition's share
    * re-spreads to the others, like Kafka's proportional allocation).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[EventLogOffset].ends
    limit match {
      case _: ReadAllAvailable => EventLogOffset(lengths.clone())
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
        EventLogOffset(ends)
      case other =>
        throw new UnsupportedOperationException(s"eventlog: read limit $other")
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "eventlog implements SupportsAdmissionControl; latestOffset(start, limit) is the path")

  override def reportLatestOffset(): Offset = EventLogOffset(lengths.clone())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[EventLogOffset].ends
    val b = end.asInstanceOf[EventLogOffset].ends
    ranges.indices.flatMap { i =>
      if (b(i) > a(i))
        Some(EventLogInputPartition(ranges(i).file,
          ranges(i).rowStart + a(i), ranges(i).rowStart + b(i), required): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EventLogReaderFactory(conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One micro-batch slice of one partition: absolute rows [lo, hi) of a
  * segment file, plus the pruned output schema.
  */
case class EventLogInputPartition(file: String, lo: Long, hi: Long,
    required: StructType) extends InputPartition

class EventLogReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventLogInputPartition]
    if (p.required.isEmpty) new EventLogCountReader(p.hi - p.lo)
    else new EventLogPartitionReader(p.file, p.lo, p.hi, p.required, conf.value)
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
  * parquet-mr record assembly, per-column writers precomputed once.
  */
class EventLogPartitionReader(file: String, lo: Long, hi: Long,
    required: StructType, conf: Configuration) extends PartitionReader[InternalRow] {
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

  // row groups overlapping [lo, hi), with each group's first global row
  private val groups: Array[(Int, Long, Long)] = {
    val blocks = reader.getFooter.getBlocks
    var first = 0L
    (0 until blocks.size).flatMap { gi =>
      val n = blocks.get(gi).getRowCount
      val r = if (first + n > lo && first < hi) Some((gi, first, n)) else None
      first += n
      r
    }.toArray
  }

  private var gIdx = 0
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var groupRowsLeft = 0L
  private var globalRow = 0L
  private val row = new GenericInternalRow(required.length)

  private def openGroup(): Boolean = {
    if (gIdx >= groups.length) return false
    val (gi, first, n) = groups(gIdx)
    gIdx += 1
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
    groupRowsLeft > 0 && globalRow < hi
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
