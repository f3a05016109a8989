package graft.tools

import scala.jdk.CollectionConverters._

/** Parquet physical-layout observability: per-file row groups, per-column
  * encodings, compressed/uncompressed sizes, and — given a hex value —
  * how many row groups a min/max-stats point lookup would have to read.
  *
  * The reference's query story rests on exactly this layout (sorted
  * scripts + small row groups + column stats → page/row-group skipping,
  * `/root/reference/src/main.rs:208-216`, README.md:105-107); this tool
  * makes the engine's output auditable the same way.
  *
  * Usage: runMain graft.tools.LayoutReport <parquetDir> [lookupScriptHex]
  */
object LayoutReport {

  final case class ColumnLayout(column: String, codec: String,
      encodings: Set[String], compressedBytes: Long, rawBytes: Long)

  final case class FileLayout(file: String, rows: Long, rowGroups: Int,
      rowGroupRows: Seq[Long], columns: Seq[ColumnLayout])

  def scan(dir: String): Seq[FileLayout] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val d = new java.io.File(dir)
    val parts = d.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.toSeq.map { part =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val byCol = blocks.flatMap(_.getColumns.asScala)
          .groupBy(_.getPath.toDotString)
          .map { case (col, chunks) =>
            ColumnLayout(col,
              chunks.head.getCodec.toString,
              chunks.flatMap(_.getEncodings.asScala.map(_.toString)).toSet,
              chunks.map(_.getTotalSize).sum,
              chunks.map(_.getTotalUncompressedSize).sum)
          }.toSeq.sortBy(_.column)
        FileLayout(part.getName, blocks.map(_.getRowCount).sum, blocks.size,
          blocks.map(_.getRowCount), byCol)
      } finally reader.close()
    }
  }

  /** Count (rowGroupsTotal, rowGroupsMatching) for a binary point value
    * on `column` using footer min/max stats — the skipping a stats-aware
    * reader achieves on this layout.
    */
  def statsMatch(dirOrFile: String, column: String, valueHex: String): (Int, Int) = {
    val target = graft.codec.Hex.decode(valueHex)
    countRowGroups(dirOrFile, column) { (_, _, col) =>
      val st = col.getStatistics
      val cmp = graft.codec.UnsignedBytes
      cmp(st.getMinBytes, target) <= 0 && cmp(target, st.getMaxBytes) <= 0
    }
  }

  /** Shared per-row-group walk: counts (total, groups where `possible`
    * holds) for `column` over every .parquet part of a dir or a single
    * file. All point-value counters differ only in the predicate.
    */
  private def countRowGroups(dirOrFile: String, column: String)(
      possible: (org.apache.parquet.hadoop.ParquetFileReader,
        org.apache.parquet.hadoop.metadata.BlockMetaData,
        org.apache.parquet.hadoop.metadata.ColumnChunkMetaData) => Boolean): (Int, Int) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val d = new java.io.File(dirOrFile)
    val parts =
      if (d.isDirectory) d.listFiles().filter(_.getName.endsWith(".parquet"))
      else Array(d)
    var total = 0
    var n = 0
    parts.foreach { part =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf))
      try reader.getFooter.getBlocks.asScala.foreach { b =>
        total += 1
        val col = b.getColumns.asScala.find(_.getPath.toDotString == column)
          .getOrElse(throw new IllegalArgumentException(
            s"column $column not in ${part.getName}"))
        if (possible(reader, b, col)) n += 1
      } finally reader.close()
    }
    (total, n)
  }

  /** Count (rowGroupsTotal, rowGroupsPossible) for a binary point value
    * on `column` using the split-block bloom filters written by
    * `UtxoConvert(bloomFilterScript = true)` — the exact-membership
    * skip a bloom-aware reader (parquet-mr / Spark, DuckDB ≥ 1.2)
    * achieves on the PLAIN layout, where every file spans the full key
    * range and min/max stats leave ~one candidate row group per file.
    * A row group with no bloom filter on the column counts as possible
    * (a reader cannot skip what it cannot test).
    */
  def bloomMatch(dirOrFile: String, column: String, valueHex: String): (Int, Int) = {
    val target = graft.codec.Hex.decode(valueHex)
    countRowGroups(dirOrFile, column) { (reader, b, col) =>
      val bf = reader.getBloomFilterDataReader(b).readBloomFilter(col)
      bf == null ||
        bf.findHash(bf.hash(org.apache.parquet.io.api.Binary.fromConstantByteArray(target)))
    }
  }

  /** Count (rowGroupsTotal, rowGroupsOverlapping) for a binary range
    * [loHex, hiHex) on `column` using footer min/max stats — what a
    * stats-aware reader skips for a sargable range predicate (e.g. the
    * prefix ranges ScriptClassPrefixRule injects for class queries).
    */
  def statsRangeMatch(dirOrFile: String, column: String,
      loHex: String, hiHex: String): (Int, Int) = {
    val lo = graft.codec.Hex.decode(loHex)
    val hi = graft.codec.Hex.decode(hiHex)
    countRowGroups(dirOrFile, column) { (_, _, col) =>
      val st = col.getStatistics
      val cmp = graft.codec.UnsignedBytes
      // row group [min, max] overlaps [lo, hi) iff max >= lo && min < hi
      cmp(st.getMaxBytes, lo) >= 0 && cmp(st.getMinBytes, hi) < 0
    }
  }

  /** Count (rowGroupsTotal, rowGroupsOverlapping) for a LONG-typed
    * column range [lo, hi) using footer min/max stats — the row-group
    * skipping a reader achieves for integer range predicates (used by
    * the Z-order layout spec to measure per-dimension skipping).
    */
  def longStatsRange(dirOrFile: String, column: String, lo: Long, hi: Long): (Int, Int) =
    countRowGroups(dirOrFile, column) { (_, _, col) =>
      val st = col.getStatistics
      val min = st.genericGetMin.asInstanceOf[Number].longValue
      val max = st.genericGetMax.asInstanceOf[Number].longValue
      max >= lo && min < hi
    }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    scan(dir).foreach { f =>
      println(s"${f.file}: rows=${f.rows} rowGroups=${f.rowGroups}")
      f.columns.foreach { c =>
        println(f"  ${c.column}%-10s ${c.codec}%-6s comp=${c.compressedBytes}%10d raw=${c.rawBytes}%10d enc=${c.encodings.mkString(",")}")
      }
    }
    if (args.length > 1) {
      val (total, matching) = statsMatch(dir, "script", args(1))
      println(s"point-lookup stats: $matching of $total row groups match")
    }
  }
}
