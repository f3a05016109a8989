package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.parquet.format.{ConvertedType, IntType, LogicalType, SortingColumn, Util}

/** Post-write footer rewrite stamping `sorting_columns` into every row
  * group's metadata — the reference writes this field natively
  * (`/root/reference/src/main.rs:212`) but Spark's public writer API
  * cannot, so the convert re-opens each local output file and rewrites
  * the thrift footer in place (the data pages are untouched; only the
  * tail [footer][len][PAR1] is re-serialized).
  *
  * Two paths, same footer mutation:
  *  - [[stamp]]/[[stampFile]]: in-place tail rewrite via
  *    `RandomAccessFile` — zero data movement, local files only (the
  *    convert's default for `file://` outputs).
  *  - [[stampFs]]/[[stampFsFile]]: Hadoop-`FileSystem` copy-rewrite —
  *    stream the data pages to a staged sibling, append the rewritten
  *    footer, publish with the `s_upsert` rename idiom (live → _old,
  *    stage → live, drop _old; crash-recoverable at every step). Works
  *    on HDFS/S3A/any Hadoop FS, where an in-place truncate either
  *    doesn't exist (object stores) or rewrites a whole block anyway.
  *    Without this path the sortingColumns/UINT_64 stamp silently did
  *    not apply off the local FS — a layout regression at exactly the
  *    scale the engine targets.
  * Readers that exploit sortedness (DuckDB, query planners) read the
  * field; readers that don't ignore it — stamped files stay fully
  * compatible.
  */
object FooterSort {

  private val MagicTail = "PAR1".getBytes("US-ASCII")

  /** The shared footer mutation: parse the thrift footer, stamp
    * sorting_columns on every row group (and optionally UINT_64
    * annotations + Spark row.metadata drop), re-serialize.
    */
  private def rewriteFooter(footerBytes: Array[Byte], sortedBy: Seq[String],
      unsigned: Seq[String]): Array[Byte] = {
    val md = Util.readFileMetaData(new java.io.ByteArrayInputStream(footerBytes))
    // SchemaElement list is depth-first with the root first; the schema
    // is flat, so leaves are elements 1..N in column order
    val leaves = md.getSchema.asScala.drop(1).map(_.getName).toIndexedSeq
    val cols = sortedBy.map { c =>
      val i = leaves.indexOf(c)
      require(i >= 0, s"sort column $c not in schema $leaves")
      new SortingColumn(i, false, false)
    }
    md.getRow_groups.asScala.foreach(_.setSorting_columns(cols.asJava))

    if (unsigned.nonEmpty) {
      val uint64 = new LogicalType()
      uint64.setINTEGER(new IntType(64.toByte, false))
      md.getSchema.asScala.drop(1).foreach { se =>
        if (unsigned.contains(se.getName)) {
          se.setConverted_type(ConvertedType.UINT_64)
          se.setLogicalType(uint64)
        }
      }
      // drop Spark's embedded row.metadata: it still says LONG, and a
      // reader that trusts it over the (now unsigned) parquet types
      // crashes on dictionary pages expecting a decimal conversion.
      // Removing it also matches the reference file byte-for-byte in
      // spirit — no engine-private schema, parquet types are the truth.
      if (md.getKey_value_metadata != null) {
        val filtered = md.getKey_value_metadata.asScala
          .filterNot(_.getKey == "org.apache.spark.sql.parquet.row.metadata")
        md.setKey_value_metadata(filtered.asJava)
      }
    }

    val out = new java.io.ByteArrayOutputStream(footerBytes.length + 64)
    Util.writeFileMetaData(md, out)
    out.toByteArray
  }

  /** Stamp all .parquet files in `dir`; returns files stamped.
    *
    * `unsigned` columns additionally get the UINT_64 logical/converted
    * annotation on their INT64 leaves — the reference schema declares
    * vout/height/amount as UInt64 (`/root/reference/src/main.rs:199-206`)
    * and DuckDB surfaces them as `uint64`, but Spark's writer cannot
    * annotate unsigned. Safe as a pure footer rewrite: every annotated
    * value is non-negative, so the signed byte order the pages and
    * min/max statistics were written with coincides with the unsigned
    * order — data pages, dictionaries, and stats all stay valid.
    */
  def stamp(dir: String, sortedBy: Seq[String],
      unsigned: Seq[String] = Seq.empty): Int = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    files.foreach(stampFile(_, sortedBy, unsigned))
    files.length
  }

  def stampFile(f: java.io.File, sortedBy: Seq[String],
      unsigned: Seq[String] = Seq.empty): Unit = {
    val raf = new java.io.RandomAccessFile(f, "rw")
    try {
      val len = raf.length()
      raf.seek(len - 8)
      val tail = new Array[Byte](8)
      raf.readFully(tail)
      require(tail.slice(4, 8).sameElements(MagicTail), s"not a parquet file: $f")
      val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      val footerStart = len - 8 - footerLen
      raf.seek(footerStart)
      val footerBytes = new Array[Byte](footerLen)
      raf.readFully(footerBytes)
      val newFooter = rewriteFooter(footerBytes, sortedBy, unsigned)
      raf.seek(footerStart)
      raf.write(newFooter)
      raf.write(Array[Byte](
        (newFooter.length & 0xff).toByte,
        ((newFooter.length >> 8) & 0xff).toByte,
        ((newFooter.length >> 16) & 0xff).toByte,
        ((newFooter.length >> 24) & 0xff).toByte))
      raf.write(MagicTail)
      raf.setLength(footerStart + newFooter.length + 8)
    } finally raf.close()
    // the rewrite invalidates Hadoop's local CRC sidecar; drop it (the
    // LocalFileSystem reads fine without one — same as any externally
    // produced file)
    val crc = new java.io.File(f.getParentFile, "." + f.getName + ".crc")
    if (crc.exists()) crc.delete()
  }

  /** DFS-safe stamp: all `.parquet` files under `dir` through the
    * Hadoop `FileSystem` for `dir`'s scheme. Returns files stamped.
    */
  def stampFs(conf: org.apache.hadoop.conf.Configuration, dir: String,
      sortedBy: Seq[String], unsigned: Seq[String] = Seq.empty): Int = {
    import org.apache.hadoop.fs.Path
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val listed = fs.listStatus(d)
    // orphan recovery BEFORE listing the work set: a prior stamp that
    // died between its two publish renames leaves only `x.parquet._old`
    // — without this sweep the live name isn't listed and the file
    // would silently never be recovered or stamped
    listed.filter(st => st.isFile && st.getPath.getName.endsWith("._old"))
      .foreach { st =>
        val live = new Path(d, st.getPath.getName.stripSuffix("._old"))
        if (!fs.exists(live)) {
          if (!fs.rename(st.getPath, live))
            throw new java.io.IOException(s"orphan recovery ${st.getPath} -> $live failed")
        }
      }
    // ... and sweep staging leftovers: a stamp that died mid-copy (or
    // whose publish rename failed) leaves `.<name>.stamp.tmp` behind —
    // hidden from parquet readers, but on object stores billed per
    // object it accumulates forever, and no later stamp of a DIFFERENT
    // file would ever clean it
    listed.filter(st => st.isFile && st.getPath.getName.endsWith(".stamp.tmp"))
      .foreach(st => fs.delete(st.getPath, false))
    val files = fs.listStatus(d)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    files.foreach(st => stampFsFile(conf, st.getPath, sortedBy, unsigned))
    files.length
  }

  /** Copy-rewrite one file through the Hadoop `FileSystem` API: stream
    * the data pages (bounded buffer, never whole-file memory) into a
    * staged sibling, append the rewritten footer + length + magic, then
    * publish with the two-rename idiom (live → `_old`, stage → live,
    * drop `_old`) — the same crash-recoverable publish `s_upsert` uses,
    * because plain `rename` over an existing destination fails on HDFS
    * and nothing on an object store truncates in place. A crash between
    * the renames leaves `_old` as the only complete copy; the recovery
    * preamble restores it before restaging, so no crash point loses the
    * file.
    */
  def stampFsFile(conf: org.apache.hadoop.conf.Configuration,
      file: org.apache.hadoop.fs.Path, sortedBy: Seq[String],
      unsigned: Seq[String] = Seq.empty): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = file.getFileSystem(conf)
    val old = new Path(file.getParent, file.getName + "._old")
    // crash recovery FIRST: a prior stamp that died after `live → _old`
    // left `_old` as the only complete copy — restore it before reading
    if (!fs.exists(file) && fs.exists(old)) {
      if (!fs.rename(old, file))
        throw new java.io.IOException(s"recovery rename $old -> $file failed")
    } else if (fs.exists(old)) {
      fs.delete(old, false) // stale leftover from a completed publish
    }
    val len = fs.getFileStatus(file).getLen
    require(len > 12, s"not a parquet file: $file")
    val stage = new Path(file.getParent, "." + file.getName + ".stamp.tmp")
    val in = fs.open(file)
    try {
      val tail = new Array[Byte](8)
      in.readFully(len - 8, tail)
      require(tail.slice(4, 8).sameElements(MagicTail), s"not a parquet file: $file")
      val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      val footerStart = len - 8 - footerLen
      val footerBytes = new Array[Byte](footerLen)
      in.readFully(footerStart, footerBytes)
      val newFooter = rewriteFooter(footerBytes, sortedBy, unsigned)

      in.seek(0)
      val out = fs.create(stage, true)
      try {
        val buf = new Array[Byte](1 << 20)
        var remaining = footerStart
        while (remaining > 0) {
          val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          require(n > 0, s"unexpected EOF copying $file at ${footerStart - remaining}")
          out.write(buf, 0, n)
          remaining -= n
        }
        out.write(newFooter)
        out.write(Array[Byte](
          (newFooter.length & 0xff).toByte,
          ((newFooter.length >> 8) & 0xff).toByte,
          ((newFooter.length >> 16) & 0xff).toByte,
          ((newFooter.length >> 24) & 0xff).toByte))
        out.write(MagicTail)
      } finally out.close()
    } finally in.close()
    // publish: live → _old, stage → live, drop _old. Failure paths
    // drop the staged copy — a completed-but-unpublished stage is just
    // a re-derivable artifact, and leaving it behind leaks storage
    if (!fs.rename(file, old)) {
      fs.delete(stage, false)
      throw new java.io.IOException(s"publish rename $file -> $old failed")
    }
    if (!fs.rename(stage, file)) {
      fs.rename(old, file) // best-effort rollback to the unstamped copy
      fs.delete(stage, false)
      throw new java.io.IOException(s"publish rename $stage -> $file failed")
    }
    fs.delete(old, false)
  }

  /** Stamp a task-owned STAGED file — one that is not yet committed or
    * visible to readers. This is the path that lets the stamp ride the
    * convert itself ([[graft.sources.StampingCommitProtocol]]): each
    * write task stamps its own staged outputs inside `commitTask`,
    * while the task still owns the bytes, so a 100 TB convert is never
    * re-read and re-written a second time (the standalone `stampFs`
    * copy-rewrite is probe-measured at 12× the in-place cost).
    *
    *  - FS advertises truncate+append path capabilities (HDFS, raw
    *    local): in-place tail rewrite — truncate off the old footer,
    *    append the new one. Zero data movement. The capability probe
    *    runs BEFORE any mutation, so an unsupported store never sees a
    *    half-truncated file.
    *  - otherwise (object stores): stream the data pages once to a
    *    sibling and swap. Still pre-commit and executor-distributed.
    *
    * No publish/rollback dance on either path: a crash mid-stamp just
    * fails the task attempt and Spark restages the whole file.
    */
  def stampStaged(conf: org.apache.hadoop.conf.Configuration,
      file: org.apache.hadoop.fs.Path, sortedBy: Seq[String],
      unsigned: Seq[String]): Unit =
    stampStaged(file.getFileSystem(conf), file, sortedBy, unsigned)

  def stampStaged(fs: org.apache.hadoop.fs.FileSystem,
      file: org.apache.hadoop.fs.Path, sortedBy: Seq[String],
      unsigned: Seq[String]): Unit = {
    import org.apache.hadoop.fs.{CommonPathCapabilities, Path}
    val len = fs.getFileStatus(file).getLen
    require(len > 12, s"not a parquet file: $file")
    val in = fs.open(file)
    val (footerStart, newFooter) =
      try {
        val tail = new Array[Byte](8)
        in.readFully(len - 8, tail)
        require(tail.slice(4, 8).sameElements(MagicTail), s"not a parquet file: $file")
        val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
          ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
        val fStart = len - 8 - footerLen
        val footerBytes = new Array[Byte](footerLen)
        in.readFully(fStart, footerBytes)
        (fStart, rewriteFooter(footerBytes, sortedBy, unsigned))
      } finally in.close()
    val tailBytes = newFooter ++ Array[Byte](
      (newFooter.length & 0xff).toByte,
      ((newFooter.length >> 8) & 0xff).toByte,
      ((newFooter.length >> 16) & 0xff).toByte,
      ((newFooter.length >> 24) & 0xff).toByte) ++ MagicTail
    val inPlace =
      fs.hasPathCapability(file, CommonPathCapabilities.FS_TRUNCATE) &&
        fs.hasPathCapability(file, CommonPathCapabilities.FS_APPEND)
    if (inPlace) {
      if (!fs.truncate(file, footerStart)) {
        // async truncate (HDFS off-block-boundary lease recovery): the
        // call returns false and the shrink completes in the background
        var tries = 0
        while (fs.getFileStatus(file).getLen != footerStart && tries < 600) {
          Thread.sleep(50); tries += 1
        }
        require(fs.getFileStatus(file).getLen == footerStart,
          s"truncate of $file to $footerStart did not complete")
      }
      val out = fs.append(file)
      try out.write(tailBytes) finally out.close()
    } else {
      // single-pass copy: data pages streamed once, new tail appended,
      // then swap. delete+rename is safe here precisely because the
      // file is staged — nothing reads it until the commit publishes it
      val tmp = new Path(file.getParent, "." + file.getName + ".stamp.tmp")
      val src = fs.open(file)
      try {
        val out = fs.create(tmp, true)
        try {
          val buf = new Array[Byte](1 << 20)
          var remaining = footerStart
          while (remaining > 0) {
            val n = src.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
            require(n > 0, s"unexpected EOF copying $file at ${footerStart - remaining}")
            out.write(buf, 0, n)
            remaining -= n
          }
          out.write(tailBytes)
        } finally out.close()
      } finally src.close()
      if (!fs.delete(file, false) || !fs.rename(tmp, file)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(s"staged stamp swap $tmp -> $file failed")
      }
    }
  }

  /** Read back (leaf name → converted-type name) for audit/spec. */
  def convertedTypesOf(file: java.io.File): Map[String, String] = {
    val md = readFooter(file)
    md.getSchema.asScala.drop(1).map(se =>
      se.getName -> Option(se.getConverted_type).map(_.name).getOrElse("")).toMap
  }

  private def readFooter(file: java.io.File): org.apache.parquet.format.FileMetaData = {
    val raf = new java.io.RandomAccessFile(file, "r")
    try {
      val len = raf.length()
      raf.seek(len - 8)
      val tail = new Array[Byte](8)
      raf.readFully(tail)
      val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      raf.seek(len - 8 - footerLen)
      val footerBytes = new Array[Byte](footerLen)
      raf.readFully(footerBytes)
      Util.readFileMetaData(new java.io.ByteArrayInputStream(footerBytes))
    } finally raf.close()
  }

  /** Read back the stamped field (test/audit side). */
  def sortingColumnsOf(file: java.io.File): Seq[Seq[(Int, Boolean, Boolean)]] =
    readFooter(file).getRow_groups.asScala.toSeq.map { rg =>
      Option(rg.getSorting_columns).map(_.asScala.toSeq).getOrElse(Seq.empty)
        .map(sc => (sc.column_idx, sc.descending, sc.nulls_first))
    }
}
