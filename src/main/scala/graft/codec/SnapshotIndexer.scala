package graft.codec

import java.io.BufferedInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFileSystem, FileSystem, Path}

/** Two-pass parallel-scan support for the (otherwise unsplittable)
  * snapshot stream: pass 1 skip-parses the varint structure — no coin
  * materialization, no script decompression, no hex — recording clean
  * split points at txid-group boundaries; pass 2 (the DSv2 partitions)
  * decodes each [offset, nCoins) range independently and in parallel.
  *
  * This replaces the single-reader + full-data `repartition` shuffle
  * with zero shuffled bytes: at 100 TB the shuffle IS the convert cost,
  * so indexing (a single cheap sequential pass over compressed-size
  * varints) wins by orders of magnitude. Split state is trivially clean
  * at group boundaries (`coins_per_hash_left == 0`, the same run-length
  * state machine as `/root/reference/src/main.rs:221-230`).
  */
object SnapshotIndexer {

  /** One independently-decodable range: byte offset of a txid-group
    * start and the number of coins until the next split (or EOF).
    */
  final case class Split(offset: Long, nCoins: Long)

  /** Skip one coin's body (vout already consumed by caller? no — this
    * skips vout + code + amount + script). Varints must be walked
    * byte-by-byte; script payloads are skipped in bulk.
    */
  private def skipCoin(r: ByteReader): Unit = {
    Varint.readCompactSize(r) // vout
    Varint.readCoreVarint(r) // height/coinbase code
    Varint.readCoreVarint(r) // compressed amount
    val len = Varint.readCoreVarint(r)
    if (len < ScriptCodec.SpecialScripts) {
      r.skipFully(if (len <= 1) 20 else 32)
    } else {
      // Long-safe skip: matches decode(), incl. the oversized-script
      // OP_RETURN case, which consumes the same byte count
      r.skipFully(len - ScriptCodec.SpecialScripts)
    }
  }

  // JVM-local memo: the driver indexes the same immutable snapshot for
  // sampling, planning, and re-reads; key includes size+mtime so a
  // replaced file re-indexes. Entries are tiny (offsets only).
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long, Long), (SnapshotHeader, Seq[Split])]()

  /** Index a snapshot file into splits of ~`coinsPerSplit` coins
    * (memoized per file identity). Reads through the Hadoop FileSystem
    * API so snapshots on HDFS/S3/file:// all index identically — at
    * 100 TB the snapshot lives on a distributed store, not a
    * driver-local path. Pass the session's `hadoopConfiguration` to
    * pick up cluster FS settings; the default resolves `file://`.
    */
  def index(file: String, coinsPerSplit: Long = 64L * 1024,
      conf: Configuration = new Configuration()): (SnapshotHeader, Seq[Split]) = {
    val p = new Path(file)
    val st = p.getFileSystem(conf).getFileStatus(p)
    memo.computeIfAbsent((file, st.getLen, st.getModificationTime, coinsPerSplit),
      _ => indexUncached(p, coinsPerSplit, conf))
  }

  /** Resolve the FS for a path, unwrapping the client-side CRC layer:
    * `LocalFileSystem` re-reads every byte through a software CRC32
    * (plus a `.crc` side file that never exists for snapshots), which
    * halves decode throughput for zero integrity gain here. HDFS/S3
    * checksum at the block/object layer natively and are unaffected.
    */
  def fsFor(p: Path, conf: Configuration): FileSystem =
    p.getFileSystem(conf) match {
      case c: ChecksumFileSystem => c.getRawFileSystem
      case fs => fs
    }

  /** Open a snapshot (optionally at a byte offset) as a buffered stream
    * via the Hadoop FS — shared by the indexer, the DSv2 partition
    * readers, and the convert-side bounds sampler.
    */
  def open(file: String, conf: Configuration, offset: Long = 0L): BufferedInputStream = {
    val p = new Path(file)
    val s = fsFor(p, conf).open(p)
    if (offset > 0) s.seek(offset)
    new BufferedInputStream(s, 1 << 20)
  }

  private def indexUncached(p: Path, coinsPerSplit: Long,
      conf: Configuration): (SnapshotHeader, Seq[Split]) = {
    val in = new BufferedInputStream(fsFor(p, conf).open(p), 1 << 20)
    try {
      val r = new ByteReader(in)
      val header = SnapshotCodec.readHeader(r)
      val splits = Vector.newBuilder[Split]
      var splitStart = r.bytesRead
      var splitCoins = 0L
      var remaining = header.numUtxos
      while (remaining > 0) {
        // group boundary: candidate split point
        if (splitCoins >= coinsPerSplit) {
          splits += Split(splitStart, splitCoins)
          splitStart = r.bytesRead
          splitCoins = 0L
        }
        r.skipFully(32) // txid
        var inGroup = Varint.readCompactSize(r)
        require(inGroup > 0, "empty txid coin group")
        remaining -= inGroup
        splitCoins += inGroup
        while (inGroup > 0) { skipCoin(r); inGroup -= 1 }
      }
      if (splitCoins > 0) splits += Split(splitStart, splitCoins)
      (header, splits.result())
    } finally in.close()
  }
}
