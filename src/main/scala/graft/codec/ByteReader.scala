package graft.codec

import java.io.{EOFException, InputStream}

/** Minimal counting byte reader over which all snapshot codecs run.
  *
  * The reference streams the snapshot through a `BufReader`
  * (`/root/reference/src/main.rs:171`); this is the Scala analogue used by
  * the DataSource V2 partition reader and by unit tests over
  * in-memory fixtures.
  */
final class ByteReader(in: InputStream) {
  private var count: Long = 0L

  /** Total bytes consumed so far (for progress reporting). */
  def bytesRead: Long = count

  def readByte(): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException(s"unexpected EOF after $count bytes")
    count += 1
    b & 0xff
  }

  def readFully(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new EOFException(s"unexpected EOF after ${count + off} bytes (wanted $n)")
      off += k
    }
    count += n
    buf
  }

  def skipFully(n: Long): Unit = {
    var left = n
    while (left > 0) {
      val k = in.skip(left)
      if (k <= 0) { // skip() may return 0 on buffered boundaries; fall back
        if (in.read() < 0) throw new EOFException(s"unexpected EOF after $count bytes (skipping)")
        left -= 1
        count += 1
      } else {
        left -= k
        count += k
      }
    }
  }

  def readU16LE(): Int = {
    val a = readByte(); val b = readByte()
    a | (b << 8)
  }

  def readU32LE(): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v |= readByte().toLong << (8 * i); i += 1 }
    v
  }

  def readU64LE(): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= readByte().toLong << (8 * i); i += 1 }
    v
  }
}
