package graft.codec

import scala.collection.mutable.ArrayBuffer

/** The two distinct varint codecs that coexist in the snapshot stream
  * (see `/root/reference/src/main.rs:44` for the warning that they must
  * not be confused):
  *
  *  - Bitcoin Core's internal MSB-base-128 varint (serialize.h
  *    `ReadVarInt`/`WriteVarInt`): used for the height/coinbase code,
  *    the compressed amount, and the script length
  *    (`/root/reference/src/main.rs:45-59`).
  *  - Bitcoin consensus "CompactSize" VarInt: used for per-txid coin
  *    counts and for vout (`/root/reference/src/main.rs:224,227`).
  *
  * Encoders are provided for fixture generation and property tests.
  */
object Varint {

  /** Bitcoin Core internal varint: big-endian base-128, MSB = continuation,
    * with a +1 bias on every continuation step.
    */
  def readCoreVarint(r: ByteReader): Long = {
    var n = 0L
    var b = r.readByte()
    n = b & 0x7f
    while ((b & 0x80) != 0) {
      n += 1
      // overflow guard (Bitcoin Core serialize.h ReadVarInt throws
      // "ReadVarInt(): size too large"): a corrupt continuation chain
      // must error, not silently wrap to a small value — a wrapped
      // script length would misalign the stream and decode every
      // subsequent coin as garbage with no exception
      if (n < 0 || n > (Long.MaxValue >>> 7))
        throw new java.io.IOException("core varint overflows 64 bits (corrupt stream)")
      b = r.readByte()
      n = (n << 7) | (b & 0x7f)
    }
    n
  }

  /** Inverse of [[readCoreVarint]] (Bitcoin Core serialize.h WriteVarInt). */
  def writeCoreVarint(value: Long): Array[Byte] = {
    require(value >= 0, s"core varint must be non-negative: $value")
    val tmp = new ArrayBuffer[Byte](10)
    var n = value
    var first = true
    var done = false
    while (!done) {
      tmp += ((n & 0x7f) | (if (first) 0x00 else 0x80)).toByte
      first = false
      if (n <= 0x7f) done = true
      else n = (n >>> 7) - 1
    }
    tmp.reverse.toArray
  }

  /** Bitcoin consensus CompactSize: <0xFD literal; 0xFD u16 LE; 0xFE u32 LE;
    * 0xFF u64 LE.
    */
  def readCompactSize(r: ByteReader): Long = {
    val tag = r.readByte()
    tag match {
      case 0xfd => r.readU16LE().toLong
      case 0xfe => r.readU32LE()
      case 0xff => r.readU64LE()
      case b    => b.toLong
    }
  }

  /** Inverse of [[readCompactSize]]. */
  def writeCompactSize(value: Long): Array[Byte] = {
    require(value >= 0, s"compact size must be non-negative: $value")
    if (value < 0xfd) Array(value.toByte)
    else if (value <= 0xffff)
      Array(0xfd.toByte, value.toByte, (value >>> 8).toByte)
    else if (value <= 0xffffffffL)
      Array(0xfe.toByte, value.toByte, (value >>> 8).toByte, (value >>> 16).toByte, (value >>> 24).toByte)
    else {
      val out = new Array[Byte](9)
      out(0) = 0xff.toByte
      var i = 0
      while (i < 8) { out(i + 1) = (value >>> (8 * i)).toByte; i += 1 }
      out
    }
  }
}
