package graft.codec

import java.math.BigInteger

/** secp256k1 point decompression, needed for compressed-script types 4/5
  * (uncompressed P2PK, `/root/reference/src/main.rs:150-155`, where the
  * reference delegates to the `bitcoin` crate's `PublicKey::from_slice`).
  *
  * Pure `BigInteger` arithmetic — no external crypto dependency (offline
  * build). Curve: y^2 = x^3 + 7 over F_p with
  * p = 2^256 - 2^32 - 977; since p ≡ 3 (mod 4) the square root is
  * rhs^((p+1)/4) mod p.
  */
object Secp256k1 {
  private val P = new BigInteger(
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)
  private val Seven = BigInteger.valueOf(7)
  private val SqrtExp = P.add(BigInteger.ONE).shiftRight(2) // (p+1)/4
  private val Three = BigInteger.valueOf(3)

  /** Decompress a 33-byte SEC1 compressed public key (02/03 prefix) into
    * the 65-byte uncompressed form (04 || X || Y). Throws if the key is
    * not a valid curve point (mirrors the validity check the reference
    * inherits from `PublicKey::from_slice`).
    */
  def decompress(key33: Array[Byte]): Array[Byte] = {
    require(key33.length == 33, s"compressed key must be 33 bytes, got ${key33.length}")
    val prefix = key33(0) & 0xff
    require(prefix == 0x02 || prefix == 0x03, f"bad compressed-key prefix 0x$prefix%02x")
    val x = new BigInteger(1, java.util.Arrays.copyOfRange(key33, 1, 33))
    require(x.compareTo(P) < 0, "x not a field element")
    val rhs = x.modPow(Three, P).add(Seven).mod(P)
    var y = rhs.modPow(SqrtExp, P)
    require(y.multiply(y).mod(P).equals(rhs), "point not on curve")
    val wantOdd = prefix == 0x03
    if (y.testBit(0) != wantOdd) y = P.subtract(y)
    val out = new Array[Byte](65)
    out(0) = 0x04
    copy32(x, out, 1)
    copy32(y, out, 33)
    out
  }

  private def copy32(v: BigInteger, dst: Array[Byte], off: Int): Unit = {
    val raw = v.toByteArray // may carry a sign byte or be short
    val start = math.max(0, raw.length - 32)
    val len = raw.length - start
    System.arraycopy(raw, start, dst, off + (32 - len), len)
  }
}
