package graft.codec

/** Bitcoin Core amount compression (compressor.h `CompressAmount` /
  * `DecompressAmount`). The snapshot stores satoshi amounts compressed;
  * the reference decompresses at `/root/reference/src/main.rs:83-107`.
  *
  * Encoding intuition: strip trailing decimal zeros into an exponent
  * `e <= 9`; when `e < 9` additionally factor out the last non-zero
  * digit `d in 1..9`. All values are < 2.1e15 so signed Long is lossless.
  */
object AmountCodec {

  /** Inverse of [[compress]]; matches Bitcoin Core `DecompressAmount`. */
  def decompress(compressed: Long): Long = {
    if (compressed == 0) return 0L
    var x = compressed - 1
    var e = x % 10
    x /= 10
    var n =
      if (e < 9) {
        val d = (x % 9) + 1
        x /= 9
        x * 10 + d
      } else {
        x + 1
      }
    while (e > 0) {
      n *= 10
      e -= 1
    }
    n
  }

  /** Bitcoin Core `CompressAmount` — used by tests (roundtrip property)
    * and by the synthetic snapshot fixture generator.
    */
  def compress(amount: Long): Long = {
    require(amount >= 0, s"amount must be non-negative: $amount")
    if (amount == 0) return 0L
    var n = amount
    var e = 0
    while (n % 10 == 0 && e < 9) {
      n /= 10
      e += 1
    }
    if (e < 9) {
      val d = n % 10
      n /= 10
      1 + (n * 9 + d - 1) * 10 + e
    } else {
      1 + (n - 1) * 10 + 9
    }
  }
}
