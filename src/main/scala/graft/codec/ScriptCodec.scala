package graft.codec

/** Bitcoin Core scriptPubKey compression (compressor.h `CompressScript` /
  * `DecompressScript`); decode side mirrors
  * `/root/reference/src/main.rs:109-161`.
  *
  * Wire form: a Core varint `len`; `len < 6` selects a compressed
  * template (types 0..5), otherwise the script is `len - 6` raw bytes.
  */
object ScriptCodec {
  val SpecialScripts = 6

  // script opcodes used by the decompression templates
  private val OP_DUP = 0x76.toByte
  private val OP_HASH160 = 0xa9.toByte
  private val OP_EQUAL = 0x87.toByte
  private val OP_EQUALVERIFY = 0x88.toByte
  private val OP_CHECKSIG = 0xac.toByte

  /** Bitcoin Core MAX_SCRIPT_SIZE: scripts above this are replaced by a
    * lone OP_RETURN and their bytes skipped — the same special case
    * Core's `CScriptCompressor::Unser` applies, so oversized
    * (unspendable) on-chain outputs convert instead of crashing.
    */
  val MaxScriptSize = 10000L

  /** Read one (possibly compressed) script from the stream. */
  def decode(r: ByteReader): Array[Byte] = {
    val len = Varint.readCoreVarint(r)
    if (len < SpecialScripts) {
      val scriptType = len.toInt
      val payloadSize = if (scriptType <= 1) 20 else 32
      decompress(scriptType, r.readFully(payloadSize))
    } else {
      val size = len - SpecialScripts
      if (size > MaxScriptSize) {
        r.skipFully(size)
        Array(0x6a.toByte) // OP_RETURN, per Core's compressor
      } else r.readFully(size.toInt)
    }
  }

  /** Expand a compressed script template. `payload` is 20 bytes for
    * types 0/1, 32 bytes (an x-coordinate or key body) for types 2..5.
    */
  def decompress(scriptType: Int, payload: Array[Byte]): Array[Byte] =
    scriptType match {
      case 0 => // P2PKH: OP_DUP OP_HASH160 PUSH20 <h> OP_EQUALVERIFY OP_CHECKSIG
        require(payload.length == 20)
        val out = new Array[Byte](25)
        out(0) = OP_DUP; out(1) = OP_HASH160; out(2) = 20
        System.arraycopy(payload, 0, out, 3, 20)
        out(23) = OP_EQUALVERIFY; out(24) = OP_CHECKSIG
        out
      case 1 => // P2SH: OP_HASH160 PUSH20 <h> OP_EQUAL
        require(payload.length == 20)
        val out = new Array[Byte](23)
        out(0) = OP_HASH160; out(1) = 20
        System.arraycopy(payload, 0, out, 2, 20)
        out(22) = OP_EQUAL
        out
      case 2 | 3 => // P2PK, compressed key: PUSH33 <02/03 || x> OP_CHECKSIG
        require(payload.length == 32)
        val out = new Array[Byte](35)
        out(0) = 33
        out(1) = scriptType.toByte
        System.arraycopy(payload, 0, out, 2, 32)
        out(34) = OP_CHECKSIG
        out
      case 4 | 5 => // P2PK, key stored compressed but script uses uncompressed form
        require(payload.length == 32)
        val compressed = new Array[Byte](33)
        compressed(0) = (scriptType - 2).toByte
        System.arraycopy(payload, 0, compressed, 1, 32)
        val key = Secp256k1.decompress(compressed)
        val out = new Array[Byte](67)
        out(0) = 65
        System.arraycopy(key, 0, out, 1, 65)
        out(66) = OP_CHECKSIG
        out
      case t => throw new IllegalArgumentException(s"unknown compressed script type $t")
    }

  /** Classify a scriptPubKey — same predicate family the reference asserts
    * with (`is_p2pk/is_p2pkh/is_p2sh`, `/root/reference/src/main.rs:159`),
    * extended with the common modern classes. Exposed as the `script_type`
    * UDF.
    */
  def scriptType(s: Array[Byte]): String = {
    if (s == null) return "other"
    val n = s.length
    if (n == 25 && s(0) == OP_DUP && s(1) == OP_HASH160 && s(2) == 20 &&
      s(23) == OP_EQUALVERIFY && s(24) == OP_CHECKSIG) "p2pkh"
    else if (n == 23 && s(0) == OP_HASH160 && s(1) == 20 && s(22) == OP_EQUAL) "p2sh"
    else if (n == 35 && s(0) == 33 && (s(1) == 2 || s(1) == 3) && s(34) == OP_CHECKSIG) "p2pk"
    else if (n == 67 && s(0) == 65 && s(1) == 4 && s(66) == OP_CHECKSIG) "p2pk"
    else if (n == 22 && s(0) == 0 && s(1) == 20) "p2wpkh"
    else if (n == 34 && s(0) == 0 && s(1) == 32) "p2wsh"
    else if (n == 34 && s(0) == 0x51 && s(1) == 32) "p2tr"
    else if (n >= 1 && (s(0) & 0xff) == 0x6a) "op_return"
    else "other"
  }

  /** Compress a script back to its wire form (test-side inverse used by the
    * synthetic fixture generator): returns varint-length prefix ++ body.
    */
  def compressForFixture(script: Array[Byte]): Array[Byte] = {
    val cls = scriptType(script)
    cls match {
      case "p2pkh" =>
        Varint.writeCoreVarint(0) ++ script.slice(3, 23)
      case "p2sh" =>
        Varint.writeCoreVarint(1) ++ script.slice(2, 22)
      case "p2pk" if script.length == 35 =>
        Varint.writeCoreVarint(script(1).toLong) ++ script.slice(2, 34)
      case "p2pk" if script.length == 67 =>
        // store parity of Y in the type (4/5), payload = X
        val yOdd = (script(66 - 1) & 1) == 1 // last byte of Y
        Varint.writeCoreVarint(if (yOdd) 5L else 4L) ++ script.slice(2, 34)
      case _ =>
        Varint.writeCoreVarint(script.length.toLong + SpecialScripts) ++ script
    }
  }
}
