package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.{Hex, ScriptCodec, SnapshotGen}
import graft.sources.UtxoConvert

/** The reference's own surface (SURVEY.md §2 R1-R5, C1-C7, Q1-Q4) as
  * driver-visible queries: synthesize a deterministic snapshot, convert
  * through the full source→sink pipeline, then run the README query
  * shape over the produced parquet. Rows-only checks (the input is
  * binary, not a corpus table) — byte-level correctness is pinned by
  * CodecSpec/UtxoSourceSpec golden tests.
  */
object QueriesUtxo {

  private val SnapPath = "/tmp/graft_utxo_e2e.bin"
  /** Public: the oracle SQL reads this parquet directly from DuckDB. */
  val ParquetPath = "/tmp/graft_utxo_e2e_parquet"
  private val NCoins = 100000

  /** Marked script the README-style point query looks up. */
  val knownScript: Array[Byte] = ScriptCodec.decompress(0, Array.tabulate[Byte](20)(i => (i + 1).toByte))
  val knownHex: String = Hex.encode(knownScript)

  private val lock = new Object

  /** Idempotently build snapshot + converted parquet (cached in /tmp). */
  private def ensureConverted(s: SparkSession): String = lock.synchronized {
    val snap = new File(SnapPath)
    val done = new File(ParquetPath, "_SUCCESS")
    if (!snap.exists() || !done.exists()) {
      val marked = Seq(
        SnapshotGen.Group("11" * 32, Seq(SnapshotGen.GenCoin(0, 30, coinbase = false, 5000, knownScript))),
        SnapshotGen.Group("22" * 32, Seq(SnapshotGen.GenCoin(1, 10, coinbase = true, 7000, knownScript))),
        SnapshotGen.Group("33" * 32, Seq(SnapshotGen.GenCoin(2, 20, coinbase = false, 9000, knownScript))))
      val tmp = new File(SnapPath + ".tmp")
      val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 20)
      try SnapshotGen.write(out, marked ++ SnapshotGen.synthetic(NCoins, seed = 1234L))
      finally out.close()
      if (!tmp.renameTo(snap)) throw new java.io.IOException(s"rename $tmp -> $snap failed")
      UtxoConvert.convert(s, SnapPath, ParquetPath) // _SUCCESS is the convert's own commit marker
    }
    ParquetPath
  }

  /** Q3+Q4+Q2: the reference README's address point-lookup
    * (`README.md:54-56`) over the engine-converted file.
    */
  def e2ePointLookup(s: SparkSession, dir: String): DataFrame = {
    val parquet = ensureConverted(s)
    UtxoConvert.readConverted(s, parquet)
      .filter(col("script") === unhex(lit(knownHex)))
      .select(col("txid"), col("vout"), col("amount"), col("height"))
      .orderBy(col("height"))
  }

  /** Script-class distribution over the converted snapshot — exercises
    * the C5 classification as a query-time UDF (E26).
    */
  def e2eScriptTypes(s: SparkSession, dir: String): DataFrame = {
    val parquet = ensureConverted(s)
    graft.functions.GraftFunctions.register(s)
    UtxoConvert.readConverted(s, parquet)
      .groupBy(callUDF("script_type", col("script")).as("script_class"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("total_sats"))
      .orderBy(col("script_class"))
  }
}
