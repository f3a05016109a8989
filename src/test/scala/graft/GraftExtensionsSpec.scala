package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The extensions entry point must make the native expressions usable
  * from pure SQL with no per-session register() call — the drop-in
  * library contract (`spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    // extensions apply at session construction: make sure this suite
    // builds its own session instead of inheriting another suite's
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[2]")
      .appName("extensions-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  test("script_type and decompress_amount resolve as SQL functions") {
    // p2pkh template: 76a914 <20 bytes> 88ac
    val row = spark.sql(
      """SELECT script_type(unhex('76a914000102030405060708090a0b0c0d0e0f1011121388ac')) AS st,
        |       decompress_amount(0L) AS zero_amt,
        |       decompress_amount(10L) AS ten
        |""".stripMargin).collect()(0)
    assert(row.getString(0) == "p2pkh")
    assert(row.getLong(1) == 0L)
    assert(row.getLong(2) == graft.codec.AmountCodec.decompress(10L))
  }

  test("injected functions carry catalog metadata (DESCRIBE FUNCTION)") {
    val desc = spark.sql("DESCRIBE FUNCTION script_type")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("script_type"))
  }
}
