package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.codec.{AmountCodec, ScriptCodec}

class ExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("expression-spec")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native expressions evaluate correctly via SQL and Column API") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val scripts = Seq(
      ScriptCodec.decompress(0, Array.fill[Byte](20)(1)),
      ScriptCodec.decompress(1, Array.fill[Byte](20)(2)),
      Array[Byte](0, 20) ++ Array.fill[Byte](20)(3),
      Array[Byte](0x6a.toByte, 1, 9))
    val df = scripts.zipWithIndex.map { case (s, i) => (i, s, AmountCodec.compress(i * 1000L + 5)) }
      .toDF("id", "script", "camount")
    df.createOrReplaceTempView("expr_test")

    val viaSql = spark.sql(
      "SELECT id, script_type(script) AS cls, decompress_amount(camount) AS amt FROM expr_test ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(viaSql == Seq((0, "p2pkh", 5L), (1, "p2sh", 1005L), (2, "p2wpkh", 2005L), (3, "op_return", 3005L)))

    val viaCol = df.select(col("id"), GraftFunctions.scriptType(col("script")).as("cls"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(viaCol == Seq("p2pkh", "p2sh", "p2wpkh", "op_return"))
  }

  test("zorder2 interleaves bits (known vectors + slow-reference property)") {
    // known vectors: zorder2(x, y) puts x on even bits, y on odd
    assert(Morton.interleave2(0L, 0L) == 0L)
    assert(Morton.interleave2(1L, 0L) == 1L)
    assert(Morton.interleave2(0L, 1L) == 2L)
    assert(Morton.interleave2(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(Morton.interleave2(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // slow bit-by-bit reference over deterministic pseudo-random inputs
    def slow(x: Long, y: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val (x, y) = (rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL)
      assert(Morton.interleave2(x, y) == slow(x, y))
    }
    // z-order locality: adjacent codes stay adjacent in key space
    import spark.implicits._
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT zorder2(12345, 54321) AS z").collect()(0).getLong(0)
    assert(viaSql == Morton.interleave2(12345L, 54321L))
  }

  test("native expressions stay inside whole-stage codegen (no ScalaUDF)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // a file-backed scan: a purely local relation constant-folds the
    // expressions away entirely (itself proof of Catalyst integration —
    // ScalaUDFs cannot fold)
    val dir = java.nio.file.Files.createTempDirectory("cg-test").toString
    Seq((1L, Array[Byte](0x6a.toByte))).toDF("a", "s")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("cg_test")
    val qe = spark.sql("SELECT script_type(s) AS c, decompress_amount(a) AS d FROM cg_test")
      .queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // "*(n)" marks a whole-stage-codegen'd operator in toString form
    assert(plan.contains("*(1) Project"), plan)
  }
}
