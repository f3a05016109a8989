package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-shape and semantics checks for the scale-technique relational
  * operators (the oracle pins values; these pin the physical plans the
  * 100 TB story depends on).
  */
class QueriesRelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("queries-rel-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("skew-salted join: shuffle join on (key, salt), values equal the plain join") {
    val salted = QueriesRel.joinSkewSalted(spark, dir)
    val plan = salted.queryExecution.executedPlan.toString

    // the hint must hold (a broadcast would defeat the point) and the
    // salt must be part of the join keys, spreading each hot flag
    assert(plan.contains("SortMergeJoin"), s"expected a shuffle join, got:\n$plan")
    assert(plan.toLowerCase.contains("salt"), "salt column missing from the executed plan")

    // semantics: identical to the plain (unsalted, broadcast) join
    import spark.implicits._
    val dim = Seq(("A", 5L), ("N", 10L), ("R", 3L)).toDF("flag", "weight")
    val plain = Queries.t(spark, dir, "lineitem")
      .join(broadcast(dim), col("l_returnflag") === col("flag"))
      .groupBy(col("flag"))
      .agg((sum(Queries.cents(col("l_quantity")) * col("weight")) / 100.0).as("weighted_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("flag"))
    assert(salted.collect().map(_.toString).toSeq ==
      plain.collect().map(_.toString).toSeq)
  }

  test("embedding near-dup dedup: canonical precedes dup, sims above threshold") {
    val rows = QueriesLLM.embedDedup(spark, dir).collect()
    assert(rows.nonEmpty, "expected some near-dup pairs at cos >= 0.3")
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(0), "canonical_id must be a lower id than dup_id")
      assert(r.getDouble(2) >= 0.3)
      assert(r.getLong(3) >= 1)
    }
  }
}
