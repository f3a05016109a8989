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

  test("as-of join: equals brute-force latest-prior-purchase, no nested loop in plan") {
    val asof = QueriesRel.joinAsof(spark, dir)
    val plan = asof.queryExecution.executedPlan.toString

    // the composed plan must be window-over-union — a range join here
    // would plan a nested loop that explodes at scale
    assert(plan.contains("Window"), s"expected a window plan, got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "as-of composition must not fall back to a nested-loop join")

    // semantics oracle: brute-force range join + keep the max prior ts
    val ev = Queries.t(spark, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("c_uid"), col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_uid"),
        col("value").as("p_value"), col("ts").as("p_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("p_ts").desc_nulls_last)
    val brute = c.join(p, col("c_uid") === col("p_uid") && col("p_ts") <= col("c_ts"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("c_uid").as("user_id"),
        unix_millis(col("c_ts")).as("click_ms"),
        col("p_event_id").as("purch_event_id"),
        round(col("p_value"), 2).as("purch_value"),
        (unix_millis(col("c_ts")) - unix_millis(col("p_ts"))).as("gap_ms"))
      .orderBy(col("event_id"))
    assert(asof.collect().map(_.toString).toSeq ==
      brute.collect().map(_.toString).toSeq)
    assert(asof.count() == c.count(), "left as-of must keep every click")
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
