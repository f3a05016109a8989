package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared query inventory (SURVEY.md §2 rows Q/E/S/X), one named
  * DataFrame program per operator, each paired (in [[oracle]]) with an
  * ANSI-SQL rendering the driver runs in DuckDB over the same parquet
  * tables.
  *
  * Discipline for oracle parity (SURVEY.md §5.3):
  *  - every computed column aliased identically on both sides;
  *  - doubles aggregated then `round(..., 2)` (sum order noise is ~1e-9
  *    relative — far below the rounding grain);
  *  - timestamps never output raw: converted to epoch millis / dates;
  *  - ORDER BY always deterministic (unique key tie-break) and nullable
  *    sort keys avoided.
  */
object Queries {

  /** Read one corpus table. Filters/pruning push into this scan. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------- helpers
  private def round2(c: Column): Column = round(c, 2)

  // ---------------------------------------------------------------- queries

  /** Flagship: revenue by nation (joins E5/E10 + agg E11). */
  def flagship(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(
        round2(sum(li("l_extendedprice") * (lit(1.0) - li("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"))
  }

  /** q1_agg — TPC-H Q1 shape: hash aggregate w/ partial+final (E11). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round2(sum(col("l_quantity"))).as("sum_qty"),
        round2(sum(col("l_extendedprice"))).as("sum_base_price"),
        round2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        round2(avg(col("l_quantity"))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
