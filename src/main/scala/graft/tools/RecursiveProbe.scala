package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall attribution for `q_recursive` (r12 verdict item 6: 42 s sf1,
  * flat for two rounds, #2 entry in the sf1 mirror). The recursion is
  * row-linear — every order visited once — so the wall must be
  * per-iteration OVERHEAD × iteration count, and the prime suspect is
  * the non-recursive `nxt` CTE: Spark INLINES CTEs (no materialization
  * operator), so every UnionLoop iteration re-executes the full
  * orders scan + row_number window sort just to join one frontier
  * against it. This probe measures, on the same corpus:
  *
  *  1. `full_sql_sec` — the SHIPPED registry entry, whatever form it
  *     currently takes (r13 baseline before the fix: 42.7 s = verbatim
  *     text; after adopting premat+broadcast: 15.1 s);
  *  2. `iterations` — max chain depth (= max orders per customer),
  *     the loop trip count;
  *  3. `premat_sec` — the same recursion with `nxt` PRE-MATERIALIZED
  *     once (eager localCheckpoint → temp view), so each iteration
  *     re-scans a cached in-memory frame instead of re-running
  *     scan+window; the recursive text is unchanged.
  *
  * {{{ sbt "runMain graft.tools.RecursiveProbe <sfDir> [runs]" }}}
  */
object RecursiveProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse(sys.error("usage: RecursiveProbe <sfDir> [runs]"))
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recursive-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val fullRuns = (1 to runs).map { _ =>
      time(graft.SparkEntry.queries("q_recursive")(spark, dir).count())
    }
    val iters = graft.queries.Queries.withViews(spark, dir)(
      "SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey)")
      .collect()(0).getLong(0)
    val prematRuns = (1 to runs).map { _ =>
      time {
        import org.apache.spark.sql.functions._
        val key = "spark.sql.cteRecursionRowLimit"
        val prev = spark.conf.getOption(key)
        val rows = graft.queries.Queries.parquetRowCount(spark, s"$dir/orders.parquet")
        spark.conf.set(key, math.max(1000000L, 2L * rows).toString)
        try {
          val nxt = graft.queries.Queries.t(spark, dir, "orders")
            .select(col("o_custkey").as("cust"), col("o_orderkey").as("k"),
              row_number().over(org.apache.spark.sql.expressions.Window
                .partitionBy(col("o_custkey"))
                .orderBy(col("o_orderdate"), col("o_orderkey"))).as("rn"))
            .localCheckpoint()
          nxt.createOrReplaceTempView("nxt")
          spark.sql(sys.env.getOrElse("RECURSIVE_PROBE_SQL",
            """WITH RECURSIVE chain AS (
              |  SELECT cust, k, rn, 1 AS depth FROM nxt WHERE rn = 1
              |  UNION ALL
              |  SELECT n.cust, n.k, n.rn, c.depth + 1
              |  FROM chain c JOIN nxt n ON n.cust = c.cust AND n.rn = c.rn + 1)
              |SELECT depth, count(*) AS n_orders, CAST(sum(k) AS BIGINT) AS sum_keys
              |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)).count()
        } finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }
    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"recursive_probe","sf":"$dir","iterations":$iters,""" +
      s""""full_sql_sec":${f"${fullRuns.min}%.3f"},"full_runs":${arr(fullRuns)},""" +
      s""""premat_sec":${f"${prematRuns.min}%.3f"},"premat_runs":${arr(prematRuns)},""" +
      s""""per_iteration_full_sec":${f"${fullRuns.min / math.max(1, iters)}%.4f"}}""")
    spark.stop()
  }
}
