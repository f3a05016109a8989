package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps the plan evidence for `Queries.spread`'s at-scale no-op claim
  * (r14 verdict item 6): a ≥-parallelism multi-file fixture must pass
  * through spread() with NO round-robin exchange — shown here by
  * object identity AND the formatted plan — while the sub-target
  * single-file fixture shows the fired, width-capped path.
  *
  * {{{ sbt "runMain graft.tools.SpreadPlanDump <outFile>" }}}
  */
object SpreadPlanDump {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("plans/r15/spread_multifile_noop.txt")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = spark.sparkContext.defaultParallelism
    val dir = java.nio.file.Files.createTempDirectory("spread-plan").toString
    spark.range(100000).selectExpr("id", "repeat('x', 64) as text")
      .repartition(p * 2).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = new java.io.PrintStream(new java.io.FileOutputStream(outPath))
    out.println(s"fixture: ${df.inputFiles.length} parquet files, " +
      s"defaultParallelism = $p (files >= parallelism => at-scale path)")
    out.println("spread(df, SpreadHeavy) returns the input untouched " +
      s"(object identity): ${graft.queries.Queries.spread(df, graft.queries.Queries.SpreadHeavy) eq df}")
    out.println("\n--- spread(df, SpreadHeavy).explain(formatted): NO round-robin Exchange ---\n")
    out.println(graft.queries.Queries.spread(df, graft.queries.Queries.SpreadHeavy)
      .queryExecution.explainString(ExplainMode.fromString("formatted")))
    out.println("--- contrast: the fired path on the 584 KB single-file sf0.1 documents fixture, SpreadHeavy ---\n")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    out.println(graft.queries.Queries.spread(docs, graft.queries.Queries.SpreadHeavy)
      .queryExecution.explainString(ExplainMode.fromString("formatted")))
    out.println("--- and the same single file under the Light default (width <= 1 => untouched) ---")
    out.println(s"spread(docs) eq docs: ${graft.queries.Queries.spread(docs) eq docs}")
    out.close()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
