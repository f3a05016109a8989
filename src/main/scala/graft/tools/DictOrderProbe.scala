package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-question probe: does the r14 sort+zipWithIndex dictionary rank
  * (exactJaccardPairsPrefix) equal the row_number-over-(df, s) rank the
  * JaccardDictProbe timed? Prints the number of disagreeing shingles
  * and the candidate-pair count under each ranking.
  *
  * {{{ sbt "runMain graft.tools.DictOrderProbe <sfDir>" }}}
  */
object DictOrderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Queries.t
    graft.functions.GraftFunctions.register(spark)

    val d = t(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(graft.functions.GraftFunctions.shingles(col("text"), 3)).as("sh"))
    val post = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val freq = post.groupBy(col("s")).agg(count(lit(1)).as("df"))

    val winDict = freq.select(col("s"), col("df"),
      row_number().over(Window.orderBy(col("df"), col("s"))).as("sid"))

    val vocabSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("sid",
        org.apache.spark.sql.types.IntegerType)))
    val zipDict = spark.createDataFrame(
      freq.sort(col("df"), col("s")).select(col("s")).rdd
        .zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.getString(0), (i + 1).toInt) },
      vocabSchema)

    val joined = winDict.select(col("s"), col("sid").as("win_sid"))
      .join(zipDict.select(col("s"), col("sid").as("zip_sid")), Seq("s"), "full")
    val vocab = joined.count()
    val diff = joined.filter(col("win_sid") =!= col("zip_sid") ||
      col("win_sid").isNull || col("zip_sid").isNull).count()
    System.err.println(s"[dict] vocab=$vocab disagreements=$diff")
    if (diff > 0) {
      joined.filter(col("win_sid") =!= col("zip_sid")).show(10, false)
    }
    spark.stop()
  }
}
