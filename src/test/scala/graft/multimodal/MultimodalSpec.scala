package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("media table has the canonical schema and deterministic kinds") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "content", "source"))
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
    assert(media.count() > 0)
  }

  test("feature extraction runs partition-parallel with stable output") {
    val media = Multimodal.mediaFromDocuments(spark, dir).repartition(4)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == media.count())
    val row = feats.orderBy("media_id").first()
    assert(row.getAs[Int]("n_bytes") > 0)
    assert(row.getAs[Int]("width") >= 160)
    assert(row.getAs[String]("content_hash").length == 32)
    // deterministic: re-running yields identical rows
    val again = Multimodal.extractFeatures(spark, media)
    assert(feats.orderBy("media_id").collect().toSeq ==
      again.orderBy("media_id").collect().toSeq)
    // images sample exactly one frame; audio/video sample by duration
    assert(feats.filter(col("kind") === "image" && col("n_frames_sampled") =!= 1).count() == 0)
  }

  test("resize stub preserves ids and produces fixed-size payloads") {
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val resized = Multimodal.resizeStub(spark, media, targetBytes = 128)
    assert(resized.count() == media.count())
    val lens = resized.select(length(col("content_resized"))).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq == Seq(128))
  }
}
