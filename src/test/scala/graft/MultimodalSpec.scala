package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("media table: binary payload round-trips text bytes, kinds cycle") {
    val media = Multimodal.mediaFromDocs(spark, dir).cache()
    assert(media.count() === Tables.documents(spark, dir).count())
    val r = media.filter(col("media_id") === 0).collect().head
    val text = Tables.documents(spark, dir).filter(col("doc_id") === 0)
      .collect().head.getAs[String]("text")
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === text)
    assert(media.select("kind").distinct().count() === 3)
  }

  test("decode stub: fixed-width L1-normalized features, deterministic") {
    import spark.implicits._
    val feats = Multimodal.decodeToFeatures(
      Multimodal.mediaFromDocs(spark, dir).as[Multimodal.MediaRow]).cache()
    val f = feats.filter(col("media_id") === 1).collect().head.features
    assert(f.length === Multimodal.FeatureBins)
    assert(math.abs(f.sum - 1.0f) < 1e-3f, "histogram must be L1-normalized")
    // determinism: second run produces identical vectors
    val f2 = Multimodal.decodeToFeatures(
      Multimodal.mediaFromDocs(spark, dir).as[Multimodal.MediaRow])
      .filter(col("media_id") === 1).collect().head.features
    assert(f.toSeq === f2.toSeq)
  }

  test("frame sampling explodes every 4th 64-byte chunk of video payloads") {
    val media = Multimodal.mediaFromDocs(spark, dir)
    val frames = Multimodal.sampleFrames(media, stride = 4).cache()
    assert(frames.count() > 0)
    assert(frames.select("media_id").distinct().count() ===
      media.filter(col("kind") === "video").count())
    // frame indices are multiples of the stride
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    val fb = frames.filter(col("frame_idx") === 0).select("frame_bytes").collect()
    assert(fb.forall(_.getAs[Array[Byte]](0).length <= 64))
  }

  test("m1 query: per-kind feature stats, rows > 0") {
    val out = Multimodal.m1MultimodalFeatures(spark, dir).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Double]("avg_feat_norm") > 0))
  }
}
