package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.10): image/audio/video as
  * opaque `binary` payloads plus typed metadata, with batch-shaped
  * decode / feature-extraction operators.
  *
  * The DECODE step is a clearly-marked STUB — the container has no
  * image/audio codecs — standing in for e.g. a JPEG decode. It is
  * deterministic (a 16-bin byte histogram), so the surrounding Spark
  * plumbing (schema, partition-preserving mapPartitions, batch
  * iterator shape, explode for frame sampling) is fully real and
  * testable. In a Python deployment the same seam is a mapInPandas
  * batch function with this exact row contract.
  *
  * Scale: payloads stay columnar in parquet (binary column, never
  * driver-collected); decode is a narrow per-partition pass; feature
  * vectors are fixed-width Array[Float] ready for Similarity ops.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, mime: String,
                      payload: Array[Byte], n_bytes: Long)
  case class FeatureRow(media_id: Long, kind: String, features: Array[Float])

  val FeatureBins = 16

  /** Build a deterministic media table from `documents` (payload =
    * UTF-8 text bytes) — a stand-in corpus for plumbing tests; kind
    * cycles image/audio/video. */
  def mediaFromDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      length(col("text")).cast("long").as("n_bytes"))

  /** STUB decoder: a real deployment decodes pixels/samples here.
    * Deterministic 16-bin byte histogram, L1-normalized — shaped like
    * a feature extractor (fixed-width float vector per row), executed
    * as a partition-batch pass exactly like a real decoder would be. */
  def decodeToFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val hist = new Array[Float](FeatureBins)
        var i = 0
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) / (256 / FeatureBins)) += 1f
          i += 1
        }
        val total = math.max(1f, bytes.length.toFloat)
        FeatureRow(r.media_id, r.kind, hist.map(_ / total))
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th 64-byte
    * chunk becomes a "frame" row (real impl: keyframe extraction).
    * Pure DataFrame ops — slice/explode — no UDF. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val chunks = floor((col("n_bytes") + 63) / 64).cast("int")
    media.filter(col("kind") === "video" && col("n_bytes") > 0)
      // chunks ≥ 1 here — sequence(0, -1) would count DOWN, emitting
      // phantom frames for empty payloads
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), chunks - 1), i => i % stride === 0)))
      .select(col("media_id"), col("frame_idx"),
              expr("substring(payload, frame_idx * 64 + 1, 64)").as("frame_bytes"))
  }

  /** M1 — end-to-end multimodal pipeline rollup: encode → decode-stub
    * → per-kind feature statistics. Driver checks rows>0 (no SQL
    * oracle: binary feature plumbing is not DuckDB-expressible). */
  def m1MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocs(spark, dir).as[MediaRow]
    val feats = decodeToFeatures(media)
    feats.toDF()
      .withColumn("feat_norm",
        sqrt(aggregate(col("features"), lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double"))))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
           round(avg(col("feat_norm")), 4).as("avg_feat_norm"),
           round(avg(element_at(col("features"), 7).cast("double")), 4).as("avg_bin6"))
      .orderBy(col("kind"))
  }

  /** M2 — frame-sampling rollup: every 4th 64-byte chunk of each
    * video payload becomes a frame row (slice/explode only — no UDF);
    * per-media frame counts and mean frame sizes. Driver records the
    * rows-only check (binary frame bytes aren't SQL-comparable). */
  def m2FrameSampling(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFromDocs(spark, dir))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
           avg(length(col("frame_bytes"))).as("avg_frame_bytes"))
      .orderBy(col("media_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_features" -> (m1MultimodalFeatures _),
    "m2_frame_sampling"      -> (m2FrameSampling _))

  /** No oracle entries: the decode stub is outside SQL's reach; the
    * driver records the weaker rows-only check for m1. */
  val oracles: Map[String, String] = Map.empty
}
