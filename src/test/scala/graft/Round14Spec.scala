package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Pipeline, Similarity, TextAnalysis}

/** Round-14 pins — the r13 ADVICE hardenings plus the round's
  * structural items:
  *
  *  1. The shuffle-join assignment escape (`broadcastAssign = false`)
  *     trains bit-identical centroids — the 100 TB knob is safe to
  *     flip.
  */
class Round14Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // ---------- 1. shuffle-join assignment escape ----------

  test("kmeans centroids are bit-equal across the broadcastAssign flag " +
    "(broadcast vs SHUFFLE_REPLICATE_NL assignment)") {
    val (bcast, shuf) = Similarity.kmeansAssignFormsForSpec(spark, dir)
    val b = rows(bcast.orderBy(col("cid")))
    val s = rows(shuf.orderBy(col("cid")))
    assert(b.nonEmpty, "trained centroid set must be non-empty")
    assert(b === s,
      "shuffle-assignment centroids must be bit-identical to broadcast's")
  }

  // ---------- 2. the persisted BPE tokenizer ----------

  test("BPE artifacts serve exactly what a fresh learn derives " +
    "(merges, batched canon, encoded words)") {
    // t27: served merge table == fresh sequential learn
    val servedMerges = rows(TextAnalysis.t27BpeMerges(spark, dir))
    val freshMerges = rows(TextAnalysis.bpeMergesDerived(spark, dir))
    assert(servedMerges.nonEmpty)
    assert(servedMerges === freshMerges, "served merge table must equal a fresh learn")
    // t29: served canon view == fresh batched learn (snapshots column
    // equal too — the artifact carries the training run's economics)
    val servedBatched = rows(Pipeline.bpeBatchedMergesArtifact(spark, dir))
    val freshBatched = rows(TextAnalysis.bpeBatchedDerived(spark, dir))
    assert(servedBatched === freshBatched, "served batched canon must equal a fresh learn")
    // t28: served encoded-word table == fresh learn+fold
    val servedWords = rows(TextAnalysis.t28EncodedWords(spark, dir))
    val freshWords = rows(TextAnalysis.encodedWordsDerived(spark, dir))
    assert(servedWords === freshWords, "served encoded words must equal a fresh fold")
    // non-vacuity: the fold genuinely fused something (some word has
    // fewer toks than chars)
    val fused = TextAnalysis.t28EncodedWords(spark, dir)
      .filter(size(col("toks")) < length(col("word"))).count()
    assert(fused > 0, "at least one word must actually fuse under the learned merges")
  }
}
