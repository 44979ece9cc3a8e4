package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

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
}
