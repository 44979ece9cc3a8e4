package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** Round-15 pins — the shared-IVF-substrate refactor (VERDICT r14
  * item 1) and the round's structural additions:
  *
  *  1. Substrate ≡ build: the once-per-corpus-version drifted
  *     substrate answers the standard query set bit-for-bit like the
  *     per-invocation build+append chain it replaced (clone ≡ built).
  *  2. Clone isolation: a verb entry mutating its CLONE leaves the
  *     substrate byte-stable — the next consumer still serves the
  *     drifted answers.
  *  3. A clone is a sealed generation: no tombstone table, no update
  *     ledger, no substrate/verb markers travel with the copy.
  */
class Round15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // ---------- 1. the shared IVF substrate ----------

  test("drifted substrate serves the standard query set bit-for-bit " +
    "like the per-invocation build+append chain (clone ≡ built)") {
    val sub = Similarity.driftedSubstrate(spark, dir)
    val served = rows(Similarity.queryIvfPqIndex(spark, dir, sub))
    val built = rows(Similarity.s13PersistedIvfPq(spark, dir))
    assert(served.nonEmpty, "substrate answers must be non-empty")
    assert(served === built,
      "substrate-served answers must equal the fresh build+append chain")
  }

  test("a mutating verb on its clone leaves the substrate untouched: " +
    "s18's delete+compact runs, then the substrate still serves the " +
    "pre-delete drifted answers") {
    val before = rows(Similarity.queryIvfPqIndex(spark, dir,
      Similarity.driftedSubstrate(spark, dir)))
    val deleted = rows(Similarity.s18IndexDelete(spark, dir))
    assert(deleted !== before,
      "the delete verb must actually change the served answers " +
        "(otherwise this isolation pin is vacuous)")
    val after = rows(Similarity.queryIvfPqIndex(spark, dir,
      Similarity.driftedSubstrate(spark, dir)))
    assert(after === before,
      "the substrate must be byte-stable across a verb run on a clone")
  }

  test("a clone is a sealed generation: only the three index tables " +
    "travel — no deletes/codes_gen ledgers, no markers, no heartbeat") {
    val sub = Similarity.driftedSubstrate(spark, dir)
    val clone = graft.ArtifactRoots.tagged("graft_r15spec_clone", dir)
    Similarity.cloneIndexTree(spark, sub, clone)
    val fs = FileSystem.get(new Path(clone).toUri,
      spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(clone)).map(_.getPath.getName).toSet
    assert(names === Set("coarse_centroids", "pq_codebooks", "codes"),
      s"clone must carry exactly the three index tables, got $names")
    // and the clone serves identically to its source
    assert(rows(Similarity.queryIvfPqIndex(spark, dir, clone)) ===
      rows(Similarity.queryIvfPqIndex(spark, dir, sub)),
      "a clone must serve bit-for-bit like its source tree")
    fs.delete(new Path(clone), true)
  }
}
