package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Pipeline, Similarity}

/** Round-13 pins — the r12 ADVICE hardenings plus the round's
  * structural items:
  *
  *  1. The artifact-GC 4×-grace bound keys on last-USE: a stale
  *     sibling tree with a fresh serve-time heartbeat survives the
  *     bound; the same tree without one is collected.
  *  2. Distributed Lloyd rounds are bit-equal to the collected form
  *     (kmeansCentroids / pqCodebooksOn no longer drive |C|×dims
  *     state through the driver).
  */
class Round13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // ---------- 1. heartbeat-aware artifact GC ----------

  test("artifact GC 4x-grace bound keys on last-use: an old stale sibling " +
    "with a fresh heartbeat is spared, without one it is collected") {
    val fs = FileSystem.get(new Path(ArtifactRoots.root).toUri,
      spark.sparkContext.hadoopConfiguration)
    val data = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_r13_gcdata")
    def touchData(name: String): Unit = {
      data.mkdirs()
      val f = new java.io.File(data, name)
      val w = new java.io.FileWriter(f); w.write(name); w.close()
    }
    def freshTag(): String = {
      ArtifactRoots.resetTagCacheForTest()
      ArtifactRoots.tagged("graft_r13spec_gc", data.getPath)
    }
    val graceMs = 60000L
    try {
      sys.props("graft.test.gcGraceMs") = graceMs.toString
      touchData("v1")
      val t1 = freshTag()
      fs.mkdirs(new Path(t1))
      fs.create(new Path(t1, "payload"), true).close()
      // age the tree past 4x grace (the bound that would collect it
      // even while the regeneration is fresh)
      val old = System.currentTimeMillis() - 10L * graceMs
      // heartbeat FIRST, then age the root dir: creating the
      // heartbeat file itself bumps the dir mtime, which would make
      // the spared assertion vacuous
      ArtifactRoots.touchServed(t1)
      fs.setTimes(new Path(t1), old, old)
      // regenerate the corpus NOW (fresh regeneration => grace path);
      // WITH a fresh heartbeat the old tree must be spared
      touchData("v2")
      val t2 = freshTag()
      assert(t2 !== t1, "fingerprint must move with the data")
      assert(fs.exists(new Path(t1, "payload")),
        "actively-served (heartbeat-fresh) stale sibling was collected")
      // same shape WITHOUT a heartbeat: collected at 4x grace even
      // mid-straddle (the CI-loop accumulation bound)
      fs.delete(new Path(t1, "_graft_heartbeat"), false)
      fs.setTimes(new Path(t1), old, old)
      touchData("v3")
      val t3 = freshTag()
      assert(t3 !== t2)
      assert(!fs.exists(new Path(t1)),
        "heartbeat-less tree older than 4x grace must be collected")
    } finally {
      sys.props.remove("graft.test.gcGraceMs")
      val root = new Path(ArtifactRoots.root)
      if (fs.exists(root))
        fs.listStatus(root).filter(_.getPath.getName.startsWith("graft_r13spec_gc"))
          .foreach(st => fs.delete(st.getPath, true))
      Seq("v1", "v2", "v3").foreach(n => new java.io.File(data, n).delete())
      data.delete()
      ArtifactRoots.resetTagCacheForTest()
    }
  }

  // ---------- 2. distributed Lloyd rounds ----------

  test("distributed Lloyd rounds are bit-equal to the collected form: " +
    "kmeansCentroids and pqCodebooksOn produce identical centroid sums / " +
    "codebook means (integer sums are associative; the floor-mean is the " +
    "same IEEE division)") {
    val (kd, kc, pd, pc) = Similarity.lloydFormsForSpec(spark, dir)
    def kRows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("cid"), col("sarr").cast("string"), col("nc"))
        .collect().map(_.toString).toSet
    def pRows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select(col("sub"), col("cid"), col("ma").cast("string"), col("nc"))
        .collect().map(_.toString).toSet
    val kdr = kRows(kd)
    assert(kdr.nonEmpty, "vacuous: no centroids")
    assert(kdr === kRows(kc), "kmeans centroid sums diverged from the collected form")
    val pdr = pRows(pd)
    assert(pdr.nonEmpty, "vacuous: no codebook rows")
    assert(pdr === pRows(pc), "PQ codebook means diverged from the collected form")
  }
}
