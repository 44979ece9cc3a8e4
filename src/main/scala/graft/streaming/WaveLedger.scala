package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The content-keyed, marker-gated WAVE-COMMIT protocol — ONE
  * definition shared by every streaming ledger family in the library
  * (the pair graph's st13/st19, the kNN graph's st15/st16, the IVF
  * index's st17/st18, the bins tier's st20). Two copies of the
  * tag/commit discipline drifting independently would silently break
  * replay dedup for one family (r14 ADVICE), so the protocol lives
  * here and the stream objects call it.
  *
  * The gate (st13's exactly-once discipline, honest under BOTH
  * failure modes — a checkpoint replay re-delivers a wave under the
  * same batchId, a fresh-checkpoint rerun under a NEW numbering):
  *  - the wave's CONTENT TAG is one batch-bounded 1-row aggregate:
  *    count, an order-independent bit_xor fold of `ck`, and a
  *    40-bit-term sum fold of `cs` (the sum backs the xor so plain
  *    XOR cancellation between equal-count sets cannot alias two
  *    distinct waves; terms bounded to 2^40 keep a wave int64-exact
  *    to ~2^23 rows — micro-batches are orders of magnitude under
  *    that). Callers fold the VALUE into `ck`/`cs` when re-delivery
  *    under unchanged keys must key differently (embedding/text
  *    waves), and the id alone for pure id waves.
  *  - a committed re-delivery (marker present, or vouched for by the
  *    caller's `alsoCommitted` — DocumentsStream's compacted-wave
  *    folded set, whose dirs are gone but whose tags still vouch) is
  *    skipped WHOLE, zero work re-derived;
  *  - a crashed partial (dir without marker) is deleted and rebuilt;
  *  - `work` writes the wave's tables into its ledger dir;
  *  - the marker is written LAST — the wave is committed only once
  *    its tables exist. */
private[streaming] object WaveLedger {

  val CommitMarker = "_GRAFT_COMMIT"

  def fsOf(spark: SparkSession, p: Path): FileSystem =
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)

  /** Committed (marker-present) ledger batch dirs under
    * `base`/ledger, name-ordered so every reader sees one
    * deterministic sequence. */
  def committedBatches(spark: SparkSession, base: String): Seq[Path] = {
    val ledger = new Path(s"$base/ledger")
    val f = fsOf(spark, ledger)
    if (!f.exists(ledger)) Seq.empty
    else f.listStatus(ledger).toSeq.map(_.getPath)
      .filter(p => f.exists(new Path(p, CommitMarker)))
      .sortBy(_.getName)
  }

  /** Stage one single-file wave of `part` into `inDir` for a
    * file-source stream — the gate entries' shared stager: coalesce
    * to one parquet file, copy it in, and force the mtime to the wave
    * index so maxFilesPerTrigger=1 delivers waves in a deterministic
    * order when several are staged at once. (Gate staging only — a
    * production stream's files arrive from the ingest system.) */
  def stageFrameWave(spark: SparkSession, part: org.apache.spark.sql.DataFrame,
                     base: String, inDir: String, wave: Int): Unit = {
    val scratch = s"$base/w$wave"
    part.coalesce(1).write.mode("overwrite").parquet(scratch)
    val f = fsOf(spark, new Path(scratch))
    val src = f.listStatus(new Path(scratch)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val dst = new Path(s"$inDir/wave$wave.parquet")
    org.apache.hadoop.fs.FileUtil.copy(f, src, f, dst, false,
      spark.sparkContext.hadoopConfiguration)
    f.setTimes(dst, 1000000L * (wave + 1), -1); ()
  }

  /** Run `work` for this wave exactly once (see object doc). An
    * empty wave contributes nothing and is not committed. */
  def waveCommit(spark: SparkSession, base: String, batch: DataFrame,
                 ck: Column, cs: Column,
                 alsoCommitted: String => Boolean = _ => false)
                (work: Path => Unit): Unit = {
    val st = batch.agg(count(lit(1)).as("n"), bit_xor(ck).as("ck"),
      sum(pmod(cs, lit(1L << 40))).as("cs")).collect()(0)
    if (st.getLong(0) == 0) return
    val tag = f"b_${st.getLong(0)}%d_${st.getLong(1)}%016x_${st.getLong(2)}%x"
    val bdir = new Path(s"$base/ledger/$tag")
    val f = fsOf(spark, bdir)
    if (f.exists(new Path(bdir, CommitMarker))) return // committed replay: skip
    if (alsoCommitted(tag)) return // caller vouches (e.g. compacted wave)
    f.delete(bdir, true) // crashed partial: rebuild whole
    work(bdir)
    f.create(new Path(bdir, CommitMarker), true).close(); ()
  }
}
