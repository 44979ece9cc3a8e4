package graft

/** One root for every persisted derived artifact — index trees
  * (s13/s18/s21/s22), the e-family stage tables, st11's staging
  * scratch. Defaults to java.io.tmpdir; override with
  * SPARK_GRAFT_ARTIFACT_ROOT — the 100 TB knob: point it at the
  * warehouse filesystem the corpus lives on, and every build/append/
  * compact/swap in the library lands there with the same rename
  * semantics (the swap disciplines assume same-filesystem renames,
  * which holds exactly when artifacts live beside the data). */
object ArtifactRoots {
  def root: String = sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_ROOT",
    System.getProperty("java.io.tmpdir"))

  /** One FIXED location per (prefix, data dir) — repeated invocations
    * overwrite in place, so Verify/Bench loops never accumulate
    * unbounded scratch (the s13 no-tmp-accumulation discipline). */
  def tagged(prefix: String, dir: String): String = {
    val tag = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
    s"$root/${prefix}_$tag"
  }
}
