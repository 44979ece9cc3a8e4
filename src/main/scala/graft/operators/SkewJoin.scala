package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md scale checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join handling (on by default) splits oversized
  * SortMergeJoin partitions at runtime and is the first line of
  * defense. Salting is the explicit fallback for the cases AQE can't
  * fix: a single key too hot for any split (every row identical on
  * the join key) or a broadcast-ineligible build side. The big side
  * gets a deterministic salt in [0, buckets) derived from its other
  * columns; the small side is replicated `buckets` times; the join
  * key becomes (key, salt), spreading each hot key over `buckets`
  * partitions. Row multiplicity is unchanged: every big-side row
  * matches exactly the one replica carrying its salt.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key
    * over `buckets` partitions; the result is identical to
    * `big.join(small, key)` up to row order (any salt value in range
    * is correct — the small side carries every salt).
    *
    * The default salt is a deterministic hash of the big side's
    * columns: a task retry recomputes the SAME salt for every row, so
    * partial stage recomputation can never route a row to two
    * reducers (duplicate) or zero (loss). The known limitation: rows
    * that are FULLY identical all hash to one salt and are not
    * spread. `spreadIdenticalRows = true` mixes a nondeterministic
    * per-row id into the salt to spread even those — only safe when
    * the big side's lineage is retry-stable (e.g. freshly read from
    * immutable files, or checkpointed): under an upstream-shuffle
    * retry the recomputed ids differ and rows can be double-counted
    * or dropped mid-join. Pass `saltSource` for a custom salt. */
  def salted(big: DataFrame, small: DataFrame, key: String, buckets: Int,
             saltSource: Option[Column] = None,
             spreadIdenticalRows: Boolean = false): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs already carry a _salt column; rename it before salting")
    val src = saltSource.getOrElse {
      val cols = big.columns.toSeq.map(col)
      if (spreadIdenticalRows) xxhash64(monotonically_increasing_id() +: cols: _*)
      else xxhash64(cols: _*)
    }
    val saltedBig = big.withColumn("_salt", pmod(src, lit(buckets)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
