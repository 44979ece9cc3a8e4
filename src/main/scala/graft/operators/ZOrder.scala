package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-column locality —
  * completing the physical-layout toolkit (month partitioning for
  * time pruning, bucketing for join co-location, Z-ORDER for
  * multi-dimensional point/range locality).
  *
  * A single-column sort clusters that column perfectly and scatters
  * every other: a file sorted by orderkey holds any given partkey in
  * nearly every file. Interleaving the bits of per-column RANK
  * BUCKETS orders rows along a Morton curve, so rows close in ANY
  * indexed dimension land close on disk, and a predicate on either
  * column touches ~√(files) instead of all of them — the property
  * engines ship as OPTIMIZE ZORDER BY, built here from three
  * primitives.
  *
  * Scale shape: bucket boundaries come from one tiny
  * `percentile_approx` aggregate broadcast back (the q26 pattern —
  * never a global sort/ntile); bucket assignment and bit
  * interleaving are narrow row-local expressions; the only wide op
  * is the final repartitionByRange on the z-value, which is exactly
  * the shuffle any layout rewrite pays. */
object ZOrder {

  val DefaultBits = 8 // 256 rank buckets per column → 16-bit z-values for 2 columns

  /** Interleave the low `bits` bits of the bucket columns
    * (col i contributes bit position k·nCols+i for its bit k). Pure
    * integer built-ins — stays in whole-stage codegen. */
  def interleaveBits(buckets: Seq[Column], bits: Int = DefaultBits): Column =
    (0 until bits).flatMap { k =>
      buckets.zipWithIndex.map { case (b, i) =>
        shiftleft(shiftright(b, k).bitwiseAND(lit(1L)), k * buckets.size + i)
      }
    }.reduce(_ + _)

  /** Z-value column for `cols` appended as `_z`. EVERY column's
    * quantile boundaries come from ONE aggregate over the input (one
    * scan, one one-row broadcast) — folding a per-column
    * bounds-aggregate would nest each column's crossJoin inside the
    * next column's aggregate plan, recomputing earlier boundaries
    * once per later column. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = DefaultBits): DataFrame = {
    require(cols.size >= 2, "z-ordering one column is just a sort")
    val n = 1 << bits
    val qs = (1 until n).map(_.toDouble / n).toArray
    val bounds = df.agg(
      percentile_approx(col(cols.head).cast("double"), typedLit(qs), lit(10000))
        .as(s"_bounds_${cols.head}"),
      cols.tail.map(c =>
        percentile_approx(col(c).cast("double"), typedLit(qs), lit(10000))
          .as(s"_bounds_$c")): _*)
    val bucketed = cols.foldLeft(df.crossJoin(broadcast(bounds))) { (d, c) =>
      d.withColumn(s"_bucket_$c",
        aggregate(col(s"_bounds_$c"),
          lit(0L), (acc, b) => acc + when(col(c).cast("double") > b, 1L).otherwise(0L)))
    }
    bucketed
      .withColumn("_z", interleaveBits(cols.map(c => col(s"_bucket_$c")), bits))
      .drop(cols.map(c => s"_bucket_$c") ++ cols.map(c => s"_bounds_$c"): _*)
  }

  /** Write `df` z-ordered on `cols` into `numFiles` parquet files:
    * range-partition on the z-value (so each file owns a contiguous
    * Morton range) and sort within partitions. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    numFiles: Int, bits: Int = DefaultBits): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
