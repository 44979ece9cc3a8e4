package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SUM modulo the Mersenne prime 2^61−1 — the overflow escape the
  * e15 layer-census and e9 order-checksum docs name: their int64 sums
  * of 2^40-bounded terms are exact to ~2^23 rows (resp. 2^20 bins per
  * shard), and PAST that bound the fold must reduce per partial
  * instead of widening. Correctness is the ring homomorphism: partial
  * sums reduced mod M and then added mod M equal the full sum mod M
  * in ANY partial-aggregation order, so Spark's map-side combine and
  * a sequential fold agree bit-for-bit (Round13Spec property-tests
  * the fold at the int64-overflow edge against a BigInt reference).
  * No intermediate overflows: buffers live in [0, M) and inputs are
  * reduced on entry, so every addition stays under 2^62 < 2^63.
  * Negative inputs (a hash fold misused without pmod) are normalized
  * into [0, M) rather than silently diverging from the BigInt law. */
class MersenneModSum extends Aggregator[Long, Long, Long] {
  import MersenneModSum.M

  override def zero: Long = 0L

  override def reduce(b: Long, t: Long): Long = {
    val r = t % M
    (b + (if (r < 0) r + M else r)) % M
  }

  override def merge(a: Long, b: Long): Long = (a + b) % M

  override def finish(r: Long): Long = r

  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object MersenneModSum {
  val M: Long = (1L << 61) - 1

  /** The aggregate as a column function: `msum(col)` = Σ col mod M. */
  val msum: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MersenneModSum, Encoders.scalaLong)
}
