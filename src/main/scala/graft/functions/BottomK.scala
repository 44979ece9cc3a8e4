package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Sorted ≤k-element sketch carried as the aggregation buffer (case
  * class so the public product encoder applies; the query side reads
  * the `values` field). */
case class BottomKSketch(values: Seq[Long])

/** Typed custom aggregate (SURVEY.md §2.10 `Aggregator[IN,BUF,OUT]`
  * surface): bottom-k distinct values — the classic bottom-k (KMV)
  * sketch. Keeping the k smallest distinct hashes of a set both
  * fingerprints it (two sets sharing a long prefix of their bottom-k
  * are near-identical) and estimates its cardinality ((k-1)/max).
  *
  * The buffer is a sorted ≤k vector, so partial aggregation is
  * map-side (each input partition reduces to ≤k values before the
  * shuffle) and merges are O(k) — constant state per group at any
  * scale, the same contract as approx_count_distinct's HLL.
  */
class BottomK(k: Int) extends Aggregator[Long, BottomKSketch, BottomKSketch] {

  override def zero: BottomKSketch = BottomKSketch(Vector.empty)

  override def reduce(buf: BottomKSketch, v: Long): BottomKSketch =
    if (buf.values.length == k && v >= buf.values.last) buf // can't enter the sketch
    else insert(buf, v)

  override def merge(b1: BottomKSketch, b2: BottomKSketch): BottomKSketch =
    b2.values.foldLeft(b1)(reduce)

  override def finish(r: BottomKSketch): BottomKSketch = r

  private def insert(buf: BottomKSketch, v: Long): BottomKSketch = {
    val b = buf.values
    if (b.contains(v)) buf
    else {
      val i = b.indexWhere(_ > v)
      val at = if (i < 0) b.length else i
      BottomKSketch(((b.take(at) :+ v) ++ b.drop(at)).take(k))
    }
  }

  override def bufferEncoder: Encoder[BottomKSketch] = Encoders.product[BottomKSketch]
  override def outputEncoder: Encoder[BottomKSketch] = Encoders.product[BottomKSketch]
}

object BottomK {
  val DefaultK = 4

  /** Register `bottom_k(col)` (k fixed at registration) on the
    * session so DataFrame code reaches it via call_function — the
    * same public seam as cosine_sim. Idempotent. */
  def register(spark: SparkSession, k: Int = DefaultK): Unit =
    spark.udf.register("bottom_k", udaf(new BottomK(k)))

  /** Register under a k-suffixed name (`bottom_k_<k>`) and return it.
    * Different operators need different sketch widths (t5 uses k=4 as
    * a per-doc fingerprint, d18 k=16 as a per-source vocabulary
    * sketch); giving each width its own function name means two such
    * queries built on one session can never race a re-registration.
    * Idempotent like register. */
  def registerWidth(spark: SparkSession, k: Int): String = {
    val name = s"bottom_k_$k"
    spark.udf.register(name, udaf(new BottomK(k)))
    name
  }
}
