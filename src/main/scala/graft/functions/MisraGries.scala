package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** ≤w-counter Misra–Gries summary as parallel key/count vectors
  * (product encoder; consumers read `keys`). */
case class MGSummary(keys: Seq[String], counts: Seq[Long])

/** Typed Misra–Gries heavy-hitter sketch (the deterministic
  * frequent-items summary; Agarwal et al.'s mergeable-summaries
  * result makes the merge below sound): at most `w` counters; any
  * item with true frequency > n/(w+1) is GUARANTEED to survive, in
  * any partial-aggregation order. Counts are under-estimates, so a
  * consumer re-counts the ≤w candidates exactly — the sketch's job
  * is only to bound the candidate set.
  *
  * State is O(w) per group with map-side partials, the same contract
  * as BottomK/HLL: a corpus of any size reduces each partition to
  * one w-counter summary before the shuffle.
  */
class MisraGries(w: Int) extends Aggregator[String, MGSummary, MGSummary] {

  override def zero: MGSummary = MGSummary(Vector.empty, Vector.empty)

  override def reduce(buf: MGSummary, t: String): MGSummary = {
    val i = buf.keys.indexOf(t)
    if (i >= 0)
      MGSummary(buf.keys, buf.counts.updated(i, buf.counts(i) + 1))
    else if (buf.keys.length < w)
      MGSummary(buf.keys :+ t, buf.counts :+ 1L)
    else { // full and absent: decrement all, drop exhausted counters
      val kept = buf.keys.zip(buf.counts.map(_ - 1)).filter(_._2 > 0)
      MGSummary(kept.map(_._1), kept.map(_._2))
    }
  }

  override def merge(a: MGSummary, b: MGSummary): MGSummary = {
    val sum = (a.keys.zip(a.counts) ++ b.keys.zip(b.counts))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    if (sum.size <= w) {
      val s = sum.toSeq.sortBy(_._1) // canonical order, merge-order-free
      MGSummary(s.map(_._1), s.map(_._2))
    } else {
      // subtract the (w+1)-th largest count from everything; ≤ w
      // counters stay positive (the standard mergeable-summaries step)
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(w)
      val kept = sum.toSeq.map { case (k, c) => k -> (c - cut) }
        .filter(_._2 > 0).sortBy(_._1)
      MGSummary(kept.map(_._1), kept.map(_._2))
    }
  }

  override def finish(r: MGSummary): MGSummary = r

  override def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
}

object MisraGries {
  /** Register `misra_gries(col)` (width fixed at registration).
    * Idempotent. */
  def register(spark: SparkSession, w: Int): Unit =
    spark.udf.register("misra_gries", udaf(new MisraGries(w)))
}
