package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/output carrier for [[LongVecSum]] — a product wrapper so
  * the state rides the compact product encoder (array<bigint>), the
  * same pattern as MGSummary/BottomKSketch. Consumers read `.v`. */
case class LongVecState(v: Array[Long])

/** Element-wise SUM of equal-length long arrays — the one-shuffle
  * aggregation the Lloyd rounds need: groupBy(cid).agg(vecsum(qv))
  * replaces posexplode → groupBy(cid, dim) → re-assemble, halving the
  * shuffles per round and skipping the dims× row blow-up. Integer
  * addition is associative/commutative, so any partial-aggregation
  * order yields identical bits (the s5/s6 exactness discipline).
  * State is O(dims) per group with map-side partials; the buffer
  * array is mutated in place between serializations
  * (TypedImperativeAggregate keeps it as a JVM object). */
class LongVecSum extends Aggregator[Seq[Long], LongVecState, LongVecState] {

  override def zero: LongVecState = LongVecState(Array.empty)

  override def reduce(b: LongVecState, t: Seq[Long]): LongVecState =
    if (b.v.isEmpty) LongVecState(t.toArray)
    else {
      val a = b.v
      // fail loudly on ragged input: iterating a.length alone would
      // silently DROP a longer row's trailing dims (truncation-direction
      // corruption of the centroid sums) and throw a context-free
      // IndexOutOfBounds on a shorter one
      require(t.length == a.length,
        s"LongVecSum: ragged input — row has ${t.length} dims, buffer has ${a.length}")
      var i = 0
      while (i < a.length) { a(i) += t(i); i += 1 }
      b
    }

  override def merge(x: LongVecState, y: LongVecState): LongVecState =
    if (x.v.isEmpty) y
    else if (y.v.isEmpty) x
    else {
      val a = x.v
      val b = y.v
      require(b.length == a.length,
        s"LongVecSum: ragged partials — ${b.length} dims vs ${a.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      x
    }

  override def finish(r: LongVecState): LongVecState = r

  override def bufferEncoder: Encoder[LongVecState] = Encoders.product[LongVecState]
  override def outputEncoder: Encoder[LongVecState] = Encoders.product[LongVecState]
}

object LongVecSum {
  /** The aggregate as a column function (no session registration):
    * `vecsum(col)` yields a struct whose `v` field is the summed
    * array. */
  val vecsum: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new LongVecSum, ExpressionEncoder[Seq[Long]]())
}
