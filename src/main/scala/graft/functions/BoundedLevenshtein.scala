package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Banded (Ukkonen) edit distance with an early-exit bound — the
  * at-scale form of levenshtein: O(k·n) time and O(n) space instead
  * of the full O(n·m) DP, returning `bound + 1` as soon as the true
  * distance provably exceeds `bound`. A dedup pass only ever asks
  * "is the distance ≤ k?", so everything beyond the band is wasted
  * work — at a 100 TB corpus the difference between O(k·n) and
  * O(n²) per pair is the difference between an affordable pass and
  * an impossible one.
  *
  * Contract: result == min(levenshtein(a, b), bound + 1), property-
  * tested against a plain full-DP reference. Comparison is by Java
  * char (the corpus is ASCII; supplementary-plane text would count
  * surrogate halves separately from the builtin's code-point walk).
  */
object EditDistance {
  /** Full-DP reference (two rows). Used by tests and as the oracle
    * of the banded form's contract. */
  def plain(s: String, t: String): Int = {
    val n = s.length; val m = t.length
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }

  /** Banded DP: cells with |i − j| > bound can never contribute to a
    * distance ≤ bound, so only the 2·bound+1 diagonal band is
    * computed; when a whole band row exceeds `bound` the final
    * distance must too, and the scan stops. */
  def bounded(a: UTF8String, b: UTF8String, bound: Int): Int = {
    val s = a.toString; val t = b.toString
    val n = s.length; val m = t.length
    if (bound < 0) return 0
    if (math.abs(n - m) > bound) return bound + 1
    val big = bound + 1
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= bound) j else big; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - bound)
      val hi = math.min(m, i + bound)
      // cells left of the band are unreachable within the bound
      cur(lo - 1) = if (lo == 1) i else big
      var rowMin = cur(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        // prev's out-of-band neighbors hold the `big` sentinel (initial
        // row + per-row sentinel writes), so no explicit band guard
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > big) v = big
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = big // right sentinel for the next row's reads
      if (rowMin > bound) return big
      // copy the touched span (including both sentinels) into prev
      System.arraycopy(cur, lo - 1, prev, lo - 1, math.min(m, hi + 1) - (lo - 1) + 1)
      i += 1
    }
    math.min(prev(m), big)
  }
}

/** Codegen'd `bounded_levenshtein(a, b)` with a plan-time bound: the
  * generated code is one static call into the banded kernel, so the
  * expression stays inside whole-stage codegen like the builtin. */
case class BoundedLevenshtein(left: Expression, right: Expression, bound: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bounded_levenshtein requires (string, string), got ($l, $r)")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_levenshtein"

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistance.bounded(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.EditDistance.bounded($x, $y, $bound);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {
  /** Register `bounded_levenshtein(a, b, k)` (k a foldable
    * non-negative int literal) for SQL use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_levenshtein",
      { exprs =>
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"bounded_levenshtein expects 3 arguments (a, b, k), got ${exprs.length}")
        val k = exprs(2) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int => i
            case l: Long if l >= 0 && l <= Int.MaxValue => l.toInt
            case other => throw new IllegalArgumentException(
              s"bounded_levenshtein bound must be an int literal, got $other")
          }
          case e => throw new IllegalArgumentException(
            s"bounded_levenshtein bound must be foldable, got $e")
        }
        BoundedLevenshtein(exprs.head, exprs(1), k)
      },
      "built-in")
}
