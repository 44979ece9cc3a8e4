package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Pack an array<bigint> of uint8-range codes (0..255) into a binary
  * column, one byte per element — the storage layout that realizes
  * SQ8's 4–8× scan shrink (ext/Similarity s10): a 64-dim code vector
  * becomes a 64-byte buffer inline in the UnsafeRow instead of an
  * array<long> with 8 bytes per element plus offsets. The packing is
  * LOSSLESS over the 0..255 contract, so any integer distance over
  * the packed form is bit-identical to the same distance over the
  * unpacked codes (spec-pinned s10 ≡ s8), and the DuckDB oracle can
  * stay in plain integer-array space — no binary type gymnastics.
  *
  * NULL on NULL input or NULL element; an out-of-range element is a
  * broken quantizer, surfaced as NULL (poisoning, same as the HOF
  * folds) rather than silently truncated to the low byte.
  */
case class PackUint8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pack_uint8 requires array<bigint>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pack_uint8"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i)
      if (v < 0L || v > 255L) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $v = $x.getLong($i);
         |  if ($v < 0L || $v > 255L) { ${ev.isNull} = true; break; }
         |  $out[$i] = (byte) $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PackUint8 {
  /** Register `pack_uint8(codes)` for SQL use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pack_uint8",
      { exprs =>
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"pack_uint8 expects 1 argument, got ${exprs.length}")
        PackUint8(exprs.head)
      },
      "built-in")
}

/** Exact int64 squared-L2 distance between two packed uint8 code
  * buffers (the [[PackUint8]] layout): Σ (aᵢ−bᵢ)² over the bytes read
  * UNSIGNED. The whole scan kernel is two byte-array walks inside
  * whole-stage codegen — no array headers, no per-element null words —
  * which is what the packed layout buys. Max value: 64 dims × 255² <
  * 2²³, nowhere near int64. NULL on NULL input or length mismatch
  * (two different quantizers' outputs are not comparable).
  */
case class ByteSqL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"byte_sq_l2 requires (binary, binary), got ($l, $r)")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "byte_sq_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    var acc = 0L
    var i = 0
    while (i < x.length) {
      val d = (x(i) & 0xff).toLong - (y(i) & 0xff).toLong
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $x.length; $i++) {
         |    long $d = (long)($x[$i] & 0xff) - (long)($y[$i] & 0xff);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ByteSqL2 {
  /** Register `byte_sq_l2(a, b)` for SQL use. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_sq_l2",
      { exprs =>
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"byte_sq_l2 expects 2 arguments, got ${exprs.length}")
        ByteSqL2(exprs.head, exprs(1))
      },
      "built-in")
}
