package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: per-segment byte sums of a binary
  * column — `segment_sums(payload)` → array<bigint> of `segments`
  * sums, where byte i of an n-byte payload belongs to segment
  * (i·segments) div n. This is average-pooling downscale over the
  * byte stream — the first step of a perceptual hash (pHash scales
  * the image down before transforming); unlike the positionless
  * byte histogram, the segment profile keeps COARSE POSITIONAL
  * structure, so two payloads match only when their content lines up
  * segment by segment.
  *
  * Same execution shape as ByteHistogram (`ByteHistogram.scala`):
  * reads the UnsafeRow's byte[] in place inside WholeStageCodegen,
  * allocates exactly one long[segments] per row. Sums are integers
  * of unsigned byte values — exactly reproducible in any engine
  * (ASCII corpus: byte value = char code).
  */
case class SegmentSums(child: Expression, segments: Int)
    extends UnaryExpression {

  require(segments > 0, s"segments must be positive, got $segments")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"segment_sums requires binary, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "segment_sums"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val sums = new Array[Long](segments)
    val n = bytes.length
    var i = 0
    while (i < n) {
      sums(((i.toLong * segments) / n).toInt) += (bytes(i) & 0xff).toLong
      i += 1
    }
    new GenericArrayData(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      s"""
         |long[] $sums = new long[$segments];
         |int $n = $b.length;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sums[(int) (((long) $i * $segments) / $n)] += (long) ($b[$i] & 0xff);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sums);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
