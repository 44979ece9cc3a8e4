package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: fixed-width byte-value histogram of a
  * binary column — `byte_histogram(payload)` → array<bigint> of
  * `bins` counts, bin = byteValue / (256 / bins).
  *
  * This is the columnar replacement for the row-at-a-time decode
  * stub in `ext/Multimodal` (reference README.md has no media
  * pipeline; this is the §2.10 training-data extension surface): a
  * Dataset-encoder `mapPartitions` pass deserializes every payload
  * into a case class and back (~the whole m1 cost at bench scale);
  * this expression reads the UnsafeRow's byte[] in place inside
  * WholeStageCodegen and allocates exactly one long[bins] per row.
  *
  * Counts are integers, so the result is exactly reproducible in any
  * engine — which is what upgrades m1 from a rows-only check to a
  * full DuckDB oracle (ASCII corpus: byte value = char code).
  */
case class ByteHistogram(child: Expression, bins: Int)
    extends UnaryExpression {

  require(bins > 0 && 256 % bins == 0, s"bins must divide 256, got $bins")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_histogram requires binary, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "byte_histogram"

  private val shift = 256 / bins

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val hist = new Array[Long](bins)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) / shift) += 1L
      i += 1
    }
    new GenericArrayData(hist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val i = ctx.freshName("i")
      val hist = ctx.freshName("hist")
      s"""
         |long[] $hist = new long[$bins];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $hist[($b[$i] & 0xff) / $shift] += 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($hist);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteHistogram {
  /** Register `byte_histogram(payload, bins)` for SQL/call_function
    * use (bins must be an integer literal). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_histogram",
      exprs => ByteHistogram(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]),
      "built-in")
}
