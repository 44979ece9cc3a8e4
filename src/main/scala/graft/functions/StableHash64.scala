package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static MD5→60-bit helper shared by interpreted eval and generated
  * code (Scala emits a static forwarder, so generated Java calls
  * `graft.functions.Md5Hash.hash(...)` directly). ThreadLocal digest
  * instances — MessageDigest is not thread-safe and getInstance per
  * row is the dominant cost otherwise. */
object Md5Hash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Value-identical to conv(substring(md5(s), 1, 15), 16, 10) as a
    * long: the first 15 hex chars are bytes 0..6 plus the high nibble
    * of byte 7, read big-endian. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >>> 4)
  }
}

/** Fused engine-portable 60-bit hash (see StableHash): one expression
  * node instead of the conv(substring(md5(cast(s)))) chain. The chain
  * allocates two intermediate UTF8Strings per row (32-char hex, then
  * 15-char slice) and runs conv's base-conversion loop; this computes
  * the same long straight from the digest bytes. Used on the hot path
  * of every dedup/fingerprint/LSH operator, where the corpus-sized
  * hash pass dominates. DuckDB oracle fragment unchanged
  * (StableHash.duckdbHash64) — values are bit-identical.
  */
case class StableHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"stable_hash64 requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "stable_hash64"

  override def nullSafeEval(input: Any): Any =
    Md5Hash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
