package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix56(str)`: the first 56 bits of md5(str) as a non-negative
  * BIGINT — bit-identical to the portable SQL formulation
  * `CAST(conv(substring(md5(str), 1, 14), 16, 10) AS BIGINT)` (14 hex chars
  * = the digest's first 7 bytes, big-endian), which is what the DuckDB
  * oracles keep using: `('0x' || substr(md5(str), 1, 14))::BIGINT`.
  *
  * The SQL chain allocates a 32-char hex string per hash and re-parses it
  * base-16; per-gram/per-shingle call sites (winnowing, MinHash shingles,
  * SimHash token hashes) execute it millions of times per partition, so
  * this expression digests the UTF-8 bytes directly and assembles the long
  * from the raw digest — no hex round-trip, no parser.
  */
case class Md5Prefix56(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix56 requires STRING, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix56"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix56.hash56(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix56.hash56($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix56 {
  // one digest instance per executor thread — MessageDigest.getInstance is
  // a provider lookup + allocation, far too slow to pay per row
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 7 digest bytes, big-endian → [0, 2^56). Called from codegen. */
  def hash56(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes) // digest() resets the instance
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
    ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
    (d(6) & 0xffL)
  }
}
