package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** The first `hexLen` hex digits of md5(input) as a LONG — the
  * hash-bucket / hash-draw primitive behind the md5-derived features
  * (quality classifier buckets, DSIR gram buckets, MinHash base hashes).
  * The composable formulation
  * `conv(substring(md5(x), 1, hexLen), 16, 10)` materializes a 32-char
  * hex string, slices it, and radix-PARSES it back per value — three
  * allocations and a parse per token/shingle at corpus scale. This
  * expression digests the raw bytes and assembles the integer from the
  * leading nibbles directly — bit-identical to the conv chain
  * (hex digit i of an md5 string IS nibble i of the digest;
  * property-checked, and pinned by every consuming oracle gate, whose
  * SQL keeps hashing with md5 hex).
  *
  * The digest instance is thread-local (MessageDigest is stateful and
  * not shareable across Spark's task threads). */
case class Md5Prefix(child: Expression, hexLen: Int) extends UnaryExpression {
  require(hexLen >= 1 && hexLen <= 15,
    s"hexLen=$hexLen: must fit a positive long (1..15 hex digits)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix.prefix(input.asInstanceOf[UTF8String], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix.prefix($c, $hexLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix {

  /** `conv(substring(md5(text), 1, hexLen), 16, 10)` as one digest call. */
  def prefix(text: Column, hexLen: Int): Column =
    GraftColumnBridge.column(
      Md5Prefix(GraftColumnBridge.expression(text), hexLen))

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static (Java-callable from generated code): value of the first
    * `hexLen` nibbles of the digest. */
  def prefix(s: UTF8String, hexLen: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexLen) {
      val b = d(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}
