package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a native Catalyst expression — the
  * canonicalize-before-digest step of corpus dedup: scraped text mixes
  * precomposed ("é") and decomposed ("e"+U+0301) encodings of the same
  * canonical content, and every hash-keyed operator downstream (exact
  * dedup, shingles, MinHash, line dedup) would otherwise treat them as
  * different documents.
  *
  * A custom `Expression` with `doGenCode` (not a UDF): this sits in front
  * of the digest in full-corpus projections. The static helper fast-paths
  * `Normalizer.isNormalized` — real corpora are overwhelmingly already
  * NFC, and the check avoids any allocation for them; only the rare
  * denormalized string pays for `Normalizer.normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static (Java-callable from generated code). Pure-ASCII input (the
    * bulk of web text) short-circuits on a byte scan with ZERO allocation;
    * non-ASCII but already-normalized input allocates only the String
    * view; only genuinely denormalized strings pay for the normalize. */
  def norm(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s // ASCII is closed under NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column wrapper. */
  def nfc(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text)))
}
