package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Consistent pseudonymization — every regex match is replaced by the
  * STABLE token `<tag_xxxxxxxx>` where xxxxxxxx is the first 8 md5 hex
  * digits of the matched string. Unlike constant-tag redaction
  * ([[graft.operators.TextNormalize.scrubPii]], which maps every email to
  * one `<EMAIL>`), the same entity maps to the same token EVERYWHERE in
  * the corpus — coreference structure survives for training while the
  * identity is gone. The id needs no global coordination (no dense-rank
  * pass, no mapping table to distribute): it is a pure function of the
  * entity, so the whole operator is a zero-shuffle projection and ids are
  * stable when the corpus grows. Two entities share a token with
  * probability ~2⁻³² per pair — the standard short-digest trade.
  *
  * Native codegen'd expression (the [[SpanScrub]] pattern: per-match
  * computed replacements are not expressible as `regexp_replace`, and a
  * lambda-HOF rebuild would run interpreted under a corpus-wide scan).
  * The compiled regex and tag ride `addReferenceObj`; md5 uses one
  * thread-local MessageDigest per task thread. */
case class Pseudonymize(child: Expression, pattern: String, tag: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pseudonymize expects a string child, got ${child.dataType}")

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override protected def nullSafeEval(value: Any): Any =
    Pseudonymize.rewrite(value.asInstanceOf[UTF8String], compiled, tag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pseudonymPat", compiled,
      "java.util.regex.Pattern")
    val tagRef = ctx.addReferenceObj("pseudonymTag", tag, "java.lang.String")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.Pseudonymize.rewrite($v, $patRef, $tagRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Pseudonymize {

  def pseudonymize(text: Column, pattern: String, tag: String): Column =
    GraftColumnBridge.column(Pseudonymize(
      GraftColumnBridge.expression(text), pattern, tag))

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** First 8 hex digits of md5(s as UTF-8) — identical to both engines'
    * `substring(md5(s), 1, 8)`. */
  private def md5Hex8(s: String): String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](8)
    var i = 0
    while (i < 4) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static (Java-callable from generated code). */
  def rewrite(value: UTF8String, pattern: java.util.regex.Pattern,
              tag: String): UTF8String = {
    val str = value.toString
    val m = pattern.matcher(str)
    if (!m.find()) return value
    val sb = new java.lang.StringBuilder(str.length + 16)
    var last = 0
    do {
      sb.append(str, last, m.start())
      sb.append('<').append(tag).append('_')
        .append(md5Hex8(m.group())).append('>')
      last = m.end()
    } while (m.find())
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }
}
