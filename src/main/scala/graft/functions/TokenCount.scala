package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token COUNT as a native expression — the allocation-free
  * fast path for the hottest primitive in the corpus gates: call sites
  * that only need `n_tokens` today compute
  * `size(filter(split(text, "\\s+"), _ =!= ""))`, materializing an array
  * of UTF8String slices (one allocation per token, per row, per pass)
  * just to take its length. This expression is one branch-light scan over
  * the raw UTF-8 bytes counting whitespace→token transitions: zero
  * allocation, fully codegen'd.
  *
  * EXACTLY equivalent to `size(TextAnalysis.tokens(text))` by
  * construction: Java's `\s` (no UNICODE_CHARACTER_CLASS) is the ASCII
  * set `[ \t\n\x0B\f\r]`, so a maximal run of non-whitespace BYTES is a
  * token — multi-byte UTF-8 sequences (lead and continuation bytes are
  * all >= 0x80) can never be whitespace and never split. The equivalence
  * is property-checked over generated unicode/whitespace strings.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_count expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {

  /** Static (Java-callable from generated code): number of maximal runs
    * of non-`[ \t\n\x0B\f\r]` bytes. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var tokens = 0
    var inToken = false
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
        b == '\f' || b == '\r'
      if (ws) inToken = false
      else if (!inToken) { tokens += 1; inToken = true }
      i += 1
    }
    tokens
  }

  /** Column wrapper. */
  def tokenCount(text: Column): Column =
    GraftColumnBridge.column(TokenCount(GraftColumnBridge.expression(text)))
}
