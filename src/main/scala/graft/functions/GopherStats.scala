package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** The token-level Gopher quality statistics as ONE native scan:
  * `struct(n_words, char_sum, n_alpha, n_stop)` over the raw UTF-8
  * bytes. The HOF formulation — `aggregate(toks, 0L, (acc, t) => acc +
  * length(t))` for the character sum plus two `filter(toks, ...)`
  * passes for the alphabetic and stopword counts — is CodegenFallback
  * end-to-end: three interpreted tree-walks per document on a
  * corpus-wide path (the `quality_gopher` gate AND the composed
  * pipeline's quality leg), and interpreter traffic of exactly the kind
  * that measurably poisons shared-JVM JIT profiles (see
  * [[SpanScrub]]'s doc). One static byte loop replaces all three.
  *
  * EXACT equivalence to the HOF shape (property-checked, pinned by the
  * `quality_gopher` and `corpus_pipeline` oracle gates):
  *  - tokens are maximal runs of non-`[ \t\n\x0B\f\r]` bytes — the
  *    [[TokenCount]]/[[WordShingles]] tokenizer, identical to
  *    `filter(split(text, "\\s+"), _ =!= "")`;
  *  - `char_sum` counts CHARACTERS (codepoints) per token, matching
  *    Spark's `length()` on UTF8String (continuation bytes excluded);
  *  - `n_alpha` counts tokens containing an ASCII letter — the
  *    `rlike("[a-zA-Z]")` semantics (ASCII-only class);
  *  - `n_stop` counts tokens whose Unicode LOWERCASE equals one of the
  *    8 Gopher stopwords (the, be, to, of, and, that, have, with) —
  *    pure-ASCII tokens fold A-Z inline; a token with any non-ASCII
  *    byte takes the exact `UTF8String.toLowerCase` slow path (rare,
  *    and required for oddities like U+212A KELVIN SIGN → "k" that an
  *    ASCII fold would miss — `lower()` parity is a hash-gate
  *    contract, not a heuristic).
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStats.outType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    GopherStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object GopherStats {

  private[graft] val outType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  def stats(text: Column): Column =
    GraftColumnBridge.column(GopherStats(GraftColumnBridge.expression(text)))

  /** The Gopher "natural language" stopword list (Rae et al. 2021
    * §A1.1.2) as UTF-8 byte arrays for the inline compare. */
  private val StopWords: Array[Array[Byte]] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(_.getBytes("UTF-8"))
  private val StopWordStrings: Array[UTF8String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(UTF8String.fromString)

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static (Java-callable from generated code): one pass over the
    * bytes — token boundaries, per-token codepoint count, ASCII-letter
    * presence, stopword equality (inline ASCII fold; exact Unicode
    * lowercase slow path for tokens with multi-byte characters). */
  def stats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nWords = 0
    var charSum = 0L
    var nAlpha = 0
    var nStop = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        val st = i
        var chars = 0L
        var hasAlpha = false
        var allAscii = true
        while (i < n && !isWs(bytes(i))) {
          val b = bytes(i)
          // count codepoints: UTF-8 continuation bytes are 10xxxxxx
          if ((b & 0xC0) != 0x80) chars += 1
          if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z'))
            hasAlpha = true
          if ((b & 0x80) != 0) allAscii = false
          i += 1
        }
        nWords += 1
        charSum += chars
        if (hasAlpha) nAlpha += 1
        val len = i - st
        if (allAscii) {
          // inline ASCII case fold: token must match a stopword's bytes
          var w = 0
          var hit = false
          while (!hit && w < StopWords.length) {
            val sw = StopWords(w)
            if (sw.length == len) {
              var p = 0
              var ok = true
              while (ok && p < len) {
                var c = bytes(st + p)
                if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
                ok = c == sw(p)
                p += 1
              }
              hit = ok
            }
            w += 1
          }
          if (hit) nStop += 1
        } else {
          // exact lower() parity for multi-byte tokens (e.g. U+212A → k)
          val lowered = UTF8String.fromBytes(bytes, st, len).toLowerCase
          var w = 0
          var hit = false
          while (!hit && w < StopWordStrings.length) {
            hit = lowered.equals(StopWordStrings(w)); w += 1
          }
          if (hit) nStop += 1
        }
      }
    }
    InternalRow(nWords, charSum, nAlpha, nStop)
  }
}
