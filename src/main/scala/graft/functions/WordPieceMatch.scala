package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece MaxMatch tokenization of ONE word — the greedy
  * longest-match-first rule BERT ships (Schuster & Nakajima 2012;
  * `tokenization.WordpieceTokenizer` in the reference BERT repo):
  *
  *  - position 0 matches only word-INITIAL vocabulary entries (no `##`);
  *  - later positions match only CONTINUATION entries, whose `##` prefix
  *    marks them but does not consume input;
  *  - at each position take the LONGEST match (maximal munch);
  *  - ANY unmatched position collapses the whole word to the single
  *    `unk` piece — never partial output (the reference behavior).
  *
  * Differs from [[SubwordTokenize]] (the plain greedy segmenter): the
  * initial/continuation split and the whole-word UNK rule are what make
  * it WordPiece. Mirrored verbatim by the `wordpiece_tokenize` gate's
  * recursive-CTE oracle — change both or neither.
  *
  * Scale shape: the vocabulary compiles ONCE driver-side into two byte
  * tries ([[SubwordTrie]] — flat arrays, a few MB at 50k entries) shipped
  * inside the expression; evaluation is an allocation-light byte scan,
  * fully codegen'd, zero shuffle — streaming-safe by construction.
  */
case class WordPieceMatch(child: Expression, vocab: Seq[String], unk: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_match expects string, got $t")
  }

  // two tries: word-initial entries verbatim; continuation entries keyed
  // on their marker-stripped bytes (the marker matches no input)
  @transient private lazy val initTrie: SubwordTrie = {
    val init = vocab.filterNot(_.startsWith("##")).distinct
    if (init.isEmpty) null else SubwordTrie.build(init)
  }
  @transient private lazy val contTrie: SubwordTrie = {
    val cont = vocab.filter(v => v.startsWith("##") && v.length > 2)
      .map(_.drop(2)).distinct
    if (cont.isEmpty) null else SubwordTrie.build(cont)
  }
  @transient private lazy val unkUtf = UTF8String.fromString(unk)

  /** Java-callable from generated code. */
  def tokenize(word: UTF8String): GenericArrayData = {
    val bytes = word.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val trie = if (i == 0) initTrie else contTrie
      val end = if (trie == null) -1 else trie.longestMatch(bytes, i, n)
      if (end < 0)
        return new GenericArrayData(Array[Any](unkUtf))
      out += (if (i == 0) UTF8String.fromBytes(bytes, 0, end)
              else UTF8String.concat(ContMarker,
                UTF8String.fromBytes(bytes, i, end - i)))
      i = end
    }
    new GenericArrayData(out.toArray)
  }

  private val ContMarker = UTF8String.fromString("##")

  override protected def nullSafeEval(input: Any): Any =
    tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceMatch", this,
      classOf[WordPieceMatch].getName)
    defineCodeGen(ctx, ev, c => s"$ref.tokenize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WordPieceMatch {
  /** Column wrapper; `vocab` carries DISPLAY forms (`##`-prefixed
    * continuations). */
  def apply(word: Column, vocab: Iterable[String], unk: String): Column =
    GraftColumnBridge.column(new WordPieceMatch(
      GraftColumnBridge.expression(word), vocab.toSeq.sorted, unk))
}
