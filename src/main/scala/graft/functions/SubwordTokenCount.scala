package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Subword token COUNT under greedy longest-match segmentation against a
  * fixed vocabulary — the BPE/WordPiece-shaped counting pass whose numbers
  * a training mix actually budgets on. Whitespace token counts are
  * systematically wrong for CJK (no spaces → 1 "token" per line) and for
  * code (one 200-char minified line = 1 token); every budget consumer
  * ([[graft.operators.Sampling.tokenBudgetMix]], packing, chunking, corpus
  * stats) takes a count COLUMN, so this expression slots in unchanged.
  *
  * Semantics (mirrored verbatim by the DuckDB gate oracle — change both or
  * neither):
  *  - text splits at ASCII whitespace (`[ \t\n\x0B\f\r]`, the same set as
  *    [[TokenCount]]); matches never cross a whitespace boundary;
  *  - within a word, scan left to right: at each position take the LONGEST
  *    vocabulary entry matching there (maximal munch — the WordPiece
  *    inference rule) and count 1;
  *  - no entry matches → count 1 for an UNK covering exactly one Unicode
  *    code point (length decoded from the UTF-8 lead byte), then resume.
  *
  * Scale shape: the vocabulary compiles ONCE (driver-side) into a byte
  * trie backed by an open-addressed long→int table — ~8 bytes per
  * transition, a 50k-entry BPE vocab is a few MB — shipped to executors
  * inside the expression (a plan-embedded broadcast, the same mechanism
  * Spark uses for every literal; a Map-typed join would shuffle or hash-
  * join per row instead). Evaluation is allocation-free byte scanning:
  * no String materialization, no per-token array, fully codegen'd. Matching
  * on raw UTF-8 bytes equals matching on characters because UTF-8 is
  * self-synchronizing — an entry boundary can never fall mid-character.
  */
case class SubwordTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"subword_token_count expects string, got ${child.dataType}")

  @transient private lazy val trie = SubwordTrie.build(vocab)

  override protected def nullSafeEval(input: Any): Any =
    trie.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("subwordTrie", trie,
      classOf[SubwordTrie].getName)
    defineCodeGen(ctx, ev, c => s"$trieRef.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordTokenCount {
  /** Column wrapper. `vocab` entries must be non-empty and whitespace-free
    * (a whitespace-bearing entry could never match — words are split
    * first). */
  def subwordTokenCount(text: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(SubwordTokenCount(
      GraftColumnBridge.expression(text), vocab))

  /** The SEGMENTATION twin of [[subwordTokenCount]]: the pieces themselves,
    * in document order. `size(subwordTokens(t, v)) ==
    * subwordTokenCount(t, v)` by construction (spec-enforced). */
  def subwordTokens(text: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(SubwordTokenize(
      GraftColumnBridge.expression(text), vocab))
}

/** Subword SEGMENTATION under the same greedy longest-match walk as
  * [[SubwordTokenCount]] — emits the pieces instead of their count, for
  * the pipelines that feed the segments onward (vocab coverage reports,
  * per-piece statistics, actual tokenization). Counting stays the separate
  * allocation-free expression: budget arithmetic should never pay for
  * piece materialization. One byte-array copy per row; the pieces are
  * zero-copy views into it. */
case class SubwordTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"subword_tokens expects string, got ${child.dataType}")

  @transient private lazy val trie = SubwordTrie.build(vocab)

  override protected def nullSafeEval(input: Any): Any =
    trie.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("subwordTrie", trie,
      classOf[SubwordTrie].getName)
    defineCodeGen(ctx, ev, c => s"$trieRef.segment($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Immutable byte trie with open-addressed long→int transitions: key is
  * `(node+1) << 8 | byte` (the +1 keeps 0 as the empty-slot sentinel),
  * value is the child node id; `terminal(node)` marks vocabulary entries.
  * Lookup is one multiplicative hash + linear probe — no boxing, no
  * allocation — and the whole structure is three flat arrays, so Java
  * serialization ships it compactly to executors. */
final class SubwordTrie private (keys: Array[Long], vals: Array[Int],
                                 mask: Int, terminal: Array[Boolean])
    extends Serializable {

  private def child(node: Int, b: Byte): Int = {
    val k = ((node + 1).toLong << 8) | (b & 0xffL)
    var idx = java.lang.Long.hashCode(k * -7046029254386353131L) & mask
    while (true) {
      val kk = keys(idx)
      if (kk == k) return vals(idx)
      if (kk == 0L) return -1
      idx = (idx + 1) & mask
    }
    -1 // unreachable
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** UTF-8 sequence length from the lead byte (malformed bytes advance 1,
    * so the scan always terminates). */
  private def charLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1
    else if (u >= 0xf0) 4
    else if (u >= 0xe0) 3
    else if (u >= 0xc0) 2
    else 1
  }

  /** Greedy longest-match token count (Java-callable from generated code). */
  def countTokens(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var count = 0
    while (i < n) {
      if (isWs(s.getByte(i))) i += 1
      else {
        // maximal munch from i: walk the trie while transitions exist,
        // remember the last terminal depth
        var node = 0
        var j = i
        var lastEnd = -1
        var walking = true
        while (walking && j < n && !isWs(s.getByte(j))) {
          val nxt = child(node, s.getByte(j))
          if (nxt < 0) walking = false
          else {
            node = nxt
            j += 1
            if (terminal(node)) lastEnd = j
          }
        }
        count += 1
        i = if (lastEnd > i) lastEnd
            else math.min(i + charLen(s.getByte(i)), n) // UNK: one code point
      }
    }
    count
  }

  /** Longest vocabulary match starting at `from` within
    * `bytes[from, until)`: the end offset of the longest terminal match,
    * or -1 when no entry matches there. Unlike [[countTokens]]'s walk
    * this does NOT stop at whitespace — callers pass a single word. */
  def longestMatch(bytes: Array[Byte], from: Int, until: Int): Int = {
    var node = 0
    var j = from
    var lastEnd = -1
    var walking = true
    while (walking && j < until) {
      val nxt = child(node, bytes(j))
      if (nxt < 0) walking = false
      else {
        node = nxt
        j += 1
        if (terminal(node)) lastEnd = j
      }
    }
    lastEnd
  }

  /** The same greedy walk as [[countTokens]], emitting the pieces
    * (Java-callable from generated code). One `getBytes` copy per row;
    * every piece is a zero-copy `UTF8String.fromBytes` view into it. */
  def segment(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        var node = 0
        var j = i
        var lastEnd = -1
        var walking = true
        while (walking && j < n && !isWs(bytes(j))) {
          val nxt = child(node, bytes(j))
          if (nxt < 0) walking = false
          else {
            node = nxt
            j += 1
            if (terminal(node)) lastEnd = j
          }
        }
        val end = if (lastEnd > i) lastEnd
                  else math.min(i + charLen(bytes(i)), n)
        out += UTF8String.fromBytes(bytes, i, end - i)
        i = end
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object SubwordTrie {

  def build(vocab: Seq[String]): SubwordTrie = {
    require(vocab.nonEmpty, "subword vocabulary must be non-empty")
    val tmp = new java.util.HashMap[Long, Integer]()
    val terminal = scala.collection.mutable.ArrayBuffer(false) // root
    vocab.foreach { entry =>
      require(entry.nonEmpty, "vocabulary entries must be non-empty")
      require(!entry.exists(c => c == ' ' || c == '\t' || c == '\n' ||
        c == 0x0B || c == '\f' || c == '\r'),
        s"vocabulary entry contains whitespace: '$entry'")
      var node = 0
      entry.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
        val k = ((node + 1).toLong << 8) | (b & 0xffL)
        val existing = tmp.get(k)
        node = if (existing != null) existing.intValue()
        else {
          terminal += false
          val fresh = terminal.length - 1
          tmp.put(k, fresh)
          fresh
        }
      }
      terminal(node) = true
    }
    // pack into open addressing at <= 50% load
    var cap = 8
    while (cap < tmp.size * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val vals = new Array[Int](cap)
    val mask = cap - 1
    tmp.forEach { (k, v) =>
      var idx = java.lang.Long.hashCode(k * -7046029254386353131L) & mask
      while (keys(idx) != 0L) idx = (idx + 1) & mask
      keys(idx) = k
      vals(idx) = v
    }
    new SubwordTrie(keys, vals, mask, terminal.toArray)
  }
}
