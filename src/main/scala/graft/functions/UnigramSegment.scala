package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram piece vocabulary —
  * the per-row kernel of [[graft.operators.UnigramLm]] (SentencePiece's
  * unigram model, Kudo 2018: reference `sentencepiece`
  * `unigram_model.cc` semantics, re-expressed as a codegen'd Catalyst
  * expression so the E-step stays inside whole-stage codegen; an
  * interpreted HOF DP would both run ~2× slow AND poison shared JIT
  * profiles — the round-11 rule).
  *
  * Scores are INTEGER micro-nats (quantized log-probs, the
  * [[graft.operators.LanguageModel]] determinism discipline): the DP
  * maximizes an integer sum, so every engine — this kernel, the
  * plain-Scala spec reference, the DuckDB exhaustive-enumeration oracle
  * — agrees bit-exactly with no fp-associativity hazard.
  *
  * DETERMINISTIC total order on segmentations (the tie-break ladder,
  * mirrored verbatim by the oracle's ORDER BY):
  *   1. total score, higher wins;
  *   2. piece count, fewer wins;
  *   3. the piece-length sequence compared left-to-right, longer-first
  *      wins (encoded as a fixed-width string so plain string order is
  *      the sequence order).
  * Levels 1-2 are additive and level 3 is stable under appending a
  * common suffix once counts are equal, so the order has optimal
  * substructure and the forward DP is exact; two segmentations equal on
  * all three levels have identical boundaries and ARE the same
  * segmentation — ties cannot survive.
  *
  * A single character not present in the vocabulary is always available
  * as a fallback piece at `unkScore` (segmentation totality: no word is
  * unsegmentable); a character present in the vocabulary uses its vocab
  * score instead.
  */
case class UnigramSegment(child: Expression,
                          vocab: Seq[(String, Long)],
                          unkScore: Long)
    extends UnaryExpression {

  // (pieces, total micro-nat score) — the score rides out of the same
  // DP instead of an interpreted HOF re-sum downstream
  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("score", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects string, got $t")
  }

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, s) =>
      require(p.nonEmpty, "unigram_segment: empty piece")
      val prev = m.put(p, s)
      require(prev == null, s"unigram_segment: duplicate piece '$p'")
    }
    m
  }

  @transient private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 1 else math.max(1, vocab.map(_._1.length).max)

  def segment(input: UTF8String): InternalRow = {
    val w = input.toString
    val n = w.length
    if (n == 0)
      return InternalRow(new GenericArrayData(Array.empty[Any]), 0L)
    // DP state per end-position: best (score, count, lenstr) + the
    // predecessor split. lenstr packs each piece length as two base-36
    // digits (maxPieceLen is vocab-bounded, far under 36²) so the
    // level-3 comparison is one string compare.
    val score = new Array[Long](n + 1)
    val count = new Array[Int](n + 1)
    val lens = new Array[String](n + 1)
    val back = new Array[Int](n + 1)
    lens(0) = ""
    var i = 1
    while (i <= n) {
      var bestScore = Long.MinValue
      var bestCount = 0
      var bestLens: String = null
      var bestJ = -1
      val jLo = math.max(0, i - maxPieceLen)
      var j = jLo
      while (j < i) {
        if (lens(j) != null) { // position reachable (always true here,
          // single-char fallback makes every prefix segmentable — kept
          // as a guard for clarity)
          val piece = w.substring(j, i)
          val s: java.lang.Long =
            if (i - j == 1) {
              val hit = table.get(piece)
              if (hit != null) hit else java.lang.Long.valueOf(unkScore)
            } else table.get(piece)
          if (s != null) {
            val cScore = score(j) + s.longValue()
            val cCount = count(j) + 1
            lazy val cLens = lens(j) + lenDigits(i - j)
            val better =
              cScore > bestScore ||
                (cScore == bestScore && (cCount < bestCount ||
                  (cCount == bestCount && cLens.compareTo(bestLens) > 0)))
            if (bestJ < 0 || better) {
              bestScore = cScore; bestCount = cCount
              bestLens = cLens; bestJ = j
            }
          }
        }
        j += 1
      }
      score(i) = bestScore; count(i) = bestCount
      lens(i) = bestLens; back(i) = bestJ
      i += 1
    }
    val out = new Array[Any](count(n))
    var pos = n
    var k = count(n) - 1
    while (pos > 0) {
      out(k) = UTF8String.fromString(w.substring(back(pos), pos))
      pos = back(pos)
      k -= 1
    }
    InternalRow(new GenericArrayData(out), score(n))
  }

  private def lenDigits(l: Int): String = {
    val hi = l / 36
    val lo = l % 36
    "" + Character.forDigit(hi, 36) + Character.forDigit(lo, 36)
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegment", this,
      classOf[UnigramSegment].getName)
    defineCodeGen(ctx, ev, c => s"$ref.segment($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object UnigramSegment {
  def apply(word: Column, vocab: Seq[(String, Long)],
            unkScore: Long): Column =
    GraftColumnBridge.column(new UnigramSegment(
      GraftColumnBridge.expression(word), vocab, unkScore))
}
