package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword vocabulary training (Kudo 2018 — the SentencePiece
  * unigram model; reference semantics `sentencepiece`
  * `unigram_model_trainer.cc`), the OTHER mainstream tokenizer family
  * beside [[BpeLearn]]'s BPE: seed a large candidate vocabulary from
  * frequent substrings, then alternate Viterbi (hard-EM) re-estimation
  * with pruning until the target size.
  *
  * Distribution boundary — the [[BpeLearn]] discipline exactly: the
  * corpus collapses ONCE to the vocabulary-sized word-frequency table
  * ([[BpeLearn.wordFrequencies]]), every E-step is one broadcast-vocab
  * in-row Viterbi ([[graft.functions.UnigramSegment]], codegen'd) plus
  * one piece-keyed count aggregation (map-side partials), and only
  * vocabulary-sized count lists cross the driver between rounds. A
  * 100 TB corpus and a 1 GB corpus iterate over the same-shaped state;
  * round count is log-bounded by the prune ratio, independent of corpus
  * size.
  *
  * Determinism contract (the [[LanguageModel]] micro-nat discipline):
  * counts are exact integer sums; piece scores quantize
  * `log(count/total)` to integer micro-nats BEFORE they feed the next
  * E-step's integer Viterbi, so the whole training trajectory — counts,
  * prunes, final scores — is a pure function of the corpus, bit-exact
  * across engines (property-checked against a plain-Scala reference
  * whose segmenter is an EXHAUSTIVE enumeration argmax, independently
  * of the DP).
  */
object UnigramLm {

  /** One vocabulary entry: integer micro-nat log-prob (the score the
    * Viterbi maximizes) plus the raw count that produced it. */
  final case class Piece(piece: String, score: Long, count: Long)

  /** Score of a single character absent from the vocabulary (the
    * totality fallback — far below any real piece so it never outranks
    * one, but finite so every word segments). */
  val UnkScore: Long = -20_000_000L

  private[graft] def microNatLog(count: Long, total: Long): Long =
    math.floor(math.log(count.toDouble / total.toDouble) * 1e6).toLong

  /** Candidate seed substrings: every substring of length
    * 1..`maxPieceLen` of every word, weighted by word frequency —
    * (piece, w). The substring explode is a per-row HOF over the
    * VOCABULARY-sized word table (the deliberate interpreted-HOF class:
    * model-sized, not corpus-sized — same standing as BpeLearn's pair
    * explode). */
  def seedCandidates(words: DataFrame, maxPieceLen: Int = 8): DataFrame =
    words
      .select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(
            sequence(lit(1),
              least(lit(maxPieceLen), length(col("word")) - i + 1)),
            l => col("word").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("w"))

  /** Train a unigram vocabulary of `vocabSize` MULTI-character pieces
    * (single characters ride along at their corpus scores and are never
    * pruned — totality). Hard-EM: each round segments every word under
    * the current scores, re-estimates scores from the Viterbi counts,
    * drops multi-char pieces the segmentation stopped using, and prunes
    * the rest toward the target by (count desc, piece asc) at
    * `shrink` per round. Stops when the multi-char vocabulary fits and
    * a final re-estimation pass has run. */
  def train(corpus: DataFrame, vocabSize: Int,
            textCol: String = "text", maxPieceLen: Int = 8,
            seedMultiplier: Int = 4, shrink: Double = 0.75,
            minSeedCount: Long = 2L): Seq[Piece] = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen=$maxPieceLen")
    require(shrink > 0.0 && shrink < 1.0, s"shrink=$shrink")
    val words = BpeLearn.wordFrequencies(corpus, textCol)
      .localCheckpoint(true) // every E-step re-reads it
    val seed = seedCandidates(words, maxPieceLen)
      .filter(col("w") >= minSeedCount || length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (chars, multis) = seed.partition(_._1.length == 1)
    val seedSize = vocabSize * seedMultiplier
    val kept = multis
      .sortBy { case (p, w) => (-w, p) }.take(seedSize)
    // initial scores ∝ seed weight (the standard seed heuristic)
    var vocab: Seq[(String, Long)] = {
      val all = chars ++ kept
      val total = all.map(_._2).sum
      all.map { case (p, w) => (p, microNatLog(w, total)) }
    }
    var counts: Map[String, Long] = Map.empty
    var done = false
    while (!done) {
      // E-step: Viterbi counts under the current scores
      val segmented = words.select(col("cnt"),
        explode(graft.functions.UnigramSegment(col("word"), vocab, UnkScore)
          .getField("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      counts = segmented
      val total = segmented.valuesIterator.sum
      // M-step over the SURVIVORS: chars always stay (unused chars keep
      // a floor count of 1 so their score is finite); multi-char pieces
      // the segmentation stopped using drop out immediately
      val charEntries = chars.map { case (p, _) =>
        (p, segmented.getOrElse(p, 0L).max(1L))
      }
      val multiEntries = vocab.iterator.map(_._1).filter(_.length > 1)
        .flatMap(p => segmented.get(p).filter(_ > 0).map(p -> _)).toSeq
      val targetMulti = vocabSize
      val prunedMulti =
        if (multiEntries.size <= targetMulti) { done = true; multiEntries }
        else {
          // strictly decreasing (min(size-1, ...)): ceil(size·shrink)
          // equals size for tiny sizes and would otherwise never reach
          // the target
          val keep = math.max(targetMulti, math.min(multiEntries.size - 1,
            math.ceil(multiEntries.size * shrink).toInt))
          multiEntries.sortBy { case (p, c) => (-c, p) }.take(keep)
        }
      val all = charEntries ++ prunedMulti
      val newTotal = all.iterator.map(_._2).sum
      vocab = all.map { case (p, c) => (p, microNatLog(c, newTotal)) }
    }
    vocab.map { case (p, s) =>
      Piece(p, s, if (p.length == 1) counts.getOrElse(p, 0L).max(1L)
                  else counts.getOrElse(p, 0L))
    }.sortBy(p => (-p.count, p.piece))
  }

  /** The trained vocabulary as a DataFrame (piece, score_micro_nats,
    * count) — the persistable artifact and the gate surface. */
  def trainTable(spark: SparkSession, corpus: DataFrame, vocabSize: Int,
                 textCol: String = "text", maxPieceLen: Int = 8)
      : DataFrame = {
    import spark.implicits._
    train(corpus, vocabSize, textCol, maxPieceLen)
      .map(p => (p.piece, p.score, p.count)).toDF("piece", "score", "count")
  }

  /** Segment a word column under a vocabulary — the serving-side
    * operation (and the `unigram_segment` gate surface): pieces plus the
    * segmentation's total micro-nat score. */
  def segment(words: DataFrame, vocab: Seq[(String, Long)],
              wordCol: String = "word",
              unkScore: Long = UnkScore): DataFrame = {
    val seg =
      graft.functions.UnigramSegment(col(wordCol), vocab, unkScore)
    words
      .withColumn("__seg", seg)
      .withColumn("pieces", col("__seg").getField("pieces"))
      .withColumn("score", col("__seg").getField("score"))
      .drop("__seg")
  }
}
